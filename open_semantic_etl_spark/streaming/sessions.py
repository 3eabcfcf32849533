"""Custom stateful streaming operator: gap-based crawl sessions per host.

The ``applyInPandasWithState`` surface the brief calls for — a
stateful operator Spark's built-ins don't provide (per-key
gap-sessionization with arbitrary state). One crawl "session" per
host = a run of page fetches with no silence longer than ``gap``;
emitted when the gap elapses (event-time timeout against the
watermark), so output is final and late data inside the watermark
still extends the right session.

State per host: (session_start_epoch, last_seen_epoch, n_pages).
Scale: state lives in the state store partitioned by host — the hot
host holds ONE small state row regardless of page volume; the
shuffle key is the host, and AQE/state-store partitioning handle the
key count. The pandas batches arrive Arrow-vectorized per host group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_pages", T.LongType(), False),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_epoch", T.LongType(), False),
        T.StructField("last_epoch", T.LongType(), False),
        T.StructField("n_pages", T.LongType(), False),
    ]
)


def _session_func(gap_seconds: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        emitted = []
        if state.hasTimedOut:
            start, last, n = state.get
            emitted.append((host, start, last, n))
            state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                # NaT rows (null ts) would raise on .timestamp(); drop them
                ts_list.extend(int(v.timestamp()) for v in pdf["ts"] if pd.notna(v))
            if not ts_list and not state.exists:
                return
            ts_list.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts_list[0], ts_list[0], 0
            for t in ts_list:
                if t - last > gap_seconds:
                    emitted.append((host, start, last, n))
                    start, n = t, 0
                last = max(last, t)
                n += 1
            state.update((start, last, n))
            # finalize when the watermark passes last_seen + gap; Spark
            # rejects timeouts <= current watermark (possible when gap <
            # watermark delay and a late-but-in-watermark batch arrives),
            # so clamp to watermark + 1s
            timeout_ms = (last + gap_seconds) * 1000
            wm_ms = state.getCurrentWatermarkMs()
            if timeout_ms <= wm_ms:
                timeout_ms = wm_ms + 1000
            state.setTimeoutTimestamp(timeout_ms)
        if emitted:
            yield pd.DataFrame(
                {
                    "host": [e[0] for e in emitted],
                    "session_start": [pd.Timestamp(e[1], unit="s") for e in emitted],
                    "session_end": [pd.Timestamp(e[2], unit="s") for e in emitted],
                    "n_pages": [e[3] for e in emitted],
                }
            )

    return fn


def host_sessions(
    pages_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """streaming (url, ts) → finalized per-host crawl sessions."""
    n, unit = gap.split()
    gap_seconds = int(n) * {"seconds": 1, "minutes": 60, "hours": 3600}[unit]
    hosts = pages_stream.select(
        F.parse_url("url", F.lit("HOST")).alias("host"), F.col("ts")
    ).withWatermark("ts", watermark)
    return hosts.groupBy("host").applyInPandasWithState(
        _session_func(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
