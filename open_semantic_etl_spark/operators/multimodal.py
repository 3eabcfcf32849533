"""Multimodal columns: opaque binary media + typed metadata + stub codecs.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The expensive per-byte steps (decode, resize,
frame-sample, feature-extract) run as ``mapInPandas`` stages with the
same batching/partitioning discipline as the text tiers. The codec
libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode seam raises ``NotImplementedError`` for real formats and decodes
the deterministic test format ``FAKEIMG:<w>x<h>:<payload>`` — the
Spark-side plumbing (schema, UDF signatures, batch shape, partition
behavior) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
    ]
)

FEATURE_TYPE = T.ArrayType(T.FloatType())

_FAKE_MAGIC = b"FAKEIMG:"


def decode_fake(data: bytes) -> tuple[int, int, bytes]:
    """decode the deterministic test format FAKEIMG:<w>x<h>:<payload>."""
    head = data[len(_FAKE_MAGIC):]
    dims, _, payload = head.partition(b":")
    w, _, h = dims.partition(b"x")
    return int(w), int(h), payload


def decode_media(data: bytes) -> tuple[int, int, bytes]:
    """codec seam: real formats need PIL/ffmpeg (not in this container)."""
    if data.startswith(_FAKE_MAGIC):
        return decode_fake(data)
    raise NotImplementedError(
        "real image/audio/video decoding requires codec libraries not "
        "present in this environment (PIL/ffmpeg); supported here: FAKEIMG"
    )


def with_media_meta(df: DataFrame, media_col: str = "media", out: str = "media_meta") -> DataFrame:
    """typed metadata struct per media payload (decode errors captured)."""

    def run(series: pd.Series) -> pd.DataFrame:
        rows = []
        for b in series:
            rec = {"media_type": None, "width": None, "height": None,
                   "n_bytes": len(b) if b is not None else 0, "ok": False, "err": None}
            try:
                if b:
                    w, h, _ = decode_media(bytes(b))
                    rec.update(media_type="image", width=w, height=h, ok=True)
            except NotImplementedError as e:
                rec["err"] = str(e)
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"{type(e).__name__}: {e}"
            rows.append(rec)
        return pd.DataFrame(rows)

    udf = F.pandas_udf(run, MEDIA_META_TYPE)
    return df.withColumn(out, udf(F.col(media_col)))


def with_media_features(
    df: DataFrame, media_col: str = "media", out: str = "features", dim: int = 16
) -> DataFrame:
    """toy deterministic feature extractor over decoded payload bytes —
    byte-histogram folded to ``dim`` floats, L2-normalized. Stands in for
    a real vision/audio encoder; batch shape and schema are production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[media_col]:
                try:
                    _, _, payload = decode_media(bytes(b))
                    hist = np.bincount(
                        np.frombuffer(payload, dtype=np.uint8) % dim, minlength=dim
                    ).astype(np.float64)
                    n = np.linalg.norm(hist)
                    feats.append([float(x) for x in (hist / n if n else hist)])
                except Exception:  # noqa: BLE001 — undecodable → null
                    feats.append(None)
            pdf[out] = feats
            yield pdf

    schema = T.StructType(df.schema.fields + [T.StructField(out, FEATURE_TYPE, True)])
    return df.mapInPandas(run, schema=schema)


def resize_stub(df: DataFrame, media_col: str = "media", w: int = 64, h: int = 64) -> DataFrame:
    """resize seam: for FAKEIMG just rewrites the header dims (payload
    untouched); real formats raise through the decode seam."""

    def run(series: pd.Series) -> pd.Series:
        out = []
        for b in series:
            bw, bh, payload = decode_media(bytes(b))
            out.append(_FAKE_MAGIC + f"{w}x{h}:".encode() + payload)
        return pd.Series(out)

    udf = F.pandas_udf(run, T.BinaryType())
    return df.withColumn(media_col, udf(F.col(media_col)))


# ---------------------------------------------------------------------------
# video: frame sampling (the frame-sample stage of a vision pipeline).
# Deterministic container format FAKEVID:<frame>|<frame>|… where each
# frame is a FAKEIMG payload; real containers (mp4/mkv) raise through
# the codec seam. The Spark shape — posexplode into (url, frame_i,
# frame) child rows — is the production plumbing either way.
# ---------------------------------------------------------------------------

_FAKE_VID_MAGIC = b"FAKEVID:"

FRAME_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("frame_i", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )
)


def decode_video_frames(data: bytes) -> list[bytes]:
    """codec seam: FAKEVID containers split into frames; real video
    needs ffmpeg (not in this container)."""
    if data.startswith(_FAKE_VID_MAGIC):
        body = data[len(_FAKE_VID_MAGIC):]
        return body.split(b"|") if body else []
    raise NotImplementedError(
        "real video demuxing requires ffmpeg, not present here; "
        "supported container: FAKEVID"
    )


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "url",
    every_k: int = 2,
) -> DataFrame:
    """one row per SAMPLED frame (every k-th, starting at 0) —
    the frame-sample stage ahead of a vision encoder. Undecodable
    containers yield zero rows (error capture is with_media_meta's
    job on the parent row)."""

    def run(series: pd.Series) -> pd.Series:
        out = []
        for b in series:
            try:
                frames = decode_video_frames(bytes(b))
                out.append(
                    [
                        {"frame_i": i, "frame": f}
                        for i, f in enumerate(frames)
                        if i % every_k == 0
                    ]
                )
            except Exception:  # noqa: BLE001
                out.append([])
        return pd.Series(out)

    udf = F.pandas_udf(run, FRAME_TYPE)
    ex = df.select(F.col(id_col), F.explode(udf(F.col(media_col))).alias("fr"))
    return ex.select(
        id_col, F.col("fr.frame_i").alias("frame_i"), F.col("fr.frame").alias("frame")
    )


# ---------------------------------------------------------------------------
# audio: typed metadata (sample rate / duration) over an opaque payload.
# FAKEAUD:<sample_rate>:<samples…> — one byte per sample in the fake
# format; real codecs raise through the seam.
# ---------------------------------------------------------------------------

_FAKE_AUD_MAGIC = b"FAKEAUD:"

AUDIO_META_TYPE = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
    ]
)


def decode_audio(data: bytes) -> tuple[int, int]:
    """(sample_rate, n_samples); real formats need torchaudio/ffmpeg."""
    if data.startswith(_FAKE_AUD_MAGIC):
        head = data[len(_FAKE_AUD_MAGIC):]
        sr, _, payload = head.partition(b":")
        return int(sr), len(payload)
    raise NotImplementedError(
        "real audio decoding requires torchaudio/ffmpeg, not present "
        "here; supported format: FAKEAUD"
    )


def with_audio_meta(
    df: DataFrame, media_col: str = "media", out: str = "audio_meta"
) -> DataFrame:
    def run(series: pd.Series) -> pd.DataFrame:
        rows = []
        for b in series:
            rec = {"sample_rate": None, "n_samples": None, "duration_ms": None,
                   "ok": False, "err": None}
            try:
                sr, n = decode_audio(bytes(b))
                rec.update(
                    sample_rate=sr, n_samples=n,
                    duration_ms=int(n * 1000 // sr) if sr else 0, ok=True,
                )
            except NotImplementedError as e:
                rec["err"] = str(e)
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"{type(e).__name__}: {e}"
            rows.append(rec)
        return pd.DataFrame(rows)

    udf = F.pandas_udf(run, AUDIO_META_TYPE)
    return df.withColumn(out, udf(F.col(media_col)))
