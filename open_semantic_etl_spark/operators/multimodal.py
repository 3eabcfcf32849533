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
