"""The committed golden parquets must stay in sync with the generator
(tools/gen_goldens.py) — drift here means the oracle_sql() entries for
the seeded kernels pin stale expectations."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
GOLD = "/root/repo/goldens"


def test_goldens_match_generator():
    from tools.gen_goldens import (
        ann_ivf_golden,
        ann_ivfpq_golden,
        ann_lsh_golden,
        ann_pq_golden,
        language_golden,
        minhash_lsh_golden,
        semdedup_golden,
        simhash_golden,
        stratified_sample_golden,
    )

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    dkey = int(docs["n_chars"].sum())
    ekey = int(emb["label"].sum()) * 1_000_003 + len(emb)
    for name, fresh, key in (
        ("minhash_lsh", minhash_lsh_golden(docs), dkey),
        ("simhash", simhash_golden(docs), dkey),
        ("ann_lsh", ann_lsh_golden(emb), ekey),
        ("ann_ivf", ann_ivf_golden(emb), ekey),
        ("ann_pq", ann_pq_golden(emb), ekey),
        ("ann_ivfpq", ann_ivfpq_golden(emb), ekey),
        ("semdedup", semdedup_golden(emb), ekey),
        ("language_detect", language_golden(docs), dkey),
        ("stratified_sample", stratified_sample_golden(docs), dkey),
    ):
        stored = pd.read_parquet(f"{GOLD}/{name}.parquet")
        stored = stored[stored["_key"] == key].drop(columns="_key").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            stored.sort_values(list(stored.columns)).reset_index(drop=True),
            fresh.astype(dict(stored.dtypes)).sort_values(list(fresh.columns)).reset_index(drop=True),
            check_dtype=False,
        )


def test_xxh64_long_matches_spark(spark):
    """the golden generator's pure-Python XXH64 is bit-equal to Spark's
    F.xxhash64 on longs (the hash the sampler verdict derives from)."""
    from pyspark.sql import functions as F

    from tools.gen_goldens import xxh64_long

    vals = [0, 1, 42, -1, 123456789, 2**62, -(2**62), 999999999999]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    assert all(got[v] == xxh64_long(v) for v in vals)
