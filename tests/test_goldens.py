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
        ann_lsh_golden,
        language_golden,
        minhash_lsh_golden,
        simhash_golden,
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
        ("language_detect", language_golden(docs), dkey),
    ):
        stored = pd.read_parquet(f"{GOLD}/{name}.parquet")
        stored = stored[stored["_key"] == key].drop(columns="_key").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            stored.sort_values(list(stored.columns)).reset_index(drop=True),
            fresh.astype(dict(stored.dtypes)).sort_values(list(fresh.columns)).reset_index(drop=True),
            check_dtype=False,
        )
