"""Checkpoint/resume correctness (FIXTURES.md §4 two-run + kill-rerun).

Proves the filter_file_not_modified semantics (only new/changed rows
reprocess) and the acks_late replay analogue (crash between output
MERGE and checkpoint commit → rerun converges idempotently).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_semantic_etl_spark.plans.checkpoint import Tables, run_incremental
from open_semantic_etl_spark.schema import PAGES_SCHEMA
from open_semantic_etl_spark.sources.pages import page_record

N1 = 200  # initial corpus
N_MOD = 20  # rows 180..199 get modified html in run 2 (same url, new seed)
N_NEW = 20  # rows 200..219 are new urls in run 2


def _pages(spark, n, reseed_from=None, reseed_to=None, alt_seed=7):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                seed = alt_seed if (reseed_from is not None and reseed_from <= i < reseed_to) else 42
                rows.append(page_record(i, seed))
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return spark.range(n, numPartitions=4).mapInPandas(gen, schema=PAGES_SCHEMA)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "dataset")


def test_incremental_and_replay(spark, root):
    pages1 = _pages(spark, N1)

    # run 1: everything processes
    s1 = run_incremental(spark, pages1, root)
    assert s1["processed"] == N1
    t = Tables(root)
    enriched = spark.read.parquet(t.enriched)
    assert enriched.count() == N1
    assert enriched.filter(F.col("content_txt") != F.col("text")).count() == 0

    # run 1b: same input → nothing to do
    s1b = run_incremental(spark, pages1, root)
    assert s1b["processed"] == 0
    assert spark.read.parquet(t.enriched).count() == N1

    # run 2: 10% modified html (same urls), 10% new urls. Variant 9
    # (i % 10 == 9) has seed-independent constant html — its hash does
    # not change, so the checkpoint must SKIP those reseeded rows.
    n_actually_modified = sum(
        1 for i in range(N1 - N_MOD, N1) if page_record(i, 42)["html"] != page_record(i, 7)["html"]
    )
    assert n_actually_modified == N_MOD - 2
    pages2 = _pages(spark, N1 + N_NEW, reseed_from=N1 - N_MOD, reseed_to=N1)
    s2 = run_incremental(spark, pages2, root)
    assert s2["processed"] == n_actually_modified + N_NEW
    enriched2 = spark.read.parquet(t.enriched)
    assert enriched2.count() == N1 + N_NEW
    # modified rows carry the NEW content (url-keyed merge: new wins)
    assert enriched2.filter(F.col("content_txt") != F.col("text")).count() == 0

    # metrics lineage: per-partition docs sum to processed counts
    metrics = spark.read.parquet(t.metrics)
    per_run = {
        r["run_id"]: r["docs"]
        for r in metrics.groupBy("run_id").agg(F.sum("docs").alias("docs")).collect()
    }
    assert per_run[s1["run_id"]] == N1
    assert per_run[s2["run_id"]] == n_actually_modified + N_NEW
    assert metrics.select("partition_id").distinct().count() >= 1


def test_kill_and_rerun_converges(spark, root):
    pages = _pages(spark, 100)
    run_incremental(spark, pages, root)

    # modify 20 rows, then crash between MERGE and checkpoint commit
    pages_mod = _pages(spark, 100, reseed_from=80, reseed_to=100)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_incremental(spark, pages_mod, root, fail_before_checkpoint=True)

    # rerun after the crash: the changed rows REPLAY (checkpoint never
    # committed), and the url-keyed merge keeps the table consistent
    n_changed = sum(
        1 for i in range(80, 100) if page_record(i, 42)["html"] != page_record(i, 7)["html"]
    )
    s = run_incremental(spark, pages_mod, root)
    assert s["processed"] == n_changed

    t = Tables(root)
    enriched = spark.read.parquet(t.enriched)
    assert enriched.count() == 100
    assert enriched.select("url").distinct().count() == 100  # no dup urls
    assert enriched.filter(F.col("content_txt") != F.col("text")).count() == 0

    # a further run is a no-op
    assert run_incremental(spark, pages_mod, root)["processed"] == 0
