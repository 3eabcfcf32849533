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


def _bucket_file_state(path: str) -> dict[str, tuple[int, float, str]]:
    """bucket-dir file inventory: name -> (size, mtime, md5)."""
    import hashlib
    import os

    state = {}
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(dirpath, f)
            st = os.stat(fp)
            with open(fp, "rb") as fh:
                digest = hashlib.md5(fh.read()).hexdigest()
            state[os.path.relpath(fp, path)] = (st.st_size, st.st_mtime_ns, digest)
    return state


def test_merge_rewrites_only_touched_buckets(spark, root):
    """Incremental write volume ∝ batch: after a small second run, every
    bucket file the batch did NOT touch must be byte-identical on disk
    (same file, same bytes — not rewritten), and only the batch's url-
    hash buckets may change (VERDICT r01 item 1 done-criterion)."""
    from open_semantic_etl_spark.plans.checkpoint import bucket_expr

    run_incremental(spark, _pages(spark, N1), root)
    t = Tables(root)
    before = _bucket_file_state(t.enriched)
    assert any("_bucket=" in k for k in before), "enriched table is not bucketed"

    # small delta: 5 modified + 5 new urls
    pages2 = _pages(spark, N1 + 5, reseed_from=N1 - 5, reseed_to=N1, alt_seed=3)
    s = run_incremental(spark, pages2, root)
    assert 0 < s["processed"] <= 10

    # buckets the batch legitimately touched
    batch_urls = [page_record(i, 3 if i >= N1 - 5 else 42)["url"] for i in range(N1 - 5, N1 + 5)]
    touched = {
        r[0]
        for r in spark.createDataFrame([(u,) for u in batch_urls], "url string")
        .select(bucket_expr().alias("b")).distinct().collect()
    }

    after = _bucket_file_state(t.enriched)
    changed_buckets = set()
    for name in set(before) | set(after):
        if before.get(name) != after.get(name):
            changed_buckets.add(name.split("/")[0])
    assert changed_buckets, "second run should have rewritten its buckets"
    assert changed_buckets <= {f"_bucket={b}" for b in touched}, (
        f"untouched buckets rewritten: {changed_buckets - {f'_bucket={b}' for b in touched}}"
    )
    # untouched bucket files byte-identical (same inode content AND mtime)
    untouched_before = {k: v for k, v in before.items() if k.split("/")[0] not in changed_buckets}
    for name, sig in untouched_before.items():
        assert after.get(name) == sig, f"untouched file {name} changed"

    # correctness preserved across the pruned merge
    enriched = spark.read.parquet(t.enriched)
    assert enriched.count() == N1 + 5
    assert enriched.filter(F.col("content_txt") != F.col("text")).count() == 0


def test_merge_custom_n_buckets(spark, root):
    """n_buckets is a per-table parameter (VERDICT r3 item 5): a table
    created and merged with n_buckets=8 lays out exactly buckets 0..7,
    stays bucket-pruned on the second merge, and keeps merge
    correctness (new row wins, no dup urls)."""
    import os

    from open_semantic_etl_spark.plans.checkpoint import bucket_expr

    run_incremental(spark, _pages(spark, 100), root, n_buckets=8)
    t = Tables(root)
    dirs = {d for d in os.listdir(t.enriched) if d.startswith("_bucket=")}
    assert dirs <= {f"_bucket={b}" for b in range(8)} and len(dirs) > 1
    before = _bucket_file_state(t.enriched)

    pages2 = _pages(spark, 103, reseed_from=97, reseed_to=100, alt_seed=3)
    s = run_incremental(spark, pages2, root, n_buckets=8)
    assert 0 < s["processed"] <= 6
    batch_urls = [
        page_record(i, 3 if i < 100 else 42)["url"] for i in range(97, 103)
    ]
    touched = {
        r[0]
        for r in spark.createDataFrame([(u,) for u in batch_urls], "url string")
        .select(bucket_expr(n_buckets=8).alias("b")).distinct().collect()
    }
    after = _bucket_file_state(t.enriched)
    changed = {
        name.split("/")[0]
        for name in set(before) | set(after)
        if before.get(name) != after.get(name)
    }
    assert changed and changed <= {f"_bucket={b}" for b in touched}
    enriched = spark.read.parquet(t.enriched)
    assert enriched.count() == 103
    assert enriched.select("url").distinct().count() == 103
    assert enriched.filter(F.col("content_txt") != F.col("text")).count() == 0


def test_legacy_unbucketed_migration(spark, root):
    """a table created before bucketing must migrate cleanly: the first
    merge re-derives _bucket for EVERY row (none in the NULL partition),
    and a later merge updating a pre-migration url replaces — not
    duplicates — it (ADVICE r2 high: NULL-bucket rows were invisible to
    bucketed merges, so updates created stale+new url pairs)."""
    import os

    from open_semantic_etl_spark.plans.checkpoint import merge_by_url

    path = os.path.join(root, "enriched")
    legacy = spark.createDataFrame(
        [(f"u{i}", f"old{i}") for i in range(20)], "url string, val string"
    )
    os.makedirs(root, exist_ok=True)
    legacy.write.mode("overwrite").parquet(path)  # legacy: NOT bucketed

    batch1 = spark.createDataFrame([("u100", "new100")], "url string, val string")
    merge_by_url(spark, batch1, path)
    migrated = spark.read.parquet(path)
    assert "_bucket" in migrated.columns
    assert migrated.filter(F.col("_bucket").isNull()).count() == 0
    assert migrated.count() == 21

    # update a PRE-migration url: must replace, not duplicate
    batch2 = spark.createDataFrame([("u3", "updated3")], "url string, val string")
    merge_by_url(spark, batch2, path)
    after = spark.read.parquet(path)
    assert after.count() == 21
    assert after.filter(F.col("url") == "u3").count() == 1
    assert after.filter(F.col("url") == "u3").first()["val"] == "updated3"
    assert after.select("url").distinct().count() == 21


def test_swap_crash_rolls_forward(spark, root):
    """a crash mid-_swap_buckets (bucket dir renamed away, staged new
    copy parked in __swap) must be recoverable: the next merge rolls the
    staged data forward and no rows are lost (ADVICE r2: the old layout
    orphaned the bucket's untouched rows)."""
    import os
    import shutil

    from open_semantic_etl_spark.plans.checkpoint import (
        merge_by_url,
        recover_swaps,
    )

    path = os.path.join(root, "enriched")
    os.makedirs(root, exist_ok=True)
    df = spark.createDataFrame(
        [(f"u{i}", f"v{i}") for i in range(50)], "url string, val string"
    )
    merge_by_url(spark, df, path)

    # simulate the crash window: one bucket's live dir has been moved to
    # the swap area as old__*, its post-merge replacement staged as new__*
    buckets = [d for d in os.listdir(path) if d.startswith("_bucket=")]
    victim = buckets[0]
    b = victim.split("=")[1]
    sw = f"{path}__swap"
    os.makedirs(sw, exist_ok=True)
    shutil.copytree(os.path.join(path, victim), os.path.join(sw, f"new__{b}__deadbeef"))
    os.rename(os.path.join(path, victim), os.path.join(sw, f"old__{b}__deadbeef"))
    assert not os.path.isdir(os.path.join(path, victim))

    recover_swaps(path)
    assert os.path.isdir(os.path.join(path, victim))
    assert not os.path.isdir(sw)
    recovered = spark.read.parquet(path)
    assert recovered.count() == 50
    assert recovered.select("url").distinct().count() == 50


def test_merge_plan_prunes_partitions(spark, root):
    """the merge's read of the existing table must carry a PartitionFilters
    clause on _bucket — i.e. partition pruning, not a full scan."""
    run_incremental(spark, _pages(spark, 50), root)
    t = Tables(root)
    old = spark.read.parquet(t.enriched).filter(F.col("_bucket").isin([1, 2, 3]))
    plan = old._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [_bucket" in plan.replace("#", " #").replace("  ", " ") or (
        "PartitionFilters" in plan and "_bucket" in plan
    ), plan[:2000]
