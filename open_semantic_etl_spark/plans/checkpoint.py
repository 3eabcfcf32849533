"""Incremental, idempotent, resumable runs: checkpoint + merge + lineage.

The Spark-native replacement for the reference's incremental machinery:

- ``filter_file_not_modified`` (filter_file_not_modified.py:25-262) —
  skip documents whose content and completed stages are unchanged —
  becomes a LEFT ANTI JOIN of the input against the checkpoint table on
  ``(url, content_hash, pipeline_version)`` + stage-completeness.
- Solr partial updates (export_solr.py:98-115 'set'/'add-distinct')
  become a MERGE by url into the enriched table.
- Celery ``acks_late`` at-least-once redelivery (tasks.py:34-35)
  becomes: the MERGE commits BEFORE the checkpoint commit, so a crash
  between the two re-processes those urls on the next run and the
  url-keyed MERGE makes the replay idempotent.
- per-plugin timing fields (etl.py:222-238) become per-partition
  lineage rows appended to a metrics table.

Storage: this sandbox has no Iceberg/Delta jars, so tables are parquet
directories HASH-BUCKETED by url — hive-partitioned on
``_bucket = pmod(xxhash64(url), N_BUCKETS)`` — and MERGE is emulated
per bucket: only buckets containing touched urls are read (partition
pruning) and rewritten (per-bucket directory swap); untouched bucket
files stay byte-identical, so incremental write cost tracks the BATCH,
not the table. On a real cluster the same call sites map to ``MERGE
INTO enriched USING batch ON url`` over Iceberg (snapshot commit = our
swap; Iceberg's bucket(url, N) transform = our ``_bucket``; the
copy-on-write MERGE rewrites exactly the same file set).

Scale: the anti-join shuffles only ``(url, content_hash)`` — 16 bytes +
url per row, NOT the html payload: the join is planned on the slim
projection before the extraction stage runs, so unchanged pages never
cross the wire. At 10^12 rows both tables share the url bucketing, so
the checkpoint join co-locates (storage-partitioned join on Iceberg).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_semantic_etl_spark.operators.entity_linking import Gazetteer
from open_semantic_etl_spark.plans.pipeline import (
    PIPELINE_VERSION,
    STAGES,
    content_hash,
    enrich_pages,
)
from open_semantic_etl_spark.schema import METRICS_SCHEMA


#: DEFAULT url-hash bucket count for the enriched/checkpoint tables —
#: every merge/maintenance entry point takes ``n_buckets`` so deployers
#: size it per table. Sizing rule: ``n_buckets ≈ table_bytes /
#: target_rewrite_unit`` where target_rewrite_unit is the bucket-dir
#:  size you are willing to rewrite per touched bucket (1-10 GB on
#: object storage). At 10^12 rows this is O(10^5); the MERGE cost per
#: batch is (touched buckets) × (bucket size) ≈ min(B, N)/N × table
#: for B batch urls — proportional to the BATCH while B ≪ N (the
#: steady incremental-recrawl regime N is sized for), degrading to a
#: full rewrite for bulk B ≥ N batches, where a real Iceberg/Delta
#: MERGE (file-level pruning, merge-on-read deltas) takes over behind
#: the same call site. ``n_buckets`` is a property of the TABLE: every
#: call against one table root must pass the same value (like Iceberg's
#: bucket(url, N) partition transform — changing N is a table rewrite).
N_BUCKETS = 64


def bucket_expr(url_col: str = "url", n_buckets: int = N_BUCKETS) -> F.Column:
    """Iceberg-style bucket transform: pmod(xxhash64(url), N)."""
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int")


class Tables:
    """Directory layout for one enrichment dataset."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.enriched = os.path.join(root, "enriched")
        self.checkpoint = os.path.join(root, "checkpoint")
        self.metrics = os.path.join(root, "metrics")

    def exists(self, path: str) -> bool:
        if not os.path.isdir(path):
            return False
        for _dir, _sub, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """read a bucketed table without its physical partition column."""
    df = spark.read.parquet(path)
    return df.drop("_bucket") if "_bucket" in df.columns else df


def _atomic_overwrite(df: DataFrame, path: str, n_buckets: int = N_BUCKETS) -> None:
    """full-table rewrite in bucketed layout, tmp-dir + swap — the
    snapshot-commit stand-in for non-url-keyed rewrites (delete-by-
    query, schema migration). url-keyed upserts use merge_by_url."""
    if "_bucket" not in df.columns and "url" in df.columns:
        df = df.withColumn("_bucket", bucket_expr(n_buckets=n_buckets))
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if "_bucket" in df.columns:
        writer = writer.partitionBy("_bucket")
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _swap_root(path: str) -> str:
    """sibling staging dir for in-flight bucket swaps — OUTSIDE the
    table dir so partition discovery never sees half-swapped state."""
    return f"{path}__swap"


def recover_swaps(path: str, part_col: str = "_bucket") -> None:
    """roll an interrupted _swap_buckets forward: a bucket whose live
    dir went missing mid-swap is restored from its staged post-merge
    copy (``new__*``); stale stage/old leftovers are dropped. Called at
    the top of every merge/rewrite so replay-after-crash converges.
    ``part_col`` names the hive partition column of the bucket dirs —
    the LSH index delete path reuses this machinery for its ``_bb`` /
    ``_sb`` layouts."""
    sw = _swap_root(path)
    if not os.path.isdir(sw):
        return
    for name in sorted(os.listdir(sw)):  # 'new' sorts before 'old'
        full = os.path.join(sw, name)
        parts = name.split("__", 2)
        if len(parts) == 3 and parts[0] == "new":
            dst = os.path.join(path, f"{part_col}={parts[1]}")
            if not os.path.isdir(dst):
                os.rename(full, dst)
                continue
        shutil.rmtree(full, ignore_errors=True)
    shutil.rmtree(sw, ignore_errors=True)


def _swap_buckets(
    tmp: str, path: str, buckets: list[int], part_col: str = "_bucket"
) -> None:
    """move tmp's bucket dirs over path's — only touched buckets change;
    a bucket absent from tmp (all rows deleted) is removed.

    Staged swap: each post-merge bucket dir is first parked in the
    sibling ``__swap`` dir, so every crash window leaves either the old
    or the complete new data for the bucket on disk; recover_swaps()
    rolls an interrupted swap forward before the next merge reads the
    table (Iceberg equivalent: snapshot commit, where this is free)."""
    sw = _swap_root(path)
    os.makedirs(sw, exist_ok=True)
    token = uuid.uuid4().hex[:8]
    for b in buckets:
        src = os.path.join(tmp, f"{part_col}={b}")
        dst = os.path.join(path, f"{part_col}={b}")
        stage = os.path.join(sw, f"new__{b}__{token}")
        old = os.path.join(sw, f"old__{b}__{token}")
        if os.path.isdir(src):
            os.rename(src, stage)
        if os.path.isdir(dst):
            os.rename(dst, old)
        if os.path.isdir(stage):
            os.rename(stage, dst)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(sw, ignore_errors=True)


def touched_buckets(new: DataFrame, n_buckets: int = N_BUCKETS) -> list[int]:
    """distinct bucket ids of the batch — ≤ N_BUCKETS ints, driver-safe."""
    return [
        r[0]
        for r in new.select(bucket_expr(n_buckets=n_buckets).alias("b")).distinct().collect()
    ]


def merge_by_url(
    spark: SparkSession, new: DataFrame, path: str, n_buckets: int = N_BUCKETS
) -> None:
    """MERGE new INTO path ON url (new row wins) — export_solr 'set'.

    Bucket-pruned: reads and rewrites ONLY the url-hash buckets the
    batch touches (partition filter on ``_bucket``); every other bucket
    file is untouched on disk. Iceberg equivalent: copy-on-write
    ``MERGE INTO t USING batch ON t.url = batch.url`` with the table
    bucket(url, N)-partitioned. Idempotent under replay (crash between
    bucket swaps re-merges by url to the same result).

    ``n_buckets`` must match the value the table was created with (see
    the N_BUCKETS sizing rule); it is a per-table constant, not a
    per-call tuning knob.
    """
    new = new.withColumn("_bucket", bucket_expr(n_buckets=n_buckets))
    if not Tables(os.path.dirname(path)).exists(path):
        new.write.mode("overwrite").partitionBy("_bucket").parquet(path)
        return
    recover_swaps(path)
    buckets = [r[0] for r in new.select("_bucket").distinct().collect()]
    old = spark.read.parquet(path)
    if "_bucket" not in old.columns:  # legacy unbucketed layout
        # migration rewrite: drop the batch's _bucket so _atomic_overwrite
        # re-derives it for EVERY row — otherwise legacy rows land in the
        # __HIVE_DEFAULT_PARTITION__ (NULL) bucket that later bucketed
        # merges never read, and updating such a url duplicates it
        merged = old.join(new.select("url"), "url", "left_anti").unionByName(
            new.drop("_bucket"), allowMissingColumns=True
        )
        _atomic_overwrite(merged.drop("_bucket"), path, n_buckets=n_buckets)
        return
    old_touched = old.filter(F.col("_bucket").isin(buckets))
    merged = old_touched.join(new.select("url"), "url", "left_anti").unionByName(
        new, allowMissingColumns=True
    )
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
    _swap_buckets(tmp, path, buckets)


def pending_rows(
    spark: SparkSession,
    pages: DataFrame,
    tables: Tables,
    stages: tuple[str, ...] = STAGES,
) -> DataFrame:
    """filter_file_not_modified semantics: keep rows that are new, whose
    content changed, whose pipeline version changed, or that miss any of
    the requested stages (filter_file_not_modified.py:111-159)."""
    if not tables.exists(tables.checkpoint):
        return pages
    cp = spark.read.parquet(tables.checkpoint)
    done = cp.filter(
        (F.col("pipeline_version") == PIPELINE_VERSION)
        & (F.size(F.array_except(F.array(*[F.lit(s) for s in stages]), F.col("stages_done"))) == 0)
    ).select("url", "content_hash")
    # two-step join so html NEVER rides a shuffle:
    #  1. anti-join on the KEY PROJECTION only (url + 8-byte hash) — the
    #     wide html column is not in this plan at all;
    #  2. semi-join pages against the (usually tiny) todo key set — in
    #     the steady incremental state AQE broadcasts it, so the full
    #     pages scan is never exchanged. At 10^12 rows with both tables
    #     bucketed by url (Iceberg storage-partitioned join) step 2 is
    #     shuffle-free even for large deltas.
    keys = pages.select("url", content_hash().alias("content_hash"))
    todo_keys = keys.join(done, ["url", "content_hash"], "left_anti").select("url")
    return pages.join(todo_keys, "url", "left_semi")


def _with_partition_metrics(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """append lineage columns; metrics aggregate per partition at write."""
    return df.withColumn("_partition_id", F.spark_partition_id()).withColumn(
        "_run_id", F.lit(run_id)
    )


def batch_metrics(out: DataFrame, run_id: str, elapsed_ms: int) -> DataFrame:
    """per-partition lineage rollup computed FROM THE IN-FLIGHT BATCH —
    this plan must never scan the (table-sized) enriched output; run
    cost tracks the batch (plan-audited in tools/explain_audit.py)."""
    return (
        out.groupBy("_partition_id")
        .agg(
            F.count("*").alias("docs"),
            F.coalesce(F.sum("file_size_i"), F.lit(0)).alias("bytes_in"),
            F.coalesce(F.sum(F.length("content_txt")), F.lit(0)).alias("bytes_out"),
            F.coalesce(
                F.sum(F.when(~F.col("extract_ok"), 1).otherwise(0)), F.lit(0)
            ).alias("failures"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit("enrich").alias("stage"),
            F.col("_partition_id").cast("int").alias("partition_id"),
            F.col("docs").cast("long"),
            F.col("bytes_in").cast("long"),
            F.col("bytes_out").cast("long"),
            F.col("failures").cast("long"),
            F.lit(elapsed_ms).cast("long").alias("elapsed_ms"),
        )
    )


def run_incremental(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    gazetteer: Gazetteer | None = None,
    stages: tuple[str, ...] = STAGES,
    repartition: int | None = None,
    run_id: str | None = None,
    fail_before_checkpoint: bool = False,
    n_buckets: int = N_BUCKETS,
) -> dict:
    """One resumable enrichment run; returns run stats.

    ``fail_before_checkpoint`` simulates a crash after the output MERGE
    but before the checkpoint commit (test hook for the acks_late
    replay semantics — FIXTURES.md §4 kill-and-rerun).
    """
    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:12]
    tables = Tables(root)
    os.makedirs(root, exist_ok=True)

    todo = pending_rows(spark, pages, tables, stages)
    enriched = enrich_pages(todo, gazetteer=gazetteer, repartition=repartition)
    enriched = _with_partition_metrics(enriched, run_id, "enrich")

    # persist the in-flight batch ONCE: the merge, metrics rollup, and
    # checkpoint rows all read it, and none of them may re-scan the
    # (table-sized) enriched output — run cost must track the batch
    out = enriched.persist()

    # 1. output commit (MERGE by url — idempotent under replay,
    #    bucket-pruned so write volume ∝ batch)
    merge_by_url(spark, out, tables.enriched, n_buckets=n_buckets)

    if fail_before_checkpoint:
        out.unpersist()
        raise RuntimeError("simulated crash between merge and checkpoint commit")

    # 2. lineage/metrics commit — per-partition rollup from the batch
    elapsed_ms = int((time.time() - t0) * 1000)
    metrics = batch_metrics(out, run_id, elapsed_ms)
    metrics.write.mode("append").parquet(tables.metrics)

    # 3. checkpoint commit (AFTER output — crash replays, never skips);
    #    url-keyed upsert → same bucket-pruned merge as the output
    ckpt = (
        out.select("url", "content_hash")
        .withColumn("stages_done", F.array(*[F.lit(s) for s in stages]))
        .withColumn("pipeline_version", F.lit(PIPELINE_VERSION))
    )
    merge_by_url(spark, ckpt, tables.checkpoint, n_buckets=n_buckets)

    n_done = out.count()
    out.unpersist()
    return {
        "run_id": run_id,
        "processed": n_done,
        "elapsed_ms": int((time.time() - t0) * 1000),
    }
