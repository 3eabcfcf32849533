"""Structured Streaming ingestion: the filemonitoring replacement.

The reference watches directories with pyinotify and enqueues one
Celery task per CLOSE_WRITE/MOVED_TO event (etl_filemonitoring.py:
24-60). The Spark-native equivalent is a file-source stream over the
pages landing directory: new parquet files are discovered per
micro-batch, run through the SAME batch pipeline via ``foreachBatch``
(exactly-once per sink commit), and merged into the enriched table.

``foreachBatch`` + the url-keyed merge gives the same idempotent
at-least-once semantics as the batch path (plans/checkpoint.py);
checkpointLocation makes the stream resumable mid-run. Windowed
per-event-type metrics with a watermark demonstrate the late-data path
for the events stream table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_semantic_etl_spark.operators.entity_linking import Gazetteer
from open_semantic_etl_spark.plans.checkpoint import N_BUCKETS, merge_by_url
from open_semantic_etl_spark.plans.pipeline import enrich_pages
from open_semantic_etl_spark.schema import PAGES_SCHEMA


def stream_enrich(
    spark: SparkSession,
    landing_dir: str,
    out_root: str,
    checkpoint_dir: str,
    gazetteer: Gazetteer | None = None,
    trigger_once: bool = True,
    n_buckets: int = N_BUCKETS,
):
    """readStream(landing parquet) → enrich → merge into enriched table.

    Returns the StreamingQuery. ``trigger_once`` processes the backlog
    and stops (deterministic for tests/batch-catchup); production would
    use a processingTime trigger. ``n_buckets`` must match the enriched
    table's layout (per-table constant).
    """
    import os

    enriched_path = os.path.join(out_root, "enriched")

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = enrich_pages(batch_df, gazetteer=gazetteer).drop("extract")
        merge_by_url(batch_df.sparkSession, out, enriched_path, n_buckets=n_buckets)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def windowed_event_metrics(events_stream: DataFrame) -> DataFrame:
    """watermarked 5-minute windows per event_type (late data tolerated
    up to 10 minutes) — the streaming-aggregation surface."""
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
