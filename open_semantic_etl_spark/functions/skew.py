"""Skew handling: salting helpers for hot keys (north-rule item).

Unique urls hash evenly under ``xxhash64(url)``, but host-level
operations (per-host aggregates, host-keyed joins) see real skew: one
hot host can be 25%+ of a crawl (the synthetic corpus plants exactly
that). Two standard remedies, both public patterns:

- AQE skew-join splitting (enabled in session.py) fixes JOIN skew at
  runtime;
- for AGGREGATION skew, two-stage salted aggregation: group by
  (key, salt) map-side, then re-aggregate by key — the heavy key's
  work spreads over ``buckets`` partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS, out: str = "_salt") -> DataFrame:
    """deterministic per-row salt (hash of the row's url — stable across
    retries, unlike rand() which breaks task re-execution)."""
    return df.withColumn(out, F.pmod(F.xxhash64("url"), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    key: str | Column,
    aggs: dict[str, Column],
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """two-stage aggregation for skewed keys.

    ``aggs`` maps output name → FIRST-stage aggregate expression; the
    second stage re-combines with the matching combiner (sum for
    count/sum, max for max, min for min — caller supplies re-combinable
    aggregates; non-decomposable aggs don't belong here).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    salted = with_salt(df, buckets)
    stage1 = salted.groupBy(key_col.alias("_key"), F.col("_salt")).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    stage2 = stage1.groupBy("_key").agg(
        *[F.sum(name).alias(name) for name in aggs]
    )
    return stage2.withColumnRenamed("_key", key if isinstance(key, str) else "key")


def host_of(url: Column) -> Column:
    """host extraction for host-level rollups (parse_url is JVM-side)."""
    return F.parse_url(url, F.lit("HOST"))
