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
    combiners: "dict[str, object] | None" = None,
) -> DataFrame:
    """two-stage aggregation for skewed keys.

    ``aggs`` maps output name → FIRST-stage aggregate expression; the
    second stage re-combines each column with ``combiners[name]``
    (a callable like ``F.sum``/``F.max``/``F.min``), defaulting to
    ``F.sum`` — correct for count/sum. max/min aggregates MUST pass
    the matching combiner; non-decomposable aggs (avg, distinct)
    don't belong here (decompose them into sum/count first).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    comb = combiners or {}
    salted = with_salt(df, buckets)
    stage1 = salted.groupBy(key_col.alias("_key"), F.col("_salt")).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    stage2 = stage1.groupBy("_key").agg(
        *[comb.get(name, F.sum)(name).alias(name) for name in aggs]
    )
    return stage2.withColumnRenamed("_key", key if isinstance(key, str) else "key")


def host_of(url: Column) -> Column:
    """host extraction for host-level rollups (parse_url is JVM-side)."""
    return F.parse_url(url, F.lit("HOST"))


def top_k_per_key(
    df: DataFrame,
    key: str | Column,
    k: int,
    order_col: str,
    id_col: str,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """bounded top-``k`` rows per (possibly hot) key — the per-host
    frequency-cap primitive of a crawl-diversification pass (keep at
    most K pages per host so one boilerplate-heavy domain cannot
    dominate a training corpus).

    Adds ``kept_i`` (1 = within the key's top-k by ``(order_col,
    id_col)`` ascending). The naive shapes both break at corpus scale:
    a window over the key sends every row of the hottest key to one
    task, and a plain ``collect_list`` groupBy buffers the whole key on
    one reducer before slicing. Instead: two-phase salted candidate
    selection —

    1. group by (key, salt(id)) and keep each group's local top-k
       (``slice(array_sort(collect_list(struct)))``): the hot key's
       rows spread over ``buckets`` groups, every group's output is
       ≤ k rows, and only (order, id) ride the shuffle;
    2. reduce the ≤ buckets×k candidates per key to ONE row per key:
       the k-th smallest (order, id) struct — the key's admission
       CUTOFF;
    3. join the cutoff dim back on the key (broadcast here; at 10^8
       hosts the dim is a few GB — shard it, or co-locate the join by
       bucketing the corpus on host as the enriched tables already do
       on url) and keep rows whose (order, id) ≤ cutoff. Payload
       columns never leave their input partitions.

    Correctness is oracle-pinned against a row_number() window in
    DuckDB.
    """
    keyc = F.col(key) if isinstance(key, str) else key
    ids = df.select(
        keyc.alias("_key"),
        F.struct(F.col(order_col).alias("o"), F.col(id_col).alias("i")).alias("_s"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)).alias("_salt"),
    )
    local = ids.groupBy("_key", "_salt").agg(
        F.slice(F.array_sort(F.collect_list("_s")), 1, k).alias("_c")
    )
    cutoffs = (
        local.select("_key", F.explode("_c").alias("_s"))
        .groupBy("_key")
        .agg(F.slice(F.array_sort(F.collect_list("_s")), 1, k).alias("_c"))
        .select(
            "_key",
            F.element_at(F.col("_c"), F.least(F.lit(k), F.size("_c"))).alias("_cut"),
        )
    )
    # null-safe join: a NULL key is its own group (row_number() window
    # semantics, which the oracle pins) — a plain == would leave NULL-
    # key rows cutoff-less and silently drop them all (kept_i = 0)
    out = df.join(F.broadcast(cutoffs), keyc.eqNullSafe(cutoffs["_key"]), "left")
    verdict = (
        F.struct(F.col(order_col).alias("o"), F.col(id_col).alias("i")) <= F.col("_cut")
    )
    return out.withColumn(
        "kept_i", F.coalesce(verdict, F.lit(False)).cast("int")
    ).drop("_key", "_cut")


def stratified_sample(
    df: DataFrame,
    stratum: str | Column,
    rates: dict[str, float],
    id_col: str = "url",
    default_rate: float = 0.0,
    out: str = "sampled_i",
) -> DataFrame:
    """deterministic per-stratum Bernoulli sampling — the corpus-MIXING
    step of a training-data pipeline (per-language / per-source quotas,
    e.g. upsample books, downsample boilerplate-heavy domains).

    Unlike ``df.sampleBy`` (seeded RNG over a row's partition/offset,
    so results change under repartition or task retry), the verdict
    here is a pure function of the ROW: keep iff
    ``pmod(xxhash64(id), 10^6) < rate·10^6``. Deterministic across
    retries, replays, and cluster layouts — the property the
    checkpoint/resume tier requires — and, because xxhash64 spreads
    uniformly, the realized rate converges to the quota per stratum.
    Map-only Column algebra: zero shuffle, composes with any plan.

    ``rates`` maps stratum value → keep fraction in [0, 1]; unmapped
    strata get ``default_rate``.
    """
    sc = F.col(stratum) if isinstance(stratum, str) else stratum
    rate = F.lit(float(default_rate))
    for val, r in sorted(rates.items()):
        rate = F.when(sc == val, F.lit(float(r))).otherwise(rate)
    draw = F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000))
    return df.withColumn(
        out, (draw < (rate * 1_000_000).cast("long")).cast("int")
    )
