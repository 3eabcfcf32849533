"""Benchmark harness: extraction throughput + scaling efficiency.

Prints ONE JSON line:
  {"metric": "extraction_docs_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "scaling": {...}}

Workload (matches BASELINE.json): the full enrichment pipeline
(HTML boilerplate strip → path/title → language id → gazetteer NER →
regex extractors) over a synthetic Common-Crawl-style pages table
derived deterministically from the driver's documents corpus plus the
generator's boilerplate-rich pages (hot host included).

The north rule's two-cluster-size scaling criterion is evidenced
in-sandbox by running the same job at two local parallelism levels
(default local[8] vs local[32]) on the same input:
  efficiency = (T_low / T_high) / (cores_high / cores_low)

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ROWS (default 20000),
SPARK_GRAFT_SCALING=0 to skip the second (low-parallelism) run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _build_input(spark, n_rows: int, parts: int):
    """Deterministic bench corpus written once to a local parquet dir."""
    from open_semantic_etl_spark.sources.pages import pages_df

    path = f"/tmp/spark_graft_bench_pages_{n_rows}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        pages_df(spark, n_rows, partitions=parts).write.mode("overwrite").parquet(path)
    return path


def _gazetteer():
    from open_semantic_etl_spark.operators.entity_linking import (
        Gazetteer,
        GazetteerEntry,
    )

    return Gazetteer(
        entries=[
            GazetteerEntry("urn:stgb", "Strafgesetzbuch", "law_code_ss",
                           ("Strafgesetzbuch", "StGB", "STGB"), ("Law\tDE\tCriminal",)),
            GazetteerEntry("urn:bgb", "Bürgerliches Gesetzbuch", "law_code_ss",
                           ("Bürgerliches Gesetzbuch", "BGB"), ("Law\tDE\tCivil",)),
            GazetteerEntry("urn:usd", "US Dollar", "currency_ss", ("USD", "dollar", "dollars")),
            GazetteerEntry("urn:eur", "Euro", "currency_ss", ("EUR", "EURO")),
        ]
    )


def _run_pipeline(spark, pages_path: str, shuffle: int) -> tuple[float, int]:
    """One full enrichment pass; returns (seconds, docs)."""
    from pyspark.sql import functions as F

    from open_semantic_etl_spark.plans.pipeline import enrich_pages

    pages = spark.read.parquet(pages_path)
    t0 = time.time()
    out = enrich_pages(pages, gazetteer=_gazetteer(), repartition=shuffle)
    # force full materialization of every stage output without collecting
    agg = out.agg(
        F.count("*").alias("docs"),
        F.sum(F.length("content_txt")).alias("content_bytes"),
        F.sum(F.size("entities")).alias("ents"),
        F.sum(F.size("email_ss") + F.size("money_ss") + F.size("law_clause_ss")).alias("hits"),
        F.count(F.when(F.col("content_txt") != F.col("text"), 1)).alias("mismatches"),
    ).first()
    dt = time.time() - t0
    if agg["mismatches"]:
        raise AssertionError(f"byte-identity broken on {agg['mismatches']} docs")
    return dt, agg["docs"]


def _session(cores: int):
    from open_semantic_etl_spark.session import get_spark

    return get_spark(
        app_name=f"bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )


def _steady_state(spark, pages_path: str, shuffle: int, warmups: int = 2, reps: int = 3):
    """min-of-reps wall time after warm-ups (JIT + python-worker pools)."""
    for _ in range(warmups):
        _run_pipeline(spark, pages_path, shuffle)
    best, docs = None, 0
    for _ in range(reps):
        dt, docs = _run_pipeline(spark, pages_path, shuffle)
        best = dt if best is None else min(best, dt)
    return best, docs


def _bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "100000"))
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
    low_cores = max(cpus // 4, 1)

    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)

    # --- high-parallelism run (the headline number) ---
    spark = _session(cpus)
    pages_path = _build_input(spark, n_rows, cpus)
    t_high, docs = _steady_state(spark, pages_path, cpus)
    qtimes = _bench_queries(spark, sf_dir)
    spark.stop()

    result = {
        "metric": "extraction_docs_per_sec",
        "value": round(docs / t_high, 2),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "docs": docs,
        "pipeline_sec_high": round(t_high, 3),
        "cores_high": cpus,
    }

    # --- low-parallelism run (scaling-efficiency evidence) ---
    if do_scaling:
        spark = _session(low_cores)
        t_low, _ = _steady_state(spark, pages_path, low_cores)
        spark.stop()
        ratio = cpus / low_cores
        eff = (t_low / t_high) / ratio
        result["scaling"] = {
            "cores_low": low_cores,
            "pipeline_sec_low": round(t_low, 3),
            "docs_per_sec_low": round(docs / t_low, 2),
            "docs_per_sec_high": round(docs / t_high, 2),
            "efficiency": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
