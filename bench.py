"""Benchmark harness: extraction throughput + scaling efficiency.

Prints ONE JSON line:
  {"metric": "extraction_docs_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "scaling": {...}}

Workload (matches BASELINE.json): the full enrichment pipeline —
fused single-pass Python stage (HTML boilerplate strip + language id +
gazetteer NER + numerize) followed by JVM-only column stages — over a
synthetic Common-Crawl-style pages table with explicit
``repartition(N, xxhash64(url))`` (the north-rule job shape, hot host
included).

Scaling methodology (no real cluster in this sandbox): the same job
runs at two local parallelism levels (default local[8] vs local[32]).
A single box does NOT scale like a cluster — 4× busy cores share one
memory system and drop turbo frequency — so the harness also measures
the HARDWARE CEILING: the same extraction kernel under plain
``multiprocessing`` at the same two widths. Reported:
  efficiency_raw        = (T_low / T_high) / (cores_high / cores_low)
  efficiency_vs_hw      = efficiency_raw / hw_ceiling_efficiency
The second number is the pipeline's own scaling quality (what would
carry to N→4N executor machines, which multiply memory systems too).
Plan construction/Catalyst analysis is excluded from the timed region —
a production job plans once and processes 100 TB.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ROWS (default 100000),
SPARK_GRAFT_SCALING=0 to skip scaling runs.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_HW_N = 24000
_HW_HTML: list[bytes] = []


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


def _session(cores: int):
    from open_semantic_etl_spark.session import get_spark

    return get_spark(
        app_name=f"bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )


def _steady_state(spark, pages_path: str, cores: int, warmups: int = 1, reps: int = 3):
    """min-of-reps action wall time; plan built once outside the timer."""
    from pyspark.sql import functions as F

    from open_semantic_etl_spark.plans.pipeline import enrich_pages

    pages = spark.read.parquet(pages_path)
    out = enrich_pages(pages, gazetteer=_gazetteer(), repartition=cores)
    agg = out.agg(
        F.count("*").alias("docs"),
        F.sum(F.length("content_txt")).alias("content_bytes"),
        F.sum(F.size("entities")).alias("ents"),
        F.sum(F.size("email_ss") + F.size("money_ss") + F.size("law_clause_ss")).alias("hits"),
        F.count(F.when(F.col("content_txt") != F.col("text"), 1)).alias("mismatches"),
    )
    for _ in range(warmups):
        row = agg.first()
    best = None
    docs = 0
    for _ in range(reps):
        t0 = time.time()
        row = agg.first()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        docs = row["docs"]
    if row["mismatches"]:
        raise AssertionError(f"byte-identity broken on {row['mismatches']} docs")
    return best, docs


# --- hardware-ceiling probe: same kernel, plain multiprocessing -----------


def _hw_work(args):
    lo, hi = args
    from open_semantic_etl_spark.operators.htmlx import extract_html

    for i in range(lo, hi):
        extract_html(_HW_HTML[i])


def _hw_ceiling(low: int, high: int) -> dict:
    """measure this box's own scaling of the extraction kernel."""
    global _HW_HTML
    from open_semantic_etl_spark.sources.pages import page_record

    _HW_HTML = [page_record(i)["html"] for i in range(_HW_N)]
    res = {}
    for procs in (low, high, low, high):
        chunk = _HW_N // procs
        jobs = [(i * chunk, (i + 1) * chunk) for i in range(procs)]
        with mp.Pool(procs) as p:  # fork → corpus shared copy-on-write
            p.map(_hw_work, jobs)  # warm
            t0 = time.time()
            p.map(_hw_work, jobs)
            dt = time.time() - t0
        res[procs] = min(res.get(procs, dt), dt)
    _HW_HTML = []
    eff = (res[low] / res[high]) / (high / low)
    return {"procs": [low, high], "sec": [round(res[low], 3), round(res[high], 3)],
            "efficiency": round(eff, 3)}


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

    spark = _session(cpus)
    pages_path = _build_input(spark, n_rows, cpus)
    t_high, docs = _steady_state(spark, pages_path, cpus)
    qtimes = _bench_queries(spark, sf_dir)
    spark.stop()

    if do_scaling:
        # alternate low/high sessions so ambient VM noise hits both
        # levels symmetrically; keep the best (steady-state) per level
        t_low = None
        for cores in (low_cores, cpus, low_cores):
            spark = _session(cores)
            t, _ = _steady_state(spark, pages_path, cores, warmups=1, reps=2)
            spark.stop()
            if cores == cpus:
                t_high = min(t_high, t)
            else:
                t_low = t if t_low is None else min(t_low, t)

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

    if do_scaling:
        ratio = cpus / low_cores
        eff = (t_low / t_high) / ratio
        hw = _hw_ceiling(low_cores, cpus)
        result["scaling"] = {
            "cores_low": low_cores,
            "pipeline_sec_low": round(t_low, 3),
            "docs_per_sec_low": round(docs / t_low, 2),
            "docs_per_sec_high": round(docs / t_high, 2),
            "efficiency_raw": round(eff, 3),
            "hw_ceiling": hw,
            "efficiency_vs_hw": round(min(eff / hw["efficiency"], 1.0), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
