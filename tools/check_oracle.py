"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted by their string rendering). Usage:

    python3 tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        df[c] = df[c].map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from open_semantic_etl_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in sqls:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            continue
        try:
            odf = con.execute(sqls[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        sn, sc, sh = _canon(sdf)
        on, oc, oh = _canon(odf)
        if (sn, sc, sh) == (on, oc, oh):
            print(f"OK    {name}: {sn} rows hash={sh}")
        else:
            failures += 1
            print(f"FAIL  {name}: spark({sn},{sc},{sh}) vs oracle({on},{oc},{oh})")
            merged = sdf.sort_values(by=sorted(sdf.columns)[0]).head(3)
            print("  spark:", merged.to_dict("records"))
            try:
                print("  oracle:", odf.sort_values(by=sorted(odf.columns)[0]).head(3).to_dict("records"))
            except Exception:
                pass
    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
            only=sys.argv[2:] or None,
        )
    )
