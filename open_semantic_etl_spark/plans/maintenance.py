"""Index-maintenance operators: delete, move, annotation/sidecar joins.

Small utilities completing the reference's operator surface:

- ``delete_by_url`` / ``delete_where``: etl_delete.py:52-67 (`Delete`
  by id / by query) → anti-join rewrite of the enriched table
  (Iceberg: ``DELETE FROM enriched WHERE url = ?``).
- ``move_url``: move_indexed_file.py:9-53 — rewrite a document's id and
  its derived path facets after a filesystem move.
- ``join_annotations``: enhance_annotations.py:21-39 — pull external
  per-url annotations via a LEFT JOIN against an annotations table
  (replaces the per-doc HTTP GET; add-distinct merge = array_union).
- ``join_sidecar``: enhance_xml.py:8-25 / enhance_xmp.py:70-133 —
  sidecar metadata files joined on the filename stem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from open_semantic_etl_spark.functions.path import with_path_facets
from open_semantic_etl_spark.plans.checkpoint import Tables, _atomic_overwrite


def delete_by_url(spark: SparkSession, root: str, urls: list[str]) -> int:
    """remove documents by id from the enriched table (etl_delete)."""
    tables = Tables(root)
    df = spark.read.parquet(tables.enriched)
    n_before = df.count()
    remaining = df.filter(~F.col("url").isin(urls))
    _atomic_overwrite(remaining, tables.enriched)
    if tables.exists(tables.checkpoint):
        cp = spark.read.parquet(tables.checkpoint).filter(~F.col("url").isin(urls))
        _atomic_overwrite(cp, tables.checkpoint)
    return n_before - spark.read.parquet(tables.enriched).count()


def delete_where(spark: SparkSession, root: str, predicate: Column) -> int:
    """empty-index / delete-by-query form (etl_delete.py:64-67)."""
    tables = Tables(root)
    df = spark.read.parquet(tables.enriched)
    n_before = df.count()
    _atomic_overwrite(df.filter(~predicate), tables.enriched)
    return n_before - spark.read.parquet(tables.enriched).count()


def move_url(spark: SparkSession, root: str, src: str, dst: str) -> None:
    """rewrite a moved document's id + path facets (move_indexed_file)."""
    tables = Tables(root)
    df = spark.read.parquet(tables.enriched)
    moved = df.withColumn(
        "url", F.when(F.col("url") == src, F.lit(dst)).otherwise(F.col("url"))
    )
    # recompute derived path facets for the changed row set
    path_cols = [c for c in moved.columns if c.startswith("path") or c == "filename_extension_s"]
    refreshed = with_path_facets(moved.drop(*path_cols), id_col="url")
    _atomic_overwrite(refreshed.select(*df.columns), tables.enriched)


def join_annotations(
    df: DataFrame, annotations: DataFrame, on: str = "url", merge_cols: tuple[str, ...] = ()
) -> DataFrame:
    """LEFT JOIN external annotations; array columns merge add-distinct
    (export_solr.py:110 semantics) when present on both sides."""
    ann = annotations
    overlap = [c for c in ann.columns if c in df.columns and c != on]
    for c in overlap:
        ann = ann.withColumnRenamed(c, f"_ann_{c}")
    out = df.join(F.broadcast(ann), on, "left")
    for c in overlap:
        if c in merge_cols:
            out = out.withColumn(
                c, F.array_union(F.coalesce(F.col(c), F.array()), F.coalesce(F.col(f"_ann_{c}"), F.array()))
            )
        else:
            out = out.withColumn(c, F.coalesce(F.col(f"_ann_{c}"), F.col(c)))
        out = out.drop(f"_ann_{c}")
    return out


def join_sidecar(
    df: DataFrame, sidecar: DataFrame, id_col: str = "url", sidecar_suffix: str = ".xmp"
) -> DataFrame:
    """join sidecar metadata on the data file's stem: sidecar rows are
    keyed by '<datafile><suffix>' (enhance_xmp filename convention)."""
    key = F.regexp_replace(F.col("_sidecar_key"), F.lit(sidecar_suffix + "$"), F.lit(""))
    sc = sidecar.withColumnRenamed(id_col, "_sidecar_key").withColumn(
        "_join_key", key
    ).drop("_sidecar_key")
    return df.join(F.broadcast(sc), df[id_col] == sc["_join_key"], "left").drop("_join_key")
