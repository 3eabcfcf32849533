"""Export sinks: JSON / print / Solr-doc shaping.

The reference's exporters receive the final ``data`` dict per document
(export_json.py:16-31 json-dump, export_print.py print). Here a whole
DataFrame exports at once, but the OBSERVABLE per-document shape is
preserved: the Solr dynamic-field value model of SURVEY.md §1.3 —
multi-value fields dedupe (etl.py:296 ``list(set(...))``; canonical
order here = first occurrence via ``array_distinct``) and a 1-element
list collapses back to a scalar (etl.py:299-300) — applied at the
export boundary, where the reference applies it on every ``append``.

``export_solr`` itself (set/add-distinct/delete/update_by_query) lives
in plans/checkpoint.py (merge_by_url) and plans/maintenance.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def collapse_single(col: Column) -> Column:
    """1-element array → its scalar, else comma-joined multi-value —
    the etl.py:299-300 collapse, rendered to the string form the Solr
    dynamic-field export carries."""
    deduped = F.array_distinct(col)
    return F.when(F.size(deduped) == 1, F.element_at(deduped, 1)).otherwise(
        F.array_join(deduped, ",")
    )


def export_docs_json(df: DataFrame, array_cols: tuple[str, ...] = ()) -> DataFrame:
    """(url, doc_json): one JSON document per row, the export_json
    shape. ``array_cols`` are multi-value fields that get the dedupe +
    single-value collapse before serialization."""
    out = df
    for c in array_cols:
        out = out.withColumn(c, collapse_single(F.col(c)))
    cols = [c for c in out.columns if c != "url"]
    return out.select(
        "url", F.to_json(F.struct(*cols)).alias("doc_json")
    )


def export_json(df: DataFrame, path: str, array_cols: tuple[str, ...] = ()) -> None:
    """write one JSON object per document (export_json.py:23-29 with a
    directory of part files instead of one growing file)."""
    out = df
    for c in array_cols:
        out = out.withColumn(c, collapse_single(F.col(c)))
    out.write.mode("overwrite").json(path)


def export_print(df: DataFrame, n: int = 20) -> str:
    """export_print equivalent: render the first ``n`` docs (driver-side
    by design — this is the debugging sink, never the scale path)."""
    return df._jdf.showString(n, 0, False)
