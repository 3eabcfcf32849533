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


# ---------------------------------------------------------------------------
# Elasticsearch sink shape (export_elasticsearch.py:38-53): index each
# document by id with the data dict as body. At scale the observable
# wire format is the `_bulk` NDJSON — an action line naming
# (_index, _id) followed by the document line.
# ---------------------------------------------------------------------------


def export_es_bulk(
    df: DataFrame, index: str, id_col: str = "url", array_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(action_json, doc_json) per document — the `_bulk` body pairs.
    Feed to `es.bulk` / write as NDJSON; the per-doc value model is the
    same §1.3 collapse as export_json."""
    out = df
    for c in array_cols:
        out = out.withColumn(c, collapse_single(F.col(c)))
    doc_cols = [c for c in out.columns if c != id_col]
    action = F.to_json(
        F.struct(
            F.struct(
                F.lit(index).alias("_index"), F.col(id_col).alias("_id")
            ).alias("index")
        )
    )
    return out.select(
        F.col(id_col),
        action.alias("action_json"),
        F.to_json(F.struct(*doc_cols)).alias("doc_json"),
    )


# ---------------------------------------------------------------------------
# Neo4j sink shape (export_neo4j.py:50-104): one Document node per doc
# (name=id, title + configured property facets), one entity node per
# value of each non-property facet, one relationship Document→Entity.
# At scale the observable shape is the bulk-import table pair
# (nodes, relationships) — MERGE-by-name becomes distinct on the key.
# ---------------------------------------------------------------------------

#: facets whose relationship label collapses to the NER umbrella
#: (export_neo4j.py:82-83)
NER_REL_FACETS = ("person_ss", "organization_ss", "location_ss")
NER_REL_LABEL = "Named Entity Recognition"


def export_neo4j_graph(
    df: DataFrame,
    facet_labels: dict[str, str],
    id_col: str = "url",
    title_col: str = "title_txt",
) -> tuple[DataFrame, DataFrame]:
    """(nodes, relationships) DataFrames for bulk import.

    ``facet_labels`` maps array facet columns to their node label (the
    ``parameters['facets'][f]['label']`` config). nodes =
    (label, name, title); relationships =
    (doc_name, rel_type, entity_label, entity_name).
    """
    doc_nodes = df.select(
        F.lit("Document").alias("label"),
        F.col(id_col).alias("name"),
        (F.col(title_col) if title_col in df.columns else F.lit(None).cast("string")).alias("title"),
    ).dropDuplicates(["name"])

    ent_parts = []
    rel_parts = []
    for facet, label in facet_labels.items():
        rel_type = NER_REL_LABEL if facet in NER_REL_FACETS else label
        ex = df.select(
            F.col(id_col).alias("doc_name"), F.explode(facet).alias("entity_name")
        )
        ent_parts.append(
            ex.select(
                F.lit(label).alias("label"),
                F.col("entity_name").alias("name"),
                F.lit(None).cast("string").alias("title"),
            )
        )
        rel_parts.append(
            ex.select(
                "doc_name",
                F.lit(rel_type).alias("rel_type"),
                F.lit(label).alias("entity_label"),
                "entity_name",
            )
        )
    nodes = doc_nodes
    for p in ent_parts:
        nodes = nodes.unionByName(p)
    nodes = nodes.dropDuplicates(["label", "name"])  # graph.merge by name
    rels = rel_parts[0]
    for p in rel_parts[1:]:
        rels = rels.unionByName(p)
    rels = rels.dropDuplicates()  # graph.merge relationship
    return nodes, rels
