"""Sitemap / RSS listing sources → URL tables with incremental skip.

Reimplements the listing halves of the reference's acquisition
connectors as engine operators (the HTTP fetch itself stays an
upstream seam, like the WARC ingest):

- ``etl_sitemap.Connector_Sitemap.index`` (etl_sitemap.py:45-123):
  parse urlset/sitemapindex XML in both the sitemaps.org 0.9 and
  Google 0.84 namespaces; recurse through sub-sitemaps; emit one unit
  of work per ``<loc>``. Here: ``parse_sitemap`` in an Arrow UDF and
  ``expand_sitemaps`` — an iterative driver loop of self-joins against
  the sitemap-document table, i.e. the recursion becomes bounded
  breadth-first join rounds (SURVEY.md §2.1 "recursion → iterative
  driver loop").
- ``etl_rss.Connector_RSS.index`` (etl_rss.py:47-94): one work item
  per feed entry, SKIPPED when ``get_lastmodified`` finds the article
  already indexed. Here: ``rss_items`` (RSS 2.0 + Atom) and
  ``new_items`` — a broadcast-able left-anti join against the indexed
  table, the set-at-a-time form of the per-item Solr point lookup.
"""

from __future__ import annotations

from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SITEMAP_NS = (
    "{http://www.sitemaps.org/schemas/sitemap/0.9}",
    "{http://www.google.com/schemas/sitemap/0.84}",
)

SITEMAP_ENTRY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("loc", T.StringType(), False),
            T.StructField("lastmod", T.StringType(), True),
            T.StructField("is_sitemap", T.BooleanType(), False),
        ]
    )
)


def parse_sitemap(data: bytes | None) -> list[dict]:
    """sitemap XML → entries; ``is_sitemap`` marks sub-sitemap refs
    (etl_sitemap.py:57-87: <sitemap> children of sitemapindex recurse,
    <url> children of urlset are pages; both namespaces accepted)."""
    if not data:
        return []
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError:
        return []
    out: list[dict] = []
    for ns in _SITEMAP_NS:
        for tag, is_map in ((f"{ns}sitemap", True), (f"{ns}url", False)):
            for el in root.iter(tag):
                loc = el.findtext(f"{ns}loc")
                if loc and loc.strip():
                    out.append(
                        {
                            "loc": loc.strip(),
                            "lastmod": (el.findtext(f"{ns}lastmod") or None),
                            "is_sitemap": is_map,
                        }
                    )
    return out


def sitemap_entries(df: DataFrame, id_col: str = "url", bytes_col: str = "xml") -> DataFrame:
    """(url, xml) rows → one row per <loc> with origin back-pointer."""

    def run(series: pd.Series) -> pd.Series:
        return series.map(parse_sitemap)

    udf = F.pandas_udf(run, SITEMAP_ENTRY_TYPE)
    ex = df.withColumn("_e", udf(F.col(bytes_col))).select(
        F.col(id_col).alias("sitemap_url"), F.explode("_e").alias("e")
    )
    return ex.select(
        "sitemap_url",
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.is_sitemap").alias("is_sitemap"),
    )


def expand_sitemaps(
    seeds: DataFrame,
    sitemap_docs: DataFrame,
    max_depth: int = 5,
    id_col: str = "url",
    bytes_col: str = "xml",
) -> DataFrame:
    """breadth-first sub-sitemap expansion (bounded recursion).

    ``seeds``: (seed_url) rows naming entry sitemaps; ``sitemap_docs``:
    the landed (url, xml) sitemap table. Returns (seed_url, page_url,
    lastmod). Each round joins the frontier's sub-sitemap refs back to
    the document table — the reference's ``self.index(url)`` recursion
    (etl_sitemap.py:58-64) as driver-side iteration; depth bounds the
    plan like the reference's implicit call-stack bound.
    """
    # materialize the parsed entry table once — every round reuses it,
    # and checkpointing each round's frontier keeps round k's plan from
    # nesting rounds 1..k-1 (same fix as crawl_frontier)
    entries = sitemap_entries(sitemap_docs, id_col, bytes_col).localCheckpoint()
    frontier = seeds.select(F.col("seed_url"), F.col("seed_url").alias("_cur"))
    pages = None
    for _ in range(max_depth):
        hit = frontier.join(
            entries, frontier["_cur"] == entries["sitemap_url"], "inner"
        ).select("seed_url", "loc", "lastmod", "is_sitemap").localCheckpoint()
        found = hit.filter(~F.col("is_sitemap")).select(
            "seed_url", F.col("loc").alias("page_url"), "lastmod"
        )
        pages = found if pages is None else pages.unionByName(found)
        # dedupe per round: diamond-shaped sitemap graphs (two parents
        # referencing one child) would otherwise multiply duplicate
        # frontier rows exponentially through each join round
        frontier = (
            hit.filter(F.col("is_sitemap"))
            .select("seed_url", F.col("loc").alias("_cur"))
            .dropDuplicates(["seed_url", "_cur"])
        )
        if not frontier.take(1):  # frontier drained → recursion done
            break
    return pages.dropDuplicates(["seed_url", "page_url"])


# ---------------------------------------------------------------------------
# RSS / Atom
# ---------------------------------------------------------------------------

_ATOM_NS = "{http://www.w3.org/2005/Atom}"

RSS_ITEM_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("link", T.StringType(), False),
            T.StructField("title", T.StringType(), True),
            T.StructField("published", T.StringType(), True),
            T.StructField("summary", T.StringType(), True),
        ]
    )
)


def parse_rss(data: bytes | None) -> list[dict]:
    """RSS 2.0 <item> / Atom <entry> → (link, title, published, summary)
    — the fields the reference reads off feedparser entries
    (etl_rss.py:57-60 item.link; Connector_Web consumes the rest)."""
    if not data:
        return []
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError:
        return []
    out: list[dict] = []
    for item in root.iter("item"):  # RSS 2.0
        link = item.findtext("link")
        if link and link.strip():
            out.append(
                {
                    "link": link.strip(),
                    "title": item.findtext("title"),
                    "published": item.findtext("pubDate"),
                    "summary": item.findtext("description"),
                }
            )
    for entry in root.iter(f"{_ATOM_NS}entry"):  # Atom
        link_el = entry.find(f"{_ATOM_NS}link")
        link = link_el.get("href") if link_el is not None else None
        if link and link.strip():
            out.append(
                {
                    "link": link.strip(),
                    "title": entry.findtext(f"{_ATOM_NS}title"),
                    "published": entry.findtext(f"{_ATOM_NS}updated"),
                    "summary": entry.findtext(f"{_ATOM_NS}summary"),
                }
            )
    return out


def rss_items(df: DataFrame, id_col: str = "url", bytes_col: str = "xml") -> DataFrame:
    def run(series: pd.Series) -> pd.Series:
        return series.map(parse_rss)

    udf = F.pandas_udf(run, RSS_ITEM_TYPE)
    ex = df.withColumn("_i", udf(F.col(bytes_col))).select(
        F.col(id_col).alias("feed_url"), F.explode("_i").alias("i")
    )
    return ex.select(
        "feed_url",
        F.col("i.link").alias("url"),
        F.col("i.title").alias("title_txt"),
        F.col("i.published").alias("published"),
        F.col("i.summary").alias("summary_txt"),
    )


def new_items(items: DataFrame, indexed: DataFrame, on: str = "url") -> DataFrame:
    """drop entries already indexed — the reference's per-item
    ``get_lastmodified`` skip (etl_rss.py:64-73) as one left-anti join
    (broadcast the indexed keys when small; key-only shuffle when not)."""
    return items.join(indexed.select(on), on, "left_anti")


# ---------------------------------------------------------------------------
# Hypothes.is annotations (etl_hypothesis.py:45-113): one landed
# annotation row per API item; the in-engine semantics are the fold to
# per-DOCUMENT rows keyed by the ANNOTATED uri (parameters['id'] =
# annotation['uri'], :88) with add-distinct accumulation across
# multiple annotations of the same uri (parameters['add'] = True,
# :83-85), plus the last_update incremental skip (:115-143).
# ---------------------------------------------------------------------------


def hypothesis_docs(
    annotations: DataFrame,
    last_update: str | None = None,
) -> DataFrame:
    """annotations(id, uri, text, tags:array, updated) → one row per
    annotated document: (url, annotation_id_ss, annotation_text_txt,
    annotation_tag_ss) with sorted-distinct accumulation (§1.3 value
    model). ``last_update`` filters to annotations newer than the
    checkpoint — the reference's search_after cursor. Merge into the
    enriched table via maintenance.join_annotations (add-distinct) or
    checkpoint.merge_by_url.
    """
    a = annotations
    if last_update is not None:
        a = a.filter(F.col("updated") > last_update)
    return (
        a.groupBy(F.col("uri").alias("url"))
        .agg(
            F.sort_array(F.collect_set("id")).alias("annotation_id_ss"),
            F.sort_array(F.collect_set("text")).alias("annotation_text_txt"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("tags")))).alias(
                "annotation_tag_ss"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SPARQL — engine side of Connector_SPARQL (etl_sparql.py:17-68). The
# network pull (SPARQLWrapper against an endpoint) stays out of engine
# scope like the other acquisition seams; what the engine owns is the
# RESULT processing: the reference's sparql_select_to_list_file
# (:40-68) walks SELECT results in application/sparql-results+json
# form — bindings outer, head.vars inner — strips each value and
# appends non-empty ones to a dictionary list file (the gazetteer
# input for entity linking). The CONSTRUCT path (:17-33) lands RDF
# that operators/rdf.py already processes (graph → doc-per-subject).
# ---------------------------------------------------------------------------

#: W3C SPARQL 1.1 Query Results JSON Format (only the fields the
#: reference reads; extra binding fields like xml:lang are ignored by
#: from_json's permissive mode)
SPARQL_RESULTS_SCHEMA = (
    "struct<head:struct<vars:array<string>>,"
    "results:struct<bindings:array<map<string,struct<type:string,value:string>>>>>"
)


def sparql_select_values(
    df: DataFrame,
    json_col: str = "json",
    id_col: str | None = None,
    with_pos: bool = False,
) -> DataFrame:
    """SELECT-result JSON payloads → one row per non-empty bound value,
    in the reference's iteration order (bindings outer, ``head.vars``
    inner, values stripped, empties dropped — etl_sparql.py:57-63).

    Output: (``value``) plus ``id_col`` when given; ``with_pos`` adds
    the 0-based ``pos`` ordinal of the value in that walk (posexplode)
    so the iteration ORDER itself is assertable. Pure Column algebra
    (``from_json`` + array transforms — zero Python, no shuffle): at
    corpus scale result pages parse map-side and the exploded values
    feed entity_linking dictionaries or blacklist filters directly.
    """
    from open_semantic_etl_spark.functions.binding import let

    # let-bound: the per-binding lambda closes over the parsed struct;
    # unbound, Catalyst re-runs the whole from_json PER BINDING element
    # (no CSE across HOF lambda boundaries — CLAUDE.md invariant)
    def walk(j: Column) -> Column:
        return F.flatten(
            F.transform(
                j["results"]["bindings"],
                lambda b: F.filter(
                    F.transform(j["head"]["vars"], lambda v: F.trim(b[v]["value"])),
                    lambda x: x.isNotNull() & (x != ""),
                ),
            )
        )

    vals = let(F.from_json(F.col(json_col), SPARQL_RESULTS_SCHEMA), walk)
    cols = [F.col(id_col)] if id_col else []
    if with_pos:
        return df.select(*cols, F.posexplode(vals).alias("pos", "value"))
    return df.select(*cols, F.explode(vals).alias("value"))
