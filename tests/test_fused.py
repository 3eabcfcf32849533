"""Fused single-pass stage must equal the modular operator chain."""

from __future__ import annotations

from open_semantic_etl_spark.operators.entity_linking import Gazetteer, GazetteerEntry
from open_semantic_etl_spark.plans.pipeline import enrich_pages
from open_semantic_etl_spark.sources.pages import pages_df

_GAZ = Gazetteer(
    entries=[
        GazetteerEntry("urn:stgb", "Strafgesetzbuch", "law_code_ss",
                       ("Strafgesetzbuch", "StGB"), ("Law\tDE\tCriminal",)),
        GazetteerEntry("urn:usd", "US Dollar", "currency_ss", ("USD", "dollar", "dollars")),
    ]
)

_COLS = [
    "url", "content_txt", "title_txt", "language_s", "email_ss", "money_ss",
    "law_clause_ss", "law_code_ss", "law_code_clause_ss", "text_all",
    "file_size_i", "content_hash", "path0_s", "path_basename_s", "entities",
]


def test_fused_equals_modular(spark):
    pages = pages_df(spark, 120, partitions=4)
    fused = (
        enrich_pages(pages, gazetteer=_GAZ, fused=True)
        .select(_COLS).toPandas().sort_values("url").reset_index(drop=True)
    )
    modular = (
        enrich_pages(pages, gazetteer=_GAZ, fused=False)
        .select(_COLS).toPandas().sort_values("url").reset_index(drop=True)
    )
    for c in _COLS:
        mism = [
            (a, b) for a, b in zip(fused[c], modular[c]) if str(a) != str(b)
        ]
        assert not mism, f"column {c}: {mism[:2]}"
