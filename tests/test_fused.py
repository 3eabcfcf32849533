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


def test_fused_equals_modular_titleless(spark):
    """titleless pages: langid/NER must consume the CLEANED title (url
    basename fallback) in BOTH paths — the reference's get_text runs
    after clean_title in the plugin chain."""
    from datetime import datetime

    rows = [
        (
            f"https://t.example.org/dir/page-{i}.html",
            datetime(2024, 1, 1),
            b"<html><head></head><body><p>Ein langer deutscher Absatz mit "
            b"genug Inhalt um behalten zu werden und der von der und das "
            b"ist mit f\xc3\xbcr Strafgesetzbuch Text USD.</p></body></html>",
            "x",
            "de",
        )
        for i in range(8)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cols = ["url", "title_txt", "text_analysis", "language_s", "entities", "text_all"]
    fused = enrich_pages(pages, gazetteer=_GAZ, fused=True).select(cols).toPandas()
    modular = enrich_pages(pages, gazetteer=_GAZ, fused=False).select(cols).toPandas()
    fused = fused.sort_values("url").reset_index(drop=True)
    modular = modular.sort_values("url").reset_index(drop=True)
    # basename fallback landed in the analysis text in both paths
    assert fused["title_txt"][0] == "page-0.html"
    assert fused["text_analysis"][0].startswith("page-0.html\n")
    for c in cols:
        assert [str(v) for v in fused[c]] == [str(v) for v in modular[c]], c
