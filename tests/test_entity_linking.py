"""Gazetteer NER + law/money composite + language-id golden tests.

Dictionary mirrors the reference's test gazetteer implied by
test_enhance_extract_law.py:44-70 (Strafgesetzbuch / Bürgerliches
Gesetzbuch / Swiss Civil Code with ambiguous alias 'CC') and the
currency labels of test_enhance_extract_money.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from open_semantic_etl_spark.operators.entity_linking import (
    AhoCorasick,
    Gazetteer,
    GazetteerEntry,
    facet_matchtexts,
    facet_names,
    facet_preflabel_and_uri,
    facet_taxonomy_level,
    facet_uris,
    with_entities,
)
from open_semantic_etl_spark.operators.langdetect import detect_language, language_expr
from open_semantic_etl_spark.operators.law_money import with_law, with_money
from open_semantic_etl_spark.operators.numerize import numerize_en

GAZ = Gazetteer(
    entries=[
        GazetteerEntry(
            uri="http://example.org/stgb",
            preflabel="Strafgesetzbuch",
            facet="law_code_ss",
            labels=("Strafgesetzbuch", "StGB", "STGB"),
            taxonomy=("Law\tGermany\tCriminal",),
        ),
        GazetteerEntry(
            uri="http://example.org/bgb",
            preflabel="Bürgerliches Gesetzbuch",
            facet="law_code_ss",
            labels=("Bürgerliches Gesetzbuch", "BGB"),
            taxonomy=("Law\tGermany\tCivil",),
        ),
        GazetteerEntry(
            uri="http://example.org/scc",
            preflabel="Swiss Civil Code",
            facet="law_code_ss",
            labels=("Swiss Civil Code", "CC"),
        ),
        GazetteerEntry(
            uri="http://example.org/usd",
            preflabel="US Dollar",
            facet="currency_ss",
            labels=("USD", "dollar", "dollars"),
        ),
        GazetteerEntry(
            uri="http://example.org/eur",
            preflabel="Euro",
            facet="currency_ss",
            labels=("EUR", "EURO"),
        ),
        GazetteerEntry(
            uri="http://example.org/obama",
            preflabel="Barack Obama",
            facet="person_ss",
            labels=("Barack Obama", "Obama"),
        ),
    ]
)
CURRENCY_LABELS = ("dollar", "dollars", "USD", "EURO", "EUR")


def test_aho_corasick_word_bounds():
    ac = AhoCorasick(["CC", "Obama", "Swiss Civil Code"])
    hits = ac.scan("CC here, Occam not, Obama yes, Swiss Civil Code too")
    found = {ac.patterns[i] for i, _, _ in hits}
    assert found == {"CC", "Obama", "Swiss Civil Code"}
    # 'Occam' must NOT produce a CC hit (word-bounded)
    assert len([h for h in hits if ac.patterns[h[0]] == "CC"]) == 1


def test_gazetteer_tag_grouping():
    ents = GAZ.tag("Obama met Barack Obama; BGB says so. StGB and STGB too.")
    by_name = {e["name"]: e for e in ents}
    assert set(by_name["Barack Obama"]["matchtexts"]) == {"Obama", "Barack Obama"}
    assert set(by_name["Strafgesetzbuch"]["matchtexts"]) == {"StGB", "STGB"}
    assert by_name["Bürgerliches Gesetzbuch"]["matchtexts"] == ["BGB"]


def test_entity_column_and_projections(spark):
    df = spark.createDataFrame(
        [("doc1", "Strafgesetzbuch applies; Obama spoke.")], "id string, text_analysis string"
    )
    out = with_entities(df, GAZ)
    row = out.select(
        facet_names(F.col("entities"), "law_code_ss").alias("codes"),
        facet_uris(F.col("entities"), "law_code_ss").alias("uris"),
        facet_preflabel_and_uri(F.col("entities"), "law_code_ss").alias("pl"),
        facet_matchtexts(F.col("entities"), "law_code_ss").alias("mt"),
        facet_names(F.col("entities"), "person_ss").alias("people"),
        facet_taxonomy_level(F.col("entities"), "law_code_ss", 1).alias("tax1"),
    ).first()
    assert row["codes"] == ["Strafgesetzbuch"]
    assert row["uris"] == ["http://example.org/stgb"]
    assert row["pl"] == ["Strafgesetzbuch <http://example.org/stgb>"]
    assert row["mt"] == ["http://example.org/stgb\tStrafgesetzbuch"]
    assert row["people"] == ["Barack Obama"]
    assert row["tax1"] == ["Law\tGermany"]


# --- law composite — test_enhance_extract_law.py goldens -------------------

_LAW_TEXT = "\n".join(
    [
        "abc § 888 xyz" "abc § 987 b xyz" "§12",
        "§ 123",
        "§345a",
        "§456 b",
        "§ 567 c",
        "BGB § 153 Abs. 1 Satz 2",
        "§ 52 Absatz 1 Nummer 2 Buchstabe c STGB",
        "§ 444 CC",
    ]
)


def _law_df(spark, text):
    df = spark.createDataFrame([(text,)], "text_analysis string")
    return with_law(with_entities(df, GAZ))


def test_law_full_golden(spark):
    row = _law_df(spark, _LAW_TEXT).first()
    for c in ["§ 888", "§ 987 b", "§ 12", "§ 123", "§ 345a", "§ 456 b", "§ 567 c",
              "§ 153 Abs. 1 Satz 2", "§ 52 Absatz 1 Nummer 2 Buchstabe c"]:
        assert c in row["law_clause_ss"]
    assert "Strafgesetzbuch" in row["law_code_ss"]
    assert "Bürgerliches Gesetzbuch" in row["law_code_ss"]
    assert "Swiss Civil Code" in row["law_code_ss"]  # CC adjacent to § 444
    # clause+code pairings
    assert "§ 153 Abs. 1 Satz 2 Bürgerliches Gesetzbuch" in row["law_code_clause_ss"]
    assert "§ 444 Swiss Civil Code" in row["law_code_clause_ss"]


def test_law_blacklist(spark):
    # 'CC' with no adjacent clause → Swiss Civil Code must be dropped
    row = _law_df(spark, "No clause for law code alias CC").first()
    assert "Swiss Civil Code" not in row["law_code_ss"]

    # but a non-blacklisted label of the same entity keeps it
    row = _law_df(
        spark,
        "No clause for blacklisted law code alias CC but not blacklisted "
        "label of this alias: Swiss Civil Code",
    ).first()
    assert "Swiss Civil Code" in row["law_code_ss"]


# --- money + numerizer — test_enhance_extract_money.py goldens -------------


def test_numerize_en():
    assert (
        numerize_en("So two million two hundred and fifty thousand and seven $ were given")
        == "So 2250007 $ were given"
    )
    assert (
        numerize_en("We got twenty one thousand four hundred and seventy three dollars")
        == "We got 21473 dollars"
    )
    assert numerize_en("no numbers here and more") == "no numbers here and more"


def test_money_with_numerize(spark):
    from open_semantic_etl_spark.operators.numerize import numerize_en as nz
    import pandas as pd
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [
            ("So two million two hundred and fifty thousand and seven $ were given "
             "and twenty one thousand four hundred and seventy three dollars too", "en"),
        ],
        "text_analysis string, language_s string",
    )
    nz_udf = F.pandas_udf(lambda s: s.map(nz), T.StringType())
    df = df.withColumn("text_numerized", nz_udf(F.col("text_analysis")))
    row = with_money(df, CURRENCY_LABELS, numerized_col="text_numerized").first()
    assert "2250007 $" in row["money_ss"]
    assert "21473 dollars" in row["money_ss"]


# --- language id ------------------------------------------------------------


def test_detect_language_pure():
    assert detect_language("the quick brown fox jumps over the lazy dog and it was good") == "en"
    assert detect_language("der schnelle braune Fuchs springt über den faulen Hund und die Katze") == "de"
    assert detect_language("le renard brun rapide saute par dessus le chien paresseux et les autres") == "fr"
    assert detect_language("el zorro marrón rápido salta sobre el perro perezoso y los gatos") == "es"
    assert detect_language("") == "und"
    assert detect_language("xyzzy 12345") == "und"


def test_language_expr_on_pages(spark):
    """generator lang label == detected language on clean variants."""
    from open_semantic_etl_spark.operators.html_extract import with_extraction
    from open_semantic_etl_spark.sources.pages import pages_df

    df = with_extraction(pages_df(spark, 200, partitions=4))
    df = df.withColumn("language_s", language_expr(F.col("content_txt")))
    checked = df.filter(F.length("content_txt") > 50)
    n = checked.count()
    agree = checked.filter(F.col("language_s") == F.col("lang")).count()
    assert agree == n, f"langid disagreed on {n - agree}/{n} pages"
