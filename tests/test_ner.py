"""Model-NER tier goldens.

Mirrors the reference's test_enhance_ner_spacy.py:17-48 (Obama /
Merkel fixtures, label→facet mapping) and the adjacent-token merge of
enhance_ner_stanford.py:14-51 — run against the deterministic
FakeNerModel seam and through the Spark operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_semantic_etl_spark.operators.ner_model import (
    FakeNerModel,
    SPACY_NER_MAPPING,
    STANFORD_NER_MAPPING,
    merge_adjacent_entities,
    select_classifier,
    spacy_model,
    with_ner,
)

EN = ("Some years ago, Mr. Barack Obama, a member of Democratic Party, "
      "was president of the USA.")
DE = ("Der Text ist über Frau Dr. Angela Merkel. Sie ist Mitglied in der "
      "CDU. Sie lebt in Deutschland.")


def _facets(text: str) -> dict[str, list[str]]:
    model = FakeNerModel()
    out: dict[str, list[str]] = {}
    for start, end, label in model(text):
        facet = SPACY_NER_MAPPING.get(label)
        if facet is None:
            continue
        entity = text[start:end].strip()
        if entity and entity not in out.setdefault(facet, []):
            out[facet].append(entity)
    return out


def test_en_golden():
    # test_enhance_ner_spacy.py:17-31
    data = _facets(EN)
    assert "Barack Obama" in data["person_ss"]
    assert "Democratic Party" in data["organization_ss"]
    assert "USA" in data["location_ss"]


def test_de_golden():
    # test_enhance_ner_spacy.py:34-48
    data = _facets(DE)
    assert "Angela Merkel" in data["person_ss"]
    assert "CDU" in data["organization_ss"]
    assert "Deutschland" in data["location_ss"]


def test_stanford_adjacent_merge():
    # enhance_ner_stanford.py:14-51: class-change split, O runs merge too
    tagged = [
        ("Barack", "PERSON"), ("Obama", "PERSON"),
        ("visited", "O"), ("the", "O"),
        ("United", "ORGANIZATION"), ("Nations", "ORGANIZATION"),
        ("in", "O"), ("Paris", "LOCATION"),
    ]
    merged = merge_adjacent_entities(tagged)
    assert merged == [
        ("Barack Obama", "PERSON"),
        ("visited the", "O"),
        ("United Nations", "ORGANIZATION"),
        ("in", "O"),
        ("Paris", "LOCATION"),
    ]
    # mapping filters the O runs, like the reference loop (:120-133)
    facets = [(e, STANFORD_NER_MAPPING[c]) for e, c in merged if c in STANFORD_NER_MAPPING]
    assert facets == [
        ("Barack Obama", "person_ss"),
        ("United Nations", "organization_ss"),
        ("Paris", "location_ss"),
    ]
    assert merge_adjacent_entities([]) == []


def test_classifier_cascade():
    # enhance_ner_spacy.py:51-66
    per_lang = {"de": "de_core_news_sm", "en": "en_core_web_md"}
    assert select_classifier("de", per_language=per_lang) == "de_core_news_sm"
    assert select_classifier("fr", per_language=per_lang) == "en_core_web_sm"
    assert select_classifier("fr", default=None, per_language=per_lang) is None


def test_spacy_seam_is_gated():
    import pytest

    model = spacy_model("en_core_web_sm")
    with pytest.raises(NotImplementedError):
        model("any text")


def test_spacy_real_model_golden():
    """Exercises the REAL spaCy path when the environment provides it
    (reference golden: test_enhance_ner_spacy.py:17-31 Obama). Skipped
    in this container: `import spacy` raises ModuleNotFoundError (no
    spacy wheel baked in, pip install prohibited, no network — verified
    2026-08-17: `pip download spacy` retrieves nothing)."""
    import pytest

    spacy = pytest.importorskip(
        "spacy",
        reason="spaCy not installed: ModuleNotFoundError: No module named "
        "'spacy' (container has no wheel; installs prohibited)",
    )
    try:
        spacy.load("en_core_web_sm")
    except OSError:
        pytest.skip("spaCy installed but en_core_web_sm weights absent")
    model = spacy_model("en_core_web_sm")
    spans = model(EN)
    found = {EN[s:e].strip() for s, e, label in spans if SPACY_NER_MAPPING.get(label) == "person_ss"}
    assert "Barack Obama" in found


def test_with_ner_spark(spark):
    df = spark.createDataFrame(
        [(1, "doc one", EN, None), (2, "doc two", DE, "Tim Cook of Apple Inc")],
        "doc_id int, title_txt string, content_txt string, ocr_t string",
    )
    out = with_ner(df).orderBy("doc_id").collect()
    assert out[0]["person_ss"] == ["Barack Obama"]
    assert out[0]["organization_ss"] == ["Democratic Party"]
    assert out[0]["location_ss"] == ["USA"]
    # ocr_t participates in the analysis concat (enhance_ner_spacy.py:71-77)
    assert out[1]["person_ss"] == ["Angela Merkel", "Tim Cook"]
    assert out[1]["organization_ss"] == ["CDU", "Apple Inc"]
    assert out[1]["location_ss"] == ["Deutschland"]
    # single Python crossing: exactly one ArrowEvalPython in the plan
    plan = with_ner(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_with_ner_stanford_spark(spark):
    """the token-model path end-to-end: whitespace tokens tagged,
    adjacent merge, mapping filter — note the entity strings keep the
    raw tokens (punctuation attached), like st.tag over text.split()."""
    df = spark.createDataFrame(
        [(1, "Barack Obama visited the United Nations in Paris today")],
        "doc_id int, content_txt string",
    )
    from open_semantic_etl_spark.operators.ner_model import with_ner_stanford

    row = with_ner_stanford(df).first()
    assert row["person_ss"] == ["Barack Obama"]
    assert row["organization_ss"] == ["United Nations"]
    assert row["location_ss"] == ["Paris"]
    plan = with_ner_stanford(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
