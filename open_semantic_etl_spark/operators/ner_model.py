"""Model-based NER tier: pandas-UDF span tagger with a pluggable model.

Reproduces the reference's two ML NER plugins as one Spark operator:

- enhance_ner_spacy.py:27-142 — span-model contract: the model returns
  ``(start, end, label)`` character spans over the concatenated
  analysis text; the plugin extracts ``text[start:end]``, strips
  whitespace, drops empties, and appends to the facet mapped from the
  label (PERSON→person_ss, ORG/NORP→organization_ss,
  GPE/LOC/FACILITY→location_ss, …).
- enhance_ner_stanford.py:14-141 — token-model contract: the model
  tags every whitespace token; adjacent tokens of the same class merge
  into one multi-word entity (``multi_word_entities``, :14-51), then
  the same label→facet mapping applies.

The analysis text is the reference's field concat: for each of
``title_txt, content_txt, description_txt, ocr_t`` present (non-null),
append the value plus a newline (enhance_ner_spacy.py:71-77).

Model seam: any callable ``texts -> list[list[(start, end, label)]]``.
In this container the deterministic ``FakeNerModel`` (an embedded
lexicon + honorific token tagger with Stanford-style adjacent-class
merging) stands in for the model; ``spacy_model`` wraps a real spaCy
pipeline behind an import-try, preserving the classifier-per-language
selection (enhance_ner_spacy.py:51-66).

Scale shape: ONE Arrow crossing per row (the tagger); every facet
projection downstream is JVM Column algebra over the returned
``array<struct<entity,label>>``. The model object is constructed once
per executor (closure capture), never per row; at 100 TB the operator
is embarrassingly parallel with zero shuffles.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# label → facet, the spaCy plugin's default mapping
# (enhance_ner_spacy.py:30-48)
SPACY_NER_MAPPING: dict[str, str] = {
    "ORG": "organization_ss",
    "NORP": "organization_ss",
    "orgName": "organization_ss",
    "ORGANIZATION": "organization_ss",
    "PER": "person_ss",
    "PERSON": "person_ss",
    "persName": "person_ss",
    "GPE": "location_ss",
    "LOC": "location_ss",
    "placeName": "location_ss",
    "FACILITY": "location_ss",
    "PRODUCT": "product_ss",
    "EVENT": "event_ss",
    "LAW": "law_ss",
    "DATE": "date_ss",
    "TIME": "time_ss",
    "MONEY": "money_ss",
    "WORK_OF_ART": "work_of_art_ss",
}

# the Stanford plugin's default mapping (enhance_ner_stanford.py:68-81)
STANFORD_NER_MAPPING: dict[str, str] = {
    "PERSON": "person_ss",
    "LOCATION": "location_ss",
    "ORGANIZATION": "organization_ss",
    "I-ORG": "organization_ss",
    "I-PER": "person_ss",
    "I-LOC": "location_ss",
    "ORG": "organization_ss",
    "PER": "person_ss",
    "LOC": "location_ss",
    "PERS": "person_ss",
    "LUG": "location_ss",
    "MONEY": "money_ss",
}

ANALYSE_FIELDS = ("title_txt", "content_txt", "description_txt", "ocr_t")

ENTITIES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("entity", T.StringType(), False),
            T.StructField("label", T.StringType(), False),
        ]
    )
)


def merge_adjacent_entities(
    tagged: Sequence[tuple[str, str]],
) -> list[tuple[str, str]]:
    """Stanford-style multi-word merge: split the token/class stream at
    class CHANGES, joining runs with single spaces
    (enhance_ner_stanford.py:14-51 ``multi_word_entities``). 'O' runs
    merge too and are filtered later by the mapping, exactly like the
    reference."""
    out: list[tuple[str, str]] = []
    cur_words: list[str] = []
    cur_class = ""
    for word, cls in tagged:
        if cur_words and cls != cur_class:
            out.append((" ".join(cur_words), cur_class))
            cur_words = []
        cur_words.append(word)
        cur_class = cls
    if cur_words:
        out.append((" ".join(cur_words), cur_class))
    return out


class FakeNerModel:
    """Deterministic in-container stand-in for a span NER model.

    Token tagger: whitespace tokens, edge punctuation stripped for
    classification; class from embedded lexicons (a test double for
    model weights). Honorific tokens (Mr./Dr./Frau/…) are tagged 'O' so
    the span starts at the name, as real models do. Adjacent same-class
    tokens merge (merge_adjacent_entities), and each merged entity is
    emitted as a character span over the ORIGINAL text — matching the
    spaCy REST contract the plugin consumes (start/end/label).
    """

    PUNCT = ".,;:!?()\"'"

    PERSON = frozenset("Barack Obama Angela Merkel Tim Cook".split())
    ORG = frozenset("Democratic Party CDU Apple Inc United Nations".split())
    LOC = frozenset("USA Deutschland Paris Berlin".split())

    def classify_token(self, core: str) -> str:
        if core in self.PERSON:
            return "PERSON"
        if core in self.ORG:
            return "ORG"
        if core in self.LOC:
            return "GPE"
        return "O"

    def __call__(self, text: str) -> list[tuple[int, int, str]]:
        if not text:
            return []
        # tokens with char offsets
        toks: list[tuple[int, int, str]] = []
        i, n = 0, len(text)
        while i < n:
            while i < n and text[i].isspace():
                i += 1
            j = i
            while j < n and not text[j].isspace():
                j += 1
            if j > i:
                toks.append((i, j, text[i:j]))
            i = j
        # classify on the punctuation-stripped core
        tagged = []
        for s, e, w in toks:
            core = w.strip(self.PUNCT)
            tagged.append(((s, e), self.classify_token(core)))
        # adjacent same-class merge over (offset, class) stream
        spans: list[tuple[int, int, str]] = []
        run_start = run_end = None
        run_class = ""
        for (s, e), cls in tagged:
            if run_start is not None and cls != run_class:
                if run_class != "O":
                    spans.append((run_start, run_end, run_class))
                run_start = None
            if run_start is None:
                run_start = s
            run_end = e
            run_class = cls
        if run_start is not None and run_class != "O":
            spans.append((run_start, run_end, run_class))
        # shrink each span's edges past punctuation so text[start:end]
        # is the clean entity (span models emit clean boundaries)
        out = []
        for s, e, cls in spans:
            while s < e and text[s] in self.PUNCT:
                s += 1
            while e > s and text[e - 1] in self.PUNCT:
                e -= 1
            if e > s:
                out.append((s, e, cls))
        return out


def spacy_model(classifier: str = "en_core_web_sm"):
    """Real spaCy pipeline behind the same span contract. Gated on an
    import-try — the container has no spaCy, so calling the returned
    model raises with a clear message (multimodal.py seam pattern)."""
    try:
        import spacy  # noqa: F401
    except ImportError:

        def missing(text: str) -> list[tuple[int, int, str]]:
            raise NotImplementedError(
                "spaCy is not installed in this container; use FakeNerModel "
                "or install the classifier " + classifier
            )

        return missing
    nlp = spacy.load(classifier)

    def run(text: str) -> list[tuple[int, int, str]]:
        return [(e.start_char, e.end_char, e.label_) for e in nlp(text).ents]

    return run


def select_classifier(
    lang: str | None,
    default: str | None = "en_core_web_sm",
    per_language: dict[str, str] | None = None,
) -> str | None:
    """classifier-per-language cascade (enhance_ner_spacy.py:51-66):
    language-specific classifier if configured for the detected
    language, else the default (None ⇒ skip the plugin)."""
    if per_language and lang in per_language:
        return per_language[lang]
    return default


def analysis_text_expr(df: DataFrame, fields: Iterable[str] = ANALYSE_FIELDS) -> Column:
    """the reference's field concat: append value + '\\n' for each
    present (non-null) field (enhance_ner_spacy.py:71-77)."""
    parts = [
        F.when(F.col(f).isNotNull(), F.concat(F.col(f), F.lit("\n"))).otherwise(F.lit(""))
        for f in fields
        if f in df.columns
    ]
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def ner_entities_udf(
    model: Callable[[str], list[tuple[int, int, str]]] | None = None,
    mapping: dict[str, str] | None = None,
) -> Callable[[Column], Column]:
    """pandas UDF: analysis text → array<struct<entity,label>> with the
    spaCy plugin's span extraction contract applied (text[start:end],
    strip, drop empty, keep only mapped labels)."""
    model = model or FakeNerModel()
    mapping = mapping if mapping is not None else SPACY_NER_MAPPING
    mapped = frozenset(mapping)

    @F.pandas_udf(ENTITIES_TYPE)
    def tag(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            ents = []
            if text:
                for start, end, label in model(text):
                    if label not in mapped:
                        continue  # unmapped class ignored (ref :141-142)
                    entity = text[int(start):int(end)].strip()
                    if not entity:
                        continue  # empty after strip excluded (ref :126-128)
                    ents.append({"entity": entity, "label": label})
            out.append(ents)
        return pd.Series(out)

    return tag


def facet_values(entities: Column, facet: str, mapping: dict[str, str] | None = None) -> Column:
    """JVM-side facet projection: distinct entity strings whose label
    maps to ``facet`` (append + set-dedupe semantics of etl.py:279-303;
    canonical order = first occurrence, SURVEY.md §1.3)."""
    mapping = mapping if mapping is not None else SPACY_NER_MAPPING
    labels = [lbl for lbl, fct in mapping.items() if fct == facet]
    return F.array_distinct(
        F.transform(
            F.filter(entities, lambda e: e["label"].isin(labels)),
            lambda e: e["entity"],
        )
    )


def with_ner(
    df: DataFrame,
    model: Callable[[str], list[tuple[int, int, str]]] | None = None,
    mapping: dict[str, str] | None = None,
    fields: Iterable[str] = ANALYSE_FIELDS,
    facets: Iterable[str] = ("person_ss", "organization_ss", "location_ss"),
    entities_col: str = "ner_entities",
) -> DataFrame:
    """Add ``ner_entities`` plus one array column per requested facet.

    One Python crossing (the tagger UDF); facet projections are Column
    algebra over the struct array.
    """
    mapping = mapping if mapping is not None else SPACY_NER_MAPPING
    tag = ner_entities_udf(model, mapping)
    out = df.withColumn(entities_col, tag(analysis_text_expr(df, fields)))
    for facet in facets:
        out = out.withColumn(facet, facet_values(F.col(entities_col), facet, mapping))
    return out


# ---------------------------------------------------------------------------
# token-model path (enhance_ner_stanford.py:104-134): the model tags
# every whitespace token (st.tag(text.split())), adjacent same-class
# tokens merge into multi-word entities, then the label→facet mapping
# filters — the complete Stanford plugin as one operator.
# ---------------------------------------------------------------------------


def with_ner_stanford(
    df: DataFrame,
    token_classifier: Callable[[str], str] | None = None,
    mapping: dict[str, str] | None = None,
    fields: Iterable[str] = ANALYSE_FIELDS,
    facets: Iterable[str] = ("person_ss", "organization_ss", "location_ss"),
    entities_col: str = "ner_entities",
) -> DataFrame:
    """Stanford-contract NER: per-token classification + adjacent merge.

    ``token_classifier(token) -> class`` is the model seam (the
    StanfordNERTagger stand-in); default = FakeNerModel's lexicon
    tagger on the punctuation-stripped core, so 'Obama,' tags like
    'Obama' — real CRF taggers handle punctuation the same way.
    """
    mapping = mapping if mapping is not None else STANFORD_NER_MAPPING
    fake = FakeNerModel()
    # the fake lexicon emits spaCy-style classes; Stanford CRF models
    # use LOCATION for places — translate for the default seam
    _to_stanford = {"GPE": "LOCATION"}

    def _default_classify(tok: str) -> str:
        cls = fake.classify_token(tok.strip(fake.PUNCT))
        return _to_stanford.get(cls, cls)

    classify = token_classifier or _default_classify
    mapped = frozenset(mapping)

    @F.pandas_udf(ENTITIES_TYPE)
    def tag(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            ents = []
            if text:
                tagged = [(w, classify(w)) for w in text.split()]
                for entity, cls in merge_adjacent_entities(tagged):
                    if cls in mapped:  # unmapped classes (incl. 'O') dropped
                        ents.append({"entity": entity, "label": cls})
            out.append(ents)
        return pd.Series(out)

    out = df.withColumn(entities_col, tag(analysis_text_expr(df, fields)))
    for facet in facets:
        out = out.withColumn(facet, facet_values(F.col(entities_col), facet, mapping))
    return out
