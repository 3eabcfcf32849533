"""RDF subject-facet fold (enhance_rdf semantics) + magic-byte sniff
(enhance_mimetype semantics) — unit goldens in the reference's
golden-assertion style (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_semantic_etl_spark.functions.textmeta import sniff_mimetype
from open_semantic_etl_spark.operators.rdf import subject_facets, triples_from_lines

NT = [
    '<urn:a> <http://purl.org/dc/terms/title> "Title A" .',
    '<urn:a> <http://purl.org/dc/terms/creator> <urn:p1> .',
    '<urn:a> <http://purl.org/dc/terms/creator> <urn:p2> .',
    '<urn:p1> <http://www.w3.org/2004/02/skos/core#prefLabel> "Alice" .',
    # p2 has no label → falls back to the raw URI (enhance_rdf.py:203-210)
    '<urn:b> <http://purl.org/dc/terms/title> "Esc \\"q\\" done"@en .',
    "malformed line that parses to nothing",
]


def test_rdf_subject_facets(spark):
    lines = spark.createDataFrame([(x,) for x in NT], "line string")
    out = subject_facets(triples_from_lines(lines))
    rows = {(r["subject"], r["facet"]): r["values"] for r in out.collect()}
    assert rows[("urn:a", "title_ss")] == ["Title A"]
    # URI objects resolve via label join; unlabeled URI stays raw
    assert rows[("urn:a", "creator_ss")] == ["Alice", "urn:p2"]
    assert rows[("urn:p1", "prefLabel_ss")] == ["Alice"]
    # literal unescape + @lang strip
    assert rows[("urn:b", "title_ss")] == ['Esc "q" done']
    assert ("", "title_ss") not in rows  # malformed line dropped


def test_rdf_preflabel_beats_rdfs_label(spark):
    """a lexicographically smaller rdfs:label must NOT win over
    skos:prefLabel (enhance_rdf.py:176-210 predicate priority)."""
    nt = [
        '<urn:doc> <http://purl.org/dc/terms/creator> <urn:p> .',
        '<urn:p> <http://www.w3.org/2000/01/rdf-schema#label> "AAA alias" .',
        '<urn:p> <http://www.w3.org/2004/02/skos/core#prefLabel> "Zed Proper" .',
    ]
    lines = spark.createDataFrame([(x,) for x in nt], "line string")
    rows = {
        (r["subject"], r["facet"]): r["values"]
        for r in subject_facets(triples_from_lines(lines)).collect()
    }
    assert rows[("urn:doc", "creator_ss")] == ["Zed Proper"]


def test_rdf_parse_is_jvm_side(spark):
    lines = spark.createDataFrame([(x,) for x in NT], "line string")
    plan = triples_from_lines(lines)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


CASES = [
    (b"%PDF-1.4 x", "application/pdf"),
    (b"\x89PNG\r\n\x1a\nrest", "image/png"),
    (b"\xff\xd8\xff\xe0jpg", "image/jpeg"),
    (b"PK\x03\x04zip", "application/zip"),
    (b"  <!DOCTYPE HTML><html>", "text/html"),
    (b"<html><body>x</body></html>", "text/html"),
    (b"WARC/1.0\r\n", "application/warc"),
    (b"just words", "text/plain"),
    (b"", "application/x-empty"),
]


def test_sniff_mimetype(spark):
    df = spark.createDataFrame(
        [(i, data) for i, (data, _) in enumerate(CASES)], "i int, data binary"
    )
    got = {
        r["i"]: r["mime"]
        for r in df.select("i", sniff_mimetype(F.col("data")).alias("mime")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)


HTML_DOC = (
    b"<html><body><h1>Main Title</h1>"
    b"<div id='a'>Outer text<span>Inner text</span><p></p></div>"
    b"<div>  </div><div>Plain</div>"
    b"<ul><li>Item1</li><li>Item2</li></ul></body></html>"
)


def test_html_tag_paths():
    from open_semantic_etl_spark.operators.htmlpaths import extract_tag_paths

    # non-recursive: matched element's direct text only
    out = extract_tag_paths(HTML_DOC, tags=("//h1", "//li"))
    assert out == {"h1_ss": ["Main Title"], "li_ss": ["Item1", "Item2"]}

    # recursive: per-descendant path fields, empty texts dropped
    out = extract_tag_paths(HTML_DOC, tags_and_children=("//div",))
    assert out["div_ss"] == ["Outer text", "Plain"]
    assert out["div/span_ss"] == ["Inner text"]
    assert "div/p_ss" not in out

    assert extract_tag_paths(None, tags=("//h1",)) == {}
    assert extract_tag_paths(b"<broken <<", tags=("//h1",)) == {}


def test_html_tag_paths_spark(spark):
    from open_semantic_etl_spark.operators.htmlpaths import with_html_paths

    df = spark.createDataFrame([(1, HTML_DOC)], "i int, html binary")
    row = with_html_paths(df, tags=("//h1",), tags_and_children=("//div",)).first()
    assert row["html_paths"]["h1_ss"] == ["Main Title"]
    assert row["html_paths"]["div/span_ss"] == ["Inner text"]


def test_annotation_facets_property2facet(spark):
    """enhance_rdf_annotations_by_http_request.py:68-140: only predicates
    configured in property2facet surface, mapped to their facet name;
    swivt wikiPageModificationDate feeds meta_modified (latest wins)."""
    from open_semantic_etl_spark.operators.rdf import (
        SWIVT_MODIFIED,
        annotation_facets,
        meta_modified,
    )

    nt = [
        '<urn:d1> <http://purl.org/dc/terms/subject> "Hist" .',
        '<urn:d1> <http://purl.org/dc/terms/subject> "Art" .',
        '<urn:d1> <http://example.org/unmapped> "nope" .',
        f'<urn:d1> <{SWIVT_MODIFIED}> "2024-01-02T00:00:00" .',
        f'<urn:d1> <{SWIVT_MODIFIED}> "2024-03-04T00:00:00" .',
    ]
    lines = spark.createDataFrame([(x,) for x in nt], "line string")
    triples = triples_from_lines(lines)
    p2f = {"http://purl.org/dc/terms/subject": "tag_ss"}
    rows = {(r["subject"], r["facet"]): r["values"]
            for r in annotation_facets(triples, p2f).collect()}
    assert rows == {("urn:d1", "tag_ss"): ["Art", "Hist"]}
    mm = meta_modified(triples).collect()
    assert [(r["subject"], r["meta_modified"]) for r in mm] == [
        ("urn:d1", "2024-03-04T00:00:00")
    ]
    # property2facet config joins as a broadcast dimension
    plan = annotation_facets(triples, p2f)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
