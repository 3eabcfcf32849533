"""Sitemap recursive listing + RSS incremental skip (etl_sitemap.py:45-123,
etl_rss.py:47-94 semantics) — golden assertions."""

from __future__ import annotations

from open_semantic_etl_spark.sources.feeds import (
    expand_sitemaps,
    new_items,
    parse_rss,
    parse_sitemap,
    rss_items,
)

SM = b"""<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc> https://a/1 </loc><lastmod>2024-01-02</lastmod></url>
<url><loc>https://a/2</loc></url></urlset>"""

SM_GOOGLE = b"""<urlset xmlns="http://www.google.com/schemas/sitemap/0.84">
<url><loc>https://g/1</loc></url></urlset>"""

SM_INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>https://maps/child.xml</loc></sitemap></sitemapindex>"""


def test_parse_sitemap_namespaces_and_index():
    es = parse_sitemap(SM)
    assert [(e["loc"], e["lastmod"], e["is_sitemap"]) for e in es] == [
        ("https://a/1", "2024-01-02", False),
        ("https://a/2", None, False),
    ]
    assert [e["loc"] for e in parse_sitemap(SM_GOOGLE)] == ["https://g/1"]
    assert [(e["loc"], e["is_sitemap"]) for e in parse_sitemap(SM_INDEX)] == [
        ("https://maps/child.xml", True)
    ]
    assert parse_sitemap(b"not xml <<") == []
    assert parse_sitemap(None) == []


def test_expand_sitemaps_recursive(spark):
    docs = spark.createDataFrame(
        [
            ("https://maps/root.xml", SM_INDEX.replace(b"child", b"mid")),
            ("https://maps/mid.xml", SM_INDEX.replace(b"child.xml", b"leaf.xml")),
            ("https://maps/leaf.xml", SM),
        ],
        "url string, xml binary",
    )
    seeds = spark.createDataFrame([("https://maps/root.xml",)], "seed_url string")
    rows = expand_sitemaps(seeds, docs, max_depth=4).collect()
    assert sorted(r["page_url"] for r in rows) == ["https://a/1", "https://a/2"]
    assert all(r["seed_url"] == "https://maps/root.xml" for r in rows)


def test_expand_sitemaps_diamond_no_blowup(spark):
    """two parents referencing the same child (diamond) must not multiply
    frontier rows — per-round dedupe keeps growth linear."""
    diamond_root = (
        b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sitemap><loc>https://maps/l.xml</loc></sitemap>"
        b"<sitemap><loc>https://maps/r.xml</loc></sitemap></sitemapindex>"
    )
    to_leaf = SM_INDEX.replace(b"child.xml", b"leaf.xml")
    docs = spark.createDataFrame(
        [
            ("https://maps/root.xml", diamond_root),
            ("https://maps/l.xml", to_leaf),
            ("https://maps/r.xml", to_leaf),
            ("https://maps/leaf.xml", SM),
        ],
        "url string, xml binary",
    )
    seeds = spark.createDataFrame([("https://maps/root.xml",)], "seed_url string")
    out = expand_sitemaps(seeds, docs, max_depth=4)
    rows = out.collect()
    assert sorted(r["page_url"] for r in rows) == ["https://a/1", "https://a/2"]
    # pre-dedup page set stays linear: each page found once per deduped
    # frontier path, not 2^depth times
    assert out.count() == 2


RSS = b"""<rss><channel>
<item><link>https://n/1</link><title>T1</title><pubDate>D1</pubDate><description>S1</description></item>
<item><link>https://n/2</link><title>T2</title></item>
<item><title>no link dropped</title></item>
</channel></rss>"""

ATOM = b"""<feed xmlns="http://www.w3.org/2005/Atom">
<entry><link href="https://n/3"/><title>T3</title><updated>D3</updated><summary>S3</summary></entry>
</feed>"""


def test_parse_rss_and_atom():
    assert [(i["link"], i["title"], i["published"]) for i in parse_rss(RSS)] == [
        ("https://n/1", "T1", "D1"),
        ("https://n/2", "T2", None),
    ]
    assert [(i["link"], i["summary"]) for i in parse_rss(ATOM)] == [("https://n/3", "S3")]


def test_rss_incremental_skip(spark):
    feeds = spark.createDataFrame(
        [("f1", RSS), ("f2", ATOM)], "url string, xml binary"
    )
    items = rss_items(feeds)
    assert items.count() == 3
    indexed = spark.createDataFrame([("https://n/1",), ("https://n/3",)], "url string")
    fresh = new_items(items, indexed).collect()
    assert [r["url"] for r in fresh] == ["https://n/2"]
