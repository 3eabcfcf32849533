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


# --- crawl frontier (sources/crawl.py — etl_web_crawl.py engine side) -----


def _site_page(i: int, n: int = 64) -> bytes:
    """binary-tree site: /p{i}.html links to 2i+1 (root-relative),
    2i+2 (relative form), an off-site page, junk links, and a dup."""
    links = []
    if 2 * i + 1 < n:
        links.append(f'<a href="/p{2 * i + 1}.html">c1</a>')
        links.append(f'<a class="x" href="/p{2 * i + 1}.html#frag">dup</a>')
    if 2 * i + 2 < n:
        links.append(f'<a href="p{2 * i + 2}.html">c2</a>')
    links.append('<a href="https://other.example.net/ext.html">ext</a>')
    links.append('<a href="mailto:a@b.c">mail</a>')
    links.append('<a href="javascript:void(0)">js</a>')
    return ("<html><body>" + "".join(links) + "</body></html>").encode()


def test_crawl_frontier_bfs_depths(spark):
    from open_semantic_etl_spark.sources.crawl import crawl_frontier

    n = 64
    pages = spark.createDataFrame(
        [(f"https://crawl.example.com/p{i}.html", _site_page(i, n)) for i in range(n)],
        "url string, html binary",
    )
    out = {
        r["url"]: r["depth"]
        for r in crawl_frontier(
            pages, ["https://crawl.example.com/p0.html"], max_depth=3
        ).collect()
    }
    import math

    expected = {
        f"https://crawl.example.com/p{i}.html": int(math.floor(math.log2(i + 1)))
        for i in range(n)
        if math.floor(math.log2(i + 1)) <= 3
    }
    assert out == expected  # BFS first-discovery depth, binary tree
    assert not any("other.example.net" in u for u in out)  # same-host policy


def test_crawl_frontier_unfetched_and_offsite(spark):
    from open_semantic_etl_spark.sources.crawl import crawl_frontier, page_links

    pages = spark.createDataFrame(
        [
            (
                "https://h.example.com/a.html",
                b'<a href="/b.html">b</a><a href="//h.example.com/c.html">c</a>'
                b'<a href="https://off.example.net/x">x</a>',
            )
        ],
        "url string, html binary",
    )
    # unfetched urls (no html row) still surface at their discovery depth
    out = {
        r["url"]: r["depth"]
        for r in crawl_frontier(pages, ["https://h.example.com/a.html"], 2).collect()
    }
    assert out == {
        "https://h.example.com/a.html": 0,
        "https://h.example.com/b.html": 1,
        "https://h.example.com/c.html": 1,  # protocol-relative resolved
    }
    # with the host policy off, the off-site edge is kept
    edges = {r["dst"] for r in page_links(pages, same_host=False).collect()}
    assert "https://off.example.net/x" in edges


def test_robots_gate_longest_match_and_tie(spark):
    from open_semantic_etl_spark.sources.crawl import robots_gate

    urls = spark.createDataFrame(
        [
            ("https://h.com/p1.html",),     # /p1 disallow
            ("https://h.com/p12.html",),    # /p12 allow (longer wins)
            ("https://h.com/p3.html",),     # equal length: allow wins
            ("https://h.com/other.html",),  # no rule → allowed
            ("https://x.org/p1.html",),     # other host → allowed
            ("https://h.com",),             # empty path → '/'
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("h.com", "/p1", False),
            ("h.com", "/p12", True),
            ("h.com", "/p3", False),
            ("h.com", "/p3", True),
            ("h.com", "/", True),
        ],
        "host string, prefix string, allow boolean",
    )
    got = {r["url"]: r["robots_allowed_i"] for r in robots_gate(urls, rules).collect()}
    assert got["https://h.com/p1.html"] == 0
    assert got["https://h.com/p12.html"] == 1
    assert got["https://h.com/p3.html"] == 1
    assert got["https://h.com/other.html"] == 1
    assert got["https://x.org/p1.html"] == 1
    assert got["https://h.com"] == 1


def test_extract_links_from_root_page(spark):
    """relative hrefs on a host-only base resolve against '/' (RFC 3986
    §5.2.3), not against a base_dir that swallowed the hostname."""
    from pyspark.sql import functions as F

    from open_semantic_etl_spark.sources.crawl import extract_links

    df = spark.createDataFrame(
        [("https://h.example.com", b'<a href="x.html"><a href="a/b.html">')],
        "url string, html binary",
    )
    links = df.select(
        extract_links(F.col("html"), F.col("url")).alias("l")
    ).first()["l"]
    assert set(links) == {
        "https://h.example.com/x.html",
        "https://h.example.com/a/b.html",
    }


def test_robots_gate_preserves_null_url_rows(spark):
    from open_semantic_etl_spark.sources.crawl import robots_gate

    urls = spark.createDataFrame(
        [("https://h.com/p1.html",), (None,)], "url string"
    )
    rules = spark.createDataFrame(
        [("h.com", "/p1", False)], "host string, prefix string, allow boolean"
    )
    rows = robots_gate(urls, rules).collect()
    got = {r["url"]: r["robots_allowed_i"] for r in rows}
    assert len(rows) == 2  # row-preserving
    assert got["https://h.com/p1.html"] == 0 and got[None] is None


def test_sparql_select_values(spark):
    """reference golden: sparql_select_to_list_file walks bindings
    outer / head.vars inner, strips values, drops empties
    (etl_sparql.py:57-63) — order and filtering must match."""
    import json

    from open_semantic_etl_spark.sources.feeds import sparql_select_values

    payload = json.dumps(
        {
            "head": {"vars": ["person", "place"]},
            "results": {
                "bindings": [
                    {
                        "person": {"type": "uri", "value": " Barack Obama "},
                        "place": {"type": "literal", "value": "Hawaii",
                                  "xml:lang": "en"},
                    },
                    {"person": {"type": "uri", "value": "Angela Merkel"}},
                    {"place": {"type": "literal", "value": "   "}},
                ]
            },
        }
    )
    df = spark.createDataFrame([(1, payload)], "doc_id long, json string")
    rows = sparql_select_values(df, "json", id_col="doc_id").collect()
    assert [(r["doc_id"], r["value"]) for r in rows] == [
        (1, "Barack Obama"),
        (1, "Hawaii"),
        (1, "Angela Merkel"),
    ]
    # malformed payload → zero rows, not an error
    bad = spark.createDataFrame([("not json",)], "json string")
    assert sparql_select_values(bad).count() == 0
