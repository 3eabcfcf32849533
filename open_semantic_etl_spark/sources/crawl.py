"""Crawl-frontier expansion over an already-landed pages table.

The Spark-native engine side of the reference's spider
(etl_web_crawl.py:15-93): the reference shells out to scrapy, follows
``<a href>`` links up to a depth bound within the allowed domain, and
feeds each page into the ETL. Network acquisition stays out of engine
scope (SURVEY.md §2.1), but the frontier ALGORITHM — link extraction,
relative-url resolution, same-host policy, visited-set dedup, bounded
breadth-first expansion — is pure dataflow, expressed here exactly like
expand_sitemaps (sources/feeds.py): driver-bounded BFS rounds of
url-keyed joins.

Scale notes (10^12 pages): the link table is derived map-side (one
regexp pass per page, JVM-only — no Python); each BFS round shuffles
url keys only (frontier ⋈ links, anti-join vs visited); the frontier
is deduped per round so diamond link graphs cannot multiply rows
through the rounds. A production crawl materializes the link table
once (it is reused by every round and every recrawl) and checkpoints
``visited`` per round; here the plans re-derive it, which is fine at
query scale and keeps the function pure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: href attribute of <a> tags — the reference's LinkExtractor surface
#: (scrapy defaults: a/area href), restricted to quoted attributes.
_HREF_PATTERN = r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"']+)["']"""


def extract_links(html: Column, base_url: Column) -> Column:
    """array<string> of absolutized, de-fragmented link targets.

    Pure Column algebra (whole-stage codegen): regexp_extract_all for
    the hrefs, then per-element resolution against ``base_url`` —
    absolute http(s) kept, protocol-relative ``//h/p`` gets the base
    scheme, root-relative ``/p`` gets scheme://host, anything else is
    joined to the base directory. mailto:/javascript:/tel:/data: and
    fragment-only links are dropped (scrapy LinkExtractor behavior).
    """
    text = F.decode(html, "UTF-8")
    raw = F.regexp_extract_all(text, F.lit(_HREF_PATTERN), 1)
    defrag = F.transform(raw, lambda h: F.regexp_replace(h, "#.*$", ""))
    kept = F.filter(
        defrag,
        lambda h: (h != "")
        & ~h.rlike("(?i)^(mailto:|javascript:|tel:|data:)"),
    )
    scheme = F.parse_url(base_url, F.lit("PROTOCOL"))
    host = F.parse_url(base_url, F.lit("HOST"))
    # a host-only base ('https://h.example.com') has no path slash:
    # stripping [^/]*$ there would eat the hostname and resolve
    # relative links to 'https://x.html' — normalize to a '/' root
    # first (RFC 3986 §5.2.3: base with empty path ⇒ merged path is
    # '/' + reference)
    base_norm = F.when(
        base_url.rlike(r"(?i)^https?://[^/]*$"), F.concat(base_url, F.lit("/"))
    ).otherwise(base_url)
    base_dir = F.regexp_replace(base_norm, "[^/]*$", "")
    resolved = F.transform(
        kept,
        lambda h: F.when(h.rlike("(?i)^https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(scheme, F.lit("://"), host, h))
        .otherwise(F.concat(base_dir, h)),
    )
    return F.array_distinct(resolved)


def page_links(
    pages: DataFrame, id_col: str = "url", bytes_col: str = "html",
    same_host: bool = True,
) -> DataFrame:
    """(src, dst) edge table from the landed pages — one map-side pass.

    ``same_host=True`` applies the spider's allowed-domain policy
    (etl_web_crawl.py crawler restricted to the start url's domain):
    edges leaving the source's host are dropped at extraction, so no
    off-site url ever enters a shuffle.
    """
    src = F.col(id_col)
    edges = pages.select(
        src.alias("src"),
        F.explode(extract_links(F.col(bytes_col), src)).alias("dst"),
    )
    if same_host:
        edges = edges.filter(
            F.parse_url(F.col("dst"), F.lit("HOST"))
            == F.parse_url(F.col("src"), F.lit("HOST"))
        )
    return edges


def crawl_frontier(
    pages: DataFrame,
    seeds: list[str],
    max_depth: int = 3,
    id_col: str = "url",
    bytes_col: str = "html",
    same_host: bool = True,
) -> DataFrame:
    """(url, depth) of every page reachable from ``seeds`` within
    ``max_depth`` link hops — depth = first-discovery (BFS) distance.

    Each round: frontier ⋈ edge-table → next urls, minus visited,
    deduped. Unfetched urls (linked but absent from the pages table)
    are still reported at their discovery depth — they are the
    frontier a real crawler would fetch next (the reference enqueues
    them as scrapy requests).
    """
    spark = pages.sparkSession
    # materialize the edge table ONCE: every BFS round reuses it, and
    # without the checkpoint each round's plan re-runs the full html
    # regexp parse AND nests every previous round's lineage (the same
    # geometric plan growth dup_clusters hit — measured 8s steady /
    # 31s cold on a 200-page site before this, <1s after)
    edges = page_links(pages, id_col, bytes_col, same_host).localCheckpoint()
    frontier = spark.createDataFrame(
        [(u, 0) for u in seeds], "url string, depth int"
    )
    out = frontier
    visited = frontier.select("url")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier["url"] == edges["src"], "inner")
            .select(F.col("dst").alias("url"))
            .dropDuplicates(["url"])
            .join(visited, "url", "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint()  # eager: truncates per-round lineage
        )
        if not nxt.take(1):  # frontier drained — graph exhausted
            break
        out = out.unionByName(nxt)
        visited = visited.unionByName(nxt.select("url"))
        frontier = nxt
    return out


# ---------------------------------------------------------------------------
# robots.txt Robots-Exclusion-Protocol gate (RFC 9309) — the frontier
# policy step the reference delegates to scrapy's ROBOTSTXT_OBEY
# (etl_web_crawl.py settings); here it is pure dataflow over a rules
# dim table so the gate composes with crawl_frontier/expand_sitemaps.
# ---------------------------------------------------------------------------


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Evaluate RFC 9309 path rules: adds ``robots_allowed_i``.

    ``rules`` is a dim table ``(host string, prefix string, allow
    boolean)`` — one row per Allow/Disallow line for the matched
    user-agent group. Decision per URL: among rules of the URL's host
    whose ``prefix`` is a prefix of the URL path(+query), the LONGEST
    octet-prefix wins; on equal length Allow wins; no matching rule →
    allowed (RFC 9309 §2.2.2). ``$``/``*`` wildcard rules are expanded
    upstream when the robots.txt is parsed (non-goal here).

    Scale shape: rules are per-host and broadcast (robots files are
    tiny; even 10^8 hosts × few rules fits a few GB — shard by host
    bucketing if not); the winner is resolved with a single
    partial-aggregatable ``max(struct(len, allow))`` groupBy on the
    url — no window — then joined back to the input on the url key,
    so payload columns never ride the aggregation or the broadcast.
    """
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    path = F.coalesce(
        F.nullif(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1), F.lit("")),
        F.lit("/"),
    )
    keyed = urls.select(u.alias("_u"), host.alias("_host"), path.alias("_path"))
    r = rules.select(
        F.lower(F.col("host")).alias("_host"),
        F.col("prefix").alias("_prefix"),
        F.col("allow").cast("boolean").alias("_allow"),
    )
    verdict = (
        keyed.join(
            F.broadcast(r),
            (keyed["_host"] == r["_host"]) & keyed["_path"].startswith(r["_prefix"]),
            "left",
        )
        .groupBy("_u")
        .agg(
            F.max(
                F.struct(
                    F.length("_prefix").alias("l"),
                    F.col("_allow").cast("int").alias("a"),
                )
            ).alias("_m")
        )
        .select(
            "_u",
            F.coalesce(F.col("_m.a") == 1, F.lit(True)).cast("int").alias(
                "robots_allowed_i"
            ),
        )
    )
    # LEFT join: a gate must be row-preserving — a NULL url never
    # equals its verdict key, and silently dropping such rows would
    # change the frame's row count (NULL url ⇒ NULL verdict instead)
    return urls.join(verdict, urls[url_col] == verdict["_u"], "left").drop("_u")
