"""URL/path/title/content-type scalar enrichments (pure Column exprs).

Reimplements the reference's per-row path/id plugins as vectorized
expressions:

- enhance_path.py:16-66 — protocol strip, separator normalization,
  path-level facets, basename, lowercased extension
- enhance_mapping_id.py:25-77 — longest-prefix id mapping + reverse
- clean_title.py:18-47 — title fallback cascade
- enhance_contenttype_group.py:13-76 — content-type → group mapping
- enhance_file_mtime.py:26-36 — `yyyy-MM-dd'T'HH:mm:ss'Z'` formatting
- enhance_file_size.py:25-31 — byte size
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_PATH_LEVELS = 6  # fixed-width typed model for path<i>_s facets

STRIP_PREFIXES = ("file://", "http://", "https://")


def _normalized_path(docid: Column, strip_prefixes: tuple[str, ...]) -> Column:
    """protocol strip (first match only), backslash/#→'/', '//'→'/'."""
    # anchored alternation: only a leading prefix is stripped, first
    # (i.e. any one) match only — reference: startswith + replace(count=1)
    pat = "^(" + "|".join(strip_prefixes) + ")"
    c = F.regexp_replace(docid, pat, "")
    c = F.translate(c, "\\#", "//")
    c = F.regexp_replace(c, "//+", "/")  # reference collapses '//'
    return c


def with_path_facets(
    df: DataFrame,
    id_col: str = "url",
    strip_prefixes: tuple[str, ...] = STRIP_PREFIXES,
    levels: int = MAX_PATH_LEVELS,
) -> DataFrame:
    """filename_extension_s, path0_s..pathN_s, path_basename_s.

    The reference emits a dynamic number of path<i>_s fields; the typed
    model uses a fixed budget of ``levels`` columns plus the full
    ``path_ss`` array (no information loss, schema is stable).
    """
    docid = F.col(id_col)
    # os.path.splitext: extension after the last dot of the basename,
    # empty when the basename has no dot or starts with its only dot.
    ext = F.lower(F.regexp_extract(docid, r"[^/\\]*\.([^./\\]+)$", 1))
    df = df.withColumn(
        "filename_extension_s", F.when(ext != "", ext)
    )

    norm = _normalized_path(docid, strip_prefixes)
    parts = F.split(norm, "/")
    # drop empty leading element from absolute unix paths
    parts = F.when(
        F.element_at(parts, 1) == "", F.slice(parts, 2, F.size(parts) - 1)
    ).otherwise(parts)
    n = F.size(parts)
    domain_only = (n == 1) | ((n == 2) & norm.endswith("/"))

    df = df.withColumn(
        "path_ss",
        F.when(domain_only, F.slice(parts, 1, 1)).otherwise(
            F.slice(parts, 1, n - 1)
        ),
    )
    df = df.withColumn(
        "path_basename_s",
        F.when(
            ~domain_only & (F.element_at(parts, -1) != ""), F.element_at(parts, -1)
        ),
    )
    for i in range(levels):
        df = df.withColumn(
            f"path{i}_s", F.try_element_at(F.col("path_ss"), F.lit(i + 1))
        )
    return df


def mapping_id(docid: Column, mappings: dict[str, str]) -> Column:
    """longest-prefix rewrite (enhance_mapping_id.py:25-49): the deepest
    matching ``map_from`` wins; replace its first occurrence."""
    expr = docid
    # wrap shortest-first so the OUTERMOST (first-evaluated) WHEN is the
    # longest prefix — equivalent to the reference's max-len scan
    for map_from, map_to in sorted(mappings.items(), key=lambda kv: len(kv[0])):
        expr = F.when(
            docid.startswith(map_from),
            F.concat(F.lit(map_to), docid.substr(F.lit(len(map_from) + 1), F.length(docid))),
        ).otherwise(expr)
    return expr


def mapping_id_reverse(docid: Column, mappings: dict[str, str]) -> Column:
    """reverse mapping (enhance_mapping_id.py:53-77)."""
    return mapping_id(docid, {v: k for k, v in mappings.items()})


def clean_title(
    title: Column, subject: Column | None, docid: Column
) -> Column:
    """title → subject → last path segment of id (clean_title.py:18-47)."""
    cands = [F.when(title != "", title)]
    if subject is not None:
        cands.append(F.when(subject != "", subject))
    cands.append(F.element_at(F.split(docid, "/"), -1))
    return F.coalesce(*cands)


# content-type prefix → group (mirrors the reference's public mapping
# table, enhance_contenttype_group.py:16-47 — behavioral config data)
CONTENTTYPE_GROUPS: tuple[tuple[str, str], ...] = (
    ("application/vnd.ms-excel", "Spreadsheet"),
    ("application/vnd.oasis.opendocument.spreadsheet-template", "Spreadseheet template"),
    ("application/vnd.oasis.opendocument.spreadsheet", "Spreadsheet"),
    ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", "Spreadsheet"),
    ("application/vnd.openxmlformats-officedocument.spreadsheetml.template", "Spreadsheet template"),
    ("text", "Text document"),
    ("application/gzip text", "Text document"),
    ("application/pdf", "Text document"),
    ("application/msword", "Text document"),
    ("application/vnd.openxmlformats-officedocument.wordprocessingml.document", "Text document"),
    ("application/vnd.openxmlformats-officedocument.wordprocessingml.template", "Text document template"),
    ("application/vnd.oasis.opendocument.text-template", "Text document template"),
    ("application/vnd.oasis.opendocument.text", "Text document"),
    ("application/rtf", "Text document"),
    ("application/vnd.ms-powerpoint", "Presentation"),
    ("application/vnd.oasis.opendocument.presentation-template", "Presentation template"),
    ("application/vnd.oasis.opendocument.presentation", "Presentation"),
    ("application/vnd.openxmlformats-officedocument.presentationml.presentation", "Presentation"),
    ("application/vnd.openxmlformats-officedocument.presentationml.template", "Presentation template"),
    ("image", "Image"),
    ("audio", "Audio"),
    ("video", "Video"),
    ("application/mp4", "Video"),
    ("application/x-matroska", "Video"),
    ("application/vnd.etsi.asic-e+zip", "Electronic Signature Container"),
    ("Knowledge graph", "Knowledge graph"),
)

SUFFIX_GROUPS: tuple[tuple[str, str], ...] = ((".csv", "Spreadsheet"),)


def content_type_group(content_type: Column, docid: Column) -> Column:
    """array of matching groups: every prefix match + suffix match,
    first-match order, deduped (enhance_contenttype_group.py:56-76)."""
    matches = [
        F.when(content_type.startswith(prefix), F.lit(group))
        for prefix, group in CONTENTTYPE_GROUPS
    ]
    matches += [
        F.when(F.upper(docid).endswith(suffix.upper()), F.lit(group))
        for suffix, group in SUFFIX_GROUPS
    ]
    arr = F.filter(F.array(*matches), lambda v: v.isNotNull())
    return F.when(F.size(arr) > 0, F.array_distinct(arr))


def file_modified_dt(ts: Column) -> Column:
    """enhance_file_mtime.py:29-36 `%Y-%m-%dT%H:%M:%SZ` string."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def file_size_i(binary: Column) -> Column:
    return F.length(binary).cast("long")


# ---------------------------------------------------------------------------
# Connector_Web scalar semantics (etl_web.py:125-221): uri
# normalization and the modification-time cascade. Acquisition (the
# download itself) happened upstream — pages landed in the table with
# crawl metadata — but the derivations over that metadata are these.
# ---------------------------------------------------------------------------


def normalize_uri(uri: Column) -> Column:
    """strip + prepend ``http://`` when no protocol (etl_web.py:136-140,
    protocols http/https/ftp/ftps, case-insensitive)."""
    t = F.trim(uri)
    return F.when(
        F.lower(t).rlike("^(https?|ftps?)://"), t
    ).otherwise(F.concat(F.lit("http://"), t))


def parse_http_date(header: Column) -> Column:
    """RFC 1123 HTTP date header → timestamp (the dateparser.parse of
    etl_web.py:174-209); null on absent/unparseable, which the cascade
    then falls through — matching the reference's try/except-False.
    HTTP dates are always GMT (RFC 9110 §5.6.7), so the zone token is
    stripped and the value read as UTC (session TZ is pinned UTC); the
    redundant leading weekday is stripped too — Spark's post-3.0
    datetime parser refuses day-of-week patterns on the parse side."""
    cleaned = F.regexp_replace(
        F.regexp_replace(header, r"^[A-Za-z]{3},\s+", ""), r"\s+(GMT|UTC)$", ""
    )
    return F.to_timestamp(cleaned, "dd MMM yyyy HH:mm:ss")


def web_mtime_cascade(
    meta_ts: Column,
    http_last_modified: Column,
    http_date: Column,
    crawl_ts: Column,
) -> Column:
    """modification-time cascade (etl_web.py:163-216): html meta
    last-modified → HTTP Last-Modified → HTTP Date → 'now', which in
    the landed-table model is the crawl time (warc_ts)."""
    return F.coalesce(meta_ts, http_last_modified, http_date, crawl_ts)


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL dedup — beyond-reference
# curation tier (the reference keys everything on the raw uri,
# etl_web.py:136-140 only prepends a scheme; web pipelines crawl the
# same resource under scheme/host-case/tracking-param/fragment
# variants, so canonical-URL dedup is the FIRST dedup pass every
# public pipeline (CCNet, C4, RefinedWeb via courlan) runs — cheaper
# than any content hash because it needs no payload bytes).
# ---------------------------------------------------------------------------

#: query parameters that never change the resource: click/campaign
#: tracking ids. Names prefixed ``utm_`` are dropped wholesale.
TRACKING_PARAMS: tuple[str, ...] = (
    "gclid", "fbclid", "msclkid", "igshid", "mc_cid", "mc_eid",
    "ref_src", "spm", "yclid", "wbraid", "gbraid",
)

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def canonical_url(
    url: Column, tracking_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """RFC 3986-style canonical form, pure JVM Column algebra:

    - lowercase scheme (absent → ``http``) and host; strip userinfo,
      trailing host dots, and the scheme's default port (80/443);
    - drop the fragment;
    - path: collapse ``//`` runs and ``.`` segments, strip the
      trailing slash (root stays ``/``) — one split/filter/join does
      all three.  ``..`` segments are kept literal (crawler frontiers
      emit resolved URLs; documented non-goal);
    - query: drop ``utm_*`` and known tracking params, sort the rest
      byte-wise, drop the ``?`` when nothing survives.

    Every step is a regexp/array expression with an exact DuckDB twin
    (the driver oracle re-derives the whole chain in SQL), so the
    canonicalization SPEC is pinned by the correctness gate, not just
    exercised by it. NULL in → NULL out.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    raw_scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    scheme = F.when(raw_scheme == "", F.lit("http")).otherwise(raw_scheme)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1)), r"^[^@]*@", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    bare = F.regexp_replace(F.regexp_replace(hostport, r":[0-9]+$", ""), r"\.+$", "")
    default_port = (
        F.when(scheme == "https", F.lit("443"))
        .when(scheme == "http", F.lit("80"))
        .otherwise(F.lit(""))
    )
    host = F.when(
        (port == "") | (port == default_port), bare
    ).otherwise(F.concat(bare, F.lit(":"), port))
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    segs = F.filter(
        F.split(F.regexp_extract(pathq, r"^([^?]*)", 1), "/"),
        lambda s: (s != "") & (s != "."),
    )
    path = F.concat(F.lit("/"), F.array_join(segs, "/"))
    q = F.regexp_extract(pathq, r"\?(.*)$", 1)
    keep = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~F.lower(F.split(p, "=").getItem(0)).startswith("utm_")
        & ~F.lower(F.split(p, "=").getItem(0)).isin(*tracking_params),
    )
    qc = F.array_join(F.array_sort(keep), "&")
    out = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
    )
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(out)


def with_url_dedup(
    df, url_col: str = "url", order_col: str = "doc_id"
) -> "DataFrame":
    """canonical-URL dedup: adds ``canonical_url_s`` and
    ``is_url_keeper_i`` (1 on the first row per canonical form,
    ordered by ``order_col`` then raw url — deterministic keeper).

    Scale shape: the window shuffles url-grain scalar rows keyed by
    the canonical string (payload columns should not be on this frame
    — dedup the url table, then semi-join keepers against the corpus);
    at 10^12 rows key the exchange on ``xxhash64(canonical_url_s)``
    via repartition before the window if canonical strings are long.
    """
    from pyspark.sql import Window

    out = df.withColumn("canonical_url_s", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url_s").orderBy(
        F.col(order_col).asc(), F.col(url_col).asc()
    )
    return out.withColumn(
        "is_url_keeper_i", (F.row_number().over(w) == 1).cast("int")
    )
