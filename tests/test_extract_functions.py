"""Golden tests for the scalar extractors, mirroring the reference's
unit tests (test_enhance_extract_email.py, test_enhance_path.py,
test_enhance_mapping_id.py, test_enhance_regex.py,
test_enhance_extract_law.py, test_enhance_extract_money.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_semantic_etl_spark.functions import extract as X
from open_semantic_etl_spark.functions import path as P


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string").select(col.alias("v"))
    return df.first()["v"]


# --- emails — test_enhance_extract_email.py:15-27 goldens -----------------


def test_emails(spark):
    text = (
        "one@localnet.localdomain at begin and two@localnet2.localdomain in the "
        "middle and end of the line three@localnet3.localdomain\n"
        "a_underscore@localnet.localdomain and some.points.here@localnet.localdomain"
    )
    emails = _one(spark, text, X.emails(F.col("text")))
    for e in [
        "one@localnet.localdomain",
        "two@localnet2.localdomain",
        "three@localnet3.localdomain",
        "a_underscore@localnet.localdomain",
        "some.points.here@localnet.localdomain",
    ]:
        assert e in emails
    domains = _one(spark, text, X.email_domains(X.emails(F.col("text"))))
    for d in ["localnet.localdomain", "localnet2.localdomain", "localnet3.localdomain"]:
        assert d in domains


def test_message_from_to(spark):
    text = "From: Alice Smith alice@a.example\nTo: bob@b.example\nbody x@y.example"
    assert _one(spark, text, X.message_from(F.col("text"))) == ["alice@a.example"]
    assert _one(spark, text, X.message_to(F.col("text"))) == ["bob@b.example"]


# --- phones — enhance_extract_phone.py semantics ---------------------------


def test_phones(spark):
    text = "call +49 30 123456789 or (030) 98765-4321 now, not 12345"
    phones = _one(spark, text, X.phones(F.col("text")))
    assert "+49 30 123456789" in phones
    norm = _one(spark, text, X.phones_normalized(X.phones(F.col("text"))))
    assert "+4930123456789" in norm
    assert all(n.lstrip("+").isdigit() for n in norm)
    assert all("+" not in n[1:] for n in norm)


# --- hashtags — enhance_extract_hashtags.py:12-18 -------------------------


def test_hashtags(spark):
    text = "short #ab ok #good and #verylongtag yes #x"
    assert _one(spark, text, X.hashtags(F.col("text"))) == ["#good", "#verylongtag"]


# --- IBAN — test_enhance_regex.py:19-26 goldens ----------------------------


def test_iban(spark):
    text = (
        "An IBAN DE75512108001245126199 from Germany and GB33BUKB20201555555555 "
        "from GB and not 75512108001245126199"
    )
    ibans = _one(spark, text, X.iban(F.col("text")))
    assert "DE75512108001245126199" in ibans
    assert "GB33BUKB20201555555555" in ibans
    assert "75512108001245126199" not in ibans


def test_parse_rules_tsv():
    rules = X.parse_rules_tsv("# comment\nfoo\\d+\tmy_facet_ss\t1\nbar\n")
    assert rules == [("foo\\d+", "my_facet_ss", 1), ("bar", "tag_ss", 0)]


# --- law clauses — test_enhance_extract_law.py:16-47 goldens ---------------


def test_law_clauses(spark):
    text = "\n".join(
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
    clauses = _one(spark, text, X.law_clauses(F.col("text")))
    for c in [
        "§ 888",
        "§ 987 b",
        "§ 12",
        "§ 123",
        "§ 345a",
        "§ 456 b",
        "§ 567 c",
        "§ 153 Abs. 1 Satz 2",
        "§ 52 Absatz 1 Nummer 2 Buchstabe c",
    ]:
        assert c in clauses, f"missing {c!r} in {clauses}"


def test_law_code_clauses(spark):
    text = "BGB § 153 Abs. 1 Satz 2 and more text § 444 CC".replace("\n", " ")
    df = spark.createDataFrame([(text,)], "text string")
    out = df.select(
        X.law_code_clauses(
            F.col("text"),
            X.law_clauses(F.col("text")),
            F.array(F.lit("BGB")),
            F.lit("Bürgerliches Gesetzbuch"),
        ).alias("v")
    ).first()["v"]
    # 'BGB § 153...' — code adjacent BEFORE the clause
    assert "§ 153 Abs. 1 Satz 2 Bürgerliches Gesetzbuch" in out


# --- money — test_enhance_extract_money.py:16-55 goldens -------------------


def test_money(spark):
    text = "\n".join(
        [
            "abc $ 123 xyz",
            "abc $ 124,000 xyz",
            "abc 234 $ xyz",
            "abc 235,000 $ xyz",
            "abc 236,99 $ xyz",
            "abc $1234 xyz",
            "abc 2345$ xyz",
            "4444 dollar",
            "44444 USD",
            "444 €",
            "445.000 €",
            "450,99 €",
            "4444 EUR",
            "46.000 EUR",
            "47.000,99 EUR",
            "44,22 EURO",
            "if ambiguous like $ 77 € for more completeness extract both",
        ]
    ).replace("\n", " ")
    labels = ("dollar", "dollars", "USD", "EURO", "EUR")
    moneys = _one(spark, text, X.money(F.col("text"), labels))
    for m in [
        "$ 123", "$ 124,000", "234 $", "235,000 $", "236,99 $", "$1234",
        "2345$", "4444 dollar", "44444 USD", "444 €", "445.000 €", "450,99 €",
        "4444 EUR", "46.000 EUR", "47.000,99 EUR", "44,22 EURO", "$ 77", "77 €",
    ]:
        assert m in moneys, f"missing {m!r}"


# --- path facets — test_enhance_path.py:15-33 goldens ----------------------


def test_path_facets(spark):
    df = spark.createDataFrame(
        [
            ("/home/user/test.pdf",),
            ("/home/user/test_without_filename_extension",),
            ("/home/user/test.PDF",),
            ("http://www.example.org/dir/doc.html",),
            ("file:///tmp/x.csv",),
            ("example.org",),
        ],
        "url string",
    )
    out = {r["url"]: r.asDict() for r in P.with_path_facets(df).collect()}

    r = out["/home/user/test.pdf"]
    assert r["path0_s"] == "home" and r["path1_s"] == "user"
    assert r["path_basename_s"] == "test.pdf"
    assert r["filename_extension_s"] == "pdf"

    assert out["/home/user/test_without_filename_extension"]["filename_extension_s"] is None
    assert out["/home/user/test.PDF"]["filename_extension_s"] == "pdf"

    r = out["http://www.example.org/dir/doc.html"]
    assert r["path0_s"] == "www.example.org" and r["path1_s"] == "dir"
    assert r["path_basename_s"] == "doc.html"

    r = out["file:///tmp/x.csv"]
    assert r["path0_s"] == "tmp" and r["path_basename_s"] == "x.csv"

    assert out["example.org"]["path0_s"] == "example.org"
    assert out["example.org"]["path_basename_s"] is None


# --- id mapping — test_enhance_mapping_id.py:14-51 goldens -----------------

_MAPPINGS = {
    "/": "file:///",
    "/testdir1/": "file:///deep1testdir1/",
    "/testdir1/testdir2/": "file:///deep2testdir1/deep2testdir2/",
}


def test_mapping_id(spark):
    df = spark.createDataFrame(
        [("/test",), ("/testdir1/test",), ("/testdir1/testdir2/test",)], "url string"
    )
    got = [r["v"] for r in df.select(P.mapping_id(F.col("url"), _MAPPINGS).alias("v")).collect()]
    assert got == [
        "file:///test",
        "file:///deep1testdir1/test",
        "file:///deep2testdir1/deep2testdir2/test",
    ]


def test_mapping_id_reverse(spark):
    df = spark.createDataFrame(
        [
            ("file:///test",),
            ("file:///deep1testdir1/test",),
            ("file:///deep2testdir1/deep2testdir2/test",),
        ],
        "url string",
    )
    got = [
        r["v"]
        for r in df.select(P.mapping_id_reverse(F.col("url"), _MAPPINGS).alias("v")).collect()
    ]
    assert got == ["/test", "/testdir1/test", "/testdir1/testdir2/test"]


# --- title fallback — clean_title.py:18-47 ---------------------------------


def test_clean_title(spark):
    df = spark.createDataFrame(
        [
            ("t1", "s1", "http://x/a.pdf"),
            ("", "s2", "http://x/b.pdf"),
            (None, None, "http://x/c.pdf"),
            ("", None, "http://x/d.pdf"),
        ],
        "title string, subject string, url string",
    )
    got = [
        r["v"]
        for r in df.select(
            P.clean_title(F.col("title"), F.col("subject"), F.col("url")).alias("v")
        ).collect()
    ]
    assert got == ["t1", "s2", "c.pdf", "d.pdf"]


# --- content-type group — enhance_contenttype_group.py goldens -------------


def test_content_type_group(spark):
    df = spark.createDataFrame(
        [
            ("application/pdf", "http://x/a.pdf"),
            ("image/png", "http://x/i.png"),
            ("application/vnd.ms-excel", "http://x/s.xls"),
            ("text/plain", "http://x/data.csv"),
            ("application/octet-stream", "http://x/blob.bin"),
        ],
        "ct string, url string",
    )
    got = {
        r["url"]: r["v"]
        for r in df.select(
            "url", P.content_type_group(F.col("ct"), F.col("url")).alias("v")
        ).collect()
    }
    assert got["http://x/a.pdf"] == ["Text document"]
    assert got["http://x/i.png"] == ["Image"]
    assert got["http://x/s.xls"] == ["Spreadsheet"]
    assert got["http://x/data.csv"] == ["Text document", "Spreadsheet"]
    assert got["http://x/blob.bin"] is None


def test_file_modified_dt(spark):
    from datetime import datetime, timezone

    df = spark.createDataFrame(
        [(datetime(2024, 3, 5, 10, 11, 12, tzinfo=timezone.utc),)], "ts timestamp"
    )
    assert (
        df.select(P.file_modified_dt(F.col("ts")).alias("v")).first()["v"]
        == "2024-03-05T10:11:12Z"
    )


def test_canonical_url(spark):
    cases = {
        # case, default port, // and . segments, trailing slash,
        # tracking params, param sort, fragment
        "HTTP://WWW.Example.org:80//a/./p7/?utm_source=f&b=2&a=1#x":
            "http://www.example.org/a/p7?a=1&b=2",
        # userinfo, trailing host dot, missing scheme
        "www.example.org./a/p7/": "http://www.example.org/a/p7",
        "http://user@www.example.org:80/a/p7?gclid=1":
            "http://www.example.org/a/p7",
        # non-default port and bare-name params survive; utm_* and
        # tracking ids drop case-insensitively
        "HTTPS://Host.COM:443/x?z=1&UTM_CAMPAIGN=x&y&a=&Gclid=9":
            "https://host.com/x?a=&y&z=1",
        "https://host.com:8443/x?b=2&a=1": "https://host.com:8443/x?a=1&b=2",
        # empty path → root; non-http scheme keeps its port
        "http://host": "http://host/",
        "ftp://Host:21/": "ftp://host:21/",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {r["u"]: r["c"] for r in df.select(
        "u", P.canonical_url(F.col("u")).alias("c")).collect()}
    for raw, want in cases.items():
        assert got[raw] == want, raw
    assert df.select(P.canonical_url(F.lit(None).cast("string")).alias("c")).first()["c"] is None


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over a combinatorial
    sweep — one Spark job, every (scheme × host × port × path × query ×
    fragment) combination; a canonical form must be a fixed point or
    url dedup keys drift under re-canonicalization."""
    import itertools

    schemes = ["", "http://", "HTTPS://", "ftp://"]
    hosts = ["Host.COM", "user:p@www.x.org.", "h"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "//a/./b/", "/a%20b/c", "/x/"]
    queries = ["", "?b=2&a=1", "?utm_source=t&z", "?a=&A=1&gclid=9"]
    frags = ["", "#frag"]
    urls = [
        "".join(c)
        for c in itertools.product(schemes, hosts, ports, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    c1 = P.canonical_url(F.col("u"))
    bad = (
        df.select("u", c1.alias("c1"), P.canonical_url(c1).alias("c2"))
        .filter(F.col("c1") != F.col("c2"))
        .collect()
    )
    assert bad == [], bad[:5]


def test_with_url_dedup_keeper(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.com/x?utm_source=1"),
            (2, "HTTP://A.COM/x"),
            (3, "http://a.com/y"),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: (r["canonical_url_s"], r["is_url_keeper_i"])
           for r in P.with_url_dedup(df).collect()}
    assert got[1] == ("http://a.com/x", 1)
    assert got[2] == ("http://a.com/x", 0)  # same canonical, later doc_id
    assert got[3] == ("http://a.com/y", 1)


def test_redact_pii(spark):
    from open_semantic_etl_spark.functions.extract import redact_pii

    df = spark.createDataFrame(
        [("write to a.b@mail.org, IBAN DE75512108001245126199, "
          "call +49 30 901820 42 now",)],
        "t string",
    )
    out = df.select(redact_pii(F.col("t")).alias("r")).first()["r"]
    assert "<EMAIL>" in out and "<IBAN>" in out and "<PHONE>" in out
    assert "a.b@mail.org" not in out
    assert "512108001245" not in out
    assert "901820" not in out
    # order contract: the IBAN digit run must not be half-eaten by the
    # phone pattern, and tokens must not re-match each other
    assert out == "write to <EMAIL>, IBAN <IBAN>, call <PHONE> now"
