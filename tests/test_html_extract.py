"""Contract tests for the HTML/PDF extraction core and byte-identity.

Mirrors the reference's fixture style (test_etl_file.py:34-41,
test_enhance_extract_text_tika_server.py:28-161): golden assertions on
titles, content sentinels, and error capture — plus the BASELINE.json
per-url invariant: extracted text byte-identical to the expected text
carried by the synthetic pages table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_semantic_etl_spark.operators.htmlx import extract_html, sniff_content_type
from open_semantic_etl_spark.operators.pdfio import build_pdf, parse_pdf
from open_semantic_etl_spark.sources.pages import page_record, pages_df

_FIXTURE = b"""<!DOCTYPE html><html><head><title>Example  Domain</title>
<meta name="description" content="A test   page">
<meta property="article:published_time" content="2024-03-05T10:11:12Z">
<meta charset="utf-8"></head><body>
<header><div>SiteName brand tagline goes here okay</div></header>
<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">About us page</a></li></ul></nav>
<main><h2>Some head</h2>
<p>This is the first main paragraph with enough characters to be kept by the extractor heuristic.</p>
<p>Second paragraph also long enough, with an inline <a href="http://x">link word</a> inside the flow of text here.</p>
<ul><li><a href="/r1">Related one</a></li><li><a href="/r2">Related two</a></li></ul>
</main>
<aside>We use cookies to improve your experience on this site</aside>
<footer>Copyright 2024 SiteName. All rights reserved worldwide.</footer>
<script>var x = 'should never appear';</script>
</body></html>"""


def test_boilerplate_strip_golden():
    r = extract_html(_FIXTURE)
    assert r["ok"] and r["err"] is None
    assert r["content"] == (
        "This is the first main paragraph with enough characters to be kept by the extractor heuristic.\n"
        "Second paragraph also long enough, with an inline link word inside the flow of text here."
    )
    assert r["title"] == "Example Domain"  # whitespace-normalized
    assert r["description"] == "A test page"
    assert r["headings"] == ["Some head"]
    assert str(r["meta_ts"]) == "2024-03-05 10:11:12+00:00"
    assert "should never appear" not in r["content"]
    assert "Copyright" not in r["content"]
    assert "cookies" not in r["content"]


def test_short_page_fallback():
    r = extract_html(b"<html><body><p>tiny page</p></body></html>")
    assert r["content"] == "tiny page"


def test_encodings():
    l1 = (
        '<html><head><meta charset="iso-8859-1"></head><body>'
        "<p>Die Größe der Übung war außerordentlich gut für alle Beteiligten.</p>"
        "</body></html>"
    ).encode("latin-1")
    r = extract_html(l1)
    assert r["encoding"] == "iso-8859-1"
    assert "Größe" in r["content"]

    u16 = "<html><body><p>UTF sixteen page with enough characters here surely</p></body></html>"
    r = extract_html(b"\xff\xfe" + u16.encode("utf-16-le"))
    assert r["encoding"] == "utf-16-le"
    assert not r["content"].startswith("﻿")


def test_malformed_markup():
    r = extract_html(
        b"<body><p>First unclosed paragraph block with plenty of characters here"
        b"<p>Second unclosed paragraph also has plenty of characters here</div>"
    )
    assert r["content"].count("\n") == 1 and r["ok"]


def test_binary_sniffing():
    assert extract_html(b"\x89PNG\r\nnoise\x00" * 4)["content_type"] == "image/png"
    assert extract_html(bytes([0, 1, 2, 255]) * 100)["content_type"] == "application/octet-stream"
    assert extract_html(b"")["content"] == ""
    assert extract_html(None)["ok"]
    assert sniff_content_type(b"PK\x03\x04zipdata") == "application/zip"


def test_pdf_roundtrip():
    pdf = build_pdf(
        ["TestPDFContent1 on TestPDFPage1", "TestPDFContent2 on TestPDFPage2"],
        title="TestPDFtitle",
        author="Test Author",
        n_images=2,
    )
    r = parse_pdf(pdf)
    assert r["ok"]
    assert r["pages"] == [
        "TestPDFContent1 on TestPDFPage1",
        "TestPDFContent2 on TestPDFPage2",
    ]
    assert r["title"] == "TestPDFtitle" and r["author"] == "Test Author"
    assert r["npages"] == 2 and r["n_images"] == 2

    via_html = extract_html(pdf)
    assert via_html["content_type"] == "application/pdf"
    assert "TestPDFContent1 on TestPDFPage1" in via_html["content"]
    assert via_html["needs_ocr"] is True  # embedded images → OCR tier

    assert parse_pdf(b"not a pdf")["ok"] is False


def test_pdf_escapes_and_plain():
    r = parse_pdf(build_pdf(["Hello (world)\nline \\two"], compress=False))
    assert r["pages"] == ["Hello (world)\nline \\two"]


def test_pdf_modern_layout_roundtrip():
    """post-2005 layout: dict objects packed in a compressed /ObjStm,
    cross-reference STREAM instead of a classic xref table/trailer —
    page text, info dict, and page count must round-trip identically
    (VERDICT r2 item 6)."""
    pages = ["ModernPage1 text", "ModernPage2 text", "ModernPage3 text"]
    classic = parse_pdf(build_pdf(pages, title="MT", author="MA"))
    m = build_pdf(pages, title="MT", author="MA", modern=True)
    assert b"/ObjStm" in m and b"/Type /XRef" in m and b"trailer" not in m
    r = parse_pdf(m)
    assert r["ok"], r["err"]
    assert r["pages"] == classic["pages"] == pages
    assert r["title"] == "MT" and r["author"] == "MA" and r["npages"] == 3


def test_pdf_out_of_order_page_objects():
    """page objects serialized in reversed file order (numbering and
    /Kids unchanged): page text AND pdf_images page_i must follow the
    page-tree order, not file order (ADVICE r2 pdfio)."""
    from open_semantic_etl_spark.operators.pdfio import pdf_images

    pages = ["OrderPage1", "OrderPage2", "OrderPage3"]
    for modern in (False, True):
        pdf = build_pdf(pages, modern=modern, reverse_page_objects=True)
        r = parse_pdf(pdf)
        assert r["ok"] and r["pages"] == pages, (modern, r["pages"])
    imgs = [[b"img-p1"], [b"img-p2"]]
    pdf = build_pdf(["t1", "t2"], images=imgs, reverse_page_objects=True)
    got = {(d["page_i"], bytes(d["image"])) for d in pdf_images(pdf)}
    assert got == {(1, b"img-p1"), (2, b"img-p2")}, got


def test_generator_closed_loop_pure():
    """Every generator variant byte-matches the extractor (no Spark)."""
    for i in range(300):
        rec = page_record(i)
        got = extract_html(rec["html"])
        assert got["content"] == rec["text"], f"row {i} variant {i % 10}"


def test_byte_identity_spark(spark):
    """BASELINE.json invariant end-to-end through the DataFrame stage."""
    from open_semantic_etl_spark.operators.html_extract import with_extraction

    ext = with_extraction(pages_df(spark, 400, partitions=4))
    assert ext.filter(F.col("content_txt") != F.col("text")).count() == 0
    assert ext.filter(~F.col("extract_ok")).count() == 0
    # hot host present for skew exercises
    hot = ext.filter(F.col("url").contains("big.example.com")).count()
    assert hot == 100  # 25% of 400


def test_fast_scanner_equals_htmlparser():
    """the regex scanner must match html.parser on every variant +
    adversarial fixtures (entities, rawtext script/style, stray '<',
    comments, self-closing tags)."""
    from open_semantic_etl_spark.operators import htmlx as H

    fixtures = [
        '<html><head><title>T &amp; A</title></head><body><p>Long enough paragraph '
        'with &quot;entities&quot; &amp; more textual content here ok.</p>'
        '<script>var x = "<p>not a tag</p>";</script><br/>'
        '<p>Another long paragraph follows the self closing break element fine.</p></body></html>',
        "<body><p>stray < 5 bracket in a long paragraph of text that stays</p></body>",
        "<body><!-- comment <p>no</p> --><p>Paragraph after an html comment with enough characters kept.</p>",
        "<body><style>p { c: red; }</style><p>Styled paragraph content long enough to be kept by extractor.</p></body>",
        # data-href must NOT be read as href (fast scanner previously
        # matched 'href=' as a substring of the attribute name)
        '<body><p>A long enough paragraph containing <a data-href="/wrong">anchor '
        "text words</a> to be kept by the content extractor heuristic fine.</p></body>",
        '<body><p>Mixed case <a HREF="/yes" data-href="/no">link here</a> in a long '
        "paragraph with plenty of characters to survive extraction rules.</p></body>",
    ]
    texts = fixtures + [
        H.decode_html(page_record(i)["html"])[0]
        for i in range(300)
        if not page_record(i)["html"].startswith(b"%PDF")
    ]
    for t in texts:
        slow = H._ContentParser(); slow.feed(t); slow.close()
        fast = H._ContentParser(); H._fast_feed(fast, t); fast.close()
        assert (slow.blocks, slow.title, slow.description, slow.headings,
                slow.links, slow.meta_ts, slow.n_images) == (
               fast.blocks, fast.title, fast.description, fast.headings,
               fast.links, fast.meta_ts, fast.n_images), t[:120]


def test_heavy_profile_byte_identity():
    """the ~40 KB CC-profile pages keep the closed-loop contract:
    extract_html(html) == expected text, boilerplate farms stripped."""
    from open_semantic_etl_spark.operators.htmlx import extract_html
    from open_semantic_etl_spark.sources.pages import page_record

    sizes = []
    for i in range(60):
        r = page_record(i, profile="heavy")
        sizes.append(len(r["html"]))
        assert extract_html(r["html"])["content"] == r["text"], r["url"]
    assert sum(sizes) / len(sizes) > 25_000  # genuinely heavy pages


def test_pdf_type0_cid_tounicode_roundtrip():
    """Type0/Identity-H composite font: 2-byte-CID hex shows decode
    through the /ToUnicode CMap — full-unicode page text round-trips in
    classic AND modern layouts; a Type0 font with no usable ToUnicode
    errors (ok=False) instead of emitting mojibake."""
    pages = ["Unicode: Grüße, 東京 2026!", "Second ページ mixed", "züröck §42"]
    for modern in (False, True):
        r = parse_pdf(build_pdf(pages, title="UT", type0=True, modern=modern))
        assert r["ok"], (modern, r["err"])
        assert r["pages"] == pages and r["title"] == "UT" and r["npages"] == 3
    # literal text containing an angle-bracket hex lookalike stays literal
    r3 = parse_pdf(build_pdf(["see <FFFE> marker"]))
    assert r3["ok"] and r3["pages"] == ["see <FFFE> marker"]
    # CID text without a ToUnicode CMap → error, never wrong text
    broken = build_pdf(["abc"], type0=True).replace(b"/ToUnicode", b"/NoUnicode")
    rb = parse_pdf(broken)
    assert rb["ok"] is False and "ToUnicode" in rb["err"]


def test_pdf_stream_filters_roundtrip():
    """non-Flate stream filters (common in generated PDFs): ASCIIHex,
    ASCII85, RunLength, and chained /Filter arrays all decode; an
    unsupported filter yields ok=False, never mojibake."""
    pages = ["Filter page one text", "Zweite (Seite) \\x"]
    chains = [
        ("ASCIIHexDecode",),
        ("ASCII85Decode",),
        ("RunLengthDecode",),
        ("LZWDecode",),
        ("ASCII85Decode", "FlateDecode"),
        ("ASCIIHexDecode", "RunLengthDecode"),
        ("ASCIIHexDecode", "LZWDecode"),
    ]
    for chain in chains:
        pdf = build_pdf(pages, title="FT", content_filters=chain)
        r = parse_pdf(pdf)
        assert r["ok"], (chain, r["err"])
        assert r["pages"] == pages and r["title"] == "FT", chain
        # filters compose with the modern ObjStm/xref-stream layout too
        rm = parse_pdf(build_pdf(pages, content_filters=chain, modern=True))
        assert rm["ok"] and rm["pages"] == pages, chain
    # unsupported filter on the only content stream → error, not noise
    broken = build_pdf(pages, compress=False).replace(
        b"/Length", b"/Filter /CCITTFaxDecode /Length", 1
    )
    rb = parse_pdf(broken)
    assert rb["ok"] is False and "CCITTFaxDecode" in (rb["err"] or "")


def test_aes_fips197_vectors():
    """pin the AES core to the FIPS-197 appendix-C known-answer vectors
    (independent oracle: round-trip tests alone stay self-consistent if
    the generated tables are corrupted, silently decrypting to noise)."""
    from open_semantic_etl_spark.operators.pdfio import (
        _aes_decrypt_block,
        _aes_encrypt_block,
        _aes_expand,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for key, ct_hex in [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]:
        sched = _aes_expand(key)
        ct = _aes_encrypt_block(sched, pt)
        assert ct.hex() == ct_hex, (len(key), ct.hex())
        assert _aes_decrypt_block(sched, ct) == pt


def test_pdf_filter_name_in_page_text():
    """'/Filter /LZWDecode' APPEARING IN PAGE TEXT must not select a
    filter — only the stream dict does (review regression)."""
    for txt in (
        "The /Filter /LZWDecode entry selects LZW compression",
        "mention of /Filter /DCTDecode inside prose",
    ):
        for comp in (False, True):
            r = parse_pdf(build_pdf([txt], compress=comp))
            assert r["ok"], (txt, comp, r["err"])
            assert r["pages"] == [txt]


def test_pdf_lzw_codec_boundaries():
    """pure LZW encoder/decoder round-trip across the 9/10/11/12-bit
    width boundaries and a table-full clear (inputs with enough novel
    digrams to add thousands of table entries)."""
    from open_semantic_etl_spark.operators.pdfio import _lzw_decode, _lzw_encode

    cases = [
        b"",
        b"A",
        b"-----A---B",
        bytes(range(256)) * 3,
        # ~12k novel-pair bytes: crosses every width bump + the clear
        ("".join(f"{i % 977}:{(i * 7) % 991};" for i in range(2500))).encode(),
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data)) == data, len(data)


def test_pdf_lzw_early_change_schedule_vs_independent_impl():
    """EarlyChange schedule pinned against INDEPENDENT reference codecs
    with the literal 511/1023/2047 width-bump constants real writers
    (Acrobat) and decoders (pdfminer.six, pdf.js) use — a self
    round-trip masks a shared off-by-one shift (ADVICE r3: the old
    early=1 condition switched one table entry late, desyncing any
    stream that adds >253 entries)."""
    from open_semantic_etl_spark.operators.pdfio import _lzw_decode, _lzw_encode

    # bump tables: early=1 (PDF default) switches one entry before the
    # power-of-two boundary; early=0 switches exactly at it
    BUMPS = {1: {511: 10, 1023: 11, 2047: 12}, 0: {512: 10, 1024: 11, 2048: 12}}

    def ref_decode(s: bytes, early: int) -> bytes:
        # pdfminer-style decoder: append entry, then check len(table)
        # against the literal constants
        bumps = BUMPS[early]
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width, acc, nbits, prev = 9, 0, 0, None
        out = bytearray()
        for byte in s:
            acc = (acc << 8) | byte
            nbits += 8
            while nbits >= width:
                code = (acc >> (nbits - width)) & ((1 << width) - 1)
                nbits -= width
                if code == 256:
                    del table[258:]
                    width, prev = 9, None
                    continue
                if code == 257:
                    return bytes(out)
                if prev is None:
                    entry = table[code]
                else:
                    entry = table[code] if code < len(table) else prev + prev[:1]
                    table.append(prev + entry[:1])
                    width = bumps.get(len(table), width)
                out += entry
                prev = entry
        return bytes(out)

    # encoder-side constants: the encoder's table runs exactly one entry
    # ahead of the decoder's at any stream position (the decoder adds
    # its entry only after reading the NEXT code), so the encoder bumps
    # one entry later in its own count — at virtual table length
    # 512/1024/2048 for early=1 (513/1025/2049 for early=0)
    EBUMPS = {1: {512: 10, 1024: 11, 2048: 12}, 0: {513: 10, 1025: 11, 2049: 12}}

    def ref_encode(s: bytes, early: int) -> bytes:
        # TIFF-6 §13-style encoder with literal constants
        bumps = EBUMPS[early]
        codes = {bytes([i]): i for i in range(256)}
        nxt, width, acc, nbits = 258, 9, 0, 0
        out = bytearray()

        def put(c: int) -> None:
            nonlocal acc, nbits
            acc = (acc << width) | c
            nbits += width
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8

        put(256)
        run = b""
        for i in range(len(s)):
            k = run + s[i : i + 1]
            if k in codes:
                run = k
                continue
            put(codes[run])
            codes[k] = nxt
            nxt += 1
            width = bumps.get(nxt, width)  # encoder runs 1 entry ahead
            run = s[i : i + 1]
        if run:
            put(codes[run])
        put(257)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    # enough novel digrams to add >2000 table entries (crosses every bump)
    data = ("".join(f"{i % 977}:{(i * 7) % 991};" for i in range(900))).encode()
    for early in (1, 0):
        ref_stream = ref_encode(data, early)
        assert ref_decode(ref_stream, early) == data  # ref self-consistency
        # repo decoder accepts a standard-schedule stream …
        assert _lzw_decode(ref_stream, early=early) == data, f"early={early}"
        # … and the repo encoder emits one the standard decoder accepts
        assert ref_decode(_lzw_encode(data, early=early), early) == data, (
            f"early={early}"
        )


def test_pdf_feature_matrix_roundtrip():
    """every combination of the builder's structural features must
    round-trip: layout (classic/modern) x font (simple/Type0-CID) x
    encryption (none/rc4-40/rc4-128) x page-object order x stream
    compression x page count — interactions (e.g. encrypted ObjStm,
    reversed pages inside an xref stream) are where real-world parsers
    break, and each feature's own test exercises it only in isolation."""
    import itertools

    # simple fonts show latin-1 literal strings (builder contract:
    # full unicode needs type0), so the shared pages stay latin-1 and
    # the CJK page only rides the Type0 combos
    latin = ["Matrix page one", "Zwei (Grüße) §2", "dritte \\Seite"]
    uni = ["Matrix page one", "Zwei — Grüße §2", "三 tokyo 東京"]
    for modern, type0, enc, rev, comp, npages in itertools.product(
        (False, True), (False, True),
        (None, "rc4-40", "rc4-128", "aes-128", "aes-256"),
        (False, True), (False, True), (1, 3),
    ):
        pages = (uni if type0 else latin)[:npages]
        pdf = build_pdf(
            pages, title="MX", author="MA", modern=modern, type0=type0,
            encrypt=enc, reverse_page_objects=rev, compress=comp,
        )
        r = parse_pdf(pdf)
        combo = (modern, type0, enc, rev, comp, npages)
        assert r["ok"], (combo, r["err"])
        assert r["pages"] == pages, combo
        assert r["title"] == "MX" and r["author"] == "MA", combo
        assert r["npages"] == npages, combo


def test_pdf_rc4_encrypted_roundtrip():
    """standard security handler with empty user password: RC4 V1/R2
    (40-bit) and V2/R3 (128-bit) files decrypt transparently — page
    text, info strings, and per-page images round-trip; unsupported
    revisions and wrong passwords yield ok=False, never garbage."""
    import re as _re

    from open_semantic_etl_spark.operators.pdfio import pdf_images

    pages = ["Secret page one text", "Another crypted page", "dritte Seite §7"]
    for mode in ("rc4-40", "rc4-128", "aes-128", "aes-256"):
        r = parse_pdf(build_pdf(pages, title="Enc T", author="Enc A", encrypt=mode))
        assert r["ok"], (mode, r["err"])
        assert r["pages"] == pages and r["title"] == "Enc T", mode
    # composes with Type0/CID text
    for mode in ("rc4-128", "aes-128", "aes-256"):
        r2 = parse_pdf(build_pdf(["Grüße 東京"], type0=True, encrypt=mode))
        assert r2["ok"] and r2["pages"] == ["Grüße 東京"], mode
    # encrypted image payloads decrypt through pdf_images — classic
    # and modern (ObjStm + xref stream) layouts
    for modern in (False, True):
        p3 = build_pdf(
            ["t1", "t2"], images=[[b"img-one"], [b"img-two"]],
            encrypt="rc4-128", modern=modern,
        )
        got = {(d["page_i"], bytes(d["image"])) for d in pdf_images(p3)}
        assert got == {(1, b"img-one"), (2, b"img-two")}, modern
    # unsupported V → error; tampered /U (≠ empty-password file) → error
    rb = parse_pdf(build_pdf(["x"], encrypt="rc4-128").replace(b"/V 2", b"/V 4"))
    assert rb["ok"] is False and "unsupported encryption" in rb["err"]
    rt = parse_pdf(_re.sub(rb"/U <([0-9A-F]{8})", rb"/U <00000000",
                           build_pdf(["x"], encrypt="rc4-128")))
    assert rt["ok"] is False and "password" in rt["err"]


def test_pdf_encrypt_metadata_false_r4():
    """AESV2/R4 with /EncryptMetadata false: Algorithm 2 step f appends
    0xFFFFFFFF to the file-key MD5 input — without it the empty-user-
    password check fails a valid file (ADVICE r3 coverage gap)."""
    pages = ["meta stays plain", "body is crypted"]
    built = build_pdf(pages, title="NoMeta T", encrypt="aes-128-nometa")
    assert b"/EncryptMetadata false" in built
    r = parse_pdf(built)
    assert r["ok"], r["err"]
    assert r["pages"] == pages and r["title"] == "NoMeta T"
    # the flag changes the key: a plain aes-128 parse path still works
    r2 = parse_pdf(build_pdf(pages, encrypt="aes-128"))
    assert r2["ok"] and r2["pages"] == pages


def test_pdf_trailer_newest_revision_wins_by_offset():
    """file-level key resolution picks the match at the GREATEST byte
    offset across classic trailers AND XRef-stream dicts — an
    incrementally-updated file whose newest revision uses a classic
    trailer must not be governed by a stale earlier XRef stream
    (ADVICE r3: the XRef loop unconditionally overrode)."""
    import re as _re

    from open_semantic_etl_spark.operators.pdfio import (
        _ENCRYPT_REF_RE,
        _search_trailer_dicts,
    )

    xref_obj = (
        b"4 0 obj\n<< /Type /XRef /Size 9 /W [1 2 1] /Encrypt 5 0 R >>\n"
        b"stream\nxx\nendstream\nendobj\n"
    )
    classic = b"trailer\n<< /Size 9 /Encrypt 9 0 R >>\nstartxref\n0\n%%EOF\n"
    # newest revision is the classic trailer → its /Encrypt governs
    m = _search_trailer_dicts(b"%PDF-1.6\n" + xref_obj + classic, _ENCRYPT_REF_RE)
    assert m and m.group(1) == b"9"
    # newest revision is the XRef stream → it governs
    m2 = _search_trailer_dicts(b"%PDF-1.6\n" + classic + xref_obj, _ENCRYPT_REF_RE)
    assert m2 and m2.group(1) == b"5"


def test_pdf_tj_array_segments_one_line():
    """[array] TJ items are SAME-LINE segments: small kerning numbers
    join silently, large negative adjustments (≤ -180/1000 em, the
    word-space convention pdftotext uses) become a single space —
    joining items as separate lines scrambled real-world layouts."""
    from open_semantic_etl_spark.operators.pdfio import _stream_text

    body = (
        b"<< >>\nstream\nBT /F1 12 Tf "
        b"[(Hel) -20 (lo) -250 (wor) 15 (ld)] TJ T* "
        b"(next line) Tj ET\nendstream"
    )
    assert _stream_text(body) == "Hello world\nnext line"
    # trailing adjustment adds no dangling space; leading one no prefix
    body2 = b"<< >>\nstream\nBT [ -300 (a) -300 (b) -300 ] TJ ET\nendstream"
    assert _stream_text(body2) == "a b"


def test_pdf_quote_show_operators():
    """the ' (next-line show) and \" (spacing + show) operators carry
    text exactly like Tj."""
    from open_semantic_etl_spark.operators.pdfio import _stream_text

    body = (
        b"<< >>\nstream\nBT (first) Tj (second) ' 2 1 (third) \" ET\nendstream"
    )
    assert _stream_text(body) == "first\nsecond\nthird"


def test_pdf_encrypt_mention_in_text_not_encryption():
    """'/Encrypt 5 0 R' appearing in page text (a document ABOUT pdf
    security) must not be mistaken for real encryption — the live
    /Encrypt key lives only in trailer / XRef-stream dicts (review
    regression: the whole-file search failed such files)."""
    txt = "the trailer key /Encrypt 5 0 R selects the security handler"
    for comp in (False, True):
        r = parse_pdf(build_pdf([txt], compress=comp))
        assert r["ok"], (comp, r["err"])
        assert r["pages"] == [txt]
    # genuinely encrypted files still decrypt (trailer + XRef forms)
    for modern in (False, True):
        r = parse_pdf(build_pdf(["secret"], encrypt="rc4-128", modern=modern))
        assert r["ok"] and r["pages"] == ["secret"], modern


def test_pdf_images_indirect_resources():
    """a page whose /Resources is an indirect 'N 0 R' reference (the
    common real-world form) still associates images with the page."""
    from open_semantic_etl_spark.operators.pdfio import pdf_images

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page /Parent 9 0 R /Resources 3 0 R >> endobj\n"
        b"3 0 obj << /XObject << /Im5 5 0 R >> >> endobj\n"
        b"5 0 obj << /Type /XObject /Subtype /Image /Width 1 /Height 1 "
        b"/Length 7 >>\nstream\npayload\nendstream endobj\n"
    )
    got = [(d["page_i"], bytes(d["image"])) for d in pdf_images(pdf)]
    assert got == [(1, b"payload")], got


def test_pdf_octal_escapes_and_continuations():
    """\\ddd octal escapes (the standard way writers emit non-ASCII in
    literal strings, §7.3.4.2) and \\<EOL> continuations must decode —
    'Caf\\351' used to extract as 'Caf351' with ok=True."""
    from open_semantic_etl_spark.operators.pdfio import _unescape

    assert _unescape(rb"Caf\351") == "Café"
    assert _unescape(rb"\101\102\103") == "ABC"
    assert _unescape(rb"\0531") == "+1"      # 3-digit max, then literal
    assert _unescape(b"long \\\nline") == "long line"  # \<LF> drops
    assert _unescape(b"a\\\r\nb") == "ab"    # \<CRLF> drops both
    assert _unescape(rb"\b\f") == "\x08\x0c"


def test_pdf_tj_array_with_bracket_in_string():
    """a ']' inside a TJ string item ('[(cite [1])] TJ') must not stop
    the show-array from tokenizing — the line used to vanish silently."""
    from open_semantic_etl_spark.operators.pdfio import _stream_text

    blob = b"BT /F1 12 Tf [(see citation [1] here)] TJ ET"
    body = b"<< /Length %d >>\nstream\n" % len(blob) + blob + b"\nendstream"
    assert _stream_text(body, fonts={}) == "see citation [1] here"


def test_pdf_catalog_key_order_irrelevant():
    """'<< /Pages N 0 R /Type /Catalog >>' is legal (dict key order is
    arbitrary, §7.3.7) and must still enable the page-tree walk."""
    import re as _re

    data = build_pdf(["page one text", "page two text"], compress=False)
    reordered = _re.sub(
        rb"<<\s*/Type\s*/Catalog\s*/Pages\s+(\d+)\s+0\s+R",
        rb"<< /Pages \1 0 R /Type /Catalog",
        data,
    )
    assert reordered != data  # the rewrite actually happened
    r = parse_pdf(reordered)
    assert r["ok"] and r["pages"] == ["page one text", "page two text"]


def test_pdf_encrypted_real_writer_framing():
    """real writers encrypt exactly /Length bytes with an EOL before
    'endstream' that is framing, not data: text AND images must both
    survive (pdf_images returned [] for every real encrypted PDF)."""
    from open_semantic_etl_spark.operators.pdfio import pdf_images

    for mode in ("rc4-128", "aes-128"):
        p = build_pdf(
            ["text page", "second page"],
            images=[[b"img-one"], [b"img-two"]],
            encrypt=mode,
        )
        r = parse_pdf(p)
        assert r["ok"] and r["pages"] == ["text page", "second page"], mode
        got = {(d["page_i"], bytes(d["image"])) for d in pdf_images(p)}
        assert got == {(1, b"img-one"), (2, b"img-two")}, mode


def test_pdf_cf_subdict_length_not_key_bits():
    """the /CF crypt-filter sub-dict's /Length is a BYTE count; only
    the top-level /Length gives key bits. '/CF <<...Length 16...>>'
    ordered before '/Length 128' used to yield a 2-byte key and reject
    valid files as password-protected."""
    import re as _re

    data = build_pdf(["enc text page"], encrypt="rc4-128-v4")
    r0 = parse_pdf(data)
    assert r0["ok"] and r0["pages"] == ["enc text page"], r0["err"]
    # move the /CF sub-dict in front of the top-level /Length
    m = _re.search(
        rb"(/Filter /Standard /V 4 /R 4) (/Length 128) "
        rb"(/CF << /StdCF << /CFM /V2 .*?>> >>)",
        data,
    )
    assert m, "encrypt dict shape changed; update this test"
    reordered = data[: m.start()] + b"%s %s %s" % (
        m.group(1), m.group(3), m.group(2),
    ) + data[m.end():]
    r = parse_pdf(reordered)
    assert r["ok"], r["err"]
    assert r["pages"] == ["enc text page"]


def test_pdf_image_page_assoc_any_resource_name():
    """image resource names are writer-chosen (/X0, /Img1, …) — page
    association must not depend on this module's own /ImN convention."""
    import re as _re

    from open_semantic_etl_spark.operators.pdfio import pdf_images

    data = build_pdf(
        ["p one", "p two"], images=[[b"first-img"], [b"second-img"]]
    )
    renamed = _re.sub(rb"/Im(\d+)\b", rb"/Xq\1", data)
    assert renamed != data
    got = {(d["page_i"], bytes(d["image"])) for d in pdf_images(renamed)}
    assert got == {(1, b"first-img"), (2, b"second-img")}


def test_pdf_indirect_length_no_digit_backtrack():
    """'/Length 128 0 R' (indirect) must not capture '12' via lookahead
    backtracking — an encrypted stream was silently truncated to 12
    bytes and decrypted to garbage."""
    import re as _re

    m = _re.search(
        rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)",
        b"<< /Length 128 0 R /Filter /FlateDecode >>",
    )
    assert m is None
    m2 = _re.search(
        rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", b"<< /Length 128 >>"
    )
    assert m2 and m2.group(1) == b"128"


def test_pdf_balanced_parens_in_strings():
    """balanced unescaped parens inside literal strings are legal
    (§7.3.4.2, pdfTeX emits them) — both Tj and TJ-array items must
    keep the line instead of dropping it."""
    from open_semantic_etl_spark.operators.pdfio import _stream_text

    for blob, want in (
        (b"BT /F1 12 Tf [(a (b) c)] TJ ET", "a (b) c"),
        (b"BT (x (y) z) Tj ET", "x (y) z"),
    ):
        body = b"<< /Length %d >>\nstream\n" % len(blob) + blob + b"\nendstream"
        assert _stream_text(body, fonts={}) == want, blob


def test_pdf_v4_key_length_from_crypt_filter():
    """ISO 32000-1 defines the top-level /Length only for V 2/3: a V4
    file may carry the key length solely in the crypt filter's /Length
    (a BYTE count) — it used to default to 40-bit and reject the file."""
    import re as _re

    data = build_pdf(["v4 page"], encrypt="rc4-128-v4")
    stripped = _re.sub(rb"/V 4 /R 4 /Length 128 ", b"/V 4 /R 4 ", data)
    assert stripped != data
    r = parse_pdf(stripped)
    assert r["ok"], r["err"]
    assert r["pages"] == ["v4 page"]


def test_pdf_images_ignore_thumb_and_dup_refs():
    """non-painted image refs (/Thumb) must not join the painted-image
    list (pdfimages numbering), and a page referencing one image object
    twice yields ONE row."""
    import re as _re

    from open_semantic_etl_spark.operators.pdfio import pdf_images

    data = build_pdf(["p one"], images=[[b"painted"]])
    # attach a thumbnail image object and point /Thumb at it from the page
    thumb = (
        b"99 0 obj\n<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 5 >>\n"
        b"stream\nthumb\nendstream\nendobj\n"
    )
    with_thumb = _re.sub(
        rb"/Type\s*/Page\b(?!s)", b"/Type /Page /Thumb 99 0 R", data, count=1
    )
    assert with_thumb != data
    i = with_thumb.find(b"xref")
    if i == -1:
        i = len(with_thumb)
    with_thumb = with_thumb[:i] + thumb + with_thumb[i:]
    got = [(d["page_i"], bytes(d["image"])) for d in pdf_images(with_thumb)]
    # painted image on page 1; thumb unassociated (page_i=0), not page 1
    assert got == [(1, b"painted"), (0, b"thumb")], got
    # duplicate ref: bind a second name to the same image object
    m = _re.search(rb"/XObject\s*<<\s*(/\w+)\s+(\d+)\s+0\s+R", data)
    assert m, "fixture resource shape changed"
    dup = data[: m.end()] + b" /ImDup %s 0 R" % m.group(2) + data[m.end():]
    got2 = [(d["page_i"], bytes(d["image"])) for d in pdf_images(dup)]
    assert got2 == [(1, b"painted")], got2


def test_pdf_utf16be_and_hex_metadata():
    """text strings (§7.9.2.2): /Title as UTF-16BE-with-BOM literal
    (Word/Acrobat's form for any non-ASCII metadata — used to decode as
    'þÿ\\x00R…' mojibake) and as a hex string (Ghostscript's form —
    used to be missed entirely)."""
    import re as _re

    base = build_pdf(["body text"], title="XXTITLEXX", author="AUT")
    # 'Résumé' as UTF-16BE with BOM, emitted through octal escapes
    u16 = "Résumé".encode("utf-16-be")
    lit = b"".join(b"\\%03o" % c for c in b"\xfe\xff" + u16)
    with_u16 = base.replace(b"/Title (XXTITLEXX)", b"/Title (" + lit + b")")
    assert with_u16 != base
    r = parse_pdf(with_u16)
    assert r["ok"] and r["title"] == "Résumé", r
    assert r["pages"] == ["body text"]

    hexs = (b"\xfe\xff" + u16).hex().upper().encode()
    with_hex = base.replace(b"/Title (XXTITLEXX)", b"/Title <" + hexs + b">")
    assert with_hex != base
    r2 = parse_pdf(with_hex)
    assert r2["ok"] and r2["title"] == "Résumé", r2
    assert r2["author"] == "AUT"

    # nested balanced parens in a plain title survive
    with_paren = base.replace(
        b"/Title (XXTITLEXX)", b"/Title (Report (draft (v2)))"
    )
    r3 = parse_pdf(with_paren)
    assert r3["ok"] and r3["title"] == "Report (draft (v2))", r3


def test_pdf_winansi_font_encoding():
    """a simple font declaring /Encoding /WinAnsiEncoding decodes show
    bytes as cp1252: 0x93/0x94 are smart quotes there (Word-family
    writers), not the C1 control chars latin-1 yields."""
    data = build_pdf(["placeholder"], compress=False)
    tagged = data.replace(
        b"/Subtype /Type1 /BaseFont /Helvetica",
        b"/Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding",
    )
    assert tagged != data
    tagged = tagged.replace(b"(placeholder)", b"(\\223quoted\\224 \\226 dash)")
    r = parse_pdf(tagged)
    assert r["ok"], r["err"]
    assert r["pages"] == ["“quoted” – dash"], r["pages"]
    # without the declaration the bytes stay latin-1 (old behavior)
    plain = data.replace(b"(placeholder)", b"(\\223x\\224)")
    assert parse_pdf(plain)["pages"] == ["\x93x\x94"]


def test_pdf_xmp_metadata_fallback():
    """writers that fill only the XMP packet (no /Info /Title) still
    yield title/author — dc:title/dc:creator first rdf:li, XML
    entities unescaped, UTF-8 decoded; the Info dict wins when both
    are present."""
    xmp = (
        b"<x:xmpmeta xmlns:x='adobe:ns:meta/'><rdf:RDF>"
        b"<rdf:Description><dc:title><rdf:Alt>"
        b"<rdf:li xml:lang='x-default'>Caf\xc3\xa9 &amp; Tea</rdf:li>"
        b"</rdf:Alt></dc:title><dc:creator><rdf:Seq>"
        b"<rdf:li>A. Writer</rdf:li></rdf:Seq></dc:creator>"
        b"</rdf:Description></rdf:RDF></x:xmpmeta>"
    )
    meta_obj = (
        b"98 0 obj\n<< /Type /Metadata /Subtype /XML /Length %d >>\n"
        b"stream\n" % len(xmp) + xmp + b"\nendstream\nendobj\n"
    )

    def inject(data):
        i = data.find(b"xref")
        if i == -1:
            i = len(data)
        return data[:i] + meta_obj + data[i:]

    no_info = inject(build_pdf(["body"]))  # no title/author kwargs
    r = parse_pdf(no_info)
    assert r["ok"], r["err"]
    assert r["title"] == "Café & Tea" and r["author"] == "A. Writer", r

    with_info = inject(build_pdf(["body"], title="InfoT", author="InfoA"))
    r2 = parse_pdf(with_info)
    assert r2["title"] == "InfoT" and r2["author"] == "InfoA"


def test_pdf_inline_images():
    """BI…ID…EI inline images (§8.9.7) are extracted page-associated —
    poppler's pdfimages (the reference's OCR feeder) extracts them, so
    the OCR tier must see them; dict-lookalike text must NOT be
    misread as an image."""
    from open_semantic_etl_spark.operators.pdfio import pdf_images

    data = build_pdf(["page one", "page two"], compress=False)
    raw = b"BI /W 2 /H 1 /BPC 8 /CS /G ID\nXY EI\n"
    hexed = b"BI /W 1 /H 1 /F /AHx ID\n5A41> EI\n"
    # first content stream gets the raw image, second the AHx one
    i1 = data.find(b"ET\nendstream")
    assert i1 != -1
    data = data[:i1] + b"ET\n" + raw + data[i1 + 3:]
    i2 = data.find(b"ET\nendstream", i1 + len(raw) + 6)
    assert i2 != -1
    data = data[:i2] + b"ET\n" + hexed + data[i2 + 3:]
    got = [(d["page_i"], bytes(d["image"])) for d in pdf_images(data)]
    assert got == [(1, b"XY"), (2, b"ZA")], got
    # page text still extracts around the inline blocks
    r = parse_pdf(data)
    assert r["pages"] == ["page one", "page two"], r

    # text that merely mentions BI/ID/EI is not an image
    bait = build_pdf(["alpha BI beta ID gamma EI delta"], compress=False)
    assert pdf_images(bait) == []
    assert parse_pdf(bait)["pages"] == ["alpha BI beta ID gamma EI delta"]
