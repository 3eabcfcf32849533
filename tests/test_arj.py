"""ARJ container tier (operators/arj.py + explode dispatch).

Reference bar: the zip-tier child contract applied to ``.arj`` files,
which Tika reads through Commons Compress's ArjArchiveInputStream —
itself STORED-only (it throws on compressed entries), so this tier's
loud failure on methods 1-4 is exact parity, not a seam.  The fixture
writer is ours (no arj tooling in the container); the reader is
additionally pinned on a hand-assembled TECH.DOC-literal archive.
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from open_semantic_etl_spark.operators.arj import (
    build_arj,
    arj_members,
    sniff_arj,
)


def test_roundtrip():
    files = {"readme.txt": b"hello arj", "sub/page.html": b"<p>x</p>",
             "empty.bin": b""}
    arc = build_arj(files)
    assert sniff_arj(arc)
    assert dict(arj_members(arc)) == files


def test_hand_assembled_spec_literal():
    """field-by-field blocks straight from the TECH.DOC layout —
    archive header, one stored file with a DOS backslash path, end
    marker; CRCs computed over exactly the basic-header bytes."""
    payload = b"spec literal"

    def blk(flags, method, ftype, name, data_):
        hdr = struct.pack(
            "<BBBBBBBBIIIIHHH", 30, 11, 1, 0, flags, method, ftype, 0,
            0x11223344, len(data_), len(data_),
            zlib.crc32(data_) & 0xFFFFFFFF, 0, 0o644, 0,
        ) + name + b"\x00\x00"
        return (b"\x60\xea" + struct.pack("<H", len(hdr)) + hdr
                + struct.pack("<I", zlib.crc32(hdr) & 0xFFFFFFFF)
                + struct.pack("<H", 0) + data_)

    arc = (
        blk(0, 0, 2, b"a.arj", b"")
        + blk(0x10, 0, 0, b"docs\\note.txt", payload)
        + b"\x60\xea\x00\x00"
    )
    assert arj_members(arc) == [("docs/note.txt", payload)]


def test_compressed_and_garbled_fail_loudly():
    arc = bytearray(build_arj({"x.txt": b"body"}))
    # second block's method byte: find its header (skip archive hdr)
    second = arc.find(b"\x60\xea", 2)
    hdr_at = second + 4
    bsize = struct.unpack_from("<H", arc, second + 2)[0]
    for patch_off, patch_val, msg in ((5, 1, "compressed"), (4, 0x11, "garbled")):
        blob = bytearray(arc)
        blob[hdr_at + patch_off] = patch_val
        hdr = bytes(blob[hdr_at : hdr_at + bsize])
        struct.pack_into("<I", blob, hdr_at + bsize, zlib.crc32(hdr) & 0xFFFFFFFF)
        with pytest.raises(ValueError, match=msg):
            arj_members(bytes(blob))


def test_crc_flip_fails():
    arc = bytearray(build_arj({"z.txt": b"payload under crc"}))
    arc[arc.find(b"payload under crc")] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        arj_members(bytes(arc))


def test_truncated_tail_keeps_leading_members():
    arc = build_arj({"keep.txt": b"k" * 40, "lost.txt": b"l" * 40})
    cut = arc.find(b"l" * 40) + 10
    assert arj_members(arc[:cut]) == [("keep.txt", b"k" * 40)]


def test_explode_dispatch_both_nesting_directions(spark):
    import io
    import zipfile

    from pyspark.sql import Row

    from open_semantic_etl_spark.sources.explode import explode_zip

    inner_zip = io.BytesIO()
    with zipfile.ZipFile(inner_zip, "w") as z:
        z.writestr("deep.txt", "zip in arj")
    arj_with_zip = build_arj({"inner.zip": inner_zip.getvalue(), "top.txt": b"t"})
    outer_zip = io.BytesIO()
    with zipfile.ZipFile(outer_zip, "w") as z:
        z.writestr("old.arj", build_arj({"nested.txt": b"arj in zip"}))
    df = spark.createDataFrame(
        [Row(url="a://1", html=bytearray(arj_with_zip)),
         Row(url="z://2", html=bytearray(outer_zip.getvalue()))]
    )
    got = {r["url"]: bytes(r["html"]) for r in explode_zip(df).collect()}
    assert got["a://1/inner.zip/deep.txt"] == b"zip in arj"
    assert got["a://1/top.txt"] == b"t"
    assert got["z://2/old.arj/nested.txt"] == b"arj in zip"


def test_extract_html_labels_arj():
    from open_semantic_etl_spark.operators.htmlx import extract_html

    r = extract_html(build_arj({"a": b"x"}))
    assert r["content_type"] == "application/x-arj" and r["content"] == ""


def test_roundtrip_property():
    """property: any unique-name member dict survives build→parse
    (hypothesis over paths and binary payloads)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                               whitelist_characters="_-. "),
        min_size=1, max_size=12,
    ).filter(lambda s: s.strip() and s not in (".", ".."))
    path = st.lists(name, min_size=1, max_size=3).map("/".join)
    members = st.dictionaries(path, st.binary(max_size=300), max_size=6)

    @given(members)
    @settings(max_examples=40, deadline=None)
    def check(files):
        assert dict(arj_members(build_arj(files))) == files

    check()


def test_fuzz_total_function():
    rng = random.Random(0xA12)
    base = build_arj({"a.txt": b"alpha", "b/c.txt": b"beta" * 20})
    for i in range(600):
        buf = bytearray(base[: rng.randrange(1, len(base) + 1)] if i % 2 else base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            for _name, payload in arj_members(bytes(buf)):
                assert isinstance(payload, bytes)
        except ValueError:
            pass
