"""RAR 4/5 container tier (operators/rar.py + explode dispatch).

Reference bar: the zip-tier child contract (enhance_zip.py:31-116)
applied to ``.rar`` downloads (Tika reaches them via junrar).  Only
STORED members decode — RARLAB's compression is proprietary and the
module fails loudly rather than guess (the PST-PERMUTE / 7z-BCJ2
rule).  The fixture writers are ours (no rar tooling exists in the
container), so both readers are additionally pinned on HAND-ASSEMBLED
spec-literal archives built field-by-field in this file.
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from open_semantic_etl_spark.operators.rar import (
    build_rar4,
    build_rar5,
    rar_members,
    sniff_rar,
)


def test_rar4_roundtrip():
    arc = build_rar4({"readme.txt": b"hello rar4", "docs\\page.html": b"<p>x</p>"})
    assert sniff_rar(arc) == 4
    got = dict(rar_members(arc))
    assert got == {"readme.txt": b"hello rar4", "docs/page.html": b"<p>x</p>"}


def test_rar5_roundtrip():
    arc = build_rar5({"a.txt": b"alpha", "d/b.bin": bytes(range(256))})
    assert sniff_rar(arc) == 5
    got = dict(rar_members(arc))
    assert got == {"a.txt": b"alpha", "d/b.bin": bytes(range(256))}


def test_rar4_hand_assembled_spec_literal():
    """field-by-field RAR4: marker sig, main header, one stored file,
    one DIRECTORY entry (skipped), end block — layout from the
    published block format, not the writer."""
    payload = b"spec literal body"
    name = b"spec.txt"

    def blk(btype, flags, body, add=b""):
        size = 7 + len(body) + (4 if flags & 0x8000 else 0)
        head = struct.pack("<BHH", btype, flags, size)
        if flags & 0x8000:
            head += struct.pack("<I", len(add))
        head += body
        return struct.pack("<H", zlib.crc32(head) & 0xFFFF) + head + add

    main = blk(0x73, 0x0000, b"\x00" * 6)
    fhdr = struct.pack(
        "<IBIIBBHI", len(payload), 2, zlib.crc32(payload) & 0xFFFFFFFF,
        0x12345678, 29, 0x30, len(name), 0x20,
    ) + name
    file_b = blk(0x74, 0x8000, fhdr, payload)
    # directory entry: window bits 0xE0 all set, no data
    dhdr = struct.pack("<IBIIBBHI", 0, 2, 0, 0, 29, 0x30, 3, 0x10) + b"sub"
    dir_b = blk(0x74, 0x8000 | 0x00E0, dhdr)
    end = blk(0x7B, 0x4000, b"")
    arc = b"Rar!\x1a\x07\x00" + main + file_b + dir_b + end
    assert rar_members(arc) == [("spec.txt", payload)]


def test_rar5_hand_assembled_spec_literal():
    """field-by-field RAR5 with single-byte vints and the
    size-field-EXCLUSIVE header CRC span (the other published
    interpretation from the writer's — both must verify)."""
    payload = b"rar5 spec body"
    name = b"five.txt"
    main_hdr = bytes([1, 0, 0])  # type=main flags=0 archive-flags=0
    file_hdr = (
        bytes([2, 0x02, len(payload), 0x04, len(payload), 0x20])
        + struct.pack("<I", zlib.crc32(payload) & 0xFFFFFFFF)
        + bytes([0, 0, len(name)])
        + name
    )
    end_hdr = bytes([5, 0, 0])
    arc = b"Rar!\x1a\x07\x01\x00"
    for hdr, data in ((main_hdr, b""), (file_hdr, payload), (end_hdr, b"")):
        crc = zlib.crc32(hdr) & 0xFFFFFFFF  # size-EXCLUSIVE span
        arc += struct.pack("<I", crc) + bytes([len(hdr)]) + hdr + data
    assert rar_members(arc) == [("five.txt", payload)]


def test_compressed_member_fails_loudly():
    # rar4: hand-built file block with METHOD 0x33 ("normal")
    def blk(btype, flags, body, add=b""):
        size = 7 + len(body) + (4 if flags & 0x8000 else 0)
        head = struct.pack("<BHH", btype, flags, size)
        if flags & 0x8000:
            head += struct.pack("<I", len(add))
        head += body
        return struct.pack("<H", zlib.crc32(head) & 0xFFFF) + head + add

    packed = b"\x01\x02\x03\x04"  # pretend-compressed bytes
    name = b"x.txt"
    fhdr = struct.pack(
        "<IBIIBBHI", 100, 2, 0xDEADBEEF, 0, 29, 0x33, len(name), 0x20
    ) + name
    arc = (
        b"Rar!\x1a\x07\x00"
        + blk(0x73, 0x0000, b"\x00" * 6)
        + blk(0x74, 0x8000, fhdr, packed)
    )
    with pytest.raises(ValueError, match="compressed"):
        rar_members(arc)

    # rar5: compression vint with method bits 7-9 = 1 (two-byte vint)
    payload = b"\x05\x06\x07"
    name5 = b"y.txt"
    file_hdr = (
        bytes([2, 0x02, len(payload), 0x00, 100, 0x20])  # no CRC flag
        + b"\x80\x01"  # compression vint: 128 = method 1
        + bytes([0, len(name5)])
        + name5
    )
    crc = zlib.crc32(bytes([len(file_hdr)]) + file_hdr) & 0xFFFFFFFF
    arc5 = (
        b"Rar!\x1a\x07\x01\x00"
        + struct.pack("<I", crc) + bytes([len(file_hdr)]) + file_hdr + payload
    )
    with pytest.raises(ValueError, match="compressed"):
        rar_members(arc5)


def test_rar4_name_must_fit_its_header():
    """a lying NAME_SIZE that reaches into the data area must raise,
    not slurp payload bytes into the member name."""

    def blk(btype, flags, body, add=b""):
        size = 7 + len(body) + (4 if flags & 0x8000 else 0)
        head = struct.pack("<BHH", btype, flags, size)
        if flags & 0x8000:
            head += struct.pack("<I", len(add))
        head += body
        return struct.pack("<H", zlib.crc32(head) & 0xFFFF) + head + add

    payload = b"data area bytes"
    fhdr = struct.pack(
        "<IBIIBBHI", len(payload), 2, zlib.crc32(payload) & 0xFFFFFFFF,
        0, 29, 0x30, 200, 0x20,  # NAME_SIZE = 200 >> header room
    ) + b"a.txt"
    arc = (
        b"Rar!\x1a\x07\x00"
        + blk(0x73, 0x0000, b"\x00" * 6)
        + blk(0x74, 0x8000, fhdr, payload)
    )
    with pytest.raises(ValueError, match="name"):
        rar_members(arc)


def test_member_crc_flip_fails():
    arc = bytearray(build_rar4({"z.txt": b"payload under crc"}))
    arc[arc.find(b"payload under crc")] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        rar_members(bytes(arc))
    arc5 = bytearray(build_rar5({"z.txt": b"payload under crc"}))
    arc5[arc5.find(b"payload under crc")] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        rar_members(bytes(arc5))


def test_truncated_tail_keeps_leading_members():
    arc = build_rar4({"keep.txt": b"k" * 40, "lost.txt": b"l" * 40})
    cut = arc.find(b"l" * 40) + 10
    assert rar_members(arc[:cut]) == [("keep.txt", b"k" * 40)]
    arc5 = build_rar5({"keep.txt": b"k" * 40, "lost.txt": b"l" * 40})
    cut = arc5.find(b"l" * 40) + 10
    assert rar_members(arc5[:cut]) == [("keep.txt", b"k" * 40)]


def test_encrypted_headers_fail_loudly():
    # rar4: main header with the headers-encrypted flag 0x0080
    def blk(btype, flags, body):
        head = struct.pack("<BHH", btype, flags, 7 + len(body)) + body
        return struct.pack("<H", zlib.crc32(head) & 0xFFFF) + head

    arc = b"Rar!\x1a\x07\x00" + blk(0x73, 0x0080, b"\x00" * 6)
    with pytest.raises(ValueError, match="encrypted"):
        rar_members(arc)
    # rar5: archive-encryption block (type 4)
    hdr = bytes([4, 0, 0])
    crc = zlib.crc32(bytes([len(hdr)]) + hdr) & 0xFFFFFFFF
    arc5 = b"Rar!\x1a\x07\x01\x00" + struct.pack("<I", crc) + bytes([len(hdr)]) + hdr
    with pytest.raises(ValueError, match="encrypted"):
        rar_members(arc5)


def test_explode_dispatch_both_nesting_directions(spark):
    from pyspark.sql import Row

    from open_semantic_etl_spark.sources.explode import explode_zip
    import io
    import zipfile

    inner_zip = io.BytesIO()
    with zipfile.ZipFile(inner_zip, "w") as z:
        z.writestr("deep.txt", "zip in rar")
    rar_with_zip = build_rar5({"inner.zip": inner_zip.getvalue(),
                               "top.txt": b"t"})
    outer_zip = io.BytesIO()
    with zipfile.ZipFile(outer_zip, "w") as z:
        z.writestr("arch.rar", build_rar4({"nested.txt": b"rar in zip"}))
    df = spark.createDataFrame(
        [Row(url="r://1", html=bytearray(rar_with_zip)),
         Row(url="z://2", html=bytearray(outer_zip.getvalue()))]
    )
    got = {r["url"]: bytes(r["html"]) for r in explode_zip(df).collect()}
    assert got["r://1/inner.zip/deep.txt"] == b"zip in rar"
    assert got["r://1/top.txt"] == b"t"
    assert got["z://2/arch.rar/nested.txt"] == b"rar in zip"


def test_extract_html_labels_rar():
    from open_semantic_etl_spark.operators.htmlx import extract_html

    r = extract_html(build_rar4({"a": b"x"}))
    assert r["content_type"] == "application/vnd.rar" and r["content"] == ""
    r = extract_html(build_rar5({"a": b"x"}))
    assert r["content_type"] == "application/vnd.rar"


def test_roundtrip_property_both_versions():
    """property: any unique-name member dict survives build→parse for
    BOTH wire formats (hypothesis over paths and binary payloads)."""
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
        for build in (build_rar4, build_rar5):
            got = dict(rar_members(build(files)))
            assert got == files

    check()


def test_fuzz_total_function():
    rng = random.Random(0x4A52)
    bases = [
        build_rar4({"a.txt": b"alpha", "b/c.txt": b"beta"}),
        build_rar5({"a.txt": b"alpha", "b/c.txt": b"beta"}),
    ]
    for i in range(600):
        base = bases[i % 2]
        buf = bytearray(base[: rng.randrange(1, len(base) + 1)] if i % 2 else base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            got = rar_members(bytes(buf))
            for _name, payload in got:
                assert isinstance(payload, bytes)
        except ValueError:
            pass
