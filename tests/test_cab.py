"""Microsoft Cabinet tier (operators/cab.py + explode dispatch).

Reference bar: the zip-tier child contract (enhance_zip.py:31-116)
applied to ``.cab`` files (Tika's cab tier).  none/MSZIP decode —
MSZIP's cross-block LZ77 history is exercised by a member larger than
one 32768-byte CFDATA block; QUANTUM/LZX and multi-cabinet sets fail
loudly.  The fixture writer is ours (no lcab/gcab in the container),
so the reader is additionally pinned on a HAND-ASSEMBLED spec-literal
cabinet built field-by-field from [MS-CAB].
"""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from open_semantic_etl_spark.operators.cab import (
    _csum,
    build_cab,
    cab_members,
    sniff_cab,
)


def test_mszip_roundtrip_multi_block_history():
    # 100 KB with long-range repeats: block 2+ matches reach back into
    # block 1's window — decodes only if the zdict chaining is right
    big = (b"The quick brown fox jumps over the lazy dog. " * 2400)[:100_000]
    files = {"readme.txt": b"hello cab", "big/data.txt": big}
    arc = build_cab(files)
    assert sniff_cab(arc)
    got = dict(cab_members(arc))
    assert got == {"readme.txt": b"hello cab", "big/data.txt": big}


def test_stored_roundtrip():
    files = {"a.bin": bytes(range(256)), "b.txt": b"beta"}
    got = dict(cab_members(build_cab(files, mszip=False)))
    assert got == {"a.bin": bytes(range(256)), "b.txt": b"beta"}


def test_hand_assembled_spec_literal():
    """field-by-field stored cabinet: CFHEADER + CFFOLDER + 2 CFFILE +
    1 CFDATA — layout from [MS-CAB], not the writer.  The data length
    (9) is NOT a multiple of 4, pinning the FDI.C remainder fold."""
    folder_data = b"alphabeta"  # a.txt = bytes 0-4, b.txt = bytes 5-8
    fields = struct.pack("<HH", len(folder_data), len(folder_data))
    csum = _csum(folder_data, _csum(fields, 0))
    cfdata = struct.pack("<I", csum) + fields + folder_data
    cffile = (
        struct.pack("<IIHHHH", 5, 0, 0, 0x5A21, 0x3000, 0x20) + b"a.txt\x00"
        + struct.pack("<IIHHHH", 4, 5, 0, 0x5A21, 0x3000, 0x20) + b"b.txt\x00"
    )
    coff_files = 36 + 8
    cffolder = struct.pack("<IHH", coff_files + len(cffile), 1, 0)
    cb = coff_files + len(cffile) + len(cfdata)
    header = (
        b"MSCF\x00\x00\x00\x00" + struct.pack("<I", cb) + b"\x00\x00\x00\x00"
        + struct.pack("<I", coff_files) + b"\x00\x00\x00\x00"
        + struct.pack("<BBHHHHH", 3, 1, 1, 2, 0, 0x0707, 0)
    )
    arc = header + cffolder + cffile + cfdata
    assert cab_members(arc) == [("a.txt", b"alpha"), ("b.txt", b"beta")]


def test_checksum_flip_fails():
    arc = bytearray(build_cab({"x.txt": b"checksummed payload"}, mszip=False))
    arc[arc.find(b"checksummed payload")] ^= 0x01
    with pytest.raises(ValueError, match="checksum"):
        cab_members(bytes(arc))


def test_lzx_and_quantum_fail_loudly():
    arc = bytearray(build_cab({"x.txt": b"body"}))
    # CFFOLDER sits right after the 36-byte header; typeCompress at +6
    for typ, name in ((3, "LZX"), (2, "QUANTUM")):
        struct.pack_into("<H", arc, 36 + 6, typ)
        with pytest.raises(ValueError, match=name):
            cab_members(bytes(arc))


def test_multi_cabinet_set_fails_loudly():
    arc = bytearray(build_cab({"x.txt": b"body"}))
    struct.pack_into("<H", arc, 30, 0x0001)  # flags: PREV_CABINET
    with pytest.raises(ValueError, match="multi-cabinet"):
        cab_members(bytes(arc))


def test_folder_fanout_bomb_is_budgeted():
    """a cabinet whose MANY folders all point at the same CFDATA run
    (each under the per-folder cap) must trip the CUMULATIVE decode
    budget instead of materializing folders × cap bytes."""
    body = b"z" * 30_000
    fields = struct.pack("<HH", len(body), len(body))
    cfdata = struct.pack("<I", _csum(body, _csum(fields, 0))) + fields + body
    n = 64
    cffile = b""
    for i in range(n):
        cffile += struct.pack(
            "<IIHHHH", len(body), 0, i, 0, 0, 0x20
        ) + b"f%02d\x00" % i
    coff_files = 36 + 8 * n
    data_off = coff_files + len(cffile)
    cffolders = b"".join(
        struct.pack("<IHH", data_off, 1, 0) for _ in range(n)
    )
    cb = data_off + len(cfdata)
    header = (
        b"MSCF\x00\x00\x00\x00" + struct.pack("<I", cb) + b"\x00\x00\x00\x00"
        + struct.pack("<I", coff_files) + b"\x00\x00\x00\x00"
        + struct.pack("<BBHHHHH", 3, 1, n, n, 0, 0, 0)
    )
    arc = header + cffolders + cffile + cfdata
    with pytest.raises(ValueError, match="budget"):
        cab_members(arc, max_member=40_000, max_total=100_000)


def test_utf8_names():
    files = {"Grüße/naïve.txt": b"utf8 name"}
    assert dict(cab_members(build_cab(files))) == files


def test_explode_dispatch_both_nesting_directions(spark):
    import io
    import zipfile

    from pyspark.sql import Row

    from open_semantic_etl_spark.sources.explode import explode_zip

    inner_zip = io.BytesIO()
    with zipfile.ZipFile(inner_zip, "w") as z:
        z.writestr("deep.txt", "zip in cab")
    cab_with_zip = build_cab({"inner.zip": inner_zip.getvalue(), "top.txt": b"t"})
    outer_zip = io.BytesIO()
    with zipfile.ZipFile(outer_zip, "w") as z:
        z.writestr("setup.cab", build_cab({"nested.txt": b"cab in zip"}))
    df = spark.createDataFrame(
        [Row(url="c://1", html=bytearray(cab_with_zip)),
         Row(url="z://2", html=bytearray(outer_zip.getvalue()))]
    )
    got = {r["url"]: bytes(r["html"]) for r in explode_zip(df).collect()}
    assert got["c://1/inner.zip/deep.txt"] == b"zip in cab"
    assert got["c://1/top.txt"] == b"t"
    assert got["z://2/setup.cab/nested.txt"] == b"cab in zip"


def test_extract_html_labels_cab():
    from open_semantic_etl_spark.operators.htmlx import extract_html

    r = extract_html(build_cab({"a": b"x"}))
    assert r["content_type"] == "application/vnd.ms-cab-compressed"
    assert r["content"] == ""
    # prose starting with the magic stays text
    r = extract_html(b"MSCF stands for the Microsoft Cabinet format used by installers everywhere.")
    assert r["content_type"] == "text/plain"


def test_roundtrip_property_mszip_and_stored():
    """property: any unique-name member dict survives build→parse in
    both folder codecs (hypothesis over paths and binary payloads)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                               whitelist_characters="_-. "),
        min_size=1, max_size=12,
    ).filter(lambda s: s.strip() and s not in (".", ".."))
    path = st.lists(name, min_size=1, max_size=3).map("/".join)
    members = st.dictionaries(path, st.binary(max_size=300),
                              min_size=1, max_size=6)

    @given(members, st.booleans())
    @settings(max_examples=40, deadline=None)
    def check(files, mszip):
        got = dict(cab_members(build_cab(files, mszip=mszip)))
        assert got == files

    check()


def test_fuzz_total_function():
    rng = random.Random(0xCAB)
    bases = [
        build_cab({"a.txt": b"alpha", "b/c.txt": b"beta" * 50}),
        build_cab({"a.txt": b"alpha" * 100}, mszip=False),
    ]
    for i in range(600):
        base = bases[i % 2]
        buf = bytearray(base[: rng.randrange(1, len(base) + 1)] if i % 2 else base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            for _name, payload in cab_members(bytes(buf)):
                assert isinstance(payload, bytes)
        except ValueError:
            pass
