"""Legacy/extended zip compression methods — operators/zipcodecs.py +
the _native_zip_read fallback in sources/explode.py.  Reference parity
bar: Tika's Commons-Compress ZipArchiveInputStream decodes Shrink /
Implode / Deflate64 (enhance_zip.py:31-116 re-enters the ETL per
member); Python's zipfile raises NotImplementedError and previously
lost those children.

Oracle methodology (the .Z/gzip pattern): /usr/bin/unzip (Info-ZIP
6.0, an independent decoder lineage with USE_UNSHRINK + USE_DEFLATE64
+ always-on implode support) extracts fixtures produced by OUR
encoders, so a shared encoder/decoder misconception cannot hide —
this is how the implode Shannon-Fano assignment (bit-complement of
deflate-canonical) and the shrink escape semantics were pinned in the
first place.  Hand-assembled spec-literal streams cover the
format-specific edges the property tests can't force.
"""

import io
import random
import shutil
import struct
import subprocess
import zipfile
import zlib

import pytest

from open_semantic_etl_spark.operators.zipcodecs import (
    NATIVE_ZIP_METHODS,
    _BitW,
    _fixed_lit_code,
    build_deflate64,
    build_implode,
    build_zip_raw as make_zip,
    decode_zip_member,
    explode_implode,
    inflate_raw,
    shrink_compress,
    unshrink,
)

UNZIP = shutil.which("unzip")


def unzip_extract(archive: bytes, name: str) -> bytes:
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "a.zip")
        with open(p, "wb") as f:
            f.write(archive)
        r = subprocess.run([UNZIP, "-p", p, name], capture_output=True)
        assert r.returncode == 0, r.stderr
        return r.stdout


def expected(ops, minmatch=None) -> bytes:
    out = bytearray()
    for op in ops:
        if op[0] == "lit":
            v = op[1]
            out += bytes([v]) if isinstance(v, int) else v
        else:
            _, length, dist = op
            for _ in range(length):
                out.append(out[-dist])
    return bytes(out)


# ---------------------------------------------------------------------------
# inflate engine: deflate subset vs zlib (independent oracle, property)
# ---------------------------------------------------------------------------


def test_inflate_matches_zlib_on_deflate_subset():
    rng = random.Random(42)
    for trial in range(60):
        n = rng.randrange(0, 4000)
        if trial % 3 == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif trial % 3 == 1:
            data = (b"the quick brown fox " * (n // 10 + 1))[:n]
        else:
            data = bytes(rng.choice(b"ab") for _ in range(n))
        for level in (0, 6, 9):  # 0 = stored blocks, 6/9 = dynamic
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            raw = co.compress(data) + co.flush()
            assert inflate_raw(raw, cap=1 << 22) == data


def test_inflate_rejects_corruption_and_caps():
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(b"x" * 1000) + co.flush()
    with pytest.raises(ValueError):
        inflate_raw(raw, cap=10)  # cap charged before growth
    with pytest.raises(ValueError):
        inflate_raw(raw[:-3], cap=1 << 20)  # truncated
    with pytest.raises(ValueError):
        inflate_raw(b"\x07", cap=1 << 20)  # reserved block type


# ---------------------------------------------------------------------------
# deflate64: spec-literal stream (expected output known by construction)
# ---------------------------------------------------------------------------


def _d64_ops():
    head = b"0123456789abcdef" * 2560  # 40 KiB — pushes matches past 32 KiB
    return [("lit", head), ("match", 100, 40000), ("match", 600, 16),
            ("match", 3 + 0xFFFF, 8)]


def test_deflate64_code285_and_big_distances():
    ops = _d64_ops()
    data = expected(ops)
    raw = build_deflate64(ops)
    assert inflate_raw(raw, cap=1 << 22, deflate64=True) == data
    # the same BITS under standard-deflate rules must NOT mean this:
    # code 285 is length 258 there, so either error or different bytes
    try:
        alt = inflate_raw(raw, cap=1 << 22, deflate64=False)
        assert alt != data
    except ValueError:
        pass


def test_deflate64_length_code_is_not_fixed_258():
    # single match length 4 via code 285 + 16-bit extra=1: a standard
    # inflate reads no extra and emits 258 bytes — the desync ADVICE
    # warned about, as a fixed-bytes construction
    bw = _BitW()
    bw.w(1, 1)
    bw.w(1, 2)
    for b in b"ab":
        bw.code(*_fixed_lit_code(b))
    bw.code(*_fixed_lit_code(285))
    bw.w(4 - 3, 16)  # length 4
    bw.code(1, 5)  # distance code 1 → distance 2
    bw.code(*_fixed_lit_code(256))
    assert inflate_raw(bw.bytes(), cap=1 << 16, deflate64=True) == b"ababab"


@pytest.mark.skipif(UNZIP is None, reason="no unzip binary")
def test_deflate64_unzip_oracle():
    ops = _d64_ops()
    data = expected(ops)
    raw = build_deflate64(ops)
    archive = make_zip([("payload.bin", 9, 0, raw, data)])
    assert unzip_extract(archive, "payload.bin") == data


# ---------------------------------------------------------------------------
# shrink
# ---------------------------------------------------------------------------


def _pack_codes(codes: list[tuple[int, int]]) -> bytes:
    """independent LSB-first packer for hand-written (code, width)."""
    val = 0
    pos = 0
    for c, w in codes:
        val |= c << pos
        pos += w
    return val.to_bytes((pos + 7) // 8, "little")


def test_shrink_hand_packed_streams():
    # a,b,<257=ab>,<257> → "ababab"; entry 257 built on the 2nd code
    raw = _pack_codes([(97, 9), (98, 9), (257, 9), (257, 9)])
    assert unshrink(raw, 6) == b"ababab"
    # KwKwK: a,<257 before it exists> → "aaa"
    raw = _pack_codes([(97, 9), (257, 9)])
    assert unshrink(raw, 3) == b"aaa"
    # explicit width bump escape then a 10-bit literal code
    raw = _pack_codes([(97, 9), (256, 9), (1, 9), (98, 10)])
    assert unshrink(raw, 2) == b"ab"
    # bad escape argument
    with pytest.raises(ValueError):
        unshrink(_pack_codes([(97, 9), (256, 9), (7, 9)]), 2)


def test_shrink_roundtrip_and_partial_clear():
    rng = random.Random(7)
    cases = [
        b"abababababababab" * 4,
        b"the quick brown fox jumps over the lazy dog. " * 400,
        bytes(rng.randrange(256) for _ in range(20000)),
        bytes(rng.choice(b"abcdefghij") for _ in range(120000)),  # fills table
    ]
    for data in cases:
        raw = shrink_compress(data)
        assert unshrink(raw, len(data), cap=1 << 22) == data


@pytest.mark.skipif(UNZIP is None, reason="no unzip binary")
def test_shrink_unzip_oracle():
    rng = random.Random(11)
    for data in (
        b"ababab" * 50,
        bytes(rng.choice(b"xyz") for _ in range(60000)),
        bytes(rng.choice(b"abcdefghij") for _ in range(200000)),  # partial clears
    ):
        raw = shrink_compress(data)
        archive = make_zip([("payload.bin", 1, 0, raw, data)])
        assert unzip_extract(archive, "payload.bin") == data


# ---------------------------------------------------------------------------
# implode
# ---------------------------------------------------------------------------


def _implode_ops(flags: int, rng: random.Random):
    minmatch = 3 if flags & 4 else 2
    maxd = 8192 if flags & 2 else 4096
    ops = [("lit", rng.randrange(256)) for _ in range(9000)]
    ops += [
        ("match", minmatch, 1),
        ("match", 63 + minmatch - 1, 17),  # largest without the extra byte
        ("match", 63 + minmatch, 100),  # smallest WITH the extra byte
        ("match", 63 + 255 + minmatch, maxd // 2),  # max extra
        ("match", 30, maxd),  # full window reach
    ]
    return ops, minmatch


@pytest.mark.parametrize("flags", [0, 2, 4, 6])
def test_implode_all_flag_combos(flags):
    rng = random.Random(flags)
    ops, minmatch = _implode_ops(flags, rng)
    data = expected(ops)
    raw = build_implode(ops, flags)
    assert explode_implode(raw, len(data), flags, cap=1 << 22) == data


@pytest.mark.skipif(UNZIP is None, reason="no unzip binary")
@pytest.mark.parametrize("flags", [0, 2, 4, 6])
def test_implode_unzip_oracle(flags):
    rng = random.Random(100 + flags)
    ops, _ = _implode_ops(flags, rng)
    data = expected(ops)
    raw = build_implode(ops, flags)
    archive = make_zip([("payload.bin", 6, flags, raw, data)])
    assert unzip_extract(archive, "payload.bin") == data


def test_implode_canonical_codes_would_be_wrong():
    """the mixed-length trees make the complement assignment observable:
    flipping it must NOT decode to the same bytes (uniform trees cannot
    catch this — the r4 empirical pinning exists because of it)."""
    from open_semantic_etl_spark.operators import zipcodecs as zc

    rng = random.Random(5)
    ops, _ = _implode_ops(0, rng)
    data = expected(ops)
    raw = build_implode(ops, 0)
    orig = zc._canon_table

    def plain(lengths, complement=False):
        return orig(lengths, complement=False)

    zc._canon_table = plain
    try:
        try:
            got = zc.explode_implode(raw, len(data), 0, cap=1 << 22)
        except ValueError:  # e.g. garbage match distance before start
            got = None
        assert got != data
    finally:
        zc._canon_table = orig


def test_implode_rejects_bad_trees():
    with pytest.raises(ValueError):
        explode_implode(b"", 10, 0)
    # incomplete tree: 64 syms all 7 bits (kraft 0.5)
    bad = bytes([3, 0x66, 0xF6, 0xF6, 0xF6])  # wrong count too
    with pytest.raises(ValueError):
        explode_implode(bad + b"\x00" * 8, 10, 0)


# ---------------------------------------------------------------------------
# dispatcher + modern methods
# ---------------------------------------------------------------------------


def test_decode_member_zstd_and_xz():
    import pyarrow as pa
    import lzma

    data = b"zip modern methods " * 500
    z = pa.Codec("zstd").compress(data, asbytes=True)
    assert decode_zip_member(93, 0, z, len(data)) == data
    x = lzma.compress(data, format=lzma.FORMAT_XZ)
    assert decode_zip_member(95, 0, x, len(data)) == data


def test_decode_member_fails_loudly_on_unknown():
    for method in (2, 3, 4, 5, 96, 97, 98):  # Reduce, JPEG, WavPack, PPMd
        with pytest.raises(NotImplementedError):
            decode_zip_member(method, 0, b"\x00\x01", 10)
    assert not NATIVE_ZIP_METHODS & {2, 3, 4, 5, 96, 97, 98}


# ---------------------------------------------------------------------------
# explode.py wiring: legacy members yield children, bad ones skip
# ---------------------------------------------------------------------------


def test_zip_members_decode_legacy_methods():
    from open_semantic_etl_spark.sources.explode import _zip_members

    text = b"shrunk member body " * 30
    ops = [("lit", text)]
    d64 = build_deflate64([("lit", b"deflate64 body"), ("match", 500, 7)])
    d64_plain = expected([("lit", b"deflate64 body"), ("match", 500, 7)])
    iops = [("lit", b) for b in b"imploded!"] + [("match", 40, 9)]
    iraw = build_implode(iops, 6)
    iplain = expected(iops)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    dfl = co.compress(b"plain deflate sibling") + co.flush()
    archive = make_zip([
        ("a/shrunk.txt", 1, 0, shrink_compress(text), text),
        ("b/big.bin", 9, 0, d64, d64_plain),
        ("c/imploded.dat", 6, 6, iraw, iplain),
        ("d/normal.txt", 8, 0, dfl, b"plain deflate sibling"),
    ])
    rows = {r["child_id"]: r["bytes"] for r in _zip_members(archive, "Z", "Z")}
    assert rows["Z/a/shrunk.txt"] == text
    assert rows["Z/b/big.bin"] == d64_plain
    assert rows["Z/c/imploded.dat"] == iplain
    assert rows["Z/d/normal.txt"] == b"plain deflate sibling"


def test_zip_members_skip_undecodable_keep_siblings():
    from open_semantic_etl_spark.sources.explode import _zip_members

    text = b"good sibling"
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    dfl = co.compress(text) + co.flush()
    # CRC-corrupt shrink member: decode "succeeds" but crc mismatches
    body = b"shrunk" * 10
    raw = shrink_compress(body)
    archive = bytearray(make_zip([
        ("bad_reduce.bin", 2, 0, b"\x01\x02\x03", b"xxx"),  # Reduce: no decoder
        ("bad_crc.bin", 1, 0, raw, body),
        ("good.txt", 8, 0, dfl, text),
    ]))
    # corrupt bad_crc's stored CRC in both local header and central dir
    idx = bytes(archive).find(b"bad_crc.bin")
    struct.pack_into("<I", archive, idx - 16, 0xDEADBEEF)
    idx2 = bytes(archive).find(b"bad_crc.bin", idx + 1)
    struct.pack_into("<I", archive, idx2 - 30, 0xDEADBEEF)
    rows = {r["child_id"]: r["bytes"] for r in _zip_members(bytes(archive), "Z", "Z")}
    assert set(rows) == {"Z/good.txt"}
    assert rows["Z/good.txt"] == text


def test_zip_member_bomb_declared_size_honored():
    # declared file_size lies small; the decoder stops at out_size and
    # the CRC check rejects — member skipped, no blow-up
    from open_semantic_etl_spark.sources.explode import _zip_members

    body = b"A" * 100000
    raw = shrink_compress(body)
    nm = b"lying.bin"
    crc = zlib.crc32(body)
    lfh = struct.pack("<IHHHHHIIIHH", 0x04034B50, 20, 0, 1, 0, 0,
                      crc, len(raw), 50, len(nm), 0) + nm + raw
    cd = struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, 1, 0, 0,
                     crc, len(raw), 50, len(nm), 0, 0, 0, 0, 0, 0) + nm
    eocd = struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, len(cd), len(lfh), 0)
    rows = _zip_members(lfh + cd + eocd, "Z", "Z")
    assert rows == []
