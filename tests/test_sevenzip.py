"""Native 7z reader/writer (operators/sevenzip.py) + explode-tier
routing.  Reference parity bar: Tika's SevenZParser explodes .7z the
same way its ZipParser explodes .zip (enhance_zip.py:31-116 child
semantics)."""

import io
import lzma
import zlib

import pytest

from open_semantic_etl_spark.operators.sevenzip import (
    SEVENZIP_MAGIC,
    SevenZipError,
    build_7z,
    sevenzip_members,
)

_MEMBERS = [
    ("docs/a.txt", b"alpha " * 50),
    ("b.bin", bytes(range(256)) * 10),
    ("empty.txt", b""),
]


@pytest.mark.parametrize("solid", [False, True])
@pytest.mark.parametrize("encoded_header", [False, True])
@pytest.mark.parametrize("with_crc", [False, True])
def test_roundtrip_matrix(solid, encoded_header, with_crc):
    arc = build_7z(
        _MEMBERS, solid=solid, encoded_header=encoded_header, with_crc=with_crc
    )
    assert arc[:6] == SEVENZIP_MAGIC
    assert sevenzip_members(arc) == _MEMBERS


def test_handwritten_multiformat_archive():
    """a fixed archive assembled coder-by-coder (NOT via build_7z):
    one bzip2 folder, one deflate folder, one copy folder — pins the
    reader against the spec rather than against the writer."""
    import bz2 as _bz2
    import io
    import zlib as _zlib

    payloads = [b"bzip2 payload " * 9, b"deflate payload " * 9, b"stored payload"]
    co = _zlib.compressobj(9, _zlib.DEFLATED, -15)
    packs = [
        _bz2.compress(payloads[0]),
        co.compress(payloads[1]) + co.flush(),
        payloads[2],
    ]

    def num(v: int) -> bytes:
        if v < 0x80:
            return bytes([v])
        assert v < 0x4000  # two-byte form: 0x80|high then low
        return bytes([0x80 | (v >> 8), v & 0xFF])

    h = io.BytesIO()
    h.write(num(0x01))  # kHeader
    h.write(num(0x04))  # kMainStreamsInfo
    h.write(num(0x06) + num(0) + num(3) + num(0x09))  # kPackInfo pos=0 n=3 kSize
    for p in packs:
        h.write(num(len(p)))
    h.write(num(0x00))
    h.write(num(0x07) + num(0x0B) + num(3) + b"\x00")  # kUnPackInfo kFolder 3 folders
    for cid in (b"\x04\x02\x02", b"\x04\x01\x08", b"\x00"):
        h.write(num(1) + bytes([len(cid)]) + cid)  # 1 coder, no props
    h.write(num(0x0C))  # kCodersUnpackSize
    for p in payloads:
        h.write(num(len(p)))
    h.write(num(0x00) + num(0x00))  # end UnPackInfo, end StreamsInfo
    h.write(num(0x05) + num(3))  # kFilesInfo, 3 files
    names = b"".join((n + "\x00").encode("utf-16-le") for n in ("x.bz2d", "y.defl", "z.raw"))
    h.write(num(0x11) + num(len(names) + 1) + b"\x00" + names)
    h.write(num(0x00) + num(0x00))
    header = h.getvalue()
    body = b"".join(packs)
    tail = (
        len(body).to_bytes(8, "little")
        + len(header).to_bytes(8, "little")
        + zlib.crc32(header).to_bytes(4, "little")
    )
    arc = (
        SEVENZIP_MAGIC
        + b"\x00\x04"
        + zlib.crc32(tail).to_bytes(4, "little")
        + tail
        + body
        + header
    )
    got = sevenzip_members(arc)
    assert got == [("x.bz2d", payloads[0]), ("y.defl", payloads[1]), ("z.raw", payloads[2])]


def test_corrupt_pack_stream_rejected():
    arc = bytearray(build_7z(_MEMBERS))
    arc[40] ^= 0xFF  # inside the first pack stream
    with pytest.raises(SevenZipError):
        sevenzip_members(bytes(arc))


def test_crc_mismatch_rejected():
    """a substream whose bytes decode fine but whose recorded CRC
    disagrees must NOT index (never-wrong-text contract)."""
    arc = bytearray(build_7z([("a.txt", b"payload-one!")], with_crc=True))
    # find the recorded CRC (little-endian) in the header and flip it
    want = zlib.crc32(b"payload-one!").to_bytes(4, "little")
    idx = bytes(arc).rindex(want)
    arc[idx] ^= 0xFF
    # the header CRC in the signature must be fixed up to isolate the test
    nh_off = int.from_bytes(arc[12:20], "little")
    nh_size = int.from_bytes(arc[20:28], "little")
    arc[28:32] = zlib.crc32(bytes(arc[32 + nh_off : 32 + nh_off + nh_size])).to_bytes(
        4, "little"
    )
    tail = bytes(arc[12:32])
    arc[8:12] = zlib.crc32(tail).to_bytes(4, "little")
    with pytest.raises(SevenZipError, match="CRC"):
        sevenzip_members(bytes(arc))


def test_truncated_and_garbage_rejected():
    with pytest.raises(SevenZipError):
        sevenzip_members(build_7z(_MEMBERS)[:50])
    with pytest.raises(SevenZipError):
        sevenzip_members(b"garbage that is not a 7z archive at all")
    with pytest.raises(SevenZipError):
        sevenzip_members(b"")


def test_caps_enforced_before_decompression():
    # declared sizes exceed the cap → rejected without decoding
    with pytest.raises(SevenZipError, match="caps"):
        sevenzip_members(build_7z(_MEMBERS), max_member=10)
    with pytest.raises(SevenZipError, match="caps"):
        sevenzip_members(build_7z(_MEMBERS), max_total=100)


def test_unsupported_coder_raises():
    arc = bytearray(build_7z([("a.txt", b"x" * 64)], with_crc=False))
    # LZMA1 coder id 03 01 01 → masquerade as AES (06 f1 07 01 is 4
    # bytes; swap to a same-length unknown id instead: 03 04 01)
    idx = bytes(arc).rindex(b"\x03\x01\x01")
    arc[idx : idx + 3] = b"\x03\x04\x01"
    nh_off = int.from_bytes(arc[12:20], "little")
    nh_size = int.from_bytes(arc[20:28], "little")
    arc[28:32] = zlib.crc32(bytes(arc[32 + nh_off : 32 + nh_off + nh_size])).to_bytes(
        4, "little"
    )
    arc[8:12] = zlib.crc32(bytes(arc[12:32])).to_bytes(4, "little")
    with pytest.raises(SevenZipError, match="unsupported"):
        sevenzip_members(bytes(arc))


def test_windows_separators_normalized():
    arc = build_7z([("dir\\sub\\x.txt", b"hi")])
    assert sevenzip_members(arc) == [("dir/sub/x.txt", b"hi")]


def test_lzma2_folder_decodes():
    """hand-built LZMA2 folder (the modern default coder)."""
    import io

    payload = b"lzma2 body " * 40
    f2 = [{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 16}]
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=f2)
    pack = c.compress(payload) + c.flush()
    # dict_size 1<<16 → prop byte p with (2|(p&1))<<(p//2+11) = 1<<16 → p=10
    props = bytes([10])

    def num(v):
        return bytes([v])

    h = io.BytesIO()
    h.write(num(0x01) + num(0x04))
    h.write(num(0x06) + num(0) + num(1) + num(0x09) + num(len(pack)) + num(0x00))
    h.write(num(0x07) + num(0x0B) + num(1) + b"\x00")
    h.write(num(1) + bytes([0x21]) + b"\x21" + num(1) + props)  # flag: idlen 1 | props
    h.write(num(0x0C) + bytes([0x80 | (len(payload) >> 8), len(payload) & 0xFF]))
    h.write(num(0x00) + num(0x00))
    h.write(num(0x05) + num(1))
    nm = "two.bin\x00".encode("utf-16-le")
    h.write(num(0x11) + num(len(nm) + 1) + b"\x00" + nm)
    h.write(num(0x00) + num(0x00))
    header = h.getvalue()
    tail = (
        len(pack).to_bytes(8, "little")
        + len(header).to_bytes(8, "little")
        + zlib.crc32(header).to_bytes(4, "little")
    )
    arc = (
        SEVENZIP_MAGIC
        + b"\x00\x04"
        + zlib.crc32(tail).to_bytes(4, "little")
        + tail
        + pack
        + header
    )
    assert sevenzip_members(arc) == [("two.bin", payload)]


def test_sevenzip_mimetype_sniff():
    from open_semantic_etl_spark.operators.htmlx import sniff_content_type

    assert (
        sniff_content_type(build_7z([("a", b"x")]))
        == "application/x-7z-compressed"
    )


def test_explode_zip_routes_sevenzip(spark):
    """a .7z at the top level explodes like a zip, recursion into a
    nested zip member keeps the OUTERMOST container id."""
    from open_semantic_etl_spark.sources import explode as E

    inner_zip_members = {"z.txt": b"from zip"}
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w", _zf.ZIP_STORED) as z:
        for k, v in inner_zip_members.items():
            z.writestr(_zf.ZipInfo(k, (2024, 1, 1, 0, 0, 0)), v)
    arc = build_7z(
        [("docs/a.txt", b"seven alpha"), ("inner.zip", buf.getvalue())], solid=True
    )
    df = spark.createDataFrame([("http://x/a.7z", arc)], "url string, html binary")
    rows = sorted(E.explode_zip(df).collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [
        "http://x/a.7z/docs/a.txt",
        "http://x/a.7z/inner.zip/z.txt",
    ]
    assert [r["container_s"] for r in rows] == ["http://x/a.7z"] * 2
    assert bytes(rows[0]["html"]) == b"seven alpha"
    assert bytes(rows[1]["html"]) == b"from zip"


def test_nested_sevenzip_inside_zip(spark):
    from open_semantic_etl_spark.sources import explode as E

    sz = build_7z([("deep.txt", b"deep payload")])
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w", _zf.ZIP_STORED) as z:
        z.writestr(_zf.ZipInfo("pack.7z", (2024, 1, 1, 0, 0, 0)), sz)
        z.writestr(_zf.ZipInfo("plain.txt", (2024, 1, 1, 0, 0, 0)), b"top")
    df = spark.createDataFrame(
        [("http://x/o.zip", buf.getvalue())], "url string, html binary"
    )
    rows = sorted(E.explode_zip(df).collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [
        "http://x/o.zip/pack.7z/deep.txt",
        "http://x/o.zip/plain.txt",
    ]
    assert bytes(rows[0]["html"]) == b"deep payload"


def test_corrupt_nested_sevenzip_degrades_to_member_row(spark):
    """a sniffed-but-corrupt nested .7z keeps its bytes as an opaque
    member row — never lose bytes (same rule as nested tar)."""
    from open_semantic_etl_spark.sources import explode as E

    bad = build_7z([("x.txt", b"x" * 64)])[:-5] + b"AAAAA"
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w", _zf.ZIP_STORED) as z:
        z.writestr(_zf.ZipInfo("bad.7z", (2024, 1, 1, 0, 0, 0)), bad)
    df = spark.createDataFrame(
        [("http://x/o.zip", buf.getvalue())], "url string, html binary"
    )
    rows = E.explode_zip(df).collect()
    assert [r["url"] for r in rows] == ["http://x/o.zip/bad.7z"]
    assert bytes(rows[0]["html"]) == bad


# ---------------------------------------------------------------------------
# BCJ branch-filter coder chains (x86/PPC/IA64/ARM/ARMT/SPARC)
# ---------------------------------------------------------------------------

def _branchy_payload(cid: bytes = b"\x03\x03\x01\x03") -> bytes:
    """synthetic machine-code-ish bytes dense in the given filter's
    branch encodings, at that architecture's alignment, so the filter
    actually transforms something (asserted non-vacuous below)."""
    import struct as _struct

    from open_semantic_etl_spark.operators.sevenzip import bcj_encode

    if cid == b"\x03\x03\x01\x03":  # x86: E8/E9 + rel32 with 00/FF MSB
        out = bytearray()
        for i in range(800):
            out += bytes([0xE8, i & 0xFF, (i >> 8) & 0xFF, 0x00, 0x00])
            out += bytes([0xE9, 0x10, 0x20, 0xFF, 0xFF])
            out += b"\x90" * 6
        return bytes(out)
    if cid == b"\x03\x03\x02\x05":  # PPC bl (aligned BE words)
        return b"".join(
            _struct.pack(">I", 0x48000001 | ((i << 2) & 0x03FFFFFC))
            for i in range(2000)
        )
    if cid == b"\x03\x03\x08\x05":  # SPARC call (aligned BE words)
        return b"".join(
            _struct.pack(">I", 0x40000000 | (i & 0x3FFFFF)) for i in range(2000)
        )
    if cid == b"\x03\x03\x05\x01":  # ARM BL (aligned LE words, byte3=EB)
        return b"".join(
            bytes([i & 0xFF, (i >> 8) & 0xFF, 0x12, 0xEB]) for i in range(2000)
        )
    if cid == b"\x03\x03\x07\x01":  # Thumb BL halfword pair F0xx/F8xx
        return b"".join(
            bytes([i & 0xFF, 0xF0 | ((i >> 8) & 7), i & 0xFF, 0xF8])
            for i in range(2000)
        )
    if cid == b"\x03\x03\x04\x01":  # IA64: find a bundle the filter moves
        for t in range(32):
            for slot_shift in (5, 46, 87):
                v = t | ((5 << 37) << slot_shift)  # br.call opcode = 5
                b = v.to_bytes(16, "little") * 200
                if bcj_encode(cid, b) != b:
                    return b
        raise AssertionError("no IA64 branch pattern transforms")
    raise AssertionError(f"unknown cid {cid.hex()}")


@pytest.mark.parametrize("cid", sorted(
    __import__("open_semantic_etl_spark.operators.sevenzip",
               fromlist=["_BCJ_CODERS"])._BCJ_CODERS
))
def test_bcj_chain_roundtrip(cid):
    from open_semantic_etl_spark.operators.sevenzip import bcj_encode

    payload = _branchy_payload(cid)
    # the filter must do real work on this payload, else the test is vacuous
    assert bcj_encode(cid, payload) != payload
    members = [("bin/app.exe", payload), ("readme.txt", b"hello bcj")]
    for solid in (False, True):
        arc = build_7z(members, solid=solid, encoded_header=True, bcj=cid)
        assert sevenzip_members(arc) == members


def test_bcj_solid_filter_runs_over_joined_stream():
    """two members in one solid folder: the branch filter is position-
    dependent, so filtering members separately would corrupt the second
    one — the builder must filter the JOINED stream (and the reader's
    split must agree)."""
    from open_semantic_etl_spark.operators.sevenzip import (
        _BCJ_CODERS,
        bcj_encode,
    )

    x86 = b"\x03\x03\x01\x03"
    a = _branchy_payload()[:3000]
    b = _branchy_payload()[:3000]
    joined = bcj_encode(x86, a + b)
    per_member = bcj_encode(x86, a) + bcj_encode(x86, b)
    assert joined != per_member  # position-dependence is real on this data
    arc = build_7z([("a", a), ("b", b)], solid=True, bcj=x86)
    assert sevenzip_members(arc) == [("a", a), ("b", b)]


def test_bcj_crc_catches_corruption():
    x86 = b"\x03\x03\x01\x03"
    arc = bytearray(build_7z([("app", _branchy_payload())], bcj=x86))
    # flip one packed-stream byte (offset 40: inside the LZMA body)
    arc[40] ^= 0xFF
    with pytest.raises(SevenZipError):
        sevenzip_members(bytes(arc))


def test_unknown_branch_filters_fail_loudly():
    """ARM64 (0x0a) / RISC-V (0x0b) / BCJ2 have no liblzma twin here —
    a folder using them must raise, not decode garbage."""
    from open_semantic_etl_spark.operators import sevenzip as SZ

    payload = b"plain bytes" * 10
    chain = [(SZ._CODER_LZMA1, SZ._W_LZMA1_PROPS), (b"\x0a", b"")]
    packs = [SZ._w_lzma1(payload)]
    h = io.BytesIO()
    h.write(SZ._wnum(SZ._K_HEADER))
    h.write(SZ._wnum(SZ._K_MAIN_STREAMS))
    h.write(SZ._w_streams_info(0, [len(packs[0])], [len(payload)],
                               None, None, None, chain=chain))
    h.write(SZ._wnum(0x05) + SZ._wnum(1))  # kFilesInfo, 1 file
    name = "x\x00".encode("utf-16-le")
    h.write(SZ._wnum(0x11) + SZ._wnum(len(name) + 1) + b"\x00" + name)
    h.write(SZ._wnum(SZ._K_END) + SZ._wnum(SZ._K_END))
    header = h.getvalue()
    body = packs[0]
    tail = (len(body).to_bytes(8, "little") + len(header).to_bytes(8, "little")
            + zlib.crc32(header).to_bytes(4, "little"))
    arc = (SEVENZIP_MAGIC + b"\x00\x04" + zlib.crc32(tail).to_bytes(4, "little")
           + tail + body + header)
    with pytest.raises(SevenZipError):
        sevenzip_members(arc)


def test_chain_intermediate_size_capped_before_decompress():
    """r4 review: a crafted [LZMA1 out=huge -> BCJ out=tiny] chain must
    be rejected from DECLARED sizes, before the intermediate stream is
    materialized — and an inconsistent chain must never 'decode' to
    fabricated bytes."""
    from open_semantic_etl_spark.operators import sevenzip as SZ

    x86 = b"\x03\x03\x01\x03"
    big = b"\x00" * (5 << 20)  # 5 MB of zeros packs to ~7 KB
    pack = SZ._w_lzma1(big)
    chain = [(SZ._CODER_LZMA1, SZ._W_LZMA1_PROPS), (x86, b"")]

    def arc_with_sizes(lzma_out: int, bcj_out: int) -> bytes:
        h = io.BytesIO()
        h.write(SZ._wnum(SZ._K_HEADER))
        h.write(SZ._wnum(SZ._K_MAIN_STREAMS))
        # hand-write per-coder unpack sizes (the builder keeps them equal)
        si = SZ._w_streams_info(0, [len(pack)], [lzma_out], None, None,
                                None, chain=chain)
        # _w_streams_info writes [s]*len(chain); patch the two varints
        a, b = SZ._wnum(lzma_out), SZ._wnum(bcj_out)
        si = si.replace(a + a, a + b, 1)
        h.write(si)
        name = "x\x00".encode("utf-16-le")
        h.write(SZ._wnum(0x05) + SZ._wnum(1))
        h.write(SZ._wnum(0x11) + SZ._wnum(len(name) + 1) + b"\x00" + name)
        h.write(SZ._wnum(SZ._K_END) + SZ._wnum(SZ._K_END))
        header = h.getvalue()
        tail = (len(pack).to_bytes(8, "little")
                + len(header).to_bytes(8, "little")
                + zlib.crc32(header).to_bytes(4, "little"))
        return (SEVENZIP_MAGIC + b"\x00\x04"
                + zlib.crc32(tail).to_bytes(4, "little") + tail + pack + header)

    # declared intermediate blows the cap → rejected before decompress
    with pytest.raises(SevenZipError, match="caps"):
        sevenzip_members(arc_with_sizes(len(big), 10),
                         max_member=1 << 10, max_total=1 << 10)
    # inconsistent chain within caps → size mismatch, never silent bytes
    with pytest.raises(SevenZipError, match="size mismatch|wrong size"):
        sevenzip_members(arc_with_sizes(len(big), 10))
