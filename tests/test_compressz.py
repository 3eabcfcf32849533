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


def test_group_alignment_is_window_relative():
    """compress(1) flushes output in 8-code groups RELATIVE to the
    previous width change (ncompress rebases its buffer), so the
    natural bumps land pad-free — the first segment is exactly 256
    nine-bit codes = 36 groups — while a CLEAR at an arbitrary code
    index DOES pad.  A decoder using absolute positions desyncs on
    both (the r4 review bug, caught by gzip -dc)."""
    data = bytes(range(256)) * 3  # forces the 9→10 bump
    z = lzw_z_compress(data, maxbits=12)
    assert unlzw(z) == data
    # natural-bump streams carry no pad: total bits are the exact sum
    # of code widths (256 codes ride 9 bits before the first bump)
    # → a CLEAR mid-stream must grow the file beyond that exact sum
    zc = _compress_with_clears(data, clear_every=100)
    assert unlzw(zc) == data
    assert len(zc) > len(z)  # clears reset the table AND pad groups


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


GZIP = __import__("shutil").which("gzip")


@pytest.mark.skipif(not GZIP, reason="no gzip binary")
def test_codec_against_gzip_oracle():
    """gzip(1) carries the ncompress decoder: every encoder output
    must survive `gzip -dc` byte-identically — the independent oracle
    that caught the r4 absolute-vs-window-relative alignment bug."""
    import subprocess

    rnd = random.Random(99)
    for trial in range(4):
        n = rnd.randrange(500, 20000)
        data = (
            bytes(rnd.randrange(256) for _ in range(n))
            if trial % 2
            else bytes(rnd.choice(b"water under the bridge\n") for _ in range(n))
        )
        for maxbits in (9, 12, 16):
            z = lzw_z_compress(data, maxbits=maxbits)
            p = subprocess.run([GZIP, "-dc"], input=z, capture_output=True)
            assert p.returncode in (0, 2) and p.stdout == data, (trial, maxbits)
            assert unlzw(z) == data
        z = _compress_with_clears(data, clear_every=77)
        p = subprocess.run([GZIP, "-dc"], input=z, capture_output=True)
        assert p.returncode in (0, 2) and p.stdout == data


def test_maxbits9_grows_to_ten_bit_codes():
    """the reference init skips the n_bits==maxbits maxcode case, so a
    maxbits-9 stream grows to 10-bit codes when its capped table
    fills — a decoder that never bumps desyncs after 255 adds."""
    data = bytes(range(256)) * 8
    z = lzw_z_compress(data, maxbits=9)
    assert unlzw(z) == data


def test_gzip_tail_padding_tolerated():
    """NUL sector padding after a complete gzip member (tape blocking):
    gzip(1) keeps the decoded output with a warning — so must the
    transparent path (r4 review regression)."""
    html = (
        b"<html><head><title>T</title></head><body>"
        b"<p>Padded body text.</p></body></html>"
    )
    r = extract_html(gzip.compress(html) + b"\x00" * 512)
    assert r["content_type"] == "text/html" and r["title"] == "T"
    # truncated member still rejected (never half a document)
    t = extract_html(gzip.compress(html)[:20])
    assert t["content_type"] == "application/gzip" and t["content"] == ""
