"""zstd / lz4-frame / legacy .lzma transparent-codec tier.

Reference bar: Tika's CompressorParser handles zstd, lz4-framed and
lzma streams the same way it handles gzip — the inner document IS the
document (enhance_extract_text_tika_server.py:33-262 just sees the
decompressed payload). The engine routes them through the same
``_decompress_member`` path as gzip/bz2/xz/.Z, via pyarrow's streaming
codecs (zstd/lz4) and stdlib ``lzma`` FORMAT_ALONE (.lzma).
"""

from __future__ import annotations

import io
import lzma
import tarfile

import pyarrow as pa
import pytest

from open_semantic_etl_spark.operators.htmlx import (
    arrow_stream_decompress,
    extract_html,
    sniff_content_type,
)

HTML = (
    b"<html><head><title>ZS</title></head><body>"
    b"<p>Inner compressed page body with text.</p></body></html>"
)


def _frame(data: bytes, codec: str) -> bytes:
    buf = pa.BufferOutputStream()
    with pa.CompressedOutputStream(buf, codec) as s:
        s.write(data)
    return buf.getvalue().to_pybytes()


def _tar_of(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 1704067200
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def test_sniffs():
    assert sniff_content_type(_frame(HTML, "zstd")) == "application/zstd"
    assert sniff_content_type(_frame(HTML, "lz4")) == "application/x-lz4"
    alone = lzma.compress(HTML, format=lzma.FORMAT_ALONE)
    assert sniff_content_type(alone) == "application/x-lzma"
    # the lzma gate is structural (no magic): a text ']' prefix never
    # matches (needs two NUL dict-size bytes + a sane size-field top)
    assert sniff_content_type(b"] prose that starts with a bracket") is None
    bad_tail = bytearray(alone)
    bad_tail[12] = 0x7F  # size top byte neither 0x00 nor 0xff
    assert sniff_content_type(bytes(bad_tail)) != "application/x-lzma"


@pytest.mark.parametrize(
    "blob,label",
    [
        (_frame(HTML, "zstd"), "application/zstd"),
        (_frame(HTML, "lz4"), "application/x-lz4"),
        (lzma.compress(HTML, format=lzma.FORMAT_ALONE), "application/x-lzma"),
    ],
)
def test_transparent_extract(blob: bytes, label: str):
    r = extract_html(blob)
    assert r["content_type"] == "text/html" and r["title"] == "ZS"
    assert r["content"].startswith("Inner compressed page")
    # truncated stream: container label, never half a document
    t = extract_html(blob[: len(blob) // 2])
    assert t["content_type"] == label and t["content"] == ""


def test_concatenated_zstd_frames_join():
    """zstd(1) concatenation: `zstd -dc a.zst b.zst`-style joined
    output (the gzip member rule); pyarrow's stream reads across
    frame boundaries."""
    h1 = b"<html><head><title>CC</title></head><body><p>Part one. "
    h2 = b"And part two of the same page.</p></body></html>"
    r = extract_html(_frame(h1, "zstd") + _frame(h2, "zstd"))
    assert r["title"] == "CC" and "Part one. And part two" in r["content"]


def test_garbage_tail_keeps_container_label():
    """unlike gzip (whose per-member loop can stop at a clean member
    boundary), the streaming codecs fail the whole payload on a
    non-frame tail — fail-safe: the container label survives."""
    blob = _frame(HTML, "zstd") + b"NOT A FRAME"
    assert extract_html(blob)["content_type"] == "application/zstd"


def test_bomb_cap():
    bomb = _frame(b"\x00" * (1 << 27), "zstd")  # 128 MB of zeros, tiny frame
    assert len(bomb) < 1 << 20
    with pytest.raises(ValueError):
        arrow_stream_decompress(bomb, "zstd", 1 << 26)
    assert extract_html(bomb)["content_type"] == "application/zstd"


def test_depth_guard():
    deep = _frame(_frame(_frame(HTML, "zstd"), "zstd"), "zstd")
    assert extract_html(deep)["content_type"] == "application/zstd"


@pytest.mark.parametrize(
    "name,wrap",
    [
        ("d.tar.zst", lambda b: _frame(b, "zstd")),
        ("d.tar.lz4", lambda b: _frame(b, "lz4")),
        ("d.tar.lzma", lambda b: lzma.compress(b, format=lzma.FORMAT_ALONE)),
        ("d.tzst", lambda b: _frame(b, "zstd")),
    ],
)
def test_tar_wrapped_explodes(name: str, wrap):
    from open_semantic_etl_spark.sources import explode as E

    arc = wrap(_tar_of([("a.txt", b"alpha"), ("docs/b.txt", b"beta")]))
    got = E._tar_members(arc, name, name)
    assert [(m["child_id"], bytes(m["bytes"])) for m in got] == [
        (f"{name}/a.txt", b"alpha"),
        (f"{name}/docs/b.txt", b"beta"),
    ]
    assert E._sniff_tar(arc, name)
    # a bare .zst of a non-tar must not claim the tar label
    assert not E._sniff_tar(_frame(b"plain", "zstd"), "payload.txt.zst")


def _sz(data: bytes, chunk: int = 65536) -> bytes:
    from open_semantic_etl_spark.operators.snappyf import snappy_frame

    return snappy_frame(data, chunk)


def test_snappy_crc32c_check_value():
    """the CRC-32C check value is the published constant — pins our
    table-driven Castagnoli against an independent literal, so the
    round-trip tests below aren't a shared-bug tautology."""
    from open_semantic_etl_spark.operators import snappyf as S

    assert S._crc32c(b"123456789") == 0xE3069283
    assert S._masked(S._crc32c(b"123456789")) == (
        (((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    )


def test_snappy_spec_literal_uncompressed_stream():
    """hand-assembled stream (spec framing_format.txt): stream id +
    one UNCOMPRESSED chunk (type 0x01) + a skippable reserved chunk —
    no encoder involved on either side."""
    from open_semantic_etl_spark.operators import snappyf as S

    payload = b"123456789"
    masked = (((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    body = masked.to_bytes(4, "little") + payload
    stream = (
        b"\xff\x06\x00\x00sNaPpY"
        + bytes([0x01])
        + len(body).to_bytes(3, "little")
        + body
        + bytes([0x80])  # skippable reserved chunk — must be ignored
        + (4).to_bytes(3, "little")
        + b"PAD!"
    )
    assert S.unsnappy_frames(stream, cap=1 << 20) == payload
    # flip one payload bit → CRC mismatch must fail the whole stream
    bad = bytearray(stream)
    bad[14] ^= 0x01
    with pytest.raises(ValueError):
        S.unsnappy_frames(bytes(bad), cap=1 << 20)
    # unskippable reserved chunk type → fail (never half a document)
    unsk = stream + bytes([0x02]) + (1).to_bytes(3, "little") + b"x"
    with pytest.raises(ValueError):
        S.unsnappy_frames(unsk, cap=1 << 20)


def test_snappy_transparent_extract():
    blob = _sz(HTML)
    assert sniff_content_type(blob) == "application/x-snappy-framed"
    r = extract_html(blob)
    assert r["content_type"] == "text/html" and r["title"] == "ZS"
    # truncated → container label
    t = extract_html(blob[: len(blob) - 3])
    assert t["content_type"] == "application/x-snappy-framed"
    assert t["content"] == ""
    # concatenated streams join (the stream id may reappear mid-file)
    h1 = b"<html><head><title>SC</title></head><body><p>One "
    h2 = b"and two.</p></body></html>"
    j = extract_html(_sz(h1) + _sz(h2))
    assert j["title"] == "SC" and "One and two." in j["content"]


def test_snappy_bomb_cap():
    from open_semantic_etl_spark.operators.snappyf import unsnappy_frames

    bomb = _sz(b"\x00" * (1 << 22))
    with pytest.raises(ValueError):
        unsnappy_frames(bomb, cap=1 << 16)


def test_tar_sz_explodes():
    from open_semantic_etl_spark.sources import explode as E

    arc = _sz(_tar_of([("a.txt", b"alpha"), ("docs/b.txt", b"beta")]))
    got = E._tar_members(arc, "d.tar.sz", "d.tar.sz")
    assert [(m["child_id"], bytes(m["bytes"])) for m in got] == [
        ("d.tar.sz/a.txt", b"alpha"),
        ("d.tar.sz/docs/b.txt", b"beta"),
    ]
    assert E._sniff_tar(arc, "d.tar.sz")
    assert not E._sniff_tar(_sz(b"plain"), "note.txt.sz")


def test_nested_tar_zst_inside_zip():
    import zipfile

    from open_semantic_etl_spark.sources import explode as E

    inner = _frame(_tar_of([("x.txt", b"deep")]), "zstd")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("inner.tar.zst", inner)
    got = E._zip_members(buf.getvalue(), "top.zip", "top.zip")
    assert [(m["child_id"], bytes(m["bytes"])) for m in got] == [
        ("top.zip/inner.tar.zst/x.txt", b"deep")
    ]
