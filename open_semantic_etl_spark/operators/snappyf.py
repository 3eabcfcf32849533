"""Snappy framing format (.sz) — decoder + fixture encoder.

Reference bar: Tika's CompressorParser tier accepts snappy-framed
streams the same way it accepts gzip (the inner document IS the
document; enhance_extract_text_tika_server.py:33-262 only ever sees
the decompressed payload).  The container has no snappy CLI and
pyarrow exposes only the RAW codec (no streaming class), so the
framing layer — google/snappy ``framing_format.txt``, a public spec —
is implemented here and each chunk's raw-snappy body is decompressed
through ``pyarrow.decompress`` (the raw format's varint preamble
carries the exact uncompressed size, which pyarrow requires).

Frame layout (all little-endian):

  chunk   := type:u8  length:u24  body[length]
  0xff    stream identifier — body must be ``sNaPpY`` (6 bytes); the
          first chunk of every stream, and it may legally reappear
          mid-stream (concatenated files — the gzip(1) member rule)
  0x00    compressed data   — body = maskedCRC32C:u32 + raw snappy
  0x01    uncompressed data — body = maskedCRC32C:u32 + raw bytes
  0x02-7f unskippable reserved → the whole payload fails (fail-safe:
          never half a document)
  0x80-fe skippable reserved → ignored
  masked(c) = ((c >> 15) | (c << 17)) + 0xa282ead8   (mod 2^32),
  where c = CRC-32C (Castagnoli) of the UNCOMPRESSED chunk data.

Every CRC is verified — a stored-chunk bitflip must degrade to the
container label, not index corrupt text.  Per-chunk uncompressed size
is capped at 65536 + 64 KiB slack per the spec; the caller's total
cap is enforced incrementally so a bomb stops at cap + one chunk.
"""

from __future__ import annotations

__all__ = ["unsnappy_frames", "snappy_frame"]

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536 + 65536  # spec: uncompressed chunk data cap + slack


def _crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _crc32c_table()


def _crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked(c: int) -> int:
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _snappy_raw_size(body: bytes) -> int:
    """raw snappy preamble: varint uncompressed length (≤32 bits)."""
    size, shift = 0, 0
    for b in body[:5]:
        size |= (b & 0x7F) << shift
        if not b & 0x80:
            return size
        shift += 7
    raise ValueError("bad snappy varint")


def unsnappy_frames(data: bytes, cap: int) -> bytes:
    """framed stream → joined uncompressed bytes.

    Raises ValueError on any malformation (bad magic, short chunk,
    CRC mismatch, unskippable reserved chunk, truncated tail, over
    ``cap``) — the caller maps that to its degrade rule (keep the
    container label).  Unlike gzip there is no complete-member rescue:
    the frame stream is one logical file.
    """
    import pyarrow as pa

    if not data.startswith(_STREAM_ID):
        raise ValueError("not a snappy framed stream")
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("truncated chunk header")
        ctype = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "little")
        body = data[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        pos += 4 + length
        if ctype == 0xFF:
            if body != b"sNaPpY":
                raise ValueError("bad stream identifier")
            continue
        if 0x80 <= ctype <= 0xFE:
            continue  # skippable reserved
        if ctype == 0x00:
            if length < 4:
                raise ValueError("short compressed chunk")
            size = _snappy_raw_size(body[4:])
            if size > _MAX_CHUNK:
                raise ValueError("chunk over spec size cap")
            chunk = pa.decompress(
                body[4:], decompressed_size=size, codec="snappy", asbytes=True
            )
        elif ctype == 0x01:
            chunk = bytes(body[4:])
        else:  # 0x02-0x7f unskippable reserved
            raise ValueError("unskippable reserved chunk 0x%02x" % ctype)
        if _masked(_crc32c(chunk)) != int.from_bytes(body[:4], "little"):
            raise ValueError("chunk CRC mismatch")
        out += chunk
        if len(out) > cap:
            raise ValueError("decompressed size over cap")
    return bytes(out)


def snappy_frame(data: bytes, chunk: int = 65536) -> bytes:
    """fixture writer (snzip/snappy-java shape): stream id + one
    compressed chunk per ≤64 KiB block.  Exists because the container
    has no snappy tooling — the decoder is additionally pinned on
    hand-assembled spec-literal streams in tests, not just this
    round-trip (a shared bug would cancel out)."""
    import pyarrow as pa

    out = bytearray(_STREAM_ID)
    for i in range(0, len(data), chunk):
        block = data[i : i + chunk]
        comp = pa.compress(block, codec="snappy", asbytes=True)
        body = _masked(_crc32c(block)).to_bytes(4, "little") + comp
        out += bytes([0x00]) + len(body).to_bytes(3, "little") + body
    return bytes(out)
