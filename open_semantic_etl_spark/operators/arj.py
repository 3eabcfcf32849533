"""ARJ archive container — stored-member reader + fixture writer.

Reference bar: the zip-tier child contract (enhance_zip.py:31-116)
applied to ``.arj`` downloads — Tika reads ARJ through Commons
Compress's ArjArchiveInputStream, which itself only supports STORED
entries (method 0) and throws on compressed ones; this module matches
that behavior exactly: stored members extract with CRC32
verification, methods 1-4, garbled (encrypted) entries, and
multi-volume archives FAIL LOUDLY (the same honesty rule as the RAR
tier — ARJ's method-1..3 LZSS+Huffman and method-4 fast codec have no
in-container oracle to pin a from-scratch decoder against).

Wire format (the arj_proc TECH.DOC layout Commons Compress
implements): each block is

  magic:u16le 0xEA60  basic_hdr_size:u16le (0 = end of archive,
  ≤ 2600)  basic header[basic_hdr_size]  basic_hdr_crc32:u32le
  ext_hdr_size:u16le (0 in practice)  [file data comp_size bytes]

  basic header := first_hdr_size:u8 version:u8 min_version:u8
  host_os:u8 flags:u8 method:u8 file_type:u8 reserved:u8 mtime:u32
  comp_size:u32 orig_size:u32 file_crc:u32 entry_pos:u16 mode:u16
  host_data:u16, then at first_hdr_size: filename\\0 comment\\0

The first block is the archive header (file_type 2, no data), file
blocks follow (file_type 0 binary / 1 text), a zero basic_hdr_size
terminates.  Flags: 0x01 GARBLED (encrypted), 0x04 VOLUME
(multi-volume continuation).
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["sniff_arj", "arj_members", "build_arj"]

ARJ_MAGIC = b"\x60\xea"
_MAX_BASIC_HDR = 2600  # spec cap — also the sniff's structural gate
_MAX_BLOCKS = 100_000


def sniff_arj(data: bytes) -> bool:
    """magic + in-range header size + the first-header-size byte
    pointing inside the basic header (binary magic, but cheap
    structure anyway — the htmlx-sniff lesson)."""
    if len(data) < 8 or data[:2] != ARJ_MAGIC:
        return False
    bsize = struct.unpack_from("<H", data, 2)[0]
    return 30 <= bsize <= _MAX_BASIC_HDR and 30 <= data[4] <= bsize


def arj_members(
    data: bytes,
    max_member: int = 1 << 28,
    max_total: int = 1 << 30,
) -> list[tuple[str, bytes]]:
    """archive bytes → [(name, stored payload)].

    Raises ValueError on non-ARJ payloads, compressed/garbled/
    multi-volume entries, CRC mismatches, or malformed headers; a
    truncated tail after at least one complete member keeps the
    leading members (the tar-tier rule)."""
    if not sniff_arj(data):
        raise ValueError("not an ARJ archive")
    out: list[tuple[str, bytes]] = []
    pos = 0
    total = 0
    first_block = True
    for _ in range(_MAX_BLOCKS):
        if pos + 4 > len(data):
            break
        if data[pos : pos + 2] != ARJ_MAGIC:
            if out:
                break  # tail garbage after complete members
            raise ValueError("arj: bad block magic")
        bsize = struct.unpack_from("<H", data, pos + 2)[0]
        if bsize == 0:  # end-of-archive marker
            break
        if not 30 <= bsize <= _MAX_BASIC_HDR:
            raise ValueError("arj: basic header size out of range")
        hdr_at = pos + 4
        hdr = data[hdr_at : hdr_at + bsize]
        if len(hdr) != bsize or hdr_at + bsize + 6 > len(data):
            if out:
                break
            raise ValueError("arj: truncated header")
        crc = struct.unpack_from("<I", data, hdr_at + bsize)[0]
        if (zlib.crc32(hdr) & 0xFFFFFFFF) != crc:
            if out:
                break
            raise ValueError("arj: header CRC mismatch")
        first_hdr_size = hdr[0]
        if first_hdr_size < 30 or first_hdr_size > bsize:
            raise ValueError("arj: bad first header size")
        flags, method, file_type = hdr[4], hdr[5], hdr[6]
        comp_size, orig_size, file_crc = struct.unpack_from("<III", hdr, 12)
        ext_size = struct.unpack_from("<H", data, hdr_at + bsize + 4)[0]
        body_at = hdr_at + bsize + 6 + ext_size
        if flags & 0x01:
            raise ValueError("arj: garbled (encrypted) entry")
        if flags & 0x04:
            raise ValueError("arj: multi-volume archive")
        if first_block:
            # archive header: no data follows regardless of sizes
            first_block = False
            pos = body_at
            continue
        name_raw = hdr[first_hdr_size:].split(b"\x00", 1)[0]
        name = name_raw.decode("utf-8", "replace").replace("\\", "/")
        body = data[body_at : body_at + comp_size]
        if file_type in (0, 1):  # binary / text file entry
            if method != 0:
                raise ValueError("arj: compressed entry (method %d)" % method)
            if len(body) != comp_size or comp_size != orig_size:
                if out:
                    break
                raise ValueError("arj: truncated stored entry")
            if (zlib.crc32(body) & 0xFFFFFFFF) != file_crc:
                raise ValueError("arj: entry CRC mismatch")
            if name and comp_size <= max_member and total + comp_size <= max_total:
                total += comp_size
                out.append((name, bytes(body)))
        pos = body_at + comp_size
    return out


# ---------------------------------------------------------------------------
# fixture writer (no arj tooling in the container; the reader is
# additionally pinned on a hand-assembled TECH.DOC-literal archive in
# tests/test_arj.py)
# ---------------------------------------------------------------------------


def _block(flags: int, method: int, file_type: int, name: bytes,
           payload: bytes) -> bytes:
    hdr = struct.pack(
        "<BBBBBBBBIIIIHHH",
        30, 11, 1, 0, flags, method, file_type, 0,
        0x5A000000,  # mtime
        len(payload), len(payload),
        zlib.crc32(payload) & 0xFFFFFFFF,
        0, 0o644, 0,
    ) + name + b"\x00" + b"\x00"  # filename + empty comment
    return (
        ARJ_MAGIC + struct.pack("<H", len(hdr)) + hdr
        + struct.pack("<I", zlib.crc32(hdr) & 0xFFFFFFFF)
        + struct.pack("<H", 0)  # no extended header
        + payload
    )


def build_arj(files: dict[str, bytes]) -> bytes:
    out = bytearray(_block(0, 0, 2, b"fixture.arj", b""))  # archive hdr
    for name, payload in files.items():
        out += _block(0x10, 0, 0, name.encode("utf-8"), payload)
    out += ARJ_MAGIC + struct.pack("<H", 0)  # end of archive
    return bytes(out)
