"""RAR 4.x / 5.x container — stored-member reader + fixture writer.

Reference bar: the zip-tier child contract (enhance_zip.py:31-116)
applied to ``.rar`` downloads, which Tika reaches via the junrar
library.  RAR's COMPRESSED entries use RARLAB's proprietary scheme
(the PPMd/LZ variants are published only as reference decompiler
output, not a spec) — re-implementing them from memory risks decoding
garbage "successfully", so this module follows the repo's PST-PERMUTE
/ 7z-BCJ2 rule: STORED members extract natively with CRC32
verification; compressed or encrypted entries FAIL LOUDLY and the
whole payload degrades to an opaque container row (never half an
archive, never guessed bytes).  Stored RARs are what the format is
actually used for in data-hoarding crawls (media sets, pre-compressed
payloads), and member NAMES plus stored payloads cover the explode
contract for those.

Wire formats (public: RARLAB technote ``rar5 archive format`` and the
widely mirrored RAR 4.x block layout implemented by unrar/7-Zip):

RAR4  signature ``Rar!\\x1a\\x07\\x00`` (7 bytes), then blocks:
      HEAD_CRC:u16le (low 16 bits of CRC32 over TYPE..header end)
      TYPE:u8 FLAGS:u16le SIZE:u16le [ADD_SIZE:u32le if FLAGS&0x8000]
      types: 0x73 main (FLAGS&0x80: headers encrypted → fail),
      0x74 file, 0x7b end.  File header: PACK=ADD_SIZE, UNP:u32
      HOST:u8 CRC:u32 TIME:u32 VER:u8 METHOD:u8 NAMELEN:u16 ATTR:u32
      [+8 if FLAGS&0x100 (64-bit sizes)] then name, then PACK data
      bytes.  METHOD 0x30 = stored; FLAGS&0x04 = encrypted;
      FLAGS&0xE0 == 0xE0 = directory.
RAR5  signature ``Rar!\\x1a\\x07\\x01\\x00`` (8 bytes), then blocks:
      CRC32:u32le  HeaderSize:vint  header[HeaderSize]
      header := Type:vint Flags:vint [ExtraSize:vint if Flags&1]
      [DataSize:vint if Flags&2] type fields…; vints are
      little-endian base-128, bit 7 = continuation.  Types: 1 main,
      2 file, 3 service, 4 archive-encryption (→ fail loudly),
      5 end.  File fields: FileFlags:vint UnpSize:vint Attr:vint
      [mtime:u32 if FF&2] [DataCRC:u32 if FF&4] Compression:vint
      (bits 7-9 = method, 0 = stored) HostOS:vint NameLen:vint name.
      The header CRC32 is accepted over either the size-field-
      inclusive or -exclusive span (implementations differ in
      published sources; the DATA CRC32 — unambiguous — is what
      gates payload integrity here).
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["sniff_rar", "rar_members", "build_rar4", "build_rar5"]

_SIG4 = b"Rar!\x1a\x07\x00"
_SIG5 = b"Rar!\x1a\x07\x01\x00"
_MAX_BLOCKS = 100_000


def sniff_rar(data: bytes) -> int | None:
    """4, 5, or None."""
    if data.startswith(_SIG5):
        return 5
    if data.startswith(_SIG4):
        return 4
    return None


def _vint(data: bytes, pos: int) -> tuple[int, int]:
    """(value, next_pos) — RAR5 little-endian base-128 varint."""
    val = 0
    for i in range(10):
        if pos + i >= len(data):
            raise ValueError("rar5: truncated vint")
        b = data[pos + i]
        val |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return val, pos + i + 1
    raise ValueError("rar5: vint over 10 bytes")


def _members4(data: bytes, max_member: int, max_total: int) -> list:
    out: list[tuple[str, bytes]] = []
    pos = len(_SIG4)
    total = 0
    for _ in range(_MAX_BLOCKS):
        if pos + 7 > len(data):
            break
        head_crc, btype, flags, size = struct.unpack_from("<HBHH", data, pos)
        if size < 7:
            raise ValueError("rar4: header size under minimum")
        add_size = 0
        if flags & 0x8000:
            if pos + 11 > len(data):
                raise ValueError("rar4: truncated long block")
            add_size = struct.unpack_from("<I", data, pos + 7)[0]
        header = data[pos + 2 : pos + size]
        if len(header) != size - 2:
            if out:
                break  # truncated tail: keep complete leading members
            raise ValueError("rar4: truncated header")
        if (zlib.crc32(header) & 0xFFFF) != head_crc:
            if out:
                break
            raise ValueError("rar4: header CRC mismatch")
        if btype == 0x73 and flags & 0x0080:
            raise ValueError("rar4: encrypted block headers")
        if btype == 0x7B:  # end of archive
            break
        if btype == 0x74:
            if flags & 0x0004:
                raise ValueError("rar4: encrypted member")
            if size < 32:
                raise ValueError("rar4: file header under minimum")
            (unp_size, host, fcrc, ftime, ver, method, name_len, attr) = (
                struct.unpack_from("<IBIIBBHI", data, pos + 11)
            )
            name_at = pos + 32
            if flags & 0x0100:  # 64-bit sizes: two extra u32 before name
                if size < 40:
                    raise ValueError("rar4: short large-file header")
                high_pack, high_unp = struct.unpack_from("<II", data, pos + 32)
                add_size |= high_pack << 32
                unp_size |= high_unp << 32
                name_at += 8
            raw_name = data[name_at : name_at + name_len]
            if len(raw_name) != name_len or name_at + name_len > pos + size:
                raise ValueError("rar4: name extends past its header")
            if flags & 0x0200:  # unicode pair: ansi name before NUL
                raw_name = raw_name.split(b"\x00", 1)[0]
            name = raw_name.decode("utf-8", "replace").replace("\\", "/")
            body = data[pos + size : pos + size + add_size]
            if (flags & 0x00E0) != 0x00E0:  # not a directory entry
                if method != 0x30:
                    raise ValueError(
                        "rar4: compressed member (method 0x%02x)" % method
                    )
                if len(body) != add_size or add_size != unp_size:
                    if out:
                        break
                    raise ValueError("rar4: truncated stored member")
                if (zlib.crc32(body) & 0xFFFFFFFF) != fcrc:
                    raise ValueError("rar4: member CRC mismatch")
                if add_size <= max_member and total + add_size <= max_total:
                    total += add_size
                    out.append((name, bytes(body)))
        pos += size + add_size
    return out


def _members5(data: bytes, max_member: int, max_total: int) -> list:
    out: list[tuple[str, bytes]] = []
    pos = len(_SIG5)
    total = 0
    for _ in range(_MAX_BLOCKS):
        if pos + 5 > len(data):
            break
        crc = struct.unpack_from("<I", data, pos)[0]
        hsize, hstart = _vint(data, pos + 4)
        hend = hstart + hsize
        if hsize == 0 or hend > len(data):
            if out:
                break
            raise ValueError("rar5: truncated header")
        # header CRC: published implementations disagree on whether the
        # size vint is covered — accept either span, never guess one
        # (data integrity is gated by the unambiguous data CRC below)
        c_excl = zlib.crc32(data[hstart:hend]) & 0xFFFFFFFF
        c_incl = zlib.crc32(data[pos + 4 : hend]) & 0xFFFFFFFF
        if crc not in (c_excl, c_incl):
            if out:
                break
            raise ValueError("rar5: header CRC mismatch")
        p = hstart
        btype, p = _vint(data, p)
        hflags, p = _vint(data, p)
        extra_size = data_size = 0
        if hflags & 0x01:
            extra_size, p = _vint(data, p)
        if hflags & 0x02:
            data_size, p = _vint(data, p)
        if btype == 4:
            raise ValueError("rar5: encrypted archive headers")
        if btype == 5:  # end of archive
            break
        if btype == 2:  # file header
            fflags, p = _vint(data, p)
            unp_size, p = _vint(data, p)
            _attr, p = _vint(data, p)
            if fflags & 0x02:
                p += 4  # mtime
            data_crc = None
            if fflags & 0x04:
                if p + 4 > hend:
                    raise ValueError("rar5: truncated data CRC")
                data_crc = struct.unpack_from("<I", data, p)[0]
                p += 4
            comp, p = _vint(data, p)
            _host, p = _vint(data, p)
            name_len, p = _vint(data, p)
            raw_name = data[p : p + name_len]
            if len(raw_name) != name_len or p + name_len > hend:
                raise ValueError("rar5: truncated name")
            name = raw_name.decode("utf-8", "replace").replace("\\", "/")
            body = data[hend : hend + data_size]
            if not fflags & 0x01:  # not a directory
                if (comp >> 7) & 0x07:
                    raise ValueError(
                        "rar5: compressed member (method %d)" % ((comp >> 7) & 7)
                    )
                if len(body) != data_size or data_size != unp_size:
                    if out:
                        break
                    raise ValueError("rar5: truncated stored member")
                if data_crc is not None and (
                    zlib.crc32(body) & 0xFFFFFFFF
                ) != data_crc:
                    raise ValueError("rar5: member CRC mismatch")
                if data_size <= max_member and total + data_size <= max_total:
                    total += data_size
                    out.append((name, bytes(body)))
        pos = hend + data_size
    return out


def rar_members(
    data: bytes,
    max_member: int = 1 << 28,
    max_total: int = 1 << 30,
) -> list[tuple[str, bytes]]:
    """archive bytes → [(member name, stored payload)].

    Raises ValueError on non-RAR payloads, encryption, COMPRESSED
    members (see module docstring — fail loudly, never guess), CRC
    mismatches, and malformed headers.  A truncated tail after at
    least one complete member keeps the leading members (the tar
    tier's partial-download rule)."""
    ver = sniff_rar(data)
    if ver == 4:
        return _members4(data, max_member, max_total)
    if ver == 5:
        return _members5(data, max_member, max_total)
    raise ValueError("not a RAR archive")


# ---------------------------------------------------------------------------
# fixture writers (stored-only; no rar tooling exists in the container
# — tests additionally pin the readers on hand-assembled spec-literal
# archives so writer round-trips are evidence, not tautology)
# ---------------------------------------------------------------------------


def build_rar4(files: dict[str, bytes]) -> bytes:
    out = bytearray(_SIG4)

    def block(btype: int, flags: int, body: bytes, add: bytes = b"") -> bytes:
        size = 7 + len(body) + (4 if flags & 0x8000 else 0)
        head = struct.pack("<BHH", btype, flags, size)
        if flags & 0x8000:
            head += struct.pack("<I", len(add))
        head += body
        crc = zlib.crc32(head) & 0xFFFF
        return struct.pack("<H", crc) + head + add

    out += block(0x73, 0x0000, b"\x00" * 6)  # main header (reserved)
    for name, payload in files.items():
        raw = name.encode("utf-8")
        body = struct.pack(
            "<IBIIBBHI",
            len(payload),  # UNP_SIZE
            0,  # HOST_OS = MS-DOS
            zlib.crc32(payload) & 0xFFFFFFFF,
            0x5A000000,  # FTIME
            29,  # UNP_VER
            0x30,  # METHOD: stored
            len(raw),
            0x20,  # ATTR
        ) + raw
        out += block(0x74, 0x8000, body, payload)
    out += block(0x7B, 0x4000, b"")
    return bytes(out)


def _wvint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def build_rar5(files: dict[str, bytes]) -> bytes:
    out = bytearray(_SIG5)

    def block(header: bytes, data: bytes = b"") -> bytes:
        # CRC over the size-field-inclusive span (one of the two
        # accepted interpretations; the reader pins data CRCs anyway)
        pre = _wvint(len(header))
        crc = zlib.crc32(pre + header) & 0xFFFFFFFF
        return struct.pack("<I", crc) + pre + header + data

    out += block(_wvint(1) + _wvint(0) + _wvint(0))  # main: type flags archflags
    for name, payload in files.items():
        raw = name.encode("utf-8")
        header = (
            _wvint(2)  # type: file
            + _wvint(0x02)  # header flags: data area present
            + _wvint(len(payload))  # data size
            + _wvint(0x04)  # file flags: CRC present
            + _wvint(len(payload))  # unpacked size
            + _wvint(0x20)  # attributes
            + struct.pack("<I", zlib.crc32(payload) & 0xFFFFFFFF)
            + _wvint(0)  # compression: version 0, stored
            + _wvint(0)  # host OS
            + _wvint(len(raw))
            + raw
        )
        out += block(header, payload)
    out += block(_wvint(5) + _wvint(0) + _wvint(0))  # end of archive
    return bytes(out)
