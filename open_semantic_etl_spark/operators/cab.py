"""Microsoft Cabinet (.cab) container — native reader + fixture writer.

Reference bar: the zip-tier child contract (enhance_zip.py:31-116)
applied to ``.cab`` downloads (Tika reaches them via the Commons
Compress / libmspack path).  The wire format is the public [MS-CAB]
spec; the compression tiers:

  none (0)     raw folder bytes
  MSZIP (1)    each CFDATA block = ``CK`` + one COMPLETE raw-deflate
               stream whose LZ77 history CONTINUES across blocks —
               decoded with ``zlib.decompressobj(wbits=-15,
               zdict=<previous uncompressed output>)`` per block
  QUANTUM (2) / LZX (3) → fail loudly (LZX's aligned-offset trees and
               E8 translation are a full codec; guessing risks
               decoding garbage "successfully" — the PST-PERMUTE rule)

Structures walked: CFHEADER (+optional per-cabinet reserve areas),
CFFOLDER[cFolders] (coffCabStart, cCFData, typeCompress),
CFFILE[cFiles] (cbFile, uoffFolderStart, iFolder, szName), then per
folder CFDATA[cCFData] (csum, cbData, cbUncomp, ab).  Every CFDATA
checksum is verified when nonzero — seed = checksum of the
cbData/cbUncomp field bytes, XOR of little-endian u32 words with the
FDI.C remainder fold (the canonical published sample).  Multi-cabinet
sets (flags PREV/NEXT, iFolder ≥ 0xFFFD) fail loudly — a continued
folder cannot be decoded from one cabinet alone.

Bomb/garbage safety: member and total sizes are DECLARED (cbFile,
cbUncomp ≤ 32768 per block) and capped before any allocation; block
and file counts are u16-bounded by the format itself.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["sniff_cab", "cab_members", "build_cab"]

_MAX_UNCOMP_BLOCK = 32768 + 6144  # spec: cbUncomp cap (+MSZIP slack)


def sniff_cab(data: bytes) -> bool:
    """``MSCF`` + version 1.3 + internally consistent header counts
    (the magic is printable-adjacent, so the structure gates too)."""
    if len(data) < 36 or data[:4] != b"MSCF":
        return False
    cb_cabinet, coff_files = struct.unpack_from("<I4xI", data, 8)
    ver_minor, ver_major, c_folders, c_files = struct.unpack_from(
        "<BBHH", data, 24
    )
    return (
        (ver_major, ver_minor) == (1, 3)
        and c_folders > 0
        and c_files > 0
        and 36 <= coff_files <= len(data)
        and cb_cabinet >= 36
    )


def _csum(data: bytes, seed: int) -> int:
    """[MS-CAB] CSUMCompute — XOR of LE u32 words, FDI.C remainder fold."""
    csum = seed
    n = len(data) // 4
    for i in range(n):
        csum ^= struct.unpack_from("<I", data, 4 * i)[0]
    rem = data[4 * n :]
    ul = 0
    shifts = (16, 8, 0)[3 - len(rem) :]
    for b, sh in zip(rem, shifts):
        ul |= b << sh
    return (csum ^ ul) & 0xFFFFFFFF


def _cstring(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.index(b"\x00", pos, pos + 512)
    return data[pos:end], end + 1


def cab_members(
    data: bytes,
    max_member: int = 1 << 28,
    max_total: int = 1 << 30,
) -> list[tuple[str, bytes]]:
    """cabinet bytes → [(file name, payload)] in CFFILE order.

    Raises ValueError on non-CAB payloads, QUANTUM/LZX folders,
    multi-cabinet spans, checksum mismatches, and malformed
    structures (the caller's degrade rule keeps the container
    label / opaque member row)."""
    if not sniff_cab(data):
        raise ValueError("not a cabinet")
    coff_files = struct.unpack_from("<I", data, 16)[0]
    c_folders, c_files, flags = struct.unpack_from("<HHH", data, 26)
    if flags & 0x0003:
        raise ValueError("cab: multi-cabinet set (prev/next present)")
    pos = 36
    cb_cf_folder = cb_cf_data = 0
    if flags & 0x0004:  # reserve areas present
        cb_cf_header, cb_cf_folder, cb_cf_data = struct.unpack_from(
            "<HBB", data, 36
        )
        pos = 40 + cb_cf_header
    folders: list[tuple[int, int, int]] = []
    for _ in range(c_folders):
        if pos + 8 > len(data):
            raise ValueError("cab: truncated CFFOLDER")
        off, n_blocks, typ = struct.unpack_from("<IHH", data, pos)
        folders.append((off, n_blocks, typ & 0x000F))
        pos += 8 + cb_cf_folder
    files: list[tuple[str, int, int, int]] = []
    pos = coff_files
    for _ in range(c_files):
        if pos + 16 > len(data):
            raise ValueError("cab: truncated CFFILE")
        cb_file, uoff, ifolder, _date, _time, attribs = struct.unpack_from(
            "<IIHHHH", data, pos
        )
        raw_name, pos = _cstring(data, pos + 16)
        enc = "utf-8" if attribs & 0x80 else "latin-1"
        name = raw_name.decode(enc, "replace").replace("\\", "/")
        if ifolder >= 0xFFFD:
            raise ValueError("cab: folder continued from another cabinet")
        if ifolder >= c_folders:
            raise ValueError("cab: CFFILE points past the folder table")
        files.append((name, cb_file, uoff, ifolder))

    # decode each referenced folder once, bounded by what its files need
    need: dict[int, int] = {}
    for _name, cb_file, uoff, ifolder in files:
        need[ifolder] = max(need.get(ifolder, 0), uoff + cb_file)
    streams: dict[int, bytes] = {}
    decoded_total = 0  # cumulative across folders — 65 k folders may
    # all point at the same CFDATA run; per-folder caps alone would
    # let a crafted cabinet decode folders × cap bytes
    for ifolder, want in need.items():
        off, n_blocks, typ = folders[ifolder]
        if typ in (2, 3):
            raise ValueError(
                "cab: %s folder (out of scope — fail loudly)"
                % ("QUANTUM" if typ == 2 else "LZX")
            )
        if typ not in (0, 1):
            raise ValueError("cab: unknown compression type %d" % typ)
        decoded_total += want
        if want > min(max_member + (1 << 16), max_total) or (
            decoded_total > max_total + (1 << 16)
        ):
            raise ValueError("cab: folder over byte budget")
        out = bytearray()
        pos = off
        history = b""
        for _ in range(n_blocks):
            if len(out) >= want:
                break  # the remaining blocks hold no needed bytes
            if pos + 8 > len(data):
                raise ValueError("cab: truncated CFDATA header")
            csum, cb_data, cb_uncomp = struct.unpack_from("<IHH", data, pos)
            ab = data[pos + 8 + cb_cf_data : pos + 8 + cb_cf_data + cb_data]
            if len(ab) != cb_data or cb_uncomp > _MAX_UNCOMP_BLOCK:
                raise ValueError("cab: truncated/oversized CFDATA block")
            if csum:
                seed = _csum(data[pos + 4 : pos + 8], 0)
                if _csum(ab, seed) != csum:
                    raise ValueError("cab: CFDATA checksum mismatch")
            if typ == 0:
                chunk = ab
            else:  # MSZIP: CK + raw deflate, history chained via zdict
                if ab[:2] != b"CK":
                    raise ValueError("cab: bad MSZIP block signature")
                d = zlib.decompressobj(wbits=-15, zdict=bytes(history))
                chunk = d.decompress(ab[2:], _MAX_UNCOMP_BLOCK)
                chunk += d.flush(_MAX_UNCOMP_BLOCK)
            if len(chunk) != cb_uncomp:
                raise ValueError("cab: block decodes to the wrong size")
            out += chunk
            # window = last 32 KiB of ALL prior output (blocks under
            # 32768 bytes leave earlier blocks inside the window)
            history = out[-32768:]
            pos += 8 + cb_cf_data + cb_data
        streams[ifolder] = bytes(out)

    result: list[tuple[str, bytes]] = []
    total = 0
    for name, cb_file, uoff, ifolder in files:
        stream = streams[ifolder]
        payload = stream[uoff : uoff + cb_file]
        if len(payload) != cb_file:
            raise ValueError("cab: member extends past its folder data")
        if cb_file <= max_member and total + cb_file <= max_total:
            total += cb_file
            result.append((name, payload))
    return result


# ---------------------------------------------------------------------------
# fixture writer (no lcab/gcab in the container; the reader is
# additionally pinned on a hand-assembled spec-literal cabinet in
# tests/test_cab.py)
# ---------------------------------------------------------------------------


def build_cab(files: dict[str, bytes], mszip: bool = True) -> bytes:
    """single-folder cabinet; MSZIP (default) or stored."""
    names = list(files)
    folder_data = b"".join(files[n] for n in names)
    # CFDATA blocks of ≤32768 uncompressed bytes each
    blocks = []
    history = b""
    for i in range(0, max(len(folder_data), 1), 32768):
        chunk = folder_data[i : i + 32768]
        if mszip:
            comp = zlib.compressobj(6, zlib.DEFLATED, -15, zdict=history)
            ab = b"CK" + comp.compress(chunk) + comp.flush()
            history = folder_data[: i + 32768][-32768:]
        else:
            ab = chunk
        fields = struct.pack("<HH", len(ab), len(chunk))
        csum = _csum(ab, _csum(fields, 0))
        blocks.append(struct.pack("<I", csum) + fields + ab)
    cfdata = b"".join(blocks)

    cffile = b""
    uoff = 0
    for n in names:
        raw = n.encode("utf-8")
        attribs = 0x20 | (0x80 if any(b > 0x7F for b in raw) else 0)
        cffile += struct.pack(
            "<IIHHHH", len(files[n]), uoff, 0, 0x5A21, 0x3000, attribs
        ) + raw + b"\x00"
        uoff += len(files[n])

    coff_files = 36 + 8  # header + one CFFOLDER
    coff_cab_start = coff_files + len(cffile)
    cffolder = struct.pack(
        "<IHH", coff_cab_start, len(blocks), 1 if mszip else 0
    )
    cb_cabinet = coff_cab_start + len(cfdata)
    header = (
        b"MSCF" + struct.pack("<I", 0)
        + struct.pack("<I", cb_cabinet) + struct.pack("<I", 0)
        + struct.pack("<I", coff_files) + struct.pack("<I", 0)
        + struct.pack("<BBHHHHH", 3, 1, 1, len(names), 0, 0x1234, 0)
    )
    return header + cffolder + cffile + cfdata
