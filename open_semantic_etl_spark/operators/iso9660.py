"""ISO 9660 (ECMA-119) disc-image container — native reader + fixture
writer.

The reference reaches disc images through Tika (ISO9660 via Commons
Compress / the zip tier's container semantics, enhance_zip.py:31-116
child contract); CD/DVD images show up in web crawls as ``.iso``
downloads and inside other archives.  This module is a from-scratch
parse of the PUBLIC ECMA-119 structures:

  sector 16+   volume descriptors — type 1 primary (PVD), type 2
               supplementary (Joliet when its escape sequences are
               UCS-2 level 1-3: ``%/@``, ``%/C``, ``%/E``), 255
               terminator; 2048-byte logical sectors
  PVD@156      root directory record (34 bytes)
  dir record   LEN-DR(1) xattr(1) extent-LBA(both-endian 8)
               data-len(both-endian 8) datetime(7) flags(1) unit(1)
               gap(1) volseq(4) LEN-FI(1) identifier(...) [pad]
               — records never cross sector boundaries: LEN-DR == 0
               → skip to the next 2048 boundary
  names        ``NAME.EXT;1`` — the ``;version`` suffix strips, a
               bare trailing ``.`` strips; Joliet names are UCS-2 BE

Bomb/garbage safety: the walk is budgeted (total bytes, member count,
directory-sector count, depth) and every extent is bounds-checked
against the image, so a crafted image cannot spin a task or balloon
memory.  The fixture writer (``build_iso``) exists because the
container ships no mkisofs; the reader is additionally pinned on a
hand-assembled sector-literal image in tests/test_iso9660.py.
"""

from __future__ import annotations

import struct

__all__ = ["sniff_iso", "iso_members", "build_iso"]

_SECTOR = 2048
_VD_START = 16 * _SECTOR

#: Joliet escape sequences (UCS-2 level 1/2/3) in the SVD escape field
_JOLIET_ESCAPES = (b"%/@", b"%/C", b"%/E")

_MAX_DIR_SECTORS = 4096  # directory data visited per image
_MAX_MEMBERS = 100_000
_MAX_DEPTH = 16


def sniff_iso(data: bytes) -> bool:
    """structural gate: the standard identifier 'CD001' in the first
    volume descriptor (sector 16) with a known descriptor type."""
    return (
        len(data) >= _VD_START + 8
        and data[_VD_START + 1 : _VD_START + 6] == b"CD001"
        and data[_VD_START] in (0, 1, 2, 3, 255)
    )


def _dirs_from_record(rec: bytes) -> tuple[int, int, int, int]:
    """(extent_lba, data_len, flags, len_fi) from a directory record."""
    extent = int.from_bytes(rec[2:6], "little")
    length = int.from_bytes(rec[10:14], "little")
    return extent, length, rec[25], rec[32]


def _decode_name(raw: bytes, joliet: bool) -> str:
    name = raw.decode("utf-16-be", "replace") if joliet else raw.decode(
        "ascii", "replace"
    )
    name = name.split(";", 1)[0]  # version suffix
    return name[:-1] if name.endswith(".") else name


def iso_members(
    data: bytes,
    max_member: int = 1 << 28,
    max_total: int = 1 << 30,
) -> list[tuple[str, bytes]]:
    """image bytes → [(path, payload)] in directory-walk order.

    Prefers the Joliet supplementary descriptor when present (long
    UCS-2 names — what real discs authored on Windows carry); falls
    back to the primary descriptor's d-character names.  Raises
    ValueError on a non-ISO payload (caller's degrade policy applies).
    """
    if not sniff_iso(data):
        raise ValueError("not an ISO 9660 image")
    pvd_root = joliet_root = None
    for i in range(32):  # descriptor set is tiny; terminator ends it
        off = _VD_START + i * _SECTOR
        if off + _SECTOR > len(data):
            break
        vtype = data[off]
        if data[off + 1 : off + 6] != b"CD001":
            break
        if vtype == 255:
            break
        if vtype == 1 and pvd_root is None:
            pvd_root = data[off + 156 : off + 190]
        elif vtype == 2 and joliet_root is None:
            esc = data[off + 88 : off + 120]
            if any(esc.startswith(e) for e in _JOLIET_ESCAPES):
                joliet_root = data[off + 156 : off + 190]
    joliet = joliet_root is not None
    root = joliet_root if joliet else pvd_root
    if root is None or len(root) < 34:
        raise ValueError("no usable volume descriptor")

    out: list[tuple[str, bytes]] = []
    budget = [max_total, _MAX_DIR_SECTORS]
    seen_extents: set[int] = set()  # loop guard (self-referencing dirs)

    def walk(rec: bytes, prefix: str, depth: int) -> None:
        extent, length, _flags, _ = _dirs_from_record(rec)
        if depth > _MAX_DEPTH or extent in seen_extents:
            return
        seen_extents.add(extent)
        start = extent * _SECTOR
        end = min(start + length, len(data))
        # charge the directory-sector budget for the data about to be
        # scanned, not just for empty-record skips: overlapping
        # record-packed directories would otherwise do
        # O(extents × records) work with the budget never moving
        budget[1] -= max(1, (end - start + _SECTOR - 1) // _SECTOR)
        pos = start
        while pos < end and len(out) < _MAX_MEMBERS:
            if budget[1] < 0:
                return
            len_dr = data[pos] if pos < len(data) else 0
            if len_dr == 0:
                nxt = (pos // _SECTOR + 1) * _SECTOR  # records never
                if nxt <= pos:  # cross sector boundaries (ECMA-119 §6.8.1.1)
                    return
                pos = nxt
                continue
            rec2 = data[pos : pos + len_dr]
            if len(rec2) < 34:
                return
            len_fi = rec2[32]
            raw_name = rec2[33 : 33 + len_fi]
            pos += len_dr
            if raw_name in (b"\x00", b"\x01", b""):
                continue  # self / parent
            name = _decode_name(raw_name, joliet)
            if not name:
                continue
            child_extent, child_len, flags, _ = _dirs_from_record(rec2)
            path = f"{prefix}{name}"
            if flags & 0x02:  # directory
                walk(rec2, path + "/", depth + 1)
                continue
            if child_len > min(max_member, budget[0]):
                continue  # oversized member: skip it, keep the rest
            cstart = child_extent * _SECTOR
            if cstart > len(data):
                continue  # lying extent: never slice garbage
            payload = data[cstart : cstart + child_len]
            if len(payload) < child_len:
                continue  # truncated image: keep complete members only
            budget[0] -= max(len(payload), 64)
            out.append((path, payload))
            if budget[0] <= 0:
                return

    walk(root, "", 0)
    return out


# ---------------------------------------------------------------------------
# fixture writer (tests + driver oracle — no mkisofs in the container)
# ---------------------------------------------------------------------------


def _both16(v: int) -> bytes:
    return struct.pack("<H", v) + struct.pack(">H", v)


def _both32(v: int) -> bytes:
    return struct.pack("<I", v) + struct.pack(">I", v)


def _dir_record(
    name: bytes, extent: int, length: int, is_dir: bool
) -> bytes:
    fi = name
    base = 33 + len(fi)
    pad = b"\x00" if len(fi) % 2 == 0 else b""
    rec = bytearray(base + len(pad))
    rec[0] = len(rec)
    rec[2:10] = _both32(extent)
    rec[10:18] = _both32(length)
    rec[18:25] = bytes((124, 1, 1, 0, 0, 0, 0))  # 2024-01-01 UTC
    rec[25] = 0x02 if is_dir else 0x00
    rec[28:32] = _both16(1)
    rec[32] = len(fi)
    rec[33 : 33 + len(fi)] = fi
    return bytes(rec)


def build_iso(
    files: dict[str, bytes], volume_id: str = "FIXTURE", joliet: bool = False
) -> bytes:
    """minimal single-directory-level ISO: paths may contain ``/``
    (one level of subdirectories).  With ``joliet=True`` the image
    carries BOTH a primary descriptor (8.3-ish names) and a Joliet
    SVD with UCS-2 names — readers must prefer the latter."""
    # partition into root files and one level of subdirs
    tree: dict[str, dict[str, bytes]] = {"": {}}
    for path, payload in files.items():
        d, _, n = path.rpartition("/")
        if d and "/" in d:
            raise ValueError("build_iso supports one directory level")
        tree.setdefault(d, {})[n] = payload
    dirs = sorted(tree)  # "" first
    n_desc = 3 if joliet else 2  # PVD [+SVD] + terminator
    # layout: descriptors | one sector per directory (per descriptor
    # set — joliet gets its own directory extents) | file extents
    sets = 2 if joliet else 1
    dir_extent: dict[tuple[int, str], int] = {}
    next_lba = 16 + n_desc
    for s in range(sets):
        for d in dirs:
            dir_extent[(s, d)] = next_lba
            next_lba += 1
    file_extent: dict[str, int] = {}
    blobs: list[bytes] = []
    for path, payload in files.items():
        file_extent[path] = next_lba
        next_lba += max(1, (len(payload) + _SECTOR - 1) // _SECTOR)
        blobs.append(payload)

    def enc(name: str, s: int) -> bytes:
        if joliet and s == 1:
            return name.encode("utf-16-be")
        return name.upper().encode("ascii", "replace")

    def dir_sector(s: int, d: str) -> bytes:
        lba = dir_extent[(s, d)]
        parent = dir_extent[(s, "")]
        recs = [
            _dir_record(b"\x00", lba, _SECTOR, True),
            _dir_record(b"\x01", parent, _SECTOR, True),
        ]
        if d == "":
            for sub in dirs:
                if sub:
                    recs.append(
                        _dir_record(enc(sub, s), dir_extent[(s, sub)], _SECTOR, True)
                    )
        for name, payload in tree[d].items():
            full = f"{d}/{name}" if d else name
            fi = enc(name, s) + (b";1" if not (joliet and s == 1) else b"")
            recs.append(_dir_record(fi, file_extent[full], len(payload), False))
        body = b"".join(recs)
        if len(body) > _SECTOR:
            raise ValueError("directory overflows one sector")
        return body.ljust(_SECTOR, b"\x00")

    def descriptor(vtype: int, s: int) -> bytes:
        vd = bytearray(_SECTOR)
        vd[0] = vtype
        vd[1:6] = b"CD001"
        vd[6] = 1
        vol = volume_id.encode("utf-16-be") if (joliet and s == 1) else volume_id.encode()
        vd[40 : 40 + min(32, len(vol))] = vol[:32]
        vd[80:88] = _both32(next_lba)  # volume space size
        if vtype == 2:
            vd[88:91] = b"%/E"  # UCS-2 level 3
        vd[120:124] = _both16(1)  # set size
        vd[124:128] = _both16(1)  # sequence number
        vd[128:132] = _both16(_SECTOR)  # logical block size
        root = _dir_record(b"\x00", dir_extent[(s, "")], _SECTOR, True)
        vd[156 : 156 + len(root)] = root.ljust(34, b"\x00")[:34]
        return bytes(vd)

    img = bytearray(b"\x00" * _VD_START)
    img += descriptor(1, 0)
    if joliet:
        img += descriptor(2, 1)
    term = bytearray(_SECTOR)
    term[0] = 255
    term[1:6] = b"CD001"
    term[6] = 1
    img += term
    for s in range(sets):
        for d in dirs:
            img += dir_sector(s, d)
    for payload in blobs:
        n = max(1, (len(payload) + _SECTOR - 1) // _SECTOR)
        img += payload.ljust(n * _SECTOR, b"\x00")
    return bytes(img)
