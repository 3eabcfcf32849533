"""Native 7-Zip container reader (and fixture writer).

The reference indexes ``.7z`` archives through Tika's SevenZParser
(enhance_zip.py:31-116 child semantics apply to whatever Tika
explodes); this module gives the Spark tier the same capability
without any external tool: a from-scratch parser of the public 7z
format (the ``7zFormat.txt`` structure description shipped with the
7-Zip source) with folder decoding through stdlib ``lzma``/``bz2``/
``zlib``.

Supported on the read side: plain and LZMA/LZMA2-encoded headers
(``kEncodedHeader``), multi-folder archives, solid folders (many
files per folder via ``kSubStreamsInfo``), empty files and
directories, coder chains of 1-in/1-out coders (Copy, LZMA1, LZMA2,
BZip2, Deflate, Delta), and CRC verification whenever digests are
present.  Everything else — encryption, BCJ2 (4-stream), unknown
coders — raises :class:`SevenZipError` loudly: decoding garbage
"successfully" is the one unacceptable failure mode.

Bomb safety: unpack sizes are declared in the header, so every cap is
enforced BEFORE any byte is decompressed, and the LZMA decoders are
fed ``max_length`` so a lying header cannot balloon memory either.

The writer exists because this container has no 7z tooling at all —
same pattern as the PST and PDF fixture builders: fixtures are built
by an independent code path (one-folder-per-file vs the reader's
generic substream walk) so round-trip tests still mean something.
"""

from __future__ import annotations

import bz2
import io
import lzma
import zlib

__all__ = ["SevenZipError", "sevenzip_members", "build_7z", "SEVENZIP_MAGIC"]

SEVENZIP_MAGIC = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZES = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_ANTI = 0x10
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_CODER_COPY = b"\x00"
_CODER_DELTA = b"\x03"
_CODER_LZMA2 = b"\x21"
_CODER_LZMA1 = b"\x03\x01\x01"
_CODER_BZIP2 = b"\x04\x02\x02"
_CODER_DEFLATE = b"\x04\x01\x08"

#: BCJ branch-converter coders (7-Zip Methods.txt ids) → the stdlib
#: liblzma filter that implements the identical transform (both trees
#: descend from the LZMA SDK's Bra* filters).  Decoded via a raw-stream
#: round-trip (see _apply_coder_inner) so the filter semantics are
#: liblzma's, never a from-memory reimplementation.  ARM64 (0x0a) and
#: RISC-V (0x0b) stay unsupported: this liblzma predates their filters,
#: and a guessed transform that "succeeds" is the unacceptable mode.
_BCJ_CODERS = {
    b"\x03\x03\x01\x03": "FILTER_X86",
    b"\x03\x03\x02\x05": "FILTER_POWERPC",
    b"\x03\x03\x04\x01": "FILTER_IA64",
    b"\x03\x03\x05\x01": "FILTER_ARM",
    b"\x03\x03\x07\x01": "FILTER_ARMTHUMB",
    b"\x03\x03\x08\x05": "FILTER_SPARC",
}

_MAX_FILES = 1_000_000  # header-declared count sanity cap


class SevenZipError(ValueError):
    """archive is not 7z, is corrupt, or needs an unsupported coder."""


class _R:
    """bounds-checked cursor over the (possibly decoded) header bytes."""

    def __init__(self, buf: bytes) -> None:
        self.b = buf
        self.p = 0

    def bytes(self, n: int) -> bytes:
        if n < 0 or self.p + n > len(self.b):
            raise SevenZipError("truncated 7z header")
        out = self.b[self.p : self.p + n]
        self.p += n
        return out

    def byte(self) -> int:
        return self.bytes(1)[0]

    def u32(self) -> int:
        return int.from_bytes(self.bytes(4), "little")

    def num(self) -> int:
        """the 7z variable-length number: the first byte's leading one
        bits count the little-endian extra bytes; its remaining low
        bits are the value's HIGH bits."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not first & mask:
                value |= (first & (mask - 1)) << (8 * i)
                break
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        data = self.bytes((n + 7) // 8)
        return [bool(data[i >> 3] & (0x80 >> (i & 7))) for i in range(n)]

    def bools_with_all_defined(self, n: int) -> list[bool]:
        return [True] * n if self.byte() else self.bitvector(n)


def _read_digests(r: _R, n: int) -> list[int | None]:
    defined = r.bools_with_all_defined(n)
    return [r.u32() if d else None for d in defined]


def _parse_folder(r: _R) -> dict:
    num_coders = r.num()
    if not 1 <= num_coders <= 16:
        raise SevenZipError("implausible coder count")
    coders = []
    total_in = total_out = 0
    for _ in range(num_coders):
        flag = r.byte()
        coder_id = r.bytes(flag & 0x0F)
        nin = nout = 1
        if flag & 0x10:
            nin, nout = r.num(), r.num()
        props = r.bytes(r.num()) if flag & 0x20 else b""
        if flag & 0x80:
            raise SevenZipError("alternative coder methods unsupported")
        coders.append({"id": coder_id, "props": props, "nin": nin, "nout": nout})
        total_in += nin
        total_out += nout
    bind_pairs = [(r.num(), r.num()) for _ in range(total_out - 1)]
    num_packed = total_in - len(bind_pairs)
    if num_packed == 1:
        bound = {i for i, _ in bind_pairs}
        packed = [next(i for i in range(total_in) if i not in bound)]
    else:
        packed = [r.num() for _ in range(num_packed)]
    return {
        "coders": coders,
        "bind_pairs": bind_pairs,
        "packed": packed,
        "unpack_sizes": [],  # filled by kCodersUnpackSize
        "crc": None,
    }


def _folder_unpack_size(folder: dict) -> int:
    """size of the one output stream no bind pair consumes."""
    used = {o for _, o in folder["bind_pairs"]}
    for i in range(len(folder["unpack_sizes"]) - 1, -1, -1):
        if i not in used:
            return folder["unpack_sizes"][i]
    raise SevenZipError("folder has no final output stream")


def _parse_streams_info(r: _R) -> dict:
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[dict] = []
    substream_counts: list[int] | None = None
    substream_sizes: list[int] | None = None
    substream_crcs: list[int | None] | None = None
    nid = r.num()
    if nid == _K_PACK_INFO:
        pack_pos = r.num()
        n = r.num()
        if n > _MAX_FILES:
            raise SevenZipError("implausible pack-stream count")
        while True:
            nid = r.num()
            if nid == _K_END:
                break
            if nid == _K_SIZE:
                pack_sizes = [r.num() for _ in range(n)]
            elif nid == _K_CRC:
                _read_digests(r, n)
            else:
                raise SevenZipError("unknown id in PackInfo")
        nid = r.num()
    if nid == _K_UNPACK_INFO:
        if r.num() != _K_FOLDER:
            raise SevenZipError("expected kFolder")
        nf = r.num()
        if nf > _MAX_FILES:
            raise SevenZipError("implausible folder count")
        if r.byte():
            raise SevenZipError("external folder definitions unsupported")
        folders = [_parse_folder(r) for _ in range(nf)]
        if r.num() != _K_UNPACK_SIZES:
            raise SevenZipError("expected kCodersUnpackSize")
        for f in folders:
            nout = sum(c["nout"] for c in f["coders"])
            f["unpack_sizes"] = [r.num() for _ in range(nout)]
        while True:
            nid = r.num()
            if nid == _K_END:
                break
            if nid == _K_CRC:
                for f, d in zip(folders, _read_digests(r, nf)):
                    f["crc"] = d
            else:
                raise SevenZipError("unknown id in UnPackInfo")
        nid = r.num()
    if nid == _K_SUBSTREAMS:
        substream_counts = [1] * len(folders)
        nid = r.num()
        if nid == _K_NUM_UNPACK_STREAM:
            substream_counts = [r.num() for _ in range(len(folders))]
            nid = r.num()
        substream_sizes = []
        if nid == _K_SIZE:
            for f, cnt in zip(folders, substream_counts):
                if cnt == 0:
                    continue
                acc = 0
                for _ in range(cnt - 1):
                    s = r.num()
                    substream_sizes.append(s)
                    acc += s
                substream_sizes.append(_folder_unpack_size(f) - acc)
            nid = r.num()
        else:
            for f, cnt in zip(folders, substream_counts):
                if cnt == 1:
                    substream_sizes.append(_folder_unpack_size(f))
                elif cnt != 0:
                    raise SevenZipError("multi-substream folder missing kSize")
        # CRCs: folders with exactly one substream AND a folder CRC
        # already have their digest; kCRC covers only the rest
        known = [
            f["crc"]
            for f, cnt in zip(folders, substream_counts)
            if cnt == 1 and f["crc"] is not None
        ]
        total_streams = sum(substream_counts)
        substream_crcs = [None] * total_streams
        if nid == _K_CRC:
            missing = total_streams - len(known)
            fresh = iter(_read_digests(r, missing))
            pos = 0
            for f, cnt in zip(folders, substream_counts):
                for j in range(cnt):
                    if cnt == 1 and f["crc"] is not None:
                        substream_crcs[pos] = f["crc"]
                    else:
                        substream_crcs[pos] = next(fresh)
                    pos += 1
            nid = r.num()
        else:
            pos = 0
            for f, cnt in zip(folders, substream_counts):
                if cnt == 1 and f["crc"] is not None:
                    substream_crcs[pos] = f["crc"]
                pos += cnt
        if nid != _K_END:
            raise SevenZipError("unknown id in SubStreamsInfo")
        nid = r.num()
    if nid != _K_END:
        raise SevenZipError("unknown id in StreamsInfo")
    if substream_counts is None:
        substream_counts = [1] * len(folders)
        substream_sizes = [_folder_unpack_size(f) for f in folders]
        substream_crcs = [f["crc"] for f in folders]
    return {
        "pack_pos": pack_pos,
        "pack_sizes": pack_sizes,
        "folders": folders,
        "counts": substream_counts,
        "sizes": substream_sizes or [],
        "crcs": substream_crcs or [],
    }


# ---------------------------------------------------------------------------
# folder decoding
# ---------------------------------------------------------------------------


def _lzma1_filter(props: bytes) -> list[dict]:
    if len(props) < 5:
        raise SevenZipError("short LZMA1 props")
    d = props[0]
    lc, rest = d % 9, d // 9
    lp, pb = rest % 5, rest // 5
    if pb > 4:
        raise SevenZipError("bad LZMA1 props")
    dict_size = max(int.from_bytes(props[1:5], "little"), 1 << 12)
    return [
        {"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb, "dict_size": dict_size}
    ]


def _lzma2_filter(props: bytes) -> list[dict]:
    if len(props) < 1 or props[0] > 40:
        raise SevenZipError("bad LZMA2 props")
    p = props[0]
    dict_size = 0xFFFFFFFF if p == 40 else (2 | (p & 1)) << (p // 2 + 11)
    return [{"id": lzma.FILTER_LZMA2, "dict_size": max(dict_size, 1 << 12)}]


def _bcj_filter_spec(cid: bytes, props: bytes) -> dict:
    name = _BCJ_CODERS[cid]
    if not hasattr(lzma, name):
        raise SevenZipError(f"liblzma lacks {name}")
    filt: dict = {"id": getattr(lzma, name)}
    if props:
        if len(props) != 4:
            raise SevenZipError("bad BCJ props")
        off = int.from_bytes(props, "little")
        if off:
            filt["start_offset"] = off  # liblzma rejects misaligned ones
    return filt


def _bcj_decode(cid: bytes, props: bytes, data: bytes) -> bytes:
    """apply the BCJ inverse via liblzma itself: wrap the filtered bytes
    in a preset-0 raw LZMA2 stream, then decompress through the
    [BCJ, LZMA2] chain — liblzma undoes LZMA2 and then runs its own
    branch-filter decoder.  Zero guessed semantics; the round-trip
    costs one fast preset-0 pass on a cold-path member."""
    inner = lzma.compress(
        data,
        format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 0}],
    )
    return lzma.decompress(
        inner,
        format=lzma.FORMAT_RAW,
        filters=[_bcj_filter_spec(cid, props), {"id": lzma.FILTER_LZMA2}],
    )


def bcj_encode(cid: bytes, data: bytes) -> bytes:
    """fixture-writer twin: the forward branch transform, again by
    liblzma (compress through [BCJ, LZMA2], strip the LZMA2 layer)."""
    packed = lzma.compress(
        data,
        format=lzma.FORMAT_RAW,
        filters=[_bcj_filter_spec(cid, b""), {"id": lzma.FILTER_LZMA2, "preset": 0}],
    )
    return lzma.decompress(
        packed, format=lzma.FORMAT_RAW, filters=[{"id": lzma.FILTER_LZMA2}]
    )


def _apply_coder(coder: dict, raw: bytes, size: int) -> bytes:
    try:
        return _apply_coder_inner(coder, raw, size)
    except SevenZipError:
        raise
    except Exception as exc:  # noqa: BLE001 — lzma/bz2/zlib corruption
        raise SevenZipError(f"7z stream decode failed: {exc}") from exc


def _apply_coder_inner(coder: dict, raw: bytes, size: int) -> bytes:
    cid, props = coder["id"], coder["props"]
    if cid == _CODER_COPY:
        out = raw[:size]
    elif cid == _CODER_LZMA1:
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=_lzma1_filter(props))
        out = dec.decompress(raw, max_length=size)
    elif cid == _CODER_LZMA2:
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=_lzma2_filter(props))
        out = dec.decompress(raw, max_length=size)
    elif cid == _CODER_BZIP2:
        dec = bz2.BZ2Decompressor()
        out = dec.decompress(raw, size)
    elif cid == _CODER_DEFLATE:
        out = zlib.decompressobj(-15).decompress(raw, size)
    elif cid == _CODER_DELTA:
        if len(props) != 1:
            raise SevenZipError("bad Delta props")
        if len(raw) != size:  # size-preserving filter: in must equal out
            raise SevenZipError("7z Delta size mismatch")
        dist = props[0] + 1
        buf = bytearray(raw)
        for i in range(dist, len(buf)):
            buf[i] = (buf[i] + buf[i - dist]) & 0xFF
        out = bytes(buf)
    elif cid in _BCJ_CODERS:
        # size-preserving: slicing here would fabricate member bytes
        # from an inconsistent chain instead of rejecting it (r4 review)
        if len(raw) != size:
            raise SevenZipError("7z BCJ size mismatch")
        out = _bcj_decode(cid, props, raw)
    else:
        raise SevenZipError(f"unsupported 7z coder {cid.hex()}")
    if len(out) != size:
        raise SevenZipError("7z folder decoded to wrong size")
    return out


def _decode_folder(folder: dict, pack: list[bytes]) -> bytes:
    coders = folder["coders"]
    if any(c["nin"] != 1 or c["nout"] != 1 for c in coders):
        raise SevenZipError("multi-stream coders (BCJ2) unsupported")
    # 1-in/1-out everywhere → input index i and output index i both
    # belong to coder i; resolve the chain from the final output down
    src: dict[int, tuple[str, int]] = {}
    for n, inidx in enumerate(folder["packed"]):
        src[inidx] = ("pack", n)
    for inidx, outidx in folder["bind_pairs"]:
        src[inidx] = ("coder", outidx)
    used = {o for _, o in folder["bind_pairs"]}
    finals = [i for i in range(len(coders)) if i not in used]
    if len(finals) != 1:
        raise SevenZipError("folder is not a single coder chain")

    def out_of(i: int, _depth: int = 0) -> bytes:
        if _depth > 16:
            raise SevenZipError("coder chain too deep")
        kind, idx = src.get(i, (None, 0))
        if kind == "pack":
            raw = pack[idx]
        elif kind == "coder":
            raw = out_of(idx, _depth + 1)
        else:
            raise SevenZipError("coder input unconnected")
        return _apply_coder(coders[i], raw, folder["unpack_sizes"][i])

    return out_of(finals[0])


# ---------------------------------------------------------------------------
# archive walk
# ---------------------------------------------------------------------------


def _parse_files_info(r: _R) -> tuple[list[str], list[bool], list[bool]]:
    num_files = r.num()
    if num_files > _MAX_FILES:
        raise SevenZipError("implausible file count")
    names: list[str] = []
    empty_stream = [False] * num_files
    empty_file: list[bool] = []
    anti: list[bool] = []
    while True:
        prop = r.num()
        if prop == _K_END:
            break
        size = r.num()
        end = r.p + size
        if prop == _K_EMPTY_STREAM:
            empty_stream = r.bitvector(num_files)
        elif prop == _K_EMPTY_FILE:
            empty_file = r.bitvector(sum(empty_stream))
        elif prop == _K_ANTI:
            anti = r.bitvector(sum(empty_stream))
        elif prop == _K_NAME:
            if r.byte():
                raise SevenZipError("external names unsupported")
            blob = r.bytes(size - 1)
            parts = blob.decode("utf-16-le", "replace").split("\x00")
            names = parts[:-1] if parts and parts[-1] == "" else parts
        else:
            r.bytes(size)  # kMTime / kAttributes / padding: skip
        if r.p > end:
            raise SevenZipError("FilesInfo property overran its size")
        r.p = end
    if len(names) != num_files:
        raise SevenZipError("name count mismatch")
    n_empty = sum(empty_stream)
    if not empty_file:
        empty_file = [False] * n_empty
    if not anti:
        anti = [False] * n_empty
    # per empty-stream entry: emptyFile → zero-byte file, else directory
    return names, empty_stream, [ef and not a for ef, a in zip(empty_file, anti)]


def _decode_streams(data: bytes, si: dict, max_member: int, max_total: int) -> list[bytes]:
    """streams-info → concatenated-folder substream payloads, caps
    enforced from the DECLARED sizes before any decompression."""
    total = sum(si["sizes"])
    if total > max_total or any(s > max_member for s in si["sizes"]):
        raise SevenZipError("7z declared sizes exceed caps")
    base = 32 + si["pack_pos"]
    offsets = [base]
    for s in si["pack_sizes"]:
        offsets.append(offsets[-1] + s)
    if offsets[-1] > len(data):
        raise SevenZipError("7z pack streams truncated")
    out: list[bytes] = []
    pack_idx = 0
    size_idx = 0
    for f, cnt in zip(si["folders"], si["counts"]):
        npack = len(f["packed"])
        # EVERY coder output in the chain counts, not just the folder's
        # final one: a crafted [LZMA out=50 GB → BCJ out=10 B] chain
        # would otherwise materialize the intermediate before any size
        # check fires (r4 review — the cap must hold BEFORE decompress)
        if any(s > max_total for s in f["unpack_sizes"]):
            raise SevenZipError("7z folder exceeds caps")
        pack = [
            data[offsets[pack_idx + j] : offsets[pack_idx + j + 1]] for j in range(npack)
        ]
        pack_idx += npack
        blob = _decode_folder(f, pack)
        pos = 0
        for _ in range(cnt):
            sz = si["sizes"][size_idx]
            part = blob[pos : pos + sz]
            crc = si["crcs"][size_idx] if size_idx < len(si["crcs"]) else None
            if crc is not None and zlib.crc32(part) != crc:
                raise SevenZipError("7z substream CRC mismatch")
            out.append(part)
            pos += sz
            size_idx += 1
    return out


def sevenzip_members(
    data: bytes,
    max_member: int = 1 << 28,
    max_total: int = 1 << 30,
) -> list[tuple[str, bytes]]:
    """archive bytes → ``[(member_path, payload), …]`` in header order.

    Directories are dropped, empty files kept (b""), backslash path
    separators normalized to "/".  Raises :class:`SevenZipError` on
    non-7z input, corruption, caps, or unsupported coders — callers
    (sources/explode.py) own the degrade policy.
    """
    if data[:6] != SEVENZIP_MAGIC or len(data) < 32:
        raise SevenZipError("not a 7z archive")
    nh_off = int.from_bytes(data[12:20], "little")
    nh_size = int.from_bytes(data[20:28], "little")
    if nh_size == 0 or 32 + nh_off + nh_size > len(data):
        raise SevenZipError("7z next-header out of range (truncated?)")
    if zlib.crc32(data[32 + nh_off : 32 + nh_off + nh_size]) != int.from_bytes(
        data[28:32], "little"
    ):
        raise SevenZipError("7z header CRC mismatch")
    r = _R(data[32 + nh_off : 32 + nh_off + nh_size])
    nid = r.num()
    if nid == _K_ENCODED_HEADER:
        si = _parse_streams_info(r)
        blobs = _decode_streams(data, si, max_member=max_total, max_total=max_total)
        r = _R(b"".join(blobs))
        nid = r.num()
    if nid != _K_HEADER:
        raise SevenZipError("missing 7z header")
    streams: list[bytes] = []
    names: list[str] = []
    empty_stream: list[bool] = []
    is_empty_file: list[bool] = []
    nid = r.num()
    if nid == _K_MAIN_STREAMS:
        si = _parse_streams_info(r)
        streams = _decode_streams(data, si, max_member, max_total)
        nid = r.num()
    if nid == _K_FILES_INFO:
        names, empty_stream, is_empty_file = _parse_files_info(r)
        nid = r.num()
    if nid != _K_END:
        raise SevenZipError("trailing garbage in 7z header")
    out: list[tuple[str, bytes]] = []
    sit = iter(streams)
    eit = iter(is_empty_file)
    for name, empty in zip(names, empty_stream):
        path = name.replace("\\", "/")
        if empty:
            if next(eit):
                out.append((path, b""))
            # else: directory (or anti-file) — no row
        else:
            try:
                out.append((path, next(sit)))
            except StopIteration:
                raise SevenZipError("fewer substreams than files") from None
    return out


# ---------------------------------------------------------------------------
# fixture writer — independent of the reader's walk (one deliberate
# shape per option) so round-trips are evidence, not tautology
# ---------------------------------------------------------------------------

_W_LZMA1_PROPS = bytes([(2 * 5 + 0) * 9 + 3]) + (1 << 16).to_bytes(4, "little")
_W_LZMA1_FILTER = [
    {"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2, "dict_size": 1 << 16}
]


def _wnum(v: int) -> bytes:
    """writer twin of :meth:`_R.num` — minimal single byte for small
    values, explicit 8-byte form otherwise (both legal)."""
    if v < 0x80:
        return bytes([v])
    return b"\xff" + v.to_bytes(8, "little")


def _wbits(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 0x80 >> (i & 7)
    return bytes(out)


def _w_lzma1(payload: bytes) -> bytes:
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=_W_LZMA1_FILTER)
    return c.compress(payload) + c.flush()


def _w_streams_info(
    pack_pos: int,
    pack_sizes: list[int],
    unpack_sizes: list[int],
    counts: list[int] | None,
    sub_sizes: list[int] | None,
    crcs: list[int] | None,
    coder_id: bytes = _CODER_LZMA1,
    props: bytes = _W_LZMA1_PROPS,
    chain: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """``chain`` (first-applied → last, e.g. ``[(LZMA1, props),
    (BCJ_X86, b"")]``) writes each folder as that coder chain with one
    bind pair per link — the shape 7-Zip emits for filtered streams.
    Every chained coder is size-preserving except the innermost, so
    all out-stream sizes equal the folder's unpack size."""
    if chain is None:
        chain = [(coder_id, props)]
    o = io.BytesIO()
    o.write(_wnum(_K_PACK_INFO))
    o.write(_wnum(pack_pos) + _wnum(len(pack_sizes)) + _wnum(_K_SIZE))
    for s in pack_sizes:
        o.write(_wnum(s))
    o.write(_wnum(_K_END))
    o.write(_wnum(_K_UNPACK_INFO) + _wnum(_K_FOLDER) + _wnum(len(unpack_sizes)))
    o.write(b"\x00")  # not external
    for _ in unpack_sizes:
        o.write(_wnum(len(chain)))
        for cid, cprops in chain:
            o.write(bytes([len(cid) | (0x20 if cprops else 0)]) + cid)
            if cprops:
                o.write(_wnum(len(cprops)) + cprops)
        for k in range(len(chain) - 1):
            # bind pair: coder k+1's input ← coder k's output
            o.write(_wnum(k + 1) + _wnum(k))
    o.write(_wnum(_K_UNPACK_SIZES))
    for s in unpack_sizes:
        for _ in chain:
            o.write(_wnum(s))
    o.write(_wnum(_K_END))
    if counts is not None or crcs is not None:
        o.write(_wnum(_K_SUBSTREAMS))
        if counts is not None:
            o.write(_wnum(_K_NUM_UNPACK_STREAM))
            for c in counts:
                o.write(_wnum(c))
            o.write(_wnum(_K_SIZE))  # first n-1 substream sizes per folder
            idx = 0
            for c in counts:
                for j in range(c - 1):
                    o.write(_wnum(sub_sizes[idx + j]))
                idx += c
        if crcs is not None:
            o.write(_wnum(_K_CRC) + b"\x01")  # all defined
            for d in crcs:
                o.write(d.to_bytes(4, "little"))
        o.write(_wnum(_K_END))
    o.write(_wnum(_K_END))
    return o.getvalue()


def build_7z(
    members: list[tuple[str, bytes]],
    solid: bool = False,
    encoded_header: bool = False,
    with_crc: bool = True,
    bcj: bytes | None = None,
) -> bytes:
    """deterministic 7z fixture: LZMA1 folders — one per non-empty
    member, or ONE solid folder holding all payloads (``solid=True``,
    exercising the substream walk); zero-byte members become
    empty-file entries.  ``encoded_header=True`` LZMA-compresses the
    header itself (the shape every real 7z writer emits by default).
    ``bcj`` (a _BCJ_CODERS id) adds that branch filter outside the
    LZMA1 coder — the folder shape 7-Zip emits for executables.
    """
    nonempty = [(n, d) for n, d in members if d]
    payloads = [d for _, d in nonempty]
    chain = None
    if bcj is not None:
        chain = [(_CODER_LZMA1, _W_LZMA1_PROPS), (bcj, b"")]

    def _pack(blob: bytes) -> bytes:
        # encode direction of the folder chain: the branch filter runs
        # over the WHOLE folder stream (position-dependent!), then LZMA1
        return _w_lzma1(bcj_encode(bcj, blob) if bcj is not None else blob)

    if solid and payloads:
        packs = [_pack(b"".join(payloads))]
        unpack_sizes = [sum(len(p) for p in payloads)]
        counts: list[int] | None = [len(payloads)]
        sub_sizes: list[int] | None = [len(p) for p in payloads]
    else:
        packs = [_pack(p) for p in payloads]
        unpack_sizes = [len(p) for p in payloads]
        counts = None
        sub_sizes = None
    crcs = [zlib.crc32(p) for p in payloads] if (with_crc and payloads) else None
    if crcs is not None and counts is None and payloads:
        # per-substream CRCs need a SubStreamsInfo block even when
        # every folder holds exactly one stream
        counts = [1] * len(payloads)
        sub_sizes = [len(p) for p in payloads]

    h = io.BytesIO()
    h.write(_wnum(_K_HEADER))
    if payloads:
        h.write(_wnum(_K_MAIN_STREAMS))
        h.write(
            _w_streams_info(
                0, [len(p) for p in packs], unpack_sizes, counts, sub_sizes,
                crcs, chain=chain,
            )
        )
    h.write(_wnum(_K_FILES_INFO) + _wnum(len(members)))
    empty_bits = [not d for _, d in members]
    if any(empty_bits):
        bs = _wbits(empty_bits)
        h.write(_wnum(_K_EMPTY_STREAM) + _wnum(len(bs)) + bs)
        fs = _wbits([True] * sum(empty_bits))  # all empties are files
        h.write(_wnum(_K_EMPTY_FILE) + _wnum(len(fs)) + fs)
    nameblob = b"".join((n + "\x00").encode("utf-16-le") for n, _ in members)
    h.write(_wnum(_K_NAME) + _wnum(len(nameblob) + 1) + b"\x00" + nameblob)
    h.write(_wnum(_K_END))
    h.write(_wnum(_K_END))
    header = h.getvalue()

    body = b"".join(packs)
    if encoded_header:
        hpack = _w_lzma1(header)
        enc = io.BytesIO()
        enc.write(_wnum(_K_ENCODED_HEADER))
        enc.write(
            _w_streams_info(len(body), [len(hpack)], [len(header)], None, None, None)
        )
        body += hpack
        header = enc.getvalue()

    sig = io.BytesIO()
    sig.write(SEVENZIP_MAGIC + b"\x00\x04")
    tail = (
        len(body).to_bytes(8, "little")
        + len(header).to_bytes(8, "little")
        + zlib.crc32(header).to_bytes(4, "little")
    )
    sig.write(zlib.crc32(tail).to_bytes(4, "little") + tail)
    return sig.getvalue() + body + header
