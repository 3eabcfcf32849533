"""Native decoders for legacy / extended zip compression methods.

Python's ``zipfile`` decodes methods 0/8/12/14 (stored, deflate,
bzip2, lzma) and raises ``NotImplementedError`` for everything else —
so a zip carrying Shrink, Implode, Deflate64, zstd or xz members
silently lost those children.  The reference indexes such archives
through Tika's Commons-Compress tier (enhance_zip.py:31-116 re-enters
the ETL per member; Commons Compress ``ZipArchiveInputStream`` decodes
Shrink/Implode/Deflate64 natively), so these are in-scope formats, not
curiosities: Deflate64 is what Windows "compressed folder" emits for
large members, Shrink/Implode are the PKZIP 1.x methods that vintage
archives carry.

Decoded here, all pure stdlib:

- **Shrink (method 1)** — dynamic LZW, 9→13-bit codes LSB-first; code
  256 escapes (×1 = explicit width bump, ×2 = partial clear of leaf
  entries).  Unlike ``.Z`` there is no group padding and no automatic
  width schedule: the encoder signals every change.
- **Implode (method 6)** — Shannon-Fano coded LZ77.  2 or 3 trees
  (general-purpose flag bit 2 = literal tree present, bit 1 = 8 KiB
  window) stored RLE at stream head; match = flag bit 0, distance low
  bits raw + high 6 bits via tree, length via tree (symbol 63 adds an
  8-bit extra); min match 3 with a literal tree, else 2.  The
  empirically-pinned subtlety: codes are the **bit-complement of
  deflate-canonical codes** (equivalently: canonical assignment with
  longest lengths first and symbols reversed within each length),
  read MSB-first — plain canonical codes decode to garbage.  This was
  determined against Info-ZIP unzip on non-monotonic-length trees,
  not guessed (the appnote's prose algorithm is easy to mis-read; a
  wrong assignment "successfully" decodes uniform-length trees).
- **Deflate64 (method 9)** — RFC-1951 inflate with three deltas:
  64 KiB window, length code 285 = base 3 + 16 extra bits (NOT the
  fixed 258 of deflate — the same bit pattern means different things
  in the two formats), distance codes 30/31 = bases 32769/49153 with
  14 extra bits.  The engine here is a full from-scratch inflate
  (stored/fixed/dynamic blocks) with a mode flag; standard mode is
  property-pinned against zlib, the 64-mode deltas against unzip.
- **zstd (93) / xz (95)** — modern additions (appnote 6.3.7+), via
  pyarrow's streaming codec and stdlib lzma with ``max_length`` caps.

NOT decoded, failing loudly (the PST-PERMUTE rule — do not guess):
Reduce (2-5; the in-container Info-ZIP build is COPYRIGHT_CLEAN and
cannot oracle it), PPMd (98), JPEG (96), WavPack (97), and anything
encrypted.  The caller skips such members and keeps their siblings.

Oracle methodology (the ``.Z``/gzip pattern): every decoder is pinned
against ``/usr/bin/unzip`` (Info-ZIP 6.0 — an independent decoder
lineage) on fixtures from OUR encoders, so an encoder/decoder
round-trip cannot mask a shared misconception; plus hand-assembled
spec-literal streams for the format-specific edges (tests/
test_zipcodecs.py).

These are cold-path, per-member decoders: they run only for members
zipfile cannot decode, inside the fused Arrow stage's existing byte
budget, and never touch the plan.  The inflate engine carries a
zlib-style 9-bit primary lookup table and a local-variable literal
hot loop (~3 MB/s literal-heavy, ~60 MB/s match-heavy — a 256 MB
Deflate64 member stays within one task's patience); implode's three
trees ride the same fast table; Shrink stays a simple LZW loop, its
members are historically small.
"""

from __future__ import annotations

__all__ = [
    "inflate_raw",
    "unshrink",
    "explode_implode",
    "decode_zip_member",
    "build_deflate64",
    "shrink_compress",
    "build_implode",
    "build_zip_raw",
]


# ---------------------------------------------------------------------------
# bit IO — LSB-first accumulator (PKZIP bit order for all three formats)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("d", "pos", "buf", "cnt")

    def __init__(self, d: bytes) -> None:
        self.d = d
        self.pos = 0  # next byte index
        self.buf = 0  # pending bits, LSB = next
        self.cnt = 0

    def read(self, n: int) -> int:
        while self.cnt < n:
            if self.pos >= len(self.d):
                raise ValueError("truncated bit stream")
            self.buf |= self.d[self.pos] << self.cnt
            self.pos += 1
            self.cnt += 8
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.cnt -= n
        return v

    def peek(self, n: int) -> int:
        """next ≤n stream bits zero-padded at EOF (fast-table probe);
        ``self.cnt`` afterwards tells how many really exist."""
        while self.cnt < n and self.pos < len(self.d):
            self.buf |= self.d[self.pos] << self.cnt
            self.pos += 1
            self.cnt += 8
        return self.buf & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.buf >>= n
        self.cnt -= n

    def align(self) -> None:
        drop = self.cnt & 7
        self.buf >>= drop
        self.cnt -= drop

    def raw(self, n: int) -> bytes:
        """n whole bytes after aligning (deflate stored blocks)."""
        self.align()
        start = self.pos - (self.cnt >> 3)
        if start + n > len(self.d):
            raise ValueError("truncated stored block")
        self.buf = 0
        self.cnt = 0
        self.pos = start + n
        return self.d[start : start + n]

    def bits_remaining(self) -> int:
        return self.cnt + 8 * (len(self.d) - self.pos)


class _BitW:
    """fixture-writer twin (LSB-first)."""

    __slots__ = ("buf", "bit")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.bit = 0

    def w(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.buf.append(0)
            if (v >> i) & 1:
                self.buf[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def code(self, c: int, n: int) -> None:
        """huffman/SF code: MSB of the code leaves first."""
        for i in range(n - 1, -1, -1):
            self.w((c >> i) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.buf)


def _copy_match(out: bytearray, dist: int, length: int) -> None:
    if dist > len(out):
        raise ValueError("match distance before stream start")
    start = len(out) - dist
    if dist >= length:
        out += out[start : start + length]
        return
    while length > 0:  # overlapping copy extends the window as it goes
        take = min(dist, length)
        out += out[start : start + take]
        start += take
        length -= take


# ---------------------------------------------------------------------------
# huffman / Shannon-Fano tables
# ---------------------------------------------------------------------------


def _canon_table(lengths: list[int], complement: bool = False) -> dict:
    """(nbits, code) → symbol for MSB-first accumulation reads.

    ``complement=False``: deflate canonical codes.  ``complement=True``:
    each code bit-inverted — the implode assignment (oracle-pinned, see
    module docstring)."""
    table: dict = {}
    nz = [l for l in lengths if l]
    if not nz:
        return table
    code = 0
    for ln in range(1, max(nz) + 1):
        for sym, l in enumerate(lengths):
            if l == ln:
                c = (~code) & ((1 << ln) - 1) if complement else code
                table[(ln, c)] = sym
                code += 1
        code <<= 1
    return table


def _read_sym(bits: _Bits, table: dict, maxlen: int = 16) -> int:
    code = 0
    for ln in range(1, maxlen + 1):
        code = (code << 1) | bits.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad prefix code")


_FAST_BITS = 9  # zlib-style primary lookup width


def _fast_table(slow: dict) -> list:
    """index = the next 9 STREAM-ORDER bits (bit i of the index is the
    i-th bit read) → (symbol, code length) for codes ≤ 9 bits; None
    falls back to the bit-by-bit walk.  Stream order is the BIT-REVERSE
    of the MSB-first code, so each code fills every index whose low
    ``len`` bits equal its reversal."""
    fast: list = [-1] * (1 << _FAST_BITS)
    for (ln, code), sym in slow.items():
        if ln <= _FAST_BITS:
            base = int(format(code, f"0{ln}b")[::-1], 2)
            entry = sym | (ln << 16)  # packed int beats a tuple in the hot loop
            for idx in range(base, 1 << _FAST_BITS, 1 << ln):
                fast[idx] = entry
    return fast


def _read_sym_fast(bits: _Bits, fast: list, slow: dict) -> int:
    e = fast[bits.peek(_FAST_BITS)]
    if e >= 0:
        ln = e >> 16
        if bits.cnt < ln:
            raise ValueError("truncated bit stream")
        bits.skip(ln)
        return e & 0xFFFF
    return _read_sym(bits, slow)


# ---------------------------------------------------------------------------
# inflate, with Deflate64 mode
# ---------------------------------------------------------------------------

_CL_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)
_LEN_BASE = (3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
             51, 59, 67, 83, 99, 115, 131, 163, 195, 227)
_LEN_EXTRA = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
              4, 4, 4, 4, 5, 5, 5, 5)
_DIST_BASE = (1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
              385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
              16385, 24577, 32769, 49153)
_DIST_EXTRA = (0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
               9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14)

_FIXED_LIT = _canon_table([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
_FIXED_DIST = _canon_table([5] * 32)
_FIXED_LIT_FAST = _fast_table(_FIXED_LIT)
_FIXED_DIST_FAST = _fast_table(_FIXED_DIST)


def inflate_raw(data: bytes, cap: int = 1 << 26, deflate64: bool = False) -> bytes:
    """raw-deflate(64) → bytes; raises ValueError on corrupt input or
    output past ``cap`` (charged before each extend — bomb-safe)."""
    bits = _Bits(data)
    out = bytearray()
    n_dist = 32 if deflate64 else 30
    while True:
        bfinal = bits.read(1)
        btype = bits.read(2)
        if btype == 3:
            raise ValueError("reserved deflate block type")
        if btype == 0:
            ln = int.from_bytes(bits.raw(2), "little")
            nln = int.from_bytes(bits.raw(2), "little")
            if ln ^ nln != 0xFFFF:
                raise ValueError("stored block LEN/NLEN mismatch")
            if len(out) + ln > cap:
                raise ValueError("inflate output over cap")
            out += bits.raw(ln)
        else:
            if btype == 1:
                lit_t, dist_t = _FIXED_LIT, _FIXED_DIST
                lit_f, dist_f = _FIXED_LIT_FAST, _FIXED_DIST_FAST
            else:
                hlit = bits.read(5) + 257
                hdist = bits.read(5) + 1
                hclen = bits.read(4) + 4
                cl_len = [0] * 19
                for i in range(hclen):
                    cl_len[_CL_ORDER[i]] = bits.read(3)
                cl_t = _canon_table(cl_len)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    s = _read_sym(bits, cl_t, 7)
                    if s < 16:
                        lens.append(s)
                    elif s == 16:
                        if not lens:
                            raise ValueError("repeat with no prior length")
                        lens += [lens[-1]] * (3 + bits.read(2))
                    elif s == 17:
                        lens += [0] * (3 + bits.read(3))
                    else:
                        lens += [0] * (11 + bits.read(7))
                if len(lens) != hlit + hdist:
                    raise ValueError("code length overrun")
                lit_t = _canon_table(lens[:hlit])
                dist_t = _canon_table(lens[hlit:])
                lit_f = _fast_table(lit_t)
                dist_f = _fast_table(dist_t)
            # literal hot loop runs on local-variable bit state (method
            # calls per symbol are the pure-Python bottleneck); the
            # match path and long->9-bit codes sync back to the reader
            d = bits.d
            nd = len(d)
            pos, buf, cnt = bits.pos, bits.buf, bits.cnt
            out_append = out.append
            while True:
                if cnt < 16:
                    while cnt < 48 and pos < nd:
                        buf |= d[pos] << cnt
                        pos += 1
                        cnt += 8
                e = lit_f[buf & 511]
                if e >= 0:
                    ln = e >> 16
                    if ln > cnt:
                        raise ValueError("truncated bit stream")
                    buf >>= ln
                    cnt -= ln
                    sym = e & 0xFFFF
                else:
                    bits.pos, bits.buf, bits.cnt = pos, buf, cnt
                    sym = _read_sym(bits, lit_t)
                    pos, buf, cnt = bits.pos, bits.buf, bits.cnt
                if sym < 256:
                    if len(out) >= cap:
                        raise ValueError("inflate output over cap")
                    out_append(sym)
                    continue
                bits.pos, bits.buf, bits.cnt = pos, buf, cnt
                if sym == 256:
                    break
                li = sym - 257
                if li > 28:
                    raise ValueError("bad length symbol")
                if li == 28:  # code 285: deflate=258 fixed, 64-mode=3+16bits
                    length = 3 + bits.read(16) if deflate64 else 258
                else:
                    length = _LEN_BASE[li] + bits.read(_LEN_EXTRA[li])
                ds = _read_sym_fast(bits, dist_f, dist_t)
                if ds >= n_dist:
                    raise ValueError("bad distance symbol")
                dist = _DIST_BASE[ds] + bits.read(_DIST_EXTRA[ds])
                if len(out) + length > cap:
                    raise ValueError("inflate output over cap")
                _copy_match(out, dist, length)
                pos, buf, cnt = bits.pos, bits.buf, bits.cnt
        if bfinal:
            return bytes(out)


# ---------------------------------------------------------------------------
# Shrink (method 1)
# ---------------------------------------------------------------------------

_SHRINK_TABLE = 1 << 13  # 13-bit max code width
_SHRINK_FIRST = 257  # 256 is the escape


def _shrink_partial_clear(parent: list, in_use: list) -> list[int]:
    """free every in-use entry that no other entry uses as a prefix
    (identical on both sides — the encoder mirrors this exactly)."""
    referenced = set()
    for i in range(_SHRINK_FIRST, _SHRINK_TABLE):
        if in_use[i]:
            referenced.add(parent[i])
    freed = []
    for i in range(_SHRINK_FIRST, _SHRINK_TABLE):
        if in_use[i] and i not in referenced:
            in_use[i] = False
            freed.append(i)
    return freed


def unshrink(data: bytes, out_size: int, cap: int = 1 << 26) -> bytes:
    """decode a Shrink stream to exactly ``out_size`` bytes (the format
    has no end marker — the zip header's uncompressed size bounds it,
    like Info-ZIP's ucsize loop)."""
    if out_size > cap:
        raise ValueError("declared size over cap")
    bits = _Bits(data)
    parent = [0] * _SHRINK_TABLE
    suffix = [0] * _SHRINK_TABLE
    in_use = [False] * _SHRINK_TABLE
    width = 9
    next_scan = _SHRINK_FIRST
    out = bytearray()
    prev = None

    def strand(code: int) -> bytes:
        s = bytearray()
        while code >= _SHRINK_FIRST:
            s.append(suffix[code])
            code = parent[code]
            if len(s) > _SHRINK_TABLE:
                raise ValueError("shrink prefix cycle")
        s.append(code)
        s.reverse()
        return bytes(s)

    while len(out) < out_size and bits.bits_remaining() >= width:
        code = bits.read(width)
        if code == 256:
            ctrl = bits.read(width)
            if ctrl == 1:
                if width >= 13:
                    raise ValueError("shrink width past 13 bits")
                width += 1
            elif ctrl == 2:
                _shrink_partial_clear(parent, in_use)
                next_scan = _SHRINK_FIRST
            else:
                raise ValueError("bad shrink escape code")
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("first shrink code not a literal")
            out.append(code)
            prev = code
            continue
        i = next_scan  # next slot the pending add will take
        while i < _SHRINK_TABLE and in_use[i]:
            i += 1
        pending = i if i < _SHRINK_TABLE else None
        if code >= _SHRINK_FIRST and not in_use[code]:
            if pending is None or code != pending:
                raise ValueError("shrink code refers to a free entry")
            s = strand(prev)  # KwKwK: string = prev + prev[0]
            s = s + s[:1]
        else:
            s = strand(code)
        if len(out) + len(s) > out_size:
            s = s[: out_size - len(out)]  # header size governs, CRC decides
        out += s
        if pending is not None:
            parent[pending] = prev
            suffix[pending] = s[0]
            in_use[pending] = True
            next_scan = pending + 1
        prev = code
    if len(out) != out_size:
        raise ValueError("shrink stream short of declared size")
    return bytes(out)


def shrink_compress(data: bytes) -> bytes:
    """fixture-writer twin: greedy LZW mirroring the decoder's slot
    allocation, explicit width bumps, partial clear when full."""
    bw = _BitW()
    parent = [0] * _SHRINK_TABLE
    suffix = [0] * _SHRINK_TABLE
    in_use = [False] * _SHRINK_TABLE
    dic: dict = {}
    width = 9
    next_scan = _SHRINK_FIRST

    def alloc() -> int | None:
        nonlocal next_scan
        i = next_scan
        while i < _SHRINK_TABLE and in_use[i]:
            i += 1
        if i >= _SHRINK_TABLE:
            return None
        next_scan = i + 1
        return i

    def emit(code: int) -> None:
        nonlocal width
        while code >= (1 << width):
            bw.w(256, width)
            bw.w(1, width)
            width += 1
        bw.w(code, width)

    if not data:
        return b""
    w = data[0]
    for c in data[1:]:
        nxt = dic.get((w, c))
        if nxt is not None:
            w = nxt
            continue
        emit(w)
        slot = alloc()
        if slot is None:
            bw.w(256, width)
            bw.w(2, width)
            for i in _shrink_partial_clear(parent, in_use):
                dic.pop((parent[i], suffix[i]), None)
            next_scan = _SHRINK_FIRST
            slot = alloc()
        if slot is not None:
            parent[slot] = w
            suffix[slot] = c
            in_use[slot] = True
            dic[(w, c)] = slot
        w = c
    emit(w)
    return bw.bytes()


# ---------------------------------------------------------------------------
# Implode (method 6)
# ---------------------------------------------------------------------------


def _read_sf_tree(data: bytes, pos: int, n_syms: int) -> tuple[dict, int]:
    """appnote RLE: first byte = entry count − 1, each entry byte low
    nibble = bit length − 1, high nibble = run − 1.  Returns the
    complement-canonical decode table + next offset."""
    if pos >= len(data):
        raise ValueError("truncated implode tree")
    n = data[pos] + 1
    pos += 1
    if pos + n > len(data):
        raise ValueError("truncated implode tree")
    lengths: list[int] = []
    for b in data[pos : pos + n]:
        lengths += [(b & 0x0F) + 1] * ((b >> 4) + 1)
    pos += n
    if len(lengths) != n_syms:
        raise ValueError("implode tree symbol count mismatch")
    if abs(sum(2.0 ** -l for l in lengths) - 1.0) > 1e-9:
        raise ValueError("implode tree not complete")
    return _canon_table(lengths, complement=True), pos


def explode_implode(
    data: bytes, out_size: int, flags: int, cap: int = 1 << 26
) -> bytes:
    """decode an Imploded member.  ``flags`` = the zip entry's
    general-purpose bits: 0x02 = 8 KiB window (7 raw low distance
    bits), 0x04 = literal tree present (min match 3, else 2)."""
    if out_size > cap:
        raise ValueError("declared size over cap")
    has_lit = bool(flags & 4)
    low_bits = 7 if flags & 2 else 6
    minmatch = 3 if has_lit else 2
    pos = 0
    lit_t: dict | None = None
    lit_f: list | None = None
    if has_lit:
        lit_t, pos = _read_sf_tree(data, pos, 256)
        lit_f = _fast_table(lit_t)
    len_t, pos = _read_sf_tree(data, pos, 64)
    dist_t, pos = _read_sf_tree(data, pos, 64)
    len_f = _fast_table(len_t)
    dist_f = _fast_table(dist_t)
    bits = _Bits(data[pos:])
    out = bytearray()
    while len(out) < out_size:
        if bits.read(1):
            out.append(
                _read_sym_fast(bits, lit_f, lit_t) if has_lit else bits.read(8)
            )
            continue
        dlow = bits.read(low_bits)
        dist = ((_read_sym_fast(bits, dist_f, dist_t) << low_bits) | dlow) + 1
        lsym = _read_sym_fast(bits, len_f, len_t)
        length = lsym + minmatch + (bits.read(8) if lsym == 63 else 0)
        if len(out) + length > out_size:
            length = out_size - len(out)  # size governs; CRC decides
        _copy_match(out, dist, length)
    return bytes(out)


def build_implode(ops: list, flags: int) -> bytes:
    """fixture-writer twin over explicit ops: ``('lit', byte)`` /
    ``('match', length, dist)``.  Uses mixed-length static trees so the
    complement-canonical assignment stays exercised (uniform trees
    cannot distinguish it from three other wrong schemes)."""
    has_lit = bool(flags & 4)
    low_bits = 7 if flags & 2 else 6
    minmatch = 3 if has_lit else 2
    lit_lengths = [7] * 48 + [8] * 112 + [9] * 96
    len_lengths = [7] * 16 + [6] * 40 + [5] * 8
    dist_lengths = [5] * 8 + [6] * 40 + [7] * 16

    def pack_tree(lengths: list[int]) -> bytes:
        runs = []
        i = 0
        while i < len(lengths):
            j = i
            while j < len(lengths) and lengths[j] == lengths[i] and j - i < 16:
                j += 1
            runs.append((lengths[i], j - i))
            i = j
        out = bytearray([len(runs) - 1])
        for ln, cnt in runs:
            out.append((ln - 1) | ((cnt - 1) << 4))
        return bytes(out)

    def enc_map(lengths: list[int]) -> dict:
        return {s: (c, n) for (n, c), s in _canon_table(lengths, True).items()}

    head = bytearray()
    if has_lit:
        head += pack_tree(lit_lengths)
    head += pack_tree(len_lengths)
    head += pack_tree(dist_lengths)
    lite = enc_map(lit_lengths)
    lene = enc_map(len_lengths)
    diste = enc_map(dist_lengths)
    bw = _BitW()
    for op in ops:
        if op[0] == "lit":
            bw.w(1, 1)
            if has_lit:
                bw.code(*lite[op[1]])
            else:
                bw.w(op[1], 8)
        else:
            _, length, dist = op
            bw.w(0, 1)
            d = dist - 1
            bw.w(d & ((1 << low_bits) - 1), low_bits)
            bw.code(*diste[d >> low_bits])
            lsym = length - minmatch
            extra = None
            if lsym >= 63:
                extra, lsym = lsym - 63, 63
            bw.code(*lene[lsym])
            if extra is not None:
                bw.w(extra, 8)
    return bytes(head) + bw.bytes()


# ---------------------------------------------------------------------------
# Deflate64 fixture writer (fixed-Huffman blocks over explicit ops)
# ---------------------------------------------------------------------------


def _fixed_lit_code(sym: int) -> tuple[int, int]:
    if sym <= 143:
        return 0x30 + sym, 8
    if sym <= 255:
        return 0x190 + sym - 144, 9
    if sym <= 279:
        return sym - 256, 7
    return 0xC0 + sym - 280, 8


def build_deflate64(ops: list) -> bytes:
    """one final fixed-Huffman Deflate64 block over ``('lit', bytes)`` /
    ``('match', length, dist)`` ops.  All matches ride code 285 (3 +
    16 extra bits) so the 64-mode length path is always exercised;
    distances may use codes 30/31 (> 32 KiB)."""
    bw = _BitW()
    bw.w(1, 1)  # BFINAL
    bw.w(1, 2)  # fixed trees
    for op in ops:
        if op[0] == "lit":
            for b in op[1]:
                bw.code(*_fixed_lit_code(b))
        else:
            _, length, dist = op
            if not 3 <= length <= 3 + 0xFFFF:
                raise ValueError("deflate64 match length out of range")
            bw.code(*_fixed_lit_code(285))
            bw.w(length - 3, 16)
            ds = 31
            while _DIST_BASE[ds] > dist:
                ds -= 1
            bw.code(ds, 5)
            bw.w(dist - _DIST_BASE[ds], _DIST_EXTRA[ds])
    bw.code(*_fixed_lit_code(256))
    return bw.bytes()


def build_zip_raw(members: list[tuple[str, int, int, bytes, bytes]]) -> bytes:
    """raw zip writer for methods ``zipfile`` cannot write:
    ``(name, method, flags, comp_bytes, plain_bytes)`` per member.
    Deterministic (zeroed DOS timestamps) — fixture use only."""
    import struct
    import zlib

    out = bytearray()
    cd = bytearray()
    for name, method, flags, comp, plain in members:
        nm = name.encode()
        crc = zlib.crc32(plain)
        off = len(out)
        out += struct.pack(
            "<IHHHHHIIIHH", 0x04034B50, 20, flags, method, 0, 0,
            crc, len(comp), len(plain), len(nm), 0,
        ) + nm + comp
        cd += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, flags, method, 0, 0,
            crc, len(comp), len(plain), len(nm), 0, 0, 0, 0, 0, off,
        ) + nm
    out += cd
    out += struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, len(members), len(members),
        len(cd), len(out) - len(cd), 0,
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

#: methods we can decode beyond zipfile's set
NATIVE_ZIP_METHODS = frozenset({1, 6, 9, 93, 95})


def decode_zip_member(
    method: int,
    flags: int,
    comp: bytes,
    out_size: int,
    cap: int = 1 << 26,
) -> bytes:
    """decompress one zip member body by method id.  Raises
    ``NotImplementedError`` for methods with no safe decoder (Reduce
    2-5, PPMd 98, JPEG 96, WavPack 97 — fail loudly, never guess) and
    ``ValueError`` on corrupt input; the caller CRC-checks the result
    against the central directory before trusting it."""
    if method == 1:
        return unshrink(comp, out_size, cap)
    if method == 6:
        return explode_implode(comp, out_size, flags, cap)
    if method == 9:
        return inflate_raw(comp, min(cap, out_size), deflate64=True)
    if method == 93:
        from open_semantic_etl_spark.operators.htmlx import (
            arrow_stream_decompress,
        )

        return arrow_stream_decompress(comp, "zstd", min(cap, out_size))
    if method == 95:
        import lzma

        obj = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
        # max_length is the CAP (round-4m rule: decompress()'s bufsize
        # hint is NOT a bound; LZMADecompressor.max_length is)
        out = obj.decompress(comp, max_length=min(cap, out_size) + 1)
        if len(out) > min(cap, out_size):
            raise ValueError("xz member over declared size")
        return out
    raise NotImplementedError(f"zip compression method {method}")
