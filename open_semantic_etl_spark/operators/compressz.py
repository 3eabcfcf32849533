"""UNIX ``compress`` (.Z) codec — transparent-decompression tier.

The reference indexes ``.Z`` payloads through Tika's CompressorParser
(Commons Compress ``ZCompressorInputStream``), the same transparent
single-member path as gzip/bzip2/xz: a ``page.html.Z`` indexes as its
inner html (enhance_extract_text_tika_server.py:33-262 hands bytes to
AutoDetectParser, which unwraps compressor streams first).  Python's
stdlib has no LZW codec, so this is a from-scratch implementation of
the ncompress stream format:

- header ``1F 9D`` + flag byte (low 5 bits = maxbits 9..16, bit 7 =
  block mode with code 256 = CLEAR; bits 5-6 reserved, must be 0);
- LZW codes packed LSB-first, starting at 9 bits;
- the width-bump/CLEAR synchronization is the subtle part.  The
  decoder's table add for the encoder's add *k* happens one code
  later (while processing code *k+1*), so BOTH sides decide "bump
  before code *k+1*" from the one-add-lagged count: the encoder
  checks ``free_ent > maxcode`` right after WRITING a code but
  before its table add; the decoder checks before READING, after the
  previous code's add.  After CLEAR the decoder's first generic-path
  add lands on the dead slot 256 (never looked up — 256 always means
  CLEAR), which restores the same lag;
- the infamous group-alignment quirk: the compressor flushes output
  in groups of 8 codes, so on every width change (and on CLEAR) the
  bit position advances to the next multiple of ``old_width * 8``
  bits RELATIVE to the previous change point (ncompress rebases its
  buffer at each change — window-relative, not absolute; the r4
  review caught the absolute variant desyncing on real files);
- a maxbits-9 stream still grows to 10-bit codes when its capped
  table fills: the reference init skips the ``n_bits == maxbits``
  maxcode special case.

``lzw_z_compress`` exists to build deterministic fixtures (no
``compress`` binary in the container); both directions are pinned
against ``gzip -dc`` — gzip carries the ncompress decoder — plus
hand-assembled spec-literal streams, so an encoder/decoder round-trip
cannot mask a shared off-by-one (the ADVICE r3 LZW lesson).
"""

from __future__ import annotations

Z_MAGIC = b"\x1f\x9d"
_INIT_BITS = 9
_CLEAR = 256


def _maxcode(nbits: int, maxbits: int) -> int:
    """last free-entry count readable without a width bump AFTER a
    width change (ncompress/gzip: ``maxcode = n_bits == maxbits ?
    maxmaxcode : MAXCODE(n_bits)-1``).  The INITIAL/post-CLEAR value
    is unconditionally ``(1<<9)-1`` — the reference code skips this
    special case at init, so a maxbits-9 stream still grows to 10-bit
    codes once the (capped) table fills (gzip -d verified)."""
    return (1 << nbits) if nbits == maxbits else (1 << nbits) - 1


def _group_skip(posbits: int, mark: int, width: int) -> int:
    """ncompress boundary rule: pad the bit position to the next
    multiple of ``width * 8`` bits RELATIVE to ``mark`` (the position
    of the previous width change / CLEAR / stream start — ncompress
    rebases its input buffer at every change, so alignment is
    window-relative, NOT absolute; gzip -d, which carries the
    ncompress decoder, rejects absolutely-aligned streams — r4 review
    finding, verified against /usr/bin/gzip)."""
    g = width << 3
    return posbits + (-(posbits - mark) % g)


def unlzw(data: bytes, cap: int = 1 << 26) -> bytes:
    """decode a .Z stream; raises ValueError on corrupt input or when
    the output would exceed ``cap`` (bomb guard — checked BEFORE
    growing, never after).  A stream ending mid-code is end-of-data,
    not an error (compress(1) cannot distinguish either)."""
    if data[:2] != Z_MAGIC:
        raise ValueError("not a compress(1) stream")
    if len(data) < 3:
        raise ValueError("truncated .Z header")
    flags = data[2]
    if flags & 0x60:
        raise ValueError("reserved .Z flag bits set")
    maxbits = flags & 0x1F
    block = bool(flags & 0x80)
    if not 9 <= maxbits <= 16:
        raise ValueError("bad maxbits %d" % maxbits)
    if len(data) == 3:
        return b""

    nbits = _INIT_BITS
    maxcode = (1 << _INIT_BITS) - 1  # init skips the maxbits case (see _maxcode)
    free_ent = _CLEAR + 1 if block else _CLEAR
    prefix = [0] * (1 << maxbits)
    suffix = bytearray(1 << maxbits)
    total_bits = len(data) << 3
    posbits = 3 << 3
    mark = posbits  # origin of the current width window
    oldcode = -1
    finchar = 0
    out = bytearray()

    while posbits + nbits <= total_bits:
        if free_ent > maxcode:
            # width bump consumes the group padding at the OLD width
            posbits = _group_skip(posbits, mark, nbits)
            mark = posbits
            nbits += 1
            maxcode = _maxcode(nbits, maxbits)
            continue
        byte_at = posbits >> 3
        chunk = int.from_bytes(data[byte_at : byte_at + 3], "little")
        code = (chunk >> (posbits & 7)) & ((1 << nbits) - 1)
        posbits += nbits

        if oldcode == -1:
            if code >= 256:
                raise ValueError("first .Z code must be a literal")
            oldcode = finchar = code
            if len(out) >= cap:
                raise ValueError("output over cap")
            out.append(code)
            continue
        if code == _CLEAR and block:
            posbits = _group_skip(posbits, mark, nbits)
            mark = posbits
            free_ent = _CLEAR  # next add = dead slot 256 (never read)
            nbits = _INIT_BITS
            maxcode = (1 << _INIT_BITS) - 1
            continue  # oldcode kept — ncompress does not reset it

        incode = code
        stack = bytearray()
        if code >= free_ent:  # KwKwK
            if code > free_ent:
                raise ValueError("corrupt .Z stream (code > free_ent)")
            stack.append(finchar)
            code = oldcode
        while code >= 256:
            stack.append(suffix[code])
            code = prefix[code]
        finchar = code
        stack.append(code)
        if len(out) + len(stack) > cap:
            raise ValueError("output over cap")
        out.extend(reversed(stack))
        if free_ent < (1 << maxbits):
            prefix[free_ent] = oldcode
            suffix[free_ent] = finchar
            free_ent += 1
        oldcode = incode
    return bytes(out)


class _BitWriter:
    """LSB-first code packer over absolute bit positions (the 3-byte
    header occupies bits 0..23, exactly as compress(1) counts them)."""

    def __init__(self) -> None:
        self.buf = bytearray(3)  # header placeholder
        self.posbits = 3 << 3
        self.mark = self.posbits  # origin of the current width window

    def put(self, code: int, width: int) -> None:
        need = (self.posbits + width + 7) >> 3
        if need > len(self.buf):
            self.buf.extend(b"\x00" * (need - len(self.buf)))
        byte_at = self.posbits >> 3
        span = len(self.buf) - byte_at
        chunk = int.from_bytes(self.buf[byte_at : byte_at + 3], "little")
        chunk |= code << (self.posbits & 7)
        self.buf[byte_at : byte_at + min(3, span)] = chunk.to_bytes(3, "little")[
            : min(3, span)
        ]
        self.posbits += width

    def pad_group(self, width: int) -> None:
        self.posbits = _group_skip(self.posbits, self.mark, width)
        self.mark = self.posbits
        need = (self.posbits + 7) >> 3
        if need > len(self.buf):
            self.buf.extend(b"\x00" * (need - len(self.buf)))


def lzw_z_compress(data: bytes, maxbits: int = 16, block: bool = True) -> bytes:
    """fixture writer: ncompress-shaped .Z stream (greedy LZW; real
    compress(1) additionally CLEARs on ratio decay, which a fixture
    cannot reproduce stably — :func:`_compress_with_clears` exercises
    that decoder path deterministically instead)."""
    return _compress_with_clears(data, maxbits, block, clear_every=0)


def _compress_with_clears(
    data: bytes, maxbits: int = 16, block: bool = True, clear_every: int = 0
) -> bytes:
    """like :func:`lzw_z_compress` but emits a CLEAR after every
    ``clear_every`` table adds (0 = never)."""
    if not 9 <= maxbits <= 16:
        raise ValueError("bad maxbits")
    hdr = Z_MAGIC + bytes([maxbits | (0x80 if block else 0)])
    if not data:
        return hdr
    w = _BitWriter()
    nbits = _INIT_BITS
    maxcode = (1 << _INIT_BITS) - 1  # init skips the maxbits case (see _maxcode)
    table: dict[tuple[int, int], int] = {}
    free_ent = _CLEAR + 1 if block else _CLEAR
    adds = 0
    ent = data[0]
    for c in data[1:]:
        key = (ent, c)
        if key in table:
            ent = table[key]
            continue
        w.put(ent, nbits)
        # bump check runs on the PRE-add count (see module docstring)
        if free_ent > maxcode:
            w.pad_group(nbits)
            nbits += 1
            maxcode = _maxcode(nbits, maxbits)
        if block and clear_every and adds >= clear_every:
            w.put(_CLEAR, nbits)
            w.pad_group(nbits)
            table.clear()
            free_ent = _CLEAR + 1
            nbits = _INIT_BITS
            maxcode = (1 << _INIT_BITS) - 1
            adds = 0
        elif free_ent < (1 << maxbits):
            table[key] = free_ent
            free_ent += 1
            adds += 1
        ent = c
    w.put(ent, nbits)
    nbytes = (w.posbits + 7) >> 3
    return hdr + bytes(w.buf[3:nbytes])
