"""Minimal PDF text-layer writer/parser (pure stdlib, deterministic).

Replaces the reference's subprocess calls to ``pdfinfo`` / ``pdftotext``
(enhance_pdf_page.py:62-98) and Tika's PDF path
(enhance_extract_text_tika_server.py:139-143) for text-layer PDFs:
(optionally Flate-compressed) content streams using ``Tj`` / ``TJ`` /
``'`` text-show operators, classic xref tables OR cross-reference
streams, compressed object streams (``/Type /ObjStm`` — the post-2005
default), page objects serialized out of file order (page text and
image numbering follow the /Pages /Kids tree), and Type0/CID composite
fonts (Identity-H 2-byte hex shows decoded through the /ToUnicode CMap,
with per-stream Tf font tracking), and RC4-encrypted files (standard
security handler V1/V2 R2/R3, empty user password — transparently
decrypted, in classic AND modern layouts: ObjStm payloads carry their
packed objects' string protection, XRef streams stay plaintext per
PDF 32000-1 §7.5.8.2). Stream filters: Flate, LZW,
ASCIIHex, ASCII85, RunLength, chained ``/Filter`` arrays (image-codec
filters pass their payload through — decoding them is the image
tier's job).
Still out of scope — ``ok=False`` with an error message
instead of wrong text: Type0 text WITHOUT a usable ToUnicode CMap,
AES/R4+ encryption, non-empty passwords, CCITT decode; the pipeline
records these in the per-row error column, mirroring the reference's
error capture (etl.py:214-220).

The writer exists so tests and the synthetic pages generator can embed
genuine PDF bytes; the parser never peeks at writer internals beyond
the public PDF syntax.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# Writer — tiny but valid single-font PDF, one content stream per page.
# ---------------------------------------------------------------------------


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(
    pages: list[str],
    title: str | None = None,
    author: str | None = None,
    n_images: int = 0,
    compress: bool = True,
    images: list[bytes] | None = None,
    modern: bool = False,
    reverse_page_objects: bool = False,
    type0: bool = False,
    encrypt: str | None = None,
    content_filters: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize page texts into a minimal valid PDF.

    Each page's text is emitted line-by-line as ``(line) Tj`` show ops.
    ``n_images`` > 0 embeds that many 1x1 image XObjects so the
    needs-OCR predicate (enhance_pdf_ocr.py:130-155 analogue) has
    something to detect; ``images`` supplies explicit image payload
    bytes instead — a flat list (each referenced from every page) or a
    list-of-lists with one image set per page.

    ``modern=True`` emits the post-2005 layout: every dict-only object
    (pages, page tree, catalog, info, font) packs into a Flate-compressed
    /Type /ObjStm, and the file ends with a cross-reference STREAM
    (/Type /XRef, W [1 4 2], type-2 entries for the packed objects) —
    no classic ``xref`` table or ``trailer`` keyword at all.
    ``reverse_page_objects=True`` serializes the page objects in
    REVERSED file order (object numbers and /Kids unchanged) — the
    out-of-order case the page-tree walk must handle.
    ``type0=True`` emits a composite Type0/CIDFontType2 font with
    /Encoding /Identity-H and a /ToUnicode CMap: page text is shown as
    2-byte-CID HEX strings (``<…> Tj``, CID = the char's BMP code
    point) — the layout real-world CJK/unicode PDFs use, so the parser
    must decode through the CMap rather than the literal-string path.
    """
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

    if type0:
        used = sorted({ch for t in pages for ch in t.replace("\n", "")})
        if any(ord(c) > 0xFFFF for c in used):
            raise ValueError("type0 fixture writer covers BMP code points only")
        bf_lines = []
        for i in range(0, len(used), 100):  # ≤100 pairs per bfchar block
            chunk = used[i : i + 100]
            bf_lines.append(b"%d beginbfchar" % len(chunk))
            bf_lines += [
                b"<%04X> <%04X>" % (ord(c), ord(c)) for c in chunk
            ]
            bf_lines.append(b"endbfchar")
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            b"/CMapName /SparkGraft-UCS def\n/CMapType 2 def\n"
            b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            + b"\n".join(bf_lines)
            + b"\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
        )
        tounicode_num = add(
            b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
        )
        desc_num = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SparkGraftCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        font_num = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SparkGraftCID "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] /ToUnicode %d 0 R >>"
            % (desc_num, tounicode_num)
        )
    else:
        font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    def add_image(img_data: bytes) -> int:
        return add(
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
            + str(len(img_data)).encode()
            + b" >>\nstream\n"
            + img_data
            + b"\nendstream"
        )

    per_page = (
        images is not None
        and len(images) > 0
        and isinstance(images[0], (list, tuple))
    )
    if per_page:
        page_img_nums = [[add_image(d) for d in page_imgs] for page_imgs in images]
        img_nums: list[int] = []
    else:
        payloads = images if images is not None else [b"\x00"] * n_images
        img_nums = [add_image(d) for d in payloads]
        page_img_nums = [img_nums for _ in pages]

    page_nums: list[int] = []
    content_nums: list[int] = []
    for pg, text in enumerate(pages):
        lines = text.split("\n")
        ops = [b"BT /F1 12 Tf 72 720 Td 14 TL"]
        for j, line in enumerate(lines):
            if j:
                ops.append(b"T*")
            if type0:
                hexs = "".join(f"{ord(c):04X}" for c in line).encode("ascii")
                ops.append(b"<" + hexs + b"> Tj")
            else:
                ops.append(b"(" + _esc(line).encode("latin-1", "replace") + b") Tj")
        for img in page_img_nums[pg]:
            ops.append(b"q 1 0 0 1 0 0 cm /Im%d Do Q" % img)
        ops.append(b"ET")
        stream = b"\n".join(ops)
        flags = b""
        if content_filters:
            # /Filter array names are in DECODE order, so encoding
            # applies them last-to-first
            import base64
            import binascii

            for fname in reversed(content_filters):
                if fname == "FlateDecode":
                    stream = zlib.compress(stream)
                elif fname == "ASCIIHexDecode":
                    stream = binascii.hexlify(stream).upper() + b">"
                elif fname == "ASCII85Decode":
                    stream = base64.a85encode(stream) + b"~>"
                elif fname == "RunLengthDecode":
                    enc = bytearray()
                    for i in range(0, len(stream), 128):
                        chunk = stream[i : i + 128]
                        enc += bytes([len(chunk) - 1]) + chunk
                    enc.append(128)  # EOD
                    stream = bytes(enc)
                elif fname == "LZWDecode":
                    stream = _lzw_encode(stream)
                else:
                    raise ValueError(f"unknown content filter {fname!r}")
            names = b" ".join(b"/" + f.encode() for f in content_filters)
            flags = (
                b"/Filter [" + names + b"] " if len(content_filters) > 1
                else b"/Filter " + names + b" "
            )
        elif compress:
            stream = zlib.compress(stream)
            flags = b"/Filter /FlateDecode "
        content_nums.append(
            add(
                b"<< "
                + flags
                + b"/Length "
                + str(len(stream)).encode()
                + b" >>\nstream\n"
                + stream
                + b"\nendstream"
            )
        )
        page_nums.append(0)  # placeholder, patched below

    pages_root = len(objects) + len(pages) + 1  # after page objects
    for i, cnum in enumerate(content_nums):
        xobj = b""
        if page_img_nums[i]:
            xobj = b" /XObject << " + b" ".join(
                b"/Im%d %d 0 R" % (n, n) for n in page_img_nums[i]
            ) + b" >>"
        page_nums[i] = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >>%s >> /Contents %d 0 R >>"
            % (pages_root, font_num, xobj, cnum)
        )
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    root_num = add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % len(pages)
    )
    assert root_num == pages_root
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_root)
    info_parts = []
    if title is not None:
        info_parts.append(b"/Title (" + _esc(title).encode("latin-1", "replace") + b")")
    if author is not None:
        info_parts.append(b"/Author (" + _esc(author).encode("latin-1", "replace") + b")")
    info = add(b"<< " + b" ".join(info_parts) + b" >>") if info_parts else None

    # standard-security-handler encryption (fixture knob): "rc4-40" =
    # V1/R2, "rc4-128" = V2/R3; empty user + owner passwords. Classic
    # layout RC4s streams and dict strings per object; modern layout
    # follows the PDF 1.5 rules — stream payloads per object, strings
    # of ObjStm-packed dicts ride the ObjStm's OWN encryption (applied
    # at emission below), the XRef stream never encrypted.
    enc_num = None
    id0 = None
    enc_key = None
    if encrypt:
        import binascii
        import hashlib

        R, V, bits = (2, 1, 40) if encrypt == "rc4-40" else (3, 2, 128)
        if encrypt not in ("rc4-40", "rc4-128"):
            raise ValueError(f"unknown encrypt mode {encrypt!r}")
        keylen = bits // 8
        id0 = hashlib.md5(
            b"|".join(p.encode("utf-8", "replace") for p in pages)
        ).digest()
        O = _std_owner_entry(R, keylen)
        key = _std_file_key(O, -1, id0, R, keylen)
        U = _std_user_entry(key, R, id0)
        enc_num = add(
            b"<< /Filter /Standard /V %d /R %d /Length %d /P -1 /O <%s> /U <%s> >>"
            % (V, R, bits, binascii.hexlify(O).upper(), binascii.hexlify(U).upper())
        )
        enc_key = key

        def enc_obj(body: bytes, ok: bytes) -> bytes:
            sm = _STREAM_RE.search(body)
            dict_part = body[: sm.start()] if sm else body
            dict_part = _STR_RE.sub(
                lambda m: b"<"
                + binascii.hexlify(_rc4(ok, _unescape(m.group(1)).encode("latin-1"))).upper()
                + b">",
                dict_part,
            )
            if not sm:
                return dict_part
            return (
                dict_part
                + b"stream\n"
                + _rc4(ok, sm.group(1))
                + b"endstream"
                + body[sm.end():]
            )

        for i in range(len(objects)):
            if i + 1 == enc_num:
                continue
            if not modern:
                objects[i] = enc_obj(objects[i], _obj_key(key, i + 1))
            elif b"stream\n" in objects[i]:
                # modern: only top-level stream objects encrypt here;
                # dict-only objects pack into the ObjStm whose single
                # stream encryption protects them
                objects[i] = enc_obj(objects[i], _obj_key(key, i + 1))

    # file emission order: numeric, optionally with the page objects'
    # slots reversed (numbering and /Kids stay logical)
    emit_seq = list(range(1, len(objects) + 1))
    if reverse_page_objects:
        slots = [i for i, num in enumerate(emit_seq) if num in set(page_nums)]
        rev = [emit_seq[i] for i in reversed(slots)]
        for i, num in zip(slots, rev):
            emit_seq[i] = num

    header = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n" if not modern else b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"
    out = bytearray(header)

    if not modern:
        offsets = {0: 0}
        for num in emit_seq:
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num
            out += objects[num - 1]
            out += b"\nendobj\n"
        xref_pos = len(out)
        out += b"xref\n0 %d\n" % (len(objects) + 1)
        out += b"0000000000 65535 f \n"
        for num in range(1, len(objects) + 1):
            out += b"%010d 00000 n \n" % offsets[num]
        trailer = b"<< /Size %d /Root %d 0 R" % (len(objects) + 1, catalog)
        if info:
            trailer += b" /Info %d 0 R" % info
        if enc_num:
            import binascii

            idh = binascii.hexlify(id0).upper()
            trailer += b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (enc_num, idh, idh)
        trailer += b" >>"
        out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
        return bytes(out)

    # --- modern layout: ObjStm for dict objects + cross-reference stream
    # (the /Encrypt dict must stay top-level: PDF 32000-1 §7.5.7 forbids
    # packing it in an object stream, and readers need it before any
    # decryption context exists)
    packed = [
        num for num in emit_seq
        if b"stream\n" not in objects[num - 1] and num != enc_num
    ]
    top_level = [num for num in emit_seq if num not in set(packed)]
    objstm_num = len(objects) + 1
    xref_num = len(objects) + 2

    hdr_parts = []
    payload = b""
    packed_index = {}
    for idx, num in enumerate(packed):
        hdr_parts.append(b"%d %d" % (num, len(payload)))
        payload += objects[num - 1] + b"\n"
        packed_index[num] = idx
    stm_header = b" ".join(hdr_parts) + b"\n"
    comp = zlib.compress(stm_header + payload)
    if enc_key is not None:
        # the ObjStm payload encrypts with the ObjStm's own object key;
        # its packed objects' strings get no further encryption
        comp = _rc4(_obj_key(enc_key, len(objects) + 1), comp)
    objstm_body = (
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode /Length %d >>\nstream\n"
        % (len(packed), len(stm_header), len(comp))
        + comp
        + b"\nendstream"
    )

    offsets = {}
    for num in top_level:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num - 1] + b"\nendobj\n"
    offsets[objstm_num] = len(out)
    out += b"%d 0 obj\n" % objstm_num + objstm_body + b"\nendobj\n"
    xref_pos = len(out)

    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            typ, f2, f3 = 0, 0, 65535
        elif num in packed_index:
            typ, f2, f3 = 2, objstm_num, packed_index[num]
        elif num == xref_num:
            typ, f2, f3 = 1, xref_pos, 0
        else:
            typ, f2, f3 = 1, offsets[num], 0
        rows += bytes([typ]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    xcomp = zlib.compress(bytes(rows))
    xdict = b"<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R" % (size, catalog)
    if info:
        xdict += b" /Info %d 0 R" % info
    if enc_num:
        import binascii

        idh = binascii.hexlify(id0).upper()
        xdict += b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (enc_num, idh, idh)
    xdict += b" /Filter /FlateDecode /Length %d >>" % len(xcomp)
    out += b"%d 0 obj\n" % xref_num + xdict + b"\nstream\n" + xcomp + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser — structured walk (object map → ObjStm expansion → page tree)
# with a tolerant full-scan fallback (robust to truncated files).
#
# Coverage: text-layer PDFs with (optionally Flate-compressed) content
# streams, classic xref tables OR cross-reference streams (ignored —
# the parser builds its own object map), compressed object streams
# (/Type /ObjStm — the post-2005 default for dict objects), and
# Type0/CID fonts (2-byte Identity-H hex shows via /ToUnicode CMap,
# Tf-tracked per stream). Page TEXT order follows the /Pages /Kids
# tree when present, so PDFs whose page objects are serialized out of
# file order still number correctly. Stream filters: Flate, LZW,
# ASCIIHex, ASCII85, RunLength, chained /Filter arrays
# (_apply_filters). Still out of scope (ok=False + err, never wrong
# text): Type0 without a usable ToUnicode CMap, AES/R4+ or
# password-protected encryption, CCITT decode.
# RC4 standard-security files (V1/V2, R2/R3, empty user password) are
# transparently decrypted up front (_maybe_decrypt).
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_XREFSTM_TYPE_RE = re.compile(rb"/Type\s*/XRef\b")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[((?:\s*/[A-Za-z0-9]+)*)\s*\]|/([A-Za-z0-9]+))")
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")

#: filters whose output IS the final (image-codec) payload — applying
#: them is the image decoder's job, so the chain stops there and the
#: encoded bytes pass through (what ``pdfimages -j`` emits)
_IMAGE_TERMINAL_FILTERS = {b"DCTDecode", b"JPXDecode", b"CCITTFaxDecode", b"JBIG2Decode"}


def _lzw_decode(s: bytes, early: int = 1) -> bytes:
    """LZWDecode (PDF 32000-1 §7.4.4 = TIFF LZW): 9→12-bit codes,
    256 = clear table, 257 = EOD; ``early`` is /EarlyChange (default 1:
    the code width bumps one entry before the table fills)."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    for byte in s:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                del table[258:]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream (code beyond table)")
            out += entry
            prev = entry
            if len(table) + early - 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(s: bytes, early: int = 1) -> bytes:
    """fixture-side LZW encoder (inverse of ``_lzw_decode``)."""
    codes: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    run = b""
    for i in range(len(s)):
        nxt = run + s[i : i + 1]
        if nxt in codes:
            run = nxt
            continue
        emit(codes[run])
        codes[nxt] = next_code
        next_code += 1
        if next_code + early - 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4095:  # table full: clear between symbols
            emit(256)
            codes = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        run = s[i : i + 1]
    if run:
        emit(codes[run])
    emit(257)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_decode(s: bytes) -> bytes:
    """RunLengthDecode (PDF 32000-1 §7.4.5): L<128 → copy L+1 literal
    bytes; L>128 → repeat next byte 257-L times; L=128 → EOD."""
    out = bytearray()
    pos, n = 0, len(s)
    while pos < n:
        L = s[pos]
        pos += 1
        if L == 128:
            break
        if L < 128:
            out += s[pos : pos + L + 1]
            pos += L + 1
        else:
            out += s[pos : pos + 1] * (257 - L)
            pos += 1
    return bytes(out)


def _apply_filters(body: bytes, payload: bytes, image: bool = False) -> bytes:
    """decode a stream payload per its dict's ``/Filter`` entry (name or
    array, applied first-to-last). Supported: FlateDecode,
    ASCIIHexDecode, ASCII85Decode, RunLengthDecode; with ``image=True``
    the image-codec filters terminate the chain and the (decoded-so-far)
    payload passes through. Anything else raises ValueError — parse_pdf
    converts that to ok=False, never wrong text."""
    import base64

    fm = _FILTER_RE.search(body)
    if not fm:
        return payload
    names = (
        _FILTER_NAME_RE.findall(fm.group(1)) if fm.group(1) is not None
        else [fm.group(2)]
    )
    for name in names:
        if name == b"FlateDecode":
            payload = zlib.decompress(payload)
        elif name == b"ASCIIHexDecode":
            s = re.sub(rb"\s", b"", payload)
            s = s.split(b">")[0]
            if len(s) % 2:
                s += b"0"
            payload = bytes.fromhex(s.decode("ascii"))
        elif name == b"ASCII85Decode":
            s = re.sub(rb"\s", b"", payload)
            if s.startswith(b"<~"):
                s = s[2:]
            s = s.split(b"~>")[0]
            payload = base64.a85decode(s)
        elif name == b"RunLengthDecode":
            payload = _rle_decode(payload)
        elif name == b"LZWDecode":
            em = re.search(rb"/EarlyChange\s+(\d+)", body)
            payload = _lzw_decode(payload, int(em.group(1)) if em else 1)
        elif image and name in _IMAGE_TERMINAL_FILTERS:
            return payload
        else:
            raise ValueError(f"unsupported stream filter /{name.decode('ascii', 'replace')}")
    return payload
_NUM_FIELD = {
    "N": re.compile(rb"/N\s+(\d+)"),
    "First": re.compile(rb"/First\s+(\d+)"),
}
_CATALOG_PAGES_RE = re.compile(rb"/Type\s*/Catalog\b[^>]*?/Pages\s+(\d+)\s+0\s+R")
_PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages\b")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+0\s+R|\[((?:\s*\d+\s+0\s+R)*)\s*\])")


def _collect_objects(data: bytes) -> dict[int, bytes]:
    """object number → body for every ``N 0 obj … endobj`` block, with
    /Type /ObjStm containers expanded (their packed dict objects join
    the map as first-class entries)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    for body in list(objs.values()):
        if not _OBJSTM_RE.search(body):
            continue
        sm = _STREAM_RE.search(body)
        nm = _NUM_FIELD["N"].search(body)
        fm = _NUM_FIELD["First"].search(body)
        if not (sm and nm and fm):
            continue
        payload = sm.group(1)
        try:
            payload = _apply_filters(body, payload)
        except (ValueError, zlib.error):
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        try:
            ints = [int(x) for x in payload[:first].split()]
        except ValueError:
            continue
        pairs = list(zip(ints[0::2], ints[1::2]))[:n]
        for i, (onum, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(payload)
            objs.setdefault(onum, payload[first + off : end])
    return objs


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """page object numbers in /Pages /Kids tree order (depth-first);
    empty when no catalog/page-tree is resolvable."""
    root = None
    for body in objs.values():
        m = _CATALOG_PAGES_RE.search(body)
        if m:
            root = int(m.group(1))
            break
    if root is None or root not in objs:
        return []
    order: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        if _PAGES_TYPE_RE.search(body):
            km = _KIDS_RE.search(body)
            if km:
                for r in _REF_RE.findall(km.group(1)):
                    walk(int(r))
        elif _PAGE_TYPE_RE.search(body):
            order.append(num)

    walk(root)
    return order


def _stream_text(body: bytes, fonts: dict[str, dict | None] | None = None) -> str | None:
    """text shown by one content-stream object; None when it has no
    BT/ET text block (image-only or non-content stream).

    Ordered token scan with Tf font tracking: literal ``(…) Tj`` pieces
    decode as before; ``<hex> Tj`` pieces are Type0/CID shows decoded
    through the active font's ToUnicode CMap (``fonts`` maps resource
    name → cmap; None entry = simple font, latin-1 hex literal). Hex
    text with no usable cmap OR no known font context (``fonts=None``
    tolerant fallback, or a multi-font page showing hex before any Tf)
    raises — decoding 2-byte CIDs as latin-1 would yield mojibake with
    ok=True; parse_pdf converts the raise to ok=False + err instead."""
    sm = _STREAM_RE.search(body)
    if not sm:
        return None
    blob = sm.group(1)
    try:
        blob = _apply_filters(body, blob)
    except zlib.error:
        pass  # corrupt deflate: try raw (tolerant fallback, as before)
    if b"BT" not in blob or b"ET" not in blob:
        # the truncated-file scan reaches streams without their real
        # dict (no /Filter to honor): sniff the zlib CMF byte so
        # compressed text layers still surface from broken files
        if _FILTER_RE.search(body) or blob[:1] != b"\x78":
            return None
        try:
            blob = zlib.decompress(blob)
        except zlib.error:
            return None
        if b"BT" not in blob or b"ET" not in blob:
            return None
    cur_cmap = _UNKNOWN_FONT  # until a Tf names a known resource
    if fonts and len(fonts) == 1:  # single-font page: active before any Tf
        cur_cmap = next(iter(fonts.values()))
    lines: list[str] = []
    found = False
    for m in _CONTENT_TOKEN_RE.finditer(blob):
        tok = m.group(0)
        tf = _TF_RE.match(tok)
        if tf and tok.endswith(b"Tf"):
            if fonts is not None:
                # a Tf naming an unlisted resource is UNKNOWN, not a
                # simple font — None is reserved for fonts _page_fonts
                # positively identified as simple
                cur_cmap = fonts.get(tf.group(1).decode("latin-1"), _UNKNOWN_FONT)
            continue
        found = True
        if tok.startswith(b"("):  # literal show — never scan for hex
            for s in _STR_RE.findall(tok):
                lines.append(_unescape(s))
        elif tok.startswith(b"<"):  # CID hex show
            for hx in _HEXSTR_RE.findall(tok):
                lines.append(_decode_cid_hex(hx, cur_cmap))
        else:  # [array] TJ — items in order; literals consume their <…>
            for im in re.finditer(
                rb"\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]+)>", tok
            ):
                if im.group(1) is not None:
                    lines.append(_unescape(im.group(1)))
                elif im.group(2):
                    lines.append(_decode_cid_hex(im.group(2), cur_cmap))
    return "\n".join(lines) if found else None
_TEXT_SHOW_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')"      # (literal) Tj / '
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ"           # [array] TJ (literal or hex items)
    rb"|<[0-9A-Fa-f\s]+>\s*(?:Tj|')"         # <hex> Tj (Type0/CID strings)
)
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_HEXSTR_RE = re.compile(rb"<([0-9A-Fa-f\s]+)>")
_TF_RE = re.compile(rb"/(\w+)\s+[\d.]+\s+Tf")
_CONTENT_TOKEN_RE = re.compile(_TF_RE.pattern + rb"|" + _TEXT_SHOW_RE.pattern)

# --- Type0/CID fonts: ToUnicode CMap machinery (PDF 32000-1 §9.10) ---------
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+0\s+R")
_FONT_RES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_ENTRY_RE = re.compile(rb"/(\w+)\s+(\d+)\s+0\s+R")
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RANGE3_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(<[0-9A-Fa-f]+>|\[(?:\s*<[0-9A-Fa-f]+>)*\s*\])"
)


def _parse_tounicode(body: bytes) -> dict[int, str]:
    """CID → unicode map from a /ToUnicode CMap stream: bfchar pairs
    plus bfrange in both increment (<lo> <hi> <dst0>) and array
    (<lo> <hi> [<d0> <d1> …]) forms; dst values are UTF-16BE."""
    sm = _STREAM_RE.search(body)
    if not sm:
        return {}
    s = sm.group(1)
    try:
        s = _apply_filters(body, s)
    except (ValueError, zlib.error):
        pass  # undecodable CMap → empty map → hex shows error out
    cmap: dict[int, str] = {}

    def dst_str(hexs: bytes) -> str:
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", "replace")

    for block in _BFCHAR_RE.findall(s):
        for src, dst in _HEXPAIR_RE.findall(block):
            cmap[int(src, 16)] = dst_str(dst)
    for block in _BFRANGE_RE.findall(s):
        for lo_h, hi_h, dst in _RANGE3_RE.findall(block):
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            if dst.startswith(b"["):
                items = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for code, d in zip(range(lo, hi + 1), items):
                    cmap[code] = dst_str(d)
            else:
                d0 = dst.strip(b"<>")
                base, width = int(d0, 16), len(d0)
                for code in range(lo, hi + 1):
                    cmap[code] = dst_str(format(base + code - lo, f"0{width}x").encode())
    return cmap


# --- standard security handler (PDF 32000-1 §7.6.3): RC4 V1/V2, R2/R3 -----
# 32-byte padding constant from the public spec (Algorithm 2 step a)
_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)
_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+0\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
_DICT_HEXSTR_RE = re.compile(rb"(?<!<)<([0-9A-Fa-f\s]+)>(?!>)")


def _rc4(key: bytes, data: bytes) -> bytes:
    """plain RC4 (public algorithm) — used only for PDF standard-
    security-handler compatibility, not as a security primitive."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _std_file_key(O: bytes, P: int, id0: bytes, R: int, keylen: int) -> bytes:
    """Algorithm 2 file key for the EMPTY user password."""
    import hashlib

    h = hashlib.md5(
        _PW_PAD + O[:32] + (P & 0xFFFFFFFF).to_bytes(4, "little") + id0
    ).digest()
    if R >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    return h[:keylen]


def _std_user_check(key: bytes, U: bytes, R: int, id0: bytes) -> bool:
    """Algorithms 4/5: does the empty user password open this file?"""
    import hashlib

    if R == 2:
        return _rc4(key, _PW_PAD) == U[:32]
    x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x == U[:16]


def _std_owner_entry(R: int, keylen: int) -> bytes:
    """Algorithm 3 /O for empty owner+user passwords (fixture writer)."""
    import hashlib

    h = hashlib.md5(_PW_PAD).digest()
    if R >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:keylen]).digest()
    o = _rc4(h[:keylen], _PW_PAD)
    if R >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in h[:keylen]), o)
    return o


def _std_user_entry(key: bytes, R: int, id0: bytes) -> bytes:
    import hashlib

    if R == 2:
        return _rc4(key, _PW_PAD)
    x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16  # padded to 32 bytes per spec


def _obj_key(file_key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1 per-object RC4 key."""
    import hashlib

    k = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return k[: min(len(file_key) + 5, 16)]


def _parse_enc_string(body: bytes, name: bytes) -> bytes | None:
    """/O or /U value: hex string or escaped literal."""
    m = re.search(name + rb"\s*<([0-9A-Fa-f\s]+)>", body)
    if m:
        return bytes.fromhex(re.sub(rb"\s", b"", m.group(1)).decode("ascii"))
    m = re.search(name + rb"\s*\(((?:[^()\\]|\\.)*)\)", body)
    if m:
        return _unescape(m.group(1)).encode("latin-1")
    return None


def _maybe_decrypt(data: bytes) -> bytes:
    """transparently decrypt a standard-security-handler RC4 file with
    an empty user password, rewriting stream payloads and dict strings
    in place; raises for password-protected or non-RC4 encryption (the
    caller converts that to ok=False + err)."""
    em = _ENCRYPT_REF_RE.search(data)
    if not em:
        return data
    enc_num = int(em.group(1))
    enc_body = None
    for m in _OBJ_RE.finditer(data):
        if int(m.group(1)) == enc_num:
            enc_body = m.group(2)
            break
    if enc_body is None or b"/Standard" not in enc_body:
        raise ValueError("unsupported /Encrypt handler")
    vm = re.search(rb"/V\s+(\d+)", enc_body)
    rm = re.search(rb"/R\s+(\d+)", enc_body)
    V = int(vm.group(1)) if vm else 0
    R = int(rm.group(1)) if rm else 2
    if V not in (1, 2) or R not in (2, 3):
        raise ValueError(f"unsupported encryption (V={V} R={R}; RC4 V1/V2 only)")
    lm = re.search(rb"/Length\s+(\d+)", enc_body)
    keylen = (int(lm.group(1)) if lm else 40) // 8
    O = _parse_enc_string(enc_body, rb"/O")
    U = _parse_enc_string(enc_body, rb"/U")
    pm = re.search(rb"/P\s+(-?\d+)", enc_body)
    idm = _ID_RE.search(data)
    if O is None or U is None or pm is None or idm is None:
        raise ValueError("malformed /Encrypt dictionary")
    id0 = bytes.fromhex(idm.group(1).decode("ascii"))
    key = _std_file_key(O, int(pm.group(1)), id0, R, keylen)
    if not _std_user_check(key, U, R, id0):
        raise ValueError("password-protected PDF (empty user password rejected)")

    def decrypt_block(num: int, body: bytes) -> bytes:
        if num == enc_num:
            return body
        ok = _obj_key(key, num)
        sm = _STREAM_RE.search(body)
        dict_part = body[: sm.start()] if sm else body
        if _XREFSTM_TYPE_RE.search(dict_part):
            # cross-reference streams are NEVER encrypted (PDF 32000-1
            # §7.5.8.2) — RC4ing one would corrupt the object index
            return body

        # dict strings: hex and literal forms both decrypt to literals —
        # ONE combined pass so a freshly decrypted literal is never
        # re-matched and double-decrypted
        def _string_repl(m: re.Match) -> bytes:
            if m.group(1) is not None:
                raw = bytes.fromhex(re.sub(rb"\s", b"", m.group(1)).decode("ascii"))
            else:
                raw = _unescape(m.group(2)).encode("latin-1")
            return b"(" + _esc(_rc4(ok, raw).decode("latin-1")).encode("latin-1") + b")"

        combined = re.compile(_DICT_HEXSTR_RE.pattern + rb"|" + _STR_RE.pattern)
        dict_part = combined.sub(_string_repl, dict_part)
        if not sm:
            return dict_part
        return (
            dict_part
            + b"stream\n"
            + _rc4(ok, sm.group(1))
            + b"endstream"
            + body[sm.end():]
        )

    pos = 0
    pieces: list[bytes] = []
    for m in _OBJ_RE.finditer(data):
        pieces.append(data[pos : m.start()])
        num = int(m.group(1))
        pieces.append(b"%d 0 obj" % num + decrypt_block(num, m.group(2)) + b"endobj")
        pos = m.end()
    pieces.append(data[pos:])
    return b"".join(pieces)


#: sentinel for a Type0 font lacking a usable ToUnicode CMap — its hex
#: shows cannot be decoded and must surface as an error, not mojibake
_NO_CMAP = object()
_UNKNOWN_FONT = object()  # hex show before any font context is known


def _page_fonts(objs: dict[int, bytes], page_body: bytes) -> dict:
    """font resource name → ToUnicode cmap (None for simple fonts,
    ``_NO_CMAP`` for Type0 without one); resources may be inline or an
    indirect /Resources N 0 R."""
    rm = _RESOURCES_REF_RE.search(page_body)
    res = objs.get(int(rm.group(1)), b"") if rm else page_body
    fm = _FONT_RES_RE.search(res)
    if not fm:
        return {}
    fonts: dict = {}
    for name, num in _FONT_ENTRY_RE.findall(fm.group(1)):
        fb = objs.get(int(num), b"")
        cmap = None
        if _TYPE0_RE.search(fb):
            tm = _TOUNICODE_RE.search(fb)
            if tm and int(tm.group(1)) in objs:
                cmap = _parse_tounicode(objs[int(tm.group(1))])
            else:
                cmap = _NO_CMAP
        fonts[name.decode("latin-1")] = cmap
    return fonts


def _decode_cid_hex(hexbytes: bytes, cmap) -> str:
    """decode one <hex> show: via the ToUnicode map for Type0 fonts
    (2-byte CIDs), as a latin-1 hex literal for simple fonts (the spec
    treats <…> as an alternative literal-string syntax); raises for a
    Type0 font with no usable CMap — ok=False beats silently wrong text."""
    h = re.sub(rb"\s+", b"", hexbytes)
    if cmap is _UNKNOWN_FONT:
        raise ValueError("hex show with unknown font context (no resolvable Tf)")
    if cmap is _NO_CMAP or (isinstance(cmap, dict) and len(h) % 4):
        raise ValueError("CID text without a usable 2-byte ToUnicode CMap")
    if isinstance(cmap, dict):
        return "".join(
            cmap.get(int(h[i : i + 4], 16), "�") for i in range(0, len(h), 4)
        )
    if len(h) % 2:  # odd digit count: spec pads with trailing 0
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")
_INFO_FIELD_RE = {
    "title": re.compile(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)"),
    "author": re.compile(rb"/Author\s*\(((?:[^()\\]|\\.)*)\)"),
}
_PAGE_COUNT_RE = re.compile(rb"/Type\s*/Pages\b[^>]*?/Count\s+(\d+)")
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image\b")

_UNESC = {b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\", b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t"}


def _unescape(raw: bytes) -> str:
    if b"\\" not in raw:  # no escapes (the common case): direct decode
        return raw.decode("latin-1")
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i : i + 1] == b"\\" and i + 1 < len(raw):
            pair = raw[i : i + 2]
            if pair in _UNESC:
                out += _UNESC[pair]
                i += 2
                continue
            out += raw[i + 1 : i + 2]
            i += 2
            continue
        out += raw[i : i + 1]
        i += 1
    return out.decode("latin-1")


def parse_pdf(data: bytes) -> dict:
    """Extract per-page text, doc info, image count from PDF bytes.

    Returns a dict matching schema.PDF_RESULT_TYPE field names.
    """
    res = {
        "pages": None,
        "title": None,
        "author": None,
        "npages": None,
        "n_images": 0,
        "ok": False,
        "err": None,
    }
    try:
        if not data or not data.startswith(b"%PDF-"):
            res["err"] = "not a PDF (missing %PDF- header)"
            return res
        data = _maybe_decrypt(data)
        objs = _collect_objects(data)
        order = _page_order(objs)
        page_texts: list[str] = []
        if order:
            # structured path: texts in PAGE-TREE order (correct even
            # when page objects are serialized out of file order, or
            # live inside a compressed object stream)
            for pnum in order:
                cm = _CONTENTS_RE.search(objs[pnum])
                refs: list[int] = []
                if cm:
                    refs = (
                        [int(cm.group(1))]
                        if cm.group(1)
                        else [int(r) for r in _REF_RE.findall(cm.group(2))]
                    )
                fonts = _page_fonts(objs, objs[pnum])
                parts = [
                    t
                    for t in (_stream_text(objs[r], fonts) for r in refs if r in objs)
                    if t is not None
                ]
                page_texts.append("\n".join(parts))
            if not any(page_texts):
                page_texts = []
        if not page_texts:
            # tolerant fallback: scan every stream in file order
            # (truncated files, broken page trees)
            for m in _STREAM_RE.finditer(data):
                body = b"<< >>\nstream\n" + m.group(1) + b"endstream"
                t = _stream_text(body)
                if t is not None:
                    page_texts.append(t)
        # info/count regexes run over the raw bytes PLUS expanded object
        # streams (post-2005 PDFs keep Info and the page tree in ObjStm)
        corpus = [data] + [b for b in objs.values() if b not in (None,)]
        res["n_images"] = len(_IMAGE_RE.findall(data))
        for field, rx in _INFO_FIELD_RE.items():
            for blob in corpus:
                m = rx.search(blob)
                if m:
                    res[field] = _unescape(m.group(1))
                    break
        res["npages"] = len(order) if order else None
        if res["npages"] is None:
            for blob in corpus:
                m = _PAGE_COUNT_RE.search(blob)
                if m:
                    res["npages"] = int(m.group(1))
                    break
        if res["npages"] is None:
            res["npages"] = len(page_texts)
        res["pages"] = page_texts
        if not page_texts:
            res["err"] = "no extractable text layer"
            return res
        res["ok"] = True
        return res
    except Exception as e:  # noqa: BLE001 — error becomes a row column
        res["err"] = f"{type(e).__name__}: {e}"
        return res


# ---------------------------------------------------------------------------
# pdfimages equivalent — per-page image extraction
# (enhance_pdf_ocr.py's `pdfimages -f N -l N` subprocess, done as a
# direct parse of the image XObjects and their page references)
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.DOTALL)
_PAGE_OBJ_RE = re.compile(rb"/Type\s*/Page\b")
_XOBJ_REF_RE = re.compile(rb"/Im\d+\s+(\d+)\s+0\s+R")
_IMG_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\nendstream", re.DOTALL)


def pdf_images(data: bytes) -> list[dict]:
    """[(page_i, image bytes)] for every image XObject, page-associated.

    Image XObjects (top-level stream objects) yield their payload
    (Flate-decoded when marked). ``page_i`` follows the /Pages /Kids
    tree order when resolvable — PDFs whose page objects are serialized
    out of file order still number like ``pdfimages -f N -l N`` — with
    file order of the /Type /Page objects as the fallback. Images
    referenced by no page come last with page_i = 0 — nothing is
    silently dropped.
    """
    if not data or not data.startswith(b"%PDF-"):
        return []
    try:
        data = _maybe_decrypt(data)
    except ValueError:
        return []  # unsupported/locked encryption: no images, no wrong bytes
    images: dict[int, bytes] = {}
    file_order_pages: list[int] = []
    for m in _OBJ_RE.finditer(data):
        num, body = int(m.group(1)), m.group(2)
        if rb"/Subtype" in body and _IMAGE_RE.search(body):
            sm = _IMG_STREAM_RE.search(body)
            if not sm:
                continue
            blob = sm.group(1)
            try:
                blob = _apply_filters(body, blob, image=True)
            except (ValueError, zlib.error):
                pass  # undecodable envelope: keep raw payload
            images[num] = blob
        elif _PAGE_OBJ_RE.search(body) and not _PAGES_TYPE_RE.search(body):
            file_order_pages.append(num)
    objs = _collect_objects(data)
    tree_order = _page_order(objs)
    page_nums = tree_order or [n for n in file_order_pages if n in objs]
    out: list[dict] = []
    seen: set[int] = set()
    for page_i, pnum in enumerate(page_nums, start=1):
        for num in (int(r) for r in _XOBJ_REF_RE.findall(objs.get(pnum, b""))):
            if num in images:
                out.append({"page_i": page_i, "image": images[num]})
                seen.add(num)
    for num, blob in images.items():
        if num not in seen:
            out.append({"page_i": 0, "image": blob})
    return out
