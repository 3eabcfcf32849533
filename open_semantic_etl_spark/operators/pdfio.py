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
    # V1/R2, "rc4-128" = V2/R3, "aes-128" = V4/R4 /AESV2, "aes-256" =
    # V5/R6 /AESV3; empty user + owner passwords. Classic layout
    # protects streams and dict strings per object; modern layout
    # follows the PDF 1.5+ rules — stream payloads per object, strings
    # of ObjStm-packed dicts ride the ObjStm's OWN encryption (applied
    # at emission below), the XRef stream never encrypted.
    enc_num = None
    id0 = None
    enc_stream = None
    if encrypt:
        import binascii
        import hashlib

        hx = lambda b: binascii.hexlify(b).upper()  # noqa: E731
        id0 = hashlib.md5(
            b"|".join(p.encode("utf-8", "replace") for p in pages)
        ).digest()
        if encrypt == "aes-256":
            cipher, per_object = "aes", False
            key = hashlib.sha256(b"spark-graft-aes256" + id0).digest()
            vs, ks = b"VALSALT1", b"KEYSALT1"
            U = _hash_2b(b"", vs, b"") + vs + ks
            UE = _aes_cbc_encrypt(_hash_2b(b"", ks, b""), bytes(16), key, pad=False)
            ovs, oks = b"OVALSLT1", b"OKEYSLT1"
            O = _hash_2b(b"", ovs, U) + ovs + oks
            OE = _aes_cbc_encrypt(_hash_2b(b"", oks, U), bytes(16), key, pad=False)
            perms = _aes_encrypt_block(
                _aes_expand(key), b"\xff\xff\xff\xff\xff\xff\xff\xffTadb0000"
            )
            enc_num = add(
                b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
                b"/StmF /StdCF /StrF /StdCF /P -1 "
                b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> >>"
                % (hx(O), hx(U), hx(OE), hx(UE), hx(perms))
            )
        elif encrypt in ("aes-128", "aes-128-nometa"):
            cipher, per_object = "aes", True
            R = 4
            enc_meta = encrypt == "aes-128"
            O = _std_owner_entry(R, 16)
            key = _std_file_key(O, -1, id0, R, 16, enc_meta)
            U = _std_user_entry(key, R, id0)
            enc_num = add(
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
                b"/StmF /StdCF /StrF /StdCF /P -1 %s/O <%s> /U <%s> >>"
                % (b"" if enc_meta else b"/EncryptMetadata false ", hx(O), hx(U))
            )
        elif encrypt == "rc4-128-v4":
            # Acrobat 7+ RC4 form: V4/R4 crypt filter /CFM /V2 (the
            # crypt-filter /Length is a BYTE count; the top-level one
            # is key bits — parser must not confuse them)
            cipher, per_object = "rc4", True
            R = 4
            O = _std_owner_entry(R, 16)
            key = _std_file_key(O, -1, id0, R, 16)
            U = _std_user_entry(key, R, id0)
            enc_num = add(
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen /Length 16 >> >> "
                b"/StmF /StdCF /StrF /StdCF /P -1 /O <%s> /U <%s> >>"
                % (hx(O), hx(U))
            )
        elif encrypt in ("rc4-40", "rc4-128"):
            cipher, per_object = "rc4", True
            R, V, bits = (2, 1, 40) if encrypt == "rc4-40" else (3, 2, 128)
            keylen = bits // 8
            O = _std_owner_entry(R, keylen)
            key = _std_file_key(O, -1, id0, R, keylen)
            U = _std_user_entry(key, R, id0)
            enc_num = add(
                b"<< /Filter /Standard /V %d /R %d /Length %d /P -1 /O <%s> /U <%s> >>"
                % (V, R, bits, hx(O), hx(U))
            )
        else:
            raise ValueError(f"unknown encrypt mode {encrypt!r}")

        def _okey(num: int) -> bytes:
            if not per_object:
                return key
            return (_obj_key_aes if cipher == "aes" else _obj_key)(key, num)

        def _enc(ok: bytes, raw: bytes) -> bytes:
            if cipher == "rc4":
                return _rc4(ok, raw)
            iv = hashlib.md5(raw + b"fixture-iv").digest()  # deterministic
            return iv + _aes_cbc_encrypt(ok, iv, raw)

        def enc_stream(num: int, payload: bytes) -> bytes:  # noqa: F811
            return _enc(_okey(num), payload)

        def enc_obj(body: bytes, ok: bytes) -> bytes:
            sm = _STREAM_RE.search(body)
            dict_part = body[: sm.start()] if sm else body
            dict_part = _STR_RE.sub(
                lambda m: b"<"
                + hx(_enc(ok, _unescape_bytes(m.group(1))))
                + b">",
                dict_part,
            )
            if not sm:
                return dict_part
            # the serializer above always writes payload + b"\nendstream"
            # and _STREAM_RE's capture runs through 'endstream', so the
            # capture carries exactly ONE framing LF (§7.3.8.1) — strip
            # exactly that. Never strip b"\r\n": the \r would be a real
            # data byte (flate output legitimately ends with 0x0D, and a
            # two-byte strip truncated that stream by one byte)
            raw = sm.group(1)
            if raw.endswith(b"\n"):
                raw = raw[:-1]
            payload = _enc(ok, raw)
            # AES grows streams (IV + padding): keep /Length honest
            dict_part = re.sub(
                rb"/Length\s+\d+", b"/Length %d" % len(payload), dict_part
            )
            return (
                dict_part
                + b"stream\n"
                + payload
                + b"\nendstream"
                + body[sm.end():]
            )

        for i in range(len(objects)):
            if i + 1 == enc_num:
                continue
            if not modern:
                objects[i] = enc_obj(objects[i], _okey(i + 1))
            elif b"stream\n" in objects[i]:
                # modern: only top-level stream objects encrypt here;
                # dict-only objects pack into the ObjStm whose single
                # stream encryption protects them
                objects[i] = enc_obj(objects[i], _okey(i + 1))

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
    if enc_stream is not None:
        # the ObjStm payload encrypts with the ObjStm's own object key;
        # its packed objects' strings get no further encryption
        comp = enc_stream(len(objects) + 1, comp)
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
            # EarlyChange schedule (PDF 32000-1 §7.4.4.2 table 8 /
            # TIFF 6 §13): with early=1 the width bumps when the NEXT
            # entry to add would be 511/1023/2047 — i.e. one entry
            # before the non-early (early=0) 512/1024/2048 boundary.
            # (r4 fix: the old `len(table) + early - 1` condition was
            # shifted one entry late, desyncing any real-writer stream
            # that adds >253 table entries.)
            if len(table) + early >= (1 << width) and width < 12:
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
        # mirror of the decoder's EarlyChange schedule: next_code is
        # already incremented here, so next_code - 1 == len(table)
        if next_code - 1 + early >= (1 << width) and width < 12:
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
    converts that to ok=False, never wrong text. Only the DICT part of
    ``body`` is consulted: page text mentioning '/Filter /LZWDecode'
    must not select a filter."""
    import base64

    sm = _STREAM_RE.search(body)
    body = body[: sm.start()] if sm else body
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
_CATALOG_TYPE_RE = re.compile(rb"/Type\s*/Catalog\b")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+0\s+R")
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
        # dict key order is arbitrary (§7.3.7): check /Type /Catalog
        # and the /Pages ref as independent searches over the object
        # body — a single ordered regex missed '<< /Pages N 0 R /Type
        # /Catalog >>' and silently disabled the whole page-tree walk
        if _CATALOG_TYPE_RE.search(body):
            m = _PAGES_REF_RE.search(body)
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
        if _FILTER_RE.search(body[: sm.start()]) or blob[:1] != b"\x78":
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
                lines.append(_decode_simple(_unescape_bytes(s), cur_cmap))
        elif tok.startswith(b"<"):  # CID hex show
            for hx in _HEXSTR_RE.findall(tok):
                lines.append(_decode_cid_hex(hx, cur_cmap))
        else:  # [array] TJ — ONE text line: string items concatenate,
            # and a large negative adjustment (thousandths of an em)
            # is the inter-word space convention (pdftotext heuristic;
            # small values are kerning and join silently)
            parts: list[str] = []
            for im in re.finditer(
                rb"\((" + _LITSTR_INNER + rb")\)"
                rb"|<([0-9A-Fa-f\s]+)>|(-?\d+(?:\.\d+)?)",
                tok,
            ):
                if im.group(1) is not None:
                    parts.append(_decode_simple(_unescape_bytes(im.group(1)), cur_cmap))
                elif im.group(2):
                    parts.append(_decode_cid_hex(im.group(2), cur_cmap))
                elif float(im.group(3)) <= -180 and parts and not parts[-1].endswith(" "):
                    parts.append(" ")
            if parts and parts[-1] == " ":
                parts.pop()  # a trailing adjustment is not a space
            lines.append("".join(parts))
    return "\n".join(lines) if found else None
# literal-string body: balanced unescaped parens are LEGAL inside a
# string (§7.3.4.2 — pdfTeX emits '(a (b) c)') and supported two levels
# deep (regexes cannot do unbounded depth; two covers observed writers);
# the alternatives are first-char-disjoint so matching stays linear on
# malformed input
_LITSTR_L0 = rb"(?:[^()\\]|\\.)*"
_LITSTR_L1 = rb"(?:[^()\\]|\\.|\(" + _LITSTR_L0 + rb"\))*"
_LITSTR_INNER = rb"(?:[^()\\]|\\.|\(" + _LITSTR_L1 + rb"\))*"
_TEXT_SHOW_RE = re.compile(
    rb"\(" + _LITSTR_INNER + rb"\)\s*(?:Tj|'|\")"  # (literal) Tj / ' / aw ac "
    # [array] TJ: string items may contain ']' — the array body must be
    # tokenized string-aware ((…) | \x | bare non-] chars), else
    # '[(cite [1])] TJ' never matches and the line silently vanishes
    rb"|\[(?:\(" + _LITSTR_INNER + rb"\)|[^\]()\\]|\\.)*\]\s*TJ"
    rb"|<[0-9A-Fa-f\s]+>\s*(?:Tj|'|\")"      # <hex> Tj (Type0/CID strings)
)
_STR_RE = re.compile(rb"\((" + _LITSTR_INNER + rb")\)")
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
_TRAILER_BLOCK_RE = re.compile(rb"trailer\s*<<(.*?)>>", re.DOTALL)


def _search_trailer_dicts(data: bytes, rx: "re.Pattern") -> "re.Match | None":
    """search ``rx`` ONLY in trailer dicts and /Type /XRef stream dicts
    (where the spec puts file-level keys like /Encrypt and /ID), taking
    the LAST match (incremental updates: the newest trailer governs).
    A whole-file search would mistake the literal text '/Encrypt 5 0 R'
    inside an uncompressed content stream for real encryption and fail
    a valid document."""
    # matches from BOTH sources compete on file byte offset: a hybrid
    # incrementally-updated file can have its newest revision use either
    # form, and the greatest-offset match is the governing one (the old
    # two-loop code let any XRef-stream match override a newer classic
    # trailer regardless of revision order — ADVICE r3)
    best, best_off = None, -1
    for tm in _TRAILER_BLOCK_RE.finditer(data):
        m = rx.search(tm.group(1))
        if m and tm.start(1) + m.start() > best_off:
            best, best_off = m, tm.start(1) + m.start()
    for om in _OBJ_RE.finditer(data):
        body = om.group(2)
        sm = _STREAM_RE.search(body)
        head = body[: sm.start()] if sm else body
        if _XREFSTM_TYPE_RE.search(head):
            m = rx.search(head)
            if m and om.start(2) + m.start() > best_off:
                best, best_off = m, om.start(2) + m.start()
    return best
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


# --- minimal AES (FIPS-197) — public algorithm, PDF-compat only ------------

_AES_TABLES: tuple | None = None


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
    return r


def _aes_tables() -> tuple:
    """(sbox, isbox, Te0..3, Td0..3), built once — the standard 32-bit
    T-table formulation (ShiftRows+SubBytes+MixColumns fused into four
    word lookups per column per round)."""
    global _AES_TABLES
    if _AES_TABLES is None:
        inv = [0] * 256
        for x in range(1, 256):
            for y in range(1, 256):
                if _gf_mul(x, y) == 1:
                    inv[x] = y
                    break
        sbox = [0] * 256
        for x in range(256):
            b = inv[x]
            s = 0
            for i in range(8):
                bit = (
                    (b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                    ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8)) ^ (0x63 >> i)
                ) & 1
                s |= bit << i
            sbox[x] = s
        isbox = [0] * 256
        for i, v in enumerate(sbox):
            isbox[v] = i

        def rot(w: int, n: int) -> int:
            return ((w >> n) | (w << (32 - n))) & 0xFFFFFFFF

        Te = [[0] * 256 for _ in range(4)]
        Td = [[0] * 256 for _ in range(4)]
        for x in range(256):
            s = sbox[x]
            te = (_gf_mul(2, s) << 24) | (s << 16) | (s << 8) | _gf_mul(3, s)
            u = isbox[x]
            td = (
                (_gf_mul(14, u) << 24) | (_gf_mul(9, u) << 16)
                | (_gf_mul(13, u) << 8) | _gf_mul(11, u)
            )
            for i in range(4):
                Te[i][x] = rot(te, 8 * i)
                Td[i][x] = rot(td, 8 * i)
        _AES_TABLES = (sbox, isbox, Te, Td)
    return _AES_TABLES


def _imc_word(w: int) -> int:
    """InvMixColumns on one 32-bit column word (for the equivalent
    inverse cipher's round-key transform)."""
    b = [(w >> 24) & 0xFF, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF]
    out = 0
    for r, coeffs in enumerate(((14, 11, 13, 9), (9, 14, 11, 13), (13, 9, 14, 11), (11, 13, 9, 14))):
        v = (
            _gf_mul(coeffs[0], b[0]) ^ _gf_mul(coeffs[1], b[1])
            ^ _gf_mul(coeffs[2], b[2]) ^ _gf_mul(coeffs[3], b[3])
        )
        out |= v << (24 - 8 * r)
    return out


def _aes_expand(key: bytes) -> tuple:
    """→ (enc round-key words, dec round-key words, nr); words are
    32-bit big-endian, dec keys pre-transformed for the equivalent
    inverse cipher. Cached per key (file keys repeat per object)."""
    cached = _AES_KEY_CACHE.get(key)
    if cached is not None:
        return cached
    sbox, _, _, _ = _aes_tables()
    nk = len(key) // 4
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (sbox[(t >> 24) & 0xFF] << 24) | (sbox[(t >> 16) & 0xFF] << 16)
                | (sbox[(t >> 8) & 0xFF] << 8) | sbox[t & 0xFF]
            )
            t ^= rcon << 24
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = (
                (sbox[(t >> 24) & 0xFF] << 24) | (sbox[(t >> 16) & 0xFF] << 16)
                | (sbox[(t >> 8) & 0xFF] << 8) | sbox[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    dw = [0] * len(w)
    for r in range(nr + 1):
        for c in range(4):
            v = w[4 * (nr - r) + c]
            dw[4 * r + c] = _imc_word(v) if 0 < r < nr else v
    res = (w, dw, nr)
    if len(_AES_KEY_CACHE) < 64:
        _AES_KEY_CACHE[key] = res
    return res


_AES_KEY_CACHE: dict[bytes, tuple] = {}


def _aes_encrypt_block(sched: tuple, blk: bytes) -> bytes:
    w, _, nr = sched
    _, _, Te, _ = _aes_tables()
    Te0, Te1, Te2, Te3 = Te
    c0 = int.from_bytes(blk[0:4], "big") ^ w[0]
    c1 = int.from_bytes(blk[4:8], "big") ^ w[1]
    c2 = int.from_bytes(blk[8:12], "big") ^ w[2]
    c3 = int.from_bytes(blk[12:16], "big") ^ w[3]
    for r in range(1, nr):
        k = 4 * r
        t0 = Te0[c0 >> 24] ^ Te1[(c1 >> 16) & 0xFF] ^ Te2[(c2 >> 8) & 0xFF] ^ Te3[c3 & 0xFF] ^ w[k]
        t1 = Te0[c1 >> 24] ^ Te1[(c2 >> 16) & 0xFF] ^ Te2[(c3 >> 8) & 0xFF] ^ Te3[c0 & 0xFF] ^ w[k + 1]
        t2 = Te0[c2 >> 24] ^ Te1[(c3 >> 16) & 0xFF] ^ Te2[(c0 >> 8) & 0xFF] ^ Te3[c1 & 0xFF] ^ w[k + 2]
        t3 = Te0[c3 >> 24] ^ Te1[(c0 >> 16) & 0xFF] ^ Te2[(c1 >> 8) & 0xFF] ^ Te3[c2 & 0xFF] ^ w[k + 3]
        c0, c1, c2, c3 = t0, t1, t2, t3
    sbox, _, _, _ = _aes_tables()
    k = 4 * nr
    o0 = ((sbox[c0 >> 24] << 24) | (sbox[(c1 >> 16) & 0xFF] << 16) | (sbox[(c2 >> 8) & 0xFF] << 8) | sbox[c3 & 0xFF]) ^ w[k]
    o1 = ((sbox[c1 >> 24] << 24) | (sbox[(c2 >> 16) & 0xFF] << 16) | (sbox[(c3 >> 8) & 0xFF] << 8) | sbox[c0 & 0xFF]) ^ w[k + 1]
    o2 = ((sbox[c2 >> 24] << 24) | (sbox[(c3 >> 16) & 0xFF] << 16) | (sbox[(c0 >> 8) & 0xFF] << 8) | sbox[c1 & 0xFF]) ^ w[k + 2]
    o3 = ((sbox[c3 >> 24] << 24) | (sbox[(c0 >> 16) & 0xFF] << 16) | (sbox[(c1 >> 8) & 0xFF] << 8) | sbox[c2 & 0xFF]) ^ w[k + 3]
    return b"".join(x.to_bytes(4, "big") for x in (o0, o1, o2, o3))


def _aes_decrypt_block(sched: tuple, blk: bytes) -> bytes:
    _, dw, nr = sched
    _, isbox, _, Td = _aes_tables()
    Td0, Td1, Td2, Td3 = Td
    c0 = int.from_bytes(blk[0:4], "big") ^ dw[0]
    c1 = int.from_bytes(blk[4:8], "big") ^ dw[1]
    c2 = int.from_bytes(blk[8:12], "big") ^ dw[2]
    c3 = int.from_bytes(blk[12:16], "big") ^ dw[3]
    for r in range(1, nr):
        k = 4 * r
        t0 = Td0[c0 >> 24] ^ Td1[(c3 >> 16) & 0xFF] ^ Td2[(c2 >> 8) & 0xFF] ^ Td3[c1 & 0xFF] ^ dw[k]
        t1 = Td0[c1 >> 24] ^ Td1[(c0 >> 16) & 0xFF] ^ Td2[(c3 >> 8) & 0xFF] ^ Td3[c2 & 0xFF] ^ dw[k + 1]
        t2 = Td0[c2 >> 24] ^ Td1[(c1 >> 16) & 0xFF] ^ Td2[(c0 >> 8) & 0xFF] ^ Td3[c3 & 0xFF] ^ dw[k + 2]
        t3 = Td0[c3 >> 24] ^ Td1[(c2 >> 16) & 0xFF] ^ Td2[(c1 >> 8) & 0xFF] ^ Td3[c0 & 0xFF] ^ dw[k + 3]
        c0, c1, c2, c3 = t0, t1, t2, t3
    k = 4 * nr
    o0 = ((isbox[c0 >> 24] << 24) | (isbox[(c3 >> 16) & 0xFF] << 16) | (isbox[(c2 >> 8) & 0xFF] << 8) | isbox[c1 & 0xFF]) ^ dw[k]
    o1 = ((isbox[c1 >> 24] << 24) | (isbox[(c0 >> 16) & 0xFF] << 16) | (isbox[(c3 >> 8) & 0xFF] << 8) | isbox[c2 & 0xFF]) ^ dw[k + 1]
    o2 = ((isbox[c2 >> 24] << 24) | (isbox[(c1 >> 16) & 0xFF] << 16) | (isbox[(c0 >> 8) & 0xFF] << 8) | isbox[c3 & 0xFF]) ^ dw[k + 2]
    o3 = ((isbox[c3 >> 24] << 24) | (isbox[(c2 >> 16) & 0xFF] << 16) | (isbox[(c1 >> 8) & 0xFF] << 8) | isbox[c0 & 0xFF]) ^ dw[k + 3]
    return b"".join(x.to_bytes(4, "big") for x in (o0, o1, o2, o3))


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    sched = _aes_expand(key)
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        prev = _aes_encrypt_block(sched, blk)
        out += prev
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    if len(data) % 16:
        raise ValueError("AES-CBC payload not block-aligned")
    sched = _aes_expand(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(x ^ y for x, y in zip(_aes_decrypt_block(sched, blk), prev))
        prev = blk
    if pad and out:
        n = out[-1]
        if not 1 <= n <= 16:
            raise ValueError("bad AES-CBC padding")
        del out[len(out) - n :]
    return bytes(out)


_HASH_2B_CACHE: dict[tuple, bytes] = {}


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B hardened hash (PDF 2.0 / ISO 32000-2, R6): the
    iterated SHA-2 + AES-128-CBC mix used by AES-256 password checks.
    Memoized — the same (pwd, salt, udata) triple recurs for every
    object of a file and across fixture builds."""
    import hashlib

    ck = (pwd, salt, udata)
    hit = _HASH_2B_CACHE.get(ck)
    if hit is not None:
        return hit

    K = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        K1 = (pwd + K + udata) * 64
        E = _aes_cbc_encrypt(K[:16], K[16:32], K1, pad=False)
        K = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(E[:16]) % 3](E).digest()
        i += 1
        if i >= 64 and E[-1] <= i - 32:
            if len(_HASH_2B_CACHE) < 64:
                _HASH_2B_CACHE[ck] = K[:32]
            return K[:32]


def _obj_key_aes(file_key: bytes, num: int, gen: int = 0) -> bytes:
    """AESV2 per-object key: Algorithm 1 with the b'sAlT' suffix."""
    import hashlib

    k = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little") + b"sAlT"
    ).digest()
    return k[: min(len(file_key) + 5, 16)]


def _std_file_key(
    O: bytes, P: int, id0: bytes, R: int, keylen: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2 file key for the EMPTY user password. Step f: for
    R ≥ 4 with /EncryptMetadata false, 0xFFFFFFFF joins the MD5 input
    (ADVICE r3: omitting it failed valid AESV2/R4 files with
    unencrypted metadata)."""
    import hashlib

    md5_in = _PW_PAD + O[:32] + (P & 0xFFFFFFFF).to_bytes(4, "little") + id0
    if R >= 4 and not encrypt_metadata:
        md5_in += b"\xff\xff\xff\xff"
    h = hashlib.md5(md5_in).digest()
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


def _named_subdict(body: bytes, name: bytes) -> bytes | None:
    """bytes inside ``name << … >>`` (nested << >> balanced), or None
    when the key is absent or its value is not an inline dict."""
    m = re.search(name + rb"\s*<<", body)
    if not m:
        return None
    i, depth = m.end(), 1
    while i < len(body) and depth:
        two = body[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    return body[m.end() : i - 2] if not depth else None


def _strip_cf_subdict(enc_body: bytes) -> bytes:
    """remove the /CF << … >> crypt-filter sub-dictionary (with its
    nested << >> levels) so top-level key searches cannot match keys
    that belong to a crypt filter."""
    m = re.search(rb"/CF\s*<<", enc_body)
    if not m:
        return enc_body
    i, depth = m.end(), 1
    while i < len(enc_body) and depth:
        two = enc_body[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
        else:
            i += 1
    return enc_body[: m.start()] + enc_body[i:]


def _parse_enc_string(body: bytes, name: bytes) -> bytes | None:
    """/O or /U value: hex string or escaped literal."""
    m = re.search(name + rb"\s*<([0-9A-Fa-f\s]+)>", body)
    if m:
        return bytes.fromhex(re.sub(rb"\s", b"", m.group(1)).decode("ascii"))
    m = re.search(name + rb"\s*\(((?:[^()\\]|\\.)*)\)", body)
    if m:
        return _unescape_bytes(m.group(1))
    return None


def _maybe_decrypt(data: bytes) -> bytes:
    """transparently decrypt a standard-security-handler file with an
    empty user password, rewriting stream payloads and dict strings in
    place: RC4 (V1/V2, R2/R3), AES-128 (V4/R4, /CFM /AESV2 — or RC4
    under V4's /V2 crypt filter), AES-256 (V5/R6, /CFM /AESV3, the
    ISO 32000-2 scheme). Raises for password-protected files or other
    handlers (the caller converts that to ok=False + err)."""
    em = _search_trailer_dicts(data, _ENCRYPT_REF_RE)
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
    O = _parse_enc_string(enc_body, rb"/O")
    U = _parse_enc_string(enc_body, rb"/U")
    if O is None or U is None:
        raise ValueError("malformed /Encrypt dictionary")
    if (V, R) == (5, 6):
        # AES-256: Algorithm 2.A with the empty user password
        UE = _parse_enc_string(enc_body, rb"/UE")
        if UE is None or len(U) < 48:
            raise ValueError("malformed /Encrypt dictionary (V5 needs /U 48B + /UE)")
        if _hash_2b(b"", U[32:40], b"") != U[:32]:
            raise ValueError("password-protected PDF (empty user password rejected)")
        ik = _hash_2b(b"", U[40:48], b"")
        key = _aes_cbc_decrypt(ik, bytes(16), UE[:32], pad=False)
        cipher = "aes"
        per_object_key = False
    elif (V, R) == (4, 4) or (V in (1, 2) and R in (2, 3)):
        # the top-level /Length (key bits) must come from the /Encrypt
        # dict itself, NOT the /CF crypt-filter sub-dict whose /Length
        # is a BYTE count — '/CF << /StdCF << /CFM /V2 /Length 16 >> >>'
        # before '/Length 128' is legal ordering and used to yield a
        # 2-byte key (valid files rejected as password-protected)
        lm = re.search(rb"/Length\s+(\d+)(?!\d)", _strip_cf_subdict(enc_body))
        if lm:
            keylen = int(lm.group(1)) // 8
        elif V == 4:
            # ISO 32000-1 defines the top-level /Length only for V 2/3;
            # a conformant V4 file carries the key length in the crypt
            # filter's /Length instead (bytes per spec, though some
            # writers store bits — ≥40 can only be a bit count)
            cm = re.search(rb"/CF\s*<<.*?/Length\s+(\d+)(?!\d)", enc_body, re.DOTALL)
            n = int(cm.group(1)) if cm else 5
            keylen = n // 8 if n >= 40 else n
        else:
            keylen = 5
        if V == 4:
            cfm = re.search(rb"/CFM\s*/(\w+)", enc_body)
            name = cfm.group(1) if cfm else b""
            if name == b"AESV2":
                cipher = "aes"
                keylen = 16
            elif name == b"V2":
                cipher = "rc4"
            else:
                raise ValueError(
                    f"unsupported crypt filter /CFM /{name.decode('ascii', 'replace')}"
                )
        else:
            cipher = "rc4"
        pm = re.search(rb"/P\s+(-?\d+)", enc_body)
        idm = _search_trailer_dicts(data, _ID_RE)
        if pm is None or idm is None:
            raise ValueError("malformed /Encrypt dictionary")
        id0 = bytes.fromhex(idm.group(1).decode("ascii"))
        enc_meta = not re.search(rb"/EncryptMetadata\s+false\b", enc_body)
        key = _std_file_key(O, int(pm.group(1)), id0, R, keylen, enc_meta)
        if not _std_user_check(key, U, R, id0):
            raise ValueError("password-protected PDF (empty user password rejected)")
        per_object_key = True
    else:
        raise ValueError(
            f"unsupported encryption (V={V} R={R}; RC4 V1/V2, AESV2 V4/R4, AESV3 V5/R6)"
        )

    def _dec(ok: bytes, raw: bytes) -> bytes:
        if cipher == "rc4":
            return _rc4(ok, raw)
        # the stream regex captures the EOL preceding `endstream`,
        # which is not stream data: trim to AES block alignment
        raw = raw[: len(raw) - (len(raw) % 16)]
        if len(raw) < 32:  # IV + at least the padding block
            raise ValueError("AES payload too short")
        return _aes_cbc_decrypt(ok, raw[:16], raw[16:])

    def decrypt_block(num: int, body: bytes) -> bytes:
        if num == enc_num:
            return body
        ok = (_obj_key_aes if cipher == "aes" else _obj_key)(key, num) if per_object_key else key
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
                raw = _unescape_bytes(m.group(2))
            return b"(" + _esc(_dec(ok, raw).decode("latin-1")).encode("latin-1") + b")"

        combined = re.compile(_DICT_HEXSTR_RE.pattern + rb"|" + _STR_RE.pattern)
        dict_part = combined.sub(_string_repl, dict_part)
        if not sm:
            return dict_part
        # ciphertext is exactly /Length bytes; the regex capture also
        # grabs the framing EOL before 'endstream', which under RC4 (a
        # stream cipher) would decrypt to a trailing garbage byte
        payload = sm.group(1)
        # (?!\d) stops the indirect-ref lookahead from backtracking
        # into a digit prefix: '/Length 128 0 R' must NOT capture '12'
        lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", body[: sm.start()])
        if lm and int(lm.group(1)) <= len(payload):
            payload = payload[: int(lm.group(1))]
        elif payload.endswith(b"\n"):
            # no usable /Length: strip ONLY the framing LF. A preceding
            # \r is ambiguous (CRLF framing vs data-0x0D + LF framing)
            # and losing a real ciphertext byte is the worse failure —
            # CRLF-framed files leave one trailing garbage byte instead
            payload = payload[:-1]
        return (
            dict_part
            + b"stream\n"
            + _dec(ok, payload)
            # standard EOL before endstream (§7.3.8.1, not part of the
            # data): real writers encrypt exactly /Length bytes, so the
            # plaintext rarely ends with \n — without this the image
            # regex (which requires '\nendstream' to strip the EOL)
            # never matched and pdf_images returned [] for every real
            # encrypted PDF
            + b"\nendstream"
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
        elif re.search(rb"/Encoding\s*/WinAnsiEncoding\b", fb):
            # Word-family writers: 0x80-0x9F are smart quotes/dashes in
            # WinAnsi (cp1252) — latin-1 turned them into control chars
            cmap = ("simple", "cp1252")
        elif re.search(rb"/Encoding\s*/MacRomanEncoding\b", fb):
            cmap = ("simple", "mac_roman")
        # /Differences arrays keep the None (≈StandardEncoding/latin-1)
        # approximation — a glyph-name table guessed from memory would
        # produce wrong text that LOOKS decoded
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
    return _decode_simple(bytes.fromhex(h.decode("ascii")), cmap)


def _decode_simple(bts: bytes, cmap) -> str:
    """simple-font show bytes → text: the font's declared base encoding
    when _page_fonts resolved one, latin-1 otherwise."""
    if isinstance(cmap, tuple) and cmap[0] == "simple":
        return bts.decode(cmap[1], "replace")
    return bts.decode("latin-1")
# metadata values appear as literal strings OR hex strings (Ghostscript
# writes '/Title <FEFF...>'); nested balanced parens are legal in titles
_INFO_FIELD_RE = {
    "title": re.compile(
        rb"/Title\s*(?:\((" + _LITSTR_INNER + rb")\)|<([0-9A-Fa-f\s]*)>)"
    ),
    "author": re.compile(
        rb"/Author\s*(?:\((" + _LITSTR_INNER + rb")\)|<([0-9A-Fa-f\s]*)>)"
    ),
}
_PAGE_COUNT_RE = re.compile(rb"/Type\s*/Pages\b[^>]*?/Count\s+(\d+)")
_COUNT_NUM_RE = re.compile(rb"/Count\s+(\d+)")
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image\b")

_UNESC = {
    b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t",
    b"\\b": b"\x08", b"\\f": b"\x0c",
}


_XMP_META_TYPE_RE = re.compile(rb"/Type\s*/Metadata\b")
_XMP_TITLE_RE = re.compile(
    rb"<dc:title>.*?<rdf:li[^>]*>(.*?)</rdf:li>", re.DOTALL
)
_XMP_CREATOR_RE = re.compile(
    rb"<dc:creator>.*?<rdf:li[^>]*>(.*?)</rdf:li>", re.DOTALL
)
_XML_ENTS = {b"&lt;": b"<", b"&gt;": b">", b"&quot;": b'"', b"&apos;": b"'", b"&amp;": b"&"}


def _xmp_text(raw: bytes) -> str | None:
    t = raw.strip()
    if not t:
        return None
    for ent, ch in _XML_ENTS.items():  # &amp; last so it can't double-expand
        t = t.replace(ent, ch)
    return t.decode("utf-8", "replace")  # XMP packets are UTF-8


def _xmp_title_author(data: bytes, objs: dict[int, bytes]) -> tuple:
    """(title, author) from the XMP packet's dc:title/dc:creator first
    rdf:li (x-default/first-author convention) — the metadata home for
    writers that leave the Info dict empty. Flate-compressed packets
    (legal, rarer) are decoded via the stream's declared filter."""
    for body in objs.values():
        if not _XMP_META_TYPE_RE.search(body):
            continue
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        blob = sm.group(1)
        try:
            blob = _apply_filters(body, blob)
        except (ValueError, zlib.error):
            pass  # undecodable: scan raw (usually uncompressed anyway)
        tm = _XMP_TITLE_RE.search(blob)
        am = _XMP_CREATOR_RE.search(blob)
        return (
            _xmp_text(tm.group(1)) if tm else None,
            _xmp_text(am.group(1)) if am else None,
        )
    return (None, None)


def _text_string(b: bytes) -> str:
    """decode a PDF *text string* (§7.9.2.2 — Info dict values, outline
    titles): UTF-16BE with BOM FE FF (what Word/Acrobat emit for ANY
    non-ASCII metadata — without this a real title decoded to
    'þÿ\\x00R…' mojibake), UTF-8 with BOM EF BB BF (PDF 2.0), else
    PDFDocEncoding approximated as latin-1 (identical over printable
    ASCII + 0xA0-0xFF; the 0x18-0x1F/0x80-0x9F accent/punct slots are
    the documented divergence — not reproduced from memory)."""
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", "replace")
    if b.startswith(b"\xef\xbb\xbf"):
        return b[3:].decode("utf-8", "replace")
    return b.decode("latin-1")


def _unescape(raw: bytes) -> str:
    """escape-resolved literal string as latin-1 text (content-stream
    show strings: byte codes are font-encoded, latin-1 is the simple-
    font approximation). Metadata text strings go through
    ``_text_string(_unescape_bytes(...))`` instead."""
    return _unescape_bytes(raw).decode("latin-1")


def _unescape_bytes(raw: bytes) -> bytes:
    if b"\\" not in raw:  # no escapes (the common case)
        return raw
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i : i + 1] == b"\\" and i + 1 < len(raw):
            pair = raw[i : i + 2]
            if pair in _UNESC:
                out += _UNESC[pair]
                i += 2
                continue
            nxt = raw[i + 1]
            if 0x30 <= nxt <= 0x37:  # \ddd octal (1-3 digits, §7.3.4.2)
                # the standard way producers emit non-ASCII bytes in
                # literal strings — dropping the backslash turned
                # 'Caf\351' into 'Caf351' (wrong text with ok=True)
                j = i + 2
                while j < len(raw) and j < i + 4 and 0x30 <= raw[j] <= 0x37:
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt in (0x0D, 0x0A):  # \<EOL>: line continuation — drop
                i += 2
                if nxt == 0x0D and i < len(raw) and raw[i] == 0x0A:
                    i += 1
                continue
            out += raw[i + 1 : i + 2]
            i += 2
            continue
        out += raw[i : i + 1]
        i += 1
    return bytes(out)


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
                    if m.group(1) is not None:
                        raw = _unescape_bytes(m.group(1))
                    else:
                        h = re.sub(rb"\s", b"", m.group(2))
                        if len(h) % 2:  # odd count: implied trailing 0 (§7.3.4.3)
                            h += b"0"
                        raw = bytes.fromhex(h.decode("ascii"))
                    res[field] = _text_string(raw)
                    break
        if res["title"] is None or res["author"] is None:
            # XMP fallback: many modern writers fill only the XMP packet
            # (/Type /Metadata stream, uncompressed by convention so
            # XMP-aware tools can scan for it), not the Info dict
            xt, xa = _xmp_title_author(data, objs)
            res["title"] = res["title"] if res["title"] is not None else xt
            res["author"] = res["author"] if res["author"] is not None else xa
        res["npages"] = len(order) if order else None
        if res["npages"] is None:
            # per-object: key order is arbitrary, so /Type /Pages and
            # /Count are independent searches within one object body
            # (NOT over the whole file — outlines carry /Count too)
            for body in objs.values():
                if _PAGES_TYPE_RE.search(body):
                    m = _COUNT_NUM_RE.search(body)
                    if m:
                        res["npages"] = int(m.group(1))
                        break
        if res["npages"] is None:
            m = _PAGE_COUNT_RE.search(data)  # ordered whole-file fallback
            if m:
                res["npages"] = int(m.group(1))
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
_IMG_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\nendstream", re.DOTALL)


# --- inline images (§8.9.7 BI…ID…EI): poppler's pdfimages extracts
# these, so the OCR tier must see them too --------------------------------
_INLINE_FILTER_ABBREV = {
    b"AHx": b"ASCIIHexDecode", b"A85": b"ASCII85Decode",
    b"LZW": b"LZWDecode", b"Fl": b"FlateDecode", b"RL": b"RunLengthDecode",
    b"CCF": b"CCITTFaxDecode", b"DCT": b"DCTDecode",
}
_INLINE_BI_RE = re.compile(rb"\bBI\b(.*?)\bID[\r\n ]", re.DOTALL)
_INLINE_EI_RE = re.compile(rb"[\r\n ]EI(?=[\s\]>/(]|$)")
# dict-shaped params only: '…BI… …ID…' appearing inside page TEXT must
# not be misread as an image (binary data has no length header — the
# EI heuristic is only safe when the BI…ID span really is a dict)
_INLINE_PARAMS_OK_RE = re.compile(
    rb"(?:\s*/\w+\s*(?:/\w+|[\d.]+|\[[^\]]*\]|true|false|<<[^>]*>>))*\s*"
)


def _inline_images(content: bytes) -> list[bytes]:
    """payloads of every BI…ID…EI inline image in a DECODED content
    stream, inline filters (abbreviated or full names) applied; image-
    codec payloads (DCT/CCF) pass through raw, matching the XObject
    policy."""
    out: list[bytes] = []
    pos = 0
    while True:
        m = _INLINE_BI_RE.search(content, pos)
        if not m:
            break
        params = m.group(1)
        if _INLINE_PARAMS_OK_RE.fullmatch(params) is None:
            pos = m.start() + 2
            continue
        em = _INLINE_EI_RE.search(content, m.end())
        if not em:
            break
        payload = content[m.end() : em.start()]
        fm = re.search(rb"/(?:F|Filter)\s*(/\w+|\[(?:\s*/\w+)*\s*\])", params)
        if fm:
            names = re.findall(rb"/(\w+)", fm.group(1))
            full = b" ".join(
                b"/" + _INLINE_FILTER_ABBREV.get(n, n) for n in names
            )
            try:
                payload = _apply_filters(
                    b"<< /Filter [ " + full + b" ] >>", payload, image=True
                )
            except (ValueError, zlib.error):
                pass  # undecodable envelope: keep raw payload
        out.append(payload)
        pos = em.end()
    return out


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
    # ONE object-map pass (images, page order, resources all derive
    # from it — a separate _OBJ_RE sweep doubled the per-file cost)
    objs = _collect_objects(data)
    images: dict[int, bytes] = {}
    file_order_pages: list[int] = []
    for num, body in objs.items():
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
    tree_order = _page_order(objs)
    page_nums = tree_order or file_order_pages
    out: list[dict] = []
    seen: set[int] = set()
    for page_i, pnum in enumerate(page_nums, start=1):
        page_body = objs.get(pnum, b"")
        # resources may be inline or an indirect '/Resources N 0 R'
        # (common in real files) — same resolution as _page_fonts
        rm = _RESOURCES_REF_RE.search(page_body)
        res = objs.get(int(rm.group(1)), b"") if rm else page_body
        # resource names are writer-chosen (/Im1, /X0, /Img3, …): scan
        # every indirect ref INSIDE the /XObject sub-dict and filter by
        # the image map. Scoping to /XObject (not the whole page body)
        # keeps non-painted refs — /Thumb thumbnails, /Annots — out of
        # the painted-image list, matching pdfimages' numbering; the
        # per-page set collapses a name bound twice to one object
        xobj = _named_subdict(res, rb"/XObject")
        if xobj is None:
            xm = re.search(rb"/XObject\s+(\d+)\s+0\s+R", res)
            if xm:  # the /XObject dict itself may be indirect
                xobj = objs.get(int(xm.group(1)), b"")
            else:  # no /XObject key at all: scan the resources as-is
                xobj = b"" if rb"/XObject" in res else res
        page_seen: set[int] = set()
        for num in (int(r) for r in _REF_RE.findall(xobj)):
            if num in images and num not in page_seen:
                out.append({"page_i": page_i, "image": images[num]})
                page_seen.add(num)
                seen.add(num)
        # inline images (BI…ID…EI) live in the page's content stream —
        # pdfimages extracts them, so the OCR tier must too
        cm = _CONTENTS_RE.search(page_body)
        if cm:
            refs = (
                [int(cm.group(1))]
                if cm.group(1)
                else [int(r) for r in _REF_RE.findall(cm.group(2))]
            )
            for r in refs:
                body = objs.get(r)
                if body is None:
                    continue
                sm = _STREAM_RE.search(body)
                if not sm:
                    continue
                blob = sm.group(1)
                try:
                    blob = _apply_filters(body, blob)
                except (ValueError, zlib.error):
                    continue  # undecodable content stream: no inline scan
                if b"BI" not in blob:  # cheap gate before the regex walk
                    continue
                for payload in _inline_images(blob):
                    out.append({"page_i": page_i, "image": payload})
    for num, blob in images.items():
        if num not in seen:
            out.append({"page_i": 0, "image": blob})
    return out
