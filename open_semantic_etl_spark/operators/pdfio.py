"""Minimal PDF text-layer writer/parser (pure stdlib, deterministic).

Replaces the reference's subprocess calls to ``pdfinfo`` / ``pdftotext``
(enhance_pdf_page.py:62-98) and Tika's PDF path
(enhance_extract_text_tika_server.py:139-143) for the class of PDFs the
tests exercise: text-layer PDFs with (optionally Flate-compressed)
content streams using ``Tj`` / ``TJ`` / ``'`` text-show operators.
Real-world complex PDFs (CID fonts, encryption, object streams) return
``ok=False`` with an error message instead of wrong text — the pipeline
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
) -> bytes:
    """Serialize page texts into a minimal valid PDF.

    Each page's text is emitted line-by-line as ``(line) Tj`` show ops.
    ``n_images`` > 0 embeds that many 1x1 image XObjects so the
    needs-OCR predicate (enhance_pdf_ocr.py:130-155 analogue) has
    something to detect; ``images`` supplies explicit image payload
    bytes instead — a flat list (each referenced from every page) or a
    list-of-lists with one image set per page.
    """
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-based object number

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
            ops.append(b"(" + _esc(line).encode("latin-1", "replace") + b") Tj")
        for img in page_img_nums[pg]:
            ops.append(b"q 1 0 0 1 0 0 cm /Im%d Do Q" % img)
        ops.append(b"ET")
        stream = b"\n".join(ops)
        flags = b""
        if compress:
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

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += obj
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    trailer = b"<< /Size %d /Root %d 0 R" % (len(objects) + 1, catalog)
    if info:
        trailer += b" /Info %d 0 R" % info
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser — tolerant scan, no xref walking (robust to truncated files).
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_SHOW_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\]\\]|\\.)*\]\s*TJ")
_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
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
        page_texts: list[str] = []
        for m in _STREAM_RE.finditer(data):
            blob = m.group(1)
            try:
                blob = zlib.decompress(blob)
            except zlib.error:
                pass  # uncompressed or unsupported filter; try as-is
            if b"BT" not in blob or b"ET" not in blob:
                continue
            shows = _TEXT_SHOW_RE.findall(blob)
            if not shows:
                continue
            lines: list[str] = []
            for show in shows:
                for s in _STR_RE.findall(show):
                    lines.append(_unescape(s))
            page_texts.append("\n".join(lines))
        res["n_images"] = len(_IMAGE_RE.findall(data))
        for field, rx in _INFO_FIELD_RE.items():
            m = rx.search(data)
            if m:
                res[field] = _unescape(m.group(1))
        m = _PAGE_COUNT_RE.search(data)
        res["npages"] = int(m.group(1)) if m else len(page_texts)
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

    Walks ``N 0 obj … endobj`` blocks: image XObjects yield their
    stream payload (Flate-decoded when marked); ``/Type /Page`` objects
    yield, in document order, the object numbers of the images their
    Resources reference. Images referenced by no page come last with
    page_i = 0 — nothing is silently dropped.
    """
    if not data or not data.startswith(b"%PDF-"):
        return []
    images: dict[int, bytes] = {}
    page_refs: list[list[int]] = []
    for m in _OBJ_RE.finditer(data):
        num, body = int(m.group(1)), m.group(2)
        if rb"/Subtype" in body and _IMAGE_RE.search(body):
            sm = _IMG_STREAM_RE.search(body)
            if not sm:
                continue
            blob = sm.group(1)
            if b"/FlateDecode" in body:
                try:
                    blob = zlib.decompress(blob)
                except zlib.error:
                    pass
            images[num] = blob
        elif _PAGE_OBJ_RE.search(body):
            page_refs.append([int(r) for r in _XOBJ_REF_RE.findall(body)])
    out: list[dict] = []
    seen: set[int] = set()
    for page_i, refs in enumerate(page_refs, start=1):
        for num in refs:
            if num in images:
                out.append({"page_i": page_i, "image": images[num]})
                seen.add(num)
    for num, blob in images.items():
        if num not in seen:
            out.append({"page_i": 0, "image": blob})
    return out
