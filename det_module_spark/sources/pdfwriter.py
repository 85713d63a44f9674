"""Minimal pure-Python PDF 1.4 writer (K3 render path).

The reference renders request documentation to PDF via reportlab
(queue/documentation_tool.py:74,530-531); reportlab is not bundled in
this container, so this module implements the subset of the PUBLIC PDF
1.4 format (ISO 32000 / Adobe PDF Reference) the doc builder needs:
Helvetica text pages with uncompressed content streams, a correct
cross-reference table, and a standard trailer. Any conforming reader
(and the byte-level pytest) can parse the output; when reportlab IS
importable, DocBuilder.to_pdf prefers it (richer layout) and this
writer is the always-available fallback — the same gate-with-fallback
pattern as sources/tiff.py vs rasterio.

Layout model: one *page sequence* per section; lines wrap at a fixed
column and paginate at a fixed line count. Only WinAnsi-encodable
text is emitted (other codepoints degrade to '?'), which keeps the
file free of font-embedding machinery.
"""

from __future__ import annotations

PAGE_W, PAGE_H = 612, 792  # US letter, 1/72 inch units
MARGIN = 72
LEADING = 14
FONT_SIZE = 11
LINES_PER_PAGE = (PAGE_H - 2 * MARGIN) // LEADING  # 46
MAX_COLS = 90


def _escape(text: str) -> bytes:
    """PDF string-literal escaping: backslash, parens; non-Latin-1
    degrades to '?' (no font embedding in a minimal writer)."""
    out = []
    for ch in text:
        if ch in "\\()":
            out.append("\\" + ch)
        elif 32 <= ord(ch) < 256:
            out.append(ch)
        else:
            out.append("?")
    return "".join(out).encode("latin-1")


def _wrap(line: str, width: int = MAX_COLS) -> list[str]:
    if len(line) <= width:
        return [line]
    out, cur = [], ""
    for word in line.split(" "):
        while len(word) > width:  # unbroken token: hard split
            if cur:
                out.append(cur)
                cur = ""
            out.append(word[:width])
            word = word[width:]
        if not cur:
            cur = word
        elif len(cur) + 1 + len(word) <= width:
            cur = cur + " " + word
        else:
            out.append(cur)
            cur = word
    if cur:
        out.append(cur)
    return out


def _content_stream(lines: list[str]) -> bytes:
    """One page's content: a text object advancing one leading per
    line. ``T*`` moves to the next line (TL set once)."""
    parts = [
        b"BT",
        b"/F1 %d Tf" % FONT_SIZE,
        b"%d TL" % LEADING,
        b"%d %d Td" % (MARGIN, PAGE_H - MARGIN),
    ]
    for i, ln in enumerate(lines):
        if i:
            parts.append(b"T*")
        parts.append(b"(" + _escape(ln) + b") Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def paginate(lines: list[str]) -> list[list[str]]:
    """Wrap long lines, then split into page-sized chunks."""
    wrapped: list[str] = []
    for ln in lines:
        wrapped.extend(_wrap(ln))
    if not wrapped:
        wrapped = [""]
    n = int(LINES_PER_PAGE)
    return [wrapped[i : i + n] for i in range(0, len(wrapped), n)]


def write_pdf(path: str, pages: list[list[str]]) -> str:
    """Serialize pre-paginated text pages to ``path`` as PDF 1.4.

    Object layout: 1 Catalog, 2 Pages, 3 Font, then alternating
    (Page, Contents) pairs. Offsets are recorded as objects are
    emitted so the xref table is exact — the byte-parsing test
    re-reads every offset and checks it lands on ``N 0 obj``.
    """
    if not pages:
        pages = [[""]]
    buf = bytearray()
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(b"%d 0 obj\n" % num)
        buf.extend(body)
        buf.extend(b"\nendobj\n")

    buf.extend(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")  # binary-marker comment
    n_pages = len(pages)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_ids) + b"]"
    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(
        2,
        b"<< /Type /Pages /Kids %s /Count %d >>" % (kids, n_pages),
    )
    emit(
        3,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>",
    )
    for i, lines in enumerate(pages):
        pid, cid = page_ids[i], page_ids[i] + 1
        emit(
            pid,
            b"<< /Type /Page /Parent 2 0 R"
            b" /MediaBox [0 0 %d %d]" % (PAGE_W, PAGE_H)
            + b" /Resources << /Font << /F1 3 0 R >> >>"
            + b" /Contents %d 0 R >>" % cid,
        )
        stream = _content_stream(lines)
        emit(
            cid,
            b"<< /Length %d >>\nstream\n" % len(stream)
            + stream
            + b"\nendstream",
        )
    # xref: one free entry + every object, contiguous from 1
    n_obj = 3 + 2 * n_pages
    xref_off = len(buf)
    buf.extend(b"xref\n0 %d\n" % (n_obj + 1))
    buf.extend(b"0000000000 65535 f \n")
    for num in range(1, n_obj + 1):
        buf.extend(b"%010d 00000 n \n" % offsets[num])
    buf.extend(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_obj + 1, xref_off)
    )
    with open(path, "wb") as f:
        f.write(bytes(buf))
    return path
