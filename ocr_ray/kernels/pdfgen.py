"""Minimal deterministic PDF 1.4 writer — the searchable-PDF export (W3)
without reportlab.

Parity targets (/root/reference/server/src/utils/export.py):
- invisible text layer per word: ``add_text_layer`` (export.py:533-568) —
  Times-Roman 8pt, render mode 3, x = l·dpi_out/dpi_in,
  y = H_out − b·dpi_out/dpi_in, horizontal scale stretching the string to
  the scaled box width;
- trailing word-index pages: export.py:386-478 — A4 @150 DPI (1240×1754),
  2 columns, "Índice de palavras" title in Helvetica 38 on the first index
  page, entries as Helvetica-Bold word + ``: pages`` in Helvetica 20pt,
  leading 24 (reportlab's 1.2×size). The reference's pagination quirk is
  REPRODUCED on purpose: the page step is fixed at 100·2 words from the
  initial ``rows`` value, but ``rows`` is then clamped to
  ``(h − 5·2·40)//20 = 67`` inside the loop, so each index page renders at
  most 134 of its 200 words and silently drops the rest (the reference's
  own "TODO: ensure full index is written").

Deviations (documented): the page raster under the text layer is omitted —
the raster arm is library-gated in this container (SURVEY.md M9/W6), so the
PDF carries the text layer only; Base14 font metrics are an embedded
Times-Roman AFM table for ASCII with a 500/1000 em fallback elsewhere
(reportlab ships full AFMs; the reference's stringWidth calls resolve the
same quantities). Output bytes are fully deterministic: fixed object order,
uncompressed content streams, no timestamps or IDs.
"""

from __future__ import annotations

DPI_IN = 300.0
DPI_OUT = 150.0
PAGE_W = 1240
PAGE_H = 1754

INDEX_ROWS = 100
INDEX_COLS = 2
INDEX_TITLE_SIZE = 38
INDEX_SIZE = 20
INDEX_MARGIN_X = 20
INDEX_MARGIN_Y_TITLE = 40
INDEX_MARGIN_Y = 2 * INDEX_MARGIN_Y_TITLE
INDEX_TITLE = "Índice de palavras"

# Adobe core-14 Times-Roman advance widths (per mille), chars 32..126 — the
# published AFM values every PDF viewer ships.
_TIMES_WIDTHS = [
    250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250, 333,
    250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278,
    564, 564, 564, 444, 921, 722, 667, 667, 722, 611, 556, 722, 722, 333,
    389, 722, 611, 889, 722, 722, 556, 722, 667, 556, 611, 722, 722, 944,
    722, 722, 611, 333, 278, 333, 469, 500, 333, 444, 500, 444, 500, 444,
    333, 500, 500, 278, 278, 500, 278, 778, 500, 500, 500, 500, 333, 389,
    278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541,
]
# Helvetica / Helvetica-Bold ASCII advances (published AFM values).
_HELV_WIDTHS = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]
_HELV_BOLD_WIDTHS = [
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 333, 333,
    584, 584, 584, 611, 975, 722, 722, 722, 722, 667, 611, 778, 722, 278,
    556, 722, 611, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 333, 278, 333, 584, 556, 333, 556, 611, 556, 611, 556,
    333, 611, 611, 278, 278, 556, 278, 889, 611, 611, 611, 611, 389, 556,
    333, 611, 556, 778, 556, 556, 500, 389, 280, 389, 584,
]

FONTS = {
    "F1": ("Times-Roman", _TIMES_WIDTHS),
    "F2": ("Helvetica", _HELV_WIDTHS),
    "F3": ("Helvetica-Bold", _HELV_BOLD_WIDTHS),
}
_DEFAULT_WIDTH = 500


def string_width(text: str, font: str, size: float) -> float:
    """Advance width in user units (reportlab ``stringWidth`` analogue)."""
    widths = FONTS[font][1]
    total = 0
    for ch in text:
        o = ord(ch)
        total += widths[o - 32] if 32 <= o <= 126 else _DEFAULT_WIDTH
    return total * size / 1000.0


def _pdf_string(text: str) -> bytes:
    """PDF literal string: latin-1 bytes (WinAnsi-compatible for our
    charset), parens/backslash escaped, unencodable chars replaced."""
    raw = text.encode("latin-1", errors="replace")
    return (
        b"(" + raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)") + b")"
    )


def _fmt(v: float) -> str:
    """Deterministic short number formatting for content streams."""
    s = f"{v:.2f}".rstrip("0").rstrip(".")
    return s if s else "0"


def invisible_text_content(words: list[tuple[str, float, float, float]]) -> bytes:
    """Content stream for one page of the invisible text layer.

    ``words`` = [(text, x, y, horiz_scale_percent)]; mirrors
    add_text_layer's reportlab calls: render mode 3, Times-Roman 8,
    per-word Tz horizontal scaling.
    """
    out = []
    for text, x, y, scale in words:
        out.append(
            b"BT 3 Tr /F1 8 Tf " + _fmt(scale).encode() + b" Tz "
            + _fmt(x).encode() + b" " + _fmt(y).encode() + b" Td "
            + _pdf_string(text) + b" Tj ET"
        )
    return b"\n".join(out)


def page_word_placements(
    spans: list[tuple[str, float, float, float]], page_h_out: float = PAGE_H
) -> list[tuple[str, float, float, float]]:
    """(text, left, right, baseline) per word → placement records, the exact
    math of add_text_layer (export.py:552-566): words whose Times-Roman 8pt
    width is zero are skipped."""
    placed = []
    k = DPI_OUT / DPI_IN
    for text, left, right, baseline in spans:
        font_width = string_width(text, "F1", 8)
        if font_width <= 0:
            continue
        x = left * k
        y = page_h_out - baseline * k
        box_width = (right - left) * k
        placed.append((text, x, y, 100.0 * box_width / font_width))
    return placed


def index_pages_content(index_entries: list[tuple[str, dict]]) -> list[bytes]:
    """Content streams for the trailing word-index pages (export.py:386-478),
    including the reference's fixed 200-word page step with the row clamp
    that drops words beyond 2×67 per page."""
    pages: list[bytes] = []
    rows = INDEX_ROWS
    step = INDEX_ROWS * INDEX_COLS  # range() step is bound BEFORE the clamp
    word_count = len(index_entries)
    leading = int(INDEX_SIZE * 1.2)
    for i in range(0, word_count, step):
        out = []
        set_words = index_entries[i : i + step]
        available_height = PAGE_H - 5 * INDEX_MARGIN_Y
        max_rows = available_height // INDEX_SIZE
        rows = min(max_rows, (len(set_words) - 1) // INDEX_COLS + 1)
        if i == 0:
            out.append(
                b"BT 0 Tr /F2 " + str(INDEX_TITLE_SIZE).encode() + b" Tf "
                + _fmt(INDEX_MARGIN_X).encode() + b" "
                + _fmt(PAGE_H - INDEX_MARGIN_Y_TITLE).encode() + b" Td "
                + _pdf_string(INDEX_TITLE) + b" Tj ET"
            )
        x = INDEX_MARGIN_X
        for col in range(INDEX_COLS):
            y = PAGE_H - INDEX_MARGIN_Y
            for row in range(rows):
                idx = col * rows + row
                if idx >= len(set_words):
                    break
                word, entry = set_words[idx]
                descript = f": {entry['pages']}"
                yy = y - leading * row
                out.append(
                    b"BT 0 Tr /F3 " + str(INDEX_SIZE).encode() + b" Tf "
                    + _fmt(x).encode() + b" " + _fmt(yy).encode() + b" Td "
                    + _pdf_string(word) + b" Tj ET"
                )
                wx = x + string_width(word, "F3", INDEX_SIZE)
                out.append(
                    b"BT 0 Tr /F2 " + str(INDEX_SIZE).encode() + b" Tf "
                    + _fmt(wx).encode() + b" " + _fmt(yy).encode() + b" Td "
                    + _pdf_string(descript) + b" Tj ET"
                )
            x += (PAGE_W - 2 * INDEX_MARGIN_X) // INDEX_COLS
        pages.append(b"\n".join(out))
    return pages


def build_pdf(pages: list[tuple[float, float, bytes]], title: str = "") -> bytes:
    """Assemble a complete, deterministic PDF 1.4 file.

    ``pages`` = [(width, height, content_stream)]. Object layout: catalog,
    pages tree, 3 Base14 fonts, then per page a Page node + content stream.
    Uncompressed streams, fixed ordering, byte-stable xref."""
    objs: list[bytes] = []

    def ref(n: int) -> bytes:
        return f"{n} 0 R".encode()

    n_fixed = 5  # catalog, pages, F1..F3
    page_ids = [n_fixed + 1 + 2 * i for i in range(len(pages))]
    kids = b" ".join(ref(p) for p in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(pages)).encode() + b" >>"
    )  # 2
    for i, key in enumerate(("F1", "F2", "F3")):  # 3..5
        name = FONTS[key][0].encode()
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /" + name
            + b" /Encoding /WinAnsiEncoding >>"
        )
    font_res = b"<< /F1 3 0 R /F2 4 0 R /F3 5 0 R >>"
    for i, (w, h, content) in enumerate(pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 "
            + _fmt(w).encode() + b" " + _fmt(h).encode()
            + b"] /Resources << /Font " + font_res + b" >> /Contents "
            + ref(page_ids[i] + 1) + b" >>"
        )
        objs.append(
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(buf)


def searchable_pdf(
    page_spans: list[list[tuple[str, float, float, float]]],
    index_entries: list[tuple[str, dict]] | None,
) -> bytes:
    """Full searchable PDF for one document: one text-layer page per input
    page (A4 @150 DPI), then the trailing index pages (unless None —
    ``simple=True`` parity)."""
    pages = [
        (PAGE_W, PAGE_H, invisible_text_content(page_word_placements(spans)))
        for spans in page_spans
    ]
    if index_entries is not None:
        pages.extend(
            (PAGE_W, PAGE_H, content) for content in index_pages_content(index_entries)
        )
    return build_pdf(pages)
