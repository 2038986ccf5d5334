"""From-scratch searchable-PDF writer (W3): structure, determinism, and the
reference's pagination quirk (export.py:238-489)."""

from ocr_ray.kernels import pdfgen


PAGE = [("Olá", 100.0, 220.0, 140.0), ("mundo!", 240.0, 400.0, 140.0)]


def test_pdf_structure_and_determinism():
    entries = [("mundo!", {"count": 1, "pages": "1"}), ("olá", {"count": 1, "pages": "1"})]
    pdf = pdfgen.searchable_pdf([PAGE], entries)
    assert pdf == pdfgen.searchable_pdf([PAGE], entries)  # byte-deterministic
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    # 1 content page + 1 index page
    assert b"/Count 2" in pdf
    # invisible render mode + horizontal scaling on the text layer
    assert b"3 Tr /F1 8 Tf" in pdf and b" Tz " in pdf
    # index page: visible Helvetica title + bold entries
    assert b"/F2 38 Tf" in pdf
    assert pdfgen._pdf_string(pdfgen.INDEX_TITLE) in pdf
    assert b"/F3 20 Tf" in pdf
    # xref offsets resolve: every object's recorded offset points at "N 0 obj"
    xref_pos = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert pdf[xref_pos:xref_pos + 4] == b"xref"


def test_text_layer_placement_math():
    placed = pdfgen.page_word_placements([("word", 300.0, 600.0, 200.0)])
    [(text, x, y, scale)] = placed
    assert text == "word"
    assert x == 300.0 * 0.5
    assert y == pdfgen.PAGE_H - 200.0 * 0.5
    box_w = (600.0 - 300.0) * 0.5
    assert abs(scale - 100.0 * box_w / pdfgen.string_width("word", "F1", 8)) < 1e-9
    # zero-width strings are skipped like the reference's font_width<=0 guard
    assert pdfgen.page_word_placements([("", 0.0, 10.0, 10.0)]) == []


def test_index_pagination_reproduces_reference_quirk():
    """The reference steps index pages by the INITIAL rows*cols = 200 words
    but clamps rendered rows to 67×2 = 134 per page — words 135..200 of each
    page slice are silently dropped (export.py:420-478 'TODO')."""
    entries = [(f"w{i:04d}", {"count": 1, "pages": "1"}) for i in range(250)]
    pages = pdfgen.index_pages_content(entries)
    assert len(pages) == 2  # step stays 200: pages cover 0..199, 200..249
    n_bold_first = pages[0].count(b"/F3 20 Tf")
    assert n_bold_first == 134  # 2 cols x 67 clamped rows, not 200
    n_bold_second = pages[1].count(b"/F3 20 Tf")
    assert n_bold_second == 50  # remaining slice fits (25 rows x 2 cols)


def test_string_width_afm_values():
    # Times-Roman 'Hello' at 8pt from the published AFM table
    w = pdfgen.string_width("Hello", "F1", 8)
    expect = (722 + 444 + 278 + 278 + 500) * 8 / 1000.0
    assert abs(w - expect) < 1e-9
    # non-ASCII falls back to the 500/1000 em default
    assert pdfgen.string_width("é", "F1", 10) == 5.0
