"""Real-binary adapter smoke tests — auto-promoting (round-4 verdict,
next-round #9): each test ``importorskip``s the real library, so in this
container (no PIL / pypdfium2 / tesserocr) the whole module SKIPS cleanly,
and in any environment that ships the libraries the same suite exercises
the ~150 lines of real-adapter code end-to-end with no code change.

The fake-seam contract tests live in test_adapters.py; these are their
real-world twins."""

import io

import pytest


def test_real_tiff_multiframe_explode():
    """S3 real branch: a 2-frame TIFF written by PIL must explode into two
    PNG frames in frame order (reference parity: celery_app multi-frame
    loop)."""
    Image = pytest.importorskip("PIL.Image")

    from ocr_ray.sources.payloads import explode_tiff, sniff_format

    f0 = Image.new("L", (8, 6), 255)
    f1 = Image.new("L", (8, 6), 0)
    buf = io.BytesIO()
    f0.save(buf, format="TIFF", save_all=True, append_images=[f1])
    data = buf.getvalue()

    assert sniff_format(data) == "tiff"
    frames = explode_tiff(data)
    assert len(frames) == 2
    # frames re-encode as PNG; decode back and check the payload survived
    a = Image.open(io.BytesIO(frames[0]))
    b = Image.open(io.BytesIO(frames[1]))
    assert a.size == (8, 6) and b.size == (8, 6)
    assert a.getpixel((0, 0)) == 255 and b.getpixel((0, 0)) == 0


def test_real_pdf_render_explode():
    """S1 real branch: pypdfium2 renders each page at the reference's
    300/72 scale (celery_app.py:896-898)."""
    pdfium = pytest.importorskip("pypdfium2")

    from ocr_ray.kernels.pdfgen import searchable_pdf
    from ocr_ray.sources.payloads import explode_pdf, sniff_format

    # the repo's own deterministic PDF writer provides the input — no
    # external fixture needed (one page, two placed words, no index pages)
    pdf_bytes = searchable_pdf(
        [[("hello", 100.0, 200.0, 230.0), ("world", 400.0, 200.0, 230.0)]],
        None)
    assert sniff_format(pdf_bytes) == "pdf"
    doc = pdfium.PdfDocument(io.BytesIO(pdf_bytes))
    assert len(doc) >= 1
    pages = explode_pdf(pdf_bytes)
    assert len(pages) == len(doc)
    assert all(isinstance(p, bytes) and p for p in pages)


def test_real_tesserocr_engine_smoke():
    """M3 real branch: the warm-actor tesserocr adapter OCRs a rendered
    page and yields a non-empty hOCR span set."""
    pytest.importorskip("tesserocr")

    import random

    from ocr_ray.config import OcrConfig
    from ocr_ray.engines.tesseract import TesserocrEngine
    from ocr_ray.synth import _page_png

    engine = TesserocrEngine(OcrConfig())
    page = _page_png(random.Random(7))
    hocr = engine.recognize(page)
    assert "ocrx_word" in hocr


def test_real_pytesseract_engine_smoke():
    """M4 real branch: the subprocess adapter against a real tesseract
    binary."""
    pytest.importorskip("pytesseract")

    import random

    from ocr_ray.config import OcrConfig
    from ocr_ray.engines.pytesseract_engine import PytesseractEngine
    from ocr_ray.synth import _page_png

    engine = PytesseractEngine(OcrConfig())
    page = _page_png(random.Random(7))
    hocr = engine.recognize(page)
    assert hocr
