"""Contract tests for the library-gated real adapters (M3/M4, S1/S3 real
branches). The sandbox has no tesserocr/pytesseract/PIL/pypdfium2, so each
test injects a recording FAKE module at the import seam and drives the real
adapter code over it — the adapter logic (init-once warm state, per-call
parameter re-application, SetRectangle segment semantics, white-fill
masking, block-box mapping, render scaling, frame iteration) executes for
real and is asserted against the reference behaviours:

- tesserocr adapter: ocr_tesserocr.py:64-215 (but init ONCE per actor,
  not per call — the engine-warmth upgrade documented in the adapter);
- pytesseract adapter: ocr_pytesseract.py:42-189;
- PDF page render: celery_app.py:887-942 (300/72 scale);
- TIFF frame loop: celery_app.py:470-492.
"""

from __future__ import annotations

import importlib
import io
import sys
import types

import pytest

from ocr_ray.config import OcrConfig

HOCR = """
<div class='ocr_page' title='bbox 0 0 2480 3508'>
 <p class='ocr_par' title='bbox 100 100 900 160'>
  <span class='ocr_line' title='bbox 100 100 900 160; baseline 0 -10'>
   <span class='ocrx_word' title='bbox 100 100 400 160; x_wconf 95'>Ola</span>
   <span class='ocrx_word' title='bbox 420 100 900 160; x_wconf 91'>mundo</span>
  </span>
 </p>
</div>
"""


class _FakeImage:
    def __init__(self, data=b"img"):
        self.data = data
        self.crops: list = []
        self.size = (2480, 3508)

    def convert(self, mode):
        return self

    def crop(self, box):
        out = _FakeImage(self.data + b"|crop")
        out.crops = self.crops + [box]
        return out

    def save(self, buf, format=None):
        buf.write(b"PNGOUT:" + self.data)


def _fake_pil(record):
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    def open_(fp):
        img = _FakeImage(fp.read() if hasattr(fp, "read") else bytes(fp))
        record.setdefault("opened", []).append(img)
        return img

    image_mod.open = open_
    image_mod.Image = _FakeImage

    draw_mod = types.ModuleType("PIL.ImageDraw")

    class _Draw:
        def __init__(self, img):
            self.img = img

        def rectangle(self, box, fill=None):
            record.setdefault("rects", []).append((tuple(box), fill))

    draw_mod.Draw = _Draw
    pil.Image = image_mod
    pil.ImageDraw = draw_mod
    return {"PIL": pil, "PIL.Image": image_mod, "PIL.ImageDraw": draw_mod}


@pytest.fixture
def seam(monkeypatch):
    """Inject fake modules, import the adapter fresh, clean up after."""

    def load(module_name: str, fakes: dict):
        for name, mod in fakes.items():
            monkeypatch.setitem(sys.modules, name, mod)
        sys.modules.pop(module_name, None)
        mod = importlib.import_module(module_name)
        return mod

    yield load
    for name in ("ocr_ray.engines.tesseract", "ocr_ray.engines.pytesseract_engine"):
        sys.modules.pop(name, None)


def test_tesserocr_adapter_contract(seam):
    record: dict = {}
    tess = types.ModuleType("tesserocr")
    tess.OEM = int
    tess.PSM = int

    class _RIL:
        BLOCK = "BLOCK"

    tess.RIL = _RIL

    class PyTessBaseAPI:
        instances: list = []

        def __init__(self, lang=None, oem=None, psm=None):
            self.init_args = {"lang": lang, "oem": oem, "psm": psm}
            self.calls: list = []
            PyTessBaseAPI.instances.append(self)

        def SetVariable(self, k, v):
            self.calls.append(("SetVariable", k, v))

        def SetImage(self, img):
            self.calls.append(("SetImage", img.data))

        def SetSourceResolution(self, dpi):
            self.calls.append(("SetSourceResolution", dpi))

        def SetRectangle(self, left, top, w, h):
            self.calls.append(("SetRectangle", left, top, w, h))

        def GetHOCRText(self, page):
            self.calls.append(("GetHOCRText", page))
            return HOCR

        def GetComponentImages(self, level, text_only=None, raw_padding=None):
            self.calls.append(("GetComponentImages", level, text_only, raw_padding))
            return [(None, {"x": 10, "y": 20, "w": 300, "h": 40})]

        def End(self):
            pass

    tess.PyTessBaseAPI = PyTessBaseAPI
    PyTessBaseAPI.instances = []

    fakes = {"tesserocr": tess, **_fake_pil(record)}
    mod = seam("ocr_ray.engines.tesseract", fakes)

    config = OcrConfig(
        engine="tesseract", lang=("por", "eng"), dpi=300,
        other_params=(("tessedit_char_whitelist", "abc"),),
    )
    eng = mod.TesserocrEngine(config)
    # ONE warm API per engine, initialized with the joined lang spec
    assert len(PyTessBaseAPI.instances) == 1
    api = PyTessBaseAPI.instances[0]
    assert api.init_args == {"lang": "por+eng", "oem": 3, "psm": 3}
    assert ("SetVariable", "tessedit_char_whitelist", "abc") in api.calls

    hocr = eng.recognize(b"pagebytes")
    assert hocr == HOCR
    assert ("SetImage", b"pagebytes") in api.calls
    assert ("SetSourceResolution", 300) in api.calls
    # per-call param re-application keeps a reused actor deterministic
    assert ("SetVariable", "thresholding_method", "0") in api.calls

    # the hOCR flows through the shared parser to the reference word shape
    from ocr_ray.kernels.hocr import parse_hocr

    tree = parse_hocr(hocr)
    words = [w["text"] for par in tree for line in par for w in line]
    assert words == ["Ola", "mundo"]

    # segment OCR: SetRectangle gets (left, top, WIDTH, HEIGHT)
    eng.recognize(b"pagebytes", segment_box=[100.0, 200.0, 500.0, 400.0])
    assert ("SetRectangle", 100, 200, 400, 200) in api.calls

    # warm state: still exactly one API instance after three calls
    eng.get_boxes(b"pagebytes")
    assert len(PyTessBaseAPI.instances) == 1
    assert eng.get_boxes(b"pagebytes") == [(10, 20, 300, 40)]

    # white-fill masking (celery_app.py:1083-1092): one rect per box, PNG out
    out = eng.mask(b"pagebytes", [[1, 2, 3, 4], [5, 6, 7, 8]])
    assert record["rects"] == [((1, 2, 3, 4), "white"), ((5, 6, 7, 8), "white")]
    assert out.startswith(b"PNGOUT:")
    assert eng.mask(b"pagebytes", []) == b"pagebytes"  # no-op guard


def test_pytesseract_adapter_contract(seam):
    record: dict = {}
    pyt = types.ModuleType("pytesseract")
    calls: list = []

    def image_to_pdf_or_hocr(img, lang=None, config=None, extension=None):
        calls.append(("hocr", img, lang, config, extension))
        return HOCR.encode("utf-8")

    class Output:
        DICT = "dict"

    def image_to_data(img, lang=None, config=None, output_type=None):
        calls.append(("data", lang, config, output_type))
        return {
            "level": [1, 2, 3, 2],
            "left": [0, 10, 11, 50],
            "top": [0, 20, 21, 60],
            "width": [0, 300, 30, 200],
            "height": [0, 40, 10, 30],
        }

    pyt.image_to_pdf_or_hocr = image_to_pdf_or_hocr
    pyt.image_to_data = image_to_data
    pyt.Output = Output

    fakes = {"pytesseract": pyt, **_fake_pil(record)}
    mod = seam("ocr_ray.engines.pytesseract_engine", fakes)

    config = OcrConfig(
        engine="pytesseract", lang=("por",), dpi=150,
        other_params=(("preserve_interword_spaces", "1"),),
    )
    # CLI config string parity (ocr_pytesseract.py:164-189)
    assert mod.build_config_string(config) == (
        "--oem 3 --psm 3 --dpi 150 -c thresholding_method=0"
        " -c preserve_interword_spaces=1"
    )

    eng = mod.PytesseractEngine(config)
    assert eng.recognize(b"page") == HOCR
    kind, img, lang, cfg, ext = calls[0]
    assert (kind, lang, ext) == ("hocr", "por", "hocr")
    assert cfg == eng.config_str and img.crops == []

    # segment recognition crops BEFORE the subprocess call
    eng.recognize(b"page", segment_box=[10.0, 20.0, 110.0, 220.0])
    assert calls[1][1].crops == [(10, 20, 110, 220)]

    # block-level (level==2) boxes only
    assert eng.get_boxes(b"page") == [(10.0, 20.0, 300.0, 40.0),
                                      (50.0, 60.0, 200.0, 30.0)]


def test_real_pdf_explode_contract(seam, monkeypatch):
    """S1 real branch: pypdfium2 render at the reference's 300/72 scale,
    page order preserved (celery_app.py:887-942)."""
    pdfium = types.ModuleType("pypdfium2")
    scales: list = []

    class _Bitmap:
        def __init__(self, n):
            self.n = n

        def to_pil(self):
            bm = self

            class _P:
                def tobytes(self):
                    return b"page%d" % bm.n

            return _P()

    class _Page:
        def __init__(self, n):
            self.n = n

        def render(self, scale=None):
            scales.append(scale)
            return _Bitmap(self.n)

    class PdfDocument:
        def __init__(self, src):
            self.pages = [_Page(0), _Page(1), _Page(2)]

        def __iter__(self):
            return iter(self.pages)

    pdfium.PdfDocument = PdfDocument
    monkeypatch.setitem(sys.modules, "pypdfium2", pdfium)

    from ocr_ray.sources.payloads import explode_pdf

    pages = explode_pdf(b"%PDF-1.7 realpdfbytes")
    assert pages == [b"page0", b"page1", b"page2"]
    assert scales == [300 / 72] * 3


def test_real_tiff_explode_contract(seam, monkeypatch):
    """S3 real branch: PIL frame loop with seek(i) + per-frame PNG re-encode
    (celery_app.py:470-492)."""
    record: dict = {}
    fakes = _fake_pil(record)

    class _Tiff:
        n_frames = 3

        def __init__(self):
            self.frame = 0

        def seek(self, i):
            self.frame = i

        def save(self, buf, format=None):
            assert format == "PNG"
            buf.write(b"frame%d" % self.frame)

    fakes["PIL.Image"].open = lambda fp: _Tiff()
    for name, mod in fakes.items():
        monkeypatch.setitem(sys.modules, name, mod)

    from ocr_ray.sources.payloads import explode_tiff

    frames = explode_tiff(b"II*\x00 realtiffbytes")
    assert frames == [b"frame0", b"frame1", b"frame2"]
