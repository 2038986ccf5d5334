"""hOCR parser semantics (parity: /root/reference/server/src/utils/parse_hocr.py)."""

from ocr_ray.kernels.hocr import HocrParseError, parse_hocr

HOCR_BASIC = """
<html><body>
<div class="ocr_page" title="bbox 0 0 1000 1400">
 <p class="ocr_par" title="bbox 10 10 900 200">
  <span class="ocr_line" title="bbox 10 10 900 60; baseline 0.01 -4">
   <span class="ocrx_word" title="bbox 10 12 110 58; x_wconf 95">Hello</span>
   <span class="ocrx_word" title="bbox 120 12 260 58; x_wconf 91; x_font Times_New_Roman">world</span>
   <span class="ocrx_word" title="bbox 270 12 272 58; x_wconf 10">   </span>
  </span>
  <span class="ocr_line" title="bbox 10 70 900 120">
   <span class="ocrx_word" title="bbox 10 72 200 118; x_wconf 88">second</span>
  </span>
 </p>
 <p class="ocr_par" title="bbox 10 210 900 400">
  <span class="ocr_line" title="bbox 10 210 900 260; baseline 0 0">
   <span class="ocrx_word" title="bbox 10 212 150 258; x_wconf 77">para2</span>
  </span>
 </p>
</div>
</body></html>
"""


def test_basic_tree_shape():
    tree = parse_hocr(HOCR_BASIC)
    assert len(tree) == 2
    assert len(tree[0]) == 2  # two lines, empty word dropped
    assert [w["text"] for w in tree[0][0]] == ["Hello", "world"]
    assert tree[0][0][1]["font"] == "Times_New_Roman"
    assert "font" not in tree[0][0][0]
    assert tree[0][0][0]["confidence"] == 95


def test_baseline_polyval():
    tree = parse_hocr(HOCR_BASIC)
    w = tree[0][0][0]
    # b = polyval([0.01, -4], (10+110)/2 - 10) + 60 = 0.5 - 4 + 60
    assert w["b"] == 0.01 * ((10 + 110) / 2 - 10) + (-4) + 60
    # missing baseline -> [0, 0] fallback: b = line bottom
    assert tree[0][1][0]["b"] == 120.0


def test_segment_offset():
    tree = parse_hocr(HOCR_BASIC, segment_box=[100.0, 200.0, 500.0, 600.0])
    w = tree[0][0][0]
    # l/r shifted by segment left, t/b by segment top
    assert w["box"] == [110.0, 212.0, 210.0, 258.0]
    # baseline formula uses the offset box against the raw linebox (parity
    # with parse_hocr.py:86 — linebox is NOT offset)
    assert w["b"] == 0.01 * ((110 + 210) / 2 - 10) + (-4) + 60


def test_line_fallback_when_no_words():
    hocr = """
    <p class="ocr_par" title="bbox 0 0 10 10">
      <span class="ocr_line" title="bbox 5 5 50 20; baseline 0 0; x_wconf 60">whole line text</span>
    </p>"""
    tree = parse_hocr(hocr)
    assert tree == [
        [[{"text": "whole line text", "box": [5.0, 5.0, 50.0, 20.0], "b": 20.0, "confidence": 60}]]
    ]


def test_empty_paragraphs_dropped():
    hocr = '<p class="ocr_par"><span class="ocr_line" title="bbox 0 0 1 1"><span class="ocrx_word" title="bbox 0 0 1 1; x_wconf 1">  </span></span></p>'
    assert parse_hocr(hocr) == []


def test_missing_bbox_raises():
    hocr = '<p class="ocr_par"><span class="ocr_line" title="nope"><span class="ocrx_word" title="bbox 0 0 1 1; x_wconf 1">x</span></span></p>'
    try:
        parse_hocr(hocr)
        assert False, "expected HocrParseError"
    except HocrParseError:
        pass
