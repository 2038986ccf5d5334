"""Raster kernel: PNG codec round-trip, pixel OCR inversion, mask, stats.

The exactness proof for the corpus-v3 OCR branch: a page tree rendered to
real PNG bytes and recognized back FROM PIXELS must reproduce the tree —
text, cell boxes, baselines and confidences — with no metadata side channel.
"""

import random
import zlib

import numpy as np
import pytest

from ocr_ray.kernels import raster
from ocr_ray.synth import _page_tree


def test_png_roundtrip_random_pixels():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(37, 61), dtype=np.uint8)
    assert np.array_equal(raster.png_decode(raster.png_encode(img)), img)


def test_png_encode_deterministic():
    img = np.full((20, 30), 200, dtype=np.uint8)
    assert raster.png_encode(img) == raster.png_encode(img.copy())


def test_png_decode_rejects_other_profiles():
    with pytest.raises(ValueError):
        raster.png_decode(b"not a png")
    # RGB IHDR (color type 2) must be refused, not mis-read
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(raster.png_encode(img))
    assert data[25] == 0  # color type byte inside IHDR
    data[25] = 2
    import struct

    crc = zlib.crc32(bytes(data[12:29])) & 0xFFFFFFFF
    data[29:33] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="profile"):
        raster.png_decode(bytes(data))


def test_png_decode_sub_and_up_filters():
    """The decoder must undo filters the encoder never emits (real PNGs in
    the wild use them)."""
    import struct

    img = np.arange(0, 120, dtype=np.uint8).reshape(6, 20) * 2
    h, w = img.shape
    raw = bytearray()
    for y in range(h):
        if y % 2 == 0:  # Sub
            raw.append(1)
            prev = 0
            for x in range(w):
                raw.append((int(img[y, x]) - prev) & 0xFF)
                prev = int(img[y, x])
        else:  # Up
            raw.append(2)
            for x in range(w):
                raw.append((int(img[y, x]) - int(img[y - 1, x])) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + raster._chunk(b"IHDR", ihdr)
        + raster._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + raster._chunk(b"IEND", b"")
    )
    assert np.array_equal(raster.png_decode(data), img)


def test_recognize_inverts_render_over_many_pages():
    for seed in range(60):
        rng = random.Random(seed)
        tree = _page_tree(rng, hyphen=(seed % 7 == 0))
        img = raster.png_decode(raster.render_page_png(tree))
        assert raster.recognize_pixels(img) == tree, f"seed {seed}"


def test_confidence_comes_from_ink_intensity():
    tree = [[[{"text": "abc", "box": [100.0, 100.0, 142.0, 146.0],
               "b": 146.0, "confidence": 61}]]]
    img = raster.render_tree(tree)
    ink = img[img < raster.BACKGROUND]
    assert set(np.unique(ink)) == {61}
    rec = raster.recognize_pixels(img)
    assert rec[0][0][0]["confidence"] == 61


def test_white_fill_erases_word():
    rng = random.Random(11)
    tree = _page_tree(rng)
    img = raster.render_tree(tree)
    target = tree[0][0][0]
    masked = raster.white_fill(img, [target["box"]])
    rec = raster.recognize_pixels(masked)
    texts = [w["text"] for par in rec for line in par for w in line]
    all_texts = [w["text"] for par in tree for line in par for w in line]
    assert len(texts) == len(all_texts) - 1
    # everything else survives in order
    assert texts == [t for i, t in enumerate(all_texts) if i != 0]


def test_segment_crop_matches_center_inside_semantics():
    """Cropping the pixel array at a paragraph's bounds must recognize the
    same words, segment-relative, as the legacy center-inside filter."""
    import copy

    from ocr_ray.engines.stub import _center_inside, _filter_tree, _shift_tree
    from ocr_ray.kernels.hocr import parse_hocr
    from ocr_ray.kernels.hocr_write import tree_to_hocr

    rng = random.Random(5)
    tree = _page_tree(rng)
    img = raster.png_decode(raster.render_page_png(tree))
    par = tree[-1]
    words = [w for line in par for w in line]
    seg = [min(w["box"][0] for w in words), min(w["box"][1] for w in words),
           max(w["box"][2] for w in words), max(w["box"][3] for w in words)]
    s = raster.PIXEL_SCALE
    crop = img[int(seg[1]) // s:int(seg[3]) // s, int(seg[0]) // s:int(seg[2]) // s]
    got = raster.recognize_pixels(crop)
    exp = _filter_tree(copy.deepcopy(tree), lambda w: _center_inside(w["box"], seg))
    exp = _shift_tree(exp, -seg[0], -seg[1])
    assert parse_hocr(tree_to_hocr(got)) == parse_hocr(tree_to_hocr(exp))


def test_pixel_stats():
    tree = [[[{"text": "ab", "box": [100.0, 100.0, 128.0, 146.0],
               "b": 146.0, "confidence": 70}]]]
    img = raster.render_tree(tree)
    st = raster.pixel_stats(img)
    assert (st["height"], st["width"]) == img.shape
    assert st["n_ink_px"] == int((img < raster.BACKGROUND).sum()) > 0
    assert st["mean_ink"] == 70.0


def test_pixel_engine_protocol():
    from ocr_ray.config import resolve_config
    from ocr_ray.engines import get_engine_cls
    from ocr_ray.kernels.hocr import parse_hocr

    eng = get_engine_cls("pixel")(resolve_config())
    rng = random.Random(21)
    tree = _page_tree(rng)
    png = raster.render_page_png(tree)
    assert parse_hocr(eng.recognize(png)) == parse_hocr(
        eng.recognize(png)
    )  # deterministic
    boxes = eng.get_boxes(png)
    assert len(boxes) == len(tree)
    # mask → the masked word is gone from recognition
    target = tree[0][0][0]
    masked_png = eng.mask(png, [target["box"]])
    masked_tree = parse_hocr(eng.recognize(masked_png))
    n_before = sum(len(l) for p in tree for l in p)
    n_after = sum(len(l) for p in masked_tree for l in p)
    assert n_after == n_before - 1
    assert eng.mask(png, []) == png  # no-op guard


def test_png_decode_average_and_paeth_filters():
    """Decode parity for the remaining wild-PNG filters (Average, Paeth)."""
    import struct

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(9, 17), dtype=np.uint8)
    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=int)
    for y in range(h):
        line = img[y].astype(int)
        left = np.concatenate(([0], line[:-1]))
        if y % 2 == 0:  # Average
            raw.append(3)
            raw.extend(((line - (left + prev) // 2) % 256).astype(np.uint8))
        else:  # Paeth
            raw.append(4)
            ul = np.concatenate(([0], prev[:-1]))
            p = left + prev - ul
            pred = np.where(
                (abs(p - left) <= abs(p - prev)) & (abs(p - left) <= abs(p - ul)),
                left, np.where(abs(p - prev) <= abs(p - ul), prev, ul))
            raw.extend(((line - pred) % 256).astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + raster._chunk(b"IHDR", ihdr)
            + raster._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + raster._chunk(b"IEND", b""))
    assert np.array_equal(raster.png_decode(data), img)


def test_corner_points_come_from_pixels():
    """L2 front end: corners are computed from the rendered PIXEL array —
    each word's solid blob yields exactly its 4 ink-bbox corners."""
    tree = [[[{"text": "abc", "box": [100.0, 200.0, 142.0, 246.0],
               "b": 246.0, "confidence": 90},
              {"text": "de", "box": [170.0, 200.0, 198.0, 246.0],
               "b": 246.0, "confidence": 90}]],
            [[{"text": "xyz", "box": [100.0, 400.0, 142.0, 446.0],
               "b": 446.0, "confidence": 80}]]]
    img = raster.render_tree(tree)
    pts = {tuple(p) for p in raster.corner_points(img).tolist()}
    assert len(pts) == 12  # 4 per word
    # word "abc": glyph cells at cols 51-56/58-63/65-70 → ink bbox cols
    # [51, 70), rows [104, 118) in pixels — quad-count corners land on
    # {x0, x1} × {y0, y1} of the closed blob
    for x in (51, 70):
        for y in (104, 118):
            assert (x, y) in pts
    # erasing the pixels erases the corners (no markup side channel)
    blank = np.full_like(img, raster.BACKGROUND)
    assert len(raster.corner_points(blank)) == 0


def test_cv_layout_boxes_pixels_matches_paragraphs():
    """Pixel-native cv layout: one clustered box per paragraph block of a
    rendered synthetic page, covering that paragraph's words."""
    from ocr_ray.kernels.layout import cv_layout_boxes_pixels

    rng = random.Random(13)
    tree = _page_tree(rng)
    img = raster.render_tree(tree)
    boxes = cv_layout_boxes_pixels(img, page_w=2480.0, page_h=3508.0)
    assert boxes, "no layout boxes from pixel corners"
    for par in tree:
        words = [w for line in par for w in line]
        cx = (min(w["box"][0] for w in words) + max(w["box"][2] for w in words)) / 2
        cy = (min(w["box"][1] for w in words) + max(w["box"][3] for w in words)) / 2
        assert any(l <= cx <= r and t <= cy <= b for l, t, r, b in boxes), (
            "paragraph center not covered by any pixel-corner layout box")


def test_recognize_degrades_per_word_on_clipped_ink():
    """A white_fill box that only PARTIALLY covers a word must not void the
    page: the clipped word drops, every other word survives (reference
    parity: the engine OCRs whatever pixels remain)."""
    tree = [[[{"text": "abc", "box": [100.0, 200.0, 142.0, 246.0],
               "b": 246.0, "confidence": 90},
              {"text": "de", "box": [170.0, 200.0, 198.0, 246.0],
               "b": 246.0, "confidence": 90}]],
            [[{"text": "xyz", "box": [100.0, 400.0, 142.0, 446.0],
               "b": 446.0, "confidence": 80}]]]
    img = raster.render_tree(tree)
    clipped = raster.white_fill(img, [[180.0, 200.0, 198.0, 246.0]])
    rec = raster.recognize_pixels(clipped)
    texts = [w["text"] for par in rec for line in par for w in line]
    assert texts == ["abc", "xyz"]
