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
