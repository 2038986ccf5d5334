"""From-scratch raster page pipeline: PNG codec, glyph renderer, pixel OCR.

The sandbox ships no PIL/tesseract, so (following the ``pdfgen`` playbook
that replaced reportlab with a from-scratch PDF writer) the OCR branch gets
a real raster path built on stdlib ``zlib`` + numpy only:

- :func:`png_encode` / :func:`png_decode` — a genuine PNG codec (8-bit
  grayscale, all five scanline filters on decode, filter-0 + fixed-level
  zlib on encode: byte-deterministic).
- :func:`render_tree` — rasterizes an hOCR word tree onto a white canvas
  with a synthetic 5×7 template font; each word's ink pixels carry its OCR
  confidence as the gray value (a physically-motivated encoding: fainter
  ink ⇒ lower confidence, and the recognizer derives confidence from ink
  intensity exactly like a real engine derives it from pixel quality).
- :func:`recognize_pixels` — pixel-only OCR: line banding by horizontal
  ink projection, paragraph grouping by vertical gap, word segmentation by
  column-gap thresholding, character recognition by exact template match
  against the same font, confidence from ink intensity. No metadata side
  channel: everything is recovered from pixels.
- :func:`white_fill` — the real M10 ignore-region mask (white rectangles
  over pixels; reference parity: celery_app.py:1083-1092).

Geometry contract (shared with ocr_ray.synth page trees): character cell
CELL_W×CELL_H px, glyph ink block GLYPH_W×GLYPH_H at offset (MARGIN_X,
MARGIN_Y) inside the cell, so a word occupying hOCR box
``[x, y, x + CELL_W*len, y + CELL_H]`` leaves ink exactly in
``cols [x+MARGIN_X, x+MARGIN_X+GLYPH_W*len... )`` — the recognizer inverts
this mapping to recover cell boxes bit-exactly. Every glyph has full-width
ink bars in its top and bottom font rows, which pins the ink bounding box
of every character to the full glyph block and makes the inversion exact.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- font

FONT_ROWS = 7
FONT_COLS = 5
# Pages render at HALF the hOCR coordinate resolution (the reference's
# 300-DPI-ingest / 150-DPI-export duality, celery_app.py:896-898 vs
# export.py:33): tree coordinates stay the full-resolution contract (cell
# 14x46 per char), pixels are 1:2. A page canvas is 4x smaller, which is
# what bounds this stage at scale — decode and recognition are memory-
# traffic-bound, not compute-bound. All tree coordinates the synth corpus
# produces are even, so the mapping is exact (render raises otherwise).
PIXEL_SCALE = 2  # tree units per pixel
SCALE_X = 1
SCALE_Y = 2
GLYPH_W = FONT_COLS * SCALE_X  # 5 px
GLYPH_H = FONT_ROWS * SCALE_Y  # 14 px
MARGIN_X = 1  # px inside the 7-px char cell
MARGIN_Y = 4  # px inside the 23-px line cell
CELL_W_T = 14  # tree units: hOCR char advance used by the synth page trees
CELL_H_T = 46  # tree units: hOCR line box height
CELL_W = CELL_W_T // PIXEL_SCALE  # 7 px
CELL_H = CELL_H_T // PIXEL_SCALE  # 23 px

ALPHABET = "abcdefghijklmnopqrstuvwxyz-0123456789"
_FONT_SALT = 0  # bump if the uniqueness assertion below ever trips


def _glyph_bitmap(ch: str) -> np.ndarray:
    """Deterministic synthetic 7×5 glyph: full ink bars in rows 0 and 6
    (pins the ink bbox of every char to the full block), interior 5×5 cells
    from the md5 of the character (a template alphabet — recognition is
    exact template matching, no OCR ambiguity)."""
    bm = np.zeros((FONT_ROWS, FONT_COLS), dtype=bool)
    bm[0, :] = True
    bm[-1, :] = True
    digest = hashlib.md5(f"glyph:{_FONT_SALT}:{ch}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    bm[1:-1, :] = bits[: (FONT_ROWS - 2) * FONT_COLS].reshape(
        FONT_ROWS - 2, FONT_COLS
    ).astype(bool)
    return bm


FONT: dict[str, np.ndarray] = {ch: _glyph_bitmap(ch) for ch in ALPHABET}
_REVERSE: dict[bytes, str] = {bm.tobytes(): ch for ch, bm in FONT.items()}
assert len(_REVERSE) == len(FONT), "glyph hash collision; bump _FONT_SALT"


# ---------------------------------------------------------------- codec

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """8-bit grayscale PNG, filter 0 per scanline, fixed zlib level —
    deterministic bytes for identical pixels."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("png_encode expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Parse IHDR/IDAT/IEND, inflate, undo all five scanline filters.
    Supports the profile this engine emits (8-bit grayscale) — anything
    else raises (honest failure, not a silent wrong answer)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    off = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    while off + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        off += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG profile depth={depth} color={color} "
                    f"interlace={interlace} (this codec reads 8-bit grayscale)"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (width + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(height, width + 1)
    filters = raw[:, 0]
    if not filters.any():  # filter-0-only stream (what png_encode emits):
        return raw[:, 1:].copy()  # one vectorized slice, no per-row loop
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        line = raw[y, 1:].copy()
        f = filters[y]
        prev = out[y - 1] if y else np.zeros(width, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: running sum mod 256 — one vectorized cumsum
            out[y] = np.cumsum(line, dtype=np.uint8)
        elif f == 2:  # Up
            out[y] = line + prev
        elif f == 3:  # Average (serial left-dependency; plain-int loop)
            acc = 0
            prev_l = prev.tolist()
            for x, raw_v in enumerate(line.tolist()):
                acc = (raw_v + ((acc + prev_l[x]) >> 1)) & 0xFF
                out[y, x] = acc
        elif f == 4:  # Paeth (serial left-dependency; plain-int loop, no
            # per-pixel numpy allocation)
            left = 0
            upleft = 0
            prev_l = prev.tolist()
            row = [0] * width
            for x, raw_v in enumerate(line.tolist()):
                up = prev_l[x]
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = upleft
                left = (raw_v + pred) & 0xFF
                row[x] = left
                upleft = up
            out[y] = row
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out


# -------------------------------------------------------------- renderer

BACKGROUND = 255


def _canvas_size(tree: list) -> tuple[int, int]:
    right = 0.0
    bottom = 0.0
    for par in tree:
        for line in par:
            for w in line:
                right = max(right, w["box"][2])
                bottom = max(bottom, w["box"][3])
    # (h, w) px — the +100-tree-unit page margins at pixel scale
    return (int(bottom) + 100) // PIXEL_SCALE, (int(right) + 100) // PIXEL_SCALE


def _px(v: float) -> int:
    t = int(v)
    if t != v or t % PIXEL_SCALE:
        raise ValueError(f"tree coordinate {v!r} is not pixel-exact")
    return t // PIXEL_SCALE


_BLOCKS = {
    ch: np.kron(bm, np.ones((SCALE_Y, SCALE_X), dtype=bool))
    for ch, bm in FONT.items()
}


def render_tree(tree: list) -> np.ndarray:
    """hOCR word tree → grayscale page pixels. Ink value = word confidence
    (55-99 in the synth corpus; anything < BACKGROUND reads as ink)."""
    h, w = _canvas_size(tree)
    img = np.full((h, w), BACKGROUND, dtype=np.uint8)
    for par in tree:
        for line in par:
            for word in line:
                x0 = _px(word["box"][0])
                y0 = _px(word["box"][1])
                ink = np.uint8(int(word["confidence"]))
                for k, ch in enumerate(word["text"]):
                    block = _BLOCKS.get(ch)
                    if block is None:
                        raise ValueError(f"glyph for {ch!r} not in font")
                    cy = y0 + MARGIN_Y
                    cx = x0 + k * CELL_W + MARGIN_X
                    region = img[cy : cy + GLYPH_H, cx : cx + GLYPH_W]
                    region[block] = ink
    return img


def render_page_png(tree: list) -> bytes:
    return png_encode(render_tree(tree))


# ------------------------------------------------------------- recognizer

# Blank pixel rows tolerated inside one text line: the glyph top/bottom bars
# are always inked, but a short word whose random interior font rows are all
# empty leaves up to 10 blank rows between its bars; lines proper are 16
# blank rows apart (60-tree-unit step at pixel scale), so 13 separates them.
_LINE_MERGE_GAP = 13
_WORD_SPLIT_GAP = 5  # blank pixel cols: intra-word char gap 2, word gap 9
# tree-space (not pixel) line-box gap: 14 within a paragraph, 54 across
_PAR_GAP = 30


def _runs(mask: np.ndarray, merge_gap: int) -> list[tuple[int, int]]:
    """[start, stop) runs of True, merging runs separated by < merge_gap."""
    idx = np.flatnonzero(mask)
    if not len(idx):
        return []
    splits = np.flatnonzero(np.diff(idx) > merge_gap)
    starts = np.concatenate(([0], splits + 1))
    stops = np.concatenate((splits, [len(idx) - 1]))
    return [(int(idx[a]), int(idx[b]) + 1) for a, b in zip(starts, stops)]


# packed-bit glyph table: 35 template booleans → 5 bytes, so recognition is
# one vectorized packbits over all of a word's cells + dict lookups
_PACKED_REVERSE: dict[bytes, str] = {
    np.packbits(bm, axis=None).tobytes(): ch for ch, bm in FONT.items()
}
assert len(_PACKED_REVERSE) == len(FONT)

# gather-index for all chars of an n-char word: cell k contributes glyph
# columns [k*CELL_W, k*CELL_W + GLYPH_W); precomputed once per word length
_GLYPH_COL_IDX: dict[int, np.ndarray] = {}


def _glyph_cols(n_chars: int) -> np.ndarray:
    idx = _GLYPH_COL_IDX.get(n_chars)
    if idx is None:
        idx = (
            np.arange(n_chars)[:, None] * CELL_W + np.arange(GLYPH_W)[None, :]
        ).ravel()
        _GLYPH_COL_IDX[n_chars] = idx
    return idx


def _read_word(img: np.ndarray, r0: int, r1: int, c0: int, c1: int) -> dict:
    """Ink bbox rows [r0,r1) cols [c0,c1) in PIXELS → word dict with the
    cell box converted back to tree coordinates. All chars decode in ONE
    vectorized gather + packbits (the per-char Python loop was ~2/3 of
    recognition time, the hottest kernel of the whole extraction stage)."""
    n_chars = (c1 - c0 + 2 * MARGIN_X) // CELL_W
    if n_chars * CELL_W != (c1 - c0) + 2 * MARGIN_X:
        raise ValueError("ink span is not a whole number of character cells")
    x = (c0 - MARGIN_X) * PIXEL_SCALE
    y = (r0 - MARGIN_Y) * PIXEL_SCALE
    crop = img[r0:r1, c0:c1]
    v0 = int(crop.min())
    if v0 >= BACKGROUND:
        raise ValueError("no ink in word span")
    if ((crop != BACKGROUND) & (crop != v0)).any():
        raise ValueError(f"mixed ink intensities in one word starting at {v0}")
    # (FONT_ROWS, n_chars, GLYPH_W) downsampled glyph grid → per-char masks
    cells = crop[:: SCALE_Y, _glyph_cols(n_chars)].reshape(
        -1, n_chars, GLYPH_W
    )[:, :, ::SCALE_X]
    masks = (cells < BACKGROUND).transpose(1, 0, 2)
    packed = np.packbits(
        masks.reshape(n_chars, FONT_ROWS * FONT_COLS), axis=1
    )
    chars = []
    for k in range(n_chars):
        ch = _PACKED_REVERSE.get(packed[k].tobytes())
        if ch is None:
            raise ValueError(f"unrecognized glyph bitmap at cell {k}")
        chars.append(ch)
    bottom = float(y + CELL_H_T)
    return {
        "text": "".join(chars),
        "box": [float(x), float(y), float(x + n_chars * CELL_W_T), bottom],
        "b": bottom,
        "confidence": v0,
    }


def recognize_pixels(img: np.ndarray) -> list:
    """Pixels → hOCR word tree (paragraphs → lines → words), the inverse of
    :func:`render_tree`. Pure pixel evidence: projections + template match.

    Ink projections come from uint8 MIN-reductions (a read-only SIMD pass)
    instead of materializing a page-sized boolean mask — the mask write
    doubled the stage's memory traffic, and this stage is what saturates
    the socket's bandwidth when many extraction actors run per node."""
    rows_with_ink = img.min(axis=1) < BACKGROUND
    lines = []
    for r0, r1 in _runs(rows_with_ink, _LINE_MERGE_GAP):
        band = img[r0:r1]
        cols_with_ink = band.min(axis=0) < BACKGROUND
        # fast path: a band of exactly glyph height IS the word row extent
        # (every intact word has full-width ink bars in its top and bottom
        # font rows); taller bands tighten rows per word
        exact_band = (r1 - r0) == GLYPH_H
        words = []
        for c0, c1 in _runs(cols_with_ink, _WORD_SPLIT_GAP):
            if exact_band:
                wr0, wr1 = r0, r1
            else:
                sub = band[:, c0:c1] < BACKGROUND
                wr = np.flatnonzero(sub.any(axis=1))
                wr0, wr1 = r0 + int(wr[0]), r0 + int(wr[-1]) + 1
            try:
                words.append(_read_word(img, wr0, wr1, c0, c1))
            except ValueError:
                # Unreadable ink span (e.g. a white_fill box that clipped a
                # word, or off-contract pixels): degrade PER WORD like the
                # reference engine does — the rest of the page survives
                # (reference OCRs whatever pixels remain; a raise here would
                # void the whole page into an error record).
                continue
        if words:
            lines.append(words)
    # group lines into paragraphs by cell-box vertical gap
    tree: list = []
    prev_bottom = None
    for words in lines:
        top = min(w["box"][1] for w in words)
        if prev_bottom is None or top - prev_bottom > _PAR_GAP:
            tree.append([])
        tree[-1].append(words)
        prev_bottom = max(w["box"][3] for w in words)
    return tree


# ---------------------------------------------------------------- corners

def _dilate_1d(mask: np.ndarray, radius: int, axis: int) -> np.ndarray:
    """Binary dilation with a 1-D box of half-width ``radius`` along axis."""
    out = mask.copy()
    for d in range(1, radius + 1):
        if axis == 0:
            out[d:, :] |= mask[:-d, :]
            out[:-d, :] |= mask[d:, :]
        else:
            out[:, d:] |= mask[:, :-d]
            out[:, :-d] |= mask[:, d:]
    return out


def _close_1d(mask: np.ndarray, radius: int, axis: int) -> np.ndarray:
    """1-D morphological closing (fills blank gaps ≤ 2*radius)."""
    return ~_dilate_1d(~_dilate_1d(mask, radius, axis), radius, axis)


# Closing radii for the corner detector (see corner_points): vertical 5
# fills the ≤10-px blank band between a glyph's top/bottom ink bars without
# bridging the 16-px inter-line gap; horizontal 1 fills the 2-px intra-word
# char gap without bridging the 9-px word gap — so blobs are per-WORD solid
# rectangles, the same corner density the reference's FAST detector sees on
# dilated text (image.py:140-227: Otsu → morphology → FAST).
_CLOSE_RADIUS_Y = 5
_CLOSE_RADIUS_X = 1


def corner_points(img: np.ndarray) -> np.ndarray:
    """Corner detector over RAW PAGE PIXELS (the reference's L2 front end,
    /root/reference/server/src/utils/image.py:140-227: threshold →
    morphological closing → FAST corners → point cloud).

    Threshold (ink = non-background), anisotropic closing to solidify words
    into blobs, then the classic binary quad-count corner rule: a 2×2 window
    containing exactly 1 or 3 ink pixels marks a convex/concave boundary
    corner (Gray 1971's perimeter quads — public domain technique). Returns
    an (n, 2) int array of (x, y) PIXEL coordinates.
    """
    ink = img < BACKGROUND
    closed = _close_1d(_close_1d(ink, _CLOSE_RADIUS_Y, 0), _CLOSE_RADIUS_X, 1)
    padded = np.pad(closed, 1).astype(np.int8)
    quad = (
        padded[:-1, :-1] + padded[:-1, 1:] + padded[1:, :-1] + padded[1:, 1:]
    )
    ys, xs = np.nonzero((quad == 1) | (quad == 3))
    # quad (y, x) indexes the window whose pixels are (y-1..y, x-1..x) of the
    # unpadded image: the coordinate lands ON the blob boundary either way,
    # and the ±1 px is far below the clustering eps (~62 tree units).
    return np.stack([xs, ys], axis=1)


# ------------------------------------------------------------------ mask

def white_fill(img: np.ndarray, boxes: list[list[float]]) -> np.ndarray:
    """M10 ignore-region mask, real semantics: white rectangles over pixels
    (reference: celery_app.py:1083-1092 fills the region before OCR).
    Boxes arrive in tree coordinates; the fill COVERS the box (floor/ceil
    at pixel scale) so no target ink survives on odd-aligned regions."""
    out = img.copy()
    h, w = out.shape
    for left, top, right, bottom in boxes:
        x0 = max(0, int(left) // PIXEL_SCALE)
        y0 = max(0, int(top) // PIXEL_SCALE)
        x1 = min(w, -(-int(right) // PIXEL_SCALE))
        y1 = min(h, -(-int(bottom) // PIXEL_SCALE))
        if x1 > x0 and y1 > y0:
            out[y0:y1, x0:x1] = BACKGROUND
    return out


# ----------------------------------------------------------------- stats

def pixel_stats(img: np.ndarray) -> dict:
    """Decoded-pixel statistics for the page_pixel_stats query."""
    ink = img < BACKGROUND
    n_ink = int(ink.sum())
    h, w = img.shape
    return {
        "width": int(w),
        "height": int(h),
        "n_ink_px": n_ink,
        "ink_frac": round(n_ink / (h * w), 6) if h * w else 0.0,
        "mean_ink": round(float(img[ink].mean()), 4) if n_ink else 0.0,
    }
