"""Pixel OCR engine: real raster bytes in, recognized hOCR out.

The default engine for the synthetic corpus's PNG page images. Unlike
:class:`ocr_ray.engines.stub.StubEngine` (which reads hOCR embedded in
``FAKEIMG`` fixtures), every method here works on DECODED PIXELS via the
from-scratch codec/recognizer in :mod:`ocr_ray.kernels.raster`:

- ``recognize`` decodes the PNG and template-matches glyphs from pixel
  evidence; the segment path crops the pixel array exactly like Tesseract's
  ``SetRectangle`` (reference: server/src/engines/ocr_tesserocr.py:120-150)
  so recognized coordinates come out segment-relative naturally.
- ``mask`` white-fills the ignore regions over pixels and re-encodes — the
  reference's real M10 semantics (server/celery_app.py:1083-1092), not the
  stub's drop-words approximation.
- ``get_boxes`` returns per-paragraph (left, top, width, height) blocks from
  the recognized pixel tree, like tesserocr's GetComponentImages
  (ocr_tesserocr.py:218-244).
"""

from __future__ import annotations

from ..config import OcrConfig
from ..kernels import raster
from ..kernels.hocr_write import tree_to_hocr


class PixelEngine:
    """Engine-protocol implementation over real PNG page images."""

    # Warm state is the module-level glyph template table: construction is
    # a handle copy, so extraction may run as a task pool with a process-
    # global engine cache instead of an actor pool (extract_stage docs).
    CHEAP_INIT = True

    def __init__(self, config: OcrConfig):
        self.config = config
        # Warm state (T1): a real engine would InitFull traineddata here; the
        # pixel engine's equivalent — the glyph template table — is built at
        # module import and shared, so per-actor setup is just this handle.
        self.font = raster.FONT
        self.pages_processed = 0

    def recognize(self, page: bytes, segment_box: list[float] | None = None) -> str:
        self.pages_processed += 1
        img = raster.png_decode(page)
        if segment_box is not None:
            # segment boxes are tree coordinates; the page renders at
            # 1:PIXEL_SCALE (150-DPI duality — see kernels.raster). Validate
            # pixel-exactness like raster._px: a silent floor-divide on an
            # odd coordinate would shift the crop by a pixel and mis-read.
            s = raster.PIXEL_SCALE
            coords = []
            for v in segment_box:
                t = int(v)
                if t != v or t % s:
                    raise ValueError(
                        f"segment_box coordinate {v!r} is not pixel-exact "
                        f"(must be an integer multiple of {s})"
                    )
                coords.append(t // s)
            left, top, right, bottom = coords
            img = img[top:bottom, left:right]
        return tree_to_hocr(raster.recognize_pixels(img))

    def mask(self, page: bytes, remove_boxes: list[list[float]]) -> bytes:
        if not remove_boxes:
            return page
        return raster.png_encode(
            raster.white_fill(raster.png_decode(page), remove_boxes)
        )

    def get_boxes(self, page: bytes) -> list[tuple[float, float, float, float]]:
        tree = raster.recognize_pixels(raster.png_decode(page))
        boxes = []
        for paragraph in tree:
            words = [w for line in paragraph for w in line]
            left = min(w["box"][0] for w in words)
            top = min(w["box"][1] for w in words)
            right = max(w["box"][2] for w in words)
            bottom = max(w["box"][3] for w in words)
            boxes.append((left, top, right - left, bottom - top))
        return boxes
