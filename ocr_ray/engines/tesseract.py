"""Real Tesseract adapter (tesserocr binding).

NOT usable in this container (no tesserocr/PIL installed — the module import
fails and the registry simply omits it). The code documents the real
deployment path: one warm ``PyTessBaseAPI`` per actor, initialized ONCE in
``__init__`` — in deliberate contrast to the reference, which re-InitFull's
the module-global API on every call (ocr_tesserocr.py:93-100) *and* restarts
the worker process after every task (docker-compose.yml:49
``--max-tasks-per-child=1``), paying engine init per page.

Per-call parameters that may drift between batches (PSM, DPI, threshold,
otherParams) are re-applied on every call so a reused actor is deterministic
(SURVEY.md §7.4 warm-actor determinism).
"""

from __future__ import annotations

import io

import tesserocr
from PIL import Image
from tesserocr import OEM, PSM, PyTessBaseAPI, RIL

from ..config import OcrConfig


class TesserocrEngine:
    def __init__(self, config: OcrConfig):
        self.config = config
        self.api = PyTessBaseAPI(
            lang=config.lang_spec,
            oem=OEM(config.engine_mode),
            psm=PSM(config.segment_mode),
        )
        for key, value in config.other_params:
            self.api.SetVariable(key, value)

    def _set_page(self, page: bytes) -> Image.Image:
        img = Image.open(io.BytesIO(page))
        self.api.SetImage(img)
        if self.config.dpi:
            self.api.SetSourceResolution(self.config.dpi)
        self.api.SetVariable("thresholding_method", str(self.config.threshold_method))
        return img

    def recognize(self, page: bytes, segment_box: list[float] | None = None) -> str:
        self._set_page(page)
        if segment_box is not None:
            left, top, right, bottom = (int(v) for v in segment_box)
            self.api.SetRectangle(left, top, right - left, bottom - top)
        return self.api.GetHOCRText(0)

    def mask(self, page: bytes, remove_boxes: list[list[float]]) -> bytes:
        if not remove_boxes:
            return page
        from PIL import ImageDraw

        img = Image.open(io.BytesIO(page)).convert("RGB")
        draw = ImageDraw.Draw(img)
        for left, top, right, bottom in remove_boxes:
            # parity: celery_app.py:1083-1092 white-fill
            draw.rectangle([left, top, right, bottom], fill="white")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def get_boxes(self, page: bytes) -> list[tuple[float, float, float, float]]:
        self._set_page(page)
        boxes = self.api.GetComponentImages(RIL.BLOCK, text_only=True, raw_padding=10)
        return [(b[1]["x"], b[1]["y"], b[1]["w"], b[1]["h"]) for b in boxes]

    def __del__(self):  # release leptonica buffers
        try:
            self.api.End()
        except Exception:
            pass
