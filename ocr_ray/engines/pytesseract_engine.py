"""pytesseract (subprocess) engine adapter — the reference's M4 twin of the
tesserocr adapter (/root/reference/server/src/engines/ocr_pytesseract.py:
42-136 shells out to the tesseract binary per page, forcing hOCR output;
config-string builder at :164-189).

Import-gated like the tesserocr adapter: this container ships neither
pytesseract nor PIL, so the module only loads where the real stack exists.
Held by an actor, the per-call cost is the subprocess itself — the adapter
still belongs in an actor pool so language packs and temp-dir setup are
per-worker, and so both engines satisfy the same OcrEngine protocol."""

from __future__ import annotations

import io

import pytesseract
from PIL import Image, ImageDraw

from ..config import OcrConfig


def build_config_string(config: OcrConfig) -> str:
    """tesseract CLI config: --oem/--psm/--dpi/-c k=v pass-through
    (parity: ocr_pytesseract.py:164-189)."""
    parts = [f"--oem {config.engine_mode}", f"--psm {config.segment_mode}"]
    if config.dpi:
        parts.append(f"--dpi {config.dpi}")
    parts.append(f"-c thresholding_method={config.threshold_method}")
    for key, value in config.other_params:
        parts.append(f"-c {key}={value}")
    return " ".join(parts)


class PytesseractEngine:
    def __init__(self, config: OcrConfig):
        self.config = config
        self.config_str = build_config_string(config)

    def _image(self, page: bytes) -> Image.Image:
        return Image.open(io.BytesIO(page))

    def recognize(self, page: bytes, segment_box: list[float] | None = None) -> str:
        img = self._image(page)
        if segment_box is not None:
            left, top, right, bottom = (int(v) for v in segment_box)
            img = img.crop((left, top, right, bottom))
        data = pytesseract.image_to_pdf_or_hocr(
            img, lang=self.config.lang_spec, config=self.config_str,
            extension="hocr",
        )
        return data.decode("utf-8")

    def mask(self, page: bytes, remove_boxes: list[list[float]]) -> bytes:
        if not remove_boxes:
            return page
        img = self._image(page).convert("RGB")
        draw = ImageDraw.Draw(img)
        for left, top, right, bottom in remove_boxes:
            draw.rectangle([left, top, right, bottom], fill="white")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def get_boxes(self, page: bytes) -> list[tuple[float, float, float, float]]:
        img = self._image(page)
        data = pytesseract.image_to_data(
            img, lang=self.config.lang_spec, config=self.config_str,
            output_type=pytesseract.Output.DICT,
        )
        boxes = []
        for i, level in enumerate(data["level"]):
            if level == 2:  # block level
                boxes.append(
                    (float(data["left"][i]), float(data["top"][i]),
                     float(data["width"][i]), float(data["height"][i]))
                )
        return boxes
