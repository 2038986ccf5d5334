"""Engine protocol: what an OCR engine adapter must provide.

Engines are constructed ONCE per actor (warm state: traineddata, API
handles) and called per page/segment — the design the reference gestures at
with its module-global ``PyTessBaseAPI`` but defeats with
``--max-tasks-per-child=1`` (SURVEY.md §2.3 T1).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from ..config import OcrConfig


@runtime_checkable
class OcrEngine(Protocol):
    def __init__(self, config: OcrConfig): ...

    def recognize(self, page: bytes, segment_box: list[float] | None = None) -> str:
        """OCR a page image (or the given [l,t,r,b] sub-box of it) and
        return the hOCR string. Segment output coordinates are relative to
        the segment origin — the parser applies the offset
        (parity: parse_hocr.py:78-85 + ocr_tesserocr.py SetRectangle path)."""
        ...

    def get_boxes(self, page: bytes) -> list[tuple[float, float, float, float]]:
        """Block segmentation (L1): (left, top, width, height) per text
        block (parity: ocr_tesserocr.py:218-244 auto_get_boxes)."""
        ...
