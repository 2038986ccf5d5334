"""Deterministic stub OCR engine.

This container ships no tesseract/PIL, so the "page image" payloads of the
synthetic corpus are ``FAKEIMG`` blobs carrying the hOCR a perfect OCR run
would produce (see ocr_ray/sources/payloads.py). The stub engine "recognizes"
by reading that embedded hOCR — which keeps every downstream component REAL
and exercised: the hOCR parser, segment-coordinate offsetting, layout
routing, masking semantics, reading-order, text assembly and the word index
all run on genuine data.

The segment path is a faithful simulation of Tesseract's ``SetRectangle``
(/root/reference/server/src/engines/ocr_tesserocr.py:120-150): only words
whose box center falls inside the segment are recognized, and their
coordinates are re-emitted relative to the segment origin (the parser then
offsets them back — parse_hocr.py:78-85 parity).
"""

from __future__ import annotations

from ..config import OcrConfig
from ..kernels.hocr import parse_hocr
from ..kernels.hocr_write import tree_to_hocr
from ..sources.payloads import FAKEIMG_MAGIC, UnsupportedPayloadError, build_fake_image


def _center_inside(box: list[float], region: list[float]) -> bool:
    cx = (box[0] + box[2]) / 2
    cy = (box[1] + box[3]) / 2
    return region[0] <= cx <= region[2] and region[1] <= cy <= region[3]


def _filter_tree(tree: list, keep) -> list:
    out = []
    for paragraph in tree:
        new_par = []
        for line in paragraph:
            new_line = [w for w in line if keep(w)]
            if new_line:
                new_par.append(new_line)
        if new_par:
            out.append(new_par)
    return out


def _shift_tree(tree: list, dx: float, dy: float) -> list:
    for paragraph in tree:
        for line in paragraph:
            for w in line:
                box = w["box"]
                w["box"] = [box[0] + dx, box[1] + dy, box[2] + dx, box[3] + dy]
    return tree


class StubEngine:
    """Engine-protocol implementation over FAKEIMG payloads."""

    CHEAP_INIT = True  # no model residency: task-pool extraction is fine

    def __init__(self, config: OcrConfig):
        self.config = config
        # Warm-state marker: a real engine would InitFull traineddata here,
        # once per actor, and reuse it for every batch (SURVEY.md T1).
        self.pages_processed = 0

    @staticmethod
    def _decode(page: bytes) -> str:
        if not page.startswith(FAKEIMG_MAGIC):
            raise UnsupportedPayloadError(
                "StubEngine needs FAKEIMG payloads; got a real image with no "
                "decoder installed"
            )
        return page[len(FAKEIMG_MAGIC):].decode("utf-8")

    def recognize(self, page: bytes, segment_box: list[float] | None = None) -> str:
        self.pages_processed += 1
        hocr = self._decode(page)
        if segment_box is None:
            return hocr
        tree = parse_hocr(hocr)
        tree = _filter_tree(tree, lambda w: _center_inside(w["box"], segment_box))
        tree = _shift_tree(tree, -segment_box[0], -segment_box[1])
        return tree_to_hocr(tree)

    def mask(self, page: bytes, remove_boxes: list[list[float]]) -> bytes:
        """Ignore-region masking (M10): a real engine white-fills rectangles
        (celery_app.py:1083-1092); the stub drops the words those rectangles
        would have erased."""
        if not remove_boxes:
            return page
        tree = parse_hocr(self._decode(page))
        tree = _filter_tree(
            tree,
            lambda w: not any(_center_inside(w["box"], r) for r in remove_boxes),
        )
        return build_fake_image(tree_to_hocr(tree))

    def get_boxes(self, page: bytes) -> list[tuple[float, float, float, float]]:
        """L1 block segmentation: one block per hOCR paragraph, as
        (left, top, width, height) like tesserocr's GetComponentImages
        (ocr_tesserocr.py:218-244)."""
        tree = parse_hocr(self._decode(page))
        boxes = []
        for paragraph in tree:
            words = [w for line in paragraph for w in line]
            left = min(w["box"][0] for w in words)
            top = min(w["box"][1] for w in words)
            right = max(w["box"][2] for w in words)
            bottom = max(w["box"][3] for w in words)
            boxes.append((left, top, right - left, bottom - top))
        return boxes
