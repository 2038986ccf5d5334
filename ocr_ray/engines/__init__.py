"""OCR engine registry.

The reference resolves engines by name via ``globals()[f"ocr_{name}"]``
(/root/reference/server/celery_app.py:775,1036) with the contract
(get_structure / verify_params / build_ocr_config / estimate_ocr_time);
here the contract is the :class:`ocr_ray.engines.base.OcrEngine` protocol
and registration is an explicit dict — same extension surface
(SURVEY.md §2.12), no globals() magic.
"""

from __future__ import annotations

from .base import OcrEngine
from .pixel import PixelEngine
from .stub import StubEngine

_REGISTRY: dict[str, type] = {"pixel": PixelEngine, "stub": StubEngine}

try:  # real Tesseract adapter only when the binding exists
    from .tesseract import TesserocrEngine

    _REGISTRY["tesserocr"] = TesserocrEngine
except ImportError:  # pragma: no cover - container has no tesserocr
    pass

try:  # subprocess twin (reference M4) when pytesseract/PIL exist
    from .pytesseract_engine import PytesseractEngine

    _REGISTRY["pytesseract"] = PytesseractEngine
except ImportError:  # pragma: no cover - container has no pytesseract
    pass


def register_engine(name: str, cls: type) -> None:
    _REGISTRY[name] = cls


def get_engine_cls(name: str) -> type:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown OCR engine {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


__all__ = ["OcrEngine", "PixelEngine", "StubEngine", "register_engine", "get_engine_cls"]
