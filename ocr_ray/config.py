"""Pipeline/OCR configuration: a frozen dataclass resolved once on the
driver and captured by UDF closures (SURVEY.md §2.1 S7) — replacing the
reference's ``default.json`` + per-request overlay + ``otherParams``
"k=v;k=v" string (/root/reference/server/celery_app.py:726-772,
server/config_files/default.json).

Validation mirrors the reference's enum checks and Portuguese error strings
(/root/reference/server/src/engines/ocr_tesserocr.py:247-277,
server/src/utils/enums_tesseract.py:1-53) and runs on the driver before
launch — fail fast, never per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

LANGS = frozenset({"deu", "spa", "fra", "eng", "por", "equ", "osd"})
ENGINE_MODES = frozenset({0, 1, 2, 3})
SEGMENT_MODES = frozenset(range(1, 15))
THRESHOLD_METHODS = frozenset({0, 1, 2})
OUTPUTS = frozenset(
    {"pdf_indexed", "pdf", "txt", "txt_delimited", "csv", "ner", "hocr", "xml"}
)

DEFAULTS = {
    "engine": "pixel",
    "lang": ("por",),
    "outputs": ("txt",),
    "engineMode": 3,
    "segmentMode": 3,
    "thresholdMethod": 0,
}


@dataclass(frozen=True)
class OcrConfig:
    engine: str = "pixel"
    lang: tuple[str, ...] = ("por",)
    outputs: tuple[str, ...] = ("txt",)
    engine_mode: int = 3
    segment_mode: int = 3
    threshold_method: int = 0
    dpi: int | None = None
    other_params: tuple[tuple[str, str], ...] = ()

    @property
    def lang_spec(self) -> str:
        """Languages joined with '+' as tesseract expects
        (parity: ocr_tesserocr.py:280-284 build_ocr_config)."""
        return "+".join(self.lang)

    def with_overrides(self, **kwargs) -> "OcrConfig":
        return replace(self, **kwargs)


def parse_other_params(raw: str) -> tuple[tuple[str, str], ...]:
    """Parse the reference's "key=value;key=value" pass-through string
    (parity: celery_app.py:753-768)."""
    pairs = []
    for chunk in raw.split(";"):
        chunk = chunk.strip()
        if not chunk:
            continue
        if "=" not in chunk:
            raise ValueError(f"invalid otherParams entry: {chunk!r}")
        key, value = chunk.split("=", 1)
        pairs.append((key.strip(), value.strip()))
    return tuple(pairs)


def verify_params(config: dict) -> tuple[bool, list[str]]:
    """Enum validation with the reference's error strings
    (parity: ocr_tesserocr.py:247-277)."""
    errors = []
    if "lang" in config:
        for lang in config["lang"]:
            if lang not in LANGS:
                errors.append(f'Língua: "{config["lang"]}"')
    if "engineMode" in config and config["engineMode"] not in ENGINE_MODES:
        errors.append(f'Modo do motor: "{config["engineMode"]}"')
    if "segmentMode" in config and config["segmentMode"] not in SEGMENT_MODES:
        errors.append(f'Segmentação: "{config["segmentMode"]}"')
    if "thresholdMethod" in config and config["thresholdMethod"] not in THRESHOLD_METHODS:
        errors.append(f'Thresholding: "{config["thresholdMethod"]}"')
    if "outputs" in config:
        for fmt in config["outputs"]:
            if fmt not in OUTPUTS:
                errors.append(f'Formato de resultado: "{config["outputs"]}"')
    if "dpi" in config and not isinstance(config["dpi"], (int, str)):
        errors.append(f'DPI: "{config["dpi"]}"')
    if "otherParams" in config and not isinstance(config["otherParams"], dict):
        errors.append(f'Outros parâmetros: "{config["otherParams"]}"')
    return len(errors) == 0, errors


def resolve_config(user: dict | None = None) -> OcrConfig:
    """Overlay a user config dict on the defaults, validate, and freeze."""
    merged = dict(DEFAULTS)
    user = user or {}
    merged.update({k: v for k, v in user.items() if v is not None})
    # S7 ordering parity: the "k=v;k=v" otherParams string is parsed into a
    # dict BEFORE validation (celery_app.py:753-768 runs before verify)
    other = merged.get("otherParams", {})
    if isinstance(other, str):
        other_pairs = parse_other_params(other)
        merged["otherParams"] = dict(other_pairs)
    else:
        other_pairs = tuple(sorted(dict(other).items()))
    ok, errors = verify_params(merged)
    if not ok:
        raise ValueError("invalid OCR config: " + "; ".join(errors))
    return OcrConfig(
        engine=merged["engine"],
        lang=tuple(merged["lang"]),
        outputs=tuple(merged["outputs"]),
        engine_mode=merged["engineMode"],
        segment_mode=merged["segmentMode"],
        threshold_method=merged["thresholdMethod"],
        dpi=int(merged["dpi"]) if merged.get("dpi") is not None else None,
        other_params=other_pairs,
    )
