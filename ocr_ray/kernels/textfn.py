"""Scalar/string/date helpers shared across kernels and stages.

Semantics mirror the reference's utility layer (see citations per function);
implementations are original and Arrow/batch friendly.
"""

from __future__ import annotations

import difflib
import math
import re

# Punctuation set stripped during word-index normalization.
# Parity: /root/reference/server/src/utils/export.py:494 (``remove_chars``).
INDEX_REMOVE_CHARS = "«»“”.,;:!?()[]{}\"'"

_TRAILING_INT_RE = re.compile(r"\d+")


def clear_text(text: str) -> str:
    """Placeholder text-clean stage: strip leading/trailing whitespace.

    Parity: /root/reference/server/src/utils/text.py:4-18.
    """
    return text.strip()


def polyval(poly, x: float) -> float:
    """Evaluate the linear baseline polynomial ``a*x + b``.

    Parity: /root/reference/server/src/utils/parse_hocr.py:107-115.
    """
    return x * poly[0] + poly[1]


_INDEX_DEL_TABLE = str.maketrans("", "", INDEX_REMOVE_CHARS)


def normalize_index_word(raw: str) -> str:
    """Strip the index punctuation set anywhere in the token and lowercase.

    Parity: /root/reference/server/src/utils/export.py:521-527 (the
    reference's replace() loop == one translate() deletion pass).
    """
    return raw.strip().translate(_INDEX_DEL_TABLE).lower()


def index_sort_key(word: str) -> str:
    """Sort key for the word index: ``word.lower() + word``.

    Parity: /root/reference/server/src/utils/export.py:217-220.
    """
    return word.lower() + word


def page_number_key(name: str) -> int:
    """Numeric page ordering: last integer embedded in the name.

    Parity: /root/reference/server/src/utils/export.py:174-175.
    """
    return int(_TRAILING_INT_RE.findall(name)[-1])


def zip_member_key(name: str) -> tuple[str, str]:
    """Casefold-with-raw-tiebreak ordering for archive members.

    Parity: /root/reference/server/celery_app.py:456.
    """
    return (name.casefold(), name)


def bbox_scale(coord: float, dpi_out: float, dpi_in: float) -> float:
    """Scale a coordinate between DPI spaces.

    Parity: /root/reference/server/src/utils/export.py:559-563.
    """
    return coord * dpi_out / dpi_in


def size_to_units(size_bytes: float) -> str:
    """Humanize a byte count. Parity: /root/reference/server/src/utils/file.py:283-296."""
    units = ["B", "KB", "MB", "GB", "TB"]
    size = float(size_bytes)
    for unit in units:
        if size < 1024 or unit == units[-1]:
            return f"{size:.2f} {unit}"
        size /= 1024
    return f"{size:.2f} TB"


def get_file_basename(filename: str) -> str:
    """Basename without final extension; tolerates multi-dot names and
    backslash separators. Parity: /root/reference/server/src/utils/file.py:552-567."""
    name = filename.replace("\\", "/").rsplit("/", 1)[-1]
    if "." not in name:
        return name
    return name.rsplit(".", 1)[0]


def get_file_extension(filename: str) -> str:
    """Final extension (no dot). Parity: /root/reference/server/src/utils/file.py:570-575."""
    return filename.rsplit(".", 1)[-1]


def estimate_ocr_minutes(n_pages: int) -> int:
    """The reference's published OCR time model.

    Parity: /root/reference/server/src/engines/ocr_tesserocr.py:287-291.
    """
    return math.ceil(0.0176 * n_pages + 0.2632)


def similarity_ratio(a: str, b: str) -> float:
    """Fuzzy text similarity (the reference's only output-quality check).

    Parity: /root/reference/server/src/evaluate.py:5-16.
    """
    return difflib.SequenceMatcher(None, a, b).ratio()
