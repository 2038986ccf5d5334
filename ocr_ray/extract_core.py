"""Per-document extraction core — pure, Ray-free, shared by the in-process
oracle (test goldens) and the distributed stages. Distribution can therefore
never change bytes: both paths call exactly these functions
(SURVEY.md §7.4 "every normalization choice lives in exactly one kernel").

Flow per document (one input row):
- route by payload sniff (html vs ocr vs error);
- HTML branch: DOM parse + block scoring → paragraphs → spans/text (L4);
- OCR branch: payload explode (S1-S5) → per-page engine hOCR → parse (M2) →
  span flatten; pages stay in explode order (O1/O2 are applied inside the
  explode, so no distributed ordering assumption exists);
- text assembly = ``doc_text`` over ``page_text`` (M7/W1 byte semantics);
- any failure → error row (``error`` column set, empty text/spans) — a
  deliberate upgrade over the reference's abort-probe poisoning
  (celery_app.py:1024-1026): one bad page never kills a partition.
"""

from __future__ import annotations

import zlib

from .kernels import assemble
from .kernels.hocr import parse_hocr
from .kernels.html_extract import DEFAULT_SETTINGS, ExtractSettings, extract_blocks
from .sources.payloads import explode_pages, sniff_format

# Output-partition FLOOR. choose_num_parts scales it up with input bytes
# (one part per ~32 MB); the floor only binds on small inputs, where fewer
# parts mean fewer phase-2 consolidation tasks — at short walls that fixed
# scheduling tail is what bounds N→4N scaling efficiency (measured round 3:
# the extract stage scales at 0.90 while the wall scaled at 0.70).
DEFAULT_NUM_PARTS = 32


def url_part(url: str, num_parts: int = DEFAULT_NUM_PARTS) -> int:
    """Stable output-partition id: crc32(url) % P. Used for lineage,
    resume, and as the single reusable partitioning key (SURVEY.md §4.2)."""
    return zlib.crc32(url.encode("utf-8")) % num_parts


def route(data: bytes) -> str:
    """'html' | 'ocr' | 'error' branch for a payload."""
    fmt = sniff_format(data)
    if fmt == "html":
        return "html"
    if fmt in ("pdf", "zip", "tiff", "image"):
        return "ocr"
    return "error"


def extract_html_doc(data: bytes, settings: ExtractSettings = DEFAULT_SETTINGS) -> dict:
    markup = data.decode("utf-8", errors="replace")
    pars = extract_blocks(markup, settings)
    page = "\n\n".join("\n".join(" ".join(line) for line in lines) for lines in pars).strip()
    spans = assemble.text_spans(pars, page_no=0)
    return {
        "branch": "html",
        "text": assemble.doc_text([page]),
        "spans": spans,
        "n_pages": 1,
        "n_words": len(spans),
        "error": None,
    }


def extract_ocr_doc(data: bytes, engine) -> dict:
    pages = explode_pages(data)
    page_texts = []
    spans: list[dict] = []
    n_words = 0
    for page_no, page_bytes in enumerate(pages):
        hocr = engine.recognize(page_bytes)
        tree = parse_hocr(hocr)
        page_texts.append(assemble.page_text(tree))
        spans.extend(assemble.tree_to_spans(tree, page_no=page_no))
        n_words += assemble.word_count(tree)
    return {
        "branch": "ocr",
        "text": assemble.doc_text(page_texts),
        "spans": spans,
        "n_pages": len(pages),
        "n_words": n_words,
        "error": None,
    }


def error_doc(branch: str, message: str) -> dict:
    return {
        "branch": branch,
        "text": "",
        "spans": [],
        "n_pages": 0,
        "n_words": 0,
        "error": message,
    }


def extract_document(
    data: bytes,
    engine,
    settings: ExtractSettings = DEFAULT_SETTINGS,
) -> dict:
    """One input payload → one output record (minus the url/ts/lang/part
    passthrough columns, which the caller attaches)."""
    branch = route(data)
    if branch == "error":
        return error_doc("error", f"unsupported payload ({len(data)} bytes)")
    try:
        if branch == "html":
            return extract_html_doc(data, settings)
        return extract_ocr_doc(data, engine)
    except Exception as exc:  # noqa: BLE001 — error-column semantics
        return error_doc(branch, f"{type(exc).__name__}: {exc}")
