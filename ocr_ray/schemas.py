"""Declared Arrow schemas — the idiomatic departure from the reference's
schemaless JSON (SURVEY.md §1.2). Every stage consumes/produces these.

Input shape per BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# One word span: the reference's hOCR word record
# (/root/reference/server/src/utils/parse_hocr.py:88-95) flattened with
# explicit (page, par, line) position indices so the paragraph/line/word tree
# survives any shuffle (SURVEY.md §1.2).
SPAN_TYPE = pa.struct(
    [
        pa.field("text", pa.string()),
        pa.field("box", pa.list_(pa.float64(), 4)),
        pa.field("b", pa.float64()),
        pa.field("conf", pa.int32()),
        pa.field("font", pa.string()),
        pa.field("page", pa.int32()),
        pa.field("par", pa.int32()),
        pa.field("line", pa.int32()),
    ]
)

# Flagship pipeline output: one row per url.
EXTRACT_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("branch", pa.string()),       # "html" | "ocr"
        pa.field("text", pa.string()),         # assembled doc text (doc_text, no delimiter)
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("n_pages", pa.int32()),
        pa.field("n_words", pa.int32()),
        pa.field("error", pa.string()),        # null on success
        pa.field("part", pa.int32()),          # hash(url) % num_parts output partition
    ]
)

# Intermediate row after page explode (OCR branch).
PAGE_ROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("page_no", pa.int32()),
        pa.field("n_pages", pa.int32()),
        pa.field("page_png", pa.binary()),
        pa.field("error", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
