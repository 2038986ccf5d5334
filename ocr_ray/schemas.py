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

# Wire format between extraction and the sink: identical to EXTRACT_SCHEMA
# except spans ride as ONE pickled binary cell per row. Rationale (measured,
# sf0.1/32cpu): the partition exchange over the nested list<struct> spans
# column took 193s of a 195s run; over flat binary it is seconds. The sink
# (or finalize()) unpacks back to the nested Arrow type, so persisted output
# and query results are unchanged.
EXTRACT_WIRE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("branch", pa.string()),
        pa.field("text", pa.string()),
        pa.field("spans_bin", pa.binary()),
        pa.field("n_pages", pa.int32()),
        pa.field("n_words", pa.int32()),
        pa.field("error", pa.string()),
        pa.field("part", pa.int32()),
    ]
)


def pack_spans(spans: list[dict]) -> bytes:
    """Pickle the span list COLUMNARLY (one tuple per field) so unpacking
    can build Arrow arrays without touching per-span dicts."""
    import pickle

    cols = (
        [s["text"] for s in spans],
        [v for s in spans for v in s["box"]],
        [s["b"] for s in spans],
        [s["conf"] for s in spans],
        [s.get("font") for s in spans],
        [s["page"] for s in spans],
        [s["par"] for s in spans],
        [s["line"] for s in spans],
    )
    return pickle.dumps(cols, protocol=5)


def unpack_spans(blob: bytes) -> list[dict]:
    """Inverse of pack_spans back to span dicts (small-data/test path)."""
    import pickle

    texts, box_flat, b, conf, font, page, par, line = pickle.loads(blob)
    return [
        {
            "text": texts[i],
            "box": list(box_flat[4 * i : 4 * i + 4]),
            "b": b[i],
            "conf": conf[i],
            "font": font[i],
            "page": page[i],
            "par": par[i],
            "line": line[i],
        }
        for i in range(len(texts))
    ]


def unpack_wire_batch(batch: pa.Table) -> pa.Table:
    """Wire batch (spans_bin) → final EXTRACT_SCHEMA batch (nested spans).

    Vectorized: concatenates every row's columnar span tuples and builds the
    list<struct> column with ListArray/StructArray constructors — measured
    ~10× faster than from_pylist over nested dicts (the consolidation phase
    dropped from 90 s to seconds at 400k docs)."""
    import pickle

    import numpy as np

    blobs = batch.column("spans_bin").to_pylist()
    texts: list = []
    box_flat: list = []
    b_vals: list = []
    conf: list = []
    font: list = []
    page: list = []
    par: list = []
    line: list = []
    counts = np.empty(len(blobs) + 1, dtype=np.int64)
    counts[0] = 0
    for i, blob in enumerate(blobs):
        t, bx, bb, cf, fo, pg, pr, ln = pickle.loads(blob)
        counts[i + 1] = counts[i] + len(t)
        texts.extend(t)
        box_flat.extend(bx)
        b_vals.extend(bb)
        conf.extend(cf)
        font.extend(fo)
        page.extend(pg)
        par.extend(pr)
        line.extend(ln)

    struct = pa.StructArray.from_arrays(
        [
            pa.array(texts, pa.string()),
            pa.FixedSizeListArray.from_arrays(pa.array(box_flat, pa.float64()), 4),
            pa.array(b_vals, pa.float64()),
            pa.array(conf, pa.int32()),
            pa.array(font, pa.string()),
            pa.array(page, pa.int32()),
            pa.array(par, pa.int32()),
            pa.array(line, pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    spans_col = pa.ListArray.from_arrays(pa.array(counts, pa.int32()), struct)

    cols = {name: batch.column(name) for name in batch.column_names if name != "spans_bin"}
    cols["spans"] = spans_col
    return pa.table(
        {f.name: cols[f.name] for f in EXTRACT_SCHEMA}, schema=EXTRACT_SCHEMA
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
