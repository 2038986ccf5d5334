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


def _pack_strings(values: list) -> tuple[bytes, "object", "object"]:
    """(utf-8 data, int32 offsets, validity bools|None) for a str/None list."""
    import numpy as np

    has_null = any(v is None for v in values)
    enc = [(v or "").encode("utf-8") for v in values]
    offs = np.zeros(len(enc) + 1, dtype=np.int32)
    if enc:
        np.cumsum([len(e) for e in enc], out=offs[1:])
    valid = None
    if has_null:
        valid = np.array([v is not None for v in values], dtype=np.bool_)
    return b"".join(enc), offs, valid


def pack_spans(spans: list[dict]) -> bytes:
    """Pickle the span list COLUMNARLY as numpy/bytes buffers (one entry per
    field) so unpacking touches NO per-span Python objects: strings travel
    as (utf8-data, offsets, validity) triples, numerics as numpy arrays.
    The round-1 list-of-values format made the consolidation phase allocate
    millions of Python objects per task — 32 concurrent tasks contended the
    allocator so hard that per-task time grew 10-25× (measured: 1.2 s idle
    → 12-31 s at 400k docs / 32 CPUs)."""
    import pickle

    import numpy as np

    n = len(spans)
    text = _pack_strings([s["text"] for s in spans])
    font = _pack_strings([s.get("font") for s in spans])
    cols = (
        n,
        text,
        np.array([v for s in spans for v in s["box"]], dtype=np.float64),
        np.array([s["b"] for s in spans], dtype=np.float64),
        np.array([s["conf"] for s in spans], dtype=np.int32),
        font,
        np.array([s["page"] for s in spans], dtype=np.int32),
        np.array([s["par"] for s in spans], dtype=np.int32),
        np.array([s["line"] for s in spans], dtype=np.int32),
    )
    return pickle.dumps(cols, protocol=5)


def _string_array(n: int, data: bytes, offs, valid) -> pa.Array:
    import numpy as np

    null_buf = None
    null_count = 0
    if valid is not None:
        null_buf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        null_count = int(n - valid.sum())
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offs.astype(np.int32, copy=False).tobytes()),
        pa.py_buffer(data), null_buf, null_count,
    )


def unpack_spans(blob: bytes) -> list[dict]:
    """Inverse of pack_spans back to span dicts (small-data/test path)."""
    import pickle

    n, text, box_flat, b, conf, font, page, par, line = pickle.loads(blob)
    texts = _string_array(n, *text).to_pylist()
    fonts = _string_array(n, *font).to_pylist()
    return [
        {
            "text": texts[i],
            "box": list(box_flat[4 * i : 4 * i + 4]),
            "b": float(b[i]),
            "conf": int(conf[i]),
            "font": fonts[i],
            "page": int(page[i]),
            "par": int(par[i]),
            "line": int(line[i]),
        }
        for i in range(n)
    ]


def _concat_strings(parts: list[tuple]) -> pa.Array:
    """Concatenate per-row (data, offsets, validity) string triples into ONE
    StringArray without creating Python strings."""
    import numpy as np

    datas = [p[0] for p in parts]
    n_total = sum(len(p[1]) - 1 for p in parts)
    offs = np.zeros(n_total + 1, dtype=np.int64)
    pos = 0
    base = 0
    for data, o, _v in parts:
        k = len(o) - 1
        offs[pos + 1 : pos + k + 1] = o[1:].astype(np.int64) + base
        base += len(data)
        pos += k
    any_null = any(p[2] is not None for p in parts)
    valid = None
    if any_null:
        valid = np.concatenate(
            [p[2] if p[2] is not None else np.ones(len(p[1]) - 1, dtype=np.bool_)
             for p in parts]
        )
    # StringArray offsets are int32: a consolidated partition whose string
    # data tops 2 GiB would silently WRAP on the astype(int32) below and
    # produce corrupt strings. Fail loudly instead — the fix at that point
    # is more partitions (choose_num_parts), not a bigger array.
    if base > np.iinfo(np.int32).max:
        raise ValueError(
            f"concatenated string data is {base} bytes > int32 offset limit; "
            f"raise the partition count so each consolidated part stays < 2 GiB"
        )
    return _string_array(
        n_total, b"".join(datas), offs.astype(np.int32), valid
    )


def unpack_wire_batch(batch: pa.Table) -> pa.Table:
    """Wire batch (spans_bin) → final EXTRACT_SCHEMA batch (nested spans).

    Fully vectorized: per-field numpy concatenation + Arrow from_buffers
    string assembly — zero per-span Python objects, so concurrent
    consolidation tasks no longer serialize on the allocator (phase-2 wall
    at 400k docs / 32 CPUs: 36 s → single-digit seconds)."""
    import pickle

    import numpy as np

    blobs = batch.column("spans_bin").to_pylist()
    rows = [pickle.loads(blob) for blob in blobs]
    counts = np.zeros(len(rows) + 1, dtype=np.int32)
    if rows:
        np.cumsum([r[0] for r in rows], out=counts[1:])

    def cat(idx, dtype):
        arrs = [r[idx] for r in rows if len(r[idx])]
        if not arrs:
            return np.empty(0, dtype=dtype)
        return np.concatenate(arrs)

    text_arr = _concat_strings([r[1] for r in rows])
    font_arr = _concat_strings([r[5] for r in rows])
    struct = pa.StructArray.from_arrays(
        [
            text_arr,
            pa.FixedSizeListArray.from_arrays(pa.array(cat(2, np.float64)), 4),
            pa.array(cat(3, np.float64)),
            pa.array(cat(4, np.int32)),
            font_arr,
            pa.array(cat(6, np.int32)),
            pa.array(cat(7, np.int32)),
            pa.array(cat(8, np.int32)),
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
