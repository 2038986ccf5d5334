"""Page-level fan-out extraction variant (SURVEY.md §3.1 / §7.1 step 4).

For corpora where single documents are huge (the reference's 2000-page PDF
case, SURVEY.md §4.1 skew row), per-document processing creates stragglers.
This variant reproduces the reference's page-granular parallelism:

    stamp ──► flat_map page explode (S1-S5; pages of one doc land in
              different blocks)
          ──► OcrPageWorker actor pool (per-page hOCR → tree → spans/text)
          ──► groupby("url") fan-in (the chord/last-finisher of
              celery_app.py:1171-1183, expressed as a hash shuffle)
          ──► per-doc assembly (page order by explicit page_no column —
              never block order)

Costs one extra all-to-all (url fan-in) vs the flagship; output is
byte-identical (tested in tests/test_pipeline.py). HTML rows take the same
stateless path as the flagship.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..config import OcrConfig, resolve_config
from ..engines import get_engine_cls
from ..extract_core import DEFAULT_NUM_PARTS, error_doc, extract_html_doc, route
from ..kernels import assemble
from ..kernels.hocr import parse_hocr
from ..kernels.html_extract import DEFAULT_SETTINGS, ExtractSettings
from ..schemas import EXTRACT_WIRE_SCHEMA, pack_spans
from ..sources.payloads import explode_pages
from ..stages.stamp import make_stamp_fn
from .extract import DEFAULT_BATCH_SIZE, default_concurrency

# Intermediate per-page schema: page payload + passthrough + html fast-path
# results (html docs are single "page" rows carrying their finished record).
_PAGE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("part", pa.int32()),
        pa.field("page_no", pa.int32()),
        pa.field("n_pages", pa.int32()),
        pa.field("page_png", pa.binary()),
        pa.field("branch", pa.string()),
        pa.field("error", pa.string()),
    ]
)

_OCRED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("part", pa.int32()),
        pa.field("page_no", pa.int32()),
        pa.field("n_pages", pa.int32()),
        pa.field("branch", pa.string()),
        pa.field("page_text", pa.string()),
        pa.field("spans_json", pa.string()),
        pa.field("n_words", pa.int32()),
        pa.field("error", pa.string()),
    ]
)


def _explode_batch(batch: pa.Table) -> pa.Table:
    """S1-S5: one row per page. Page ORDER is fixed here (explode order =
    numeric page order for PDFs/TIFFs, casefold member order for ZIPs) and
    carried as an explicit page_no column."""
    out = []
    for row in batch.to_pylist():
        base = {
            "url": row["url"],
            "warc_ts": row["warc_ts"],
            "lang": row["lang"],
            "part": row["part"],
        }
        branch = route(row["html"])
        if branch == "error":
            # flagship message parity (extract_core.extract_document)
            out.append(
                {**base, "page_no": 0, "n_pages": 0, "page_png": b"",
                 "branch": "error",
                 "error": f"unsupported payload ({len(row['html'])} bytes)"}
            )
            continue
        if branch == "html":
            # html docs pass through as a single pseudo-page carrying the raw
            # payload; the page worker extracts them inline
            out.append(
                {**base, "page_no": 0, "n_pages": 1, "page_png": row["html"],
                 "branch": "html", "error": None}
            )
            continue
        try:
            pages = explode_pages(row["html"])
        except Exception as exc:  # noqa: BLE001
            out.append(
                {**base, "page_no": 0, "n_pages": 0, "page_png": b"",
                 "branch": "ocr", "error": f"{type(exc).__name__}: {exc}"}
            )
            continue
        for page_no, page in enumerate(pages):
            out.append(
                {**base, "page_no": page_no, "n_pages": len(pages),
                 "page_png": page, "branch": "ocr", "error": None}
            )
    return pa.Table.from_pylist(out, schema=_PAGE_SCHEMA)


class OcrPageWorker:
    """Per-page OCR actor (the reference's task_page_ocr unit,
    celery_app.py:998-1224). Spans are carried as JSON strings between the
    page stage and the fan-in to keep the intermediate schema flat."""

    def __init__(self, config: OcrConfig | None = None,
                 settings: ExtractSettings = DEFAULT_SETTINGS):
        import json as _json

        self._json = _json
        self.config = config or resolve_config()
        self.settings = settings
        self.engine = get_engine_cls(self.config.engine)(self.config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            rec = {
                "url": row["url"], "warc_ts": row["warc_ts"], "lang": row["lang"],
                "part": row["part"], "page_no": row["page_no"],
                "n_pages": row["n_pages"], "branch": row["branch"],
                "page_text": "", "spans_json": "[]", "n_words": 0,
                "error": row["error"],
            }
            if row["error"] is None and row["branch"] == "html":
                doc = extract_html_doc(row["page_png"], self.settings)
                rec.update(
                    page_text=doc["text"], n_words=doc["n_words"],
                    spans_json=self._json.dumps(doc["spans"]),
                )
            elif row["error"] is None and row["branch"] == "ocr":
                try:
                    tree = parse_hocr(self.engine.recognize(row["page_png"]))
                    spans = assemble.tree_to_spans(tree, page_no=row["page_no"])
                    rec.update(
                        page_text=assemble.page_text(tree),
                        spans_json=self._json.dumps(spans),
                        n_words=assemble.word_count(tree),
                    )
                except Exception as exc:  # noqa: BLE001
                    rec["error"] = f"{type(exc).__name__}: {exc}"
            out.append(rec)
        return pa.Table.from_pylist(out, schema=_OCRED_SCHEMA)


def _assemble_doc(group: pa.Table) -> pa.Table:
    """Fan-in: pages of one url → one output row. Page order restored from
    the page_no column (SURVEY.md §7.4 ordering under parallelism)."""
    import json as _json

    rows = sorted(group.to_pylist(), key=lambda r: r["page_no"])
    first = rows[0]
    base = {
        "url": first["url"], "warc_ts": first["warc_ts"], "lang": first["lang"],
        "part": first["part"], "branch": first["branch"],
    }
    # first failing page (in page order) errors the whole doc — matching the
    # flagship, whose sequential page loop aborts on the first failure
    page_error = next((r["error"] for r in rows if r["error"] is not None), None)
    if page_error is not None:
        rec = {**base, **error_doc(first["branch"], page_error)}
        rec["spans_bin"] = pack_spans(rec.pop("spans"))
        return pa.Table.from_pylist([rec], schema=EXTRACT_WIRE_SCHEMA)
    if first["branch"] == "html":
        rec = {
            **base,
            "text": first["page_text"],
            "spans": _json.loads(first["spans_json"]),
            "n_pages": 1, "n_words": first["n_words"], "error": None,
        }
    else:
        spans: list = []
        for r in rows:
            spans.extend(_json.loads(r["spans_json"]))
        rec = {
            **base,
            "text": assemble.doc_text([r["page_text"] for r in rows]),
            "spans": spans,
            "n_pages": first["n_pages"],
            "n_words": sum(r["n_words"] for r in rows),
            "error": None,
        }
    rec["spans_bin"] = pack_spans(rec.pop("spans"))
    return pa.Table.from_pylist([rec], schema=EXTRACT_WIRE_SCHEMA)


def extract_dataset_exploded(
    ds: ray.data.Dataset,
    config: OcrConfig | None = None,
    settings: ExtractSettings = DEFAULT_SETTINGS,
    num_parts: int = DEFAULT_NUM_PARTS,
    done_parts: frozenset[int] = frozenset(),
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
) -> ray.data.Dataset:
    config = config or resolve_config()
    if concurrency is None:
        concurrency = default_concurrency()
    ds = ds.map_batches(
        make_stamp_fn(num_parts, done_parts),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ds = ds.map_batches(_explode_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        OcrPageWorker,
        fn_constructor_kwargs={"config": config, "settings": settings},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
    # fan-in key is (url, warc_ts): a re-crawl of the same url is a distinct
    # document until the latest-wins dedup in finalize()/the sink
    return ds.groupby(["url", "warc_ts"]).map_groups(_assemble_doc, batch_format="pyarrow")
