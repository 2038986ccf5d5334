"""Layout-analysis operators over the pages corpus: the reference's
auto-segmentation (L1), reading-order sort (O3), layout-routed segment OCR
(M1's box path), and the searchable-PDF text-layer placement math (W3).

- ``auto_layout``: engine block segmentation per page → box-group records →
  reading-order sort + renumber (parity: celery_app.py:85-174
  task_auto_segment; box record shape celery_app.py:128-147).
- ``segmented_extract``: OCR each *text* box separately with SetRectangle
  semantics and the segment coordinate offset (parity:
  celery_app.py:1038-1161 + parse_hocr.py:78-85). For non-overlapping
  blocks the assembled text equals the whole-page path — asserted in tests.
- ``pdf_text_layer``: the invisible-text overlay placement of export_pdf
  (export.py:533-568): x = l·dpi_out/dpi_in, y = H − b·dpi_out/dpi_in,
  horizontal scale stretching the string to the box width. Font metrics are
  STUBBED (no reportlab in this container) with a fixed per-char width; the
  placement math is the real thing.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..config import resolve_config
from ..engines import get_engine_cls
from ..extract_core import route
from ..kernels import assemble
from ..kernels.hocr import parse_hocr
from ..kernels.layout import group_bounds, make_box_group, reading_order
from ..kernels.textfn import bbox_scale
from ..sources.payloads import explode_pages
from .common import small_pool
from .extraction_queries import extraction_output, pages_corpus

DPI_IN = 300.0
DPI_OUT = 150.0
PAGE_H = 3508.0  # A4 @ 300dpi, the synthetic page box (hocr_write default)
_CHAR_W_8PT = 4.8  # stub Times-Roman 8pt mean advance width (no reportlab)


def _page_rows(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(pages_corpus(sf_dir), columns=["url", "html"])

    def explode(batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            if route(r["html"]) != "ocr":
                continue
            try:
                for page_no, page in enumerate(explode_pages(r["html"])):
                    out.append({"url": r["url"], "page_no": page_no, "page_png": page})
            except Exception:
                continue
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("page_no", pa.int32()),
                 pa.field("page_png", pa.binary())]
            ),
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


class LayoutWorker:
    """Actor: block segmentation + reading-order (T4-style heavy state slot)."""

    def __init__(self):
        self.engine = get_engine_cls(resolve_config().engine)(resolve_config())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            try:
                boxes = self.engine.get_boxes(r["page_png"])
            except Exception:
                continue
            groups = [
                make_box_group(left, top, left + w, top + h,
                               seed=f"{r['url']}#{r['page_no']}")
                for (left, top, w, h) in boxes
            ]
            for g in reading_order(groups, page_no=r["page_no"] + 1):
                sq = g["squares"][0]
                out.append(
                    {"url": r["url"], "page_no": r["page_no"],
                     "group_id": g["groupId"], "uniq_id": g["_uniq_id"],
                     "kind": g["type"], "top": float(sq["top"]),
                     "left": float(sq["left"]), "bottom": float(sq["bottom"]),
                     "right": float(sq["right"])}
                )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("page_no", pa.int32()),
                 pa.field("group_id", pa.string()), pa.field("uniq_id", pa.string()),
                 pa.field("kind", pa.string()), pa.field("top", pa.float64()),
                 pa.field("left", pa.float64()), pa.field("bottom", pa.float64()),
                 pa.field("right", pa.float64())]
            ),
        )


def auto_layout(sf_dir: str) -> ray.data.Dataset:
    return _page_rows(sf_dir).map_batches(
        LayoutWorker, batch_format="pyarrow", batch_size=64,
        concurrency=small_pool(), num_cpus=1,
    )


class SegmentOcrWorker:
    """Layout-routed OCR: recognize each text box with segment semantics."""

    def __init__(self):
        self.engine = get_engine_cls(resolve_config().engine)(resolve_config())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            try:
                boxes = self.engine.get_boxes(r["page_png"])
                groups = [
                    make_box_group(left, top, left + w, top + h)
                    for (left, top, w, h) in boxes
                ]
                tree: list = []
                for g in reading_order(groups, page_no=r["page_no"] + 1):
                    seg = group_bounds(g)
                    hocr = self.engine.recognize(r["page_png"], segment_box=seg)
                    tree.extend(parse_hocr(hocr, segment_box=seg))
                out.append(
                    {"url": r["url"], "page_no": r["page_no"],
                     "n_segments": len(groups),
                     "page_text": assemble.page_text(tree),
                     "n_words": assemble.word_count(tree)}
                )
            except Exception as exc:  # noqa: BLE001
                out.append(
                    {"url": r["url"], "page_no": r["page_no"], "n_segments": 0,
                     "page_text": "", "n_words": 0}
                )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("page_no", pa.int32()),
                 pa.field("n_segments", pa.int32()),
                 pa.field("page_text", pa.string()),
                 pa.field("n_words", pa.int32())]
            ),
        )


def segmented_extract(sf_dir: str) -> ray.data.Dataset:
    return _page_rows(sf_dir).map_batches(
        SegmentOcrWorker, batch_format="pyarrow", batch_size=64,
        concurrency=small_pool(), num_cpus=1,
    )


class CvLayoutWorker:
    """L2 path: PIXEL-NATIVE corner detection + density clustering — decode
    the page PNG, compute ink-transition corners over the raw pixel array
    (kernels.raster.corner_points), cluster (kernels.layout HDBSCAN-lite).
    No recognition step at all: like the reference's image.py chain, layout
    comes straight from pixels. Heavy-import actor slot (T4) — a real
    deployment loads cv2/hdbscan here once per actor."""

    def __init__(self):
        # warm state: the codec/kernel modules (a real deployment's cv2 init)
        from ..kernels import raster

        self.raster = raster

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.layout import cv_layout_boxes_pixels

        out = []
        for r in batch.to_pylist():
            page = r["page_png"]
            try:
                img = self.raster.png_decode(page)
            except Exception:  # noqa: BLE001 — undecodable page: no layout
                continue
            boxes = cv_layout_boxes_pixels(img, page_w=2480.0, page_h=3508.0)
            if not boxes:
                continue
            groups = [
                make_box_group(l, t, rr, b, seed=f"{r['url']}#{r['page_no']}cv")
                for (l, t, rr, b) in boxes
            ]
            for g in reading_order(groups, page_no=r["page_no"] + 1):
                sq = g["squares"][0]
                out.append(
                    {"url": r["url"], "page_no": r["page_no"],
                     "group_id": g["groupId"],
                     "top": float(sq["top"]), "left": float(sq["left"]),
                     "bottom": float(sq["bottom"]), "right": float(sq["right"])}
                )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("page_no", pa.int32()),
                 pa.field("group_id", pa.string()), pa.field("top", pa.float64()),
                 pa.field("left", pa.float64()), pa.field("bottom", pa.float64()),
                 pa.field("right", pa.float64())]
            ),
        )


def cv_layout(sf_dir: str) -> ray.data.Dataset:
    return _page_rows(sf_dir).map_batches(
        CvLayoutWorker, batch_format="pyarrow", batch_size=32,
        concurrency=small_pool(), num_cpus=1,
    )


def pdf_export(sf_dir: str) -> ray.data.Dataset:
    """Searchable PDF (W3) as REAL bytes per OCR-branch document: invisible
    Times-Roman text layer per page + the trailing 2-column word-index pages
    (incl. the reference's 134-of-200 pagination quirk), produced by the
    from-scratch writer in :mod:`ocr_ray.kernels.pdfgen` (export.py:238-489
    parity; raster underlay omitted — library-gated). Output is
    byte-deterministic; the query returns (sha256, size) per document so
    the driver's value-hash pins every byte without shipping ~30 KB blobs
    through the compare — consumers wanting the files render them with
    kernels.pdfgen.searchable_pdf."""
    import hashlib

    from ..kernels.pdfgen import searchable_pdf
    from ..kernels.windex import merge_page_indexes, page_index_words_texts
    from .extraction_queries import _doc_stream

    out = extraction_output(sf_dir, columns=["url", "spans", "error", "branch"])

    def build(batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        offsets = spans_col.offsets.to_numpy()
        flat = spans_col.flatten()
        texts = flat.field("text").to_pylist()
        box_np = flat.field("box").flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        b_np = flat.field("b").to_numpy(zero_copy_only=False)
        pages_a = flat.field("page").to_numpy(zero_copy_only=False)
        branch = batch.column("branch").to_pylist()
        base = offsets[0]
        cols = {"url": [], "n_pdf_pages": [], "pdf_sha256": [], "n_bytes": []}
        for i, url, pages in _doc_stream(batch):
            if branch[i] != "ocr" or not pages:
                continue
            lo, hi = offsets[i] - base, offsets[i + 1] - base
            per_page: dict[int, list] = {}
            for j in range(lo, hi):
                per_page.setdefault(int(pages_a[j]), []).append(
                    (texts[j], float(box_np[j, 0]), float(box_np[j, 2]), float(b_np[j]))
                )
            page_spans = [per_page[p] for p in sorted(per_page)]
            entries = merge_page_indexes(
                [page_index_words_texts(tree) for _, tree in pages]
            )
            pdf = searchable_pdf(page_spans, entries)
            n_index_pages = (len(entries) + 199) // 200
            cols["url"].append(url)
            cols["n_pdf_pages"].append(len(page_spans) + n_index_pages)
            cols["pdf_sha256"].append(hashlib.sha256(pdf).hexdigest())
            cols["n_bytes"].append(len(pdf))
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "n_pdf_pages": pa.array(cols["n_pdf_pages"], pa.int32()),
             "pdf_sha256": pa.array(cols["pdf_sha256"], pa.string()),
             "n_bytes": pa.array(cols["n_bytes"], pa.int64())}
        )

    return out.map_batches(build, batch_format="pyarrow")


def pdf_text_layer(sf_dir: str) -> ray.data.Dataset:
    """Per-word invisible-text placement records for the searchable PDF."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error", "branch"])

    def layer(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if r["error"] is not None or r["branch"] != "ocr":
                continue
            for s in r["spans"]:
                box = s["box"]
                text_w = _CHAR_W_8PT * len(s["text"])
                if text_w <= 0:
                    continue
                box_w = bbox_scale(box[2] - box[0], DPI_OUT, DPI_IN)
                rows.append(
                    {
                        "url": r["url"], "page": s["page"], "word": s["text"],
                        "x": round(bbox_scale(box[0], DPI_OUT, DPI_IN), 4),
                        "y": round(PAGE_H * DPI_OUT / DPI_IN
                                   - bbox_scale(s["b"], DPI_OUT, DPI_IN), 4),
                        "horiz_scale": round(100.0 * box_w / text_w, 2),
                    }
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("page", pa.int32()),
                 pa.field("word", pa.string()), pa.field("x", pa.float64()),
                 pa.field("y", pa.float64()),
                 pa.field("horiz_scale", pa.float64())]
            ),
        )

    return out.map_batches(layer, batch_format="pyarrow")
