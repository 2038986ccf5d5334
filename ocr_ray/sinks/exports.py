"""File-tree export sink: the reference's user-facing `_export/` artifacts
written per document from the extraction output.

Layout (one directory per url, partitioned by output part for resumability):

    exports/part=<k>/<url-slug>/_txt.txt
                               /_txt_delimited.txt
                               /_index.csv
                               /_hocr.hocr
                               /_xml.xml        (ALTO, OCR-branch docs)

Content bytes are the reference formats exactly: TXT = export_txt
(export.py:149-187), CSV = export_csv (export.py:193-232), ALTO per page
(export.py:943-984, intent), hOCR = our serializer. Which files get written
follows the ``outputs`` config tuple — the reference's output-type selection
surface (celery_app.py:1242-1422).
"""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow as pa

from ..kernels import assemble
from ..kernels.alto import page_to_alto
from ..kernels.hocr_write import tree_to_hocr
from ..kernels.windex import index_to_csv, merge_page_indexes, page_index_words

_SLUG_RE = re.compile(r"[^A-Za-z0-9._-]+")


def url_slug(url: str) -> str:
    """Filesystem-safe, collision-free directory name for a url."""
    base = _SLUG_RE.sub("_", url)[:80].strip("_")
    digest = hashlib.sha256(url.encode("utf-8")).hexdigest()[:12]
    return f"{base}-{digest}"


def _page_trees(spans: list[dict]) -> list[list]:
    pages: dict[int, list] = {}
    for span in spans:
        pages.setdefault(span["page"], []).append(span)
    return [assemble.spans_to_tree(pages[p]) for p in sorted(pages)]


def write_doc_exports(row: dict, doc_dir: str, outputs: tuple[str, ...]) -> list[str]:
    """Write the requested export files for one extraction-output row."""
    os.makedirs(doc_dir, exist_ok=True)
    written = []
    trees = _page_trees(row["spans"]) if row["spans"] else []
    page_texts = [assemble.page_text(t) for t in trees]
    if not page_texts and row["branch"] == "html":
        text = row["text"]
        page_texts = [text[:-2] if text.endswith("\n\n") else text]

    def emit(name: str, content: str):
        path = os.path.join(doc_dir, name)
        with open(path, "w", encoding="utf-8", newline="") as f:
            f.write(content)
        written.append(name)

    if "txt" in outputs:
        emit("_txt.txt", assemble.doc_text(page_texts))
    if "txt_delimited" in outputs:
        emit("_txt_delimited.txt", assemble.doc_text(page_texts, delimiter=True))
    if "csv" in outputs:
        merged = merge_page_indexes([page_index_words(t) for t in trees])
        emit("_index.csv", index_to_csv(merged))
    if "hocr" in outputs and trees:
        emit("_hocr.hocr", "\n".join(tree_to_hocr(t) for t in trees))
    if "xml" in outputs and trees and row["branch"] == "ocr":
        emit(
            "_xml.xml",
            "\n".join(page_to_alto(t, source_name=row["url"]) for t in trees),
        )
    return written


def make_export_writer(out_dir: str, outputs: tuple[str, ...] = ("txt", "txt_delimited", "csv", "xml")):
    """map_batches fn over EXTRACT_SCHEMA rows → ack rows (url, n_files)."""

    def write_batch(batch: pa.Table) -> pa.Table:
        acks = []
        for row in batch.to_pylist():
            if row["error"] is not None:
                continue
            doc_dir = os.path.join(out_dir, f"part={row['part']}", url_slug(row["url"]))
            files = write_doc_exports(row, doc_dir, outputs)
            acks.append({"url": row["url"], "n_files": len(files)})
        return pa.Table.from_pylist(
            acks,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("n_files", pa.int64())]
            ),
        )

    return write_batch
