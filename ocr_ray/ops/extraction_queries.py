"""Queries layered on the extraction pipeline output: per-document word
index (A1/A2), delimited TXT (W1), CSV index rendering (W2), ALTO (W4).

Each takes ``sf_dir`` like every other query; the pages corpus itself is the
deterministic synthetic table (FIXTURES.md §1) sized to the testdata tier —
generated once into /tmp and cached (TESTDATA.md has no pages table; the
driver brief says to synthesize this input shape)."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from ..kernels import assemble
from ..kernels.alto import page_to_alto
from ..kernels.windex import index_to_csv, merge_page_indexes, page_index_words
from ..pipelines.extract import extract_dataset, finalize
from ..synth import pages_dir_for

_SF_ROWS = {"sf0.001": 1000, "sf0.01": 10000, "sf0.1": 100000}


def corpus_rows_for(sf_dir: str) -> int:
    return _SF_ROWS.get(os.path.basename(os.path.normpath(sf_dir)), 1000)


def pages_corpus(sf_dir: str) -> str:
    return pages_dir_for(corpus_rows_for(sf_dir))


_CODE_FP = None


def _code_fingerprint() -> str:
    """Hash of the ocr_ray sources: any code change invalidates the cached
    extraction output (the resume manifests alone can't see code drift)."""
    global _CODE_FP
    if _CODE_FP is None:
        import hashlib

        import ocr_ray

        pkg_dir = os.path.dirname(ocr_ray.__file__)
        h = hashlib.sha256()
        for root, _, files in sorted(os.walk(pkg_dir)):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if name.endswith(".py"):
                    with open(os.path.join(root, name), "rb") as f:
                        h.update(f.read())
        _CODE_FP = h.hexdigest()[:12]
    return _CODE_FP


def extraction_output(sf_dir: str) -> ray.data.Dataset:
    """Extraction result for the tier's corpus, materialized ONCE per corpus
    through the resumable sink: the first caller runs the pipeline into a
    cache dir; every later query (word_index, exports, similarity, ...)
    resumes instantly off the committed partitions and reads the shards.
    This is the sink's resume machinery doing double duty as a cache —
    rows are identical to finalize(extract_dataset(...)) (same code path)."""
    from ..pipelines.extract import run_extract
    from ..sinks.parquet_sink import SHARD_NAME, committed_parts, partition_dir

    corpus = pages_corpus(sf_dir)
    out_dir = os.path.join(
        "/tmp/ocr_ray_extract_cache",
        f"{os.path.basename(corpus)}-{_code_fingerprint()}",
    )
    run_extract(corpus, out_dir, resume=True)
    shards = [
        os.path.join(partition_dir(out_dir, p), SHARD_NAME)
        for p in sorted(committed_parts(out_dir))
    ]
    return ray.data.read_parquet(shards)


def extraction_output_streamed(sf_dir: str) -> ray.data.Dataset:
    """Uncached single-pass variant (used by parity tests)."""
    ds = ray.data.read_parquet(pages_corpus(sf_dir))
    return finalize(extract_dataset(ds))


def extract_summary(sf_dir: str) -> ray.data.Dataset:
    """Flagship output minus the spans column (drivers hash this; spans are
    exercised by the downstream queries and byte-level pytest goldens)."""
    return extraction_output(sf_dir).select_columns(
        ["url", "warc_ts", "lang", "branch", "text", "n_pages", "n_words", "error", "part"]
    )


def _spans_to_page_trees(spans: list[dict]) -> list[list]:
    """Regroup a doc's span rows into per-page trees (page order ascending)."""
    pages: dict[int, list] = {}
    for span in spans:
        pages.setdefault(span["page"], []).append(span)
    return [assemble.spans_to_tree(pages[p]) for p in sorted(pages)]


def word_index(sf_dir: str) -> ray.data.Dataset:
    """Per-document word index with hyphenation-merge semantics
    (export.py:492-530) over the extraction output spans: one row per
    (url, word) with count and the reference's '1, 3' pages string."""
    out = extraction_output(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if r["error"] is not None or not r["spans"]:
                continue
            trees = _spans_to_page_trees(r["spans"])
            merged = merge_page_indexes([page_index_words(t) for t in trees])
            for word, entry in merged:
                rows.append(
                    {"url": r["url"], "word": word, "count": entry["count"],
                     "pages": entry["pages"]}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("word", pa.string()),
                 pa.field("count", pa.int64()), pa.field("pages", pa.string())]
            ),
        )

    return out.map_batches(build, batch_format="pyarrow")


def index_csv(sf_dir: str) -> ray.data.Dataset:
    """url → the reference-byte-format CSV index (W2) as a column."""
    out = extraction_output(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if r["error"] is not None:
                continue
            trees = _spans_to_page_trees(r["spans"])
            merged = merge_page_indexes([page_index_words(t) for t in trees])
            rows.append({"url": r["url"], "index_csv": index_to_csv(merged)})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("index_csv", pa.string())]
            ),
        )

    return out.map_batches(build, batch_format="pyarrow")


def txt_delimited(sf_dir: str) -> ray.data.Dataset:
    """url → the '----- PAGE %04d -----' delimited TXT bytes (W1 variant,
    export.py:180-183)."""
    out = extraction_output(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if r["error"] is not None:
                continue
            trees = _spans_to_page_trees(r["spans"])
            page_texts = [assemble.page_text(t) for t in trees]
            if not page_texts and r["branch"] == "html":
                page_texts = [r["text"][:-2] if r["text"].endswith("\n\n") else r["text"]]
            rows.append(
                {"url": r["url"],
                 "txt_delimited": assemble.doc_text(page_texts, delimiter=True)}
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("txt_delimited", pa.string())]
            ),
        )

    return out.map_batches(build, batch_format="pyarrow")


def alto_pages(sf_dir: str) -> ray.data.Dataset:
    """OCR-branch docs → one ALTO v3 XML document per page (W4)."""
    out = extraction_output(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if r["error"] is not None or r["branch"] != "ocr":
                continue
            for page_no, tree in enumerate(_spans_to_page_trees(r["spans"])):
                rows.append(
                    {"url": r["url"], "page_no": page_no,
                     "alto_xml": page_to_alto(tree, source_name=r["url"])}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("page_no", pa.int64()),
                 pa.field("alto_xml", pa.string())]
            ),
        )

    return out.map_batches(build, batch_format="pyarrow")


def extraction_similarity(sf_dir: str) -> ray.data.Dataset:
    """The reference's only output-quality check, distributed: fuzzy ratio
    between extracted text and a reference rendition (here the crawler's
    noisy ``text`` column) per url (parity: evaluate.py:5-16
    SequenceMatcher.ratio)."""
    import pyarrow.compute as pc

    from ..kernels.textfn import similarity_ratio

    pages = ray.data.read_parquet(pages_corpus(sf_dir), columns=["url", "text"])

    # broadcast the (url -> crawler text) map: small relative to payloads;
    # at corpus scale this becomes a co-partitioned join on url-hash
    import ray as _ray

    crawler = {}
    for r in pages.take_all():
        crawler[r["url"]] = r["text"]
    crawler_ref = _ray.put(crawler)

    out = extraction_output(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        cmap = _ray.get(crawler_ref)
        rows = []
        for r in batch.to_pylist():
            if r["error"] is not None:
                continue
            ref_text = cmap.get(r["url"], "")
            rows.append(
                {"url": r["url"], "branch": r["branch"],
                 "ratio": round(similarity_ratio(r["text"], ref_text), 4)}
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("url", pa.string()), pa.field("branch", pa.string()),
                 pa.field("ratio", pa.float64())]
            ),
        )

    return out.map_batches(score, batch_format="pyarrow")


def search_index_docs(sf_dir: str) -> ray.data.Dataset:
    """One searchable record per page — the reference's Elasticsearch doc
    shape {Document, Path, Page, Text, Engine, Config}
    (elastic_search.py:192-231) built as a Dataset; the ES bulk writer is an
    external-service sink and intentionally out of scope (SURVEY.md W8)."""
    out = extraction_output(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            if r["error"] is not None:
                continue
            trees = _spans_to_page_trees(r["spans"]) if r["spans"] else []
            page_texts = (
                [assemble.page_text(t) for t in trees]
                if trees
                else [r["text"][:-2] if r["text"].endswith("\n\n") else r["text"]]
            )
            for page_no, text in enumerate(page_texts):
                rows.append(
                    {"document": r["url"], "path": f"{r['url']}#page={page_no}",
                     "page": page_no, "text": text, "engine": "stub",
                     "config": "lang=por"}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("document", pa.string()), pa.field("path", pa.string()),
                 pa.field("page", pa.int64()), pa.field("text", pa.string()),
                 pa.field("engine", pa.string()), pa.field("config", pa.string())]
            ),
        )

    return out.map_batches(build, batch_format="pyarrow")


def branch_stats(sf_dir: str) -> ray.data.Dataset:
    """Extraction health rollup: per-branch doc/page/word/error counts."""
    import pandas as pd

    from .common import grouped_agg

    out = extraction_output(sf_dir)

    def with_err(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        errs = pc.cast(pc.is_valid(batch.column("error")), pa.int32())
        return batch.select(["branch", "n_pages", "n_words"]).append_column(
            "is_err", errs
        )

    ds = out.map_batches(with_err, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("branch").reset_index(drop=True)

    return grouped_agg(
        ds,
        keys=["branch"],
        specs=[
            ("n_docs", "count", None),
            ("n_pages", "sum", "n_pages"),
            ("n_words", "sum", "n_words"),
            ("n_errors", "sum", "is_err"),
        ],
        finalize=fin,
    )
