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
from ..kernels.windex import index_to_csv, merge_page_indexes, page_index_words_texts
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


def extraction_output(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Extraction result for the tier's corpus, materialized ONCE per corpus
    through the resumable sink: the first caller runs the pipeline into a
    cache dir; every later query (word_index, exports, similarity, ...)
    resumes instantly off the committed partitions and reads the shards.
    This is the sink's resume machinery doing double duty as a cache —
    rows are identical to finalize(extract_dataset(...)) (same code path).

    ``columns`` prunes the parquet read — the spans/text columns dominate
    shard bytes, so every derived query should name only what it consumes."""
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
    from .common import clean_read_schema

    return ray.data.read_parquet(
        shards, columns=columns, schema=clean_read_schema(shards[0], columns)
    )


def extraction_output_streamed(sf_dir: str) -> ray.data.Dataset:
    """Uncached single-pass variant (used by parity tests)."""
    ds = ray.data.read_parquet(pages_corpus(sf_dir))
    return finalize(extract_dataset(ds))


def naive_lines_output(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """:func:`naive_page_lines` materialized ONCE per corpus+code under
    /tmp — the shared visible-lines artifact. Consumers (doc_entities, and
    anything else that only needs the parsed lines) stream-read the dump
    instead of re-parsing the full raw corpus; the first caller pays the
    parse. Atomic publish via staging-dir rename, so concurrent callers
    either see the finished dump or build their own staging copy."""
    import shutil

    from .common import clean_read_schema

    corpus = pages_corpus(sf_dir)
    out_dir = os.path.join(
        "/tmp/ocr_ray_naive_lines",
        f"{os.path.basename(corpus)}-{_code_fingerprint()}",
    )
    if not os.path.isdir(out_dir):
        staging = f"{out_dir}.staging-{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        naive_page_lines(sf_dir).write_parquet(staging)
        try:
            os.replace(staging, out_dir)
        except OSError:  # lost the publish race: another builder won
            shutil.rmtree(staging, ignore_errors=True)
    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(
        files, columns=columns, schema=clean_read_schema(files[0], columns)
    )


def extract_summary(sf_dir: str) -> ray.data.Dataset:
    """Flagship output minus the spans column (drivers hash this; spans are
    exercised by the downstream queries and byte-level pytest goldens)."""
    return extraction_output(
        sf_dir,
        columns=["url", "warc_ts", "lang", "branch", "text", "n_pages",
                 "n_words", "error", "part"],
    )


def _spans_to_page_trees(spans: list[dict]) -> list[list]:
    """Regroup a doc's span rows into per-page trees (page order ascending)."""
    pages: dict[int, list] = {}
    for span in spans:
        pages.setdefault(span["page"], []).append(span)
    return [assemble.spans_to_tree(pages[p]) for p in sorted(pages)]


def _doc_stream(batch: pa.Table):
    """Iterate the non-error docs of an extraction batch WITHOUT
    materializing row dicts or span trees: yields ``(i, url, pages)`` where
    ``pages = [(page_no, texts_tree), ...]`` ascending and ``texts_tree`` is
    the par/line/word nesting holding plain word strings. Reads the span
    child arrays (text/page/par/line) once per batch — this replaced a
    per-row ``to_pylist`` + tree rebuild + deepcopy path that was 53% of
    the round-1 bench."""
    spans_col = batch.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    offsets = spans_col.offsets.to_numpy()
    flat = spans_col.flatten()
    texts = flat.field("text").to_pylist()
    pages_a = flat.field("page").to_numpy()
    pars_a = flat.field("par").to_numpy()
    lines_a = flat.field("line").to_numpy()
    urls = batch.column("url").to_pylist()
    ok = pa.compute.is_null(batch.column("error")).to_pylist()
    base = offsets[0]
    for i, url in enumerate(urls):
        if not ok[i]:
            continue
        lo, hi = offsets[i] - base, offsets[i + 1] - base
        per_page: dict[int, list] = {}
        j = lo
        while j < hi:
            pg = int(pages_a[j])
            secs = per_page.setdefault(pg, [])
            cur_par = cur_line = None
            cur_sec: list = []
            cur_ln: list = []
            while j < hi and pages_a[j] == pg:
                if pars_a[j] != cur_par:
                    cur_sec = []
                    secs.append(cur_sec)
                    cur_par = pars_a[j]
                    cur_line = None
                if lines_a[j] != cur_line:
                    cur_ln = []
                    cur_sec.append(cur_ln)
                    cur_line = lines_a[j]
                cur_ln.append(texts[j])
                j += 1
        yield i, url, sorted(per_page.items())


def _doc_page_texts(batch: pa.Table, i: int, pages, branch_col, text_col) -> list[str]:
    """Per-page texts for one doc, with the html-branch fallback (an html doc
    whose spans were dropped still contributes its assembled text)."""
    page_texts = [assemble.page_text_strs(tree) for _, tree in pages]
    if not page_texts and branch_col[i] == "html":
        t = text_col[i]
        page_texts = [t[:-2] if t.endswith("\n\n") else t]
    return page_texts


def word_index(sf_dir: str) -> ray.data.Dataset:
    """Per-document word index with hyphenation-merge semantics
    (export.py:492-530) over the extraction output spans: one row per
    (url, word) with count and the reference's '1, 3' pages string.
    Oracle: the per-page stage is dumped by :func:`word_index_pages`; the
    cross-page merge (sum + page-list concat) is recomputed in SQL."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error"])

    def build(batch: pa.Table) -> pa.Table:
        urls_out: list[str] = []
        words: list[str] = []
        counts: list[int] = []
        pages_out: list[str] = []
        for _i, url, pages in _doc_stream(batch):
            if not pages:
                continue
            merged = merge_page_indexes(
                [page_index_words_texts(tree) for _, tree in pages]
            )
            for word, entry in merged:
                urls_out.append(url)
                words.append(word)
                counts.append(entry["count"])
                pages_out.append(entry["pages"])
        return pa.table(
            {"url": pa.array(urls_out, pa.string()),
             "word": pa.array(words, pa.string()),
             "count": pa.array(counts, pa.int64()),
             "pages": pa.array(pages_out, pa.string())}
        )

    return out.map_batches(build, batch_format="pyarrow")


def word_index_pages(sf_dir: str) -> ray.data.Dataset:
    """The PER-PAGE word-index stage: one row per (url, page_ord, word) with
    that page's count. ``page_ord`` is the 0-based position in the doc's
    page order — exactly what the merge enumerates — so the document index
    is a pure SQL aggregate over this dump (the oracle for word_index /
    index_csv)."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error"])

    def build(batch: pa.Table) -> pa.Table:
        urls_out: list[str] = []
        ords: list[int] = []
        words: list[str] = []
        counts: list[int] = []
        for _i, url, pages in _doc_stream(batch):
            for page_ord, (_pg, tree) in enumerate(pages):
                for word, count in page_index_words_texts(tree).items():
                    urls_out.append(url)
                    ords.append(page_ord)
                    words.append(word)
                    counts.append(count)
        return pa.table(
            {"url": pa.array(urls_out, pa.string()),
             "page_ord": pa.array(ords, pa.int64()),
             "word": pa.array(words, pa.string()),
             "count": pa.array(counts, pa.int64())}
        )

    return out.map_batches(build, batch_format="pyarrow")


def index_csv(sf_dir: str) -> ray.data.Dataset:
    """url → the reference-byte-format CSV index (W2) as a column."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error"])

    def build(batch: pa.Table) -> pa.Table:
        urls_out: list[str] = []
        csvs: list[str] = []
        for _i, url, pages in _doc_stream(batch):
            merged = merge_page_indexes(
                [page_index_words_texts(tree) for _, tree in pages]
            )
            urls_out.append(url)
            csvs.append(index_to_csv(merged))
        return pa.table(
            {"url": pa.array(urls_out, pa.string()),
             "index_csv": pa.array(csvs, pa.string())}
        )

    return out.map_batches(build, batch_format="pyarrow")


def txt_delimited(sf_dir: str) -> ray.data.Dataset:
    """url → the '----- PAGE %04d -----' delimited TXT bytes (W1 variant,
    export.py:180-183)."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error", "branch", "text"])

    def build(batch: pa.Table) -> pa.Table:
        branch_col = batch.column("branch").to_pylist()
        text_col = batch.column("text").to_pylist()
        urls_out: list[str] = []
        txts: list[str] = []
        for i, url, pages in _doc_stream(batch):
            page_texts = _doc_page_texts(batch, i, pages, branch_col, text_col)
            urls_out.append(url)
            txts.append(assemble.doc_text(page_texts, delimiter=True))
        return pa.table(
            {"url": pa.array(urls_out, pa.string()),
             "txt_delimited": pa.array(txts, pa.string())}
        )

    return out.map_batches(build, batch_format="pyarrow")


def page_texts_dump(sf_dir: str) -> ray.data.Dataset:
    """One row per (url, page_ord) with the page's assembled text — the
    upstream stage shared by txt_delimited / search_index_docs, dumped so
    their concatenation / record-shaping stages have a SQL oracle."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error", "branch", "text"])

    def build(batch: pa.Table) -> pa.Table:
        branch_col = batch.column("branch").to_pylist()
        text_col = batch.column("text").to_pylist()
        urls_out: list[str] = []
        ords: list[int] = []
        txts: list[str] = []
        for i, url, pages in _doc_stream(batch):
            for page_ord, text in enumerate(
                _doc_page_texts(batch, i, pages, branch_col, text_col)
            ):
                urls_out.append(url)
                ords.append(page_ord)
                txts.append(text)
        return pa.table(
            {"url": pa.array(urls_out, pa.string()),
             "page_ord": pa.array(ords, pa.int64()),
             "page_text": pa.array(txts, pa.string())}
        )

    return out.map_batches(build, batch_format="pyarrow")


def alto_pages(sf_dir: str) -> ray.data.Dataset:
    """OCR-branch docs → one ALTO v3 XML document per page (W4)."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error", "branch"])

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
    SequenceMatcher.ratio). The crawler text arrives via a url-hash join
    (``Dataset.join``) — both sides co-partition on url and the scoring
    stage streams; round 1 broadcast the whole crawler corpus with
    take_all() (the round-1 verdict's scale sin #1)."""
    from ..kernels.textfn import similarity_ratio

    from .common import clean_read_schema

    corpus_dir = pages_corpus(sf_dir)
    first = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )[0]
    pages = ray.data.read_parquet(
        corpus_dir, columns=["url", "text"],
        schema=clean_read_schema(first, ["url", "text"]),
    )
    # latest-wins dedup happened in extraction; the crawler corpus still has
    # the recrawl rows, but text is identical per url so any match works —
    # dedup the small projection to keep the join 1:1
    from .common import distinct

    pages = distinct(pages, ["url"], carry=["text"])
    out = extraction_output(sf_dir, columns=["url", "branch", "text", "error"])

    def keep_ok(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_null(batch.column("error"))).drop_columns(["error"])

    out = out.map_batches(keep_ok, batch_format="pyarrow", zero_copy_batch=True)
    from .common import choose_join_parts

    joined = out.join(
        pages, join_type="inner",
        num_partitions=choose_join_parts(corpus_dir, floor=16),
        on=("url",), left_suffix="", right_suffix="_crawler",
    )

    def score(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        branches = batch.column("branch").to_pylist()
        texts = batch.column("text").to_pylist()
        refs = batch.column("text_crawler").to_pylist()
        ratios = [
            round(similarity_ratio(texts[i], refs[i] or ""), 4)
            for i in range(len(urls))
        ]
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "branch": pa.array(branches, pa.string()),
             "ratio": pa.array(ratios, pa.float64())}
        )

    return joined.map_batches(score, batch_format="pyarrow")


def search_index_docs(sf_dir: str) -> ray.data.Dataset:
    """One searchable record per page — the reference's Elasticsearch doc
    shape {Document, Path, Page, Text, Engine, Config}
    (elastic_search.py:192-231) built as a Dataset; the ES bulk writer is an
    external-service sink and intentionally out of scope (SURVEY.md W8)."""
    out = extraction_output(sf_dir, columns=["url", "spans", "error", "branch", "text"])

    def build(batch: pa.Table) -> pa.Table:
        branch_col = batch.column("branch").to_pylist()
        text_col = batch.column("text").to_pylist()
        docs: list[str] = []
        paths: list[str] = []
        page_nos: list[int] = []
        txts: list[str] = []
        for i, url, pages in _doc_stream(batch):
            page_texts = _doc_page_texts(batch, i, pages, branch_col, text_col)
            if not page_texts:
                page_texts = [text_col[i][:-2] if text_col[i].endswith("\n\n")
                              else text_col[i]]
            for page_no, text in enumerate(page_texts):
                docs.append(url)
                paths.append(f"{url}#page={page_no}")
                page_nos.append(page_no)
                txts.append(text)
        return pa.table(
            {"document": pa.array(docs, pa.string()),
             "path": pa.array(paths, pa.string()),
             "page": pa.array(page_nos, pa.int64()),
             "text": pa.array(txts, pa.string()),
             "engine": pa.array(["stub"] * len(docs), pa.string()),
             "config": pa.array(["lang=por"] * len(docs), pa.string())}
        )

    return out.map_batches(build, batch_format="pyarrow")


# The W8 search semantics (reference: server/src/elastic_search.py:158-189):
# multi_match over the Text and Document fields with ES "AUTO" fuzziness —
# edit distance 0 for terms shorter than 3 chars, 1 for 3-5, 2 for 6+,
# transposition-aware (ES fuzzy_transpositions=true → optimal string
# alignment, DuckDB's damerau_levenshtein). Deviation from the reference,
# documented: no BM25 score (the reference pops _score from every hit
# anyway) and a plain lowercase [a-z0-9]+ tokenizer instead of the ES
# analyzers' stop-word filters (query terms are never stop words).
DEFAULT_SEARCH_QUERY = "casa porto cassa do"


def _auto_fuzziness(term: str) -> int:
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def _osa_within(a: str, b: str, cap: int) -> bool:
    """Optimal-string-alignment (Damerau-Levenshtein without substring
    re-edits) distance <= cap, with a length-difference fast reject."""
    if abs(len(a) - len(b)) > cap:
        return False
    if cap == 0:
        return a == b
    prev2: list[int] | None = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if prev2 is not None and i > 1 and j > 1 \
                    and ca == b[j - 2] and a[i - 2] == cb:
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        if min(cur) > cap:
            return False
        prev2, prev = prev, cur
    return prev[len(b)] <= cap


def fuzzy_search(
    sf_dir: str,
    query: str = DEFAULT_SEARCH_QUERY,
    docs: list[str] | None = None,
) -> ray.data.Dataset:
    """Search the page index like the reference's /search endpoint: pages
    where any query term fuzzy-matches a token of the page text or the
    document name. ``docs`` restricts the search to those document names —
    the reference's terms-filter arm (elastic_search.py:171-181). Both the
    term list and the doc filter are tiny and captured in the task closure
    (broadcast once); per-batch a token→matched-terms memo collapses the
    small shared vocabulary, so OSA runs per distinct token, not per
    occurrence. Shuffle-free. Output: (document, path, page, n_terms,
    matched_terms)."""
    import re as _re

    terms = sorted({t for t in query.lower().split() if t})
    budgets = [(t, _auto_fuzziness(t)) for t in terms]
    doc_filter = frozenset(docs) if docs is not None else None
    tok_re = _re.compile(r"[a-z0-9]+")

    def match(batch: pa.Table) -> pa.Table:
        memo: dict[str, tuple[str, ...]] = {}

        def matched_for(token: str) -> tuple[str, ...]:
            hit = memo.get(token)
            if hit is None:
                hit = tuple(
                    t for t, cap in budgets if _osa_within(token, t, cap)
                )
                memo[token] = hit
            return hit

        docs = batch.column("document").to_pylist()
        paths = batch.column("path").to_pylist()
        pages = batch.column("page").to_pylist()
        texts = batch.column("text").to_pylist()
        cols: dict[str, list] = {
            "document": [], "path": [], "page": [], "n_terms": [],
            "matched_terms": [],
        }
        for i, text in enumerate(texts):
            if doc_filter is not None and docs[i] not in doc_filter:
                continue
            tokens = set(tok_re.findall(f"{docs[i]} {text}".lower()))
            matched: set[str] = set()
            for token in tokens:
                matched.update(matched_for(token))
                if len(matched) == len(terms):
                    break
            if not matched:
                continue
            cols["document"].append(docs[i])
            cols["path"].append(paths[i])
            cols["page"].append(pages[i])
            cols["n_terms"].append(len(matched))
            cols["matched_terms"].append("|".join(sorted(matched)))
        return pa.table(
            {"document": pa.array(cols["document"], pa.string()),
             "path": pa.array(cols["path"], pa.string()),
             "page": pa.array(cols["page"], pa.int64()),
             "n_terms": pa.array(cols["n_terms"], pa.int64()),
             "matched_terms": pa.array(cols["matched_terms"], pa.string())}
        )

    return search_index_docs(sf_dir).map_batches(match, batch_format="pyarrow")


def host_doc_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-host rollup over the extraction output — the north-star's
    "skewed hosts" concern in operator form. Hot hosts cannot skew this
    aggregation: the per-batch combiner collapses each host to ONE partial
    row per block before the exchange, so a host with 10^9 pages ships
    #blocks rows, not 10^9 (ops.common.grouped_agg). Oracle: SQL rollup
    over the summary artifact with split_part()."""
    import pyarrow.compute as pc

    from .common import grouped_agg

    out = extraction_output(sf_dir, columns=["url", "error"])

    def host_rows(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("url"), pattern="/")
        host = pc.list_element(parts, 2)
        is_err = pc.cast(pc.is_valid(batch.column("error")), pa.int32())
        return pa.table({"host": host, "is_err": is_err})

    ds = out.map_batches(host_rows, batch_format="pyarrow", zero_copy_batch=True)

    import pandas as pd

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("host").reset_index(drop=True)

    return grouped_agg(
        ds, keys=["host"],
        specs=[("n_docs", "count", None), ("n_errors", "sum", "is_err")],
        finalize=fin,
    )


# Corpus-frequency boilerplate threshold: a line occurring in >= this many
# page records is template chrome (CCNet-style paragraph dedup, applied at
# line granularity). Small enough to trip on every test tier, large enough
# that the 5% url re-crawl duplication (2 copies) never blocks content.
BOILERPLATE_MIN_DF = 5


def line_hash64(line: str) -> int:
    """64-bit line key: top 8 bytes of md5 as a SIGNED int64 — the same bits
    the oracle SQL keys on (``('0x' || substr(md5(line), 1, 16))::UBIGINT``,
    ops.oracles.H64) reinterpreted two's-complement. Equality is all either
    side uses, so the signedness never shows; signed matters on the Ray side
    because values >= 2**63 in an int column make Ray's aggregate block
    builder fail Arrow conversion and silently fall back to PICKLED blocks
    for the whole exchange (measured: every partial block took the fallback
    at uint64)."""
    import hashlib

    return int.from_bytes(hashlib.md5(line.encode()).digest()[:8], "big", signed=True)


def _pages_pruned(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    from .common import clean_read_schema

    corpus = pages_corpus(sf_dir)
    probe = os.path.join(
        corpus, sorted(f for f in os.listdir(corpus) if f.endswith(".parquet"))[0]
    )
    return ray.data.read_parquet(
        corpus, columns=columns, schema=clean_read_schema(probe, columns)
    )


def naive_page_lines(sf_dir: str) -> ray.data.Dataset:
    """Per-record naive visible lines of the html-branch pages:
    (url, warc_ts, par_no, line_no, line) with NO block scoring and visible
    boilerplate containers (nav/header/footer/...) KEPT — the per-document
    stage of boilerplate_line_dedup, and its oracle artifact. (url, warc_ts)
    is the unique record key: re-crawled urls appear once per crawl."""
    from ..extract_core import route
    from ..kernels.html_extract import extract_lines_naive

    ds = _pages_pruned(sf_dir, ["url", "warc_ts", "html"])

    def line_rows(batch: pa.Table) -> pa.Table:
        ts_type = batch.schema.field("warc_ts").type
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        payloads = batch.column("html").to_pylist()
        cols: dict[str, list] = {
            "url": [], "warc_ts": [], "par_no": [], "line_no": [], "line": []
        }
        for i, data in enumerate(payloads):
            if route(data) != "html":
                continue
            markup = data.decode("utf-8", errors="replace")
            for par_no, line_no, line in extract_lines_naive(markup):
                cols["url"].append(urls[i])
                cols["warc_ts"].append(ts[i])
                cols["par_no"].append(par_no)
                cols["line_no"].append(line_no)
                cols["line"].append(line)
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "warc_ts": pa.array(cols["warc_ts"], ts_type),
             "par_no": pa.array(cols["par_no"], pa.int32()),
             "line_no": pa.array(cols["line_no"], pa.int32()),
             "line": pa.array(cols["line"], pa.string())}
        )

    return ds.map_batches(line_rows, batch_format="pyarrow", zero_copy_batch=True)


def boilerplate_line_dedup(sf_dir: str) -> ray.data.Dataset:
    """Corpus-level boilerplate removal (CCNet-style): strip lines whose
    occurrence count across the whole crawl is >= BOILERPLATE_MIN_DF — the
    frequency-based complement of the per-document DOM heuristics (a line
    repeated on thousands of pages is template chrome no matter how it
    scores locally).

    Scale shape — two streaming passes, no line-level shuffle:
    1. count: lines are reduced to 64-bit md5 hashes INSIDE the batch (the
       exchange ships fixed-width ints, never line strings — most content
       lines are globally unique, so the combiner can't shrink the row
       count and the key WIDTH is what the sort exchange pays for; measured
       30 s → ~8 s at sf0.1), then the grouped_agg combiner → small
       groupby-sum → filter df >= K BEFORE collecting, so only the hot
       hashes (the blocklist) ever reach the driver;
    2. rebuild: the hash blocklist is ray.put ONCE and read from the object
       store by every task; each record re-derives its naive lines and
       drops blocked ones (recompute beats materializing the line table —
       CCNet's own two-pass design, hashes and all).
    Output: (url, warc_ts, text, n_lines, n_dropped); empty pars vanish,
    all-blocked docs keep an empty-text row. Oracle: SQL recomputation of
    count+filter+reassembly from the naive_lines artifact with the same
    md5-based 64-bit hash (oracles.H64)."""
    import pyarrow.compute as pc

    from ..extract_core import route
    from ..kernels.html_extract import extract_lines_naive
    from .common import grouped_agg

    def hash_lines(batch: pa.Table) -> pa.Table:
        # parse → hash in one step: never materializes the per-line row
        # table pass 1 doesn't need (the artifact dump keeps the full rows)
        hashes: list[int] = []
        for data in batch.column("html").to_pylist():
            if route(data) != "html":
                continue
            for _p, _l, line in extract_lines_naive(
                data.decode("utf-8", errors="replace")
            ):
                hashes.append(line_hash64(line))
        return pa.table({"h": pa.array(hashes, pa.int64())})

    counts = grouped_agg(
        _pages_pruned(sf_dir, ["html"]).map_batches(
            hash_lines, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["h"], specs=[("df", "count", None)],
    )
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("df"), BOILERPLATE_MIN_DF)),
        batch_format="pyarrow",
    )
    blocked_ref = ray.put(frozenset(r["h"] for r in hot.take_all()))

    ds = _pages_pruned(sf_dir, ["url", "warc_ts", "html"])

    def rebuild(batch: pa.Table) -> pa.Table:
        blocked = ray.get(blocked_ref)
        ts_type = batch.schema.field("warc_ts").type
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        payloads = batch.column("html").to_pylist()
        cols: dict[str, list] = {
            "url": [], "warc_ts": [], "text": [], "n_lines": [], "n_dropped": []
        }
        for i, data in enumerate(payloads):
            if route(data) != "html":
                continue
            lines = extract_lines_naive(data.decode("utf-8", errors="replace"))
            if not lines:
                continue
            pars: dict[int, list[str]] = {}
            n_dropped = 0
            for par_no, _line_no, line in lines:
                if line_hash64(line) in blocked:
                    n_dropped += 1
                else:
                    pars.setdefault(par_no, []).append(line)
            cols["url"].append(urls[i])
            cols["warc_ts"].append(ts[i])
            cols["text"].append(
                "\n\n".join("\n".join(v) for _, v in sorted(pars.items()))
            )
            cols["n_lines"].append(len(lines))
            cols["n_dropped"].append(n_dropped)
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "warc_ts": pa.array(cols["warc_ts"], ts_type),
             "text": pa.array(cols["text"], pa.string()),
             "n_lines": pa.array(cols["n_lines"], pa.int64()),
             "n_dropped": pa.array(cols["n_dropped"], pa.int64())}
        )

    return ds.map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)


# PII patterns shared verbatim with the DuckDB oracle — both engines use
# RE2-compatible / Python-re-compatible syntax (ASCII classes, no
# lookaround), so match sets are identical by construction.
EMAIL_RE_S = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE_S = r"\+[0-9]{1,3} [0-9]{2} [0-9]{3} [0-9]{4}"


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """PII redaction over the naive visible text of the html branch: count
    and mask email addresses and phone numbers per record (the
    training-data hygiene pass every web-scale corpus needs before the LM
    sees it). Shuffle-free: one streaming map over the pages corpus, lines
    re-derived per record exactly like boilerplate_line_dedup's rebuild.
    Output: (url, warc_ts, n_emails, n_phones, text_redacted). Oracle: SQL
    recomputation (regexp_extract_all counts + chained regexp_replace +
    line/paragraph reassembly) from the naive_lines artifact."""
    import re as _re

    from ..extract_core import route
    from ..kernels.html_extract import extract_lines_naive

    email_re = _re.compile(EMAIL_RE_S)
    phone_re = _re.compile(PHONE_RE_S)

    ds = _pages_pruned(sf_dir, ["url", "warc_ts", "html"])

    def scrub(batch: pa.Table) -> pa.Table:
        ts_type = batch.schema.field("warc_ts").type
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        payloads = batch.column("html").to_pylist()
        cols: dict[str, list] = {
            "url": [], "warc_ts": [], "n_emails": [], "n_phones": [], "text_redacted": []
        }
        for i, data in enumerate(payloads):
            if route(data) != "html":
                continue
            lines = extract_lines_naive(data.decode("utf-8", errors="replace"))
            if not lines:
                continue
            n_e = n_p = 0
            pars: dict[int, list[str]] = {}
            for par_no, _line_no, line in lines:
                n_e += len(email_re.findall(line))
                n_p += len(phone_re.findall(line))
                red = phone_re.sub("<PHONE>", email_re.sub("<EMAIL>", line))
                pars.setdefault(par_no, []).append(red)
            cols["url"].append(urls[i])
            cols["warc_ts"].append(ts[i])
            cols["n_emails"].append(n_e)
            cols["n_phones"].append(n_p)
            cols["text_redacted"].append(
                "\n\n".join("\n".join(v) for _, v in sorted(pars.items()))
            )
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "warc_ts": pa.array(cols["warc_ts"], ts_type),
             "n_emails": pa.array(cols["n_emails"], pa.int64()),
             "n_phones": pa.array(cols["n_phones"], pa.int64()),
             "text_redacted": pa.array(cols["text_redacted"], pa.string())}
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def paragraph_dedup(sf_dir: str) -> ray.data.Dataset:
    """Cross-document paragraph-level exact dedup over the extracted main
    content (the granularity CCNet dedups at): paragraphs repeated across
    DIFFERENT urls (syndicated wire copy) surface with their copy count and
    a deterministic keeper. Only 8-byte hashes + urls cross the exchange —
    never paragraph text; the combiner collapses each hash per block before
    the small groupby. Output: one row per duplicated paragraph hash
    (n_copies >= 2). Oracle: SQL split/unnest/group over the summary
    artifact with the same signed-md5 hash."""
    import pandas as pd

    from .common import grouped_agg

    out = extraction_output(sf_dir, columns=["url", "text", "error"])

    def pars(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        ok = pa.compute.is_null(batch.column("error")).to_pylist()
        cols: dict[str, list] = {"h": [], "url": [], "n_chars": []}
        for i, text in enumerate(texts):
            if not ok[i] or not text:
                continue
            for p in text.split("\n\n"):
                if p:
                    cols["h"].append(line_hash64(p))
                    cols["url"].append(urls[i])
                    cols["n_chars"].append(len(p))
        return pa.table(
            {"h": pa.array(cols["h"], pa.int64()),
             "url": pa.array(cols["url"], pa.string()),
             "n_chars": pa.array(cols["n_chars"], pa.int64())}
        )

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df[df["n_copies"] >= 2]
        return df.sort_values("h").reset_index(drop=True)

    return grouped_agg(
        out.map_batches(pars, batch_format="pyarrow", zero_copy_batch=True),
        keys=["h"],
        specs=[("n_copies", "count", None), ("keep_url", "min", "url"),
               ("n_chars", "max", "n_chars")],
        finalize=fin,
    )


CONTAM_NGRAM = 8
CONTAM_MOD = 19  # ~5% of urls land in the held-out eval set


def _is_eval_url(url: str) -> bool:
    """Deterministic eval-set membership — first md5 byte mod CONTAM_MOD
    (SQL twin: ``('0x' || substr(md5(url), 1, 2))::UBIGINT % 19 = 0``)."""
    import hashlib

    return int(hashlib.md5(url.encode()).hexdigest()[:2], 16) % CONTAM_MOD == 0


def contamination_check(sf_dir: str) -> ray.data.Dataset:
    """Benchmark-contamination scan: flag training documents sharing any
    8-token shingle with a held-out eval set (the pre-training hygiene
    check; eval set = a deterministic ~5% url sample here). Scale shape:
    eval sets are SMALL by definition, so the eval shingle hashes are
    distinct-reduced and broadcast once via ray.put; the train side is one
    shuffle-free scoring pass (same shape as unigram_logprob's vocab).
    Output per train doc: (url, n_shared, contaminated) where n_shared
    counts DISTINCT shared shingles. Oracle: SQL shingle join over the
    summary artifact."""
    from .common import distinct

    out = extraction_output(sf_dir, columns=["url", "text", "error"])

    def eval_shingles(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        ok = pa.compute.is_null(batch.column("error")).to_pylist()
        hs: list[int] = []
        for i, url in enumerate(urls):
            if not ok[i] or not _is_eval_url(url):
                continue
            toks = texts[i].lower().split()
            for j in range(len(toks) - CONTAM_NGRAM + 1):
                hs.append(line_hash64(" ".join(toks[j:j + CONTAM_NGRAM])))
        return pa.table({"h": pa.array(hs, pa.int64())})

    eval_ds = distinct(
        out.map_batches(eval_shingles, batch_format="pyarrow", zero_copy_batch=True),
        keys=["h"],
    )
    blocked_ref = ray.put(frozenset(r["h"] for r in eval_ds.take_all()))

    def score(batch: pa.Table) -> pa.Table:
        blocked = ray.get(blocked_ref)
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        ok = pa.compute.is_null(batch.column("error")).to_pylist()
        cols: dict[str, list] = {"url": [], "n_shared": [], "contaminated": []}
        for i, url in enumerate(urls):
            if not ok[i] or _is_eval_url(url):
                continue
            toks = texts[i].lower().split()
            shared = {
                h for j in range(len(toks) - CONTAM_NGRAM + 1)
                if (h := line_hash64(" ".join(toks[j:j + CONTAM_NGRAM]))) in blocked
            }
            cols["url"].append(url)
            cols["n_shared"].append(len(shared))
            cols["contaminated"].append(bool(shared))
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "n_shared": pa.array(cols["n_shared"], pa.int64()),
             "contaminated": pa.array(cols["contaminated"], pa.bool_())}
        )

    return out.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def es_bulk_payloads(sf_dir: str) -> ray.data.Dataset:
    """Elasticsearch bulk-index payloads per page (W8 completed): the
    search_index_docs doc shape paired with the reference's deterministic
    page id (seeded-UUID4, file.py:233-237) and rendered as the NDJSON
    action+document pair a ``_bulk`` POST consumes
    (sinks/es_bulk.py; golden-snapshot oracle — the id derivation has no
    SQL form). Idempotence: same path → same _id → re-index overwrites."""
    from ..sinks.es_bulk import page_bulk_record

    docs = search_index_docs(sf_dir)

    def build(batch: pa.Table) -> pa.Table:
        document = batch.column("document").to_pylist()
        path = batch.column("path").to_pylist()
        page = batch.column("page").to_pylist()
        text = batch.column("text").to_pylist()
        engine = batch.column("engine").to_pylist()
        config = batch.column("config").to_pylist()
        ids: list[str] = []
        bulks: list[str] = []
        for i in range(len(path)):
            es_id, bulk = page_bulk_record(
                document[i], path[i], page[i], text[i], engine[i], config[i]
            )
            ids.append(es_id)
            bulks.append(bulk)
        return pa.table(
            {"path": pa.array(path, pa.string()),
             "es_id": pa.array(ids, pa.string()),
             "bulk": pa.array(bulks, pa.string())}
        )

    return docs.map_batches(build, batch_format="pyarrow")


def branch_stats(sf_dir: str) -> ray.data.Dataset:
    """Extraction health rollup: per-branch doc/page/word/error counts."""
    import pandas as pd

    from .common import grouped_agg

    out = extraction_output(sf_dir, columns=["branch", "n_pages", "n_words", "error"])

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


def url_canonicalize(sf_dir: str) -> ray.data.Dataset:
    """URL canonicalization over the crawl (kernels.urlnorm.canonical_url:
    fragment/tracking-param/default-port/case/trailing-slash rules — the
    day-one normalizer of every real crawl pipeline). Shuffle shape: one
    distinct over urls (re-crawls collapse), then a per-batch map; no join.
    Output: (url, canon_url, changed). Oracle: the identical regex algebra
    in DuckDB string functions over the same corpus parquet."""
    from ..kernels.urlnorm import canonical_url
    from .common import distinct

    ds = distinct(_pages_pruned(sf_dir, ["url"]), ["url"])

    def canon(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        canons = [canonical_url(u) for u in urls]
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "canon_url": pa.array(canons, pa.string()),
             "changed": pa.array(
                 [c != u for u, c in zip(urls, canons)], pa.bool_())}
        )

    return ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)


BLOCK_TOP_HOSTS = 3


def domain_blocklist_filter(sf_dir: str) -> ray.data.Dataset:
    """Crawl-hygiene domain filter (the UT1-blocklist / over-crawled-domain
    cap pattern): derive the blocklist IN-QUERY as the BLOCK_TOP_HOSTS most
    over-represented hosts (count desc, host asc — deterministic), then
    drop every doc on a blocked host. Output: the retained (url, host)
    inventory.

    Scale shape: the host census is the skew-proof combiner rollup
    (one partial row per host per block); only the tiny top-k leaves the
    cluster and broadcasts back via ray.put — the blocklist itself never
    shuffles the doc stream, whose second pass is a streaming vectorized
    filter. With a real curated blocklist the census stage disappears and
    only the broadcast-filter pass remains."""
    import pyarrow.compute as pc

    from .common import grouped_agg

    out = extraction_output(sf_dir, columns=["url"])

    def host_rows(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("url"), pattern="/")
        return pa.table({"host": pc.list_element(parts, 2)})

    census = grouped_agg(
        out.map_batches(host_rows, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host"], specs=[("n_docs", "count", None)],
    )
    top = (
        census.sort(["n_docs", "host"], descending=[True, False])
        .limit(BLOCK_TOP_HOSTS).take_all()
    )
    blocked_ref = ray.put(frozenset(r["host"] for r in top))

    def keep(batch: pa.Table) -> pa.Table:
        blocked = ray.get(blocked_ref)
        parts = pc.split_pattern(batch.column("url"), pattern="/")
        host = pc.list_element(parts, 2)
        mask = pa.array([h not in blocked for h in host.to_pylist()], pa.bool_())
        return pa.table(
            {"url": batch.column("url"), "host": host}
        ).filter(mask)

    return out.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


SENT_SPLIT_RE = None  # compiled lazily inside the batch fn (picklable module)
SENT_WS = " \t\n\r"


def sentence_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document sentence segmentation signals over the extracted text —
    the sentence-level complement of gopher_filter (Gopher/C4 both gate on
    sentence counts and terminal punctuation, which the word-level signals
    can't see): sentences = non-empty '[.!?]+'-delimited pieces, mean words
    per sentence as an exact banker's-rounded integer ratio, and whether the
    document ends in terminal punctuation (C4's "ends in a sentence" rule).

    Shuffle-free per-batch scan of the committed extraction shards (text
    column only + error for the ok-filter); the oracle recomputes the same
    regex algebra from the summary artifact so the gate checks the
    distributed projection, not a reimplementation drift."""
    import re as _re

    from .documents import _round4_ratio

    out = extraction_output(sf_dir, columns=["url", "text", "error"])
    split_re = _re.compile(r"[.!?]+")

    def stats(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_null(batch.column("error")))
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        n_sent, mean_w, ends = [], [], []
        for t in texts:
            pieces = [p.strip(SENT_WS) for p in split_re.split(t)]
            sents = [p for p in pieces if p]
            total_words = sum(len(s.split()) for s in sents)
            n_sent.append(len(sents))
            mean_w.append(_round4_ratio(total_words, len(sents)))
            ends.append(t.rstrip(SENT_WS)[-1:] in (".", "!", "?"))
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "n_sentences": pa.array(n_sent, pa.int64()),
             "mean_sentence_words": pa.array(mean_w, pa.float64()),
             "ends_terminal": pa.array(ends, pa.bool_())}
        )

    return out.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


URL_PARSE_RE = r"^[a-z]+://([^/?]*)([^?]*)\??(.*)$"


def url_features(sf_dir: str) -> ray.data.Dataset:
    """URL-shape features for crawl filtering (the C4/RefinedWeb URL-level
    gate runs BEFORE fetch, so it must be computable from the url string
    alone): host, path depth, digit fraction of the path (spam paths are
    digit-heavy), and query-parameter count. One regex — shared verbatim
    with the SQL twin — splits scheme://host/path?query; fractions use the
    exact integer half-even rounding shared across the suite. Shuffle-free
    scan of the url column only."""
    import re as _re

    from .documents import _round4_ratio

    out = extraction_output(sf_dir, columns=["url"])
    parse = _re.compile(URL_PARSE_RE)

    def feats(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts, depths, dfracs, nparams = [], [], [], []
        for u in urls:
            m = parse.match(u)
            host, path, query = m.group(1), m.group(2), m.group(3)
            hosts.append(host)
            depths.append(len([s for s in path.split("/") if s]))
            dfracs.append(_round4_ratio(sum(c.isdigit() for c in path), len(path)))
            nparams.append(0 if query == "" else len(query.split("&")))
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "host": pa.array(hosts, pa.string()),
             "path_depth": pa.array(depths, pa.int64()),
             "path_digit_frac": pa.array(dfracs, pa.float64()),
             "n_query_params": pa.array(nparams, pa.int64())}
        )

    return out.map_batches(feats, batch_format="pyarrow", zero_copy_batch=True)


VOWEL_GROUP_RE = "[aeiouy]+"


def readability_scores(sf_dir: str) -> ray.data.Dataset:
    """Flesch reading-ease per document over the extracted text — a quality
    signal real curation pipelines gate on (too-low = legalese/boilerplate,
    too-high = listicles/spam). Syllables are approximated as lowercase
    vowel GROUPS — counting them over the whole text equals the per-word
    sum because words never span whitespace, so engine and oracle share ONE
    regex. The Flesch chain 206.835 − 1.015·(W/S) − 84.6·(SY/W) is put over
    the common denominator 1000·S·W so the score is ONE IEEE division of
    two exact integers — bit-identical across engines with NO rounding at
    all (a three-op float chain rounded to 4 decimals hit a genuine
    half-even boundary at sf0.01: Python round and DuckDB round_even
    disagreed by 1 ulp at −132.94875). Shuffle-free scan."""
    import re as _re

    out = extraction_output(sf_dir, columns=["url", "text", "error"])
    split_re = _re.compile(r"[.!?]+")
    vowel_re = _re.compile(VOWEL_GROUP_RE)

    def scores(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_null(batch.column("error")))
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        n_w, n_sy, n_se, fl = [], [], [], []
        for t in texts:
            w = len(t.split())
            sy = len(vowel_re.findall(t.lower()))
            se = sum(
                1 for p in split_re.split(t) if p.strip(SENT_WS)
            )
            n_w.append(w)
            n_sy.append(sy)
            n_se.append(se)
            if w == 0 or se == 0:
                fl.append(0.0)
            else:
                num = 206835 * se * w - 1015 * w * w - 84600 * sy * se
                fl.append(num / (1000 * se * w))
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "n_words": pa.array(n_w, pa.int64()),
             "n_syllables": pa.array(n_sy, pa.int64()),
             "n_sentences": pa.array(n_se, pa.int64()),
             "flesch": pa.array(fl, pa.float64())}
        )

    return out.map_batches(scores, batch_format="pyarrow", zero_copy_batch=True)


TITLE_RE = "<title>([^<]*)</title>"


def html_titles(sf_dir: str) -> ray.data.Dataset:
    """Per-record <title> extraction from the RAW crawl bytes — the metadata
    field search indexes and dedup heuristics key on. The HTML gate is the
    literal 9-byte prefix '<!DOCTYPE' (shared with the SQL twin, which
    can't run the full magic-byte router over blobs — and a first-byte gate
    alone admits a corpus junk blob that happens to start 0x3C but is not
    UTF-8) and the title is the FIRST
    '<title>([^<]*)</title>' match of the utf-8 payload — one regex shared
    verbatim with the oracle, which re-parses the same corpus parquet via
    blob decode. Shuffle-free scan; binary-branch records report
    has_title=false with an empty title."""
    import re as _re

    title_re = _re.compile(TITLE_RE)
    ds = _pages_pruned(sf_dir, ["url", "warc_ts", "html"])

    def titles(batch: pa.Table) -> pa.Table:
        payloads = batch.column("html").to_pylist()
        has, title = [], []
        for data in payloads:
            if data[:9] == b"<!DOCTYPE":
                m = title_re.search(data.decode("utf-8", errors="replace"))
                has.append(m is not None)
                title.append(m.group(1) if m else "")
            else:
                has.append(False)
                title.append("")
        return pa.table(
            {"url": batch.column("url"),
             "warc_ts": batch.column("warc_ts"),
             "has_title": pa.array(has, pa.bool_()),
             "title": pa.array(title, pa.string())}
        )

    return ds.map_batches(titles, batch_format="pyarrow", zero_copy_batch=True)


OUTLINK_RE = r'<a href="(https://(host[0-9]+)\.example/p/[0-9]+)">'


def outlink_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-record outlink-density statistics from the raw crawl bytes —
    link counts, internal/external split against the record's own host, and
    distinct-target count (the page-level spam gate link-farm filters key
    on; host_link_graph aggregates the same anchors per HOST, this op keeps
    the per-record resolution). Same '<!DOCTYPE' decode gate and one anchor
    regex shared verbatim with the SQL twin; shuffle-free scan."""
    import re as _re

    link_re = _re.compile(OUTLINK_RE)
    host_re = _re.compile(URL_PARSE_RE)
    ds = _pages_pruned(sf_dir, ["url", "warc_ts", "html"])

    def stats(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        n_links, n_int, n_ext, n_uniq = [], [], [], []
        for u, data in zip(urls, payloads):
            if data[:9] != b"<!DOCTYPE":
                n_links.append(0); n_int.append(0)
                n_ext.append(0); n_uniq.append(0)
                continue
            own = host_re.match(u).group(1)
            hits = link_re.findall(data.decode("utf-8", errors="replace"))
            internal = sum(1 for _t, h in hits if h == own)
            n_links.append(len(hits))
            n_int.append(internal)
            n_ext.append(len(hits) - internal)
            n_uniq.append(len({t for t, _h in hits}))
        return pa.table(
            {"url": batch.column("url"),
             "warc_ts": batch.column("warc_ts"),
             "n_links": pa.array(n_links, pa.int64()),
             "n_internal": pa.array(n_int, pa.int64()),
             "n_external": pa.array(n_ext, pa.int64()),
             "n_unique_targets": pa.array(n_uniq, pa.int64())}
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def host_freshness(sf_dir: str) -> ray.data.Dataset:
    """Per-host crawl freshness: first/last warc_ts and the span in whole
    days — the recrawl-scheduling signal (a host not seen for months is
    stale; one crawled hourly is a hot feed). Grouped min/max over the
    extraction output with the usual per-batch combiner; span_days is an
    exact integer division of the microsecond delta. Hosts come from the
    shared URL regex."""
    import re as _re

    from .common import grouped_agg

    host_re = _re.compile(URL_PARSE_RE)
    out = extraction_output(sf_dir, columns=["url", "warc_ts"])

    def hosts(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        return pa.table(
            {"host": pa.array([host_re.match(u).group(1) for u in urls],
                              pa.string()),
             "warc_ts": batch.column("warc_ts")}
        )

    ds = out.map_batches(hosts, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df):
        us = (df["last_seen"] - df["first_seen"]).astype("timedelta64[us]")
        df["span_days"] = (us // pd.Timedelta(days=1)).astype("int64")
        return df.sort_values("host").reset_index(drop=True)

    import pandas as pd

    return grouped_agg(
        ds,
        keys=["host"],
        specs=[("n_records", "count", None),
               ("first_seen", "min", "warc_ts"),
               ("last_seen", "max", "warc_ts")],
        finalize=fin,
    )


# C4 cleaning rules (Raffel et al. 2020 §2.2, public): line kept iff it has
# >= C4_MIN_LINE_WORDS words and no 'javascript'; the terminal-punctuation
# rule is REPORTED per page (n_punct) rather than gating the keep decision —
# the synthetic corpus renders word-soup lines without sentence punctuation,
# so gating on it would make every output row degenerate (0 kept). Page-level
# gates ('lorem ipsum', '{', >= C4_MIN_KEPT_LINES surviving lines) are the
# paper's, applied verbatim.
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
C4_BUCKETS = 256


def c4_clean(sf_dir: str) -> ray.data.Dataset:
    """C4-style page cleaning over the naive visible lines: per (url,
    warc_ts) record, count lines in/kept/punct-terminated, apply the page
    gates, and reassemble the cleaned text from the surviving lines in
    (par_no, line_no) order.

    Scale shape: reads the SHARED naive-lines artifact (no second corpus
    parse — same input as doc_entities/boilerplate), per-line flags are one
    vectorized pandas pass per batch, and the only exchange is the
    salt-bucketed rollup keyed ``crc32(url) % C4_BUCKETS`` (the doc_entities
    pattern: the per-bucket finish is ONE pandas groupby, never a Python
    call per record). Lines of one record can split across read blocks, so
    the rollup exchange is semantically required, and it carries one row per
    LINE with its flags — bounded by the artifact itself.

    Output: (url, warc_ts, n_lines, n_kept, n_punct, page_ok, text_clean).
    Oracle: SQL recomputation of the same flags + string_agg over the
    naive_lines artifact."""
    import zlib

    from .common import from_pandas_clean

    lines = naive_lines_output(sf_dir)

    def flags(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        low = df["line"].str.lower()
        nwords = df["line"].str.count(r"\S+")
        df["kept"] = (nwords >= C4_MIN_LINE_WORDS) & ~low.str.contains(
            "javascript", regex=False)
        df["punct"] = df["line"].str.contains(r'[.!?"]$', regex=True)
        df["bad_page"] = low.str.contains("lorem ipsum", regex=False) | df[
            "line"].str.contains("{", regex=False)
        df["bucket"] = [
            zlib.crc32(u.encode()) % C4_BUCKETS for u in df["url"]
        ]
        return from_pandas_clean(df)

    ds = lines.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)

    def rollup(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["url", "warc_ts", "par_no", "line_no"])
        kept = df[df["kept"]]
        joined = kept.groupby(["url", "warc_ts"], sort=False)["line"].agg(
            "\n".join).rename("text_clean")
        g = df.groupby(["url", "warc_ts"], sort=False).agg(
            n_lines=("line", "size"),
            n_kept=("kept", "sum"),
            bad=("bad_page", "any"),
        )
        g["n_punct"] = (
            df[df["kept"] & df["punct"]]
            .groupby(["url", "warc_ts"], sort=False).size()
            .reindex(g.index, fill_value=0)
        )
        g = g.join(joined).reset_index()
        g["text_clean"] = g["text_clean"].fillna("")
        g["page_ok"] = (g["n_kept"] >= C4_MIN_KEPT_LINES) & ~g["bad"]
        for c in ("n_lines", "n_kept", "n_punct"):
            g[c] = g[c].astype("int64")
        return from_pandas_clean(
            g[["url", "warc_ts", "n_lines", "n_kept", "n_punct",
               "page_ok", "text_clean"]]
        )

    return ds.groupby("bucket").map_groups(rollup, batch_format="pyarrow")


RECRAWL_PARTS = 64


def recrawl_changes(sf_dir: str) -> ray.data.Dataset:
    """Temporal version diff for re-crawled urls: for every url fetched
    more than once, compare the LATEST crawl's text against the previous
    one — the change-detection signal a recrawl scheduler feeds on (and
    the twin question to the sink's latest-wins dedup: what did dedup
    throw away?).

    Scale shape: raw corpus rows collapse to (url, warc_ts, text) keyed by
    the same crc32 salt partitioning the sink uses; each part resolves its
    urls with ONE vectorized sort + shifted run detection (no per-url
    Python loop for the common singleton case); only multi-crawl urls emit
    rows. Tie order (warc_ts DESC, text DESC) matches the sink's
    total-order tiebreak.

    Output: (url, n_crawls, changed, len_delta) for urls with >= 2 crawls;
    len_delta = len(latest) - len(previous) in codepoints."""
    import zlib

    import numpy as np
    import pandas as pd

    from .common import from_pandas_clean, grouped_agg

    ds = ray.data.read_parquet(
        pages_corpus(sf_dir), columns=["url", "warc_ts", "text"]
    )

    def add_part(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        part = pa.array(
            [zlib.crc32(u.encode()) % RECRAWL_PARTS for u in urls], pa.int64()
        )
        return batch.append_column("rpart", part)

    keyed = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["url", "warc_ts", "text"], ascending=[True, False, False],
            kind="mergesort",
        ).reset_index(drop=True)
        u = df["url"].to_numpy()
        n = len(df)
        empty = pa.schema(
            [pa.field("url", pa.string()), pa.field("n_crawls", pa.int64()),
             pa.field("changed", pa.bool_()), pa.field("len_delta", pa.int64())]
        )
        if n < 2:
            return pa.Table.from_pylist([], schema=empty)
        first_of_run = np.ones(n, dtype=bool)
        first_of_run[1:] = u[1:] != u[:-1]
        sizes = np.diff(np.append(np.flatnonzero(first_of_run), n))
        starts = np.flatnonzero(first_of_run)
        multi = sizes >= 2
        if not multi.any():
            return pa.Table.from_pylist([], schema=empty)
        s = starts[multi]
        texts = df["text"].to_numpy()
        latest, prev = texts[s], texts[s + 1]
        lens_a = np.array([len(t) for t in latest], dtype=np.int64)
        lens_b = np.array([len(t) for t in prev], dtype=np.int64)
        return pa.table(
            {"url": pa.array(u[s], pa.string()),
             "n_crawls": pa.array(sizes[multi].astype(np.int64), pa.int64()),
             "changed": pa.array(latest != prev),
             "len_delta": pa.array(lens_a - lens_b, pa.int64())}
        )

    return keyed.groupby("rpart").map_groups(per_part, batch_format="pyarrow")


def scd2_url_history(sf_dir: str) -> ray.data.Dataset:
    """Type-2 slowly-changing-dimension build over the crawl: one row per
    (url, crawl) version carrying its validity interval — the warehouse
    versioned-dimension product over the natural key (url) and event time
    (warc_ts). :func:`recrawl_changes` answers "what changed last"; this
    materializes the FULL version chain a downstream consumer joins
    point-in-time facts against.

    Scale shape: the same salted-url exchange as recrawl_changes and the
    sink dedup (``crc32(url) % RECRAWL_PARTS`` — one partitioning key
    reused across the suite); each part resolves all its urls with ONE
    vectorized mergesort + shifted-run detection, and version numbers /
    validity intervals fall out of arange/shift arithmetic — no per-url
    Python. The exchange carries (url, warc_ts, text-length) scale rows
    once; output rows == corpus rows.

    Output: (url, version_no, warc_ts, valid_to, is_current, changed,
    text_len). version_no is 1..n ascending by (warc_ts, text) — the exact
    inverse of the sink's latest-wins total order, so version n is the row
    the sink keeps; valid_to = next version's warc_ts (NULL while current);
    changed = text differs from the previous version (False for v1)."""
    import zlib

    import numpy as np

    ds = ray.data.read_parquet(
        pages_corpus(sf_dir), columns=["url", "warc_ts", "text"]
    )

    def add_part(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        part = pa.array(
            [zlib.crc32(u.encode()) % RECRAWL_PARTS for u in urls], pa.int64()
        )
        return batch.append_column("rpart", part)

    keyed = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["url", "warc_ts", "text"], kind="mergesort"
        ).reset_index(drop=True)
        n = len(df)
        u = df["url"].to_numpy()
        first_of_run = np.ones(n, dtype=bool)
        first_of_run[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first_of_run)
        sizes = np.diff(np.append(starts, n))
        version_no = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes) + 1
        last_of_run = np.zeros(n, dtype=bool)
        last_of_run[starts + sizes - 1] = True
        ts = df["warc_ts"]
        valid_to = ts.shift(-1)
        valid_to[last_of_run] = None
        texts = df["text"].to_numpy()
        changed = np.zeros(n, dtype=bool)
        if n > 1:
            changed[1:] = (texts[1:] != texts[:-1]) & ~first_of_run[1:]
        return pa.table(
            {"url": pa.array(u, pa.string()),
             "version_no": pa.array(version_no, pa.int64()),
             "warc_ts": pa.Array.from_pandas(ts, type=pa.timestamp("us")),
             "valid_to": pa.Array.from_pandas(valid_to, type=pa.timestamp("us")),
             "is_current": pa.array(last_of_run),
             "changed": pa.array(changed),
             "text_len": pa.array(
                 np.fromiter((len(t) for t in texts), np.int64, n), pa.int64())}
        )

    return keyed.groupby("rpart").map_groups(per_part, batch_format="pyarrow")


DAILY_TOP_K = 10


def daily_top_terms(sf_dir: str) -> ray.data.Dataset:
    """Per-crawl-day top-K terms by count — the trending-terms feed. Uses
    the suite's shared index normalization.

    Scale shape: per-batch (day, word) partial counts (combiner) feed ONE
    grouped sum; the per-day top-K then runs per day-group. NOTE: unlike
    longest_docs_per_lang, a per-block top-K PRE-prune before the sum
    would be UNSOUND here — counts are additive across blocks, so a word
    outside every block-local top-K can still be a global winner; the
    exchange therefore carries the full per-block distinct (day, word)
    partials, which is the correct minimal exchange for additive top-k.

    Output: (day, word, n, rank) with rank 1..K by (n desc, word asc)."""
    import pandas as pd

    from ..kernels.textfn import _INDEX_DEL_TABLE
    from .common import from_pandas_clean, grouped_agg

    ds = ray.data.read_parquet(
        pages_corpus(sf_dir), columns=["warc_ts", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        days = batch.column("warc_ts").to_pandas().dt.strftime("%Y-%m-%d")
        counts: dict[tuple[str, str], int] = {}
        for day, text in zip(days, batch.column("text").to_pylist()):
            for tok in text.split():
                tok = tok.translate(_INDEX_DEL_TABLE).lower()
                if tok:
                    k = (day, tok)
                    counts[k] = counts.get(k, 0) + 1
        return pa.table(
            {"day": pa.array([k[0] for k in counts], pa.string()),
             "word": pa.array([k[1] for k in counts], pa.string()),
             "n": pa.array(list(counts.values()), pa.int64())}
        )

    summed = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["day", "word"],
        specs=[("n", "sum", "n")],
    )

    def topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["n", "word"], ascending=[False, True]
        ).head(DAILY_TOP_K).reset_index(drop=True)
        df["rank"] = (df.index + 1).astype("int64")
        return from_pandas_clean(df[["day", "word", "n", "rank"]])

    return summed.groupby("day").map_groups(topk, batch_format="pyarrow")


HOST_URL_SAMPLE_K = 5


def host_url_samples(sf_dir: str) -> ray.data.Dataset:
    """Per-host sample of the K lexicographically-smallest urls, joined to
    one comma-separated string — the eyeball-check column every crawl
    dashboard shows next to host aggregates.

    Scale shape: min-K per group IS safely pre-prunable (unlike additive
    top-K counts — see daily_top_terms): each block keeps at most K urls
    per host before the exchange, because a url outside a block's local
    min-K can never enter the global min-K. The final per-host merge sees
    ≤ K·blocks rows per host.

    Output: (host, n_sampled, urls) ordered by host."""
    import re as _re

    import pandas as pd

    from .common import from_pandas_clean

    host_re = _re.compile(URL_PARSE_RE)
    out = extraction_output(sf_dir, columns=["url"])

    def prune(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        df = pd.DataFrame(
            {"host": [host_re.match(u).group(1) for u in urls], "url": urls}
        ).sort_values(["host", "url"]).groupby("host").head(HOST_URL_SAMPLE_K)
        return from_pandas_clean(df.reset_index(drop=True))

    pruned = out.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values("url").head(HOST_URL_SAMPLE_K)
        return pa.table(
            {"host": pa.array([df["host"].iloc[0]], pa.string()),
             "n_sampled": pa.array([len(df)], pa.int64()),
             "urls": pa.array([",".join(df["url"])], pa.string())}
        )

    return pruned.groupby("host").map_groups(merge, batch_format="pyarrow")


def url_templates(sf_dir: str) -> ray.data.Dataset:
    """Per-host URL path templates (digit runs collapsed to 'N') with
    counts — the crawl-frontier dedup primitive: template cardinality per
    host tells a scheduler which hosts are parameter farms (one template,
    millions of urls) vs genuine content trees.

    Scale shape: pure per-batch map (compiled regex) + ONE combiner-
    collapsed count exchange bounded by |hosts|·|templates| per block, not
    by url volume. Output: (host, template, n_urls) ordered by host,
    n_urls desc, template."""
    import re as _re

    import pandas as pd

    from .common import from_pandas_clean, grouped_agg

    parse = _re.compile(URL_PARSE_RE)
    digits = _re.compile(r"[0-9]+")
    out = extraction_output(sf_dir, columns=["url"])

    def prep(batch: pa.Table) -> pa.Table:
        hosts: list[str] = []
        templates: list[str] = []
        for u in batch.column("url").to_pylist():
            m = parse.match(u)
            hosts.append(m.group(1))
            templates.append(digits.sub("N", m.group(2)))
        df = pd.DataFrame({"host": hosts, "template": templates})
        return from_pandas_clean(
            df.groupby(["host", "template"], as_index=False).size().rename(
                columns={"size": "n_urls"}))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_urls"] = df["n_urls"].astype("int64")
        return df.sort_values(
            ["host", "n_urls", "template"], ascending=[True, False, True]
        ).reset_index(drop=True)

    return grouped_agg(
        out.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host", "template"],
        specs=[("n_urls", "sum", "n_urls")],
        finalize=fin,
    )


def host_dup_ratio(sf_dir: str) -> ray.data.Dataset:
    """Per-host content duplication ratio: 1 − distinct-texts / records —
    the crawl-quality rollup that flags template farms (same body under
    many urls) before they pollute a training mix.

    Scale shape: text bodies never cross the exchange — only 16-byte md5
    hashes; the first exchange is combiner-collapsed (host, hash) counts,
    the second is a tiny per-host rollup. The ratio is one IEEE division
    of exact counts, identical to the SQL twin.

    Output: (host, n_urls, n_distinct, dup_ratio) by host."""
    import hashlib as _h
    import re as _re

    import pandas as pd

    from .common import from_pandas_clean, grouped_agg

    parse = _re.compile(URL_PARSE_RE)
    out = extraction_output(sf_dir, columns=["url", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        hosts = [parse.match(u).group(1)
                 for u in batch.column("url").to_pylist()]
        hashes = [_h.md5(t.encode()).hexdigest()
                  for t in batch.column("text").to_pylist()]
        df = pd.DataFrame({"host": hosts, "h": hashes}).groupby(
            ["host", "h"], as_index=False).size().rename(columns={"size": "n"})
        df["n"] = df["n"].astype("int64")
        return from_pandas_clean(df)

    cells = grouped_agg(
        out.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host", "h"],
        specs=[("n", "sum", "n")],
    )

    def per_host(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("host", as_index=False).agg(
            n_urls=("n", "sum"), n_distinct=("n", "size"))
        df["n_urls"] = df["n_urls"].astype("int64")
        df["n_distinct"] = df["n_distinct"].astype("int64")
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["dup_ratio"] = [
            1.0 - float(d) / float(n)
            for d, n in zip(df["n_distinct"], df["n_urls"])
        ]
        return df.sort_values("host").reset_index(drop=True)

    return grouped_agg(
        cells.map_batches(per_host, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host"],
        specs=[("n_urls", "sum", "n_urls"), ("n_distinct", "sum", "n_distinct")],
        finalize=fin,
    )


def host_lang_entropy(sf_dir: str) -> ray.data.Dataset:
    """Per-host language-mix entropy — low entropy means a monolingual
    site, high entropy a mixed-language aggregator (a routing signal for
    language-targeted crawls). Uses the token_entropy determinism
    contract: per-language contributions c·log2(c) quantize to exact
    integers (round(log2(c)·2^20)) so the only floats are log2(n) and one
    final division, identical on both sides.

    Output: (host, n_records, entropy) by host."""
    import math
    import re as _re

    import pandas as pd

    from ..ops.documents import ENTROPY_QLOG_SCALE
    from .common import from_pandas_clean, grouped_agg

    parse = _re.compile(URL_PARSE_RE)
    out = extraction_output(sf_dir, columns=["url", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        hosts = [parse.match(u).group(1)
                 for u in batch.column("url").to_pylist()]
        df = pd.DataFrame(
            {"host": hosts, "lang": batch.column("lang").to_pylist()}
        ).groupby(["host", "lang"], as_index=False).size().rename(
            columns={"size": "c"})
        df["c"] = df["c"].astype("int64")
        return from_pandas_clean(df)

    counts = grouped_agg(
        out.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host", "lang"],
        specs=[("c", "sum", "c")],
    )
    scale = ENTROPY_QLOG_SCALE

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["s"] = [
            int(c) * round(math.log2(int(c)) * scale) if c > 1 else 0
            for c in df["c"]
        ]
        return from_pandas_clean(df[["host", "c", "s"]])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["entropy"] = [
            0.0 if n == 0 else math.log2(int(n)) - int(s) / (int(n) * float(scale))
            for n, s in zip(df["n_records"], df["s"])
        ]
        df["n_records"] = df["n_records"].astype("int64")
        return df.sort_values("host").reset_index(drop=True)[
            ["host", "n_records", "entropy"]]

    return grouped_agg(
        counts.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host"],
        specs=[("n_records", "sum", "c"), ("s", "sum", "s")],
        finalize=fin,
    )


def error_taxonomy(sf_dir: str) -> ray.data.Dataset:
    """Failure-mode rollup over the extraction run: how many records of
    each branch died with each exception class — the ops dashboard every
    large crawl-processing fleet watches (the error column is the
    engine's per-record failure capture; SURVEY.md T5's retries + error
    column replace the reference's progress/failure state).

    Scale shape: a two-column pruned read of the committed shards, a
    shuffle-free per-batch rollup, one tiny grouped sum.

    Output: (branch, error_class, n) ordered by branch, error_class, with
    error_class = the exception class before the first ':'."""
    import pandas as pd

    from .common import from_pandas_clean, grouped_agg

    out = extraction_output(sf_dir, columns=["branch", "error"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["error"].notna()].copy()
        if not len(df):
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("branch", pa.string()),
                 pa.field("error_class", pa.string()),
                 pa.field("n", pa.int64())]))
        df["error_class"] = df["error"].str.split(":", n=1).str[0]
        out = df.groupby(["branch", "error_class"], as_index=False).size()
        return from_pandas_clean(out.rename(columns={"size": "n"}))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        return df.sort_values(["branch", "error_class"]).reset_index(drop=True)

    return grouped_agg(
        out.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["branch", "error_class"],
        specs=[("n", "sum", "n")],
        finalize=fin,
    )


def ocr_confidence_histogram(sf_dir: str) -> ray.data.Dataset:
    """OCR quality control: corpus-wide histogram of per-word recognition
    confidence over the OCR branch — the acceptance gauge an operator reads
    before trusting an engine/config change (the reference surfaces
    per-word ``x_wconf`` for exactly this purpose).

    Scale shape: spans flatten per batch with a numpy repeat mask (no
    per-row Python), each batch collapses to ≤ |distinct conf| partial
    rows, and the only exchange is the tiny conf-keyed grouped sum.

    Output: (confidence, n_words) ordered by confidence."""
    import numpy as np

    from .common import grouped_agg

    out = extraction_output(sf_dir, columns=["spans", "error", "branch"])

    def partial(batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        offsets = spans_col.offsets.to_numpy()
        counts = np.diff(offsets)
        ok = np.array(
            [e is None and b == "ocr"
             for e, b in zip(batch.column("error").to_pylist(),
                             batch.column("branch").to_pylist())]
        )
        # flatten() honors the slice: len(conf) == counts.sum(), aligned
        # with the per-row repeat of the keep mask
        conf = spans_col.flatten().field("conf").to_numpy(zero_copy_only=False)
        vals, n = np.unique(conf[np.repeat(ok, counts)], return_counts=True)
        return pa.table(
            {"confidence": pa.array(vals.astype("int64"), pa.int64()),
             "n_words": pa.array(n.astype("int64"), pa.int64())}
        )

    def fin(df):
        return df.sort_values("confidence").reset_index(drop=True)

    return grouped_agg(
        out.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["confidence"],
        specs=[("n_words", "sum", "n_words")],
        finalize=fin,
    )


# --------------------------------------- range-partition planner primitive

RANGE_BUCKETS = 8
RANGE_SAMPLE_MOD = 100  # ~1% deterministic hash sample feeds the planner


def range_split_points(sf_dir: str) -> "pa.Table":
    """Equi-depth range partitioner: derive RANGE_BUCKETS split points for
    the url key space from a deterministic hash sample, then count how many
    corpus rows land in each range — the planning step behind
    range-partitioned writes and merge-sorted outputs (what
    ``repartition`` by key ranges needs before it can move a byte).

    Scale shape: the sample (hash % RANGE_SAMPLE_MOD == 0) is the only
    thing the driver sorts — size the mod so the sample is ~10^3-10^4 keys
    regardless of corpus size; boundaries broadcast; per-batch bucket
    assignment is one numpy searchsorted; counts collapse per batch before
    the B-row exchange.

    Output: (bucket, boundary_lo, n_rows); bucket 0's boundary_lo is ''."""
    import numpy as np

    from ..kernels.sketches import _stable_hash64
    from .common import grouped_agg

    ds = ray.data.read_parquet(pages_corpus(sf_dir), columns=["url"])

    def sample(batch: pa.Table) -> pa.Table:
        urls = [u for u in batch.column("url").to_pylist()
                if _stable_hash64(u.encode()) % RANGE_SAMPLE_MOD == 0]
        return pa.table({"url": pa.array(urls, pa.string())})

    samp = sorted(
        r["url"] for r in ds.map_batches(
            sample, batch_format="pyarrow", zero_copy_batch=True).take_all()
    )
    n = len(samp)
    bounds = [samp[i * n // RANGE_BUCKETS]
              for i in range(1, RANGE_BUCKETS)] if n else []
    bounds_arr = np.array(bounds, dtype=object)
    b_ref = ray.put(bounds_arr)

    def assign(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        urls = np.array(batch.column("url").to_pylist(), dtype=object)
        # bucket = number of boundaries <= url
        bucket = np.searchsorted(b, urls, side="right") if len(b) else \
            np.zeros(len(urls), dtype=np.int64)
        vals, cnt = np.unique(bucket, return_counts=True)
        return pa.table(
            {"bucket": pa.array(vals.astype("int64"), pa.int64()),
             "n_rows": pa.array(cnt.astype("int64"), pa.int64())}
        )

    def fin(df):
        df = df.sort_values("bucket").reset_index(drop=True)
        df["boundary_lo"] = [
            "" if b == 0 else bounds[b - 1] for b in df["bucket"]
        ]
        return df[["bucket", "boundary_lo", "n_rows"]]

    return grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        keys=["bucket"],
        specs=[("n_rows", "sum", "n_rows")],
        finalize=fin,
    )


# ------------------------------------------------ hostname entropy screen

# DGA-style screen: character-distribution entropy of the registrable
# host label. Same exact quantization as token_entropy (round(log2(c)·2^20)
# is never a round-half boundary for integer c); the flag threshold is a
# cross-multiplied integer test against ENTROPY_FLAG_MILLIBITS.
HOSTNAME_ENTROPY_QSCALE = 1 << 20
ENTROPY_FLAG_MILLIBITS = 3000  # flag hosts above 3.0 bits/char


def hostname_entropy(sf_dir: str) -> ray.data.Dataset:
    """Per-host character entropy of the host name — the classic
    algorithmically-generated-domain (DGA) screen: template hosts sit
    near the corpus norm, high-entropy random-looking labels flag for
    blocklist review before their content enters a training mix.

    Exactness: H = log2(L) − (Σ c·q(c)) / (L·S) with q(c) =
    round(log2(c)·S) exact ints (the token_entropy argument); the flag is
    the cross-multiplied integer test H_milli > threshold computed from
    the same quantized terms on both sides — the ONE float division is
    the reported entropy itself.

    Scale shape: hosts are a distinct dimension (one combiner distinct
    over urls); the per-host character histogram is a pure map.

    Output: (host, n_chars, entropy_bits, flagged) ordered by host."""
    import math
    import re as _re

    from collections import Counter

    from .common import distinct

    ds = _pages_pruned(sf_dir, ["url"])
    host_re = _re.compile(URL_PARSE_RE)

    def hosts_of(batch: pa.Table) -> pa.Table:
        hs = []
        for url in batch.column("url").to_pylist():
            m = host_re.search(url)
            if m:
                hs.append(m.group(1).lower())
        return pa.table({"host": pa.array(hs, pa.string())})

    hosts = distinct(
        ds.map_batches(hosts_of, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
    )

    S = HOSTNAME_ENTROPY_QSCALE

    def score(batch: pa.Table) -> pa.Table:
        names = batch.column("host").to_pylist()
        ent: list[float] = []
        flags: list[bool] = []
        lens: list[int] = []
        for h in names:
            counts = Counter(h)
            n = len(h)
            s = sum(c * round(math.log2(c) * S) for c in counts.values()
                    if c > 1)
            # H·(n·S·1000) > thresh·(n·S) cross-multiplied:
            # (log2(n)·n·S − s)·1000 > thresh·n·S with log2(n) quantized
            qn = round(math.log2(n) * S) if n else 0
            num = qn * n - s
            ent.append(float(num) / float(n * S) if n else 0.0)
            flags.append(num * 1000 > ENTROPY_FLAG_MILLIBITS * n * S)
            lens.append(n)
        return pa.table(
            {"host": batch.column("host"),
             "n_chars": pa.array(lens, pa.int64()),
             "entropy_bits": pa.array(ent, pa.float64()),
             "flagged": pa.array(flags, pa.bool_())}
        )

    return hosts.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True).sort("host")


def title_dup_groups(sf_dir: str) -> ray.data.Dataset:
    """Title-level duplicate clusters: distinct urls sharing the same
    normalized <title> (strip + casefold-lower) — the cheapest cross-host
    dup screen a crawl pipeline runs before any content hashing (mirror
    detection at metadata cost; scraped-news syndication shows up here
    first).

    Scale shape: (title_norm, url) pairs distinct-collapse via one
    combiner pass (title strings are short; the exchange is
    page-metadata sized, never content sized); the group rollup is a
    grouped count + Min. Groups below 2 urls drop in the finalize.

    Output: (title_norm, n_urls, keep_url) for groups with >= 2 urls,
    ordered by title_norm."""
    import re as _re

    from .common import distinct, grouped_agg

    title_re = _re.compile(TITLE_RE)
    ds = _pages_pruned(sf_dir, ["url", "html"])

    def rows(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        titles: list[str] = []
        out_urls: list[str] = []
        for url, data in zip(urls, batch.column("html").to_pylist()):
            if data[:9] != b"<!DOCTYPE":
                continue
            # decode policy: the synthetic corpus is valid UTF-8 by
            # construction; errors='replace' keeps a malformed real-world
            # page from killing the stage (the oracle's decode() would
            # throw there — a corpus assumption, documented not hidden)
            m = title_re.search(data.decode("utf-8", errors="replace"))
            if not m:
                continue
            # trim EXACTLY the SQL trim()'s six-char ASCII set — Python
            # str.strip() also eats NBSP & friends and diverges from the
            # oracle on titles edged with Unicode whitespace (r05 ADVICE)
            t = m.group(1).strip(" \t\n\r\v\f").lower()
            if t:
                titles.append(t)
                out_urls.append(url)
        return pa.table({"title_norm": pa.array(titles, pa.string()),
                         "url": pa.array(out_urls, pa.string())})

    pairs = distinct(
        ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True),
        ["title_norm", "url"],
    )

    def fin(df):
        df = df[df["n_urls"] >= 2]
        return df.sort_values("title_norm").reset_index(drop=True)

    return grouped_agg(
        pairs,
        keys=["title_norm"],
        specs=[("n_urls", "count", None), ("keep_url", "min", "url")],
        finalize=fin,
    )
