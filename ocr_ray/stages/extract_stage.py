"""The unified extraction stage: one callable-class actor handling both
branches per document.

Why per-document and not per-page by default: web corpora are dominated by
1-page HTML rows plus small PDFs, so processing a whole document inside the
actor call removes the per-document fan-in shuffle entirely — the flagship
pipeline's only wide op is the output partitioning (SURVEY.md §4.2). The
page-level fan-out variant (stages/explode.py) exists for giant-document
corpora and is tested byte-equal.

Actor-pool semantics (SURVEY.md T1): the engine is constructed once per
actor in ``__init__`` (model/traineddata residency) and reused across
batches — the single biggest throughput win over the reference's
``--max-tasks-per-child=1`` restart-per-task worker config
(docker-compose.yml:49).

Engines that declare ``CHEAP_INIT`` (stub, pixel — their warm state is a
module-level template table) skip the actor pool entirely: extraction runs
as a plain task-pool ``map_batches`` with a PROCESS-GLOBAL engine cache
(:func:`make_extract_fn`), which (a) inherits Ray's prestarted worker
processes instead of paying actor spawn per execution and (b) lets the
scheduler use every core instead of a fixed half-width pool. Expensive-init
engines (tesserocr) keep the actor path — the callable-class slot is the
design; the task path is the degenerate case of it.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import OcrConfig, resolve_config
from ..engines import get_engine_cls
from ..extract_core import extract_document
from ..kernels.html_extract import DEFAULT_SETTINGS, ExtractSettings
from ..schemas import EXTRACT_WIRE_SCHEMA, pack_spans

OUT_SCHEMA = EXTRACT_WIRE_SCHEMA


class ExtractWorker:
    """map_batches callable class: pages batch → extraction output batch."""

    def __init__(
        self,
        config: OcrConfig | None = None,
        settings: ExtractSettings = DEFAULT_SETTINGS,
    ):
        self.config = config or resolve_config()
        self.settings = settings
        self.engine = get_engine_cls(self.config.engine)(self.config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _extract_batch(batch, self.engine, self.settings)


# (engine-name, frozen-config) → engine, one per WORKER PROCESS — the task-
# pool twin of the actor's __init__ residency. Safe for CHEAP_INIT engines
# only (their construction is a dict lookup; the cache just avoids even
# that per batch).
_ENGINE_CACHE: dict = {}


def make_extract_fn(config: OcrConfig, settings: ExtractSettings = DEFAULT_SETTINGS):
    def extract_fn(batch: pa.Table) -> pa.Table:
        key = config
        engine = _ENGINE_CACHE.get(key)
        if engine is None:
            engine = get_engine_cls(config.engine)(config)
            _ENGINE_CACHE[key] = engine
        return _extract_batch(batch, engine, settings)

    return extract_fn


def _extract_batch(batch: pa.Table, engine, settings: ExtractSettings) -> pa.Table:
    payloads = batch.column("html").to_pylist()
    branches, texts, spans_bins, n_pages, n_words, errors = [], [], [], [], [], []
    for payload in payloads:
        rec = extract_document(payload, engine, settings)
        branches.append(rec["branch"])
        texts.append(rec["text"])
        spans_bins.append(pack_spans(rec["spans"]))
        n_pages.append(rec["n_pages"])
        n_words.append(rec["n_words"])
        errors.append(rec["error"])
    # passthrough columns ride through zero-copy; computed columns are
    # built once per batch (no per-row dicts)
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "branch": pa.array(branches, pa.string()),
            "text": pa.array(texts, pa.string()),
            "spans_bin": pa.array(spans_bins, pa.binary()),
            "n_pages": pa.array(n_pages, pa.int32()),
            "n_words": pa.array(n_words, pa.int32()),
            "error": pa.array(errors, pa.string()),
            "part": batch.column("part"),
        },
        schema=OUT_SCHEMA,
    )
