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
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        langs = batch.column("lang").to_pylist()
        parts = batch.column("part").to_pylist()
        payloads = batch.column("html").to_pylist()
        out = []
        for url, t, lang, part, payload in zip(urls, ts, langs, parts, payloads):
            rec = extract_document(payload, self.engine, self.settings)
            rec["spans_bin"] = pack_spans(rec.pop("spans"))
            rec.update(url=url, warc_ts=t, lang=lang, part=part)
            out.append(rec)
        return pa.Table.from_pylist(out, schema=OUT_SCHEMA)
