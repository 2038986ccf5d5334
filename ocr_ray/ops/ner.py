"""Rule-based entity tagging — the in-engine stage filling the reference's
W7 anonymizer slot (server/src/utils/file.py:57-73 POSTs extracted text to
an external NER service and writes the tagged result; here the tagger runs
IN the pipeline as an actor-pool stage, so no network hop and no external
dependency — the same position in the dataflow, a deterministic rule model
instead of a remote model server).

Entity model (regex rules, shared verbatim with the DuckDB oracle — Python
`re` and RE2 agree on this subset):

- ``email``  — same pattern as pii_scrub;
- ``phone``  — international-format numbers, same as pii_scrub;
- ``name``   — Capitalized-bigram PERSON shape (title-cased heading pairs),
  the classic gazetteer-free baseline.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .common import small_pool
from .extraction_queries import EMAIL_RE_S, PHONE_RE_S, _pages_pruned

NAME_RE_S = r"\b[A-Z][a-z]+ [A-Z][a-z]+\b"

ENTITY_PATTERNS = (("email", EMAIL_RE_S), ("phone", PHONE_RE_S), ("name", NAME_RE_S))

ENTITY_SCHEMA = pa.schema(
    [pa.field("url", pa.string()), pa.field("entity_type", pa.string()),
     pa.field("n_mentions", pa.int64()), pa.field("n_distinct", pa.int64()),
     pa.field("entities", pa.string())]
)


class EntityTagWorker:
    """Actor-pool NER stage: rule table compiled ONCE per actor (the slot a
    real deployment loads its NER model into — T4/W7), applied per batch
    over the naive visible lines of the html branch."""

    def __init__(self):
        import re

        self.patterns = [(name, re.compile(pat)) for name, pat in ENTITY_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..extract_core import route
        from ..kernels.html_extract import extract_lines_naive

        out: list[dict] = []
        for r in batch.to_pylist():
            if route(r["html"]) != "html":
                continue
            lines = extract_lines_naive(r["html"].decode("utf-8", errors="replace"))
            if not lines:
                continue
            per_type: dict[str, list[str]] = {n: [] for n, _ in self.patterns}
            for _par, _no, line in lines:
                for name, rx in self.patterns:
                    per_type[name].extend(rx.findall(line))
            for name, hits in per_type.items():
                if not hits:
                    continue
                distinct = sorted(set(hits))
                out.append(
                    {"url": r["url"], "entity_type": name,
                     "n_mentions": len(hits), "n_distinct": len(distinct),
                     "entities": "|".join(distinct)}
                )
        return pa.Table.from_pylist(out, schema=ENTITY_SCHEMA)


def doc_entities(sf_dir: str) -> ray.data.Dataset:
    """Entities per url: (url, entity_type, n_mentions, n_distinct,
    entities). Shuffle-free — one actor-pool pass over the pages corpus;
    re-crawled urls tag identically (payload-deterministic) and are deduped
    by (url, entity_type). Oracle: SQL regexp_extract_all over the
    naive_lines artifact."""
    from .common import distinct

    ds = _pages_pruned(sf_dir, ["url", "html"])
    tagged = ds.map_batches(
        EntityTagWorker, batch_format="pyarrow", batch_size=128,
        concurrency=small_pool(), num_cpus=1,
    )
    return distinct(
        tagged, ["url", "entity_type"],
        carry=["n_mentions", "n_distinct", "entities"],
    )
