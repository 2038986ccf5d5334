"""Rule-based entity tagging — the in-engine stage filling the reference's
W7 anonymizer slot (server/src/utils/file.py:57-73 POSTs extracted text to
an external NER service and writes the tagged result; here the tagger runs
IN the pipeline as an actor-pool stage, so no network hop and no external
dependency — the same position in the dataflow, a deterministic rule model
instead of a remote model server).

Input is the SHARED naive-visible-lines artifact
(:func:`ocr_ray.ops.extraction_queries.naive_lines_output`) — the same
parsed-lines product the boilerplate/pii hygiene ops are checked against —
so tagging costs no second full-corpus HTML parse.

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
from .extraction_queries import EMAIL_RE_S, PHONE_RE_S, naive_lines_output

NAME_RE_S = r"\b[A-Z][a-z]+ [A-Z][a-z]+\b"

ENTITY_PATTERNS = (("email", EMAIL_RE_S), ("phone", PHONE_RE_S), ("name", NAME_RE_S))

ENTITY_SCHEMA = pa.schema(
    [pa.field("url", pa.string()), pa.field("entity_type", pa.string()),
     pa.field("n_mentions", pa.int64()), pa.field("n_distinct", pa.int64()),
     pa.field("entities", pa.string())]
)

_PARTIAL_SCHEMA = pa.schema(
    [pa.field("url", pa.string()), pa.field("warc_ts", pa.string()),
     pa.field("entity_type", pa.string()), pa.field("n_mentions", pa.int64()),
     pa.field("entities", pa.string())]
)


class EntityTagWorker:
    """Actor-pool NER stage: rule table compiled ONCE per actor (the slot a
    real deployment loads its NER model into — T4/W7), applied per batch of
    line rows. Emits PARTIAL per-(record, entity_type) aggregates — lines of
    one record are near-contiguous in the artifact, so the downstream
    exchange ships ~records × types rows, never per-mention rows."""

    def __init__(self):
        import re

        self.patterns = [(name, re.compile(pat)) for name, pat in ENTITY_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        partial: dict[tuple, list] = {}
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        for i, line in enumerate(batch.column("line").to_pylist()):
            for name, rx in self.patterns:
                hits = rx.findall(line)
                if hits:
                    partial.setdefault((urls[i], str(ts[i]), name), []).extend(hits)
        return pa.Table.from_pylist(
            [
                {"url": u, "warc_ts": t, "entity_type": n,
                 "n_mentions": len(hits), "entities": "|".join(hits)}
                for (u, t, n), hits in partial.items()
            ],
            schema=_PARTIAL_SCHEMA,
        )


def _merge_partials(group: pa.Table) -> pa.Table:
    """Merge one record's partials: sum mentions, union entity sets.
    Entities can't contain '|' (the rule regexes exclude it), so the pipe
    join round-trips exactly."""
    ents: set[str] = set()
    for s in group.column("entities").to_pylist():
        ents.update(s.split("|"))
    distinct = sorted(ents)
    return pa.Table.from_pylist(
        [{"url": group.column("url")[0].as_py(),
          "entity_type": group.column("entity_type")[0].as_py(),
          "n_mentions": int(pa.compute.sum(group.column("n_mentions")).as_py()),
          "n_distinct": len(distinct),
          "entities": "|".join(distinct)}],
        schema=ENTITY_SCHEMA,
    )


def doc_entities(sf_dir: str) -> ray.data.Dataset:
    """Entities per url: (url, entity_type, n_mentions, n_distinct,
    entities). Reads the shared naive-lines artifact (no second corpus
    parse); one actor-pool tagging pass emits per-record PARTIALS, then a
    small groupby over (url, warc_ts, entity_type) merges them — the
    exchange carries only hit records, never lines or mentions. Re-crawled
    urls tag identically (payload-deterministic) and are deduped by
    (url, entity_type). Oracle: SQL regexp_extract_all over the same
    naive_lines artifact."""
    from .common import distinct

    lines = naive_lines_output(sf_dir, columns=["url", "warc_ts", "line"])
    partials = lines.map_batches(
        EntityTagWorker, batch_format="pyarrow", batch_size=4096,
        concurrency=small_pool(), num_cpus=1,
    )
    merged = partials.groupby(["url", "warc_ts", "entity_type"]).map_groups(
        _merge_partials, batch_format="pyarrow"
    )
    return distinct(
        merged, ["url", "entity_type"],
        carry=["n_mentions", "n_distinct", "entities"],
    )
