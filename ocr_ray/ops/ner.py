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


NER_SALT_BUCKETS = 256


def _rollup_bucket(df):
    """Vectorized per-salt-bucket finish: merge a record's partials (sum
    mentions, sorted-distinct entity union — entities can't contain '|',
    the rule regexes exclude it, so the pipe join round-trips exactly) AND
    dedup re-crawled urls by (url, entity_type) in the same pass. One
    pandas groupby over the whole bucket — NOT one Python call per record
    group, which at crawl scale is one call per hit record (measured
    10.8 s for 255k groups at sf0.1 vs ~1 s bucketed; the same
    per-group-call cliff ops.common.distinct documents)."""
    import pandas as pd

    g = df.groupby(["url", "warc_ts", "entity_type"], as_index=False).agg(
        n_mentions=("n_mentions", "sum"), entities=("entities", "|".join)
    )
    uniq = [sorted(set(s.split("|"))) for s in g["entities"]]
    g["entities"] = ["|".join(u) for u in uniq]
    g["n_distinct"] = [len(u) for u in uniq]
    # re-crawls tag identically (payload-deterministic): keep the earliest
    # warc_ts deterministically, then drop the ts column
    g = g.sort_values(["url", "entity_type", "warc_ts"]).drop_duplicates(
        ["url", "entity_type"], keep="first")
    return g[["url", "entity_type", "n_mentions", "n_distinct", "entities"]]


def doc_entities(sf_dir: str) -> ray.data.Dataset:
    """Entities per url: (url, entity_type, n_mentions, n_distinct,
    entities). Reads the shared naive-lines artifact (no second corpus
    parse); one actor-pool tagging pass emits per-record PARTIALS, then ONE
    salt-bucketed exchange (crc32(url) % NER_SALT_BUCKETS) finishes with a
    vectorized pandas rollup per bucket — partial merge AND re-crawl dedup
    in the same pass. The exchange carries only hit records, never lines or
    mentions; same-url rows co-locate by construction of the salt. Oracle:
    SQL regexp_extract_all over the same naive_lines artifact."""
    import zlib

    lines = naive_lines_output(sf_dir, columns=["url", "warc_ts", "line"])
    partials = lines.map_batches(
        EntityTagWorker, batch_format="pyarrow", batch_size=4096,
        concurrency=small_pool(), num_cpus=1,
    )

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = [zlib.crc32(u.encode()) % NER_SALT_BUCKETS
                for u in batch.column("url").to_pylist()]
        return batch.append_column("salt", pa.array(salt, pa.int64()))

    salted = partials.map_batches(add_salt, batch_format="pyarrow")

    def rollup(df):
        return _rollup_bucket(df.drop(columns=["salt"]))

    return salted.groupby("salt").map_groups(rollup, batch_format="pandas")


ENTITY_PAIR_CAP = 64  # sorted-prefix cap per doc, mirrored in the SQL twin


def entity_cooccurrence(sf_dir: str) -> ray.data.Dataset:
    """Entity co-occurrence edges: for every pair of distinct PERSON-shaped
    names mentioned in the same document, the number of documents that
    co-mention them — the edge-building step of a knowledge-graph /
    entity-linking pipeline, fed by the in-engine NER stage.

    Scale shape: builds on doc_entities (itself partial-aggregated and
    salt-bucketed); each doc's name list is already sorted-distinct, capped
    at ENTITY_PAIR_CAP by the deterministic sorted prefix (same one-sided
    truncation law as the LSH bucket caps, mirrored by the SQL twin's
    QUALIFY), so per-doc pair fan-out is bounded; pair partials collapse
    per batch before the one name-pair keyed exchange.

    Output: (name_a, name_b, n_docs), name_a < name_b, ordered by
    n_docs desc then pair."""
    import pandas as pd

    from .common import from_pandas_clean, grouped_agg

    ents = doc_entities(sf_dir)

    def pair_partials(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        types = batch.column("entity_type").to_pylist()
        ent_strs = batch.column("entities").to_pylist()
        for t, es in zip(types, ent_strs):
            if t != "name":
                continue
            names = es.split("|")[:ENTITY_PAIR_CAP]
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    k = (names[i], names[j])
                    counts[k] = counts.get(k, 0) + 1
        return pa.table(
            {"name_a": pa.array([k[0] for k in counts], pa.string()),
             "name_b": pa.array([k[1] for k in counts], pa.string()),
             "n_docs": pa.array(list(counts.values()), pa.int64())}
        )

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.sort_values(
            ["n_docs", "name_a", "name_b"],
            ascending=[False, True, True]).reset_index(drop=True)

    return grouped_agg(
        ents.map_batches(pair_partials, batch_format="pyarrow", zero_copy_batch=True),
        keys=["name_a", "name_b"],
        specs=[("n_docs", "sum", "n_docs")],
        finalize=fin,
    )
