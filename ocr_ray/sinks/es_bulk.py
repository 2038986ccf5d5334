"""Elasticsearch bulk-indexing sink (W8) — the reference's page-index
semantics materialized as deterministic bulk payloads.

Parity targets (/root/reference/server):
- index settings/mapping — filename/text analyzers, eng+pt stop filter,
  lowercase+asciifolding term normalizer, single shard
  (``src/elastic_search.py:11-74``);
- per-page document shape — ``create_document``
  (``src/elastic_search.py:192-231``), already exposed as the
  ``search_index_docs`` query;
- **idempotent indexing via deterministic ids** — the reference seeds
  ``random`` with the page path and draws a UUID4 from it
  (``src/utils/file.py:233-237``), so re-indexing the same page overwrites
  instead of duplicating (``app.py:978-979``). Reproduced bit-exactly.

No Elasticsearch service exists in this sandbox (and the north-rule scope
is the data engine, not service ops), so the sink's output is the **bulk
request body itself**: NDJSON action+document line pairs, partitioned like
every other sink output. A real deployment POSTs each file to ``_bulk``
unchanged; the payload bytes are what the driver's hash check pins.
"""

from __future__ import annotations

import json
import random
import uuid

ES_INDEX = "documents"

# Analyzer/mapping semantics of elastic_search.py:11-74: filenames tokenized
# on non-word chars + lowercased; text on whitespace with english+portuguese
# stopwords dropped; keyword twins normalized lowercase+asciifolding.
INDEX_SETTINGS = {
    "analysis": {
        "analyzer": {
            "filename_analyzer": {
                "type": "pattern", "pattern": "\\W|_", "lowercase": True,
            },
            "text_analyzer": {
                "tokenizer": "whitespace", "filter": ["stop_eng_pt"],
            },
        },
        "filter": {
            "stop_eng_pt": {
                "type": "stop", "ignore_case": True,
                "stopwords": ["_english_", "_portuguese_"],
            }
        },
        "normalizer": {
            "term_normalizer": {
                "type": "custom", "filter": ["lowercase", "asciifolding"],
            }
        },
    },
    "number_of_shards": 1,
    "number_of_replicas": 0,
    "max_result_window": 550000,
}

INDEX_MAPPING = {
    "properties": {
        "Document": {
            "type": "text", "analyzer": "filename_analyzer",
            "fields": {"keyword": {"type": "keyword"}},
        },
        "Path": {"type": "text", "analyzer": "filename_analyzer"},
        "Page": {
            "type": "integer",
            "fields": {
                "raw": {"type": "keyword"},
                "keyword": {"type": "keyword", "normalizer": "term_normalizer"},
            },
        },
        "Text": {
            "type": "text", "analyzer": "text_analyzer",
            "fields": {
                "raw": {"type": "keyword"},
                "keyword": {"type": "keyword", "normalizer": "term_normalizer"},
            },
        },
        "Engine": {"type": "keyword", "normalizer": "term_normalizer"},
        "Config": {"type": "object", "dynamic": False},
        "Page Image": {"enabled": False},
    }
}


def deterministic_page_id(path: str) -> str:
    """Stable UUID4-shaped id for a page path — seed the Mersenne Twister
    with the path and draw 16 bytes, exactly like the reference
    (file.py:233-237), so indexing is idempotent: same page → same _id →
    overwrite, and deletes can reconstruct the id without state."""
    rng = random.Random()
    rng.seed(path)
    return str(uuid.UUID(bytes=bytes(rng.getrandbits(8) for _ in range(16)), version=4))


def bulk_pair(doc: dict, es_id: str, index: str = ES_INDEX) -> str:
    """One bulk entry: the index action line + the document line (NDJSON).
    Keys serialize in insertion order and separators are fixed, so the
    payload bytes are deterministic."""
    action = json.dumps(
        {"index": {"_index": index, "_id": es_id}}, separators=(",", ":")
    )
    body = json.dumps(doc, separators=(",", ":"), ensure_ascii=False)
    return action + "\n" + body + "\n"


def page_bulk_record(document: str, path: str, page: int, text: str,
                     engine: str, config: str) -> tuple[str, str]:
    """(es_id, bulk NDJSON pair) for one search_index_docs row."""
    es_id = deterministic_page_id(path)
    doc = {
        "Document": document,
        "Path": path,
        "Page": page,
        "Text": text,
        "Engine": engine,
        "Config": config,
    }
    return es_id, bulk_pair(doc, es_id)


def write_bulk_files(ds, out_dir: str, lines_per_file: int = 2000) -> list[str]:
    """Drive a bulk-payload Dataset into partitioned .ndjson files sized for
    one ``_bulk`` POST each. Streams via iter_batches; returns file paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    buf: list[str] = []
    n = 0

    def flush():
        nonlocal buf
        if not buf:
            return
        p = os.path.join(out_dir, f"bulk-{len(paths):05d}.ndjson")
        with open(p, "w", encoding="utf-8") as f:
            f.write("".join(buf))
        paths.append(p)
        buf = []

    for batch in ds.iter_batches(batch_format="pyarrow"):
        for chunk in batch.column("bulk").to_pylist():
            buf.append(chunk)
            n += 1
            if n % lines_per_file == 0:
                flush()
    flush()
    return paths
