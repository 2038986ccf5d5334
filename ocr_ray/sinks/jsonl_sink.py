"""Streaming JSONL (newline-delimited JSON) sink — the interchange format
LLM training stacks consume (one UTF-8 JSON object per line, per-shard
files). Reference export surface: the repo's TXT/CSV/PDF writers
(server/src/export.py); JSONL is the training-data-native addition.

Determinism contract: objects serialize with sorted keys, compact
separators and ensure_ascii=False, so a given row always produces the same
bytes; shard file CONTENTS depend only on which rows land in a block, and
the round-trip query (ops.documents.jsonl_export) proves content fidelity
independently of block boundaries."""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa


def write_jsonl(ds, out_dir: str):
    """Shuffle-free streamed write: one shard file per input block, written
    by the block's own task (no driver materialization, no exchange). Shard
    names are unique per task invocation; ack rows (path, n_rows, bytes)
    come back as a tiny dataset the caller can materialize to barrier on
    completion. Timestamp columns serialize as ISO-8601 strings."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        name = f"part-{uuid.uuid4().hex}.json"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        n_bytes = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for r in rows:
                for k, v in r.items():
                    if hasattr(v, "isoformat"):
                        r[k] = v.isoformat()
                line = json.dumps(
                    r, sort_keys=True, separators=(",", ":"), ensure_ascii=False
                )
                n_bytes += f.write(line + "\n")
        os.replace(tmp, path)  # never leave a torn shard visible
        return pa.table(
            {"path": pa.array([path], pa.string()),
             "n_rows": pa.array([len(rows)], pa.int64()),
             "bytes": pa.array([n_bytes], pa.int64())}
        )

    return ds.map_batches(write_block, batch_format="pyarrow", zero_copy_batch=True)
