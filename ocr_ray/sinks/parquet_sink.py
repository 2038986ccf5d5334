"""Resumable partitioned Parquet sink with per-partition lineage manifests.

Layout (north_rule "resumes from the last committed partition"; the Ray
analogue of the reference's METS/MD5 manifests and file-existence
idempotence, SURVEY.md W5/D3):

    out/part=<k>/data.parquet       one shard per output partition
    out/part=<k>/_MANIFEST.json     commit record, written LAST

Write protocol per partition (parity with the reference's atomic
tempfile+rename dance, celery_app.py:903-929, but manifest-as-commit):
shard → ``data.parquet.tmp`` → fsync → rename → manifest. A partition
without a manifest is uncommitted and will be recomputed on resume; the
stamp stage drops rows of committed partitions before any extraction work.

The per-partition write task also performs the latest-wins url dedup (D1):
``part = crc32(url) % P`` means all re-crawls of a url land in the same
group, so dedup costs ZERO extra shuffle — it folds into the output
exchange.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "_MANIFEST.json"
SHARD_NAME = "data.parquet"
SCHEMA_VERSION = 1

# Durability mode for committed shards + manifests. Default (False): flush
# to the OS page cache and rely on write-then-rename ordering — safe against
# every job/process-level failure (OOM-kill, preemption, driver crash: the
# Ray failure model the resume protocol targets), because the page cache
# survives the process. True (OCR_RAY_DURABLE_SYNC=1): fsync shard and
# manifest before commit, surviving kernel panic / power loss too — at the
# cost of making phase 2 DEVICE-bound: measured at 400k docs / 32 CPUs,
# 64 partitions x ~25 MB of synchronous writeback pinned the consolidate
# wall at ~65 s regardless of CPU count vs single-digit seconds without.
DURABLE_SYNC = os.environ.get("OCR_RAY_DURABLE_SYNC", "0") == "1"


def _maybe_fsync(f) -> None:
    if DURABLE_SYNC:
        os.fsync(f.fileno())


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part}")


def committed_parts(out_dir: str) -> frozenset[int]:
    """Partitions whose manifest exists = safely resumable."""
    done = set()
    if not os.path.isdir(out_dir):
        return frozenset()
    for name in os.listdir(out_dir):
        if name.startswith("part=") and os.path.exists(
            os.path.join(out_dir, name, MANIFEST_NAME)
        ):
            done.add(int(name.split("=", 1)[1]))
    return frozenset(done)


def dedup_and_sort(group: pa.Table) -> pa.Table:
    """Latest-wins url dedup + deterministic (part, url) ordering for one
    partition group. Latest = max warc_ts; exact warc_ts ties (distinct
    payloads crawled in the same microsecond) fall back to max extracted
    text — a total order, so the winner never depends on shard arrival
    order.

    Last-occurrence selection is one vectorized shifted not-equal over the
    sorted url array (runs inside the hot consolidate task — no per-row
    Python loop)."""
    import numpy as np
    import pyarrow.compute as pc

    group = group.sort_by(
        [("url", "ascending"), ("warc_ts", "ascending"), ("text", "ascending")]
    )
    n = group.num_rows
    if n <= 1:
        return group
    urls = group.column("url").combine_chunks()
    # row i survives iff it is the LAST row of its url run: url[i] != url[i+1]
    changed = pc.not_equal(urls.slice(0, n - 1), urls.slice(1, n - 1))
    keep = np.ones(n, dtype=bool)
    keep[: n - 1] = changed.to_numpy(zero_copy_only=False)
    if not keep.all():
        group = group.take(pa.array(np.flatnonzero(keep), pa.int64()))
    return group


def _string_payload_bytes(arr: pa.Array) -> memoryview:
    """Contiguous utf-8 bytes of ALL values of a string Array, in order
    (Arrow layout: values live back-to-back in the data buffer between
    offsets[0] and offsets[-1])."""
    import numpy as np

    if len(arr) == 0:
        return memoryview(b"")
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    return memoryview(arr.buffers()[2])[int(offs[0]) : int(offs[-1])]


def _text_checksum(table: pa.Table) -> str:
    """sha256 over url\\x00text\\x01 per row — byte-identical to the
    historical per-row loop, computed as ONE Arrow join kernel + one
    contiguous buffer update."""
    import pyarrow.compute as pc

    h = hashlib.sha256()
    if table.num_rows == 0:
        return h.hexdigest()
    texts = pc.fill_null(table.column("text"), "")
    joined = pc.binary_join_element_wise(table.column("url"), texts, "\x00")
    joined = pc.binary_join_element_wise(joined, "", "\x01")
    chunks = joined.chunks if isinstance(joined, pa.ChunkedArray) else [joined]
    for chunk in chunks:
        h.update(_string_payload_bytes(chunk))
    return h.hexdigest()


def _text_bytes(table: pa.Table) -> int:
    """Total utf-8 byte length of the text column (nulls count as empty)."""
    import pyarrow.compute as pc

    if table.num_rows == 0:
        return 0
    texts = pc.fill_null(table.column("text"), "").cast(pa.binary())
    return int(pc.sum(pc.binary_length(texts)).as_py() or 0)


def make_partition_writer(out_dir: str, input_path: str = ""):
    """groupby("part").map_groups fn: dedup, sort, atomically write the
    shard, commit the manifest, return the manifest as a row."""

    def write_partition(group: pa.Table) -> pa.Table:
        from ..schemas import unpack_wire_batch

        part = group.column("part")[0].as_py()
        group = dedup_and_sort(group)
        if "spans_bin" in group.column_names:
            group = unpack_wire_batch(group)
        pdir = partition_dir(out_dir, part)
        os.makedirs(pdir, exist_ok=True)
        shard = os.path.join(pdir, SHARD_NAME)
        tmp = shard + ".tmp"
        pq.write_table(group, tmp, compression="zstd")
        with open(tmp, "rb") as f:
            _maybe_fsync(f)
        os.replace(tmp, shard)
        manifest = {
            "schema_version": SCHEMA_VERSION,
            "part": part,
            "input": input_path,
            "n_rows": group.num_rows,
            "n_errors": int(
                pa.compute.sum(
                    pa.compute.cast(
                        pa.compute.is_valid(group.column("error")), pa.int32()
                    )
                ).as_py()
                or 0
            ),
            "bytes": _text_bytes(group),
            "text_sha256": _text_checksum(group),
        }
        mtmp = os.path.join(pdir, MANIFEST_NAME + ".tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            _maybe_fsync(f)
        os.replace(mtmp, os.path.join(pdir, MANIFEST_NAME))
        return pa.Table.from_pylist(
            [
                {
                    "part": part,
                    "n_rows": manifest["n_rows"],
                    "n_errors": manifest["n_errors"],
                    "bytes": manifest["bytes"],
                    "text_sha256": manifest["text_sha256"],
                }
            ]
        )

    return write_partition


# --------------------------------------------------- two-phase storage sink
#
# Measured on this workload (1 GB extraction output, 32 CPUs, 200 blocks):
# Ray's sort-based groupby exchange takes 60-150 s while a plain
# repartition moves the same bytes in 4 s — the sort dominates, not the
# data. The production sink therefore shuffles THROUGH STORAGE instead:
#
#   phase 1  extraction tasks split each output batch by ``part`` and
#            append shard files under out/part=<k>/tmp_shards/ (no
#            object-store exchange at all; on a cluster this is the shared
#            store that must hold the output anyway)
#   phase 2  one task per partition reads its tmp shards, applies the
#            latest-wins url dedup + deterministic sort, writes the
#            canonical data.parquet, commits the manifest, removes tmps
#
# Crash safety: manifests still commit per partition; run_extract clears
# stale tmp shards of uncommitted partitions before phase 1, and exact
# re-extractions collapse in the dedup. The intermediate costs one extra
# write+read of the output-sized data — the price of skipping the
# object-store sort, and it doubles as the resume checkpoint.

TMP_SHARDS = "tmp_shards"


def clear_uncommitted_tmp(out_dir: str) -> None:
    import shutil

    if not os.path.isdir(out_dir):
        return
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        pdir = os.path.join(out_dir, name)
        if not os.path.exists(os.path.join(pdir, MANIFEST_NAME)):
            shutil.rmtree(os.path.join(pdir, TMP_SHARDS), ignore_errors=True)


def make_shard_writer(out_dir: str, default_codec: str = "snappy"):
    """Stateless map_batches fn (phase 1): split the batch by part, append
    one shard file per part, return tiny ack rows. ``default_codec`` is the
    caller's volume-aware choice (see run_sink); OCR_RAY_TMP_CODEC
    overrides it for experiments."""
    import uuid

    # captured DRIVER-side at plan build (workers may not share driver env)
    tmp_format = os.environ.get("OCR_RAY_TMP_FORMAT", "parquet")
    tmp_codec = os.environ.get("OCR_RAY_TMP_CODEC", default_codec)

    def write_shards(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        acks = []
        parts = batch.column("part")
        for part in pc.unique(parts).to_pylist():
            sub = batch.filter(pc.equal(parts, part))
            pdir = os.path.join(partition_dir(out_dir, part), TMP_SHARDS)
            os.makedirs(pdir, exist_ok=True)
            # tmp shards are transient but the device is shared; the codec
            # is the caller's VOLUME-scaled choice (run_sink): snappy while
            # the run is CPU-bound (100k/32cpus: 15.4 s vs 17.1 s zstd),
            # zstd once transient bytes drain the write-token bucket
            # (interleaved settled A/B at 1M/32cpus: zstd 284.5/300.1 s vs
            # snappy 340.7/354.9 s wall — zstd wins both reps by ~17%).
            # OCR_RAY_TMP_CODEC overrides for experiments.
            # OCR_RAY_TMP_FORMAT=ipc switches the transient format to Arrow
            # IPC + lz4 — no column stats/footer/encoding work on files that
            # exist only to cross the storage shuffle (A/B knob, round 3).
            if tmp_format == "ipc":
                import pyarrow.ipc as ipc

                name = os.path.join(pdir, f"shard-{uuid.uuid4().hex}.arrow")
                opts = ipc.IpcWriteOptions(compression="lz4")
                with ipc.new_file(name + ".tmp", sub.schema, options=opts) as w:
                    w.write_table(sub)
            else:
                name = os.path.join(pdir, f"shard-{uuid.uuid4().hex}.parquet")
                pq.write_table(
                    sub, name + ".tmp",
                    compression=tmp_codec,
                    use_dictionary=False,
                )
            os.replace(name + ".tmp", name)
            acks.append({"part": part, "n_rows": sub.num_rows})
        return pa.Table.from_pylist(
            acks,
            schema=pa.schema(
                [pa.field("part", pa.int32()), pa.field("n_rows", pa.int64())]
            ),
        )

    return write_shards


def consolidate_partition(out_dir: str, part: int, input_path: str = "") -> dict:
    """Phase 2 for one partition: tmp shards → dedup/sort → committed shard
    + manifest. Returns the manifest dict."""
    import shutil

    from ..schemas import unpack_wire_batch

    pdir = partition_dir(out_dir, part)
    tmp_dir = os.path.join(pdir, TMP_SHARDS)
    # Idempotent retry — manifest checked FIRST: a consolidate task whose
    # worker died AFTER committing but BEFORE Ray recorded the result gets
    # re-executed, and the tmp dir may be gone OR half-deleted (killed mid
    # rmtree). The committed state IS this task's deterministic output;
    # rebuilding from a leftover shard SUBSET would silently lose rows
    # (round-5 review on the first shards-empty-only guard). Committed
    # partitions never legitimately re-enter this phase in the same run —
    # the stamp stage filters them before any work.
    mpath = os.path.join(pdir, MANIFEST_NAME)
    if os.path.exists(mpath):
        shutil.rmtree(tmp_dir, ignore_errors=True)  # finish the cleanup
        with open(mpath) as f:
            return json.load(f)
    shards = sorted(os.listdir(tmp_dir)) if os.path.isdir(tmp_dir) else []
    if not shards:
        raise FileNotFoundError(
            f"partition {part}: no tmp shards and no committed manifest "
            f"under {pdir} — phase-1 output missing")
    tables = []
    for s in shards:
        path = os.path.join(tmp_dir, s)
        if s.endswith(".parquet"):
            tables.append(pq.read_table(path))
        elif s.endswith(".arrow"):
            import pyarrow.ipc as ipc

            with ipc.open_file(path) as reader:
                tables.append(reader.read_all())
    group = pa.concat_tables(tables)
    group = dedup_and_sort(group)
    if "spans_bin" in group.column_names:
        group = unpack_wire_batch(group)
    shard = os.path.join(pdir, SHARD_NAME)
    tmp = shard + ".tmp"
    pq.write_table(group, tmp, compression="zstd")
    with open(tmp, "rb") as f:
        _maybe_fsync(f)
    os.replace(tmp, shard)
    manifest = {
        "schema_version": SCHEMA_VERSION,
        "part": part,
        "input": input_path,
        "n_rows": group.num_rows,
        "n_errors": int(
            pa.compute.sum(
                pa.compute.cast(pa.compute.is_valid(group.column("error")), pa.int32())
            ).as_py()
            or 0
        ),
        "bytes": _text_bytes(group),
        "text_sha256": _text_checksum(group),
    }
    mtmp = os.path.join(pdir, MANIFEST_NAME + ".tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        _maybe_fsync(f)
    os.replace(mtmp, os.path.join(pdir, MANIFEST_NAME))
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return manifest


def read_output(out_dir: str) -> pa.Table:
    """Read all committed partition shards back as one table (small-scale /
    test helper; production consumers read the parquet dir directly)."""
    tables = []
    for part in sorted(committed_parts(out_dir)):
        tables.append(pq.read_table(os.path.join(partition_dir(out_dir, part), SHARD_NAME)))
    if not tables:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return pa.concat_tables(tables)
