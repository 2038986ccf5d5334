"""Flagship extraction pipeline (SURVEY.md §3.1 new-engine equivalent).

    read_parquet ──► stamp (part/branch, resume filter; stateless, Arrow)
                 ──► ExtractWorker (actor pool, warm engine; both branches)
                 ──► groupby("part") ──► dedup + sort + shard + manifest

Exactly ONE all-to-all exchange (the output partitioning on
``crc32(url) % P``), which simultaneously implements the latest-wins
re-crawl dedup (D1) and resumable lineage — the shuffle moves *extracted*
rows (text + spans), not raw payloads. Everything upstream streams with
backpressure; nothing is materialized.

Page-level fan-out for giant documents is the separate, byte-equal variant
in :mod:`ocr_ray.pipelines.explode_variant`.
"""

from __future__ import annotations

import ray.data

from ..config import OcrConfig, resolve_config
from ..extract_core import DEFAULT_NUM_PARTS
from ..kernels.html_extract import DEFAULT_SETTINGS, ExtractSettings
from ..sinks.parquet_sink import committed_parts, dedup_and_sort, make_partition_writer
from ..stages.extract_stage import ExtractWorker
from ..stages.stamp import make_stamp_fn

# Payload rows are fat (multi-KB html/pdf blobs): keep extraction batches
# small enough that batch × actor heap stays bounded (SURVEY.md §7.4
# "very wide rows").
DEFAULT_BATCH_SIZE = 128


def default_concurrency() -> tuple[int, int]:
    """Actor-pool size with headroom: an extraction pool sized to ALL CPUs
    starves the read/write tasks of the same pipeline (observed: 8 actors on
    an 8-CPU node deadlocks the streaming executor for minutes). Leave ~2
    CPUs per node for the stateless stages."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (2, max(2, cpus - 2))


def read_pages(input_path: str | list[str]) -> ray.data.Dataset:
    """Columns are NOT pruned: the flagship needs url/ts/html/lang (4 of 5);
    narrower operators (ops/*) prune at their own read."""
    return ray.data.read_parquet(input_path)


def extract_dataset(
    ds: ray.data.Dataset,
    config: OcrConfig | None = None,
    settings: ExtractSettings = DEFAULT_SETTINGS,
    num_parts: int = DEFAULT_NUM_PARTS,
    done_parts: frozenset[int] = frozenset(),
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
) -> ray.data.Dataset:
    """pages Dataset → extraction Dataset (EXTRACT_SCHEMA), pre-dedup."""
    config = config or resolve_config()
    if concurrency is None:
        concurrency = default_concurrency()
    ds = ds.map_batches(
        make_stamp_fn(num_parts, done_parts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds.map_batches(
        ExtractWorker,
        fn_constructor_kwargs={"config": config, "settings": settings},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def finalize(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Latest-wins dedup + deterministic row order, grouped by output
    partition — the sink's semantics without writing files (used by
    correctness queries)."""
    return ds.groupby("part").map_groups(dedup_and_sort, batch_format="pyarrow")


def run_extract(
    input_path: str | list[str],
    out_dir: str,
    config: OcrConfig | None = None,
    settings: ExtractSettings = DEFAULT_SETTINGS,
    num_parts: int = DEFAULT_NUM_PARTS,
    resume: bool = True,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
):
    """Run end-to-end with the resumable manifest sink.

    Returns (manifests_table, stats_str). Only the tiny manifest dataset is
    materialized; data flows straight from read to per-partition shards.
    """
    done = committed_parts(out_dir) if resume else frozenset()
    ds = read_pages(input_path)
    ds = extract_dataset(
        ds,
        config=config,
        settings=settings,
        num_parts=num_parts,
        done_parts=done,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    writer = make_partition_writer(out_dir, input_path=str(input_path))
    manifests = ds.groupby("part").map_groups(writer, batch_format="pyarrow")
    result = manifests.materialize()
    return result, result.stats()
