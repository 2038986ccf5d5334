"""Sharded distributed hash-set index (raw Ray actors).

The incremental-ingest dedup question — "which of today's crawl records are
NOT already in the corpus we ingested yesterday?" — needs a membership
index that is (a) mutable while the seen-side streams through it and
(b) complete before the candidate side probes it. Neither property fits a
Dataset transform, so this is the documented raw-actor exception (driver
brief: "a shared mutable index"); everything around it stays map_batches.

Scale shape: membership is hash-partitioned over ``n_shards`` actors
(``shard_of``), so memory per actor is |distinct hashes| / shards and both
ingest and probe batch their actor calls per shard (one RPC per
batch × shard, never per row). On a real cluster shards spread across
nodes via Ray's default SPREAD scheduling; at 10^12-doc scale the per-shard
set would become a Bloom/quotient filter behind the same two-method
interface — the exactness here is what makes the op oracle-checkable.
"""

from __future__ import annotations

import ray


def shard_of(hex_hash: str, n_shards: int) -> int:
    """Stable shard id from the leading hex nibble(s) of the hash."""
    return int(hex_hash[:8], 16) % n_shards


@ray.remote(num_cpus=0.25)
class _HashShard:
    """One partition of the membership set. num_cpus=0.25 — the work is
    set operations; a full CPU per shard would starve the map stages that
    drive it (same law as the extraction pool sizing)."""

    def __init__(self) -> None:
        self._seen: set[str] = set()

    def add(self, hashes: list[str]) -> int:
        self._seen.update(hashes)
        return len(self._seen)

    def contains(self, hashes: list[str]) -> list[bool]:
        s = self._seen
        return [h in s for h in hashes]

    def size(self) -> int:
        return len(self._seen)


class HashIndexShards:
    """Handle bundle over the shard actors; picklable into map_batches
    closures (actor handles serialize; the sets stay in the actors)."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self._shards = [_HashShard.remote() for _ in range(n_shards)]

    def _group(self, hashes: list[str]) -> dict[int, list[int]]:
        groups: dict[int, list[int]] = {}
        for i, h in enumerate(hashes):
            groups.setdefault(shard_of(h, self.n_shards), []).append(i)
        return groups

    def add_batch(self, hashes: list[str]) -> None:
        """Synchronous batched ingest (ray.get = backpressure: an ingest
        task can't outrun the index)."""
        groups = self._group(hashes)
        ray.get(
            [self._shards[s].add.remote([hashes[i] for i in idx])
             for s, idx in groups.items()]
        )

    def contains_batch(self, hashes: list[str]) -> list[bool]:
        """Batched probe: one contains() RPC per touched shard."""
        groups = self._group(hashes)
        out = [False] * len(hashes)
        results = ray.get(
            [self._shards[s].contains.remote([hashes[i] for i in idx])
             for s, idx in groups.items()]
        )
        for (_, idx), flags in zip(groups.items(), results):
            for i, flag in zip(idx, flags):
                out[i] = flag
        return out

    def total_size(self) -> int:
        return sum(ray.get([sh.size.remote() for sh in self._shards]))
