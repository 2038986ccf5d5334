"""Shared mutable state held in raw Ray actors — the one place the Dataset
API genuinely can't express the semantics (a cross-dataset membership index
that must be fully built before any probe reads it)."""

from .hash_index import HashIndexShards, shard_of

__all__ = ["HashIndexShards", "shard_of"]
