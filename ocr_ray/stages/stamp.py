"""Stamp stage: add ``part`` (output partition id) and ``branch`` columns.

Stateless, zero-copy-leaning: only a 512-byte prefix of each payload is
materialized for sniffing (``pyarrow.compute.binary_slice``), never the full
blob. Also applies the resume filter: rows whose partition already has a
committed manifest are dropped HERE, before any expensive work
(SURVEY.md §4.1 checkpoint/resume).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

from ..extract_core import DEFAULT_NUM_PARTS
from ..sources.payloads import (
    FAKEIMG_MAGIC,
    FAKETIFF_MAGIC,
    _JPEG_MAGIC,
    _PDF_MAGIC,
    _PNG_MAGIC,
    _TIFF_MAGICS,
    _ZIP_MAGIC,
)


def _branch_of_prefix(head: bytes) -> str:
    if not head:
        return "error"
    if (
        head.startswith(FAKEIMG_MAGIC)
        or head.startswith(_PNG_MAGIC)
        or head.startswith(_JPEG_MAGIC)
        or head.startswith(FAKETIFF_MAGIC)
        or head.startswith(_TIFF_MAGICS)
        or head.startswith(_ZIP_MAGIC)
        or head.startswith(_PDF_MAGIC)
    ):
        return "ocr"
    low = head.lstrip()[:256].lower()
    if (
        low.startswith(b"<!doctype")
        or low.startswith(b"<html")
        or b"<html" in low
        or b"<body" in low
        or low.startswith(b"<")
    ):
        return "html"
    return "error"


def make_stamp_fn(num_parts: int = DEFAULT_NUM_PARTS, done_parts: frozenset[int] = frozenset()):
    """Batch fn: pa.Table -> pa.Table with part/branch columns, committed
    partitions filtered out."""

    def stamp(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        parts = pa.array(
            [zlib.crc32(u.encode("utf-8")) % num_parts for u in urls], pa.int32()
        )
        heads = pc.binary_slice(batch.column("html"), 0, 512).to_pylist()
        branches = pa.array([_branch_of_prefix(h) for h in heads], pa.string())
        out = batch.append_column("part", parts).append_column("branch", branches)
        if done_parts:
            keep = pc.invert(pc.is_in(out.column("part"), value_set=pa.array(sorted(done_parts), pa.int32())))
            out = out.filter(keep)
        return out

    return stamp
