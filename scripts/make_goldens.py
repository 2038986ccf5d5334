"""Regenerate the pinned golden-snapshot oracles (tests/golden/oracle/).

These pin queries whose deterministic procedural output has no SQL form
(SequenceMatcher ratios, XML/PDF rendering, clustering) — see
ocr_ray.ops.oracles.GOLDEN_QUERIES. Run after any intentional behaviour
change; the driver's correctness gate then compares the live Ray result
against the snapshot (rows + schema + value hash).

Usage: python scripts/make_goldens.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from ocr_ray.ops.oracles import GOLDEN_DIR, GOLDEN_QUERIES

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    qs = entrymod.queries()
    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        res = qs[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            table = pa.Table.from_pylist(res.take_all(), schema=res.schema().base_schema)
        elif isinstance(res, pa.Table):
            table = res
        else:
            table = pa.Table.from_pandas(res, preserve_index=False)
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="zstd")
        print(f"{name:24s} {table.num_rows:8d} rows  {os.path.getsize(path) / 1e6:6.2f} MB")
    ray.shutdown()


if __name__ == "__main__":
    main()
