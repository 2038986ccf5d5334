"""Microbench: one-pass aggregate distinct vs the round-1
``groupby().map_groups(slice(0,1))`` pattern on a ~10^6-group synthetic.

Records the cost of the per-group-Python anti-pattern the round-1 verdict
flagged (What's wrong #3) next to the aggregate replacement now used by
``ocr_ray.ops.common.distinct``. Results land in BASELINE.md.

Usage: python scripts/bench_distinct.py [n_rows] [n_groups]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    rng = np.random.RandomState(5)
    ka = rng.randint(0, n_groups, size=n_rows).astype(np.int64)
    kb = rng.randint(0, 7, size=n_rows).astype(np.int64)
    table = pa.table({"ka": pa.array(ka), "kb": pa.array(kb)})
    ds = ray.data.from_arrow(table).repartition(64).materialize()

    from ocr_ray.ops.common import distinct

    t0 = time.time()
    n_agg = distinct(ds, ["ka", "kb"]).count()
    t_agg = time.time() - t0

    t0 = time.time()
    n_mg = ds.groupby(["ka", "kb"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    ).count()
    t_mg = time.time() - t0

    assert n_agg == n_mg, (n_agg, n_mg)
    print(f"rows={n_rows} groups~{n_agg}")
    print(f"distinct via aggregate:          {t_agg:7.2f} s")
    print(f"distinct via map_groups(slice):  {t_mg:7.2f} s   ({t_mg / t_agg:.1f}x slower)")
    ray.shutdown()


if __name__ == "__main__":
    main()
