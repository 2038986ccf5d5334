"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf, compare against oracle_sql() via DuckDB (row count +
order-insensitive value equality), and rows-only-smoke the rest.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os

# Arrow's bundled jemalloc causes a TLB-shootdown storm under multi-process
# load on VMs (see ocr_ray.__init__._configure_arrow_memory_pool); setting
# the env var BEFORE ray.init makes every worker inherit the system pool.
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        rows = obj.take_all()
        if not rows:
            # keep the schema on empty results (take_all drops it) so the
            # column comparison stays meaningful at tiny SFs
            schema = obj.schema()
            names = schema.names if schema is not None else []
            return pd.DataFrame(columns=names)
        return pd.DataFrame(rows)
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if str(df[col].dtype).startswith("datetime"):
            df[col] = df[col].astype("datetime64[us]")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} sql={len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                import numpy as np

                if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                    bad = (av.astype(float) != bv.astype(float)) & ~(av.isna() & bv.isna())
                    i = bad.idxmax()
                    return f"VALUE MISMATCH col={col} row={i}: ray={av[i]!r} sql={bv[i]!r}"
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    bad = av.astype(str) != bv.astype(str)
                    i = bad.idxmax()
                    return f"VALUE MISMATCH col={col} row={i}: ray={av[i]!r} sql={bv[i]!r}"
        except Exception as exc:  # noqa: BLE001
            return f"COMPARE ERROR col={col}: {exc}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging as _logging

    _logging.getLogger("ray.data").setLevel(_logging.ERROR)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql(sf_dir)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} RAY ERROR {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name in oracles:
            try:
                sql_df = con.sql(oracles[name]).df()
            except Exception as exc:  # noqa: BLE001
                failures.append(name)
                print(f"{name:28s} SQL ERROR {type(exc).__name__}: {str(exc)[:120]}")
                continue
            verdict = compare(name, ray_df, sql_df)
        else:
            verdict = f"rows-only ({len(ray_df)} rows)"
        status = "OK" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{name:28s} {dt:6.1f}s  {verdict}")
    print()
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
