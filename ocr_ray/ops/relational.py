"""Relational operator demonstrations over the TPC-H-ish test tables.

These exercise the engine's wide-op building blocks in their scale-correct
form — partial-aggregate combiners before every groupby, broadcast-hash
joins for small dimensions, deterministic sort/limit tiebreaks — and each has
a DuckDB oracle in ``__ray_entry__.oracle_sql`` (column names match exactly;
aggregates rounded identically on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .common import broadcast_lookup, distinct, from_pandas_clean, grouped_agg, read_table

SHIPDATE_CUTOFF = "1998-09-02"
ORDERDATE_LO = "1996-01-01"
ORDERDATE_HI = "1997-01-01"


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered grouped aggregate with derived averages.
    Demonstrates A1/A2-style partial aggregation (SURVEY.md §2.5)."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pd.Timestamp(SHIPDATE_CUTOFF)

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"), pa.scalar(cutoff))
        )
        # exact integer quantization: TPC-H money is cents-exact and the
        # discount is a basis-point fraction, so every aggregate is an
        # int64 sum — float Σ order (pandas pairwise vs Arrow vs DuckDB
        # sequential) can flip the rounded cent otherwise. Bounds: qty_c ≤
        # 5e3, price_c ≤ 1e7, disc_e4 ≤ 1e9 per row ⟹ exact past 10^9
        # rows per group.
        qty_c = pc.cast(pc.round(pc.multiply(
            batch.column("l_quantity"), pa.scalar(100.0)),
            round_mode="half_to_even"), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), pa.scalar(100.0)),
            round_mode="half_to_even"), pa.int64())
        disc_b = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), pa.scalar(100.0)),
            round_mode="half_to_even"), pa.int64())
        disc_e4 = pc.multiply(price_c, pc.subtract(pa.scalar(100), disc_b))
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_c": qty_c, "price_c": price_c, "disc_e4": disc_e4,
        })

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        # ONE int→double division per figure, then half-even rounding —
        # the identical expression chain the SQL oracle runs
        df["avg_qty"] = (df["qty_c"] / 100.0 / df["count_order"]).round(4)
        df["avg_price"] = (df["price_c"] / 100.0 / df["count_order"]).round(4)
        df["sum_qty"] = (df["qty_c"] / 100.0).round(2)
        df["sum_base_price"] = (df["price_c"] / 100.0).round(2)
        df["sum_disc_price"] = (df["disc_e4"] / 10000.0).round(2)
        df = df.drop(columns=["qty_c", "price_c", "disc_e4"])
        return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)

    return grouped_agg(
        ds,
        keys=["l_returnflag", "l_linestatus"],
        specs=[
            ("qty_c", "sum", "qty_c"),
            ("price_c", "sum", "price_c"),
            ("disc_e4", "sum", "disc_e4"),
            ("count_order", "count", None),
        ],
        finalize=fin,
    )


def top_customers(sf_dir: str, k: int = 10):
    """orders ⋈ customer revenue top-k. The customer dimension is broadcast
    (ray.put once, read per task) — a broadcast-hash join, no shuffle of the
    fact table (SURVEY.md J1 pattern). Deterministic tiebreak on c_custkey."""
    customer = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust_ref = broadcast_lookup(_collect(customer), "c_custkey")
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def join_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("o_custkey", as_index=False)["o_totalprice"].sum()
        return from_pandas_clean(out.rename(columns={"o_totalprice": "revenue"}))

    ds = orders.map_batches(join_partial, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(cust_ref)
        df = df.sort_values(["revenue", "o_custkey"], ascending=[False, True]).head(k)
        df["c_name"] = [lookup[c]["c_name"] for c in df["o_custkey"]]
        df["revenue"] = df["revenue"].round(2)
        return df.rename(columns={"o_custkey": "c_custkey"})[
            ["c_custkey", "c_name", "revenue"]
        ].reset_index(drop=True)

    return grouped_agg(
        ds, keys=["o_custkey"], specs=[("revenue", "sum", "revenue")], finalize=fin
    )


def _collect(ds) -> pa.Table:
    """Materialize a SMALL dimension dataset to one Arrow table."""
    return pa.Table.from_pylist(ds.take_all())


def order_priority_counts(sf_dir: str):
    """Date-range filter + grouped count (TPC-H Q4 shape). The filter is
    pushed into the scan via a parquet row filter."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(ORDERDATE_LO), pd.Timestamp(ORDERDATE_HI)
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("o_orderpriority").reset_index(drop=True)

    return grouped_agg(
        ds, keys=["o_orderpriority"], specs=[("order_count", "count", None)], finalize=fin
    )


def supplier_stats_by_region(sf_dir: str):
    """supplier ⋈ nation ⋈ region via two broadcast dimensions, then a
    grouped aggregate — the canonical small-dims/star-join done without any
    shuffle of the fact side."""
    nation = _collect(read_table(sf_dir, "nation"))
    region = _collect(read_table(sf_dir, "region"))
    n2r = {
        n["n_nationkey"]: n["n_regionkey"] for n in nation.to_pylist()
    }
    r2name = {r["r_regionkey"]: r["r_name"] for r in region.to_pylist()}
    dims_ref = ray.put((n2r, r2name))

    supplier = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def attach_region(batch: pa.Table) -> pa.Table:
        n2r_l, r2name_l = ray.get(dims_ref)
        df = batch.to_pandas()
        df["r_name"] = [r2name_l[n2r_l[n]] for n in df["s_nationkey"]]
        return from_pandas_clean(df[["r_name", "s_acctbal"]])

    ds = supplier.map_batches(attach_region, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_acctbal"] = (df["sum_acctbal"] / df["n_suppliers"]).round(4)
        df["sum_acctbal"] = df["sum_acctbal"].round(2)
        return df.sort_values("r_name").reset_index(drop=True)

    return grouped_agg(
        ds,
        keys=["r_name"],
        specs=[("n_suppliers", "count", None), ("sum_acctbal", "sum", "s_acctbal")],
        finalize=fin,
    )


def events_by_type(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(2)
        df["max_value"] = df["max_value"].round(6)
        return df.sort_values("event_type").reset_index(drop=True)

    return grouped_agg(
        ds,
        keys=["event_type"],
        specs=[
            ("n_events", "count", None),
            ("sum_value", "sum", "value"),
            ("max_value", "max", "value"),
        ],
        finalize=fin,
    )


def daily_active_users(sf_dir: str):
    """count(DISTINCT user_id) per day, decomposed shuffle-efficiently:
    per-batch (day, user) dedup partial → global distinct → grouped count."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def day_user(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # day as a string key: avoids date-vs-timestamp type skew between
        # engines when the result is compared
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        out = df[["day", "user_id"]].drop_duplicates()
        return from_pandas_clean(out)

    ds = ds.map_batches(day_user, batch_format="pyarrow", zero_copy_batch=True)
    # global distinct on the (already partially-deduped) pairs — one-pass agg
    ds = distinct(ds, ["day", "user_id"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("day").reset_index(drop=True)

    return grouped_agg(ds, keys=["day"], specs=[("active_users", "count", None)], finalize=fin)


def part_brand_stats(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_retailprice"] = (df["sum_retailprice"] / df["n_parts"]).round(4)
        df = df.drop(columns=["sum_retailprice"])
        return df.sort_values("p_brand").reset_index(drop=True)

    return grouped_agg(
        ds,
        keys=["p_brand"],
        specs=[
            ("n_parts", "count", None),
            ("sum_retailprice", "sum", "p_retailprice"),
            ("max_size", "max", "p_size"),
        ],
        finalize=fin,
    )


def events_hourly(sf_dir: str):
    """Hour-of-day histogram: timestamp scalar function + grouped count."""
    ds = read_table(sf_dir, "events", columns=["ts"])

    def hour(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"hour": pc.strftime(batch.column("ts"), format="%H")})

    ds = ds.map_batches(hour, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("hour").reset_index(drop=True)

    return grouped_agg(ds, keys=["hour"], specs=[("n_events", "count", None)], finalize=fin)


def events_props_sum(sf_dir: str):
    """JSON property extraction (the props column carries '{"k": int}') +
    grouped sum — per-batch parse, combiner aggregation."""
    import json

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def parse(batch: pa.Table) -> pa.Table:
        ks = [json.loads(p)["k"] for p in batch.column("props").to_pylist()]
        return pa.table(
            {"event_type": batch.column("event_type"),
             "k": pa.array(ks, pa.int64())}
        )

    ds = ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("event_type").reset_index(drop=True)

    return grouped_agg(
        ds, keys=["event_type"],
        specs=[("sum_k", "sum", "k"), ("n_events", "count", None)],
        finalize=fin,
    )


def source_stats(sf_dir: str):
    """Per-source rollup with a DISTINCT sub-aggregate (n_langs): per-batch
    (source, lang) dedup partial → global distinct → grouped counts joined
    with plain per-source aggregates (A6-style distinct, SURVEY.md §2.5)."""
    ds = read_table(sf_dir, "documents", columns=["source", "lang", "n_chars"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_chars"] = (df["sum_chars"] / df["n_docs"]).round(4)
        df = df.drop(columns=["sum_chars"])
        return df.sort_values("source").reset_index(drop=True)

    base = grouped_agg(
        ds,
        keys=["source"],
        specs=[("n_docs", "count", None), ("sum_chars", "sum", "n_chars")],
        finalize=fin,
    )

    pairs = ds.map_batches(
        lambda b: from_pandas_clean(
            b.to_pandas()[["source", "lang"]].drop_duplicates()
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = distinct(pairs, ["source", "lang"])
    langs = grouped_agg(pairs, keys=["source"], specs=[("n_langs", "count", None)])

    # both sides are tiny aggregates: join on the driver
    bdf = pd.DataFrame(base.take_all())
    ldf = pd.DataFrame(langs.take_all())
    out = bdf.merge(ldf, on="source").sort_values("source").reset_index(drop=True)
    return from_pandas_clean(out)


def longest_docs_per_lang(sf_dir: str, k: int = 2):
    """Windowed top-k per group (row_number() shape): longest k docs per
    lang, deterministic tiebreak on doc_id.

    Scale shape: a per-batch COMBINER keeps only the k best rows per group
    before the exchange — top-k is re-aggregable (the global top-k is a
    subset of the union of per-block top-ks), so the groupby ships
    ≤ k·|langs| rows per block instead of every row of every group (the
    naive map_groups form moves the full table through the exchange)."""
    ds = read_table(sf_dir, "documents", columns=["lang", "doc_id", "n_chars"])

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        return from_pandas_clean(df.groupby("lang", sort=False).head(k))

    pruned = ds.map_batches(block_topk, batch_format="pyarrow", zero_copy_batch=True)

    def topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).head(k)
        df["rank"] = range(1, len(df) + 1)
        return from_pandas_clean(df)

    out = pruned.groupby("lang").map_groups(topk, batch_format="pyarrow")
    return out.sort(["lang", "rank"])


SESSION_GAP_MIN = 30


SESSION_PARTS = 64


def user_sessions(sf_dir: str):
    """Gap-based sessionization (no counterpart in the reference —
    SURVEY.md §2.11 has no windows; this is the training-data engine's
    stateful-window representative): events per user sorted by ts; a gap
    > 30 min starts a new session.

    Partitioning assumption (same salted-key rule as asof_last_purchase
    below): all events of a user co-locate via ``user_id % SESSION_PARTS``,
    so the Python-call count is bounded by SESSION_PARTS, not the user
    count — a per-user map_groups pays a Python call per user and dies at
    10^6 users. Inside each part the whole computation is one vectorized
    pass: sort by (user, ts), diff ts, a gap counts as a session break only
    when the previous row is the SAME user (groupby-free segment logic)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("upart", pa.array(uid % SESSION_PARTS, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def sessions_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["user_id", "ts"], kind="mergesort")
        if not len(df):
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("user_id", pa.int64()), pa.field("n_events", pa.int64()),
                 pa.field("n_sessions", pa.int64())]))
        uid = df["user_id"].to_numpy()
        same_user = np.empty(len(df), dtype=bool)
        same_user[0] = False
        same_user[1:] = uid[1:] == uid[:-1]
        gap = df["ts"].diff().dt.total_seconds().to_numpy() > SESSION_GAP_MIN * 60
        # one session per user start, plus one per over-gap step within a user
        breaks = same_user & gap
        out = pd.DataFrame({"user_id": uid, "is_start": ~same_user,
                            "is_break": breaks})
        agg = out.groupby("user_id", as_index=False).agg(
            n_events=("user_id", "size"),
            n_sessions=("is_break", "sum"))
        agg["n_sessions"] = (agg["n_sessions"] + 1).astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return from_pandas_clean(agg)

    return (
        ds.groupby("upart")
        .map_groups(sessions_part, batch_format="pyarrow")
        .sort("user_id")
    )


ASOF_ANCHOR_TYPE = "purchase"
ASOF_PARTS = 64


def asof_last_purchase(sf_dir: str):
    """As-of join (an operator Ray Data lacks natively): attach to every
    event the user's most recent purchase at-or-before its timestamp.

    Partitioning assumption (documented per the driver brief): all events of
    a user must co-locate — done by grouping on ``user_id % ASOF_PARTS``, a
    SALTED key, so the Python-call count is bounded by ASOF_PARTS (not by
    the user count: a per-user map_groups pays a Python call per user and
    dies at 10^6 users). Inside each part the whole as-of match is ONE
    vectorized ``pd.merge_asof(by="user_id")``. Equal-timestamp anchor ties
    collapse to MAX(value) first so both sides are deterministic. Oracle:
    DuckDB native ASOF LEFT JOIN."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["upart"] = (df["user_id"] % ASOF_PARTS).astype("int64")
        return from_pandas_clean(df)

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def asof_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        left = df.sort_values("ts", kind="mergesort")
        anchors = (
            df[df["event_type"] == ASOF_ANCHOR_TYPE]
            .groupby(["user_id", "ts"], as_index=False)["value"].max()
            .rename(columns={"ts": "last_purchase_ts",
                             "value": "last_purchase_value"})
            .sort_values("last_purchase_ts", kind="mergesort")
        )
        merged = pd.merge_asof(
            left, anchors,
            left_on="ts", right_on="last_purchase_ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        return from_pandas_clean(
            merged[["user_id", "ts", "event_type", "value",
                    "last_purchase_ts", "last_purchase_value"]]
        )

    return ds.groupby("upart").map_groups(asof_part, batch_format="pyarrow")


def events_sliding_1h(sf_dir: str):
    """Sliding-window aggregate (1-hour window, 10-minute slide) per event
    type. Scale shape: each event expands to the 6 windows it belongs to
    INSIDE map_batches (bounded 6× row fan-out, no window state), then the
    standard partial-aggregate combiner collapses each (type, window) to one
    row per block before the small exchange — a windowed aggregate with no
    sort and no per-key Python. Oracle: the same expansion in SQL via
    range(6) cross join + time_bucket."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def expand(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        bucket = df["ts"].dt.floor("10min")
        frames = [
            pd.DataFrame(
                {"event_type": df["event_type"],
                 "window_start": bucket - pd.Timedelta(minutes=10 * k),
                 "value": df["value"]}
            )
            for k in range(6)
        ]
        return from_pandas_clean(pd.concat(frames, ignore_index=True))

    exp = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(2)
        return df.sort_values(["event_type", "window_start"]).reset_index(drop=True)

    return grouped_agg(
        exp, keys=["event_type", "window_start"],
        specs=[("n_events", "count", None), ("sum_value", "sum", "value")],
        finalize=fin,
    )


# Banded range join half-width: pairs of same-user events within ±5 minutes.
RANGE_JOIN_WINDOW_US = 300_000_000


def events_range_join(sf_dir: str):
    """Range (interval) join — the third custom-join the brief names next
    to as-of and windowed aggregation, and one Ray Data lacks natively:
    all pairs of same-user events within ±5 minutes of each other.

    Scale shape — the canonical banded equi-join reduction: time is
    bucketed at the band width, the probe side expands to its bucket ±1
    (bounded 3× fan-out, no sort, no window state), the join is a plain
    hash join on (user_id, bucket), and the exact |Δt| ≤ W predicate plus
    the event_a < event_b orientation filter run vectorized post-join.
    Every qualifying pair matches exactly once (|Δt| ≤ W ⇒ bucket distance
    ≤ 1, and only the lower-id side survives as probe). Partitioning
    assumption: a (user, bucket) cell's rows co-locate — cell size is
    bounded by per-user event density in one band, the documented skew
    knob. Output: (user_id, event_a, event_b, dt_us); dt_us is exact
    integer microseconds, so no float crosses the oracle compare."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def build_rows(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.int64())
        bucket = pc.divide(ts_us, RANGE_JOIN_WINDOW_US)
        return pa.table(
            {"user_id": batch.column("user_id"), "bucket": bucket,
             "event_b": batch.column("event_id"), "ts_b": ts_us}
        )

    def probe_rows(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.int64())
        bucket = pc.divide(ts_us, RANGE_JOIN_WINDOW_US)
        parts = [
            pa.table(
                {"user_id": batch.column("user_id"),
                 "jb": pc.add(bucket, k),
                 "event_a": batch.column("event_id"), "ts_a": ts_us}
            )
            for k in (-1, 0, 1)
        ]
        return pa.concat_tables(parts)

    build = ds.map_batches(build_rows, batch_format="pyarrow", zero_copy_batch=True)
    probe = ds.map_batches(probe_rows, batch_format="pyarrow", zero_copy_batch=True)

    from .common import choose_join_parts

    joined = probe.join(
        build, join_type="inner",
        num_partitions=choose_join_parts(sf_dir, "events", floor=8),
        on=("user_id", "jb"), right_on=("user_id", "bucket"),
    )

    def shape(batch: pa.Table) -> pa.Table:
        dt = pc.subtract(batch.column("ts_b"), batch.column("ts_a"))
        keep = pc.and_(
            pc.less(batch.column("event_a"), batch.column("event_b")),
            pc.less_equal(pc.abs(dt), RANGE_JOIN_WINDOW_US),
        )
        out = batch.append_column("dt_us", dt).filter(keep)
        return out.select(["user_id", "event_a", "event_b", "dt_us"])

    return joined.map_batches(shape, batch_format="pyarrow")


def expensive_items(sf_dir: str, k: int = 20):
    """filter → sort → limit with deterministic tiebreaks (the reference has
    no top-k — SURVEY.md §2.6 — this is the idiomatic Ray Data form)."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )
    ds = ds.filter(expr="l_discount < 0.02")
    ds = ds.sort(
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        descending=[True, False, False],
    ).limit(k)

    def fin(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["l_extendedprice"] = df["l_extendedprice"].round(2)
        df["l_discount"] = df["l_discount"].round(4)
        return from_pandas_clean(df)

    return ds.map_batches(fin, batch_format="pyarrow")


# HyperLogLog (Flajolet et al. 2007) — the canonical mergeable
# distinct-count sketch: what a 100-TB pipeline uses where
# count(DISTINCT ...) would shuffle every id. m = 64 registers (6-bit
# bucket from the top of the md5 hash, rho = leading-zero rank of the
# remaining 58 bits). Registers merge by MAX — per-batch partials collapse
# to <= m rows per (day, batch) before the (tiny) exchange.
HLL_BUCKET_BITS = 6
HLL_M = 1 << HLL_BUCKET_BITS
HLL_W_BITS = 58
# alpha_m for m = 64 (the published constant-series value)
HLL_ALPHA = 0.709


def hll_daily_users(sf_dir: str):
    """Approximate distinct users per day via HyperLogLog — the sketch twin
    of :func:`daily_active_users` (exact). Shuffle shape: per-batch
    register partials (<= m rows per day per batch) → ONE grouped max →
    driver-side estimate over m-row groups. The estimate arithmetic is
    integer-scaled (sum of 2^(59-rho) as exact ints) so the single float
    division matches the SQL twin bit-for-bit; the small-range correction's
    ln() is absorbed by round 4.

    Output: (day, hll_users, v_zero) — v_zero = empty registers (drives
    the small-range correction, kept for observability)."""
    import hashlib
    import math

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    mask_w = (1 << HLL_W_BITS) - 1

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        days = df["ts"].dt.strftime("%Y-%m-%d")
        regs: dict[tuple[str, int], int] = {}
        memo: dict[int, tuple[int, int]] = {}
        for day, uid in zip(days, df["user_id"]):
            uid = int(uid)
            br = memo.get(uid)
            if br is None:
                h = int.from_bytes(
                    hashlib.md5(str(uid).encode()).digest()[:8], "big")
                bucket = h >> HLL_W_BITS
                w = h & mask_w
                rho = HLL_W_BITS - w.bit_length() + 1
                br = memo[uid] = (bucket, rho)
            key = (day, br[0])
            if regs.get(key, 0) < br[1]:
                regs[key] = br[1]
        ks = list(regs.keys())
        return pa.table(
            {"day": pa.array([k[0] for k in ks], pa.string()),
             "bucket": pa.array([k[1] for k in ks], pa.int32()),
             "rho": pa.array([regs[k] for k in ks], pa.int32())}
        )

    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = grouped_agg(ds, keys=["day", "bucket"], specs=[("rho", "max", "rho")])

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for day, grp in df.groupby("day"):
            n_present = len(grp)
            s_scaled = int(
                sum(1 << (HLL_W_BITS + 1 - int(r)) for r in grp["rho"])
            ) + (HLL_M - n_present) * (1 << (HLL_W_BITS + 1))
            v_zero = HLL_M - n_present
            e = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W_BITS + 1)) / s_scaled
            if e <= 2.5 * HLL_M and v_zero > 0:
                e = HLL_M * math.log(HLL_M / v_zero)
            out.append({"day": day, "hll_users": round(e, 4),
                        "v_zero": v_zero})
        return pd.DataFrame(out).sort_values("day").reset_index(drop=True)

    # the merged register table is O(days x m) — a finalize-sized frame
    def fin(batch: pa.Table) -> pa.Table:
        return from_pandas_clean(estimate(batch.to_pandas()))

    return merged.repartition(1).map_batches(fin, batch_format="pyarrow")


def user_retention(sf_dir: str):
    """Day-over-day retained users, computed WITHOUT a self-join: each
    distinct (day, user) pair is re-keyed twice — once at its own day
    ("active here") and once at the previous day ("active tomorrow") — and
    one grouped max per (day, user) plus one grouped count per day recover
    |A_d| and |A_d ∩ A_{d+1}|. Both exchanges move at most 2 rows per
    distinct (day, user), never a row per event, and no side is ever
    broadcast or joined — the shape a 10^9-user log needs.

    Output: (day, active_users, retained_next_day, retention_rate); the
    final day's retention is 0 by construction (no next day observed)."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def rekey(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day = df["ts"].dt.normalize()
        pairs = pd.DataFrame(
            {"day": day, "user_id": df["user_id"]}).drop_duplicates()
        cur = pd.DataFrame({"day": pairs["day"], "user_id": pairs["user_id"],
                            "cur": 1, "nxt": 0})
        prv = pd.DataFrame({"day": pairs["day"] - pd.Timedelta(days=1),
                            "user_id": pairs["user_id"], "cur": 0, "nxt": 1})
        out = pd.concat([cur, prv], ignore_index=True)
        out["day"] = out["day"].dt.strftime("%Y-%m-%d")
        return from_pandas_clean(out)

    ds = ds.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True)
    # per (day,user): was the user active this day / the next day?
    per_user = grouped_agg(
        ds, keys=["day", "user_id"],
        specs=[("cur", "max", "cur"), ("nxt", "max", "nxt")],
    )

    def to_day(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["cur"] > 0]
        out = pd.DataFrame({"day": df["day"], "active": 1, "retained": df["nxt"]})
        return from_pandas_clean(out)

    per_day = per_user.map_batches(to_day, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["retention_rate"] = (df["retained_next_day"] / df["active_users"]).round(4)
        return df.sort_values("day").reset_index(drop=True)

    return grouped_agg(
        per_day, keys=["day"],
        specs=[("active_users", "sum", "active"),
               ("retained_next_day", "sum", "retained")],
        finalize=fin,
    )


FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_PARTS = 64


def funnel_counts(sf_dir: str):
    """Ordered conversion funnel view → click → purchase: a user reaches
    stage k+1 only with an event strictly AFTER their stage-k time (min
    view time, then min click after it, then min purchase after that).

    The sequential dependency makes the per-user state non-mergeable, so
    events co-partition by ``user_id % FUNNEL_PARTS`` (same salted-key rule
    as user_sessions: Python-call count bounded by FUNNEL_PARTS, not the
    user count) and each partition resolves its users with three vectorized
    pandas merges — no per-user Python loop. Partitions emit per-stage
    partial counts; one tiny grouped sum finishes."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("upart", pa.array(uid % FUNNEL_PARTS, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def funnel_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        reached = pd.DataFrame({"user_id": df["user_id"].unique()})
        reached["t"] = pd.Timestamp.min  # stage-0 anchor: any event qualifies
        counts = []
        for stage in FUNNEL_STAGES:
            ev = df[df["event_type"] == stage][["user_id", "ts"]]
            m = ev.merge(reached, on="user_id", how="inner")
            m = m[m["ts"] > m["t"]]
            reached = (m.groupby("user_id", as_index=False)["ts"].min()
                       .rename(columns={"ts": "t"}))
            counts.append(len(reached))
        return pa.table(
            {"stage_no": pa.array(range(1, len(FUNNEL_STAGES) + 1), pa.int64()),
             "stage": pa.array(list(FUNNEL_STAGES), pa.string()),
             "users": pa.array(counts, pa.int64())}
        )

    grouped = ds.groupby("upart").map_groups(funnel_part, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("stage_no").reset_index(drop=True)

    return grouped_agg(grouped, keys=["stage_no", "stage"],
                       specs=[("users", "sum", "users")], finalize=fin)


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-07-01"


def shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H Q3 shape (customer ⋈ orders ⋈ lineitem, top-k unshipped-order
    revenue): the one multi-way join the relational suite lacked.

    Scale shape — every classic join optimization in one plan:
    - the customer dimension filters to one segment and broadcasts as a
      key SET via ray.put (broadcast semi-join; the fact scan never
      shuffles for the small side);
    - both fact scans push their date predicate into the parquet read
      (row-group pruning, no post-hoc filter stage);
    - lineitem revenue partial-aggregates by l_orderkey BEFORE the join
      (combiner), so the single all-to-all carries one row per qualifying
      order on each side — never a lineitem row;
    - revenue accumulates in EXACT integer 1e-4 currency units
      (cents x (100 - discount_pct)), so no float summation order can
      flip a rounded cent against the oracle.
    Output: (o_orderkey, o_orderdate, o_orderpriority, revenue) top-k by
    (revenue desc, o_orderkey)."""
    import pyarrow.dataset as pads

    from .common import choose_join_parts

    cutoff = pd.Timestamp(Q3_DATE)

    seg_keys = frozenset(
        r["c_custkey"]
        for r in read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .take_all()
        if r["c_mktsegment"] == Q3_SEGMENT
    )
    seg_ref = ray.put(seg_keys)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < pads.scalar(cutoff),
    )

    def semi(batch: pa.Table) -> pa.Table:
        keys = ray.get(seg_ref)
        mask = pa.array(
            [c in keys for c in batch.column("o_custkey").to_pylist()], pa.bool_()
        )
        # metadata-stripped: the embedded pandas schema dict defeats the
        # shuffle's schema-dedup cache (see common.from_pandas_clean)
        return batch.filter(mask).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).replace_schema_metadata(None)

    orders = orders.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > pads.scalar(cutoff),
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        # exact integer 1e-4 units: round(price*100) x (100 - round(disc*100))
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64())
        dpct = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))
        t = pa.table({"l_orderkey": batch.column("l_orderkey"), "rev4": rev})
        df = t.to_pandas().groupby("l_orderkey", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    revenue = grouped_agg(
        lineitem.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey"],
        specs=[("rev4", "sum", "rev4")],
    )

    joined = revenue.join(
        orders,
        join_type="inner",
        num_partitions=choose_join_parts(sf_dir, "orders", floor=4),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": batch.column("l_orderkey"),
             "o_orderdate": batch.column("o_orderdate"),
             "o_orderpriority": batch.column("o_orderpriority"),
             # no rounding: the same exact int64 / 10000.0 is the same
             # double on both sides (a rounded value could flip half-even
             # vs half-away at .xx5 against the SQL oracle)
             "revenue": pc.divide(
                 pc.cast(batch.column("rev4"), pa.float64()), 10000.0)}
        )

    return (
        joined.map_batches(shape, batch_format="pyarrow")
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


ROLLING_WINDOW_DAYS = 7


def rolling_active_users(sf_dir: str):
    """Rolling 7-day distinct active users per day, WITHOUT a window
    function or self-join: every distinct (day, user) pair re-keys to the
    ROLLING_WINDOW_DAYS window-end days it contributes to (bounded 7x
    fan-out of the already-distinct pair stream), one grouped max per
    (window_day, user) dedups a user seen on several days of the same
    window, one grouped count per day finishes. Exchanges move at most
    7 rows per distinct (day, user) — never a row per event. Days with no
    events of their own only exist as window tails, so a base-day flag
    rides the same exchanges and filters them out at the end (mirrored in
    the SQL twin)."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def rekey(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        pairs = pd.DataFrame(
            {"day": df["ts"].dt.normalize(), "user_id": df["user_id"]}
        ).drop_duplicates()
        parts = []
        for k in range(ROLLING_WINDOW_DAYS):
            parts.append(pd.DataFrame(
                {"day": pairs["day"] + pd.Timedelta(days=k),
                 "user_id": pairs["user_id"],
                 "base": 1 if k == 0 else 0}))
        out = pd.concat(parts, ignore_index=True)
        out["day"] = out["day"].dt.strftime("%Y-%m-%d")
        return from_pandas_clean(out)

    per_user = grouped_agg(
        ds.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True),
        keys=["day", "user_id"],
        specs=[("base", "max", "base")],
    )

    def to_day(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return from_pandas_clean(
            pd.DataFrame({"day": df["day"], "u": 1, "base": df["base"]}))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["day_observed"] > 0].drop(columns=["day_observed"])
        return df.sort_values("day").reset_index(drop=True)

    return grouped_agg(
        per_user.map_batches(to_day, batch_format="pyarrow"),
        keys=["day"],
        specs=[("users_7d", "sum", "u"), ("day_observed", "max", "base")],
        finalize=fin,
    )


LAPSED_LO = "1997-01-01"
LAPSED_HI = "1998-01-01"


def lapsed_customers(sf_dir: str):
    """Customers with NO orders inside a date window (churn cohort), rolled
    up per nation — the native ANTI-JOIN idiom the rest of the suite lacks
    (semi-joins broadcast; this one exercises ``Dataset.join('left_anti')``,
    the right tool when BOTH sides are fact-sized and the probe side can't
    be broadcast at 100 TB).

    Scale shape: the window predicate is pushed into the orders scan
    (column-pruned to one key + one date), the probe side is
    distinct-reduced BEFORE the join (per-batch combiner → one exchange of
    distinct custkeys, ~|customers| rows max, never |orders|), the anti
    join co-partitions on the key with input-scaled partitions, and the
    nation dimension rides in as a broadcast lookup after the join."""
    from .common import choose_join_parts

    lo, hi = pd.Timestamp(LAPSED_LO), pd.Timestamp(LAPSED_HI)
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def window_keys(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch.column("o_orderdate"), pa.scalar(lo)),
            pc.less(batch.column("o_orderdate"), pa.scalar(hi)),
        )
        keys = batch.filter(m).column("o_custkey").unique()
        return pa.table({"o_custkey": keys})

    active = distinct(
        orders.map_batches(window_keys, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
    )

    customer = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    lapsed = customer.join(
        active, "left_anti",
        num_partitions=choose_join_parts(sf_dir, "customer", "orders"),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    nation = _collect(read_table(sf_dir, "nation"))
    n2name = {n["n_nationkey"]: n["n_name"] for n in nation.to_pylist()}
    dims_ref = ray.put(n2name)

    def attach_nation(batch: pa.Table) -> pa.Table:
        lookup = ray.get(dims_ref)
        df = batch.to_pandas()
        df["n_name"] = [lookup[k] for k in df["c_nationkey"]]
        return from_pandas_clean(df[["n_name", "c_acctbal"]])

    ds = lapsed.map_batches(attach_nation, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_acctbal"] = df["sum_acctbal"].round(2)
        return df.sort_values("n_name").reset_index(drop=True)

    return grouped_agg(
        ds,
        keys=["n_name"],
        specs=[("n_lapsed", "count", None), ("sum_acctbal", "sum", "c_acctbal")],
        finalize=fin,
    )


EVENT_PCTL_QS = (0.5, 0.95, 0.99)
EVENT_PCTL_SCALE = 100  # cent resolution: floor(value * 100) buckets


def event_value_percentiles(sf_dir: str):
    """Exact p50/p95/p99 of a CONTINUOUS metric per event_type, scale-safe:
    values are floor-quantized to cent buckets (floor is boundary-unambiguous
    across engines, unlike round), per-batch bucket histograms combine before
    ONE small grouped sum, and the cumulative scan runs over the tiny
    histogram. The bucket count is bounded by the value RANGE (≤ ~49k here)
    — not the row count — so the driver-side scan stays O(range) at any
    corpus size; a raw-double histogram would degenerate to one row per
    event. Rule: p(q) = smallest bucket with cum ≥ ceil(q·n), reported at
    bucket resolution (v/100)."""
    import math

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def hist(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v"] = np.floor(df["value"].to_numpy() * EVENT_PCTL_SCALE).astype("int64")
        out = df.groupby(["event_type", "v"], as_index=False).size()
        out = out.rename(columns={"size": "c"})
        return from_pandas_clean(out)

    merged = grouped_agg(
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type", "v"],
        specs=[("c", "sum", "c")],
    )
    rows = sorted(merged.take_all(), key=lambda r: (r["event_type"], r["v"]))
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    et_out, q_out, v_out = [], [], []
    for et in sorted(by_type):
        hist_rows = by_type[et]
        n = sum(r["c"] for r in hist_rows)
        for q in EVENT_PCTL_QS:
            target = math.ceil(q * n)
            cum = 0
            for r in hist_rows:
                cum += r["c"]
                if cum >= target:
                    et_out.append(et)
                    q_out.append(q)
                    v_out.append(r["v"] / float(EVENT_PCTL_SCALE))
                    break
    return pa.table(
        {"event_type": pa.array(et_out, pa.string()),
         "q": pa.array(q_out, pa.float64()),
         "p_value": pa.array(v_out, pa.float64())}
    )


ANOMALY_Z = 2.0


def daily_event_anomalies(sf_dir: str):
    """Daily event-count anomaly detection per event type: z-score of each
    day's count against that type's mean/std over all days, flagging
    |z| ≥ 2 (the ops-dashboard staple for traffic spikes/drops). The
    statistical core stays EXACT integers through the combiner — counts,
    Σx and Σx² — so the only float arithmetic is a fixed 5-op chain
    (two divides, sqrt, subtract, divide) identical to the SQL twin; z is
    rounded half-even(4) and the flag compares the ROUNDED value so no
    unrounded float ever crosses the gate. Exchange: one row per
    (type, day) per block; the per-type moment table is derived inside the
    finalize task from the already-tiny aggregate."""
    import math

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return from_pandas_clean(df[["event_type", "day"]])

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type"):
            d = len(g)
            sn = int(g["n_events"].sum())
            sn2 = int((g["n_events"].astype("int64") ** 2).sum())
            var_num = d * sn2 - sn * sn
            mean = sn / float(d)
            std = math.sqrt(var_num / float(d * d)) if var_num else 0.0
            for _, r in g.iterrows():
                z = 0.0 if var_num == 0 else round(
                    (r["n_events"] - mean) / std, 4)
                # Python round is half-even on floats, matching round_even;
                # the chain is fixed-order so both engines see the same bits
                out.append({"event_type": et, "day": r["day"],
                            "n_events": int(r["n_events"]), "z": z,
                            "is_anomaly": abs(z) >= ANOMALY_Z})
        res = pd.DataFrame(out).sort_values(["event_type", "day"])
        return res.reset_index(drop=True)

    return grouped_agg(
        ds,
        keys=["event_type", "day"],
        specs=[("n_events", "count", None)],
        finalize=fin,
    )


def event_type_affinity(sf_dir: str):
    """Market-basket affinity between event types (support / confidence /
    lift over distinct users) — the association-rule staple. Scale shape:
    (1) per-batch distinct (user, type) combiner → one exchange of narrow
    pairs; (2) ONE grouped sum keyed by user folds each user's types into a
    BITMASK (types are an enum, so the mask is exact — the (user,type)
    distinct guarantees each bit sums in once); (3) mask histogram → at most
    2^|types| rows reach the driver, where every pair statistic is derived
    from EXACT integer counts with one float division each (bit-identical
    to the SQL twin's self-join form)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    types = sorted(
        r["event_type"]
        for r in distinct(ds, ["event_type"]).take_all()
    )
    bit = {t: 1 << i for i, t in enumerate(types)}

    def pairs_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        df["b"] = df["event_type"].map(bit).astype("int64")
        # per-batch pre-distinct; the (user, type) pair may still recur
        # across batches, so fold with MAX of the bit later, then sum bits
        return from_pandas_clean(df[["user_id", "event_type", "b"]])

    per_pair = grouped_agg(
        ds.map_batches(pairs_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "event_type"],
        specs=[("b", "max", "b")],
    )
    masks = grouped_agg(per_pair, keys=["user_id"], specs=[("mask", "sum", "b")])

    def mask_hist(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("mask", as_index=False).size()
        return from_pandas_clean(df.rename(columns={"size": "c"}))

    hist = grouped_agg(
        masks.map_batches(mask_hist, batch_format="pyarrow", zero_copy_batch=True),
        keys=["mask"],
        specs=[("c", "sum", "c")],
    )
    rows = hist.take_all()
    n_users = sum(r["c"] for r in rows)
    n_single = {
        t: sum(r["c"] for r in rows if r["mask"] & bit[t]) for t in types
    }
    out = {"type_a": [], "type_b": [], "n_a": [], "n_b": [], "n_both": [],
           "support": [], "confidence": [], "lift": []}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            both = sum(
                r["c"] for r in rows
                if (r["mask"] & bit[a]) and (r["mask"] & bit[b])
            )
            na, nb = n_single[a], n_single[b]
            out["type_a"].append(a)
            out["type_b"].append(b)
            out["n_a"].append(na)
            out["n_b"].append(nb)
            out["n_both"].append(both)
            out["support"].append(round(both / n_users, 4))
            out["confidence"].append(round(both / na, 4) if na else 0.0)
            out["lift"].append(
                round((both * n_users) / (na * nb), 4) if na and nb else 0.0
            )
    return pa.table(
        {"type_a": pa.array(out["type_a"], pa.string()),
         "type_b": pa.array(out["type_b"], pa.string()),
         "n_a": pa.array(out["n_a"], pa.int64()),
         "n_b": pa.array(out["n_b"], pa.int64()),
         "n_both": pa.array(out["n_both"], pa.int64()),
         "support": pa.array(out["support"], pa.float64()),
         "confidence": pa.array(out["confidence"], pa.float64()),
         "lift": pa.array(out["lift"], pa.float64())}
    )


def order_size_distribution(sf_dir: str):
    """Distribution of group SIZES (lineitems per order) — the two-level
    aggregation diagnostic every skew investigation starts with: grouped
    count per order, then a histogram over the counts. Both levels are
    combiner-shaped: level 1 ships one row per (block × order), level 2 one
    row per distinct size — the histogram is bounded by the max group size,
    not the row count."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    per_order = grouped_agg(
        ds, keys=["l_orderkey"], specs=[("n_items", "count", None)]
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("n_items").reset_index(drop=True)

    return grouped_agg(
        per_order, keys=["n_items"], specs=[("n_orders", "count", None)],
        finalize=fin,
    )


PATH_LEN = 3


def clickstream_paths(sf_dir: str):
    """Sequence mining: each user's first PATH_LEN event types in time
    order folded to a path string ('view>click>purchase'), then a grouped
    count per path — the entry-path analysis every product funnel review
    starts from. Same salted-partition rule as user_sessions (users
    co-locate via user_id % SESSION_PARTS so the Python-call count is
    bounded by the part count, and the within-part pass is one vectorized
    sort + cumcount, never a per-user loop); ties on ts break by event_id
    on both sides."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("upart", pa.array(uid % SESSION_PARTS, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def paths_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort")
        if not len(df):
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("path", pa.string()), pa.field("n_users", pa.int64())]))
        df["rn"] = df.groupby("user_id").cumcount()
        head = df[df["rn"] < PATH_LEN]
        paths = head.groupby("user_id", sort=False)["event_type"].agg(">".join)
        out = paths.to_frame("path").groupby("path", as_index=False).size()
        return from_pandas_clean(out.rename(columns={"size": "n_users"}))

    grouped = ds.groupby("upart").map_groups(paths_part, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n_users", "path"],
                              ascending=[False, True]).reset_index(drop=True)

    return grouped_agg(
        grouped, keys=["path"], specs=[("n_users", "sum", "n_users")], finalize=fin
    )


Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def local_supplier_volume(sf_dir: str, region: str = Q5_REGION):
    """TPC-H Q5 shape: revenue by nation where the customer's and the
    supplier's nation coincide inside one region — the deepest join tree in
    the relational suite (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈
    supplier).

    Scale shape: the four dimension arms (region→nation, supplier→nation,
    customer→nation) collapse into TWO broadcast int→int maps built once on
    the driver and ray.put — the fact scans never shuffle for them. orders
    prunes its year window at the parquet read and maps to the 2-column
    (orderkey, cust_nation) stream; lineitem maps each row to its supplier
    nation via the broadcast and partial-aggregates exact 1e-4-unit revenue
    per (orderkey, supp_nation) BEFORE the single co-partitioned hash join
    on orderkey. The customer-nation == supplier-nation predicate filters
    join output rows, and one tiny grouped sum per nation finishes. The only
    all-to-all carries one row per (qualifying order x supplier nation) —
    never a lineitem row.

    Output: (n_name, revenue) sorted by revenue desc, n_name asc."""
    import pyarrow.dataset as pads

    from .common import choose_join_parts

    lo, hi = pd.Timestamp(Q5_DATE_LO), pd.Timestamp(Q5_DATE_HI)

    region_keys = {
        r["r_regionkey"]
        for r in read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).take_all()
        if r["r_name"] == region
    }
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(
            sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]
        ).take_all()
        if r["n_regionkey"] in region_keys
    }
    cust_nation = {
        r["c_custkey"]: r["c_nationkey"]
        for r in read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).take_all()
        if r["c_nationkey"] in nations
    }
    supp_nation = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).take_all()
        if r["s_nationkey"] in nations
    }
    cust_ref, supp_ref = ray.put(cust_nation), ray.put(supp_nation)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= pads.scalar(lo))
        & (pads.field("o_orderdate") < pads.scalar(hi)),
    )

    def order_nation(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cust_ref)
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cn = np.array([cmap.get(int(c), -1) for c in cust], dtype=np.int64)
        keep = cn >= 0
        return pa.table(
            {"o_orderkey": pa.array(
                batch.column("o_orderkey").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
             "cust_nation": pa.array(cn[keep], pa.int64())}
        )

    orders = orders.map_batches(order_nation, batch_format="pyarrow", zero_copy_batch=True)

    lineitem = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        smap = ray.get(supp_ref)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        sn = np.array([smap.get(int(s), -1) for s in supp], dtype=np.int64)
        keep = sn >= 0
        if not keep.any():
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("l_orderkey", pa.int64()),
                 pa.field("supp_nation", pa.int64()),
                 pa.field("rev4", pa.int64())]))
        t = batch.filter(pa.array(keep))
        # exact integer 1e-4 currency units (same contract as Q3)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100.0)), pa.int64())
        dpct = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))
        part = pa.table(
            {"l_orderkey": t.column("l_orderkey"),
             "supp_nation": pa.array(sn[keep], pa.int64()),
             "rev4": rev}
        )
        df = part.to_pandas().groupby(
            ["l_orderkey", "supp_nation"], as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    revenue = grouped_agg(
        lineitem.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey", "supp_nation"],
        specs=[("rev4", "sum", "rev4")],
    )

    joined = revenue.join(
        orders,
        join_type="inner",
        num_partitions=choose_join_parts(sf_dir, "orders", "lineitem", floor=4),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def per_nation(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("supp_nation"), batch.column("cust_nation"))
        t = batch.filter(keep)
        df = t.to_pandas().groupby("supp_nation", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_name"] = df["supp_nation"].map(nations)
        # exact int / 10000.0 is the same double on both sides
        df["revenue"] = df["rev4"].astype("float64") / 10000.0
        return df.sort_values(
            ["revenue", "n_name"], ascending=[False, True]
        ).reset_index(drop=True)[["n_name", "revenue"]]

    return grouped_agg(
        joined.map_batches(per_nation, batch_format="pyarrow"),
        keys=["supp_nation"],
        specs=[("rev4", "sum", "rev4")],
        finalize=fin,
    )


def markov_transitions(sf_dir: str):
    """First-order Markov transition counts + probabilities between
    consecutive event types per user — the behavioral-model fit every
    clickstream analysis runs after :func:`clickstream_paths`.

    Scale shape: same salted-partition rule as user_sessions (all events of
    a user co-locate via ``user_id % SESSION_PARTS``); inside each part ONE
    vectorized sort + shift produces the consecutive pairs (never a per-user
    Python loop), pairs pre-count per part (combiner), and the exchange
    carries at most |types|² rows per part. Counts stay exact ints end to
    end; the probability is a single IEEE division n/total computed
    identically in the SQL twin, so no rounding boundary exists.

    Output: (from_type, to_type, n, p) ordered by (from_type, to_type)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("upart", pa.array(uid % SESSION_PARTS, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort")
        if len(df) < 2:
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("from_type", pa.string()),
                 pa.field("to_type", pa.string()),
                 pa.field("n", pa.int64())]))
        same = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        et = df["event_type"].to_numpy()
        out = pd.DataFrame(
            {"from_type": et[:-1][same], "to_type": et[1:][same]}
        ).groupby(["from_type", "to_type"], as_index=False).size()
        return from_pandas_clean(out.rename(columns={"size": "n"}))

    grouped = ds.groupby("upart").map_groups(pairs_part, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        totals = df.groupby("from_type")["n"].transform("sum")
        df["p"] = df["n"].astype("float64") / totals.astype("float64")
        return df.sort_values(["from_type", "to_type"]).reset_index(drop=True)

    return grouped_agg(
        grouped,
        keys=["from_type", "to_type"],
        specs=[("n", "sum", "n")],
        finalize=fin,
    )


# TPC-H Q10 shape (returned-item reporting): reference has no analogue —
# this exercises the fact⋈fact co-partitioned join + broadcast-dimension
# finalize pattern at one more fan-in.
Q10_DATE_LO = "1996-10-01"
Q10_DATE_HI = "1997-01-01"
Q10_TOP_K = 20


def returned_items(sf_dir: str, k: int = Q10_TOP_K):
    """TPC-H Q10 shape: revenue lost to returned items per customer in one
    order-date quarter — top-k customers by lost revenue.

    Scale shape: lineitem keeps only l_returnflag='R' rows (parquet row
    filter, never leaves storage otherwise) and partial-aggregates exact
    1e-4-unit revenue per orderkey BEFORE the single co-partitioned hash
    join against the date-pruned (o_orderkey, o_custkey) order stream; the
    join output (one row per qualifying order) grouped-sums per custkey to
    an O(customers-in-window) frame, and only THEN do the customer/nation
    dimensions attach — on the driver, to k rows, via the broadcast maps.
    Neither fact table is ever shuffled whole.

    Output: (c_custkey, c_name, n_name, revenue) sorted by revenue desc,
    c_custkey asc, limit k."""
    import pyarrow.dataset as pads

    from .common import choose_join_parts

    lo, hi = pd.Timestamp(Q10_DATE_LO), pd.Timestamp(Q10_DATE_HI)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= pads.scalar(lo))
        & (pads.field("o_orderdate") < pads.scalar(hi)),
    ).select_columns(["o_orderkey", "o_custkey"])

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pads.field("l_returnflag") == "R",
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64())
        dpct = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))
        part = pa.table(
            {"l_orderkey": batch.column("l_orderkey"), "rev4": rev}
        )
        df = part.to_pandas().groupby("l_orderkey", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    revenue = grouped_agg(
        lineitem.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey"],
        specs=[("rev4", "sum", "rev4")],
    )

    joined = revenue.join(
        orders,
        join_type="inner",
        num_partitions=choose_join_parts(sf_dir, "orders", "lineitem", floor=4),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def per_cust(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("o_custkey", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    cust = {
        r["c_custkey"]: (r["c_name"], r["c_nationkey"])
        for r in read_table(
            sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"]
        ).take_all()
    }
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).take_all()
    }

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["rev4", "o_custkey"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        df["c_name"] = [cust[c][0] for c in df["o_custkey"]]
        df["n_name"] = [nations[cust[c][1]] for c in df["o_custkey"]]
        df["revenue"] = df["rev4"].astype("float64") / 10000.0
        return df.rename(columns={"o_custkey": "c_custkey"})[
            ["c_custkey", "c_name", "n_name", "revenue"]
        ]

    return grouped_agg(
        joined.map_batches(per_cust, batch_format="pyarrow"),
        keys=["o_custkey"],
        specs=[("rev4", "sum", "rev4")],
        finalize=fin,
    )


def revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(order_year, o_orderpriority) over order revenue —
    the multi-level OLAP aggregate (grouping sets) the engine previously
    lacked: (year, priority) cells, per-year subtotals, and a grand total
    in ONE scan.

    Scale shape: the fact table is aggregated ONCE at the finest grain
    (years × priorities — a few dozen cells) with per-batch integer-cent
    partials; the coarser rollup levels re-aggregate the tiny finest frame
    in finalize, never re-scanning the input. Sentinels (-1 year / 'ALL'
    priority) stand in for the rollup NULLs so column types stay simple.

    Output: (order_year, o_orderpriority, revenue, n_orders) ordered by
    (order_year, o_orderpriority) with sentinels sorting first."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderdate", "o_orderpriority", "o_totalprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100.0)), pa.int64())
        part = pa.table(
            {"order_year": yr,
             "o_orderpriority": batch.column("o_orderpriority"),
             "cents": cents}
        )
        df = part.to_pandas().groupby(
            ["order_year", "o_orderpriority"], as_index=False
        ).agg(cents=("cents", "sum"), n_orders=("cents", "size"))
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        fine = df.copy()
        per_year = fine.groupby("order_year", as_index=False)[
            ["cents", "n_orders"]].sum()
        per_year["o_orderpriority"] = "ALL"
        total = pd.DataFrame(
            {"order_year": [-1], "o_orderpriority": ["ALL"],
             "cents": [fine["cents"].sum()], "n_orders": [fine["n_orders"].sum()]}
        )
        out = pd.concat([total, per_year, fine], ignore_index=True)
        out["revenue"] = out["cents"].astype("float64") / 100.0
        out["n_orders"] = out["n_orders"].astype("int64")
        return out.sort_values(
            ["order_year", "o_orderpriority"]
        ).reset_index(drop=True)[
            ["order_year", "o_orderpriority", "revenue", "n_orders"]
        ]

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["order_year", "o_orderpriority"],
        specs=[("cents", "sum", "cents"), ("n_orders", "sum", "n_orders")],
        finalize=fin,
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(sf_dir: str):
    """Long→wide pivot: one row per user with a count column per event type
    plus exact integer-cent purchase value — the feature-matrix layout every
    per-user model consumes.

    Scale shape: the pivot IS the combiner — each batch crosstabs locally
    (vectorized pandas crosstab, one row per user seen in the batch), and
    the exchange then carries only the wide partial rows; the grouped sum
    merges them. No per-user Python loop, no |types| separate passes.

    Output: (user_id, n_click, n_error, n_purchase, n_signup, n_view,
    purchase_cents) ordered by user_id."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    cols = [f"n_{t}" for t in EVENT_TYPES]

    def pivot_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        wide = pd.crosstab(df["user_id"], df["event_type"])
        for t in EVENT_TYPES:
            if t not in wide.columns:
                wide[t] = 0
        wide = wide[list(EVENT_TYPES)].rename(
            columns={t: f"n_{t}" for t in EVENT_TYPES}
        ).astype("int64")
        purch = df[df["event_type"] == "purchase"]
        pv = (purch["value"] * 100.0).round().astype("int64")
        wide["purchase_cents"] = (
            pv.groupby(purch["user_id"]).sum().reindex(wide.index).fillna(0).astype("int64")
        )
        return from_pandas_clean(wide.reset_index())

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("user_id").reset_index(drop=True)

    return grouped_agg(
        ds.map_batches(pivot_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id"],
        specs=[(c, "sum", c) for c in cols] + [("purchase_cents", "sum", "purchase_cents")],
        finalize=fin,
    )


def monthly_revenue_growth(sf_dir: str):
    """Per-month order revenue with month-over-month growth — the LAG
    window representative (every prior window op here used rekey joins;
    this one is the classic ordered-frame shift).

    Scale shape: integer-cent partials collapse per (year, month) inside
    each batch; the exchange carries at most years×12 rows; the shift runs
    in finalize over that tiny ordered frame. growth is the single IEEE
    division cur/prev computed identically in the SQL twin (no rounding
    boundary); the first month's growth is NULL.

    Output: (order_month 'YYYY-MM', revenue, growth) ordered by month."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        m = pc.cast(pc.month(batch.column("o_orderdate")), pa.int64())
        ym = pc.add(pc.multiply(y, pa.scalar(100, pa.int64())), m)
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100.0)), pa.int64())
        part = pa.table({"ym": ym, "cents": cents})
        df = part.to_pandas().groupby("ym", as_index=False)["cents"].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ym").reset_index(drop=True)
        df["order_month"] = [f"{v // 100:04d}-{v % 100:02d}" for v in df["ym"]]
        # exact-int ratio computed as ONE double division, like the oracle
        prev = df["cents"].shift(1)
        df["revenue"] = df["cents"].astype("float64") / 100.0
        df["growth"] = (
            df["cents"].astype("float64") / prev.astype("float64")
        ).fillna(0.0)
        return df[["order_month", "revenue", "growth"]]

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["ym"],
        specs=[("cents", "sum", "cents")],
        finalize=fin,
    )


SUPPLIER_VARIETY_EXCLUDE_BRAND = "Brand#1"


def supplier_part_variety(sf_dir: str):
    """TPC-H Q16 shape: how many DISTINCT suppliers ship each
    (p_brand, p_size) combination, excluding one brand — the
    count-distinct-after-join representative.

    Scale shape: the fact table collapses to distinct (l_partkey,
    l_suppkey) pairs first (per-batch pre-dedup + one combiner distinct —
    the pair set is orders of magnitude smaller than lineitem); the part
    dimension attaches via one broadcast int→(brand,size) map inside
    map_batches (no shuffle); a second distinct on (brand, size, suppkey)
    absorbs pair collisions across parts, and a grouped count finishes.

    Output: (p_brand, p_size, supplier_cnt) ordered by supplier_cnt desc,
    p_brand, p_size."""
    from .common import distinct

    pairs = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pre_dedup(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    pairs = distinct(
        pairs.map_batches(pre_dedup, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey", "l_suppkey"],
    )

    part_map = {
        r["p_partkey"]: (r["p_brand"], r["p_size"])
        for r in read_table(
            sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
        ).take_all()
        if r["p_brand"] != SUPPLIER_VARIETY_EXCLUDE_BRAND
    }
    part_ref = ray.put(part_map)

    def attach(batch: pa.Table) -> pa.Table:
        pmap = ray.get(part_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        brands, sizes, supps = [], [], []
        for p, s in zip(pk, sk):
            bs = pmap.get(int(p))
            if bs is not None:
                brands.append(bs[0])
                sizes.append(bs[1])
                supps.append(int(s))
        return pa.table(
            {"p_brand": pa.array(brands, pa.string()),
             "p_size": pa.array(sizes, pa.int64()),
             "suppkey": pa.array(supps, pa.int64())}
        )

    tagged = distinct(
        pairs.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True),
        ["p_brand", "p_size", "suppkey"],
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["supplier_cnt", "p_brand", "p_size"], ascending=[False, True, True]
        ).reset_index(drop=True)

    return grouped_agg(
        tagged,
        keys=["p_brand", "p_size"],
        specs=[("supplier_cnt", "count", None)],
        finalize=fin,
    )


def cohort_matrix(sf_dir: str):
    """Weekly signup-cohort retention matrix: users bucketed by their FIRST
    active week, counted in every subsequent week they return — the
    triangle heatmap behind every retention dashboard.

    Scale shape: events collapse to distinct (user, week) pairs inside each
    batch (combiner), co-locate per user via the standard salted partition
    (user_id % SESSION_PARTS), and each part derives (first_week, offset)
    rows with one vectorized groupby-min + merge — never a per-user Python
    loop, never a self-join of the pair set against its own minima across
    the cluster. The final exchange carries at most |weeks|² rows per part.

    Output: (cohort_week, week_offset, n_users) ordered by (cohort_week,
    week_offset); weeks are epoch-day // 7 indices, offset 0 row counts the
    cohort size."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    epoch = pd.Timestamp("1970-01-01")

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        week = ((df["ts"].dt.normalize() - epoch).dt.days // 7).astype("int64")
        out = pd.DataFrame({"user_id": df["user_id"], "week": week}).drop_duplicates()
        out["upart"] = out["user_id"] % SESSION_PARTS
        return from_pandas_clean(out)

    keyed = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)

    def per_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates(["user_id", "week"])
        first = df.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame(
            {"cohort_week": first, "week_offset": df["week"] - first}
        ).groupby(["cohort_week", "week_offset"], as_index=False).size()
        return from_pandas_clean(out.rename(columns={"size": "n_users"}))

    grouped = keyed.groupby("upart").map_groups(per_part, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)

    return grouped_agg(
        grouped,
        keys=["cohort_week", "week_offset"],
        specs=[("n_users", "sum", "n_users")],
        finalize=fin,
    )


def value_trend_by_type(sf_dir: str):
    """Per-event-type OLS trend of daily total value over time — the
    distributed-regression-via-sufficient-statistics pattern: the cluster
    only ever aggregates EXACT integer moments (Σx, Σy, Σx², Σxy over
    epoch-day x and integer-cent y), and the slope/intercept fall out of a
    fixed float chain in the finalize task, identical to the SQL twin.

    Scale shape: per-batch integer-cent partials collapse to (type, day)
    cells (one exchange); per-cell moment products are a shuffle-free map;
    the per-type moment sums are a second tiny exchange bounded by
    |types|. No float ever crosses a shuffle. Moment magnitudes stay well
    inside int64 for epoch-day x (~2·10^4) at any per-day cent volume
    below ~10^12.

    Output: (event_type, n_days, slope, intercept) — slope in cents/day."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    epoch = pd.Timestamp("1970-01-01")

    def prep(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = (df["ts"].dt.normalize() - epoch).dt.days.astype("int64")
        cents = (df["value"] * 100.0).round().astype("int64")
        out = pd.DataFrame(
            {"event_type": df["event_type"], "x": x, "cents": cents}
        ).groupby(["event_type", "x"], as_index=False)["cents"].sum()
        return from_pandas_clean(out)

    cells = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type", "x"],
        specs=[("cents", "sum", "cents")],
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column("x")
        y = batch.column("cents")
        return pa.table(
            {"event_type": batch.column("event_type"),
             "x": x, "y": y,
             "xx": pc.multiply(x, x), "xy": pc.multiply(x, y)}
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in df.iterrows():
            n = int(r["n_days"])
            sx, sy = int(r["sx"]), int(r["sy"])
            sxx, sxy = int(r["sxx"]), int(r["sxy"])
            den = n * sxx - sx * sx
            slope = 0.0 if den == 0 else float(n * sxy - sx * sy) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n)
            out.append({"event_type": r["event_type"], "n_days": n,
                        "slope": slope, "intercept": intercept})
        res = pd.DataFrame(out, columns=["event_type", "n_days", "slope",
                                         "intercept"])
        res["n_days"] = res["n_days"].astype("int64")
        return res.sort_values("event_type").reset_index(drop=True)

    return grouped_agg(
        cells.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type"],
        specs=[("n_days", "count", None), ("sx", "sum", "x"),
               ("sy", "sum", "y"), ("sxx", "sum", "xx"), ("sxy", "sum", "xy")],
        finalize=fin,
    )


TOP_PART_REVENUE_FRACTION = 0.0005


def top_revenue_parts(sf_dir: str):
    """Parts whose revenue exceeds a fraction of TOTAL corpus revenue —
    the HAVING-above-scalar-subquery representative (TPC-H Q11's shape):
    a global scalar derives from pass 1 and broadcasts into the filter.

    Scale shape: ONE aggregation produces the per-part exact 1e-4-unit
    revenue frame; the grand total derives from that same frame in
    finalize (no second scan of the fact table), and the threshold
    comparison is exact-integer (rev4 · 10^7 > total4 · frac_num with
    frac expressed as an integer ratio) so no float boundary exists.

    Output: (l_partkey, revenue) for qualifying parts, revenue desc,
    partkey asc."""
    lineitem = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64())
        dpct = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))
        part = pa.table({"l_partkey": batch.column("l_partkey"), "rev4": rev})
        df = part.to_pandas().groupby("l_partkey", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    # frac = 0.0005 == 5 / 10^4 exactly
    FRAC_NUM, FRAC_DEN = 5, 10_000

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["rev4"].sum())
        keep = df["rev4"].astype(object) * FRAC_DEN > total * FRAC_NUM
        out = df[keep].copy()
        out["revenue"] = out["rev4"].astype("float64") / 10000.0
        return out.sort_values(
            ["rev4", "l_partkey"], ascending=[False, True]
        ).reset_index(drop=True)[["l_partkey", "revenue"]]

    return grouped_agg(
        lineitem.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_partkey"],
        specs=[("rev4", "sum", "rev4")],
        finalize=fin,
    )


# TPC-H Q14/Q17/Q18/Q19/Q22 shapes. Revenue math is the suite's exact-integer
# convention (top_revenue_parts): price cents × (100 − discount %) = rev4 in
# 1e-4 currency units, so no float crosses an exchange and the SQL twins are
# hash-exact. Quantities are integral in the corpus (TPC-H convention) and
# ride as int64.
PROMO_TYPE = "PROMO"
Q17_BRAND = "Brand#23"
Q18_MIN_QTY = 300
Q19_CLAUSES = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi) — OR'd, like Q19's three
    # bracket predicates
    ("Brand#2", 1, 15, 1, 11),
    ("Brand#15", 1, 25, 10, 20),
    ("Brand#22", 1, 35, 20, 30),
)


def _rev4(batch: pa.Table) -> pa.ChunkedArray:
    """Exact 1e-4-unit revenue: round(price·100) · (100 − round(disc·100))."""
    cents = pc.cast(pc.round(pc.multiply(
        batch.column("l_extendedprice"), 100.0)), pa.int64())
    dpct = pc.cast(pc.round(pc.multiply(
        batch.column("l_discount"), 100.0)), pa.int64())
    return pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))


def promo_revenue(sf_dir: str):
    """Promotion-revenue share per ship month (TPC-H Q14's shape, widened
    from one month to a per-month series): 100 · Σ promo rev / Σ rev.

    Scale shape: part is the DIMENSION side — its partkey→is-promo flag is
    ray.put ONCE as a frozenset and read zero-copy by every task (never a
    shuffle join of the fact table); per-batch integer partials collapse to
    one row per (month, block) before the only exchange. The share is one
    float division over exact int64 sums in finalize, identical to the SQL
    twin's expression.

    Output: (month, promo_pct, total_revenue) ordered by month."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])
    promo = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_type"), PROMO_TYPE)).select(
            ["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    promo_ref = ray.put(frozenset(
        r["p_partkey"] for r in promo.take_all()))

    lineitem = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        promo_keys = ray.get(promo_ref)
        rev = _rev4(batch)
        month = pc.strftime(batch.column("l_shipdate"), format="%Y-%m")
        is_promo = pa.array(
            [k in promo_keys for k in batch.column("l_partkey").to_pylist()],
            pa.bool_(),
        )
        df = pd.DataFrame(
            {"month": month.to_pandas(), "rev4": rev.to_pandas(),
             "promo4": pc.if_else(is_promo, rev, pa.scalar(0, pa.int64())
                                  ).to_pandas()}
        ).groupby("month", as_index=False).sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "month": df["month"],
            # exact ints → one double division; both engines compute the
            # identical IEEE quotient, no rounding boundary exists
            "promo_pct": [100.0 * float(p) / float(t)
                          for p, t in zip(df["promo4"], df["rev4"])],
            "total_revenue": df["rev4"].astype("float64") / 10000.0,
        })
        return out.sort_values("month").reset_index(drop=True)

    return grouped_agg(
        lineitem.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["month"],
        specs=[("rev4", "sum", "rev4"), ("promo4", "sum", "promo4")],
        finalize=fin,
    )


def small_qty_revenue(sf_dir: str):
    """Average yearly revenue lost to small-quantity orders of one brand's
    parts (TPC-H Q17's shape): lineitems with l_quantity < 0.2 · avg
    quantity of their part, parts restricted to Q17_BRAND.

    Scale shape: pass 1 is ONE combiner-collapsed aggregation of (Σqty, n)
    per brand part — the brand filter rides the broadcast partkey set so
    non-brand rows never enter the exchange; the per-part thresholds
    broadcast back as exact integer pairs, and the 0.2·avg comparison is
    the cross-multiplied integer test 5·qty·n < Σqty (no float boundary).
    Pass 2 is a shuffle-free filtered sum.

    Output: one row (n_items, total_revenue, avg_yearly)."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    brand_keys = frozenset(
        r["p_partkey"]
        for r in part.map_batches(
            lambda b: b.filter(pc.equal(b.column("p_brand"), Q17_BRAND)).select(
                ["p_partkey"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all()
    )
    brand_ref = ray.put(brand_keys)

    lineitem = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(brand_ref)
        mask = pa.array(
            [k in keys for k in batch.column("l_partkey").to_pylist()],
            pa.bool_(),
        )
        kept = batch.filter(mask)
        df = pd.DataFrame(
            {"l_partkey": kept.column("l_partkey").to_pandas(),
             "qty": pc.cast(pc.round(kept.column("l_quantity")),
                            pa.int64()).to_pandas()}
        ).groupby("l_partkey", as_index=False).agg(
            sum_qty=("qty", "sum"), n=("qty", "size"))
        df["n"] = df["n"].astype("int64")
        return from_pandas_clean(df)

    per_part = grouped_agg(
        lineitem.map_batches(qty_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["l_partkey"],
        specs=[("sum_qty", "sum", "sum_qty"), ("n", "sum", "n")],
    )
    thresholds = {
        r["l_partkey"]: (int(r["sum_qty"]), int(r["n"]))
        for r in per_part.take_all()
    }
    thr_ref = ray.put(thresholds)

    def rev_partial(batch: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        qty = pc.cast(pc.round(batch.column("l_quantity")), pa.int64()).to_pylist()
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64()).to_pylist()
        total = 0
        n = 0
        for k, q, c in zip(batch.column("l_partkey").to_pylist(), qty, cents):
            t = thr.get(k)
            if t is not None and 5 * q * t[1] < t[0]:
                total += c
                n += 1
        return pa.table({"cents": pa.array([total], pa.int64()),
                         "n_items": pa.array([n], pa.int64()),
                         "one": pa.array([1], pa.int64())})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        cents = int(df["cents"].iloc[0])
        return pd.DataFrame({
            "n_items": [int(df["n_items"].iloc[0])],
            "total_revenue": [float(cents) / 100.0],
            "avg_yearly": [float(cents) / 100.0 / 7.0],
        })

    return grouped_agg(
        lineitem.map_batches(rev_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["one"],
        specs=[("cents", "sum", "cents"), ("n_items", "sum", "n_items")],
        finalize=fin,
    )


def large_orders(sf_dir: str):
    """Large-volume orders and their customers (TPC-H Q18's shape): orders
    whose total lineitem quantity exceeds Q18_MIN_QTY, joined back to the
    order header and customer name.

    Scale shape: the quantity rollup is the only fact-sized exchange
    (combiner-collapsed per-orderkey int sums); the qualifying set is
    HAVING-filtered to a handful of rows, so both "joins" degrade to
    broadcast set-membership filters over streaming scans of orders and
    customer — no fact⋈fact shuffle ever happens, which is exactly how the
    Q18 plan should look at 100 TB (the selective HAVING makes the join
    sides asymmetric).

    Output: (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    sum_qty) ordered by o_totalprice desc, o_orderkey."""
    lineitem = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"l_orderkey": batch.column("l_orderkey").to_pandas(),
             "qty": pc.cast(pc.round(batch.column("l_quantity")),
                            pa.int64()).to_pandas()}
        ).groupby("l_orderkey", as_index=False)["qty"].sum()
        return from_pandas_clean(df)

    per_order = grouped_agg(
        lineitem.map_batches(qty_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["l_orderkey"],
        specs=[("qty", "sum", "qty")],
    )
    big = {
        int(r["l_orderkey"]): int(r["qty"])
        for r in per_order.take_all()
        if int(r["qty"]) > Q18_MIN_QTY
    }
    big_ref = ray.put(big)

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def pick_orders(batch: pa.Table) -> pa.Table:
        qual = ray.get(big_ref)
        mask = pa.array(
            [k in qual for k in batch.column("o_orderkey").to_pylist()],
            pa.bool_(),
        )
        kept = batch.filter(mask)
        qty = pa.array(
            [qual[k] for k in kept.column("o_orderkey").to_pylist()],
            pa.int64(),
        )
        return kept.append_column("sum_qty", qty)

    qual_orders = orders.map_batches(
        pick_orders, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    by_cust: dict[int, list[dict]] = {}
    for r in qual_orders:
        by_cust.setdefault(int(r["o_custkey"]), []).append(r)
    cust_ref = ray.put(by_cust)

    customer = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def attach(batch: pa.Table) -> pa.Table:
        lookup = ray.get(cust_ref)
        out = []
        for ck, name in zip(batch.column("c_custkey").to_pylist(),
                            batch.column("c_name").to_pylist()):
            for o in lookup.get(ck, ()):
                out.append({
                    "c_name": name, "c_custkey": ck,
                    "o_orderkey": o["o_orderkey"],
                    "o_orderdate": o["o_orderdate"],
                    "o_totalprice": o["o_totalprice"],
                    "sum_qty": o["sum_qty"],
                })
        return pa.Table.from_pylist(out, schema=pa.schema(
            [("c_name", pa.string()), ("c_custkey", pa.int64()),
             ("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
             ("o_totalprice", pa.float64()), ("sum_qty", pa.int64())]))

    ds = customer.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    def order_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True])
        return from_pandas_clean(df)

    return ds.repartition(1).map_batches(order_rows, batch_format="pyarrow")


def disjunctive_revenue(sf_dir: str):
    """Revenue under an OR-of-brackets predicate spanning fact and dimension
    attributes (TPC-H Q19's shape): three (brand, size range, quantity
    range) clauses OR'd together.

    Scale shape: part attributes broadcast ONCE as a partkey→(brand, size)
    dict (dimension side), the disjunction evaluates per batch with no
    shuffle, and the only exchange is the single-row integer sum.

    Output: one row (n_items, revenue)."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    attrs = {
        r["p_partkey"]: (r["p_brand"], int(r["p_size"]))
        for r in part.take_all()
    }
    attrs_ref = ray.put(attrs)

    lineitem = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(attrs_ref)
        rev = _rev4(batch).to_pylist()
        qty = pc.cast(pc.round(batch.column("l_quantity")), pa.int64()).to_pylist()
        total = 0
        n = 0
        for k, q, r in zip(batch.column("l_partkey").to_pylist(), qty, rev):
            brand, size = lookup[k]
            for cb, slo, shi, qlo, qhi in Q19_CLAUSES:
                if brand == cb and slo <= size <= shi and qlo <= q <= qhi:
                    total += r
                    n += 1
                    break
        return pa.table({"rev4": pa.array([total], pa.int64()),
                         "n_items": pa.array([n], pa.int64()),
                         "one": pa.array([1], pa.int64())})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_items": [int(df["n_items"].iloc[0])],
            "revenue": [float(int(df["rev4"].iloc[0])) / 10000.0],
        })

    return grouped_agg(
        lineitem.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["one"],
        specs=[("rev4", "sum", "rev4"), ("n_items", "sum", "n_items")],
        finalize=fin,
    )


Q22_STATUS = "P"


def idle_rich_customers(sf_dir: str):
    """Well-funded customers with no PENDING order, rolled up per market
    segment (TPC-H Q22's shape): acctbal above the global average of
    POSITIVE balances, anti-joined against the custkeys holding an
    o_orderstatus = 'P' order (the synthetic corpus gives every customer
    SOME order, so the no-orders-at-all carve is empty by construction;
    the pending-status carve keeps Q22's plan shape — scalar subquery +
    NOT EXISTS — with a non-degenerate answer).

    Scale shape: the global average broadcasts as the exact integer pair
    (Σ positive cents, n) and the above-average test is the
    cross-multiplied integer comparison cents·n > Σcents (no float
    boundary); the probe side distinct-reduces o_custkey per batch before
    ONE exchange; the anti join co-partitions on the key
    (``Dataset.join('left_anti')``, both sides fact-scale at 100 TB — the
    same discipline as lapsed_customers' churn window).

    Output: (c_mktsegment, n_customers, total_acctbal) by segment."""
    from .common import choose_join_parts

    customer = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"]
    )

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("c_acctbal"), 100.0)), pa.int64())
        pos = pc.greater(cents, 0)
        kept = cents.filter(pos)
        return pa.table({
            "sum_cents": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
            "n": pa.array([len(kept)], pa.int64()),
            "one": pa.array([1], pa.int64()),
        })

    tot = grouped_agg(
        customer.map_batches(bal_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["one"],
        specs=[("sum_cents", "sum", "sum_cents"), ("n", "sum", "n")],
    ).take_all()[0]
    sum_cents, n_pos = int(tot["sum_cents"]), int(tot["n"])

    def rich(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("c_acctbal"), 100.0)), pa.int64())
        mask = pc.greater(pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
                          pa.scalar(sum_cents, pa.int64()))
        return batch.filter(mask)

    rich_customers = customer.map_batches(
        rich, batch_format="pyarrow", zero_copy_batch=True)

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def keys_partial(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("o_orderstatus"), Q22_STATUS))
        return pa.table({"o_custkey": kept.column("o_custkey").unique()})

    with_orders = distinct(
        orders.map_batches(keys_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"],
    )

    idle = rich_customers.join(
        with_orders, "left_anti",
        num_partitions=choose_join_parts(sf_dir, "customer", "orders"),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["total_acctbal"] = df["total_acctbal"].round(2)
        return df.sort_values("c_mktsegment").reset_index(drop=True)

    return grouped_agg(
        idle,
        keys=["c_mktsegment"],
        specs=[("n_customers", "count", None),
               ("total_acctbal", "sum", "c_acctbal")],
        finalize=fin,
    )


GAP_PARTS = 64


def event_gap_stats(sf_dir: str):
    """Inter-event gap statistics per event type: mean/max seconds between
    consecutive events of the SAME (user, type) — the inter-arrival
    distribution behind retention and anomaly models.

    Scale shape: the user_sessions salted-partition rule (all of a user's
    events co-locate via user_id % GAP_PARTS, Python calls bounded by
    GAP_PARTS not user count); inside a part ONE vectorized sort + diff
    computes exact integer-microsecond gaps, and only per-type (Σgap_us,
    n, max) partials cross the final tiny exchange. The mean is one
    double-division chain over exact ints, identical to the SQL twin.

    Output: (event_type, n_gaps, mean_gap_s, max_gap_s) by type."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("upart", pa.array(uid % GAP_PARTS, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def gaps_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort")
        if not len(df):
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("event_type", pa.string()),
                 pa.field("sum_us", pa.int64()), pa.field("n_gaps", pa.int64()),
                 pa.field("max_us", pa.int64())]))
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        typ = df["event_type"].to_numpy()
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = (uid[1:] == uid[:-1]) & (typ[1:] == typ[:-1])
        gap = np.empty(len(df), dtype="int64")
        gap[0] = 0
        gap[1:] = us[1:] - us[:-1]
        out = pd.DataFrame({"event_type": typ[same], "gap_us": gap[same]})
        agg = out.groupby("event_type", as_index=False).agg(
            sum_us=("gap_us", "sum"), n_gaps=("gap_us", "size"),
            max_us=("gap_us", "max"))
        agg["n_gaps"] = agg["n_gaps"].astype("int64")
        return from_pandas_clean(agg)

    parts = ds.groupby("upart").map_groups(gaps_part, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["mean_gap_s"] = [
            float(s) / float(n) / 1000000.0
            for s, n in zip(df["sum_us"], df["n_gaps"])
        ]
        df["max_gap_s"] = df["max_us"].astype("float64") / 1000000.0
        return df.sort_values("event_type").reset_index(drop=True)[
            ["event_type", "n_gaps", "mean_gap_s", "max_gap_s"]]

    return grouped_agg(
        parts,
        keys=["event_type"],
        specs=[("sum_us", "sum", "sum_us"), ("n_gaps", "sum", "n_gaps"),
               ("max_us", "max", "max_us")],
        finalize=fin,
    )


def session_lengths(sf_dir: str):
    """Session-size distribution (events per 30-min-gap session) — the
    bounce-rate histogram (session_len = 1) every clickstream report leads
    with; the companion rollup to user_sessions' per-user counts.

    Scale shape: the user_sessions salted-partition rule (user_id %
    GAP_PARTS co-locates a user's events, Python calls bounded by parts);
    inside a part ONE vectorized sort + diff finds break positions and the
    per-session sizes are np.diff over the break indices — then only the
    tiny (session_len, n) histogram partials cross the final exchange.
    Gaps compare exact integer microseconds (> 30·60·10^6), matching the
    SQL window twin boundary-for-boundary.

    Output: (session_len, n_sessions) by session_len."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column("upart", pa.array(uid % GAP_PARTS, pa.int64()))

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def sizes_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort")
        if not len(df):
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("session_len", pa.int64()),
                 pa.field("n_sessions", pa.int64())]))
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        brk = np.empty(len(df), dtype=bool)
        brk[0] = True
        brk[1:] = (uid[1:] != uid[:-1]) | (us[1:] - us[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(df)))
        vals, counts = np.unique(sizes, return_counts=True)
        return pa.table({"session_len": pa.array(vals, pa.int64()),
                         "n_sessions": pa.array(counts, pa.int64())})

    parts = ds.groupby("upart").map_groups(sizes_part, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("session_len").reset_index(drop=True)

    return grouped_agg(
        parts,
        keys=["session_len"],
        specs=[("n_sessions", "sum", "n_sessions")],
        finalize=fin,
    )


RFM_QUANTILES = 4


def customer_rfm(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary quartiles) — the
    classic warehouse scoring rollup, built WITHOUT a global sort: each
    metric's RANK() comes from a broadcast histogram (the
    length_percent_rank trick) and the quartile is pure integer math
    ((rank−1)·4 // n + 1), so ties never straddle a float boundary.

    Scale shape: ONE combiner-collapsed per-customer aggregate (the only
    fact-sized exchange, materialized once so the histogram pass and the
    scoring pass don't recompute it); three metric histograms ride ONE
    extra tiny exchange as (metric, value) cells; rank maps broadcast via
    ray.put; scoring is shuffle-free.

    Output: (c_custkey, recency_days, n_orders, monetary, r_q, f_q, m_q)."""
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = (df["o_totalprice"] * 100).round().astype("int64")
        g = df.groupby("o_custkey", as_index=False).agg(
            last_dt=("o_orderdate", "max"), n_orders=("o_custkey", "size"),
            cents=("cents", "sum"))
        g["n_orders"] = g["n_orders"].astype("int64")
        return from_pandas_clean(g)

    per_cust = grouped_agg(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_custkey"],
        specs=[("last_dt", "max", "last_dt"), ("n_orders", "sum", "n_orders"),
               ("cents", "sum", "cents")],
    ).materialize()

    from ray.data.aggregate import Max

    max_dt = per_cust.aggregate(Max(on="last_dt", alias_name="m"))["m"]
    mx_us = int(pd.Timestamp(max_dt).value // 1000)  # ns → µs

    def melt(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        last_us = df["last_dt"].astype("datetime64[us]").astype("int64")
        rec = (mx_us - last_us) // 86_400_000_000
        out = pd.concat([
            pd.DataFrame({"metric": "r", "v": rec.astype("int64")}),
            pd.DataFrame({"metric": "f", "v": df["n_orders"].astype("int64")}),
            pd.DataFrame({"metric": "m", "v": df["cents"].astype("int64")}),
        ])
        g = out.groupby(["metric", "v"], as_index=False).size().rename(
            columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype("int64")
        return from_pandas_clean(g)

    hist = grouped_agg(
        per_cust.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True),
        keys=["metric", "v"],
        specs=[("cnt", "sum", "cnt")],
    )
    h = pd.DataFrame(hist.take_all())
    n_cust = int(h.loc[h["metric"] == "r", "cnt"].sum())
    rank_maps: dict[str, dict[int, int]] = {}
    for metric, asc in (("r", True), ("f", False), ("m", False)):
        hm = h[h["metric"] == metric].sort_values(
            "v", ascending=asc).reset_index(drop=True)
        better = hm["cnt"].cumsum().shift(1, fill_value=0).astype("int64")
        rank_maps[metric] = dict(zip(hm["v"].astype(int), better + 1))
    maps_ref = ray.put(rank_maps)
    q = RFM_QUANTILES

    def score(batch: pa.Table) -> pa.Table:
        maps = ray.get(maps_ref)
        df = batch.to_pandas()
        last_us = df["last_dt"].astype("datetime64[us]").astype("int64")
        rec = ((mx_us - last_us) // 86_400_000_000).astype("int64")
        out = pd.DataFrame({
            "c_custkey": df["o_custkey"].astype("int64"),
            "recency_days": rec,
            "n_orders": df["n_orders"].astype("int64"),
            "monetary": df["cents"].astype("float64") / 100.0,
        })
        for col, metric, vals in (("r_q", "r", rec),
                                  ("f_q", "f", df["n_orders"]),
                                  ("m_q", "m", df["cents"])):
            ranks = [maps[metric][int(v)] for v in vals]
            out[col] = pd.Series(
                [(r - 1) * q // n_cust + 1 for r in ranks], dtype="int64")
        return from_pandas_clean(out)

    return per_cust.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ship_latency(sf_dir: str):
    """Order-to-first-shipment latency per order priority — the fulfilment
    SLA rollup, and the suite's genuine FACT⋈FACT equi-join: per-order min
    shipdate (combiner-collapsed) meets the orders table in a
    co-partitioned ``Dataset.join`` (neither side is broadcastable at
    10^12 orders).

    Scale shape: one combiner exchange (l_orderkey → min shipdate, one row
    per order per block), one hash join with input-scaled partitions, one
    tiny per-priority rollup of exact integer day latencies. The mean is a
    single double division of exact int sums.

    Output: (o_orderpriority, n_orders, mean_latency_days,
    max_latency_days) by priority."""
    from .common import choose_join_parts

    lineitem = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def ship_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("l_orderkey", as_index=False)[
            "l_shipdate"].min().rename(columns={"l_shipdate": "first_ship"})
        return from_pandas_clean(df)

    first_ship = grouped_agg(
        lineitem.map_batches(ship_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        keys=["l_orderkey"],
        specs=[("first_ship", "min", "first_ship")],
    )

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    joined = orders.join(
        first_ship, "inner",
        num_partitions=choose_join_parts(sf_dir, "orders", "lineitem"),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def latency(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        o_us = df["o_orderdate"].astype("datetime64[us]").astype("int64")
        s_us = df["first_ship"].astype("datetime64[us]").astype("int64")
        df["lat"] = ((s_us - o_us) // 86_400_000_000).astype("int64")
        return from_pandas_clean(df[["o_orderpriority", "lat"]])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["mean_latency_days"] = [
            float(s) / float(n) for s, n in zip(df["sum_lat"], df["n_orders"])
        ]
        return df.sort_values("o_orderpriority").reset_index(drop=True)[
            ["o_orderpriority", "n_orders", "mean_latency_days",
             "max_latency_days"]]

    return grouped_agg(
        joined.map_batches(latency, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderpriority"],
        specs=[("n_orders", "count", None), ("sum_lat", "sum", "lat"),
               ("max_latency_days", "max", "lat")],
        finalize=fin,
    )


# TPC-H Q7/Q8/Q13 shapes (reference exposes the same grouped-join analytics
# surface through its export rollups; these complete the classic join-tree
# family alongside Q1/Q3/Q5/Q10/Q11/Q14/Q16-Q19/Q22 above).
Q7_YEAR_LO = "1996-01-01"
Q7_YEAR_HI = "1998-01-01"


def nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape: shipped revenue between every ORDERED pair of
    distinct (supplier nation → customer nation) per ship year.

    Scale shape: both dimension arms (suppkey→nation, custkey→nation) are
    ray.put ONCE as int→int maps — the fact scans never shuffle for them.
    lineitem prunes its two-year ship window at the parquet read, then
    partial-aggregates exact 1e-4-unit revenue per (orderkey, supp_nation,
    year) BEFORE the single co-partitioned hash join with the 2-column
    orders stream; the supp≠cust predicate filters join output and a tiny
    grouped sum per (supp_nation, cust_nation, year) finishes — the only
    all-to-all carries one row per qualifying (order × supplier nation ×
    year), never a lineitem row.

    Output: (supp_nation, cust_nation, l_year, revenue) ordered by the
    three keys."""
    import pyarrow.dataset as pads

    from .common import choose_join_parts

    lo, hi = pd.Timestamp(Q7_YEAR_LO), pd.Timestamp(Q7_YEAR_HI)

    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).take_all()
    }
    cust_nation = {
        r["c_custkey"]: r["c_nationkey"]
        for r in read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).take_all()
    }
    supp_nation = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).take_all()
    }
    cust_ref, supp_ref = ray.put(cust_nation), ray.put(supp_nation)

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= pads.scalar(lo))
        & (pads.field("l_shipdate") < pads.scalar(hi)),
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        smap = ray.get(supp_ref)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        sn = np.array([smap.get(int(s), -1) for s in supp], dtype=np.int64)
        year = pc.cast(pc.year(batch.column("l_shipdate")), pa.int64())
        df = pd.DataFrame(
            {"l_orderkey": batch.column("l_orderkey").to_numpy(zero_copy_only=False),
             "supp_nation_key": sn,
             "l_year": year.to_numpy(zero_copy_only=False),
             "rev4": _rev4(batch).to_pandas().to_numpy()}
        ).groupby(["l_orderkey", "supp_nation_key", "l_year"], as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    revenue = grouped_agg(
        lineitem.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey", "supp_nation_key", "l_year"],
        specs=[("rev4", "sum", "rev4")],
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def order_nation(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cust_ref)
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cn = np.array([cmap.get(int(c), -1) for c in cust], dtype=np.int64)
        return pa.table(
            {"o_orderkey": batch.column("o_orderkey"),
             "cust_nation_key": pa.array(cn, pa.int64())}
        )

    orders = orders.map_batches(order_nation, batch_format="pyarrow", zero_copy_batch=True)

    joined = revenue.join(
        orders, join_type="inner",
        num_partitions=choose_join_parts(sf_dir, "orders", "lineitem", floor=4),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def per_pair(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(
            batch.column("supp_nation_key"), batch.column("cust_nation_key"))
        df = batch.filter(keep).to_pandas().groupby(
            ["supp_nation_key", "cust_nation_key", "l_year"],
            as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["supp_nation"] = df["supp_nation_key"].map(nations)
        df["cust_nation"] = df["cust_nation_key"].map(nations)
        # exact int / 10000.0 is the same double on both sides
        df["revenue"] = df["rev4"].astype("float64") / 10000.0
        return df.sort_values(
            ["supp_nation", "cust_nation", "l_year"]
        ).reset_index(drop=True)[["supp_nation", "cust_nation", "l_year", "revenue"]]

    return grouped_agg(
        joined.map_batches(per_pair, batch_format="pyarrow"),
        keys=["supp_nation_key", "cust_nation_key", "l_year"],
        specs=[("rev4", "sum", "rev4")],
        finalize=fin,
    )


Q8_REGION = "EUROPE"
Q8_NATION = "NATION_7"
Q8_TYPE = "LARGE"


def market_share(sf_dir: str):
    """TPC-H Q8 shape: Q8_NATION's share of Q8_TYPE-part revenue sold into
    Q8_REGION's customers, per order year.

    Scale shape: three broadcast dimension arms — the qualifying partkey
    set (one frozenset), suppkey→is-target-nation, and the region's custkey
    set — each ray.put once; the lineitem scan filters to qualifying parts
    and partial-aggregates exact (total, target-nation) revenue per
    orderkey BEFORE the single co-partitioned join with the region-pruned
    (orderkey, year) orders stream. The share is one float division of
    exact int64 sums per year, identical to the SQL twin's expression.

    Output: (o_year, mkt_share, total_revenue) ordered by o_year."""
    from .common import choose_join_parts

    region_keys = {
        r["r_regionkey"]
        for r in read_table(sf_dir, "region", columns=["r_regionkey", "r_name"]).take_all()
        if r["r_name"] == Q8_REGION
    }
    region_nations = {
        r["n_nationkey"]
        for r in read_table(
            sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).take_all()
        if r["n_regionkey"] in region_keys
    }
    target_key = {
        r["n_nationkey"]
        for r in read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).take_all()
        if r["n_name"] == Q8_NATION
    }
    part_keys = frozenset(
        r["p_partkey"]
        for r in read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).take_all()
        if r["p_type"] == Q8_TYPE
    )
    target_supp = frozenset(
        r["s_suppkey"]
        for r in read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).take_all()
        if r["s_nationkey"] in target_key
    )
    region_cust = frozenset(
        r["c_custkey"]
        for r in read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).take_all()
        if r["c_nationkey"] in region_nations
    )
    part_ref = ray.put(part_keys)
    supp_ref = ray.put(target_supp)
    cust_ref = ray.put(region_cust)

    lineitem = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        pset = ray.get(part_ref)
        sset = ray.get(supp_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = np.fromiter((int(k) in pset for k in pk), dtype=bool, count=len(pk))
        if not keep.any():
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("l_orderkey", pa.int64()),
                 pa.field("rev4", pa.int64()),
                 pa.field("target4", pa.int64())]))
        t = batch.filter(pa.array(keep))
        rev = _rev4(t).to_pandas().to_numpy()
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        is_target = np.fromiter(
            (int(k) in sset for k in sk), dtype=bool, count=len(sk))
        df = pd.DataFrame(
            {"l_orderkey": t.column("l_orderkey").to_numpy(zero_copy_only=False),
             "rev4": rev,
             "target4": np.where(is_target, rev, 0)}
        ).groupby("l_orderkey", as_index=False).sum()
        return from_pandas_clean(df)

    revenue = grouped_agg(
        lineitem.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey"],
        specs=[("rev4", "sum", "rev4"), ("target4", "sum", "target4")],
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_year(batch: pa.Table) -> pa.Table:
        cset = ray.get(cust_ref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        keep = np.fromiter((int(k) in cset for k in ck), dtype=bool, count=len(ck))
        t = batch.filter(pa.array(keep))
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"),
             "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64())}
        )

    orders = orders.map_batches(order_year, batch_format="pyarrow", zero_copy_batch=True)

    joined = revenue.join(
        orders, join_type="inner",
        num_partitions=choose_join_parts(sf_dir, "orders", "lineitem", floor=4),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def per_year(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("o_year", as_index=False)[
            ["rev4", "target4"]].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_year": df["o_year"].astype("int64"),
            # exact ints → one double division, shared with the twin
            "mkt_share": [float(t) / float(r)
                          for t, r in zip(df["target4"], df["rev4"])],
            "total_revenue": df["rev4"].astype("float64") / 10000.0,
        })
        return out.sort_values("o_year").reset_index(drop=True)

    return grouped_agg(
        joined.map_batches(per_year, batch_format="pyarrow"),
        keys=["o_year"],
        specs=[("rev4", "sum", "rev4"), ("target4", "sum", "target4")],
        finalize=fin,
    )


def custdist(sf_dir: str):
    """TPC-H Q13 shape: how many customers placed exactly k orders, for
    every k INCLUDING the zero-order customers the left join exists for.

    Scale shape: orders partial-counts per custkey inside each batch
    (combiner), one grouped sum per custkey, then the per-customer counts
    re-aggregate to the tiny (c_count → n customers) frame; the zero bucket
    is total customers (a count aggregate, no data moved) minus the
    customers seen in orders — the left join's semantics at the cost of two
    scalar aggregates instead of a customer×orders shuffle.

    Output: (c_count, custdist) ordered by custdist desc, c_count desc."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("o_custkey", as_index=False).size()
        return from_pandas_clean(df.rename(columns={"size": "c_count"}))

    per_cust = grouped_agg(
        orders.map_batches(per_cust_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_custkey"],
        specs=[("c_count", "sum", "c_count")],
    )

    n_customers = read_table(sf_dir, "customer", columns=["c_custkey"]).count()

    def dist_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("c_count", as_index=False).size()
        return from_pandas_clean(df.rename(columns={"size": "custdist"}))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        zero = int(n_customers) - int(df["custdist"].sum())
        if zero:
            df = pd.concat(
                [df, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
                ignore_index=True)
        df["c_count"] = df["c_count"].astype("int64")
        df["custdist"] = df["custdist"].astype("int64")
        return df.sort_values(
            ["custdist", "c_count"], ascending=[False, False]
        ).reset_index(drop=True)[["c_count", "custdist"]]

    return grouped_agg(
        per_cust.map_batches(dist_partial, batch_format="pyarrow"),
        keys=["c_count"],
        specs=[("custdist", "sum", "custdist")],
        finalize=fin,
    )


# Market-basket / division / window-rank / correlated-subquery / time-decay
# shapes (session 7). Same exact-integer conventions as the Q-suite above.

BASKET_PARTS = 64
LOYAL_YEAR = 1997
TOPK_PARTS = 64
TOPK_K = 2
DECAY_UNIT = 1 << 20  # dyadic weights: DECAY_UNIT >> weeks_old, exact in SQL


def brand_basket_pairs(sf_dir: str):
    """Market-basket mining: how often every UNORDERED pair of part brands
    is co-ordered (both brands appear in the same order). The classic
    self-join-per-basket shape, bounded by design: 25 brands → ≤ 300 pairs
    out, and ≤ C(25,2) pair rows per order regardless of order size.

    Scale shape: part's partkey→brand map is a broadcast dimension arm
    (ray.put once); (orderkey, brand) distinct-collapses via one combiner
    pass BEFORE pair enumeration, so a 10k-line order contributes each
    brand once; baskets co-locate on the SALTED ``orderkey % BASKET_PARTS``
    (Python-call count bounded by BASKET_PARTS, not order count) and the
    within-part pair build is one vectorized self-merge; a tiny grouped sum
    over ≤ 300 keys finishes.

    Output: (brand_a, brand_b, n_orders), brand_a < brand_b, ordered by
    count desc then pair."""
    brand_of = {
        r["p_partkey"]: r["p_brand"]
        for r in read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).take_all()
    }
    brand_ref = ray.put(brand_of)

    lineitem = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def to_brand(batch: pa.Table) -> pa.Table:
        bmap = ray.get(brand_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"l_orderkey": batch.column("l_orderkey").to_numpy(zero_copy_only=False),
             "brand": [bmap[int(k)] for k in pk]}
        ).drop_duplicates()
        return from_pandas_clean(df)

    ob = distinct(
        lineitem.map_batches(to_brand, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey", "brand"],
    )

    def add_part(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bpart", pa.array(ok % BASKET_PARTS, pa.int64()))

    ob = ob.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_part(group: pa.Table) -> pa.Table:
        df = group.select(["l_orderkey", "brand"]).to_pandas()
        m = df.merge(df, on="l_orderkey")
        m = m[m["brand_x"] < m["brand_y"]]
        out = (
            m.groupby(["brand_x", "brand_y"], as_index=False).size()
            .rename(columns={"brand_x": "brand_a", "brand_y": "brand_b",
                             "size": "n_orders"})
        )
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].astype("int64")
        return df.sort_values(
            ["n_orders", "brand_a", "brand_b"], ascending=[False, True, True]
        ).reset_index(drop=True)

    return grouped_agg(
        ob.groupby("bpart").map_groups(pairs_part, batch_format="pyarrow"),
        keys=["brand_a", "brand_b"],
        specs=[("n_orders", "sum", "n_orders")],
        finalize=fin,
    )


def loyal_customers(sf_dir: str):
    """Relational division: customers who placed >= 1 order in EVERY
    quarter of LOYAL_YEAR, rolled up per market segment. The FORALL shape
    (division) done as a count-distinct-equals-divisor aggregate — no
    nested NOT EXISTS ever runs.

    Scale shape: orders prunes to one year at the read, (custkey, quarter)
    distinct-collapses via one combiner pass (≤ 4 rows per customer cross
    the exchange), the =4 filter is a column compare on the small grouped
    frame, and the custkey→segment dimension arm is broadcast once.

    Output: (c_mktsegment, n_loyal) ordered by segment."""
    import pyarrow.dataset as pads

    lo = pd.Timestamp(f"{LOYAL_YEAR}-01-01")
    hi = pd.Timestamp(f"{LOYAL_YEAR + 1}-01-01")
    seg_of = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in read_table(
            sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).take_all()
    }
    seg_ref = ray.put(seg_of)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= pads.scalar(lo))
        & (pads.field("o_orderdate") < pads.scalar(hi)),
    )

    def cust_quarter(batch: pa.Table) -> pa.Table:
        q = pc.cast(pc.quarter(batch.column("o_orderdate")), pa.int64())
        return pa.table(
            {"o_custkey": batch.column("o_custkey"), "quarter": q}
        )

    cq = distinct(
        orders.map_batches(cust_quarter, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey", "quarter"],
    )

    per_cust = grouped_agg(
        cq, keys=["o_custkey"], specs=[("n_quarters", "count", None)])

    def to_segment(batch: pa.Table) -> pa.Table:
        smap = ray.get(seg_ref)
        df = batch.to_pandas()
        df = df[df["n_quarters"] == 4]
        if not len(df):
            return pa.Table.from_pylist([], schema=pa.schema(
                [pa.field("c_mktsegment", pa.string()),
                 pa.field("n_loyal", pa.int64())]))
        df["c_mktsegment"] = [smap[int(k)] for k in df["o_custkey"]]
        out = df.groupby("c_mktsegment", as_index=False).size().rename(
            columns={"size": "n_loyal"})
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_loyal"] = df["n_loyal"].astype("int64")
        return df.sort_values("c_mktsegment").reset_index(drop=True)

    return grouped_agg(
        per_cust.map_batches(to_segment, batch_format="pyarrow"),
        keys=["c_mktsegment"],
        specs=[("n_loyal", "sum", "n_loyal")],
        finalize=fin,
    )


def top2_orders_per_customer(sf_dir: str):
    """Window-rank shape: each customer's TOPK_K most expensive orders
    (row_number() over (partition by custkey order by totalprice desc,
    orderkey)) — the per-group top-k every leaderboard/window query needs.

    Scale shape: a per-batch vectorized top-k partial (sort + groupby
    cumcount, no Python per group) shrinks each batch to ≤ K rows per
    customer BEFORE the exchange; survivors co-locate on the SALTED
    ``custkey % TOPK_PARTS`` and the within-part final top-k is the same
    vectorized pass — Python-call count bounded by TOPK_PARTS. totalprice
    passes through untouched (no float arithmetic), so the hash gate is
    exact; ties break on orderkey ascending, a total order.

    Output: (c_custkey, rk, o_orderkey, o_totalprice) ordered by custkey,
    rk."""
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort")
        rk = df.groupby("o_custkey").cumcount() + 1
        df = df[rk <= TOPK_K].copy()
        df["rk"] = rk[rk <= TOPK_K].astype("int64")
        return df

    def partial(batch: pa.Table) -> pa.Table:
        df = topk(batch.to_pandas())
        df["cpart"] = (df["o_custkey"] % TOPK_PARTS).astype("int64")
        return from_pandas_clean(df)

    ds = orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final_part(group: pa.Table) -> pa.Table:
        df = topk(group.select(
            ["o_custkey", "o_orderkey", "o_totalprice"]).to_pandas())
        df = df.rename(columns={"o_custkey": "c_custkey"})
        return from_pandas_clean(
            df[["c_custkey", "rk", "o_orderkey", "o_totalprice"]])

    return (
        ds.groupby("cpart")
        .map_groups(final_part, batch_format="pyarrow")
        .sort(["c_custkey", "rk"])
    )


def orders_above_cust_avg(sf_dir: str):
    """Correlated-subquery shape (o_totalprice > AVG over the customer's
    own orders), decorrelated the scale-correct way: the per-customer
    (sum, count) pair is ONE combiner-collapsed grouped aggregate,
    broadcast once, and the compare runs exactly — price_cents · n >
    sum_cents — so no float division ever happens and the SQL twin
    hash-matches bit for bit. Rolled up per order priority.

    Single-order customers never qualify (their only order equals its own
    mean) — same in SQL. Output: (o_orderpriority, n_above, revenue)."""
    orders = read_table(
        sf_dir, "orders",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"])

    def cents_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100.0)), pa.int64())
        df = pd.DataFrame(
            {"o_custkey": batch.column("o_custkey").to_numpy(zero_copy_only=False),
             "sum_cents": cents.to_numpy(zero_copy_only=False)})
        g = df.groupby("o_custkey", as_index=False)
        out = g.sum()
        out["n_orders"] = g.size()["size"].to_numpy()
        return from_pandas_clean(out)

    per_cust = grouped_agg(
        orders.map_batches(cents_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_custkey"],
        specs=[("sum_cents", "sum", "sum_cents"), ("n_orders", "sum", "n_orders")],
    )
    stats = {
        r["o_custkey"]: (r["sum_cents"], r["n_orders"])
        for r in per_cust.take_all()
    }
    stats_ref = ray.put(stats)

    def above(batch: pa.Table) -> pa.Table:
        smap = ray.get(stats_ref)
        df = batch.to_pandas()
        cents = np.rint(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        sums = np.fromiter(
            (smap[int(k)][0] for k in df["o_custkey"]), dtype=np.int64,
            count=len(df))
        ns = np.fromiter(
            (smap[int(k)][1] for k in df["o_custkey"]), dtype=np.int64,
            count=len(df))
        keep = cents * ns > sums
        out = pd.DataFrame(
            {"o_orderpriority": df["o_orderpriority"].to_numpy()[keep],
             "cents": cents[keep]})
        g = out.groupby("o_orderpriority", as_index=False)
        res = g.sum()
        res["n_above"] = g.size()["size"].to_numpy()
        return from_pandas_clean(res)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_above"] = df["n_above"].astype("int64")
        df["revenue"] = df["cents"].astype("float64") / 100.0
        return df.sort_values("o_orderpriority").reset_index(drop=True)[
            ["o_orderpriority", "n_above", "revenue"]]

    return grouped_agg(
        orders.map_batches(above, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderpriority"],
        specs=[("cents", "sum", "cents"), ("n_above", "sum", "n_above")],
        finalize=fin,
    )


def decayed_user_scores(sf_dir: str):
    """Exponentially time-decayed engagement score per user — the freshness
    weighting every recommendation/crawl-priority pipeline applies — kept
    HASH-EXACT by using dyadic weights: weight = DECAY_UNIT >> weeks_old
    (a right shift, not pow(0.5, x) in floats), value in exact cents, so
    the weighted sum is pure int64 and the single final division is the
    same double on both sides.

    Scale shape: the anchor (max event date) is one scalar aggregate; the
    scan partial-aggregates Σ value_cents·weight per user inside each batch
    — one row per (batch × user) crosses the exchange.

    Output: (user_id, score) with score = Σ cents·w / (DECAY_UNIT·100),
    ordered by user_id."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    anchor = pd.Timestamp(ds.max("ts")).normalize()

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        age_days = (anchor - df["ts"].dt.normalize()).dt.days.to_numpy()
        weeks = np.minimum(age_days // 7, 60).astype(np.int64)
        cents = np.rint(df["value"].to_numpy() * 100.0).astype(np.int64)
        num = cents * (DECAY_UNIT >> weeks)
        out = pd.DataFrame({"user_id": df["user_id"], "num": num}).groupby(
            "user_id", as_index=False).sum()
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["score"] = df["num"].astype("float64") / (DECAY_UNIT * 100.0)
        return df.sort_values("user_id").reset_index(drop=True)[
            ["user_id", "score"]]

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id"],
        specs=[("num", "sum", "num")],
        finalize=fin,
    )


def rolling_7d_revenue(sf_dir: str):
    """Trailing 7-row windowed aggregate: per order day, that day's revenue
    plus the rolling sum/average over the last 7 present days (ROWS 6
    PRECEDING — a time-series smoothing every dashboard needs and Ray Data
    has no native window operator for).

    Scale shape: the scan partial-aggregates exact cents per day inside
    each batch (one row per batch × day crosses the exchange); the rolling
    pass runs in the single-task finalize over the tiny per-day frame —
    window state never touches the distributed path because days are
    bounded (~2.4k for the corpus span), the suite's standard
    small-result-window discipline.

    Output: (day, revenue, rolling_7d, rolling_avg_7d) ordered by day."""
    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.rint(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        out = pd.DataFrame(
            {"day": df["o_orderdate"].dt.strftime("%Y-%m-%d"), "cents": cents}
        ).groupby("day", as_index=False).sum()
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day").reset_index(drop=True)
        roll = df["cents"].rolling(7, min_periods=1).sum().astype("int64")
        n = df["cents"].rolling(7, min_periods=1).count().astype("int64")
        df["revenue"] = df["cents"].astype("float64") / 100.0
        df["rolling_7d"] = roll.astype("float64") / 100.0
        # same expression as SQL: double(cents sum) / (100 * window rows)
        df["rolling_avg_7d"] = roll.astype("float64") / (100.0 * n)
        return df[["day", "revenue", "rolling_7d", "rolling_avg_7d"]]

    return grouped_agg(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["day"],
        specs=[("cents", "sum", "cents")],
        finalize=fin,
    )


def referential_audit(sf_dir: str):
    """Referential-integrity audit between the orders and lineitem fact
    tables — the data-quality gate every ingest pipeline runs before
    training jobs consume a drop: orphan lineitems (no order header),
    childless orders (no lines), matched counts.

    Scale shape: a FULL OUTER JOIN without the join — both scans emit
    combiner-collapsed (orderkey, n_li, n_ord) partial counts, one union +
    grouped sum co-locates each key exactly once, and the classification
    collapses to five scalar tallies before the single-row finalize. The
    only all-to-all carries one row per distinct orderkey.

    Output: one row (n_orders, n_lineitems, n_matched_orders,
    n_childless_orders, n_orphan_lineitems, n_orphan_keys)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey"])
    lineitem = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def ord_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("o_orderkey", as_index=False).size()
        df = df.rename(columns={"o_orderkey": "okey", "size": "n_ord"})
        df["n_li"] = 0
        return from_pandas_clean(df)

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("l_orderkey", as_index=False).size()
        df = df.rename(columns={"l_orderkey": "okey", "size": "n_li"})
        df["n_ord"] = 0
        return from_pandas_clean(df)

    both = orders.map_batches(
        ord_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(lineitem.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True))

    per_key = grouped_agg(
        both, keys=["okey"],
        specs=[("n_ord", "sum", "n_ord"), ("n_li", "sum", "n_li")])

    _TALLIES = ["n_orders", "n_lineitems", "n_matched_orders",
                "n_childless_orders", "n_orphan_lineitems", "n_orphan_keys"]

    def classify(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        has_ord = df["n_ord"].to_numpy() > 0
        has_li = df["n_li"].to_numpy() > 0
        return from_pandas_clean(pd.DataFrame({
            "k": [0],  # constant grouping key: a global sum as grouped_agg
            "n_orders": [int(df["n_ord"].sum())],
            "n_lineitems": [int(df["n_li"].sum())],
            "n_matched_orders": [int((has_ord & has_li).sum())],
            "n_childless_orders": [int((has_ord & ~has_li).sum())],
            "n_orphan_lineitems": [int(df["n_li"].to_numpy()[~has_ord].sum())],
            "n_orphan_keys": [int((~has_ord).sum())],
        }))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df[_TALLIES].astype("int64")

    return grouped_agg(
        per_key.map_batches(classify, batch_format="pyarrow"),
        keys=["k"],
        specs=[(c, "sum", c) for c in _TALLIES],
        finalize=fin,
    )


PROJ_PARTS = 64
PARTSUPP_CAP = 4096  # sorted-prefix cap per part, mirrored in the SQL twin


def supplier_overlap_pairs(sf_dir: str):
    """Bipartite projection: project the part↔supplier incidence (from
    lineitem) onto suppliers — for every supplier pair, how many distinct
    parts both have shipped. The co-engagement graph build behind
    supplier-substitution and collusion analytics.

    Scale shape: (partkey, suppkey) distinct-collapses first (one combiner
    exchange); each part's supplier list is capped at PARTSUPP_CAP by the
    deterministic sorted-by-suppkey prefix (same one-sided-truncation
    guard as the LSH bucket caps — the SQL twin applies the identical
    QUALIFY), bounding the per-part pair fan-out; parts co-locate on the
    SALTED ``partkey % PROJ_PARTS`` and pair enumeration is one vectorized
    self-merge per part group. Output is bounded by C(|suppliers|, 2) —
    a dimension-squared frame, never corpus-sized.

    Output: (supp_a, supp_b, n_shared_parts), supp_a < supp_b, ordered by
    n_shared_parts desc then pair."""
    ps = distinct(
        read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"],
    )

    def add_part(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "ppart", pa.array(pk % PROJ_PARTS, pa.int64()))

    ps = ps.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_part(group: pa.Table) -> pa.Table:
        df = group.select(["l_partkey", "l_suppkey"]).to_pandas()
        df = df.sort_values(["l_partkey", "l_suppkey"], kind="mergesort")
        rk = df.groupby("l_partkey").cumcount()
        df = df[rk < PARTSUPP_CAP]
        m = df.merge(df, on="l_partkey")
        m = m[m["l_suppkey_x"] < m["l_suppkey_y"]]
        out = (
            m.groupby(["l_suppkey_x", "l_suppkey_y"], as_index=False).size()
            .rename(columns={"l_suppkey_x": "supp_a", "l_suppkey_y": "supp_b",
                             "size": "n_shared_parts"})
        )
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_shared_parts"] = df["n_shared_parts"].astype("int64")
        return df.sort_values(
            ["n_shared_parts", "supp_a", "supp_b"],
            ascending=[False, True, True]).reset_index(drop=True)

    return grouped_agg(
        ps.groupby("ppart").map_groups(pairs_part, batch_format="pyarrow"),
        keys=["supp_a", "supp_b"],
        specs=[("n_shared_parts", "sum", "n_shared_parts")],
        finalize=fin,
    )


# TPC-H Q6/Q15 shapes. These complete the suite's coverage of the
# TPC-H queries expressible on the driver tables (no partsupp / shipmode /
# commit-receipt dates exist here, so Q2/Q9/Q12/Q20/Q21 have no input).
Q6_YEAR_LO = "1996-01-01"
Q6_YEAR_HI = "1997-01-01"
Q6_DISC_LO = 5   # discount percent, inclusive
Q6_DISC_HI = 7
Q6_MAX_QTY = 24  # l_quantity strictly below
Q15_WINDOW_LO = "1996-01-01"
Q15_WINDOW_HI = "1996-04-01"


def forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: revenue increase from hypothetically eliminating a
    discount band — Σ price·discount over one ship year, a discount
    bracket and a quantity cap.

    Scale shape: the year window prunes at the parquet read (row-group
    filter); the discount/quantity predicates and the price·discount
    product are one vectorized Arrow pass per batch; each batch collapses
    to a SINGLE partial-sum row (exact 1e-4-unit integers), so the only
    "exchange" is a take of one tiny row per block — no groupby at all.
    The float division happens once on the collapsed total, identical to
    the SQL twin.

    Output: one row (revenue,)."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(Q6_YEAR_LO), pd.Timestamp(Q6_YEAR_HI)
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= pads.scalar(lo))
        & (pads.field("l_shipdate") < pads.scalar(hi)),
    )

    def partial(batch: pa.Table) -> pa.Table:
        dpct = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100.0)), pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(dpct, pa.scalar(Q6_DISC_LO, pa.int64())),
                    pc.less_equal(dpct, pa.scalar(Q6_DISC_HI, pa.int64()))),
            pc.less(batch.column("l_quantity"), pa.scalar(float(Q6_MAX_QTY))),
        )
        batch = batch.filter(keep)
        dpct = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100.0)), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64())
        # price·discount in exact 1e-4 units: cents (1e-2) × percent (1e-2)
        rev4 = pc.sum(pc.multiply(cents, dpct)).as_py() or 0
        return pa.table({"rev4": pa.array([rev4], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    total = sum(r["rev4"] for r in parts.take_all())
    return pa.table({"revenue": pa.array([total / 10000.0], pa.float64())})


def top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with maximum shipped revenue inside
    a three-month window (the "revenue view" + max-subquery pattern; ties
    all surface, as in the spec).

    Scale shape: the window prunes at the read; per-batch integer partials
    collapse per suppkey before the one small exchange (supplier-cardinality
    sized, never lineitem-sized); the max + tie filter and the name lookup
    (supplier is a broadcast-sized dimension) run in the single-task
    finalize.

    Output: (s_suppkey, s_name, total_revenue) for the argmax suppliers,
    ordered by s_suppkey."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp(Q15_WINDOW_LO), pd.Timestamp(Q15_WINDOW_HI)
    names = {
        r["s_suppkey"]: r["s_name"]
        for r in read_table(sf_dir, "supplier",
                            columns=["s_suppkey", "s_name"]).take_all()
    }
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= pads.scalar(lo))
        & (pads.field("l_shipdate") < pads.scalar(hi)),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_suppkey": batch.column("l_suppkey").to_numpy(zero_copy_only=False),
            "rev4": _rev4(batch).to_pandas().to_numpy(),
        }).groupby("l_suppkey", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        best = df["rev4"].max()
        df = df[df["rev4"] == best].copy()
        df["s_name"] = df["l_suppkey"].map(names)
        df["total_revenue"] = df["rev4"] / 10000.0
        df = df.rename(columns={"l_suppkey": "s_suppkey"})
        return df[["s_suppkey", "s_name", "total_revenue"]].sort_values(
            "s_suppkey").reset_index(drop=True)

    return grouped_agg(
        lineitem.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_suppkey"],
        specs=[("rev4", "sum", "rev4")],
        finalize=fin,
    )


# ------------------------------------------ watermark / late-data audit

# Arrival order is the md5-prefix hash of event_id (the suite's H64
# convention) — a deterministic stand-in for network-shuffled ingest, so
# event-time order and arrival order genuinely diverge. 4096 ordered
# arrival buckets (top 12 bits) bound pass-2 group sizes at any scale.
ARRIVAL_BUCKET_SHIFT = 52
LATE_EVENT_DELAY_S = 0  # lag measured against the raw watermark


def late_event_audit(sf_dir: str):
    """Watermark-lag histogram — the sizing analysis every streaming
    pipeline runs before fixing an allowed-lateness bound: replay events in
    (simulated) arrival order, track the running event-time watermark
    (max event time seen STRICTLY BEFORE each arrival), and histogram each
    event's lag behind it, log2-binned, per event type.

    Scale shape (the global_doc_ids two-pass block-offset law applied to a
    prefix MAX instead of a prefix SUM): pass 1 grouped-maxes the tiny
    4096-bucket arrival histogram; the driver prefix-maxes it in bucket
    order and broadcasts the exclusive seed map; pass 2 computes each
    bucket's internal running max locally (one vectorized pass over the
    sorted group) — never a global totally-ordered sort, and only
    (event_type, lag_bin) partials cross the final exchange.

    Output: (event_type, lag_bin, n_events); lag_bin = bit_length(lag_s+1)
    − 1, lag 0 for watermark-current events (including the first arrival)."""
    from ..kernels.sketches import _stable_hash64

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "event_type"])

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        arr = [_stable_hash64(str(i).encode()) for i in ids]
        bucket = [a >> ARRIVAL_BUCKET_SHIFT for a in arr]
        # arrival rides as its 0..2^64 value split into (bucket, low bits)
        # so nothing unsigned crosses an exchange
        low = [a & ((1 << ARRIVAL_BUCKET_SHIFT) - 1) for a in arr]
        tsu = pc.cast(batch.column("ts"), pa.int64())
        return pa.table(
            {"bucket": pa.array(bucket, pa.int64()),
             "arrival_low": pa.array(low, pa.int64()),
             "event_id": batch.column("event_id"),
             "event_type": batch.column("event_type"),
             "tsu": tsu}
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)

    # pass 1: tiny per-bucket max — driver prefix-maxes it in bucket order
    bmax = grouped_agg(keyed_ds, keys=["bucket"], specs=[("mx", "max", "tsu")])
    h = pd.DataFrame(bmax.take_all()).sort_values("bucket").reset_index(drop=True)
    running = h["mx"].cummax().shift(1)  # exclusive: max of all EARLIER buckets
    seeds = {
        int(b): (None if pd.isna(s) else int(s))
        for b, s in zip(h["bucket"], running)
    }
    seed_ref = ray.put(seeds)

    def bucket_lags(group: pa.Table) -> pa.Table:
        seed_map = ray.get(seed_ref)
        df = group.to_pandas().sort_values(
            ["arrival_low", "event_id"], kind="mergesort")
        ts = df["tsu"].to_numpy()
        prev = np.empty(len(ts), dtype=np.float64)
        prev[0] = np.nan
        run = np.maximum.accumulate(ts)
        prev[1:] = run[:-1]
        seed = seed_map.get(int(df["bucket"].iloc[0]))
        if seed is not None:
            prev = np.where(np.isnan(prev), seed, np.maximum(prev, seed))
        lag_us = np.where(np.isnan(prev), 0, np.maximum(prev - ts, 0))
        lag_s = (lag_us // 1_000_000).astype(np.int64)
        bins = np.frompyfunc(lambda v: int(v + 1).bit_length() - 1, 1, 1)(
            lag_s).astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                            "lag_bin": bins})
        out = out.groupby(["event_type", "lag_bin"], as_index=False).size() \
                 .rename(columns={"size": "n_events"})
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_events"] = df["n_events"].astype("int64")
        return df.sort_values(["event_type", "lag_bin"]).reset_index(drop=True)

    return grouped_agg(
        keyed_ds.groupby("bucket").map_groups(bucket_lags, batch_format="pyarrow"),
        keys=["event_type", "lag_bin"],
        specs=[("n_events", "sum", "n_events")],
        finalize=fin,
    )


# ------------------------------------------ view→click attribution join

ATTR_WINDOW_S = 1800
ATTR_PARTS = 64


def click_attribution(sf_dir: str):
    """First-touch attribution: for every 'view' event, the FIRST 'click'
    by the same user strictly after it and within ATTR_WINDOW_S — the
    impression→conversion join every engagement pipeline runs (a windowed
    as-of join in the forward direction).

    Scale shape (the sessionization salted-partition law): only view/click
    rows survive the pruned read; all events of a user co-locate via
    ``user_id % ATTR_PARTS`` so the Python-call count is bounded by
    ATTR_PARTS, not users; inside a part the match is one vectorized
    searchsorted of view timestamps into the (ts, event_id)-sorted click
    array per user run. Only matched pair rows leave the task.

    Output: (view_id, click_id, user_id, gap_s) ordered by view_id."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])

    def prune(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["view", "click"]))
        batch = batch.filter(keep)
        uid = batch.column("user_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(uid % ATTR_PARTS, pa.int64()))

    keyed = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def match_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        out = {"view_id": [], "click_id": [], "user_id": [], "gap_s": []}
        for uid, sub in df.groupby("user_id"):
            clicks = sub[sub["event_type"] == "click"].sort_values(
                ["ts", "event_id"], kind="mergesort")
            views = sub[sub["event_type"] == "view"]
            if clicks.empty or views.empty:
                continue
            cts = clicks["ts"].astype("int64").to_numpy()
            cid = clicks["event_id"].to_numpy()
            vts = views["ts"].astype("int64").to_numpy()
            vid = views["event_id"].to_numpy()
            idx = np.searchsorted(cts, vts, side="right")
            lim = vts + ATTR_WINDOW_S * 1_000_000
            ok = (idx < len(cts))
            hit = np.where(ok, np.minimum(idx, len(cts) - 1), 0)
            ok &= cts[hit] <= lim
            for k in np.flatnonzero(ok):
                out["view_id"].append(int(vid[k]))
                out["click_id"].append(int(cid[idx[k]]))
                out["user_id"].append(int(uid))
                out["gap_s"].append(int((cts[idx[k]] - vts[k]) // 1_000_000))
        return pa.table(
            {"view_id": pa.array(out["view_id"], pa.int64()),
             "click_id": pa.array(out["click_id"], pa.int64()),
             "user_id": pa.array(out["user_id"], pa.int64()),
             "gap_s": pa.array(out["gap_s"], pa.int64())}
        )

    pairs = keyed.groupby("part").map_groups(match_part, batch_format="pyarrow")

    def fin(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("view_id").reset_index(drop=True)
        return from_pandas_clean(df)

    return pairs.repartition(1).map_batches(fin, batch_format="pyarrow")


# -------------------------------------- Bloom-filter semi-join reduction

BLOOM_M = 1 << 16  # bits: ~13% occupancy at sf0.01's 3k urgent keys
BLOOM_K = 3     # hash functions (md5-prefix family, SQL-recomputable)
BLOOM_PRIORITY = "1-URGENT"


def bloom_semijoin_audit(sf_dir: str):
    """Bloom-filter semi-join pre-reduction, audited: build a Bloom filter
    over the qualifying small side (urgent orders), probe every lineitem
    row against it, and report how many fact rows the filter passes vs the
    exact semi-join — the false-positive overhead that decides whether the
    pre-filter pays for itself before a distributed join.

    Scale shape: the filter's DISTINCT bit positions (≤ BLOOM_M rows, a
    CONSTANT) are the only thing reduced from the build side — never the
    key set; the m-bit array broadcasts once (``ray.put``) and each probe
    batch tests vectorized-ish against it, emitting a 3-int partial. The
    exact count reuses the same broadcast key-set ONLY for auditing (at
    real scale the exact side is the join the Bloom filter guards).

    Output: one row (n_exact, n_bloom_pass, n_false_pos)."""
    from ..kernels.sketches import _stable_hash64

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority"])

    def build_positions(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("o_orderpriority"),
                        pa.scalar(BLOOM_PRIORITY))
        keys = batch.filter(keep).column("o_orderkey").to_pylist()
        pos = {
            _stable_hash64(f"{k}|{i}".encode()) % BLOOM_M
            for k in keys for i in range(BLOOM_K)
        }
        return pa.table({"pos": pa.array(sorted(pos), pa.int64())})

    positions = distinct(
        orders.map_batches(build_positions, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["pos"],
    )
    bits = np.zeros(BLOOM_M, dtype=bool)
    for r in positions.take_all():
        bits[r["pos"]] = True
    # audit-only exact key set (the thing the Bloom filter approximates)
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderpriority"),
                                    pa.scalar(BLOOM_PRIORITY)))
        .select(["o_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    exact_keys = frozenset(r["o_orderkey"] for r in urgent.take_all())
    state_ref = ray.put((bits, exact_keys))

    lineitem = read_table(sf_dir, "lineitem", columns=["l_orderkey"])

    def probe(batch: pa.Table) -> pa.Table:
        bset, exact = ray.get(state_ref)
        n_exact = n_pass = 0
        for k in batch.column("l_orderkey").to_pylist():
            ok = all(
                bset[_stable_hash64(f"{k}|{i}".encode()) % BLOOM_M]
                for i in range(BLOOM_K)
            )
            n_pass += ok
            n_exact += k in exact
        return pa.table(
            {"n_exact": pa.array([n_exact], pa.int64()),
             "n_pass": pa.array([n_pass], pa.int64())}
        )

    parts = lineitem.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n_exact = sum(r["n_exact"] for r in parts)
    n_pass = sum(r["n_pass"] for r in parts)
    return pa.table(
        {"n_exact": pa.array([n_exact], pa.int64()),
         "n_bloom_pass": pa.array([n_pass], pa.int64()),
         "n_false_pos": pa.array([n_pass - n_exact], pa.int64())}
    )


CONCURRENCY_WINDOW_MIN = 30


def peak_concurrency(sf_dir: str):
    """Interval max-overlap sweep-line: each event opens a half-open
    activity interval [ts, ts+30min) clipped at its day's midnight; per
    (event_type, day), report the PEAK number of simultaneously open
    intervals — the capacity-planning headline no plain groupby expresses
    (the answer lives between rows, at the prefix-sum maximum of the
    endpoint stream).

    Scale shape: the endpoint expansion (2 rows per event: +1 at start,
    −1 at clipped end) happens vectorized inside map_batches; only
    (type, day, t, ±1) tuples cross ONE exchange keyed by the aggregation
    key itself, and each group resolves with a single lexsort + cumsum +
    max — no per-event Python, groups are (type × day)-grained so the
    sweep parallelizes across the calendar. Day-clipping makes groups
    independent (no interval spans two groups), which is exactly what
    makes the sweep distributable without a serial global pass.

    Tie semantics (half-open): at equal t, −1 sorts before +1, so an
    interval ending at t never overlaps one starting at t.

    Output: (event_type, day, n_events, peak_concurrent)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def endpoints(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day = df["ts"].dt.strftime("%Y-%m-%d")
        start = df["ts"]
        end = (start + pd.Timedelta(minutes=CONCURRENCY_WINDOW_MIN)).clip(
            upper=start.dt.normalize() + pd.Timedelta(days=1)
        )
        n = len(df)
        return pa.table(
            {"event_type": pa.array(
                 pd.concat([df["event_type"], df["event_type"]]), pa.string()),
             "day": pa.array(pd.concat([day, day]), pa.string()),
             "t": pa.Array.from_pandas(
                 pd.concat([start, end]), type=pa.timestamp("us")),
             "delta": pa.array(
                 np.concatenate([np.ones(n, np.int64), -np.ones(n, np.int64)]),
                 pa.int64())}
        )

    pts = ds.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)

    def sweep(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        order = np.lexsort((df["delta"].to_numpy(), df["t"].to_numpy()))
        deltas = df["delta"].to_numpy()[order]
        peak = int(np.cumsum(deltas).max())
        return pa.table(
            {"event_type": pa.array([df["event_type"].iloc[0]], pa.string()),
             "day": pa.array([df["day"].iloc[0]], pa.string()),
             "n_events": pa.array([int((deltas == 1).sum())], pa.int64()),
             "peak_concurrent": pa.array([peak], pa.int64())}
        )

    return pts.groupby(["event_type", "day"]).map_groups(
        sweep, batch_format="pyarrow")


Q9_TYPE = "LARGE"


def product_profit(sf_dir: str):
    """TPC-H Q9 shape (adapted — no partsupp table in this schema, so the
    per-part supply cost is the part's retail price): profit on Q9_TYPE
    parts per supplier nation per order year, profit = Σ price·(1−disc)
    − retail·qty (reference parity target: the amount-per-nation/year
    rollup of TPC-H Q9).

    Scale shape: both dimension arms are ray.put ONCE — partkey→retail
    cents for the qualifying type (a dict, part is small) and suppkey→
    nation key; the lineitem scan filters to qualifying parts and
    partial-aggregates exact int64 profit (1e-4 units: rev4 − retail_cents
    ·qty·100) per (orderkey, nation) BEFORE the single co-partitioned hash
    join with the 2-column (orderkey, year) orders stream; a tiny grouped
    sum per (nation, year) finishes. The only all-to-all carries one row
    per (order × nation), never a lineitem row.

    Output: (nation, o_year, sum_profit) ordered by nation, o_year DESC."""
    from .common import choose_join_parts

    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).take_all()
    }
    retail = {
        r["p_partkey"]: int(round(r["p_retailprice"] * 100))
        for r in read_table(sf_dir, "part", columns=["p_partkey", "p_type", "p_retailprice"])
        .filter(lambda r: r["p_type"] == Q9_TYPE).take_all()
    }
    supp_nation = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).take_all()
    }
    retail_ref, supp_ref = ray.put(retail), ray.put(supp_nation)

    lineitem = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_quantity", "l_extendedprice", "l_discount"],
    )

    def profit_partial(batch: pa.Table) -> pa.Table:
        # sorted-key arrays → searchsorted lookups: no per-row Python on
        # the fact scan (the dicts are plasma-cached; the array views are
        # rebuilt per batch from the shared dict, O(|dim|) « O(batch))
        rmap, smap = ray.get(retail_ref), ray.get(supp_ref)
        rkeys = np.fromiter(rmap.keys(), dtype=np.int64, count=len(rmap))
        rvals = np.fromiter(rmap.values(), dtype=np.int64, count=len(rmap))
        order = np.argsort(rkeys)
        rkeys, rvals = rkeys[order], rvals[order]
        parts = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rkeys, parts)
        pos[pos >= len(rkeys)] = 0
        keep = rkeys[pos] == parts
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "nation_key": pa.array([], pa.int64()),
                 "profit4": pa.array([], pa.int64())}
            )
        rcents = rvals[pos[keep]]
        skeys = np.fromiter(smap.keys(), dtype=np.int64, count=len(smap))
        svals = np.fromiter(smap.values(), dtype=np.int64, count=len(smap))
        sorder = np.argsort(skeys)
        skeys, svals = skeys[sorder], svals[sorder]
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        nk = svals[np.searchsorted(skeys, supp)]
        qty = np.rint(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        rev4 = _rev4(batch).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"l_orderkey": batch.column("l_orderkey").to_numpy(zero_copy_only=False),
             "nation_key": nk,
             "profit4": rev4 - rcents * qty * 100}
        ).groupby(["l_orderkey", "nation_key"], as_index=False)["profit4"].sum()
        return from_pandas_clean(df)

    profit = grouped_agg(
        lineitem.map_batches(profit_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey", "nation_key"],
        specs=[("profit4", "sum", "profit4")],
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def order_year(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": batch.column("o_orderkey"),
             "o_year": pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())}
        )

    orders = orders.map_batches(order_year, batch_format="pyarrow", zero_copy_batch=True)

    joined = profit.join(
        orders, join_type="inner",
        num_partitions=choose_join_parts(sf_dir, "orders", "lineitem", floor=4),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["nation"] = df["nation_key"].map(nations)
        # exact int / 10000.0 is the same double on both sides
        df["sum_profit"] = df["profit4"].astype("float64") / 10000.0
        return df.sort_values(
            ["nation", "o_year"], ascending=[True, False]
        ).reset_index(drop=True)[["nation", "o_year", "sum_profit"]]

    return grouped_agg(
        joined, keys=["nation_key", "o_year"],
        specs=[("profit4", "sum", "profit4")],
        finalize=fin,
    )


def benford_audit(sf_dir: str):
    """Benford's-law first-digit audit over order totals — the classic
    fraud/synthetic-data screen: the count and share of orders whose total
    price starts with each significant digit 1–9 (natural multi-scale
    amounts follow log10(1+1/d); flat or spiked digit profiles flag
    generated or clipped value columns — exactly this corpus, whose
    uniform totals are a textbook Benford violation the audit surfaces).

    Exactness contract: the digit comes from floor(o_totalprice) (exact in
    doubles) reduced by repeated integer division — no log10, whose
    boundary ulps could disagree with the SQL twin's string cast. Shares
    are one exact int/int division per digit in finalize.

    Scale shape: a pruned single-column scan with per-batch digit
    bincounts; only ≤9 partial rows per batch cross the one tiny exchange.

    Output: (digit, n_orders, share) ordered by digit."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        # reduce to the leading digit: ~6 vectorized passes, no strings
        while (v >= 10).any():
            big = v >= 10
            v[big] //= 10
        counts = np.bincount(v, minlength=10)[1:10]
        nz = np.nonzero(counts)[0]
        return pa.table(
            {"digit": pa.array((nz + 1).astype(np.int64), pa.int64()),
             "n_orders": pa.array(counts[nz].astype(np.int64), pa.int64())}
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["n_orders"].sum())
        df["share"] = df["n_orders"].astype("float64") / float(total)
        return df.sort_values("digit").reset_index(drop=True)[
            ["digit", "n_orders", "share"]]

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["digit"],
        specs=[("n_orders", "sum", "n_orders")],
        finalize=fin,
    )


def user_active_coverage(sf_dir: str):
    """Interval-union measure per user (Klee's problem, the sibling of
    peak_concurrency's max-overlap): each event opens [ts, ts+30min)
    clipped at midnight; per user, merge overlapping intervals into
    islands and report how much wall-clock the user was actually active —
    the engagement denominator a session-quality metric divides by (raw
    event counts double-count overlap; the union does not).

    Tie/merge semantics (shared with the twin): intervals sorted by
    (start, end); a new island starts strictly after the running max end,
    so touching intervals ([a,b) then [b,c)) merge. covered_us is an
    exact int64 sum of microsecond spans.

    Scale shape: one exchange keyed by user_id (the aggregation key);
    each group resolves with one lexsort + running max + flag cumsum —
    vectorized per group, never per event.

    Output: (user_id, n_events, n_islands, covered_us) ordered by user."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def intervals(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        start = df["ts"]
        end = (start + pd.Timedelta(minutes=CONCURRENCY_WINDOW_MIN)).clip(
            upper=start.dt.normalize() + pd.Timedelta(days=1))
        return pa.table(
            {"user_id": pa.array(df["user_id"], pa.int64()),
             "s": pa.Array.from_pandas(start, type=pa.timestamp("us")),
             "e": pa.Array.from_pandas(end, type=pa.timestamp("us"))}
        )

    pts = ds.map_batches(intervals, batch_format="pyarrow", zero_copy_batch=True)

    def per_user(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        s = df["s"].to_numpy().astype("datetime64[us]").view("int64")
        e = df["e"].to_numpy().astype("datetime64[us]").view("int64")
        order = np.lexsort((e, s))
        s, e = s[order], e[order]
        run_max = np.maximum.accumulate(e)
        new_island = np.ones(len(s), dtype=bool)
        new_island[1:] = s[1:] > run_max[:-1]
        gid = np.cumsum(new_island) - 1
        g = pd.DataFrame({"gid": gid, "s": s, "e": e}).groupby("gid").agg(
            gs=("s", "min"), ge=("e", "max"))
        covered = int((g["ge"] - g["gs"]).sum())
        return pa.table(
            {"user_id": pa.array([int(df["user_id"].iloc[0])], pa.int64()),
             "n_events": pa.array([len(s)], pa.int64()),
             "n_islands": pa.array([len(g)], pa.int64()),
             "covered_us": pa.array([covered], pa.int64())}
        )

    out = pts.groupby("user_id").map_groups(per_user, batch_format="pyarrow")

    def fin(batch: pa.Table) -> pa.Table:
        from .common import from_pandas_clean

        return from_pandas_clean(
            batch.to_pandas().sort_values("user_id").reset_index(drop=True))

    return out.repartition(1).map_batches(fin, batch_format="pyarrow", batch_size=None)


def max_value_schedule(sf_dir: str):
    """Weighted interval scheduling per user (the textbook DP): each event
    is an interval [ts, ts+30min) clipped at midnight carrying its value;
    per user, the maximum total value of a NON-OVERLAPPING subset — the
    yield-optimization shape (ad slots, compute reservations, crawl
    politeness windows) that no windowed aggregate expresses, because the
    optimum couples every interval to its latest-compatible predecessor.

    DP contract (shared with the recursive-CTE twin): intervals sorted by
    (end, start, event_id); p(i) = count of intervals ending ≤ start_i
    (half-open: touching is compatible); dp[i] = max(dp[i−1], v_i +
    dp[p(i)]); values in exact integer cents.

    Scale shape: ONE exchange keyed by user_id; each group runs the
    sequential DP over its own (sorted) intervals — the recurrence is
    inherently order-dependent, so per-group sequential IS the correct
    parallel grain (users are independent; the classic span-vs-work
    tradeoff). searchsorted supplies all p(i) vectorized before the loop.

    Output: (user_id, n_events, best_value_cents) ordered by user."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def intervals(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        start = df["ts"]
        end = (start + pd.Timedelta(minutes=CONCURRENCY_WINDOW_MIN)).clip(
            upper=start.dt.normalize() + pd.Timedelta(days=1))
        return pa.table(
            {"user_id": pa.array(df["user_id"], pa.int64()),
             "event_id": pa.array(df["event_id"], pa.int64()),
             "s": pa.Array.from_pandas(start, type=pa.timestamp("us")),
             "e": pa.Array.from_pandas(end, type=pa.timestamp("us")),
             "v": pa.array(np.rint(df["value"].to_numpy() * 100).astype(np.int64),
                           pa.int64())}
        )

    pts = ds.map_batches(intervals, batch_format="pyarrow", zero_copy_batch=True)

    def per_user(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        s = df["s"].to_numpy().astype("datetime64[us]").view("int64")
        e = df["e"].to_numpy().astype("datetime64[us]").view("int64")
        v = df["v"].to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, s, e))
        s, e, v = s[order], e[order], v[order]
        # p(i): how many intervals (in end order) end <= s_i
        p = np.searchsorted(e, s, side="right")
        dp = np.zeros(len(s) + 1, dtype=np.int64)
        for i in range(1, len(s) + 1):
            dp[i] = max(dp[i - 1], v[i - 1] + dp[p[i - 1]])
        return pa.table(
            {"user_id": pa.array([int(df["user_id"].iloc[0])], pa.int64()),
             "n_events": pa.array([len(s)], pa.int64()),
             "best_value_cents": pa.array([int(dp[-1])], pa.int64())}
        )

    out = pts.groupby("user_id").map_groups(per_user, batch_format="pyarrow")

    def fin(batch: pa.Table) -> pa.Table:
        from .common import from_pandas_clean

        return from_pandas_clean(
            batch.to_pandas().sort_values("user_id").reset_index(drop=True))

    return out.repartition(1).map_batches(fin, batch_format="pyarrow", batch_size=None)


def event_burstiness(sf_dir: str):
    """Per-type burstiness of daily event volume — the Fano factor
    (variance/mean of daily counts; 1 = Poisson-like arrivals, ≫1 = bursty
    campaign traffic, ≪1 = metronomic bots): the one-number arrival-process
    screen a pipeline operator reads before trusting per-day capacity
    plans.

    Exactness contract: Fano = (n·Σc² − (Σc)²) / (n·Σc) over observed
    days' integer daily counts (biased variance) — exact int64 moments,
    ONE shared int→double division.

    Scale shape: daily counts are a combiner-collapsed (type, day) rollup;
    the moment pass runs over that tiny table. Days with zero events are
    not observed rows and are excluded by construction (documented).

    Output: (event_type, n_days, n_events, fano) ordered by type."""
    from .common import from_pandas_clean, grouped_agg

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def day_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {"event_type": df["event_type"],
             "day": df["ts"].dt.strftime("%Y-%m-%d")}
        ).groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "c"})
        return from_pandas_clean(out)

    daily = grouped_agg(
        ds.map_batches(day_rows, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type", "day"],
        specs=[("c", "sum", "c")],
    )

    def fin_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["s2"] = df["c"] * df["c"]
        g = df.groupby("event_type", as_index=False).agg(
            n_days=("c", "size"), n_events=("c", "sum"), s2=("s2", "sum"))
        n = g["n_days"].astype("int64")
        s1 = g["n_events"].astype("int64")
        s2 = g["s2"].astype("int64")
        g["fano"] = (n * s2 - s1 * s1).astype("float64") / (n * s1).astype("float64")
        return from_pandas_clean(
            g[["event_type", "n_days", "n_events", "fano"]].sort_values(
                "event_type").reset_index(drop=True))

    return daily.repartition(1).map_batches(
        fin_rows, batch_format="pyarrow", batch_size=None)


PARETO_TARGET_PCT = 80


def pareto_concentration(sf_dir: str):
    """Revenue concentration point (the '80/20' audit): the SMALLEST
    number of customers whose summed order revenue reaches
    PARETO_TARGET_PCT% of the total, customers taken in (revenue DESC,
    custkey ASC) order — the one-number concentration readout next to
    source_gini's curve-shape coefficient.

    Exactness contract: revenue in integer cents; the crossing test is
    cum·100 >= target·total (cross-multiplied ints, no percentage
    floats); share reported as one exact int→double division.

    Scale shape: per-customer revenue is a combiner-collapsed rollup;
    the concentration sweep runs over the DESCENDING-sorted per-customer
    cents on the driver — customer-dimension-sized, the same driver
    budget as the nations/offsets maps used elsewhere. (At a truly
    unbounded customer count the same sweep runs over a cents-value
    histogram; the synth dimension makes that indirection pointless.)

    Output: one row (n_top_customers, n_customers, revenue_share)."""
    import numpy as np

    from .common import grouped_agg

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_custkey": batch.column("o_custkey").to_numpy(zero_copy_only=False),
             "cents": np.rint(
                 batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
             ).astype(np.int64)}
        ).groupby("o_custkey", as_index=False)["cents"].sum()
        return from_pandas_clean(df)

    per_cust = grouped_agg(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_custkey"], specs=[("cents", "sum", "cents")],
    ).take_all()

    per_cust.sort(key=lambda r: (-r["cents"], r["o_custkey"]))
    cents = np.array([r["cents"] for r in per_cust], dtype=np.int64)
    total = int(cents.sum())
    cum = np.cumsum(cents)
    # smallest m with cum[m-1]*100 >= target*total (exact integers)
    m = int(np.searchsorted(cum * 100, PARETO_TARGET_PCT * total, side="left")) + 1
    share = float(int(cum[m - 1])) / float(total) if total else 0.0
    return ray.data.from_arrow(pa.table(
        {"n_top_customers": pa.array([m], pa.int64()),
         "n_customers": pa.array([len(cents)], pa.int64()),
         "revenue_share": pa.array([share], pa.float64())}
    ))


# ----------------------------------- Q2-flavored cheapest supplier argmin

# (unit_milli, suppkey) packed into ONE int64 so the per-part argmin is a
# single grouped Min (the dedup_winners composite-key discipline): packed =
# unit_milli << 21 | suppkey. unit_milli = price in 0.1-cent units per
# quantity unit (exact integer division), bounded by 2^42; suppkey must fit
# 21 bits (2.1M — far above the synthetic dimension; a larger supplier
# universe needs a wider packing and the encoder raises loudly).
SUPPKEY_BITS = 21


def cheapest_supplier_per_part(sf_dir: str):
    """Per-part cheapest shipping supplier (TPC-H Q2's min-cost-supplier
    shape, adapted: the schema carries no partsupp, so the observed unit
    price l_extendedprice / l_quantity over shipped lineitems plays the
    supplycost role).

    Exactness contract: unit price quantized as (cents·10) // qty — an
    exact integer division both engines perform identically (all values
    positive); the (unit, suppkey) argmin is a grouped Min over the packed
    composite, so ties break to the lowest suppkey deterministically.

    Scale shape: per-batch partials collapse to one row per (part, block)
    before the part-keyed exchange (part-dimension sized, never
    lineitem-sized); supplier->name and nation->name are broadcast-sized
    dimension maps applied in the single-task finalize.

    Output: (p_partkey, s_suppkey, s_name, nation, unit_price) ordered by
    p_partkey."""
    sup = {
        r["s_suppkey"]: (r["s_name"], r["s_nationkey"])
        for r in read_table(
            sf_dir, "supplier",
            columns=["s_suppkey", "s_name", "s_nationkey"]).take_all()
    }
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(sf_dir, "nation",
                            columns=["n_nationkey", "n_name"]).take_all()
    }
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        qty = np.rint(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        um = (cents * 10) // qty
        if int(um.max(initial=0)) >= (1 << (63 - SUPPKEY_BITS)) or int(
                supp.max(initial=0)) >= (1 << SUPPKEY_BITS):
            raise ValueError("cheapest_supplier_per_part: packing overflow "
                             "(widen SUPPKEY_BITS for this universe)")
        packed = (um << SUPPKEY_BITS) | supp
        df = pd.DataFrame(
            {"p_partkey": batch.column("l_partkey").to_numpy(zero_copy_only=False),
             "packed": packed}
        ).groupby("p_partkey", as_index=False)["packed"].min()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        packed = df["packed"].to_numpy()
        um = packed >> SUPPKEY_BITS
        supp = packed & ((1 << SUPPKEY_BITS) - 1)
        out = pd.DataFrame({
            "p_partkey": df["p_partkey"],
            "s_suppkey": supp,
            "s_name": [sup[k][0] for k in supp],
            "nation": [nations[sup[k][1]] for k in supp],
            "unit_price": um.astype("float64") / 1000.0,
        })
        return out.sort_values("p_partkey").reset_index(drop=True)

    return grouped_agg(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["p_partkey"],
        specs=[("packed", "min", "packed")],
        finalize=fin,
    )


# --------------------------------------------- CUSUM drift changepoints

# Alarm when the positive CUSUM exceeds CUSUM_ALARM_PCT% of one mean day's
# revenue — the cross-multiplied integer test S·100 > pct·total.
CUSUM_ALARM_PCT = 20


def cusum_changepoints(sf_dir: str):
    """Per-event-type CUSUM drift detector over daily revenue (Page 1954):
    S_i = max(0, S_{i-1} + x_i − mean). Computed exactly via the prefix
    closed form — with D_i = n·x_i − total (all exact ints, the n-scaling
    clears the mean's division), P = cumsum(D), S_i = P_i − min(0,
    min_{j≤i} P_j); the recursion and the closed form are identical by
    induction, and every comparison stays in integers.

    Scale shape: the only exchange is the (type, day)-keyed grouped sum of
    per-batch integer partials; the scan runs on the driver over the tiny
    (days × types) frame — the same post-aggregate budget as
    pareto_concentration. Alarm test is cross-multiplied ints; the reported
    cusum is ONE int→double division (S / (n·100)), identical in SQL.

    Output: (event_type, day, cusum, alarm) ordered by (event_type, day)."""

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "day": pc.strftime(batch.column("ts"), format="%Y-%m-%d").to_pandas(),
            "c": np.rint(
                batch.column("value").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64),
        }).groupby(["event_type", "day"], as_index=False)["c"].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.sort_values(["event_type", "day"]).groupby(
                "event_type", sort=True):
            c = [int(v) for v in g["c"]]  # python ints: n·x − total is exact
            n, total = len(c), sum(c)
            run, lo, s = 0, 0, []
            for x in c:
                run += n * x - total
                lo = min(lo, run)
                s.append(run - lo)
            for day, sv in zip(g["day"], s):
                rows.append({
                    "event_type": etype, "day": day,
                    "cusum": float(sv) / (n * 100.0),
                    "alarm": sv * 100 > CUSUM_ALARM_PCT * total,
                })
        return pd.DataFrame(rows)

    return grouped_agg(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type", "day"],
        specs=[("c", "sum", "c")],
        finalize=fin,
    )


# ---------------------------------------- exact higher-moment statistics

# Dollar-quantized values (cents // 100): |x| ≤ 2·10^4 keeps x⁴ ≤ 1.6e17
# ELEMENTWISE-exact in int64; the SUMS travel as base-2³¹ (hi, lo) limb
# pairs, each provably wrap-free (lo < 2³¹ per row; hi ≤ x⁴ >> 31), so no
# batch size or partial count can silently wrap a power sum — the finalize
# reconstructs the exact Python-int totals and raises loudly near the
# representable bound instead of computing garbage.
# With s3/s4 limbed, the binding int64 constraint is the PLAIN s2 column:
# (Σx²)² ≤ n·Σx⁴ (power mean), so s2 is provably exact while n·S4 ≤ 2¹²⁴
# (keeps s2 ≤ 2⁶², a 2× margin under int64) — checked in finalize against
# the exact limb-reconstructed S4 before s2 is trusted.
MOMENT_NS4_GUARD = 1 << 124
_MOMENT_MASK = (1 << 31) - 1


def value_moments(sf_dir: str):
    """Per-event-type skewness and excess kurtosis of the (dollar-
    quantized) value distribution — the tail-shape audit next to
    daily_event_anomalies' z-scores: heavy-tailed event types need
    different outlier gates than symmetric ones.

    Exactness contract: x = cents // 100 (exact floor both sides); the
    four raw power sums are exact — s1/s2 as int64 (provably in-range
    under the finalize guard), s3/s4 as base-2³¹ limb pairs immune to
    int64 wrap at ANY admitted batch/corpus size; the central-moment
    numerators
    n²s3−3ns1s2+2s1³ and n³s4−4n²s1s3+6ns1²s2−3s1⁴ are unbounded-int
    (HUGEINT in SQL, Python int here); skew/kurtosis are the identical
    float expression chains over those exact integers.

    Scale shape: per-batch integer partials collapse per type before the
    tiny exchange; the moment algebra runs once over the per-type frame.

    Output: (event_type, n_events, mean_value, skewness, kurtosis)."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        x = cents // 100
        if x.size and int(np.abs(x).max()) > 20_000:
            # |x| (not x.max(): large-magnitude NEGATIVES wrap x³/x⁴ too —
            # the round-4 ADVICE hole) must keep x⁴ ≤ 1.6e17 elementwise
            raise ValueError("value_moments: value out of quantization "
                             "range for int64 power sums")
        # x³/x⁴ ship as base-2³¹ limb pairs: a single batch of ≥58 rows at
        # |x|=20000 wraps a plain int64 Σx⁴ (ADVICE r04), and a wrapped
        # partial can sneak under the finalize guard. Per-limb sums are
        # provably wrap-free for any batch ≤ 2³¹ rows (lo < 2³¹ each; hi
        # ≤ x⁴>>31 ≈ 7.5e7 each); the group carry re-normalizes so the
        # emitted pair is exactly (S >> 31, S & mask) of the exact sum.
        x3 = x * x * x
        x4 = x3 * x  # |x3| ≤ 8e12, x4 ≤ 1.6e17: elementwise-exact int64
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "pc": 1, "n": 1, "s1": x, "s2": x * x,
            "s3_hi": x3 >> 31, "s3_lo": x3 & _MOMENT_MASK,
            "s4_hi": x4 >> 31, "s4_lo": x4 & _MOMENT_MASK,
        }).groupby("event_type", as_index=False).sum()
        df["pc"] = 1  # one partial ROW per (type, batch) after the collapse
        for c in ("s3", "s4"):
            lo = df[f"{c}_lo"].to_numpy()
            df[f"{c}_hi"] = df[f"{c}_hi"].to_numpy() + (lo >> 31)
            df[f"{c}_lo"] = lo & _MOMENT_MASK
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in df.sort_values("event_type").itertuples():
            n, s1, s2 = int(r.n), int(r.s1), int(r.s2)
            # wrap-proof bounds, checked BEFORE trusting any reconstruction:
            # P ≤ 2³¹ partials keeps Σlo ≤ 2⁶²; n ≤ 1e11 keeps Σhi ≤ 7.5e18
            # (ΣS4 ≤ n·(2e4)⁴ = 1.6e28, >>31 fits int64). Beyond either, the
            # limb sums themselves could wrap, so raise instead of computing.
            if int(r.pc) > (1 << 31) or n > 100_000_000_000:
                raise ValueError("value_moments: partial-count/row bounds "
                                 "exceeded — wider accumulators required "
                                 "at this scale")
            s3 = (int(r.s3_hi) << 31) + int(r.s3_lo)
            s4 = (int(r.s4_hi) << 31) + int(r.s4_lo)
            if n * s4 > MOMENT_NS4_GUARD:
                # within the guard, the plain-column sums fit int64 by the
                # power-mean chain (s2 ≤ √(n·s4) ≤ 2⁶², |s1| ≤ √(n·s2)),
                # and the s3 limb magnitudes stay bounded via |Σx³| ≤
                # √(s2·s4) — so every emitted value above is exact
                raise ValueError("value_moments: n·Σx⁴ past the s2 int64 "
                                 "exactness bound — split accumulators "
                                 "required at this scale")
            num2 = n * s2 - s1 * s1
            num3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
            num4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
                    + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
            m2 = float(num2) / float(n * n)
            skew = ((float(num3) / float(n ** 3)) / m2 ** 1.5
                    if num2 > 0 else 0.0)
            kurt = ((float(num4) / float(n ** 4)) / (m2 * m2) - 3.0
                    if num2 > 0 else 0.0)
            rows.append({
                "event_type": r.event_type, "n_events": n,
                "mean_value": float(s1) / float(n),
                "skewness": skew, "kurtosis": kurt,
            })
        return pd.DataFrame(rows)

    return grouped_agg(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type"],
        specs=[("pc", "sum", "pc"), ("n", "sum", "n"), ("s1", "sum", "s1"),
               ("s2", "sum", "s2"),
               ("s3_hi", "sum", "s3_hi"), ("s3_lo", "sum", "s3_lo"),
               ("s4_hi", "sum", "s4_hi"), ("s4_lo", "sum", "s4_lo")],
        finalize=fin,
    )


def value_mad(sf_dir: str):
    """Per-event-type median absolute deviation of value cents — the
    robust spread statistic (outlier-immune, unlike value_moments'
    variance-family measures), computed EXACTLY and scale-safely from one
    value histogram: per-batch (type, cents) counts collapse into a
    distinct-value-sized exchange; both medians are lower-nearest-rank
    picks (smallest v with cum ≥ (n+1)//2) over that histogram — the
    deviation histogram is derived from the value histogram on the
    driver, so the data is scanned ONCE (the length_percentiles
    discipline, keyed by type).

    Output: (event_type, n_events, median_cents, mad_cents)."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def hist(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(), "v": cents,
        }).groupby(["event_type", "v"], as_index=False).size().rename(
            columns={"size": "c"})
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in df.sort_values(["event_type", "v"]).groupby(
                "event_type", sort=True):
            vs = g["v"].to_numpy()
            cs = g["c"].to_numpy()
            n = int(cs.sum())
            rank = (n + 1) // 2
            cum = np.cumsum(cs)
            med = int(vs[np.searchsorted(cum, rank, side="left")])
            dev = pd.DataFrame({"d": np.abs(vs - med), "c": cs}).groupby(
                "d", as_index=False)["c"].sum().sort_values("d")
            dcum = np.cumsum(dev["c"].to_numpy())
            mad = int(dev["d"].to_numpy()[
                np.searchsorted(dcum, rank, side="left")])
            rows.append({"event_type": etype, "n_events": n,
                         "median_cents": med, "mad_cents": mad})
        return pd.DataFrame(rows)

    return grouped_agg(
        ev.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type", "v"],
        specs=[("c", "sum", "c")],
        finalize=fin,
    )


def parts_never_shipped(sf_dir: str):
    """Dimension rows with no facts: parts that never appear in lineitem
    (the reverse direction of referential_audit's fact→dimension checks) —
    the dead-inventory anti-join.

    Scale shape: a broadcast-hash ANTI-join — the shipped-partkey side is
    bounded by the part DIMENSION (distinct keys ≤ |part|), so it
    collapses via per-block distinct, ships once with ray.put, and the
    part scan filters against it shuffle-free (the J1 discipline; a
    co-partitioned join here pays an exchange to move a dimension-sized
    set, measured 4x slower at sf0.01).

    Output: (p_partkey, p_brand, p_type, p_retailprice) ordered."""
    shipped_rows = distinct(
        read_table(sf_dir, "lineitem", columns=["l_partkey"]).map_batches(
            lambda b: b.group_by(["l_partkey"]).aggregate([]),
            batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"],
    ).take_all()
    shipped_ref = ray.put(frozenset(r["l_partkey"] for r in shipped_rows))

    part = read_table(
        sf_dir, "part",
        columns=["p_partkey", "p_brand", "p_type", "p_retailprice"])

    def fin(batch: pa.Table, _s=shipped_ref) -> pa.Table:
        shipped = ray.get(_s)
        keep = pa.array(
            [k not in shipped for k in batch.column("p_partkey").to_pylist()],
            pa.bool_(),
        )
        return batch.filter(keep)

    out = part.map_batches(
        fin, batch_format="pyarrow", zero_copy_batch=True).sort("p_partkey")
    # materialized + typed: on tiers where every part shipped this is
    # legally 0 rows, and only a pa.Table keeps its schema through the
    # driver's conversion (CORRECTNESS_r04 schema fail — a zero-row seed
    # union was not enough, the gate never consults Dataset.schema()).
    # The dtypes come from the INPUT file, not hand-typing.
    from .common import clean_read_schema, small_table

    return small_table(out, clean_read_schema(
        f"{sf_dir}/part.parquet",
        ["p_partkey", "p_brand", "p_type", "p_retailprice"]))


# ------------------------------------------------- Q10 returned-revenue

Q10_TOP_K = 20


def q10_returned_customers(sf_dir: str):
    """Top customers by revenue lost to returned items (TPC-H Q10's
    shape, widened from one quarter to the full window): lineitems with
    l_returnflag = 'R', revenue rolled up per customer, top Q10_TOP_K by
    (revenue DESC, custkey).

    Scale shape: the returned lineitems collapse to per-(orderkey, block)
    integer partials before ONE co-partitioned join against orders
    (fact-to-fact on orderkey — orders is NOT broadcastable at crawl
    scale); the per-customer rollup is a second grouped sum;
    customer/nation names are broadcast dimensions applied in the
    single-task finalize. Revenue stays exact 1e-4 ints until one final
    division.

    Output: (c_custkey, c_name, nation, revenue) ordered by revenue DESC,
    custkey."""
    from .common import choose_join_parts

    cust = {
        r["c_custkey"]: (r["c_name"], r["c_nationkey"])
        for r in read_table(sf_dir, "customer",
                            columns=["c_custkey", "c_name", "c_nationkey"]
                            ).take_all()
    }
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(sf_dir, "nation",
                            columns=["n_nationkey", "n_name"]).take_all()
    }

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("l_returnflag"), "R")
        batch = batch.filter(mask)
        df = pd.DataFrame({
            "l_orderkey": batch.column("l_orderkey").to_numpy(zero_copy_only=False),
            "rev4": _rev4(batch).to_pandas().to_numpy(),
        }).groupby("l_orderkey", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    per_order = grouped_agg(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey"], specs=[("rev4", "sum", "rev4")],
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    parts = max(4, choose_join_parts(sf_dir, "lineitem", "orders"))
    joined = per_order.join(
        orders, join_type="inner", num_partitions=parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("o_custkey", as_index=False)["rev4"].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rev4", "o_custkey"],
                            ascending=[False, True]).head(Q10_TOP_K)
        out = pd.DataFrame({
            "c_custkey": df["o_custkey"],
            "c_name": [cust[k][0] for k in df["o_custkey"]],
            "nation": [nations[cust[k][1]] for k in df["o_custkey"]],
            "revenue": df["rev4"].astype("float64") / 10000.0,
        })
        return out.reset_index(drop=True)

    return grouped_agg(
        joined.map_batches(cust_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        keys=["o_custkey"], specs=[("rev4", "sum", "rev4")],
        finalize=fin,
    )


# -------------------------------------------- small-files compaction plan

COMPACT_DOCS_PER_FILE = 10
COMPACT_TARGET_CHARS = 40_000


def shard_compaction_plan(sf_dir: str):
    """Small-files compaction planner: documents roll up into fixed
    doc-id-bucketed "files" (doc_id // COMPACT_DOCS_PER_FILE), and the
    planner assigns files, in file order, to output groups by greedy
    sequential coalescing — a group closes as soon as its accumulated
    bytes reach COMPACT_TARGET_CHARS. The everyday lakehouse maintenance
    op (Iceberg/Delta compaction) expressed over the corpus.

    Exactness: sizes are exact int sums; the greedy scan is a lockstep
    recursion replayed by the SQL oracle as a recursive CTE (the
    max_value_schedule discipline) — the plan is bit-identical by
    construction, no floats anywhere.

    Scale shape: the corpus collapses to file-bucket sizes via one grouped
    sum (file-count-sized); the scan runs on the driver over that tiny
    frame. (A truly unbounded file list plans per key-range partition and
    concatenates — the boundary files per range are the only cross-range
    coupling.)

    Output: (file_id, bytes, group_id) ordered by file_id."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "file_id": ids // COMPACT_DOCS_PER_FILE,
            "bytes": batch.column("n_chars").to_numpy(zero_copy_only=False),
        }).groupby("file_id", as_index=False)["bytes"].sum()
        return from_pandas_clean(df)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("file_id").reset_index(drop=True)
        gids = []
        gid, cum = 0, 0
        for b in df["bytes"]:
            gids.append(gid)
            cum += int(b)
            if cum >= COMPACT_TARGET_CHARS:
                gid += 1
                cum = 0
        df["group_id"] = pd.Series(gids, dtype="int64")
        return df[["file_id", "bytes", "group_id"]]

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["file_id"], specs=[("bytes", "sum", "bytes")],
        finalize=fin,
    )


# --------------------------------------- Markov stationary distribution

# Quantized power iteration: the probability vector is carried as exact
# int64 mass out of MARKOV_SCALE, each round's flow is the per-term floor
# division (v·c)//r summed exactly — deterministic and order-free, so the
# unrolled SQL twin reproduces it bit-for-bit. Dangling types keep their
# mass (self-loop rule).
MARKOV_SCALE = 1 << 40
MARKOV_POWER_ROUNDS = 8


def markov_power_iterate(
    types: list[str],
    counts: dict[tuple[str, str], int],
    rounds: int = MARKOV_POWER_ROUNDS,
) -> dict[str, int]:
    """The quantized iteration shared by the engine (and mirrored, term
    for term, by the unrolled oracle CTEs): v0 = MARKOV_SCALE // T per
    type; v'[j] = Σ_i (v[i]·c[i,j]) // r[i] + (v[j] if r[j] == 0)."""
    totals: dict[str, int] = {}
    for (i, _j), n in counts.items():
        totals[i] = totals.get(i, 0) + n
    v = {t: MARKOV_SCALE // len(types) for t in types}
    for _ in range(rounds):
        nxt = {t: 0 for t in types}
        for (i, j), n in counts.items():
            nxt[j] += (v[i] * n) // totals[i]
        for t in types:
            if t not in totals:
                nxt[t] += v[t]
        v = nxt
    return v


def markov_stationary(sf_dir: str):
    """Stationary distribution of the per-user event-type Markov chain
    (power iteration over markov_transitions' counts) — where a user's
    session mix converges, the one-vector summary a traffic model
    simulates from.

    Scale shape: the transition counts are the distributed part
    (markov_transitions' salted-partition pair scan); the chain itself is
    |types|² — the iteration runs on the driver in exact quantized
    integer arithmetic (see markov_power_iterate) and the SQL oracle
    unrolls the same rounds as CTEs. One int→double division reports the
    probability.

    Output: (event_type, stationary) ordered by event_type."""
    rows = markov_transitions(sf_dir).take_all()
    counts = {(r["from_type"], r["to_type"]): int(r["n"]) for r in rows}
    types = sorted(read_table(sf_dir, "events", columns=["event_type"])
                   .unique("event_type"))
    v = markov_power_iterate(types, counts)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "stationary": pa.array(
            [v[t] / float(MARKOV_SCALE) for t in types], pa.float64()),
    }))
