"""Similarity ops over the ``embeddings`` table (vec_id, embedding:
list<float>, label): norms, brute-force cosine top-k ANN baseline, cosine
near-dup pairs, and an LSH-bucketed scale path.

The ANN baseline is the canonical broadcast pattern: the (small) query
matrix is ``ray.put`` once; each batch does ONE numpy matmul against it —
vectorized, no per-row loops, no shuffle. The scale path (ann_lsh) buckets
vectors by random-hyperplane signs so candidate generation is a groupby on a
small key instead of an all-pairs pass."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .common import cap_bucket_members, distinct, from_pandas_clean, read_table

COSINE_DUP_TAU = 0.4
# Multi-table hyperplane LSH: τ=0.9 pairs agree on one 8-plane table with
# p≈0.55, so 8 independent tables give ≈99.8% recall in the near-dup regime
# (the round-1 single 12-plane table had ~0.4% recall at τ=0.4 → 0 rows).
LSH_TABLES = 8
LSH_PLANES_PER_TABLE = 8
_PLANE_SEED = 7
EMBED_DIM = 64


def _matrix(batch: pa.Table) -> np.ndarray:
    """Embedding column → (n, d) float64 matrix, zero-copy from Arrow.

    Fast path: flatten the (fixed-width) list values straight to numpy and
    reshape — no per-row Python lists. Falls back to ``to_pylist`` only for
    ragged input."""
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), col.type.list_size).astype(np.float64, copy=False)
    offsets = col.offsets.to_numpy()
    widths = np.diff(offsets)
    if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), int(widths[0])).astype(np.float64, copy=False)
    return np.array(col.to_pylist(), dtype=np.float64)


def _ids(batch: pa.Table) -> np.ndarray:
    col = batch.column("vec_id")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def embedding_norms(sf_dir: str):
    """vec_id → L2 norm (rounded 4): one vectorized numpy pass per batch."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        norms = np.sqrt((m * m).sum(axis=1))
        return pa.table(
            {"vec_id": batch.column("vec_id"),
             "l2_norm": pa.array(np.round(norms, 4), pa.float64())}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _query_matrix(sf_dir: str, n_queries: int):
    """First n vectors (by vec_id) are the fixed query set."""
    q = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .sort("vec_id")
        .limit(n_queries)
        .take_all()
    )
    ids = np.array([r["vec_id"] for r in q])
    mat = np.array([list(r["embedding"]) for r in q], dtype=np.float64)
    return ids, mat


def ann_brute_topk(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Brute-force cosine top-k: broadcast query matrix, per-batch matmul
    producing (query_id, vec_id, cosine) candidates pruned to the per-batch
    top-k, then a final global top-k per query. Deterministic tiebreak
    (cosine desc, vec_id asc); self-matches excluded."""
    ids, qmat = _query_matrix(sf_dir, n_queries)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    q_ref = ray.put((ids, qnorm))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def score(batch: pa.Table) -> pa.Table:
        q_ids, q = ray.get(q_ref)
        m = _matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = q @ m.T  # (n_queries, batch)
        vec_ids = _ids(batch)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi, qid in enumerate(q_ids):
            row = sims[qi]
            mask = vec_ids != qid
            cand_ids = vec_ids[mask]
            cand = row[mask]
            take = min(k, len(cand))
            # partial top-k per batch — bounds what the final task sees
            idx = np.argpartition(-cand, take - 1)[:take] if take else []
            for i in idx:
                out["query_id"].append(int(qid))
                out["vec_id"].append(int(cand_ids[i]))
                out["cosine"].append(float(cand[i]))
        return pa.table(
            {"query_id": pa.array(out["query_id"], pa.int64()),
             "vec_id": pa.array(out["vec_id"], pa.int64()),
             "cosine": pa.array(out["cosine"], pa.float64())}
        )

    ds = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        ).head(k)
        df["rank"] = range(1, len(df) + 1)
        df["cosine"] = df["cosine"].round(4)
        return from_pandas_clean(df)

    return ds.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def _kmeans(sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Tiny seeded k-means (numpy, fixed iterations) for IVF coarse cells."""
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ann_ivf_topk(sf_dir: str, n_queries: int = 8, k: int = 10,
                 n_cells: int = 16, nprobe: int = 4):
    """IVF-style ANN (the scale path next to the brute-force baseline):
    coarse k-means cells trained on a driver-side sample, centroids
    broadcast; each batch assigns its vectors to cells and scores a query
    only against vectors in that query's ``nprobe`` nearest cells — the
    candidate set shrinks by ~n_cells/nprobe at the cost of recall
    (recall vs brute force is pinned in tests/test_ops.py)."""
    ids, qmat = _query_matrix(sf_dir, n_queries)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # sample for training: fine to take at test scale; at corpus scale this
    # is ds.random_sample - the trained centroids stay tiny either way
    sample = np.array(
        [list(r["embedding"]) for r in ds.limit(2048).take_all()], dtype=np.float64
    )
    centroids = _kmeans(sample, n_cells)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    # each query probes its nprobe nearest cells
    qd = ((qmat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe_cells = np.argsort(qd, axis=1)[:, :nprobe]
    ref = ray.put((ids, qnorm, centroids, probe_cells))

    def score(batch: pa.Table) -> pa.Table:
        q_ids, q, cents, probes = ray.get(ref)
        m = _matrix(batch)
        vec_ids = _ids(batch)
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for qi, qid in enumerate(q_ids):
            mask = np.isin(cell, probes[qi]) & (vec_ids != qid)
            if not mask.any():
                continue
            sims = mn[mask] @ q[qi]
            cand_ids = vec_ids[mask]
            take = min(k, len(sims))
            idx = np.argpartition(-sims, take - 1)[:take]
            for i in idx:
                out["query_id"].append(int(qid))
                out["vec_id"].append(int(cand_ids[i]))
                out["cosine"].append(float(sims[i]))
        return pa.table(
            {"query_id": pa.array(out["query_id"], pa.int64()),
             "vec_id": pa.array(out["vec_id"], pa.int64()),
             "cosine": pa.array(out["cosine"], pa.float64())}
        )

    ds = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        ).head(k)
        df["rank"] = range(1, len(df) + 1)
        df["cosine"] = df["cosine"].round(4)
        return from_pandas_clean(df)

    return ds.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


# cosine_dup_pairs materializes the embedding table once to build the
# broadcast side — an EXACT O(n^2) baseline, only sane below this many rows
# (10M × 64 f64 = 5 GB broadcast + a 10M-col matmul per batch). Above it the
# guard raises and points at the sub-quadratic cosine_dup_pairs_lsh twin
# instead of silently OOMing the driver.
COSINE_EXACT_MAX_ROWS = 10_000_000


def cosine_dup_pairs(sf_dir: str):
    """Embedding near-dup pairs (cosine ≥ τ), exact: broadcast the full
    normalized matrix (ray.put once — n×64 floats stays broadcastable far
    beyond test scale), one matmul per batch, emit pairs with
    batch_id < other_id so each pair appears exactly once. The sub-quadratic
    scale path is :func:`cosine_dup_pairs_lsh`; a row-count guard keeps this
    exact baseline from ever materializing a crawl-scale table."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = ds.count()
    if n > COSINE_EXACT_MAX_ROWS:
        raise ValueError(
            f"cosine_dup_pairs is the exact O(n^2) baseline and materializes "
            f"the embedding table ({n} rows > cap {COSINE_EXACT_MAX_ROWS}); "
            f"use cosine_dup_pairs_lsh for corpora past the cap"
        )
    all_rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in all_rows])
    m = np.array([list(r["embedding"]) for r in all_rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, mn))

    def pairs(batch: pa.Table) -> pa.Table:
        a_ids_all, a_mat = ray.get(ref)
        b = _matrix(batch)
        b = b / np.linalg.norm(b, axis=1, keepdims=True)
        b_ids = _ids(batch)
        sims = b @ a_mat.T  # (batch, all)
        out = {"vec_a": [], "vec_b": [], "cosine": []}
        bi, ai = np.nonzero(sims >= COSINE_DUP_TAU)
        for i, j in zip(bi, ai):
            va, vb = int(b_ids[i]), int(a_ids_all[j])
            if va < vb:
                out["vec_a"].append(va)
                out["vec_b"].append(vb)
                out["cosine"].append(round(float(sims[i, j]), 4))
        return pa.table(
            {"vec_a": pa.array(out["vec_a"], pa.int64()),
             "vec_b": pa.array(out["vec_b"], pa.int64()),
             "cosine": pa.array(out["cosine"], pa.float64())}
        )

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def lsh_planes() -> np.ndarray:
    """The fixed random-hyperplane bank: (tables × planes_per_table, dim).
    Deterministic (seeded) so the DuckDB oracle can embed the same
    constants."""
    rng = np.random.RandomState(_PLANE_SEED)
    return rng.randn(LSH_TABLES * LSH_PLANES_PER_TABLE, EMBED_DIM)


def cosine_dup_pairs_lsh(sf_dir: str):
    """Embedding near-dup pairs via MULTI-TABLE hyperplane LSH: per table, a
    sign signature over that table's planes → bucket groupby → exact
    in-bucket cosine ≥ τ; pairs colliding in several tables are deduped with
    a one-pass aggregate. The all-pairs scan never happens (scale path next
    to the :func:`cosine_dup_pairs` exact baseline). The embedding rides on
    each of the 8 table rows (8× duplication — same documented trade as the
    MinHash band rows: join-free at the cost of a constant factor)."""
    planes = lsh_planes()
    planes_ref = ray.put(planes)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def bucket(batch: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        m = _matrix(batch)
        signs = (m @ p.T) > 0  # (n, tables*planes)
        n = len(m)
        weights = 1 << np.arange(LSH_PLANES_PER_TABLE, dtype=np.int64)
        buckets = []
        for t in range(LSH_TABLES):
            sl = signs[:, t * LSH_PLANES_PER_TABLE:(t + 1) * LSH_PLANES_PER_TABLE]
            buckets.append((np.int64(t) << 32) | (sl * weights).sum(axis=1))
        return pa.table(
            {"bucket": pa.array(np.concatenate(buckets), pa.int64()),
             "vec_id": _tile_column(batch.column("vec_id"), LSH_TABLES),
             "embedding": _tile_column(batch.column("embedding"), LSH_TABLES)}
        )

    def in_bucket_pairs(group: pa.Table) -> pa.Table:
        m = _matrix(group)
        ids = _ids(group)
        order = np.argsort(ids, kind="stable")
        m = m[order]
        ids = ids[order]
        keep = cap_bucket_members(
            len(ids), "cosine_lsh",
            group.column("bucket")[0].as_py() if len(group) else None)
        m, ids = m[:keep], ids[:keep]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= COSINE_DUP_TAU
        ia, jb = iu[hit], ju[hit]
        keep = ids[ia] != ids[jb]
        ia, jb = ia[keep], jb[keep]
        return pa.table(
            {"vec_a": pa.array(ids[ia], pa.int64()),
             "vec_b": pa.array(ids[jb], pa.int64()),
             "cosine": pa.array(np.round(sims[ia, jb], 4), pa.float64())}
        )

    ds = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    pairs = ds.groupby("bucket").map_groups(in_bucket_pairs, batch_format="pyarrow")
    return distinct(pairs, ["vec_a", "vec_b"], carry=["cosine"])


def _tile_column(col, times: int):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pa.concat_arrays([col] * times)


def semdedup_prune(sf_dir: str, n_cells: int = 16, tau: float | None = None):
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public): coarse
    k-means cells over the embeddings, then WITHIN each cell prune every
    vector that has a LOWER-ID neighbor with cosine >= tau — one
    representative survives per semantic neighborhood with no all-pairs
    pass (pairing cost is per-cell). Cell training reuses the IVF recipe
    exactly (same sample, same seeded k-means), so the oracle recomputes
    assignments from the ivf.parquet artifact. Shuffle shape: ONE groupby
    on the cell id; rows carry only (vec_id, cell, embedding). At corpus
    scale n_cells should grow ~sqrt(N) so cells stay pairing-sized; the
    shared bucket cap guards degenerate cells regardless (beyond-cap
    members are dropped from the output and logged, mirrored in SQL).
    Output: (vec_id, cell, pruned)."""
    tau = COSINE_DUP_TAU if tau is None else tau
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = np.array(
        [list(r["embedding"]) for r in ds.limit(2048).take_all()], dtype=np.float64
    )
    centroids = _kmeans(sample, n_cells)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        m = _matrix(batch)
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column(
            "cell", pa.array(d.argmin(axis=1).astype(np.int32))
        )

    def prune(group: pa.Table) -> pa.Table:
        m = _matrix(group)
        ids = _ids(group)
        order = np.argsort(ids, kind="stable")
        m, ids = m[order], ids[order]
        cell = int(group.column("cell")[0].as_py())
        keep = cap_bucket_members(len(ids), "semdedup", cell)
        m, ids = m[:keep], ids[:keep]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        # pruned iff ANY strictly-lower-id member of the cell is >= tau
        pruned = (np.tril(sims >= tau, k=-1)).any(axis=1)
        return pa.table(
            {"vec_id": pa.array(ids.astype(np.int64), pa.int64()),
             "cell": pa.array(np.full(len(ids), cell, dtype=np.int32), pa.int32()),
             "pruned": pa.array(pruned, pa.bool_())}
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return assigned.groupby("cell").map_groups(prune, batch_format="pyarrow")


def label_centroids(sf_dir: str):
    """per-label centroid + count: vectorized per-batch partial sums, tiny
    final combine — the embedding analogue of the combiner pattern."""
    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        m = _matrix(batch)
        labels = np.asarray(batch.column("label").to_pylist())
        out = []
        for lab in np.unique(labels):
            sel = m[labels == lab]
            out.append(
                {"label": int(lab), "vec_sum": sel.sum(axis=0).tolist(),
                 "n": int(sel.shape[0])}
            )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [pa.field("label", pa.int32()),
                 pa.field("vec_sum", pa.list_(pa.float64())),
                 pa.field("n", pa.int64())]
            ),
        )

    def combine(group: pa.Table) -> pa.Table:
        sums = np.array(group.column("vec_sum").to_pylist())
        n = sum(group.column("n").to_pylist())
        centroid = sums.sum(axis=0) / n
        return pa.Table.from_pylist(
            [{"label": group.column("label")[0].as_py(), "n_vectors": n,
              "centroid_norm": round(float(np.linalg.norm(centroid)), 4)}],
            schema=pa.schema(
                [pa.field("label", pa.int32()), pa.field("n_vectors", pa.int64()),
                 pa.field("centroid_norm", pa.float64())]
            ),
        )

    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("label").map_groups(combine, batch_format="pyarrow")


KNN_K = 5


def mutual_knn_pairs(sf_dir: str, k: int = KNN_K):
    """Mutual-kNN graph over the embeddings — the edge set where EACH
    endpoint is in the other's cosine top-k. This is the neighborhood graph
    embedding-cluster pipelines build before community detection; mutuality
    filters hub vectors (a hub lands in everyone's top-k but reciprocates
    only k edges).

    Exact baseline with the same shape and guard as
    :func:`cosine_dup_pairs`: broadcast the normalized matrix once, one
    matmul per batch, deterministic per-row top-k (cosine desc, id asc).
    Directed edges are folded to (min, max) and a grouped count keeps pairs
    seen from BOTH directions — only (vec_a, vec_b, cosine) rows cross the
    exchange, never vectors. Scale path: generate candidates per IVF cell
    (the :func:`ann_ivf_topk` recipe) instead of the full matmul; the fold +
    mutuality reduction is unchanged."""
    from .common import grouped_agg

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = ds.count()
    if n > COSINE_EXACT_MAX_ROWS:
        raise ValueError(
            f"mutual_knn_pairs is the exact baseline and broadcasts the "
            f"embedding table ({n} rows > cap {COSINE_EXACT_MAX_ROWS}); "
            f"bucket candidates with the ann_ivf_topk recipe past the cap"
        )
    all_rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in all_rows])
    m = np.array([list(r["embedding"]) for r in all_rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, mn))

    def edges(batch: pa.Table) -> pa.Table:
        a_ids, a_mat = ray.get(ref)
        b = _matrix(batch)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        b_ids = _ids(batch)
        sims = bn @ a_mat.T  # (batch, all)
        src: list[int] = []
        dst: list[int] = []
        cos: list[float] = []
        for i in range(len(b_ids)):
            mask = a_ids != b_ids[i]
            cand_ids = a_ids[mask]
            cand = sims[i][mask]
            # deterministic top-k: cosine desc, then id asc (ties)
            order = np.lexsort((cand_ids, -cand))[:k]
            for j in order:
                src.append(int(b_ids[i]))
                dst.append(int(cand_ids[j]))
                cos.append(round(float(cand[j]), 4))
        lo = np.minimum(src, dst) if src else np.array([], dtype=np.int64)
        hi = np.maximum(src, dst) if src else np.array([], dtype=np.int64)
        return pa.table(
            {"vec_a": pa.array(lo, pa.int64()),
             "vec_b": pa.array(hi, pa.int64()),
             "cosine": pa.array(cos, pa.float64())}
        )

    directed = ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_agg(
        directed, keys=["vec_a", "vec_b"],
        # cosine is direction-symmetric (dot of the same normalized rows,
        # rounded before the exchange), so max == the value
        specs=[("n_dirs", "count", None), ("cosine", "max", "cosine")],
    )
    both = agg.filter(expr="n_dirs == 2")
    return both.select_columns(["vec_a", "vec_b", "cosine"])


SQ8_LEVELS = 255


def sq8_quantize(sf_dir: str):
    """Per-vector scalar quantization to uint8 (the SQ8 codec every
    billion-vector ANN store runs — 4x smaller than float32, distance error
    ~1e-4): code_i = floor((x_i - min)/scale + 0.5) with scale =
    (max - min)/255, plus the reconstruction MSE as the quality audit.
    One vectorized numpy pass per batch, shuffle-free; the float chain
    ((x-min)/scale + 0.5 then floor) is elementwise-identical to the SQL
    twin, so the integer codes match bit-for-bit and only the MSE needs a
    rounding guard. Constant-width vectors: all-equal vectors get scale 0 →
    code 0 by convention on both sides."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        vmin = m.min(axis=1)
        vmax = m.max(axis=1)
        scale = (vmax - vmin) / float(SQ8_LEVELS)
        safe = np.where(scale == 0.0, 1.0, scale)
        codes = np.floor((m - vmin[:, None]) / safe[:, None] + 0.5)
        codes = np.clip(codes, 0, SQ8_LEVELS).astype(np.int64)
        codes[scale == 0.0, :] = 0
        recon = vmin[:, None] + codes * scale[:, None]
        mse = ((m - recon) ** 2).sum(axis=1) / m.shape[1]
        return pa.table(
            {"vec_id": batch.column("vec_id"),
             "vmin": pa.array(np.round(vmin, 4), pa.float64()),
             "vmax": pa.array(np.round(vmax, 4), pa.float64()),
             "code_sum": pa.array(codes.sum(axis=1), pa.int64()),
             "mse": pa.array(np.round(mse, 8), pa.float64())}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


KMEANS_K = 4
KMEANS_ITERS = 2
KMEANS_ROUND = 6


def kmeans_clusters(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Distributed Lloyd's k-means over the FULL embeddings table — the
    iterative-refinement pattern (each iteration is ONE streaming pass; the
    k×d model is broadcast, only k partial-sum rows per batch cross back).
    Unlike the sample-trained :func:`_kmeans` (IVF cell codebook), every
    vector votes in every update, so the oracle can replay the algorithm
    exactly.

    Determinism contract shared with the SQL twin (iterations unrolled as
    CTEs): init = the k lowest-vec_id embeddings in vec_id order; assignment
    = argmin squared-euclidean with lowest-cluster-id tiebreak; update =
    member mean rounded half-even to KMEANS_ROUND decimals (the rounding
    re-quantizes the model each iteration so both sides enter the next pass
    with bit-identical centroids — float sum-order noise ~1e-12 cannot
    accumulate). An emptied cluster keeps its previous centroid on both
    sides.

    At 100-TB scale: per-iteration cost is one map pass + a k-row reduce —
    no shuffle at all; the model (k×d doubles) broadcasts via ray.put.
    Output: (vec_id, cluster)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroids = _kmeans_train(ds, k, iters)
    cref = ray.put(centroids)

    def final(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        lab = _assign(_matrix(batch), cents)
        return pa.table(
            {"vec_id": batch.column("vec_id"),
             "cluster": pa.array(lab.astype(np.int64), pa.int64())}
        )

    return ds.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def _assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # (n, k) squared distances; argmin breaks ties on lowest cluster id
    d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def _kmeans_train(ds, k: int, iters: int) -> np.ndarray:
    """The Lloyd training loop shared by kmeans_clusters and
    kmeans_quality (same determinism contract; see kmeans_clusters)."""
    init = (
        ds.sort("vec_id").limit(k).take_all()
    )
    centroids = np.array([list(r["embedding"]) for r in init], dtype=np.float64)
    centroids = np.round(centroids, KMEANS_ROUND)

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            cents = ray.get(_cref)
            m = _matrix(batch)
            lab = _assign(m, cents)
            rows = []
            for c in np.unique(lab):
                sel = m[lab == c]
                rows.append({"cluster": int(c), "n": int(len(sel)),
                             "vec_sum": sel.sum(axis=0).tolist()})
            return pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [pa.field("cluster", pa.int64()), pa.field("n", pa.int64()),
                     pa.field("vec_sum", pa.list_(pa.float64()))]
                ),
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # k rows per batch — model-sized, never data-sized
        nxt = centroids.copy()
        for c in range(k):
            rows = [r for r in parts if r["cluster"] == c]
            n = sum(r["n"] for r in rows)
            if n:
                s = np.sum([np.asarray(r["vec_sum"]) for r in rows], axis=0)
                nxt[c] = np.round(s / n, KMEANS_ROUND)
        centroids = nxt

    return centroids


KNN_SEED_MOD = 5


def knn_classify(sf_dir: str):
    """1-NN classification of unlabeled vectors against a labeled seed set
    — the embedding-quality eval every corpus-curation run performs before
    trusting cosine-based dedup/filtering. Seeds = vec_id % KNN_SEED_MOD
    == 0 (a deterministic 20% holdout); every other vector is classified
    by its single nearest seed (raw cosine desc, seed vec_id asc
    tiebreak).

    Scale shape: the seed matrix broadcasts once (`ray.put`; at 10^9+
    seeds switch to the IVF route) and each batch classifies itself with
    ONE normalized matmul — shuffle-free, embarrassingly parallel, the
    same broadcast-matmul law as ann_brute_topk.

    Output: (vec_id, true_label, pred_label, correct), one row per
    non-seed vector."""
    def only_seeds(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % KNN_SEED_MOD == 0))

    seeds = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
        .map_batches(only_seeds, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    seeds.sort(key=lambda r: r["vec_id"])  # argmax first-hit = min vec_id
    s_ids = np.array([r["vec_id"] for r in seeds], dtype=np.int64)
    s_labels = np.array([r["label"] for r in seeds], dtype=np.int64)
    smat = np.array([r["embedding"] for r in seeds], dtype=np.float64)
    smat = smat / np.linalg.norm(smat, axis=1, keepdims=True)
    seed_ref = ray.put((s_ids, s_labels, smat))

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def classify(batch: pa.Table) -> pa.Table:
        _, labels, s = ray.get(seed_ref)
        vec_ids = _ids(batch)
        keep = (vec_ids % KNN_SEED_MOD) != 0
        if not keep.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "true_label": pa.array([], pa.int64()),
                 "pred_label": pa.array([], pa.int64()),
                 "correct": pa.array([], pa.bool_())}
            )
        m = _matrix(batch)[keep]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ s.T  # (n_eval, n_seeds)
        best = sims.argmax(axis=1)  # first max = lowest seed vec_id
        true = batch.column("label").to_numpy(zero_copy_only=False)[keep]
        pred = labels[best]
        return pa.table(
            {"vec_id": pa.array(vec_ids[keep], pa.int64()),
             "true_label": pa.array(true.astype(np.int64), pa.int64()),
             "pred_label": pa.array(pred, pa.int64()),
             "correct": pa.array(true == pred)}
        )

    return ds.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


def centroid_distances(sf_dir: str):
    """Pairwise Euclidean distances between label centroids — the
    inter-class separation matrix that accompanies label_centroids in any
    embedding-quality report.

    Scale shape: centroids come from the same vectorized partial-sum
    exchange as label_centroids; only the |labels| centroid rows (a
    dimension-bounded frame) leave the cluster, and the |labels|² pairs are
    computed once in a single task. Distances round to 4 like
    centroid_norm (absorbing distributed float-sum order).

    Output: (label_a, label_b, dist) for a < b, ordered."""
    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        labels = np.asarray(batch.column("label").to_pylist())
        out = []
        for lab in np.unique(labels):
            sel = m[labels == lab]
            out.append(
                {"label": int(lab), "vec_sum": sel.sum(axis=0).tolist(),
                 "n": int(sel.shape[0])}
            )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [pa.field("label", pa.int32()),
                 pa.field("vec_sum", pa.list_(pa.float64())),
                 pa.field("n", pa.int64())]
            ),
        )

    def combine(group: pa.Table) -> pa.Table:
        sums = np.array(group.column("vec_sum").to_pylist())
        n = sum(group.column("n").to_pylist())
        centroid = sums.sum(axis=0) / n
        return pa.Table.from_pylist(
            [{"label": group.column("label")[0].as_py(),
              "centroid": centroid.tolist()}],
            schema=pa.schema(
                [pa.field("label", pa.int32()),
                 pa.field("centroid", pa.list_(pa.float64()))]
            ),
        )

    cents = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label").map_groups(combine, batch_format="pyarrow")
        .take_all()
    )
    cents.sort(key=lambda r: r["label"])
    rows = []
    for i in range(len(cents)):
        for j in range(i + 1, len(cents)):
            a = np.asarray(cents[i]["centroid"])
            b = np.asarray(cents[j]["centroid"])
            d = float(np.sqrt(np.sum((a - b) * (a - b))))
            rows.append({"label_a": int(cents[i]["label"]),
                         "label_b": int(cents[j]["label"]),
                         "dist": round(d, 4)})
    return pa.table(
        {"label_a": pa.array([r["label_a"] for r in rows], pa.int32()),
         "label_b": pa.array([r["label_b"] for r in rows], pa.int32()),
         "dist": pa.array([r["dist"] for r in rows], pa.float64())}
    )


def kmeans_quality(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Per-cluster quality of the trained k-means model: member count and
    inertia (Σ squared distance to the assigned centroid) — the
    elbow-curve statistic that decides k.

    Scale shape: the trained k×d model broadcasts once; ONE shuffle-free
    pass emits (cluster, n, dist_sum) partials per batch and only k rows
    per block cross the exchange. Inertia rounds to 4 (absorbing
    distributed float-sum order, the label_centroids discipline); the SQL
    twin replays the identical unrolled training (same centroids, same
    assignments) and sums the same per-vector distances.

    Output: (cluster, n_vectors, inertia) by cluster."""
    from .common import grouped_agg

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroids = _kmeans_train(ds, k, iters)
    cref = ray.put(centroids)

    def partial(batch: pa.Table, _cref=cref) -> pa.Table:
        cents = ray.get(_cref)
        m = _matrix(batch)
        lab = _assign(m, cents)
        d = ((m - cents[lab]) ** 2).sum(axis=1)
        rows = []
        for c in np.unique(lab):
            sel = d[lab == c]
            rows.append({"cluster": int(c), "n_vectors": int(len(sel)),
                         "dist_sum": float(sel.sum())})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("cluster", pa.int64()),
                 pa.field("n_vectors", pa.int64()),
                 pa.field("dist_sum", pa.float64())]
            ),
        )

    import pandas as pd

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["inertia"] = df["dist_sum"].round(4)
        return df.sort_values("cluster").reset_index(drop=True)[
            ["cluster", "n_vectors", "inertia"]]

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["cluster"],
        specs=[("n_vectors", "sum", "n_vectors"), ("dist_sum", "sum", "dist_sum")],
        finalize=fin,
    )


POWER_ITERS = 3
POWER_M_ROUND = 6    # second-moment matrix quantization (absorbs sum order)
POWER_V_ROUND = 9    # per-iteration vector re-quantization
POWER_EIG_ROUND = 4


def embedding_top_component(sf_dir: str):
    """Power iteration toward the dominant principal direction of the
    embedding cloud, on the (uncentered) second-moment matrix M = XᵀX —
    the distributed-PCA primitive behind whitening and ABTT-style
    post-processing (Mu & Viswanath 2018). Convergence is (λ₂/λ₁)^k per
    round: decisive spectra converge in POWER_ITERS rounds, near-isotropic
    clouds (like the synthetic table) only drift toward the top — the
    operator's contract is the exact quantized iteration, not a converged
    eigenpair.

    Determinism contract (the kmeans_clusters discipline, adapted to
    linear algebra): M's entries are rounded half-even to POWER_M_ROUND
    after the global sum (absorbing distributed float-add order), v₀ is
    the exact constant 1/√d = 0.125 for d = 64, and after every matvec
    the vector re-quantizes to POWER_V_ROUND decimals — both sides enter
    each iteration with bit-identical state, so the unrolled SQL twin
    reproduces the loadings exactly.

    Scale shape: ONE streaming pass computes per-batch d×d partial
    Gramians (vectorized m.T @ m); only d² floats per block cross the
    exchange, the iteration itself is driver-side O(d²) on a model-sized
    matrix, and no shuffle exists anywhere.

    Output: (dim, loading, eigenvalue) — 1-based dims, eigenvalue = the
    Rayleigh quotient vᵀMv rounded to POWER_EIG_ROUND."""
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def gram_partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        g = m.T @ m
        return pa.Table.from_pylist(
            [{"g": g.reshape(-1).tolist()}],
            schema=pa.schema([pa.field("g", pa.list_(pa.float64()))]),
        )

    parts = ds.map_batches(
        gram_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one d×d row per block — model-sized, never data-sized
    d = int(np.sqrt(len(parts[0]["g"])))
    M = np.zeros((d, d), dtype=np.float64)
    for r in parts:
        M += np.asarray(r["g"], dtype=np.float64).reshape(d, d)
    M = np.round(M, POWER_M_ROUND)

    v = np.full(d, 1.0 / np.sqrt(d), dtype=np.float64)
    for _ in range(POWER_ITERS):
        w = np.round(M @ v, POWER_V_ROUND)
        v = np.round(w / np.sqrt(np.sum(w * w)), POWER_V_ROUND)
    eig = round(float(v @ M @ v), POWER_EIG_ROUND)

    return pa.table(
        {"dim": pa.array(range(1, d + 1), pa.int64()),
         "loading": pa.array(v.tolist(), pa.float64()),
         "eigenvalue": pa.array([eig] * d, pa.float64())}
    )


HARDNEG_ANCHOR_MOD = 10
# encode (dot, vec_id) into one int64 so the distributed argmax is a plain
# Max aggregate: dot ≤ 255²·d ≈ 4.2M for d=64, id headroom 2^31
_HARDNEG_ID_SPAN = 1 << 31


def _sq8_codes(m: np.ndarray) -> np.ndarray:
    """The sq8_quantize code chain (shared float expression with its SQL
    twin): per-vector min/max scale to 0..SQ8_LEVELS ints."""
    vmin = m.min(axis=1)
    vmax = m.max(axis=1)
    scale = (vmax - vmin) / float(SQ8_LEVELS)
    safe = np.where(scale == 0.0, 1.0, scale)
    codes = np.floor((m - vmin[:, None]) / safe[:, None] + 0.5)
    codes = np.clip(codes, 0, SQ8_LEVELS).astype(np.int64)
    codes[scale == 0.0, :] = 0
    return codes


def hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for every anchor
    vector (vec_id % HARDNEG_ANCHOR_MOD == 0), the most similar vector
    with a DIFFERENT label — similarity as the integer dot product of SQ8
    codes, so the argmax is exact (no float sum-order noise) and the SQL
    twin replays the identical quantize→dot→argmax chain bit for bit.
    Ties break to the lowest vec_id via the encoded (dot, −id) max.

    Scale shape: the anchor code matrix broadcasts once via ray.put; each
    batch runs ONE int64 matmul against it and emits a single best-
    candidate row per anchor (n_anchors rows per batch cross the
    exchange); a grouped Max over the encoded key finishes. This is the
    brute-force baseline path (cf. ann_brute_topk); the scale path buckets
    candidates by IVF cell first.

    Output: (anchor_id, neg_id, dot) ordered by anchor_id."""
    from .common import grouped_agg

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    # anchors are filtered DISTRIBUTED (vectorized batch mask, not a
    # per-row lambda); only the 1/mod sample materializes
    def pick_anchors(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(vid % HARDNEG_ANCHOR_MOD == 0))

    anchors = ds.map_batches(
        pick_anchors, batch_format="pyarrow", zero_copy_batch=True).take_all()
    anchors.sort(key=lambda r: r["vec_id"])
    a_ids = np.array([r["vec_id"] for r in anchors], dtype=np.int64)
    a_labels = np.array([r["label"] for r in anchors], dtype=np.int64)
    a_codes = _sq8_codes(
        np.array([r["embedding"] for r in anchors], dtype=np.float64))
    a_ref = ray.put((a_ids, a_labels, a_codes))

    def best_in_batch(batch: pa.Table) -> pa.Table:
        ids, labels, codes = ray.get(a_ref)
        m = _matrix(batch)
        v_codes = _sq8_codes(m)
        v_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v_labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        dots = codes @ v_codes.T  # (n_anchors, batch)
        # encoded argmax key: prefer high dot, then LOW vec_id
        enc = dots * _HARDNEG_ID_SPAN + (_HARDNEG_ID_SPAN - 1 - v_ids)[None, :]
        enc = np.where(labels[:, None] != v_labels[None, :], enc, -1)
        best = enc.max(axis=1)
        keep = best >= 0
        return pa.table(
            {"anchor_id": pa.array(ids[keep], pa.int64()),
             "enc": pa.array(best[keep], pa.int64())}
        )

    def fin(df):
        df["dot"] = (df["enc"] // _HARDNEG_ID_SPAN).astype("int64")
        df["neg_id"] = (
            _HARDNEG_ID_SPAN - 1 - (df["enc"] % _HARDNEG_ID_SPAN)
        ).astype("int64")
        return df.sort_values("anchor_id").reset_index(drop=True)[
            ["anchor_id", "neg_id", "dot"]]

    return grouped_agg(
        ds.map_batches(best_in_batch, batch_format="pyarrow", zero_copy_batch=True),
        keys=["anchor_id"],
        specs=[("enc", "max", "enc")],
        finalize=fin,
    )


# --- Matryoshka dimension-truncation evaluation -------------------------
# Matryoshka-style representations (Kusupati et al. 2022) keep the first d
# dimensions usable as a cheaper embedding; before switching an ANN index
# to truncated vectors, a curation pipeline measures how much retrieval the
# truncation loses. Constants are part of the query's identity (the SQL
# twin bakes the same values).
TRUNC_DIM = 16       # keep the first 16 of 64 dims
TRUNC_QUERIES = 16   # evaluate on the first 16 vec_ids
TRUNC_K = 10


def dim_truncation_recall(sf_dir: str):
    """Recall@k of truncated-dimension retrieval vs full-dimension
    retrieval: for each query vector, the brute-force cosine top-k is
    computed in BOTH spaces (full d and the first TRUNC_DIM dims) and
    scored by overlap — recall = |topk_full ∩ topk_trunc| / k.

    Scale shape: both normalized query matrices broadcast once
    (``ray.put``); each batch scores itself with TWO matmuls and prunes to
    a per-batch per-space top-k (the same broadcast-matmul law as
    ann_brute_topk), so the exchange carries ≤ 2·k·n_queries rows per
    block, never the corpus; the final per-query intersection runs in a
    tiny map_groups over ≤ 2·k·blocks rows.

    Output: (query_id, n_hits, recall) ordered by query_id."""
    ids, qmat = _query_matrix(sf_dir, TRUNC_QUERIES)
    qfull = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qt = qmat[:, :TRUNC_DIM]
    qtrunc = qt / np.linalg.norm(qt, axis=1, keepdims=True)
    q_ref = ray.put((ids, qfull, qtrunc))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    k = TRUNC_K

    def score(batch: pa.Table) -> pa.Table:
        q_ids, qf, qs = ray.get(q_ref)
        m = _matrix(batch)
        mf = m / np.linalg.norm(m, axis=1, keepdims=True)
        mt = m[:, :TRUNC_DIM]
        ms = mt / np.linalg.norm(mt, axis=1, keepdims=True)
        vec_ids = _ids(batch)
        out = {"query_id": [], "space": [], "vec_id": [], "cosine": []}
        for space, sims in (("full", qf @ mf.T), ("trunc", qs @ ms.T)):
            for qi, qid in enumerate(q_ids):
                mask = vec_ids != qid
                cand_ids = vec_ids[mask]
                cand = sims[qi][mask]
                take = min(k, len(cand))
                idx = np.argpartition(-cand, take - 1)[:take] if take else []
                for i in idx:
                    out["query_id"].append(int(qid))
                    out["space"].append(space)
                    out["vec_id"].append(int(cand_ids[i]))
                    out["cosine"].append(float(cand[i]))
        return pa.table(
            {"query_id": pa.array(out["query_id"], pa.int64()),
             "space": pa.array(out["space"], pa.string()),
             "vec_id": pa.array(out["vec_id"], pa.int64()),
             "cosine": pa.array(out["cosine"], pa.float64())}
        )

    cands = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    def recall(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        tops = {}
        for space, sub in df.groupby("space"):
            sub = sub.sort_values(["cosine", "vec_id"],
                                  ascending=[False, True]).head(k)
            tops[space] = set(sub["vec_id"])
        hits = len(tops.get("full", set()) & tops.get("trunc", set()))
        return pa.table(
            {"query_id": pa.array([int(df["query_id"].iloc[0])], pa.int64()),
             "n_hits": pa.array([hits], pa.int64()),
             "recall": pa.array([hits / k], pa.float64())}
        )

    out = cands.groupby("query_id").map_groups(recall, batch_format="pyarrow")

    def fin(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("query_id").reset_index(drop=True)
        from .common import from_pandas_clean

        return from_pandas_clean(df)

    return out.repartition(1).map_batches(fin, batch_format="pyarrow")


# ------------------------------------- semi-supervised label propagation

LP_ROUNDS = 2


def knn_edge_rows(sf_dir: str):
    """Symmetrized mutual-kNN edges (src, dst) — the per-graph stage of
    label_propagation_classify and its oracle artifact."""
    pairs = mutual_knn_pairs(sf_dir)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").combine_chunks()
        b = batch.column("vec_b").combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    return pairs.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)


def label_propagation_classify(sf_dir: str):
    """Semi-supervised label propagation (Zhu & Ghahramani 2002, hard-label
    variant) over the mutual-kNN graph: seed labels (vec_id %
    KNN_SEED_MOD == 0) spread for LP_ROUNDS synchronous rounds; an
    unlabeled node adopts the majority label of its labeled neighbors
    (ties to the smallest label). Seeds never change.

    Scale shape: fully distributed — per round ONE co-partitioned hash join
    (labels ⋈ edges on src), a grouped (dst, label) count, a per-dst argmax
    and a left-anti join against the already-labeled set; labels accumulate
    by union. Nothing node-count-sized touches the driver. Rounds are a
    fixed constant, unrolled identically in the SQL twin (the kmeans/BPE
    unrolled-iteration oracle discipline).

    Output: (vec_id, label, src) where src ∈ seed|round1|round2|none."""
    from .common import choose_join_parts, from_pandas_clean, grouped_agg

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "label"])
    edges = knn_edge_rows(sf_dir).materialize()
    parts = choose_join_parts(sf_dir, "embeddings", floor=4)

    def seed_rows(batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        keep = ids % KNN_SEED_MOD == 0
        return pa.table(
            {"vec_id": pa.array(ids[keep], pa.int64()),
             "label": pa.compute.cast(
                 batch.column("label").combine_chunks().filter(
                     pa.array(keep)), pa.int64()),
             "src": pa.array(["seed"] * int(keep.sum()), pa.string())}
        )

    labeled = ds.map_batches(
        seed_rows, batch_format="pyarrow", zero_copy_batch=True).materialize()

    for rnd in range(1, LP_ROUNDS + 1):
        votes = labeled.select_columns(["vec_id", "label"]).join(
            edges, join_type="inner", num_partitions=parts,
            on=("vec_id",), right_on=("src",),
        )
        counts = grouped_agg(
            votes.select_columns(["dst", "label"]),
            keys=["dst", "label"], specs=[("n", "count", None)],
        )

        def argmax(df):
            df = df.sort_values(["dst", "n", "label"],
                                ascending=[True, False, True])
            df = df.drop_duplicates("dst", keep="first")[["dst", "label"]]
            return df.rename(columns={"dst": "vec_id"})

        # per-dst majority: one more dst-keyed exchange so every dst's
        # label counts meet in one group (never a driver-side pass)
        winners = counts.groupby("dst").map_groups(
            lambda df: argmax(df), batch_format="pandas",
        ).map_batches(from_pandas_clean, batch_format="pandas")
        fresh = winners.join(
            labeled.select_columns(["vec_id"]),
            join_type="left_anti", num_partitions=parts, on=("vec_id",),
        )
        tag = f"round{rnd}"
        fresh = fresh.map_batches(
            lambda b, _t=tag: b.append_column(
                "src", pa.array([_t] * b.num_rows, pa.string())),
            batch_format="pyarrow",
        )
        labeled = labeled.union(fresh).materialize()

    out = ds.select_columns(["vec_id"]).join(
        labeled, join_type="left_outer", num_partitions=parts, on=("vec_id",),
    )

    def fin(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["label"] = df["label"].fillna(-1).astype("int64")
        df["src"] = df["src"].fillna("none")
        df = df.sort_values("vec_id").reset_index(drop=True)
        return from_pandas_clean(df[["vec_id", "label", "src"]])

    return out.repartition(1).map_batches(fin, batch_format="pyarrow")


ZORDER_BITS = 8          # per-dim quantization width (SQ8 discipline)
ZORDER_BLOCK_SHIFT = 10  # 16-bit Morton code >> 10 → 64 blocks


def zorder_blocks(sf_dir: str):
    """Z-order (Morton) space-filling-curve blocking over the first two
    embedding dimensions — the locality-preserving PARTITIONING technique
    (Delta/Iceberg Z-ordering, bit-interleaved grid files): quantize each
    dim to 8 bits against its GLOBAL range, interleave the bits into a
    16-bit Morton code, and roll up per curve block. Nearby vectors share
    a block, so range/similarity scans touch few blocks; the per-block
    cohesion number reported here is exactly what a layout optimizer reads
    to decide whether the curve is doing its job.

    Exactness contract: quantization is the sq8 float chain
    (floor((x−min)/scale + 0.5), global per-dim min/max) shared
    elementwise with the SQL twin, so codes match bit-for-bit; the Morton
    interleave is pure integer bit algebra; block cohesion (total within-
    block variance of the two quantized dims, biased form) is computed
    from exact int64 sums as (n·(Σx²+Σy²) − (Σx)² − (Σy)²) / n² — one
    int→double division per block.

    Scale shape: pass 1 reduces per-batch (min, max) partials for the two
    dims to one tiny row (broadcast back as plain floats); pass 2 is a
    shuffle-free map to (block, partial moment) rows collapsed by a
    combiner groupby over ≤ 64 keys. No vector ever crosses an exchange.

    Output: (block, n_vecs, cohesion) ordered by block."""
    from .common import grouped_agg

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def minmax(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        return pa.table(
            {"x_min": pa.array([float(m[:, 0].min())], pa.float64()),
             "x_max": pa.array([float(m[:, 0].max())], pa.float64()),
             "y_min": pa.array([float(m[:, 1].min())], pa.float64()),
             "y_max": pa.array([float(m[:, 1].max())], pa.float64())}
        )

    mm = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).take_all()
    x_min = min(r["x_min"] for r in mm)
    x_max = max(r["x_max"] for r in mm)
    y_min = min(r["y_min"] for r in mm)
    y_max = max(r["y_max"] for r in mm)
    levels = (1 << ZORDER_BITS) - 1  # 255

    def quant(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
        scale = (hi - lo) / float(levels)
        if scale == 0.0:
            return np.zeros(len(v), dtype=np.int64)
        q = np.floor((v - lo) / scale + 0.5).astype(np.int64)
        return np.clip(q, 0, levels)

    def per_block(batch: pa.Table) -> pa.Table:
        import pandas as pd

        m = _matrix(batch)
        qx = quant(m[:, 0], x_min, x_max)
        qy = quant(m[:, 1], y_min, y_max)
        z = np.zeros(len(qx), dtype=np.int64)
        for k in range(ZORDER_BITS):
            z |= ((qx >> k) & 1) << (2 * k)
            z |= ((qy >> k) & 1) << (2 * k + 1)
        df = pd.DataFrame(
            {"block": z >> ZORDER_BLOCK_SHIFT, "n_vecs": 1,
             "sx": qx, "sy": qy, "sxx": qx * qx, "syy": qy * qy}
        ).groupby("block", as_index=False).sum()
        return from_pandas_clean(df)

    agg = grouped_agg(
        ds.map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True),
        keys=["block"],
        specs=[("n_vecs", "sum", "n_vecs"), ("sx", "sum", "sx"),
               ("sy", "sum", "sy"), ("sxx", "sum", "sxx"),
               ("syy", "sum", "syy")],
    )

    def fin(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        n = df["n_vecs"].astype("int64")
        num = n * (df["sxx"] + df["syy"]) - df["sx"] ** 2 - df["sy"] ** 2
        df["cohesion"] = num.astype("float64") / (n * n).astype("float64")
        out = df[["block", "n_vecs", "cohesion"]].sort_values(
            "block").reset_index(drop=True)
        return from_pandas_clean(out)

    return agg.repartition(1).map_batches(fin, batch_format="pyarrow", batch_size=None)


MMR_K = 5
MMR_LAMBDA = 0.7  # score = 0.7·rel − 0.3·maxsim (literals shared with SQL)


def mmr_diverse_topk(sf_dir: str):
    """Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein):
    greedily select MMR_K vectors maximizing λ·cos(q, v) − (1−λ)·max
    cos(v, s) over already-selected s — the retrieval/RAG reranking step
    that trades pure relevance for coverage, and the canonical example of
    an ITERATIVE argmax a plain groupby cannot express. Query = the
    embedding of the smallest vec_id (deterministic, no float reduction).

    Determinism contract (shared with the unrolled SQL twin): round 1 is
    argmax relevance; every argmax tiebreaks (score DESC, vec_id ASC);
    scores are ranked raw and rounded to 6 decimals only at output —
    the ann_brute_topk float discipline.

    Scale shape: per-vector state (rel, running maxsim) lives in a
    MATERIALIZED dataset the size of the input — never on the driver;
    each of the K rounds is one broadcast-model map pass (the new pick's
    vector via ray.put) plus a per-batch partial argmax reducing to one
    row per block. K passes total, no shuffle at all — the same
    iterative-refinement shape as kmeans_clusters.

    Output: (rank, vec_id, score) for the K picks."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    min_id = ds.min("vec_id")

    qrows = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("vec_id"), pa.scalar(min_id))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    qv = np.asarray(qrows[0]["embedding"], dtype=np.float64)
    q_ref = ray.put(qv)

    def init_state(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        batch = batch.filter(
            pc.not_equal(batch.column("vec_id"), pa.scalar(min_id)))
        m = _matrix(batch)
        rel = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
        return pa.table(
            {"vec_id": batch.column("vec_id"),
             "embedding": batch.column("embedding"),
             "rel": pa.array(rel, pa.float64()),
             "maxsim": pa.array(np.full(len(rel), -1.0), pa.float64())}
        )

    state = ds.map_batches(
        init_state, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    picks: list[tuple[int, int, float]] = []
    for rnd in range(MMR_K):
        first_round = rnd == 0

        def partial_argmax(batch: pa.Table, _first=first_round) -> pa.Table:
            rel = batch.column("rel").to_numpy(zero_copy_only=False)
            ms = batch.column("maxsim").to_numpy(zero_copy_only=False)
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            score = rel if _first else MMR_LAMBDA * rel - 0.3 * ms
            if not len(score):
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            order = np.lexsort((ids, -score))
            i = order[0]
            return pa.table({"vec_id": pa.array([int(ids[i])], pa.int64()),
                             "score": pa.array([float(score[i])], pa.float64())})

        cands = state.map_batches(
            partial_argmax, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        best = min(cands, key=lambda r: (-r["score"], r["vec_id"]))
        picks.append((rnd + 1, best["vec_id"], best["score"]))
        if rnd == MMR_K - 1:
            break

        wrows = state.map_batches(
            lambda b, _w=best["vec_id"]: b.filter(
                pc.equal(b.column("vec_id"), pa.scalar(_w))),
            batch_format="pyarrow", zero_copy_batch=True,
        ).take_all()
        w_ref = ray.put(np.asarray(wrows[0]["embedding"], dtype=np.float64))

        def update(batch: pa.Table, _w=w_ref, _wid=best["vec_id"]) -> pa.Table:
            w = ray.get(_w)
            batch = batch.filter(
                pc.not_equal(batch.column("vec_id"), pa.scalar(_wid)))
            if batch.num_rows == 0:
                return batch
            m = _matrix(batch)
            sim = (m @ w) / (np.linalg.norm(m, axis=1) * np.linalg.norm(w))
            ms = np.maximum(
                batch.column("maxsim").to_numpy(zero_copy_only=False), sim)
            return batch.set_column(
                batch.schema.get_field_index("maxsim"), "maxsim",
                pa.array(ms, pa.float64()))

        state = state.map_batches(
            update, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return ray.data.from_arrow(pa.table(
        {"rank": pa.array([p[0] for p in picks], pa.int64()),
         "vec_id": pa.array([p[1] for p in picks], pa.int64()),
         "score": pa.array([round(p[2], 6) for p in picks], pa.float64())}
    ))
