"""Graph-shaped operators over the crawl: the host link graph mined from
raw HTML, an iterative PageRank over it, and connected-component clustering
of the near-duplicate pair graph.

These are the operators where the reference has nothing comparable and Ray
Data has no built-in — each is expressed as dataflow (map_batches partials
+ grouped aggregates + hash joins), with the iterative loops driven from
the driver over MATERIALIZED per-iteration label/rank tables (node->scalar
only — the per-iteration state is O(nodes), never O(corpus); re-executing
lineage instead would recompute the whole upstream per iteration).

Scale notes:
- link extraction is a shuffle-free scan; only (src_host, dst_host) pairs
  cross the exchange, pre-collapsed per block by the combiner;
- PageRank iterations move one row per edge + one per node;
- label propagation converges in O(cluster diameter) rounds — near-dup
  clusters are shallow (dups of dups), so the loop exits early on the
  monotone label-sum fixpoint test (one cheap aggregate per round, no
  old-vs-new join).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .common import choose_join_parts, grouped_agg

# ASCII-only on purpose: the oracle runs the same pattern via DuckDB RE2
# over decode(html); ASCII literals render identically in both engines.
HOST_LINK_RE_S = r"https://(host[0-9]+)\.example"
SRC_HOST_RE_S = r"https://([A-Za-z0-9.-]+)\.example"

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 4

CLUSTER_MAX_ITERS = 12


def _html_pages(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    from .extraction_queries import _pages_pruned

    return _pages_pruned(sf_dir, columns)


def host_link_rows(sf_dir: str) -> ray.data.Dataset:
    """(src_host, dst_host) per absolute cross-host anchor in each HTML
    record. The html-branch predicate is the literal '<!DOCTYPE html>'
    prefix — on this corpus it is exactly the router's html branch, and it
    is the predicate the SQL oracle can express over the raw blob
    (CAST(html AS VARCHAR) LIKE '<!DOCTYPE html>%')."""
    link_re = re.compile(HOST_LINK_RE_S)
    src_re = re.compile(SRC_HOST_RE_S)

    ds = _html_pages(sf_dir, ["url", "html"])

    def rows(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        cols: dict[str, list] = {"src_host": [], "dst_host": []}
        for i, data in enumerate(payloads):
            if not data.startswith(b"<!DOCTYPE html>"):
                continue
            # lowercase first: variant crawls carry mixed-case hosts
            # (corpus v3) and the SAME page must attribute to the SAME
            # source host — mirrored by lower(url) in the SQL oracle
            m = src_re.search(urls[i].lower())
            if m is None:
                continue
            src = m.group(1)
            for dst in link_re.findall(data.decode("utf-8")):
                cols["src_host"].append(src)
                cols["dst_host"].append(dst)
        return pa.table(
            {"src_host": pa.array(cols["src_host"], pa.string()),
             "dst_host": pa.array(cols["dst_host"], pa.string())}
        )

    return ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)


def host_link_graph(sf_dir: str) -> ray.data.Dataset:
    """Weighted host-to-host link graph: grouped count of cross-host
    anchors (combiner collapses per block; re-crawled records count each
    crawl, same as the oracle). Output: (src_host, dst_host, n_links)."""

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["src_host", "dst_host"]).reset_index(drop=True)

    return grouped_agg(
        host_link_rows(sf_dir),
        keys=["src_host", "dst_host"],
        specs=[("n_links", "count", None)],
        finalize=fin,
    )


# Cross-host anchors in the synth corpus are single-word texts:
#   <a href="https://hostN.example/p/M">word</a>
# The two-group form feeds the engine; the oracle (DuckDB regexp_extract_all
# returns ONE group per call) extracts full-anchor fragments with
# ANCHOR_FRAG_RE_S and re-parses each fragment for the two parts.
ANCHOR_RE_S = r'<a href="https://(host[0-9]+)\.example/p/[0-9]+">([^<]*)</a>'
ANCHOR_FRAG_RE_S = r'<a href="https://host[0-9]+\.example/p/[0-9]+">[^<]*</a>'


def anchor_text_rows(sf_dir: str) -> ray.data.Dataset:
    """(dst_host, anchor_text) per cross-host anchor — the raw rows of an
    anchor-text corpus (what web-scale retrieval training mines from link
    graphs: the text OTHER sites use to describe a target). Shuffle-free
    scan over the html branch, same predicate discipline as
    :func:`host_link_rows`."""
    anchor_re = re.compile(ANCHOR_RE_S)
    ds = _html_pages(sf_dir, ["html"])

    def rows(batch: pa.Table) -> pa.Table:
        hosts: list[str] = []
        texts: list[str] = []
        for data in batch.column("html").to_pylist():
            if not data.startswith(b"<!DOCTYPE html>"):
                continue
            for dst, text in anchor_re.findall(data.decode("utf-8")):
                hosts.append(dst)
                texts.append(text)
        return pa.table(
            {"dst_host": pa.array(hosts, pa.string()),
             "anchor_text": pa.array(texts, pa.string())}
        )

    return ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)


def anchor_texts(sf_dir: str) -> ray.data.Dataset:
    """Anchor-text corpus rollup: how many cross-host anchors point at each
    (dst_host, anchor_text). The combiner collapses repeats per block before
    the (tiny) grouped exchange — at crawl scale the distinct pair universe
    is vocabulary-sized, not corpus-sized. Output:
    (dst_host, anchor_text, n_anchors)."""

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["dst_host", "anchor_text"]).reset_index(drop=True)

    return grouped_agg(
        anchor_text_rows(sf_dir),
        keys=["dst_host", "anchor_text"],
        specs=[("n_anchors", "count", None)],
        finalize=fin,
    )


# dedup_winners packs (quality, doc_id) into ONE int64 so the per-cluster
# argmax is a single grouped Max instead of a max-then-filter join chain:
# composite = q4 << 49 | (2^49 - 1 - doc_id). q4 = quality·10⁴ ∈ [0, 10000]
# (14 bits); doc_id must fit 49 bits (5.6·10^14 — far above sequential ids
# for a 10^12-doc crawl; hash-shaped 63-bit ids need a remap first, and the
# encoder raises loudly rather than silently wrapping).
_WINNER_ID_BITS = 49
_WINNER_ID_MASK = (1 << _WINNER_ID_BITS) - 1


def dedup_winners(sf_dir: str) -> ray.data.Dataset:
    """Cluster-representative selection — the decision step AFTER
    :func:`dup_clusters`: keep, per near-duplicate cluster, the member with
    the best quality score (ties → min doc_id). This is what an actual
    training-data pipeline does with a dup graph (SemDeDup / Gopher keep
    rules).

    Deliberately JOIN-FREE: the obvious clusters ⋈ quality → per-cluster
    max → filter-at-max ⋈ back plan stacks three hash-shuffle join
    operators onto one lazy DAG (dup_clusters already carries one), which
    both over-reserves executor resources on small clusters and triples the
    all-to-all volume. Instead:

    1. column-align the two per-doc datasets (clusters, quality) and UNION
       them; ONE grouped max per doc_id merges the halves (nulls ignored) —
       rows are 4 int64s, the exchange is as skinny as a join's build side;
    2. pack (q4, ~doc_id) into one int64 (see above) so the per-cluster
       argmax-with-tiebreak is ONE grouped Max, decoded vectorized.

    Output: (cluster_id, keep_id, cluster_size, keep_quality), one row per
    cluster. Quality is rounded to 4 on BOTH sides before packing, so the
    argmax agrees exactly with the SQL twin's window rank."""
    import numpy as np

    from ray.data.aggregate import Max

    from .documents import quality_scores

    clusters = dup_clusters(sf_dir)
    quality = quality_scores(sf_dir).select_columns(["doc_id", "quality_score"])

    def c_half(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {"doc_id": pa.compute.cast(batch.column("doc_id"), pa.int64()),
             "cluster_id": pa.compute.cast(batch.column("cluster_id"), pa.int64()),
             "cluster_size": pa.compute.cast(batch.column("cluster_size"), pa.int64()),
             "q4": pa.nulls(n, pa.int64())}
        )

    def q_half(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        q = batch.column("quality_score").to_numpy(zero_copy_only=False)
        q4 = np.rint(q * 10000.0).astype(np.int64)
        return pa.table(
            {"doc_id": pa.compute.cast(batch.column("doc_id"), pa.int64()),
             "cluster_id": pa.nulls(n, pa.int64()),
             "cluster_size": pa.nulls(n, pa.int64()),
             "q4": pa.array(q4, pa.int64())}
        )

    both = clusters.map_batches(c_half, batch_format="pyarrow").union(
        quality.map_batches(q_half, batch_format="pyarrow")
    )
    merged = both.groupby("doc_id").aggregate(
        Max(on="cluster_id", alias_name="cluster_id"),
        Max(on="cluster_size", alias_name="cluster_size"),
        Max(on="q4", alias_name="q4"),
    )

    def enc(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) and int(ids.max()) >= (1 << _WINNER_ID_BITS):
            raise ValueError(
                f"dedup_winners packs doc_id into {_WINNER_ID_BITS} bits; "
                f"id {int(ids.max())} exceeds the range — remap hash-shaped "
                f"ids to a dense range first"
            )
        q4 = batch.column("q4").to_numpy(zero_copy_only=False)
        comp = (q4.astype(np.int64) << _WINNER_ID_BITS) | (_WINNER_ID_MASK - ids)
        return pa.table(
            {"cluster_id": batch.column("cluster_id"),
             "cluster_size": batch.column("cluster_size"),
             "composite": pa.array(comp, pa.int64())}
        )

    agg = merged.map_batches(enc, batch_format="pyarrow").groupby(
        "cluster_id"
    ).aggregate(
        Max(on="composite", alias_name="composite"),
        # functionally dependent on cluster_id: max == the value
        Max(on="cluster_size", alias_name="cluster_size"),
    )

    def decode(batch: pa.Table) -> pa.Table:
        comp = batch.column("composite").to_numpy(zero_copy_only=False)
        keep_id = _WINNER_ID_MASK - (comp & _WINNER_ID_MASK)
        q4 = comp >> _WINNER_ID_BITS
        return pa.table(
            {"cluster_id": batch.column("cluster_id"),
             "keep_id": pa.array(keep_id, pa.int64()),
             "cluster_size": pa.compute.cast(batch.column("cluster_size"), pa.int64()),
             "keep_quality": pa.array(q4 / 10000.0, pa.float64())}
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def pagerank_hosts(sf_dir: str) -> ray.data.Dataset:
    """Weighted PageRank over the host link graph, PAGERANK_ITERS fixed
    iterations (damping 0.85, uniform teleport, no dangling-mass
    redistribution — the simple variant, declared so the SQL twin unrolls
    the same recurrence). Two paths, switched on the WEIGHTED-EDGE count of
    the already-aggregated host graph (never page-level): small graphs run
    the whole recurrence as one numpy pass on the driver
    (:func:`_pagerank_single_pass` — per-round Ray job overhead dwarfs the
    math below the cap); large graphs run each iteration as one hash join
    (ranks ⋈ edges on src) + one grouped sum keyed by dst — both
    distributed, the driver holding only the loop counter. Output:
    (host, rank) rounded to 6 (absorbs per-dst float summation order).

    The per-iteration rank table is materialized: it is O(hosts) — at
    crawl scale millions of rows, not corpus-sized — and without it each
    round would re-execute the whole upstream lineage."""
    edges = host_link_graph(sf_dir)

    # out-weight per source, joined onto edges once: contribution fraction
    outw = grouped_agg(
        edges.select_columns(["src_host", "n_links"]),
        keys=["src_host"], specs=[("outw", "sum", "n_links")],
    )
    parts = choose_join_parts(sf_dir, "documents")
    edges = edges.join(
        outw, join_type="inner", num_partitions=parts,
        on=("src_host",),
    ).materialize()

    # node table stays distributed: distinct(src ∪ dst) via one-pass
    # aggregate — the host universe is never collected to the driver
    from .common import distinct

    hosts_ds = distinct(
        edges.select_columns(["src_host"]).rename_columns({"src_host": "host"})
        .union(
            edges.select_columns(["dst_host"]).rename_columns({"dst_host": "host"})
        ),
        keys=["host"],
    ).materialize()
    n = hosts_ds.count()
    ranks = hosts_ds.map_batches(
        lambda b: pa.table({"host": b.column("host"),
                            "rank": pa.array([1.0 / n] * b.num_rows, pa.float64())}),
        batch_format="pyarrow",
    )

    if edges.count() <= PR_SINGLE_PASS_EDGE_CAP:
        return _pagerank_single_pass(edges, hosts_ds, n)

    for _ in range(PAGERANK_ITERS):
        contrib = edges.join(
            ranks, join_type="inner", num_partitions=parts,
            on=("src_host",), right_on=("host",),
        )

        def c_rows(batch: pa.Table) -> pa.Table:
            r = batch.column("rank").to_numpy(zero_copy_only=False)
            w = batch.column("n_links").to_numpy(zero_copy_only=False)
            ow = batch.column("outw").to_numpy(zero_copy_only=False)
            return pa.table(
                {"host": batch.column("dst_host"),
                 "c": pa.array(r * w / ow, pa.float64())}
            )

        summed = grouped_agg(
            contrib.map_batches(c_rows, batch_format="pyarrow"),
            keys=["host"], specs=[("c", "sum", "c")],
        )
        joined = ranks.select_columns(["host"]).join(
            summed, join_type="left_outer", num_partitions=parts, on=("host",),
        )

        def apply(batch: pa.Table) -> pa.Table:
            import numpy as np

            c = batch.column("c").to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c), 0.0, c)
            return pa.table(
                {"host": batch.column("host"),
                 "rank": pa.array((1.0 - PAGERANK_DAMPING) / n
                                  + PAGERANK_DAMPING * c, pa.float64())}
            )

        ranks = joined.map_batches(apply, batch_format="pyarrow").materialize()

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        r = batch.column("rank").to_numpy(zero_copy_only=False)
        # round-half-even to match the SQL twin's round_even
        return pa.table(
            {"host": batch.column("host"),
             "rank": pa.array([round(float(x), 6) for x in r], pa.float64())}
        )

    return ranks.map_batches(finish, batch_format="pyarrow")


# The HOST graph is the already-aggregated link rollup (one row per
# (src_host, dst_host), never page-level). Below this many weighted edges
# the fixed-iteration recurrence runs as one numpy pass on the driver —
# each distributed round otherwise costs more in Ray job overhead than the
# whole computation. Above it (a genuine web-scale host graph), the
# join+grouped-sum rounds take over. 2M edges ≈ 50 MB.
PR_SINGLE_PASS_EDGE_CAP = 2_000_000


def _pagerank_single_pass(
    edges: ray.data.Dataset, hosts_ds: ray.data.Dataset, n: int
) -> ray.data.Dataset:
    """Same recurrence, one process: r0 = 1/N; r_{k+1}(v) = (1-d)/N +
    d * Σ_in r_k(u)·w/outw(u), PAGERANK_ITERS rounds, round-half-even 6.
    Rounding absorbs the summation-order difference vs the distributed
    grouped sum (both are plain float64 adds of the same terms)."""
    import numpy as np

    host_rows = [r["host"] for r in hosts_ds.select_columns(["host"]).take_all()]
    idx = {h: i for i, h in enumerate(sorted(host_rows))}
    src = np.empty(edges.count(), dtype=np.int64)
    dst = np.empty_like(src)
    frac = np.empty(len(src), dtype=np.float64)
    pos = 0
    for batch in edges.iter_batches(batch_format="pyarrow"):
        s = batch.column("src_host").to_pylist()
        d = batch.column("dst_host").to_pylist()
        w = batch.column("n_links").to_numpy(zero_copy_only=False)
        ow = batch.column("outw").to_numpy(zero_copy_only=False)
        k = len(s)
        src[pos : pos + k] = [idx[x] for x in s]
        dst[pos : pos + k] = [idx[x] for x in d]
        frac[pos : pos + k] = w / ow
        pos += k
    rank = np.full(len(idx), 1.0 / n)
    for _ in range(PAGERANK_ITERS):
        c = np.zeros(len(idx))
        np.add.at(c, dst, rank[src] * frac)
        rank = (1.0 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * c
    hosts_sorted = sorted(idx)
    return ray.data.from_arrow(
        pa.table(
            {"host": pa.array(hosts_sorted, pa.string()),
             "rank": pa.array([round(float(r), 6) for r in rank], pa.float64())}
        )
    )


def _cc_single_pass(edges: ray.data.Dataset, docs: ray.data.Dataset) -> ray.data.Dataset:
    """Union-find over the (small, already-LSH-shrunk) pair list; the
    {node → min-label} map — O(near-dup docs), NOT corpus-sized — is
    ray.put once and applied per batch over the distributed doc spine."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_format="pyarrow"):
        a_col = batch.column("a").to_pylist()
        b_col = batch.column("b").to_pylist()
        for a, b in zip(a_col, b_col):
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        del a_col, b_col

    # min-doc_id labeling: union-by-smaller-root above keeps every root the
    # min of its component, matching the label-propagation fixpoint exactly
    label_map = {x: find(x) for x in list(parent.keys())}
    map_ref = ray.put(label_map)

    def apply(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {"node": batch.column("doc_id"),
             "label": pa.array([m.get(i, i) for i in ids], pa.int64())}
        )

    return docs.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def _cc_label_propagation(
    edges: ray.data.Dataset, docs: ray.data.Dataset, parts: int
) -> ray.data.Dataset:
    labels = docs.map_batches(
        lambda b: pa.table({"node": b.column("doc_id"),
                            "label": b.column("doc_id")}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    prev_sum = None
    converged = False
    for _ in range(CLUSTER_MAX_ITERS):
        msgs = edges.join(
            labels, join_type="inner", num_partitions=parts,
            on=("a",), right_on=("node",),
        ).map_batches(
            lambda batch: pa.table({"node": batch.column("b"),
                                    "label": batch.column("label")}),
            batch_format="pyarrow",
        )
        labels = grouped_agg(
            labels.union(msgs), keys=["node"], specs=[("label", "min", "label")]
        ).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        import logging

        logging.getLogger("ocr_ray.graph").warning(
            "dup_clusters: label propagation hit CLUSTER_MAX_ITERS=%d without "
            "reaching the fixpoint — a component has diameter > %d and its "
            "cluster ids may not be fully merged", CLUSTER_MAX_ITERS,
            CLUSTER_MAX_ITERS,
        )
    return labels


# Below this many dup pairs the whole CC runs as ONE union-find pass on the
# driver over the pair list only (O(dup pairs) — never corpus-sized: the LSH
# stage has already shrunk the graph to verified near-dup candidates). Above
# it, distributed min-label propagation takes over. 5M edges ≈ 80 MB.
CC_SINGLE_PASS_EDGE_CAP = 5_000_000


def dup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Connected components of the MinHash near-duplicate pair graph —
    the step that turns pairwise candidates into dedup DECISIONS (keep one
    doc per cluster). Output: (doc_id, cluster_id, cluster_size) for every
    document; singletons cluster to themselves; cluster_id is the MIN doc_id
    in the component. Oracle: DuckDB recursive CTE over the same recomputed
    pair graph.

    Two paths, switched on the pair-graph size (NOT the corpus size):

    - ``≤ CC_SINGLE_PASS_EDGE_CAP`` edges: one union-find pass over the pair
      list, broadcast of the resulting {node → min-label} map (O(near-dup
      docs)), labels applied per-batch over the distributed doc spine. Full
      transitive closure, no iteration cap, and none of the per-round Ray
      job overhead that dominated the distributed loop at small scale.
    - larger graphs: distributed min-label propagation — each round one hash
      join (labels ⋈ symmetrized edges) + a grouped min, O(diameter) rounds.
      Convergence = monotone label-sum fixpoint (labels only decrease, so an
      unchanged SUM(label) means fixpoint). If CLUSTER_MAX_ITERS exhausts
      without the fixpoint (component diameter > cap), a WARNING is logged —
      never a silent cap-exit."""
    from .common import read_table
    from .documents import minhash_dup_pairs

    pairs = minhash_dup_pairs(sf_dir).select_columns(["doc_a", "doc_b"])

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a")
        b = batch.column("doc_b")
        return pa.table(
            {"a": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
             "b": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])}
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    parts = choose_join_parts(sf_dir, "documents")
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    if edges.count() <= CC_SINGLE_PASS_EDGE_CAP:
        labels = _cc_single_pass(edges, docs)
    else:
        labels = _cc_label_propagation(edges, docs, parts)

    sizes = grouped_agg(
        labels.select_columns(["label"]), keys=["label"],
        specs=[("cluster_size", "count", None)],
    )
    out = labels.join(sizes, join_type="inner", num_partitions=parts, on=("label",))

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("node"),
             "cluster_id": batch.column("label"),
             "cluster_size": pa.compute.cast(
                 batch.column("cluster_size"), pa.int64())}
        )

    return out.map_batches(shape, batch_format="pyarrow")


def _canonical_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct undirected host edges as (a, b) with a < b, self-loops
    dropped — one combiner-collapsed distinct over the link rows."""
    from .common import distinct, from_pandas_clean

    rows = host_link_rows(sf_dir)

    def canon(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["src_host"] != df["dst_host"]]
        a = df[["src_host", "dst_host"]].min(axis=1)
        b = df[["src_host", "dst_host"]].max(axis=1)
        return from_pandas_clean(
            pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        )

    return distinct(
        rows.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
    )


def host_triangles(sf_dir: str, _edges: "ray.data.Dataset | None" = None) -> ray.data.Dataset:
    """Per-host triangle participation over the undirected distinct host
    link graph — the local-clustering signal used to separate organic link
    neighborhoods from link farms (a farm's hub closes few triangles
    relative to its degree).

    Scale shape — the classic two-join MR triangle enumeration, fully
    streamed: (1) canonical distinct edges (a<b) via one combiner distinct;
    (2) wedges by a co-partitioned self-join on the lower endpoint,
    keeping b<c so each wedge is built exactly once; (3) close each wedge
    with a second co-partitioned join against the edge list on (b, c).
    Every triangle a<b<c is found exactly once. Both joins are hash joins
    on Dataset.join — no driver materialization of the graph; the wedge
    stream (sum of deg² over lower endpoints) is the natural cost of the
    algorithm and the reason real deployments orient edges by degree —
    documented assumption: host-graph degree is bounded by template
    structure, and the b<c orientation already halves the wedge count.

    Output: (host, n_triangles) for hosts in >= 1 triangle. Oracle: the
    same three-way self-join in SQL over the raw corpus anchors."""
    # _edges: a pre-materialized canonical edge list (host_clustering
    # passes its own so the corpus is parsed once, not once per consumer)
    edges = _edges if _edges is not None else _canonical_edges(sf_dir).materialize()
    parts = max(4, choose_join_parts(sf_dir, floor=4))

    # DEGREE-ORIENTED wedges (the standard hub-killer): orient every edge
    # from its lower-(degree, name) endpoint; wedges form only at a
    # vertex's OUT-neighbors, so a hub of degree d contributes
    # outdeg(u)^2 <= O(E) total wedges instead of d^2 (measured: sf0.1
    # host graph 34.8 s lexicographic -> ~3 s oriented). Each triangle
    # has exactly one vertex with two out-edges (the (deg, name)-minimum),
    # so every triangle is built and closed exactly once.
    from .common import from_pandas_clean as _fpc

    deg_rows = grouped_agg(
        edges.map_batches(
            lambda b: _fpc(pd.DataFrame(
                {"host": pd.concat([b.to_pandas()["a"], b.to_pandas()["b"]],
                                   ignore_index=True)}
            ).groupby("host", as_index=False).size().rename(
                columns={"size": "degree"})),
            batch_format="pyarrow", zero_copy_batch=True),
        keys=["host"], specs=[("degree", "sum", "degree")],
    ).take_all()
    deg_ref = ray.put({r["host"]: r["degree"] for r in deg_rows})

    def orient(batch: pa.Table, _d=deg_ref) -> pa.Table:
        d = ray.get(_d)
        df = batch.to_pandas()
        da = df["a"].map(d)
        db = df["b"].map(d)
        # orientation key (degree, name): a_first iff (da, a) < (db, b)
        a_first = (da < db) | ((da == db) & (df["a"] < df["b"]))
        return _fpc(pd.DataFrame(
            {"u": df["a"].where(a_first, df["b"]),
             "v": df["b"].where(a_first, df["a"])}
        ))

    oriented = edges.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True).materialize()

    right = oriented.rename_columns({"u": "u2", "v": "c"})
    wedges = oriented.join(
        right, join_type="inner", num_partitions=parts,
        on=("u",), right_on=("u2",),
    )

    def keep_ordered(batch: pa.Table, _d=deg_ref) -> pa.Table:
        d = ray.get(_d)
        df = batch.to_pandas()
        dv = df["v"].map(d)
        dc = df["c"].map(d)
        keep = (dv < dc) | ((dv == dc) & (df["v"] < df["c"]))
        return _fpc(df[keep].reset_index(drop=True))

    wedges = wedges.map_batches(keep_ordered, batch_format="pyarrow",
                                zero_copy_batch=True)

    closer = oriented.rename_columns({"u": "v2", "v": "c2"})
    tris = wedges.join(
        closer, join_type="inner", num_partitions=parts,
        on=("v", "c"), right_on=("v2", "c2"),
    )

    def explode_hosts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        from .common import from_pandas_clean

        out = pd.DataFrame(
            {"host": pd.concat([df["u"], df["v"], df["c"]], ignore_index=True)}
        )
        out = out.groupby("host", as_index=False).size().rename(
            columns={"size": "n_triangles"})
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("host").reset_index(drop=True)

    return grouped_agg(
        tris.map_batches(explode_hosts, batch_format="pyarrow"),
        keys=["host"],
        specs=[("n_triangles", "sum", "n_triangles")],
        finalize=fin,
    )


# Mirror detection: hosts sharing >= MIRROR_MIN_SHARED distinct syndicated
# paragraphs (>= MIRROR_MIN_PAR_CHARS chars so navigation crumbs don't
# count). Hosts per paragraph hash are capped like every all-pairs bucket
# (cap mirrored in the SQL oracle so the gate can't diverge one-sided).
MIRROR_MIN_PAR_CHARS = 50
MIRROR_MIN_SHARED = 2
MIRROR_HOST_CAP = 256


def mirror_hosts(sf_dir: str) -> ray.data.Dataset:
    """Host pairs that share duplicated long paragraphs — the mirror/
    syndication detector that runs before host-level dedup decisions (a
    pair sharing many paragraphs is one site crawled under two names, or a
    wire service and its subscribers).

    Scale shape: only (hash, host) rows cross the exchanges — never
    paragraph text; distinct is one combiner pass; the all-pairs step runs
    per paragraph-hash group with the standard deterministic member cap
    (boilerplate shared by every host would otherwise square); the final
    count per host pair is a grouped sum. Output: (host_a, host_b,
    n_shared) with n_shared >= MIRROR_MIN_SHARED."""
    from .common import cap_bucket_members, distinct
    from .extraction_queries import extraction_output, line_hash64

    src_re = re.compile(SRC_HOST_RE_S)
    out = extraction_output(sf_dir, columns=["url", "text", "error"])

    def par_rows(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        ok = pa.compute.is_null(batch.column("error")).to_pylist()
        hs: list[int] = []
        hosts: list[str] = []
        for i, text in enumerate(texts):
            if not ok[i] or not text:
                continue
            m = src_re.search(urls[i].lower())
            if m is None:
                continue
            host = m.group(1)
            for p in text.split("\n\n"):
                if len(p) >= MIRROR_MIN_PAR_CHARS:
                    hs.append(line_hash64(p))
                    hosts.append(host)
        t = pa.table(
            {"h": pa.array(hs, pa.int64()), "host": pa.array(hosts, pa.string())}
        )
        # per-batch pre-dedup shrinks the distinct exchange
        return t.group_by(["h", "host"]).aggregate([])

    ph = distinct(
        out.map_batches(par_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["h", "host"],
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        hosts = sorted(group.column("host").to_pylist())
        keep = cap_bucket_members(
            len(hosts), "mirror_hosts",
            group.column("h")[0].as_py() if group.num_rows else None,
            cap=MIRROR_HOST_CAP,
        )
        hosts = hosts[:keep]
        out_rows = [
            {"host_a": hosts[i], "host_b": hosts[j], "n_shared": 1}
            for i in range(len(hosts))
            for j in range(i + 1, len(hosts))
        ]
        return pa.Table.from_pylist(
            out_rows,
            schema=pa.schema(
                [pa.field("host_a", pa.string()), pa.field("host_b", pa.string()),
                 pa.field("n_shared", pa.int64())]
            ),
        )

    pairs = ph.groupby("h").map_groups(bucket_pairs, batch_format="pyarrow")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_shared"] >= MIRROR_MIN_SHARED]
        return df.sort_values(["host_a", "host_b"]).reset_index(drop=True)

    return grouped_agg(
        pairs,
        keys=["host_a", "host_b"],
        specs=[("n_shared", "sum", "n_shared")],
        finalize=fin,
    )


POWERLAW_QLOG_SCALE = 1_000_000


def host_degree_powerlaw(sf_dir: str) -> ray.data.Dataset:
    """Out-degree distribution of the host link graph fitted with a log-log
    OLS line (the power-law exponent estimate every web-graph census
    reports; Broder et al. 2000 measure exactly this curve).

    Scale shape: degree and histogram are two combiner-collapsed exchanges
    over the already-aggregated edge list (bounded by |hosts|, then by
    |distinct degrees|); the regression uses the quantized-log integer-
    moment discipline (token_entropy / value_trend_by_type): both sides
    quantize ln(·)·1e6 to exact int64 (round half-even) so the moment sums
    are order-free integers and the slope is ONE double division.

    Output: one row (n_points, slope, intercept)."""
    import math

    edges = host_link_graph(sf_dir)

    def drop_dst(batch: pa.Table) -> pa.Table:
        return batch.select(["src_host"])

    deg = grouped_agg(
        edges.map_batches(drop_dst, batch_format="pyarrow", zero_copy_batch=True),
        keys=["src_host"],
        specs=[("degree", "count", None)],
    )

    def drop_host(batch: pa.Table) -> pa.Table:
        return batch.select(["degree"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        s = POWERLAW_QLOG_SCALE
        qx = [round(math.log(int(d)) * s) for d in df["degree"]]
        qy = [round(math.log(int(m)) * s) for m in df["n_hosts"]]
        n = len(qx)
        sx, sy = sum(qx), sum(qy)
        sxx = sum(x * x for x in qx)
        sxy = sum(x * y for x, y in zip(qx, qy))
        den = n * sxx - sx * sx
        slope = 0.0 if den == 0 else float(n * sxy - sx * sy) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        return pd.DataFrame(
            {"n_points": pd.Series([n], dtype="int64"),
             "slope": [slope], "intercept": [intercept]}
        )

    return grouped_agg(
        deg.map_batches(drop_host, batch_format="pyarrow", zero_copy_batch=True),
        keys=["degree"],
        specs=[("n_hosts", "count", None)],
        finalize=fin,
    )


def crawl_priorities(sf_dir: str) -> ray.data.Dataset:
    """Recrawl scheduling priorities: PageRank × staleness — the composed
    signal a crawl frontier actually ranks by (important AND stale first).
    priority = rank · (staleness_days + 1), staleness measured against the
    corpus's most recent crawl timestamp.

    Scale shape: both inputs are already host-level aggregates (bounded by
    |hosts|, not docs); the global max-timestamp scalar broadcasts, and the
    rank⋈freshness match is a co-partitioned ``Dataset.join`` on the host
    key (NOT a driver-side collect — 10^8 hosts at crawl scale). The link
    graph names hosts by their short label, so freshness hosts fold to
    split('.')[0] before the join.

    Output: (host, rank, staleness_days, priority) by priority desc, host."""
    from ray.data.aggregate import Max

    from .common import from_pandas_clean
    from .extraction_queries import host_freshness

    pr = pagerank_hosts(sf_dir)
    fresh = host_freshness(sf_dir)

    def shorten(batch: pa.Table) -> pa.Table:
        # variant crawls carry mixed-case hosts (corpus v3): the SAME site
        # must fold to ONE short label, so lowercase before the split and
        # re-aggregate (freshness rows are per raw authority)
        hosts = [h.lower().split(".")[0]
                 for h in batch.column("host").to_pylist()]
        return pa.table({"fhost": pa.array(hosts, pa.string()),
                         "last_seen": batch.column("last_seen")})

    # host-level frame (bounded by |hosts|): materialize ONCE so the max
    # scalar and the join don't each re-run the freshness chain
    fresh_short = grouped_agg(
        fresh.map_batches(shorten, batch_format="pyarrow", zero_copy_batch=True),
        keys=["fhost"],
        specs=[("last_seen", "max", "last_seen")],
    ).materialize()
    max_last = fresh_short.aggregate(Max(on="last_seen", alias_name="m"))["m"]

    joined = pr.join(
        fresh_short, "inner",
        num_partitions=choose_join_parts(sf_dir),
        on=("host",), right_on=("fhost",),
    )

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        us = (pd.Timestamp(max_last) - df["last_seen"]).astype(
            "timedelta64[us]").astype("int64")
        stale = (us // 86_400_000_000).astype("int64")
        df["staleness_days"] = stale
        df["priority"] = [
            r * float(s + 1) for r, s in zip(df["rank"], stale)
        ]
        return from_pandas_clean(
            df[["host", "rank", "staleness_days", "priority"]])

    return joined.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["priority", "host"], descending=[True, False])


KCORE_K = 3
KCORE_ROUNDS = 6


def k_core_hosts(sf_dir: str) -> ray.data.Dataset:
    """k-core peeling over the undirected distinct host link graph:
    KCORE_ROUNDS rounds of "drop every host with degree < KCORE_K, then
    recompute degrees on the induced subgraph" — the standard spam-farm /
    community-kernel extraction. Both engine and oracle run EXACTLY
    KCORE_ROUNDS rounds (the suite's unrolled-iteration discipline, same
    as pagerank/k-means), so the gate never depends on convergence.

    Scale shape: per-round state is one degree table (O(hosts), built by a
    combiner-collapsed grouped count over the edge list) and one surviving
    host set broadcast via ray.put — the edge list itself is filtered by a
    shuffle-free map_batches semi-join per round, never re-shuffled. The
    documented assumption (same as mirror_hosts/pagerank): the HOST
    dimension fits the object store; edges stay distributed.

    Output: (host, core_degree) for hosts alive after the last peel, with
    their induced-subgraph degree, ordered by host."""
    import numpy as np

    from .common import from_pandas_clean

    edges = _canonical_edges(sf_dir).materialize()

    def degrees(ed: ray.data.Dataset) -> ray.data.Dataset:
        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            out = pd.DataFrame(
                {"host": pd.concat([df["a"], df["b"]], ignore_index=True)}
            ).groupby("host", as_index=False).size().rename(
                columns={"size": "deg"})
            return from_pandas_clean(out)

        return grouped_agg(
            ed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["host"], specs=[("deg", "sum", "deg")])

    deg = degrees(edges).materialize()
    for _ in range(KCORE_ROUNDS):
        alive = frozenset(
            r["host"] for r in deg.take_all() if r["deg"] >= KCORE_K)
        alive_ref = ray.put(alive)

        def keep_edges(batch: pa.Table) -> pa.Table:
            aset = ray.get(alive_ref)
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            keep = np.fromiter(
                (x in aset and y in aset for x, y in zip(a, b)),
                dtype=bool, count=len(a))
            return batch.filter(pa.array(keep))

        edges = edges.map_batches(
            keep_edges, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        deg = degrees(edges).materialize()

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["core_degree"] = df["core_degree"].astype("int64")
        return df.sort_values("host").reset_index(drop=True)

    return grouped_agg(
        deg, keys=["host"], specs=[("core_degree", "sum", "deg")], finalize=fin)


HITS_ROUNDS = 2


def hits_scores(sf_dir: str) -> ray.data.Dataset:
    """HITS hubs-and-authorities over the weighted host link graph —
    Kleinberg's twin of PageRank: a good hub links to good authorities, a
    good authority is linked from good hubs. Run UNNORMALIZED in pure
    int64 for exactly HITS_ROUNDS rounds: the per-round L1 normalization
    only rescales (rankings are scale-invariant), and dropping it keeps
    every score an exact integer — no float sum-order noise for the hash
    gate to trip on (documented bound: scores grow like (deg·w)^rounds,
    ~10^12 for a 10^3-degree weighted host graph at 2 rounds — int64 safe).

    Scale shape: same dataflow as pagerank_hosts' distributed path — each
    half-round is one hash join (scores ⋈ edges) + one combiner-collapsed
    grouped sum, per-round state is O(hosts) and materialized; nodes with
    no in/out edges keep score 0 via the final left joins.

    Output: (host, hub, auth) after HITS_ROUNDS rounds, ordered by host."""
    from .common import distinct, from_pandas_clean

    edges = host_link_graph(sf_dir).materialize()
    parts = choose_join_parts(sf_dir, "documents")

    nodes = distinct(
        edges.select_columns(["src_host"]).rename_columns({"src_host": "host"})
        .union(
            edges.select_columns(["dst_host"]).rename_columns({"dst_host": "host"})
        ),
        keys=["host"],
    ).materialize()

    hub = nodes.map_batches(
        lambda b: pa.table({"host": b.column("host"),
                            "hub": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow",
    ).materialize()

    auth = None
    for _ in range(HITS_ROUNDS):
        j = edges.join(
            hub, join_type="inner", num_partitions=parts,
            on=("src_host",), right_on=("host",),
        )

        def a_rows(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {"host": batch.column("dst_host"),
                 "auth": pc.multiply(batch.column("n_links"),
                                     batch.column("hub"))}
            )

        auth = grouped_agg(
            j.map_batches(a_rows, batch_format="pyarrow"),
            keys=["host"], specs=[("auth", "sum", "auth")]).materialize()

        j2 = edges.join(
            auth, join_type="inner", num_partitions=parts,
            on=("dst_host",), right_on=("host",),
        )

        def h_rows(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {"host": batch.column("src_host"),
                 "hub": pc.multiply(batch.column("n_links"),
                                    batch.column("auth"))}
            )

        hub = grouped_agg(
            j2.map_batches(h_rows, batch_format="pyarrow"),
            keys=["host"], specs=[("hub", "sum", "hub")]).materialize()

    out = nodes.join(
        hub, join_type="left_outer", num_partitions=parts, on=("host",),
    ).join(
        auth, join_type="left_outer", num_partitions=parts, on=("host",),
    )

    def fin(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hub"] = df["hub"].fillna(0).astype("int64")
        df["auth"] = df["auth"].fillna(0).astype("int64")
        return from_pandas_clean(df[["host", "hub", "auth"]])

    return out.map_batches(fin, batch_format="pyarrow").sort("host")


def host_components(sf_dir: str) -> ray.data.Dataset:
    """Connected components of the UNDIRECTED host link graph — the
    crawl-frontier / mirror-cluster partitioning that groups hosts into
    isolated link islands. Output: (host, component_id, component_size)
    for every host that appears in the link graph (either side of any
    anchor); component_id is the MIN host string in the component.

    Scale shape: hosts are the dimension side of the corpus (bounded by
    web-site count, not page count), so the distinct canonical edge list is
    dimension-sized; the same union-find single pass as dup_clusters runs
    over it and only the {host → label} map is broadcast — the per-host
    spine is labeled distributed, per batch. A link graph beyond
    CC_SINGLE_PASS_EDGE_CAP edges would switch to the label-propagation
    rounds exactly as dup_clusters does (same code path shape).

    Oracle: DuckDB recursive CTE over the same link CTEs."""
    from .common import distinct, from_pandas_clean

    edges = _canonical_edges(sf_dir)

    rows = host_link_rows(sf_dir)

    def node_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src_host").combine_chunks()
        dst = batch.column("dst_host").combine_chunks()
        return pa.table({"host": pa.concat_arrays([src, dst])})

    nodes = distinct(
        rows.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
    )

    # union-find over the dimension-sized edge list (strings; min-string
    # labeling via union-by-smaller-root, mirroring _cc_single_pass)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch.column("a").to_pylist(),
                        batch.column("b").to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

    label_map = {x: find(x) for x in list(parent.keys())}
    map_ref = ray.put(label_map)

    def label(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        hosts = batch.column("host").to_pylist()
        return pa.table(
            {"host": batch.column("host"),
             "component_id": pa.array([m.get(h, h) for h in hosts], pa.string())}
        )

    labeled = nodes.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)
    # component sizes are dimension-sized (one row per component): grouped
    # partial counts, then a broadcast lookup — no corpus-scale join
    sizes = grouped_agg(
        labeled.select_columns(["component_id"]), keys=["component_id"],
        specs=[("component_size", "count", None)],
    )
    size_map = {r["component_id"]: int(r["component_size"])
                for r in sizes.take_all()}
    size_ref = ray.put(size_map)

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(size_ref)
        comp = batch.column("component_id").to_pylist()
        return batch.append_column(
            "component_size", pa.array([m[c] for c in comp], pa.int64()))

    out = labeled.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df[["host", "component_id", "component_size"]].sort_values(
            "host").reset_index(drop=True)

    return out.repartition(1).map_batches(
        lambda b: from_pandas_clean(fin(b.to_pandas())), batch_format="pyarrow")


def _tarjan_scc(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Iterative Tarjan SCC over an adjacency list; returns {node →
    min-node-in-SCC}. O(V+E), no recursion (host graphs are shallow but
    Python's recursion limit is not a scale plan)."""
    adj: dict[str, list[str]] = {}
    nodes: set[str] = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    label: dict[str, str] = {}
    counter = 0
    for root in sorted(nodes):
        if root in index:
            continue
        work: list[tuple[str, int]] = [(root, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter
                counter += 1
                stack.append(node)
                on_stack.add(node)
            advanced = False
            children = adj.get(node, ())
            for next_i in range(pi, len(children)):
                child = children[next_i]
                if child not in index:
                    work[-1] = (node, next_i + 1)
                    work.append((child, 0))
                    advanced = True
                    break
                if child in on_stack:
                    low[node] = min(low[node], index[child])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                lab = min(comp)
                for w in comp:
                    label[w] = lab
    return label


def host_scc(sf_dir: str) -> ray.data.Dataset:
    """Strongly connected components of the DIRECTED host link graph —
    the mutual-reachability partition that separates genuine link
    communities (cliques of cross-linking hosts) from one-way citation
    flows, the structure PageRank's convergence and link-spam analyses
    care about. Output: (host, scc_id, scc_size) for every host in the
    link graph; scc_id = MIN host in the component (one-way-linked hosts
    form singleton components).

    Scale shape: the same dimension-side law as host_components — the
    distinct directed edge list is site-count sized, Tarjan runs O(V+E)
    on it once, and only the {host → scc} map broadcasts; the host spine
    labels distributed. Oracle: DuckDB recursive transitive closure +
    mutual-reachability reduction over the same link CTEs."""
    from .common import distinct, from_pandas_clean, grouped_agg

    rows = host_link_rows(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["src_host"] != df["dst_host"]]
        return from_pandas_clean(
            df.rename(columns={"src_host": "s", "dst_host": "d"})
            [["s", "d"]].drop_duplicates()
        )

    edges_ds = distinct(
        rows.map_batches(directed, batch_format="pyarrow", zero_copy_batch=True),
        ["s", "d"],
    )
    edge_list = [(r["s"], r["d"]) for r in edges_ds.take_all()]
    label = _tarjan_scc(edge_list)
    map_ref = ray.put(label)

    def node_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src_host").combine_chunks()
        dst = batch.column("dst_host").combine_chunks()
        return pa.table({"host": pa.concat_arrays([src, dst])})

    nodes = distinct(
        rows.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
    )

    def lab(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        hosts = batch.column("host").to_pylist()
        return pa.table(
            {"host": batch.column("host"),
             "scc_id": pa.array([m.get(h, h) for h in hosts], pa.string())}
        )

    labeled = nodes.map_batches(lab, batch_format="pyarrow", zero_copy_batch=True)
    sizes = grouped_agg(
        labeled.select_columns(["scc_id"]), keys=["scc_id"],
        specs=[("scc_size", "count", None)],
    )
    size_map = {r["scc_id"]: int(r["scc_size"]) for r in sizes.take_all()}
    size_ref = ray.put(size_map)

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(size_ref)
        ids = batch.column("scc_id").to_pylist()
        return batch.append_column(
            "scc_size", pa.array([m[c] for c in ids], pa.int64()))

    out = labeled.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df[["host", "scc_id", "scc_size"]].sort_values(
            "host").reset_index(drop=True)

    return out.repartition(1).map_batches(
        lambda b: from_pandas_clean(fin(b.to_pandas())), batch_format="pyarrow")


def host_clustering(sf_dir: str) -> ray.data.Dataset:
    """Per-host LOCAL CLUSTERING COEFFICIENT over the undirected distinct
    host link graph: c(v) = 2·t(v) / (deg(v)·(deg(v)−1)) — the
    link-farm/organic-neighborhood separator host_triangles motivates,
    finished into the normalized 0–1 score (a farm hub has high degree,
    near-zero closure; a community hub closes most of its wedges).

    Scale shape: degrees come from ONE combiner-collapsed count over the
    canonical edge list (each edge contributes to two hosts); triangle
    participation reuses :func:`host_triangles`' two-join enumeration; the
    two per-host rollups meet in a co-partitioned LEFT OUTER hash join on
    host (hosts closing no triangle keep degree and get t = 0) — nothing
    driver-side, both sides are per-host rows, never edges. The score is
    one exact int→double division shared with the SQL twin.

    Output: (host, degree, n_triangles, clustering) for every host with
    ≥ 1 edge, ordered by host."""
    from .common import choose_join_parts, from_pandas_clean, grouped_agg

    edges = _canonical_edges(sf_dir).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {"host": pd.concat([df["a"], df["b"]], ignore_index=True)}
        ).groupby("host", as_index=False).size().rename(columns={"size": "degree"})
        return from_pandas_clean(out)

    degrees = grouped_agg(
        edges.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host"],
        specs=[("degree", "sum", "degree")],
    )

    tris = host_triangles(sf_dir, _edges=edges).rename_columns({"host": "t_host"})
    parts = max(4, choose_join_parts(sf_dir, floor=4))
    joined = degrees.join(
        tris, join_type="left_outer", num_partitions=parts,
        on=("host",), right_on=("t_host",),
    )

    def fin(batch: pa.Table) -> pa.Table:
        import numpy as np

        df = batch.to_pandas()
        t = df["n_triangles"].fillna(0).astype("int64")
        d = df["degree"].astype("int64")
        denom = d * (d - 1)
        clustering = np.where(
            denom > 0, (2.0 * t.to_numpy()) / denom.to_numpy(), 0.0)
        out = pd.DataFrame(
            {"host": df["host"], "degree": d, "n_triangles": t,
             "clustering": clustering}
        ).sort_values("host").reset_index(drop=True)
        return from_pandas_clean(out)

    return joined.repartition(1).map_batches(
        fin, batch_format="pyarrow", batch_size=None)


KHOP_ROUNDS = 3


def khop_reach(sf_dir: str) -> ray.data.Dataset:
    """Bounded-depth BFS reach: every host within KHOP_ROUNDS undirected
    hops of a deterministic seed (the lexicographically smallest host in
    the link graph), with its hop distance — the blast-radius query a
    crawl operator runs before retiring a host (what neighborhoods feed
    it) and the canonical frontier-expansion pattern.

    Scale shape: the edge list is materialized ONCE; each round broadcasts
    the current frontier (ray.put, read zero-copy per task) and one
    map_batches pass emits neighbor candidates which a combiner distinct
    collapses before the driver merges them into the visited map — per
    round only (new reach) rows move, never edges. Documented assumption:
    the K-hop neighborhood of one seed fits the driver (it is a community,
    not the graph); a whole-graph BFS would run the same rounds with the
    distance map sharded, which is exactly :func:`host_components`' label
    machinery.

    Output: (host, hop) for hop ≤ KHOP_ROUNDS, ordered by hop, host."""
    from .common import distinct, from_pandas_clean

    edges = _canonical_edges(sf_dir).materialize()
    seed_rows = edges.map_batches(
        lambda b: pa.table({"m": pa.array(
            [min(b.column("a").to_pylist())], pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    if not seed_rows:
        return ray.data.from_arrow(pa.table(
            {"host": pa.array([], pa.string()), "hop": pa.array([], pa.int64())}))
    seed = min(r["m"] for r in seed_rows)

    visited: dict[str, int] = {seed: 0}
    frontier = {seed}
    for hop in range(1, KHOP_ROUNDS + 1):
        fref = ray.put(frontier)

        def neighbors(batch: pa.Table, _fref=fref) -> pa.Table:
            fr = ray.get(_fref)
            df = batch.to_pandas()
            out = pd.concat([
                df.loc[df["a"].isin(fr), "b"],
                df.loc[df["b"].isin(fr), "a"],
            ], ignore_index=True).drop_duplicates()
            return from_pandas_clean(pd.DataFrame({"host": out}))

        cand = distinct(
            edges.map_batches(neighbors, batch_format="pyarrow", zero_copy_batch=True),
            ["host"],
        ).take_all()
        frontier = {r["host"] for r in cand} - visited.keys()
        if not frontier:
            break
        for h in frontier:
            visited[h] = hop

    rows = sorted(visited.items(), key=lambda kv: (kv[1], kv[0]))
    return ray.data.from_arrow(pa.table(
        {"host": pa.array([h for h, _ in rows], pa.string()),
         "hop": pa.array([d for _, d in rows], pa.int64())}
    ))


RICH_CLUB_KS = (2, 4, 8)


def rich_club_coefficients(sf_dir: str) -> ray.data.Dataset:
    """Rich-club coefficients of the host link graph: for each degree
    threshold k, the edge density among hosts of degree > k — φ(k) =
    2·E_k / (N_k·(N_k−1)). A rising φ(k) means the hubs preferentially
    interlink (the 'rich club' that makes link-spam networks and CDN
    constellations stand out against organically-grown link graphs);
    combined with host_clustering and host_degree_powerlaw it completes
    the topology screen.

    Scale shape: degrees are one combiner rollup broadcast as a dict;
    ONE pass over the edge list computes each edge's endpoint-min degree
    and bins it against ALL thresholds simultaneously (no per-k passes);
    the φ math runs over |RICH_CLUB_KS| rows. Exact integers, one
    division per row.

    Output: (k, n_nodes, n_edges, phi) ordered by k."""
    import numpy as np

    from .common import from_pandas_clean, grouped_agg

    edges = _canonical_edges(sf_dir).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {"host": pd.concat([df["a"], df["b"]], ignore_index=True)}
        ).groupby("host", as_index=False).size().rename(columns={"size": "degree"})
        return from_pandas_clean(out)

    deg_rows = grouped_agg(
        edges.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True),
        keys=["host"], specs=[("degree", "sum", "degree")],
    ).take_all()
    degrees = {r["host"]: r["degree"] for r in deg_rows}
    deg_ref = ray.put(degrees)

    def edge_bins(batch: pa.Table, _d=deg_ref) -> pa.Table:
        d = ray.get(_d)
        df = batch.to_pandas()
        mindeg = np.minimum(
            df["a"].map(d).to_numpy(dtype=np.int64),
            df["b"].map(d).to_numpy(dtype=np.int64))
        return pa.table(
            {"k": pa.array(list(RICH_CLUB_KS) * 1, pa.int64()),
             "n_edges": pa.array(
                 [int((mindeg > k).sum()) for k in RICH_CLUB_KS], pa.int64())}
        )

    counts = grouped_agg(
        edges.map_batches(edge_bins, batch_format="pyarrow", zero_copy_batch=True),
        keys=["k"], specs=[("n_edges", "sum", "n_edges")],
    )

    deg_vals = np.array(sorted(degrees.values()), dtype=np.int64)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("k").reset_index(drop=True)
        n_nodes = [
            int((deg_vals > k).sum()) for k in df["k"]
        ]
        df["n_nodes"] = n_nodes
        denom = df["n_nodes"] * (df["n_nodes"] - 1)
        df["phi"] = np.where(
            denom > 0,
            (2.0 * df["n_edges"].to_numpy()) / denom.to_numpy(dtype=np.float64),
            0.0)
        return df[["k", "n_nodes", "n_edges", "phi"]]

    return grouped_agg(
        counts, keys=["k"], specs=[("n_edges", "sum", "n_edges")], finalize=fin,
    )


# ------------------------------------------- Adamic-Adar link prediction

# Inverse-log weights quantized to exact ints so the per-pair sum is
# order-free: w(z) = round(2^20 / log2(deg z)). No round-half boundary
# exists — log2(deg) is an integer only for power-of-two degrees, where
# 2^20/k hits .5 only if 2^21/k is odd, impossible for k <= 2^20; for
# every other degree the quotient is irrational.
AA_QSCALE = 1 << 20
AA_MIN_COMMON = 2


def adamic_adar_links(sf_dir: str) -> ray.data.Dataset:
    """Adamic-Adar link prediction over the undirected distinct host link
    graph: for each UNLINKED host pair, score = Σ_z 1/log2(deg(z)) over
    common neighbors z — the standard citation-graph "which hosts should
    link next" signal (Adamic & Adar 2003), weighting rare shared
    neighbors above hubs.

    Scale shape: wedges are enumerated per center host (the host_triangles
    wedge stream) with the standard deterministic member cap; each wedge
    contributes one exact-int weight row, collapsed by the (a, b)-keyed
    grouped sum; existing edges are removed by a co-partitioned LEFT OUTER
    join against the edge list (never a broadcast of E at crawl scale).
    The reported score is one int→double division by the constant scale.

    Output: (host_a, host_b, n_common, aa_score) for unlinked pairs with
    n_common >= AA_MIN_COMMON, ordered by (host_a, host_b)."""
    import math

    from .common import cap_bucket_members, from_pandas_clean

    edges = _canonical_edges(sf_dir).materialize()
    parts = max(4, choose_join_parts(sf_dir, floor=4))

    def both(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return from_pandas_clean(pd.DataFrame({
            "z": pd.concat([df["a"], df["b"]], ignore_index=True),
            "nb": pd.concat([df["b"], df["a"]], ignore_index=True),
        }))

    und = edges.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)

    def wedge_rows(group: pa.Table) -> pa.Table:
        nbrs = sorted(group.column("nb").to_pylist())
        n = len(nbrs)
        if n < 2:
            return pa.table({"host_a": pa.array([], pa.string()),
                             "host_b": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        keep = cap_bucket_members(
            n, "adamic_adar_links", group.column("z")[0].as_py())
        # weight uses the TRUE degree n (the cap only bounds pairing)
        w = round(AA_QSCALE / math.log2(n))
        a_out: list[str] = []
        b_out: list[str] = []
        for i in range(keep):
            for j in range(i + 1, keep):
                a_out.append(nbrs[i])
                b_out.append(nbrs[j])
        k = len(a_out)
        return pa.table({"host_a": pa.array(a_out, pa.string()),
                         "host_b": pa.array(b_out, pa.string()),
                         "w": pa.array([w] * k, pa.int64()),
                         "one": pa.array([1] * k, pa.int64())})

    wedges = und.groupby("z").map_groups(wedge_rows, batch_format="pyarrow")

    scored = grouped_agg(
        wedges,
        keys=["host_a", "host_b"],
        specs=[("aa_scaled", "sum", "w"), ("n_common", "sum", "one")],
    )

    marker = edges.map_batches(
        lambda b: pa.table({"host_a": b.column("a"), "host_b": b.column("b"),
                            "is_edge": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = scored.join(
        marker, join_type="left_outer", num_partitions=parts,
        on=("host_a", "host_b"),
    )

    def fin(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["is_edge"].isna() & (df["n_common"] >= AA_MIN_COMMON)]
        out = pd.DataFrame({
            "host_a": df["host_a"], "host_b": df["host_b"],
            "n_common": df["n_common"].astype("int64"),
            "aa_score": df["aa_scaled"].astype("float64") / float(AA_QSCALE),
        })
        return from_pandas_clean(out)

    return joined.map_batches(
        fin, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["host_a", "host_b"])


# ---------------------------------------- degree assortativity / symmetry


def host_assortativity(sf_dir: str) -> ray.data.Dataset:
    """Degree assortativity of the undirected host link graph (Newman
    2002): the Pearson correlation of endpoint degrees over every edge,
    counted in both orientations. Positive r = hubs link hubs (organic
    cores); strongly negative r = hub-and-spoke link farms — one number
    next to host_degree_powerlaw's exponent and the rich-club curve.

    Exactness contract: degrees are exact ints; the five moments over the
    2E endpoint pairs are exact integer sums (unbounded int here, HUGEINT
    in SQL); r is the identical float expression (one division over two
    sqrt's of exact ints).

    Scale shape: degrees come from one grouped count; each edge is scored
    by a broadcast degree map (host-dimension sized) in a shuffle-free
    pass; the moments collapse via per-batch partials to one tiny row.

    Output: one row (n_edges, r_assortativity)."""
    from .common import from_pandas_clean

    edges = _canonical_edges(sf_dir).materialize()

    deg_rows = grouped_agg(
        edges.map_batches(
            lambda b: from_pandas_clean(pd.DataFrame(
                {"host": pd.concat([b.to_pandas()["a"], b.to_pandas()["b"]],
                                   ignore_index=True)}
            ).groupby("host", as_index=False).size().rename(
                columns={"size": "degree"})),
            batch_format="pyarrow", zero_copy_batch=True),
        keys=["host"], specs=[("degree", "sum", "degree")],
    ).take_all()
    deg_ref = ray.put({r["host"]: r["degree"] for r in deg_rows})

    def partial(batch: pa.Table, _d=deg_ref) -> pa.Table:
        d = ray.get(_d)
        df = batch.to_pandas()
        da = df["a"].map(d).astype("int64")
        db = df["b"].map(d).astype("int64")
        # both orientations: Σk and Σj coincide, so track one side's sums
        k = pd.concat([da, db], ignore_index=True)
        j = pd.concat([db, da], ignore_index=True)
        return pa.table({
            "m": pa.array([len(k)], pa.int64()),
            "sk": pa.array([int(k.sum())], pa.int64()),
            "skk": pa.array([int((k * k).sum())], pa.int64()),
            "skj": pa.array([int((k * j).sum())], pa.int64()),
        })

    sums = edges.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    m = sum(r["m"] for r in sums)
    sk = sum(r["sk"] for r in sums)
    skk = sum(r["skk"] for r in sums)
    skj = sum(r["skj"] for r in sums)
    # by both-orientation symmetry Σk = Σj and Σk² = Σj², so the two
    # sqrt factors coincide and r reduces to ONE exact int→double division
    num = m * skj - sk * sk
    den = m * skk - sk * sk
    r_val = float(num) / float(den) if den > 0 else 0.0
    return ray.data.from_arrow(pa.table(
        {"n_edges": pa.array([m // 2], pa.int64()),
         "r_assortativity": pa.array([r_val], pa.float64())}
    ))


def host_reciprocity(sf_dir: str) -> ray.data.Dataset:
    """Per-host link reciprocity over the DIRECTED distinct host link
    graph: how many of a host's distinct outlinks point back — near-1
    reciprocity at high degree is the mutual-backlink ring signature
    (paid cross-linking), near-0 is organic citation.

    Scale shape: distinct directed edges via one combiner distinct; the
    reciprocation probe is a co-partitioned self-join on the reversed key
    (never a broadcast of E); per-host counts collapse by grouped sum.
    The fraction is one exact int→double division.

    Output: (host, n_out, n_reciprocated, reciprocity) ordered by host."""
    from .common import distinct, from_pandas_clean

    rows = host_link_rows(sf_dir)

    def canon(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["src_host"] != df["dst_host"]]
        return from_pandas_clean(
            df[["src_host", "dst_host"]].drop_duplicates())

    de = distinct(
        rows.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        ["src_host", "dst_host"],
    ).materialize()
    parts = max(4, choose_join_parts(sf_dir, floor=4))

    rev = de.map_batches(
        lambda b: pa.table({"src_host": b.column("dst_host"),
                            "dst_host": b.column("src_host"),
                            "back": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = de.join(rev, join_type="left_outer", num_partitions=parts,
                     on=("src_host", "dst_host"))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby("src_host", as_index=False).agg(
            n_out=("dst_host", "size"),
            n_reciprocated=("back", "count"),
        )
        return from_pandas_clean(out)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["reciprocity"] = (df["n_reciprocated"].astype("float64")
                             / df["n_out"].astype("float64"))
        df = df.rename(columns={"src_host": "host"})
        return df.sort_values("host").reset_index(drop=True)

    return grouped_agg(
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["src_host"],
        specs=[("n_out", "sum", "n_out"),
               ("n_reciprocated", "sum", "n_reciprocated")],
        finalize=fin,
    )


# ------------------------------------------------- TrustRank (seeded PR)

# Quantized personalized PageRank: rank mass is exact int64 out of
# TRUST_SCALE; per-edge flow is (v·w)//outw, damping is (85·flow)//100,
# teleport goes ONLY to the seed set — every operation is integer, so the
# unrolled SQL twin reproduces the rounds bit-for-bit (no round-6
# float-summation absorption needed, unlike pagerank_hosts).
TRUST_SCALE = 1 << 40
TRUST_ITERS = 6
TRUST_SEEDS = 4  # lexicographically-lowest host names (declared seed rule)
TRUST_DAMP_PCT = 85


def trustrank_power_iterate(
    edges: list[tuple[str, str, int]],
    hosts: list[str],
    rounds: int = TRUST_ITERS,
) -> dict[str, int]:
    """The quantized TrustRank rounds shared by the engine and mirrored
    term-for-term by the unrolled oracle CTEs. Dangling mass is dropped
    (the pagerank_hosts simple-variant declaration)."""
    seeds = sorted(hosts)[:TRUST_SEEDS]
    tele = ((100 - TRUST_DAMP_PCT) * (TRUST_SCALE // len(seeds))) // 100
    outw: dict[str, int] = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    v = {h: (TRUST_SCALE // len(seeds) if h in seeds else 0) for h in hosts}
    for _ in range(rounds):
        flow = {h: 0 for h in hosts}
        for s, d, w in edges:
            flow[d] += (v[s] * w) // outw[s]
        v = {h: (TRUST_DAMP_PCT * flow[h]) // 100
             + (tele if h in seeds else 0) for h in hosts}
    return v


def trustrank_hosts(sf_dir: str) -> ray.data.Dataset:
    """TrustRank over the weighted host link graph (Gyöngyi, Garcia-Molina
    & Pedersen 2004): PageRank whose teleport is restricted to a trusted
    seed set, so rank decays with link distance from the seeds — the
    classic link-spam demotion signal next to pagerank_hosts' neutral
    centrality. Seeds: the TRUST_SEEDS lexicographically-lowest hosts
    (deterministic stand-in for a human-audited whitelist).

    Scale shape: the graph is the already-aggregated HOST dimension
    (combiner-collapsed by host_link_graph, never page-level); below the
    pagerank single-pass cap the rounds run on the driver over the edge
    array (per-round Ray job overhead dwarfs the math — the
    _pagerank_single_pass law); a larger graph takes the distributed
    join-per-round shape pagerank_hosts already implements, which this
    variant guards with a loud cap error rather than silently collecting.

    Output: (host, trust) ordered by host; one division at the end."""
    rows = host_link_graph(sf_dir).take_all()
    if len(rows) > PR_SINGLE_PASS_EDGE_CAP:
        raise ValueError(
            "trustrank_hosts: edge count above the single-pass cap — route "
            "through the pagerank_hosts distributed iteration shape")
    edges = [(r["src_host"], r["dst_host"], int(r["n_links"])) for r in rows]
    hosts = sorted({r["src_host"] for r in rows}
                   | {r["dst_host"] for r in rows})
    v = trustrank_power_iterate(edges, hosts)
    return ray.data.from_arrow(pa.table({
        "host": pa.array(hosts, pa.string()),
        "trust": pa.array([v[h] / float(TRUST_SCALE) for h in hosts],
                          pa.float64()),
    }))


# ------------------------------------------------- bowtie decomposition


def host_bowtie(sf_dir: str) -> ray.data.Dataset:
    """Bowtie decomposition of the directed host link graph (Broder et
    al. 2000, "Graph structure in the Web"): every host classified as
    CORE (the largest SCC), IN (reaches the core, not in it), OUT
    (reached from the core, not in it), or OTHER (tendrils, tubes and
    disconnected mass — declared as one class so both engines apply the
    same four-way rule). The macro-shape audit of a crawl: a healthy
    broad crawl shows all four regions; a single-seed crawl collapses
    into CORE+OUT.

    Scale shape: the host_scc dimension-side law — distinct directed
    edges are site-count sized; Tarjan plus two BFS sweeps (forward from
    the core, backward over reversed edges) run once on the driver over
    that edge list; only the {host → class} map broadcasts and the host
    spine labels distributed. Largest SCC ties break to the MIN scc_id
    (deterministic; mirrored by the oracle's (size DESC, scc_id) pick).

    Output: (host, scc_id, bowtie_class) ordered by host."""
    from collections import deque

    from .common import distinct, from_pandas_clean

    rows = host_link_rows(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["src_host"] != df["dst_host"]]
        return from_pandas_clean(
            df.rename(columns={"src_host": "s", "dst_host": "d"})
            [["s", "d"]].drop_duplicates()
        )

    edges_ds = distinct(
        rows.map_batches(directed, batch_format="pyarrow", zero_copy_batch=True),
        ["s", "d"],
    )
    edge_list = [(r["s"], r["d"]) for r in edges_ds.take_all()]
    label = _tarjan_scc(edge_list)

    nodes_all = {s for s, _ in edge_list} | {d for _, d in edge_list}
    scc_of = {h: label.get(h, h) for h in nodes_all}
    sizes: dict[str, int] = {}
    for h, c in scc_of.items():
        sizes[c] = sizes.get(c, 0) + 1
    core_id = min((c for c in sizes),
                  key=lambda c: (-sizes[c], c))
    core = {h for h, c in scc_of.items() if c == core_id}

    fwd: dict[str, list[str]] = {}
    bwd: dict[str, list[str]] = {}
    for s, d in edge_list:
        fwd.setdefault(s, []).append(d)
        bwd.setdefault(d, []).append(s)

    def sweep(adj: dict[str, list[str]]) -> set[str]:
        seen = set(core)
        q = deque(core)
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        return seen

    reached_out = sweep(fwd)     # core ∪ OUT
    reaches_core = sweep(bwd)    # core ∪ IN

    cls = {}
    for h in nodes_all:
        if h in core:
            cls[h] = "CORE"
        elif h in reaches_core:
            cls[h] = "IN"
        elif h in reached_out:
            cls[h] = "OUT"
        else:
            cls[h] = "OTHER"
    cls_ref = ray.put((scc_of, cls))

    def node_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src_host").combine_chunks()
        dst = batch.column("dst_host").combine_chunks()
        return pa.table({"host": pa.concat_arrays([src, dst])})

    nodes = distinct(
        rows.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["host"],
    )

    def lab(batch: pa.Table) -> pa.Table:
        scc_m, cls_m = ray.get(cls_ref)
        hosts = batch.column("host").to_pylist()
        return pa.table(
            {"host": batch.column("host"),
             "scc_id": pa.array([scc_m.get(h, h) for h in hosts], pa.string()),
             "bowtie_class": pa.array(
                 [cls_m.get(h, "OTHER") for h in hosts], pa.string())}
        )

    return nodes.map_batches(
        lab, batch_format="pyarrow", zero_copy_batch=True).sort("host")
