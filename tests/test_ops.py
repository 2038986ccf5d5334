"""Operator-suite sanity tests at smoke scale (sf0.001). The heavyweight
oracle comparison runs in scripts/check_correctness.py and in the driver's
own gate; these tests pin structural invariants cheaply."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _df(ds) -> pd.DataFrame:
    import pyarrow as _pa

    if isinstance(ds, _pa.Table):
        return ds.to_pandas()
    if isinstance(ds, pd.DataFrame):
        return ds
    return pd.DataFrame(ds.take_all())


def test_pricing_summary_shape(ray_session):
    from ocr_ray.ops.relational import pricing_summary

    df = _df(pricing_summary(SF))
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty",
                               "avg_qty", "count_order"}
    assert (df["count_order"] > 0).all()
    # partial-agg identity: sum of group counts == filtered row count
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet') "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
    ).fetchone()[0]
    assert df["count_order"].sum() == n


def test_top_customers_deterministic(ray_session):
    from ocr_ray.ops.relational import top_customers

    a = _df(top_customers(SF))
    b = _df(top_customers(SF))
    assert a.equals(b)
    assert len(a) == 10
    assert a["revenue"].is_monotonic_decreasing


def test_exact_dedup_accounts_all_docs(ray_session):
    from ocr_ray.ops.documents import exact_dedup

    df = _df(exact_dedup(SF))
    assert df["n_copies"].sum() == 500


def test_minhash_pairs_symmetric_free(ray_session):
    from ocr_ray.ops.documents import minhash_dup_pairs

    df = _df(minhash_dup_pairs(SF))
    if len(df):
        assert (df["doc_a"] < df["doc_b"]).all()
        assert not df.duplicated(["doc_a", "doc_b"]).any()
        assert (df["est_jaccard"] >= 0.5).all()


def test_ann_topk_ranks(ray_session):
    from ocr_ray.ops.embeddings import ann_brute_topk

    df = _df(ann_brute_topk(SF))
    assert set(df["query_id"].unique()) == set(range(8))
    for _, g in df.groupby("query_id"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, 11))
        assert g.sort_values("rank")["cosine"].is_monotonic_decreasing
        assert (g["vec_id"] != g["query_id"]).all()


def test_word_index_hyphen_semantics(ray_session):
    """The synthetic corpus plants hyphen-across-lines words (slot 90/93);
    the distributed word index must contain their merged forms."""
    from ocr_ray.ops.extraction_queries import word_index

    df = _df(word_index(SF))
    assert len(df) > 1000
    assert (df["count"] > 0).all()
    # pages strings are the reference "1, 2" format
    multi = df[df["pages"].str.contains(",")]
    assert len(multi) > 0


def test_page_image_features_stub_decode(ray_session):
    from ocr_ray.ops.multimodal import page_image_features

    df = _df(page_image_features(SF))
    ok = df[df["error"].isna()]
    assert len(ok) > 50
    assert (ok["width"] > 0).all() and (ok["n_words"] > 0).all()


def test_metrics_parse():
    from ocr_ray.pipelines.metrics import format_metrics, stage_metrics

    stats = (
        "Operator 1 ReadParquet->SplitBlocks(8): 2 tasks executed, 16 blocks "
        "produced in 0.34s\n"
        "* Remote wall time: 621.11us min, 34.88ms max, 3.95ms mean, 63.18ms total\n"
        "* Output num rows per block: 113 min, 512 max, 312 mean, 5000 total\n"
        "* Output size bytes per block: 310206 min, 1579162 max, 927471 mean, "
        "14839547 total\n"
    )
    m = stage_metrics(stats)
    assert len(m) == 1
    assert m[0]["rows_out"] == 5000
    assert m[0]["seconds"] == 0.34
    assert abs(m[0]["task_seconds"] - 0.06318) < 1e-9
    assert "ReadParquet" in format_metrics(m)


def test_ann_ivf_recall_vs_brute(ray_session):
    """IVF ANN must recover most of the brute-force top-10 (recall pinned —
    the cells/probes tradeoff is the point of the scale path)."""
    import pandas as pd

    from ocr_ray.ops.embeddings import ann_brute_topk, ann_ivf_topk

    brute = pd.DataFrame(ann_brute_topk(SF).take_all())
    ivf = pd.DataFrame(ann_ivf_topk(SF).take_all())
    recalls = []
    for qid, bg in brute.groupby("query_id"):
        truth = set(bg["vec_id"])
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & got) / len(truth))
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, mean_recall
    # and everything IVF returns must be genuinely scored (subset check):
    merged = ivf.merge(brute, on=["query_id", "vec_id"], suffixes=("_ivf", "_bf"))
    assert (merged["cosine_ivf"] == merged["cosine_bf"]).all()


def test_cv_layout_clusters_paragraphs(ray_session):
    """The corner-cloud clustering should produce one box per visually
    separated paragraph block for the synthetic grid pages."""
    import pandas as pd

    from ocr_ray.ops.layout_queries import cv_layout

    df = pd.DataFrame(cv_layout(SF).take_all()).drop_duplicates()
    assert len(df) > 50
    for (_, _), g in df.groupby(["url", "page_no"]):
        tl = list(zip(g["top"], g["left"]))
        assert tl == sorted(tl)  # reading order holds
        assert (g["bottom"] > g["top"]).all() and (g["right"] > g["left"]).all()


def test_cluster_points_kernel():
    from ocr_ray.kernels.layout import cluster_points, cv_layout_boxes

    # two tight groups of 6 + an outlier pair (below min_cluster_size)
    pts = ([(0.1 + i * 0.001, 0.1) for i in range(6)]
           + [(0.8 + i * 0.001, 0.8) for i in range(6)]
           + [(0.5, 0.5), (0.52, 0.52)])
    clusters = cluster_points(pts)
    assert len(clusters) == 2
    assert sorted(len(c) for c in clusters) == [6, 6]
    # a line of adjacent words (synth-like 14px gaps) chains into one block;
    # an isolated word (4 corners < min_cluster_size) drops as noise.
    # hdbscan-faithful note: the OUTERMOST corners of the first/last word
    # have core distance > eps (their 5-NN neighbourhood is sparse) and drop
    # as noise — real hdbscan(min_cluster_size=5, eps=0.025) does the same,
    # so the box covers the line's interior span, not the extreme corners.
    line = [(100 + i * 90, 100, 160 + i * 90, 146) for i in range(6)]
    boxes = cv_layout_boxes(line + [(2000, 3000, 2100, 3046)], page_w=2480, page_h=3508)
    assert len(boxes) == 1
    l, t, r, b = boxes[0]
    assert l <= 160 and r >= 100 + 5 * 90 and t <= 100 and b >= 146


def test_cluster_points_density_aware_bridge():
    """The HDBSCAN-lite property the round-1 plain eps-linkage lacked:
    a sparse chain of points (spacing < eps but density below min_samples)
    must NOT merge two dense blocks — bridge points have mutual-reachability
    core distance > eps and fall out as noise (image.py:205-216 parity)."""
    from ocr_ray.kernels.layout import cluster_points

    block_a = [(0.1 + 0.01 * i, 0.1 + 0.01 * j) for i in range(3) for j in range(3)]
    block_b = [(0.5 + 0.01 * i, 0.1 + 0.01 * j) for i in range(3) for j in range(3)]
    bridge = [(0.14 + 0.02 * k, 0.1) for k in range(1, 18)]
    clusters = cluster_points(block_a + block_b + bridge)
    assert len(clusters) == 2
    assert sorted(len(c) for c in clusters) == [9, 9]
    # and identical blocks WITHOUT the bridge cluster the same way
    assert [len(c) for c in cluster_points(block_a + block_b)] == [9, 9]


def test_cosine_lsh_recall_at_high_tau(ray_session, tmp_path):
    """Recall guard for the multi-table LSH path (round-1 verdict #9): on a
    corpus salted with true near-duplicates, LSH must recover >=90% of the
    exact-scan pairs at tau=0.95. 8 tables x 8 hyperplanes give p ~ 1-(1-
    (1-theta/pi)^8)^8 ~ 0.99 at cosine 0.95, so 0.9 leaves real margin."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    base = rng.randn(60, 64)
    rows = []
    vid = 0
    for v in base:
        rows.append((vid, v)); vid += 1
        # a jittered near-duplicate: cosine vs the base typically > 0.99
        rows.append((vid, v + 0.05 * rng.randn(64))); vid += 1
    table = pa.table(
        {"vec_id": pa.array([r[0] for r in rows], pa.int64()),
         "embedding": pa.array([r[1].tolist() for r in rows],
                               pa.list_(pa.float32())),
         "label": pa.array([0] * len(rows), pa.int32())}
    )
    sf = tmp_path / "lsh_tier"
    sf.mkdir()
    pq.write_table(table, str(sf / "embeddings.parquet"))

    from ocr_ray.ops.embeddings import cosine_dup_pairs, cosine_dup_pairs_lsh

    exact = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in cosine_dup_pairs(str(sf)).take_all()}
    truth = {p for p, c in exact.items() if c >= 0.95}
    assert len(truth) >= 40  # the salted corpus produces real near-dups
    lsh = {(r["vec_a"], r["vec_b"]) for r in cosine_dup_pairs_lsh(str(sf)).take_all()}
    recall = len(truth & lsh) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} on tau>=0.95 pairs"


def test_boilerplate_line_dedup(ray_session):
    """Corpus-frequency boilerplate removal: the three template lines
    (header/nav/footer) are blocked everywhere; unique content and the 2×
    re-crawl duplicates (below BOILERPLATE_MIN_DF) survive. Corpus v2's
    syndicated wire paragraphs can cross the frequency threshold too, so
    some docs drop MORE than the 3 template lines — that is the operator
    working as designed (CCNet drops any corpus-frequent line)."""
    from ocr_ray.ops.extraction_queries import boilerplate_line_dedup

    df = _df(boilerplate_line_dedup(SF))
    assert list(df.columns) == ["url", "warc_ts", "text", "n_lines", "n_dropped"]
    assert len(df) > 500  # ~85% of 1000 records are html
    # every html doc carries at least the 3 template lines (+ contact footer
    # and heading/content lines are unique per page — never blocked)
    assert (df["n_dropped"] >= 3).all()
    assert (df["n_dropped"] > 3).any()  # syndicated lines blocked somewhere
    assert (df["n_lines"] > df["n_dropped"]).all()
    joined = "\n".join(df["text"])
    assert "cabeçalho repetido" not in joined
    assert "direitos reservados" not in joined
    assert "Início Arquivo" not in joined
    # re-crawled urls keep BOTH records, content intact (df=2 < threshold)
    dups = df[df.duplicated("url", keep=False)]
    assert len(dups) > 0
    for _, grp in dups.groupby("url"):
        assert grp["text"].nunique() == 1  # same payload, both kept


def test_gopher_filter_mixed_outcomes(ray_session):
    """Gopher rules discriminate at every tier: both pass outcomes occur,
    flags are consistent with the reported signals."""
    from ocr_ray.ops.documents import (
        GOPHER_MAX_DUP_WORD,
        GOPHER_MIN_WORDS,
        gopher_filter,
    )

    df = _df(gopher_filter(SF))
    assert len(df) == 500
    assert df["passes"].any() and not df["passes"].all()
    assert ((df["n_words"] >= GOPHER_MIN_WORDS) == df["ok_words"]).all()
    assert ((df["dup_word_frac"] <= GOPHER_MAX_DUP_WORD) == df["ok_dupword"]).all()
    flag_cols = ["ok_words", "ok_mean_wl", "ok_alpha", "ok_stop",
                 "ok_bigram", "ok_dupword"]
    assert (df[flag_cols].all(axis=1) == df["passes"]).all()


def test_stratified_sample_deterministic_rates(ray_session):
    from ocr_ray.ops.documents import (
        SAMPLE_DEFAULT_PCT,
        SAMPLE_RATES_PCT,
        stratified_sample,
    )

    a = _df(stratified_sample(SF)).sort_values("doc_id").reset_index(drop=True)
    b = _df(stratified_sample(SF)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # hash-based: no RNG state, rerun-identical
    assert 0 < len(a) < 500
    for lang, grp in a.groupby("lang"):
        rate = SAMPLE_RATES_PCT.get(lang, SAMPLE_DEFAULT_PCT)
        assert (grp["sample_bucket"] < rate).all()


def test_novel_docs_sharded_index(ray_session):
    from ocr_ray.ops.documents import novel_docs

    df = _df(novel_docs(SF)).sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 500
    # no exact text dups in the table → novel iff not in the even half
    assert (df["is_novel"] == (df["doc_id"] % 2 == 1)).all()


def test_asof_last_purchase_matches_bruteforce(ray_session):
    """As-of join vs a per-row brute-force recomputation on the small tier."""
    from ocr_ray.ops.relational import ASOF_ANCHOR_TYPE, asof_last_purchase

    df = _df(asof_last_purchase(SF)).sort_values(
        ["user_id", "ts", "event_type"]).reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert len(df) == len(ev)
    anchors = (ev[ev["event_type"] == ASOF_ANCHOR_TYPE]
               .groupby(["user_id", "ts"], as_index=False)["value"].max())
    for _, row in df.sample(n=50, random_state=7).iterrows():
        mine = anchors[(anchors["user_id"] == row["user_id"])
                       & (anchors["ts"] <= row["ts"])]
        if mine.empty:
            assert pd.isna(row["last_purchase_ts"])
        else:
            best = mine.loc[mine["ts"].idxmax()]
            assert row["last_purchase_ts"] == best["ts"]
            assert row["last_purchase_value"] == best["value"]


def test_events_sliding_1h_window_identities(ray_session):
    from ocr_ray.ops.relational import events_sliding_1h

    df = _df(events_sliding_1h(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # every event lands in exactly 6 windows
    assert df["n_events"].sum() == 6 * len(ev)
    # window starts are 10-minute aligned
    ns = df["window_start"].astype("datetime64[ns]").astype("int64")
    assert (ns % (600 * 10**9) == 0).all()
    # peak window count equals a direct rolling recount for one type
    typ = df["event_type"].iloc[0]
    sub = ev[ev["event_type"] == typ]
    got = df[df["event_type"] == typ]
    for _, row in got.sample(n=min(20, len(got)), random_state=3).iterrows():
        lo = row["window_start"]
        hi = lo + pd.Timedelta(hours=1)
        assert ((sub["ts"] >= lo) & (sub["ts"] < hi)).sum() == row["n_events"]


def test_unigram_logprob_scores(ray_session):
    """Perplexity-proxy scoring: rerun-deterministic, OOV raises the score,
    in-vocab docs score near the corpus entropy."""
    from ocr_ray.ops.documents import unigram_logprob

    a = _df(unigram_logprob(SF)).sort_values("doc_id").reset_index(drop=True)
    b = _df(unigram_logprob(SF)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == 500
    assert (a["avg_neg_logprob"] > 0).all()
    assert (a["n_oov"] <= a["n_tokens"]).all()
    # docs with more OOV mass score worse on average (tiers where the
    # top-V vocabulary covers the whole corpus have nothing to compare)
    oov_frac = a["n_oov"] / a["n_tokens"].clip(lower=1)
    if (oov_frac > 0).any():
        hi = a.loc[oov_frac > 0, "avg_neg_logprob"].mean()
        lo = a.loc[oov_frac == 0, "avg_neg_logprob"].mean()
        assert hi >= lo
    # scores sit in a plausible unigram-entropy band for this corpus
    assert a["avg_neg_logprob"].between(1.0, 25.0).all()


def test_media_exact_dedup_recrawl_copies(ray_session):
    """Re-crawled OCR payloads (identical bytes, same url, later ts) fold
    into one group with n_copies == 2; only hashes cross the exchange."""
    from ocr_ray.ops.multimodal import media_exact_dedup

    df = _df(media_exact_dedup(SF))
    assert len(df) > 50  # ~13% of 1000 records route to the ocr branch
    assert df["media_hash"].is_unique
    assert set(df["n_copies"].unique()) <= {1, 2}
    assert (df["n_copies"] == 2).any()
    assert (df["n_bytes"] > 0).all()


def test_line_hash64_matches_duckdb_h64():
    """line_hash64 must stay the signed-int64 reinterpretation of the
    oracle's H64 SQL expression forever — a silent divergence would flip
    boilerplate_line_dedup's blocklist. (Signed on the Ray side because
    uint64 values >= 2**63 force Ray's aggregate exchange into pickled-block
    fallback; H64 stays UBIGINT in SQL and only equality is ever used.)"""
    import duckdb

    from ocr_ray.ops.extraction_queries import line_hash64

    con = duckdb.connect()
    for s in ["", "a", "Início Arquivo Sobre Contacto", "héllo wörld", "x" * 500]:
        sql_val = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 16))::UBIGINT", [s]
        ).fetchone()[0]
        assert line_hash64(s) == sql_val - (sql_val >= 1 << 63) * (1 << 64), s


# ---------------------------------------------- corpus hygiene & graph suite


def test_pii_scrub(ray_session):
    """Every html record carries the contact-footer phone; redacted text
    never matches the PII patterns again; counts match what was removed."""
    import re

    from ocr_ray.ops.extraction_queries import EMAIL_RE_S, PHONE_RE_S, pii_scrub

    df = _df(pii_scrub(SF))
    assert list(df.columns) == ["url", "warc_ts", "n_emails", "n_phones",
                                "text_redacted"]
    assert len(df) > 500
    assert (df["n_phones"] == 1).all()  # exactly one footer phone per page
    assert (df["n_emails"] >= 1).all()  # footer contact + optional inline
    assert (df["n_emails"] <= 2).all()
    email_re = re.compile(EMAIL_RE_S)
    phone_re = re.compile(PHONE_RE_S)
    for t in df["text_redacted"]:
        assert not email_re.search(t)
        assert not phone_re.search(t)
    assert df["text_redacted"].str.contains("<EMAIL>").all()
    assert df["text_redacted"].str.contains("<PHONE>").all()


def test_paragraph_dedup(ray_session):
    """Only cross-record duplicate paragraphs surface (syndicated wire copy
    + re-crawl pairs); hashes unique; keeper is the lexicographic min."""
    from ocr_ray.ops.extraction_queries import paragraph_dedup

    df = _df(paragraph_dedup(SF))
    assert list(df.columns) == ["h", "n_copies", "keep_url", "n_chars"]
    assert len(df) > 0
    assert (df["n_copies"] >= 2).all()
    assert df["h"].is_unique
    assert (df["n_chars"] > 0).all()
    # syndicated pool paragraphs are shared across MORE than a re-crawl pair
    assert (df["n_copies"] > 2).any()


def test_contamination_check(ray_session):
    """Deterministic eval split; contaminated flag consistent with n_shared;
    the syndicated pool produces real train/eval 8-gram overlap."""
    from ocr_ray.ops.extraction_queries import _is_eval_url, contamination_check

    df = _df(contamination_check(SF))
    assert list(df.columns) == ["url", "n_shared", "contaminated"]
    assert len(df) > 500
    assert (~df["url"].map(_is_eval_url)).all()  # eval docs excluded
    assert (df["contaminated"] == (df["n_shared"] > 0)).all()
    assert df["contaminated"].any()


def test_host_link_graph(ray_session):
    from ocr_ray.ops.graph import host_link_graph

    df = _df(host_link_graph(SF))
    assert list(df.columns) == ["src_host", "dst_host", "n_links"]
    assert len(df) > 100
    assert (df["n_links"] >= 1).all()
    assert df["src_host"].str.match(r"host\d+$").all()
    assert df["dst_host"].str.match(r"host\d+$").all()
    assert not df.duplicated(["src_host", "dst_host"]).any()


def test_pagerank_hosts(ray_session):
    """Fixed-iteration PageRank: probability-like (sum < 1 without dangling
    redistribution, every rank >= teleport floor), deterministic rerun."""
    from ocr_ray.ops.graph import PAGERANK_DAMPING, pagerank_hosts

    df = _df(pagerank_hosts(SF)).sort_values("host").reset_index(drop=True)
    assert list(df.columns) == ["host", "rank"]
    n = len(df)
    assert n > 10
    floor = (1.0 - PAGERANK_DAMPING) / n
    assert (df["rank"] >= floor - 1e-9).all()
    assert 0.5 < df["rank"].sum() <= 1.0 + 1e-9
    again = _df(pagerank_hosts(SF)).sort_values("host").reset_index(drop=True)
    assert again.equals(df)


def test_dup_clusters(ray_session):
    """Connected components: every doc labeled once, labels are cluster
    minima, pair endpoints co-clustered, sizes consistent."""
    from ocr_ray.ops.documents import minhash_dup_pairs
    from ocr_ray.ops.graph import dup_clusters

    df = _df(dup_clusters(SF))
    assert list(df.columns) == ["doc_id", "cluster_id", "cluster_size"]
    assert df["doc_id"].is_unique
    assert len(df) == 500
    assert (df["cluster_id"] <= df["doc_id"]).all()
    sizes = df.groupby("cluster_id").size()
    by_doc = df.set_index("doc_id")
    for cid, grp in df.groupby("cluster_id"):
        assert (grp["cluster_size"] == len(grp)).all()
        assert cid == grp["doc_id"].min()
    pairs = _df(minhash_dup_pairs(SF))
    for _, p in pairs.iterrows():
        assert (
            by_doc.loc[p["doc_a"], "cluster_id"]
            == by_doc.loc[p["doc_b"], "cluster_id"]
        )


def test_tfidf_top_terms(ray_session):
    from ocr_ray.ops.documents import TFIDF_TOP_K, tfidf_top_terms

    df = _df(tfidf_top_terms(SF))
    assert list(df.columns) == ["doc_id", "rank", "term", "tf", "df", "score"]
    assert df["rank"].between(1, TFIDF_TOP_K).all()
    for _, grp in df.groupby("doc_id"):
        g = grp.sort_values("rank")
        assert g["score"].is_monotonic_decreasing or (
            g["score"].round(6).diff().dropna() <= 1e-12
        ).all()
    assert (df["tf"] >= 1).all()
    assert (df["df"] >= 1).all()


def test_substring_dedup(ray_session):
    """Every doc appears exactly once (spine join keeps zero-window docs);
    near-copy pairs show high dup_frac, clean docs zero; the flag follows
    the raw ratio; a brute-force local recount agrees on the dup universe."""
    import duckdb

    from ocr_ray.ops.documents import (
        SUBSTR_DUP_FRAC_FLAG, SUBSTR_NGRAM, _h64, substring_dedup,
    )

    df = _df(substring_dedup(SF)).sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "n_grams", "n_dup_grams", "dup_frac",
                                "flagged"]
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert len(df) == n_docs
    assert df["doc_id"].is_unique
    assert (df["n_dup_grams"] <= df["n_grams"]).all()
    assert df["dup_frac"].between(0.0, 1.0).all()
    assert df["flagged"].any() and (~df["flagged"]).any()
    # flag is a pure function of the raw ratio (rounded display can straddle)
    raw = df["n_dup_grams"] / df["n_grams"].clip(lower=1)
    assert (df["flagged"] == (raw >= SUBSTR_DUP_FRAC_FLAG)).all()

    # brute-force parity: recompute the duplicated-window universe locally
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    per_doc = {}
    for doc_id, text in texts:
        ws = text.lower().split()
        per_doc[doc_id] = {
            _h64(" ".join(ws[i:i + SUBSTR_NGRAM]))
            for i in range(len(ws) - SUBSTR_NGRAM + 1)
        }
    from collections import Counter

    freq = Counter(h for s in per_doc.values() for h in s)
    for _, row in df.iterrows():
        win = per_doc[row["doc_id"]]
        assert row["n_grams"] == len(win)
        assert row["n_dup_grams"] == sum(1 for h in win if freq[h] >= 2)


def test_domain_mix_sample(ray_session):
    """Every doc decided exactly once; rates are a pure function of source;
    the realized sample lands near the declared budget; the per-doc decision
    is exactly the hash-threshold recomputation."""
    import hashlib

    import duckdb

    from ocr_ray.ops.documents import MIX_BUDGET_FRAC_PCT, domain_mix_sample

    df = _df(domain_mix_sample(SF)).sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "source", "p32", "sampled"]
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert len(df) == n_docs
    assert df["doc_id"].is_unique
    # one rate per source, and token-mass variation makes them differ
    per_src = df.groupby("source")["p32"].nunique()
    assert (per_src == 1).all()
    assert df["p32"].nunique() > 1
    # realized sample ≈ budget (hash-uniform, so binomial noise only)
    frac = df["sampled"].mean()
    assert abs(frac - MIX_BUDGET_FRAC_PCT / 100) < 0.15
    # decision is exactly u32 < p32
    u32 = df["doc_id"].map(
        lambda i: int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
    )
    assert (df["sampled"] == (u32 < df["p32"])).all()


def test_sequence_pack(ray_session):
    """Every doc packed exactly once; within every (part, seq) the docs
    tile the sequence contiguously from offset 0 and fit the budget unless
    a single doc overflows it; packing actually concatenates (some seqs
    hold >1 doc)."""
    import duckdb

    from ocr_ray.ops.documents import (
        SEQ_PACK_BUDGET, SEQ_PACK_PARTS, sequence_pack,
    )

    df = _df(sequence_pack(SF)).sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "part", "seq", "seq_offset", "n_toks"]
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert len(df) == n_docs
    assert df["doc_id"].is_unique
    assert (df["part"] == df["doc_id"] % SEQ_PACK_PARTS).all()
    multi = 0
    for (_, _), grp in df.groupby(["part", "seq"]):
        g = grp.sort_values("doc_id")
        # contiguous tiling: each offset is the running sum of predecessors
        assert g["seq_offset"].iloc[0] == 0
        assert (g["seq_offset"] == g["n_toks"].cumsum().shift(fill_value=0)).all()
        total = g["n_toks"].sum()
        assert total <= SEQ_PACK_BUDGET or len(g) == 1
        multi += len(g) > 1
    assert multi > 0


def test_events_range_join(ray_session):
    """Banded-join reduction matches the naive quadratic range join exactly
    — every pair once, oriented a < b, dt within the band."""
    import duckdb

    from ocr_ray.ops.relational import RANGE_JOIN_WINDOW_US, events_range_join

    df = (
        _df(events_range_join(SF))
        .sort_values(["event_a", "event_b"]).reset_index(drop=True)
    )
    assert list(df.columns) == ["user_id", "event_a", "event_b", "dt_us"]
    assert (df["event_a"] < df["event_b"]).all()
    assert (df["dt_us"].abs() <= RANGE_JOIN_WINDOW_US).all()
    oracle = duckdb.sql(f"""
        SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
               epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        FROM read_parquet('{SF}/events.parquet') a
        JOIN read_parquet('{SF}/events.parquet') b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {RANGE_JOIN_WINDOW_US}
        ORDER BY event_a, event_b
    """).df()
    assert len(df) == len(oracle) > 0
    for col in df.columns:
        assert (df[col].to_numpy() == oracle[col].to_numpy()).all(), col


def test_bucket_member_cap_bounds_degenerate_buckets(ray_session, monkeypatch, caplog):
    """Skew guard: a degenerate LSH bucket (10k members sharing a band) must
    complete in bounded time — the cap keeps a deterministic prefix and logs
    the drop instead of running an O(n^2) pair scan."""
    import logging

    import pyarrow as pa

    from ocr_ray.ops import common
    from ocr_ray.ops.documents import _bucket_pairs

    monkeypatch.setattr(common, "BUCKET_MEMBER_CAP", 64)
    sig = list(range(64))
    group = pa.Table.from_pylist(
        [{"band_key": 7, "doc_id": i, "sig": sig} for i in range(10_000)],
        schema=pa.schema(
            [pa.field("band_key", pa.uint64()), pa.field("doc_id", pa.int64()),
             pa.field("sig", pa.list_(pa.uint32()))]
        ),
    )
    with caplog.at_level(logging.WARNING, logger="ocr_ray.lsh"):
        out = _bucket_pairs(group)
    # identical sigs => every surviving pair passes tau; 64 kept => C(64,2)
    assert out.num_rows == 64 * 63 // 2
    assert out.column("doc_a").to_pylist()[0] == 0  # deterministic prefix
    assert any("9936 members dropped" in r.message for r in caplog.records)


def test_cosine_exact_guard(ray_session, monkeypatch):
    """cosine_dup_pairs must refuse to materialize past the row cap and point
    at the LSH twin."""
    import pytest as _pytest

    from ocr_ray.ops import embeddings

    monkeypatch.setattr(embeddings, "COSINE_EXACT_MAX_ROWS", 10)
    with _pytest.raises(ValueError, match="cosine_dup_pairs_lsh"):
        embeddings.cosine_dup_pairs(SF)


def test_choose_join_parts_scales_with_input(tmp_path):
    from ocr_ray.ops.common import JOIN_PART_TARGET_BYTES, choose_join_parts

    small = tmp_path / "documents.parquet"
    small.write_bytes(b"x" * 1024)
    assert choose_join_parts(str(tmp_path), "documents") == 4
    big = tmp_path / "big.parquet"
    big.write_bytes(b"x" * (20 * JOIN_PART_TARGET_BYTES))
    assert choose_join_parts(str(tmp_path), "big") == 20
    # bare-dir form sizes everything in the directory
    assert choose_join_parts(str(tmp_path)) == 20


def test_pagerank_single_pass_matches_distributed(ray_session, monkeypatch):
    """The small-graph numpy path and the distributed join+grouped-sum path
    must agree after the round-6 output rounding."""
    from ocr_ray.ops import graph

    df_fast = _df(graph.pagerank_hosts(SF)).sort_values("host").reset_index(drop=True)
    monkeypatch.setattr(graph, "PR_SINGLE_PASS_EDGE_CAP", 0)
    df_dist = _df(graph.pagerank_hosts(SF)).sort_values("host").reset_index(drop=True)
    assert list(df_fast["host"]) == list(df_dist["host"])
    assert (df_fast["rank"] == df_dist["rank"]).all()


def test_minhash_bucket_cap_parity_with_oracle(ray_session, tmp_path):
    """Round-3 ADVICE: the LSH bucket-membership cap must truncate
    IDENTICALLY on the engine and oracle sides. Eight identical docs
    overflow a cap of 4 in every band; both sides must pair only the first
    4 doc_ids (sorted-prefix rule) — 6 pairs, not C(8,2)=28."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import minhash_dup_pairs
    from ocr_ray.ops.oracles import _sketch_ctes

    docs = pa.Table.from_pylist(
        [{"doc_id": i, "text": "alpha beta gamma delta epsilon zeta eta"}
         for i in range(8)]
        + [{"doc_id": 100, "text": "totally different content words appear here"}]
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    pairs = _df(minhash_dup_pairs(str(tmp_path), bucket_cap=4))
    pairs = pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(pairs) == 6  # C(4,2): truncation fired
    assert set(pairs["doc_a"]).union(pairs["doc_b"]) == {0, 1, 2, 3}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    sql = (f"WITH {_sketch_ctes(cap=4)} SELECT doc_a, doc_b, est_jaccard "
           "FROM minhash_pairs ORDER BY doc_a, doc_b")
    oracle = con.sql(sql).df()
    assert len(oracle) == 6
    assert (oracle["doc_a"].to_numpy() == pairs["doc_a"].to_numpy()).all()
    assert (oracle["doc_b"].to_numpy() == pairs["doc_b"].to_numpy()).all()
    assert (oracle["est_jaccard"].to_numpy()
            == pairs["est_jaccard"].to_numpy()).all()


def test_winnow_cap_mirrored_in_oracle(ray_session, tmp_path, monkeypatch):
    """Forced >cap fingerprint bucket: 8 identical docs (all passing the
    doc_id % WINNOW_DOC_MOD gate) share every selected fingerprint; with
    the cap shrunk to 3 BOTH sides must pair only the first 3 doc_ids
    (C(3,2)=3 pairs), so the gate passes by construction on skewed corpora
    — the round-4 ADVICE one-sidedness, closed on the oracle side too."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.ops import common
    from ocr_ray.ops.documents import WINNOW_DOC_MOD, winnow_dup_pairs
    from ocr_ray.ops.oracles import winnow_oracle_sql

    # engine cap travels by explicit parameter (a monkeypatched module
    # constant never reaches the Ray workers); the oracle SQL reads the
    # module cap at build time, so patch it for that side
    monkeypatch.setattr(common, "BUCKET_MEMBER_CAP", 3)
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.Table.from_pylist(
        [{"doc_id": i * WINNOW_DOC_MOD, "text": text} for i in range(8)]
        + [{"doc_id": WINNOW_DOC_MOD * 100,
            "text": "totally different content words appear here now ok"}]
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    pairs = _df(winnow_dup_pairs(str(tmp_path), bucket_cap=3))
    assert len(pairs) == 3  # C(3,2): truncation fired on the engine side
    assert set(pairs["doc_a"]).union(pairs["doc_b"]) == {
        0, WINNOW_DOC_MOD, 2 * WINNOW_DOC_MOD}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    # built AFTER the monkeypatch: the SQL embeds the cap at call time
    oracle = con.sql(winnow_oracle_sql()["winnow_dup_pairs"]).df()
    assert len(oracle) == 3
    for col in ("doc_a", "doc_b", "n_shared"):
        assert (oracle[col].to_numpy() == pairs[col].to_numpy()).all(), col


def test_value_moments_limb_sums_survive_extreme_batch(ray_session, tmp_path):
    """The round-4 ADVICE overflow: >=58 rows at |x|=20000 in one batch
    wrapped the plain int64 Σx⁴ partial (and negative x evaded the old
    x.max() admission check entirely). The base-2³¹ limb accumulators must
    reproduce the exact Python-int moments for exactly that input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.ops.relational import value_moments

    vals = [20000.0] * 100 + [-20000.0] * 60
    pq.write_table(
        pa.table({"event_type": pa.array(["x"] * len(vals)),
                  "value": pa.array(vals, pa.float64())}),
        str(tmp_path / "events.parquet"))

    df = _df(value_moments(str(tmp_path)))
    assert len(df) == 1

    xs = [20000] * 100 + [-20000] * 60
    n = len(xs)
    s1, s2 = sum(xs), sum(v * v for v in xs)
    s3, s4 = sum(v ** 3 for v in xs), sum(v ** 4 for v in xs)
    num2 = n * s2 - s1 * s1
    num3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    num4 = n ** 3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4
    m2 = float(num2) / float(n * n)
    r = df.iloc[0]
    assert int(r["n_events"]) == n
    assert r["mean_value"] == float(s1) / n
    assert r["skewness"] == (float(num3) / float(n ** 3)) / m2 ** 1.5
    assert r["kurtosis"] == (float(num4) / float(n ** 4)) / (m2 * m2) - 3.0


def test_cap_strict_mode_raises_not_truncates():
    """Ops with structurally-bounded buckets (edit1_pairs) must fail loudly
    on a >cap bucket instead of silently diverging from their exact
    uncapped oracle."""
    import pytest as _pytest

    from ocr_ray.ops.common import cap_bucket_members

    assert cap_bucket_members(10, "x", cap=16, strict=True) == 10
    with _pytest.raises(ValueError, match="invariant broken"):
        cap_bucket_members(100, "x", key="k", cap=16, strict=True)


def test_fuzzy_search_matches_and_doc_filter(ray_session):
    """W8 search semantics: the misspelled term must fuzzy-match (AUTO
    distance 1), exact short terms must not fuzz, and the docs filter
    restricts results like the reference's terms-filter arm."""
    from ocr_ray.ops.extraction_queries import fuzzy_search

    df = _df(fuzzy_search(SF))
    assert set(df.columns) == {"document", "path", "page", "n_terms",
                               "matched_terms"}
    assert len(df) > 0
    assert (df["n_terms"] >= 1).all()
    # restricting to one document returns only that document's pages,
    # with identical per-page rows
    doc = df["document"].iloc[0]
    sub = _df(fuzzy_search(SF, docs=[doc]))
    assert set(sub["document"]) == {doc}
    merged = sub.merge(df[df["document"] == doc],
                       on=["document", "path", "page"], suffixes=("_f", ""))
    assert len(merged) == len(sub)
    assert (merged["matched_terms_f"] == merged["matched_terms"]).all()
    assert len(_df(fuzzy_search(SF, docs=[]))) == 0


def test_semdedup_prune_structure(ray_session):
    """SemDeDup cell pruning: every vector labeled exactly once, at least
    one near-dup pruned (the corpus plants near-identical embeddings), the
    lowest vec_id of every cell always survives, and pruning is consistent
    with cosine_dup_pairs (a pruned vector must have SOME lower-id partner
    above tau — in its cell by construction)."""
    from ocr_ray.ops.embeddings import semdedup_prune

    df = _df(semdedup_prune(SF))
    assert set(df.columns) == {"vec_id", "cell", "pruned"}
    assert df["vec_id"].is_unique and len(df) == 500
    assert df["pruned"].sum() > 0
    firsts = df.sort_values("vec_id").groupby("cell").first()
    assert not firsts["pruned"].any(), "cell minimum can never be pruned"


def test_perplexity_buckets_structure(ray_session):
    """CCNet head/middle/tail: every doc bucketed once, per-lang thirds are
    within one histogram bin of n/3, and bucket order tracks the score."""
    from ocr_ray.ops.documents import perplexity_buckets

    df = _df(perplexity_buckets(SF))
    assert set(df.columns) == {"doc_id", "avg_neg_logprob", "lang", "bucket"}
    assert df["doc_id"].is_unique and len(df) == 500
    assert set(df["bucket"]) == {"head", "middle", "tail"}
    for lang, g in df.groupby("lang"):
        n = len(g)
        heads = (g["bucket"] == "head").sum()
        assert heads >= -(-n // 3)  # cutoff rule: cum >= ceil(n/3)
        # scores are ordered head <= middle <= tail within a language
        assert g[g["bucket"] == "head"]["avg_neg_logprob"].max() \
            <= g[g["bucket"] == "middle"]["avg_neg_logprob"].min() + 1e-12
        assert g[g["bucket"] == "middle"]["avg_neg_logprob"].max() \
            <= g[g["bucket"] == "tail"]["avg_neg_logprob"].min() + 1e-12


def test_bpe_pair_counts_matches_local_counter(ray_session):
    """The distributed pair count equals a single-process Counter over the
    same table, including the (n desc, pair asc) top-k tiebreak."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import BPE_TOP_PAIRS, bpe_pair_counts

    got = _df(bpe_pair_counts(SF))
    cnt: Counter = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet", columns=["text"]) \
            .column("text").to_pylist():
        ws = t.split()
        cnt.update(zip(ws, ws[1:]))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_PAIRS]
    assert len(got) == len(want)
    for row, ((a, b), n) in zip(got.itertuples(index=False), want):
        assert (row.a, row.b, row.n) == (a, b, n)


def test_dsir_weights_separates_target_language(ray_session):
    """DSIR log-weights: deterministic, one row per doc, and the target
    language (en) scores higher on average than the rest — the whole point
    of importance resampling toward a target distribution."""
    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import DSIR_TARGET_LANG, dsir_weights

    a = _df(dsir_weights(SF)).sort_values("doc_id").reset_index(drop=True)
    b = _df(dsir_weights(SF)).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    langs = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
    m = a.merge(langs, on="doc_id")
    assert len(m) == len(langs)
    tgt = m.loc[m["lang"] == DSIR_TARGET_LANG, "dsir_logw"]
    rest = m.loc[m["lang"] != DSIR_TARGET_LANG, "dsir_logw"]
    assert tgt.mean() > rest.mean()
    assert (m["n_vocab_tokens"] >= 0).all()


def test_anchor_texts_accounts_all_anchors(ray_session):
    import re

    from ocr_ray.ops.graph import ANCHOR_RE_S, anchor_texts
    from ocr_ray.ops.extraction_queries import _pages_pruned

    df = _df(anchor_texts(SF))
    assert list(df.columns) == ["dst_host", "anchor_text", "n_anchors"]
    assert df["dst_host"].str.fullmatch(r"host[0-9]+").all()
    assert (df["n_anchors"] >= 1).all()
    # rollup identity: counts sum to the raw per-page anchor total
    anchor_re = re.compile(ANCHOR_RE_S)
    raw = 0
    for row in _pages_pruned(SF, ["html"]).take_all():
        data = row["html"]
        if data.startswith(b"<!DOCTYPE html>"):
            raw += len(anchor_re.findall(data.decode("utf-8")))
    assert df["n_anchors"].sum() == raw


def test_dedup_winners_argmax_per_cluster(ray_session):
    from ocr_ray.ops.documents import quality_scores
    from ocr_ray.ops.graph import dedup_winners, dup_clusters

    win = _df(dedup_winners(SF)).set_index("cluster_id")
    clusters = _df(dup_clusters(SF))
    quality = _df(quality_scores(SF))[["doc_id", "quality_score"]]
    joined = clusters.merge(quality, on="doc_id")
    # one winner per cluster, and it IS the (max quality, min doc_id) member
    assert len(win) == clusters["cluster_id"].nunique()
    for cid, grp in joined.groupby("cluster_id"):
        best_q = grp["quality_score"].max()
        expect = grp[grp["quality_score"] == best_q]["doc_id"].min()
        assert win.loc[cid, "keep_id"] == expect
        assert win.loc[cid, "keep_quality"] == best_q
        assert win.loc[cid, "cluster_size"] == len(grp)


def test_hash_classifier_scores_recompute(ray_session):
    import hashlib
    import math

    import duckdb

    from ocr_ray.ops.documents import (
        HASH_CLF_BUCKETS, hash_classifier_scores, hash_classifier_weights,
    )

    df = _df(hash_classifier_scores(SF)).set_index("doc_id")
    assert len(df) == 500
    w = hash_classifier_weights()
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id LIMIT 5"
    ).fetchall()
    for doc_id, text in texts:
        toks = text.lower().split()
        tot = sum(
            int(w[int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                  % HASH_CLF_BUCKETS])
            for t in toks
        )
        logit = tot / 1024.0 / len(toks) if toks else 0.0
        row = df.loc[doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["logit"] == round(logit, 4)
        assert row["prob"] == round(1.0 / (1.0 + math.exp(-logit)), 4)
        assert row["flagged"] == (tot >= 0)


def test_mutual_knn_pairs_are_mutual(ray_session):
    import numpy as np

    from ocr_ray.ops.common import read_table
    from ocr_ray.ops.embeddings import KNN_K, mutual_knn_pairs

    pairs = _df(mutual_knn_pairs(SF))
    rows = read_table(SF, "embeddings", columns=["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    pos = {int(v): i for i, v in enumerate(ids)}

    def topk(vid: int) -> set[int]:
        i = pos[vid]
        mask = ids != vid
        cand_ids, cand = ids[mask], sims[i][mask]
        order = np.lexsort((cand_ids, -cand))[:KNN_K]
        return {int(cand_ids[j]) for j in order}

    assert len(pairs) > 0
    assert (pairs["vec_a"] < pairs["vec_b"]).all()
    assert not pairs.duplicated(["vec_a", "vec_b"]).any()
    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        assert b in topk(int(a)) and a in topk(int(b))
    # completeness: every mutual pair in the brute-force graph is present
    n_mutual = sum(
        1 for i, a in enumerate(ids) for b in topk(int(a))
        if int(a) < b and int(a) in topk(b)
    )
    assert n_mutual == len(pairs)


def test_repetition_signals_recompute(ray_session):
    import duckdb
    import numpy as np

    from ocr_ray.ops.documents import (
        REP_DUP_N, REP_TOP_N, _round4_ratio, repetition_signals,
    )

    df = _df(repetition_signals(SF)).set_index("doc_id")
    assert len(df) == 500
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id LIMIT 8"
    ).fetchall()
    for doc_id, text in rows:
        ws = text.lower().split()
        lens = np.array([len(w) for w in ws])
        total = int(lens.sum())
        grams3 = [tuple(ws[i:i + REP_TOP_N]) for i in range(len(ws) - REP_TOP_N + 1)]
        best = max(
            (grams3.count(g) * sum(len(w) for w in g) for g in set(grams3)),
            default=0,
        )
        grams5 = [tuple(ws[i:i + REP_DUP_N]) for i in range(len(ws) - REP_DUP_N + 1)]
        cover = np.zeros(len(ws), dtype=bool)
        for i, g in enumerate(grams5):
            if grams5.count(g) >= 2:
                cover[i:i + REP_DUP_N] = True
        r = df.loc[doc_id]
        assert r["n_words"] == len(ws)
        assert r["top3_char_frac"] == _round4_ratio(best, total)
        assert r["dup5_char_frac"] == _round4_ratio(int(lens[cover].sum()), total)


def test_round4_ratio_half_even_boundaries():
    from ocr_ray.ops.documents import _round4_ratio

    # 18/320 = 0.05625 exactly: half-even rounds DOWN to the even 4th digit
    assert _round4_ratio(18, 320) == 0.0562
    assert _round4_ratio(19, 320) == 0.0594  # 0.059375 -> nearest, no tie
    assert _round4_ratio(3, 1600) == 0.0019  # 0.001875 -> no tie
    assert _round4_ratio(1, 1600) == 0.0006  # 0.000625: tie -> even (6)
    assert _round4_ratio(0, 0) == 0.0
    assert _round4_ratio(5, 10000 * 2) == 0.0002  # 0.00025: tie -> even


def test_bm25_scores_recompute(ray_session):
    import math

    import duckdb

    from ocr_ray.ops.documents import (
        BM25_B, BM25_K1, BM25_QUERY_TERMS, bm25_scores,
    )

    df = _df(bm25_scores(SF)).set_index("doc_id")
    assert len(df) == 500
    all_rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    toks = {d: t.lower().split() for d, t in all_rows}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    idf = {
        t: math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for t, df_t in (
            (t, sum(1 for ws in toks.values() if t in ws))
            for t in BM25_QUERY_TERMS
        )
    }
    for doc_id in list(toks)[:8]:
        ws = toks[doc_id]
        dl = len(ws)
        s = 0.0
        for t in BM25_QUERY_TERMS:
            tf = ws.count(t)
            if tf:
                s += idf[t] * tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
        assert df.loc[doc_id, "bm25"] == round(s, 4)
        assert df.loc[doc_id, "n_tokens"] == dl


def test_hll_daily_users_tracks_exact(ray_session):
    from ocr_ray.ops.relational import HLL_M, daily_active_users, hll_daily_users

    hll = _df(hll_daily_users(SF)).set_index("day")
    exact = _df(daily_active_users(SF)).set_index("day")
    assert set(hll.index) == set(exact.index)
    # m=64 -> ~13% standard error; the small-range (linear counting) regime
    # that these day sizes land in is tighter still. Generous bound.
    for day in exact.index:
        e = exact.loc[day, "active_users"]
        a = hll.loc[day, "hll_users"]
        assert abs(a - e) / e < 0.35, (day, a, e)
    assert (hll["v_zero"] >= 0).all() and (hll["v_zero"] <= HLL_M).all()
    # deterministic across runs (register merge is a max — order-free)
    again = _df(hll_daily_users(SF)).set_index("day")
    assert hll.sort_index().equals(again.sort_index())


def test_user_retention_invariants(ray_session):
    from ocr_ray.ops.relational import daily_active_users, user_retention

    ret = _df(user_retention(SF)).set_index("day")
    dau = _df(daily_active_users(SF)).set_index("day")
    assert set(ret.index) == set(dau.index)
    # active side must agree exactly with the exact-distinct twin
    assert (ret["active_users"] == dau["active_users"]).all()
    assert (ret["retained_next_day"] <= ret["active_users"]).all()
    # last observed day has no next day -> retention 0 by construction
    assert ret.loc[max(ret.index), "retained_next_day"] == 0
    assert ((ret["retention_rate"] >= 0) & (ret["retention_rate"] <= 1)).all()


def test_funnel_counts_monotone(ray_session):
    import duckdb

    from ocr_ray.ops.relational import funnel_counts

    df = _df(funnel_counts(SF)).sort_values("stage_no")
    assert list(df["stage"]) == ["view", "click", "purchase"]
    # funnel counts can only shrink stage to stage
    assert df["users"].is_monotonic_decreasing
    # stage 1 is exactly the distinct users with a view event
    n_view = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet') "
        "WHERE event_type = 'view'"
    ).fetchone()[0]
    assert df.iloc[0]["users"] == n_view


def test_misra_gries_bound_and_superset():
    """Kernel: MG retained counts under-estimate by at most n/(capacity+1),
    and every item above that threshold survives — on a skewed stream whose
    distinct count EXCEEDS the capacity (so the decrement path runs)."""
    from collections import Counter

    from ocr_ray.kernels.sketches import misra_gries

    # 5 heavy items + 200 singletons, capacity 16 << 205 distinct
    stream = []
    for i in range(5):
        stream += [f"hot{i}"] * (50 - 5 * i)
    stream += [f"cold{j}" for j in range(200)]
    # deterministic interleave so decrements hit mid-stream
    stream = [stream[i] for i in range(0, len(stream), 2)] + [
        stream[i] for i in range(1, len(stream), 2)
    ]
    cap = 16
    mg = misra_gries(iter(stream), cap)
    assert len(mg) <= cap
    true = Counter(stream)
    bound = len(stream) / (cap + 1)
    for w, c in true.items():
        if c > bound:
            assert w in mg, f"heavy item {w} ({c} > {bound}) evicted"
    for w, c in mg.items():
        assert c <= true[w]
        assert true[w] - c <= bound


def test_heavy_hitters_exact_topk(ray_session):
    """Sketch-then-verify returns the EXACT top-k (counts and cut), equal
    to a single-process Counter over the same table."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import HH_TOP_K, heavy_hitters

    got = _df(heavy_hitters(SF))
    cnt: Counter = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet", columns=["text"]) \
            .column("text").to_pylist():
        cnt.update(t.split())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:HH_TOP_K]
    assert [(r.word, r.n) for r in got.itertuples(index=False)] == want


def test_pmi_bigrams_recompute(ray_session):
    """PMI rows recompute exactly from local unigram/bigram counts with the
    same ln chain, and the top-k cut is the (pmi desc, a, b) order."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import (
        PMI_MIN_COUNT, PMI_TOP_PAIRS, PMI_VOCAB, pmi_bigrams,
    )

    got = _df(pmi_bigrams(SF))
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet", columns=["text"]) \
            .column("text").to_pylist():
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nuni, nbi = sum(uni.values()), sum(bi.values())
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:PMI_VOCAB])
    rows = []
    for (a, b), n in bi.items():
        if n < PMI_MIN_COUNT or a not in vocab or b not in vocab:
            continue
        pmi = (
            ((((math.log(float(n)) - math.log(float(nbi)))
               - math.log(float(vocab[a]))) - math.log(float(vocab[b])))
             + math.log(float(nuni))) + math.log(float(nuni))
        )
        rows.append((a, b, n, round(pmi, 6)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = rows[:PMI_TOP_PAIRS]
    assert [(r.a, r.b, r.n, r.pmi) for r in got.itertuples(index=False)] == want


def test_phrase_search_positions(ray_session):
    """Phrase hits: every reported doc contains the phrase at first_pos
    (1-based), n_hits counts overlapping starts, and no matching doc is
    missed."""
    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import PHRASE_QUERY, phrase_search

    df = _df(phrase_search(SF))
    got = (df if not df.empty else pd.DataFrame(
        columns=["doc_id", "n_hits", "first_pos"])).set_index("doc_id")
    k = len(PHRASE_QUERY)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("text").to_pylist()):
        ws = text.split()
        hits = [i + 1 for i in range(len(ws) - k + 1)
                if tuple(ws[i:i + k]) == PHRASE_QUERY]
        if hits:
            assert doc_id in got.index
            assert got.loc[doc_id, "n_hits"] == len(hits)
            assert got.loc[doc_id, "first_pos"] == hits[0]
        else:
            assert doc_id not in got.index


def test_shipping_priority_matches_duckdb(ray_session):
    """The 3-way join plan (broadcast semi-join + pre-aggregated fact join)
    equals the straightforward SQL join, including the integer-exact
    revenue and the (revenue desc, orderkey) cut."""
    import duckdb

    from ocr_ray.ops.relational import Q3_DATE, Q3_SEGMENT, shipping_priority

    got = _df(shipping_priority(SF))
    con = duckdb.connect()
    want = con.execute(f"""
        WITH rev AS (
            SELECT l_orderkey,
                   SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
            FROM read_parquet('{SF}/lineitem.parquet')
            WHERE l_shipdate > TIMESTAMP '{Q3_DATE}' GROUP BY l_orderkey
        )
        SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
               rev.rev4 / 10000.0 AS revenue
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c ON o.o_custkey = c.c_custkey
        JOIN rev ON rev.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{Q3_SEGMENT}'
          AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
        ORDER BY revenue DESC, o.o_orderkey LIMIT 10
    """).df()
    assert len(got) == len(want)
    got = got.sort_values(["revenue", "o_orderkey"],
                          ascending=[False, True]).reset_index(drop=True)
    assert list(got["o_orderkey"]) == list(want["o_orderkey"])
    assert list(got["revenue"]) == list(want["revenue"])
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])


def test_jsonl_export_roundtrip_lossless(ray_session):
    """The JSONL sink round-trips every document losslessly: the re-read
    projection (id, lang, n_chars, md5(text)) equals the same projection
    of the source table, row for row."""
    import hashlib

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import jsonl_export

    got = _df(jsonl_export(SF)).sort_values("doc_id").reset_index(drop=True)
    src = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(src)
    assert list(got["doc_id"]) == list(src["doc_id"])
    assert list(got["lang"]) == list(src["lang"])
    assert list(got["n_chars"]) == list(src["n_chars"])
    want_md5 = [hashlib.md5(t.encode()).hexdigest() for t in src["text"]]
    assert list(got["text_md5"]) == want_md5


def test_containment_pairs_detects_quotes(ray_session):
    """A short doc quoted inside a long one must surface with containment
    ~1 in the SHORT doc's direction, even though pair Jaccard is low —
    verified on a planted pair recomputed locally."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import (
        CONTAIN_TAU_BP, SUBSTR_NGRAM, _h64, containment_pairs,
    )

    got = _df(containment_pairs(SF))
    # local recompute over the full table
    grams: dict[int, set] = {}
    for r in pq.read_table(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).to_pylist():
        ws = r["text"].lower().split()
        grams[r["doc_id"]] = {
            _h64(" ".join(ws[i:i + SUBSTR_NGRAM]))
            for i in range(len(ws) - SUBSTR_NGRAM + 1)
        }
    want = set()
    ids = sorted(grams)
    by_h = defaultdict(list)
    for d in ids:
        for h in grams[d]:
            by_h[h].append(d)
    cand = {(a, b) for ds_ in by_h.values()
            for i, a in enumerate(ds_) for b in ds_[i + 1:]}
    for a, b in cand:
        s = len(grams[a] & grams[b])
        if (s * 10000 >= CONTAIN_TAU_BP * len(grams[a])
                or s * 10000 >= CONTAIN_TAU_BP * len(grams[b])):
            want.add((a, b, s))
    assert {(r.doc_a, r.doc_b, r.n_shared)
            for r in got.itertuples(index=False)} == want
    if len(got):
        assert ((got["c_a"] >= 0.5) | (got["c_b"] >= 0.5)).all()


def test_audio_energy_from_decoded_bytes(ray_session):
    """Audio stats must come from the DECODED payload: recompute one clip's
    windows straight from its stored bytes and compare."""
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_ray.ops.multimodal import AUDIO_WIN, audio_window_energy, audios_corpus
    from ocr_ray.synth_media import parse_audio

    got = _df(audio_window_energy(SF))
    tbl = pq.read_table(f"{audios_corpus(SF)}/audios.parquet").to_pylist()
    assert len(got) == sum(-(-r["n_samples"] // AUDIO_WIN) for r in tbl)
    r = tbl[3]
    s = parse_audio(r["media"])
    mine = got[got["aud_id"] == r["aud_id"]].sort_values("win_idx")
    for w, row in enumerate(mine.itertuples(index=False)):
        win = s[w * AUDIO_WIN:(w + 1) * AUDIO_WIN].astype(np.int64)
        assert row.n == len(win)
        assert row.energy == int(np.sum(win ** 2))
        assert row.peak == int(np.max(np.abs(win)))


def test_length_percentiles_by_lang_exact(ray_session):
    """Grouped percentiles equal a per-language numpy recompute of the same
    smallest-v-with-cum>=ceil(q*n) definition."""
    import math

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import PERCENTILE_QS, length_percentiles_by_lang

    got = length_percentiles_by_lang(SF).to_pandas()
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["lang", "n_chars"]).to_pandas()
    want = []
    for lang, g in sorted(tbl.groupby("lang")):
        vals = sorted(g["n_chars"])
        for q in PERCENTILE_QS:
            want.append((lang, q, vals[math.ceil(q * len(vals)) - 1]))
    assert [(r.lang, r.q, r.n_chars) for r in got.itertuples(index=False)] == want


def test_normalized_dedup_folds_variants(ray_session):
    """Groups equal a local recompute of the canonical form; total copies
    account every doc; n_variants counts distinct raw forms."""
    import hashlib
    import unicodedata
    from collections import defaultdict

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import _NORM_WS_RE, normalized_dedup

    got = _df(normalized_dedup(SF))
    groups: dict[str, list] = defaultdict(list)
    for r in pq.read_table(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).to_pylist():
        canon = _NORM_WS_RE.sub(
            " ", unicodedata.normalize("NFC", r["text"]).lower()).strip(" ")
        groups[hashlib.md5(canon.encode()).hexdigest()].append(r)
    assert len(got) == len(groups)
    assert got["n_copies"].sum() == sum(len(v) for v in groups.values())
    by_hash = got.set_index("norm_hash")
    for h, rows in groups.items():
        assert by_hash.loc[h, "n_copies"] == len(rows)
        assert by_hash.loc[h, "keep_id"] == min(r["doc_id"] for r in rows)
        raws = {hashlib.md5(r["text"].encode()).hexdigest() for r in rows}
        assert by_hash.loc[h, "n_variants"] == len(raws)
    # the canonical fold is strictly coarser than raw md5 grouping
    from ocr_ray.ops.documents import exact_dedup

    assert len(got) <= len(_df(exact_dedup(SF)))


def test_rolling_active_users_window(ray_session):
    """7-day rolling distinct users equals a pandas recompute, and only
    observed days appear (no window-tail days)."""
    import pyarrow.parquet as pq

    from ocr_ray.ops.relational import ROLLING_WINDOW_DAYS, rolling_active_users

    got = _df(rolling_active_users(SF))
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    ev["day"] = ev["ts"].dt.normalize()
    pairs = ev[["day", "user_id"]].drop_duplicates()
    days = sorted(pairs["day"].unique())
    want = {}
    for d in days:
        lo = d - pd.Timedelta(days=ROLLING_WINDOW_DAYS - 1)
        want[d.strftime("%Y-%m-%d")] = pairs[
            (pairs["day"] >= lo) & (pairs["day"] <= d)]["user_id"].nunique()
    assert dict(zip(got["day"], got["users_7d"])) == want
    # rolling count dominates the daily count everywhere
    daily = pairs.groupby("day")["user_id"].nunique()
    for d in days:
        assert want[d.strftime("%Y-%m-%d")] >= daily[d]


def test_novel_near_docs_lsh_semantics(ray_session):
    """Band-novelty invariants: every even (seen-half) doc with shingles is
    non-novel (it indexed itself); a doc is novel iff NONE of its band keys
    match any seen doc's — recomputed locally from the same sketches."""
    import pyarrow.parquet as pq

    from ocr_ray.kernels import sketches
    from ocr_ray.ops.documents import (
        MINHASH_BANDS, MINHASH_PERMS, novel_near_docs,
    )

    got = _df(novel_near_docs(SF)).set_index("doc_id")
    rows = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    bands = {}
    for r in rows:
        sh = sketches.word_shingles(r["text"])
        bands[r["doc_id"]] = (
            set(sketches.minhash_bands(
                sketches.minhash_signature(sh, MINHASH_PERMS), MINHASH_BANDS))
            if sh else set()
        )
    seen = set().union(*(bands[i] for i in bands if i % 2 == 0))
    for i, b in bands.items():
        assert got.loc[i, "n_known_bands"] == len(b & seen)
        assert bool(got.loc[i, "is_novel"]) == (len(b & seen) == 0)
        if i % 2 == 0 and b:
            assert not got.loc[i, "is_novel"]


def test_per_lang_sample_exact_k(ray_session):
    """Exactly k per language (or the whole group), ranks contiguous from
    1, and the cut equals the local md5-order recompute."""
    import hashlib

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import SAMPLE_PER_LANG, per_lang_sample

    got = _df(per_lang_sample(SF))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    for lang, g in docs.groupby("lang"):
        mine = got[got["lang"] == lang].sort_values("rank")
        want = sorted(
            g["doc_id"],
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:SAMPLE_PER_LANG]
        assert list(mine["rank"]) == list(range(1, len(want) + 1))
        assert list(mine["doc_id"]) == want


def test_domain_blocklist_filter_drops_top_hosts(ray_session):
    """The retained inventory contains NO doc from the top-k hosts, every
    doc from every other host, and nothing else."""
    from collections import Counter

    from ocr_ray.ops.extraction_queries import (
        BLOCK_TOP_HOSTS, domain_blocklist_filter, extraction_output,
    )

    got = _df(domain_blocklist_filter(SF))
    urls = [r["url"] for r in
            extraction_output(SF, columns=["url"]).take_all()]
    census = Counter(u.split("/")[2] for u in urls)
    blocked = {h for h, _ in sorted(
        census.items(), key=lambda kv: (-kv[1], kv[0]))[:BLOCK_TOP_HOSTS]}
    assert set(got["host"]).isdisjoint(blocked)
    want = {u for u in urls if u.split("/")[2] not in blocked}
    assert set(got["url"]) == want


def test_bpe_apply_merges_greedy_semantics(ray_session):
    """The replace-chain encode equals a literal greedy BPE merge pass per
    merge rank, including cascaded merges (table+hash then +batch), on a
    local recompute; counts reconcile."""
    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import BPE_MERGES, bpe_apply_merges

    got = _df(bpe_apply_merges(SF)).set_index("doc_id")

    def encode(text):
        toks = text.split()
        s = "".join(f"({t})" for t in toks)
        for x, y in BPE_MERGES:
            s = s.replace(f"({x})({y})", f"({x}+{y})")
        # decode back to symbols for an independent count
        syms = s[1:-1].split(")(") if s else []
        return len(toks), len(syms)

    total_merges = 0
    for r in pq.read_table(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).to_pylist():
        nb, na = encode(r["text"])
        assert got.loc[r["doc_id"], "n_before"] == nb
        assert got.loc[r["doc_id"], "n_after"] == na
        total_merges += nb - na
    assert got["n_merges"].sum() == total_merges
    # cascade check on a synthetic doc: the rank-6 merge consumes rank-1's
    # output symbol
    s = "(table)(hash)(batch)"
    for x, y in BPE_MERGES:
        s = s.replace(f"({x})({y})", f"({x}+{y})")
    assert s == "(table+hash+batch)"


def test_language_confusion_accounts_all_docs(ray_session):
    """The confusion matrix sums to the doc count and equals a local rollup
    of the per-doc detector output."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import language_confusion, language_id

    got = _df(language_confusion(SF))
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert got["n_docs"].sum() == n_docs
    per_doc = _df(language_id(SF))
    want = Counter(zip(per_doc["declared_lang"], per_doc["detected_lang"]))
    assert {(r.declared_lang, r.detected_lang): r.n_docs
            for r in got.itertuples(index=False)} == dict(want)


def test_data_splits_deterministic_hash(ray_session):
    import hashlib

    from ocr_ray.ops.documents import (
        SPLIT_BUCKETS, SPLIT_TEST_LT, SPLIT_VALID_LT, data_splits,
    )

    df = _df(data_splits(SF)).sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 500
    # recompute the hash assignment independently for every row
    for _, r in df.head(50).iterrows():
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:16], 16) % SPLIT_BUCKETS
        assert r["split_bucket"] == b
        want = "test" if b < SPLIT_TEST_LT else ("valid" if b < SPLIT_VALID_LT else "train")
        assert r["split"] == want
    # all three splits non-empty and partition the corpus
    counts = df["split"].value_counts()
    assert set(counts.index) == {"train", "valid", "test"}
    assert counts.sum() == 500
    assert counts["train"] > counts["valid"] > 0


def test_skipgram_pairs_matches_local_counter(ray_session):
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import SKIP_TOP_PAIRS, SKIP_WINDOW, skipgram_pairs

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text").to_pylist()
    c: Counter = Counter()
    for t in texts:
        ws = t.split()
        for off in range(1, SKIP_WINDOW + 1):
            c.update(zip(ws, ws[off:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:SKIP_TOP_PAIRS]

    df = _df(skipgram_pairs(SF))
    got = list(zip(zip(df["a"], df["b"]), df["n"]))
    assert got == want


def test_source_lang_rollup_levels_consistent(ray_session):
    from ocr_ray.ops.documents import source_lang_rollup

    df = _df(source_lang_rollup(SF))
    fine = df[(df["source"] != "ALL") & (df["lang"] != "ALL")]
    per_source = df[(df["source"] != "ALL") & (df["lang"] == "ALL")]
    total = df[(df["source"] == "ALL") & (df["lang"] == "ALL")]
    assert len(total) == 1
    assert total["n_docs"].iloc[0] == fine["n_docs"].sum() == 500
    assert total["sum_chars"].iloc[0] == fine["sum_chars"].sum()
    merged = fine.groupby("source")[["n_docs", "sum_chars"]].sum()
    for src, row in per_source.set_index("source").iterrows():
        assert row["n_docs"] == merged.loc[src, "n_docs"]
        assert row["sum_chars"] == merged.loc[src, "sum_chars"]


def test_sentence_stats_recompute_sample(ray_session):
    import re

    from ocr_ray.ops.documents import _round4_ratio
    from ocr_ray.ops.extraction_queries import extract_summary, sentence_stats

    stats = _df(sentence_stats(SF)).set_index("url")
    docs = _df(extract_summary(SF))
    docs = docs[docs["error"].isnull()].head(25)
    assert len(stats) > 0
    for _, r in docs.iterrows():
        sents = [p.strip(" \t\n\r") for p in re.split(r"[.!?]+", r["text"])]
        sents = [s for s in sents if s]
        row = stats.loc[r["url"]]
        assert row["n_sentences"] == len(sents)
        tw = sum(len(s.split()) for s in sents)
        assert row["mean_sentence_words"] == _round4_ratio(tw, len(sents))
        assert row["ends_terminal"] == (r["text"].rstrip(" \t\n\r")[-1:] in ".!?")


def test_lapsed_customers_matches_not_exists(ray_session):
    import duckdb

    from ocr_ray.ops.relational import LAPSED_HI, LAPSED_LO, lapsed_customers

    df = _df(lapsed_customers(SF))
    n = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{SF}/customer.parquet') c
        WHERE NOT EXISTS (
            SELECT 1 FROM read_parquet('{SF}/orders.parquet') o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '{LAPSED_LO}'
              AND o.o_orderdate < TIMESTAMP '{LAPSED_HI}')
    """).fetchone()[0]
    assert n > 0  # the window must make the anti join non-trivial
    assert df["n_lapsed"].sum() == n


def test_url_features_recompute_sample(ray_session):
    from ocr_ray.ops.extraction_queries import url_features

    df = _df(url_features(SF))
    assert len(df) > 0
    for _, r in df.head(40).iterrows():
        u = r["url"]
        rest = u.split("://", 1)[1]
        hostpath, _, query = rest.partition("?")
        slash = hostpath.find("/")
        host = hostpath if slash < 0 else hostpath[:slash]
        path = "" if slash < 0 else hostpath[slash:]
        assert r["host"] == host
        assert r["path_depth"] == len([s for s in path.split("/") if s])
        assert r["n_query_params"] == (len(query.split("&")) if query else 0)
        assert 0.0 <= r["path_digit_frac"] <= 1.0


def test_sq8_quantize_reconstruction(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_ray.ops.embeddings import SQ8_LEVELS, sq8_quantize

    df = _df(sq8_quantize(SF)).sort_values("vec_id").reset_index(drop=True)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    embs = {i: np.asarray(e, dtype=np.float64)
            for i, e in zip(t.column("vec_id").to_pylist(),
                            t.column("embedding").to_pylist())}
    assert len(df) == len(embs)
    for _, r in df.head(20).iterrows():
        v = embs[r["vec_id"]]
        scale = (v.max() - v.min()) / SQ8_LEVELS
        codes = np.clip(np.floor((v - v.min()) / (scale or 1.0) + 0.5), 0, SQ8_LEVELS)
        assert r["code_sum"] == codes.sum()
        recon = v.min() + codes * scale
        assert abs(r["mse"] - ((v - recon) ** 2).mean()) < 1e-6
        # SQ8 quality bound: max per-dim error is scale/2 -> mse <= scale^2/4
        assert r["mse"] <= scale * scale / 4 + 1e-12


def test_event_value_percentiles_vs_exact(ray_session):
    import duckdb

    from ocr_ray.ops.relational import EVENT_PCTL_SCALE, event_value_percentiles

    df = event_value_percentiles(SF).to_pandas()
    # every (type, q) present, monotone in q within a type
    for et, g in df.groupby("event_type"):
        g = g.sort_values("q")
        assert list(g["q"]) == [0.5, 0.95, 0.99]
        assert g["p_value"].is_monotonic_increasing
    # the bucketed percentile brackets the true quantile within 1 cent
    truth = duckdb.sql(f"""
        SELECT event_type,
               quantile_disc(value, 0.5) AS p50
        FROM read_parquet('{SF}/events.parquet') GROUP BY event_type
    """).df().set_index("event_type")
    for et, g in df.groupby("event_type"):
        p50 = g[g["q"] == 0.5]["p_value"].iloc[0]
        assert abs(p50 - truth.loc[et, "p50"]) <= 1.0 / EVENT_PCTL_SCALE + 1e-9


def test_daily_event_anomalies_moments(ray_session):
    import numpy as np

    from ocr_ray.ops.relational import daily_event_anomalies

    df = _df(daily_event_anomalies(SF))
    for et, g in df.groupby("event_type"):
        # z-scores of a full population: mean ~0, |z| bounded by sqrt(d)
        x = g["n_events"].to_numpy(dtype="float64")
        if x.std() == 0:
            assert (g["z"] == 0).all()
            continue
        want = (x - x.mean()) / x.std()
        assert np.allclose(g["z"].to_numpy(), want, atol=1e-3)
        assert ((g["z"].abs() >= 2.0) == g["is_anomaly"]).all()


def test_event_type_affinity_counts(ray_session):
    import duckdb

    from ocr_ray.ops.relational import event_type_affinity

    df = event_type_affinity(SF).to_pandas()
    assert (df["type_a"] < df["type_b"]).all()
    # exact-count cross-check against a direct distinct self-join
    truth = duckdb.sql(f"""
        WITH ut AS (SELECT DISTINCT user_id, event_type
                    FROM read_parquet('{SF}/events.parquet'))
        SELECT a.event_type ta, b.event_type tb, COUNT(*) n
        FROM ut a JOIN ut b ON a.user_id = b.user_id
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    """).df().set_index(["ta", "tb"])["n"]
    for _, r in df.iterrows():
        want = truth.get((r["type_a"], r["type_b"]), 0)
        assert r["n_both"] == want
        assert 0.0 <= r["support"] <= 1.0
        assert 0.0 <= r["confidence"] <= 1.0


def test_readability_scores_recompute_sample(ray_session):
    import re

    from ocr_ray.ops.extraction_queries import extract_summary, readability_scores

    df = _df(readability_scores(SF)).set_index("url")
    docs = _df(extract_summary(SF))
    docs = docs[docs["error"].isnull()].head(25)
    for _, r in docs.iterrows():
        row = df.loc[r["url"]]
        w = len(r["text"].split())
        sy = len(re.findall("[aeiouy]+", r["text"].lower()))
        assert row["n_words"] == w
        assert row["n_syllables"] == sy
        if w and row["n_sentences"]:
            se = int(row["n_sentences"])
            num = 206835 * se * w - 1015 * w * w - 84600 * sy * se
            assert row["flesch"] == num / (1000 * se * w)


def test_html_titles_gate_and_extract(ray_session):
    from ocr_ray.ops.extraction_queries import html_titles

    df = _df(html_titles(SF))
    assert len(df) == 1000  # one row per corpus record, binary branch kept
    html = df[df["has_title"]]
    assert len(html) > 0
    assert (html["title"].str.len() > 0).all()
    assert (df.loc[~df["has_title"], "title"] == "").all()
    # title text never contains a tag bracket (regex [^<]* guarantees it)
    assert not html["title"].str.contains("<").any()


def test_outlink_stats_consistency(ray_session):
    from ocr_ray.ops.extraction_queries import outlink_stats
    from ocr_ray.ops.graph import host_link_graph

    df = _df(outlink_stats(SF))
    assert (df["n_internal"] + df["n_external"] == df["n_links"]).all()
    assert (df["n_unique_targets"] <= df["n_links"]).all()
    # cross-op invariant: total anchors seen here == total edge weight in
    # the host link graph (both parse the same corpus with the same anchors)
    edges = _df(host_link_graph(SF))
    assert df["n_links"].sum() == edges["n_links"].sum()


def test_bloom_novelty_no_false_negatives(ray_session):
    from ocr_ray.ops.documents import bloom_novelty

    df = _df(bloom_novelty(SF))
    assert len(df) == 500
    # the Bloom guarantee: every truly-seen doc is maybe-seen (no FNs)
    assert df.loc[df["truly_seen"], "maybe_seen"].all()
    # false_positive is exactly the audit difference
    assert (df["false_positive"] == (df["maybe_seen"] & ~df["truly_seen"])).all()
    # all even docs are in the snapshot, hence truly seen
    assert df.loc[df["doc_id"] % 2 == 0, "truly_seen"].all()


def test_order_size_distribution_accounts_all(ray_session):
    import duckdb

    from ocr_ray.ops.relational import order_size_distribution

    df = _df(order_size_distribution(SF))
    n_orders, n_items = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey), count(*) "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()
    assert df["n_orders"].sum() == n_orders
    assert (df["n_items"] * df["n_orders"]).sum() == n_items
    assert df["n_items"].is_monotonic_increasing


def test_host_freshness_span(ray_session):
    from ocr_ray.ops.extraction_queries import host_freshness

    df = _df(host_freshness(SF))
    assert (df["last_seen"] >= df["first_seen"]).all()
    assert (df["span_days"] >= 0).all()
    want = ((df["last_seen"] - df["first_seen"]).dt.total_seconds()
            // 86400).astype("int64")
    assert (df["span_days"] == want).all()
    assert df["host"].is_unique


def test_char_trigram_profile_recompute(ray_session):
    from collections import Counter

    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import TRIGRAM_TOP_K, char_trigram_profile

    df = _df(char_trigram_profile(SF))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"])
    by_lang: dict = {}
    for lang, text in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
        c = by_lang.setdefault(lang, Counter())
        c.update(map("".join, zip(text, text[1:], text[2:])))
    for lang, g in df.groupby("lang"):
        g = g.sort_values("rank")
        assert len(g) == min(TRIGRAM_TOP_K, len(by_lang[lang]))
        want = sorted(by_lang[lang].items(), key=lambda kv: (-kv[1], kv[0]))
        for (tri, n), (_, row) in zip(want[:len(g)], g.iterrows()):
            assert (row["tri"], row["n"]) == (tri, n)


def test_clickstream_paths_account_all_users(ray_session):
    import duckdb

    from ocr_ray.ops.relational import clickstream_paths

    df = _df(clickstream_paths(SF))
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert df["n_users"].sum() == n_users
    # every path is 1..3 event types joined by '>'
    assert df["path"].str.split(">").str.len().between(1, 3).all()


def test_kmeans_clusters_contract(ray_session):
    """Lloyd's determinism contract: every vector assigned, cluster ids in
    [0, k), two runs identical, and the refined model beats the raw init on
    inertia (the update step actually moved the centroids)."""
    import numpy as np

    from ocr_ray.ops.embeddings import (
        KMEANS_K, _matrix, kmeans_clusters, read_table,
    )

    a = _df(kmeans_clusters(SF))
    b = _df(kmeans_clusters(SF))
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["cluster"].between(0, KMEANS_K - 1).all()

    tbl = read_table(SF, "embeddings", columns=["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in tbl])
    m = np.array([list(r["embedding"]) for r in tbl], dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    init = np.round(m[:KMEANS_K], 6)

    lab = a.set_index("vec_id").loc[ids, "cluster"].to_numpy()
    refined = np.stack([m[lab == c].mean(axis=0) for c in range(KMEANS_K)])

    def inertia(cents):
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    assert inertia(refined) < inertia(init)


def test_local_supplier_volume_matches_pandas(ray_session):
    """Q5 revenue recomputed by a straight pandas 6-table join — same exact
    1e-4-unit integer contract as the engine."""
    import pandas as pd

    from ocr_ray.ops.relational import (
        Q5_DATE_HI, Q5_DATE_LO, Q5_REGION, local_supplier_volume,
    )

    got = _df(local_supplier_volume(SF))

    t = {n: pd.read_parquet(f"{SF}/{n}.parquet")
         for n in ["region", "nation", "customer", "supplier", "orders", "lineitem"]}
    nat = t["nation"].merge(
        t["region"][t["region"]["r_name"] == Q5_REGION],
        left_on="n_regionkey", right_on="r_regionkey")
    df = (
        t["lineitem"]
        .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(t["orders"], left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
    )
    df = df[
        (df["c_nationkey"] == df["s_nationkey"])
        & (df["o_orderdate"] >= pd.Timestamp(Q5_DATE_LO))
        & (df["o_orderdate"] < pd.Timestamp(Q5_DATE_HI))
    ]
    rev4 = (df["l_extendedprice"] * 100).round().astype("int64") * (
        100 - (df["l_discount"] * 100).round().astype("int64"))
    want = (
        rev4.groupby(df["n_name"]).sum().astype("float64") / 10000.0
    ).rename("revenue").reset_index()
    want = want.sort_values(["revenue", "n_name"],
                            ascending=[False, True]).reset_index(drop=True)
    assert got[["n_name", "revenue"]].equals(want[["n_name", "revenue"]])


def test_markov_transitions_probabilities(ray_session):
    """Row-level invariants: per-from_type probabilities sum to 1, counts
    equal total consecutive same-user pairs, and a brute-force per-user
    recount agrees."""
    import pandas as pd

    from ocr_ray.ops.relational import markov_transitions

    got = _df(markov_transitions(SF))
    sums = got.groupby("from_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-12).all()

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort")
    same = ev["user_id"].to_numpy()[1:] == ev["user_id"].to_numpy()[:-1]
    et = ev["event_type"].to_numpy()
    want = (
        pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        .groupby(["from_type", "to_type"], as_index=False).size()
        .rename(columns={"size": "n"})
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    )
    assert got[["from_type", "to_type", "n"]].equals(want)
    assert got["n"].sum() == int(same.sum())


def test_chunk_documents_coverage(ray_session):
    """Every token of every doc appears in some chunk; overlap tokens are
    shared verbatim; reassembling stride-prefixes reproduces the doc."""
    import pandas as pd

    from ocr_ray.ops.documents import CHUNK_STRIDE, CHUNK_TOKENS, chunk_documents

    got = _df(chunk_documents(SF)).sort_values(
        ["doc_id", "chunk_no"]).reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for _, r in docs.head(50).iterrows():
        toks = r["text"].split()
        g = got[got["doc_id"] == r["doc_id"]]
        assert len(g) == max(1, -(-len(toks) // CHUNK_STRIDE)) if toks else len(g) == 0
        rebuilt = []
        for _, c in g.iterrows():
            rebuilt.extend(c["chunk"].split()[:CHUNK_STRIDE])
        # stride-prefixes concatenated = the document (last window may be
        # shorter than the stride; extend() just takes what's there)
        assert rebuilt == toks[: len(rebuilt)]
        assert (g["n_tokens"] <= CHUNK_TOKENS).all()


def test_c4_clean_page_gates(ray_session):
    """Line-keep rule (>=5 words, no javascript) and page gate recomputed
    from the shared naive-lines artifact."""
    from ocr_ray.ops.extraction_queries import (
        C4_MIN_KEPT_LINES, C4_MIN_LINE_WORDS, c4_clean, naive_lines_output,
    )

    got = _df(c4_clean(SF))
    lines = _df(naive_lines_output(SF))
    assert got["n_lines"].sum() == len(lines)
    keep = (lines["line"].str.count(r"\S+") >= C4_MIN_LINE_WORDS) & ~lines[
        "line"].str.lower().str.contains("javascript", regex=False)
    assert got["n_kept"].sum() == int(keep.sum())
    # per-record text_clean is exactly the kept lines joined in order
    key = ["url", "warc_ts"]
    kept_join = (
        lines[keep].sort_values(key + ["par_no", "line_no"])
        .groupby(key)["line"].agg("\n".join)
    )
    sample = got.set_index(key).head(100)
    for idx, row in sample.iterrows():
        want = kept_join.get(idx, "")
        assert row["text_clean"] == want
        assert row["page_ok"] == (row["n_kept"] >= C4_MIN_KEPT_LINES)


def test_host_triangles_matches_networkx_free_count(ray_session):
    """Triangle counts cross-checked against a brute-force numpy adjacency
    cube over the same canonical undirected edge set."""
    import numpy as np

    from ocr_ray.ops.graph import _canonical_edges, host_triangles

    got = _df(host_triangles(SF)).sort_values("host").reset_index(drop=True)
    assert list(got.columns) == ["host", "n_triangles"]
    edges = _df(_canonical_edges(SF))
    hosts = sorted(set(edges["a"]) | set(edges["b"]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in zip(edges["a"], edges["b"]):
        A[idx[a], idx[b]] = 1
        A[idx[b], idx[a]] = 1
    # per-node triangle count = diag(A^3) / 2
    per_node = np.diag(A @ A @ A) // 2
    want = {h: int(per_node[i]) for h, i in idx.items() if per_node[i] > 0}
    assert dict(zip(got["host"], got["n_triangles"])) == want
    assert (got["n_triangles"] >= 1).all()


def test_mirror_hosts_pairs_verified_from_text(ray_session):
    """Each reported pair really shares >= MIRROR_MIN_SHARED distinct long
    paragraphs, recomputed from the extraction output; ordering canonical."""
    from ocr_ray.ops.extraction_queries import extraction_output
    from ocr_ray.ops.graph import (
        MIRROR_MIN_PAR_CHARS, MIRROR_MIN_SHARED, SRC_HOST_RE_S, mirror_hosts,
    )
    import re

    got = _df(mirror_hosts(SF))
    assert list(got.columns) == ["host_a", "host_b", "n_shared"]
    assert len(got) > 0
    assert (got["host_a"] < got["host_b"]).all()
    assert (got["n_shared"] >= MIRROR_MIN_SHARED).all()

    out = _df(extraction_output(SF, columns=["url", "text", "error"]))
    src_re = re.compile(SRC_HOST_RE_S)
    by_host: dict[str, set[str]] = {}
    for _, r in out.iterrows():
        if r["error"] is not None or not r["text"]:
            continue
        m = src_re.search(r["url"].lower())
        if m is None:
            continue
        pars = {p for p in r["text"].split("\n\n")
                if len(p) >= MIRROR_MIN_PAR_CHARS}
        by_host.setdefault(m.group(1), set()).update(pars)
    for _, r in got.iterrows():
        shared = by_host[r["host_a"]] & by_host[r["host_b"]]
        assert len(shared) == r["n_shared"]


def test_returned_items_matches_pandas(ray_session):
    """Q10 shape recomputed with pandas over the raw tables (exact integer
    revenue contract), including the top-k tiebreak."""
    import pandas as pd

    from ocr_ray.ops.relational import Q10_DATE_HI, Q10_DATE_LO, Q10_TOP_K, returned_items

    got = _df(returned_items(SF))
    assert list(got.columns) == ["c_custkey", "c_name", "n_name", "revenue"]
    assert len(got) <= Q10_TOP_K

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    li = li[li["l_returnflag"] == "R"].copy()
    li["rev4"] = ((li["l_extendedprice"] * 100).round().astype("int64")
                  * (100 - (li["l_discount"] * 100).round().astype("int64")))
    od = od[(od["o_orderdate"] >= pd.Timestamp(Q10_DATE_LO))
            & (od["o_orderdate"] < pd.Timestamp(Q10_DATE_HI))]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    per = j.groupby("o_custkey", as_index=False)["rev4"].sum()
    per = per.sort_values(["rev4", "o_custkey"], ascending=[False, True]).head(Q10_TOP_K)
    per = per.merge(cu, left_on="o_custkey", right_on="c_custkey").merge(
        na, left_on="c_nationkey", right_on="n_nationkey")
    want = per[["c_custkey", "c_name", "n_name"]].reset_index(drop=True)
    want["revenue"] = (per["rev4"].astype("float64") / 10000.0).values
    pd.testing.assert_frame_equal(got, want)


def test_revenue_rollup_levels_consistent(ray_session):
    """Grand total == sum of per-year subtotals == sum of fine cells; the
    sentinel rows carry the right aggregates."""
    from ocr_ray.ops.relational import revenue_rollup

    got = _df(revenue_rollup(SF))
    fine = got[(got["order_year"] >= 0) & (got["o_orderpriority"] != "ALL")]
    years = got[(got["order_year"] >= 0) & (got["o_orderpriority"] == "ALL")]
    total = got[got["order_year"] == -1]
    assert len(total) == 1
    assert total["n_orders"].iloc[0] == fine["n_orders"].sum() == years["n_orders"].sum()
    assert abs(total["revenue"].iloc[0] - fine["revenue"].sum()) < 1e-6
    for y, grp in fine.groupby("order_year"):
        row = years[years["order_year"] == y]
        assert row["n_orders"].iloc[0] == grp["n_orders"].sum()
        assert abs(row["revenue"].iloc[0] - grp["revenue"].sum()) < 1e-6


def test_event_type_pivot_matches_long_counts(ray_session):
    import pandas as pd

    from ocr_ray.ops.relational import EVENT_TYPES, event_type_pivot

    got = _df(event_type_pivot(SF)).set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    counts = ev.groupby(["user_id", "event_type"]).size()
    for t in EVENT_TYPES:
        want = counts.xs(t, level="event_type").reindex(got.index).fillna(0)
        assert (got[f"n_{t}"] == want).all(), t
    purch = ev[ev["event_type"] == "purchase"]
    cents = ((purch["value"] * 100).round().astype("int64")
             .groupby(purch["user_id"]).sum().reindex(got.index).fillna(0))
    assert (got["purchase_cents"] == cents).all()
    # row total equals events rows
    assert got[[f"n_{t}" for t in EVENT_TYPES]].sum().sum() == len(ev)


def test_monthly_revenue_growth_shift(ray_session):
    import pandas as pd

    from ocr_ray.ops.relational import monthly_revenue_growth

    got = _df(monthly_revenue_growth(SF))
    assert list(got.columns) == ["order_month", "revenue", "growth"]
    assert got["order_month"].is_monotonic_increasing
    assert got["growth"].iloc[0] == 0.0
    ratios = (got["revenue"] / got["revenue"].shift(1)).iloc[1:]
    assert (abs(got["growth"].iloc[1:] - ratios) < 1e-9).all()
    od = pd.read_parquet(f"{SF}/orders.parquet")
    assert len(got) == od["o_orderdate"].dt.to_period("M").nunique()


def test_supplier_part_variety_counts(ray_session):
    import pandas as pd

    from ocr_ray.ops.relational import (
        SUPPLIER_VARIETY_EXCLUDE_BRAND, supplier_part_variety,
    )

    got = _df(supplier_part_variety(SF))
    assert (got["p_brand"] != SUPPLIER_VARIETY_EXCLUDE_BRAND).all()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_partkey", "l_suppkey"]].drop_duplicates()
    pt = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j = j[j["p_brand"] != SUPPLIER_VARIETY_EXCLUDE_BRAND]
    want = j.groupby(["p_brand", "p_size"])["l_suppkey"].nunique()
    assert len(got) == len(want)
    for _, r in got.head(50).iterrows():
        assert want.loc[(r["p_brand"], r["p_size"])] == r["supplier_cnt"]


def test_vocab_growth_curve(ray_session):
    """Monotone cumulative vocabulary; final cum_vocab equals the global
    distinct normalized-token count; bucket totals partition the vocab."""
    import pandas as pd

    from ocr_ray.kernels.textfn import _INDEX_DEL_TABLE
    from ocr_ray.ops.documents import VOCAB_BUCKET_DOCS, vocab_growth

    got = _df(vocab_growth(SF))
    assert list(got.columns) == ["bucket", "new_words", "cum_vocab"]
    assert got["bucket"].is_monotonic_increasing
    assert (got["new_words"] >= 1).all()
    assert (got["cum_vocab"] == got["new_words"].cumsum()).all()

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    firsts: dict[str, int] = {}
    for _, r in docs.iterrows():
        for w in r["text"].split():
            w = w.translate(_INDEX_DEL_TABLE).lower()
            if w and (w not in firsts or r["doc_id"] < firsts[w]):
                firsts[w] = int(r["doc_id"])
    assert got["cum_vocab"].iloc[-1] == len(firsts)
    want = pd.Series(
        [fd // VOCAB_BUCKET_DOCS for fd in firsts.values()]
    ).value_counts().sort_index()
    assert dict(zip(got["bucket"], got["new_words"])) == want.to_dict()


def test_length_percent_rank_semantics(ray_session):
    """RANK() tie semantics without a global sort: rank equals the count of
    strictly shorter docs + 1; pct_rank in [0, 1]."""
    import pandas as pd

    from ocr_ray.ops.documents import length_percent_rank

    got = _df(length_percent_rank(SF)).sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    assert len(got) == n
    want_rank = docs["n_chars"].rank(method="min").astype("int64")
    merged = got.merge(docs[["doc_id", "n_chars"]], on="doc_id", suffixes=("", "_raw"))
    assert (merged["n_chars"] == merged["n_chars_raw"]).all()
    by_doc = dict(zip(docs["doc_id"], want_rank))
    assert all(by_doc[d] == r for d, r in zip(got["doc_id"], got["rnk"]))
    assert got["pct_rank"].between(0.0, 1.0).all()
    assert (got["pct_rank"] == (got["rnk"] - 1) / (n - 1)).all()


def test_type_token_ratio_bounds(ray_session):
    from ocr_ray.kernels.textfn import _INDEX_DEL_TABLE
    from ocr_ray.ops.documents import type_token_ratio

    got = _df(type_token_ratio(SF)).sort_values("doc_id").reset_index(drop=True)
    assert (got["n_types"] <= got["n_tokens"]).all()
    assert got["ttr"].between(0.0, 1.0).all()
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    for (_, d), (_, g) in zip(docs.head(50).iterrows(), got.head(50).iterrows()):
        toks = [t for t in (w.translate(_INDEX_DEL_TABLE).lower()
                            for w in d["text"].split()) if t]
        assert g["n_tokens"] == len(toks)
        assert g["n_types"] == len(set(toks))


def test_token_entropy_properties(ray_session):
    """Entropy bounds: 0 <= H <= log2(n_types); uniform-distribution docs
    hit the upper bound; recomputation matches for a sample."""
    import math
    from collections import Counter

    import pandas as pd

    from ocr_ray.kernels.textfn import _INDEX_DEL_TABLE
    from ocr_ray.ops.documents import ENTROPY_QLOG_SCALE, token_entropy, type_token_ratio

    got = _df(token_entropy(SF)).sort_values("doc_id").reset_index(drop=True)
    ttr = _df(type_token_ratio(SF)).sort_values("doc_id").reset_index(drop=True)
    assert (got["entropy"] >= -1e-9).all()
    # H <= log2(n_types) + quantization slack
    cap = ttr["n_types"].map(lambda k: math.log2(k) if k else 0.0)
    assert (got["entropy"] <= cap + 1e-5).all()

    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    for (_, d), (_, g) in zip(docs.head(30).iterrows(), got.head(30).iterrows()):
        counts = Counter(
            t for t in (w.translate(_INDEX_DEL_TABLE).lower()
                        for w in d["text"].split()) if t)
        n = sum(counts.values())
        if n == 0:
            assert g["entropy"] == 0.0
            continue
        s = sum(c * round(math.log2(c) * ENTROPY_QLOG_SCALE)
                for c in counts.values() if c > 1)
        assert g["entropy"] == math.log2(n) - s / (n * float(ENTROPY_QLOG_SCALE))


def test_global_doc_ids_is_permutation_rank(ray_session):
    import pandas as pd

    from ocr_ray.ops.documents import global_doc_ids

    got = _df(global_doc_ids(SF))
    n = len(got)
    assert sorted(got["global_id"]) == list(range(n))
    ordered = got.sort_values("global_id").reset_index(drop=True)
    # global order == (lang, doc_id) lexicographic order
    key = list(zip(ordered["lang"], ordered["doc_id"]))
    assert key == sorted(key)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert set(got["doc_id"]) == set(docs["doc_id"])


def test_knn_classify_semantics(ray_session):
    """Seeds excluded from output; predictions match a brute numpy 1-NN
    recomputation including the min-seed-id tiebreak."""
    import numpy as np
    import pandas as pd

    from ocr_ray.ops.embeddings import KNN_SEED_MOD, knn_classify

    got = _df(knn_classify(SF)).sort_values("vec_id").reset_index(drop=True)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    assert (got["vec_id"] % KNN_SEED_MOD != 0).all()
    assert len(got) == (emb["vec_id"] % KNN_SEED_MOD != 0).sum()
    assert (got["correct"] == (got["true_label"] == got["pred_label"])).all()

    seeds = emb[emb["vec_id"] % KNN_SEED_MOD == 0]
    s = np.stack(seeds["embedding"].to_numpy()).astype(np.float64)
    s = s / np.linalg.norm(s, axis=1, keepdims=True)
    ev = emb[emb["vec_id"] % KNN_SEED_MOD != 0]
    m = np.stack(ev["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    best = (m @ s.T).argmax(axis=1)
    want = seeds["label"].to_numpy()[best]
    assert (got.set_index("vec_id").loc[ev["vec_id"], "pred_label"].to_numpy()
            == want).all()
    # synthetic labels are independent of geometry: accuracy ~ chance
    assert 0.0 < got["correct"].mean() < 0.5


def test_source_vocab_overlap_bitmask_equals_brute(ray_session):
    """The bitmask rollup equals a brute per-source set recomputation,
    including vocab sizes implied by the jaccard denominator."""
    import pandas as pd

    from ocr_ray.kernels.textfn import _INDEX_DEL_TABLE
    from ocr_ray.ops.documents import source_vocab_overlap

    got = _df(source_vocab_overlap(SF))
    assert (got["source_a"] < got["source_b"]).all()

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vocab: dict[str, set] = {}
    for _, r in docs.iterrows():
        s = vocab.setdefault(r["source"], set())
        for w in r["text"].split():
            w = w.translate(_INDEX_DEL_TABLE).lower()
            if w:
                s.add(w)
    for _, r in got.iterrows():
        a, b = vocab[r["source_a"]], vocab[r["source_b"]]
        inter = len(a & b)
        assert r["n_shared"] == inter
        assert r["jaccard"] == inter / (len(a) + len(b) - inter)
    # completeness: every pair with any overlap is present
    names = sorted(vocab)
    expect = sum(
        1 for i in range(len(names)) for j in range(i + 1, len(names))
        if vocab[names[i]] & vocab[names[j]]
    )
    assert len(got) == expect


def test_token_budget_select_greedy_invariants(ray_session):
    """Selected set = greedy prefix of the (entropy desc, doc_id) order:
    budget respected by every cum-before, the crossing doc included, and
    nothing selectable was skipped."""
    from ocr_ray.ops.documents import TOKEN_BUDGET, token_budget_select, token_entropy

    got = _df(token_budget_select(SF))
    per = _df(token_entropy(SF)).sort_values(
        ["entropy", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    per["cum"] = per["n_tokens"].cumsum()
    want = per[per["cum"] - per["n_tokens"] < TOKEN_BUDGET]
    assert set(got["doc_id"]) == set(want["doc_id"])
    assert len(got) == len(want)
    merged = got.sort_values("doc_id").merge(
        want[["doc_id", "cum", "n_tokens"]], on="doc_id"
    )
    assert (merged["cum_tokens"] == merged["cum"]).all()
    assert (merged["n_tokens_x"] == merged["n_tokens_y"]).all()
    # budget actually binds (the corpus has more tokens than the budget)
    assert per["n_tokens"].sum() > TOKEN_BUDGET
    assert (got["cum_tokens"] - got["n_tokens"] < TOKEN_BUDGET).all()


def test_cohort_matrix_invariants(ray_session):
    """Offset-0 row equals cohort size; every cohort's later offsets never
    exceed it; total users match; brute pandas recomputation agrees."""
    import pandas as pd

    from ocr_ray.ops.relational import cohort_matrix

    got = _df(cohort_matrix(SF))
    assert (got["week_offset"] >= 0).all()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    week = ((ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days // 7)
    pw = pd.DataFrame({"user_id": ev["user_id"], "week": week}).drop_duplicates()
    first = pw.groupby("user_id")["week"].min()
    want = pd.DataFrame({
        "cohort_week": pw["user_id"].map(first),
        "week_offset": pw["week"] - pw["user_id"].map(first),
    }).groupby(["cohort_week", "week_offset"]).size()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want.loc[(r["cohort_week"], r["week_offset"])] == r["n_users"]
    base = got[got["week_offset"] == 0].set_index("cohort_week")["n_users"]
    assert base.sum() == ev["user_id"].nunique()
    for cw, grp in got.groupby("cohort_week"):
        assert (grp["n_users"] <= base.loc[cw]).all()


def test_value_trend_matches_numpy_polyfit(ray_session):
    """OLS slope/intercept agree with numpy lstsq to float tolerance and
    the sufficient-statistic identity holds exactly."""
    import numpy as np
    import pandas as pd

    from ocr_ray.ops.relational import value_trend_by_type

    got = _df(value_trend_by_type(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["x"] = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    daily = ev.groupby(["event_type", "x"], as_index=False)["cents"].sum()
    for _, r in got.iterrows():
        g = daily[daily["event_type"] == r["event_type"]]
        assert r["n_days"] == len(g)
        slope, intercept = np.polyfit(g["x"], g["cents"], 1)
        assert abs(r["slope"] - slope) < 1e-6 * max(1.0, abs(slope))
        assert abs(r["intercept"] - intercept) < 1e-4 * max(1.0, abs(intercept))


def test_lang_source_chisq_cells(ray_session):
    """Expected margins reproduce the observed margins; contribs are
    non-negative; scipy-free chi-square identity on a sample of cells."""
    import pandas as pd

    from ocr_ray.ops.documents import lang_source_chisq

    got = _df(lang_source_chisq(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    assert got["observed"].sum() == n
    assert (got["contrib"] >= 0).all()
    # only observed (non-zero) cells are emitted
    assert (got["observed"] >= 1).all()
    assert len(got) == len(docs.groupby(["lang", "source"]).size())
    for _, r in got.iterrows():
        rt = (docs["lang"] == r["lang"]).sum()
        ct = (docs["source"] == r["source"]).sum()
        e = float(rt * ct) / float(n)
        assert r["expected"] == e
        d = float(r["observed"]) - e
        assert r["contrib"] == d * d / e


def test_recrawl_changes_matches_raw_corpus(ray_session):
    """Every multi-crawl url appears exactly once; changed/len_delta match
    a pandas recomputation with the same total order."""
    import pandas as pd

    from ocr_ray.ops.extraction_queries import pages_corpus, recrawl_changes

    got = _df(recrawl_changes(SF)).sort_values("url").reset_index(drop=True)
    raw = pd.read_parquet(pages_corpus(SF))
    counts = raw["url"].value_counts()
    multi = counts[counts >= 2]
    assert sorted(got["url"]) == sorted(multi.index)
    by_url = got.set_index("url")["n_crawls"]
    assert all(by_url[u] == c for u, c in multi.items())
    r = raw.sort_values(["url", "warc_ts", "text"],
                        ascending=[True, False, False])
    for _, row in got.head(50).iterrows():
        g = r[r["url"] == row["url"]]
        latest, prev = g["text"].iloc[0], g["text"].iloc[1]
        assert row["changed"] == (latest != prev)
        assert row["len_delta"] == len(latest) - len(prev)


def test_daily_top_terms_ranks(ray_session):
    """Rank is dense 1..K per day, ordered by (n desc, word asc); counts
    match a brute recount for a sample day."""
    import pandas as pd

    from ocr_ray.kernels.textfn import _INDEX_DEL_TABLE
    from ocr_ray.ops.extraction_queries import DAILY_TOP_K, daily_top_terms, pages_corpus

    got = _df(daily_top_terms(SF))
    for day, g in got.groupby("day"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= DAILY_TOP_K
        key = list(zip(-g["n"], g["word"]))
        assert key == sorted(key)
    raw = pd.read_parquet(pages_corpus(SF))
    day0 = got["day"].iloc[0]
    sel = raw[raw["warc_ts"].dt.strftime("%Y-%m-%d") == day0]
    from collections import Counter
    c = Counter()
    for t in sel["text"]:
        for w in t.split():
            w = w.translate(_INDEX_DEL_TABLE).lower()
            if w:
                c[w] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:DAILY_TOP_K]
    g0 = got[got["day"] == day0].sort_values("rank")
    assert list(zip(g0["word"], g0["n"])) == want


def test_top_revenue_parts_threshold(ray_session):
    """Every emitted part clears the exact-integer share threshold; every
    omitted part does not (recomputed from raw lineitem)."""
    import pandas as pd

    from ocr_ray.ops.relational import top_revenue_parts

    got = _df(top_revenue_parts(SF))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    rev4 = ((li["l_extendedprice"] * 100).round().astype("int64")
            * (100 - (li["l_discount"] * 100).round().astype("int64")))
    per = rev4.groupby(li["l_partkey"]).sum()
    total = int(per.sum())
    want = {int(k) for k, v in per.items() if int(v) * 10000 > total * 5}
    assert set(got["l_partkey"]) == want
    merged = got.set_index("l_partkey")
    for k in got["l_partkey"]:
        assert merged.loc[k, "revenue"] == per.loc[k] / 10000.0
    assert (got["revenue"].diff().dropna() <= 0).all()


def test_host_url_samples_min_k(ray_session):
    """Each host's sample is its K smallest urls in order; the pre-prune
    never loses a global winner."""
    import pandas as pd

    from ocr_ray.ops.extraction_queries import (
        HOST_URL_SAMPLE_K, extraction_output, host_url_samples,
    )

    got = _df(host_url_samples(SF))
    out = _df(extraction_output(SF, columns=["url"]))
    hosts = out["url"].str.split("/").str[2]
    for _, r in got.iterrows():
        urls = sorted(out["url"][hosts == r["host"]])[:HOST_URL_SAMPLE_K]
        assert r["n_sampled"] == len(urls)
        assert r["urls"] == ",".join(urls)
    assert set(got["host"]) == set(hosts)


def test_promo_revenue_share(ray_session):
    """Per-month promo share recomputed from raw tables in pandas; shares
    sum consistently with totals and stay in [0, 100]."""
    import pandas as pd

    from ocr_ray.ops.relational import PROMO_TYPE, promo_revenue

    got = _df(promo_revenue(SF))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    promo = set(part.loc[part["p_type"] == PROMO_TYPE, "p_partkey"])
    rev4 = ((li["l_extendedprice"] * 100).round().astype("int64")
            * (100 - (li["l_discount"] * 100).round().astype("int64")))
    month = li["l_shipdate"].dt.strftime("%Y-%m")
    t = rev4.groupby(month).sum()
    p = rev4.where(li["l_partkey"].isin(promo), 0).groupby(month).sum()
    assert list(got["month"]) == sorted(t.index)
    for _, r in got.iterrows():
        assert r["total_revenue"] == t[r["month"]] / 10000.0
        assert r["promo_pct"] == 100.0 * float(p[r["month"]]) / float(t[r["month"]])
        assert 0.0 <= r["promo_pct"] <= 100.0


def test_large_orders_threshold(ray_session):
    """Emitted set == orders whose integer quantity rollup clears the
    HAVING bar; order is totalprice desc with orderkey tiebreak."""
    import pandas as pd

    from ocr_ray.ops.relational import Q18_MIN_QTY, large_orders

    got = _df(large_orders(SF))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    q = li["l_quantity"].round().astype("int64").groupby(li["l_orderkey"]).sum()
    want = {int(k) for k, v in q.items() if int(v) > Q18_MIN_QTY}
    assert set(got["o_orderkey"]) == want
    for _, r in got.iterrows():
        assert r["sum_qty"] == q[r["o_orderkey"]]
    keys = list(zip(-got["o_totalprice"], got["o_orderkey"]))
    assert keys == sorted(keys)


def test_idle_rich_customers_carve(ray_session):
    """The anti-join keeps exactly the above-average customers without a
    pending order (exact integer threshold recomputed in pandas)."""
    import pandas as pd

    from ocr_ray.ops.relational import Q22_STATUS, idle_rich_customers

    got = _df(idle_rich_customers(SF))
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (cust["c_acctbal"] * 100).round().astype("int64")
    s, n = int(cents[cents > 0].sum()), int((cents > 0).sum())
    pend = set(orders.loc[orders["o_orderstatus"] == Q22_STATUS, "o_custkey"])
    keep = cust[(cents * n > s) & ~cust["c_custkey"].isin(pend)]
    want = keep.groupby("c_mktsegment")["c_acctbal"].agg(["size", "sum"])
    assert set(got["c_mktsegment"]) == set(want.index)
    for _, r in got.iterrows():
        assert r["n_customers"] == want.loc[r["c_mktsegment"], "size"]
        assert r["total_acctbal"] == round(
            want.loc[r["c_mktsegment"], "sum"], 2)


def test_bpe_train_merges_greedy_invariants(ray_session):
    """Round 1's winner is bpe_pair_counts' top pair; counts never increase
    across rounds (a merge can only remove occurrences of other pairs);
    every adopted pair's count matches a single-process recount at adoption
    time."""
    import pandas as pd

    from ocr_ray.ops.documents import bpe_pair_counts, bpe_train_merges

    got = bpe_train_merges(SF).to_pandas()
    assert list(got["merge_rank"]) == list(range(1, len(got) + 1))

    top = _df(bpe_pair_counts(SF)).iloc[0]
    assert (got.iloc[0]["a"], got.iloc[0]["b"]) == (top["a"], top["b"])
    assert got.iloc[0]["n"] == top["n"]

    # single-process replay of the trainer over the raw corpus
    texts = pd.read_parquet(f"{SF}/documents.parquet")["text"]
    merges = []
    for _, r in got.iterrows():
        counts = {}
        for text in texts:
            toks = text.split()
            if not toks:
                continue
            s = "".join(f"({t})" for t in toks)
            for x, y in merges:
                s = s.replace(f"({x})({y})", f"({x}+{y})")
            syms = s[1:-1].split(")(")
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + 1
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r["a"], r["b"]) == best[0]
        assert r["n"] == best[1]
        merges.append(best[0])
    assert (got["n"].diff().dropna() <= 0).all()


def test_weighted_sample_aes_keys(ray_session):
    """A-ES keys recomputed single-process match exactly; the block-local
    prune never loses a global winner; ranks are dense."""
    import hashlib as _h
    import math

    import pandas as pd

    from ocr_ray.ops.documents import WEIGHTED_SAMPLE_K, weighted_sample

    got = _df(weighted_sample(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    keys = {}
    for doc_id, w in zip(docs["doc_id"], docs["n_chars"]):
        u = int(_h.md5(str(doc_id).encode()).hexdigest()[:16], 16)
        keys[int(doc_id)] = math.log(u / 2**64) / max(int(w), 1)
    want = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:WEIGHTED_SAMPLE_K]
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert list(got["key"]) == [k for _, k in want]
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_negative_sampling_table_power(ray_session):
    """weight_q is exactly round(count^0.75 · 1e6) of the true global
    count, over the true top-V vocabulary."""
    import pandas as pd

    from ocr_ray.ops.documents import (
        NEG_SAMPLE_POWER, NEG_SAMPLE_SCALE, NEG_SAMPLE_VOCAB,
        negative_sampling_table,
    )

    got = _df(negative_sampling_table(SF))
    texts = pd.read_parquet(f"{SF}/documents.parquet")["text"]
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:NEG_SAMPLE_VOCAB]
    assert set(got["word"]) == {w for w, _ in top}
    for _, r in got.iterrows():
        assert r["n"] == counts[r["word"]]
        assert r["weight_q"] == round(
            float(counts[r["word"]]) ** NEG_SAMPLE_POWER * NEG_SAMPLE_SCALE)


def test_url_templates_cover_output(ray_session):
    """Template counts recompute from the extraction output's url column;
    every url maps to exactly one (host, template) cell."""
    import re

    from ocr_ray.ops.extraction_queries import (
        URL_PARSE_RE, extraction_output, url_templates,
    )

    got = _df(url_templates(SF))
    urls = _df(extraction_output(SF, columns=["url"]))["url"]
    parse = re.compile(URL_PARSE_RE)
    want: dict[tuple, int] = {}
    for u in urls:
        m = parse.match(u)
        cell = (m.group(1), re.sub(r"[0-9]+", "N", m.group(2)))
        want[cell] = want.get(cell, 0) + 1
    assert {(r["host"], r["template"]): r["n_urls"]
            for _, r in got.iterrows()} == want
    assert int(got["n_urls"].sum()) == len(urls)


def test_host_degree_powerlaw_numpy(ray_session):
    """Slope/intercept equal a numpy replay of the quantized-log OLS over
    the true degree histogram."""
    import math

    from ocr_ray.ops.graph import (
        POWERLAW_QLOG_SCALE, host_degree_powerlaw, host_link_graph,
    )

    got = _df(host_degree_powerlaw(SF)).iloc[0]
    edges = _df(host_link_graph(SF))
    deg = edges.groupby("src_host").size()
    hist = deg.groupby(deg).size()
    qx = [round(math.log(int(d)) * POWERLAW_QLOG_SCALE) for d in hist.index]
    qy = [round(math.log(int(m)) * POWERLAW_QLOG_SCALE) for m in hist]
    n, sx, sy = len(qx), sum(qx), sum(qy)
    sxx = sum(x * x for x in qx)
    sxy = sum(x * y for x, y in zip(qx, qy))
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert got["n_points"] == n
    assert got["slope"] == slope
    assert got["intercept"] == (float(sy) - slope * float(sx)) / float(n)
    assert got["slope"] < 0  # heavier hosts are rarer


def test_event_gap_stats_pandas_replay(ray_session):
    """Gap stats equal a pandas groupby-diff replay over raw events."""
    import pandas as pd

    from ocr_ray.ops.relational import event_gap_stats

    got = _df(event_gap_stats(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "event_type", "ts", "event_id"])
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    gap = us.groupby(
        [ev["user_id"], ev["event_type"]]).diff().dropna().astype("int64")
    per = gap.groupby(ev["event_type"]).agg(["sum", "size", "max"])
    assert list(got["event_type"]) == sorted(per.index)
    for _, r in got.iterrows():
        s, n, mx = per.loc[r["event_type"]]
        assert r["n_gaps"] == n
        assert r["mean_gap_s"] == float(s) / float(n) / 1000000.0
        assert r["max_gap_s"] == float(mx) / 1000000.0


def test_proximity_search_window(ray_session):
    """Pair counts equal a brute-force position scan; every emitted doc has
    at least one in-window pair."""
    import pandas as pd

    from ocr_ray.ops.documents import (
        PROX_TERM_A, PROX_TERM_B, PROX_WINDOW, proximity_search,
    )

    got = _df(proximity_search(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split()
        n = sum(
            1
            for i, a in enumerate(toks) if a == PROX_TERM_A
            for j in range(i + 1, min(i + PROX_WINDOW + 1, len(toks)))
            if toks[j] == PROX_TERM_B
        )
        if n:
            want[int(doc_id)] = n
    assert dict(zip(got["doc_id"], got["n_pairs"])) == want
    assert len(want) > 0


def test_crawl_priorities_composition(ray_session):
    """priority == rank · (staleness + 1) recomputed from the two source
    queries; ordering is priority desc with host tiebreak."""
    import pandas as pd

    from ocr_ray.ops.extraction_queries import host_freshness
    from ocr_ray.ops.graph import crawl_priorities, pagerank_hosts

    got = _df(crawl_priorities(SF))
    pr = _df(pagerank_hosts(SF)).set_index("host")["rank"]
    fresh = _df(host_freshness(SF))
    fresh["short"] = fresh["host"].str.lower().str.split(".").str[0]
    last = fresh.groupby("short")["last_seen"].max()
    mx = last.max()
    for _, r in got.iterrows():
        stale = int((mx - last[r["host"]]) // pd.Timedelta(days=1))
        assert r["staleness_days"] == stale
        assert r["rank"] == pr[r["host"]]
        assert r["priority"] == pr[r["host"]] * float(stale + 1)
    keys = list(zip(-got["priority"], got["host"]))
    assert keys == sorted(keys)


def test_rank_fusion_reciprocal_ranks(ray_session):
    """Fused scores recompute from the two rankers with RANK() tie
    semantics; output is the global top-K."""
    import pandas as pd

    from ocr_ray.ops.documents import (
        RRF_K, RRF_TOP_K, bm25_scores, rank_fusion, unigram_logprob,
    )

    got = _df(rank_fusion(SF))
    b = _df(bm25_scores(SF)).set_index("doc_id")["bm25"]
    lm = _df(unigram_logprob(SF)).set_index("doc_id")["avg_neg_logprob"]
    r1 = b.rank(method="min", ascending=False).astype(int)
    r2 = lm.rank(method="min", ascending=True).astype(int)
    rrf = pd.DataFrame({
        "r1": r1, "r2": r2,
        "rrf": [1.0 / (RRF_K + a) + 1.0 / (RRF_K + c)
                for a, c in zip(r1, r2)],
    }).reset_index().sort_values(["rrf", "doc_id"], ascending=[False, True])
    want = rrf.head(RRF_TOP_K)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["rank_bm25"]) == list(want["r1"])
    assert list(got["rank_lm"]) == list(want["r2"])
    assert list(got["rrf"]) == list(want["rrf"])


def test_session_lengths_totals(ray_session):
    """The histogram's session and event totals agree with user_sessions;
    every session length is positive."""
    from ocr_ray.ops.relational import session_lengths, user_sessions

    got = _df(session_lengths(SF))
    per_user = _df(user_sessions(SF))
    assert (got["session_len"] > 0).all()
    assert (got["session_len"] * got["n_sessions"]).sum() == per_user["n_events"].sum()
    assert got["n_sessions"].sum() == per_user["n_sessions"].sum()


def test_centroid_distances_matrix(ray_session):
    """Distances recompute from raw embeddings; symmetry-free a<b
    triangle covers every label pair."""
    import itertools

    import numpy as np
    import pandas as pd

    from ocr_ray.ops.embeddings import centroid_distances

    got = centroid_distances(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    cents = {
        int(lab): np.mean(np.stack(g["embedding"].to_numpy()), axis=0,
                          dtype="float64")
        for lab, g in emb.groupby("label")
    }
    labs = sorted(cents)
    assert list(zip(got["label_a"], got["label_b"])) == list(
        itertools.combinations(labs, 2))
    for _, r in got.iterrows():
        d = float(np.linalg.norm(cents[r["label_a"]] - cents[r["label_b"]]))
        assert abs(r["dist"] - d) < 2e-4


def test_customer_rfm_quartiles(ray_session):
    """Quartile labels recompute from pandas ranks with min-tie semantics
    and integer quartile math; metrics recompute from raw orders."""
    import pandas as pd

    from ocr_ray.ops.relational import RFM_QUANTILES, customer_rfm

    got = _df(customer_rfm(SF)).sort_values("c_custkey").reset_index(drop=True)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype("int64")
    pc = orders.groupby("o_custkey").agg(
        last=("o_orderdate", "max"), n_orders=("o_custkey", "size"),
        cents=("cents", "sum"))
    rec = ((pc["last"].max() - pc["last"]).dt.total_seconds() * 1e6
           // 86_400_000_000).astype("int64")
    n = len(pc)
    want = pd.DataFrame({
        "recency_days": rec, "n_orders": pc["n_orders"], "cents": pc["cents"],
        "rr": rec.rank(method="min").astype(int),
        "rf": pc["n_orders"].rank(method="min", ascending=False).astype(int),
        "rm": pc["cents"].rank(method="min", ascending=False).astype(int),
    }).sort_index()
    assert list(got["c_custkey"]) == list(want.index)
    for col, rcol in (("r_q", "rr"), ("f_q", "rf"), ("m_q", "rm")):
        assert list(got[col]) == [
            (r - 1) * RFM_QUANTILES // n + 1 for r in want[rcol]]
    assert list(got["recency_days"]) == list(want["recency_days"])
    assert list(got["monetary"]) == list(want["cents"] / 100.0)
    for col in ("r_q", "f_q", "m_q"):
        assert set(got[col]) <= set(range(1, RFM_QUANTILES + 1))


def test_host_dup_ratio_bounds(ray_session):
    """Distinct counts recompute from the output table; ratio stays in
    [0, 1) and the url totals cover every record."""
    import hashlib as _h
    import re

    import pandas as pd

    from ocr_ray.ops.extraction_queries import (
        URL_PARSE_RE, extraction_output, host_dup_ratio,
    )

    got = _df(host_dup_ratio(SF))
    out = _df(extraction_output(SF, columns=["url", "text"]))
    parse = re.compile(URL_PARSE_RE)
    df = pd.DataFrame({
        "host": [parse.match(u).group(1) for u in out["url"]],
        "h": [_h.md5(t.encode()).hexdigest() for t in out["text"]],
    })
    want = df.groupby("host").agg(
        n_urls=("h", "size"), n_distinct=("h", "nunique"))
    assert list(got["host"]) == sorted(want.index)
    for _, r in got.iterrows():
        assert r["n_urls"] == want.loc[r["host"], "n_urls"]
        assert r["n_distinct"] == want.loc[r["host"], "n_distinct"]
        assert 0.0 <= r["dup_ratio"] < 1.0
    assert int(got["n_urls"].sum()) == len(out)


def test_host_lang_entropy_range(ray_session):
    """Entropy recomputes from the quantized-log formula over true
    per-host language counts; monolingual hosts land at ~0."""
    import math
    import re

    import pandas as pd

    from ocr_ray.ops.documents import ENTROPY_QLOG_SCALE
    from ocr_ray.ops.extraction_queries import (
        URL_PARSE_RE, extraction_output, host_lang_entropy,
    )

    got = _df(host_lang_entropy(SF))
    out = _df(extraction_output(SF, columns=["url", "lang"]))
    parse = re.compile(URL_PARSE_RE)
    df = pd.DataFrame({
        "host": [parse.match(u).group(1) for u in out["url"]],
        "lang": out["lang"],
    })
    for _, r in got.iterrows():
        counts = df[df["host"] == r["host"]]["lang"].value_counts()
        n = int(counts.sum())
        s = sum(int(c) * round(math.log2(int(c)) * ENTROPY_QLOG_SCALE)
                for c in counts if c > 1)
        want = math.log2(n) - s / (n * float(ENTROPY_QLOG_SCALE))
        assert r["n_records"] == n
        assert r["entropy"] == want
        assert -1e-9 <= r["entropy"] <= math.log2(max(len(counts), 1)) + 1e-9


def test_kmeans_quality_inertia(ray_session):
    """Cluster sizes match kmeans_clusters; inertia is within rounding of a
    single-process recomputation against the trained model."""
    import numpy as np
    import pandas as pd

    from ocr_ray.ops.embeddings import (
        KMEANS_ITERS, KMEANS_K, _assign, _kmeans_train, kmeans_clusters,
        kmeans_quality,
    )
    from ocr_ray.ops.common import read_table

    got = _df(kmeans_quality(SF))
    assign = _df(kmeans_clusters(SF))
    sizes = assign.groupby("cluster").size()
    assert dict(zip(got["cluster"], got["n_vectors"])) == dict(sizes)

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype("float64")
    cents = _kmeans_train(
        read_table(SF, "embeddings", columns=["vec_id", "embedding"]),
        KMEANS_K, KMEANS_ITERS)
    lab = _assign(m, cents)
    d = ((m - cents[lab]) ** 2).sum(axis=1)
    for _, r in got.iterrows():
        assert abs(r["inertia"] - d[lab == r["cluster"]].sum()) < 2e-4


def test_embedding_top_component_dominant(ray_session):
    """The power-iteration output matches numpy's leading eigenvector of
    the quantized second-moment matrix (up to sign and the re-quantization
    contract), and the Rayleigh quotient approaches the top eigenvalue."""
    import numpy as np
    import pandas as pd

    from ocr_ray.ops.embeddings import (
        POWER_EIG_ROUND, POWER_ITERS, POWER_M_ROUND, POWER_V_ROUND,
        embedding_top_component,
    )

    got = embedding_top_component(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype("float64")
    M = np.round(m.T @ m, POWER_M_ROUND)
    d = M.shape[0]
    assert list(got["dim"]) == list(range(1, d + 1))

    # exact replay of the quantized iteration
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(POWER_ITERS):
        w = np.round(M @ v, POWER_V_ROUND)
        v = np.round(w / np.sqrt(np.sum(w * w)), POWER_V_ROUND)
    assert np.array_equal(got["loading"].to_numpy(), v)
    assert got["eigenvalue"].iloc[0] == round(float(v @ M @ v), POWER_EIG_ROUND)

    # true power-iteration invariants (the synthetic cloud is near-
    # isotropic, so K=3 rounds can't isolate the top eigvec — but the
    # Rayleigh quotient must climb monotonically toward, and stay below,
    # the top eigenvalue)
    evals = np.linalg.eigvalsh(M)
    rq = []
    u = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(POWER_ITERS):
        rq.append(float(u @ M @ u) / float(u @ u))
        w = np.round(M @ u, POWER_V_ROUND)
        u = np.round(w / np.sqrt(np.sum(w * w)), POWER_V_ROUND)
    rq.append(float(u @ M @ u))
    assert all(b >= a - 1e-9 for a, b in zip(rq, rq[1:]))
    assert got["eigenvalue"].iloc[0] <= evals[-1] + 1e-6


def test_bigram_logprob_model_replay(ray_session):
    """Scores replay single-process from the add-one-smoothed bigram model
    over the unk-mapped top-V vocabulary."""
    import math

    import pandas as pd

    from ocr_ray.ops.documents import (
        BIGRAM_UNK, BIGRAM_VOCAB, bigram_logprob,
    )

    got = _df(bigram_logprob(SF)).set_index("doc_id")
    texts = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")["text"]

    uni: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            uni[w] = uni.get(w, 0) + 1
    vocab = {w for w, _ in sorted(
        uni.items(), key=lambda kv: (-kv[1], kv[0]))[:BIGRAM_VOCAB]}
    bg: dict[tuple, int] = {}
    for t in texts:
        ms = [w if w in vocab else BIGRAM_UNK for w in t.split()]
        for p in zip(ms, ms[1:]):
            bg[p] = bg.get(p, 0) + 1
    ctx: dict[str, int] = {}
    for (x, _), c in bg.items():
        ctx[x] = ctx.get(x, 0) + c
    k = len(vocab | {BIGRAM_UNK}) + 1

    assert set(got.index) == set(texts.index)
    for doc_id, t in texts.items():
        ms = [w if w in vocab else BIGRAM_UNK for w in t.split()]
        s, n = 0.0, 0
        for p in zip(ms, ms[1:]):
            s += math.log((bg[p] + 1) / (ctx[p[0]] + k))
            n += 1
        assert got.loc[doc_id, "n_pairs"] == n
        assert got.loc[doc_id, "bigram_nll"] == (round(-s / n, 4) if n else 0.0)
    assert (got["bigram_nll"] >= 0).all()


def test_doc_keywords_tfidf(ray_session):
    """Top-k keywords replay from a single-process tf·idf over the top-V
    document-frequency vocabulary; ranks are dense per doc."""
    import math

    import pandas as pd

    from ocr_ray.ops.documents import (
        KEYWORD_TOP_K, KEYWORD_VOCAB, doc_keywords,
    )

    got = _df(doc_keywords(SF))
    texts = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")["text"]
    df_counts: dict[str, int] = {}
    for t in texts:
        for w in set(t.split()):
            df_counts[w] = df_counts.get(w, 0) + 1
    voc = dict(sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :KEYWORD_VOCAB])
    n = len(texts)
    idf = {w: math.log((n + 1) / (c + 1)) for w, c in voc.items()}
    by_doc = {k: g for k, g in got.groupby("doc_id")}
    for doc_id, t in texts.items():
        tf: dict[str, int] = {}
        for w in t.split():
            if w in idf:
                tf[w] = tf.get(w, 0) + 1
        want = sorted(((c * idf[w], w) for w, c in tf.items()),
                      key=lambda p: (-p[0], p[1]))[:KEYWORD_TOP_K]
        g = by_doc.get(doc_id)
        rows = [] if g is None else list(g.sort_values("rank").itertuples())
        assert len(rows) == len(want)
        for r, (s, w) in zip(rows, want):
            assert r.term == w
            assert r.score == round(s, 6)


def test_ship_latency_join(ray_session):
    """Latencies recompute from a pandas merge of orders and per-order min
    shipdates; every priority present."""
    import pandas as pd

    from ocr_ray.ops.relational import ship_latency

    got = _df(ship_latency(SF))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    fs = li.groupby("l_orderkey")["l_shipdate"].min()
    m = orders.join(fs, on="o_orderkey", how="inner")
    lat = ((m["l_shipdate"] - m["o_orderdate"]).dt.total_seconds() * 1e6
           // 86_400_000_000).astype("int64")
    per = lat.groupby(m["o_orderpriority"]).agg(["size", "sum", "max"])
    assert list(got["o_orderpriority"]) == sorted(per.index)
    for _, r in got.iterrows():
        sz, sm, mx = per.loc[r["o_orderpriority"]]
        assert r["n_orders"] == sz
        assert r["mean_latency_days"] == float(sm) / float(sz)
        assert r["max_latency_days"] == mx


def test_nation_trade_volume_pairs(ray_session):
    """Pair revenue recomputes from a pandas replay; no self-pairs; exact
    integer revenue convention holds."""
    import pandas as pd

    from ocr_ray.ops.relational import Q7_YEAR_HI, Q7_YEAR_LO, nation_trade_volume

    got = _df(nation_trade_volume(SF))
    assert (got["supp_nation"] != got["cust_nation"]).all()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[(li["l_shipdate"] >= pd.Timestamp(Q7_YEAR_LO))
            & (li["l_shipdate"] < pd.Timestamp(Q7_YEAR_HI))].copy()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet").set_index("n_nationkey")["n_name"]
    m = (li.merge(orders[["o_orderkey", "o_custkey"]],
                  left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust[["c_custkey", "c_nationkey"]],
                  left_on="o_custkey", right_on="c_custkey")
           .merge(supp[["s_suppkey", "s_nationkey"]],
                  left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m["s_nationkey"] != m["c_nationkey"]].copy()
    m["rev4"] = ((m["l_extendedprice"] * 100).round().astype("int64")
                 * (100 - (m["l_discount"] * 100).round().astype("int64")))
    m["supp_nation"] = m["s_nationkey"].map(nation)
    m["cust_nation"] = m["c_nationkey"].map(nation)
    m["l_year"] = m["l_shipdate"].dt.year.astype("int64")
    exp = (m.groupby(["supp_nation", "cust_nation", "l_year"])["rev4"].sum()
            .astype("float64") / 10000.0)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert r["revenue"] == exp.loc[(r["supp_nation"], r["cust_nation"],
                                        r["l_year"])]


def test_market_share_bounds(ray_session):
    """Share is a [0,1] fraction; totals recompute from a pandas replay of
    the Q8 join tree."""
    import pandas as pd

    from ocr_ray.ops.relational import Q8_NATION, Q8_REGION, Q8_TYPE, market_share

    got = _df(market_share(SF))
    assert ((got["mkt_share"] >= 0) & (got["mkt_share"] <= 1)).all()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    li = li.merge(part[part["p_type"] == Q8_TYPE][["p_partkey"]],
                  left_on="l_partkey", right_on="p_partkey")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    rkeys = set(region[region["r_name"] == Q8_REGION]["r_regionkey"])
    rnat = set(nation[nation["n_regionkey"].isin(rkeys)]["n_nationkey"])
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    rc = set(cust[cust["c_nationkey"].isin(rnat)]["c_custkey"])
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    tkey = set(nation[nation["n_name"] == Q8_NATION]["n_nationkey"])
    tsupp = set(supp[supp["s_nationkey"].isin(tkey)]["s_suppkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    m = li.merge(orders[["o_orderkey", "o_custkey", "o_orderdate"]],
                 left_on="l_orderkey", right_on="o_orderkey")
    m = m[m["o_custkey"].isin(rc)].copy()
    m["rev4"] = ((m["l_extendedprice"] * 100).round().astype("int64")
                 * (100 - (m["l_discount"] * 100).round().astype("int64")))
    m["tgt4"] = m["rev4"].where(m["l_suppkey"].isin(tsupp), 0)
    m["o_year"] = m["o_orderdate"].dt.year.astype("int64")
    g = m.groupby("o_year")[["rev4", "tgt4"]].sum()
    assert list(got["o_year"]) == sorted(g.index)
    for _, r in got.iterrows():
        rev4, tgt4 = g.loc[r["o_year"], "rev4"], g.loc[r["o_year"], "tgt4"]
        assert r["mkt_share"] == float(tgt4) / float(rev4)
        assert r["total_revenue"] == float(rev4) / 10000.0


def test_custdist_zero_bucket(ray_session):
    """Customer counts across buckets sum to the full customer table —
    the zero-order bucket carries exactly the never-ordered customers."""
    import pandas as pd

    from ocr_ray.ops.relational import custdist

    got = _df(custdist(SF))
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    assert got["custdist"].sum() == len(cust)
    per = orders.groupby("o_custkey").size()
    exp = per.value_counts()
    zero = len(cust) - per.index.nunique()
    for _, r in got.iterrows():
        if r["c_count"] == 0:
            assert r["custdist"] == zero
        else:
            assert r["custdist"] == exp.loc[r["c_count"]]
    # ordered by custdist desc, c_count desc
    key = list(zip(-got["custdist"], -got["c_count"]))
    assert key == sorted(key)


def test_classifier_auc_rank_replay(ray_session):
    """AUC recomputes from a tie-aware pandas rank replay of the per-doc
    logits; P + N covers every document."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd

    from ocr_ray.ops.documents import (
        HASH_CLF_BUCKETS, classifier_auc, hash_classifier_weights)

    got = _df(classifier_auc(SF))
    assert len(got) == 1
    r = got.iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert r["n_pos"] + r["n_neg"] == len(docs)
    assert 0.0 <= r["auc"] <= 1.0
    w = hash_classifier_weights()
    qs, pos = [], []
    for _, d in docs.iterrows():
        toks = d["text"].lower().split()
        tot = sum(int(w[int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                                       "big") % HASH_CLF_BUCKETS])
                  for t in toks)
        logit = tot / 1024.0 / len(toks) if toks else 0.0
        qs.append(math.floor(logit * 1e6))
        pos.append(d["lang"] == "en")
    s = pd.Series(qs)
    ranks = s.rank(method="average")  # tie-aware Mann-Whitney
    p = int(np.sum(pos))
    n = len(docs) - p
    u = float(ranks[np.array(pos)].sum()) - p * (p + 1) / 2.0
    assert r["auc"] == pytest.approx(u / (p * n), abs=1e-12)


def test_class_keywords_structure(ray_session):
    """Every source gets ranks 1..K with scores non-increasing and the
    term-asc tiebreak; tf recomputes from a pandas token count."""
    from ocr_ray.ops.documents import CLASS_KEYWORD_TOP_K, class_keywords

    got = _df(class_keywords(SF))
    assert set(got.columns) == {"source", "rank", "term", "score"}
    for src, g in got.groupby("source"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= CLASS_KEYWORD_TOP_K
        s = list(g["score"])
        assert all(a >= b for a, b in zip(s, s[1:]))


def test_source_js_divergence_bounds(ray_session):
    """JS (log2) is bounded in [0, 1]; token totals recompute from a pandas
    count restricted to the top-V vocabulary."""
    from collections import Counter

    import pandas as pd

    from ocr_ray.ops.documents import JS_VOCAB, source_js_divergence

    got = _df(source_js_divergence(SF))
    assert ((got["js"] >= 0.0) & (got["js"] <= 1.0)).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts = Counter(w for t in docs["text"] for w in t.split())
    voc = set(w for w, _ in sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0]))[:JS_VOCAB])
    per_src = docs.groupby("source")["text"].apply(
        lambda ts: sum(1 for t in ts for w in t.split() if w in voc))
    for _, r in got.iterrows():
        assert r["n_tokens"] == per_src.loc[r["source"]]


def test_ppjoin_pairs_exact_vs_brute(ray_session):
    """The prefix filter loses no pair: engine output equals the brute-force
    all-pairs token-set Jaccard at the same integer threshold."""
    from itertools import combinations

    import pandas as pd

    from ocr_ray.ops.documents import PPJOIN_TAU_DEN, PPJOIN_TAU_NUM, ppjoin_pairs

    got = _df(ppjoin_pairs(SF)).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    sets = {r["doc_id"]: set(r["text"].split()) for _, r in docs.iterrows()}
    exp = []
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a]) + len(sets[b]) - i
        if u and PPJOIN_TAU_DEN * i >= PPJOIN_TAU_NUM * u:
            exp.append((a, b, round(float(i) / float(u), 4)))
    assert len(got) == len(exp)
    for (ea, eb, ej), (_, r) in zip(exp, got.iterrows()):
        assert (r["doc_a"], r["doc_b"], r["jaccard"]) == (ea, eb, ej)


def test_brand_basket_pairs_replay(ray_session):
    """Pair counts recompute from a pandas basket replay; canonical a<b
    ordering; bounded by C(n_brands, 2)."""
    from itertools import combinations

    from ocr_ray.ops.relational import brand_basket_pairs

    got = _df(brand_basket_pairs(SF))
    assert (got["brand_a"] < got["brand_b"]).all()
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    exp: dict[tuple[str, str], int] = {}
    for _, g in m.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(g["p_brand"])), 2):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[(r["brand_a"], r["brand_b"])] == r["n_orders"]


def test_loyal_customers_division(ray_session):
    """Division replay: a customer counts iff it has orders in all four
    quarters of LOYAL_YEAR."""
    from ocr_ray.ops.relational import LOYAL_YEAR, loyal_customers

    got = _df(loyal_customers(SF))
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    orders = orders[orders["o_orderdate"].dt.year == LOYAL_YEAR].copy()
    orders["q"] = orders["o_orderdate"].dt.quarter
    nq = orders.drop_duplicates(["o_custkey", "q"]).groupby("o_custkey").size()
    loyal = set(nq[nq == 4].index)
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    exp = cust[cust["c_custkey"].isin(loyal)].groupby("c_mktsegment").size()
    assert int(got["n_loyal"].sum()) == len(loyal)
    for _, r in got.iterrows():
        assert exp[r["c_mktsegment"]] == r["n_loyal"]


def test_top2_orders_per_customer_window(ray_session):
    """Window replay: rk matches a pandas rank over (price desc, orderkey);
    every customer contributes at most TOPK_K rows."""
    from ocr_ray.ops.relational import TOPK_K, top2_orders_per_customer

    got = _df(top2_orders_per_customer(SF))
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    exp = orders.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True], kind="mergesort")
    exp["rk"] = exp.groupby("o_custkey").cumcount() + 1
    exp = exp[exp["rk"] <= TOPK_K]
    assert len(got) == len(exp)
    assert got.groupby("c_custkey").size().max() <= TOPK_K
    for (_, g), (_, e) in zip(got.iterrows(), exp.iterrows()):
        assert (g["c_custkey"], g["rk"], g["o_orderkey"]) == (
            e["o_custkey"], e["rk"], e["o_orderkey"])


def test_orders_above_cust_avg_exact(ray_session):
    """Strict-above-own-mean replay in exact integer arithmetic; a customer
    with one order never qualifies."""
    from ocr_ray.ops.relational import orders_above_cust_avg

    got = _df(orders_above_cust_avg(SF))
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    orders = orders.assign(cents=cents)
    st = orders.groupby("o_custkey")["cents"].agg(["sum", "count"])
    m = orders.join(st, on="o_custkey")
    above = m[m["cents"] * m["count"] > m["sum"]]
    exp = above.groupby("o_orderpriority")["cents"].agg(["count", "sum"])
    assert int(got["n_above"].sum()) == len(above)
    for _, r in got.iterrows():
        e = exp.loc[r["o_orderpriority"]]
        assert r["n_above"] == e["count"]
        assert r["revenue"] == e["sum"] / 100.0


def test_decayed_user_scores_dyadic(ray_session):
    """Dyadic decay replay: weight halves per week of age; exact int64
    accumulation matches to the bit."""
    import numpy as np

    from ocr_ray.ops.relational import DECAY_UNIT, decayed_user_scores

    got = _df(decayed_user_scores(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    anchor = ev["ts"].max().normalize()
    age = (anchor - ev["ts"].dt.normalize()).dt.days.to_numpy()
    w = DECAY_UNIT >> np.minimum(age // 7, 60).astype(np.int64)
    num = (ev["value"].to_numpy() * 100).round().astype("int64") * w
    exp = pd.DataFrame({"user_id": ev["user_id"], "num": num}).groupby(
        "user_id")["num"].sum()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert r["score"] == exp[r["user_id"]] / (DECAY_UNIT * 100.0)


def test_k_core_hosts_peeling(ray_session):
    """k-core replay: KCORE_ROUNDS peels of a networkx-free adjacency dict;
    surviving hosts and induced degrees match exactly."""
    from ocr_ray.ops.graph import KCORE_K, KCORE_ROUNDS, _canonical_edges, k_core_hosts

    got = _df(k_core_hosts(SF))
    edges = {(r["a"], r["b"]) for r in _canonical_edges(SF).take_all()}
    for _ in range(KCORE_ROUNDS):
        deg: dict[str, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {h for h, d in deg.items() if d >= KCORE_K}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert len(got) == len(deg)
    for _, r in got.iterrows():
        assert deg[r["host"]] == r["core_degree"]


def test_rolling_7d_revenue_window(ray_session):
    """Rolling replay: pandas rolling(7) over per-day exact cents matches
    the windowed output bit for bit."""
    from ocr_ray.ops.relational import rolling_7d_revenue

    got = _df(rolling_7d_revenue(SF))
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    daily = pd.DataFrame(
        {"day": orders["o_orderdate"].dt.strftime("%Y-%m-%d"), "cents": cents}
    ).groupby("day", as_index=False).sum().sort_values("day").reset_index(drop=True)
    roll = daily["cents"].rolling(7, min_periods=1).sum().astype("int64")
    n = daily["cents"].rolling(7, min_periods=1).count().astype("int64")
    assert list(got["day"]) == list(daily["day"])
    assert (got["revenue"] == daily["cents"] / 100.0).all()
    assert (got["rolling_7d"] == roll / 100.0).all()
    assert (got["rolling_avg_7d"] == roll.astype("float64") / (100.0 * n)).all()


def test_referential_audit_tallies(ray_session):
    """Audit replay over raw key sets; the synthetic corpus is referentially
    intact, so orphan/childless tallies must be zero and matched == both
    distinct key counts."""
    from ocr_ray.ops.relational import referential_audit

    got = _df(referential_audit(SF)).iloc[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    okeys, lkeys = set(orders["o_orderkey"]), set(li["l_orderkey"])
    assert got["n_orders"] == len(orders)
    assert got["n_lineitems"] == len(li)
    assert got["n_matched_orders"] == len(okeys & lkeys)
    assert got["n_childless_orders"] == len(okeys - lkeys)
    assert got["n_orphan_keys"] == len(lkeys - okeys)
    assert got["n_orphan_lineitems"] == int(
        li["l_orderkey"].isin(lkeys - okeys).sum())


def test_source_gini_closed_form(ray_session):
    """Gini replay from the rank-weighted closed form; values in [0, 1)
    and exact against a numpy recompute."""
    import numpy as np

    from ocr_ray.ops.documents import source_gini

    got = _df(source_gini(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    assert ((got["gini"] >= 0) & (got["gini"] < 1)).all()
    for _, r in got.iterrows():
        x = np.sort(docs[docs["source"] == r["source"]]["n_chars"].to_numpy())
        n, sx = len(x), int(x.sum())
        s1 = int((np.arange(1, n + 1) * x).sum())
        assert r["n_docs"] == n and r["total_chars"] == sx
        assert r["gini"] == 2.0 * s1 / (n * sx) - (n + 1.0) / n


def test_hard_negatives_brute(ray_session):
    """Brute replay: for every anchor, the integer-dot argmax over
    different-label SQ8 codes, lowest-id tiebreak."""
    import numpy as np

    from ocr_ray.ops.embeddings import (
        HARDNEG_ANCHOR_MOD, _sq8_codes, hard_negatives)

    got = _df(hard_negatives(SF))
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.array(list(emb["embedding"]), dtype=np.float64)
    codes = _sq8_codes(m)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    a_mask = ids % HARDNEG_ANCHOR_MOD == 0
    assert len(got) == int(a_mask.sum())
    for _, r in got.iterrows():
        i = int(np.flatnonzero(ids == r["anchor_id"])[0])
        dots = codes[i] @ codes.T
        cand = labels != labels[i]
        best = max(
            (int(d), -int(v)) for d, v, ok in zip(dots, ids, cand) if ok)
        assert (r["dot"], r["neg_id"]) == (best[0], -best[1])


def test_supplier_overlap_pairs_projection(ray_session):
    """Bipartite-projection replay: pair counts equal shared distinct part
    sets; canonical supp_a < supp_b."""
    from itertools import combinations

    from ocr_ray.ops.relational import supplier_overlap_pairs

    got = _df(supplier_overlap_pairs(SF))
    assert (got["supp_a"] < got["supp_b"]).all()
    ps = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).drop_duplicates()
    exp: dict[tuple[int, int], int] = {}
    for _, g in ps.groupby("l_partkey"):
        for a, b in combinations(sorted(g["l_suppkey"]), 2):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[(r["supp_a"], r["supp_b"])] == r["n_shared_parts"]


def test_outlier_docs_fences(ray_session):
    """Fence replay: exactly the docs outside q ± (NUM/DEN)·IQR of their
    language, with order-statistic quartiles."""
    import numpy as np

    from ocr_ray.ops.documents import (
        OUTLIER_IQR_DEN, OUTLIER_IQR_NUM, outlier_docs)

    got = _df(outlier_docs(SF))
    assert len(got) > 0
    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    flagged = {}
    for lang, g in docs.groupby("lang"):
        x = np.sort(g["n_chars"].to_numpy())
        n = len(x)
        q1 = int(x[int(np.ceil(0.25 * n)) - 1])
        q3 = int(x[int(np.ceil(0.75 * n)) - 1])
        iqr = q3 - q1
        for _, r in g.iterrows():
            v = OUTLIER_IQR_DEN * int(r["n_chars"])
            if v < OUTLIER_IQR_DEN * q1 - OUTLIER_IQR_NUM * iqr:
                flagged[r["doc_id"]] = "low"
            elif v > OUTLIER_IQR_DEN * q3 + OUTLIER_IQR_NUM * iqr:
                flagged[r["doc_id"]] = "high"
    assert len(got) == len(flagged)
    for _, r in got.iterrows():
        assert flagged[r["doc_id"]] == r["side"]


def test_hits_scores_integer_recurrence(ray_session):
    """HITS replay: two unnormalized integer rounds over the weighted edge
    dict match the distributed joins exactly."""
    from ocr_ray.ops.graph import HITS_ROUNDS, hits_scores, host_link_graph

    got = _df(hits_scores(SF))
    edges = [(r["src_host"], r["dst_host"], r["n_links"])
             for r in host_link_graph(SF).take_all()]
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    hub = {h: 1 for h in nodes}
    auth: dict[str, int] = {}
    for _ in range(HITS_ROUNDS):
        auth = {}
        for s, d, w in edges:
            if s in hub:
                auth[d] = auth.get(d, 0) + w * hub[s]
        hub = {}
        for s, d, w in edges:
            if d in auth:
                hub[s] = hub.get(s, 0) + w * auth[d]
    assert len(got) == len(nodes)
    for _, r in got.iterrows():
        assert (r["hub"], r["auth"]) == (
            hub.get(r["host"], 0), auth.get(r["host"], 0))


def test_error_taxonomy_rollup(ray_session):
    """Taxonomy replay over the extraction cache: class = error prefix
    before ':', counts per branch."""
    from ocr_ray.ops.extraction_queries import error_taxonomy, extraction_output

    got = _df(error_taxonomy(SF))
    raw = pd.DataFrame(
        extraction_output(SF, columns=["branch", "error"]).take_all())
    raw = raw[raw["error"].notna()].copy()
    raw["error_class"] = raw["error"].str.split(":", n=1).str[0]
    exp = raw.groupby(["branch", "error_class"]).size()
    assert len(got) == len(exp)
    assert int(got["n"].sum()) == len(raw)
    for _, r in got.iterrows():
        assert exp[(r["branch"], r["error_class"])] == r["n"]


def test_tarjan_scc_kernel():
    from ocr_ray.ops.graph import _tarjan_scc

    # two 2-cycles bridged one-way, plus a one-way tail
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c"),
             ("d", "e")]
    lab = _tarjan_scc(edges)
    assert lab["a"] == lab["b"] == "a"
    assert lab["c"] == lab["d"] == "c"
    assert lab["e"] == "e"
    # a 3-cycle found regardless of DFS entry order
    lab2 = _tarjan_scc([("z", "x"), ("x", "y"), ("y", "z")])
    assert lab2 == {"x": "x", "y": "x", "z": "x"}


# ---------------------------------------------------------------- session 8


def test_benford_shares_sum_to_one(ray_session):
    from ocr_ray.ops.relational import benford_audit

    df = _df(benford_audit(SF))
    assert set(df["digit"]) <= set(range(1, 10))
    assert abs(df["share"].sum() - 1.0) < 1e-12
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert df["n_orders"].sum() == n


def test_product_profit_covers_type_only(ray_session):
    from ocr_ray.ops.relational import product_profit

    df = _df(product_profit(SF))
    assert set(df.columns) == {"nation", "o_year", "sum_profit"}
    assert df[["nation", "o_year"]].duplicated().sum() == 0


def test_spearman_bounds_and_sign(ray_session):
    from ocr_ray.ops.documents import spearman_tokens_types

    df = _df(spearman_tokens_types(SF))
    assert len(df) == 1
    rho = df["spearman_rho"].iloc[0]
    assert -1.0 <= rho <= 1.0
    # token count and type count grow together on organic-ish text
    assert rho > 0.5


def test_host_clustering_matches_triangles(ray_session):
    from ocr_ray.ops.graph import host_clustering, host_triangles

    cl = _df(host_clustering(SF))
    tr = _df(host_triangles(SF))
    assert ((cl["clustering"] >= 0) & (cl["clustering"] <= 1)).all()
    merged = cl.merge(tr, on="host", how="outer", suffixes=("", "_t"))
    got = merged["n_triangles"].fillna(0)
    want = merged["n_triangles_t"].fillna(0)
    assert (got == want).all()


def test_cdc_chunks_conserve_bytes(ray_session):
    from ocr_ray.ops.documents import cdc_chunk_dedup

    df = _df(cdc_chunk_dedup(SF))
    row = df.iloc[0]
    assert row["n_unique_chunks"] <= row["n_chunks"]
    assert row["unique_bytes"] <= row["total_bytes"]
    import duckdb

    total = duckdb.sql(
        f"SELECT sum(length(text)) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert row["total_bytes"] == total  # chunking is a partition of the text


def test_ks_source_drift_bounds(ray_session):
    from ocr_ray.ops.documents import ks_source_drift

    df = _df(ks_source_drift(SF))
    assert ((df["ks_stat"] >= 0) & (df["ks_stat"] <= 1)).all()
    assert df["source"].is_unique


def test_zorder_blocks_cover_all_vectors(ray_session):
    from ocr_ray.ops.embeddings import zorder_blocks

    df = _df(zorder_blocks(SF))
    assert df["n_vecs"].sum() == 500
    assert df["block"].between(0, 63).all()
    assert (df["cohesion"] >= 0).all()


def test_khop_reach_structure(ray_session):
    from ocr_ray.ops.graph import KHOP_ROUNDS, khop_reach

    df = _df(khop_reach(SF))
    assert (df["hop"] == 0).sum() == 1
    assert df["hop"].between(0, KHOP_ROUNDS).all()
    assert df["host"].is_unique


def test_blockmax_block_sizes(ray_session):
    from ocr_ray.ops.documents import BLOCKMAX_BLOCK, blockmax_index

    df = _df(blockmax_index(SF))
    assert df["n_docs"].between(1, BLOCKMAX_BLOCK).all()
    assert (df["max_tf"] >= 1).all()
    # every word has a block 0, and block ids are dense per word
    g = df.groupby("word")["block_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()


def test_mmr_selects_k_distinct(ray_session):
    from ocr_ray.ops.embeddings import MMR_K, mmr_diverse_topk

    df = _df(mmr_diverse_topk(SF))
    assert list(df["rank"]) == list(range(1, MMR_K + 1))
    assert df["vec_id"].is_unique
    # greedy scores after round 1 are penalized, never above round-1 score
    assert (df["score"].iloc[1:] <= df["score"].iloc[0] + 1e-9).all()


def test_zone_map_audit_partition(ray_session):
    from ocr_ray.ops.documents import zone_map_audit

    df = _df(zone_map_audit(SF))
    assert df["n_rows"].sum() == 500
    skipped = df[df["block_class"] == "skipped"]
    assert skipped.empty or (skipped["n_matching_rows"] == 0).all()
    full = df[df["block_class"] == "full"]
    assert full.empty or (full["n_rows"] == full["n_matching_rows"]).all()


def test_source_weighted_jaccard_pairs(ray_session):
    from ocr_ray.ops.documents import source_weighted_jaccard

    df = _df(source_weighted_jaccard(SF))
    assert ((df["w_jaccard"] > 0) & (df["w_jaccard"] <= 1)).all()
    assert (df["source_a"] < df["source_b"]).all()
    assert (df["shared_mass"] <= df["union_mass"]).all()


def test_hashed_bow_norm_consistency(ray_session):
    from ocr_ray.ops.documents import hashed_bow_embeddings

    df = _df(hashed_bow_embeddings(SF))
    assert len(df) == 500
    # Cauchy-Schwarz-ish sanity: l1^2 >= norm2 when components are ints
    assert (df["l1"] ** 2 >= df["norm2"]).all()
    assert (df["nnz"] <= 64).all()


def test_best_split_stump_beats_majority(ray_session):
    from ocr_ray.ops.documents import best_split_stump

    df = _df(best_split_stump(SF))
    row = df.iloc[0]
    assert 0.0 < row["accuracy"] <= 1.0
    # the stump can always at least predict the majority class by putting
    # the threshold at an extreme
    assert row["n_correct"] >= row["n_docs"] // 2


def test_contrastive_triplets_structure(ray_session):
    from ocr_ray.ops.documents import contrastive_triplets

    df = _df(contrastive_triplets(SF))
    assert len(df) == 500
    assert df["anchor_id"].is_unique
    # negatives are a permutation of the corpus (rank shift is a bijection)
    assert sorted(df["negative_id"]) == sorted(df["anchor_id"])


def test_crawl_budget_sums_exactly(ray_session):
    from ocr_ray.ops.documents import CRAWL_BUDGET, crawl_budget_allocation

    df = _df(crawl_budget_allocation(SF))
    assert df["quota"].sum() == CRAWL_BUDGET
    # proportionality within 1 slot of the exact share
    total = df["n_docs"].sum()
    exact = CRAWL_BUDGET * df["n_docs"] / total
    assert ((df["quota"] - exact).abs() < 1.0).all()


def test_merkle_leaves_detect_change(ray_session):
    from ocr_ray.ops.documents import merkle_shard_hashes

    a = _df(merkle_shard_hashes(SF))
    b = _df(merkle_shard_hashes(SF))
    assert a.equals(b)  # deterministic fingerprints
    assert a["n_docs"].sum() == 500
    assert a["leaf_hash"].is_unique


def test_bitmap_index_matches_direct_count(ray_session):
    import duckdb

    from ocr_ray.ops.documents import ZONE_PRED_MIN_CHARS, bitmap_index_audit

    df = _df(bitmap_index_audit(SF))
    want = duckdb.sql(
        f"SELECT lang, count(*) AS n FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE n_chars >= {ZONE_PRED_MIN_CHARS} GROUP BY lang"
    ).df().set_index("lang")["n"]
    got = df.set_index("lang")["n_matching"]
    for lang, n in want.items():
        assert got.get(lang, 0) == n
    assert df["n_docs"].sum() == 500


def test_user_active_coverage_bounds(ray_session):
    from ocr_ray.ops.relational import user_active_coverage

    df = _df(user_active_coverage(SF))
    # union length is bounded by islands x window and by events x window
    win_us = 30 * 60 * 1_000_000
    assert (df["covered_us"] <= df["n_events"] * win_us).all()
    assert (df["covered_us"] >= df["n_islands"] * 1).all()
    assert (df["n_islands"] <= df["n_events"]).all()


def test_curriculum_interleave_is_permutation(ray_session):
    from ocr_ray.ops.documents import curriculum_interleave

    df = _df(curriculum_interleave(SF))
    assert sorted(df["global_pos"]) == list(range(len(df)))
    # within one epoch_rank, sources appear in name order
    g = df.sort_values("global_pos").groupby("epoch_rank")["source"]
    assert all(list(s) == sorted(s) for _, s in g)


def test_bottomk_sketch_error_bound(ray_session):
    from ocr_ray.ops.documents import bottomk_quantile_sketch

    df = _df(bottomk_quantile_sketch(SF))
    assert list(df["q"]) == [50, 90, 99]
    assert (df["abs_err"] == (df["est"] - df["exact"]).abs()).all()
    # a 64-sample over 500 docs should land within the body of the
    # distribution — generous sanity bound, not a tight guarantee
    assert (df["abs_err"] <= df["exact"]).all()


def test_max_value_schedule_bounds(ray_session):
    import duckdb

    from ocr_ray.ops.relational import max_value_schedule

    df = _df(max_value_schedule(SF))
    # optimum is at most the sum of all values, at least the single best
    per_user = duckdb.sql(
        f"SELECT user_id, CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS tot, "
        f"MAX(CAST(round(value*100) AS BIGINT)) AS best "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY user_id"
    ).df().set_index("user_id")
    m = df.set_index("user_id")
    assert (m["best_value_cents"] <= per_user["tot"]).all()
    assert (m["best_value_cents"] >= per_user["best"]).all()


def test_source_cover_greedy_monotone(ray_session):
    from ocr_ray.ops.documents import COVER_K, source_cover_greedy

    df = _df(source_cover_greedy(SF))
    # stops early when coverage saturates (sf0.001's vocab is one-source)
    assert 1 <= len(df) <= COVER_K
    assert df["source"].is_unique
    # greedy gains are non-increasing (submodularity of coverage)
    assert df["new_words"].is_monotonic_decreasing
    assert (df["covered_total"] == df["new_words"].cumsum()).all()


def test_unique_prefix_disambiguates(ray_session):
    from ocr_ray.ops.documents import unique_prefix_lengths

    df = _df(unique_prefix_lengths(SF))
    assert df["word"].is_unique
    assert (df["prefix_len"] >= 1).all()
    assert (df["prefix_len"] <= df["word"].str.len()).all()
    # the prefixes of maximal (full-word) length aside, every shortened
    # prefix must be unique across the vocabulary
    short = df[df["prefix_len"] < df["word"].str.len()]
    prefixes = [w[:n] for w, n in zip(short["word"], short["prefix_len"])]
    assert len(prefixes) == len(set(prefixes))


def test_event_burstiness_positive(ray_session):
    from ocr_ray.ops.relational import event_burstiness

    df = _df(event_burstiness(SF))
    assert (df["fano"] >= 0).all()
    assert (df["n_events"] >= df["n_days"]).all()


def test_corpus_funnel_monotone(ray_session):
    from ocr_ray.ops.documents import corpus_funnel, training_corpus

    df = _df(corpus_funnel(SF)).sort_values("stage")
    assert df["n_docs"].is_monotonic_decreasing
    assert df["n_tokens"].is_monotonic_decreasing
    # the funnel's last stage IS the training_corpus row count
    assert df["n_docs"].iloc[-1] == len(_df(training_corpus(SF)))


def test_rich_club_monotone_shrink(ray_session):
    from ocr_ray.ops.graph import rich_club_coefficients

    df = _df(rich_club_coefficients(SF)).sort_values("k")
    # higher thresholds keep fewer nodes and fewer qualifying edges
    assert df["n_nodes"].is_monotonic_decreasing
    assert df["n_edges"].is_monotonic_decreasing
    assert ((df["phi"] >= 0) & (df["phi"] <= 1)).all()


def test_pareto_concentration_crossing(ray_session):
    from ocr_ray.ops.relational import PARETO_TARGET_PCT, pareto_concentration

    df = _df(pareto_concentration(SF))
    row = df.iloc[0]
    assert 1 <= row["n_top_customers"] <= row["n_customers"]
    assert row["revenue_share"] * 100 >= PARETO_TARGET_PCT
