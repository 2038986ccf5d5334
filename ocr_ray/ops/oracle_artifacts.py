"""Side-dump artifacts that give the extraction-derived queries real
DuckDB oracles.

The driver's correctness gate runs each Ray query next to an ANSI-SQL
recomputation. The extraction pipeline itself has no SQL equivalent, so the
check is decomposed per stage (round-1 verdict "Next round #1"): the Ray
side dumps each UPSTREAM stage once as parquet, and the oracle SQL
recomputes the DOWNSTREAM stage (dedup, merge, concatenation, aggregation,
placement math) from that dump — verifying the distributed part of every
query against DuckDB while pytest goldens pin the per-document kernels.

Artifacts (all under /tmp, keyed by corpus + code fingerprint so any code
change regenerates them):

- ``prededup/``    the UNDEDUPED extraction rows (run before the sink's
                   latest-wins dedup) — extract_summary's oracle recomputes
                   the dedup with a QUALIFY row_number() window;
- ``word_pages/``  per-(url, page_ord, word) counts — word_index/index_csv
                   oracles recompute the cross-page merge + CSV rendering;
- ``page_texts/``  per-(url, page_ord) assembled text — txt_delimited /
                   search_index_docs oracles recompute the concatenation /
                   record shaping;
- ``ocr_spans/``   per-word (url, page, word, l, r, b) geometry —
                   pdf_text_layer's oracle recomputes the placement math;
- ``planes.parquet``    the LSH hyperplane bank (plane, dim, w);
- ``ivf.parquet`` + ``ivf_probe.parquet``  the trained IVF centroids and
                   per-query probe lists (deterministic k-means on the
                   first-2048 sample, computed directly from the
                   embeddings parquet with numpy — no Ray involved).

``ensure_artifacts`` is invoked from ``oracle_sql()`` so the artifacts
exist no matter in which order the driver materializes queries vs oracles.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_ROOT = "/tmp/ocr_ray_oracle"

# Artifact-landing lockfile: max wait for a live holder, and the age past
# which a lock is presumed orphaned by a dead process and broken.
LOCK_STALE_S = 600.0


def _artifact_dir(sf_dir: str) -> str:
    from .extraction_queries import _code_fingerprint, pages_corpus

    corpus = pages_corpus(sf_dir)
    return os.path.join(
        ORACLE_ROOT, f"{os.path.basename(corpus)}-{_code_fingerprint()}"
    )


def ensure_artifacts(sf_dir: str) -> dict[str, str]:
    """Create (once) and return the artifact paths for this tier.

    Concurrency-safe: the build runs in a process-private staging dir and
    lands via one atomic ``os.rename``, so two processes racing (a sweep
    and an ad-hoc oracle build — the round-5 edit1_pairs corruption, where
    both appended parquet files into the same word_pages/ and doubled
    every count) can never interleave writes; the loser discards its
    staging copy."""
    import shutil

    root = _artifact_dir(sf_dir)
    done_marker = os.path.join(root, "_DONE")
    if os.path.exists(done_marker):
        return _artifact_paths(root)
    stage = f"{root}.building.{os.getpid()}"
    try:
        _build_artifacts(sf_dir, stage)
        with open(os.path.join(stage, "_DONE"), "w") as f:
            f.write("ok")
    except BaseException:
        # a crashed build must not leak a multi-GB staging dir
        shutil.rmtree(stage, ignore_errors=True)
        raise
    # Land under an O_EXCL lockfile: a COMPLETE root always carries _DONE
    # (written in staging BEFORE the rename) and is NEVER touched; a
    # marker-less root is a legacy/corrupt leftover and is replaced only
    # while holding the lock, so no check-then-act window remains (the
    # residual TOCTOU of the first rename-aside design — two builders
    # racing a corrupt root could delete each other's fresh landing).
    # A holder that dies leaves a stale lock, broken after LOCK_STALE_S.
    import time

    lock_path = f"{root}.lock"
    deadline = time.time() + LOCK_STALE_S
    fd = None
    while fd is None:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(lock_path) > LOCK_STALE_S:
                    os.unlink(lock_path)
                    continue
            except OSError:
                continue  # holder just released/broke it; retry open
            if os.path.exists(done_marker):
                # the holder landed a complete root; ours is redundant
                shutil.rmtree(stage, ignore_errors=True)
                return _artifact_paths(root)
            if time.time() > deadline:
                shutil.rmtree(stage, ignore_errors=True)
                raise RuntimeError(
                    f"timed out waiting for artifact lock {lock_path}")
            time.sleep(0.5)
    try:
        if os.path.exists(done_marker):
            shutil.rmtree(stage, ignore_errors=True)
        else:
            if os.path.isdir(root):  # marker-less: corrupt, safe under lock
                aside = f"{root}.corrupt.{os.getpid()}"
                os.rename(root, aside)
                shutil.rmtree(aside, ignore_errors=True)
            os.rename(stage, root)
    finally:
        os.close(fd)
        try:
            os.unlink(lock_path)
        except OSError:
            pass
    return _artifact_paths(root)


def _artifact_paths(root: str) -> dict[str, str]:
    return {
        "prededup": os.path.join(root, "prededup"),
        "word_pages": os.path.join(root, "word_pages"),
        "page_texts": os.path.join(root, "page_texts"),
        "ocr_spans": os.path.join(root, "ocr_spans"),
        "summary": os.path.join(root, "summary"),
        "naive_lines": os.path.join(root, "naive_lines"),
        "media_hashes": os.path.join(root, "media_hashes"),
        "crops": os.path.join(root, "crops"),
        "page_dhash": os.path.join(root, "page_dhash"),
        "ink_runs": os.path.join(root, "ink_runs"),
        "doc_compress": os.path.join(root, "doc_compress"),
        "frame_lums": os.path.join(root, "frame_lums"),
        "knn_edges": os.path.join(root, "knn_edges"),
        "word_centers": os.path.join(root, "word_centers"),
        "layout_boxes": os.path.join(root, "layout_boxes"),
        "planes": os.path.join(root, "planes.parquet"),
        "ivf": os.path.join(root, "ivf.parquet"),
        "ivf_probe": os.path.join(root, "ivf_probe.parquet"),
    }


def _build_artifacts(sf_dir: str, root: str) -> None:
    """Write every artifact into ``root`` (a staging dir — see
    ensure_artifacts for the atomic landing)."""
    paths = _artifact_paths(root)
    os.makedirs(root, exist_ok=True)

    from . import extraction_queries as xq

    # -- prededup: extraction WITHOUT the sink dedup (wire cols minus spans)
    from ..pipelines.extract import extract_dataset, read_pages

    ds = read_pages(xq.pages_corpus(sf_dir))
    pre = extract_dataset(ds).drop_columns(["spans_bin"])
    pre.write_parquet(paths["prededup"])

    # -- per-page stages
    xq.word_index_pages(sf_dir).write_parquet(paths["word_pages"])
    xq.page_texts_dump(sf_dir).write_parquet(paths["page_texts"])

    # -- per-word geometry of OCR-branch docs
    out = xq.extraction_output(sf_dir, columns=["url", "spans", "error", "branch"])

    def spans_rows(batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        offsets = spans_col.offsets.to_numpy()
        flat = spans_col.flatten()
        texts = flat.field("text").to_pylist()
        box_np = flat.field("box").flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
        b_np = flat.field("b").to_numpy(zero_copy_only=False)
        conf_np = flat.field("conf").to_numpy(zero_copy_only=False)
        pages_np = flat.field("page").to_numpy(zero_copy_only=False)
        urls = batch.column("url").to_pylist()
        ok = pa.compute.is_null(batch.column("error")).to_pylist()
        branch = batch.column("branch").to_pylist()
        base = offsets[0]
        cols = {"url": [], "page": [], "word": [], "l": [], "r": [], "b": [],
                "conf": []}
        for i, url in enumerate(urls):
            if not ok[i] or branch[i] != "ocr":
                continue
            for j in range(offsets[i] - base, offsets[i + 1] - base):
                cols["url"].append(url)
                cols["page"].append(int(pages_np[j]))
                cols["word"].append(texts[j])
                cols["l"].append(float(box_np[j, 0]))
                cols["r"].append(float(box_np[j, 2]))
                cols["b"].append(float(b_np[j]))
                cols["conf"].append(int(conf_np[j]))
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "page": pa.array(cols["page"], pa.int32()),
             "word": pa.array(cols["word"], pa.string()),
             "l": pa.array(cols["l"], pa.float64()),
             "r": pa.array(cols["r"], pa.float64()),
             "b": pa.array(cols["b"], pa.float64()),
             "conf": pa.array(cols["conf"], pa.int64())}
        )

    out.map_batches(spans_rows, batch_format="pyarrow").write_parquet(paths["ocr_spans"])

    # -- a flat copy of the committed extraction output minus spans, so SQL
    # can read the non-error url universe + text/branch without nested cols
    xq.extract_summary(sf_dir).write_parquet(paths["summary"])

    # -- naive visible lines per page record — boilerplate_line_dedup's
    # oracle recomputes the count+filter+reassembly from this dump
    xq.naive_page_lines(sf_dir).write_parquet(paths["naive_lines"])

    # -- per-record media payload hashes — media_exact_dedup's oracle
    # recomputes the grouped rollup from this dump
    from . import multimodal as mm

    mm.media_hash_rows(sf_dir).write_parquet(paths["media_hashes"])

    # -- cropped layout-region PNG payloads (M9/W6) — the image_crops /
    # crop_exact_dedup oracles recompute digests and rollups from the
    # stored blobs themselves
    mm.image_region_crops(sf_dir).write_parquet(paths["crops"])

    # -- per-page perceptual dHash rows — image_dhash_dups' oracle
    # recomputes the band bucketing + capped pair verification from this
    mm.page_dhash_rows(sf_dir).write_parquet(paths["page_dhash"])

    # -- per-page horizontal ink runs — ink_components' oracle recomputes
    # the CONNECTIVITY from this dump (run-adjacency join + recursive
    # min-label closure; the pixel decode itself has no SQL form)
    mm.ink_run_rows(sf_dir).write_parquet(paths["ink_runs"])

    # -- per-doc zlib sizes — compression_ratio_stats' oracle recomputes
    # the per-source rollup from this dump (zlib has no SQL form)
    from .documents import doc_compression_rows

    doc_compression_rows(sf_dir).write_parquet(paths["doc_compress"])

    # -- per-sampled-frame integer luminance sums — video_scene_changes'
    # oracle LAGs over this dump (no inflate in SQL)
    mm.frame_lum_rows(sf_dir).write_parquet(paths["frame_lums"])

    # -- symmetrized mutual-kNN edges — label_propagation_classify's
    # oracle unrolls the propagation rounds over this dump
    from .embeddings import knn_edge_rows

    knn_edge_rows(sf_dir).write_parquet(paths["knn_edges"])

    # -- per-page word centers + layout boxes — block_word_counts' oracle
    # recomputes the containment join + rollup from these dumps
    centers, boxes = mm.page_zone_inputs(sf_dir)
    centers.write_parquet(paths["word_centers"])
    boxes.write_parquet(paths["layout_boxes"])

    # -- LSH plane bank
    from .embeddings import lsh_planes

    planes = lsh_planes()
    n_planes, dim = planes.shape
    pq.write_table(
        pa.table(
            {"plane": pa.array(np.repeat(np.arange(n_planes), dim), pa.int32()),
             "dim": pa.array(np.tile(np.arange(1, dim + 1), n_planes), pa.int32()),
             "w": pa.array(planes.ravel(), pa.float64())}
        ),
        os.path.join(root, "planes.parquet"),
    )

    # -- IVF centroids + probe lists (mirror ann_ivf_topk's training exactly,
    # numpy-only off the parquet)
    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.asarray(emb.column("vec_id").to_pylist())
    order = np.argsort(ids, kind="stable")
    from .embeddings import _kmeans

    sample = mat[:2048]
    centroids = _kmeans(sample, 16)
    q_ids = ids[order][:8]
    qmat = mat[order][:8]
    qd = ((qmat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :4]
    n_cells, dim = centroids.shape
    pq.write_table(
        pa.table(
            {"cell": pa.array(np.repeat(np.arange(n_cells), dim), pa.int32()),
             "dim": pa.array(np.tile(np.arange(1, dim + 1), n_cells), pa.int32()),
             "w": pa.array(centroids.ravel(), pa.float64())}
        ),
        os.path.join(root, "ivf.parquet"),
    )
    pq.write_table(
        pa.table(
            {"query_id": pa.array(np.repeat(q_ids, 4).astype(np.int64), pa.int64()),
             "cell": pa.array(probe.ravel(), pa.int32())}
        ),
        os.path.join(root, "ivf_probe.parquet"),
    )
