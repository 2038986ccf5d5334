"""Multimodal column plumbing: image/page payloads as opaque binary columns
with typed metadata, decode/feature/resize/frame-sample as actor-pool
map_batches stages.

The decode is REAL as of corpus v3: page payloads are genuine PNGs and the
features come from decoded pixels (width/height from the pixel array, word
metadata from pixel-template recognition — kernels.raster). Legacy FAKEIMG
fixtures still decode via their embedded hOCR; unknown raster formats
(JPEG/…: no codec in this container) raise into the error column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..extract_core import route
from ..kernels import raster
from ..kernels.hocr import parse_hocr
from ..sources.payloads import FAKEIMG_MAGIC, explode_pages
from .common import small_pool
from .extraction_queries import pages_corpus

FEATURE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("page_no", pa.int32()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_blocks", pa.int32()),
        pa.field("n_words", pa.int32()),
        pa.field("mean_conf", pa.float64()),
        pa.field("error", pa.string()),
    ]
)


def _decode_page_image(page: bytes) -> dict:
    """REAL decode: PNG bytes → pixel array → geometry from arr.shape, word
    metadata from pixel-template recognition. FAKEIMG fixtures (legacy
    corpora/tests) fall back to their embedded hOCR; other raster formats
    raise (no JPEG codec in this container)."""
    if page.startswith(FAKEIMG_MAGIC):
        tree = parse_hocr(page[len(FAKEIMG_MAGIC):].decode("utf-8"))
        words = [w for par in tree for line in par for w in line]
        width = int(max((w["box"][2] for w in words), default=0)) + 100
        height = int(max((w["box"][3] for w in words), default=0)) + 100
    else:
        img = raster.png_decode(page)  # raises for non-PNG payloads
        height, width = img.shape
        tree = raster.recognize_pixels(img)
        words = [w for par in tree for line in par for w in line]
    confs = [w["confidence"] for w in words]
    return {
        "width": width,
        "height": height,
        "n_blocks": len(tree),
        "n_words": len(words),
        "mean_conf": round(sum(confs) / len(confs), 4) if confs else 0.0,
    }


class ImageFeatureWorker:
    """Actor-pool stage: page binary → image features. State (a real decoder
    would hold codec contexts / model weights) is constructed once per actor."""

    def __init__(self, frame_stride: int = 1):
        self.frame_stride = frame_stride  # frame-sampling: keep every k-th page

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            if r["page_no"] % self.frame_stride != 0:
                continue
            rec = {"url": r["url"], "page_no": r["page_no"], "width": 0,
                   "height": 0, "n_blocks": 0, "n_words": 0, "mean_conf": 0.0,
                   "error": None}
            try:
                rec.update(_decode_page_image(r["page_png"]))
            except Exception as exc:  # noqa: BLE001
                rec["error"] = f"{type(exc).__name__}: {exc}"
            out.append(rec)
        return pa.Table.from_pylist(out, schema=FEATURE_SCHEMA)


def _explode_images(batch: pa.Table) -> pa.Table:
    out = []
    for r in batch.to_pylist():
        if route(r["html"]) != "ocr":
            continue
        try:
            pages = explode_pages(r["html"])
        except Exception:
            continue
        for page_no, page in enumerate(pages):
            out.append({"url": r["url"], "page_no": page_no, "page_png": page})
    return pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [pa.field("url", pa.string()), pa.field("page_no", pa.int32()),
             pa.field("page_png", pa.binary())]
        ),
    )


def page_image_features(sf_dir: str, frame_stride: int = 1) -> ray.data.Dataset:
    """OCR-branch payloads → per-page image features via the actor pool.
    Binary-heavy stage: small batch_size so batch × concurrency stays in
    worker heap (SURVEY.md §4 memory-aware)."""
    ds = ray.data.read_parquet(pages_corpus(sf_dir), columns=["url", "html"])
    ds = ds.map_batches(_explode_images, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        ImageFeatureWorker,
        fn_constructor_kwargs={"frame_stride": frame_stride},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=small_pool(),
        num_cpus=1,
    )


CROP_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("page_no", pa.int32()),
        pa.field("crop_idx", pa.int32()),
        pa.field("l", pa.float64()),
        pa.field("t", pa.float64()),
        pa.field("r", pa.float64()),
        pa.field("b", pa.float64()),
        pa.field("crop_png", pa.binary()),
    ]
)

# Synthetic page geometry in tree coordinates (A4 @ 300 dpi equivalent)
_PAGE_W_T = 2480.0
_PAGE_H_T = 3508.0


class ImageCropWorker:
    """M9/W6 parity: crop each layout-group region out of the DECODED page
    pixels and re-encode it as a standalone PNG (reference: celery_app.py
    :1062-1081 crops layout image boxes with PIL, export.py:132-146 zips
    them). Layout boxes come from the pixel-native corner detector; boxes
    arrive in tree coordinates and the crop COVERS the box (floor/ceil at
    pixel scale, same convention as raster.white_fill). Codec/kernel state
    is bound once per actor."""

    def __init__(self):
        from ..kernels import raster
        from ..kernels.layout import cv_layout_boxes_pixels

        self.raster = raster
        self.layout_boxes = cv_layout_boxes_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        s = self.raster.PIXEL_SCALE
        for r in batch.to_pylist():
            try:
                img = self.raster.png_decode(r["page_png"])
            except Exception:  # noqa: BLE001 — undecodable page: no crops
                continue
            h, w = img.shape
            boxes = self.layout_boxes(img, page_w=_PAGE_W_T, page_h=_PAGE_H_T)
            for idx, (left, top, right, bottom) in enumerate(boxes):
                x0 = max(0, int(left) // s)
                y0 = max(0, int(top) // s)
                x1 = min(w, -(-int(right) // s))
                y1 = min(h, -(-int(bottom) // s))
                if x1 <= x0 or y1 <= y0:
                    continue
                crop = self.raster.png_encode(np.ascontiguousarray(img[y0:y1, x0:x1]))
                out.append(
                    {"url": r["url"], "page_no": r["page_no"], "crop_idx": idx,
                     "l": float(left), "t": float(top), "r": float(right),
                     "b": float(bottom), "crop_png": crop}
                )
        return pa.Table.from_pylist(out, schema=CROP_SCHEMA)


def image_region_crops(sf_dir: str) -> ray.data.Dataset:
    """OCR-branch pages → cropped layout-region PNG payloads (the
    reference's saved image groups, M9/W6). Binary-heavy actor-pool stage:
    small batches so batch × concurrency stays in worker heap; downstream
    consumers (media dedup, export zips) read the `crop_png` column."""
    ds = ray.data.read_parquet(pages_corpus(sf_dir), columns=["url", "html"])
    ds = ds.map_batches(_explode_images, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        ImageCropWorker,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=small_pool(),
        num_cpus=1,
    )


def image_crops(sf_dir: str) -> ray.data.Dataset:
    """Driver-facing crop manifest: geometry + payload digest + size per
    cropped region — the blobs themselves stay out of the compare (the
    oracle recomputes the digest from the stored artifact payloads).
    ``crop_md5`` is md5 over the LOWERCASE-HEX encoding of the PNG bytes:
    DuckDB's md5() only accepts VARCHAR, so both sides hash
    ``lower(to_hex(payload))`` — still a pure function of the stored
    bytes."""
    import hashlib

    def digest(batch: pa.Table) -> pa.Table:
        crops = batch.column("crop_png").to_pylist()
        md5s = [hashlib.md5(c.hex().encode()).hexdigest() for c in crops]
        sizes = [len(c) for c in crops]
        t = batch.drop_columns(["crop_png"])
        return t.append_column("crop_md5", pa.array(md5s, pa.string())) \
                .append_column("n_bytes", pa.array(sizes, pa.int64()))

    return image_region_crops(sf_dir).map_batches(digest, batch_format="pyarrow")


def crop_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """media_exact_dedup over GENUINE image-region crops: exact dedup of
    the cropped payloads by digest — only 16-byte-hash rows cross the
    exchange, never the crop bytes. Keep rule: lexicographically smallest
    (url, page_no, crop_idx) key string."""
    import hashlib

    import pandas as pd

    from .common import grouped_agg

    def keyed(batch: pa.Table) -> pa.Table:
        crops = batch.column("crop_png").to_pylist()
        md5s = [hashlib.md5(c.hex().encode()).hexdigest() for c in crops]
        keys = [
            f"{u}#{p}#{i}"
            for u, p, i in zip(
                batch.column("url").to_pylist(),
                batch.column("page_no").to_pylist(),
                batch.column("crop_idx").to_pylist(),
            )
        ]
        return pa.table(
            {"crop_md5": pa.array(md5s, pa.string()),
             "crop_key": pa.array(keys, pa.string()),
             "n_bytes": pa.array([len(c) for c in crops], pa.int64())}
        )

    rows = image_region_crops(sf_dir).map_batches(keyed, batch_format="pyarrow")

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.sort_values("crop_md5").reset_index(drop=True)

    return grouped_agg(
        rows,
        keys=["crop_md5"],
        specs=[("keep_key", "min", "crop_key"), ("n_copies", "count", None),
               ("n_bytes", "max", "n_bytes")],
        finalize=fin,
    )


CROP_ZIP_BUNDLES = 16


def _crop_bundle_of(url: str) -> int:
    """Deterministic bundle id: the suite's md5-prefix hash mod bundle
    count — same expression the SQL twin runs, so the partition math is
    oracle-verifiable (zlib.crc32 has no DuckDB equivalent)."""
    import hashlib

    return int(hashlib.md5(url.encode()).hexdigest()[:16], 16) % CROP_ZIP_BUNDLES


def _crop_member_name(url: str, page_no: int, crop_idx: int) -> str:
    return f"{url}#p{page_no:04d}#c{crop_idx:02d}.png"


def _bundle_rows(sf_dir: str) -> ray.data.Dataset:
    def add_bundle(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        pages = batch.column("page_no").to_pylist()
        idxs = batch.column("crop_idx").to_pylist()
        return pa.table({
            "bundle": pa.array([_crop_bundle_of(u) for u in urls], pa.int64()),
            "member": pa.array(
                [_crop_member_name(u, p, i)
                 for u, p, i in zip(urls, pages, idxs)], pa.string()),
            "crop_png": batch.column("crop_png"),
        })

    return image_region_crops(sf_dir).map_batches(
        add_bundle, batch_format="pyarrow", zero_copy_batch=True)


def write_crop_zips(sf_dir: str, out_dir: str) -> pa.Table:
    """W6 archival packaging (reference export.py:132-146 zips the saved
    image groups): one DETERMINISTIC zip per bundle — members sorted by
    name, fixed 1980 timestamps, ZIP_STORED (PNG is already compressed),
    so re-runs are byte-identical and a resumed export can skip bundles
    whose files exist. Bundle count is fixed so bundle ids are a pure
    function of the url (resumable partitioning); at crawl scale raise
    CROP_ZIP_BUNDLES with the corpus, not per run.

    Returns the manifest (bundle, n_members, zip_bytes, zip_sha256)."""
    import hashlib
    import io
    import os
    import zipfile

    os.makedirs(out_dir, exist_ok=True)

    def build_zip(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group.column("member").to_pylist(),
                group.column("crop_png").to_pylist()))
        bundle = int(group.column("bundle")[0].as_py())
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
            for name, blob in rows:
                info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                zf.writestr(info, blob)
        data = buf.getvalue()
        path = os.path.join(out_dir, f"crops-{bundle:04d}.zip")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic: a crashed run never leaves a torn zip
        return pa.table({
            "bundle": pa.array([bundle], pa.int64()),
            "n_members": pa.array([len(rows)], pa.int64()),
            "zip_bytes": pa.array([len(data)], pa.int64()),
            "zip_sha256": pa.array(
                [hashlib.sha256(data).hexdigest()], pa.string()),
        })

    out = _bundle_rows(sf_dir).groupby("bundle").map_groups(
        build_zip, batch_format="pyarrow")
    from .common import small_table

    return small_table(out, pa.schema(
        [("bundle", pa.int64()), ("n_members", pa.int64()),
         ("zip_bytes", pa.int64()), ("zip_sha256", pa.string())]))


def crop_zip_bundles(sf_dir: str):
    """Driver-facing bundle manifest WITHOUT the zip assembly: per-bundle
    member count and total payload bytes — verifies the partition math
    (bundle hash, membership, sizes) against SQL over the crops artifact;
    the zip bytes themselves are pinned by the write_crop_zips pytest
    (byte-determinism + readability), which SQL cannot express.

    Output: (bundle, n_members, total_png_bytes) ordered by bundle."""
    rows = _bundle_rows(sf_dir)

    def sizes(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bundle": batch.column("bundle"),
            "n_bytes": pa.array(
                [len(c) for c in batch.column("crop_png").to_pylist()],
                pa.int64()),
        })

    from .common import grouped_agg, small_table

    def fin(df):
        return df.sort_values("bundle").reset_index(drop=True)

    out = grouped_agg(
        rows.map_batches(sizes, batch_format="pyarrow", zero_copy_batch=True),
        keys=["bundle"],
        specs=[("n_members", "count", None),
               ("total_png_bytes", "sum", "n_bytes")],
        finalize=fin,
    )
    return small_table(out, pa.schema(
        [("bundle", pa.int64()), ("n_members", pa.int64()),
         ("total_png_bytes", pa.int64())]))


def media_hash_rows(sf_dir: str) -> ray.data.Dataset:
    """Per OCR-branch record: md5 of the raw binary payload + its size —
    the per-record stage of media_exact_dedup and its oracle artifact
    (branch routing is the pytest-pinned Python kernel; the distributed
    rollup is what SQL recomputes)."""
    import hashlib

    from .common import clean_read_schema

    corpus = pages_corpus(sf_dir)
    import os as _os

    probe = _os.path.join(
        corpus, sorted(f for f in _os.listdir(corpus) if f.endswith(".parquet"))[0]
    )
    ds = ray.data.read_parquet(
        corpus, columns=["url", "warc_ts", "html"],
        schema=clean_read_schema(probe, ["url", "warc_ts", "html"]),
    )

    def rows(batch: pa.Table) -> pa.Table:
        ts_type = batch.schema.field("warc_ts").type
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        payloads = batch.column("html").to_pylist()
        cols: dict[str, list] = {"url": [], "warc_ts": [], "media_hash": [], "n_bytes": []}
        for i, data in enumerate(payloads):
            if route(data) != "ocr":
                continue
            cols["url"].append(urls[i])
            cols["warc_ts"].append(ts[i])
            cols["media_hash"].append(hashlib.md5(data).hexdigest())
            cols["n_bytes"].append(len(data))
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "warc_ts": pa.array(cols["warc_ts"], ts_type),
             "media_hash": pa.array(cols["media_hash"], pa.string()),
             "n_bytes": pa.array(cols["n_bytes"], pa.int64())}
        )

    return ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)


def media_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup of binary media payloads — the multimodal counterpart of
    documents exact_dedup. Only 16-byte hashes plus keys cross the exchange
    (never the binary); the combiner collapses each hash per block before
    the small groupby. Keep rule: lexicographically smallest url."""
    import pandas as pd

    from .common import grouped_agg

    def fin(df: "pd.DataFrame") -> "pd.DataFrame":
        return df.sort_values("media_hash").reset_index(drop=True)

    return grouped_agg(
        media_hash_rows(sf_dir).select_columns(["media_hash", "url", "n_bytes"]),
        keys=["media_hash"],
        specs=[("keep_url", "min", "url"), ("n_copies", "count", None),
               ("n_bytes", "max", "n_bytes")],
        finalize=fin,
    )


def page_pixel_stats(sf_dir: str) -> ray.data.Dataset:
    """Single-image OCR rows: DECODED pixel dimensions vs the stored PNG
    header. The query reports width/height from the pixel array (the full
    zlib-inflate + unfilter path in kernels.raster must agree with them) and
    the payload size; the SQL oracle independently re-reads width/height
    from the raw IHDR bytes of the stored payload — a genuine cross-check
    that the decode path reproduces the container's declared geometry.
    Shuffle shape: none (streaming map + distinct on url)."""
    from .common import clean_read_schema, distinct

    corpus = pages_corpus(sf_dir)
    import os as _os

    probe = _os.path.join(
        corpus, sorted(f for f in _os.listdir(corpus) if f.endswith(".parquet"))[0]
    )
    ds = ray.data.read_parquet(
        corpus, columns=["url", "html"],
        schema=clean_read_schema(probe, ["url", "html"]),
    )

    def stats(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        cols: dict[str, list] = {"url": [], "width": [], "height": [], "n_bytes": []}
        for i, data in enumerate(payloads):
            if not data.startswith(b"\x89PNG\r\n\x1a\n"):
                continue  # single-image rows only: containers hide the IHDR
            img = raster.png_decode(data)
            h, w = img.shape
            cols["url"].append(urls[i])
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_bytes"].append(len(data))
        return pa.table(
            {"url": pa.array(cols["url"], pa.string()),
             "width": pa.array(cols["width"], pa.int64()),
             "height": pa.array(cols["height"], pa.int64()),
             "n_bytes": pa.array(cols["n_bytes"], pa.int64())}
        )

    mapped = ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
    return distinct(mapped, ["url"], carry=["width", "height", "n_bytes"])


# ---------------------------------------------------- video frame sampling

FRAME_SAMPLE_STRIDE = 3


class FrameSampleWorker:
    """Actor-pool frame sampler: parse the VID0 container header, decode
    every FRAME_SAMPLE_STRIDE-th frame with the from-scratch PNG codec, and
    report per-frame geometry FROM THE DECODED PIXEL ARRAY (the oracle
    re-reads it from the stored IHDR bytes — decode is load-bearing, not
    decorative). mean_lum is the pixel-mean evidence the decode really ran;
    it is covered by pytest, not SQL (no inflate in DuckDB).

    Scale shape: one video's sampled frames never leave the task as pixels
    — only the fixed-width stat row per frame. Media bytes stream through
    the object store zero-copy; batches are small (VIDEO_BATCH) because
    rows are fat, the same sizing rule as the extraction stage."""

    def __init__(self, stride: int = FRAME_SAMPLE_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..synth_media import parse_video

        cols: dict[str, list] = {
            "vid_id": [], "frame_idx": [], "frame_off": [],
            "frame_bytes": [], "width": [], "height": [], "mean_lum": [],
            "lum_sum": [], "n_pix": [],
        }
        ids = batch.column("vid_id").to_pylist()
        for vid, media in zip(ids, batch.column("media").to_pylist()):
            frames = parse_video(media)
            for idx in range(0, len(frames), self.stride):
                off, ln = frames[idx]
                img = raster.png_decode(media[off:off + ln])
                cols["vid_id"].append(vid)
                cols["frame_idx"].append(idx)
                cols["frame_off"].append(off)
                cols["frame_bytes"].append(ln)
                cols["width"].append(img.shape[1])
                cols["height"].append(img.shape[0])
                cols["mean_lum"].append(round(float(img.mean()), 4))
                cols["lum_sum"].append(int(img.sum(dtype=np.int64)))
                cols["n_pix"].append(int(img.size))
        return pa.table(
            {"vid_id": pa.array(cols["vid_id"], pa.int64()),
             "frame_idx": pa.array(cols["frame_idx"], pa.int64()),
             "frame_off": pa.array(cols["frame_off"], pa.int64()),
             "frame_bytes": pa.array(cols["frame_bytes"], pa.int64()),
             "width": pa.array(cols["width"], pa.int64()),
             "height": pa.array(cols["height"], pa.int64()),
             "mean_lum": pa.array(cols["mean_lum"], pa.float64()),
             "lum_sum": pa.array(cols["lum_sum"], pa.int64()),
             "n_pix": pa.array(cols["n_pix"], pa.int64())}
        )


VIDEO_BATCH = 16


def videos_corpus(sf_dir: str) -> str:
    """Tier-sized deterministic videos fixture dir (documents rows // 50)."""
    from ..synth_media import VIDEOS_PER_DOC_ROWS, videos_dir_for
    from .extraction_queries import corpus_rows_for

    return videos_dir_for(max(10, corpus_rows_for(sf_dir) // VIDEOS_PER_DOC_ROWS))


def video_frame_sample(sf_dir: str) -> ray.data.Dataset:
    """Sampled-frame inventory over the videos table: per sampled frame its
    container offset/length plus geometry from the DECODED pixels. The SQL
    twin recomputes offset/length from the fixed-layout header and
    width/height from the IHDR bytes at that offset — an independent parse
    of the same payload. Shuffle shape: none (streaming actor-pool map);
    mean_lum is dropped here so every emitted column is oracle-checkable."""
    ds = ray.data.read_parquet(videos_corpus(sf_dir), columns=["vid_id", "media"])
    out = ds.map_batches(
        FrameSampleWorker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=VIDEO_BATCH,
        concurrency=small_pool(),
    )
    return out.drop_columns(["mean_lum", "lum_sum", "n_pix"])


# ------------------------------------------------------------ audio windows

AUDIO_WIN = 256


class AudioEnergyWorker:
    """Actor-pool audio feature extractor: parse the AUD0 container, decode
    the big-endian PCM16 payload, and emit per-window energy statistics —
    the windowed-RMS/VAD primitive of a speech-data pipeline. The SQL twin
    replays the fixture's closed-form sample formula in integer arithmetic,
    so the gate proves the engine really decoded the stored BYTES (a wrong
    endianness, offset, or length diverges immediately).

    Scale shape: audio bytes stream zero-copy through the object store and
    never leave the task — only fixed-width stat rows per window do. Small
    batches because rows are fat (same sizing rule as the video stage)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..synth_media import parse_audio

        cols: dict[str, list] = {
            "aud_id": [], "win_idx": [], "n": [], "energy": [], "peak": [],
        }
        ids = batch.column("aud_id").to_pylist()
        for aud, media in zip(ids, batch.column("media").to_pylist()):
            s = parse_audio(media)
            for w in range(0, len(s), AUDIO_WIN):
                win = s[w:w + AUDIO_WIN]
                cols["aud_id"].append(aud)
                cols["win_idx"].append(w // AUDIO_WIN)
                cols["n"].append(len(win))
                cols["energy"].append(int(np.sum(win.astype(np.int64) ** 2)))
                cols["peak"].append(int(np.max(np.abs(win))))
        return pa.table(
            {"aud_id": pa.array(cols["aud_id"], pa.int64()),
             "win_idx": pa.array(cols["win_idx"], pa.int64()),
             "n": pa.array(cols["n"], pa.int64()),
             "energy": pa.array(cols["energy"], pa.int64()),
             "peak": pa.array(cols["peak"], pa.int64())}
        )


def audios_corpus(sf_dir: str) -> str:
    """Tier-sized deterministic audio fixture dir (documents rows // 50)."""
    from ..synth_media import AUDIOS_PER_DOC_ROWS, audios_dir_for
    from .extraction_queries import corpus_rows_for

    return audios_dir_for(max(10, corpus_rows_for(sf_dir) // AUDIOS_PER_DOC_ROWS))


def audio_window_energy(sf_dir: str) -> ray.data.Dataset:
    """Per-window PCM energy/peak inventory over the audios table (all
    integer columns — every emitted value is oracle-exact). Shuffle shape:
    none (streaming actor-pool map)."""
    ds = ray.data.read_parquet(audios_corpus(sf_dir), columns=["aud_id", "media"])
    return ds.map_batches(
        AudioEnergyWorker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=VIDEO_BATCH,
        concurrency=small_pool(),
    )


# --------------------------------------------- perceptual image near-dedup

DHASH_GRID = 8           # 8x8 gradient grid -> 64-bit hash
# Pair-verification threshold. Rendered text pages share gross structure
# (line grid), so loose thresholds explode: measured on the sf0.01 corpus
# (~2.2k pages), hamming<=10 emits 147k pairs (67 per page — useless as a
# dedup signal) while <=2 keeps only visually-identical/near pages.
DHASH_MAX_HAMMING = 2
_MASK64 = (1 << 64) - 1


def dhash64(img: np.ndarray) -> int:
    """Difference hash (dHash) of a grayscale pixel array, integer-exact.

    The array is reduced to an (GRID, GRID+1) cell grid whose boundaries
    are ``(k*dim)//GRID`` (pure integer math, no resampling kernel); bit
    (i, j) is set iff cell (i, j) is brighter than cell (i, j+1), compared
    by cross-multiplied integer sums so cells of unequal area never need a
    float division. Returned as SIGNED two's-complement int64 — the form
    that rides Arrow exchanges (same convention as line_hash64)."""
    h, w = img.shape
    g = DHASH_GRID
    rb = (np.arange(g + 1, dtype=np.int64) * h) // g
    cb = (np.arange(g + 2, dtype=np.int64) * w) // (g + 1)
    # per-cell integer sums via a prefix-sum table (exact, vectorized)
    ps = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(img, axis=0, dtype=np.int64), axis=1, out=ps[1:, 1:])
    sums = (ps[rb[1:, None], cb[None, 1:]] - ps[rb[:-1, None], cb[None, 1:]]
            - ps[rb[1:, None], cb[None, :-1]] + ps[rb[:-1, None], cb[None, :-1]])
    areas = (rb[1:, None] - rb[:-1, None]) * (cb[None, 1:] - cb[None, :-1])
    bits = sums[:, :-1] * areas[:, 1:] > sums[:, 1:] * areas[:, :-1]
    val = 0
    for b in bits.ravel():
        val = (val << 1) | int(b)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


class PageDhashWorker:
    """Actor-pool stage: page PNG → (page_key, dhash, band values). Bands
    are the four 16-bit chunks of the hash, emitted as separate columns so
    the SQL twin never needs signed bit-shift gymnastics."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {"page_key": [], "dhash": [],
                                 "b0": [], "b1": [], "b2": [], "b3": []}
        urls = batch.column("url").to_pylist()
        pages = batch.column("page_no").to_pylist()
        for url, page_no, png in zip(urls, pages, batch.column("page_png").to_pylist()):
            try:
                img = raster.png_decode(png)
            except Exception:  # noqa: BLE001 — undecodable page: skip
                continue
            hv = dhash64(img)
            u = hv & _MASK64
            cols["page_key"].append(f"{url}#{page_no}")
            cols["dhash"].append(hv)
            for c in range(4):
                cols[f"b{c}"].append((u >> (16 * c)) & 0xFFFF)
        return pa.table(
            {"page_key": pa.array(cols["page_key"], pa.string()),
             "dhash": pa.array(cols["dhash"], pa.int64()),
             **{f"b{c}": pa.array(cols[f"b{c}"], pa.int64()) for c in range(4)}}
        )


def page_dhash_rows(sf_dir: str) -> ray.data.Dataset:
    """Per OCR-branch page: perceptual dHash over the DECODED pixels (the
    per-record stage of image_dhash_dups and its oracle artifact)."""
    ds = ray.data.read_parquet(pages_corpus(sf_dir), columns=["url", "html"])
    ds = ds.map_batches(_explode_images, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        PageDhashWorker,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=small_pool(),
        num_cpus=1,
    )


def image_dhash_dups(sf_dir: str) -> ray.data.Dataset:
    """Perceptual near-duplicate page pairs: dHash over decoded pixels,
    banded into four 16-bit chunks (the SimHash banding law applied to an
    IMAGE sketch), candidates sharing a chunk verified by Hamming ≤
    DHASH_MAX_HAMMING. This is the visual counterpart of media_exact_dedup:
    re-encoded or lightly-retouched page images collide here while their
    byte digests differ.

    Scale shape: pixels never cross an exchange — each page collapses to a
    16-byte sketch row in the decode actor pool; the band groupby moves
    4 rows/page; buckets are capped by the deterministic sorted-prefix rule
    (cap_bucket_members, truncation logged, same cap mirrored in the SQL
    twin); pair output is distinct-collapsed.

    Output: (key_a, key_b, hamming), key_a < key_b (order-insensitive)."""
    from .common import cap_bucket_members, distinct

    rows = page_dhash_rows(sf_dir)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {"chunk_key": [], "page_key": [], "dhash": []}
        keys = batch.column("page_key").to_pylist()
        hashes = batch.column("dhash").to_pylist()
        bands = [batch.column(f"b{c}").to_pylist() for c in range(4)]
        for i, k in enumerate(keys):
            for c in range(4):
                out["chunk_key"].append((c << 16) | int(bands[c][i]))
                out["page_key"].append(k)
                out["dhash"].append(hashes[i])
        return pa.table(
            {"chunk_key": pa.array(out["chunk_key"], pa.int64()),
             "page_key": pa.array(out["page_key"], pa.string()),
             "dhash": pa.array(out["dhash"], pa.int64())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows_ = sorted(group.to_pylist(), key=lambda r: r["page_key"])
        keep = cap_bucket_members(
            len(rows_), "dhash", rows_[0]["chunk_key"] if rows_ else None)
        rows_ = rows_[:keep]
        out: dict[str, list] = {"key_a": [], "key_b": [], "hamming": []}
        for i in range(len(rows_)):
            for j in range(i + 1, len(rows_)):
                if rows_[i]["page_key"] == rows_[j]["page_key"]:
                    continue
                d = bin((rows_[i]["dhash"] ^ rows_[j]["dhash"]) & _MASK64).count("1")
                if d <= DHASH_MAX_HAMMING:
                    out["key_a"].append(rows_[i]["page_key"])
                    out["key_b"].append(rows_[j]["page_key"])
                    out["hamming"].append(d)
        return pa.table(
            {"key_a": pa.array(out["key_a"], pa.string()),
             "key_b": pa.array(out["key_b"], pa.string()),
             "hamming": pa.array(out["hamming"], pa.int64())}
        )

    cands = rows.map_batches(chunk_rows, batch_format="pyarrow", zero_copy_batch=True)
    pairs = cands.groupby("chunk_key").map_groups(bucket_pairs, batch_format="pyarrow")
    return distinct(pairs, ["key_a", "key_b"], carry=["hamming"])


# --------------------------------------------------- audio VAD segments

# The gate is RELATIVE (window energy >= the recording's mean window
# energy, compared cross-multiplied in exact integers) — the fixture's
# closed-form PCM is a fixed-stride residue sweep whose window energies
# are nearly constant, so any absolute constant gates all-or-nothing;
# a per-recording relative gate is also what real VAD front-ends use
# (noise floors differ per recording).


def audio_speech_segments(sf_dir: str) -> ray.data.Dataset:
    """Voice-activity segmentation: threshold the per-window PCM energy and
    merge consecutive active windows into segments (the gaps-and-islands
    primitive every speech pipeline runs before transcription); a window is
    active iff its energy is >= the recording's mean window energy
    (cross-multiplied, exact integers). All-integer
    output — the SQL twin rebuilds the same windows from the container's
    closed-form samples and runs the textbook islands window query.

    Scale shape: windows group per aud_id (each group is one recording's
    window list — bounded by recording length, never corpus-sized); run
    detection is one vectorized pass per group; only segment rows leave.

    Output: (aud_id, seg_idx, start_win, end_win, n_windows, energy_sum)."""
    import numpy as np

    ds = ray.data.read_parquet(audios_corpus(sf_dir), columns=["aud_id", "media"])
    wins = ds.map_batches(
        AudioEnergyWorker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=VIDEO_BATCH,
        concurrency=small_pool(),
    )

    def segments(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values("win_idx")
        aud = int(df["aud_id"].iloc[0])
        rows = energy_islands(df["win_idx"].to_numpy(), df["energy"].to_numpy())
        cols: dict[str, list] = {
            "aud_id": [aud] * len(rows),
            "seg_idx": [r[0] for r in rows],
            "start_win": [r[1] for r in rows],
            "end_win": [r[2] for r in rows],
            "n_windows": [r[3] for r in rows],
            "energy_sum": [r[4] for r in rows],
        }
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    return wins.groupby("aud_id").map_groups(segments, batch_format="pyarrow")


def energy_islands(idx: np.ndarray, en: np.ndarray) -> list[tuple[int, int, int, int, int]]:
    """Gaps-and-islands over (win_idx, energy): active = energy*n >=
    sum(energy) (exact integers); consecutive active windows merge.
    Returns (seg_idx, start_win, end_win, n_windows, energy_sum) tuples.
    Module-level so the general multi-segment case is unit-testable (the
    synthetic audio fixture's energies drift smoothly, so it only ever
    produces one island per recording)."""
    active = en * len(en) >= int(en.sum())
    rows: list[tuple[int, int, int, int, int]] = []
    seg = 0
    i = 0
    n = len(idx)
    while i < n:
        if not active[i]:
            i += 1
            continue
        j = i
        while j + 1 < n and active[j + 1] and idx[j + 1] == idx[j] + 1:
            j += 1
        rows.append((seg, int(idx[i]), int(idx[j]), int(j - i + 1),
                     int(en[i:j + 1].sum())))
        seg += 1
        i = j + 1
    return rows


# ------------------------------------------------ video scene boundaries

SCENE_CUT_MLUM = 500  # cut when sampled-frame mean lum moves >= 0.5 levels


def frame_lum_rows(sf_dir: str) -> ray.data.Dataset:
    """Per sampled frame: exact integer luminance sums from the DECODED
    pixels — the per-record stage of video_scene_changes and its oracle
    artifact (no zlib inflate in SQL)."""
    ds = ray.data.read_parquet(videos_corpus(sf_dir), columns=["vid_id", "media"])
    out = ds.map_batches(
        FrameSampleWorker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=VIDEO_BATCH,
        concurrency=small_pool(),
    )
    return out.select_columns(["vid_id", "frame_idx", "lum_sum", "n_pix"])


def video_scene_changes(sf_dir: str) -> ray.data.Dataset:
    """Scene-change scan over the sampled frame stream: for every
    consecutive pair of SAMPLED frames of a video, the absolute jump in
    mean luminance, measured in exact integer milli-levels
    (``lum_sum*1000 // n_pix``, floor on both sides), and the cut verdict
    at SCENE_CUT_MLUM. The shot-boundary primitive of a video curation
    pipeline, on decoded pixel evidence.

    Scale shape: frames group per vid_id (bounded by one video's length);
    the delta scan is one vectorized pass per group; only pair rows leave
    the task. The SQL twin LAGs over the dumped per-frame integer sums.

    Output: (vid_id, prev_idx, frame_idx, delta_mlum, is_cut)."""
    rows = frame_lum_rows(sf_dir)

    def deltas(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas().sort_values("frame_idx")
        mlum = (df["lum_sum"].to_numpy() * 1000) // df["n_pix"].to_numpy()
        idx = df["frame_idx"].to_numpy()
        if len(idx) < 2:
            return pa.table(
                {"vid_id": pa.array([], pa.int64()),
                 "prev_idx": pa.array([], pa.int64()),
                 "frame_idx": pa.array([], pa.int64()),
                 "delta_mlum": pa.array([], pa.int64()),
                 "is_cut": pa.array([], pa.bool_())}
            )
        d = np.abs(np.diff(mlum)).astype(np.int64)
        vid = int(df["vid_id"].iloc[0])
        return pa.table(
            {"vid_id": pa.array([vid] * len(d), pa.int64()),
             "prev_idx": pa.array(idx[:-1], pa.int64()),
             "frame_idx": pa.array(idx[1:], pa.int64()),
             "delta_mlum": pa.array(d, pa.int64()),
             "is_cut": pa.array(d >= SCENE_CUT_MLUM)}
        )

    return rows.groupby("vid_id").map_groups(deltas, batch_format="pyarrow")


def _explode_images_ts(batch: pa.Table) -> pa.Table:
    """_explode_images plus the warc_ts crawl discriminator — zoning keys
    must separate re-crawled variants of the same url (their payloads, and
    hence geometry, differ)."""
    ts_type = batch.schema.field("warc_ts").type
    out = []
    for r in batch.to_pylist():
        if route(r["html"]) != "ocr":
            continue
        try:
            pages = explode_pages(r["html"])
        except Exception:
            continue
        for page_no, page in enumerate(pages):
            out.append({"url": r["url"], "warc_ts": r["warc_ts"],
                        "page_no": page_no, "page_png": page})
    return pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [pa.field("url", pa.string()), pa.field("warc_ts", ts_type),
             pa.field("page_no", pa.int32()), pa.field("page_png", pa.binary())]
        ),
    )


# ------------------------------------------- page zoning: words-in-blocks

ZONE_SCHEMA = pa.schema(
    [pa.field("url", pa.string()), pa.field("warc_ts", pa.string()),
     pa.field("page_no", pa.int32()),
     pa.field("block_idx", pa.int64()), pa.field("n_words", pa.int64())]
)


class PageZoneWorker:
    """Actor-pool zoning stage: decode the page once, derive BOTH the
    pixel-native layout blocks and the recognized word boxes, and assign
    each word to the first (reading-order) block containing its center —
    the within-page spatial join behind zone-aware text assembly (the
    reference routes OCR per layout box the same way). Orphan words (no
    containing block) count under block_idx = -1."""

    def __init__(self):
        from ..kernels import raster as _raster
        from ..kernels.layout import cv_layout_boxes_pixels

        self.raster = _raster
        self.layout_boxes = cv_layout_boxes_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[tuple, int] = {}
        for r in batch.to_pylist():
            try:
                img = self.raster.png_decode(r["page_png"])
            except Exception:  # noqa: BLE001 — undecodable page: skip
                continue
            boxes = self.layout_boxes(img, page_w=_PAGE_W_T, page_h=_PAGE_H_T)
            tree = self.raster.recognize_pixels(img)
            for par in tree:
                for line in par:
                    for w in line:
                        l, t, rr, b = w["box"]
                        cx, cy = (l + rr) / 2.0, (t + b) / 2.0
                        blk = -1
                        for i, (bl, bt, br, bb) in enumerate(boxes):
                            if bl <= cx <= br and bt <= cy <= bb:
                                blk = i
                                break
                        k = (r["url"], str(r["warc_ts"]), r["page_no"], blk)
                        out[k] = out.get(k, 0) + 1
        return pa.Table.from_pylist(
            [{"url": u, "warc_ts": t, "page_no": p, "block_idx": b,
              "n_words": n}
             for (u, t, p, b), n in out.items()],
            schema=ZONE_SCHEMA,
        )


def page_zone_inputs(sf_dir: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(word centers, layout boxes) per OCR page — the dumped inputs of
    block_word_counts' oracle (geometry derivation is pytest-pinned; the
    containment join + rollup is what SQL recomputes)."""
    ds = ray.data.read_parquet(
        pages_corpus(sf_dir), columns=["url", "warc_ts", "html"])
    pages = ds.map_batches(
        _explode_images_ts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    class Centers:
        def __init__(self):
            from ..kernels import raster as _raster

            self.raster = _raster

        def __call__(self, batch: pa.Table) -> pa.Table:
            cols: dict[str, list] = {"url": [], "warc_ts": [], "page_no": [],
                                     "wi": [], "cx": [], "cy": []}
            for r in batch.to_pylist():
                try:
                    img = self.raster.png_decode(r["page_png"])
                except Exception:  # noqa: BLE001
                    continue
                wi = 0
                for par in self.raster.recognize_pixels(img):
                    for line in par:
                        for w in line:
                            l, t, rr, b = w["box"]
                            cols["url"].append(r["url"])
                            cols["warc_ts"].append(str(r["warc_ts"]))
                            cols["page_no"].append(r["page_no"])
                            cols["wi"].append(wi)
                            wi += 1
                            cols["cx"].append((l + rr) / 2.0)
                            cols["cy"].append((t + b) / 2.0)
            return pa.table(
                {"url": pa.array(cols["url"], pa.string()),
                 "warc_ts": pa.array(cols["warc_ts"], pa.string()),
                 "page_no": pa.array(cols["page_no"], pa.int32()),
                 "wi": pa.array(cols["wi"], pa.int64()),
                 "cx": pa.array(cols["cx"], pa.float64()),
                 "cy": pa.array(cols["cy"], pa.float64())}
            )

    class Boxes:
        def __init__(self):
            from ..kernels import raster as _raster
            from ..kernels.layout import cv_layout_boxes_pixels

            self.raster = _raster
            self.layout_boxes = cv_layout_boxes_pixels

        def __call__(self, batch: pa.Table) -> pa.Table:
            cols: dict[str, list] = {
                "url": [], "warc_ts": [], "page_no": [], "block_idx": [],
                "l": [], "t": [], "r": [], "b": [],
            }
            for r in batch.to_pylist():
                try:
                    img = self.raster.png_decode(r["page_png"])
                except Exception:  # noqa: BLE001
                    continue
                boxes = self.layout_boxes(
                    img, page_w=_PAGE_W_T, page_h=_PAGE_H_T)
                for i, (bl, bt, br, bb) in enumerate(boxes):
                    cols["url"].append(r["url"])
                    cols["warc_ts"].append(str(r["warc_ts"]))
                    cols["page_no"].append(r["page_no"])
                    cols["block_idx"].append(i)
                    cols["l"].append(float(bl))
                    cols["t"].append(float(bt))
                    cols["r"].append(float(br))
                    cols["b"].append(float(bb))
            return pa.table(
                {"url": pa.array(cols["url"], pa.string()),
                 "warc_ts": pa.array(cols["warc_ts"], pa.string()),
                 "page_no": pa.array(cols["page_no"], pa.int32()),
                 "block_idx": pa.array(cols["block_idx"], pa.int64()),
                 "l": pa.array(cols["l"], pa.float64()),
                 "t": pa.array(cols["t"], pa.float64()),
                 "r": pa.array(cols["r"], pa.float64()),
                 "b": pa.array(cols["b"], pa.float64())}
            )

    centers = pages.map_batches(
        Centers, batch_format="pyarrow", batch_size=32,
        concurrency=small_pool(), num_cpus=1)
    boxes = pages.map_batches(
        Boxes, batch_format="pyarrow", batch_size=32,
        concurrency=small_pool(), num_cpus=1)
    return centers, boxes


def block_word_counts(sf_dir: str) -> ray.data.Dataset:
    """Word count per layout block per OCR page — the zoning rollup behind
    zone-aware assembly and column-detection QC, on fully pixel-native
    evidence (blocks from ink-corner clustering, words from template
    recognition, containment by word-center).

    Scale shape: one decode per page serves both geometry products inside
    a single actor; pages are independent (never a shuffle); only
    (url, page, block, count) rows leave. The SQL twin recomputes the
    containment join + rollup from the dumped centers/boxes.

    Output: (url, page_no, block_idx, n_words); orphans under -1."""
    from .common import grouped_agg

    ds = ray.data.read_parquet(
        pages_corpus(sf_dir), columns=["url", "warc_ts", "html"])
    pages = ds.map_batches(
        _explode_images_ts, batch_format="pyarrow", zero_copy_batch=True)
    rows = pages.map_batches(
        PageZoneWorker, batch_format="pyarrow", batch_size=32,
        concurrency=small_pool(), num_cpus=1)

    def fin(df):
        return df.sort_values(
            ["url", "warc_ts", "page_no", "block_idx"]).reset_index(drop=True)

    return grouped_agg(
        rows, keys=["url", "warc_ts", "page_no", "block_idx"],
        specs=[("n_words", "sum", "n_words")],
        finalize=fin,
    )


# -------------------------------------- ink connected-component labeling

# Page gate bounds the oracle's recursive-CTE closure (and is part of the
# query's definition, not a silent cap): only urls with crc32(url) %
# INK_DOC_MOD == 0 are labeled. Ink = pixel < raster.BACKGROUND, the
# corner_points convention.
INK_DOC_MOD = 16


class InkRunWorker:
    """Actor-pool stage: page PNG → horizontal ink runs (page_key, run_id,
    y, x0, x1). run_id is the row-major scan index — deterministic, so the
    dump and any rerun agree byte-for-byte."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        cols: dict[str, list] = {"page_key": [], "run_id": [],
                                 "y": [], "x0": [], "x1": []}
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        pages = batch.column("page_no").to_pylist()
        for url, ts, page_no, png in zip(urls, tss, pages,
                                         batch.column("page_png").to_pylist()):
            if zlib.crc32(url.encode()) % INK_DOC_MOD:
                continue
            try:
                img = raster.png_decode(png)
            except Exception:  # noqa: BLE001 — undecodable page: skip
                continue
            ink = img < raster.BACKGROUND
            # warc_ts in the key: re-crawled urls are DISTINCT pages (the
            # _explode_images_ts discipline — colliding keys would overlay
            # two crawls' runs under one labeling)
            key = f"{url}@{ts}#{page_no}"
            rid = 0
            for y in range(ink.shape[0]):
                row = ink[y]
                if not row.any():
                    continue
                # run boundaries from the 0-padded diff: starts at +1
                # transitions, ends at -1 transitions (exclusive)
                d = np.flatnonzero(np.diff(
                    np.concatenate(([0], row.view(np.int8), [0]))))
                for x0, x1 in zip(d[::2], d[1::2]):
                    cols["page_key"].append(key)
                    cols["run_id"].append(rid)
                    cols["y"].append(int(y))
                    cols["x0"].append(int(x0))
                    cols["x1"].append(int(x1) - 1)
                    rid += 1
        return pa.table(
            {"page_key": pa.array(cols["page_key"], pa.string()),
             "run_id": pa.array(cols["run_id"], pa.int64()),
             "y": pa.array(cols["y"], pa.int64()),
             "x0": pa.array(cols["x0"], pa.int64()),
             "x1": pa.array(cols["x1"], pa.int64())}
        )


def ink_run_rows(sf_dir: str) -> ray.data.Dataset:
    """Per gated OCR-branch page: horizontal ink runs over the DECODED
    pixels — the per-record stage of ink_components and its oracle
    artifact (the oracle recomputes the CONNECTIVITY independently from
    these runs with a recursive min-label closure in SQL)."""
    ds = ray.data.read_parquet(
        pages_corpus(sf_dir), columns=["url", "warc_ts", "html"])
    ds = ds.map_batches(_explode_images_ts, batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.map_batches(
        InkRunWorker,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=small_pool(),
        num_cpus=1,
    )


def label_runs(runs: list[tuple[int, int, int, int]]) -> list[int]:
    """4-connected component labels for row-major (run_id-ordered) ink
    runs (y, x0, x1, run_id triples as produced by InkRunWorker): classic
    run-based two-pass union-find; two runs connect iff on adjacent rows
    with overlapping column spans. Returns the component id (min run_id
    in the component) per run, in input order."""
    parent = list(range(len(runs)))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            if ri > rj:
                ri, rj = rj, ri
            parent[rj] = ri

    # rows are contiguous in run_id order; two-pointer over adjacent rows
    from collections import defaultdict

    by_row: dict[int, list[int]] = defaultdict(list)
    for idx, (y, _x0, _x1, _rid) in enumerate(runs):
        by_row[y].append(idx)
    for y, idxs in by_row.items():
        nxt = by_row.get(y + 1)
        if not nxt:
            continue
        # interval-intersection merge: both rows ascend in x0 (run_id is
        # row-major), advance whichever run ends first
        i = j = 0
        while i < len(idxs) and j < len(nxt):
            _, ax0, ax1, _ = runs[idxs[i]]
            _, bx0, bx1, _ = runs[nxt[j]]
            if ax1 >= bx0 and bx1 >= ax0:
                union(idxs[i], nxt[j])
            if ax1 <= bx1:
                i += 1
            else:
                j += 1
    # canonical label = min run_id in the component (root after
    # min-directed unions)
    return [runs[find(i)][3] for i in range(len(runs))]


def ink_components(sf_dir: str) -> ray.data.Dataset:
    """Connected ink components per gated OCR page — the glyph/blob count
    a layout engine sanity-checks segmentation against (a page whose
    component count collapses to 1 is a scan artifact; thousands of
    1-pixel components are noise).

    Scale shape: pixels collapse to run rows inside the decode actor pool
    (never cross an exchange); labeling is per-page union-find over the
    page's runs inside map_groups — each group is one page, bounded by
    page area. The SQL oracle recomputes connectivity INDEPENDENTLY: a
    run-adjacency self-join plus a recursive min-label closure over the
    dumped runs.

    Output: (page_key, n_runs, n_components, largest_px) per gated page,
    ordered by page_key."""

    rows = ink_run_rows(sf_dir)

    def per_page(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values("run_id")
        runs = list(zip(df["y"].astype(int), df["x0"].astype(int),
                        df["x1"].astype(int), df["run_id"].astype(int)))
        labels = label_runs(runs)
        from collections import defaultdict

        size: dict[int, int] = defaultdict(int)
        for (y, x0, x1, _rid), lab in zip(runs, labels):
            size[lab] += x1 - x0 + 1
        return pa.table(
            {"page_key": pa.array([df["page_key"].iloc[0]], pa.string()),
             "n_runs": pa.array([len(runs)], pa.int64()),
             "n_components": pa.array([len(size)], pa.int64()),
             "largest_px": pa.array([max(size.values())], pa.int64())}
        )

    return rows.groupby("page_key").map_groups(
        per_page, batch_format="pyarrow").sort("page_key")


def video_keyframes(sf_dir: str) -> ray.data.Dataset:
    """Keyframe selection over the sampled frame stream: frames split
    into scenes at the video_scene_changes cut points (a frame whose
    luminance jump from its predecessor reaches SCENE_CUT_MLUM starts a
    new scene), and each scene contributes its MIDDLE sampled frame
    (lower ordinal median — the standard position-based keyframe rule,
    exact and resolution-free). The thumbnail/dedup representative
    every video curation pipeline extracts per shot.

    Scale shape: frames group per vid_id (bounded by one video's
    length); scene ids are one vectorized cumsum of cut flags; only one
    row per scene leaves the task. The SQL twin LAGs + window-sums over
    the dumped per-frame integer sums.

    Output: (vid_id, scene_id, n_frames, key_frame_idx, key_mlum)
    ordered by (vid_id, scene_id)."""
    rows = frame_lum_rows(sf_dir)

    def keyframes(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas().sort_values("frame_idx")
        mlum = (df["lum_sum"].to_numpy() * 1000) // df["n_pix"].to_numpy()
        idx = df["frame_idx"].to_numpy()
        if len(idx) == 0:
            return pa.table(
                {"vid_id": pa.array([], pa.int64()),
                 "scene_id": pa.array([], pa.int64()),
                 "n_frames": pa.array([], pa.int64()),
                 "key_frame_idx": pa.array([], pa.int64()),
                 "key_mlum": pa.array([], pa.int64())}
            )
        cut = np.zeros(len(idx), dtype=np.int64)
        if len(idx) > 1:
            cut[1:] = (np.abs(np.diff(mlum)) >= SCENE_CUT_MLUM).astype(np.int64)
        scene = np.cumsum(cut)
        vid = int(df["vid_id"].iloc[0])
        out: dict[str, list[int]] = {k: [] for k in
                                     ("scene_id", "n_frames",
                                      "key_frame_idx", "key_mlum")}
        for sc in np.unique(scene):
            sel = np.flatnonzero(scene == sc)
            k = sel[(len(sel) + 1) // 2 - 1]  # lower ordinal median
            out["scene_id"].append(int(sc))
            out["n_frames"].append(len(sel))
            out["key_frame_idx"].append(int(idx[k]))
            out["key_mlum"].append(int(mlum[k]))
        n = len(out["scene_id"])
        return pa.table(
            {"vid_id": pa.array([vid] * n, pa.int64()),
             "scene_id": pa.array(out["scene_id"], pa.int64()),
             "n_frames": pa.array(out["n_frames"], pa.int64()),
             "key_frame_idx": pa.array(out["key_frame_idx"], pa.int64()),
             "key_mlum": pa.array(out["key_mlum"], pa.int64())}
        )

    return rows.groupby("vid_id").map_groups(
        keyframes, batch_format="pyarrow").sort(["vid_id", "scene_id"])
