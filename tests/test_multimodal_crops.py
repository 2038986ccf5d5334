"""Image-region crop stage (M9/W6): the worker must emit standalone PNG
payloads whose pixels are exactly the decoded page's slice at the reported
geometry. Pure-kernel test — the worker is a plain callable, no Ray."""

import random

import numpy as np
import pyarrow as pa

from ocr_ray.kernels import raster
from ocr_ray.ops.multimodal import CROP_SCHEMA, ImageCropWorker
from ocr_ray.synth import _page_tree


def _page_batch():
    tree = _page_tree(random.Random(17))
    png = raster.render_page_png(tree)
    return raster.png_decode(png), pa.Table.from_pylist(
        [{"url": "https://x.example/doc", "page_no": 0, "page_png": png}],
        schema=pa.schema(
            [pa.field("url", pa.string()), pa.field("page_no", pa.int32()),
             pa.field("page_png", pa.binary())]
        ),
    )


def test_crop_payloads_are_exact_pixel_slices():
    img, batch = _page_batch()
    out = ImageCropWorker()(batch)
    assert out.schema.equals(CROP_SCHEMA)
    assert out.num_rows >= 1, "a text page must yield at least one region"
    s = raster.PIXEL_SCALE
    for r in out.to_pylist():
        x0, y0 = int(r["l"]) // s, int(r["t"]) // s
        x1 = min(img.shape[1], -(-int(r["r"]) // s))
        y1 = min(img.shape[0], -(-int(r["b"]) // s))
        crop = raster.png_decode(r["crop_png"])
        assert crop.shape == (y1 - y0, x1 - x0)
        assert np.array_equal(crop, img[y0:y1, x0:x1])
        # every crop contains ink (it was clustered from corners)
        assert (crop < raster.BACKGROUND).any()


def test_crops_deterministic():
    _, batch = _page_batch()
    a = ImageCropWorker()(batch)
    b = ImageCropWorker()(batch)
    assert a.equals(b)


def test_undecodable_page_yields_no_crops():
    batch = pa.Table.from_pylist(
        [{"url": "u", "page_no": 0, "page_png": b"garbage-not-png"}],
        schema=pa.schema(
            [pa.field("url", pa.string()), pa.field("page_no", pa.int32()),
             pa.field("page_png", pa.binary())]
        ),
    )
    assert ImageCropWorker()(batch).num_rows == 0


# ------------------------------------------------------- perceptual dHash

def test_dhash64_known_gradient():
    from ocr_ray.ops.multimodal import dhash64

    # strictly right-darker gradient: every cell brighter than its right
    # neighbour -> all 64 bits set -> signed -1
    img = np.tile(np.arange(160, -20, -20, dtype=np.uint8).repeat(2), (16, 1))
    assert img.shape == (16, 18)
    assert dhash64(img) == -1
    # flat image: no bit set
    assert dhash64(np.full((16, 18), 200, np.uint8)) == 0


def test_dhash64_deterministic_and_locality():
    from ocr_ray.ops.multimodal import dhash64

    _, batch = _page_batch()
    img = raster.png_decode(batch.column("page_png")[0].as_py())
    h1, h2 = dhash64(img), dhash64(np.ascontiguousarray(img))
    assert h1 == h2
    # a small local retouch moves few bits; an unrelated page moves many
    smudged = img.copy()
    smudged[:8, :8] = 0
    d_small = bin((h1 ^ dhash64(smudged)) & ((1 << 64) - 1)).count("1")
    other = raster.render_page_png(_page_tree(random.Random(99)))
    d_far = bin((h1 ^ dhash64(raster.png_decode(other))) & ((1 << 64) - 1)).count("1")
    assert d_small <= 6
    assert d_far > d_small


def test_dhash_worker_identical_pages_collide():
    from ocr_ray.ops.multimodal import PageDhashWorker

    _, batch = _page_batch()
    png = batch.column("page_png")[0].as_py()
    two = pa.Table.from_pylist(
        [{"url": "https://a.example/x", "page_no": 0, "page_png": png},
         {"url": "https://b.example/y", "page_no": 0, "page_png": png}],
        schema=batch.schema,
    )
    out = PageDhashWorker()(two)
    assert out.num_rows == 2
    assert out.column("dhash")[0].as_py() == out.column("dhash")[1].as_py()
    # band columns are the 16-bit chunks of the unsigned hash
    u = out.column("dhash")[0].as_py() & ((1 << 64) - 1)
    for c in range(4):
        assert out.column(f"b{c}")[0].as_py() == (u >> (16 * c)) & 0xFFFF


def test_energy_islands_splits_runs():
    from ocr_ray.ops.multimodal import energy_islands

    idx = np.arange(8, dtype=np.int64)
    # mean = 50; active pattern: 1,1,0,1,0,0,1,1 -> islands [0,1],[3],[6,7]
    en = np.array([90, 80, 10, 70, 10, 10, 60, 70], dtype=np.int64)
    segs = energy_islands(idx, en)
    assert segs == [(0, 0, 1, 2, 170), (1, 3, 3, 1, 70), (2, 6, 7, 2, 130)]
    # a win_idx GAP between active windows also splits
    segs2 = energy_islands(np.array([0, 1, 3], dtype=np.int64),
                           np.array([100, 100, 100], dtype=np.int64))
    assert segs2 == [(0, 0, 1, 2, 200), (1, 3, 3, 1, 100)]


def test_crop_zip_bundles_deterministic_and_readable(ray_session, tmp_path):
    """W6 archival sink: bundle zips must be byte-identical across runs
    (fixed timestamps, sorted members, STORED), openable by the stdlib,
    and consistent with the crop_zip_bundles manifest query."""
    import hashlib
    import zipfile

    import pandas as pd

    from ocr_ray.ops.multimodal import write_crop_zips, crop_zip_bundles

    SF = "/root/testdata/sf0.001"
    out1 = tmp_path / "run1"
    out2 = tmp_path / "run2"
    m1 = write_crop_zips(SF, str(out1)).to_pandas().sort_values("bundle")
    m2 = write_crop_zips(SF, str(out2)).to_pandas().sort_values("bundle")
    assert len(m1) > 0
    # byte-determinism: same sha per bundle across independent runs
    pd.testing.assert_frame_equal(
        m1.reset_index(drop=True), m2.reset_index(drop=True))
    for _, row in m1.iterrows():
        path = out1 / f"crops-{int(row['bundle']):04d}.zip"
        data = path.read_bytes()
        assert hashlib.sha256(data).hexdigest() == row["zip_sha256"]
        assert len(data) == row["zip_bytes"]
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            assert len(names) == row["n_members"]
            assert names == sorted(names)
            assert all(n.endswith(".png") for n in names)
            # spot-check one member round-trips as a decodable PNG
            blob = zf.read(names[0])
            assert blob[:8] == b"\x89PNG\r\n\x1a\n"

    # the manifest query agrees on membership counts
    q = crop_zip_bundles(SF).to_pandas().sort_values("bundle")
    assert list(q["bundle"]) == list(m1["bundle"])
    assert list(q["n_members"]) == list(m1["n_members"])
