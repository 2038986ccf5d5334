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
