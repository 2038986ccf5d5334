"""Video frame-sample stage: the VID0 container kernel (pure, no Ray), the
worker's decoded-pixel evidence (mean_lum must come from real pixels), and
the distributed query's agreement with a local re-parse."""

import numpy as np
import pyarrow as pa

from ocr_ray.kernels import raster
from ocr_ray.ops.multimodal import FRAME_SAMPLE_STRIDE, FrameSampleWorker
from ocr_ray.synth_media import (
    encode_video, frame_pixels, n_frames_for, parse_video,
)


def test_vid0_container_roundtrip():
    for vid in (0, 3, 11):
        data = encode_video(vid)
        frames = parse_video(data)
        assert len(frames) == n_frames_for(vid)
        for idx, (off, ln) in enumerate(frames):
            img = raster.png_decode(data[off:off + ln])
            assert (img == frame_pixels(vid, idx)).all()


def test_vid0_parse_rejects_bad_payloads():
    import pytest

    with pytest.raises(ValueError):
        parse_video(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError):
        parse_video(encode_video(2)[:-3])  # truncated last frame


def test_frame_sample_worker_decodes_real_pixels():
    vid = 5
    batch = pa.table(
        {"vid_id": pa.array([vid], pa.int64()),
         "media": pa.array([encode_video(vid)], pa.binary())}
    )
    out = FrameSampleWorker()(batch)
    idxs = out.column("frame_idx").to_pylist()
    assert idxs == list(range(0, n_frames_for(vid), FRAME_SAMPLE_STRIDE))
    for row in out.to_pylist():
        img = frame_pixels(vid, row["frame_idx"])
        assert (row["width"], row["height"]) == (img.shape[1], img.shape[0])
        assert row["mean_lum"] == round(float(img.mean()), 4)


def test_video_frame_sample_query(ray_session):
    from ocr_ray.ops.multimodal import video_frame_sample

    rows = video_frame_sample("/root/testdata/sf0.001").take_all()
    assert rows, "sampled frames expected"
    by_vid: dict[int, list] = {}
    for r in rows:
        by_vid.setdefault(r["vid_id"], []).append(r)
    for vid, rs in by_vid.items():
        assert len(rs) == -(-n_frames_for(vid) // FRAME_SAMPLE_STRIDE)
