"""Deterministic synthetic VIDEO fixture for the multimodal frame-sample
stage (the one modality TESTDATA carries no table for; per the driver brief
the input is synthesized at small scale — same policy as the pages corpus,
FIXTURES.md §1).

Container format (from scratch, byte-addressable so a SQL oracle can parse
it without a codec):

    b"VID0" | u32be n_frames | n_frames x u32be frame_len | frames...

Every frame is an 8-bit grayscale PNG from kernels.raster.png_encode, so
frame offsets/lengths live in the fixed-layout header and each frame's
geometry lives in its IHDR at a computable byte offset — both reachable
from DuckDB via hex()/substr arithmetic (the page_pixel_stats trick).
Pixel content is a deterministic per-(video, frame) gradient; no RNG state,
so any row can be regenerated independently (the property that makes the
fixture shardable at scale)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .kernels import raster

VID_MAGIC = b"VID0"
# videos per corpus tier: documents_rows // 50 (sf0.001 -> 20, sf0.01 -> 200)
VIDEOS_PER_DOC_ROWS = 50


def n_frames_for(vid: int) -> int:
    """6..25 frames, deterministic per video id."""
    return 6 + (vid * 7919) % 20


def frame_pixels(vid: int, f: int) -> np.ndarray:
    """Per-(video, frame) gradient; frame geometry varies per video so the
    decode path sees more than one shape."""
    w = 32 + (vid % 3) * 16
    h = 24 + (vid % 2) * 16
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 5 + vid * 11 + f * 17) % 251).astype(np.uint8)


def encode_video(vid: int) -> bytes:
    frames = [raster.png_encode(frame_pixels(vid, f))
              for f in range(n_frames_for(vid))]
    head = VID_MAGIC + struct.pack(">I", len(frames))
    head += b"".join(struct.pack(">I", len(fr)) for fr in frames)
    return head + b"".join(frames)


def parse_video(data: bytes) -> list[tuple[int, int]]:
    """-> [(frame_off, frame_len), ...]; raises on a non-VID0 payload."""
    if data[:4] != VID_MAGIC:
        raise ValueError("not a VID0 payload")
    (n,) = struct.unpack(">I", data[4:8])
    lens = struct.unpack(f">{n}I", data[8:8 + 4 * n])
    out = []
    off = 8 + 4 * n
    for ln in lens:
        out.append((off, ln))
        off += ln
    if off != len(data):
        raise ValueError("frame table does not cover the payload")
    return out


def videos_table(n_videos: int) -> pa.Table:
    return pa.table(
        {"vid_id": pa.array(range(n_videos), pa.int64()),
         "media": pa.array([encode_video(v) for v in range(n_videos)],
                           pa.binary()),
         "n_frames": pa.array([n_frames_for(v) for v in range(n_videos)],
                              pa.int32())}
    )


def videos_dir_for(n_videos: int, base: str = "/tmp/ocr_ray_videos") -> str:
    """Cached deterministic fixture dir (atomic rename, same idiom as
    synth.pages_dir_for); tiny enough to build driver-side."""
    out = os.path.join(base, str(n_videos))
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(videos_table(n_videos), os.path.join(tmp, "videos.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # concurrent builder won
    return out


# ------------------------------------------------------------------- audio

AUD_MAGIC = b"AUD0"
AUDIOS_PER_DOC_ROWS = 50
AUDIO_RATE = 8000


def n_samples_for(aud: int) -> int:
    """800..1599 samples, deterministic per clip id (forces a partial tail
    window in the energy op for most clips)."""
    return 800 + (aud * 7919) % 800


def sample_value(aud: int, i: int) -> int:
    """Closed-form PCM sample in [-2000, 2000] — the formula the SQL oracle
    replays with integer arithmetic, so the engine's DECODE of the stored
    bytes is what the correctness gate actually tests."""
    return (aud * 37 + i * 31 + 17) % 4001 - 2000


def encode_audio(aud: int) -> bytes:
    """b"AUD0" | u32be n_samples | u32be sample_rate | n x s16be PCM."""
    n = n_samples_for(aud)
    head = AUD_MAGIC + struct.pack(">II", n, AUDIO_RATE)
    body = struct.pack(f">{n}h", *(sample_value(aud, i) for i in range(n)))
    return head + body


def parse_audio(data: bytes) -> np.ndarray:
    """-> int32 sample array; raises on a non-AUD0 payload."""
    if data[:4] != AUD_MAGIC:
        raise ValueError("not an AUD0 payload")
    n, _rate = struct.unpack(">II", data[4:12])
    if len(data) != 12 + 2 * n:
        raise ValueError("sample count does not cover the payload")
    return np.frombuffer(data, dtype=">i2", offset=12).astype(np.int32)


def audios_table(n_audios: int) -> pa.Table:
    return pa.table(
        {"aud_id": pa.array(range(n_audios), pa.int64()),
         "media": pa.array([encode_audio(a) for a in range(n_audios)],
                           pa.binary()),
         "n_samples": pa.array([n_samples_for(a) for a in range(n_audios)],
                               pa.int32())}
    )


def audios_dir_for(n_audios: int, base: str = "/tmp/ocr_ray_audios") -> str:
    """Cached deterministic fixture dir (same atomic-rename idiom as
    videos_dir_for)."""
    out = os.path.join(base, str(n_audios))
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(audios_table(n_audios), os.path.join(tmp, "audios.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # concurrent builder won
    return out
