"""Multimodal column operators — image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The container has no imaging/audio libraries, so the *codec* layer is the
deterministic stand-in from functions/imagecodec.py (real PIL is picked up
automatically when present) and the audio/video decoders are explicit
NotImplementedError stubs — but the Ray-side plumbing (schemas, actor
signatures, batch sizing for wide binary rows, output layout) is real and
tested, per the build brief.

Batch-size note: image rows are wide (binary payload). Stages here default to
small batch_size so batch × concurrency stays inside a worker heap; callers
tune per payload size."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import hashing, imagecodec


class ImageDecodeStats:
    """Actor-pool stage: decode → per-image stats (mean RGB, recomputed
    phash).  ``__init__`` is where a real pipeline loads its codec/model
    once per actor."""

    def __init__(self):
        self.decode = imagecodec.decode  # real-codec swap point (PIL if present)

    def __call__(self, t: pa.Table) -> pa.Table:
        means, phashes, ok = [], [], []
        for blob in t.column("bytes").to_pylist():
            try:
                px = self.decode(blob)
                means.append([float(m) for m in px.reshape(-1, 3).mean(axis=0)])
                phashes.append(hashing.phash64(px))
                ok.append(True)
            except imagecodec.CodecError:
                means.append([0.0, 0.0, 0.0])
                phashes.append(0)
                ok.append(False)
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "mean_rgb": pa.array(means, pa.list_(pa.float64(), 3)),
                "phash": pa.array(phashes, pa.int64()),
                "decoded": pa.array(ok, pa.bool_()),
            }
        )


class ImageResize:
    """Actor-pool stage: mean-pool resize to (side × side), re-encode in the
    original format.  Output keeps the IMAGES payload shape."""

    def __init__(self, side: int = 64):
        self.side = side

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs, ws, hs = [], [], []
        for blob, fmt in zip(t.column("bytes").to_pylist(), t.column("fmt").to_pylist()):
            px = imagecodec.decode(blob)
            gray_rgb = np.stack(
                [_pool(px[:, :, c], self.side) for c in range(3)], axis=2
            ).astype(np.uint8)
            blobs.append(imagecodec.encode(gray_rgb, fmt))
            hs.append(self.side)
            ws.append(self.side)
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": t.column("fmt"),
                "caption": t.column("caption"),
            }
        )


def _pool(chan: np.ndarray, side: int) -> np.ndarray:
    from ..functions.hashing import _mean_pool

    return np.clip(_mean_pool(chan, side), 0, 255)


class AudioFeatureStub:
    """STUB: audio decode/feature-extract.  No audio stack in this container —
    raises NotImplementedError at decode, but the stage signature, schema and
    actor wiring are the production shape."""

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decoding requires an audio library not present in this "
            "environment; swap in soundfile/librosa and emit "
            "(clip_id, sr, duration_s, mfcc:list<float>)"
        )


class VideoFrameSampleStub:
    """STUB: video frame sampling — same contract as AudioFeatureStub."""

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decoding requires pyav/ffmpeg not present in this "
            "environment; swap in a decoder and emit one row per sampled "
            "frame (video_id, frame_idx, ts_ms, bytes)"
        )


def image_stats(images_path: str) -> rd.Dataset:
    from .. import storage

    ds = storage.read_parquet_clean(images_path, columns=["image_id", "bytes"])
    return ds.map_batches(
        ImageDecodeStats, batch_format="pyarrow", batch_size=64, concurrency=2, num_cpus=1
    )


def image_resize(images_path: str, side: int = 64) -> rd.Dataset:
    from .. import storage

    ds = storage.read_parquet_clean(images_path, columns=["image_id", "bytes", "fmt", "caption"])
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"side": side},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=1,
    )
