"""Deterministic audio/video codec — the container has no soundfile/pyav.

Companion to ``imagecodec.py``: audio clips and video clips ride the pipeline
as opaque ``binary`` columns with typed metadata (the multimodal-column
contract from the build brief).  Real decoders are unavailable here, so this
module implements clearly-marked deterministic stand-in containers with the
properties the pipeline needs — self-describing headers, exact round-trip,
and enough structure (sample rate, frame timestamps) for the feature /
frame-sampling stages to be real computations:

- audio — ``b"AUD0" + sr:uint32le + n:uint32le + int16le PCM mono``
- video — ``b"VID0" + w:uint16le + h:uint16le + fps:uint16le +
  nframes:uint16le + nframes × raw (h, w, 3) uint8 RGB``

When a real media stack is present (``soundfile`` for audio, ``av`` for
video), ``decode_audio``/``decode_video`` transparently fall through to it —
gated behind an import-try, so production swaps in real codecs with zero
pipeline changes.  The Ray-side plumbing (schema, actor signature, batch
sizing for wide binary rows, one-row-per-frame output layout) is identical
either way.
"""

from __future__ import annotations

import io

import numpy as np

try:  # pragma: no cover - not in this container
    import soundfile  # type: ignore

    HAVE_SOUNDFILE = True
except ImportError:
    soundfile = None
    HAVE_SOUNDFILE = False

try:  # pragma: no cover - not in this container
    import av  # type: ignore

    HAVE_AV = True
except ImportError:
    av = None
    HAVE_AV = False

_AUD_MAGIC = b"AUD0"
_VID_MAGIC = b"VID0"


class CodecError(ValueError):
    pass


# ---------------------------------------------------------------- audio


def encode_audio(pcm: np.ndarray, sr: int) -> bytes:
    """Encode mono int16 PCM. Deterministic: same samples+sr → same bytes."""
    if pcm.dtype != np.int16 or pcm.ndim != 1:
        raise CodecError(f"expected 1-D int16 PCM, got {pcm.shape} {pcm.dtype}")
    return (
        _AUD_MAGIC
        + int(sr).to_bytes(4, "little")
        + len(pcm).to_bytes(4, "little")
        + pcm.astype("<i2").tobytes()
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to (mono int16 PCM, sample_rate).  Falls through to
    ``soundfile`` for real containers when available."""
    if bytes(data[:4]) == _AUD_MAGIC:  # buffer-safe
        sr = int.from_bytes(data[4:8], "little")
        n = int.from_bytes(data[8:12], "little")
        pcm = np.frombuffer(data[12 : 12 + 2 * n], dtype="<i2")
        if len(pcm) != n:
            raise CodecError("truncated audio payload")
        return pcm, sr
    if HAVE_SOUNDFILE:  # pragma: no cover - not in this container
        wav, sr = soundfile.read(io.BytesIO(data), dtype="int16", always_2d=True)
        return wav[:, 0].copy(), int(sr)
    raise CodecError(f"unknown audio container (magic {bytes(data[:4])!r})")


# ---------------------------------------------------------------- video


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    """Encode (nframes, h, w, 3) uint8 RGB. Deterministic."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise CodecError(f"expected (n,h,w,3) uint8, got {frames.shape} {frames.dtype}")
    n, h, w = frames.shape[:3]
    if max(n, h, w, fps) > 0xFFFF:
        raise CodecError("dimension exceeds uint16 container field")
    return (
        _VID_MAGIC
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
        + int(fps).to_bytes(2, "little")
        + int(n).to_bytes(2, "little")
        + frames.tobytes()
    )


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to ((nframes, h, w, 3) uint8 RGB, fps).  Falls through to
    ``av`` (pyav/ffmpeg) for real containers when available."""
    if bytes(data[:4]) == _VID_MAGIC:  # buffer-safe
        w = int.from_bytes(data[4:6], "little")
        h = int.from_bytes(data[6:8], "little")
        fps = int.from_bytes(data[8:10], "little")
        n = int.from_bytes(data[10:12], "little")
        body = np.frombuffer(data[12:], dtype=np.uint8)
        if body.size != n * h * w * 3:
            raise CodecError("truncated video payload")
        return body.reshape(n, h, w, 3), fps
    if HAVE_AV:  # pragma: no cover - not in this container
        with av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            frames = np.stack(
                [f.to_ndarray(format="rgb24") for f in container.decode(stream)]
            )
            return frames, int(stream.average_rate or 0)
    raise CodecError(f"unknown video container (magic {bytes(data[:4])!r})")


# ------------------------------------------------- deterministic synthesis


def synth_audio(clip_id: int, sr: int = 8000) -> bytes:
    """Deterministic test clip: two sines + seeded noise, 0.25–1.0 s."""
    rng = np.random.default_rng(0xA0D10 + clip_id)
    n = int(sr * (0.25 + (clip_id % 4) * 0.25))
    t = np.arange(n) / sr
    f1, f2 = 110.0 * (1 + clip_id % 7), 440.0 * (1 + clip_id % 3)
    wave = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    wave += 0.05 * rng.standard_normal(n)
    pcm = np.clip(wave * 20000, -32768, 32767).astype(np.int16)
    return encode_audio(pcm, sr)


def synth_video(video_id: int, w: int = 16, h: int = 16, fps: int = 10) -> bytes:
    """Deterministic test clip: a moving gradient, 8–29 frames."""
    n = 8 + (video_id * 7) % 22
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = (xx * 16 + i * 11 + video_id) % 256
        frames[i, :, :, 1] = (yy * 16 + i * 5) % 256
        frames[i, :, :, 2] = (xx + yy + i * 23) % 256
    return encode_video(frames, fps)
