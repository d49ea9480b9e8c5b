"""Image codec lane: encode/decode, PSNR, perceptual hash, resize.

The input-table contract (BASELINE input_hint) carries images as opaque
``bytes`` with ``fmt`` ∈ {"png", "jpeg"}. This environment has no image
libraries (no PIL/libjpeg), so both codecs are from scratch:

* ``png`` is a real PNG codec (formats/png.py, stdlib zlib).
* ``jpeg`` is a real baseline JFIF codec (formats/jpeg.py — numpy DCT,
  Annex-K quantization + Huffman tables). Encoding uses quality 98,
  which holds the PSNR≥40dB lossy invariant with margin even on the
  synthetic fixtures' pathological sawtooth chroma (measured: min
  42.9 dB across fixture shapes; q96 dips to 37 dB). Round-2 bytes
  behind the legacy 4-byte ``FJPG`` magic (PNG-backed stand-in) still
  decode for back-compat with previously-written tables.

All functions operate on numpy arrays and are called from pandas UDFs
over whole Arrow batches.
"""

from __future__ import annotations

import numpy as np

from . import jpeg, png

FAKE_JPEG_MAGIC = b"FJPG"
JPEG_QUALITY = 98


class ImageError(ValueError):
    pass


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    if fmt == "png":
        return png.encode(arr)
    if fmt == "jpeg":
        return jpeg.encode(arr, quality=JPEG_QUALITY)
    raise ImageError(f"unsupported format: {fmt}")


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png.decode(bytes(buf))
    if fmt == "jpeg":
        b = bytes(buf)
        if b.startswith(FAKE_JPEG_MAGIC):
            # legacy round-2 stand-in bytes (PNG behind a magic)
            return png.decode(b[len(FAKE_JPEG_MAGIC) :])
        return jpeg.decode(b)
    raise ImageError(f"unsupported format: {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def resize_block_mean(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-style resize via index-mapped block means."""
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape[:2]
    ys = (np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w / out_w).astype(np.int64)
    out_shape = (out_h, out_w) + arr.shape[2:]
    out = np.empty(out_shape, dtype=np.float64)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = arr[y0:y1, x0:x1].mean(axis=(0, 1))
    return out


def phash64(arr: np.ndarray) -> int:
    """64-bit mean-threshold perceptual hash (8×8 block-mean, row-major
    bit order), returned as signed int64 for Spark LongType."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    small = resize_block_mean(arr, 8, 8)
    bits = (small > small.mean()).astype(np.uint64).ravel()
    # MSB-first packing, vectorized (each term is a distinct bit).
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    val = (bits << shifts).sum(dtype=np.uint64)
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def make_test_image(
    seed: int, h: int, w: int, rgb: bool = True
) -> np.ndarray:
    """Deterministic synthetic image: seeded gradient + pattern."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (xx * 255 // max(w - 1, 1))
        + (yy * 255 // max(h - 1, 1)) * (seed % 3 + 1)
        + seed * 37
    )
    if rgb:
        r = base % 256
        g = (base * 3 + seed) % 256
        b = (base * 7 + seed * 11) % 256
        return np.stack([r, g, b], axis=2).astype(np.uint8)
    return (base % 256).astype(np.uint8)
