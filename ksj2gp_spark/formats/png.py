"""Minimal PNG codec (stdlib zlib + numpy) — no PIL in this environment.

Supports 8-bit grayscale (color type 0) and RGB (color type 2), which is
all the deterministic image fixtures need. Encoder writes filter-0 rows;
decoder handles all five standard row filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    pass


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode(arr: np.ndarray) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 array to PNG bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
        flat = arr.reshape(h, w * 1)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = arr.shape[:2]
        flat = arr.reshape(h, w * 3)
    else:
        raise PngError(f"unsupported array shape: {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per row
    raw = np.empty((h, flat.shape[1] + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = flat
    idat = zlib.compress(raw.tobytes(), 6)
    del channels
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode(buf: bytes) -> np.ndarray:
    """Decode PNG bytes to an HxW or HxWx3 uint8 array."""
    if buf[:8] != _SIG:
        raise PngError("not a PNG file")
    pos = 8
    width = height = None
    color_type = None
    idat = []
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or color_type not in (0, 2):
                raise PngError(
                    f"unsupported PNG: depth={depth} color_type={color_type}"
                )
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            del comp, filt
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    channels = 1 if color_type == 0 else 3
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = cur
        elif ftype == 2:  # Up
            rec = cur + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    pred = int(
                        _paeth(
                            np.array([left]), np.array([up]), np.array([ul])
                        )[0]
                    )
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    if channels == 1:
        return out
    return out.reshape(height, width, 3)
