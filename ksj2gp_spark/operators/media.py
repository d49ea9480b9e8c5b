"""Audio/video multimodal lanes — opaque binary columns with typed
metadata, processed in Arrow-batched ``mapInPandas`` (the image lane's
pattern, operators/images.py, extended to the other modalities the
training-data mandate names).

What is REAL here (and tested): the Spark plumbing — schemas, batch
shapes, vectorized kernels — plus genuine decoding of two formats this
container can handle without external libraries:

* ``wav`` — RIFF/PCM via the stdlib ``wave`` module (true decode, not
  a stub): sample extraction, RMS/peak, duration verification.
* ``pngv`` — a deterministic frame container defined here (header +
  length-prefixed PNG frames, decoded by formats/png.py): frame
  sampling (every k-th), per-frame mean luminance.

What is STUBBED (clearly): compressed codecs (mp3/aac/h264/mp4...)
raise ``NotImplementedError`` — no codec libraries exist in this
environment. The dispatch, error-lane behavior, and schemas are the
production surface; swapping in a real decoder touches only
``_decode_audio_bytes`` / ``_iter_video_frames``.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..formats import png

_PNGV_MAGIC = b"PNGV"


# --------------------------------------------------------------------------
# container codecs (driver- and UDF-usable, pure Python)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float [-1, 1] mono → 16-bit PCM WAV bytes (stdlib)."""
    pcm = np.clip(samples, -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def _decode_audio_bytes(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """→ (float samples, sample_rate). Real for 'wav'; compressed
    formats are NOT implemented in this environment."""
    if fmt == "wav":
        with wave.open(io.BytesIO(data), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            if w.getsampwidth() != 2:
                raise ValueError(f"unsupported WAV width {w.getsampwidth()}")
            ints = np.frombuffer(raw, dtype="<i2")
            if w.getnchannels() > 1:
                ints = ints.reshape(-1, w.getnchannels()).mean(axis=1)
        return ints.astype(np.float64) / 32767.0, rate
    raise NotImplementedError(
        f"audio codec {fmt!r}: no codec library in this environment "
        "(plumbing is real; plug a decoder in _decode_audio_bytes)"
    )


def encode_pngv(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Grayscale uint8 frames → PNGV container (magic, fps, count,
    then length-prefixed PNG-encoded frames)."""
    out = [_PNGV_MAGIC, struct.pack("<HI", fps, len(frames))]
    for f in frames:
        buf = png.encode(np.ascontiguousarray(f, dtype=np.uint8))
        out.append(struct.pack("<I", len(buf)))
        out.append(buf)
    return b"".join(out)


def _iter_video_frames(data: bytes, fmt: str):
    """Yield (frame_idx, grayscale ndarray). Real for 'pngv'."""
    if fmt == "pngv":
        if data[:4] != _PNGV_MAGIC:
            raise ValueError("bad PNGV magic")
        fps, n = struct.unpack_from("<HI", data, 4)
        off = 10
        for i in range(n):
            (ln,) = struct.unpack_from("<I", data, off)
            off += 4
            arr = png.decode(data[off : off + ln])
            off += ln
            if arr.ndim == 3:
                arr = arr.mean(axis=2)
            yield i, arr
        return
    raise NotImplementedError(
        f"video codec {fmt!r}: no codec library in this environment "
        "(plumbing is real; plug a decoder in _iter_video_frames)"
    )


def pngv_fps(data: bytes) -> int:
    return struct.unpack_from("<HI", data, 4)[0]


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "media_id string, n_samples long, sample_rate int, duration_ok boolean, "
    "rms double, peak double, decode_error string"
)


def audio_features(df: DataFrame) -> DataFrame:
    """(media_id, bytes, fmt, duration_ms) → per-clip features; decode
    failures land in the error lane, never crash the job."""

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    samples, rate = _decode_audio_bytes(
                        bytes(r["bytes"]), r["fmt"]
                    )
                    dur_ms = int(round(len(samples) / rate * 1000))
                    rows.append(
                        (
                            r["media_id"],
                            len(samples),
                            rate,
                            abs(dur_ms - int(r["duration_ms"])) <= 1,
                            float(np.sqrt(np.mean(samples**2)))
                            if len(samples)
                            else 0.0,
                            float(np.abs(samples).max()) if len(samples) else 0.0,
                            None,
                        )
                    )
                except (NotImplementedError, ValueError, EOFError, wave.Error) as ex:
                    rows.append(
                        (r["media_id"], 0, 0, False, 0.0, 0.0, f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "sample_rate", "duration_ok",
                    "rms", "peak", "decode_error",
                ],
            )

    return df.select("media_id", "bytes", "fmt", "duration_ms").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = (
    "media_id string, frame_idx int, h int, w int, mean_luma double, "
    "decode_error string"
)


def sample_frames(df: DataFrame, every_k: int = 5) -> DataFrame:
    """Video frame sampling: every k-th frame decoded → per-frame rows
    (media_id, frame_idx, h, w, mean_luma)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    for i, frame in _iter_video_frames(
                        bytes(r["bytes"]), r["fmt"]
                    ):
                        if i % every_k:
                            continue
                        rows.append(
                            (
                                r["media_id"],
                                i,
                                frame.shape[0],
                                frame.shape[1],
                                float(frame.mean()),
                                None,
                            )
                        )
                except (NotImplementedError, ValueError) as ex:
                    rows.append(
                        (r["media_id"], -1, 0, 0, 0.0, f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "h", "w", "mean_luma",
                    "decode_error",
                ],
            )

    return df.select("media_id", "bytes", "fmt").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )
