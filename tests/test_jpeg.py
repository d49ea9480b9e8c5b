"""From-scratch baseline JFIF codec (formats/jpeg.py).

The golden test hand-assembles a minimal JPEG byte stream from the
T.81 spec (markers + canonical Huffman codes computed by hand) and
asserts the exact decoded pixels — independent of the encoder, so an
encode/decode round-trip cannot hide a symmetric bug.
"""

import struct

import numpy as np
import pytest

from ksj2gp_spark.formats import jpeg
from ksj2gp_spark.formats.imagecodec import make_test_image, psnr


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _golden_single_block() -> bytes:
    """8x8 grayscale, quant table all 16s, single DC coefficient +4.

    Entropy bits, derived by hand from the Annex-K DC/AC luminance
    tables' canonical code assignment:
      DC size=3   -> code 100 (3 bits)
      amplitude 4 -> 100 (3 bits)
      AC EOB      -> code 1010 (4 bits)
    = 1001001010 + 6 pad 1s = 0x92 0xBF.
    Decoded: DC coeff 4*16=64, IDCT constant 64/8=8, +128 = 136.
    """
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = (
        bytes([0x00]) + bytes(jpeg.DC_LUM_BITS) + bytes(jpeg.DC_LUM_VALS)
        + bytes([0x10]) + bytes(jpeg.AC_LUM_BITS) + bytes(jpeg.AC_LUM_VALS)
    )
    out += _seg(0xC4, dht)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([0x92, 0xBF])
    out += b"\xff\xd9"
    return bytes(out)


def test_golden_byte_stream_decodes_exactly():
    arr = jpeg.decode(_golden_single_block())
    assert arr.shape == (8, 8)
    assert np.array_equal(arr, np.full((8, 8), 136, dtype=np.uint8))


def _smooth_image(h, w):
    """Smooth gradients (no mod-256 sawtooth): chroma subsampling must
    reproduce these nearly exactly, so 4:2:0 tests measure upsampling
    correctness instead of content pathology."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 200 / max(w - 1, 1) + 20).astype(np.uint8)
    g = (yy * 180 / max(h - 1, 1) + 40).astype(np.uint8)
    b = ((xx + yy) * 100 / max(h + w - 2, 1) + 80).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((64, 64), {}),
        ((64, 64, 3), {}),
        ((64, 64, 3), {"subsample": "420"}),
        ((65, 67, 3), {}),
        ((8, 9, 3), {}),
        ((1, 1), {}),
        ((48, 40, 3), {"subsample": "420", "restart_interval": 1}),
        ((64, 64, 3), {"restart_interval": 2}),
    ],
)
def test_roundtrip_shapes(shape, kw):
    rgb = len(shape) == 3
    if kw.get("subsample") == "420":
        arr = _smooth_image(shape[0], shape[1])
        floor = 35.0
    else:
        arr = make_test_image(sum(shape), shape[0], shape[1], rgb=rgb)
        floor = 30.0
    dec = jpeg.decode(jpeg.encode(arr, **kw))
    assert dec.shape == arr.shape
    assert psnr(arr, dec) >= floor


def test_quality_monotonic_and_40db_at_98():
    arr = make_test_image(2, 32, 32)
    p = [
        psnr(arr, jpeg.decode(jpeg.encode(arr, quality=q)))
        for q in (50, 75, 90, 98)
    ]
    assert p == sorted(p), f"PSNR not monotonic in quality: {p}"
    assert p[-1] >= 40.0
    sizes = [len(jpeg.encode(arr, quality=q)) for q in (50, 98)]
    assert sizes[0] < sizes[1]  # lower quality compresses harder


def test_gray_roundtrip_high_fidelity():
    arr = make_test_image(3, 40, 56, rgb=False)
    assert psnr(arr, jpeg.decode(jpeg.encode(arr, quality=98))) >= 45.0


def test_progressive_rejected():
    # same golden stream but with SOF2 (progressive) instead of SOF0
    buf = bytearray(_golden_single_block())
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(jpeg.JpegError, match="baseline"):
        jpeg.decode(bytes(buf))


def test_truncation_and_garbage_rejected():
    good = jpeg.encode(make_test_image(4, 16, 16))
    with pytest.raises(jpeg.JpegError):
        jpeg.decode(good[:20])
    with pytest.raises(jpeg.JpegError):
        jpeg.decode(b"not a jpeg at all")


def test_restart_interval_equals_no_restart():
    # DRI only changes the container framing, not the pixels
    arr = make_test_image(5, 32, 24)
    a = jpeg.decode(jpeg.encode(arr, quality=90))
    b = jpeg.decode(jpeg.encode(arr, quality=90, restart_interval=1))
    assert np.array_equal(a, b)


def test_stuffed_bytes_survive():
    # find an encode whose scan contains a stuffed 0xFF00 to prove the
    # reader handles it (quality 100 keeps many large coefficients)
    for seed in range(40):
        arr = make_test_image(seed, 24, 24)
        buf = jpeg.encode(arr, quality=100)
        scan = buf[buf.find(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            dec = jpeg.decode(buf)
            assert psnr(arr, dec) >= 45.0
            return
    pytest.skip("no stuffed byte produced in 40 seeds")
