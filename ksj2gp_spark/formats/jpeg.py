"""From-scratch baseline JPEG (JFIF) codec — pure numpy + stdlib.

The container has no libjpeg/PIL, but baseline sequential JPEG (ITU-T
T.81) is public knowledge: 8×8 DCT, Annex-K quantization + Huffman
tables, zigzag run-length entropy coding. This module implements both
directions so the image lane's PSNR≥40dB north-star invariant
(BASELINE input_hint) runs against REAL lossy bytes instead of the
round-2 deterministic stand-in:

* ``encode(arr, quality=95, subsample="444")`` → JFIF bytes (SOI/APP0/
  DQT/SOF0/DHT/SOS/EOI, optional DRI restart intervals). Grayscale and
  RGB; 4:4:4 or 4:2:0 chroma.
* ``decode(buf)`` → uint8 array. Baseline (SOF0/SOF1), 8-bit, 1- or
  3-component, any sampling factors ≤ 2×2, restart markers, stuffed
  bytes; progressive (SOF2) and arithmetic coding are rejected with a
  typed :class:`JpegError` (quarantined, not a crash).

All block math (color transform, DCT/IDCT, quantization, zigzag) is
vectorized over every block in the image at once; only the entropy
coder is a per-symbol Python loop (a few hundred symbols per fixture
image — the kernels around it dominate).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "encode", "decode"]


class JpegError(ValueError):
    pass


# --- constants (ITU-T T.81 Annex K — public spec tables) ---------------

# zigzag position -> raster index within an 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)  # raster index -> zigzag position

QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Huffman table spec: (bits[1..16] code counts, symbol values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal DCT-II matrix: T @ block @ T.T = coefficients
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


_LUT_CACHE: dict[tuple[bytes, bytes], tuple[bytes, bytes]] = {}


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[bytes, bytes]:
    """Peek-16 Huffman decode tables: two length-65536 ``bytes``
    mapping every 16-bit lookahead prefix to (code length, symbol);
    length 0 marks an invalid prefix. One table lookup replaces the
    bit-by-bit canonical-tree walk (the decoder's hot path — ~5.4
    bit reads per symbol otherwise). Cached on the table definition:
    real-world scans reuse the same four Annex-K tables, so the build
    cost is paid once per process, not per image."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    enc = _canonical_codes(bits, vals)
    lut_len = np.zeros(65536, dtype=np.uint8)
    lut_sym = np.zeros(65536, dtype=np.uint8)
    for sym, (code, ln) in enc.items():
        lo = code << (16 - ln)
        lut_len[lo : lo + (1 << (16 - ln))] = ln
        lut_sym[lo : lo + (1 << (16 - ln))] = sym
    out = (lut_len.tobytes(), lut_sym.tobytes())
    _LUT_CACHE[key] = out
    return out


_ENC_TABLES = {
    (0, 0): _canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
    (0, 1): _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS),
    (1, 0): _canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
    (1, 1): _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS),
}


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling of an Annex-K base table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601; returns float64 (h, w, 3)."""
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (n_by, n_bx, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _from_blocks(blocks: np.ndarray) -> np.ndarray:
    n_by, n_bx = blocks.shape[:2]
    return blocks.swapaxes(1, 2).reshape(n_by * 8, n_bx * 8)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad up to (h, w)."""
    return np.pad(
        plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])), mode="edge"
    )


# --- encoder ------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.acc &= (1 << self.n) - 1
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_tbl: dict, ac_tbl: dict
) -> int:
    """Entropy-encode one zigzagged quantized block; returns new DC pred."""
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    size = mag.bit_length()
    code, ln = dc_tbl[size]
    w.put(code, ln)
    if size:
        bits = diff if diff >= 0 else diff + (1 << size) - 1
        w.put(bits, size)
    nz = np.nonzero(zz[1:])[0]
    pos = 0
    for idx in nz:
        run = int(idx) - pos
        pos = int(idx) + 1
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        v = int(zz[1 + idx])
        size = abs(v).bit_length()
        code, ln = ac_tbl[(run << 4) | size]
        w.put(code, ln)
        bits = v if v >= 0 else v + (1 << size) - 1
        w.put(bits, size)
    if pos != 63:
        code, ln = ac_tbl[0x00]  # EOB
        w.put(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode(
    arr: np.ndarray,
    quality: int = 95,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 (h, w) or (h, w, 3) array to baseline JFIF."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if arr.ndim == 2:
        ncomp = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ncomp = 3
    else:
        raise JpegError(f"unsupported array shape: {arr.shape}")
    if subsample not in ("444", "420"):
        raise JpegError(f"unsupported subsampling: {subsample}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("empty image")

    qlum = _scale_quant(QUANT_LUM, quality)
    qchrom = _scale_quant(QUANT_CHROM, quality)

    if ncomp == 1:
        planes = [arr.astype(np.float64)]
        samplings = [(1, 1)]
        qtables = [qlum]
        qids = [0]
    else:
        ycc = _rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "420" and (h > 1 or w > 1):
            # 2x2 box-mean; odd edges replicate
            cbp = _pad_to(cb, h + h % 2, w + w % 2)
            crp = _pad_to(cr, h + h % 2, w + w % 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            subsample = "444"
            samplings = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtables = [qlum, qchrom, qchrom]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component: pad plane to the MCU grid, DCT, quantize, zigzag
    comp_zz = []
    for plane, (sh, sv), qt in zip(planes, samplings, qtables):
        ph, pw = mcus_y * 8 * sv, mcus_x * 8 * sh
        p = _pad_to(plane, ph, pw) - 128.0
        blocks = _to_blocks(p)  # (by, bx, 8, 8)
        coefs = np.einsum("ux,ijxy,vy->ijuv", _T, blocks, _T)
        q = qt.reshape(8, 8)
        quant = np.round(coefs / q).astype(np.int64)
        # reshape flattens each block row-major (raster order); gathering
        # by ZIGZAG (zigzag position -> raster index) yields zigzag order
        zz = quant.reshape(blocks.shape[0], blocks.shape[1], 64)[..., ZIGZAG]
        comp_zz.append(zz)

    # header
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    dqt = bytes([0x00]) + bytes(qlum[ZIGZAG].tolist())
    if ncomp == 3:
        dqt += bytes([0x01]) + bytes(qchrom[ZIGZAG].tolist())
    out += _seg(0xDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samplings[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qids[ci]])
    out += _seg(0xC0, sof)
    dht = b""
    for (cls, tid), (bits, vals) in (
        ((0, 0), (DC_LUM_BITS, DC_LUM_VALS)),
        ((1, 0), (AC_LUM_BITS, AC_LUM_VALS)),
        ((0, 1), (DC_CHROM_BITS, DC_CHROM_VALS)),
        ((1, 1), (AC_CHROM_BITS, AC_CHROM_VALS)),
    ):
        if ncomp == 1 and tid == 1:
            continue
        dht += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # entropy-coded scan, MCU-interleaved
    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    n_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_in_interval == restart_interval:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                n_in_interval = 0
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samplings[ci]
                tid = 0 if ci == 0 else 1
                dc_tbl = _ENC_TABLES[(0, tid)]
                ac_tbl = _ENC_TABLES[(1, tid)]
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], dc_tbl, ac_tbl
                        )
            n_in_interval += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------


class _BitReader:
    """Reads the entropy-coded bits of ONE restart segment (stuffing
    already removed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # zero padding past the end
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, lut: tuple[bytes, bytes]) -> int:
        """Decode one symbol via the peek-16 LUT (see _decode_lut)."""
        if self.n < 16:
            self._fill(16)
        p = (self.acc >> (self.n - 16)) & 0xFFFF
        ln = lut[0][p]
        if ln == 0:
            raise JpegError("invalid Huffman code in scan")
        self.n -= ln
        self.acc &= (1 << self.n) - 1
        return lut[1][p]


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _split_entropy(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """From ``start`` (just after SOS header), split the scan into
    restart segments with stuffed bytes removed. Returns (segments,
    index of the terminating marker's 0xFF).

    Only 0xFF positions need inspection (stuffing, RSTn, or a real
    marker); everything between them is copied by slice, so the scan
    is O(#FF bytes) Python work instead of a per-byte loop."""
    raw = memoryview(buf)[start:]
    arr = np.frombuffer(raw, dtype=np.uint8)
    n = len(arr)
    segs: list[bytes] = []
    parts: list = []
    pos = 0
    for f in np.flatnonzero(arr == 0xFF):
        f = int(f)
        if f < pos:
            continue  # the 0x00 of a previous FF00 pair can't be FF
        nxt = int(arr[f + 1]) if f + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed data byte: keep the FF, drop the 00
            parts.append(raw[pos : f + 1])
            pos = f + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            parts.append(raw[pos:f])
            segs.append(b"".join(parts))
            parts = []
            pos = f + 2
        else:  # real marker terminates the scan
            parts.append(raw[pos:f])
            segs.append(b"".join(parts))
            return segs, start + f
    parts.append(raw[pos:])
    segs.append(b"".join(parts))
    return segs, start + n


def decode(buf: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to uint8 (h, w) or (h, w, 3)."""
    buf = bytes(buf)
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG: missing SOI")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[bytes, bytes]] = {}
    restart_interval = 0
    frame = None
    i = 2
    n = len(buf)
    while i < n:
        if buf[i] != 0xFF:
            i += 1  # fill bytes / garbage between segments
            continue
        marker = buf[i + 1] if i + 1 < n else 0xD9
        if marker in (0xFF, 0x00):
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise JpegError("truncated segment header")
        seg_len = struct.unpack_from(">H", buf, i + 2)[0]
        payload = buf[i + 4 : i + 2 + seg_len]
        if len(payload) != seg_len - 2:
            raise JpegError("truncated segment payload")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(payload[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        payload[p : p + 128], dtype=">u2"
                    )
                    p += 128
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tbl.astype(np.int64)
                qtables[tq] = raster
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                htables[(cls, tid)] = _decode_lut(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise JpegError(f"unsupported precision: {prec}")
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = payload[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, sampling >> 4, sampling & 0x0F, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                "only baseline sequential JPEG is supported "
                f"(SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:  # SOS — scan follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = payload[0]
            scan_tbl = {}
            for c in range(ns):
                cid, tids = payload[1 + 2 * c : 3 + 2 * c]
                scan_tbl[cid] = (tids >> 4, tids & 0x0F)
            segs, i = _split_entropy(buf, i + 2 + seg_len)
            return _decode_scan(
                frame, scan_tbl, qtables, htables, restart_interval, segs
            )
        i += 2 + seg_len
    raise JpegError("no SOS scan found")


def _decode_scan(frame, scan_tbl, qtables, htables, restart_interval, segs):
    fh, fw, comps = frame
    if len(comps) not in (1, 3):
        raise JpegError(f"unsupported component count: {len(comps)}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        raise JpegError(f"unsupported sampling factors: {hmax}x{vmax}")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # coefficient store per component: (mcus_y*v, mcus_x*h, 64) zigzag
    store = [
        np.zeros((mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int64)
        for c in comps
    ]
    tbls = []
    for cid, sh, sv, qid in comps:
        if cid not in scan_tbl:
            raise JpegError(f"component {cid} missing from scan")
        dct, act = scan_tbl[cid]
        if (0, dct) not in htables or (1, act) not in htables:
            raise JpegError("scan references undefined Huffman table")
        if qid not in qtables:
            raise JpegError("frame references undefined quant table")
        tbls.append((htables[(0, dct)], htables[(1, act)]))

    # Per-MCU block order: (component index, flat-block-column stride
    # data, LUT bytes) — hoisted so the entropy loop below runs on
    # locals only. Coefficients are accumulated as flat (index, value)
    # lists and scattered into the store in ONE vectorized assignment
    # per component at the end: per-coefficient numpy scalar writes
    # were a top-3 cost of the previous per-block implementation.
    ncols = [mcus_x * c[1] for c in comps]
    order = []
    for ci, (cid, sh, sv, qid) in enumerate(comps):
        dc_lut, ac_lut = tbls[ci]
        for by in range(sv):
            for bx in range(sh):
                order.append(
                    (ci, sv, by, sh, bx, dc_lut[0], dc_lut[1],
                     ac_lut[0], ac_lut[1])
                )
    idx_acc: list[list[int]] = [[] for _ in comps]
    val_acc: list[list[int]] = [[] for _ in comps]

    seg_iter = iter(segs)
    data = next(seg_iter)
    dlen = len(data)
    pos = 0
    acc = 0
    nb = 0
    preds = [0] * len(comps)
    n_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_in_interval == restart_interval:
                nxt = next(seg_iter, None)
                if nxt is None:
                    raise JpegError("missing restart segment")
                data, dlen, pos, acc, nb = nxt, len(nxt), 0, 0, 0
                preds = [0] * len(comps)
                n_in_interval = 0
            for ci, sv, by, sh, bx, dcl, dcs, acl, acs in order:
                base = (
                    ((my * sv + by) * ncols[ci] + (mx * sh + bx)) << 6
                )
                # DC: one fill covers the 16-bit peek + <=11 magnitude
                # bits (27 max), then peek/consume on locals.
                while nb < 27:
                    if pos < dlen:
                        take = dlen - pos
                        if take > 4:
                            take = 4
                        acc = (acc << (take << 3)) | int.from_bytes(
                            data[pos : pos + take], "big"
                        )
                        pos += take
                        nb += take << 3
                    else:
                        acc <<= 8
                        nb += 8
                p = (acc >> (nb - 16)) & 0xFFFF
                ln = dcl[p]
                if ln == 0:
                    raise JpegError("invalid Huffman code in scan")
                size = dcs[p]
                if size > 11:
                    raise JpegError("invalid DC size")
                nb -= ln
                if size:
                    v = (acc >> (nb - size)) & ((1 << size) - 1)
                    nb -= size
                    preds[ci] += (
                        v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    )
                acc &= (1 << nb) - 1
                ia = idx_acc[ci]
                va = val_acc[ci]
                ia.append(base)
                va.append(preds[ci])
                k = 1
                while k < 64:
                    # 16-bit peek + <=10 magnitude bits per AC symbol
                    while nb < 26:
                        if pos < dlen:
                            take = dlen - pos
                            if take > 4:
                                take = 4
                            acc = (acc << (take << 3)) | int.from_bytes(
                                data[pos : pos + take], "big"
                            )
                            pos += take
                            nb += take << 3
                        else:
                            acc <<= 8
                            nb += 8
                    p = (acc >> (nb - 16)) & 0xFFFF
                    ln = acl[p]
                    if ln == 0:
                        raise JpegError("invalid Huffman code in scan")
                    sym = acs[p]
                    nb -= ln
                    if sym == 0x00:  # EOB
                        acc &= (1 << nb) - 1
                        break
                    size = sym & 0x0F
                    if size == 0:
                        if sym != 0xF0:
                            acc &= (1 << nb) - 1
                            raise JpegError("invalid AC symbol")
                        acc &= (1 << nb) - 1
                        k += 16
                        continue
                    k += sym >> 4
                    if k > 63:
                        raise JpegError("AC run past block end")
                    v = (acc >> (nb - size)) & ((1 << size) - 1)
                    nb -= size
                    acc &= (1 << nb) - 1
                    ia.append(base + k)
                    va.append(
                        v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    )
                    k += 1
            n_in_interval += 1

    for ci in range(len(comps)):
        if idx_acc[ci]:
            store[ci].reshape(-1)[
                np.asarray(idx_acc[ci], dtype=np.int64)
            ] = val_acc[ci]

    # dequantize + inverse zigzag + IDCT, vectorized per component
    planes = []
    for ci, (cid, sh, sv, qid) in enumerate(comps):
        zz = store[ci]
        raster = zz[..., UNZIGZAG].astype(np.float64)
        q = qtables[qid].astype(np.float64)
        raster *= q
        blocks = raster.reshape(zz.shape[0], zz.shape[1], 8, 8)
        pix = np.einsum("ux,ijuv,vy->ijxy", _T, blocks, _T)
        plane = _from_blocks(pix) + 128.0
        # upsample to full frame resolution, then crop
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(comps) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
