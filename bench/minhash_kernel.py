"""Kernel-level A/B: round-1 per-byte Python FNV shingle hashing vs the
round-2 vectorized polynomial rolling hash (operators/dedup.py).

Measures the signature path over a synthetic 20k-doc corpus (≈740k
shingles) on one process — the kernel the VERDICT flagged as the
dominant cost of a 100-TB text dedup. Prints one JSON line with both
times and the speedup.

Usage: python bench/minhash_kernel.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksj2gp_spark.operators.dedup import (  # noqa: E402
    _M31,
    _batch_shingle_hashes,
    _shingles,
    minhash_params,
)


def old_fnv_kernel(texts: pd.Series, n_shingle: int, a, b) -> list:
    """The round-1 implementation, verbatim shape: per-shingle Python
    loop, per-byte FNV-1a, object-dtype bigint modmul."""
    M61 = (1 << 61) - 1
    out = []
    for t in texts:
        toks = (t or "").split()
        if len(toks) < n_shingle:
            shingles = [" ".join(toks)] if toks else [""]
        else:
            shingles = [
                " ".join(toks[i : i + n_shingle])
                for i in range(len(toks) - n_shingle + 1)
            ]
        hs = np.empty(len(shingles), dtype=np.uint64)
        for i, s in enumerate(shingles):
            h = np.uint64(0xCBF29CE484222325)
            for byte in s.encode("utf-8"):
                h = np.uint64(
                    (int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
                )
            hs[i] = h
        x = hs.astype(object)
        vals = (a[:, None] * x[None, :] + b[:, None]) % M61
        out.append(vals.min(axis=1).astype(np.int64))
    return out


def new_vectorized_kernel(texts: pd.Series, n_shingle: int, a64, b64) -> np.ndarray:
    h1, _, offsets = _batch_shingle_hashes(texts, n_shingle)
    params = list(zip(a64.tolist(), b64.tolist()))
    mins = np.empty((len(params), len(offsets)), np.uint64)
    for i, (ai, bi) in enumerate(params):
        mins[i] = np.minimum.reduceat((ai * h1 + bi) % _M31, offsets)
    return mins


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rng = np.random.default_rng(42)
    vocab = np.array([f"tok{i:04d}" for i in range(2000)])
    texts = pd.Series(
        [" ".join(vocab[rng.integers(0, 2000, size=40)]) for _ in range(n_docs)]
    )
    n_shingle, num_hashes = 3, 64
    params = minhash_params(num_hashes)
    a_obj = np.array([p[0] for p in params], np.int64).astype(object)
    b_obj = np.array([p[1] for p in params], np.int64).astype(object)
    a64 = np.array([p[0] for p in params], np.uint64)
    b64 = np.array([p[1] for p in params], np.uint64)

    n_shingles = sum(len(_shingles(t, n_shingle)) for t in texts)

    t0 = time.time()
    new_vectorized_kernel(texts, n_shingle, a64, b64)
    t_new = time.time() - t0

    t0 = time.time()
    old_fnv_kernel(texts, n_shingle, a_obj, b_obj)
    t_old = time.time() - t0

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_shingles": n_shingles,
                "old_per_byte_fnv_sec": round(t_old, 3),
                "new_vectorized_sec": round(t_new, 3),
                "speedup": round(t_old / t_new, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
