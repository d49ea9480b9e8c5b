"""Kernel-level A/B: the round-3 per-pair overlap-join refine (parse
both WKB geometries per candidate pair, exact kernel on every pair) vs
the round-4 vectorized refine (parse each DISTINCT geometry once per
batch + batched bbox prefilter before the exact kernel) — the loop the
round-3 VERDICT flagged as the slowest in the repo at big×big
candidate-pair counts (operators/spatial.py polygon_overlap_join_shuffle).

Builds a synthetic candidate-pair batch shaped like the shuffle join's
Arrow output: G distinct polygons per side, P pairs sampled with the
replication the cell cover produces (each polygon appears in many
pairs), ~half the pairs bbox-disjoint (the prefilter's win). Verifies
both kernels return identical keep-masks, then times them.

Usage: python bench/overlap_refine_kernel.py [n_pairs] [n_polys]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksj2gp_spark.geo import geom, wkb  # noqa: E402


def _poly(cx: float, cy: float, r: float, n: int = 24) -> bytes:
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
    ring = np.vstack([ring, ring[:1]])
    return wkb.dumps(wkb.Geometry(wkb.POLYGON, [ring]))


def build_pairs(n_pairs: int, n_polys: int) -> pd.DataFrame:
    rng = np.random.default_rng(7)
    # left polygons on a grid; right polygons offset so ~half the
    # sampled pairs are bbox-disjoint
    side = int(np.ceil(np.sqrt(n_polys)))
    lgeo = [
        _poly((i % side) * 1.0, (i // side) * 1.0, 0.45)
        for i in range(n_polys)
    ]
    rgeo = [
        _poly((i % side) * 1.0 + rng.uniform(0.0, 2.0),
              (i // side) * 1.0 + rng.uniform(0.0, 2.0), 0.45)
        for i in range(n_polys)
    ]
    li = rng.integers(0, n_polys, n_pairs)
    ri = rng.integers(0, n_polys, n_pairs)
    return pd.DataFrame(
        {
            "polygon_id": [f"L{i}" for i in li],
            "_rid": [f"R{i}" for i in ri],
            "_lg": [lgeo[i] for i in li],
            "_rg": [rgeo[i] for i in ri],
        }
    )


def refine_old(pdf: pd.DataFrame) -> np.ndarray:
    """Round-3 shape: parse both geometries per pair, exact kernel on
    every pair."""
    keep = []
    for _, row in pdf.iterrows():
        keep.append(
            geom.geometry_intersects(
                wkb.loads(bytes(row["_lg"])), wkb.loads(bytes(row["_rg"]))
            )
        )
    return np.asarray(keep, dtype=bool)


def refine_new(pdf: pd.DataFrame) -> np.ndarray:
    """Round-4 shape: distinct-geometry parse cache + batched bbox
    prefilter (mirrors operators/spatial.py polygon_overlap_join_shuffle)."""
    lids = pdf["polygon_id"].to_numpy()
    rids = pdf["_rid"].to_numpy()
    lgv = pdf["_lg"].to_numpy()
    rgv = pdf["_rg"].to_numpy()
    lgeo: dict = {}
    rgeo: dict = {}
    lb: dict = {}
    rb: dict = {}
    for i in range(len(pdf)):
        k = lids[i]
        if k not in lgeo:
            g = wkb.loads(bytes(lgv[i]))
            lgeo[k] = g
            lb[k] = g.bounds()
        k = rids[i]
        if k not in rgeo:
            g = wkb.loads(bytes(rgv[i]))
            rgeo[k] = g
            rb[k] = g.bounds()
    lbb = np.array([lb[k] for k in lids], dtype=np.float64)
    rbb = np.array([rb[k] for k in rids], dtype=np.float64)
    cand = ~(
        (lbb[:, 2] < rbb[:, 0])
        | (rbb[:, 2] < lbb[:, 0])
        | (lbb[:, 3] < rbb[:, 1])
        | (rbb[:, 3] < lbb[:, 1])
    )
    keep = np.zeros(len(pdf), dtype=bool)
    for i in np.nonzero(cand)[0]:
        keep[i] = geom.geometry_intersects(lgeo[lids[i]], rgeo[rids[i]])
    return keep


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_polys = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    pdf = build_pairs(n_pairs, n_polys)

    m_new = refine_new(pdf)
    m_old = refine_old(pdf)
    assert (m_new == m_old).all(), "kernel mismatch"

    t0 = time.perf_counter()
    refine_old(pdf)
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    refine_new(pdf)
    t_new = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "overlap_refine_kernel_ab",
                "n_pairs": n_pairs,
                "n_distinct_polys": n_polys,
                "kept_pairs": int(m_new.sum()),
                "old_sec": round(t_old, 4),
                "new_sec": round(t_new, 4),
                "speedup": round(t_old / t_new, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
