"""Scaling probe for map matching (north_rule's two-parallelism
evidence for `operators/spatial.py::snap_points`): the same snap job
at local[8] vs local[32] (N vs 4N cores standing in for N vs 4N
executors) and at two input sizes, throughput at both plus the
marginal efficiency from the two-size fit (fixed per-job cost
isolated exactly like bench/pyramid_scaling.py).

The job is entirely JVM-side — segment cell cover, candidate
equi-join, projection/clamp/distance refine, and the per-point top-1
window are all whole-stage codegen; there is no Python worker or
Arrow boundary anywhere (plan-asserted in
tests/test_spatial_spark.py::TestSnapPoints::test_snap_plan_zero_python).

Usage: python bench/snap_scaling.py [n_points]
Prints one JSON line per (cores, size) + a summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, @REPO@)
from bench import build_spark
cpus = int(sys.argv[1]); n = int(sys.argv[2]); nseg = int(sys.argv[3])
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from ksj2gp_spark.operators.spatial import snap_points

def points():
    r = spark.range(0, n, 1, cpus * 4)
    u1 = ((F.col("id") * 69069 + 1) % 1048576) / 1048576.0
    u2 = ((F.col("id") * 48271 + 7) % 1048576) / 1048576.0
    return r.select(
        F.col("id").alias("point_id"),
        (128.0 + u1 * 18.0).alias("x"),
        (30.0 + u2 * 16.0).alias("y"),
    )

def segments():
    # nseg short road segments (~0.01 deg) over the same box
    r = spark.range(0, nseg, 1, cpus * 2)
    u1 = ((F.col("id") * 2246822519 + 11) % 1048576) / 1048576.0
    u2 = ((F.col("id") * 2654435761 + 104729) % 1048576) / 1048576.0
    ang = ((F.col("id") * 1103515245 + 12345) % 1048576) / 1048576.0
    x1 = 128.0 + u1 * 18.0
    y1 = 30.0 + u2 * 16.0
    return r.select(
        (F.col("id") % 10000).alias("line_id"),
        (F.col("id") / 10000).cast("int").alias("seg_idx"),
        x1.alias("x1"), y1.alias("y1"),
        (x1 + 0.01 * F.cos(ang * 6.283185)).alias("x2"),
        (y1 + 0.01 * F.sin(ang * 6.283185)).alias("y2"),
    )

def job():
    return snap_points(
        points(), segments(), max_dist=0.02, cell_size=0.04
    ).count()

job()  # warm: JIT + codegen cache
walls = []
rows = None
for _ in range(3):
    t0 = time.time(); rows = job(); walls.append(time.time() - t0)
walls.sort()
print(json.dumps({
    "cpus": cpus, "n_points": n, "n_segments": nseg, "out_rows": rows,
    "wall_s": round(walls[1], 3),
    "points_per_sec": round(n / walls[1], 1),
    "raw_walls": [round(w, 3) for w in walls],
}))
spark.stop()
""".replace("@REPO@", repr(REPO))


def run(cpus: int, n: int, nseg: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(n), str(nseg)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    nseg = 100_000
    recs = {}
    for cpus in (8, 32):
        for size in (n, 4 * n):
            recs[(cpus, size)] = run(cpus, size, nseg)
    # matched-pair counts must be bit-identical across core counts for
    # the same input size — parallelism can never change the result
    for size in (n, 4 * n):
        rows = {recs[(c, size)]["out_rows"] for c in (8, 32)}
        assert len(rows) == 1, (size, rows)
    # marginal rate from the two-size fit: (wall_4n - wall_n) covers
    # exactly 3n extra points with the fixed per-job cost cancelled
    marg = {
        c: 3 * n / (recs[(c, 4 * n)]["wall_s"] - recs[(c, n)]["wall_s"])
        for c in (8, 32)
    }
    eff = marg[32] / marg[8] / 4.0
    print(
        json.dumps(
            {
                "marginal_pps_8": round(marg[8], 1),
                "marginal_pps_32": round(marg[32], 1),
                "one_size_eff_4n": round(
                    recs[(8, 4 * n)]["wall_s"]
                    / recs[(32, 4 * n)]["wall_s"]
                    / 4.0,
                    3,
                ),
                "marginal_efficiency_8_to_32": round(eff, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
