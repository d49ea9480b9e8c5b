"""DBSCAN scale probe: 1M clustered points, two parallelism levels +
a 4x data-size growth check at constant density.

The 100-TB question for the density-clustering lane is whether the
whole pipeline stays candidate-proportional: the eps-cell pair join
must produce ~n * density candidates (never n^2), the neighbor-count
groupBy must stay map-side combinable, and connected components must
run on the CORE subgraph only. Density is held SUB-percolation
(~0.64 expected eps-disc neighbors at the default eps=0.045 --
many small clusters, the realistic near-dup/POI shape; a
super-critical eps collapses the field into one giant component and
the job degenerates into the connected-components transport probe,
whose single-JVM ceiling BENCH_SCALING.md's cc section already
documents). The domain grows with sqrt(n) at the 4x step so
per-point work is constant.

Protocol matches BENCH_SCALING.md: the SAME job at two core counts in
fresh subprocess JVMs (interleaved, best-of-2 per level) plus the 4x
growth at the high core count.

Usage: python bench/dbscan_scaling.py  -> one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import json, sys, time
sys.path.insert(0, __REPO__)
from pyspark.sql import SparkSession, functions as F
from ksj2gp_spark.operators.spatial import dbscan

cpus, n, width, eps = (int(sys.argv[1]), int(sys.argv[2]),
                       float(sys.argv[3]), float(sys.argv[4]))
stage = sys.argv[5] if len(sys.argv) > 5 else "full"
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus * 2))
    .config("spark.default.parallelism", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# xxhash64-scattered positions: an LCG-style (k*a+b)*MIX mod 2^31
# walk is a rank-1 lattice -- every point sits on one line, chains
# into a single percolated cluster, and the probe degenerates into
# the cc transport test. A real hash gives a genuinely Poisson-ish
# field at the chosen density.
MOD = 1 << 31

k = F.col("id")
pts = spark.range(0, n, 1, cpus * 2).select(
    k.alias("image_id"),
    (F.pmod(F.xxhash64(k), F.lit(MOD)) / float(MOD) * width).alias("lon"),
    (F.pmod(F.xxhash64(k, F.lit(1)), F.lit(MOD)) / float(MOD) * width)
        .alias("lat"),
)

def job_full():
    out = dbscan(pts, eps=eps, min_pts=4)
    return out.filter(F.col("cluster").isNotNull()).count()

def job_pairs():
    # The DBSCAN-specific stages only (cell-bucketed candidate join,
    # eps refine, neighbor-count groupBy, core set) -- everything
    # BEFORE the label propagation hand-off to connected_components.
    # Mirrors operators/spatial.py dbscan()'s pair construction so
    # the full-vs-pairs efficiency gap attributes cleanly to the CC
    # transport stage that BENCH_SCALING.md's cc section documents.
    cell = float(eps) * (1.0 + 1e-9)
    ci = F.floor(F.col("lon") / F.lit(cell))
    cj = F.floor(F.col("lat") / F.lit(cell))
    left = pts.select(F.col("image_id").alias("_ida"),
                      F.col("lon").alias("_xa"), F.col("lat").alias("_ya"),
                      ci.alias("_ci"), cj.alias("_cj"))
    offsets = F.array(*[F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
                        for di in (-1, 0, 1) for dj in (-1, 0, 1)])
    right = pts.select(F.col("image_id").alias("_idb"),
                       F.col("lon").alias("_xb"), F.col("lat").alias("_yb"),
                       ci.alias("_bi"), cj.alias("_bj"),
                       F.explode(offsets).alias("_o")).select(
        "_idb", "_xb", "_yb",
        (F.col("_bi") + F.col("_o.di")).alias("_ci"),
        (F.col("_bj") + F.col("_o.dj")).alias("_cj"))
    d2 = ((F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb"))
          + (F.col("_ya") - F.col("_yb")) * (F.col("_ya") - F.col("_yb")))
    pairs = (left.join(right, ["_ci", "_cj"])
             .filter(d2 <= F.lit(float(eps) * float(eps)))
             .select("_ida", "_idb"))
    cnt = pairs.groupBy("_ida").agg(F.count(F.lit(1)).alias("n_nbrs"))
    return cnt.filter(F.col("n_nbrs") >= F.lit(4)).count()

job = job_full if stage == "full" else job_pairs

job()  # warm (JIT + shuffle shape)
best = None
for _ in range(2):
    t0 = time.time()
    n_out = job()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "n": n, "stage": stage,
                  "clustered": n_out, "sec": round(best, 3),
                  "points_per_sec": round(n / best)}))
spark.stop()
"""


def run(cpus: int, n: int, width: float, eps: float,
        stage: str = "full") -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.replace("__REPO__", repr(REPO)),
         str(cpus), str(n), str(width), str(eps), stage],
        capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"runner failed (cpus={cpus}, n={n})")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"# stage done: {r}", flush=True)
    return r


def main() -> None:
    t0 = time.time()
    n_base = int(os.environ.get("DBSCAN_N", "1000000"))
    lo, hi = int(os.environ.get("SCALE_LO", "8")), int(
        os.environ.get("SCALE_HI", "32")
    )
    eps = float(os.environ.get("DBSCAN_EPS", "0.045"))
    w_base = 100.0 * math.sqrt(n_base / 1_000_000)
    runs_lo, runs_hi = [], []
    for _ in range(2):
        runs_lo.append(run(lo, n_base, w_base, eps))
        runs_hi.append(run(hi, n_base, w_base, eps))
    best_lo = min(runs_lo, key=lambda r: r["sec"])
    best_hi = min(runs_hi, key=lambda r: r["sec"])
    # Attribution: the DBSCAN-specific stages alone (no CC hand-off),
    # same interleaved best-of protocol.
    pairs_lo = min((run(lo, n_base, w_base, eps, "pairs")
                    for _ in range(2)), key=lambda r: r["sec"])
    pairs_hi = min((run(hi, n_base, w_base, eps, "pairs")
                    for _ in range(2)), key=lambda r: r["sec"])
    big = run(
        hi, 4 * n_base, 100.0 * math.sqrt(4 * n_base / 1_000_000), eps
    )
    speedup = best_lo["sec"] / best_hi["sec"]
    eff = speedup / (hi / lo)
    pairs_eff = (pairs_lo["sec"] / pairs_hi["sec"]) / (hi / lo)
    print(json.dumps({
        "lo": best_lo, "hi": best_hi,
        "pairs_lo": pairs_lo, "pairs_hi": pairs_hi, "big_4x": big,
        "core_speedup": round(speedup, 3),
        "core_scaling_efficiency": round(eff, 3),
        "pairs_stage_scaling_efficiency": round(pairs_eff, 3),
        "wall_growth_at_4x_points": round(big["sec"] / best_hi["sec"], 3),
        "wall_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
