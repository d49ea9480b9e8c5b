"""Geostatistics lane scale probe: empirical variogram + local
ordinary kriging at two parallelism levels + a 4x data-growth check.

The 100-TB questions for this lane:

* variogram — the pair join must stay candidate-proportional (local
  density x lag^2 per point), never all-pairs; with ``sample_fraction``
  the cost must drop ~quadratically since thinning happens on POINTS
  map-side before the join.
* kriging — per-target work is (k+1)^2 solve FLOPs reached through one
  cell join + one window; the station table must never re-shuffle per
  target, and the Python boundary moves only k structs per target.

Protocol matches BENCH_SCALING.md: the SAME job at two core counts in
fresh subprocess JVMs (interleaved, best-of-2 per level) plus a 4x
target-count growth at the high core count.

Usage: python bench/geostat_scaling.py  -> one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import json, sys, time
sys.path.insert(0, __REPO__)
from pyspark.sql import SparkSession, functions as F
from ksj2gp_spark.operators.spatial import empirical_variogram, ordinary_krige

cpus, n_points = int(sys.argv[1]), int(sys.argv[2])
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
MIX, MOD = 2654435761, 1 << 20

def pts(n, sa, sb, idc):
    k = F.col("id")
    return spark.range(0, n, 1, cpus * 2).select(
        k.alias(idc),
        (F.lit(139.0) + ((k * sa + 11) * MIX % MOD) / float(MOD) * 2.0).alias("lon"),
        (F.lit(35.0) + ((k * sb + 3) * MIX % MOD) / float(MOD) * 2.0).alias("lat"),
    )

points = pts(n_points, 97, 31, "point_id").withColumn(
    "value", (F.col("point_id") % 97).cast("double")
)
stations = pts(100_000, 97, 31, "station_id").withColumn(
    "value", (F.col("station_id") % 97).cast("double")
)
targets = pts(n_points, 53, 29, "target_id")

def vario_job():
    # pair sampling on: the scale posture a real 10^12-point variogram uses
    return empirical_variogram(
        points, max_lag=0.02, n_bins=8, sample_fraction=0.3
    ).count()

def krige_job():
    # radius sized to ~8 candidates/target at this station density:
    # the cost model is candidates, not stations
    return ordinary_krige(
        targets, stations, radius=0.01, k=8,
        model="exponential", nugget=0.5, psill=40.0, vrange=0.02,
    ).count()

out = {"cpus": cpus, "n_points": n_points}
for name, job in (("vario", vario_job), ("krige", krige_job)):
    job()  # warm (JIT + shuffle shape)
    best = None
    for _ in range(2):
        t0 = time.time()
        n_out = job()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out[name + "_sec"] = round(best, 3)
    out[name + "_rows"] = n_out
    out[name + "_rows_per_sec"] = round(n_points / best)
print(json.dumps(out))
spark.stop()
"""


def run(cpus: int, n_points: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.replace("__REPO__", repr(REPO)),
         str(cpus), str(n_points)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    t0 = time.time()
    N_BASE = int(os.environ.get("GEOSTAT_N", "4000000"))
    lo, hi = int(os.environ.get("SCALE_LO", "8")), int(
        os.environ.get("SCALE_HI", "32")
    )
    runs_lo, runs_hi = [], []
    for _ in range(2):
        runs_lo.append(run(lo, N_BASE))
        runs_hi.append(run(hi, N_BASE))
    big = run(hi, 4 * N_BASE)
    res = {"wall_sec": None}
    for name in ("vario", "krige"):
        best_lo = min(r[name + "_sec"] for r in runs_lo)
        best_hi = min(r[name + "_sec"] for r in runs_hi)
        speedup = best_lo / best_hi
        res[name] = {
            "lo_sec": best_lo, "hi_sec": best_hi,
            "big_4x_sec": big[name + "_sec"],
            "core_speedup": round(speedup, 3),
            "core_scaling_efficiency": round(speedup / (hi / lo), 3),
            "wall_growth_at_4x": round(big[name + "_sec"] / best_hi, 3),
            "rows_per_sec_hi": min(
                runs_hi, key=lambda r: r[name + "_sec"]
            )[name + "_rows_per_sec"],
        }
    res["lo_cpus"], res["hi_cpus"], res["n_points"] = lo, hi, N_BASE
    res["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
