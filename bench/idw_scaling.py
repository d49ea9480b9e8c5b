"""IDW interpolation scale probe: 1M targets x 20k stations, two
parallelism levels + a 4x data-size growth check.

The 100-TB question for the interpolation lane is whether the
candidate join stays output-proportional: the 3x3 cell prune must keep
per-target candidates at (station density x radius^2), never the full
station table, and the big (target) side must never duplicate.
Protocol matches BENCH_SCALING.md: the SAME job at two core counts in
fresh subprocess JVMs (interleaved, best-of-2 per level) plus a 4x
target-count growth at the high core count.

Usage: python bench/idw_scaling.py  -> one JSON line.
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
from ksj2gp_spark.operators.spatial import idw_interpolate

cpus, n_targets = int(sys.argv[1]), int(sys.argv[2])
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

stations = pts(50_000, 97, 31, "station_id").withColumn(
    "value", (F.col("station_id") % 97).cast("double")
)
targets = pts(n_targets, 53, 29, "target_id")

def job():
    return idw_interpolate(targets, stations, radius=0.05).count()

job()  # warm (JIT + shuffle shape)
best = None
for _ in range(2):
    t0 = time.time()
    n_out = job()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "n_targets": n_targets,
                  "n_covered": n_out, "sec": round(best, 3),
                  "targets_per_sec": round(n_targets / best)}))
spark.stop()
"""


def run(cpus: int, n_targets: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.replace("__REPO__", repr(REPO)),
         str(cpus), str(n_targets)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    t0 = time.time()
    N_BASE = int(os.environ.get("IDW_N", "16000000"))
    lo, hi = int(os.environ.get("SCALE_LO", "4")), int(
        os.environ.get("SCALE_HI", "16")
    )
    # interleaved best-of: lo, hi, lo, hi at 1M targets
    runs_lo, runs_hi = [], []
    for _ in range(2):
        runs_lo.append(run(lo, N_BASE))
        runs_hi.append(run(hi, N_BASE))
    best_lo = min(runs_lo, key=lambda r: r["sec"])
    best_hi = min(runs_hi, key=lambda r: r["sec"])
    big = run(hi, 4 * N_BASE)
    speedup = best_lo["sec"] / best_hi["sec"]
    eff = speedup / (hi / lo)
    print(json.dumps({
        "lo": best_lo, "hi": best_hi, "big_4x": big,
        "core_speedup": round(speedup, 3),
        "core_scaling_efficiency": round(eff, 3),
        "wall_growth_at_4x_targets": round(big["sec"] / best_hi["sec"], 3),
        "wall_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
