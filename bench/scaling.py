"""Scaling-efficiency evidence (north_rule): run the same headline job
at two parallelism levels — local[8] vs local[32] standing in for N vs
4N executors — on the same input, and report throughput at both plus
the efficiency ratio. Writes BENCH_SCALING.md and prints one JSON line.

Usage: python bench/scaling.py [n_images]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from bench import build_spark
cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
from ksj2gp_spark import fixtures
from ksj2gp_spark.operators import spatial
imgs = fixtures.images_df(spark, n, with_bytes=False, partitions=cpus * 2).cache()
imgs.count()
polys = fixtures.polygon_layer()
# warmup (JIT, broadcast) on a small slice
spatial.spatial_join_tiles(imgs.limit(10000), polys, scheme="hex", res=7).count()
t0 = time.time()
rows = spatial.spatial_join_tiles(imgs, polys, scheme="hex", res=7).count()
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "elapsed": dt, "rows": rows,
                  "images_per_sec": n / dt}))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER % {"repo": REPO}, str(cpus), str(n)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo, hi = 8, 32
    t_start = time.time()
    r_lo = run(lo, n)
    r_hi = run(hi, n)
    speedup = r_lo["elapsed"] / r_hi["elapsed"]
    efficiency = speedup / (hi / lo)
    result = {
        "n_images": n,
        "local8": r_lo,
        "local32": r_hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "wall_sec": round(time.time() - t_start, 1),
    }
    md = f"""# Scaling evidence — local[{lo}] vs local[{hi}]

Same job (hex-cell broadcast spatial join + tile assignment, {n:,}
images, deterministic synthetic input), same machine, two parallelism
levels standing in for N vs 4N executors per the driver instructions.

| config | elapsed (s) | throughput (images/sec) |
| --- | --- | --- |
| local[{lo}] | {r_lo["elapsed"]:.2f} | {r_lo["images_per_sec"]:,.0f} |
| local[{hi}] | {r_hi["elapsed"]:.2f} | {r_hi["images_per_sec"]:,.0f} |

Speedup {lo}→{hi} cores (4×): **{speedup:.2f}×** → scaling efficiency
**{efficiency:.2f}** (north_rule target ≥ 0.8).

Output row sets at both parallelism levels are identical (asserted in
tests/test_spatial_spark.py::test_parallelism_independent_rowset).
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
