"""Scaling probe for the multi-zoom cell pyramid (north_rule's
two-parallelism evidence for `operators/cells.py::cell_pyramid`):
the same 4-level pyramid over the same deterministic point table at
local[8] vs local[32] (N vs 4N cores standing in for N vs 4N
executors), throughput at both plus the efficiency ratio.

The job is entirely JVM-side (with_cell grid is pure Catalyst; the
pyramid's ancestor ids are bit arithmetic inside whole-stage codegen;
one shuffle whose rows are the per-partition distinct (level, cell)
pairs after partial aggregation) — there is no Python worker or Arrow
boundary anywhere, so this probe measures the operator itself, not
the local-mode serialization ceiling that caps the Python-kernel
lanes (see bench/scaling.py's transparency note).

Usage: python bench/pyramid_scaling.py [n_points]
Prints one JSON line per core count + a summary line.
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
cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from ksj2gp_spark.operators import cells

def points():
    # deterministic lon/lat from the row id, pure Catalyst
    r = spark.range(0, n, 1, cpus * 4)
    # small LCG multipliers keep id*k inside int64 for any realistic n
    u1 = ((F.col("id") * 69069 + 1) % 1048576) / 1048576.0
    u2 = ((F.col("id") * 48271 + 7) % 1048576) / 1048576.0
    return r.select(
        (128.0 + u1 * 18.0).alias("lon"), (30.0 + u2 * 16.0).alias("lat")
    )

def job():
    pts = cells.with_cell(points(), "grid", 10)
    return cells.cell_pyramid(
        pts, [10, 9, 8, 7], scheme="grid", base_res=10
    ).count()

job()  # warm: JIT + codegen cache
walls = []
for _ in range(3):
    t0 = time.time(); rows = job(); walls.append(time.time() - t0)
walls.sort()
print(json.dumps({
    "cpus": cpus, "n_points": n, "out_rows": rows,
    "wall_s": round(walls[1], 3), "raw": [round(w, 3) for w in walls],
    "points_per_sec": round(n / walls[1]),
}))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.replace("@REPO@", repr(REPO)),
         str(cpus), str(n)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    print(line, flush=True)
    return rec


def main() -> None:
    """Two sizes × two core counts. The raw wall ratio at one size
    under-reports this operator's scaling because the job is seconds
    long and carries a fixed per-job cost (task launch, codegen/JIT,
    AQE final stage) that does not shrink with cores; a real pyramid
    over 10^12 rows amortizes it to nothing. Fitting wall = fixed +
    c * n across the two sizes isolates the MARGINAL per-row rate
    1/c, which is the number that predicts large-input behavior."""
    n_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 320_000_000
    n_lo = n_hi // 4
    recs = {(c, n): run(c, n) for c in (8, 32) for n in (n_lo, n_hi)}
    rows = {r["out_rows"] for r in recs.values()}
    assert len(rows) == 1, f"parallelism/size changed the result: {rows}"
    marg = {}
    for c in (8, 32):
        dn = n_hi - n_lo
        dt = recs[(c, n_hi)]["wall_s"] - recs[(c, n_lo)]["wall_s"]
        marg[c] = dn / dt  # marginal points/sec once fixed cost is paid
    print(json.dumps({
        "metric": "cell_pyramid_scaling", "sizes": [n_lo, n_hi],
        "wall_8": [recs[(8, n_lo)]["wall_s"], recs[(8, n_hi)]["wall_s"]],
        "wall_32": [recs[(32, n_lo)]["wall_s"], recs[(32, n_hi)]["wall_s"]],
        "raw_pps_8": recs[(8, n_hi)]["points_per_sec"],
        "raw_pps_32": recs[(32, n_hi)]["points_per_sec"],
        "raw_efficiency_at_n_hi": round(
            recs[(8, n_hi)]["wall_s"] / recs[(32, n_hi)]["wall_s"] / 4.0, 2
        ),
        "marginal_pps_8": round(marg[8]),
        "marginal_pps_32": round(marg[32]),
        "marginal_efficiency": round(marg[32] / marg[8] / 4.0, 2),
    }))


if __name__ == "__main__":
    main()
