"""Scaling probe for HMM map matching (north_rule two-parallelism
evidence for `operators/spatial.py::hmm_map_match`): the same Viterbi
decode at N vs 4N PINNED cores and at two input sizes, throughput at
both plus the marginal efficiency from the two-size fit (fixed
per-job cost isolated exactly like bench/pyramid_scaling.py).

Measurement protocol — two deliberate choices, both about honesty on
ONE box:

* **OS-level core pinning** (`taskset`-equivalent via
  ``os.sched_setaffinity``): ``local[8]`` caps TASK SLOTS, not CPUs —
  during the DP stage each task keeps a JVM Arrow-writer thread AND a
  Python worker process busy, so an unpinned "8-core" run leaks onto
  ~16 physical cores and understates real 8-core wall by ~35%
  (measured: 6.7s unpinned vs 10.1s pinned at 8M pings). Every
  configuration here is pinned to exactly its advertised cores.
* **Task slots = cores / 2**: a Python-transfer stage needs two
  runnable contexts per in-flight task (JVM serializer + Python
  worker). Provisioning slots at half the pinned cores keeps both
  sides on-core at EVERY size — the same ratio a real cluster uses
  when sizing executor cores for Pandas-UDF stages — so the N→4N
  comparison varies resources, not the oversubscription ratio.

The DP kernel itself is NOT the scaling risk: profiled 6 ms per
bucket (~0.4s of an ~8s job spread over all workers) after the
tensor rewrite; the stage is Arrow-transfer-bound, which pins to
cores and scales with them. Shuffle writeback of the 4N-size run
lands on the virtual disk, which is the dominant noise source — the
probe reports min AND median over 5 repeats plus raw walls and
loadavg so a contaminated run is identifiable, and the efficiency
verdict uses the min (capacity) walls.

Usage: python bench/hmm_scaling.py [n_pings]
Prints one JSON line per (cores, size) + a summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, @REPO@)
cores = int(sys.argv[1]); slots = int(sys.argv[2]); n = int(sys.argv[3])
os.sched_setaffinity(0, set(range(cores)))  # children inherit
from bench import build_spark
T = 20  # pings per trajectory
spark = build_spark(slots)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from ksj2gp_spark.operators.spatial import hmm_map_match

def points():
    r = spark.range(0, n, 1, slots * 4)
    traj = F.floor(F.col("id") / T).cast("long")
    step = F.col("id") % T
    u1 = ((traj * 69069 + 1) % 1048576) / 1048576.0
    u2 = ((traj * 48271 + 7) % 1048576) / 1048576.0
    n1 = (((F.col("id") * 2654435761) % 2001) - 1000) / 100000.0
    n2 = (((F.col("id") * 40503) % 2001) - 1000) / 100000.0
    return r.select(
        traj.alias("traj_id"),
        step.alias("step"),
        (128.0 + u1 * 17.0 + step * 0.03 + n1).alias("x"),
        (30.0 + u2 * 15.0 + step * 0.02 + n2).alias("y"),
    )

def segments():
    # a 0.1-degree road grid over the same box: 161 horizontal +
    # 181 vertical lines, 1-degree segments
    h = spark.range(0, 161 * 18, 1, slots).select(
        (F.col("id") % 161).alias("line_id"),
        (F.col("id") / 161).cast("int").alias("seg_idx"),
    ).select(
        "line_id", "seg_idx",
        (128.0 + F.col("seg_idx")).alias("x1"),
        (30.0 + 0.1 * F.col("line_id")).alias("y1"),
        (129.0 + F.col("seg_idx")).alias("x2"),
        (30.0 + 0.1 * F.col("line_id")).alias("y2"),
    )
    v = spark.range(0, 181 * 16, 1, slots).select(
        (100000 + F.col("id") % 181).alias("line_id"),
        (F.col("id") / 181).cast("int").alias("seg_idx"),
    ).select(
        "line_id", "seg_idx",
        (128.0 + 0.1 * (F.col("line_id") - 100000)).alias("x1"),
        (30.0 + F.col("seg_idx")).alias("y1"),
        (128.0 + 0.1 * (F.col("line_id") - 100000)).alias("x2"),
        (31.0 + F.col("seg_idx")).alias("y2"),
    )
    return h.unionByName(v)

def job():
    return hmm_map_match(
        points(), segments(), max_dist=0.05, sigma=0.025, beta=0.01,
        cell_size=0.05,
    ).count()

job()  # warm: JIT + codegen cache + Python worker pool
walls = []
rows = None
load0 = os.getloadavg()[0]
for _ in range(5):
    t0 = time.time(); rows = job(); walls.append(time.time() - t0)
    spark.sparkContext._jvm.System.gc()  # drain shuffle/codegen debt
walls.sort()
print(json.dumps({
    "cores": cores, "slots": slots, "n_pings": n, "out_rows": rows,
    "min_s": round(walls[0], 3),
    "median_s": round(walls[2], 3),
    "pings_per_sec_min": round(n / walls[0], 1),
    "raw_walls": [round(w, 3) for w in walls],
    "loadavg_1m": [round(load0, 2), round(os.getloadavg()[0], 2)],
}))
spark.stop()
""".replace("@REPO@", repr(REPO))


def run(cores: int, slots: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cores), str(slots), str(n)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    configs = [(8, 4), (32, 16)]  # (pinned cores, task slots)
    recs = {}
    for cores, slots in configs:
        for size in (n, 4 * n):
            recs[(cores, size)] = run(cores, slots, size)
    # decoded row counts must be identical across core counts for the
    # same input — parallelism can never change the matched path
    for size in (n, 4 * n):
        rows = {recs[(c, size)]["out_rows"] for c, _ in configs}
        assert len(rows) == 1, (size, rows)
    marg = {
        c: 3 * n / (recs[(c, 4 * n)]["min_s"] - recs[(c, n)]["min_s"])
        for c, _ in configs
    }
    c_lo, c_hi = configs[0][0], configs[1][0]
    print(
        json.dumps(
            {
                "marginal_pps_8": round(marg[c_lo], 1),
                "marginal_pps_32": round(marg[c_hi], 1),
                "one_size_eff_4n": round(
                    recs[(c_lo, 4 * n)]["min_s"]
                    / recs[(c_hi, 4 * n)]["min_s"]
                    / 4.0,
                    3,
                ),
                "marginal_efficiency_8_to_32": round(
                    marg[c_hi] / marg[c_lo] / 4.0, 3
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
