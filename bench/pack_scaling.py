"""Sequence-packing scale probe: the distributed prefix sum at two
data sizes and two parallelism levels.

The 100-TB question for `pack_sequences` is whether the layout pass
stays linear in rows with a bounded driver footprint: the only
driver-side materialization is one row per partition, and the only
wide movement is the single range shuffle (the totals pass re-executes
it pruned to two long columns — see PLANS.md). This probe reports:

* wall-clock at n and 4n rows at fixed parallelism (expect ~4×: the
  pass is scan + one narrow shuffle + a vectorized cumsum),
* wall-clock at local[4] vs local[16] on the same input, with the
  caveat that a metadata-only lane in a single shared JVM is bounded
  by the Arrow/shuffle transport path, not the kernels — the same
  local-mode artifact documented for the metadata-only join lane in
  BENCH_SCALING.md; reported transparently,
* correctness cross-check at every size/parallelism: the max seq_id
  and total token count must equal the closed-form values of the
  deterministic input (catching any partition-offset desync).

Usage: python bench/pack_scaling.py [n_small]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, __REPO__)
from pyspark.sql import SparkSession, functions as F
cpus = int(sys.argv[1]); n = int(sys.argv[2]); budget = 4096
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 2))
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .appName("pack-scaling").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from ksj2gp_spark.operators.pack import pack_sequences

def docs(m):
    return spark.range(m).select(
        F.col("id").alias("doc_id"),
        (F.lit(16) + (F.col("id") * 7) % 1000).alias("n_tokens"),
    )

def run(m):
    out = pack_sequences(docs(m), budget=budget, num_partitions=cpus * 2)
    row = out.agg(
        F.max("seq_id").alias("max_seq"),
        F.sum("n_tokens").alias("tot"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row["max_seq"], row["tot"], row["n"]

# warmup at 1/10 size (python worker fork + JIT), then 2 timed, best-of
run(max(n // 10, 1000))
best = 1e18; res = None
for _ in range(2):
    t0 = time.time(); res = run(n); best = min(best, time.time() - t0)

# closed-form check: sum of 16 + (i*7)%1000 for i in [0, n)
import numpy as np
ii = np.arange(n, dtype=np.int64)
toks = 16 + (ii * 7) % 1000
tot = int(toks.sum())
starts_last = tot - int(toks[-1])
assert res[1] == tot, (res[1], tot)
assert res[2] == n
assert res[0] == starts_last // budget, (res[0], starts_last // budget)
print(json.dumps({"cpus": cpus, "n": n, "sec": round(best, 3),
                  "rows_per_sec": round(n / best)}))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.replace("__REPO__", repr(REPO)),
         str(cpus), str(n)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    t0 = time.time()
    r_small = run(16, n_small)
    r_big = run(16, n_small * 4)
    r_lo = run(4, n_small * 4)
    growth = r_big["sec"] / r_small["sec"]
    speedup = r_lo["sec"] / r_big["sec"]
    print(json.dumps({
        "small_16c": r_small,
        "big_16c": r_big,
        "big_4c": r_lo,
        "wall_growth_at_4x_rows": round(growth, 2),
        "speedup_4_to_16_cores": round(speedup, 2),
        "scaling_efficiency_4_to_16": round(speedup / 4, 2),
        "wall_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
