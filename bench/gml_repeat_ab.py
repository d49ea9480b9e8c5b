"""convert_gml repeat-growth probe — round-4 verdict blemish #1.

BENCH_r04's convert_gml_160k_features raws grew monotonically within
the run (4.26 → 8.31 → 17.87 s) — the signature of accumulating state.
Two candidate causes and the A/B that separates them:

* **Python-worker heap growth** (ElementTree garbage surviving worker
  reuse): per-repeat worker RSS climbs run-over-run under the default
  ``spark.python.worker.reuse=true`` and resets (flat walls) with
  ``reuse=false`` — config B isolates exactly that.
* **Load contamination / suite-JVM debt**: the recorded r4 run started
  at loadavg 22.2 and ran inside the full-suite JVM. This probe runs
  the lane in FRESH dedicated JVMs on a quiet box with N repeats, so a
  flat wall profile here (reuse=true) clears the lane.

Per repeat the runner records wall seconds, total Python-worker RSS
(bench.py::py_worker_rss_mb — /proc scan over pyspark.daemon forks)
and JVM used heap. One JSON line with both configs + a verdict field.

Usage: python bench/gml_repeat_ab.py [n_repeats]  → one JSON line.
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
from bench import build_spark, build_gml_fixtures, py_worker_rss_mb
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); repeats = int(sys.argv[2])
reuse = sys.argv[3] == "reuse"
from pyspark.sql import SparkSession
builder = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("gml-repeat-ab")
    .config("spark.sql.shuffle.partitions", str(cpus * 2))
    .config("spark.python.worker.reuse", "true" if reuse else "false")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from ksj2gp_spark.operators import ingest as ingest_ops
from ksj2gp_spark.sinks import geoparquet as gp_sink

N_PER, N_ZIPS = 20_000, 8
gml_dir = build_gml_fixtures(N_PER, N_ZIPS)

def lane():
    ingested = ingest_ops.ingest_zips(
        spark, os.path.join(gml_dir, "*.zip"), source="gml"
    )
    good = ingested.filter(F.col("error").isNull())
    gp_sink.write_geoparquet(
        good.drop("error"), os.path.join(gml_dir, "out.parquet")
    )
    n = spark.read.parquet(os.path.join(gml_dir, "out.parquet")).count()
    assert n == N_PER * N_ZIPS, n
    return n

rt = spark._jvm.java.lang.Runtime.getRuntime()
rows = []
for k in range(repeats):
    import gc
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(0.5)
    t0 = time.time()
    lane()
    rows.append({
        "repeat": k,
        "wall_sec": round(time.time() - t0, 3),
        "worker_rss_mb": py_worker_rss_mb(),
        "jvm_used_mb": round(
            (rt.totalMemory() - rt.freeMemory()) / 1048576.0, 1
        ),
    })
print(json.dumps({"reuse": reuse, "repeats": rows}))
spark.stop()
"""


def run(cpus: int, repeats: int, mode: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER % {"repo": REPO},
         str(cpus), str(repeats), mode],
        capture_output=True, text=True, cwd=REPO,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"runner failed (mode={mode})")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"# done: {r}", flush=True)
    return r


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    a = run(cpus, repeats, "reuse")
    time.sleep(8)
    b = run(cpus, repeats, "fresh")
    walls_a = [r["wall_sec"] for r in a["repeats"]]
    walls_b = [r["wall_sec"] for r in b["repeats"]]
    spread_a = round(max(walls_a) / min(walls_a), 2)
    spread_b = round(max(walls_b) / min(walls_b), 2)
    rss_a = [r["worker_rss_mb"] for r in a["repeats"]]
    grow_a = rss_a[-1] - rss_a[0] if rss_a else 0.0
    print(json.dumps({
        "probe": "convert_gml_repeat_growth",
        "reuse_true": a, "reuse_false": b,
        "wall_spread_reuse": spread_a,
        "wall_spread_fresh": spread_b,
        "worker_rss_growth_mb_reuse": round(grow_a, 1),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "ts": int(time.time()),
    }))


if __name__ == "__main__":
    main()
