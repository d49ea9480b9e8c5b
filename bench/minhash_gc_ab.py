"""GC-flag A/B for the GC-bimodal minhash_lsh_100k bench lane.

The lane's wall spread (raw repeats 12-22s across rounds) was
attributed to single-JVM full-GC pauses landing on ~1 in 3 repeats.
This probe runs the EXACT bench lane (same warmups, same 5-repeat
protocol as bench.py) in a fresh subprocess JVM per GC configuration
and reports per-repeat raws + spread, so the choice of collector for
the bench harness is a measured decision, not a guess.

Usage: python bench/minhash_gc_ab.py  → one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
from ksj2gp_spark.operators import dedup as dedup_ops

gc_opts = sys.argv[1]
builder = (SparkSession.builder.master("local[32]")
           .config("spark.sql.shuffle.partitions", "64")
           .config("spark.sql.adaptive.enabled", "true")
           .config("spark.driver.memory", "48g")
           .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
           .config("spark.ui.enabled", "false"))
if gc_opts != "default":
    builder = builder.config("spark.driver.extraJavaOptions", gc_opts)
spark = builder.appName("minhash-gc-ab").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

def synth_docs(n):
    # the exact corpus generator bench.py's dedup lane uses
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(39)),
                    lambda i: F.substring(
                        F.md5((F.col("id") * 40 + i).cast("string")), 1, 6
                    ),
                ),
            ).alias("text"),
        )
        .repartition(64)
    )

docs100k = synth_docs(100_000).cache()
docs100k.count()
dedup_ops.minhash_lsh_pairs(synth_docs(64_000), threshold=0.5).count()
dedup_ops.minhash_lsh_pairs(docs100k, threshold=0.5).count()

raws = []
for _ in range(5):
    import gc as _gc
    _gc.collect()
    spark._jvm.System.gc()
    t0 = time.time()
    dedup_ops.minhash_lsh_pairs(docs100k, threshold=0.5).count()
    raws.append(round(time.time() - t0, 3))
raws_sorted = sorted(raws)
print(json.dumps({
    "gc": gc_opts, "raw_sec": raws,
    "median": raws_sorted[2],
    "spread": round(raws_sorted[-1] / raws_sorted[0], 3),
}))
spark.stop()
"""

VARIANTS = [
    "default",  # G1 (JDK 17 default)
    "-XX:+UseParallelGC",
    "-XX:+UseG1GC -XX:MaxGCPauseMillis=50 -XX:G1HeapRegionSize=32m",
    "-XX:+UseZGC",
]


def main() -> None:
    for gc in VARIANTS:
        out = subprocess.run(
            [sys.executable, "-c", RUNNER % {"repo": REPO}, gc],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if out.returncode != 0:
            print(json.dumps({"gc": gc, "error": out.stderr[-300:]}))
            continue
        print(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
