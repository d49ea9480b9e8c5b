"""Substring-span dedup scale probe: duplicate_spans at 100k vs 1M
docs (data growth) and local[8] vs local[32] (north-rule core
scaling), on a planted corpus with CLOSED-FORM expected output.

Corpus shape per size n (deterministic, all-JVM generation):
* n unique docs of 60 md5-derived hex tokens — md5 streams cannot
  repeat a 5-token window, so they contribute zero spans;
* n/10 planted docs embedding ONE shared 12-token boilerplate run
  (tokens "zz00".."zz11" — non-hex, so they can never collide with the
  md5 vocabulary) at token offset 24 inside otherwise-unique text.

Closed form with k=5: windows fully inside the run are start positions
24..31 → one maximal island per planted doc → EXACTLY n/10 spans, every
span = [24, 36), span_tokens = 12. The probe asserts all three, so a
wrong answer fails loudly rather than timing garbage.

Scale questions answered:
* wall growth 100k → 1M docs ~linear (the inverted index is groupBy +
  join on 8-byte hashes; the boilerplate grams are a 100k-occurrence
  hot key at the big size — frequency counting is map-side combinable,
  and join-back output is proportional to true duplicated positions);
* 8 → 32 cores efficiency on the same input (north_rule: two
  parallelism levels standing in for N vs 4N executors).

Usage: python bench/spans_scaling.py  → one JSON line.
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
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
from ksj2gp_spark.operators.dedup import duplicate_spans

cpus, n = int(sys.argv[1]), int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "48g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .appName("spans-scaling").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def md5_tok(expr):
    # 16 hex chars = 64-bit tokens: at 100k planted docs the chance
    # that two docs' run-adjacent tokens collide (which would lengthen
    # a span past the closed form, observed at 6-char tokens) is
    # ~1e-9; md5 prefixes of distinct integers otherwise never repeat
    # a 5-token window.
    return F.substring(F.md5(expr.cast("string")), 1, 16)

def corpus(n):
    uniq = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: md5_tok(F.col("id") * 60 + i),
        )).alias("text"),
    )
    planted = spark.range(n // 10).select(
        (F.col("id") + 2_000_000_000).alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.when(
                (i >= 24) & (i < 36),
                F.concat(F.lit("zz"), F.lpad((i - 24).cast("string"), 2, "0")),
            ).otherwise(md5_tok((F.col("id") + n) * 60 + i)),
        )).alias("text"),
    )
    return uniq.unionByName(planted).repartition(cpus * 2)

# warmup (forks workers, JITs the plan) on a small size. cache() +
# count() materializes the generated corpus first: duplicate_spans
# self-joins its input, and Spark 4's relation dedup trips an internal
# "key not found: id#N" on a raw range->transform lambda lineage
# appearing on both sides (engine quirk; real inputs are file scans).
w = corpus(5_000).cache()
w.count()
duplicate_spans(w, k=5).count()
w.unpersist()

docs = corpus(n).cache()
n_docs = docs.count()
t0 = time.time()
spans = duplicate_spans(docs, k=5).cache()
n_spans = spans.count()
wall = time.time() - t0
# closed-form invariants: exactly one 12-token span per planted doc
bad = spans.filter(
    (F.col("span_start") != 24) | (F.col("span_tokens") != 12)
).count()
assert n_spans == n // 10, (n_spans, n // 10)
assert bad == 0, bad
spans.unpersist(); docs.unpersist()
print(json.dumps({"cpus": cpus, "n_docs": n_docs, "wall_sec": round(wall, 2),
                  "n_spans": n_spans, "docs_per_sec": round(n_docs / wall)}))
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
    lo = int(os.environ.get("SCALE_LO", "8"))
    hi = int(os.environ.get("SCALE_HI", "32"))
    t_start = time.time()
    # data growth at full width
    g_small = run(hi, 100_000)
    g_big = run(hi, 1_000_000)
    growth = (g_big["wall_sec"] / g_small["wall_sec"]) / (
        g_big["n_docs"] / g_small["n_docs"]
    )
    # core scaling on one mid size
    c_lo = run(lo, 500_000)
    c_hi = run(hi, 500_000)
    speedup = c_lo["wall_sec"] / c_hi["wall_sec"]
    eff = speedup / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "duplicate_spans_scale_probe",
                "growth_100k_to_1m": [g_small, g_big],
                "wall_growth_vs_linear": round(growth, 3),
                "cores": [c_lo, c_hi],
                "core_speedup": round(speedup, 3),
                "core_scaling_efficiency": round(eff, 3),
                "wall_sec": round(time.time() - t_start, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
