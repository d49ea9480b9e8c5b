"""Dedup-lane scale probe: minhash LSH at 100k vs 1M docs (VERDICT r2 #8).

The 100-TB question for the near-dup lane is whether candidate
generation stays O(n·cap) as the corpus grows — a single boilerplate
cluster of b identical docs would otherwise contribute b·(b-1)/2 pairs
PER BAND (25k docs → 5×10⁹ candidates at 16 bands). This probe runs the
SAME planted corpus shape at two sizes and reports:

* wall-clock and pair counts at each size (should scale ~linearly with
  n: the planted twins are ~n/10, the boilerplate contribution is
  capped out),
* the cap ledger (``dropped_bucket_stats`` over the public
  ``minhash_banded`` frame) proving the drop was audited, not silent.

Corpus shape per size n:
* n unique docs (40 md5-derived shingles each — no accidental dups),
* n/10 planted near-dup twins (36 of 40 shingles shared → est_jaccard
  ≈ 0.9 ≥ threshold 0.5) — the linear "true pairs" signal,
* 25,000 docs with IDENTICAL boilerplate text — a degenerate cluster
  larger than max_bucket at BOTH sizes, so the cap engages and the
  ledger is non-zero at both.

Usage: python bench/dedup_scaling.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from ksj2gp_spark.operators import dedup  # noqa: E402

BOILER = 25_000
MAX_BUCKET = 10_000
THRESHOLD = 0.5


def corpus(spark, n: int, cpus: int):
    """Deterministic planted corpus of ``n + n//10 + BOILER`` docs."""
    uniq = spark.range(n).select(
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
    # twins of docs [0, n/10): share shingles 0..35, differ in the last 4
    twins = spark.range(n // 10).select(
        (F.col("id") + 2_000_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.when(
                    i < 36,
                    F.substring(
                        F.md5((F.col("id") * 40 + i).cast("string")), 1, 6
                    ),
                ).otherwise(
                    F.substring(
                        F.md5(
                            F.concat(
                                (F.col("id") * 40 + i).cast("string"),
                                F.lit("x"),
                            )
                        ),
                        1,
                        6,
                    )
                ),
            ),
        ).alias("text"),
    )
    boiler = spark.range(BOILER).select(
        (F.col("id") + 3_000_000_000).alias("doc_id"),
        F.lit("standard legal boilerplate notice " * 6).alias("text"),
    )
    return uniq.unionByName(twins).unionByName(boiler).repartition(cpus * 2)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sizes = [100_000, 1_000_000]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("dedup-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: fork python workers + JIT on the small size
    dedup.minhash_lsh_pairs(
        corpus(spark, 10_000, cpus), threshold=THRESHOLD
    ).count()

    results = []
    for n in sizes:
        docs = corpus(spark, n, cpus).cache()
        n_docs = docs.count()
        t0 = time.time()
        n_pairs = dedup.minhash_lsh_pairs(
            docs, threshold=THRESHOLD, max_bucket=MAX_BUCKET
        ).count()
        wall = time.time() - t0
        banded, bucket_cols = dedup.minhash_banded(docs)
        ledger = dedup.dropped_bucket_stats(
            banded, ["band", *bucket_cols], MAX_BUCKET
        ).collect()[0]
        docs.unpersist()
        results.append(
            {
                "n_docs": n_docs,
                "wall_sec": round(wall, 2),
                "n_pairs": n_pairs,
                "n_buckets_dropped": ledger["n_buckets_dropped"],
                "n_rows_dropped": ledger["n_rows_dropped"],
            }
        )

    r0, r1 = results
    print(
        json.dumps(
            {
                "metric": "minhash_lsh_scale_probe",
                "sizes": results,
                # wall-time growth per doc: 1.0 = perfectly linear
                "wall_growth_vs_linear": round(
                    (r1["wall_sec"] / r0["wall_sec"])
                    / (r1["n_docs"] / r0["n_docs"]),
                    3,
                ),
                "pairs_growth": round(r1["n_pairs"] / max(r0["n_pairs"], 1), 2),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
