"""Driver-style correctness dry run: every queries() entry vs its
oracle_sql() on sf0.01, value-for-value (columns sorted by name, rows
sorted, 6-decimal float canonicalization) — the same comparison shape
the driver records in CORRECTNESS_r{N}.json.

Usage: python bench/correctness_dryrun.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> tuple[int, str, str]:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        pdf[c] = pdf[c].astype(str)
    rows = sorted(map(tuple, pdf.itertuples(index=False)))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(pdf), ",".join(sorted(pdf.columns)), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("correctness-dryrun")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    q = e.queries()
    o = e.oracle_sql()
    failures = []
    for name, fn in q.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in o:
            print(f"rows  {name}: {len(sdf)} (rows-only)")
            continue
        odf = con.sql(o[name]).df()
        sn, sc, sh = canon(sdf)
        on_, oc, oh = canon(odf)
        ok = (sn, sc, sh) == (on_, oc, oh)
        tag = "OK   " if ok else "FAIL "
        print(f"{tag} {name}: spark({sn},[{sc}],{sh}) oracle({on_},[{oc}],{oh})")
        if not ok:
            failures.append((name, "mismatch"))
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle-checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
