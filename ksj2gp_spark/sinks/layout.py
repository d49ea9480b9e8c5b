"""Physical table layouts for shuffle avoidance at 100 TB.

Two layouts, both about making the *next* job cheaper, not this one:

* **Bucketed** (``write_bucketed``): hash-bucket by join/agg key via
  ``bucketBy`` + ``saveAsTable``. Any later equi-join between two
  tables bucketed the same way — or a ``groupBy`` on the bucket key —
  runs WITHOUT an Exchange: Catalyst proves the required distribution
  from the bucket spec. At 10^12 rows the repeated tile-join workload
  amortizes one bucketing write against every downstream join's
  shuffle (the single biggest cost at that scale).
* **Hive-partitioned** (``write_partitioned``): directory partitioning
  by a low-cardinality column (admin_code, date). Predicates on the
  partition column become PartitionFilters — pruned BEFORE file
  listing, so a one-prefecture query over a 47-prefecture table reads
  1/47th of the data.

Both are thin wrappers over Spark's writers on purpose: the value is
the *contract tests* (tests/test_layout.py) that pin the plan shape —
no Exchange for bucketed joins/aggs, PartitionFilters for partition
predicates — so a regression in layout wiring is caught as a plan
diff, not a 100 TB surprise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_col: str = "cell",
    path: str | None = None,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` (optionally
    sorted within buckets, enabling shuffle-AND-sort-free
    SortMergeJoin). ``path`` makes it an external table."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...]
) -> None:
    """Hive-style directory partitioning (partition pruning at scan)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


# Plan-shape assertions live in ksj2gp_spark.plans; re-exported here
# because the layout contract tests were written against this module.
from ..plans import assert_no_exchange, executed_plan  # noqa: E402,F401


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join of two same-bucketed tables; with matching bucket
    specs Catalyst plans it without Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on)
