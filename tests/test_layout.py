"""Physical-layout contract tests: bucketed tables join and aggregate
WITHOUT an Exchange; Hive-partitioned tables prune partitions at scan.
These pin the 100 TB shuffle-avoidance story as plan-shape assertions.
"""

import pytest
from pyspark.sql import functions as F

from ksj2gp_spark.sinks import layout


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so small test tables take the
    SortMergeJoin path the bucket spec is meant to optimize."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("cell"), (F.col("id") * 2).alias("x")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("cell"), (F.col("id") * 3).alias("y")
    )
    layout.write_bucketed(
        a, "t_bkt_a", 8, "cell", path=str(tmp_path / "a"), sort_cols=("cell",)
    )
    layout.write_bucketed(
        b, "t_bkt_b", 8, "cell", path=str(tmp_path / "b"), sort_cols=("cell",)
    )
    try:
        joined = layout.bucketed_join(spark, "t_bkt_a", "t_bkt_b", ["cell"])
        plan = layout.assert_no_exchange(joined)
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000
        # same join WITHOUT bucketing shuffles both sides
        plain = a.join(b, "cell")
        assert "Exchange" in layout.executed_plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path, no_broadcast):
    a = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("cell"), F.col("id").alias("x")
    )
    layout.write_bucketed(a, "t_bkt_g", 8, "cell", path=str(tmp_path / "g"))
    try:
        agg = spark.table("t_bkt_g").groupBy("cell").agg(F.sum("x").alias("s"))
        plan = layout.assert_no_exchange(agg)
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_g")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("admin_code"),
    )
    out = str(tmp_path / "parts")
    layout.write_partitioned(df, out, ("admin_code",))
    scan = spark.read.parquet(out).filter(F.col("admin_code") == "3")
    plan = layout.executed_plan(scan)
    assert "PartitionFilters" in plan
    assert "admin_code" in plan.split("PartitionFilters", 1)[1][:200]
    assert scan.count() == 200


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP contract: joining a partitioned fact to a FILTERED dim on
    the partition column must prune fact partitions at runtime — the
    scan carries a dynamicpruning subquery instead of reading all
    partitions. At 100 TB this is the difference between scanning one
    prefecture and scanning Japan."""
    fact = spark.range(0, 20_000).select(
        F.col("id"),
        (F.col("id") % 10).cast("string").alias("admin_code"),
        (F.col("id") * 2).alias("v"),
    )
    out = str(tmp_path / "fact_parts")
    layout.write_partitioned(fact, out, ("admin_code",))

    dim = spark.createDataFrame(
        [(str(i), f"pref{i}") for i in range(10)],
        "admin_code string, pref string",
    ).filter(F.col("pref") == "pref3")

    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
                   "true")
    joined = spark.read.parquet(out).join(dim, "admin_code")
    plan = layout.executed_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == 2_000
