"""Generic interval (range) join — point-in-interval matching without
a cartesian product.

Spark has no native range-join optimization: ``points JOIN intervals
ON lo <= p AND p < hi`` planifies as BroadcastNestedLoopJoin (or a
cartesian + filter), which is O(|points| * |intervals|) work no matter
the selectivity. The standard fix (same idea as Databricks' range-join
binning, public) is to discretize: each interval registers itself in
every fixed-width bin it overlaps, each point hashes to exactly ONE
bin, and the match becomes an equi-join on bin id plus a residual
predicate. Each qualifying (point, interval) pair meets exactly once
(in the point's bin), so no distinct is needed — output multiplicity
is correct by construction.

Cost: shuffle O(|points| + |intervals| * spans) where ``spans`` is
avg(interval width / bin_size) — pick ``bin_size`` near the median
interval width so spans is a small constant. This is the same
operator family as the temporal/as-of spatial join
(operators/spatial.py::temporal_join_tiles); this one is the
key-free numeric/timestamp form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``lo <= point < hi`` (half-open, the SQL-standard range shape).
    Columns of both inputs are preserved; the caller keeps names
    disjoint. ``broadcast_intervals=True`` broadcasts the exploded
    interval side (use when intervals are dimension-sized); default is
    a shuffle equi-join on the bin id, which survives a big-by-big
    join at scale.
    """
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    lo, hi = F.col(lo_col), F.col(hi_col)
    # bins floor(lo/w) .. ceil(hi/w)-1 cover [lo, hi); empty or
    # inverted intervals register nowhere (sequence() would otherwise
    # count DOWN for hi < lo — Spark infers step -1)
    binned_iv = (
        intervals.filter(hi > lo)
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(lo / bin_size),
                    F.ceil(hi / bin_size) - F.lit(1),
                )
            ),
        )
    )
    if broadcast_intervals:
        binned_iv = F.broadcast(binned_iv)
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_size)
    )
    return (
        p.join(binned_iv, "_bin")
        .filter((lo <= F.col(point_col)) & (F.col(point_col) < hi))
        .drop("_bin")
    )
