"""Exact group-wise quantiles — the distribution-reporting step of a
corpus-curation pipeline (median/p90 document length per language,
per-source token budgets, ...).

Spark's built-in percentile_approx is approximate and engine-specific;
this operator computes the EXACT type-1 (lower) quantile with integer
rank arithmetic any SQL engine reproduces bit-for-bit:

    target_rank(q = num/den, n) = max(1, ceil(n * num / den))
                                = max(1, (n*num + den - 1) DIV den)

One window pass sorts each group once (row_number + count over the
group partition); the quantile list then explodes per row and a filter
keeps the rows whose rank hits a target — |qs| results per group from
a single sort, no per-q re-execution.

Scale note: an exact quantile needs each group sorted somewhere, so
one shuffle on the group key, and a pathologically hot group becomes
one task's sort (same skew profile as any window). For skewed groups
at 100 TB use percentile_approx or sample first; this operator is the
exact lane.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window, functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Return (group_cols..., q, value): for each group and each
    quantile fraction in ``qs`` the exact lower-quantile element of
    ``value_col``. ``qs`` entries are parsed as exact decimal
    fractions ("0.9" = 9/10), so the rank computation is pure BIGINT
    arithmetic — no float ceil(0.9*n) edge cases diverging between
    engines."""
    if not qs:
        raise ValueError("qs must be non-empty")
    fracs = [Fraction(str(q)) for q in qs]
    if any(f <= 0 or f > 1 for f in fracs):
        raise ValueError("quantiles must be in (0, 1]")
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wp = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        value_col,
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wp).alias("_n"),
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(float(f)).alias("q"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(
                        f"(_n * {f.numerator} + {f.denominator - 1}) "
                        f"DIV {f.denominator}"
                    ),
                ).alias("t"),
            )
            for f in fracs
        ]
    )
    return (
        ranked.select(
            *group_cols,
            F.col(value_col).alias("value"),
            "_rn",
            F.explode(targets).alias("_q"),
        )
        .filter(F.col("_q.t") == F.col("_rn"))
        .select(*group_cols, F.col("_q.q").alias("q"), "value")
    )
