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


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each step k, the users whose
    earliest step-k event STRICTLY FOLLOWS their committed step-(k-1)
    time (first-touch attribution — the standard funnel rule). Returns
    one row per step: (step, event_type, n_users, sum_lag_us) where
    sum_lag_us is the exact total microseconds between consecutive
    committed step times (0 for step 1) — BIGINT arithmetic any SQL
    engine reproduces.

    Shape: one filtered min-aggregate per step, each joined to the
    previous step's (user, time) frame — user-keyed shuffles that
    co-partition after the first; per-step results are single-row
    aggregates unioned at the end. No windows over the full event
    stream, no per-user state."""
    if not steps:
        raise ValueError("steps must be non-empty")
    parts = []
    prev: DataFrame | None = None
    for k, step_type in enumerate(steps, 1):
        cur = df.filter(F.col(type_col) == step_type)
        if prev is None:
            agg = cur.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
            lag = F.lit(0).cast("long")
        else:
            j = cur.join(
                prev.select(user_col, F.col("_t").alias("_pt")), user_col
            ).filter(F.col(ts_col) > F.col("_pt"))
            # _pt is constant per user; min() carries it through
            agg = j.groupBy(user_col).agg(
                F.min(ts_col).alias("_t"), F.min("_pt").alias("_pt")
            )
            # timestampdiff on the NAIVE values: pure calendar
            # arithmetic, independent of spark.sql.session.timeZone —
            # a cast-to-TIMESTAMP detour would re-interpret both in
            # session local time and drift across DST transitions
            lag = F.expr("timestampdiff(MICROSECOND, _pt, _t)")
        # materialize: each later step joins against this frame, and
        # an uncached lineage chain re-executes every earlier step's
        # subplan inside every later part — O(steps²) event-table scans
        agg = agg.localCheckpoint()
        parts.append(
            agg.agg(
                F.lit(k).alias("step"),
                F.lit(step_type).alias("event_type"),
                F.count("*").alias("n_users"),
                F.coalesce(F.sum(lag), F.lit(0)).cast("long").alias(
                    "sum_lag_us"
                ),
            )
        )
        prev = agg.select(user_col, "_t")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def group_trend(
    df,
    group_col: str,
    x_col: str,
    y_col: str,
    min_points: int = 2,
):
    """Per-group ordinary-least-squares trend (closed-form simple
    linear regression): slope and intercept of y over x for every
    group, plus r2 — the standard per-entity trend extraction
    (per-user value drift, per-sensor calibration, per-domain growth).

    Emits (group_col, n_points, slope, intercept, r2), all rounded to
    6 decimals; groups with fewer than ``min_points`` points or zero
    x-variance are dropped (no divide-by-zero rows).

    Scale shape: ONE map-side-combinable groupBy computing the five
    classic sufficient statistics (n, Σx, Σy, Σxy, Σx²[, Σy²]) — the
    data never moves twice, no window, no per-group collect; the
    closed-form solve is a codegen'd projection over the k-group
    aggregate. Keys are group ids, so skew equals group skew and AQE
    handles a dominant group.
    """
    from pyspark.sql import functions as F

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov / vx
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = F.when(vy == 0, F.lit(1.0)).otherwise(cov * cov / (vx * vy))
    return (
        agg.filter((F.col("n") >= F.lit(int(min_points))) & (vx != 0))
        .select(
            group_col,
            F.col("n").alias("n_points"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
    )
