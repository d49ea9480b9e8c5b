"""Physical-plan inspection helpers — the contract-test primitives that
pin plan *shape* (no unexpected Exchange, bucketed joins stay
shuffle-free, partition predicates prune) rather than just results.

At 100 TB a plan regression (a lost broadcast, a new shuffle) is the
difference between minutes and hours; these helpers let tests catch it
as a plan diff at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan text, for layout assertions."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_exchange(df: DataFrame) -> str:
    """Raise if the executed plan contains any Exchange (shuffle or
    broadcast). Returns the plan text for further checks."""
    plan = executed_plan(df)
    if "Exchange" in plan:
        raise AssertionError(f"plan contains an Exchange:\n{plan}")
    return plan


def assert_no_single_partition_exchange(df: DataFrame) -> str:
    """Raise if the executed plan funnels data through a single
    partition (``Exchange SinglePartition`` — e.g. a global
    ``Window.orderBy`` with no partitionBy, or a global sort feeding
    row_number). Shuffles on real keys are allowed; ONE task holding
    the whole dataset is the scale-killer this guards against.
    Returns the plan text."""
    plan = executed_plan(df)
    if "SinglePartition" in plan:
        raise AssertionError(
            f"plan funnels through a single partition:\n{plan}"
        )
    return plan
