"""Ordered funnel analysis — how many users complete step 1 -> 2 -> ...
IN ORDER, and where do they drop off?

Sessionization (operators/sessions) cuts a user's event stream into
visits; the funnel asks the product question over the whole stream: of
the users who did A, how many later did B, then later C (strict
temporal order, the standard "unbounded window" funnel). Each step's
timestamp is the EARLIEST event of that type after the previous step's
timestamp — the greedy choice, which is optimal for ordered funnels
(taking the earliest possible step never excludes a later completion).

Scale shape: step k is ONE user-grain join (the step-k event slice
against the step-(k-1) completion table, both keyed by user) plus a
min-aggregate — no per-user array folds, no windows, so a user with
10^6 events costs what their event count costs and nothing more. The
result is a steps-sized table of counts with conversion ratios.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    round_digits: int = 6,
) -> DataFrame:
    """(step_idx, step, n_users, rate_from_first, rate_from_prev) — one
    row per funnel step; rates are vs step 1 and vs the previous step
    (rate_from_prev of step 1 is 1.0). Empty steps propagate zeros."""
    if not steps:
        raise ValueError("steps must be non-empty")
    u = F.col(user_col).alias("_u")
    reached = (
        df.where(F.col(step_col) == steps[0])
        .groupBy(u)
        .agg(F.min(ts_col).alias("_t"))
    )
    counts = [reached.agg(F.count("*").alias("n"))]
    for s in steps[1:]:
        ev = df.where(F.col(step_col) == s).select(
            u, F.col(ts_col).alias("_ts")
        )
        reached = (
            ev.join(reached.select("_u", "_t"), "_u")
            .where(F.col("_ts") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
        )
        counts.append(reached.agg(F.count("*").alias("n")))

    rows = counts[0].select(
        F.lit(1).alias("step_idx"), F.lit(steps[0]).alias("step"), "n"
    )
    for i, c in enumerate(counts[1:], start=2):
        rows = rows.unionByName(
            c.select(
                F.lit(i).alias("step_idx"),
                F.lit(steps[i - 1]).alias("step"),
                "n",
            )
        )
    first = counts[0].select(F.col("n").alias("_n1"))
    from pyspark.sql.window import Window

    w = Window.orderBy("step_idx")
    r = round_digits
    return (
        rows.crossJoin(F.broadcast(first))
        .withColumn("_np", F.lag("n", 1).over(w))
        .select(
            "step_idx",
            "step",
            F.col("n").alias("n_users"),
            F.when(F.col("_n1") > 0, F.round(F.col("n") / F.col("_n1"), r))
            .otherwise(F.lit(0.0))
            .alias("rate_from_first"),
            F.when(F.col("_np").isNull(), F.lit(1.0))
            .when(F.col("_np") > 0, F.round(F.col("n") / F.col("_np"), r))
            .otherwise(F.lit(0.0))
            .alias("rate_from_prev"),
        )
    )
