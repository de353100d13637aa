"""Holt linear-trend exponential smoothing per series key — bandwidth /
fetch-volume forecasting for crawl capacity planning.

The scheduling operators (AIMD delay, water-filling budgets, bandwidth
windows) all act on a per-host traffic level; this operator produces the
forward-looking version: double exponential smoothing (Holt 1957) with
level l and trend b,

    l_1 = y_1, b_1 = 0
    l_t = alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1})
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

plus the one-step-ahead MAE (mean |y_t - (l_{t-1}+b_{t-1})|, t >= 2) as
the in-sample quality gate, and the h-step forecast l_T + h*b_T the
scheduler budgets against. No reference twin (the reference crawls a
fixed daily schedule — SURVEY.md §6 family).

Scale shape: the recurrence is inherently sequential WITHIN a key but
embarrassingly parallel ACROSS keys (hosts), so each series folds
JVM-side as one F.aggregate over its array_sort(collect_list(...)) —
one groupBy shuffle total, zero Python, zero joins. Series length is
bounded by the time-window grain upstream (a host-day at minute grain is
1440 points — well inside array limits); unbounded histories belong to
the streaming twin pattern (applyInPandasWithState), not this batch op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    df: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    y_col: str = "y",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """(key, n, level, trend, forecast, mae) per series; forecast =
    level + horizon*trend; mae is null for length-1 series. Rows within a
    key are ordered by t (ties then by y via the struct sort — pass a
    unique t for strict determinism)."""
    seq = F.array_sort(
        F.collect_list(
            F.struct(F.col(t_col).alias("t"), F.col(y_col).cast("double").alias("y"))
        )
    )
    zero = F.struct(
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0).alias("i"),
        F.lit(0.0).alias("sae"),
    )

    def step(acc: Column, x: Column) -> Column:
        l_new = F.lit(alpha) * x["y"] + F.lit(1.0 - alpha) * (acc["l"] + acc["b"])
        return F.when(
            acc["i"] == 0,
            F.struct(
                x["y"].alias("l"),
                F.lit(0.0).alias("b"),
                F.lit(1).alias("i"),
                F.lit(0.0).alias("sae"),
            ),
        ).otherwise(
            F.struct(
                l_new.alias("l"),
                (F.lit(beta) * (l_new - acc["l"]) + F.lit(1.0 - beta) * acc["b"]).alias("b"),
                (acc["i"] + 1).alias("i"),
                (acc["sae"] + F.abs(x["y"] - (acc["l"] + acc["b"]))).alias("sae"),
            )
        )

    st = df.groupBy(key_col).agg(
        F.aggregate(seq, zero, step).alias("_st"), F.count("*").alias("n")
    )
    r = round_digits
    return st.select(
        key_col,
        "n",
        F.round(F.col("_st")["l"], r).alias("level"),
        F.round(F.col("_st")["b"], r).alias("trend"),
        F.round(F.col("_st")["l"] + float(horizon) * F.col("_st")["b"], r).alias("forecast"),
        F.when(
            F.col("n") > 1, F.round(F.col("_st")["sae"] / (F.col("n") - 1), r)
        ).alias("mae"),
    )
