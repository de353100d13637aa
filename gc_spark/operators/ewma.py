"""Per-group exponentially-weighted moving average — the adaptive-crawl
health signal: a host's recent failure rate, discounted geometrically, is
what the retry/budget policy should key on (a host that failed all night
but recovered an hour ago must not stay throttled; a plain windowed mean
does exactly that wrong).

The batch form avoids the sequential fold entirely via the closed form

    ewma_n = alpha * sum_{i=1..n} x_i * (1-alpha)^(n-i)      (zero init)

which is one rank window + one aggregation — per-group rank assignment
(single hash-partition shuffle + in-partition sort) and a groupBy on the
SAME key, which Catalyst serves from the window's partitioning without a
second exchange. No collect_list, no UDF, no driver loop; group skew is
the window sort bound, same profile as every per-host operator here.

The streaming twin of this signal would carry (ewma, last_ts) in
applyInPandasWithState (gc_spark/streaming/state.py pattern); the batch
closed form is the oracle-checkable reference.

No reference twin: the reference's retry policy is a fixed count
(downloader middleware); this is its adaptive generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ewma_by_group(
    df: DataFrame,
    group_col: Column,
    order_col: str,
    value: Column,
    alpha: float = 0.3,
) -> DataFrame:
    """(group, n_events, ewma) — final EWMA of `value` per group in
    `order_col` order, zero-initialized, rounded to 6 dp."""
    wp = Window.partitionBy("_g")
    w = wp.orderBy(F.asc(order_col))
    ranked = (
        df.select(group_col.alias("_g"), F.col(order_col), value.alias("_x"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wp))
    )
    return ranked.groupBy(F.col("_g").alias("group")).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.lit(alpha)
            * F.sum(
                F.col("_x") * F.pow(F.lit(1.0 - alpha), F.col("_n") - F.col("_rn"))
            ),
            6,
        ).alias("ewma"),
    )
