"""Mergeable log2-histogram quantiles — fixed-memory percentile estimates.

Exact per-host percentiles (operators/anomaly's median/MAD path) need the
values; at 10^10 fetches a scheduler wants p50/p95/p99 response size and
latency per host from STATE THAT MERGES — per-partition histograms add
counter-wise, batch histograms append across micro-batches, and the
answer never needs a re-sort (the HdrHistogram/DDSketch idea with the
simplest possible bucket function). Relative error is bounded by the
bucket width: value v lands in bucket bit_length(v), whose upper bound
2^b - 1 is < 2x the true quantile — the fidelity a scheduler needs
("~4 KB vs ~1 MB"), not the one a billing system needs.

Bucketing uses the INTEGER bit length (length of the binary string), not
float log2 — bit-identical in every engine, no epsilon at the powers of
two. The sketch family companion to the count-min sketch (operators/cms):
cms answers point frequency, this answers the distribution shape.

Scale shape: one groupBy to (group, bucket) — at most ~64 rows per group,
map-side combine absorbs the raw stream; the quantile read is one
cumulative window + one aggregate over the tiny histogram table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def log2_histogram(
    df: DataFrame, value_col: str = "value", group_col: str = "host"
) -> DataFrame:
    """(group, bucket, cnt): bucket = bit_length(value) for value >= 1
    (clamped up to 1 — sizes/latencies of 0 share the first bucket).
    Merge histograms from disjoint slices by summing cnt per (group,
    bucket)."""
    v = F.greatest(F.col(value_col).cast("long"), F.lit(1))
    return (
        df.select(
            F.col(group_col).alias("group"),
            F.length(F.bin(v)).cast("int").alias("bucket"),
        )
        .groupBy("group", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, percents: tuple = (50, 95, 99)
) -> DataFrame:
    """(group, n, p<P>_est ...) from a log2_histogram: the estimate for
    percentile P is the UPPER BOUND (2^bucket - 1) of the first bucket
    whose cumulative count reaches ceil(P*n/100) — integer threshold
    arithmetic throughout, so engines agree exactly. Upper bounds are
    conservative: a politeness budgeter sizing from p95_est over-reserves,
    never starves."""
    w = (
        Window.partitionBy("group")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("group")
    cum = hist.select(
        "group",
        "bucket",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(tot).alias("_n"),
    )
    # 2^bucket is exact in a double up to bucket 52; bit_length of a long
    # caps at 63 only for values >= 2^52 = 4 PB — not a response size
    upper = (F.pow(F.lit(2.0), F.col("bucket")).cast("long") - 1).alias("_ub")
    aggs = [F.max("_n").alias("n")]
    marked = cum.select("*", upper)
    for p in percents:
        thr = F.floor((F.col("_n") * p + 99) / 100)  # ceil(p*n/100), integer
        aggs.append(
            F.min(F.when(F.col("_cum") >= thr, F.col("_ub"))).alias(
                f"p{p}_est"
            )
        )
    return marked.groupBy("group").agg(*aggs)
