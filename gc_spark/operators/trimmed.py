"""Exact trimmed mean per group — the robust latency/size metric.

Averages of crawl metrics are ruined by tails (one 500 MB PDF, one
60-second timeout); the p%-trimmed mean is the standard robust center
the sketches (ddsketch/qsketch) only approximate. This is the EXACT
order statistic, computed without any per-row sort:

    keep ranks lo+1 .. n-lo  (lo = floor(trim_frac * n)),
    mean over kept values.

Scale shape (the ranktest/kstest discipline): each group contracts to
DISTINCT-VALUE grain (one groupBy), the rank interval each value spans
comes from a value-grain cumulative sum, and the kept mass per value is
a closed-form interval overlap:

    kept(v) = max(0, min(cum_end, n-lo) - max(cum_start, lo))

so a billion-row group with a million distinct values does one
million-row window, not a billion-row sort. One output row per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_frac: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """(group, n, n_trimmed, mean_raw, mean_trimmed) per group;
    n_trimmed counts the rows removed (lo from each side). Groups where
    trimming would remove everything (n <= 2*lo) fall back to the raw
    mean with n_trimmed = 0."""
    if not 0.0 <= trim_frac < 0.5:
        raise ValueError("trim_frac must be in [0, 0.5)")
    v = F.col(value_col).cast("double")
    vals = (
        df.groupBy(F.col(group_col).alias("group"), v.alias("_v"))
        .agg(F.count("*").alias("_c"))
        # feeds both the cumulative window and the group totals: lazy
        # checkpoint = one corpus scan instead of two
        .localCheckpoint(eager=False)
    )
    w = (
        Window.partitionBy("group")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.withColumn(
        "_start", F.coalesce(F.sum("_c").over(w), F.lit(0))
    ).withColumn("_end", F.col("_start") + F.col("_c"))
    tot = vals.groupBy("group").agg(
        F.sum("_c").alias("n"),
        F.sum(F.col("_v") * F.col("_c")).alias("_sv"),
    )
    lo = F.floor(F.lit(float(trim_frac)) * F.col("n"))
    hi = F.col("n") - lo
    joined = cum.join(tot, "group").select(
        "group",
        "n",
        "_v",
        lo.alias("_lo"),
        "_sv",
        F.greatest(
            F.lit(0),
            F.least(F.col("_end"), hi) - F.greatest(F.col("_start"), lo),
        ).alias("_kept"),
    )
    agg = joined.groupBy("group", "n", "_lo", "_sv").agg(
        F.sum("_kept").alias("_nk"),
        F.sum(F.col("_v") * F.col("_kept")).alias("_sk"),
    )
    r = round_digits
    usable = F.col("_nk") > 0
    return agg.select(
        "group",
        "n",
        F.when(usable, (F.lit(2) * F.col("_lo"))).otherwise(F.lit(0)).alias(
            "n_trimmed"
        ),
        F.round(F.col("_sv") / F.col("n").cast("double"), r).alias("mean_raw"),
        F.round(
            F.when(usable, F.col("_sk") / F.col("_nk").cast("double")).otherwise(
                F.col("_sv") / F.col("n").cast("double")
            ),
            r,
        ).alias("mean_trimmed"),
    )
