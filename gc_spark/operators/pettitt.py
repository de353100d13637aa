"""Pettitt change-point test — WHERE did a host's behavior change?

The streaming CUSUM twin (streaming/state.py) flags that a drift is in
progress; the batch question after the fact is "at which fetch did the
latency/size/error regime shift". Pettitt (1979) is the standard
nonparametric single-change-point test — a Mann-Whitney statistic swept
over every split point, needing no distributional assumptions:

    U_t = 2 * sum_{i<=t} r_i - t (n + 1)      (r_i = mid-ranks)
    K   = max_{t<n} |U_t|,  changepoint = first argmax
    p   = 2 exp(-6 K^2 / (n^3 + n^2))         (clamped to <= 1)

Scale shape: sequential-within-key, parallel-across-keys (the
holt/acf contract — series bounded by the upstream time grain).
Mid-ranks come from the DISTINCT-VALUE contraction per key (the
ranktest.py trick: tied observations collapse before ranking), the
prefix sum S_t is one per-key window in time order, and the argmax is
one more per-key window. No UDFs, no self-joins — the O(n^2) textbook
sweep collapses to two windows via the rank identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pettitt_test(
    df: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    y_col: str = "y",
    round_digits: int = 6,
) -> DataFrame:
    """(key, n, cp_t, k_stat, p_value) per series: cp_t is the t value
    of the FIRST maximal |U_t| split (the last point of the left
    segment); series of length < 2 produce no row."""
    v = F.col(y_col).cast("double")
    obs = df.select(F.col(key_col).alias("_k"), F.col(t_col).alias("_t"), v.alias("_v"))

    # mid-ranks at distinct-value grain per key
    vals = obs.groupBy("_k", "_v").agg(F.count("*").alias("_c"))
    w_rank = (
        Window.partitionBy("_k")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranks = vals.withColumn(
        "_avg_rank",
        F.coalesce(F.sum("_c").over(w_rank), F.lit(0)) + (F.col("_c") + 1) / 2.0,
    ).select("_k", "_v", "_avg_rank")

    w_time = Window.partitionBy("_k").orderBy("_t")
    nn = obs.groupBy("_k").agg(F.count("*").alias("n"))
    walked = (
        obs.join(ranks, ["_k", "_v"])
        .withColumn("_s", F.sum("_avg_rank").over(w_time))
        .withColumn("_i", F.row_number().over(w_time))
        .join(nn, "_k")
        .where(F.col("_i") < F.col("n"))  # U_n is identically 0
        .select(
            "_k",
            "_t",
            "n",
            (F.lit(2.0) * F.col("_s") - F.col("_i") * (F.col("n") + 1).cast("double")).alias("_u"),
        )
    )
    w_pick = Window.partitionBy("_k").orderBy(
        F.desc(F.abs(F.col("_u"))), F.asc("_t")
    )
    best = walked.withColumn("_r", F.row_number().over(w_pick)).where(
        F.col("_r") == 1
    )
    nd = F.col("n").cast("double")
    k = F.abs(F.col("_u"))
    p = F.least(
        F.lit(1.0),
        F.lit(2.0) * F.exp(F.lit(-6.0) * k * k / (nd * nd * nd + nd * nd)),
    )
    r = round_digits
    return best.select(
        F.col("_k").alias(key_col),
        "n",
        F.col("_t").alias("cp_t"),
        F.round(k, r).alias("k_stat"),
        F.round(p, r).alias("p_value"),
    )
