"""CUPED variance reduction — sharper A/B verdicts from pre-period data.

Crawl experiments are noisy because hosts differ wildly; but each unit's
PRE-experiment covariate (last month's bytes, historical yield) explains
much of that variance. CUPED (Deng, Xu, Kohavi & Walker, WSDM 2013 —
the industry-standard controlled-experiment technique) regresses it out:

    theta = cov(y, x) / var(x)
    y_adj = y - theta * (x - mean(x))

The adjusted metric has the same expectation per arm but variance
shrunk by the squared correlation — experiments conclude in a fraction
of the traffic. Completes the experimentation family: bandit.py
allocates, sprt.py stops early, proptest/ranktest judge, CUPED sharpens.

Scale shape: two algebraic aggregate passes (means, then centered
moments — the featcorr.py cancellation-safe discipline), each a single
map-side-combined scan with the means riding as a 1-row broadcast. One
output row. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuped_adjusted(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    covariate_col: str,
    group_a: str,
    group_b: str,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (group_a, group_b, n_a, n_b, theta, diff_raw, diff_adj,
    var_reduction). theta is fit on the pooled sample (standard CUPED);
    var_reduction = 1 - var(y_adj)/var(y), the fraction of metric
    variance the covariate removed."""
    g = F.col(group_col)
    both = df.where(g.isin([group_a, group_b]))
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")

    means = both.agg(F.avg(y).alias("_my"), F.avg(x).alias("_mx"))
    c = both.crossJoin(F.broadcast(means))
    yc = y - F.col("_my")
    xc = x - F.col("_mx")
    stats = c.agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).alias("n_b"),
        F.sum(xc * xc).alias("_vx"),
        F.sum(yc * yc).alias("_vy"),
        F.sum(xc * yc).alias("_cxy"),
        F.sum(F.when(g == group_a, y).otherwise(0.0)).alias("_ya"),
        F.sum(F.when(g == group_b, y).otherwise(0.0)).alias("_yb"),
        F.sum(F.when(g == group_a, x).otherwise(0.0)).alias("_xa"),
        F.sum(F.when(g == group_b, x).otherwise(0.0)).alias("_xb"),
        F.max(F.col("_mx")).alias("_mx"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    theta = F.col("_cxy") / F.col("_vx")
    mean_a_adj = F.col("_ya") / na - theta * (F.col("_xa") / na - F.col("_mx"))
    mean_b_adj = F.col("_yb") / nb - theta * (F.col("_xb") / nb - F.col("_mx"))
    var_red = theta * theta * F.col("_vx") / F.col("_vy")
    return stats.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        "n_a",
        "n_b",
        F.round(theta, round_digits).alias("theta"),
        F.round(F.col("_ya") / na - F.col("_yb") / nb, round_digits).alias(
            "diff_raw"
        ),
        F.round(mean_a_adj - mean_b_adj, round_digits).alias("diff_adj"),
        F.round(var_red, round_digits).alias("var_reduction"),
    )
