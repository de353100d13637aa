"""Welch's unequal-variance t-test — mean comparison for continuous
crawl metrics.

The experimentation family covers proportions (proptest.py), ranks
(ranktest.py) and full distributions (kstest.py); the missing readout
is the plain "did the MEAN move" with the variance-robust default every
stats package ships (Welch 1947 — never pooled-variance Student, whose
false-positive rate explodes under variance imbalance):

    t  = (m_a - m_b) / sqrt(s2_a/n_a + s2_b/n_b)
    df = (s2_a/n_a + s2_b/n_b)^2
         / ((s2_a/n_a)^2/(n_a-1) + (s2_b/n_b)^2/(n_b-1))

with SAMPLE variances (ddof=1). Variances come from a second centered
pass (means broadcast back, then sum of squared deviations) — the
featcorr.py discipline: the one-pass raw-sum identity cancels away
exactly the digits an A/B readout on a large-offset metric needs.

Scale shape: two aggregates over the group pair (map-side partials),
a 2-row broadcast join between them, one output row. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    t_crit: float = 1.959964,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (n_a, n_b, mean_a, mean_b, t, df_welch, significant).
    significant compares |t| against t_crit (default: the z critical
    value — with crawl-scale n the t and normal quantiles agree).
    ALWAYS exactly one row: a missing/empty group or a single-row group
    (undefined variance) surfaces as NULLs on that side rather than an
    empty frame a caller could mistake for a clean no-result."""
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    sub = df.where(g.isin([group_a, group_b])).select(
        g.alias("_g"), v.alias("_v")
    )
    means = sub.groupBy("_g").agg(
        F.avg("_v").alias("_m"), F.count("*").alias("_n")
    )
    cent = (
        sub.join(means, "_g")
        .groupBy("_g")
        .agg(
            F.sum((F.col("_v") - F.col("_m")) * (F.col("_v") - F.col("_m"))).alias(
                "_ssd"
            )
        )
    )
    st = means.join(cent, "_g").select(
        "_g",
        "_n",
        "_m",
        # n==1 leaves variance undefined: NULL, not an ANSI 0/0 error
        F.when(
            F.col("_n") >= 2, F.col("_ssd") / (F.col("_n") - 1).cast("double")
        ).alias("_s2"),
    )
    a = st.where(F.col("_g") == group_a).select(
        F.lit(1).alias("_one"),
        F.col("_n").alias("n_a"), F.col("_m").alias("_ma"), F.col("_s2").alias("_va")
    )
    b = st.where(F.col("_g") == group_b).select(
        F.lit(1).alias("_one"),
        F.col("_n").alias("n_b"), F.col("_m").alias("_mb"), F.col("_s2").alias("_vb")
    )
    # r6 (ADVICE ttest.py:70): degenerate inputs SURFACE instead of
    # vanishing — a missing/empty group (e.g. a misspelled label) or a
    # single-row group (NULL _s2) now yields ONE row with NULL stats on
    # the missing side, where the r5 crossJoin silently returned zero
    # rows. With both groups present and n >= 2 the output is unchanged.
    one = df.sparkSession.range(1).select(F.lit(1).alias("_one"))
    j = (
        one.join(F.broadcast(a), "_one", "left")
        .join(F.broadcast(b), "_one", "left")
        .drop("_one")
    )
    sa = F.col("_va") / F.col("n_a").cast("double")
    sb = F.col("_vb") / F.col("n_b").cast("double")
    t = (F.col("_ma") - F.col("_mb")) / F.sqrt(sa + sb)
    dfw = (
        (sa + sb)
        * (sa + sb)
        / (
            sa * sa / (F.col("n_a") - 1).cast("double")
            + sb * sb / (F.col("n_b") - 1).cast("double")
        )
    )
    r = round_digits
    return j.select(
        "n_a",
        "n_b",
        F.round("_ma", r).alias("mean_a"),
        F.round("_mb", r).alias("mean_b"),
        F.round(t, r).alias("t"),
        F.round(dfw, r).alias("df_welch"),
        (F.abs(F.round(t, r)) > F.lit(t_crit)).alias("significant"),
    )
