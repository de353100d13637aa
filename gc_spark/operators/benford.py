"""Benford first-digit deviation — a numeric-metadata spam/forgery signal.

Naturally-occurring positive magnitudes (file sizes, prices, view counts)
follow Benford's law: P(first digit = d) = log10(1 + 1/d). Fabricated or
machine-generated numbers usually don't — uniform first digits are the
classic forensic tell (Benford 1938; Nigrini's fraud-audit practice).
For a crawl, a source whose document sizes or reported counts deviate
hard from Benford is a link-farm / generated-content suspect, the same
alarm family as linkspam.py's farm detection and the Hill power-law
shape test — but over numeric metadata instead of graph shape.

Scale shape: first digits are pure column math (log10/floor/power), so
the only corpus-sized shuffle is one (group, digit) count with map-side
combine; the chi-square fold then runs on the <= 9-rows-per-group digit
table (group-grain joins only). No UDFs, nothing collected.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# chi-square 95th percentile at 8 degrees of freedom (9 digits - 1)
CHI2_95_DF8 = 15.507


def benford_deviation(
    df: DataFrame,
    group_col: str,
    value_col: str,
    alarm_chi2: float = CHI2_95_DF8,
    round_digits: int = 6,
) -> DataFrame:
    """(group, n, chi2, tvd, top_digit_share, benford_alarm) per group.

    Non-positive / null values are ignored. chi2 is Pearson's statistic
    of the observed first-digit counts against Benford expectation; tvd
    the total-variation distance between the two distributions;
    benford_alarm true when chi2 exceeds alarm_chi2 (default: the 95th
    percentile at 8 df). Digits with zero observations contribute their
    full expected mass to both statistics (n*p to chi2, p/2 to tvd) via
    the missing-mass correction terms.
    """
    v = F.col(value_col).cast("double")
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    digits = (
        df.where(v > 0)
        .select(F.col(group_col).alias("grp"), digit.alias("d"))
        .groupBy("grp", "d")
        .agg(F.count("*").alias("obs"))
    )

    # Benford share per observed digit, as a CASE fold (no join needed)
    expr = F.when(F.col("d") == 1, F.lit(math.log10(2.0)))
    for d in range(2, 10):
        expr = expr.when(F.col("d") == d, F.lit(math.log10(1.0 + 1.0 / d)))
    per = digits.withColumn("p", expr.otherwise(F.lit(0.0)))

    # Unobserved digits still carry expected mass: chi2 gets n*p and tvd
    # gets p/2 for each. Adding n*(1 - sum_observed p) and
    # (1 - sum_observed p)/2 folds all of them in without densifying.
    totals = digits.groupBy("grp").agg(F.sum("obs").alias("ntot"))
    folded = (
        per.join(totals, "grp")
        .groupBy("grp")
        .agg(
            F.max("ntot").alias("n"),
            F.sum(F.col("p")).alias("p_seen"),
            F.sum(
                F.pow(F.col("obs") - F.col("p") * F.col("ntot"), F.lit(2.0))
                / (F.col("p") * F.col("ntot"))
            ).alias("chi2_seen"),
            F.sum(F.abs(F.col("obs") / F.col("ntot") - F.col("p"))).alias(
                "tvd_seen"
            ),
            F.max(F.col("obs")).alias("top_obs"),
        )
    )
    miss = F.lit(1.0) - F.col("p_seen")
    return folded.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(F.col("chi2_seen") + F.col("n") * miss, round_digits).alias(
            "chi2"
        ),
        F.round((F.col("tvd_seen") + miss) / 2.0, round_digits).alias("tvd"),
        F.round(
            F.col("top_obs").cast("double") / F.col("n"), round_digits
        ).alias("top_digit_share"),
        (
            F.round(F.col("chi2_seen") + F.col("n") * miss, round_digits)
            > F.lit(alarm_chi2)
        ).alias("benford_alarm"),
    )
