"""Horvitz-Thompson estimation from an unequal-probability crawl sample.

A budgeted crawl is a biased sample: urgent sources get fetched at a
higher rate than the long tail. Totals computed naively over what was
fetched understate the corpus. The Horvitz-Thompson estimator fixes this
by inverse-probability weighting: each sampled row contributes y/pi,
where pi is its (known) inclusion probability, giving an unbiased total
(Horvitz & Thompson 1952). Under Poisson sampling the variance is also
closed-form: Var = sum((1-pi)/pi^2 * y^2).

This is the reporting twin of sampling.stratified_sample: that op TAKES
the sample, this one reads totals back out of it without bias — the
"estimated corpus bytes / docs per stratum" line in a crawl report.

Scale shape: one groupBy over the stratum column (map-side combined,
stratum-grain output), plus an optional one-row overall rollup unioned
in. Pure column expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ht_stratified_total(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    pi_col: str,
    include_overall: bool = True,
    round_digits: int = 6,
) -> DataFrame:
    """(stratum, n_sampled, ht_count, ht_total, se) per stratum, plus an
    '__all__' rollup row when include_overall.

    ht_count estimates the stratum's true row count (sum 1/pi); ht_total
    the true sum of value_col (sum y/pi); se the Poisson-sampling
    standard error of ht_total.
    """
    y = F.col(value_col).cast("double")
    pi = F.col(pi_col).cast("double")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_sampled"),
        F.round(F.sum(1.0 / pi), round_digits).alias("ht_count"),
        F.round(F.sum(y / pi), round_digits).alias("ht_total"),
        F.round(
            F.sqrt(F.sum((1.0 - pi) / (pi * pi) * y * y)), round_digits
        ).alias("se"),
    )
    if not include_overall:
        return per
    overall = df.agg(
        F.count("*").alias("n_sampled"),
        F.round(F.sum(1.0 / pi), round_digits).alias("ht_count"),
        F.round(F.sum(y / pi), round_digits).alias("ht_total"),
        F.round(
            F.sqrt(F.sum((1.0 - pi) / (pi * pi) * y * y)), round_digits
        ).alias("se"),
    ).select(F.lit("__all__").alias("stratum"), "*")
    return per.unionByName(overall)
