"""Empirical-Bayes rate shrinkage — per-host rates you can act on.

reputation.host_reputation ranks hosts by the Wilson LOWER BOUND (a
pessimistic gate); when the pipeline instead needs the best ESTIMATE of
each host's true rate (yield, error rate, dup rate) to feed a scheduler
(waterfill budgets, recrawl priorities), the right tool is
beta-binomial empirical Bayes (Efron & Morris 1975's James-Stein idea
in its rate form): fit a Beta(alpha, beta) prior to the population of
hosts by method of moments, then shrink each host toward it

    shrunk = (s + alpha) / (n + alpha + beta)

so a 1/1 host lands near the population mean while a 900/1000 host
barely moves — the borrowing-strength estimate raw fractions can't give.

Scale shape: one groupBy(host) over the outcome log (the only
corpus-sized shuffle), one host-grain aggregate for the moments (rides
back as a 1-row broadcast), one closed-form map pass. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eb_shrink_rates(
    df: DataFrame,
    group_col: str,
    success_col: str,
    min_prior_strength: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """(group, n, s, raw_rate, shrunk_rate) per group.

    The Beta prior's strength alpha+beta = m(1-m)/var(raw rates) - 1 by
    method of moments (unweighted across groups — each host is one draw
    from the prior), floored at min_prior_strength; when the observed
    rate variance is zero the prior collapses to the global mean.
    """
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(success_col).cast("int")).alias("s"),
    )
    per = per.withColumn(
        "raw_rate", F.col("s").cast("double") / F.col("n")
    )
    mom = per.agg(
        F.avg("raw_rate").alias("_m"),
        F.var_pop("raw_rate").alias("_v"),
    )
    j = per.crossJoin(F.broadcast(mom))
    m = F.col("_m")
    strength = F.when(
        F.col("_v") > 0,
        F.greatest(
            m * (1.0 - m) / F.col("_v") - 1.0, F.lit(min_prior_strength)
        ),
    ).otherwise(F.lit(1e9))
    alpha = m * strength
    beta = (1.0 - m) * strength
    return j.select(
        F.col("grp").alias(group_col),
        "n",
        "s",
        F.round("raw_rate", round_digits).alias("raw_rate"),
        F.round(
            (F.col("s") + alpha) / (F.col("n") + alpha + beta),
            round_digits,
        ).alias("shrunk_rate"),
    )
