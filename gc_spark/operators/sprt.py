"""Sequential probability ratio test — earliest-possible source verdicts.

Trialing a new source (or render path, or mirror) fetch-by-fetch, the
scheduler wants to stop AS SOON as the evidence settles, not after a
fixed-n experiment. Wald's SPRT (1945) is the optimal sequential test:
accumulate the log-likelihood ratio of each Bernoulli outcome under
H1 (rate p1) vs H0 (rate p0) and stop at the first crossing of

    upper = ln((1-beta)/alpha)   ->  accept H1
    lower = ln(beta/(1-alpha))   ->  accept H0

It needs on average far fewer trials than the fixed-n test at the same
error rates — exactly the budget argument for a crawler. Complements
bandit.py (allocation) and proptest.py (fixed-n verdict) as the
sequential member of the experimentation family.

Scale shape: the LLR increment is a pure column expression; the running
sum is one window per source ordered by trial (source grain — the
politeness-window discipline), and the verdict row is a per-source
aggregate over the cumsum. No UDFs, no driver loops.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sprt_decisions(
    df: DataFrame,
    source_col: str,
    order_col: str,
    outcome_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
    round_digits: int = 6,
) -> DataFrame:
    """(source, n_trials, llr_final, decision, n_at_decision) per source.

    decision is 'accept_h1' / 'accept_h0' at the first boundary crossing
    in trial order (earliest crossing wins), or 'continue' if the walk
    never leaves (lower, upper). n_at_decision is the 1-based trial index
    of the verdict (NULL while continuing).
    """
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    inc = F.when(
        F.col(outcome_col).cast("int") == 1, F.lit(math.log(p1 / p0))
    ).otherwise(F.lit(math.log((1.0 - p1) / (1.0 - p0))))

    w = (
        Window.partitionBy(source_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(source_col).orderBy(order_col)
    walked = df.select(
        F.col(source_col).alias("source"),
        F.row_number().over(wn).alias("trial"),
        F.sum(inc).over(w).alias("llr"),
    )
    per = walked.groupBy("source").agg(
        F.count("*").alias("n_trials"),
        F.round(
            F.max_by(F.col("llr"), F.col("trial")), round_digits
        ).alias("llr_final"),
        F.min(F.when(F.col("llr") >= upper, F.col("trial"))).alias("_up"),
        F.min(F.when(F.col("llr") <= lower, F.col("trial"))).alias("_dn"),
    )
    first_cross = F.least(
        F.coalesce(F.col("_up"), F.lit(2**62)),
        F.coalesce(F.col("_dn"), F.lit(2**62)),
    )
    decision = (
        F.when(F.col("_up").isNull() & F.col("_dn").isNull(), "continue")
        .when(
            F.coalesce(F.col("_up"), F.lit(2**62))
            <= F.coalesce(F.col("_dn"), F.lit(2**62)),
            "accept_h1",
        )
        .otherwise("accept_h0")
    )
    return per.select(
        "source",
        "n_trials",
        "llr_final",
        decision.alias("decision"),
        F.when(
            F.col("_up").isNotNull() | F.col("_dn").isNotNull(), first_cross
        ).alias("n_at_decision"),
    )
