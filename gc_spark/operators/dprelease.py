"""Differentially-private count release — epsilon-Laplace noisy per-group
counts for publishing crawl statistics.

The privacy family so far AUDITS (k-anonymity/l-diversity, q184) and
REDACTS (PII spans, Luhn PAN, pseudonymization); this operator RELEASES:
per-group counts (URLs per host, docs per source) with Laplace noise
calibrated to sensitivity/epsilon (Dwork et al., TCC 2006), the standard
mechanism for publishing a crawl census without exposing whether any one
document is in it.

Noise is DETERMINISTIC given (group, salt): the same portable
sha256-prefix uniform the sampling/bootstrap operators use
(bootstrap.uniform01_col — reproducible bit-for-bit in the SQL oracle),
mapped through the Laplace inverse CDF

    noise = -(sensitivity/epsilon) * sign(u - 1/2) * ln(1 - 2|u - 1/2|)

u in (0,1) exclusive by construction ((h%1e6 + 0.5)/1e6), so the log
argument is >= 1e-6 and the noise is finite. A production release swaps
the salt for a fresh secret per release epoch — determinism per (group,
salt) is exactly the "one draw per release" the privacy accounting
assumes (re-running a release must NOT average away the noise).

Scale shape: one groupBy(group) count, then pure map-side expressions on
the |groups|-row result. No UDFs, nothing but the count shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.bootstrap import uniform01_col


def laplace_release(
    df: DataFrame,
    group_col: str = "group",
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    salt: str = "dp-release",
) -> DataFrame:
    """(group, released, epsilon, scale) — noisy count per group, clamped
    at 0 and rounded to integer (post-processing preserves the DP
    guarantee). `released` is the ONLY data-derived output column; the
    true count never leaves the plan."""
    counts = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").cast("double").alias("_n")
    )
    scale = float(sensitivity) / float(epsilon)
    u = uniform01_col(F.col("group"), salt)
    v = u - F.lit(0.5)
    noise = (
        F.lit(-scale)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )
    return counts.select(
        "group",
        F.greatest(F.lit(0), F.round(F.col("_n") + noise, 0).cast("long")).alias(
            "released"
        ),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(scale).alias("scale"),
    )
