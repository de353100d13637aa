"""Host reputation — Wilson lower-bound scoring of per-host document
quality (the RefinedWeb/CCNet-style "drop bad hosts wholesale" gate).

A naive good/total fraction ranks a 1-doc host at 100% above a 990/1000
host; the Wilson score interval's lower bound penalizes small samples the
right amount, so hosts only earn trust with evidence. Everything is one
groupBy(host) with map-side partial counts followed by closed-form
per-row arithmetic — a single shuffle whose output is host-cardinality
(millions of rows at web scale, not corpus-scale), cheap enough to
recompute every crawl batch.

The formula is kept textually identical to the ANSI-SQL oracle so both
engines execute the same IEEE double ops:

  lb = (p + z²/2n − z·sqrt(p(1−p)/n + z²/4n²)) / (1 + z²/n)

No reference twin: gamechanger-crawlers trusts a fixed allowlist of 41
sites; this is the open-web generalization (SURVEY.md §6 family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_reputation(
    df: DataFrame,
    good: Column,
    host_col: str = "source",
    z: float = 1.96,
    trust_threshold: float = 0.5,
) -> DataFrame:
    """(host, n_docs, n_good, wilson_lb, trusted) per host; wilson_lb is
    the z-level Wilson lower bound on the true good fraction, rounded to
    6 dp; trusted = wilson_lb >= trust_threshold."""
    agg = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("n_docs"),
        F.sum(good.cast("int")).cast("bigint").alias("n_good"),
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_good").cast("double") / n
    z2 = z * z
    lb = (
        p
        + F.lit(z2) / (2.0 * n)
        - z * F.sqrt(p * (1.0 - p) / n + F.lit(z2) / (4.0 * n * n))
    ) / (1.0 + F.lit(z2) / n)
    return agg.select(
        "host",
        "n_docs",
        "n_good",
        F.round(lb, 6).alias("wilson_lb"),
        (F.round(lb, 6) >= trust_threshold).alias("trusted"),
    )
