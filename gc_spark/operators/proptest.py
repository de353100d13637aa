"""Two-proportion z-test — did the crawl-policy change move the needle?

The standard A/B readout for binary outcomes (fetch succeeded, doc kept,
dedup hit): pooled two-proportion z

    z = (p_a - p_b) / sqrt(p_pool (1 - p_pool) (1/n_a + 1/n_b))

(any intro stats text; the pooled form is the null-hypothesis-correct
one). A politeness-budget tweak or UA rotation rolled out to half the
hosts reads its verdict off this one row — the experimentation twin of
bandit.py, which ALLOCATES traffic while this op JUDGES the outcome.

Scale shape: a single conditional aggregate over the outcome log — one
map-side-combined pass, zero joins, zero windows. One output row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a: str,
    group_b: str,
    z_crit: float = 1.959964,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (group_a, group_b, n_a, n_b, p_a, p_b, z, significant).
    success_col is truthy 0/1 (cast to double); rows in neither group
    are ignored; significant is |z| > z_crit (default: two-sided 5%)."""
    g = F.col(group_col)
    s = F.col(success_col).cast("double")
    agg = df.where(g.isin([group_a, group_b])).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(g == group_a, s).otherwise(0.0)).alias("_sa"),
        F.sum(F.when(g == group_b, s).otherwise(0.0)).alias("_sb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.col("_sa") / na
    pb = F.col("_sb") / nb
    pool = (F.col("_sa") + F.col("_sb")) / (na + nb)
    z = (pa - pb) / F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    return agg.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        "n_a",
        "n_b",
        F.round(pa, round_digits).alias("p_a"),
        F.round(pb, round_digits).alias("p_b"),
        F.round(z, round_digits).alias("z"),
        (F.abs(F.round(z, round_digits)) > F.lit(z_crit)).alias(
            "significant"
        ),
    )
