"""Mann-Whitney U — distribution-shift test without normality assumptions.

Proportions (proptest.py) cover binary outcomes; for CONTINUOUS crawl
metrics (page bytes, fetch latency) whose distributions are heavy-tailed,
the rank-sum test is the standard nonparametric A/B readout (Mann &
Whitney 1947), with the normal approximation and the tie correction
every stats package applies:

    U_a = R_a - n_a(n_a+1)/2,   mu = n_a n_b / 2
    sigma^2 = n_a n_b / 12 * ((N+1) - sum(t^3 - t) / (N (N-1)))

Scale shape: the corpus contracts to DISTINCT-VALUE grain first (one
groupBy — tied observations collapse into (value, n_a, n_b) rows), so
ranks are computed over the value table, not the row table. The prefix
sum over values is two-phased exactly like curriculum.py's dense
numbering: a local window inside each fixed-width value range shard plus
broadcast per-shard offsets — no single global sort at any scale. One
output row. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    shard_width: float = 16.0,
    z_crit: float = 1.959964,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (n_a, n_b, u_a, mu, sigma, z, significant). shard_width
    is the value-range width of each prefix-sum shard — pick it so a
    shard holds a bounded slice of the distinct-value space."""
    g = F.col(group_col)
    vals = (
        df.where(g.isin([group_a, group_b]))
        .groupBy(F.col(value_col).cast("double").alias("v"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("na"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("nb"),
        )
        .withColumn("t", F.col("na") + F.col("nb"))
        .withColumn("_shard", F.floor(F.col("v") / F.lit(shard_width)))
        # feeds both the local cumsum and the shard totals: lazy
        # checkpoint = one corpus scan instead of two
        .localCheckpoint(eager=False)
    )
    # two-phase prefix sum of t in value order: local cumsum within each
    # range shard + broadcast cumulative offsets at shard grain
    w_local = (
        Window.partitionBy("_shard")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = vals.withColumn(
        "_cum_local", F.coalesce(F.sum("t").over(w_local), F.lit(0))
    )
    shard_tot = vals.groupBy("_shard").agg(F.sum("t").alias("_st"))
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = shard_tot.withColumn(
        "_off", F.coalesce(F.sum("_st").over(w_off), F.lit(0))
    ).select("_shard", "_off")
    ranked = local.join(F.broadcast(offsets), "_shard").withColumn(
        "avg_rank",
        F.col("_off") + F.col("_cum_local") + (F.col("t") + 1) / 2.0,
    )

    agg = ranked.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(F.col("na") * F.col("avg_rank")).alias("_ra"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("_tie"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    u_a = F.col("_ra") - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    sigma = F.sqrt(
        na * nb / 12.0 * ((nn + 1.0) - F.col("_tie") / (nn * (nn - 1.0)))
    )
    z = (u_a - mu) / sigma
    return agg.select(
        "n_a",
        "n_b",
        F.round(u_a, round_digits).alias("u_a"),
        F.round(mu, round_digits).alias("mu"),
        F.round(sigma, round_digits).alias("sigma"),
        F.round(z, round_digits).alias("z"),
        (F.abs(F.round(z, round_digits)) > F.lit(z_crit)).alias(
            "significant"
        ),
    )
