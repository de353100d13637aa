"""Kolmogorov-Smirnov two-sample test — binless distribution-shift
detection between crawl cohorts.

The drift family bins (PSI, drift.py) or ranks (Mann-Whitney,
ranktest.py); KS asks the sharper question both dodge: what is the
LARGEST gap anywhere between the two empirical CDFs? Standard readout
for "did this source's page-size / latency / quality-score distribution
change shape", sensitive to location AND shape shifts, with the classic
asymptotic p-value (Smirnov 1948; the Press et al. lambda correction):

    D   = sup_x |F_a(x) - F_b(x)|
    en  = sqrt(n_a n_b / (n_a + n_b))
    lam = (sqrt(en) + 0.12 + 0.11/sqrt(en)) * D
    p   = 2 * sum_{j=1..5} (-1)^{j-1} exp(-2 j^2 lam^2)   (clamped to [0,1])

The 5-term truncation is exact to ~1e-7 for lam >= 0.5 and is evaluated
with IDENTICAL literals in the SQL oracle; lam is computed from the
6dp-ROUNDED D so both engines take the same branch everywhere.

Scale shape (the ranktest.py discipline): the corpus contracts to
DISTINCT-VALUE grain first (one groupBy), then the ECDF prefix sums are
two-phased — a local cumsum inside fixed-width value-range shards plus
broadcast per-shard offsets — so there is no single global sort at any
scale. One output row. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    shard_width: float = 16.0,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (n_a, n_b, d_stat, p_value). d_stat is the max ECDF gap
    over the distinct observed values; p_value the 5-term asymptotic
    series. shard_width is the value-range width of each prefix-sum
    shard (pick it so a shard holds a bounded slice of value space)."""
    g = F.col(group_col)
    vals = (
        df.where(g.isin([group_a, group_b]))
        .groupBy(F.col(value_col).cast("double").alias("v"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("cb"),
        )
        .withColumn("_shard", F.floor(F.col("v") / F.lit(shard_width)))
        # the contraction feeds BOTH the local cumsum and the shard
        # totals: materialize lazily so the corpus is scanned once,
        # not once per consumer
        .localCheckpoint(eager=False)
    )
    # two-phase INCLUSIVE prefix sums of both group counts in value order
    w_local = (
        Window.partitionBy("_shard")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = vals.withColumn("_la", F.sum("ca").over(w_local)).withColumn(
        "_lb", F.sum("cb").over(w_local)
    )
    shard_tot = vals.groupBy("_shard").agg(
        F.sum("ca").alias("_sa"), F.sum("cb").alias("_sb")
    )
    w_off = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_tot.select(
        "_shard",
        F.coalesce(F.sum("_sa").over(w_off), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_sb").over(w_off), F.lit(0)).alias("_ob"),
    )
    cum = local.join(F.broadcast(offsets), "_shard").select(
        (F.col("_oa") + F.col("_la")).alias("cum_a"),
        (F.col("_ob") + F.col("_lb")).alias("cum_b"),
    )
    # group totals at shard grain (tiny) — broadcast back for the ECDFs
    totals = shard_tot.agg(
        F.sum("_sa").alias("n_a"), F.sum("_sb").alias("n_b")
    )

    agg = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("cum_a") / F.col("n_a").cast("double")
                    - F.col("cum_b") / F.col("n_b").cast("double")
                )
            ).alias("_d"),
        )
    )
    d = F.round(F.col("_d"), round_digits)
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    en = F.sqrt(na * nb / (na + nb))
    lam = (F.sqrt(en) + F.lit(0.12) + F.lit(0.11) / F.sqrt(en)) * d
    series = sum(
        (
            F.lit(2.0 * (1.0 if j % 2 == 1 else -1.0))
            * F.exp(F.lit(-2.0 * j * j) * lam * lam)
            for j in range(1, 6)
        ),
        F.lit(0.0),
    )
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), series))
    return agg.select(
        "n_a",
        "n_b",
        d.alias("d_stat"),
        F.round(p, round_digits).alias("p_value"),
    )
