"""Crawl-budget concentration — Gini / Lorenz / Herfindahl per family.

"Is the crawl budget spread across hosts or burned on a handful?" is an
operations question every scheduler report answers with concentration
indices: the Gini coefficient (area between the Lorenz curve and the
diagonal), the Herfindahl-Hirschman index (sum of squared shares), and
the single largest unit's share. A family whose Gini drifts toward 1 is
being monopolized by one host — the skew the politeness salter and
waterfill budgets exist to prevent, here measured instead of assumed.

Gini over the sorted-ascending weights x_1..x_n uses the closed rank
form G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n (equal weights tie-break
arbitrarily; the sum is invariant under permutations within ties, so the
result is deterministic regardless of tie order).

Scale shape: input is contracted to unit grain first (one corpus-sized
groupBy by the caller or here); the rank window partitions by family and
only ever sorts unit-grain rows — the politeness discipline of windowing
at host grain, never at row grain. Everything else is per-family
aggregates. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gini_concentration(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    weight_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """(group, n_units, total, gini, hhi, top_share) per group.

    df is one-row-per-(group, unit) with a non-negative weight (contract
    raw rows to that grain first). gini=0 is a perfectly even spread;
    hhi is the sum of squared weight shares; top_share the largest
    single unit's share.
    """
    units = df.select(
        F.col(group_col).alias("grp"),
        F.col(unit_col).alias("unit"),
        F.col(weight_col).cast("double").alias("x"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("x").asc(), F.col("unit").asc())
    ranked = units.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("grp")
        .agg(
            F.count("*").alias("n_units"),
            F.round(F.sum("x"), round_digits).alias("total"),
            F.sum(F.col("i") * F.col("x")).alias("_ix"),
            F.sum(F.col("x") * F.col("x")).alias("_xx"),
            F.max("x").alias("_mx"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_units",
            "total",
            F.round(
                2.0 * F.col("_ix") / (F.col("n_units") * F.col("total"))
                - (F.col("n_units") + 1.0) / F.col("n_units"),
                round_digits,
            ).alias("gini"),
            F.round(
                F.col("_xx") / (F.col("total") * F.col("total")),
                round_digits,
            ).alias("hhi"),
            F.round(F.col("_mx") / F.col("total"), round_digits).alias(
                "top_share"
            ),
        )
    )
