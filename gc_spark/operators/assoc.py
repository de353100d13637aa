"""Two-item association rules — support / confidence / lift over
(basket, item) co-occurrences.

Collocations (operators/collocations) score ADJACENT token pairs by
PMI; association rules answer the basket-level question: when a crawl
session touches host A, how much likelier is host B ("users who fetched
the budget memo also fetched the appendix"), the classic
market-basket readout (Agrawal & Srikant, VLDB 1994 — the 2-itemset
slice, which is where crawl/query-log analysis lives):

    support(A,B)    = n(A,B) / n_baskets
    confidence(A=>B)= n(A,B) / n(A)
    lift(A=>B)      = confidence / (n(B) / n_baskets)

Scale shape (the cocite.py wedge discipline): baskets contract to
DISTINCT (basket, item) first; pairs are generated AT the basket by a
self-join, with oversized baskets capped at `max_basket` items (kept
deterministically by item order — a size-10^6 basket would otherwise
emit 10^12 pairs); item marginals are item-grain aggregates broadcast
onto the pair counts; `min_count` prunes the rule table before the
marginal joins. Rules are emitted in both directions from one
undirected pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pair_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """(ante, cons, n_pair, support, confidence, lift) for every ordered
    rule whose pair count >= min_count. Baskets larger than max_basket
    keep their first max_basket items in item order (deterministic)."""
    bi = (
        df.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .distinct()
    )
    w = Window.partitionBy("_b").orderBy("_i")
    capped = (
        bi.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= max_basket)
        .drop("_r")
        # four consumers (marginals, basket count, both pair sides):
        # lazy checkpoint materializes the distinct+cap once
        .localCheckpoint(eager=False)
    )
    item_n = capped.groupBy(F.col("_i").alias("item")).agg(
        F.count("*").alias("n_item")
    )
    n_baskets = capped.select("_b").distinct().agg(
        F.count("*").cast("double").alias("_nb")
    )

    l = capped.select(F.col("_b"), F.col("_i").alias("_a"))
    r = capped.select(F.col("_b").alias("_b2"), F.col("_i").alias("_c"))
    pairs = (
        l.join(r, (F.col("_b") == F.col("_b2")) & (F.col("_a") < F.col("_c")))
        .groupBy("_a", "_c")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    rules = pairs.select(
        F.col("_a").alias("ante"), F.col("_c").alias("cons"), "n_pair"
    ).unionByName(
        pairs.select(
            F.col("_c").alias("ante"), F.col("_a").alias("cons"), "n_pair"
        )
    )
    d = round_digits
    # marginal joins unhinted: item_n is item-grain (can be huge — every
    # host on the web), while rules is min_count-pruned small; AQE picks
    # the broadcast side at runtime
    return (
        rules.join(
            item_n.select(F.col("item").alias("ante"), F.col("n_item").alias("_na")),
            "ante",
        )
        .join(
            item_n.select(F.col("item").alias("cons"), F.col("n_item").alias("_nc")),
            "cons",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "ante",
            "cons",
            "n_pair",
            F.round(F.col("n_pair") / F.col("_nb"), d).alias("support"),
            F.round(F.col("n_pair") / F.col("_na").cast("double"), d).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_pair") / F.col("_na").cast("double"))
                / (F.col("_nc") / F.col("_nb")),
                d,
            ).alias("lift"),
        )
    )
