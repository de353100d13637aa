"""Good-Turing frequency smoothing — "how much is still unseen?".

The frontier's discovery-rate question: given the fetch log so far, what
is the probability the NEXT fetch surfaces a never-seen URL (or token, or
host)? Good-Turing's answer is p_unseen = N1/N — the share of singletons —
and the smoothed count r* = (r+1) * N_{r+1} / N_r for items seen r times
(Good 1953; Gale & Sampson's Simple Good-Turing is the production variant
of the same count-of-counts table). Crawl scheduling reads this directly:
a source whose singleton mass stays high keeps paying discovery; one whose
mass collapses is exhausted (the same signal q119's Heaps-law vocab curve
shows over time, reduced to one number).

Scale shape: one (item) count with map-side combine — the only
corpus-sized shuffle — then a count-of-counts groupBy over the r values
(tiny: at most max-count rows) and a self-join on r+1. The totals ride as
1-row broadcast scalars. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def good_turing(
    df: DataFrame,
    item_col: str,
    max_r: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Count-of-counts table with Good-Turing smoothing: (r, n_r, r_star,
    mass, p_unseen) for r <= max_r. r_star is NULL when no item was seen
    exactly r+1 times (the Simple-GT regression zone at large r — callers
    smooth the tail; the head, which drives p_unseen, is exact)."""
    counts = df.groupBy(item_col).agg(F.count("*").alias("r"))
    cofc = counts.groupBy("r").agg(F.count("*").alias("n_r"))
    tot = counts.agg(F.sum("r").cast("double").alias("nn"))
    n1 = cofc.where(F.col("r") == 1).agg(
        F.coalesce(F.sum("n_r"), F.lit(0)).cast("double").alias("n1")
    )

    nxt = cofc.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    return (
        cofc.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .where(F.col("r") <= max_r)
        .select(
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1).cast("double")
                * F.col("n_r1").cast("double")
                / F.col("n_r").cast("double"),
                round_digits,
            ).alias("r_star"),
            F.round(
                F.col("r").cast("double")
                * F.col("n_r").cast("double")
                / F.col("nn"),
                round_digits,
            ).alias("mass"),
            F.round(F.col("n1") / F.col("nn"), round_digits).alias("p_unseen"),
        )
    )
