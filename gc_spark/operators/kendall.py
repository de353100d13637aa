"""Kendall tau-b — do two rankers order the candidates the same way?

ir_eval.ir_metrics grades a ranker against RELEVANCE labels; when the
question is instead "does the cheap ranker agree with the expensive
one?" (BM25 vs QLM, old scorer vs new), the rank-correlation statistic
is Kendall's tau-b (Kendall 1938; the -b form handles ties in either
scorer):

    tau_b = (C - D) / sqrt((n0 - t_a)(n0 - t_b))

with C/D the concordant/discordant pair counts, n0 = n(n-1)/2, and
t_a/t_b the tied-pair counts per scorer.

Scale shape: pair generation is quadratic BY DEFINITION of the
statistic, so the contract is the one every pairwise op in this repo
carries: run it on a bounded candidate set (a top-k pool, the rerank
window), never the corpus — the caller caps, the self-join pairs, one
aggregate folds. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kendall_tau(
    df: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    round_digits: int = 6,
    max_points: int = 512,
) -> DataFrame:
    """One row: (n, n_pairs, concordant, discordant, ties_a, ties_b,
    tau_b). Pairs tied in BOTH scorers count toward both tie totals and
    neither C nor D (the standard tau-b accounting).

    The bounded-input contract is ENFORCED (r6, API symmetry with
    theilsen.theil_sen_trend's max_points df-cap): only the max_points
    smallest ids enter the pairing — a TakeOrdered prune (per-partition
    heaps, no global sort), so a careless corpus-sized caller gets a
    bounded, documented answer instead of an O(n²) crossJoin. Pass
    max_points=None to disable (caller takes the quadratic risk)."""
    pts = df.select(
        F.col(id_col).alias("i"),
        F.col(score_a).cast("double").alias("a"),
        F.col(score_b).cast("double").alias("b"),
    )
    if max_points is not None:
        pts = pts.orderBy("i").limit(int(max_points))
    l = pts.select(F.col("i").alias("i1"), F.col("a").alias("a1"), F.col("b").alias("b1"))
    r = pts.select(F.col("i").alias("i2"), F.col("a").alias("a2"), F.col("b").alias("b2"))
    pairs = l.crossJoin(r).where(F.col("i1") < F.col("i2"))
    da = F.col("a1") - F.col("a2")
    db = F.col("b1") - F.col("b2")
    agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(da * db > 0, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(da * db < 0, 1).otherwise(0)).alias("discordant"),
        F.sum(F.when(da == 0, 1).otherwise(0)).alias("ties_a"),
        F.sum(F.when(db == 0, 1).otherwise(0)).alias("ties_b"),
    )
    # n rides in as a 1-row broadcast instead of the r5 eager pts.count()
    # mid-plan-build (ADVICE kendall.py:54): the operator stays fully lazy
    # and the input is no longer scanned by an extra driver job. int cast
    # keeps the r5 output schema (n <= max_points always fits).
    n_frame = pts.agg(F.count("*").cast("int").alias("n"))
    c = F.col("concordant").cast("double")
    d = F.col("discordant").cast("double")
    n0 = F.col("n_pairs").cast("double")
    return agg.crossJoin(F.broadcast(n_frame)).select(
        F.col("n"),
        "n_pairs",
        "concordant",
        "discordant",
        "ties_a",
        "ties_b",
        F.round(
            (c - d)
            / F.sqrt((n0 - F.col("ties_a")) * (n0 - F.col("ties_b"))),
            round_digits,
        ).alias("tau_b"),
    )
