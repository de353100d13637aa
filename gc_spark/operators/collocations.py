"""Bigram PMI collocation extraction — corpus-level phrase discovery.

Pointwise mutual information over adjacent token pairs finds the phrases
a tokenizer/phrase-vocabulary should treat as units ("fort bragg", "joint
chiefs") — a standard corpus-prep pass (Mikolov et al. 2013 word2vec
phrases use the same count ratio). PMI:

    pmi(x, y) = ln( (c_xy / T_b) / ((c_x / T_u) * (c_y / T_u)) )

with c_xy bigram counts (T_b total bigrams), c_x unigram counts (T_u total
tokens). Low-count pairs are noise — `min_count` filters them BEFORE the
unigram joins, so the joined frame is the (small) candidate set, not the
corpus.

Scale shape: one bigram groupBy and one unigram groupBy over the token
stream (both map-side combined, vocabulary-sized outputs); the unigram
table is broadcast onto the candidates twice (w1, w2); totals enter as a
1-row crossJoin broadcast. Nothing corpus-sized shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.text import word_ngrams_col


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n, pmi) for every adjacent pair occurring >= min_count
    times; pmi rounded to 6 dp."""
    toks = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    # `uni` feeds three consumers (t_u, u1, u2) and `big` two (t_b, cand);
    # the planner reuses nothing across separate subtree instantiations
    # (measured: zero ReusedExchange), so each consumer re-ran its corpus
    # tokenize — five corpus passes for two tokenizations' worth of work.
    # Lazy localCheckpoints materialize the two VOCABULARY-sized count
    # tables once per invocation (computed fresh from the inputs every
    # run, never reused across runs).
    uni = (
        toks.groupBy("w")
        .agg(F.count("*").cast("double").alias("_c"))
        .localCheckpoint(eager=False)
    )
    t_u = uni.agg(F.sum("_c").alias("_tu"))

    grams = df.select(F.explode(word_ngrams_col(F.col(text_col), 2)).alias("g"))
    big = (
        grams.groupBy("g")
        .agg(F.count("*").cast("double").alias("n"))
        .localCheckpoint(eager=False)
    )
    t_b = big.agg(F.sum("n").alias("_tb"))

    cand = (
        big.filter(F.col("n") >= min_count)
        .select(
            F.split("g", " ")[0].alias("w1"),
            F.split("g", " ")[1].alias("w2"),
            "n",
        )
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("_c").alias("_c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("_c").alias("_c2"))
    return (
        cand.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(t_u))
        .crossJoin(F.broadcast(t_b))
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.log(
                    (F.col("n") / F.col("_tb"))
                    / ((F.col("_c1") / F.col("_tu")) * (F.col("_c2") / F.col("_tu")))
                ),
                6,
            ).alias("pmi"),
        )
    )
