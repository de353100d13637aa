"""Unigram language-model scoring — perplexity-style quality filtering.

CCNet (Wenzek et al. 2020) ranks crawl text by LM perplexity and keeps the
low-perplexity tail; the full Kneser-Ney/transformer scorer needs model
weights this container doesn't ship, but the distributional machinery is
identical for a unigram LM trained on the corpus itself: token cross-
entropy = -avg ln p(token). High scores = token distributions far from the
corpus norm (spam, gibberish, wrong language) — the same decision boundary
shape, swap the probability table to upgrade the model.

Scale shape mirrors operators/tfidf: the LM is vocabulary-sized, built by
one token groupBy (map-side partials) and BROADCAST onto the corpus for
scoring — the corpus-sized side shuffles once for the per-doc aggregate,
keyed doc_id. Total token count enters as a 1-row crossJoin broadcast; no
driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, p) — maximum-likelihood unigram probabilities over the
    corpus. p is count/total as double; no smoothing needed when scoring
    the training corpus itself (every term has count >= 1); add-k belongs
    in the caller when scoring held-out text."""
    terms = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    )
    counts = terms.groupBy("term").agg(F.count("*").cast("double").alias("_c"))
    # token total from the VOCAB-sized counts, not a second corpus scan:
    # sum(per-term counts) == corpus token count, and the aggregate's input
    # is the (reusable) groupBy output
    total = counts.agg(F.sum("_c").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "term", (F.col("_c") / F.col("_t")).alias("p")
    )


def cross_entropy_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, xent) — per-document token cross-entropy under `lm`
    in nats/token (-avg ln p), rounded to 6 dp. Tokens absent from the LM
    are dropped from the average (inner join) — callers scoring held-out
    text should smooth the LM instead of relying on that."""
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    return (
        terms.join(F.broadcast(lm), "term")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(-F.avg(F.log("p")), 6).alias("xent"),
        )
    )
