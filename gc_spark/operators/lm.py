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
    # vocab-sized after the shuffle and consumed twice (probabilities +
    # total): checkpoint so the corpus-sized token explode runs ONCE —
    # the planner does not reuse the exchange across the two consumers
    # (same contract as interpolated_bigram_xent's ucounts below)
    counts = (
        terms.groupBy("term")
        .agg(F.count("*").cast("double").alias("_c"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("_c").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "term", (F.col("_c") / F.col("_t")).alias("p")
    )


def interpolated_bigram_xent(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """(id, n_bigrams, xent) — per-doc cross-entropy under an interpolated
    bigram LM trained on the corpus itself: p(w1 w2) = lam·c(w1w2)/c(w1) +
    (1−lam)·c(w2)/N (Jelinek-Mercer with the unigram-count denominator).
    The bigram layer catches word-salad text that fools the unigram model
    (q59): common words in impossible orders score high.

    Scale shape: bigram counts are corpus-vocabulary² sized — too big to
    broadcast, so the probability table joins the corpus on the bigram
    string (one hash-keyed shuffle). The two unigram lookups and the token
    total ARE vocabulary-sized and broadcast. Docs with <2 tokens have no
    bigram and drop out (callers gate on q59's unigram score for those)."""
    from gc_spark.functions.text import word_ngrams_col

    big = df.select(
        F.col(id_col), F.explode(word_ngrams_col(F.col(text_col), 2)).alias("bg")
    ).filter(F.col("bg").contains(" "))
    bcounts = big.groupBy("bg").agg(F.count(F.lit(1)).cast("double").alias("cb"))
    uni = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    )
    # vocab-sized after the shuffle and consumed three times (c1, c2,
    # total): checkpoint so the corpus-sized token explode runs ONCE
    ucounts = (
        uni.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("cu"))
        .localCheckpoint(eager=False)
    )
    total = ucounts.agg(F.sum("cu").alias("n"))
    c1 = ucounts.select(F.col("term").alias("w1"), F.col("cu").alias("c1"))
    c2 = ucounts.select(F.col("term").alias("w2"), F.col("cu").alias("c2"))
    pt = (
        bcounts.withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bg",
            (
                F.lit(lam) * F.col("cb") / F.col("c1")
                + F.lit(1.0 - lam) * F.col("c2") / F.col("n")
            ).alias("p"),
        )
    )
    return (
        big.join(pt, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(-F.avg(F.log("p")), 6).alias("xent"),
        )
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


def source_kl(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """(group, n_tokens, kl) — KL(P_group || P_corpus) of the unigram
    distributions, the mixture-design diagnostic: how far each source's
    vocabulary usage sits from the blended corpus (0 = indistinguishable;
    sources with high KL dominate or starve tokens when mixture weights
    (operators/..mixture, q76) are tuned by doc counts alone).

    KL = sum_t p_g(t) * ln(p_g(t) / p_c(t)) over terms with p_g > 0; p_c is
    positive wherever p_g is (the corpus contains the group), so the sum is
    always defined.

    Scale shape: ONE corpus scan and one corpus-sized shuffle to
    (group, term) counts; the corpus-wide term table rolls up FROM that
    aggregate (vocab-sized, exchange-reused), group totals attach via a
    window partitioned by group (vocab-per-group-sized), and the corpus
    total via an empty-partition window over the vocab-sized rollup. The
    final join is (group, term) ⋈ term — vocab-sized on both sides.
    """
    from pyspark.sql import Window

    gt = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("_cg"))
    )
    corpus = gt.groupBy("term").agg(F.sum("_cg").alias("_cc"))
    corpus = corpus.withColumn(
        "_tc", F.sum("_cc").over(Window.partitionBy())
    )
    gt = gt.withColumn("_tg", F.sum("_cg").over(Window.partitionBy("grp")))
    joined = gt.join(corpus, "term")
    pg = F.col("_cg") / F.col("_tg")
    pc = F.col("_cc") / F.col("_tc")
    return (
        joined.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.sum("_cg").cast("long").alias("n_tokens"),
            F.round(F.sum(pg * F.log(pg / pc)), 6).alias("kl"),
        )
    )
