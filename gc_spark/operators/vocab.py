"""Vocabulary truncation and out-of-vocabulary (OOV) statistics. Training
pipelines fix a top-V token vocabulary (or a tokenizer trained on one —
operators/bpe learns the merges); every document then carries an OOV rate:
the share of its tokens that fall outside the vocabulary. High-OOV docs
are a quality/domain-shift signal (wrong language, OCR noise, code in a
prose corpus) and a standard pre-filter before tokenizer-bound training.

Scale shape: the corpus shuffles once to term counts; top-V selection is
`orderBy(count desc, term).limit(V)` which Spark plans as
TakeOrderedAndProject — per-partition top-V heaps merged at the driver,
NO global sort, safe at any vocabulary size (V rows cross the wire per
partition, not the vocabulary). The V-row vocab broadcasts; per-doc OOV is
a map-side broadcast join + one rollup to doc grain. Ties at the V
boundary break deterministically by (count desc, term asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_vocabulary(df: DataFrame, v: int, text_col: str = "text") -> DataFrame:
    """(term, n) — the top-V terms by frequency, ties to the lexically
    smaller term. TakeOrderedAndProject: no single-partition sort."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(v)
    )


def oov_rate(
    df: DataFrame,
    v: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, oov, oov_rate) per document against the corpus's own
    top-V vocabulary.

    Single-tokenize shape: the corpus explodes ONCE to a checkpointed
    (id, term, tf) contraction; the vocabulary rolls up from it (sum of
    per-doc tfs == the direct term count, ties identical) and the per-doc
    OOV rollup weights by tf — the separate top_vocabulary() corpus pass
    this ran before was a second full tokenize of identical work. The
    contraction is also the two-level aggregation that keeps hot terms
    skew-safe (partial agg on (id, term) first)."""
    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        tf.groupBy("term")
        .agg(F.sum("_tf").alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("term").asc())
        .limit(v)
        .select("term", F.lit(1).alias("_iv"))
    )
    return (
        tf.join(F.broadcast(vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum("_tf").alias("n_tokens"),
            F.sum(
                F.when(F.col("_iv").isNull(), F.col("_tf")).otherwise(F.lit(0))
            ).alias("oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "oov",
            F.round(F.col("oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
) -> DataFrame:
    """Distinct n-gram vocabulary at 25/50/75/100% of the corpus (by id
    order) — the Heaps'-law growth curve that forecasts dedup ROI and
    tokenizer OOV pressure before scaling a crawl: a flattening curve
    means new crawl volume is re-finding known vocabulary. n > 1 measures
    phrase-level novelty (unigram vocabularies saturate early; shingle
    vocabularies keep growing until content truly repeats).

    One token explode + ONE aggregate with four conditional distincts
    (id thresholds as broadcast scalars from a 1-row max) — not four
    corpus passes."""
    if n == 1:
        terms = F.split(F.trim(F.col(text_col)), r"\s+")
    else:
        from gc_spark.functions.text import word_ngrams_col

        terms = F.filter(
            word_ngrams_col(F.col(text_col), n), lambda g: g.contains(" ")
        )
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(terms).alias("term")
    )
    mx = df.agg(F.max(id_col).alias("_mx"))
    t = toks.crossJoin(F.broadcast(mx))
    q = lambda f: F.countDistinct(  # noqa: E731
        F.when(F.col("_id") <= F.col("_mx") * f, F.col("term"))
    )
    return t.agg(
        q(0.25).alias("vocab_25"),
        q(0.50).alias("vocab_50"),
        q(0.75).alias("vocab_75"),
        F.countDistinct("term").alias("vocab_100"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
