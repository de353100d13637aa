"""Corpus release report — the per-source accounting a dataset publisher
ships with a training-data release (docs, tokens, dedup rate, language
share, basic quality pass rate).

Everything rolls up from ONE scan of the corpus: the fingerprint distinct
count rides the same groupBy as the sums (count_distinct shuffles only the
per-source distinct fingerprints — at 10^10 swap in approx_count_distinct,
the same exact-vs-sketch split documented on q45/q57). No joins, no second
pass, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def release_report(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    min_tokens: int = 10,
    max_mean_word_len: float = 12.0,
) -> DataFrame:
    """(source, n_docs, n_tokens, n_chars, dup_docs, pct_en,
    quality_pass_rate, mean_tokens): the publishable per-source ledger.

    dup_docs = docs minus distinct exact-content fingerprints (sha256 of
    the text); quality pass = token floor + mean-word-length ceiling (the
    cheap Gopher-style subset whose SQL twin is exact)."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    chars = F.length(text_col)
    mean_wl = F.when(toks > 0, chars / toks)
    passes = (toks >= min_tokens) & (mean_wl < max_mean_word_len)
    staged = df.select(
        F.col(source_col).alias("source"),
        toks.alias("_t"),
        chars.alias("_c"),
        F.sha2(F.col(text_col), 256).alias("_fp"),
        (F.col(lang_col) == "en").cast("int").alias("_en"),
        passes.cast("int").alias("_q"),
    )
    return staged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("_t").alias("n_tokens"),
        F.sum("_c").alias("n_chars"),
        (F.count("*") - F.count_distinct(F.col("_fp"))).alias("dup_docs"),
        F.round(F.avg("_en"), 6).alias("pct_en"),
        F.round(F.avg("_q"), 6).alias("quality_pass_rate"),
        F.round(F.avg("_t"), 4).alias("mean_tokens"),
    )
