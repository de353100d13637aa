"""Exact set-similarity self-join with prefix filtering (AllPairs/PPJoin).

q33's MinHash+LSH pipeline is the sketch path: cheap, but its recall is
probabilistic. This is the EXACT path — every pair with Jaccard >=
threshold, guaranteed — using the prefix-filtering bound (Bayardo,
Ma & Srikant, WWW'07 "Scaling Up All Pairs Similarity Search"; extended
by PPJoin, Xiao et al.): order each record's tokens by ascending global
document frequency (rare first), keep only the first
|x| - floor(t*|x|) + 1 tokens as its PREFIX, and observe that two sets
with Jaccard >= t MUST share at least one prefix token under any common
total order. Candidates therefore come from a self-join on the tiny
rare-token prefix index instead of the full token index, plus the length
bound t*|x| <= |y| <= |x|/t; survivors are verified exactly.

Scale shape: the prefix index is ~(1-t)·|tokens| rows of the RAREST
tokens, so the self-join fan-out per token is small by construction —
that pruning is the whole point at 10^10 docs, where a naive token
self-join is quadratic in the hottest token. Everything is native
(posexplode / sort_array / array_intersect); no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingle_col(text_col: Column, n: int = 4) -> Column:
    """Word n-gram shingles of a whitespace-tokenized text column; empty
    array when the text has fewer than n tokens."""
    arr = F.split(F.trim(text_col), r"\s+")
    return F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.array_join(F.slice(arr, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def allpairs_jaccard(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 4,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — EVERY pair of docs whose shingle-set
    Jaccard is >= threshold (doc_a < doc_b). Exact: the prefix filter is
    lossless for this threshold, and survivors are verified on the full
    sets."""
    # r6: dedupe shingles map-side (array_distinct on the per-doc array)
    # instead of a corpus-wide .distinct() — the (id, term) set is unique
    # by construction afterwards, so the r5 plan's first exchange (~1M
    # 25-char-string rows at sf0.1) disappears outright (guide §2.4).
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingle_col(F.col(text_col), shingle_n))
        ).alias("term"),
    )
    dfreq = toks.groupBy("term").agg(F.count("*").alias("_df"))
    per_doc = (
        toks.join(dfreq, "term")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_df"), F.col("term")))
            ).alias("_ts"),
            F.count("*").alias("_n"),
        )
    )
    # prefix length |x| - floor(t|x|) + 1 (>= the canonical ceil form, so
    # never under-selects); rare-first order comes from the (_df, term) sort.
    plen = (F.col("_n") - F.floor(F.lit(threshold) * F.col("_n")) + 1).cast("int")
    prefix = per_doc.select(
        F.col(id_col),
        F.col("_n"),
        F.explode(
            F.transform(
                F.slice("_ts", F.lit(1), plen), lambda s: s.getField("term")
            )
        ).alias("term"),
    )
    a = prefix.select(
        F.col(id_col).alias("doc_a"), F.col("_n").alias("_na"), "term"
    )
    b = prefix.select(
        F.col(id_col).alias("doc_b"), F.col("_n").alias("_nb"), "term"
    )
    cands = (
        a.join(b, "term")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # length bound: t|x| <= |y| <= |x|/t (tiny epsilon keeps the
            # prune conservative under float rounding; verify is exact).
            & (F.col("_nb") >= F.lit(threshold) * F.col("_na") - 1e-9)
            & (F.col("_na") >= F.lit(threshold) * F.col("_nb") - 1e-9)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # r6: the verify sets are a projection of per_doc's already-sorted
    # (df, term) structs — the r5 collect_set re-ran the whole
    # tokenize+distinct pipeline a second time plus one more exchange;
    # array_intersect/size are element-order-insensitive so the ordering
    # difference cannot change any jaccard value. The shared per_doc
    # aggregation dedupes at runtime via ReusedExchange.
    sets = per_doc.select(
        F.col(id_col),
        F.transform("_ts", lambda s: s.getField("term")).alias("_set"),
    )
    j = (
        cands.join(
            sets.select(F.col(id_col).alias("doc_a"), F.col("_set").alias("_sa")),
            "doc_a",
        )
        .join(
            sets.select(F.col(id_col).alias("doc_b"), F.col("_set").alias("_sb")),
            "doc_b",
        )
        .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "_j",
            F.col("_i").cast("double")
            / (F.size("_sa") + F.size("_sb") - F.col("_i")),
        )
        .filter(F.col("_j") >= threshold)
    )
    return j.select(
        "doc_a", "doc_b", F.round("_j", 6).alias("jaccard")
    )
