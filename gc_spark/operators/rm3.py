"""RM3-style pseudo-relevance feedback — query expansion for the
serving stack.

BM25 (operators/bm25), MaxScore (operators/maxscore) and QLM
(operators/qlm) all score the LITERAL query; vocabulary mismatch ("ship"
vs "vessel") is the classic recall killer. RM3 (Lavrenko & Croft 2001;
the Anserini-default feedback configuration) fixes it with two passes:
retrieve top-f docs for the original query, build a relevance model
from their term distributions, interpolate with the original query, and
re-retrieve with the expanded weighted query:

    p(t|R)   = (1/f) * sum_{d in F} tf(t,d) / dl(d)
    w(t)     = (1-lam) * orig(t) + lam * p(t|R),   orig(t) = 1/|q|
    score(d) = sum_t w(t) * c(d,t)

where c(d,t) is the same 6dp-rounded BM25 contribution maxscore.py
scores with (feeding RM3 weights into a BM25 ranker is the standard
practice). All weights are 6dp-rounded BEFORE expansion-term selection
and scoring so Spark and the SQL oracle pick identical terms.

Scale shape: both corpus passes are scan-side explodes filtered to a
small term set (the query literals, then the feedback vocabulary via a
broadcast semi-join — feedback vocab is f docs' distinct tokens, always
tiny); df/avgdl/N are broadcast aggregates; the feedback-doc and final
top-k picks are single row_number windows over candidate sets. The
relevance model itself is feedback-vocab-sized. No UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _contribs(
    postings: DataFrame,
    lengths: DataFrame,
    stats: DataFrame,
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """(id, term, c): 6dp-rounded BM25 contribution per matched posting.
    postings = (id, term, tf); df computed here over the given postings."""
    docfreq = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("_df")
    )
    return (
        postings.join(F.broadcast(docfreq), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
                )
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
                ),
                6,
            ).alias("c"),
        )
    )


def rm3_expand_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 3,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, rank, n_terms) — top-k docs under the RM3-expanded
    weighted query; n_terms audits the expanded term-set size (|q| +
    up to fb_terms new terms)."""
    q = sorted(set(query_terms))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("_toks"))
    lengths = base.select(F.col(id_col), F.size("_toks").alias("dl"))
    stats = lengths.agg(
        F.avg("dl").alias("_avgdl"), F.count("*").cast("double").alias("_n")
    )

    # pass 1: original-query BM25, top-f feedback docs
    post1 = (
        base.select(F.col(id_col), F.explode("_toks").alias("term"))
        .where(F.col("term").isin(q))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    c1 = _contribs(post1, lengths, stats, id_col, k1, b)
    s1 = c1.groupBy(id_col).agg(F.round(F.sum("c"), 6).alias("_s1"))
    w_fb = Window.orderBy(F.desc("_s1"), F.asc(id_col))
    fb = (
        s1.withColumn("_r", F.row_number().over(w_fb))
        .where(F.col("_r") <= fb_docs)
        .select(id_col)
    )

    # relevance model over the feedback docs' own tokens
    f_actual = fb.agg(F.count("*").cast("double").alias("_f"))
    fb_post = (
        base.join(F.broadcast(fb), id_col)
        .select(F.col(id_col), F.explode("_toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .join(lengths, id_col)
    )
    rm = (
        fb_post.groupBy("term")
        .agg(F.sum(F.col("tf") / F.col("dl")).alias("_sp"))
        .crossJoin(F.broadcast(f_actual))
        .select(
            "term",
            F.round(F.lit(lam) * F.col("_sp") / F.col("_f"), 6).alias("_rm"),
        )
    )
    orig_w = round((1.0 - lam) / len(q), 6)
    w_new = Window.orderBy(F.desc("_rm"), F.asc("term"))
    new_terms = (
        rm.where(~F.col("term").isin(q))
        .withColumn("_r", F.row_number().over(w_new))
        .where(F.col("_r") <= fb_terms)
        .select("term", F.col("_rm").alias("w"))
    )
    orig_terms = (
        rm.where(F.col("term").isin(q))
        .select("term", F.round(F.col("_rm") + F.lit(orig_w), 6).alias("w"))
        # query terms absent from every feedback doc still score
        .unionByName(
            df.sparkSession.createDataFrame(
                [(t, float(orig_w)) for t in q], "term string, w double"
            ).join(rm.select("term"), "term", "left_anti")
        )
    )
    terms = orig_terms.unionByName(new_terms)
    n_terms = terms.agg(F.count("*").alias("n_terms"))

    # pass 2: weighted BM25 over the expanded term set
    post2 = (
        base.select(F.col(id_col), F.explode("_toks").alias("term"))
        .join(F.broadcast(terms), "term")
        .groupBy(id_col, "term", "w")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    c2 = _contribs(
        post2.select(id_col, "term", "tf"), lengths, stats, id_col, k1, b
    ).join(F.broadcast(terms), "term")
    s2 = c2.groupBy(id_col).agg(
        F.round(F.sum(F.col("w") * F.col("c")), 6).alias("score")
    )
    w_final = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        s2.withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(n_terms))
        .select(id_col, "score", "rank", "n_terms")
    )
