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

Scale shape: ONE corpus tokenize pass, contracted to (doc, dl, term, tf)
postings and materialized per invocation (the qlm pattern); pass 1, the
feedback model, pass 2 and the corpus stats all derive from it via
broadcast-filtered reads; df/avgdl/N are broadcast aggregates; the
feedback-doc and final top-k picks are single row_number windows over
candidate sets. The
relevance model itself is feedback-vocab-sized. No UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _contrib_col(k1: float, b: float) -> "F.Column":
    """6dp-rounded BM25 contribution from in-row (_n, _df, tf, dl, _avgdl).

    Expression-only twin of the round-5 `_contribs` helper: document
    frequency now arrives as a window count over the postings themselves
    (one pass) instead of a groupBy+join that instantiated the whole
    postings subtree twice — the r6 plan-size fix (guide §7.2: duplicated
    subtrees; the r5 plan printed ~9k lines for q209, the r6 one ~200)."""
    return F.round(
        F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        )
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))),
        6,
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
    up to fb_terms new terms).

    r6 restructure (same results, verified vs the frozen oracle): every
    derived frame used to be re-joined, duplicating its whole upstream
    subtree in the plan — `terms` alone was instantiated three times, each
    copy containing the fb/c1/post1 pipelines, blowing the physical plan
    to ~9k formatted lines and 5.9 s at sf0.1. Now document frequency is
    a window count over the postings (no self-join), dl rides the posting
    groupBy instead of re-joining `lengths`, the feedback-doc count `_f`
    and the audit `n_terms` are window counts attached in-stream, and the
    original+new term sets merge in ONE pipeline (query terms injected as
    null-_sp rows, selected by a single partitioned row_number). Each
    logical frame now appears exactly once; only the tiny broadcast
    `stats` subtree is instantiated twice (ReusedExchange dedupes it)."""
    q = sorted(set(query_terms))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("_toks"))
    # ONE corpus tokenize pass, contracted to (id, dl, term, tf) and
    # materialized (the qlm single-scan-contraction pattern): pass 1, the
    # feedback model, pass 2 AND the corpus stats previously each re-ran
    # the tokenize from scratch (three full corpus passes; no exchange
    # reuse). The trade is one postings-grain shuffle + store against two
    # further tokenize passes — measured q209 3.55 -> 2.77 s at sf0.1.
    post = (
        base.select(
            F.col(id_col), F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # avgdl/N from the contraction: every doc keeps >= 1 posting row
    # (split of a trimmed empty string is [""]), so the doc set and each
    # doc's dl survive intact
    stats = (
        post.groupBy(id_col)
        .agg(F.first("dl").alias("_dl"))
        .agg(
            F.avg("_dl").alias("_avgdl"),
            F.count("*").cast("double").alias("_n"),
        )
    )
    w_df = Window.partitionBy("term")

    # pass 1: original-query BM25, top-f feedback docs
    post1 = post.where(F.col("term").isin(q))
    c1 = (
        post1.withColumn("_df", F.count(F.lit(1)).over(w_df).cast("double"))
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.col("term"), _contrib_col(k1, b).alias("c"))
    )
    s1 = c1.groupBy(id_col).agg(F.round(F.sum("c"), 6).alias("_s1"))
    w_fb = Window.orderBy(F.desc("_s1"), F.asc(id_col))
    w_tot = w_fb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # _f = min(fb_docs, docs matching any query term) rides the fb rows —
    # the r5 fb.agg(count) crossJoin re-ran the whole pass-1 subtree
    fb = (
        s1.withColumn("_r", F.row_number().over(w_fb))
        .withColumn(
            "_f",
            F.least(
                F.lit(float(fb_docs)), F.count(F.lit(1)).over(w_tot).cast("double")
            ),
        )
        .where(F.col("_r") <= fb_docs)
        .select(id_col, "_f")
    )

    # relevance model over the feedback docs' own postings
    fb_post = post.join(F.broadcast(fb), id_col)
    rm = fb_post.groupBy("term").agg(
        F.sum(F.col("tf") / F.col("dl")).alias("_sp"), F.max("_f").alias("_f")
    )
    # query terms join the stream as null-_sp rows so present/absent terms
    # are weighted in one select (absent query terms score orig_w alone)
    orig_w = round((1.0 - lam) / len(q), 6)
    q_zero = df.sparkSession.createDataFrame([(t,) for t in q], "term string").select(
        "term",
        F.lit(None).cast("double").alias("_sp"),
        F.lit(None).cast("double").alias("_f"),
    )
    merged = (
        rm.unionByName(q_zero)
        .groupBy("term")
        .agg(F.max("_sp").alias("_sp"), F.max("_f").alias("_f"))
    )
    isq = F.col("term").isin(q)
    scored = merged.select(
        "term",
        isq.alias("_isq"),
        F.when(
            F.col("_sp").isNotNull(),
            F.round(F.lit(lam) * F.col("_sp") / F.col("_f"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("_rm"),
    )
    w_new = Window.partitionBy("_isq").orderBy(F.desc("_rm"), F.asc("term"))
    picked = (
        scored.withColumn("_r", F.row_number().over(w_new))
        .where(F.col("_isq") | (F.col("_r") <= fb_terms))
        .select(
            "term",
            F.when(F.col("_isq"), F.round(F.col("_rm") + F.lit(orig_w), 6))
            .otherwise(F.col("_rm"))
            .alias("w"),
        )
    )
    w_cnt = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    terms = picked.withColumn("n_terms", F.count(F.lit(1)).over(w_cnt))

    # pass 2: weighted BM25 over the expanded term set (w and n_terms ride
    # the broadcast join onto the materialized postings)
    post2 = post.join(F.broadcast(terms), "term")
    c2 = (
        post2.withColumn("_df", F.count(F.lit(1)).over(w_df).cast("double"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("n_terms"),
            (F.col("w") * _contrib_col(k1, b)).alias("_wc"),
        )
    )
    s2 = c2.groupBy(id_col, "n_terms").agg(
        F.round(F.sum("_wc"), 6).alias("score")
    )
    w_final = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        s2.withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= k)
        .select(id_col, "score", "rank", "n_terms")
    )
