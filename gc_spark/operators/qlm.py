"""Dirichlet-smoothed query-likelihood ranking — the LM retrieval model.

The third classic ranking function next to bm25.py and tfidf.py: score a
document by the probability its language model generates the query, with
Bayesian Dirichlet smoothing toward the corpus model (Zhai & Lafferty
2001 — the standard formulation):

    score(q, d) = sum_t log(1 + tf_{t,d} / (mu * p(t|C)))
                  + |q| * log(mu / (|d| + mu))

where p(t|C) = cf_t / |C|. The rewrite above needs only MATCHED
(term, doc) rows for the first sum — docs never touched by a query term
never enter the computation — which is what makes it a join, not a scan
of the full vocabulary per doc.

Scale shape: one corpus-sized token count keyed (term, doc) feeding both
the per-doc tf for matched terms and (filtered to the query's handful of
terms) the corpus frequencies; query-term stats ride as a broadcast.
Doc lengths are a doc-grain aggregate. Final top-k orders only the
matched candidate set. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dirichlet_qlm(
    df: DataFrame,
    query_terms: list[str],
    mu: float = 2000.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, n_matched, score) for the top_k candidate docs (those
    matching >= 1 query term), ordered by score desc then doc_id."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")

    # the (doc, term, cnt) contraction feeds every downstream consumer
    # (doc lengths, corpus length, query-term stats): lazily checkpointed
    # so the corpus is tokenized ONCE, not once per aggregate (the
    # tfidf.py discipline)
    tcounts = (
        toks.groupBy("doc", "term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    doclen = tcounts.groupBy("doc").agg(F.sum("cnt").alias("dl"))
    corpus = tcounts.agg(F.sum("cnt").cast("double").alias("clen"))

    qset = [t for t in query_terms]
    qcounts = tcounts.where(F.col("term").isin(qset))
    cf = (
        qcounts.groupBy("term")
        .agg(F.sum("cnt").alias("cf"))
        .crossJoin(F.broadcast(corpus))
        .select("term", (F.col("cf") / F.col("clen")).alias("p_c"))
    )
    tf = qcounts.select("doc", "term", F.col("cnt").alias("tf"))
    matched = tf.join(F.broadcast(cf), "term").groupBy("doc").agg(
        F.count("*").alias("n_matched"),
        F.sum(
            F.log(F.lit(1.0) + F.col("tf") / (F.lit(mu) * F.col("p_c")))
        ).alias("_msum"),
    )
    scored = matched.join(doclen, "doc").select(
        F.col("doc").alias(id_col),
        "n_matched",
        F.round(
            F.col("_msum")
            + F.lit(float(len(qset)))
            * F.log(F.lit(mu) / (F.col("dl") + F.lit(mu))),
            round_digits,
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(top_k)
