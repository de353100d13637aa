"""MaxScore-style upper-bound-pruned BM25 top-k (Turtle & Flood 1995;
the batch re-expression of the WAND/MaxScore family of dynamic-pruning
retrieval algorithms).

bm25_topk (operators/bm25.py) exactly scores EVERY document matching at
least one query term. At serving scale the standard trick is to skip
documents whose best-possible score provably can't reach the current
top-k threshold. Document-at-a-time WAND doesn't map to a dataflow
engine, but its invariant does, as a two-pass plan:

  1. per-term upper bound UB(t) = max over docs of the BM25 contribution
     of t (one aggregate over the query-filtered postings);
  2. per-doc upper bound UB(d) = sum of UB(t) over d's matched terms;
  3. SEED: exactly score the k docs with the largest UB(d) → theta = the
     k-th best exact seed score (a valid lower bound on the true k-th
     best, since every seed doc's exact score <= its UB);
  4. PRUNE: docs with UB(d) < theta cannot enter the top-k (exact <= UB
     < theta <= true k-th best) — only survivors are exactly scored.

Soundness: the returned top-k equals the unpruned top-k. The seed is a
subset of the survivors (each seed's exact >= theta by construction), so
n_scored counts every doc whose exact score was computed.

Engine-portability: every value a BRANCH depends on (contributions, the
per-term bounds, UB(d), exact scores, theta) is rounded to 6 dp first,
so Spark and the SQL oracle take identical prune decisions — the
documented reason scores here are sums of ROUNDED contributions (vs
bm25_topk's round-at-the-end; they agree to ~1e-6).

Scale shape: the query-term IN-filter sits directly above the scan-side
explode (only a |q|/|V| sliver of the token stream shuffles), df/UB/N/
avgdl are broadcast 1-row/|q|-row aggregates, and both top-k selections
are single row_number windows over candidate sets that pruning keeps
small. No UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def maxscore_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, rank, n_matched, n_scored) — the k best docs by
    pruned-exact BM25 (rank 1..k by score desc, id asc), with the audit
    constants: n_matched = docs matching >= 1 term, n_scored = docs whose
    exact score was actually computed (the pruning win is
    n_matched - n_scored)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    lengths = df.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = lengths.agg(
        F.avg("dl").alias("_avgdl"), F.count("*").cast("double").alias("_n")
    )

    postings = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .where(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    docfreq = postings.groupBy("term").agg(F.count("*").cast("double").alias("_df"))

    # per-(doc, term) BM25 contribution, rounded 6dp (see module doc)
    contrib = (
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
        .localCheckpoint(eager=False)
    )

    ub_term = contrib.groupBy("term").agg(F.max("c").alias("ub"))
    ub_doc = (
        contrib.join(F.broadcast(ub_term), "term")
        .groupBy(id_col)
        .agg(F.round(F.sum("ub"), 6).alias("ubd"))
    )
    exact = contrib.groupBy(id_col).agg(F.round(F.sum("c"), 6).alias("score"))

    w_seed = Window.orderBy(F.desc("ubd"), F.asc(id_col))
    seed = (
        ub_doc.withColumn("_r", F.row_number().over(w_seed))
        .where(F.col("_r") <= k)
        .join(exact, id_col)
    )
    theta = seed.agg(F.min("score").alias("theta"))

    survivors = (
        ub_doc.crossJoin(F.broadcast(theta)).where(F.col("ubd") >= F.col("theta"))
    )
    n_matched = ub_doc.agg(F.count("*").alias("n_matched"))
    n_scored = survivors.agg(F.count("*").alias("n_scored"))

    w_final = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        survivors.join(exact, id_col)
        .withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(n_matched))
        .crossJoin(F.broadcast(n_scored))
        .select(id_col, "score", "rank", "n_matched", "n_scored")
    )
