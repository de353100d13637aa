"""BM25 top-k retrieval — score the corpus against a term query and return
the k best documents. The serving-side counterpart of the positional
inverted index (operators/inverted.py): what a crawl consumer actually
runs against the indexed corpus.

Plan shape, sized for 100 TB:
  - the query's terms are PLAN LITERALS — the `term IN (...)` filter sits
    directly above the scan-side explode, so only postings for query
    terms (a ~|q|/|V| sliver of the token stream) ever reach the shuffle;
  - per-doc length dl comes from a map-side size(split(...)) — no explode
    needed for the normalizer — and avgdl/N are 1-row aggregates that
    enter the plan by broadcast crossJoin (no driver round-trip);
  - document frequency df(t) is computed over the same filtered posting
    stream (|q| rows out) and broadcast back;
  - final top-k is one global row_number over score — a k-row result.

idf uses the Lucene form ln(1 + (N - df + 0.5)/(df + 0.5)) (always
positive); tf saturation tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) with the
standard k1=1.2, b=0.75. Scores round to 6 dp before ranking so the
DuckDB oracle ranks identically.

No reference twin: gamechanger-crawlers stops at feeding an indexer;
this is the retrieval op its consumers run (SURVEY.md §6 family).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, rank) — the k documents with the highest BM25 score for
    `query_terms`; rank 1..k by (score desc, id asc)."""
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

    scored = (
        postings.join(F.broadcast(docfreq), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(F.round(F.sum("_s"), 6).alias("score"))
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )
