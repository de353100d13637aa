"""TF-IDF top terms per document — keyword extraction over the corpus.

The classic "what is this page about" signal a crawl consumer derives
before indexing/clustering (and the cheap prior for topic-balanced corpus
mixing). Kept fully declarative so Catalyst does the work:

  - term frequencies: explode(tokens) -> groupBy(doc, term) with map-side
    partial counts — ONE shuffle keyed (doc_id, term);
  - document frequencies: groupBy(term) over the per-doc term set — the
    output is vocabulary-sized (millions of rows at web scale, not
    corpus-sized), so it is BROADCAST back onto the term-frequency table:
    the big side never reshuffles for the idf join;
  - the corpus doc count enters as a 1-row aggregate crossJoin-broadcast
    (no driver round-trip inside the plan);
  - top-k per doc: row_number over (doc) on the already (doc_id, term)-
    partitioned frame — score desc, term asc for determinism.

idf uses sklearn's smoothed form ln((1+N)/(1+df)) + 1 (never negative,
never divides by zero) — expressible identically in ANSI SQL for the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, term, tf, score, term_rank) — the k highest-tf-idf terms per
    document; score rounded to 6 dp (floats cross an engine boundary in
    the oracle compare)."""
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    # the (doc, term, tf) contraction feeds BOTH the score join and the
    # docfreq aggregate: lazily checkpointed so the corpus is exploded
    # ONCE, not re-scanned per consumer (the contraction is distinct
    # (doc, term) pairs — far smaller than the token stream)
    tf = (
        terms.groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    docfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("_df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).cast("double").alias("_n"))

    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.lit(1.0) + F.col("_n")) / (F.lit(1.0) + F.col("_df"))) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "score", "term_rank")
    )
