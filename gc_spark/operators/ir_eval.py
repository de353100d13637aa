"""IR ranking-quality metrics — MRR@k, NDCG@k, recall@k per query.

The engine builds retrieval structures (q64 inverted index, q81 BM25, the
q15/q19/q32/q164 ANN family); a production corpus pipeline also has to
MEASURE them — relevance regression gates on index/tokenizer changes are
the search twin of the dedup board's precision checks. Standard public
metrics (Järvelin & Kekäläinen 2002 for NDCG).

Inputs: a run (qid, doc_id, rank) and qrels (qid, doc_id, rel) with
binary/graded rel. Scale shape: the run is k rows per query (the top-k
output of whatever ranker), so everything here is run-sized: one
(qid, doc_id) equi-join against qrels, one per-qid aggregate, and an
ideal-DCG computed as a native sequence fold (no driver loop, no UDF).
Queries with zero relevant documents score 0 by convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ir_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """(qid, n_rel, mrr, ndcg, recall) at cutoff `k`.

    mrr: 1/rank of the first relevant hit in the top-k (0 if none);
    ndcg: binary-gain DCG / ideal DCG with log2(rank+1) discounts;
    recall: relevant docs in the top-k over all relevant docs.
    """
    rels = qrels.filter(F.col("rel") > 0).select(qid_col, id_col)
    nrel = rels.groupBy(qid_col).agg(F.count("*").cast("long").alias("n_rel"))
    hitcol = F.col("_hit").isNotNull()
    j = (
        run.filter(F.col("rank") <= k)
        .join(
            rels.withColumn("_hit", F.lit(1)),
            [qid_col, id_col],
            "left",
        )
        .groupBy(qid_col)
        .agg(
            F.sum(
                F.when(hitcol, F.lit(1.0) / F.log2(F.col("rank") + 1)).otherwise(
                    0.0
                )
            ).alias("_dcg"),
            F.min(F.when(hitcol, F.col("rank"))).alias("_first"),
            F.sum(hitcol.cast("long")).alias("_hits"),
        )
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k)).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
    )
    out = j.join(nrel, qid_col, "left").fillna({"n_rel": 0})
    return out.select(
        F.col(qid_col),
        F.col("n_rel"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.when(F.col("n_rel") > 0, F.col("_dcg") / idcg).otherwise(0.0), 6
        ).alias("ndcg"),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.col("_hits").cast("double") / F.col("n_rel"),
            ).otherwise(0.0),
            6,
        ).alias("recall"),
    )
