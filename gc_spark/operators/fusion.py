"""Reciprocal-rank fusion (RRF) of retrieval rank lists.

Hybrid retrieval for training-data curation and search: a lexical ranker
(BM25, operators/bm25.py) and a semantic ranker (embedding cosine,
operators/similarity.py) each produce a top-k list; RRF fuses them with
score(d) = sum over lists of 1 / (k0 + rank_list(d)) — the standard
parameter-light fusion (public literature: Cormack, Clarke & Buettcher
2009), robust to incomparable score scales because only RANKS enter.

Scale shape: each input list is already k rows (the expensive part — the
rankers — ran upstream with their own scale-correct plans), so the fusion
itself is a union of tiny frames + one k-sized aggregate: driver-light,
shuffle-negligible, and trivially correct at any corpus size because the
corpus never reaches this operator.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_lists: Sequence[DataFrame],
    k0: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse rank lists (each: id_col, rank_col with rank starting at 1)
    into (id, rrf_score, n_lists, fused_rank), top `topk` by score.

    Scores are rounded to 9 dp BEFORE the rank window so engines that
    sum floats in different orders rank identically; ties break to the
    lower id. The global window is safe: its input is at most
    sum(len(list_i)) rows."""
    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    tagged = [df.select(F.col(id_col), F.col(rank_col).alias("rank")) for df in ranked_lists]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    fused = u.groupBy(id_col).agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))), 9).alias(
            "rrf_score"
        ),
        F.count("*").alias("n_lists"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= topk)
        .select(id_col, "rrf_score", "n_lists", "fused_rank")
    )


def cosine_topk_ranked(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(id, sim, rank): brute-force cosine top-k with an explicit rank
    column — the semantic input to rrf_fuse. One scan + TakeOrdered-style
    top-k; sim rounded before ranking for cross-engine determinism."""
    emb_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qcol = F.array([F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(emb_d, qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(
        F.aggregate(F.transform(emb_d, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    norm_q = float(sum(x * x for x in query_vec)) ** 0.5
    sim = F.round(dot / (norm_a * F.lit(norm_q)), round_digits)
    scored = df.select(F.col(id_col), sim.alias("sim")).orderBy(
        F.desc("sim"), F.asc(id_col)
    ).limit(k)
    w = Window.orderBy(F.desc("sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w))
