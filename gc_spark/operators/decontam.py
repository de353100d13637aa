"""Benchmark decontamination — drop training documents that leak evaluation
data (the step every serious pretraining pipeline runs after dedup).

Method: exact word n-gram overlap (the GPT-3/PaLM-style check). The
benchmark side is exploded to its DISTINCT n-grams once; the corpus side
streams its n-grams into a join against that set. At 100 TB the benchmark
n-gram set is tiny relative to the corpus (benchmarks are MBs), so Catalyst
broadcast-joins it and the corpus never shuffles — the whole check is one
scan + map-side join + partial-agg groupBy on doc_id (which re-uses the
scan's natural partitioning for the count).

No reference twin: gamechanger-crawlers has no training-data hygiene; this
belongs to the LLM-pipeline operator family (SURVEY.md §6 / round brief)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.text import word_ngrams_col


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag corpus docs sharing at least one word n-gram with the benchmark.

    Returns (doc_id, n_overlapping_ngrams) for contaminated docs —
    n_overlapping_ngrams counts the doc's DISTINCT n-grams that appear in
    the benchmark's n-gram set (distinct-on-both-sides keeps the count
    stable under repeated grams on either side)."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams_col(F.col(text_col), n))).alias(
                "gram"
            )
        )
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams_col(F.col(text_col), n))).alias("gram"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlapping_ngrams"))
    )
