"""N-gram novelty by crawl order: how much NEW content each fetch added.

A recrawl-heavy frontier wastes budget on pages whose content the corpus
already holds. Per-document novelty = fraction of the doc's distinct
n-grams whose global FIRST occurrence (by crawl sequence) is this doc.
Early copies of syndicated content score ~1.0, later mirrors ~0.0 — the
signal that drives both recrawl scheduling (drop stale-content hosts) and
training-data curation (prefer the first/primary source).

Plan: explode distinct n-gram hashes per doc with the doc's crawl seq,
groupBy(gram) -> min(seq) (the one corpus-wide shuffle, keyed on a
high-cardinality hash: no skew), join back on gram, then a per-doc
average of first_seq == my_seq. Both shuffles are on hashes; everything
is codegen expressions + hash aggregates.

Determinism: crawl seq must be unique per doc (the engine's dense seq from
operators/sequence.py is); ties would otherwise double-credit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.text import word_ngrams_col
from gc_spark.operators.text_dedup import sha60_col


def novelty_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    seq_col: str = "seq",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, seq, n_grams, novel_frac): novel_frac in [0,1] is the share
    of the doc's distinct word n-grams first seen (by seq order) in it."""
    # the gram frame feeds both the first-seen aggregate and the join-back
    # side; the planner shares nothing across the two subtree
    # instantiations, so the tokenize+ngram+sha pass ran twice per corpus.
    # One lazy localCheckpoint of the NARROW (doc, seq, gh) projection
    # (8-byte hashes, no text) materializes it once per invocation. The
    # groupBy+join shape is kept over a window-min: the join side stays
    # AQE-skew-splittable when a boilerplate gram goes hot, a window
    # partition does not.
    grams = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.col(seq_col).alias("seq"),
            F.explode(
                F.array_distinct(word_ngrams_col(F.col(text_col), n))
            ).alias("g"),
        )
        .select("doc", "seq", sha60_col(F.col("g")).alias("gh"))
        .localCheckpoint(eager=False)
    )
    first = grams.groupBy("gh").agg(F.min("seq").alias("first_seq"))
    return (
        grams.join(first, "gh")
        .groupBy("doc", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.avg((F.col("seq") == F.col("first_seq")).cast("double")), 6
            ).alias("novel_frac"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("seq").alias(seq_col),
            "n_grams",
            "novel_frac",
        )
    )
