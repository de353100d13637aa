"""Elias-Fano vs gap-varint postings sizing — index layout planner.

Before materializing the inverted index (operators/inverted) at corpus
scale, the storage question per term is which encoding its posting list
wants: Elias-Fano (Vigna 2013, "quasi-succinct indices" — the encoding
behind Lucene/Kaldi posting blocks) costs a closed-form
n * (2 + ceil(log2(U/n))) bits for n monotone doc ids in universe U,
while classic delta-gap varint costs 8 * sum(floor(log2(gap))/7 + 1)
bits. Dense terms (stopwords) want EF; sparse long-tail terms want
varints. This operator prices both per term and picks, the same
planner role frontcode.py plays for the term dictionary — postings
instead of strings.

Scale shape: one distinct (term, doc) contraction is the only
corpus-sized shuffle; gaps come from a LAG window partitioned by term
over already-contracted postings (term grain — hot stopword terms are
exactly the rows EF wins on, and their window is bounded by doc_freq,
the quantity being priced). The universe size rides as a 1-row
broadcast. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def postings_size_plan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """(term, doc_freq, ef_bits, varint_bits, best, bits_saved) per term.

    best is 'ef' or 'varint' (ties to 'ef', the seekable encoding);
    bits_saved is the positive saving of the winner over the loser.
    """
    postings = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    universe = df.agg(
        (F.max(F.col(id_col)) + 1).cast("double").alias("uu")
    )

    w = Window.partitionBy("term").orderBy("doc")
    gaps = postings.withColumn(
        "gap", F.col("doc") - F.lag("doc").over(w)
    ).withColumn("gap", F.coalesce(F.col("gap"), F.col("doc") + 1))

    per_term = gaps.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sum(
            8
            * (
                F.floor(F.floor(F.log2(F.greatest(F.col("gap"), F.lit(1)))) / 7)
                + 1
            )
        ).alias("varint_bits"),
    )
    ef = per_term.crossJoin(F.broadcast(universe)).withColumn(
        "ef_bits",
        F.col("doc_freq")
        * (
            2
            + F.greatest(
                F.lit(0),
                F.ceil(F.log2(F.col("uu") / F.col("doc_freq"))),
            )
        ),
    )
    return ef.select(
        "term",
        "doc_freq",
        "ef_bits",
        "varint_bits",
        F.when(F.col("ef_bits") <= F.col("varint_bits"), "ef")
        .otherwise("varint")
        .alias("best"),
        F.abs(F.col("ef_bits") - F.col("varint_bits")).alias("bits_saved"),
    )
