"""Edit-distance<=1 string join via deletion variants (SymSpell scheme).

Crawl frontiers accumulate typo'd / mutated URL and doc-name variants
(off-by-one-character paths from broken templating are a classic DUST
source). A naive fuzzy self-join is quadratic with a per-pair edit
distance; the SymSpell trick (Garbe's symmetric-delete algorithm, same
candidate scheme as Norvig's corrector inverted) makes it an EQUI-join:
two strings are within edit distance 1 (insert/delete/substitute) only
if they share a "deletion variant" — the string itself or the string
with one character removed. Generate <= len+1 variants per string,
equi-join on the variant, verify survivors with the exact levenshtein.

Scale shape: variants explode natively (transform over a position
sequence + substr concatenation — no UDF), the join is a plain hash
equi-join on the variant string, and the exact levenshtein runs only on
the candidate pairs the variant join produced (tiny: near-dups + the
rare distance-2 collisions like "ab"/"ba" that verification removes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """Array of the string plus every 1-character-deletion of it."""
    one_del = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1),
            col.substr(i + 1, F.length(col)),
        ),
    )
    return F.when(
        F.length(col) > 0, F.array_union(F.array(col), one_del)
    ).otherwise(F.array(col))


def edit1_pairs(df: DataFrame, str_col: str = "s") -> DataFrame:
    """(s_a, s_b, dist) for every pair of DISTINCT strings at levenshtein
    distance exactly 1 (s_a < s_b). Exact: the deletion-variant join is
    a complete candidate generator for distance <= 1, and survivors are
    verified with the true edit distance."""
    s = df.select(F.col(str_col).alias("_s")).distinct()
    var = s.select(
        "_s", F.explode(deletion_variants(F.col("_s"))).alias("_v")
    )
    a = var.select(F.col("_s").alias("s_a"), "_v")
    b = var.select(F.col("_s").alias("s_b"), "_v")
    cands = (
        a.join(b, "_v")
        .filter(F.col("s_a") < F.col("s_b"))
        .select("s_a", "s_b")
        .distinct()
    )
    return cands.withColumn("dist", F.levenshtein("s_a", "s_b")).filter(
        F.col("dist") == 1
    )
