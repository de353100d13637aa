"""Shingle-containment pairs: find documents mostly CONTAINED in another.

Jaccard (operators/text_dedup) is symmetric — it misses the asymmetric
case that dominates real crawls: a press release quoted inside a longer
article, a summary page embedding a document's abstract, a mirror that
appends boilerplate. Containment(A in B) = |shingles(A) ∩ shingles(B)| /
|shingles(A)| stays high when A is a subset of a much larger B, exactly
where Jaccard collapses.

Plan (prefix-filter style, the set-similarity-join standard):
  1. distinct shingle-hash set per doc (one sha256/shingle, native)
  2. document frequency per shingle; shingles with df > df_cap are dropped
     BEFORE the join — boilerplate shingles ("click here to download")
     appear in millions of docs and would square the join; capping df
     bounds every shingle's contribution to df_cap^2 pairs (skew kill)
  3. inverted join on shingle hash -> pair intersection counts
  4. containment = inter / |indexed shingles of the smaller-side doc|

Semantics note: with df_cap set, containment is over the INDEXED shingle
set (df <= cap) — the denominator is the doc's indexed-shingle count, so
the ratio stays a true fraction of what was searched. df_cap=None gives
exact containment.

Scale shape: shuffles are groupBy(shingle) and groupBy(pair) — both keyed
on high-cardinality hashes; the df cap is what keeps the self-join linear
in corpus size rather than quadratic in df of the hottest shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.text_dedup import _shingles, sha60_col


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """(a, b, inter, size_a, containment) for ordered pairs a != b with
    containment(a in b) >= threshold. `a` is the contained (smaller) side;
    containment is measured against a's indexed shingle count."""
    sh = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(_shingles(F.col(text_col)))).alias("s"),
        )
        .select("doc", sha60_col(F.col("s")).alias("sh"))
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("size_a"))
    if df_cap is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > df_cap)
            .select("sh")
        )
        sh = sh.join(hot, "sh", "left_anti")
        sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("size_a"))
    a = sh.select(F.col("doc").alias("a"), "sh")
    b = sh.select(F.col("doc").alias("b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "a"), "a")
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.col("size_a"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("a", "b", "inter", "size_a", "containment")
    )
