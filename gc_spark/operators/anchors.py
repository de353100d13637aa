"""Anchor-text aggregation — naming/describing a target URL from the link
texts pointing at it.

A crawler discovers most URLs long before it fetches them; the anchor texts
of in-links are the only description available for scheduling (and, at
training-data scale, anchor aggregates are a quality/spam signal: one
dominant anchor = navigational, thousands of identical anchors across hosts
= link farm). The reference names documents from the *listing row* that
links to them (e.g. spiders/us_code_spider.py parses the table row text
next to the href) — the same "text near the link describes the target"
signal, hard-coded per site; this operator is the web-scale generalization.

Scale shape: counts reduce to (target, anchor) cardinality with map-side
partial aggregation BEFORE any window — a hot target with 10^8 in-links
but 10^3 distinct anchors costs 10^3 window rows, not 10^8. The top-k
window partitions by target on the already-aggregated frame; per-target
totals ride the same shuffle via a window sum instead of a second groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_anchor_texts(
    links: DataFrame,
    k: int = 3,
    target_col: str = "target",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(target, anchor, n, rank, total_links): the k most frequent anchor
    texts per target, rank 1 = most frequent, ties broken by anchor text
    ascending (deterministic), total_links = all in-links of the target."""
    counts = links.groupBy(target_col, anchor_col).agg(F.count("*").alias("n"))
    wt = Window.partitionBy(target_col)
    wr = wt.orderBy(F.col("n").desc(), F.col(anchor_col).asc())
    return (
        counts.withColumn("total_links", F.sum("n").over(wt))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(target_col, anchor_col, "n", "rank", "total_links")
    )
