"""Adamic-Adar link prediction over the host graph — scoring which
not-yet-linked host pairs are likely related, to prioritize frontier
discovery (crawl the neighborhood of strongly-implied links first) and to
flag suspicious cliques the raw edge list doesn't show yet.

AA(a, b) = sum over common neighbors z of 1 / ln(degree(z)) (public
method: Adamic & Adar 2003). High-degree hubs contribute little (everyone
shares them); rare shared neighbors dominate — which is exactly why it
beats common-neighbor counting on web graphs.

Scale shape: the same wedge-generation discipline as the triangle counter
(operators/triangles): pairs are generated AT THE NEIGHBOR, so a neighbor
with degree d emits d*(d-1)/2 wedges — df-cap the hub neighbors
(max_degree) exactly like the containment join caps hot shingles; hubs
past the cap are the pairs AA itself down-weights to ~0, so the cap is
principled, not just pragmatic. One groupBy(pair) aggregate after the
wedge expansion; existing edges are anti-joined out at the end."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adamic_adar(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int = 64,
    min_score: float = 0.0,
) -> DataFrame:
    """(host_a, host_b, n_common, aa_score) for host pairs NOT already
    linked, host_a < host_b. Input edges are treated as undirected and
    deduplicated. Neighbors with degree > max_degree are excluded from
    wedge generation (their 1/ln(d) contribution is negligible and their
    wedge fan-out is quadratic)."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("z")).agg(F.count("*").alias("deg"))
    # neighbor lists generated at z; df-cap the hubs
    nbrs = adj.select(F.col("b").alias("z"), F.col("a").alias("n"))
    capped = nbrs.join(
        F.broadcast(deg.where(F.col("deg") <= max_degree)), "z"
    )
    left = capped.select("z", "deg", F.col("n").alias("x"))
    right = capped.select("z", F.col("n").alias("y"))
    wedges = left.join(right, "z").where(F.col("x") < F.col("y"))
    scored = wedges.groupBy(
        F.col("x").alias("host_a"), F.col("y").alias("host_b")
    ).agg(
        F.count("*").alias("n_common"),
        F.round(F.sum(1.0 / F.log("deg")), 6).alias("aa_score"),
    )
    existing = und.select(
        F.col("a").alias("host_a"), F.col("b").alias("host_b")
    )
    return scored.join(existing, ["host_a", "host_b"], "left_anti").where(
        F.col("aa_score") > min_score
    )
