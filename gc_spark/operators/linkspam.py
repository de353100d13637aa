"""Link-farm / reciprocal-link detection over the host graph. Link farms
inflate PageRank (q52) and HITS (q69) by dense mutual linking; the
standard first-order signal (public literature: Gyöngyi & Garcia-Molina,
"Link spam alliances", VLDB'05) is a host whose outlinks are mostly
RECIPROCATED — organic linking is overwhelmingly one-directional.

Per host: out-degree (distinct link targets), how many of those targets
link back, the reciprocity ratio, and a farm flag at ratio >= min_ratio
with out-degree >= min_degree (low-degree hosts can't give evidence).

Scale shape: distinct host-edge set (one aggregate — host edges are
already tiny vs page edges), one self-join on the reversed edge to mark
reciprocation (equi-join on (dst, src) = (src, dst), shuffle-partitioned
on the join key; no broadcast assumption since the host graph can still be
billions of edges), one rollup to host grain. The flag table is host-
vocabulary sized and broadcasts into PageRank as a damping exclusion or
into the frontier as a priority penalty (operators/budget_select).

No reference twin (curated-site crawler); part of the open-web frontier-
quality family with q84 host_reputation and q57 trap_detect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocity_stats(
    df: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_ratio: float = 0.5,
    min_degree: int = 5,
) -> DataFrame:
    """(host, out_degree, reciprocal, ratio, is_farm) per linking host."""
    # the distinct-edge shuffle is reused by both sides of the reciprocal
    # self-join — truncate lineage so it runs once, not once per reference
    edges = (
        df.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("_r")
    )
    marked = edges.join(rev, ["src", "dst"], "left")
    return (
        marked.groupBy(F.col("src").alias("host"))
        .agg(
            F.count(F.lit(1)).alias("out_degree"),
            F.sum(F.coalesce(F.col("_r"), F.lit(0))).alias("reciprocal"),
        )
        .select(
            "host",
            "out_degree",
            "reciprocal",
            F.round(F.col("reciprocal") / F.col("out_degree"), 6).alias("ratio"),
            (
                (F.col("reciprocal") / F.col("out_degree") >= F.lit(min_ratio))
                & (F.col("out_degree") >= F.lit(min_degree))
            ).alias("is_farm"),
        )
    )


def powerlaw_alpha(
    degrees: DataFrame, degree_col: str = "deg", d_min: int = 2
) -> DataFrame:
    """Hill maximum-likelihood estimate of the power-law exponent of a
    degree distribution: alpha = 1 + n_tail / sum(ln(d_i / d_min)) over
    degrees >= d_min. A natural web in-link distribution sits near
    alpha ~ 2.1 (Broder et al.); a link farm's manufactured near-uniform
    in-degrees push alpha far up (no heavy tail), and scraped-mirror
    sprawl pushes it down — a one-number corpus-shape alarm that
    complements the per-pair reciprocity test (reciprocity_stats) and
    TrustRank's seed-flow view.

    One filter + one aggregate over the host-cardinality degree table:
    (n_tail, d_min, alpha_hat). Degenerate tails (all degrees
    == d_min: the sum is 0) yield null alpha rather than infinity.
    """
    d = F.col(degree_col).cast("double")
    logsum = F.sum(F.log(d / d_min))
    n_tail = F.count(F.lit(1))
    tail = degrees.filter(F.col(degree_col) >= d_min)
    return tail.agg(
        n_tail.cast("long").alias("n_tail"),
        F.lit(d_min).cast("int").alias("d_min"),
        F.round(
            F.when(logsum > 0, 1.0 + n_tail / logsum), 6
        ).alias("alpha_hat"),
    )
