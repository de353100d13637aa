"""Triangle counting and local clustering coefficient on the host graph.
Triangles separate organic link neighborhoods (high clustering among
topically-related hosts) from spam constellations, and the clustering
coefficient feeds the same frontier-quality scoring family as q84
host_reputation and q102 link-farm reciprocity. Algorithm is the classic
distributed node-iterator with DEGREE ORIENTATION (public literature:
Suri & Vassilvitskii, "Counting triangles and the curse of the last
reducer", WWW'11): orient every undirected edge from the lower-(degree,
node) endpoint to the higher, so each wedge is generated exactly once at
its lowest-degree corner — the hub host that would otherwise emit
deg² wedges emits almost none, killing the skew that breaks naive
wedge-joins at web scale.

Scale shape: one aggregate for degrees (broadcast-joined back), one
self-join of the oriented edge list on the wedge corner, one semi-join of
wedges against oriented edges to close triangles, one rollup. Every join
is an equi-join on host keys; wedge volume is sum(min-degree choose 2),
the theoretical optimum. The edge set, the oriented edge set, and the
closed-triangle set are each REUSED by multiple downstream branches, so
each is lineage-truncated with localCheckpoint — without that the plan
re-derives the distinct-edge shuffle ~124 times (measured at sf0.001).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(df: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Distinct undirected edges as (lo, hi), self-loops dropped."""
    return (
        df.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def triangle_stats(
    df: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(host, degree, triangles, coeff) per host with degree >= 1;
    coeff = 2*triangles / (degree*(degree-1)), 0 when degree < 2."""
    edges = _canonical_edges(df, src_col, dst_col).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("lo").alias("h"))
        .unionByName(edges.select(F.col("hi").alias("h")))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("degree"))
    )

    # orient lower-(degree, node) -> higher: each wedge materializes once,
    # at its lowest-degree corner
    e = (
        edges.join(deg.select(F.col("h").alias("lo"), F.col("degree").alias("_dl")), "lo")
        .join(deg.select(F.col("h").alias("hi"), F.col("degree").alias("_dh")), "hi")
        .select(
            F.when(
                (F.col("_dl") < F.col("_dh"))
                | ((F.col("_dl") == F.col("_dh")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("u"), F.col("hi").alias("v")),
            )
            .otherwise(F.struct(F.col("hi").alias("u"), F.col("lo").alias("v")))
            .alias("_e")
        )
        .select(F.col("_e.u").alias("u"), F.col("_e.v").alias("v"))
        .localCheckpoint(eager=False)
    )

    wedges = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.u") == F.col("b.u"))
        .filter(F.col("a.v") < F.col("b.v"))
        .select(
            F.col("a.u").alias("corner"),
            F.col("a.v").alias("x"),
            F.col("b.v").alias("y"),
        )
    )
    # close the wedge: (x, y) or (y, x) must be an oriented edge
    closing = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionByName(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    tris = wedges.join(closing, ["x", "y"], "left_semi").localCheckpoint(
        eager=False
    )

    per_host = (
        tris.select(F.col("corner").alias("h"))
        .unionByName(tris.select(F.col("x").alias("h")))
        .unionByName(tris.select(F.col("y").alias("h")))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_host, "h", "left")
        .select(
            F.col("h").alias("host"),
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1.0)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )
