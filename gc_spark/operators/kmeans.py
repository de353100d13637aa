"""Lloyd k-means over embedding columns — semantic corpus clustering.

LLM-pipeline motivation: cluster the document embedding space to balance a
training mixture (per-cluster caps), to route near-dup detection
(esdedup.py probes within clusters), and to seed the IVF ANN index
(similarity.py:279 takes exactly these centroids). The reference crawls a
single curated domain so it never needed this; at 100 TB of scraped text
it is the standard corpus-shaping step (public algorithm: Lloyd 1957/1982).

Scale shape:
  - the corpus table NEVER shuffles: per-iteration assignment is a
    broadcast of k*d centroid scalars folded into a native expression
    (zip_with + aggregate — whole-stage codegen, no Python);
  - the only aggregation is the centroid update, a (k*dim)-row groupBy —
    map-side combined, output is k*d scalars regardless of corpus size;
  - only those k*d scalars reach the driver between iterations (same
    contract as the IVF trainer's centroid collect);
  - centroid components are quantized with round(., 6) at every iteration
    boundary so reruns (and the DuckDB oracle twin) see bit-identical
    centroid state regardless of each engine's partial-sum order.

Determinism: seeds are the k lowest-id rows; assignment ties break on the
lower cluster id (struct array_min compares distance then cid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(vec_col, centroid: list[float]):
    """Squared L2 distance from an array<double> column to a centroid
    literal, folded in array order (native expressions only)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(pts: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add (cluster, dist2) to a frame with an array<double> `_v` column:
    argmin over the k broadcast centroid literals, ties to the lower id."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(F.col("_v"), c).alias("d2"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )
    return pts.withColumn("_best", best).select(
        "*",
        F.col("_best.cid").alias("cluster"),
        F.col("_best.d2").alias("dist2"),
    ).drop("_best")


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run `iters` Lloyd iterations; return per-point (id, cluster, dist2).

    Seeds: the k lowest-id rows. Empty clusters keep their previous
    centroid. Centroids are rounded to 6 decimals at every boundary (see
    module docstring). The returned frame is lazily assignable — callers
    aggregate it (see q160) or join it back to the corpus.
    """
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    seed_rows = pts.orderBy("_id").limit(k).collect()
    centroids = [list(r["_v"]) for r in seed_rows]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = assign_clusters(pts, centroids)
        upd = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("c"))
            .collect()  # k*dim scalars — the only driver transfer
        )
        by_cluster: dict[int, list[float]] = {}
        for r in upd:
            by_cluster.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["c"]
        centroids = [by_cluster.get(j, centroids[j]) for j in range(k)]

    return assign_clusters(pts, centroids).select("_id", "cluster", "dist2")


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """(cluster, n_points, avg_dist2) rollup of a kmeans_lloyd result."""
    return assigned.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.avg("dist2"), 4).alias("avg_dist2"),
    )
