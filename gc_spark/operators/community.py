"""Label-propagation community detection (semi-synchronous LPA).

Crawl motivation: host-graph communities are the coarse unit for mirror
farms (mirrors.py finds exact twins; LPA finds the neighborhoods), crawl
sharding (keep a community on one executor pool so its intra-links dedupe
locally), and spam containment (linkspam.py's TrustRank seeds propagate
badly INTO a community, rarely across). Public algorithm: Raghavan,
Albert, Kumara, "Near linear time algorithm to detect community
structures in large-scale networks", Phys. Rev. E 76 (2007).

Determinism: synchronous rounds (all nodes update from the SAME previous
labeling — no update-order dependence), ties broken to the smallest
label. That makes a fixed-round run exactly reproducible, and therefore
DuckDB-oracle-checkable, unlike the asynchronous textbook variant.

Scale shape per round: one edge–label equi-join (edge-partitioned, the
label side keyed by node) + one (node, label) count with map-side combine
+ one per-node window. Nothing corpus-sized ever reaches the driver; the
label frame is the checkpointable state between rounds (checkpoint every
few rounds in production to cut the lineage, as connected_components
does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, iters: int = 2) -> DataFrame:
    """Run `iters` synchronous LPA rounds over an undirected graph given as
    (a, b) edge rows (symmetrized + deduped internally). Returns
    (node, community) — the label after the final round. Isolated nodes
    don't occur (every node has an edge by construction of the input)."""
    sym = (
        edges.select("a", "b")
        .unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iters):
        nb = sym.join(labels, sym["b"] == labels["node"]).select(
            sym["a"].alias("node"), "label"
        )
        counts = nb.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
    return labels.select("node", F.col("label").alias("community"))
