"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW 2000) — the random-walk cousin of HITS.

HITS (operators/hits.py) mutually reinforces: one strong hub inflates
every authority it points at, which is exactly the tightly-knit-community
(TKC) spam shape link farms exploit (operators/linkspam.py detects them).
SALSA breaks the amplification by NORMALIZING each step into a random
walk on the bipartite hub/authority graph: an authority passes its score
backward split EQUALLY over its in-links, a hub passes forward split
equally over its out-links —

    h_k(i)  = sum_{i->j} a_{k-1}(j) / indeg(j)
    a_k(j)  = sum_{i->j} h_k(i)   / outdeg(i)

Both vectors stay probability distributions every round (each node
appearing as a dst has indeg >= 1, each src has outdeg >= 1 over the
distinct edge set, so no mass leaks), which makes the fixed-iteration
run deterministic and oracle-checkable; at convergence the authority
walk's stationary weights are indegree-proportional within a component —
running a bounded iteration count from uniform is the standard
truncated-walk scoring.

Scale shape (the pagerank/opic discipline): edges deduped and lazily
localCheckpointed once; each round is two edge-joins + two groupBys
(authority->hub, hub->authority) where only (node, share) pairs shuffle;
degree tables live at node grain; no driver round-trips, per-round lazy
localCheckpoint truncates lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salsa(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, authority, hub) after `iters` bipartite walk rounds from
    the uniform authority distribution; authorities sum to 1, hubs sum
    to 1. Nodes that never appear as a dst have authority 0; nodes that
    never appear as a src have hub 0."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("es"),
            F.col(dst).cast("long").alias("ed"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    indeg = e.groupBy(F.col("ed").alias("an")).agg(
        F.count("*").cast("double").alias("ind")
    )
    outdeg = e.groupBy(F.col("es").alias("hn")).agg(
        F.count("*").cast("double").alias("outd")
    )
    m = indeg.agg(F.count("*").cast("double").alias("m"))
    a = indeg.crossJoin(F.broadcast(m)).select(
        F.col("an").alias("node"), (F.lit(1.0) / F.col("m")).alias("a")
    )

    h = None
    for i in range(iters):
        # lazy checkpoints defer lineage truncation to the final action;
        # past ~10 rounds the accumulated plan overflows the serializer
        # stack, so deep walks materialize eagerly every 8th round
        eager = i % 8 == 7
        a_share = a.join(indeg, a["node"] == indeg["an"]).select(
            F.col("node").alias("sn"), (F.col("a") / F.col("ind")).alias("sh")
        )
        h = (
            e.join(a_share, e["ed"] == a_share["sn"])
            .groupBy(F.col("es").alias("node"))
            .agg(F.sum("sh").alias("h"))
            .localCheckpoint(eager=eager)
        )
        h_share = h.join(outdeg, h["node"] == outdeg["hn"]).select(
            F.col("node").alias("sn"), (F.col("h") / F.col("outd")).alias("sh")
        )
        a = (
            e.join(h_share, e["es"] == h_share["sn"])
            .groupBy(F.col("ed").alias("node"))
            .agg(F.sum("sh").alias("a"))
            .localCheckpoint(eager=eager)
        )
    return (
        a.join(h, "node", "full")
        .select(
            "node",
            F.coalesce(F.col("a"), F.lit(0.0)).alias("authority"),
            F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"),
        )
    )
