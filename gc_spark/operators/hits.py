"""HITS (hubs & authorities) over the host/link graph — the second classic
link-analysis signal next to PageRank (operators/pagerank.py).

Why a crawler wants BOTH: PageRank ranks *authorities* (pages worth
fetching); the hub score ranks *link pages* (indexes/sitemaps/listing pages
worth re-crawling often because they discover new URLs). The reference's
fixed 41-site seed list hard-codes this split — every seed page IS a hub
(a listing page whose table rows are parsed into downloadable documents,
e.g. spiders/us_code_spider.py's table scrape) and every document URL an
authority; at web scale the split must be learned from the link graph.

Kleinberg's iterative algorithm (Authoritative Sources in a Hyperlinked
Environment, JACM 1999):

    a(v) = Σ_{u→v} h(u)        then normalize
    h(u) = Σ_{u→v} a(v)        then normalize

We normalize by the SUM (L1) rather than the L2 norm: both converge to the
same ranking (normalization only rescales), L1 keeps the oracle SQL exact
in floating point, and scores read as probability mass like PageRank's.

Scale shape (mirrors pagerank.py):
  - edges are deduped and localCheckpointed ONCE; each half-step is one
    broadcast-able join (scores side is |nodes| = hosts, tiny vs edges)
    plus one groupBy shuffle on the edge set;
  - both normalizing sums are 1-row aggregates crossJoin-broadcast back
    into the dataflow — zero driver collects inside the loop;
  - each iteration's (node, hub, auth) frame is lazily localCheckpointed
    so round k+1 reads a materialized |nodes|-sized table, not k rounds
    of edge-set lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, hub, auth) after `iters` HITS iterations on the DISTINCT edge
    set, L1-normalized each half-step. Nodes with no out-edges get hub 0;
    nodes with no in-edges get auth 0 (they still appear in the output)."""
    e = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one driver scalar, once — not per round

    scores = nodes.withColumn("hub", F.lit(1.0 / n))
    for _ in range(iters):
        # authority step: a(v) = Σ h(u) over in-edges u→v, then L1-normalize
        a_raw = (
            e.join(scores.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("_a"))
        )
        a_tot = a_raw.agg(F.coalesce(F.sum("_a"), F.lit(1.0)).alias("_at"))
        auth = (
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .crossJoin(F.broadcast(a_tot))
            .select("node", (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_at")).alias("auth"))
        )
        # hub step: h(u) = Σ a(v) over out-edges u→v, then L1-normalize
        h_raw = (
            e.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("_h"))
        )
        h_tot = h_raw.agg(F.coalesce(F.sum("_h"), F.lit(1.0)).alias("_ht"))
        scores = (
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .crossJoin(F.broadcast(h_tot))
            .join(auth, "node")
            .select(
                "node",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_ht")).alias("hub"),
                "auth",
            )
            .localCheckpoint(eager=False)
        )
    return scores
