"""OPIC — On-line Page Importance Computation (Abiteboul, Preda & Cobena,
WWW 2003) — the crawl-native importance estimate.

PageRank (operators/pagerank.py) needs the whole link graph converged
before any rank is usable; OPIC is what a crawler actually runs WHILE
crawling: every page holds "cash", distributes it to its out-links when
visited, and the importance estimate at any instant is the share of total
cash a page has EVER held (history + current). The reference has no twin
(its 41-spider frontier is a fixed seed list — SURVEY.md §6 family); at
10^10-frontier scale, OPIC is the standard cheap alternative to full
PageRank for frontier prioritization because the estimate is valid at
every step, not only at convergence.

This is the synchronous batch variant (all pages distribute each round —
the paper's "off-line" formulation, deterministic and oracle-checkable):

    cash_0(i) = 1/n,              hist_0(i) = 0
    hist_k    = hist_{k-1} + cash_{k-1}        (cash spent joins history)
    cash_k(i) = sum_{j->i} cash_{k-1}(j)/deg(j) + dangling_{k-1}/n

Dangling pages (no out-links) pay the virtual root, which redistributes
uniformly in the same round — total cash is conserved at 1 every round,
so after R rounds importance(i) = (hist_R(i) + cash_R(i)) / (R + 1) is a
probability vector (sums to 1).

Scale shape (identical to pagerank.py — one shuffle per round):
  - edges deduped + localCheckpointed once; per round the cash table
    (|hosts| rows — small) joins edges on src, and only (dst, cash/deg)
    pairs shuffle for the per-dst sum;
  - the dangling scalar is a 1-row aggregate crossJoin-broadcast back in,
    never collected to the driver;
  - per-round lazy localCheckpoint truncates lineage so round k+1 reads a
    materialized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def opic(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, importance) after `iters` synchronous cash-distribution
    rounds over the DISTINCT edge set; importance = (hist + cash)/(iters+1)
    sums to 1. Parallel edges collapse first (multigraph links would
    double-pay); self-loops keep their cash (classic collapsed-graph
    formulation, matching pagerank.py)."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # keyed by a renamed column: deg shares lineage with e, and a later
    # deg-join + e-join in the same plan would make `src` ambiguous
    deg = e.groupBy(F.col("src").alias("dn")).agg(
        F.count("*").cast("double").alias("d")
    )
    nn = nodes.agg(F.count("*").cast("double").alias("n"))

    state = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("cash"), F.lit(0.0).alias("hist")
    )
    for it in range(iters):
        # cash held by dangling nodes this round — 1-row aggregate, stays
        # in the dataflow (broadcast back), no driver round-trip
        dangling = (
            state.join(deg, state["node"] == deg["dn"], "left")
            .where(deg["dn"].isNull())
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dang"))
        )
        ee = e.select(F.col("src").alias("es"), F.col("dst").alias("ed"))
        incoming = (
            state.join(deg, state["node"] == deg["dn"])
            .join(ee, state["node"] == ee["es"])
            .groupBy(F.col("ed").alias("node"))
            .agg(F.sum(F.col("cash") / F.col("d")).alias("s"))
        )
        state = (
            nodes.join(incoming, "node", "left")
            .join(state.select("node", F.col("cash").alias("_pc"), F.col("hist").alias("_ph")), "node")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dang") / F.col("n")).alias("cash"),
                (F.col("_ph") + F.col("_pc")).alias("hist"),
            )
            # deep runs materialize every 8th round: purely-lazy
            # checkpoints let the accumulated plan overflow the
            # serializer stack past ~10 rounds
            .localCheckpoint(eager=it % 8 == 7)
        )
    return state.select(
        "node",
        ((F.col("hist") + F.col("cash")) / F.lit(float(iters + 1))).alias("importance"),
    )
