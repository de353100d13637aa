"""PageRank over the host/link graph — crawl-frontier prioritization.

The reference crawls a fixed 41-site seed list, so its "priority" is crawl
order within a spider (GCSpider request ordering); a web-scale frontier
instead ranks candidate URLs/hosts by link-graph importance and drains the
frontier highest-rank-first (the politeness top-k in
operators/politeness.py takes any priority column — this operator produces
one). Power-iteration PageRank (Page et al. 1999) with damping and full
dangling-mass redistribution.

Scale shape:
  - edges are materialized once (localCheckpoint) and every round joins
    ranks⋈edges on src: with edges bucketed/pre-partitioned by src the
    join is co-located and only the (dst, contribution) pairs shuffle for
    the per-dst sum — one shuffle per round;
  - ranks is |nodes| rows (hosts, not URLs — orders of magnitude smaller
    than the edge set) so Spark's AQE broadcasts the ranks side of the
    join at production skew;
  - the dangling-mass scalar is computed INSIDE the dataflow (a 1-row
    aggregate crossJoin-broadcast back in), not collected per round — the
    whole k-iteration plan stays one lazy pipeline with k materialization
    points, no driver round-trips in the loop;
  - per-round persistence: each iteration's ranks are lazily
    localCheckpointed so round k+1 reads a materialized table instead of
    re-executing k rounds of lineage.

Node ids are longs (host hashes upstream); rank is double. A node with no
out-edges contributes its rank/N to every node (dangling redistribution),
so ranks sum to 1 every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after `iters` power iterations over the DISTINCT edge
    set. Parallel edges are collapsed first (a crawl link multigraph would
    otherwise double-count); self-loops are kept (a host linking to itself
    contributes to itself, matching the classic formulation on the
    collapsed graph)."""
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
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("_deg")).select(
        F.col("src").alias("_dnode"), "_deg"
    )
    # one driver scalar, once (not per round): the node count
    n = nodes.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks["node"] == deg["_dnode"], "left")
        # dangling mass: total rank parked on nodes with no out-edges —
        # a 1-row aggregate broadcast back into the dataflow
        dangling = with_deg.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        contrib = (
            with_deg.filter(F.col("_deg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dangling") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def allocate_budgets(
    ranks: DataFrame,
    total_budget: int,
    min_budget: int = 1,
    max_budget: int = 1_000,
) -> DataFrame:
    """Turn importance scores into the politeness drain's per-host budgets:

      (host, budget_per_batch) with budget = clamp(floor(total * rank /
      sum(rank)), min_budget, max_budget)

    — proportional-to-rank with a floor (every known host makes progress)
    and a cap (no host monopolizes a batch, whatever its rank). Clamping
    can leave part of `total_budget` unspent rather than iterating a
    water-filling redistribution: budgets are per-BATCH, so the slack rolls
    into the next micro-batch for free. The rank sum enters as a 1-row
    aggregate crossJoin-broadcast; output is host-cardinality and feeds
    politeness.topk_per_host(host_budgets=...) as a broadcast join."""
    s = ranks.agg(F.sum("rank").alias("_s"))
    return ranks.crossJoin(F.broadcast(s)).select(
        F.col("node").alias("host"),
        F.least(
            F.greatest(
                F.floor(total_budget * F.col("rank") / F.col("_s")).cast("int"),
                F.lit(min_budget),
            ),
            F.lit(max_budget),
        ).alias("budget_per_batch"),
    )


def frontier_priority(
    frontier: DataFrame, ranks: DataFrame, host_col: str = "host_hash64", floor: float = 0.0
) -> DataFrame:
    """Attach a drain priority to frontier rows: the host's PageRank (or
    `floor` for hosts outside the ranked graph). Ranks are tiny relative to
    the frontier — broadcast join, no frontier shuffle; feed the result's
    `priority` into politeness.drain_topk's ordering."""
    r = ranks.select(F.col("node").alias(host_col), F.col("rank").alias("priority"))
    return frontier.join(F.broadcast(r), host_col, "left").withColumn(
        "priority", F.coalesce(F.col("priority"), F.lit(floor))
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """TrustRank (Gyongyi/Garcia-Molina/Pedersen, VLDB 2004): PageRank with
    the teleport vector concentrated on a hand-vetted TRUSTED seed set —
    trust flows out along links and decays with distance, so link farms
    that rank well under uniform teleport (they manufacture in-links from
    nowhere trusted) score ~0 here. The spam screen that complements
    linkspam.reciprocity_stats' structural test; (node, trust) feeds the
    frontier drain priority exactly like pagerank's output.

    Personalized-PageRank recurrence: r(v) = (1-d)*s(v) + d*(contrib(v) +
    dangling*s(v)) with s the uniform seed distribution and r0 = s —
    dangling mass teleports BACK TO SEEDS, not to all nodes, so unreachable
    nodes stay at exactly 0 (the manual-vetting budget is what's scarce;
    see the paper's inverse-pagerank seed selection, out of scope here).

    `seeds` is a 1-column (node) frame. Scale shape identical to pagerank:
    one contribution shuffle per round, dangling as an in-dataflow 1-row
    broadcast, per-round lazy localCheckpoints; the seed vector rides the
    node table as a column, never a separate join in the loop.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    node_ids = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sd = seeds.select(F.col("node").cast("long").alias("_snode")).distinct()
    m = sd.count()
    if m == 0:
        raise ValueError("trustrank needs a non-empty seed set")
    nodes = (
        node_ids.join(sd, node_ids["node"] == sd["_snode"], "left")
        .select(
            "node",
            F.when(F.col("_snode").isNotNull(), F.lit(1.0 / m))
            .otherwise(F.lit(0.0))
            .alias("_s"),
        )
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("_deg")).select(
        F.col("src").alias("_dnode"), "_deg"
    )

    ranks = nodes.select("node", "_s", F.col("_s").alias("trust"))
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks["node"] == deg["_dnode"], "left")
        dangling = with_deg.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("trust"), F.lit(0.0)).alias("_dangling")
        )
        contrib = (
            with_deg.filter(F.col("_deg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("trust") / F.col("_deg")).alias("_c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_s",
                (
                    (1.0 - damping) * F.col("_s")
                    + damping
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dangling") * F.col("_s")
                    )
                ).alias("trust"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "trust")
