"""Multi-source BFS over the link graph: min crawl depth from the seed set.

Every reference spider enforces a crawl-depth limit implicitly (fixed-depth
page->detail->download hops, e.g. the two-hop pending flow in
gamechanger-crawlers' spiders); a general frontier needs the depth of every
discovered URL from the seed list so that `max_depth` is a filter on data,
not control flow baked into per-site code. The output (node, depth) feeds
frontier prioritization (shallow pages first) and trap suppression (depth
spikes under a single host).

Algorithm: level-synchronous BFS. `visited` holds (node, min_depth);
each round joins only the CURRENT frontier (last level, typically a small
fraction of the graph) against the edge table, anti-joins `visited`, and
unions the survivors in at depth d. First visit == min depth, so no
re-labeling is ever needed. Rounds = min(graph diameter from seeds,
max_depth) — a crawl cap of 10-20, not O(V).

Scale shape: the per-round shuffles touch the frontier (small) and the
edge table keyed by src; at production scale the edge table is written
bucketed on src (sources/bucketed.py) so the per-round join reads
co-located buckets with no Exchange on the big side. The anti-join's right
side is `visited`, which grows to the reachable set — the same growth the
seen-set anti-join already handles (bloom prefilter + bucketed exact
confirm). Lineage is truncated per round with localCheckpoint; the eager
checkpoint of the new frontier doubles as the emptiness probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 10,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """(node, depth) for every node reachable from `seeds` in <= max_depth
    directed hops; depth is the MINIMUM hop count (seeds themselves at 0).
    Nodes further than max_depth are absent — that's the crawl-cap filter."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).localCheckpoint(
        eager=False
    )
    visited = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("int").alias("depth"))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(d).cast("int").alias("depth"))
            .localCheckpoint()  # eager: materialized once, probed + reused
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited
