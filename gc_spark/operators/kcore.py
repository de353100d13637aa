"""Bounded k-core peeling on the host graph. The k-core (maximal subgraph
where every vertex keeps degree >= k) is the classic density/degeneracy
signal for web-graph analysis: spam constellations and tightly-knit
communities live in high cores while the organic crawl fringe peels away
(public literature: Seidman 1983; distributed peeling per
Montresor et al., "Distributed k-core decomposition", PODC'11).

Semantics here are ROUND-BOUNDED like operators/bfs (depth cap): peel at
most `rounds` times — each round drops every vertex whose current degree
is < k, then recomputes degrees. A fixed round count keeps the operator
oracle-checkable (the SQL twin unrolls the same rounds) and bounds the
shuffle count; real graphs converge in a handful of rounds because
peeling cascades are shallow.

Scale shape per round: one degree aggregate (host-vocabulary sized) and
two semi-joins of the edge list against the survivor set — all equi-joins
on host keys, AQE free to broadcast the survivor side when it shrinks. No
driver-side convergence counts. Lineage is truncated per round with
localCheckpoint (the bfs/redirects pattern): each round references the
edge set three times (degree aggregate + two semi-joins), so an
unchecked plan grows 3^rounds copies of the scan — checkpointing keeps
the per-round plan constant-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_peel(
    df: DataFrame,
    k: int,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(host, degree) of every vertex remaining after `rounds` peels of
    vertices with degree < k. Degrees are over the distinct undirected
    simple graph (self-loops and duplicate/reversed edges collapse)."""
    canon = (
        df.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    sym = canon.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
        canon.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        keep = (
            sym.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= k)
            .select("u")
        )
        sym = (
            sym.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    return sym.groupBy(F.col("u").alias("host")).agg(
        F.count(F.lit(1)).alias("degree")
    )
