"""Unit tests for operators/pagerank (frontier prioritization)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gc_spark.operators.pagerank import frontier_priority, pagerank


def _numpy_pagerank(edges, iters, damping):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {u: 0 for u in nodes}
    for u, _ in set(edges):
        out[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = sum(r[idx[u]] for u in nodes if out[u] == 0)
        for u, v in set(edges):
            nxt[idx[v]] += r[idx[u]] / out[u]
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


class TestPageRank:
    def test_matches_dense_reference(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]  # 4 -> hub, cycle
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["rank"] for r in pagerank(df, iters=8).collect()}
        want = _numpy_pagerank(edges, iters=8, damping=0.85)
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12

    def test_dangling_mass_conserved(self, spark):
        # node 3 has no out-edges: without dangling redistribution the total
        # leaks; with it the ranks stay a distribution (sum == 1)
        df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        ranks = pagerank(df, iters=10)
        total = ranks.agg(F.sum("rank").alias("s")).first()["s"]
        assert abs(total - 1.0) < 1e-9

    def test_parallel_edges_collapse(self, spark):
        # a multigraph edge repeated 3x must not triple the contribution
        once = pagerank(spark.createDataFrame([(1, 2), (1, 3)], ["src", "dst"]), iters=4)
        multi = pagerank(
            spark.createDataFrame([(1, 2), (1, 2), (1, 2), (1, 3)], ["src", "dst"]),
            iters=4,
        )
        a = {r["node"]: r["rank"] for r in once.collect()}
        b = {r["node"]: r["rank"] for r in multi.collect()}
        assert a == b

    def test_frontier_priority_attach(self, spark):
        ranks = spark.createDataFrame([(10, 0.7), (20, 0.3)], ["node", "rank"])
        frontier = spark.createDataFrame(
            [(10, "a"), (20, "b"), (99, "c")], ["host_hash64", "url"]
        )
        out = {
            r["url"]: r["priority"]
            for r in frontier_priority(frontier, ranks, floor=0.01).collect()
        }
        assert out == {"a": 0.7, "b": 0.3, "c": 0.01}
