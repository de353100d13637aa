"""Unit tests for operators/hits (hub/authority link analysis)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gc_spark.operators.hits import hits


def _numpy_hits(edges, iters):
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for u, v in edges:
            a[idx[v]] += h[idx[u]]
        a /= a.sum() if a.sum() else 1.0
        h = np.zeros(n)
        for u, v in edges:
            h[idx[u]] += a[idx[v]]
        h /= h.sum() if h.sum() else 1.0
    return (
        {nodes[i]: h[i] for i in range(n)},
        {nodes[i]: a[i] for i in range(n)},
    )


class TestHits:
    def test_matches_dense_reference(self, spark):
        # 1 is a pure hub (links to everything), 4 a pure authority
        edges = [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4), (4, 2)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iters=6).collect()}
        want_h, want_a = _numpy_hits(edges, iters=6)
        assert set(got) == set(want_h)
        for k in want_h:
            assert abs(got[k][0] - want_h[k]) < 1e-12
            assert abs(got[k][1] - want_a[k]) < 1e-12
        # the listing page out-scores everything as a hub, the sink as auth
        assert got[1][0] == max(v[0] for v in got.values())
        assert got[4][1] == max(v[1] for v in got.values())

    def test_scores_are_distributions(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (9, 1)], ["src", "dst"])
        s = hits(df, iters=4)
        tot = s.agg(F.sum("hub").alias("h"), F.sum("auth").alias("a")).first()
        assert abs(tot["h"] - 1.0) < 1e-9
        assert abs(tot["a"] - 1.0) < 1e-9

    def test_parallel_edges_collapse(self, spark):
        once = hits(spark.createDataFrame([(1, 2), (1, 3)], ["src", "dst"]), iters=3)
        multi = hits(
            spark.createDataFrame([(1, 2), (1, 2), (1, 3)], ["src", "dst"]), iters=3
        )
        assert sorted(once.collect()) == sorted(multi.collect())

    def test_source_and_sink_only_nodes_kept(self, spark):
        # 7 has only an out-edge (auth 0), 8 only an in-edge (hub 0)
        df = spark.createDataFrame([(7, 8)], ["src", "dst"])
        got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iters=2).collect()}
        assert got[7] == (1.0, 0.0)
        assert got[8] == (0.0, 1.0)
