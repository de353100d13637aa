"""Round-6 optimization guards: the rewritten single-window star rounds in
connected_components, the keyed right-sizing, and the scoped shuffle-width
helper must preserve exact component semantics (and restore session state)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _uf_components(edges):
    """Brute-force union-find reference: {node: component_min}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponentsRewrite:
    def _check(self, spark, edges):
        from gc_spark.operators.text_dedup import connected_components

        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(df).collect()
        }
        assert got == set(_uf_components(edges).items())

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(6)
        for trial in range(3):
            n = 40 + trial * 30
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(n * 2)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            self._check(spark, edges)

    def test_long_chain_converges(self, spark):
        # pathological diameter: the worst case for the star rounds
        edges = [(i, i + 1) for i in range(60)]
        self._check(spark, edges)

    def test_duplicate_and_reversed_edges(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4), (4, 5), (9, 9)]
        # self-loop dropped by the operator; reference needs it filtered too
        from gc_spark.operators.text_dedup import connected_components

        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(df).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}

    def test_dup_clusters_matches_cc(self, spark):
        from gc_spark.operators.text_dedup import dup_clusters

        rng = random.Random(7)
        edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(80)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            (r["doc_id"], r["cluster_id"]) for r in dup_clusters(df).collect()
        }
        assert got == set(_uf_components(edges).items())


class TestScopedShufflePartitions:
    def test_restores_conf_and_bounds_width(self, spark):
        from gc_spark.operators.text_dedup import (
            EDGES_PER_PARTITION,
            _scoped_shuffle_partitions,
        )

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with _scoped_shuffle_partitions(spark, 10):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
        # large inputs keep the session width (no-op at scale)
        with _scoped_shuffle_partitions(spark, EDGES_PER_PARTITION * 10**6):
            assert (
                spark.conf.get("spark.sql.shuffle.partitions") == before
            )
        assert spark.conf.get("spark.sql.shuffle.partitions") == before

    def test_restores_on_error(self, spark):
        from gc_spark.operators.text_dedup import _scoped_shuffle_partitions

        before = spark.conf.get("spark.sql.shuffle.partitions")
        with pytest.raises(RuntimeError):
            with _scoped_shuffle_partitions(spark, 5):
                raise RuntimeError("boom")
        assert spark.conf.get("spark.sql.shuffle.partitions") == before


class TestSetCoverLineage:
    def test_k50_bounded_lineage_matches_python_greedy(self, spark):
        # 60 sets over 120 elements; set s covers [s, s+20) mod 120
        rows = [(f"s{s:02d}", (s * 2 + j) % 120) for s in range(60) for j in range(20)]
        df = spark.createDataFrame(rows, "src string, e int")
        from gc_spark.operators.setcover import greedy_set_cover

        got = [
            (r["pick"], r["chosen_set"], r["gain"], r["cum_covered"])
            for r in greedy_set_cover(df, "src", "e", k=50).collect()
        ]
        # python greedy reference with identical tie-break (gain desc, set asc)
        sets = {}
        for s, e in rows:
            sets.setdefault(s, set()).add(e)
        covered, exp = set(), []
        for i in range(50):
            best = max(sets, key=lambda s: (len(sets[s] - covered), [-ord(c) for c in s]))
            gain = len(sets[best] - covered)
            if gain == 0:
                break
            covered |= sets[best]
            exp.append((i + 1, best, gain, len(covered)))
            del sets[best]
        assert got == exp


class TestWelchGuard:
    def test_degenerate_groups_surface_as_null_row(self, spark):
        from gc_spark.operators.ttest import welch_ttest

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 9.0)], "g string, v double"
        )
        # missing group label -> one row, NULL on the missing side
        [r] = welch_ttest(df, "g", "v", "a", "nope").collect()
        assert r["n_a"] == 3 and r["n_b"] is None and r["t"] is None
        # single-row group -> NULL variance -> NULL stats, row still present
        [r2] = welch_ttest(df, "g", "v", "a", "b").collect()
        assert r2["n_b"] == 1 and r2["t"] is None
        # healthy case still one row with values
        df2 = df.union(spark.createDataFrame([("b", 8.0), ("b", 7.0)], "g string, v double"))
        [r3] = welch_ttest(df2, "g", "v", "a", "b").collect()
        assert r3["t"] is not None and r3["n_a"] == 3 and r3["n_b"] == 3


class TestDsirTargetIds:
    def test_target_ids_rollup_equals_text_path(self, spark):
        from gc_spark.operators.dsir import importance_weights

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = d.filter(F.col("doc_id") % 3 == 0)
        via_text = importance_weights(d, target, buckets=64).collect()
        via_ids = importance_weights(
            d, target, buckets=64, target_ids=target.select("doc_id")
        ).collect()
        assert sorted(map(tuple, via_text)) == sorted(map(tuple, via_ids))


class TestKendallCap:
    def test_cap_bounds_pairing_and_default_matches_uncapped(self, spark):
        from gc_spark.operators.kendall import kendall_tau

        rows = [(i, float(i % 7), float((i * 3) % 11)) for i in range(50)]
        df = spark.createDataFrame(rows, "i long, a double, b double")
        [full] = kendall_tau(df, "i", "a", "b").collect()
        [unc] = kendall_tau(df, "i", "a", "b", max_points=None).collect()
        assert full == unc  # under the cap: identical to uncapped
        assert full["n"] == 50 and full["n_pairs"] == 50 * 49 // 2
        # oversized input: only the max_points smallest ids pair up
        [capped] = kendall_tau(df, "i", "a", "b", max_points=10).collect()
        assert capped["n"] == 10 and capped["n_pairs"] == 45
        sub = df.where(F.col("i") < 10)
        [ref] = kendall_tau(sub, "i", "a", "b").collect()
        assert capped == ref


class TestRightSizeKeyed:
    def test_keyed_repartition_preserves_rows(self, spark):
        from gc_spark.operators.text_dedup import _right_size

        df = spark.range(100).select(
            F.col("id").alias("src"), (F.col("id") % 7).alias("dst")
        )
        out = _right_size(df.repartition(8), 100, key="src")
        assert out.rdd.getNumPartitions() == 1
        assert sorted(r["src"] for r in out.collect()) == list(range(100))


class TestCmsWeightedBuild:
    def test_weighted_equals_occurrence_build(self, spark):
        from gc_spark.operators.cms import cms_build

        words = ["alpha"] * 7 + ["beta"] * 3 + ["gamma"] * 1 + ["delta"] * 5
        occ = spark.createDataFrame([(w,) for w in words], "term string")
        counts = occ.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        a = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_build(occ, depth=3, width=8).collect()
        }
        b = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_build(counts, depth=3, width=8, weight_col="cnt").collect()
        }
        assert a == b  # counters bit-identical: bucket hash is term-only

    def test_weighted_build_long_counters(self, spark):
        from gc_spark.operators.cms import cms_build

        counts = spark.createDataFrame(
            [("x", 2**33), ("y", 1)], "term string, cnt long"
        )
        out = cms_build(counts, depth=2, width=4, weight_col="cnt")
        assert dict(out.dtypes)["cnt"] == "bigint"
        assert sum(r["cnt"] for r in out.collect()) == 2 * (2**33 + 1)


class TestSimhashKernelRewrite:
    def test_pinned_value_unchanged(self, spark):
        # value produced by the round-5 zip_with kernel AND verified
        # cross-engine by the q17 DuckDB oracle — pins the r6 flat
        # per-bit-aggregate kernel to identical bit math
        from gc_spark.operators.text_dedup import simhash

        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        assert simhash(df).collect()[0]["simhash"] == 1150518487231265224

    def test_empty_and_single_token(self, spark):
        from gc_spark.operators.text_dedup import SIMHASH_BITS, simhash, sha60_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, ""), (2, "word")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
        assert got[1] == 0  # no tokens -> no majority bits
        # single token: simhash == the token's own 60-bit hash
        [h] = (
            df.where("doc_id = 2")
            .select(sha60_col(F.lit("word")).alias("h"))
            .collect()
        )
        assert got[2] == h["h"]
