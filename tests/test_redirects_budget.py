"""Unit tests for operators/redirects and pagerank.allocate_budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from gc_spark.operators.pagerank import allocate_budgets
from gc_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, max_hops=8):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["src"]: r.asDict() for r in resolve_redirects(df, max_hops=max_hops).collect()}


class TestResolveRedirects:
    def test_chain_resolves_with_exact_hops(self, spark):
        out = _resolve(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert out[1]["final"] == 5 and out[1]["hops"] == 4 and out[1]["resolved"]
        assert out[3]["final"] == 5 and out[3]["hops"] == 2
        assert out[4]["final"] == 5 and out[4]["hops"] == 1

    def test_cycle_flagged_unresolved(self, spark):
        out = _resolve(spark, [(1, 2), (2, 1), (7, 8)])
        assert out[1]["resolved"] is False and out[2]["resolved"] is False
        assert out[7]["resolved"] is True and out[7]["final"] == 8

    def test_chain_longer_than_max_hops_unresolved(self, spark):
        edges = [(i, i + 1) for i in range(12)]  # length-12 chain
        out = _resolve(spark, edges, max_hops=8)
        assert out[0]["resolved"] is False and out[0]["hops"] == 8 and out[0]["final"] == 8
        assert out[5]["resolved"] is True and out[5]["final"] == 12 and out[5]["hops"] == 7

    def test_non_power_of_two_lengths(self, spark):
        for length in (1, 3, 5, 6, 7):
            out = _resolve(spark, [(i, i + 1) for i in range(length)])
            assert out[0]["final"] == length and out[0]["hops"] == length
            assert out[0]["resolved"] is True


class TestAllocateBudgets:
    def test_proportional_with_floor_and_cap(self, spark):
        ranks = spark.createDataFrame(
            [(1, 0.8), (2, 0.19), (3, 0.01)], ["node", "rank"]
        )
        out = {
            r["host"]: r["budget_per_batch"]
            for r in allocate_budgets(ranks, 1000, min_budget=50, max_budget=300).collect()
        }
        assert out == {1: 300, 2: 190, 3: 50}  # capped / proportional / floored

    def test_feeds_politeness_budgets(self, spark):
        from gc_spark.operators.politeness import topk_per_host

        ranks = spark.createDataFrame([(0, 0.9), (1, 0.1)], ["node", "rank"])
        budgets = allocate_budgets(ranks, 10, min_budget=1, max_budget=9).withColumn(
            "host", F.concat(F.lit("h"), F.col("host").cast("string"))
        )
        pending = spark.createDataFrame(
            [(f"h{i % 2}", 0, 0, s) for i, s in enumerate(range(40))],
            ["host", "priority", "depth", "seq"],
        )
        out = topk_per_host(pending, k=3, host_budgets=budgets)
        counts = {r["host"]: r["n"] for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()}
        assert counts == {"h0": 9, "h1": 1}
