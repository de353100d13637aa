"""Unit tests for operators/sampling and operators/tfidf."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gc_spark.operators.sampling import reservoir_topk, stratified_sample
from gc_spark.operators.tfidf import tfidf_top_terms


class TestStratifiedSample:
    def test_deterministic_across_partitionings(self, spark):
        df = spark.range(2000).select(F.col("id").alias("doc_id"))
        rate = F.lit(3000)
        a = {r["doc_id"] for r in stratified_sample(df, rate).collect()}
        b = {
            r["doc_id"]
            for r in stratified_sample(df.repartition(13), rate).collect()
        }
        assert a == b
        # rate is honored within a few percent at n=2000
        assert abs(len(a) / 2000 - 0.30) < 0.05

    def test_salt_changes_membership(self, spark):
        df = spark.range(2000).select(F.col("id").alias("doc_id"))
        a = {r["doc_id"] for r in stratified_sample(df, F.lit(5000), salt="x").collect()}
        b = {r["doc_id"] for r in stratified_sample(df, F.lit(5000), salt="y").collect()}
        assert a != b

    def test_mergeable_over_disjoint_inputs(self, spark):
        # sample(union) == union(samples) — the property that makes the
        # Bernoulli form safe for incremental corpus builds
        df = spark.range(1000).select(F.col("id").alias("doc_id"))
        lo, hi = df.filter("doc_id < 500"), df.filter("doc_id >= 500")
        whole = {r["doc_id"] for r in stratified_sample(df, F.lit(2500)).collect()}
        parts = {
            r["doc_id"]
            for part in (lo, hi)
            for r in stratified_sample(part, F.lit(2500)).collect()
        }
        assert whole == parts


class TestReservoirTopk:
    def test_exact_k_per_stratum(self, spark):
        df = spark.range(300).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("src")
        )
        out = reservoir_topk(df, ["src"], k=7)
        counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        assert counts == {0: 7, 1: 7, 2: 7}
        ranks = [r["sample_rank"] for r in out.filter("src = 0").orderBy("sample_rank").collect()]
        assert ranks == [1, 2, 3, 4, 5, 6, 7]

    def test_small_stratum_kept_whole(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["doc_id", "src"])
        out = reservoir_topk(df, ["src"], k=5)
        assert out.count() == 3

    def test_two_phase_equals_plain_window(self, spark):
        # the salted two-phase pick must equal the naive single window
        from pyspark.sql import Window

        from gc_spark.operators.sampling import sample_hash_col

        df = spark.range(500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 4).alias("src")
        )
        got = {
            (r["doc_id"], r["sample_rank"])
            for r in reservoir_topk(df, ["src"], k=6, salt="z").collect()
        }
        w = Window.partitionBy("src").orderBy(
            sample_hash_col(F.col("doc_id"), "z").asc(), F.col("doc_id").asc()
        )
        want = {
            (r["doc_id"], r["sample_rank"])
            for r in df.withColumn("sample_rank", F.row_number().over(w))
            .filter("sample_rank <= 6")
            .collect()
        }
        assert got == want


class TestTfidf:
    def test_known_scores(self, spark):
        df = spark.createDataFrame(
            [(1, "cat cat dog"), (2, "dog fish"), (3, "fish fish fish")],
            ["doc_id", "text"],
        )
        out = {
            (r["doc_id"], r["term"]): (r["tf"], r["score"], r["term_rank"])
            for r in tfidf_top_terms(df, k=2).collect()
        }

        def idf(dfreq):
            return math.log((1 + 3) / (1 + dfreq)) + 1

        # doc 1: cat tf=2 df=1 beats dog tf=1 df=2
        assert out[(1, "cat")][0] == 2
        assert abs(out[(1, "cat")][1] - round(2 * idf(1), 6)) < 1e-9
        assert out[(1, "cat")][2] == 1
        assert out[(1, "dog")][2] == 2
        # doc 3 has one distinct term only
        assert (3, "fish") in out and len([k for k in out if k[0] == 3]) == 1

    def test_tie_broken_by_term(self, spark):
        df = spark.createDataFrame([(1, "b a")], ["doc_id", "text"])
        rows = tfidf_top_terms(df, k=2).orderBy("term_rank").collect()
        assert [r["term"] for r in rows] == ["a", "b"]


class TestQuantileBuckets:
    def test_quartiles_balanced_and_ordered(self, spark):
        from gc_spark.operators.sampling import quantile_buckets

        df = spark.range(1000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 997).alias("v")
        )
        out = quantile_buckets(df, "v")
        counts = {
            r["bucket"]: r["n"]
            for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        assert set(counts) == {1, 2, 3, 4}
        assert all(abs(n - 250) <= 10 for n in counts.values())
        # monotone: every bucket-1 value < every bucket-4 value
        mx1 = out.filter("bucket = 1").agg(F.max("v")).first()[0]
        mn4 = out.filter("bucket = 4").agg(F.min("v")).first()[0]
        assert mx1 < mn4

    def test_value_equal_to_cutpoint_goes_low(self, spark):
        from gc_spark.operators.sampling import quantile_buckets

        df = spark.createDataFrame([(i, v) for i, v in enumerate([1, 2, 3])], ["doc_id", "v"])
        out = {r["doc_id"]: r["bucket"] for r in quantile_buckets(df, "v", probs=(0.5,)).collect()}
        # median is 2; the row equal to it stays in bucket 1
        assert out == {0: 1, 1: 1, 2: 2}
