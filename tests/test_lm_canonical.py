"""Unit tests for operators/lm and text_dedup.select_canonical."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gc_spark.operators.lm import cross_entropy_score, unigram_lm
from gc_spark.operators.text_dedup import select_canonical


class TestUnigramLM:
    def test_probabilities_sum_to_one(self, spark):
        df = spark.createDataFrame([(1, "a b a"), (2, "b c")], ["doc_id", "text"])
        lm = unigram_lm(df)
        probs = {r["term"]: r["p"] for r in lm.collect()}
        assert abs(sum(probs.values()) - 1.0) < 1e-12
        assert abs(probs["a"] - 2 / 5) < 1e-12 and abs(probs["c"] - 1 / 5) < 1e-12

    def test_xent_matches_closed_form(self, spark):
        df = spark.createDataFrame([(1, "a a b"), (2, "b")], ["doc_id", "text"])
        # p(a)=1/2, p(b)=1/2
        out = {r["doc_id"]: r for r in cross_entropy_score(df, unigram_lm(df)).collect()}
        assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 1
        assert abs(out[1]["xent"] - round(math.log(2), 6)) < 1e-9
        assert abs(out[2]["xent"] - round(math.log(2), 6)) < 1e-9

    def test_rare_token_doc_scores_higher(self, spark):
        rows = [(i, "common words common words") for i in range(10)] + [
            (99, "rareword otherrare thirdrare")
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r["xent"] for r in cross_entropy_score(df, unigram_lm(df)).collect()}
        assert out[99] > out[0]


class TestSelectCanonical:
    def test_best_quality_wins_ties_to_min_id(self, spark):
        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], ["doc_id", "cluster_id"]
        )
        quality = spark.createDataFrame(
            [(1, 10), (2, 50), (3, 50), (7, 5), (8, 5)], ["doc_id", "quality"]
        )
        out = {r["doc_id"]: r["keep"] for r in select_canonical(clusters, quality).collect()}
        # cluster 1: docs 2 and 3 tie on quality 50 -> min id 2 kept
        assert out == {1: False, 2: True, 3: False, 7: True, 8: False}

    def test_exactly_one_keep_per_cluster(self, spark):
        clusters = spark.createDataFrame(
            [(i, i % 4) for i in range(40)], ["doc_id", "cluster_id"]
        )
        quality = spark.createDataFrame(
            [(i, (i * 13) % 7) for i in range(40)], ["doc_id", "quality"]
        )
        out = select_canonical(clusters, quality)
        per = out.filter("keep").groupBy("cluster_id").agg(F.count("*").alias("n"))
        assert all(r["n"] == 1 for r in per.collect())
        assert out.count() == 40
