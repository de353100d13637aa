"""Unit tests for operators/inverted and operators/collocations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gc_spark.operators.collocations import bigram_pmi
from gc_spark.operators.inverted import inverted_index


class TestInvertedIndex:
    def test_postings_bytes(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "b a")], ["doc_id", "text"]
        )
        out = {r["term"]: r for r in inverted_index(df).collect()}
        assert out["a"]["doc_freq"] == 2 and out["a"]["postings"] == "1:0|2,2:1"
        assert out["b"]["doc_freq"] == 2 and out["b"]["postings"] == "1:1,2:0"

    def test_segmented_index_partitions_docs(self, spark):
        df = spark.createDataFrame(
            [(i, "x y") for i in range(20)], ["doc_id", "text"]
        )
        out = inverted_index(df, segments=4)
        assert out.select("segment").distinct().count() > 1
        # every doc appears exactly once per term across segments
        total = out.filter(F.col("term") == "x").agg(
            F.sum("doc_freq").alias("s")
        ).first()["s"]
        assert total == 20


class TestBigramPMI:
    def test_collocation_scores_high(self, spark):
        # "fort bragg" always adjacent; "the the" never occurs
        rows = [(i, "fort bragg is near the fort area the base") for i in range(5)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {(r["w1"], r["w2"]): r for r in bigram_pmi(df, min_count=5).collect()}
        assert ("fort", "bragg") in out
        # closed form: c_xy=5, T_b=40, c_fort=10, c_bragg=5, T_u=45
        want = math.log((5 / 40) / ((10 / 45) * (5 / 45)))
        assert abs(out[("fort", "bragg")]["pmi"] - round(want, 6)) < 1e-9
        assert out[("fort", "bragg")]["n"] == 5

    def test_min_count_filters(self, spark):
        df = spark.createDataFrame([(1, "one off pair")], ["doc_id", "text"])
        assert bigram_pmi(df, min_count=2).count() == 0
        assert bigram_pmi(df, min_count=1).count() == 2
