"""Unit tests for winnow_overlap_pairs, top_anchor_texts, mixture_weights,
and asof_join (q74-q77)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gc_spark.operators.anchors import top_anchor_texts
from gc_spark.operators.asof import asof_join
from gc_spark.operators.sampling import mixture_weights
from gc_spark.operators.text_dedup import winnow_overlap_pairs


class TestWinnowOverlap:
    def test_quotation_detected_unrelated_not(self, spark):
        shared = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [
                (1, shared + " alpha beta gamma delta epsilon"),
                (2, "totally different words everywhere zeta eta theta iota kappa"),
                (3, "intro text then " + shared + " plus an unrelated long tail here"),
            ],
            ["doc_id", "text"],
        )
        pairs = {(r["a"], r["b"]): r for r in winnow_overlap_pairs(df, max_df=2, min_shared=2).collect()}
        assert (1, 3) in pairs
        assert all(p == (1, 3) for p in pairs)
        assert 0 < pairs[(1, 3)]["overlap"] <= 1.0

    def test_common_fingerprints_capped(self, spark):
        # a fingerprint present in EVERY doc must not create pairs when
        # max_df is below the corpus size
        boiler = "all rights reserved copyright notice terms"
        df = spark.createDataFrame(
            [(i, boiler + f" unique{i} filler{i} words{i}") for i in range(6)],
            ["doc_id", "text"],
        )
        assert winnow_overlap_pairs(df, max_df=3, min_shared=1).count() == 0


class TestTopAnchorTexts:
    def test_topk_and_totals(self, spark):
        links = spark.createDataFrame(
            [(1, "home")] * 3 + [(1, "start")] * 3 + [(1, "misc")] + [(2, "x")],
            ["target", "anchor"],
        )
        got = {(r["target"], r["rank"]): r for r in top_anchor_texts(links, k=2).collect()}
        # tie between home/start broken lexicographically
        assert got[(1, 1)]["anchor"] == "home" and got[(1, 1)]["n"] == 3
        assert got[(1, 2)]["anchor"] == "start"
        assert got[(1, 1)]["total_links"] == 7
        assert got[(2, 1)]["anchor"] == "x" and got[(2, 1)]["total_links"] == 1
        assert (1, 3) not in got  # k=2 cut


class TestMixtureWeights:
    def test_alpha_one_is_proportional(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 8 + [("b",)] * 2, ["source"]
        )
        got = {r["source"]: r for r in mixture_weights(df, ["source"], alpha=1.0).collect()}
        assert got["a"]["weight"] == 0.8 and got["b"]["weight"] == 0.2
        assert got["a"]["expected_per_epoch"] == 8

    def test_alpha_lifts_small_sources(self, spark):
        df = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, ["source"])
        got = {r["source"]: r["weight"] for r in mixture_weights(df, ["source"], alpha=0.5).collect()}
        assert got["b"] > 0.2  # temperature lifts the minority source
        assert abs(got["a"] + got["b"] - 1.0) < 1e-6


class TestAsofJoin:
    def _ts(self, s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    def test_latest_state_attached(self, spark):
        snaps = spark.createDataFrame(
            [("h1", self._ts(10), 1.0), ("h1", self._ts(20), 2.0), ("h2", self._ts(5), 9.0)],
            ["host", "ts", "budget"],
        )
        fetches = spark.createDataFrame(
            [(1, "h1", self._ts(15)), (2, "h1", self._ts(25)), (3, "h1", self._ts(20)),
             (4, "h1", self._ts(1)), (5, "h3", self._ts(30))],
            ["event_id", "host", "ts"],
        )
        got = {r["event_id"]: r for r in asof_join(fetches, snaps, on="host").collect()}
        assert got[1]["budget"] == 1.0 and got[1]["asof_ts"] == self._ts(10)
        assert got[2]["budget"] == 2.0
        assert got[3]["budget"] == 2.0  # inclusive: snapshot at equal ts wins
        assert got[4]["budget"] is None and got[4]["asof_ts"] is None  # nothing prior
        assert got[5]["budget"] is None  # unknown host survives (left join)
        assert len(got) == 5

    def test_left_columns_preserved(self, spark):
        snaps = spark.createDataFrame([("h", self._ts(1), 7.0)], ["host", "ts", "v"])
        fetches = spark.createDataFrame(
            [(1, "h", self._ts(2), "keep-me")], ["event_id", "host", "ts", "extra"]
        )
        row = asof_join(fetches, snaps, on="host").first()
        assert row["extra"] == "keep-me" and row["v"] == 7.0 and row["ts"] == self._ts(2)
