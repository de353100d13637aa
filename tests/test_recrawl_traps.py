"""Unit tests for operators/recrawl and operators/traps."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from gc_spark.operators.recrawl import recrawl_priority
from gc_spark.operators.traps import detect_traps, skew_profile

T0 = datetime(2024, 1, 1)


def _log(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + timedelta(days=d), c) for (u, d, c) in rows],
        ["url_id", "ts", "changed"],
    )


class TestRecrawl:
    def test_estimator_matches_closed_form(self, spark):
        # url 1: 5 visits daily, 2 changes -> lambda = -ln(3.5/5.5)/86400
        rows = [(1, d, d in (1, 3)) for d in range(5)]
        out = recrawl_priority(_log(spark, rows), now_ts=F.lit(int(T0.timestamp()) + 5 * 86400)).first()
        lam = -math.log((5 - 2 + 0.5) / (5 + 0.5)) / 86400
        assert out["n_visits"] == 5 and out["n_changes"] == 2
        assert abs(out["lambda_day"] - round(lam * 86400, 6)) < 1e-9
        age = 86400.0  # last fetch at day 4, now = day 5
        assert abs(out["p_changed"] - round(1 - math.exp(-lam * age), 6)) < 1e-9

    def test_always_changed_stays_finite(self, spark):
        rows = [(1, d, True) for d in range(4)]
        out = recrawl_priority(_log(spark, rows)).first()
        assert out["lambda_day"] is not None and out["p_changed"] <= 1.0

    def test_single_visit_dropped(self, spark):
        rows = [(1, 0, True), (2, 0, False), (2, 1, False)]
        out = recrawl_priority(_log(spark, rows))
        assert [r["url_id"] for r in out.collect()] == [2]

    def test_hotter_page_ranks_higher(self, spark):
        rows = [(1, d, d % 1 == 0) for d in range(6)] + [(2, d, d in (0,)) for d in range(6)]
        got = {r["url_id"]: r["p_changed"] for r in recrawl_priority(_log(spark, rows)).collect()}
        assert got[1] > got[2]


class TestTraps:
    def test_session_trap_flagged(self, spark):
        urls = [f"https://trap.mil/p/{i % 3}?session={i}" for i in range(30)] + [
            f"https://ok.mil/p/{i % 3}?page={i % 2}" for i in range(30)
        ]
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        out = {r["host"]: r for r in detect_traps(df, max_urls_per_path=5.0, min_urls=20).collect()}
        assert out["trap.mil"]["is_trap"] is True
        assert out["trap.mil"]["n_paths"] == 3 and out["trap.mil"]["n_urls"] == 30
        assert out["ok.mil"]["is_trap"] is False
        assert out["ok.mil"]["n_urls"] == 6  # 3 paths x 2 pages

    def test_small_host_never_flagged(self, spark):
        urls = [f"https://tiny.mil/a?sid={i}" for i in range(10)]
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        assert detect_traps(df, min_urls=20).first()["is_trap"] is False


class TestSkewProfile:
    def test_hot_key_gets_more_buckets(self, spark):
        df = spark.createDataFrame(
            [("hot",)] * 900 + [("cold",)] * 100, ["host"]
        )
        out = {r["key"]: r for r in skew_profile(df, target_rows_per_task=100, max_buckets=8).collect()}
        assert out["hot"]["salt_buckets"] == 8  # ceil(900/100)=9 capped at 8
        assert out["cold"]["salt_buckets"] == 1
        assert abs(out["hot"]["frac_of_total"] - 0.9) < 1e-9
