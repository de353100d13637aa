"""Round-5i operators: Welch t-test, association rules, calibration
bins/ECE, Pettitt change-point.

Pins hand-computed statistics, cancellation safety of the centered
variance pass, basket caps and rule pruning, bin folding at score 1.0,
and exact change-point localization on a step series.
"""

from __future__ import annotations

import math

import pytest

from gc_spark.operators.assoc import pair_rules
from gc_spark.operators.calibration import calibration_bins
from gc_spark.operators.pettitt import pettitt_test
from gc_spark.operators.ttest import welch_ttest


def _py_welch(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((x - ma) ** 2 for x in xs) / (na - 1)
    vb = sum((y - mb) ** 2 for y in ys) / (nb - 1)
    sa, sb = va / na, vb / nb
    t = (ma - mb) / math.sqrt(sa + sb)
    dfw = (sa + sb) ** 2 / (sa * sa / (na - 1) + sb * sb / (nb - 1))
    return t, dfw


class TestWelch:
    def test_matches_python(self, spark):
        xs = [3.0, 5.0, 7.0, 4.0, 6.0, 9.0]
        ys = [10.0, 14.0, 12.0, 18.0]
        rows = [("a", x) for x in xs] + [("b", y) for y in ys]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = welch_ttest(df, "g", "v", "a", "b").collect()
        t, dfw = _py_welch(xs, ys)
        assert r["t"] == pytest.approx(round(t, 6), abs=1e-6)
        assert r["df_welch"] == pytest.approx(round(dfw, 6), abs=1e-6)
        assert r["significant"] == (abs(t) > 1.959964)

    def test_identical_groups_t_zero(self, spark):
        rows = [("a", float(v)) for v in range(10)] + [
            ("b", float(v)) for v in range(10)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = welch_ttest(df, "g", "v", "a", "b").collect()
        assert r["t"] == pytest.approx(0.0)
        assert not r["significant"]

    def test_large_offset_no_cancellation(self, spark):
        # 1e9 offset with unit-scale signal: raw-sum variance would
        # cancel; the centered pass must recover the exact t
        xs = [1e9 + v for v in [1.0, 2.0, 3.0, 4.0]]
        ys = [1e9 + v for v in [6.0, 7.0, 8.0, 9.0]]
        rows = [("a", x) for x in xs] + [("b", y) for y in ys]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = welch_ttest(df, "g", "v", "a", "b").collect()
        t, _ = _py_welch([1.0, 2.0, 3.0, 4.0], [6.0, 7.0, 8.0, 9.0])
        assert r["t"] == pytest.approx(round(t, 6), abs=1e-4)


class TestAssocRules:
    def test_hand_computed(self, spark):
        # baskets: {x,y} x3, {x} x1, {y} x1, {x,z} x1 -> 6 baskets
        rows = (
            [(i, "x") for i in range(3)]
            + [(i, "y") for i in range(3)]
            + [(3, "x"), (4, "y"), (5, "x"), (5, "z")]
        )
        df = spark.createDataFrame(rows, "b long, i string")
        out = {
            (r["ante"], r["cons"]): r
            for r in pair_rules(df, "b", "i", min_count=2).collect()
        }
        xy = out[("x", "y")]
        assert xy["n_pair"] == 3
        assert xy["support"] == pytest.approx(0.5)  # 3/6
        assert xy["confidence"] == pytest.approx(0.6)  # 3/5 x-baskets
        assert xy["lift"] == pytest.approx(0.6 / (4 / 6))
        yx = out[("y", "x")]
        assert yx["confidence"] == pytest.approx(0.75)  # 3/4 y-baskets
        # (x,z) count 1 < min_count: pruned
        assert ("x", "z") not in out

    def test_duplicate_rows_collapse(self, spark):
        rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
        df = spark.createDataFrame(rows, "b long, i string")
        out = pair_rules(df, "b", "i", min_count=1).collect()
        assert {r["n_pair"] for r in out} == {2}

    def test_max_basket_cap(self, spark):
        # one basket of 5 items capped at 3 (items a,b,c survive)
        rows = [(1, c) for c in "abcde"] + [(2, "a"), (2, "e")]
        df = spark.createDataFrame(rows, "b long, i string")
        out = {
            (r["ante"], r["cons"])
            for r in pair_rules(df, "b", "i", min_count=1, max_basket=3).collect()
        }
        assert ("a", "b") in out and ("b", "c") in out
        # d/e were cut from basket 1; basket 2 kept whole (size 2)
        assert ("a", "d") not in out
        assert ("a", "e") in out

    def test_independent_items_lift_one(self, spark):
        # every basket contains both items: lift = 1 exactly
        rows = [(i, c) for i in range(8) for c in ("x", "y")]
        df = spark.createDataFrame(rows, "b long, i string")
        out = pair_rules(df, "b", "i", min_count=1).collect()
        assert all(r["lift"] == pytest.approx(1.0) for r in out)


class TestCalibration:
    def test_hand_computed_bins(self, spark):
        # two bins: scores .1 (labels 0,0,1,1 -> fp .5), .95 (labels 1)
        rows = [(0.1, 0.0), (0.1, 0.0), (0.1, 1.0), (0.1, 1.0), (0.95, 1.0)]
        df = spark.createDataFrame(rows, "s double, y double")
        out = {r["bin"]: r for r in calibration_bins(df, "s", "y", 10).collect()}
        assert out[1]["frac_pos"] == pytest.approx(0.5)
        assert out[1]["gap"] == pytest.approx(0.4)
        assert out[9]["gap"] == pytest.approx(0.05)
        ece = (4 * 0.4 + 1 * 0.05) / 5
        assert out[1]["ece"] == pytest.approx(round(ece, 6))

    def test_score_one_folds_into_last_bin(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "s double, y double")
        [r] = calibration_bins(df, "s", "y", 10).collect()
        assert r["bin"] == 9

    def test_perfectly_calibrated_zero_ece(self, spark):
        # within each bin the positive rate equals the (constant) score
        rows = []
        for s, rate in [(0.25, 0.25), (0.75, 0.75)]:
            rows += [(s, 1.0)] * int(rate * 100) + [(s, 0.0)] * int(
                (1 - rate) * 100
            )
        df = spark.createDataFrame(rows, "s double, y double")
        out = calibration_bins(df, "s", "y", 10).collect()
        assert all(r["ece"] == pytest.approx(0.0) for r in out)


def _py_pettitt(ys):
    n = len(ys)
    ranks = []
    for v in ys:
        lt = sum(1 for x in ys if x < v)
        eq = sum(1 for x in ys if x == v)
        ranks.append(lt + (eq + 1) / 2.0)
    best = None
    s = 0.0
    for t in range(n - 1):
        s += ranks[t]
        u = 2.0 * s - (t + 1) * (n + 1)
        if best is None or abs(u) > best[1]:
            best = (t, abs(u))
    k = best[1]
    p = min(1.0, 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2)))
    return best[0], k, p


class TestPettitt:
    def test_step_series_localized(self, spark):
        ys = [0.0] * 10 + [10.0] * 10
        rows = [("h", t, y) for t, y in enumerate(ys)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        [r] = pettitt_test(df, "key", "t", "y").collect()
        assert r["cp_t"] == 9  # last point of the left segment
        assert r["k_stat"] == pytest.approx(100.0)
        cp, k, p = _py_pettitt(ys)
        assert r["p_value"] == pytest.approx(round(p, 6), abs=1e-6)

    def test_constant_series(self, spark):
        rows = [("h", t, 4.0) for t in range(8)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        [r] = pettitt_test(df, "key", "t", "y").collect()
        assert r["k_stat"] == 0.0
        assert r["p_value"] == 1.0

    def test_matches_python(self, spark):
        ys = [5.0, 3.0, 6.0, 4.0, 12.0, 11.0, 13.0, 10.0, 12.0]
        rows = [("h", t, y) for t, y in enumerate(ys)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        [r] = pettitt_test(df, "key", "t", "y").collect()
        cp, k, p = _py_pettitt(ys)
        assert r["cp_t"] == cp
        assert r["k_stat"] == pytest.approx(round(k, 6))
        assert r["p_value"] == pytest.approx(round(p, 6), abs=1e-6)

    def test_keys_independent(self, spark):
        rows = [("a", t, 0.0 if t < 5 else 9.0) for t in range(10)] + [
            ("b", t, float(t % 2)) for t in range(10)
        ]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        out = {r["key"]: r for r in pettitt_test(df, "key", "t", "y").collect()}
        assert out["a"]["cp_t"] == 4
        assert out["a"]["k_stat"] > out["b"]["k_stat"]
