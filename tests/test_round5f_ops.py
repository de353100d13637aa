"""Round-5f operators: the experimentation/statistics family — Pearson
feature-correlation matrix, Cohen's kappa, two-proportion z-test,
Mann-Whitney U, Wald SPRT.

Pins hand-computed statistic values on tiny frames, the tie corrections,
boundary behavior (perfect correlation/agreement, no crossing), and the
cancellation-safety of the centered correlation pass.
"""

from __future__ import annotations

import math

import pytest

from gc_spark.operators.featcorr import pearson_matrix
from gc_spark.operators.kappa import cohens_kappa
from gc_spark.operators.proptest import two_proportion_ztest
from gc_spark.operators.ranktest import mann_whitney_u
from gc_spark.operators.sprt import sprt_decisions


class TestPearsonMatrix:
    def test_perfect_and_anti_correlation(self, spark):
        rows = [(float(i), 2.0 * i + 1, -3.0 * i) for i in range(10)]
        df = spark.createDataFrame(rows, "x double, y double, z double")
        out = {
            (r["feat_a"], r["feat_b"]): r["r"]
            for r in pearson_matrix(df, ["x", "y", "z"]).collect()
        }
        assert out[("x", "y")] == pytest.approx(1.0)
        assert out[("x", "z")] == pytest.approx(-1.0)
        assert out[("y", "z")] == pytest.approx(-1.0)

    def test_independent_features_zero(self, spark):
        # x and y are the two bits of a 4-cycle: balanced and orthogonal
        rows = [(float(i % 2), float((i // 2) % 2)) for i in range(40)]
        df = spark.createDataFrame(rows, "x double, y double")
        [r] = pearson_matrix(df, ["x", "y"]).collect()
        assert r["r"] == pytest.approx(0.0)
        assert r["n"] == 40

    def test_large_offset_no_cancellation(self, spark):
        # huge common offset, tiny independent wiggle: the raw-sum
        # formula loses these digits; the centered pass must not
        rows = [
            (1e9 + (i % 3), 1e9 + ((i * 7) % 5)) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "x double, y double")
        [r] = pearson_matrix(df, ["x", "y"]).collect()
        # exact r computed with numpy-equivalent math
        xs = [(i % 3) for i in range(30)]
        ys = [((i * 7) % 5) for i in range(30)]
        mx, my = sum(xs) / 30, sum(ys) / 30
        num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
        )
        assert r["r"] == pytest.approx(round(num / den, 6), abs=1e-6)

    def test_constant_column_gives_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0)], "x double, y double"
        )
        [r] = pearson_matrix(df, ["x", "y"]).collect()
        assert r["r"] is None


class TestCohensKappa:
    def test_hand_computed(self, spark):
        # classic 2x2: 20 agree-yes, 15 agree-no, 10 a-yes/b-no, 5 a-no/b-yes
        rows = (
            [("y", "y")] * 20 + [("n", "n")] * 15 + [("y", "n")] * 10 + [("n", "y")] * 5
        )
        df = spark.createDataFrame(rows, "a string, b string")
        [r] = cohens_kappa(df, "a", "b").collect()
        n = 50
        po = 35 / n
        pe = (30 * 25 + 20 * 25) / (n * n)
        assert r["n"] == n
        assert r["p_o"] == pytest.approx(po)
        assert r["p_e"] == pytest.approx(pe)
        assert r["kappa"] == pytest.approx(round((po - pe) / (1 - pe), 6))

    def test_perfect_agreement_is_one(self, spark):
        rows = [("a", "a")] * 5 + [("b", "b")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        [r] = cohens_kappa(df, "a", "b").collect()
        assert r["kappa"] == pytest.approx(1.0)

    def test_chance_level_is_zero(self, spark):
        # independent labelers with identical marginals: kappa ~ 0
        rows = [(x, y) for x in ["a", "b"] for y in ["a", "b"]] * 10
        df = spark.createDataFrame(rows, "a string, b string")
        [r] = cohens_kappa(df, "a", "b").collect()
        assert r["kappa"] == pytest.approx(0.0)


class TestPropZtest:
    def test_hand_computed_z(self, spark):
        # A: 60/100 successes; B: 40/100
        rows = [("A", 1)] * 60 + [("A", 0)] * 40 + [("B", 1)] * 40 + [("B", 0)] * 60
        df = spark.createDataFrame(rows, "g string, s int")
        [r] = two_proportion_ztest(df, "g", "s", "A", "B").collect()
        pool = 0.5
        z = (0.6 - 0.4) / math.sqrt(pool * 0.5 * (2 / 100))
        assert r["p_a"] == pytest.approx(0.6)
        assert r["p_b"] == pytest.approx(0.4)
        assert r["z"] == pytest.approx(round(z, 6))
        assert r["significant"] is True

    def test_no_difference_not_significant(self, spark):
        rows = ([("A", 1)] * 50 + [("A", 0)] * 50) + ([("B", 1)] * 50 + [("B", 0)] * 50)
        df = spark.createDataFrame(rows, "g string, s int")
        [r] = two_proportion_ztest(df, "g", "s", "A", "B").collect()
        assert r["z"] == pytest.approx(0.0)
        assert r["significant"] is False

    def test_other_groups_ignored(self, spark):
        rows = [("A", 1), ("B", 0), ("C", 1), ("C", 1)]
        df = spark.createDataFrame(rows, "g string, s int")
        [r] = two_proportion_ztest(df, "g", "s", "A", "B").collect()
        assert (r["n_a"], r["n_b"]) == (1, 1)


class TestMannWhitney:
    def test_hand_computed_no_ties(self, spark):
        # A = {1,2,3}, B = {4,5,6}: ranks A sum to 6, U_a = 0
        rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0), ("B", 5.0), ("B", 6.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = mann_whitney_u(df, "g", "v", "A", "B", shard_width=2.0).collect()
        assert r["u_a"] == pytest.approx(0.0)
        assert r["mu"] == pytest.approx(4.5)
        # sigma = sqrt(9/12 * 7) (no ties)
        assert r["sigma"] == pytest.approx(round(math.sqrt(9 * 7 / 12), 6))

    def test_tied_values_average_ranks(self, spark):
        # A = {1,1}, B = {1,2}: value 1 has t=3, avg rank 2 -> R_a = 4
        rows = [("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 2.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = mann_whitney_u(df, "g", "v", "A", "B", shard_width=10.0).collect()
        # U_a = R_a - n_a(n_a+1)/2 = 4 - 3 = 1
        assert r["u_a"] == pytest.approx(1.0)

    def test_sharding_invariance(self, spark):
        rows = [("A", float((i * 13) % 37)) for i in range(60)] + [
            ("B", float((i * 17) % 41) + 0.5) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        wide = mann_whitney_u(df, "g", "v", "A", "B", shard_width=1000.0).collect()[0]
        narrow = mann_whitney_u(df, "g", "v", "A", "B", shard_width=3.0).collect()[0]
        assert wide["u_a"] == narrow["u_a"]
        assert wide["z"] == narrow["z"]

    def test_identical_distributions_z_small(self, spark):
        rows = [("A", float(i % 10)) for i in range(100)] + [
            ("B", float(i % 10)) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = mann_whitney_u(df, "g", "v", "A", "B", shard_width=4.0).collect()
        assert abs(r["z"]) < 0.01
        assert r["significant"] is False


class TestSprt:
    def _mk(self, spark, outcomes):
        rows = [("s", i + 1, y) for i, y in enumerate(outcomes)]
        return spark.createDataFrame(rows, "src string, t int, y int")

    def test_all_failures_accepts_h1(self, spark):
        # p0=0.1 vs p1=0.9: a run of 1s crosses the upper boundary fast
        df = self._mk(spark, [1] * 10)
        [r] = sprt_decisions(df, "src", "t", "y", p0=0.1, p1=0.9).collect()
        assert r["decision"] == "accept_h1"
        # upper = ln(19); each 1 adds ln(9): crossing at trial 2
        assert r["n_at_decision"] == 2

    def test_all_successes_accepts_h0(self, spark):
        df = self._mk(spark, [0] * 20)
        [r] = sprt_decisions(df, "src", "t", "y", p0=0.1, p1=0.9).collect()
        assert r["decision"] == "accept_h0"
        # each 0 adds ln(0.1/0.9); lower = ln(1/19): crossing at trial 2
        assert r["n_at_decision"] == 2

    def test_ambiguous_walk_continues(self, spark):
        # alternate 1/0 with symmetric rates: llr oscillates near 0
        df = self._mk(spark, [1, 0] * 5)
        [r] = sprt_decisions(df, "src", "t", "y", p0=0.3, p1=0.7).collect()
        assert r["decision"] == "continue"
        assert r["n_at_decision"] is None
        assert r["n_trials"] == 10

    def test_earliest_crossing_wins(self, spark):
        # crosses H1 first even though it later dives below the lower bound
        df = self._mk(spark, [1, 1, 1] + [0] * 30)
        [r] = sprt_decisions(df, "src", "t", "y", p0=0.1, p1=0.9).collect()
        assert r["decision"] == "accept_h1"
        assert r["n_at_decision"] == 2

    def test_llr_final_value(self, spark):
        df = self._mk(spark, [1, 0, 1])
        [r] = sprt_decisions(df, "src", "t", "y", p0=0.2, p1=0.4).collect()
        expect = 2 * math.log(0.4 / 0.2) + math.log(0.6 / 0.8)
        assert r["llr_final"] == pytest.approx(round(expect, 6))
