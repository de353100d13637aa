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


from gc_spark.operators.cuped import cuped_adjusted  # noqa: E402
from gc_spark.operators.kendall import kendall_tau  # noqa: E402
from gc_spark.operators.shrinkage import eb_shrink_rates  # noqa: E402
from gc_spark.operators.theilsen import theil_sen_trend  # noqa: E402


class TestTheilSen:
    def test_exact_line_recovered(self, spark):
        rows = [("h", float(i), 3.0 * i + 7.0) for i in range(9)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        [r] = theil_sen_trend(df, "g", "x", "y").collect()
        assert r["slope"] == pytest.approx(3.0)
        assert r["intercept"] == pytest.approx(7.0)
        assert r["n_pairs"] == 36

    def test_outlier_resistance(self, spark):
        # one wild outlier leaves the median slope on the true line
        rows = [("h", float(i), 2.0 * i) for i in range(11)]
        rows[5] = ("h", 5.0, 1000.0)
        df = spark.createDataFrame(rows, "g string, x double, y double")
        [r] = theil_sen_trend(df, "g", "x", "y").collect()
        assert r["slope"] == pytest.approx(2.0)

    def test_big_group_capped_out(self, spark):
        rows = [("big", float(i), float(i)) for i in range(600)] + [
            ("ok", 0.0, 0.0),
            ("ok", 1.0, 5.0),
        ]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = theil_sen_trend(df, "g", "x", "y", max_points=512).collect()
        assert [r["g"] for r in out] == ["ok"]
        assert out[0]["slope"] == pytest.approx(5.0)

    def test_equal_x_pairs_skipped(self, spark):
        rows = [("h", 1.0, 1.0), ("h", 1.0, 9.0), ("h", 2.0, 2.0)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        [r] = theil_sen_trend(df, "g", "x", "y").collect()
        assert r["n_pairs"] == 2  # the (x=1, x=1) pair is vertical


class TestKendallTau:
    def test_perfect_agreement(self, spark):
        rows = [(i, float(i), float(i * 10)) for i in range(10)]
        df = spark.createDataFrame(rows, "i int, a double, b double")
        [r] = kendall_tau(df, "i", "a", "b").collect()
        assert r["tau_b"] == pytest.approx(1.0)
        assert r["discordant"] == 0

    def test_perfect_reversal(self, spark):
        rows = [(i, float(i), float(-i)) for i in range(10)]
        df = spark.createDataFrame(rows, "i int, a double, b double")
        [r] = kendall_tau(df, "i", "a", "b").collect()
        assert r["tau_b"] == pytest.approx(-1.0)

    def test_ties_counted(self, spark):
        rows = [(1, 1.0, 1.0), (2, 1.0, 2.0), (3, 2.0, 3.0)]
        df = spark.createDataFrame(rows, "i int, a double, b double")
        [r] = kendall_tau(df, "i", "a", "b").collect()
        assert r["ties_a"] == 1 and r["ties_b"] == 0
        # C = 2 (pairs 1-3, 2-3), D = 0, tau_b = 2/sqrt(2*3)
        assert r["tau_b"] == pytest.approx(round(2 / math.sqrt(6), 6))


class TestCuped:
    def test_covariate_removes_variance(self, spark):
        # y = 10*x + arm effect: after CUPED the arms separate cleanly
        rows = []
        for i in range(200):
            x = float((i // 2) % 20)  # balanced across arms
            arm = "A" if i % 2 == 0 else "B"
            y = 10.0 * x + (5.0 if arm == "A" else 0.0)
            rows.append((arm, y, x))
        df = spark.createDataFrame(rows, "g string, y double, x double")
        [r] = cuped_adjusted(df, "g", "y", "x", "A", "B").collect()
        assert r["theta"] == pytest.approx(10.0, abs=0.01)
        assert r["diff_adj"] == pytest.approx(5.0, abs=0.01)
        assert r["var_reduction"] > 0.9

    def test_uncorrelated_covariate_changes_nothing(self, spark):
        rows = [
            ("A" if i % 2 == 0 else "B", float(i % 7), float((i // 7) % 2))
            for i in range(280)
        ]
        df = spark.createDataFrame(rows, "g string, y double, x double")
        [r] = cuped_adjusted(df, "g", "y", "x", "A", "B").collect()
        assert r["theta"] == pytest.approx(0.0, abs=1e-6)
        assert r["diff_adj"] == pytest.approx(r["diff_raw"], abs=1e-6)
        assert r["var_reduction"] == pytest.approx(0.0, abs=1e-6)


class TestEbShrinkage:
    def test_small_sample_shrinks_harder(self, spark):
        # h1: 1/1 perfect; h2: 90/100; many mid hosts anchor the prior
        rows = [("h1", 1)] + [("h2", 1)] * 90 + [("h2", 0)] * 10
        for k in range(20):
            rows += [(f"m{k}", 1)] * 5 + [(f"m{k}", 0)] * 5
        df = spark.createDataFrame(rows, "h string, ok int")
        out = {r["h"]: r for r in eb_shrink_rates(df, "h", "ok").collect()}
        # both shrink toward ~0.5-ish prior; the 1-sample host moves more
        move1 = out["h1"]["raw_rate"] - out["h1"]["shrunk_rate"]
        move2 = out["h2"]["raw_rate"] - out["h2"]["shrunk_rate"]
        assert move1 > move2 > 0
        assert out["h2"]["shrunk_rate"] > out["h1"]["shrunk_rate"]

    def test_zero_variance_collapses_to_mean(self, spark):
        rows = [("a", 1), ("a", 0), ("b", 1), ("b", 0)]
        df = spark.createDataFrame(rows, "h string, ok int")
        out = eb_shrink_rates(df, "h", "ok").collect()
        for r in out:
            assert r["shrunk_rate"] == pytest.approx(0.5)

    def test_shrunk_between_raw_and_prior_mean(self, spark):
        rows = [("lo", 0)] * 10 + [("hi", 1)] * 10 + [("mid", 1), ("mid", 0)]
        df = spark.createDataFrame(rows, "h string, ok int")
        out = {r["h"]: r for r in eb_shrink_rates(df, "h", "ok").collect()}
        assert 0.0 < out["lo"]["shrunk_rate"] < 0.5
        assert 0.5 < out["hi"]["shrunk_rate"] < 1.0


class TestStreamingSprt:
    def test_matches_batch_across_restart(self, spark, tmp_path):
        """Two AvailableNow runs with a checkpoint restart between: the
        final row per host must equal batch sprt_decisions over the
        union — the LLR walk and the frozen verdict survive."""
        from gc_spark.streaming.state import streaming_sprt

        schema = "host string, event_id long, err int"
        # host hgood: mostly 0s (accepts H0); hbad: mostly 1s (H1);
        # split across two waves so the crossing can happen in either
        wave1 = [("hgood", i, 1 if i % 5 == 0 else 0) for i in range(1, 16)] + [
            ("hbad", i, 0 if i % 5 == 0 else 1) for i in range(1, 16)
        ]
        wave2 = [("hgood", i, 1 if i % 5 == 0 else 0) for i in range(16, 31)] + [
            ("hbad", i, 0 if i % 5 == 0 else 1) for i in range(16, 31)
        ]
        src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_sprt(stream, "err", "event_id", p0=0.15, p1=0.3)
                .writeStream.outputMode("update")
                .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        spark.createDataFrame(wave1, schema).write.mode("append").parquet(src)
        run_once()
        spark.createDataFrame(wave2, schema).write.mode("append").parquet(src)
        run_once()

        streamed = {
            r["host"]: r
            for r in spark.read.parquet(out).where("n_trials = 30").collect()
        }
        both = spark.createDataFrame(wave1 + wave2, schema)
        batch = {
            r["source"]: r
            for r in sprt_decisions(
                both, "host", "event_id", "err", p0=0.15, p1=0.3
            ).collect()
        }
        assert set(streamed) == {"hgood", "hbad"}
        for h in streamed:
            assert streamed[h]["decision"] == batch[h]["decision"]
            assert streamed[h]["n_at_decision"] == batch[h]["n_at_decision"]
            assert streamed[h]["llr"] == pytest.approx(
                batch[h]["llr_final"], abs=2e-6
            )
