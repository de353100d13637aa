"""Round-5j operators: best-passage extraction, ordered funnel,
exact trimmed mean.

Pins hand-computed window densities and tie-breaks, strict temporal
funnel ordering with drop-off propagation, and the interval-overlap
trimmed mean including ties spanning the trim boundary.
"""

from __future__ import annotations

import pytest

from gc_spark.operators.funnel import funnel
from gc_spark.operators.passage import best_passage
from gc_spark.operators.trimmed import trimmed_mean


class TestBestPassage:
    def test_densest_window_found(self, spark):
        df = spark.createDataFrame(
            [(1, "x q x x q q x")], "doc_id long, text string"
        )
        [r] = best_passage(df, ["q"], width=3).collect()
        assert r["passage_start"] == 4
        assert r["n_hits"] == 2

    def test_tie_breaks_earliest(self, spark):
        df = spark.createDataFrame(
            [(1, "q x x q x x")], "doc_id long, text string"
        )
        [r] = best_passage(df, ["q"], width=2).collect()
        assert r["passage_start"] == 0
        assert r["n_hits"] == 1

    def test_unmatched_doc_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "q b c")], "doc_id long, text string"
        )
        out = {r["doc_id"] for r in best_passage(df, ["q"], width=5).collect()}
        assert out == {2}

    def test_multi_term_density(self, spark):
        df = spark.createDataFrame(
            [(1, "a q b r q r b a a a")], "doc_id long, text string"
        )
        [r] = best_passage(df, ["q", "r"], width=4).collect()
        # window [1,4]: q,r,q -> 3 hits; [2,5]: r q r -> 3 but later
        assert r["passage_start"] == 1
        assert r["n_hits"] == 3


class TestFunnel:
    def _events(self, spark):
        rows = [
            (1, 1.0, "view"), (1, 2.0, "click"), (1, 3.0, "purchase"),
            (2, 1.0, "click"), (2, 2.0, "view"),
            (3, 1.0, "view"), (3, 5.0, "click"),
        ]
        return spark.createDataFrame(rows, "u long, ts double, et string")

    def test_ordered_conversion(self, spark):
        out = {
            r["step_idx"]: r
            for r in funnel(
                self._events(spark), "u", "ts", "et", ["view", "click", "purchase"]
            ).collect()
        }
        assert [out[i]["n_users"] for i in (1, 2, 3)] == [3, 2, 1]
        assert out[1]["rate_from_prev"] == 1.0
        assert out[2]["rate_from_first"] == pytest.approx(round(2 / 3, 6))
        assert out[3]["rate_from_prev"] == pytest.approx(0.5)

    def test_strict_order_same_ts_not_counted(self, spark):
        rows = [(1, 5.0, "view"), (1, 5.0, "click")]
        df = spark.createDataFrame(rows, "u long, ts double, et string")
        out = {r["step_idx"]: r["n_users"] for r in funnel(df, "u", "ts", "et", ["view", "click"]).collect()}
        assert out == {1: 1, 2: 0}

    def test_missing_step_zeros_propagate(self, spark):
        rows = [(1, 1.0, "view"), (1, 2.0, "purchase")]
        df = spark.createDataFrame(rows, "u long, ts double, et string")
        out = {
            r["step_idx"]: r
            for r in funnel(df, "u", "ts", "et", ["view", "click", "purchase"]).collect()
        }
        assert out[2]["n_users"] == 0 and out[3]["n_users"] == 0
        assert out[3]["rate_from_prev"] == 0.0

    def test_empty_steps_raise(self, spark):
        df = spark.createDataFrame([(1, 1.0, "view")], "u long, ts double, et string")
        with pytest.raises(ValueError):
            funnel(df, "u", "ts", "et", [])


class TestTrimmedMean:
    def test_outlier_removed(self, spark):
        vals = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        [r] = trimmed_mean(df, "g", "v", trim_frac=0.1).collect()
        assert r["mean_raw"] == pytest.approx(13.6)
        assert r["mean_trimmed"] == pytest.approx(4.5)
        assert r["n_trimmed"] == 2

    def test_ties_spanning_boundary(self, spark):
        vals = [1.0, 1.0, 1.0, 5.0, 9.0, 9.0, 9.0]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        [r] = trimmed_mean(df, "g", "v", trim_frac=0.15).collect()
        # lo = floor(1.05) = 1: keep ranks 2..6 = {1,1,5,9,9} -> 5.0
        assert r["mean_trimmed"] == pytest.approx(5.0)
        assert r["n"] == 7

    def test_zero_trim_equals_raw(self, spark):
        vals = [2.0, 4.0, 9.0]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        [r] = trimmed_mean(df, "g", "v", trim_frac=0.0).collect()
        assert r["mean_trimmed"] == r["mean_raw"] == pytest.approx(5.0)
        assert r["n_trimmed"] == 0

    def test_groups_independent(self, spark):
        rows = [("a", float(v)) for v in range(10)] + [("b", 7.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["group"]: r for r in trimmed_mean(df, "g", "v", 0.1).collect()}
        assert out["a"]["mean_trimmed"] == pytest.approx(4.5)
        assert out["b"]["mean_trimmed"] == pytest.approx(7.0)
        assert out["b"]["n_trimmed"] == 0

    def test_invalid_trim_raises(self, spark):
        df = spark.createDataFrame([("g", 1.0)], "g string, v double")
        with pytest.raises(ValueError):
            trimmed_mean(df, "g", "v", trim_frac=0.5)


class TestStreamingHolt:
    def test_matches_batch_across_restart(self, spark, tmp_path):
        """Two AvailableNow runs with a checkpoint restart between: the
        final row per host must equal batch holt_forecast over the
        union of both waves — level/trend/n/sae survive the restart."""
        from gc_spark.operators.holt import holt_forecast
        from gc_spark.streaming.state import streaming_holt

        schema = "host string, t long, y double"
        wave1 = [
            ("ha", t, float(3 + 2 * t + (t % 3))) for t in range(1, 11)
        ] + [("hb", t, 50.0 - t) for t in range(1, 11)]
        wave2 = [
            ("ha", t, float(3 + 2 * t + (t % 3))) for t in range(11, 21)
        ] + [("hb", t, 50.0 - t) for t in range(11, 21)]
        src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_holt(stream, "y", "t", alpha=0.5, beta=0.3, horizon=2)
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
            for r in spark.read.parquet(out).where("n = 20").collect()
        }
        both = spark.createDataFrame(wave1 + wave2, schema)
        batch = {
            r["host"]: r
            for r in holt_forecast(
                both, "host", "t", "y", alpha=0.5, beta=0.3, horizon=2
            ).collect()
        }
        assert set(streamed) == {"ha", "hb"}
        for h in streamed:
            for c in ("level", "trend", "forecast", "mae"):
                assert streamed[h][c] == pytest.approx(batch[h][c], abs=2e-6)


class TestRocAuc:
    def test_perfect_separation(self, spark):
        rows = [(0.9, 1)] * 5 + [(0.1, 0)] * 5
        df = spark.createDataFrame(rows, "s double, y int")
        from gc_spark.operators.classifier_eval import roc_auc

        [r] = roc_auc(df, "s", "y").collect()
        assert r["auc"] == pytest.approx(1.0)
        assert r["gini"] == pytest.approx(1.0)

    def test_all_tied_half(self, spark):
        rows = [(0.5, 1)] * 4 + [(0.5, 0)] * 6
        df = spark.createDataFrame(rows, "s double, y int")
        from gc_spark.operators.classifier_eval import roc_auc

        [r] = roc_auc(df, "s", "y").collect()
        assert r["auc"] == pytest.approx(0.5)

    def test_hand_computed_with_ties(self, spark):
        # pos: .3 .7 .7 ; neg: .3 .5 — pairwise wins: (.3 vs .3)=.5,
        # (.3 vs .5)=0, (.7 vs .3)=1 x2, (.7 vs .5)=1 x2 -> 4.5/6
        rows = [(0.3, 1), (0.7, 1), (0.7, 1), (0.3, 0), (0.5, 0)]
        df = spark.createDataFrame(rows, "s double, y int")
        from gc_spark.operators.classifier_eval import roc_auc

        [r] = roc_auc(df, "s", "y").collect()
        assert r["auc"] == pytest.approx(0.75)
        assert r["n_pos"] == 3 and r["n_neg"] == 2

    def test_shard_width_invariance(self, spark):
        rows = [((i * 13 % 37) / 37.0, i % 2) for i in range(80)]
        df = spark.createDataFrame(rows, "s double, y int")
        from gc_spark.operators.classifier_eval import roc_auc

        a = roc_auc(df, "s", "y", shard_width=0.03).collect()
        b = roc_auc(df, "s", "y", shard_width=0.9).collect()
        assert a == b


class TestPrSweep:
    def test_hand_computed(self, spark):
        # scores .2 .4 .6 .8 with labels 0 1 0 1
        rows = [(0.2, 0), (0.4, 1), (0.6, 0), (0.8, 1)]
        df = spark.createDataFrame(rows, "s double, y int")
        from gc_spark.operators.classifier_eval import pr_at_thresholds

        out = {
            round(r["threshold"], 2): r
            for r in pr_at_thresholds(df, "s", "y", (0.3, 0.5, 0.7)).collect()
        }
        assert out[0.3]["n_pred_pos"] == 3 and out[0.3]["tp"] == 2
        assert out[0.3]["precision"] == pytest.approx(round(2 / 3, 6))
        assert out[0.3]["recall"] == pytest.approx(1.0)
        assert out[0.5]["precision"] == pytest.approx(0.5)
        assert out[0.7]["precision"] == pytest.approx(1.0)
        assert out[0.7]["recall"] == pytest.approx(0.5)
        # f1 at .7: 2*1/(1+2) = 2/3
        assert out[0.7]["f1"] == pytest.approx(round(2 / 3, 6))

    def test_empty_prediction_side(self, spark):
        rows = [(0.1, 1), (0.2, 0)]
        df = spark.createDataFrame(rows, "s double, y int")
        from gc_spark.operators.classifier_eval import pr_at_thresholds

        [r] = pr_at_thresholds(df, "s", "y", (0.9,)).collect()
        assert r["n_pred_pos"] == 0
        assert r["precision"] is None
        assert r["recall"] == 0.0
        assert r["f1"] == 0.0


class TestSeasonalDecompose:
    def test_pure_periodic_recovered(self, spark):
        # y = phase pattern [0,3,6,0,-3,-6,0] repeated: trend MA is
        # constant 0, seasonal means equal the pattern exactly,
        # residual variance 0 -> var_explained = 1
        pat = [0.0, 3.0, 6.0, 0.0, -3.0, -6.0, 0.0]
        rows = [("h", t, pat[t % 7]) for t in range(35)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        from gc_spark.operators.seasonal import seasonal_decompose_phase

        out = {
            r["phase"]: r
            for r in seasonal_decompose_phase(df, "key", "t", "y", 7).collect()
        }
        for p in range(7):
            assert out[p]["seasonal"] == pytest.approx(pat[p], abs=1e-6)
        assert out[0]["var_explained"] == pytest.approx(1.0)

    def test_pure_noise_low_explained(self, spark):
        # deterministic pseudo-noise with no period-7 structure
        rows = [("h", t, float((t * 37) % 11)) for t in range(60)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        from gc_spark.operators.seasonal import seasonal_decompose_phase

        out = seasonal_decompose_phase(df, "key", "t", "y", 7).collect()
        assert all(r["var_explained"] < 0.6 for r in out)

    def test_trend_removed(self, spark):
        # linear trend + periodic: seasonal must ignore the trend
        pat = [0.0, 5.0, 0.0, -5.0, 0.0, 0.0, 0.0]
        rows = [("h", t, 2.0 * t + pat[t % 7]) for t in range(42)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        from gc_spark.operators.seasonal import seasonal_decompose_phase

        out = {
            r["phase"]: r["seasonal"]
            for r in seasonal_decompose_phase(df, "key", "t", "y", 7).collect()
        }
        centered = [p - sum(pat) / 7 for p in pat]
        for p in range(7):
            assert out[p] == pytest.approx(centered[p], abs=1e-6)

    def test_even_period_raises(self, spark):
        df = spark.createDataFrame([("h", 0, 1.0)], "key string, t long, y double")
        from gc_spark.operators.seasonal import seasonal_decompose_phase

        with pytest.raises(ValueError):
            seasonal_decompose_phase(df, "key", "t", "y", 6)
