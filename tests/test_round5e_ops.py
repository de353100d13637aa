"""Round-5e operators: Chapman capture-recapture, k-anonymity/l-diversity
audit, Horvitz-Thompson stratified totals, Benford first-digit deviation.

Pins what the DuckDB oracles can't isolate: hand-computed estimator
values on tiny frames, degenerate inputs (zero overlap, empty strata,
single digits), and the missing-mass corrections.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gc_spark.operators.benford import benford_deviation
from gc_spark.operators.capture import capture_recapture
from gc_spark.operators.htsample import ht_stratified_total
from gc_spark.operators.kanon import k_anonymity


class TestCaptureRecapture:
    def test_hand_computed_chapman(self, spark):
        # n1=4 (1,2,3,4), n2=3 (3,4,5), m=2 -> N_hat = 5*4/3 - 1
        p1 = spark.createDataFrame(
            [("a", i) for i in [1, 2, 3, 4]], "grp string, id int"
        )
        p2 = spark.createDataFrame(
            [("a", i) for i in [3, 4, 5]], "grp string, id int"
        )
        [r] = capture_recapture(p1, p2, "id", "grp").collect()
        assert (r["n1"], r["n2"], r["m"]) == (4, 3, 2)
        assert r["n_hat"] == pytest.approx(5 * 4 / 3 - 1)
        var = 5 * 4 * 2 * 1 / (9 * 4)
        assert r["se"] == pytest.approx(round(math.sqrt(var), 6))
        assert r["unseen_share"] == pytest.approx(
            round(1 - 5 / (5 * 4 / 3 - 1), 6)
        )

    def test_duplicate_captures_collapse(self, spark):
        p1 = spark.createDataFrame(
            [("a", 1), ("a", 1), ("a", 2)], "grp string, id int"
        )
        p2 = spark.createDataFrame([("a", 1)], "grp string, id int")
        [r] = capture_recapture(p1, p2, "id", "grp").collect()
        assert (r["n1"], r["n2"], r["m"]) == (2, 1, 1)

    def test_zero_overlap_still_finite(self, spark):
        p1 = spark.createDataFrame([("a", 1)], "grp string, id int")
        p2 = spark.createDataFrame([("a", 2)], "grp string, id int")
        [r] = capture_recapture(p1, p2, "id", "grp").collect()
        assert r["m"] == 0
        assert r["n_hat"] == pytest.approx(2 * 2 / 1 - 1)

    def test_group_only_in_one_pass(self, spark):
        p1 = spark.createDataFrame([("only1", 1)], "grp string, id int")
        p2 = spark.createDataFrame([("only2", 9)], "grp string, id int")
        rows = {r["grp"]: r for r in capture_recapture(p1, p2, "id", "grp").collect()}
        assert rows["only1"]["n2"] == 0 and rows["only2"]["n1"] == 0


class TestKAnonymity:
    def _df(self, spark):
        # classes: (x,1)->3 rows, (x,2)->1 row, (y,1)->2 rows homogeneous
        rows = [
            ("x", 1, "s1"),
            ("x", 1, "s2"),
            ("x", 1, "s1"),
            ("x", 2, "s3"),
            ("y", 1, "s1"),
            ("y", 1, "s1"),
        ]
        return spark.createDataFrame(rows, "a string, b int, sens string")

    def test_summary_counts(self, spark):
        [r] = k_anonymity(
            self._df(spark), ["a", "b"], k=3, sensitive_col="sens"
        ).collect()
        assert r["n_rows"] == 6 and r["n_classes"] == 3
        assert r["min_class_size"] == 1
        assert r["violating_classes"] == 2  # sizes 1 and 2 are < 3
        assert r["rows_at_risk"] == 3
        assert r["risk_share"] == pytest.approx(0.5)
        # (y,1) has 2 rows all sens=s1; (x,1) is diverse; (x,2) is sz 1
        assert r["homogeneous_classes"] == 1
        assert r["rows_exposed"] == 2

    def test_without_sensitive_col(self, spark):
        [r] = k_anonymity(self._df(spark), ["a"], k=2).collect()
        assert "homogeneous_classes" not in r.asDict()
        assert r["violating_classes"] == 0  # both a-classes have >= 2 rows

    def test_all_anonymous_when_k_1(self, spark):
        [r] = k_anonymity(self._df(spark), ["a", "b"], k=1).collect()
        assert r["violating_classes"] == 0 and r["rows_at_risk"] == 0


class TestHtStratified:
    def test_unbiased_weighting(self, spark):
        # stratum A: 2 rows at pi=0.5 -> ht_count 4, ht_total 2*(10+20)
        # stratum B: 1 row at pi=0.25 -> ht_count 4, ht_total 4*8
        rows = [("A", 10.0, 0.5), ("A", 20.0, 0.5), ("B", 8.0, 0.25)]
        df = spark.createDataFrame(rows, "stratum string, y double, pi double")
        out = {
            r["stratum"]: r
            for r in ht_stratified_total(df, "stratum", "y", "pi").collect()
        }
        assert out["A"]["ht_count"] == pytest.approx(4.0)
        assert out["A"]["ht_total"] == pytest.approx(60.0)
        assert out["B"]["ht_total"] == pytest.approx(32.0)
        assert out["__all__"]["n_sampled"] == 3
        assert out["__all__"]["ht_total"] == pytest.approx(92.0)

    def test_se_closed_form(self, spark):
        df = spark.createDataFrame(
            [("A", 10.0, 0.5)], "stratum string, y double, pi double"
        )
        out = {
            r["stratum"]: r
            for r in ht_stratified_total(df, "stratum", "y", "pi").collect()
        }
        # Var = (1-0.5)/0.25 * 100 = 200
        assert out["A"]["se"] == pytest.approx(round(math.sqrt(200.0), 6))

    def test_pi_one_census_is_exact(self, spark):
        df = spark.createDataFrame(
            [("A", 7.0, 1.0), ("A", 3.0, 1.0)],
            "stratum string, y double, pi double",
        )
        out = {
            r["stratum"]: r
            for r in ht_stratified_total(
                df, "stratum", "y", "pi", include_overall=False
            ).collect()
        }
        assert out["A"]["ht_total"] == pytest.approx(10.0)
        assert out["A"]["se"] == pytest.approx(0.0)


class TestBenford:
    def test_single_digit_spike_alarms(self, spark):
        # all values start with 5 -> chi2 = n*(5-spike term) ... just
        # check it's the full missing-mass value: chi2 =
        # (n - p5*n)^2/(p5*n) + n*(1-p5)
        n = 100
        df = spark.createDataFrame(
            [("g", 5.0 * (10**(i % 3))) for i in range(n)], "grp string, v double"
        )
        [r] = benford_deviation(df, "grp", "v").collect()
        p5 = math.log10(1.2)
        expect = (n - p5 * n) ** 2 / (p5 * n) + n * (1 - p5)
        assert r["n"] == n
        assert r["chi2"] == pytest.approx(expect, rel=1e-6)
        assert r["benford_alarm"] is True
        assert r["top_digit_share"] == pytest.approx(1.0)
        assert r["tvd"] == pytest.approx(round(1 - p5, 6))

    def test_exact_benford_sample_passes(self, spark):
        # counts proportional to Benford shares (scaled to ints) keep
        # chi2 small and the alarm off
        rows = []
        for d in range(1, 10):
            cnt = round(1000 * math.log10(1 + 1 / d))
            rows += [("g", float(d))] * cnt
        df = spark.createDataFrame(rows, "grp string, v double")
        [r] = benford_deviation(df, "grp", "v").collect()
        assert r["chi2"] < 1.0
        assert r["benford_alarm"] is False

    def test_nonpositive_values_ignored(self, spark):
        df = spark.createDataFrame(
            [("g", -3.0), ("g", 0.0), ("g", 123.0)], "grp string, v double"
        )
        [r] = benford_deviation(df, "grp", "v").collect()
        assert r["n"] == 1

    def test_first_digit_of_fractions(self, spark):
        # 0.042 -> first digit 4 (log10 floor is negative)
        df = spark.createDataFrame(
            [("g", 0.042), ("g", 0.9)], "grp string, v double"
        )
        rows = benford_deviation(df, "grp", "v").collect()
        assert rows[0]["n"] == 2  # both parsed, none dropped


from gc_spark.operators.bandit import ucb1_schedule  # noqa: E402
from gc_spark.operators.cocite import (  # noqa: E402
    cocitation_coupling,
    common_neighbor_pairs,
)
from gc_spark.operators.concentration import gini_concentration  # noqa: E402
from gc_spark.operators.eliasfano import postings_size_plan  # noqa: E402
from gc_spark.operators.qlm import dirichlet_qlm  # noqa: E402


class TestGiniConcentration:
    def test_perfect_equality_is_zero(self, spark):
        df = spark.createDataFrame(
            [("f", f"h{i}", 10.0) for i in range(5)],
            "grp string, unit string, x double",
        )
        [r] = gini_concentration(df, "grp", "unit", "x").collect()
        assert r["gini"] == pytest.approx(0.0)
        assert r["hhi"] == pytest.approx(0.2)
        assert r["top_share"] == pytest.approx(0.2)

    def test_total_monopoly_approaches_one(self, spark):
        rows = [("f", "big", 1000.0)] + [("f", f"h{i}", 0.0) for i in range(9)]
        df = spark.createDataFrame(rows, "grp string, unit string, x double")
        [r] = gini_concentration(df, "grp", "unit", "x").collect()
        # closed form with one non-zero unit of n=10: G = (n-1)/n
        assert r["gini"] == pytest.approx(0.9)
        assert r["hhi"] == pytest.approx(1.0)
        assert r["top_share"] == pytest.approx(1.0)

    def test_hand_computed_small(self, spark):
        # x sorted = [1,2,3,4]; sum=10; sum(i*x)=1+4+9+16=30
        # G = 2*30/(4*10) - 5/4 = 1.5 - 1.25 = 0.25
        df = spark.createDataFrame(
            [("f", "a", 1.0), ("f", "b", 2.0), ("f", "c", 3.0), ("f", "d", 4.0)],
            "grp string, unit string, x double",
        )
        [r] = gini_concentration(df, "grp", "unit", "x").collect()
        assert r["gini"] == pytest.approx(0.25)


class TestPostingsSizing:
    def test_closed_forms(self, spark):
        # term "t" in docs 0..7 of a universe of 8: EF = 8*(2+ceil(log2(1)))
        rows = [(i, "t") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        [r] = postings_size_plan(df).collect()
        assert r["doc_freq"] == 8
        assert r["ef_bits"] == 8 * 2  # log2(8/8)=0
        # gaps: first doc 0 -> gap 1, then 1,1,... -> 8 one-byte varints
        assert r["varint_bits"] == 64
        assert r["best"] == "ef"

    def test_sparse_term_prefers_varint_when_cheaper(self, spark):
        # one term in a single doc at id 0 within universe 1000:
        # EF = 1*(2+ceil(log2(1000))) = 12 bits; varint gap 1 -> 8 bits
        rows = [(0, "rare")] + [(999, "filler")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["term"]: r for r in postings_size_plan(df).collect()}
        assert out["rare"]["ef_bits"] == 12
        assert out["rare"]["varint_bits"] == 8
        assert out["rare"]["best"] == "varint"
        assert out["rare"]["bits_saved"] == 4

    def test_duplicate_tokens_one_posting(self, spark):
        df = spark.createDataFrame(
            [(3, "x x x")], "doc_id long, text string"
        )
        [r] = postings_size_plan(df).collect()
        assert r["doc_freq"] == 1


class TestCocite:
    def test_cocitation_pairs(self, spark):
        # s1 and s2 both cite a,b -> (a,b) co-cited twice
        edges = spark.createDataFrame(
            [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b"), ("s3", "a")],
            "src string, dst string",
        )
        rows = common_neighbor_pairs(
            edges, shared="src", min_common=2
        ).collect()
        assert [(r["a"], r["b"], r["n_common"]) for r in rows] == [
            ("a", "b", 2)
        ]

    def test_coupling_pairs(self, spark):
        edges = spark.createDataFrame(
            [("s1", "t"), ("s2", "t"), ("s1", "u"), ("s2", "u")],
            "src string, dst string",
        )
        rows = common_neighbor_pairs(
            edges, shared="dst", min_common=2
        ).collect()
        assert [(r["a"], r["b"], r["n_common"]) for r in rows] == [
            ("s1", "s2", 2)
        ]

    def test_hub_capped_out(self, spark):
        # hub cites 5 targets; with max_degree=4 it emits no wedges
        edges = spark.createDataFrame(
            [("hub", f"d{i}") for i in range(5)], "src string, dst string"
        )
        assert (
            common_neighbor_pairs(
                edges, shared="src", max_degree=4, min_common=1
            ).count()
            == 0
        )

    def test_both_kinds_united(self, spark):
        edges = spark.createDataFrame(
            [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b")],
            "src string, dst string",
        )
        kinds = {
            r["kind"]
            for r in cocitation_coupling(edges, min_common=2).collect()
        }
        assert kinds == {"cocitation", "coupling"}


class TestUcb1:
    def test_thin_arm_gets_exploration_bonus(self, spark):
        # arm A: 100 pulls, mean 0.5; arm B: 1 pull, mean 0.0 ->
        # B's bonus sqrt(2 ln 101) > A's mean + tiny bonus
        rows = [("A", 0.5)] * 100 + [("B", 0.0)]
        df = spark.createDataFrame(rows, "source string, reward double")
        out = {r["source"]: r for r in ucb1_schedule(df, "source", "reward").collect()}
        assert out["B"]["rank"] == 1
        assert out["A"]["rank"] == 2
        assert out["B"]["ucb"] == pytest.approx(
            round(math.sqrt(2 * math.log(101)), 6)
        )

    def test_ucb_value(self, spark):
        rows = [("A", 1.0), ("A", 0.0), ("B", 1.0), ("B", 1.0)]
        df = spark.createDataFrame(rows, "source string, reward double")
        out = {r["source"]: r for r in ucb1_schedule(df, "source", "reward").collect()}
        assert out["A"]["mean_reward"] == pytest.approx(0.5)
        assert out["A"]["ucb"] == pytest.approx(
            round(0.5 + math.sqrt(2 * math.log(4.0) / 2), 6)
        )


class TestDirichletQlm:
    def test_hand_computed_score(self, spark):
        # corpus: d1="q q x", d2="y y y"; query=[q]; mu=10
        # p(q|C)=2/6; d1: log(1+2/(10/3)) + 1*log(10/13)
        df = spark.createDataFrame(
            [(1, "q q x"), (2, "y y y")], "doc_id long, text string"
        )
        rows = dirichlet_qlm(df, ["q"], mu=10.0).collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == 1
        expect = math.log(1 + 2 / (10 * (2 / 6))) + math.log(10 / 13)
        assert rows[0]["score"] == pytest.approx(expect, abs=1e-6)
        assert rows[0]["n_matched"] == 1

    def test_length_normalization_prefers_short_doc(self, spark):
        # same tf, shorter doc scores higher
        df = spark.createDataFrame(
            [(1, "q a"), (2, "q a a a a a a a")], "doc_id long, text string"
        )
        rows = dirichlet_qlm(df, ["q"], mu=5.0).collect()
        assert rows[0]["doc_id"] == 1

    def test_top_k_bound(self, spark):
        df = spark.createDataFrame(
            [(i, "q filler") for i in range(20)], "doc_id long, text string"
        )
        assert dirichlet_qlm(df, ["q"], top_k=7).count() == 7


class TestStreamingBenford:
    def test_matches_batch_across_restart(self, spark, tmp_path):
        """Two AvailableNow runs with a checkpoint restart between: the
        final emitted row per host must equal the batch benford_deviation
        over the union of both waves — the 9-counter state survives."""
        from gc_spark.streaming.state import streaming_benford

        schema = "host string, bytes double"
        wave1 = [("h", float(1 + (i * 37) % 900)) for i in range(300)]
        wave2 = [("h", float(1 + (i * 61) % 900)) for i in range(300)]

        src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_benford(stream, "bytes")
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

        [streamed] = spark.read.parquet(out).where("n = 600").collect()
        both = spark.createDataFrame(wave1 + wave2, schema)
        [batch] = benford_deviation(both, "host", "bytes").collect()
        assert streamed["chi2"] == pytest.approx(batch["chi2"], abs=2e-6)
        assert streamed["tvd"] == pytest.approx(batch["tvd"], abs=2e-6)
        assert streamed["top_digit_share"] == pytest.approx(
            batch["top_digit_share"], abs=2e-6
        )
        assert streamed["benford_alarm"] == batch["benford_alarm"]

    def test_alarm_fires_on_spiked_stream(self, spark, tmp_path):
        from gc_spark.streaming.state import streaming_benford

        schema = "host string, bytes double"
        ok_rows = []
        for d in range(1, 10):
            ok_rows += [("ok", float(d))] * round(300 * math.log10(1 + 1 / d))
        rows = [("spam", 5e3)] * 100 + ok_rows
        src, out, ckpt = (str(tmp_path / p) for p in ("s2", "o2", "c2"))
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_benford(stream, "bytes")
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["host"]: r for r in spark.read.parquet(out).collect()}
        assert got["spam"]["benford_alarm"] is True
        assert got["ok"]["benford_alarm"] is False
