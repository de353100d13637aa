"""Round-5d operators: KMV/theta sketch set algebra, DDSketch quantiles,
bloom-pruned runtime-filter join, host-transition Markov model.

Pins what the DuckDB oracles can't isolate: hand-computed hash geometry,
the exact-k-min contract of the threshold-prefiltered sketch build, sketch
mergeability, estimator accuracy bounds, and degenerate inputs.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gc_spark.operators.kmv import kmv_estimate, kmv_set_ops, kmv_sketch


def sha60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


class TestKmvSketch:
    def test_exact_kmin_contract(self, spark):
        # The sketch must hold EXACTLY the k smallest distinct hashes,
        # regardless of the internal approx-threshold prefilter.
        items = [f"url-{i}" for i in range(500)] * 2  # dups collapse
        df = spark.createDataFrame([("g", it) for it in items], "g string, item string")
        [row] = kmv_sketch(df, "item", ["g"], k=32).collect()
        expect = sorted(sha60(it) for it in set(items))[:32]
        assert row["kmv"] == expect

    def test_small_set_keeps_everything(self, spark):
        df = spark.createDataFrame(
            [("g", f"u{i}") for i in range(5)], "g string, item string"
        )
        [row] = kmv_sketch(df, "item", ["g"], k=64).collect()
        assert sorted(row["kmv"]) == sorted(sha60(f"u{i}") for i in range(5))
        [est] = kmv_estimate(
            kmv_sketch(df, "item", ["g"], k=64), k=64
        ).collect()
        assert est["est_distinct"] == 5  # exact regime

    def test_estimate_accuracy(self, spark):
        n = 5000
        df = spark.createDataFrame(
            [("g", f"doc-{i}") for i in range(n)], "g string, item string"
        )
        [est] = kmv_estimate(
            kmv_sketch(df, "item", ["g"], k=256), k=256
        ).collect()
        assert est["n_retained"] == 256
        assert abs(est["est_distinct"] - n) / n < 0.20

    def test_multi_group_independence(self, spark):
        rows = [("a", f"x{i}") for i in range(200)] + [
            ("b", f"y{i}") for i in range(3)
        ]
        df = spark.createDataFrame(rows, "g string, item string")
        got = {r["g"]: r["kmv"] for r in kmv_sketch(df, "item", ["g"], k=16).collect()}
        assert got["a"] == sorted(sha60(f"x{i}") for i in range(200))[:16]
        assert sorted(got["b"]) == sorted(sha60(f"y{i}") for i in range(3))


class TestKmvSetOps:
    def _sk(self, spark, name, items, k=64):
        df = spark.createDataFrame(
            [("g", it) for it in items], "g string, item string"
        )
        return kmv_sketch(df, "item", ["g"], k=k)

    def test_exact_regime_is_exact(self, spark):
        a = self._sk(spark, "a", [f"u{i}" for i in range(20)])
        b = self._sk(spark, "b", [f"u{i}" for i in range(10, 25)])
        [row] = kmv_set_ops(a, b, ["g"], k=64).collect()
        assert row["n_eff"] == 25  # union fits under k -> exact counts
        assert row["est_union"] == 25
        assert row["est_intersect"] == 10
        assert row["est_a_only"] == 10

    def test_disjoint_sets(self, spark):
        a = self._sk(spark, "a", [f"a{i}" for i in range(30)])
        b = self._sk(spark, "b", [f"b{i}" for i in range(30)])
        [row] = kmv_set_ops(a, b, ["g"], k=64).collect()
        assert row["est_intersect"] == 0
        assert row["est_a_only"] == 30
        assert row["est_union"] == 60

    def test_subset_estimates(self, spark):
        big = [f"d{i}" for i in range(2000)]
        a = self._sk(spark, "a", big, k=128)
        b = self._sk(spark, "b", big[:1000], k=128)
        [row] = kmv_set_ops(a, b, ["g"], k=128).collect()
        assert abs(row["est_union"] - 2000) / 2000 < 0.25
        assert abs(row["est_intersect"] - 1000) / 1000 < 0.30
        # A \ B + intersection sample counts partition the union sample.
        assert row["n_eff"] == 128

    def test_sketch_union_equals_union_sketch(self, spark):
        # k-min(A union B) == k smallest of (kmv_A union kmv_B) when both
        # inputs are exact k-mins — the mergeability law the set ops rely on.
        ia = [f"m{i}" for i in range(300)]
        ib = [f"m{i}" for i in range(150, 450)]
        a = self._sk(spark, "a", ia, k=48)
        b = self._sk(spark, "b", ib, k=48)
        [row] = kmv_set_ops(a, b, ["g"], k=48).collect()
        truth = sorted(sha60(x) for x in set(ia) | set(ib))[:48]
        est_direct = round(47.0 / (truth[-1] / float(2**60)))
        assert row["est_union"] == est_direct


from gc_spark.operators.ddsketch import (  # noqa: E402
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantiles,
)


class TestDdsketch:
    ALPHA = 0.02

    def _vals(self, n=4000):
        # Deterministic long-tailed positives (log-uniform-ish).
        return [((i * 2654435761) % 999983) / 100.0 + 0.01 for i in range(n)]

    def test_relative_error_guarantee(self, spark):
        vals = self._vals()
        df = spark.createDataFrame([("g", v) for v in vals], "g string, x double")
        sk = ddsketch_build(df, "x", ["g"], alpha=self.ALPHA)
        got = ddsketch_quantiles(sk, ["g"], [0.5, 0.9, 0.99], alpha=self.ALPHA).collect()
        assert len(got) == 3
        srt = sorted(vals)
        import math

        for row in got:
            rnk = max(1, math.ceil(row["q"] * len(vals)))
            exact = srt[rnk - 1]
            assert abs(row["est_q"] - exact) / exact <= self.ALPHA + 1e-9

    def test_merge_equals_direct_build(self, spark):
        vals = self._vals(1000)
        rows = [("g", v, i % 3) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, x double, shard int")
        direct = ddsketch_build(df, "x", ["g"], alpha=self.ALPHA)
        shards = [
            ddsketch_build(df.where(F.col("shard") == s), "x", ["g"], alpha=self.ALPHA)
            for s in range(3)
        ]
        merged = ddsketch_merge(ddsketch_merge(shards[0], shards[1], ["g"]), shards[2], ["g"])
        d = {(r["g"], r["bucket"]): r["cnt"] for r in direct.collect()}
        m = {(r["g"], r["bucket"]): r["cnt"] for r in merged.collect()}
        assert d == m

    def test_single_value_midpoint(self, spark):
        df = spark.createDataFrame([("g", 123.45)] * 7, "g string, x double")
        sk = ddsketch_build(df, "x", ["g"], alpha=self.ALPHA)
        [row] = ddsketch_quantiles(sk, ["g"], [0.5], alpha=self.ALPHA).collect()
        assert row["n"] == 7
        assert abs(row["est_q"] - 123.45) / 123.45 <= self.ALPHA

    def test_nonpositive_excluded(self, spark):
        df = spark.createDataFrame(
            [("g", -1.0), ("g", 0.0), ("g", 10.0)], "g string, x double"
        )
        sk = ddsketch_build(df, "x", ["g"], alpha=self.ALPHA)
        assert sk.agg(F.sum("cnt")).collect()[0][0] == 1


from gc_spark.operators.bloomjoin import (  # noqa: E402
    bloom_bits,
    bloom_prune,
    bloom_prune_join_stats,
)


class TestBloomJoin:
    def test_no_false_negatives(self, spark):
        # Every build-side member MUST pass the bloom.
        members = [f"m{i}" for i in range(300)]
        build = spark.createDataFrame([(x,) for x in members], "key string")
        bits = bloom_bits(build, "key", m=2048, k=2)
        got = bloom_prune(build, bits, "key", m=2048, k=2).collect()
        assert all(r["bloom_pass"] for r in got)

    def test_positions_match_reference_kernel(self, spark):
        build = spark.createDataFrame([("abc",)], "key string")
        [row] = bloom_bits(build, "key", m=97, k=2).agg(
            F.sort_array(F.collect_list("pos")).alias("p")
        ).collect()
        expect = sorted(
            sha60(f"rf{i}|abc") % 97 for i in range(2)
        )
        assert row["p"] == expect

    def test_nonmembers_mostly_pruned(self, spark):
        members = [f"m{i}" for i in range(200)]
        outsiders = [f"x{i}" for i in range(2000)]
        build = spark.createDataFrame([(x,) for x in members], "key string")
        probe = spark.createDataFrame(
            [("g", x) for x in outsiders], "g string, key string"
        )
        bits = bloom_bits(build, "key", m=16384, k=2)
        passed = (
            bloom_prune(probe, bits, "key", m=16384, k=2)
            .where("bloom_pass")
            .count()
        )
        # load ~ 400/16384 -> FPR ~ (1-e^-0.0244)^2 ~ 0.06%; allow slack.
        assert passed < 40

    def test_stats_contract(self, spark):
        probe = spark.createDataFrame(
            [("g", f"k{i % 50}") for i in range(500)], "g string, key string"
        )
        build = spark.createDataFrame(
            [(f"k{i}",) for i in range(0, 50, 2)], "key string"
        )
        [row] = bloom_prune_join_stats(probe, build, "key", ["g"], m=64, k=2).collect()
        assert row["n_probe"] == 500
        assert row["n_match"] == 250  # even residues: half the probe rows
        assert row["n_pass_bloom"] >= row["n_match"]  # no false negatives
        assert row["n_false_pos"] == row["n_pass_bloom"] - row["n_match"]


from gc_spark.operators.markov import (  # noqa: E402
    transition_counts,
    transition_model,
)


class TestMarkovTransitions:
    def _log(self, spark, seqs):
        # seqs: {session: [host, host, ...]} visited in order.
        rows = [
            (s, i, h) for s, hosts in seqs.items() for i, h in enumerate(hosts)
        ]
        return spark.createDataFrame(rows, "sess string, t int, host string")

    def test_hand_counted_transitions(self, spark):
        log = self._log(spark, {"s1": ["a", "b", "a", "b"], "s2": ["a", "b", "c"]})
        got = {
            (r["src"], r["dst"]): r["n_trans"]
            for r in transition_counts(log, "sess", ["t"], "host").collect()
        }
        assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    def test_no_cross_session_bleed(self, spark):
        # Last host of s1 must not chain into first host of s2.
        log = self._log(spark, {"s1": ["a", "x"], "s2": ["y", "b"]})
        got = {
            (r["src"], r["dst"])
            for r in transition_counts(log, "sess", ["t"], "host").collect()
        }
        assert ("x", "y") not in got
        assert got == {("a", "x"), ("y", "b")}

    def test_probabilities_normalize_and_rank(self, spark):
        log = self._log(spark, {"s": ["a", "b", "a", "b", "a", "c", "a", "c", "a", "a"]})
        counts = transition_counts(log, "sess", ["t"], "host")
        rows = transition_model(counts, top_n=3).collect()
        a_rows = sorted(
            [r for r in rows if r["src"] == "a"], key=lambda r: r["rnk"]
        )
        # From 'a': b x2, c x2, a x1 -> ties (b,c) break lexically.
        assert [(r["dst"], r["n_trans"]) for r in a_rows] == [
            ("b", 2),
            ("c", 2),
            ("a", 1),
        ]
        assert sum(r["p"] for r in a_rows) == pytest.approx(1.0, abs=1e-6)

    def test_top_n_cut(self, spark):
        log = self._log(spark, {"s": ["a"] + list("bcdefg")})
        # 'a' has one outgoing; every letter chains once.
        counts = transition_counts(log, "sess", ["t"], "host")
        rows = transition_model(counts, top_n=1).collect()
        assert all(r["rnk"] == 1 for r in rows)
        assert len(rows) == 6

    def test_singleton_sessions_yield_nothing(self, spark):
        log = self._log(spark, {"s1": ["a"], "s2": ["b"]})
        assert transition_counts(log, "sess", ["t"], "host").count() == 0


from gc_spark.operators.goodturing import good_turing  # noqa: E402
from gc_spark.operators.setcover import greedy_set_cover  # noqa: E402


class TestGoodTuring:
    def test_hand_computed_table(self, spark):
        # counts: a=1, b=1, c=2, d=3 -> N=7, N1=2, N2=1, N3=1.
        items = ["a", "b", "c", "c", "d", "d", "d"]
        df = spark.createDataFrame([(x,) for x in items], "item string")
        rows = {r["r"]: r for r in good_turing(df, "item").collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1]["n_r"] == 2
        assert rows[1]["r_star"] == pytest.approx(2 * 1 / 2)  # (1+1)*N2/N1
        assert rows[1]["mass"] == pytest.approx(round(2 / 7, 6))
        assert rows[2]["r_star"] == pytest.approx(3 * 1 / 1)
        assert rows[3]["r_star"] is None  # nothing seen 4 times
        assert all(
            r["p_unseen"] == pytest.approx(round(2 / 7, 6))
            for r in rows.values()
        )

    def test_no_singletons_means_zero_unseen_mass(self, spark):
        df = spark.createDataFrame(
            [(x,) for x in ["a", "a", "b", "b"]], "item string"
        )
        rows = good_turing(df, "item").collect()
        assert all(r["p_unseen"] == 0.0 for r in rows)

    def test_max_r_cut(self, spark):
        df = spark.createDataFrame(
            [("hot",)] * 50 + [("cold",)], "item string"
        )
        rows = good_turing(df, "item", max_r=6).collect()
        assert {r["r"] for r in rows} == {1}  # the 50-count row is cut


class TestGreedySetCover:
    def _m(self, spark, sets):
        rows = [(s, e) for s, elems in sets.items() for e in elems]
        return spark.createDataFrame(rows, "src string, doc int")

    def test_greedy_sequence(self, spark):
        m = self._m(
            spark,
            {"A": [1, 2, 3, 4, 5], "B": [4, 5, 6, 7, 8], "C": [8, 9]},
        )
        rows = greedy_set_cover(m, "src", "doc", k=3).orderBy("pick").collect()
        assert [(r["pick"], r["chosen_set"], r["gain"]) for r in rows] == [
            (1, "A", 5),
            (2, "B", 3),  # 6,7,8 newly covered
            (3, "C", 1),  # only 9 left
        ]
        assert rows[-1]["cum_covered"] == 9

    def test_tie_breaks_lexically(self, spark):
        m = self._m(spark, {"zz": [1, 2], "aa": [3, 4]})
        rows = greedy_set_cover(m, "src", "doc", k=1).collect()
        assert rows[0]["chosen_set"] == "aa"

    def test_early_stop_when_covered(self, spark):
        m = self._m(spark, {"A": [1, 2, 3], "B": [1, 2]})
        rows = greedy_set_cover(m, "src", "doc", k=5).orderBy("pick").collect()
        assert len(rows) == 1  # B adds nothing after A
        assert rows[0]["chosen_set"] == "A"

    def test_duplicate_membership_collapses(self, spark):
        m = self._m(spark, {"A": [1, 1, 1, 2], "B": [3, 4, 5]})
        rows = greedy_set_cover(m, "src", "doc", k=1).collect()
        assert rows[0]["chosen_set"] == "B"  # 3 distinct beats 2 distinct


class TestStreamingDdsketch:
    def test_matches_batch_across_restart(self, spark, tmp_path):
        """Two AvailableNow runs with a checkpoint restart between them:
        the final emitted quantiles must equal the batch DDSketch over the
        union of both waves — the bucket histogram survives."""
        from gc_spark.operators.ddsketch import ddsketch_build, ddsketch_quantiles
        from gc_spark.streaming.state import streaming_ddsketch

        schema = "host string, bytes double"
        wave1 = [("h", ((i * 37) % 997) / 10.0 + 0.5) for i in range(200)]
        wave2 = [("h", ((i * 61) % 997) / 10.0 + 0.5) for i in range(200)]

        src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_ddsketch(stream, "bytes", alpha=0.01)
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
            r["q"]: r["est_q"]
            for r in spark.read.parquet(out).where("n = 400").collect()
        }
        both = spark.createDataFrame(wave1 + wave2, schema).withColumn(
            "g", F.lit("h")
        )
        sk = ddsketch_build(both, "bytes", ["g"], alpha=0.01)
        batch = {
            r["q"]: r["est_q"]
            for r in ddsketch_quantiles(
                sk, ["g"], [0.5, 0.9, 0.99], alpha=0.01
            ).collect()
        }
        assert streamed == batch
        assert len(streamed) == 3
