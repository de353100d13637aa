"""Round-5c operators: IR ranking-quality metrics (MRR/NDCG/recall@k).

Pins the hand-computable geometry the DuckDB oracle can't isolate: exact
metric values on a tiny labelled run, the zero-relevant convention, the
cutoff semantics (rank k+1 hits don't count, but they do count toward
recall's denominator via qrels), and ideal-DCG saturation when n_rel > k.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gc_spark.operators.ir_eval import ir_metrics


def _frames(spark, run_rows, qrel_rows):
    run = spark.createDataFrame(run_rows, "qid string, doc_id string, rank int")
    qrels = spark.createDataFrame(qrel_rows, "qid string, doc_id string, rel int")
    return run, qrels


class TestIrMetrics:
    def test_hand_computed_values(self, spark):
        # q1: hits at ranks 2 and 4 of 3 relevant docs.
        run, qrels = _frames(
            spark,
            [("q1", f"d{r}", r) for r in range(1, 6)],
            [("q1", "d2", 1), ("q1", "d4", 1), ("q1", "d9", 1)],
        )
        [row] = ir_metrics(run, qrels, k=10).collect()
        assert row["n_rel"] == 3
        assert row["mrr"] == pytest.approx(0.5, abs=1e-6)
        dcg = 1 / math.log2(3) + 1 / math.log2(5)
        idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert row["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
        assert row["recall"] == pytest.approx(2 / 3, abs=1e-6)

    def test_no_relevant_scores_zero(self, spark):
        run, qrels = _frames(
            spark,
            [("q1", "d1", 1), ("q1", "d2", 2)],
            [("q1", "d1", 0)],  # graded 0 → not relevant
        )
        [row] = ir_metrics(run, qrels, k=10).collect()
        assert (row["n_rel"], row["mrr"], row["ndcg"], row["recall"]) == (
            0,
            0.0,
            0.0,
            0.0,
        )

    def test_cutoff_excludes_deep_hits(self, spark):
        # Only relevant doc sits at rank 3; with k=2 nothing counts.
        run, qrels = _frames(
            spark,
            [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3)],
            [("q1", "d3", 1)],
        )
        [row] = ir_metrics(run, qrels, k=2).collect()
        assert row["n_rel"] == 1
        assert row["mrr"] == 0.0 and row["ndcg"] == 0.0 and row["recall"] == 0.0

    def test_ideal_dcg_saturates_at_k(self, spark):
        # 5 relevant docs, k=3, all top-3 are hits → perfect NDCG@3,
        # recall still counts the full 5-doc denominator.
        run, qrels = _frames(
            spark,
            [("q1", f"d{r}", r) for r in range(1, 4)],
            [("q1", f"d{r}", 1) for r in range(1, 6)],
        )
        [row] = ir_metrics(run, qrels, k=3).collect()
        assert row["ndcg"] == pytest.approx(1.0, abs=1e-6)
        assert row["recall"] == pytest.approx(3 / 5, abs=1e-6)
        assert row["mrr"] == pytest.approx(1.0, abs=1e-6)

    def test_multi_query_independent(self, spark):
        run, qrels = _frames(
            spark,
            [("q1", "a", 1), ("q2", "b", 1), ("q2", "c", 2)],
            [("q1", "a", 1), ("q2", "c", 1)],
        )
        out = {r["qid"]: r for r in ir_metrics(run, qrels, k=10).collect()}
        assert out["q1"]["mrr"] == pytest.approx(1.0)
        assert out["q2"]["mrr"] == pytest.approx(0.5)

    def test_plan_stays_native(self, spark):
        run, qrels = _frames(spark, [("q1", "a", 1)], [("q1", "a", 1)])
        plan = ir_metrics(run, qrels)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPhraseMatch:
    def _corpus(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_phrase_and_first_pos(self, spark):
        from gc_spark.operators.query_eval import phrase_match

        df = self._corpus(
            spark,
            [
                (1, "the quick brown fox"),
                (2, "quick the quick brown again quick brown"),
                (3, "brown quick"),  # reversed — no match
            ],
        )
        out = {
            r["doc_id"]: r
            for r in phrase_match(df, ["quick", "brown"]).collect()
        }
        assert set(out) == {1, 2}
        assert out[1]["n_occurrences"] == 1 and out[1]["first_pos"] == 1
        assert out[2]["n_occurrences"] == 2 and out[2]["first_pos"] == 2

    def test_overlapping_repeated_terms(self, spark):
        from gc_spark.operators.query_eval import phrase_match

        df = self._corpus(spark, [(1, "a a a b")])
        [row] = phrase_match(df, ["a", "a"]).collect()
        assert row["n_occurrences"] == 2 and row["first_pos"] == 0

    def test_three_term_phrase(self, spark):
        from gc_spark.operators.query_eval import phrase_match

        df = self._corpus(
            spark, [(1, "x one two three y"), (2, "one two x three")]
        )
        rows = phrase_match(df, ["one", "two", "three"]).collect()
        assert [(r["doc_id"], r["first_pos"]) for r in rows] == [(1, 1)]

    def test_plan_stays_native(self, spark):
        from gc_spark.operators.query_eval import phrase_match

        df = self._corpus(spark, [(1, "a b")])
        plan = (
            phrase_match(df, ["a", "b"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestBooleanMatch:
    def test_minimum_should_match(self, spark):
        from gc_spark.operators.query_eval import boolean_match

        df = spark.createDataFrame(
            [
                (1, "m1 m2 s1 s2"),  # both musts, 2 shoulds -> in
                (2, "m1 m2 s1"),  # both musts, 1 should -> out
                (3, "m1 s1 s2 s3"),  # missing a must -> out
            ],
            "doc_id long, text string",
        )
        rows = boolean_match(
            df, must=["m1", "m2"], should=["s1", "s2", "s3"], min_should=2
        ).collect()
        assert [(r["doc_id"], r["n_should"]) for r in rows] == [(1, 2)]

    def test_must_only_vacuous_should(self, spark):
        from gc_spark.operators.query_eval import boolean_match

        df = spark.createDataFrame(
            [(1, "m1 x"), (2, "y")], "doc_id long, text string"
        )
        rows = boolean_match(df, must=["m1"]).collect()
        assert [(r["doc_id"], r["n_should"]) for r in rows] == [(1, 0)]


class TestZorder:
    def test_interleave_known_bits(self, spark):
        from gc_spark.operators.zorder import zvalue_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(3, 1)], "gx long, gy long")
        [row] = df.select(
            zvalue_col([F.col("gx"), F.col("gy")], bits=2).alias("z")
        ).collect()
        # gx=0b11 -> bits at positions 1 and 3; gy=0b01 -> bit at 0.
        assert row["z"] == 0b1011

    def test_grid_clamps_to_range(self, spark):
        from gc_spark.operators.zorder import grid_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(0.0,), (50.0,), (100.0,)], "x double"
        ).crossJoin(
            spark.createDataFrame([(0.0, 100.0)], "mn double, mx double")
        )
        vals = sorted(
            r["g"]
            for r in df.select(
                grid_col(F.col("x"), F.col("mn"), F.col("mx"), 8).alias("g")
            ).collect()
        )
        assert vals[0] == 0 and vals[-1] == 255 and 0 < vals[1] < 255

    def test_skip_effectiveness_overlap_rule(self, spark):
        from gc_spark.operators.zorder import skip_effectiveness

        stats = spark.createDataFrame(
            [
                (0, 0, 10, 0, 10, 100),   # overlaps box
                (1, 90, 99, 90, 99, 100), # disjoint on both dims
                (2, 0, 99, 50, 60, 100),  # x spans, y inside -> hit
            ],
            "file_id long, gx_min long, gx_max long, gy_min long, gy_max long, n_rows long",
        )
        [row] = skip_effectiveness(
            stats, {"gx": (5, 20), "gy": (5, 55)}
        ).collect()
        assert row["n_files"] == 3
        assert row["files_hit"] == 2
        assert row["rows_in_hit_files"] == 200


class TestAimd:
    def _run(self, spark, rows, **kw):
        from gc_spark.operators.aimd import aimd_delays

        df = spark.createDataFrame(rows, "host string, seq long, fail boolean")
        return {
            (r["host"], r["rn"]): r["delay_ms"]
            for r in aimd_delays(df, **kw).collect()
        }

    def test_hand_computed_recurrence(self, spark):
        out = self._run(
            spark,
            [("h", 1, False), ("h", 2, True), ("h", 3, False), ("h", 4, False)],
        )
        # 1000 -S-> 750 -F-> 1500 -S-> 1250 -S-> 1000
        assert out == {
            ("h", 1): 750.0,
            ("h", 2): 1500.0,
            ("h", 3): 1250.0,
            ("h", 4): 1000.0,
        }

    def test_clamps_at_dmin_and_dmax(self, spark):
        out = self._run(
            spark,
            [("h", i, True) for i in range(1, 6)]
            + [("h", i, False) for i in range(6, 12)],
        )
        assert out[("h", 4)] == 8000.0 and out[("h", 5)] == 8000.0  # capped
        assert out[("h", 11)] == 6500.0
        out2 = self._run(spark, [("g", i, False) for i in range(1, 8)])
        assert out2[("g", 5)] == 100.0 and out2[("g", 7)] == 100.0  # floored

    def test_ragged_hosts_independent(self, spark):
        rows = [("a", 1, True), ("b", 1, False), ("b", 2, False), ("b", 3, True)]
        out = self._run(spark, rows)
        assert out[("a", 1)] == 2000.0
        assert out[("b", 3)] == 1000.0  # 1000->750->500->1000
        assert len(out) == 4

    def test_bucketing_does_not_change_result(self, spark):
        rows = [(f"h{i}", j, (i + j) % 3 == 0) for i in range(7) for j in range(1, 6)]
        assert self._run(spark, rows, n_buckets=1) == self._run(
            spark, rows, n_buckets=16
        )


class TestPercolate:
    def _run(self, spark, docs, queries):
        from gc_spark.operators.percolate import percolate

        d = spark.createDataFrame(docs, "doc_id long, text string")
        q = spark.createDataFrame(
            queries, "query_id string, must_terms array<string>"
        )
        return sorted(
            (r["query_id"], r["doc_id"]) for r in percolate(d, q).collect()
        )

    def test_and_semantics(self, spark):
        out = self._run(
            spark,
            [(1, "a b c"), (2, "a c"), (3, "b")],
            [("q1", ["a", "b"]), ("q2", ["c"])],
        )
        assert out == [("q1", 1), ("q2", 1), ("q2", 2)]

    def test_duplicate_terms_count_once(self, spark):
        # query ["a","a"] needs only one occurrence of "a"; doc with one
        # "a" fires, and repeated doc tokens don't double-count either.
        out = self._run(spark, [(1, "a"), (2, "a a")], [("q", ["a", "a"])])
        assert out == [("q", 1), ("q", 2)]

    def test_unmatchable_query_never_fires(self, spark):
        out = self._run(spark, [(1, "a b")], [("q", ["a", "zzz"])])
        assert out == []


class TestFrontCoding:
    def test_exact_sizes(self, spark):
        from gc_spark.operators.frontcode import front_coding_stats

        # sorted: "ab", "abc", "b" -> lcp 0, 2, 0
        df = spark.createDataFrame(
            [("h", "abc"), ("h", "ab"), ("h", "b")], "host string, url string"
        )
        [row] = front_coding_stats(df, overhead_bytes=2).collect()
        assert row["n_urls"] == 3
        assert row["raw_bytes"] == 2 + 3 + 1
        # coded: (2-0+2) + (3-2+2) + (1-0+2) = 4 + 3 + 3
        assert row["coded_bytes"] == 10

    def test_lcp_fold_freezes_at_first_mismatch(self, spark):
        from gc_spark.operators.frontcode import lcp_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("abXab", "abYab"), ("same", "same"), ("", "x"), ("pre", "prefix")],
            "a string, b string",
        )
        vals = [
            r["l"]
            for r in df.select(
                lcp_col(F.col("a"), F.col("b")).alias("l")
            ).collect()
        ]
        assert vals == [2, 4, 0, 3]

    def test_duplicates_collapse_before_coding(self, spark):
        from gc_spark.operators.frontcode import front_coding_stats

        df = spark.createDataFrame(
            [("h", "u1"), ("h", "u1"), ("h", "u2")], "host string, url string"
        )
        [row] = front_coding_stats(df).collect()
        assert row["n_urls"] == 2

    def test_plan_stays_native(self, spark):
        from gc_spark.operators.frontcode import front_coding_stats

        df = spark.createDataFrame([("h", "u")], "host string, url string")
        plan = (
            front_coding_stats(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestAllpairsJaccard:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def _brute(self, texts, t, n=4):
        def sh(s):
            w = s.split()
            return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

        out = []
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                sa, sb = sh(texts[a]), sh(texts[b])
                if not sa or not sb:
                    continue
                j = len(sa & sb) / len(sa | sb)
                if j >= t:
                    out.append((a, b, round(j, 6)))
        return sorted(out)

    def test_matches_brute_force(self, spark):
        from gc_spark.operators.setjoin import allpairs_jaccard

        # deterministic corpus with planted near-dups and decoys
        base = ["w%d" % ((i * 7 + j * 3) % 11) for i in range(40) for j in range(1)]
        texts = []
        for i in range(12):
            words = ["w%d" % ((i * 5 + k) % 9) for k in range(10)]
            texts.append(" ".join(words))
        texts.append(texts[0] + " extra")       # near-dup of doc 0
        texts.append(texts[3])                  # exact dup of doc 3
        texts.append("a b c")                   # too short for 4-shingles
        got = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in allpairs_jaccard(
                self._docs(spark, texts), threshold=0.5
            ).collect()
        )
        assert got == self._brute(texts, 0.5)
        assert len(got) >= 2  # the planted pairs are actually found

    def test_threshold_is_inclusive(self, spark):
        from gc_spark.operators.setjoin import allpairs_jaccard

        # two docs sharing exactly half their shingles: J = 1/3
        a = "t1 t2 t3 t4 x1 x2 x3 x4"  # shingles: 5
        texts = [a, a]  # identical -> J = 1.0
        rows = allpairs_jaccard(
            self._docs(spark, texts), threshold=1.0
        ).collect()
        assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows] == [
            (0, 1, 1.0)
        ]

    def test_short_docs_ignored(self, spark):
        from gc_spark.operators.setjoin import allpairs_jaccard

        rows = allpairs_jaccard(
            self._docs(spark, ["a b c", "a b c"]), threshold=0.5
        ).collect()
        assert rows == []

    def test_shingle_col(self, spark):
        from gc_spark.operators.setjoin import shingle_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("a b c d e",)], "t string")
        [row] = df.select(shingle_col(F.col("t"), 4).alias("s")).collect()
        assert row["s"] == ["a b c d", "b c d e"]


class TestBootstrapCI:
    def _events(self, spark, n=400):
        return spark.createDataFrame(
            [(i, "g%d" % (i % 2), float(10 + (i * 37 % 100) / 10)) for i in range(n)],
            "id long, grp string, v double",
        )

    def test_ci_brackets_mean_and_is_deterministic(self, spark):
        from gc_spark.operators.bootstrap import bootstrap_ci

        df = self._events(spark)
        kw = dict(
            value_col="v", group_cols=["grp"], id_col="id",
            B=50, lo_rank=2, hi_rank=49,
        )
        a = {r["grp"]: r for r in bootstrap_ci(df, **kw).collect()}
        b = {r["grp"]: r for r in bootstrap_ci(df, **kw).collect()}
        assert a.keys() == b.keys() == {"g0", "g1"}
        for g, r in a.items():
            assert r["ci_lo"] < r["mean"] < r["ci_hi"]
            assert r["n"] == 200
            # CI width for n=200 of a bounded variable is modest
            assert r["ci_hi"] - r["ci_lo"] < 2.0
            assert (r["ci_lo"], r["ci_hi"]) == (b[g]["ci_lo"], b[g]["ci_hi"])

    def test_poisson_weights_mean_near_one(self, spark):
        from gc_spark.operators.bootstrap import poisson1_col, uniform01_col
        from pyspark.sql import functions as F

        df = spark.range(5000).select(
            poisson1_col(uniform01_col(F.col("id"), "t")).alias("w")
        )
        [row] = df.agg(
            F.avg("w").alias("m"), F.max("w").alias("mx"), F.min("w").alias("mn")
        ).collect()
        assert abs(row["m"] - 1.0) < 0.05  # E[Poisson(1)] = 1
        assert row["mn"] == 0 and row["mx"] <= 9

    def test_inverse_cdf_boundaries(self, spark):
        from gc_spark.operators.bootstrap import poisson1_col
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(0.1,), (0.5,), (0.9,), (0.99,), (0.999998,)], "u double"
        )
        vals = [r["k"] for r in df.select(poisson1_col(F.col("u")).alias("k")).collect()]
        assert vals == [0, 1, 2, 4, 8]


class TestStreamingAimd:
    def test_matches_batch_across_restart(self, spark, tmp_path):
        """Two AvailableNow runs with a checkpoint restart between them
        must replay the SAME delay trajectory as the batch operator over
        the union of both waves — the recurrence state survives."""
        from gc_spark.operators.aimd import aimd_delays
        from gc_spark.streaming.state import streaming_aimd

        schema = "host string, seq long, fail boolean"
        wave1 = [("h", i, i % 3 == 0) for i in range(1, 21)]
        wave2 = [("h", i, i % 4 == 0) for i in range(21, 41)]

        src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_aimd(stream)
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
            (r["host"], r["rn"]): r["delay_ms"]
            for r in spark.read.parquet(out).collect()
        }
        both = spark.createDataFrame(wave1 + wave2, schema)
        batch = {
            (r["host"], r["rn"]): r["delay_ms"]
            for r in aimd_delays(both).collect()
        }
        assert streamed == batch
        assert len(streamed) == 40


class TestSkyline:
    def _brute(self, pts):
        out = []
        for i, a in enumerate(pts):
            dominated = any(
                all(b[k] >= a[k] for k in range(len(a)))
                and any(b[k] > a[k] for k in range(len(a)))
                for j, b in enumerate(pts)
                if j != i
            )
            if not dominated:
                out.append(a)
        return sorted(out)

    def test_matches_brute_force_3d(self, spark):
        from gc_spark.operators.skyline import skyline

        pts = [
            ((i * 13) % 17, (i * 7) % 11, (i * 5) % 13) for i in range(60)
        ]
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in pts],
            "x double, y double, z double",
        )
        got = sorted(
            (r["x"], r["y"], r["z"])
            for r in skyline(df, ["x", "y", "z"]).collect()
        )
        assert got == self._brute([(float(a), float(b), float(c)) for a, b, c in pts])

    def test_ties_and_duplicates_survive(self, spark):
        from gc_spark.operators.skyline import skyline

        df = spark.createDataFrame(
            [(5.0, 1.0), (5.0, 1.0), (1.0, 5.0), (0.0, 0.0)], "x double, y double"
        )
        got = sorted((r["x"], r["y"]) for r in skyline(df, ["x", "y"]).collect())
        # duplicates don't dominate each other; (0,0) is dominated.
        assert got == [(1.0, 5.0), (5.0, 1.0), (5.0, 1.0)]

    def test_transitive_kill_chain(self, spark):
        from gc_spark.operators.skyline import _prune
        import numpy as np

        # c dominated by b, b dominated by a: only a survives even though
        # b is dead by the time c's direct dominator is processed.
        arr = np.array([[3.0, 3.0], [2.0, 2.0], [1.0, 1.0]])
        assert _prune(arr).tolist() == [True, False, False]

    def test_partitioning_invariant(self, spark):
        from gc_spark.operators.skyline import skyline

        rows = [(float((i * 13) % 29), float((i * 11) % 23)) for i in range(200)]
        df = spark.createDataFrame(rows, "x double, y double")
        one = sorted(map(tuple, skyline(df.coalesce(1), ["x", "y"]).collect()))
        many = sorted(map(tuple, skyline(df.repartition(16), ["x", "y"]).collect()))
        assert one == many and len(one) > 0


class TestEdit1Join:
    def _pairs(self, spark, strings):
        from gc_spark.operators.symspell import edit1_pairs

        df = spark.createDataFrame([(s,) for s in strings], "s string")
        return sorted(
            (r["s_a"], r["s_b"], r["dist"]) for r in edit1_pairs(df).collect()
        )

    def test_all_three_edit_kinds(self, spark):
        got = self._pairs(spark, ["cat", "cats", "bat", "at", "dog"])
        # cat/cats insert, cat/bat substitute, cat/at delete, at/bat insert,
        # at/cats dist 3 no, bat/cats 2 no, bats? not present.
        assert got == [
            ("at", "bat", 1),
            ("at", "cat", 1),
            ("bat", "cat", 1),
            ("cat", "cats", 1),
        ]

    def test_transposition_is_distance_2(self, spark):
        # "ab"/"ba" share deletion variants but levenshtein = 2 -> excluded.
        assert self._pairs(spark, ["ab", "ba"]) == []

    def test_duplicates_collapse(self, spark):
        assert self._pairs(spark, ["xx", "xx", "xy"]) == [("xx", "xy", 1)]

    def test_deletion_variants(self, spark):
        from gc_spark.operators.symspell import deletion_variants
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("abc",), ("aa",)], "s string")
        got = {
            r["s"]: sorted(r["v"])
            for r in df.select(
                "s", deletion_variants(F.col("s")).alias("v")
            ).collect()
        }
        assert got["abc"] == ["ab", "abc", "ac", "bc"]
        assert got["aa"] == ["a", "aa"]  # dedup of the two deletions


class TestMMR:
    def _run(self, spark, rows, k=3, lam=0.7):
        from gc_spark.operators.mmr import mmr_diversify

        df = spark.createDataFrame(
            rows, "qid string, vec_id long, rel double, vec array<double>"
        )
        return [
            (r["rank"], r["vec_id"], r["mmr_score"])
            for r in mmr_diversify(df, k=k, lam=lam)
            .orderBy("qid", "rank")
            .collect()
        ]

    def test_redundant_twin_demoted(self, spark):
        # v2 is a near-copy of v1 with slightly lower rel; v3 is orthogonal
        # with much lower rel. Plain top-2 = (v1, v2); MMR = (v1, v3).
        rows = [
            ("q", 1, 0.90, [1.0, 0.0]),
            ("q", 2, 0.89, [0.999, 0.04]),
            ("q", 3, 0.50, [0.0, 1.0]),
        ]
        got = self._run(spark, rows, k=2, lam=0.5)
        assert [v for _, v, _ in got] == [1, 3]

    def test_negative_similarity_boosts(self, spark):
        # v3 points AWAY from pick1 (sim = -1): its MMR score exceeds
        # lam*rel, so it must beat the orthogonal v2 with equal rel.
        rows = [
            ("q", 1, 0.9, [1.0, 0.0]),
            ("q", 2, 0.5, [0.0, 1.0]),
            ("q", 3, 0.5, [-1.0, 0.0]),
        ]
        got = self._run(spark, rows, k=2, lam=0.7)
        assert [v for _, v, _ in got] == [1, 3]
        # score = 0.7*0.5 - 0.3*(-1.0) = 0.65
        assert got[1][2] == 0.65

    def test_hand_computed_scores(self, spark):
        rows = [
            ("q", 1, 1.0, [1.0, 0.0]),
            ("q", 2, 0.8, [1.0, 0.0]),   # identical direction to 1
            ("q", 3, 0.6, [0.0, 1.0]),
        ]
        got = self._run(spark, rows, k=3, lam=0.7)
        # pick1: 0.7*1.0 = 0.7; pick2: v3 0.7*0.6-0.3*0 = 0.42 beats
        # v2 0.7*0.8-0.3*1 = 0.26; pick3: v2 with maxsim still 1 = 0.26.
        assert got == [(1, 1, 0.7), (2, 3, 0.42), (3, 2, 0.26)]

    def test_k_exceeds_pool(self, spark):
        rows = [("q", 1, 0.5, [1.0, 0.0]), ("q", 2, 0.4, [0.0, 1.0])]
        assert len(self._run(spark, rows, k=10)) == 2
