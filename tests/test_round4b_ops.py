"""Round-4 continuation: fetch-log sessionization and CDC recrawl deltas."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestSessionize:
    def test_gap_opens_new_session(self, spark):
        from gc_spark.operators.sessions import session_stats

        rows = [
            ("a", 0), ("a", 100), ("a", 200),       # visit 1
            ("a", 5000), ("a", 5100),               # visit 2 (gap 4800)
            ("b", 10),                              # single-fetch visit
        ]
        log = spark.createDataFrame(rows, "host string, fetch_ts long")
        got = {
            (r["host"], r["session_seq"]): r
            for r in session_stats(log, gap_sec=1800).collect()
        }
        assert got[("a", 1)]["n_fetches"] == 3
        assert got[("a", 1)]["duration_sec"] == 200
        assert got[("a", 2)]["n_fetches"] == 2
        assert got[("a", 2)]["t_start"] == 5000
        assert got[("b", 1)]["n_fetches"] == 1
        assert got[("b", 1)]["duration_sec"] == 0

    def test_boundary_gap_exactly_cutoff_stays_in_session(self, spark):
        from gc_spark.operators.sessions import session_stats

        log = spark.createDataFrame(
            [("a", 0), ("a", 1800), ("a", 3601)], "host string, fetch_ts long"
        )
        got = session_stats(log, gap_sec=1800).collect()
        # gap == cutoff keeps the session; gap == cutoff+1 opens one
        seqs = sorted((r["session_seq"], r["n_fetches"]) for r in got)
        assert seqs == [(1, 2), (2, 1)]

    def test_tied_timestamps_never_split(self, spark):
        from gc_spark.operators.sessions import session_stats

        log = spark.createDataFrame(
            [("a", 7), ("a", 7), ("a", 7)], "host string, fetch_ts long"
        )
        got = session_stats(log, gap_sec=10).collect()
        assert len(got) == 1 and got[0]["n_fetches"] == 3


class TestCdcDelta:
    def _docs(self, spark, old_text, new_text):
        old = spark.createDataFrame([(1, old_text)], "doc_id long, text string")
        new = spark.createDataFrame([(1, new_text)], "doc_id long, text string")
        return old, new

    def test_unchanged_doc_reuses_everything(self, spark):
        from gc_spark.operators.snapshot_diff import cdc_delta_stats

        t = "the quick brown fox jumps over the lazy dog " * 8
        old, new = self._docs(spark, t, t)
        r = cdc_delta_stats(old, new).collect()[0]
        assert r["new_bytes"] == 0
        assert r["reused_bytes"] == len(t)
        assert r["reuse_frac"] == 1.0
        assert r["n_reused"] == r["n_chunks_new"]

    def test_insertion_rekeys_only_local_chunks(self, spark):
        from gc_spark.operators.snapshot_diff import cdc_delta_stats

        # varied words -> plenty of distinct windows, so cut points exist
        # (a highly repetitive text can legitimately produce one giant chunk)
        t = " ".join(f"w{(i * i) % 9973}" for i in range(400))
        edited = t[:300] + " INSERTED " + t[300:]
        old, new = self._docs(spark, t, edited)
        r = cdc_delta_stats(old, new).collect()[0]
        # most bytes still reused: the insertion touches a bounded
        # neighborhood, not every downstream chunk (the CDC property)
        assert 0 < r["new_bytes"] < len(edited) / 2
        assert r["reused_bytes"] + r["new_bytes"] == len(edited)
        assert 0.5 < r["reuse_frac"] < 1.0

    def test_total_rewrite_reuses_nothing(self, spark):
        from gc_spark.operators.snapshot_diff import cdc_delta_stats

        old, new = self._docs(
            spark,
            "aaaa bbbb cccc dddd eeee ffff gggg hhhh " * 10,
            "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss " * 10,
        )
        r = cdc_delta_stats(old, new).collect()[0]
        assert r["reused_bytes"] == 0 and r["n_reused"] == 0
        assert r["reuse_frac"] == 0.0

    def test_byte_accounting_sums_to_length(self, spark):
        from gc_spark.operators.snapshot_diff import cdc_delta_stats

        t = "lorem ipsum dolor sit amet consectetur " * 12
        edited = t + " tail"
        old, new = self._docs(spark, t, edited)
        r = cdc_delta_stats(old, new).collect()[0]
        assert r["reused_bytes"] + r["new_bytes"] == len(edited)


class TestTrustRank:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def _seeds(self, spark, nodes):
        return spark.createDataFrame([(n,) for n in nodes], "node long")

    def test_unreachable_farm_scores_exactly_zero(self, spark):
        from gc_spark.operators.pagerank import trustrank

        # trusted chain 1->2->3; link farm 10<->11 with no trusted in-path
        e = self._edges(spark, [(1, 2), (2, 3), (10, 11), (11, 10)])
        got = {r["node"]: r["trust"] for r in
               trustrank(e, self._seeds(spark, [1]), iters=4).collect()}
        assert got[10] == 0.0 and got[11] == 0.0
        assert got[1] > 0 and got[2] > 0 and got[3] > 0

    def test_matches_numpy_reference_recurrence(self, spark):
        from gc_spark.operators.pagerank import trustrank

        e = self._edges(spark, [(1, 2), (2, 3), (3, 4)])
        got = {r["node"]: r["trust"] for r in
               trustrank(e, self._seeds(spark, [1]), iters=6).collect()}
        # same recurrence, sequentially: r = 0.15*s + 0.85*(contrib + dang*s)
        s = {1: 1.0, 2: 0.0, 3: 0.0, 4: 0.0}
        r = dict(s)
        for _ in range(6):
            dang = r[4]  # node 4 has no out-edges
            r = {
                v: 0.15 * s[v]
                + 0.85 * ({2: r[1], 3: r[2], 4: r[3]}.get(v, 0.0) + dang * s[v])
                for v in (1, 2, 3, 4)
            }
        for v in (1, 2, 3, 4):
            assert abs(got[v] - r[v]) < 1e-12

    def test_trust_decays_with_distance_at_convergence(self, spark):
        from gc_spark.operators.pagerank import trustrank

        e = self._edges(spark, [(1, 2), (2, 3), (3, 4)])
        got = {r["node"]: r["trust"] for r in
               trustrank(e, self._seeds(spark, [1]), iters=40).collect()}
        # fixed point: t(k+1) = 0.85 * t(k) along the chain
        assert got[1] > got[2] > got[3] > got[4] > 0

    def test_trust_mass_conserved(self, spark):
        from gc_spark.operators.pagerank import trustrank

        e = self._edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1)])
        rows = trustrank(e, self._seeds(spark, [1, 5]), iters=5).collect()
        assert abs(sum(r["trust"] for r in rows) - 1.0) < 1e-9

    def test_empty_seed_set_rejected(self, spark):
        import pytest
        from gc_spark.operators.pagerank import trustrank

        e = self._edges(spark, [(1, 2)])
        with pytest.raises(ValueError):
            trustrank(e, self._seeds(spark, []), iters=1)


class TestModalityMix:
    _SCHEMA = (
        "doc_id long, source string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )

    def test_ledger_numbers(self, spark):
        from gc_spark.operators.spans import modality_mix

        rows = [
            # media-leading doc: 1 media + 2 text spans of 2 tokens each
            (1, "a", [("media", None, "img://1", 0),
                      ("text", "x y", None, 1),
                      ("text", "p q", None, 2)]),
            # text-only doc: 3 tokens
            (2, "a", [("text", "a b c", None, 0)]),
        ]
        df = spark.createDataFrame(rows, self._SCHEMA)
        r = modality_mix(df).collect()[0]
        assert r["n_docs"] == 2
        assert r["text_tokens"] == 7
        assert r["n_media"] == 1
        assert abs(r["media_text_ratio"] - round(1 / 7, 6)) < 1e-9
        assert r["leading_media_frac"] == 0.5

    def test_empty_spans_doc_counts_with_zero_tokens(self, spark):
        from gc_spark.operators.spans import modality_mix

        rows = [(1, "s", []), (2, "s", [("text", "one two", None, 0)])]
        df = spark.createDataFrame(rows, self._SCHEMA)
        r = modality_mix(df).collect()[0]
        assert r["n_docs"] == 2 and r["text_tokens"] == 2
        assert r["leading_media_frac"] == 0.0


def _sha60_py(s: str) -> int:
    import hashlib

    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


class TestCountMinSketch:
    def _toks(self, spark, words):
        return spark.createDataFrame([(w,) for w in words], "term string")

    def test_estimates_match_python_reference_and_overcount_only(self, spark):
        from gc_spark.operators.cms import cms_build, cms_estimate

        words = (["apple"] * 5 + ["pear"] * 3 + ["plum"] * 2
                 + [f"noise{i}" for i in range(40)])
        toks = self._toks(spark, words)
        depth, width = 4, 32  # small width -> collisions on purpose
        sketch = cms_build(toks, depth=depth, width=width)
        truth = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
        got = {r["term"]: r for r in
               cms_estimate(sketch, truth, depth=depth, width=width).collect()}

        # python reference: same counters, same hash kernel
        from collections import Counter

        counters = Counter()
        for w in words:
            for d in range(depth):
                counters[(d, _sha60_py(f"{w}|{d}") % width)] += 1
        for w in set(words):
            ref = min(counters[(d, _sha60_py(f"{w}|{d}") % width)]
                      for d in range(depth))
            assert got[w]["cms_est"] == ref
            assert got[w]["cms_est"] >= got[w]["true_cnt"]

    def test_merge_of_disjoint_halves_equals_whole(self, spark):
        from gc_spark.operators.cms import cms_build, cms_merge

        words = [f"w{i % 7}" for i in range(30)]
        whole = cms_build(self._toks(spark, words), depth=3, width=16)
        merged = cms_merge(
            cms_build(self._toks(spark, words[:13]), depth=3, width=16),
            cms_build(self._toks(spark, words[13:]), depth=3, width=16),
        )
        as_set = lambda df: {(r["row"], r["bucket"], r["cnt"]) for r in df.collect()}  # noqa: E731
        assert as_set(whole) == as_set(merged)


class TestPhashNearDup:
    def _media(self, spark, rows):
        return spark.createDataFrame(rows, "media_id long, phash64 long")

    def test_planted_near_dup_found_with_exact_hamming(self, spark):
        from gc_spark.operators.phash import phash_near_dup_pairs

        base = _sha60_py("imgA")
        rows = [(1, base), (2, base ^ 0b101), (3, _sha60_py("other"))]
        got = phash_near_dup_pairs(self._media(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["id_a"], r["id_b"], r["hamming"]) == (1, 2, 2)

    def test_pair_beyond_threshold_not_emitted(self, spark):
        from gc_spark.operators.phash import phash_near_dup_pairs

        base = _sha60_py("imgB")
        # flip one bit in each of the 4 bands: hamming 4 > max 3, and no
        # band agrees so it is not even a candidate
        far = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
        got = phash_near_dup_pairs(self._media(spark, [(1, base), (2, far)])).collect()
        assert got == []

    def test_exact_dups_hamming_zero(self, spark):
        from gc_spark.operators.phash import phash_near_dup_pairs

        h = _sha60_py("imgC")
        got = phash_near_dup_pairs(self._media(spark, [(7, h), (9, h)])).collect()
        assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(7, 9, 0)]

    def test_band_df_cap_drops_degenerate_buckets(self, spark):
        from gc_spark.operators.phash import phash_near_dup_pairs

        h = _sha60_py("imgD")
        rows = [(i, h) for i in range(1, 4)]  # 3 identical: every band df=3
        got = phash_near_dup_pairs(self._media(spark, rows), max_band_df=2).collect()
        assert got == []  # capped everywhere -> documented recall loss

    def test_threshold_must_respect_pigeonhole(self, spark):
        import pytest
        from gc_spark.operators.phash import phash_near_dup_pairs

        with pytest.raises(ValueError):
            phash_near_dup_pairs(
                self._media(spark, [(1, 1)]), bands=4, max_hamming=4
            )


class TestRedactSpans:
    def test_redacts_inside_text_spans_and_counts(self, spark):
        from gc_spark.operators.spans import redact_spans

        rows = [(1, [("text", "mail bob@example.mil now", None, 0),
                     ("media", None, "img://7", 1),
                     ("text", "call 555-1234 ok", None, 2)])]
        df = spark.createDataFrame(rows, TestModalityMix._SCHEMA.replace(
            "source string, ", ""))
        r = redact_spans(df).collect()[0]
        texts = [s["text"] for s in r["spans"]]
        assert texts[0] == "mail <EMAIL> now"
        assert texts[2] == "call <PHONE> ok"
        assert r["spans"][1]["media_ref"] == "img://7"
        assert r["n_emails"] == 1 and r["n_phones"] == 1
        # structure untouched
        assert [s["offset"] for s in r["spans"]] == [0, 1, 2]

    def test_coalesce_first_catches_boundary_straddling_pii(self, spark):
        from gc_spark.operators.spans import (
            build_interleaved_spans,
            coalesce_text_spans,
            redact_spans,
        )

        # email crosses the 80-char chunk boundary inside one text run
        text = "x" * 75 + " bob@example.mil " + "y" * 100
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        spans = build_interleaved_spans(df)
        raw = redact_spans(spans).collect()[0]
        coalesced = redact_spans(coalesce_text_spans(spans)).collect()[0]
        assert raw["n_emails"] == 0          # split across chunks: missed
        assert coalesced["n_emails"] == 1    # real boundaries only: caught


class TestSpanLanguageProfile:
    _S = ("doc_id long, "
          "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")

    def test_mixed_doc_detected(self, spark):
        from gc_spark.operators.spans import span_language_profile

        rows = [
            (1, [("text", "this is the best of a kind", None, 0),
                 ("media", None, "img://1", 1),
                 ("text", "zzz qqq vvv", None, 2)]),
            (2, [("text", "over the hill and the dale", None, 0)]),
            (3, [("text", "qqq zzz", None, 0)]),
        ]
        got = {r["doc_id"]: r for r in span_language_profile(
            spark.createDataFrame(rows, self._S)).collect()}
        assert got[1]["is_mixed"] == 1 and got[1]["doc_lang"] == "en"
        assert got[1]["en_frac"] == 0.5
        assert got[2]["is_mixed"] == 0 and got[2]["doc_lang"] == "en"
        assert got[3]["is_mixed"] == 0 and got[3]["doc_lang"] == "other"

    def test_media_only_doc_is_other_not_mixed(self, spark):
        from gc_spark.operators.spans import span_language_profile

        rows = [(1, [("media", None, "img://1", 0)])]
        r = span_language_profile(spark.createDataFrame(rows, self._S)).collect()[0]
        assert r["n_text_spans"] == 0 and r["doc_lang"] == "other"
        assert r["is_mixed"] == 0 and r["en_frac"] == 0.0


class TestLogHistogramQuantiles:
    def test_quantiles_are_conservative_upper_bounds(self, spark):
        from gc_spark.operators.qsketch import histogram_quantiles, log2_histogram

        vals = list(range(1, 101))  # 1..100 on one host
        df = spark.createDataFrame([("h", v) for v in vals], "host string, v long")
        hist = log2_histogram(df, value_col="v", group_col="host")
        r = histogram_quantiles(hist).collect()[0]
        import numpy as np

        for p in (50, 95, 99):
            true = np.percentile(vals, p, method="inverted_cdf")
            est = r[f"p{p}_est"]
            assert est >= true            # never understates
            assert est < 2 * true + 1     # within the 2x bucket bound

    def test_merge_then_read_equals_whole_read(self, spark):
        from gc_spark.operators.cms import cms_merge  # noqa: F401 (shape parity)
        from gc_spark.operators.qsketch import histogram_quantiles, log2_histogram

        vals = [(f"h{i % 3}", (i * 37) % 500 + 1) for i in range(300)]
        df = spark.createDataFrame(vals, "host string, v long")
        whole = log2_histogram(df, "v", "host")
        halves = (
            log2_histogram(df.filter("v % 2 = 0"), "v", "host")
            .unionByName(log2_histogram(df.filter("v % 2 = 1"), "v", "host"))
            .groupBy("group", "bucket").agg(F.sum("cnt").alias("cnt"))
        )
        a = {tuple(r) for r in histogram_quantiles(whole).collect()}
        b = {tuple(r) for r in histogram_quantiles(halves).collect()}
        assert a == b

    def test_zero_and_one_share_first_bucket(self, spark):
        from gc_spark.operators.qsketch import log2_histogram

        df = spark.createDataFrame([("h", 0), ("h", 1)], "host string, v long")
        got = log2_histogram(df, "v", "host").collect()
        assert len(got) == 1 and got[0]["bucket"] == 1 and got[0]["cnt"] == 2


class TestEmbeddingDecontam:
    def test_planted_copy_flagged_scaled_copy_too(self, spark):
        from gc_spark.operators.similarity import embedding_decontaminate

        bench = spark.createDataFrame(
            [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        corpus = spark.createDataFrame(
            [
                (1, [2.0, 0.0, 0.0]),    # scaled copy of bench 100
                (2, [0.0, 0.0, 1.0]),    # orthogonal to both
                (3, [0.0, 0.9, 0.1]),    # near bench 200
            ],
            "vec_id long, embedding array<double>",
        )
        got = {r["vec_id"]: r for r in
               embedding_decontaminate(corpus, bench, threshold=0.95).collect()}
        assert got[1]["contaminated"] == 1 and got[1]["bench_id"] == 100
        assert got[1]["cosine"] == 1.0
        assert got[2]["contaminated"] == 0
        assert got[3]["contaminated"] == 1 and got[3]["bench_id"] == 200

    def test_tie_breaks_to_lower_bench_id(self, spark):
        from gc_spark.operators.similarity import embedding_decontaminate

        bench = spark.createDataFrame(
            [(5, [1.0, 0.0]), (3, [1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        r = embedding_decontaminate(corpus, bench).collect()[0]
        assert r["bench_id"] == 3


class TestFailureTriage:
    def test_policy_lattice(self, spark):
        from gc_spark.operators.triage import triage_rollup

        rows = [
            ("h", 200, 0),   # ok
            ("h", 404, 0),   # dead_permanent (never retried)
            ("h", 500, 1),   # retry (backoff 2s)
            ("h", 0, 3),     # retry (network, backoff 8s)
            ("h", 503, 4),   # dead_exhausted (ceiling)
        ]
        df = spark.createDataFrame(rows, "host string, status int, attempts int")
        r = triage_rollup(df, max_attempts=4).collect()[0]
        assert (r["n_ok"], r["n_dead_permanent"], r["n_retry"],
                r["n_dead_exhausted"]) == (1, 1, 2, 1)
        assert r["retry_budget_sec"] == 10.0  # 2 + 8

    def test_backoff_capped(self, spark):
        from gc_spark.operators.triage import triage_rollup

        df = spark.createDataFrame(
            [("h", 500, 9)], "host string, status int, attempts int"
        )
        r = triage_rollup(df, max_attempts=20, cap_sec=60.0).collect()[0]
        assert r["n_retry"] == 1 and r["retry_budget_sec"] == 60.0


class TestRefreshValue:
    def test_important_host_outranks_likelier_change_on_dead_host(self, spark):
        from gc_spark.operators.recrawl import refresh_value

        scored = spark.createDataFrame(
            [(1, 10, 0.9), (2, 20, 0.2)],
            "url_id long, node long, p_changed double",
        )
        ranks = spark.createDataFrame(
            [(10, 0.01), (20, 0.30)], "node long, rank double"
        )
        got = {r["url_id"]: r for r in refresh_value(scored, ranks).collect()}
        # dead blog at p=0.9: 0.01*0.9 = 0.009; hub at p=0.2: 0.3*0.2 = 0.06
        assert got[2]["refresh_value"] > got[1]["refresh_value"]
        assert got[1]["refresh_value"] == 0.009

    def test_unranked_host_scores_zero(self, spark):
        from gc_spark.operators.recrawl import refresh_value

        scored = spark.createDataFrame(
            [(1, 99, 0.8)], "url_id long, node long, p_changed double"
        )
        ranks = spark.createDataFrame([(10, 0.5)], "node long, rank double")
        r = refresh_value(scored, ranks).collect()[0]
        assert r["host_rank"] == 0.0 and r["refresh_value"] == 0.0


class TestWaterfill:
    def _alloc(self, spark, demands, budget):
        from gc_spark.operators.waterfill import waterfill_budgets

        df = spark.createDataFrame(demands, "host string, demand long")
        return {r["host"]: r for r in
                waterfill_budgets(df, total_budget=budget).collect()}

    def test_level_spends_budget_exactly(self, spark):
        got = self._alloc(spark, [("a", 10), ("b", 100), ("c", 100)], 110)
        # a saturates at 10; b and c share (110-10)/2 = 50 each
        assert got["a"]["allocation"] == 10.0 and got["a"]["saturated"] == 1
        assert got["b"]["allocation"] == 50.0 and got["b"]["saturated"] == 0
        assert got["c"]["allocation"] == 50.0
        assert sum(r["allocation"] for r in got.values()) == 110.0

    def test_budget_exceeds_total_demand_gives_everyone_their_demand(self, spark):
        got = self._alloc(spark, [("a", 5), ("b", 7)], 1000)
        assert got["a"]["allocation"] == 5.0 and got["b"]["allocation"] == 7.0
        assert all(r["saturated"] == 1 for r in got.values())

    def test_no_host_exceeds_demand_and_small_hosts_never_starve(self, spark):
        got = self._alloc(spark, [("tiny", 2), ("huge", 10_000)], 100)
        assert got["tiny"]["allocation"] == 2.0      # fully served
        assert got["huge"]["allocation"] == 98.0     # gets ALL the slack
        for r in got.values():
            assert r["allocation"] <= r["demand"]

    def test_jain_fairness_is_one_when_nothing_saturates(self, spark):
        got = self._alloc(spark, [("a", 500), ("b", 600), ("c", 700)], 300)
        allocs = [r["allocation"] for r in got.values()]
        assert len(set(allocs)) == 1  # equal shares == Jain index 1.0
        assert sum(allocs) == 300.0


class TestStreamingSizeHistogram:
    def test_streaming_equals_batch_across_restart(self, spark, tmp_path):
        """Counter-map state must make the final streaming row per host
        equal the batch qsketch answer over the full log, including across
        a restart on the same checkpoint — and arrival ORDER must not
        matter (histograms commute)."""
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )
        from gc_spark.operators.qsketch import histogram_quantiles, log2_histogram
        from gc_spark.streaming.state import streaming_size_histogram

        schema = StructType(
            [StructField("host", StringType()), StructField("sz", LongType())]
        )
        # wave2 delivers the SMALL values last: order-insensitivity probe
        wave1 = [("a", (i * 131) % 5000 + 200) for i in range(60)] + [
            ("b", 9000 + i) for i in range(30)
        ]
        wave2 = [("a", i % 7 + 1) for i in range(40)] + [
            ("b", (i * 17) % 300 + 1) for i in range(20)
        ]

        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_size_histogram(stream)
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

        final = {
            r["host"]: r
            for r in spark.read.parquet(out).orderBy("n").collect()
        }
        batch_df = spark.createDataFrame(wave1 + wave2, schema)
        batch = {
            r["group"]: r
            for r in histogram_quantiles(
                log2_histogram(batch_df, value_col="sz", group_col="host")
            ).collect()
        }
        for h in ("a", "b"):
            assert final[h]["n"] == batch[h]["n"]
            for p in (50, 95, 99):
                assert final[h][f"p{p}_est"] == batch[h][f"p{p}_est"], (h, p)


class TestSessionPlanShape:
    def test_rollup_reuses_window_exchange(self, spark):
        """The (host, session_seq) groupBy must NOT re-shuffle: host hash
        partitioning from the window satisfies the grouping clustering, so
        the whole operator is ONE Exchange and one Sort."""
        from gc_spark.operators.sessions import session_stats

        log = spark.createDataFrame([("a", 1), ("a", 2)], "host string, fetch_ts long")
        plan = session_stats(log)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1
        assert plan.count("Sort") <= 1


class TestApplyBpeMerges:
    def test_learn_then_apply_reproduces_learned_corpus(self, spark):
        from gc_spark.operators.bpe import apply_bpe_merges, learn_bpe_merges

        rows = [(1, "a b a b c d"), (2, "a b a b a b"), (3, "c d c d x")]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        merges = learn_bpe_merges(d, rounds=2).select("round", "w1", "w2")
        got = {r["doc_id"]: r["encoded"]
               for r in apply_bpe_merges(d, merges).collect()}
        # the invariant: applying the learned merges reproduces the learn
        # loop's final corpus byte-exactly (same non-overlapping
        # left-to-right replace semantics, same order)
        import hashlib

        final_sha = (
            learn_bpe_merges(d, rounds=2, audit=True)
            .filter(F.col("round") == 2)
            .collect()[0]["corpus_sha"]
        )
        joined = "\x01".join(got[i] for i in sorted(got))
        assert hashlib.sha256(joined.encode()).hexdigest() == final_sha
        # adjacent repeats merge alternately: the boundary space of a match
        # is consumed, so "a b a b" collapses only its first pair per round
        assert got[1].startswith("a+b a b")
        # non-adjacent repeats merge at every occurrence
        d2 = spark.createDataFrame(
            [(9, "a b x a b y a b")], "doc_id long, text string"
        )
        got2 = apply_bpe_merges(d2, merges).collect()[0]["encoded"]
        assert got2 == "a+b x a+b y a+b"

    def test_merge_order_matters_and_is_respected(self, spark):
        from gc_spark.operators.bpe import apply_bpe_merges

        d = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
        merges = spark.createDataFrame(
            [(1, "x", "y"), (2, "x+y", "z")], "round int, w1 string, w2 string"
        )
        got = apply_bpe_merges(d, merges).collect()[0]["encoded"]
        # round 2's pattern only exists AFTER round 1 applied
        assert got == "x+y+z"


class TestRegistrableDomain:
    def _doms(self, spark, hosts):
        from gc_spark.functions.urls import registrable_domain_col

        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        return {r["host"]: r["d"] for r in df.select(
            "host", registrable_domain_col(F.col("host")).alias("d")).collect()}

    def test_two_label_suffix_beats_one_label(self, spark):
        got = self._doms(spark, [
            "a.cdn.example.co.uk", "b.cdn.example.co.uk", "example.co.uk",
            "deep.sub.example.com",
        ])
        assert got["a.cdn.example.co.uk"] == "example.co.uk"
        assert got["b.cdn.example.co.uk"] == "example.co.uk"
        assert got["example.co.uk"] == "example.co.uk"
        assert got["deep.sub.example.com"] == "example.com"

    def test_bare_suffix_and_unknown_tld_pass_through(self, spark):
        got = self._doms(spark, ["co.uk", "com", "example.internal", "localhost"])
        # a bare public suffix has no registrant: never merged
        assert got["co.uk"] == "co.uk" and got["com"] == "com"
        # unknown TLDs stay whole (conservative)
        assert got["example.internal"] == "example.internal"
        assert got["localhost"] == "localhost"

    def test_case_insensitive(self, spark):
        got = self._doms(spark, ["WWW.Example.COM"])
        assert got["WWW.Example.COM"] == "example.com"


class TestBandwidthWindows:
    def test_windows_and_cap_flag(self, spark):
        from gc_spark.operators.eta import bandwidth_windows

        rows = [
            ("h", 0, 100_000), ("h", 59, 260_000),   # window 0: 6000 B/s
            ("h", 60, 6_000),                        # window 60: 100 B/s
            ("g", 125, 30),                          # window 120
        ]
        df = spark.createDataFrame(rows, "host string, fetch_ts long, nbytes long")
        got = {(r["host"], r["window_start"]): r for r in
               bandwidth_windows(df, cap_bytes_per_sec=5000.0).collect()}
        assert got[("h", 0)]["n_fetches"] == 2
        assert got[("h", 0)]["bytes_per_sec"] == 6000.0
        assert got[("h", 0)]["over_cap"] == 1
        assert got[("h", 60)]["over_cap"] == 0
        assert got[("g", 120)]["total_bytes"] == 30

    def test_windows_merge_across_disjoint_slices(self, spark):
        from gc_spark.operators.eta import bandwidth_windows

        rows = [("h", i, 100) for i in range(0, 120, 10)]
        df = spark.createDataFrame(rows, "host string, fetch_ts long, nbytes long")
        whole = {(r["host"], r["window_start"]): r["total_bytes"]
                 for r in bandwidth_windows(df).collect()}
        halves = (
            bandwidth_windows(df.filter("fetch_ts % 20 = 0"))
            .unionByName(bandwidth_windows(df.filter("fetch_ts % 20 != 0")))
            .groupBy("host", "window_start")
            .agg(F.sum("total_bytes").alias("tb"))
        )
        merged = {(r["host"], r["window_start"]): r["tb"] for r in halves.collect()}
        assert whole == merged


class TestBlobIntegrity:
    def test_three_classes(self, spark):
        from gc_spark.operators.spans import blob_integrity

        spans_rows = [
            (1, [("media", None, "img://a", 0), ("text", "x", None, 1)]),
            (2, [("media", None, "img://a", 0),
                 ("media", None, "img://gone", 1)]),
        ]
        spans_df = spark.createDataFrame(
            spans_rows,
            "doc_id long, "
            "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
        )
        manifest = spark.createDataFrame(
            [("img://a",), ("img://idle",)], "media_ref string"
        )
        got = {r["ref"]: r for r in blob_integrity(spans_df, manifest).collect()}
        assert got["img://a"]["class"] == "ok" and got["img://a"]["n_docs"] == 2
        assert got["img://gone"]["class"] == "orphan_ref"
        assert got["img://idle"]["class"] == "unreferenced"
        assert got["img://idle"]["n_docs"] == 0


class TestBoundedLoadShards:
    def test_cap_bounds_every_shard_and_spills_go_to_second_choice(self, spark):
        from collections import Counter
        from gc_spark.operators.sharding import bounded_load_shards

        keys = spark.createDataFrame(
            [(f"u{i}",) for i in range(200)], "url string"
        )
        got = bounded_load_shards(
            keys, key="url", num_shards=4, cap_per_shard=40, portable=True
        ).collect()
        kept = Counter(r["shard"] for r in got if r["spilled"] == 0)
        assert max(kept.values()) <= 40       # the cap holds for keepers
        assert sum(r["spilled"] for r in got) == 200 - sum(kept.values())
        # spilled keys landed on a DIFFERENT shard than their preference
        # (verified implicitly: keepers alone already fill to cap)

    def test_no_spill_when_cap_is_loose(self, spark):
        from gc_spark.operators.sharding import bounded_load_shards, assign_shards

        keys = spark.createDataFrame([(f"u{i}",) for i in range(50)], "url string")
        bounded = {r["url"]: r for r in bounded_load_shards(
            keys, key="url", num_shards=4, cap_per_shard=1000, portable=True
        ).collect()}
        plain = {r["url"]: r["shard"] for r in assign_shards(
            keys, key="url", num_shards=4, portable=True).collect()}
        # loose cap degenerates to plain rendezvous: identical assignment
        assert all(r["spilled"] == 0 for r in bounded.values())
        assert {u: r["shard"] for u, r in bounded.items()} == plain

    def test_highest_affinity_keys_keep_their_home(self, spark):
        from gc_spark.operators.sharding import bounded_load_shards

        keys = spark.createDataFrame([(f"u{i}",) for i in range(100)], "url string")
        tight = bounded_load_shards(
            keys, key="url", num_shards=2, cap_per_shard=30, portable=True
        ).collect()
        # with 2 shards and cap 30, exactly (n - 60) keys spill
        assert sum(r["spilled"] for r in tight) == 100 - 60

    @staticmethod
    def _brute_force(urls, num_shards, cap):
        """Single-pass reference implementation: global per-shard cumsum in
        (score desc, key asc) order — what the two-phase salted cumsum must
        reproduce exactly."""
        import hashlib
        from collections import defaultdict

        def score(k, s):
            return int(
                hashlib.sha256(f"{k}#{s}".encode()).hexdigest()[:15], 16
            )

        prefs = {}
        for u in urls:
            ranked = sorted(
                ((score(u, s), s) for s in range(num_shards)),
                key=lambda t: (-t[0], t[1]),
            )
            prefs[u] = (ranked[0][1], ranked[0][0], ranked[1][1])
        by_shard = defaultdict(list)
        for u, (p1, s1, _p2) in prefs.items():
            by_shard[p1].append((-s1, u))
        expect = {}
        for p1, rows in by_shard.items():
            rows.sort()
            for i, (_negs, u) in enumerate(rows):
                spilled = i + 1 > cap
                expect[u] = (prefs[u][2] if spilled else p1, int(spilled))
        return expect

    def test_hot_shard_two_phase_cumsum_matches_global_order(self, spark):
        """90% of keys first-prefer ONE shard (the hot-host shape the salted
        cumsum exists for): the two-phase result must equal the global
        single-window semantics key for key — cum_shards buckets are
        order-aligned, so bucketing must not change WHO spills."""
        from gc_spark.operators.sharding import bounded_load_shards

        hot, cold, i = [], [], 0
        while len(hot) < 90 or len(cold) < 10:
            u = f"h{i}"
            i += 1
            ref = self._brute_force([u], 4, 10**9)
            if ref[u][0] == 0 and len(hot) < 90:
                hot.append(u)
            elif ref[u][0] != 0 and len(cold) < 10:
                cold.append(u)
        urls = hot + cold
        cap = 25  # hot shard holds 90 first preferences; 65 must spill
        expect = self._brute_force(urls, 4, cap)
        for cum_shards in (1, 8, 32):
            got = {
                r["url"]: (r["shard"], r["spilled"])
                for r in bounded_load_shards(
                    spark.createDataFrame([(u,) for u in urls], "url string"),
                    key="url",
                    num_shards=4,
                    cap_per_shard=cap,
                    portable=True,
                    cum_shards=cum_shards,
                ).collect()
            }
            assert got == expect, f"cum_shards={cum_shards}"
        spilled_from_hot = sum(
            1 for u in hot if expect[u][1] == 1
        )
        assert spilled_from_hot == 90 - cap  # the hot shard really was hot

    def test_cap_ratio_matches_explicit_cap(self, spark):
        """cap_ratio=(11,10) over n keys must equal cap_per_shard computed
        with the same exact integer arithmetic driver-side."""
        from gc_spark.operators.sharding import bounded_load_shards

        n, shards = 173, 4
        keys = spark.createDataFrame([(f"u{i}",) for i in range(n)], "url string")
        cap = (11 * n + 10 * shards - 1) // (10 * shards)
        a = {
            r["url"]: (r["shard"], r["spilled"])
            for r in bounded_load_shards(
                keys, key="url", num_shards=shards, cap_per_shard=cap,
                portable=True,
            ).collect()
        }
        b = {
            r["url"]: (r["shard"], r["spilled"])
            for r in bounded_load_shards(
                keys, key="url", num_shards=shards, cap_ratio=(11, 10),
                portable=True,
            ).collect()
        }
        assert a == b

    def test_cap_args_validated(self, spark):
        import pytest

        from gc_spark.operators.sharding import bounded_load_shards

        keys = spark.createDataFrame([("u1",)], "url string")
        with pytest.raises(ValueError):
            bounded_load_shards(keys, key="url", num_shards=2)
        with pytest.raises(ValueError):
            bounded_load_shards(
                keys, key="url", num_shards=2, cap_per_shard=1, cap_ratio=(1, 1)
            )
        with pytest.raises(ValueError):
            bounded_load_shards(
                keys, key="url", num_shards=2, cap_per_shard=1, cum_shards=12
            )


class TestEpochShuffle:
    def test_reproducible_within_epoch_resampled_across(self, spark):
        from gc_spark.operators.curriculum import epoch_shuffle_keys

        d = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")

        def order(epoch):
            rows = epoch_shuffle_keys(d, epoch=epoch, num_shards=8).collect()
            return [r["doc_id"] for r in
                    sorted(rows, key=lambda r: (r["shard_rank"], r["doc_rank"]))]

        assert order(1) == order(1)          # reproducible forever
        assert order(1) != order(2)          # fresh resample per epoch

    def test_shard_is_epoch_independent(self, spark):
        from gc_spark.operators.curriculum import epoch_shuffle_keys

        d = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        s1 = {r["doc_id"]: r["shard"] for r in
              epoch_shuffle_keys(d, epoch=1).collect()}
        s2 = {r["doc_id"]: r["shard"] for r in
              epoch_shuffle_keys(d, epoch=9).collect()}
        # data placement never moves across epochs: only the READ order does
        assert s1 == s2


class TestRobotsDiffImpact:
    def test_four_classes(self, spark):
        from gc_spark.operators.robots import parse_robots_rules, robots_diff_impact

        def rules(body):
            return parse_robots_rules(
                spark.createDataFrame([("h", body)], "host string, body string")
            )

        old = rules("User-agent: *\nDisallow: /a/\n")
        new = rules("User-agent: *\nDisallow: /a/\nAllow: /a/ok$\nDisallow: /b/\n")
        urls = spark.createDataFrame(
            [("h", "/a/x"), ("h", "/a/ok"), ("h", "/b/y"), ("h", "/c/z")],
            "host string, path string",
        )
        r = robots_diff_impact(urls, old, new).collect()[0]
        assert r["unchanged_blocked"] == 1   # /a/x
        assert r["newly_allowed"] == 1       # /a/ok (longest-match exception)
        assert r["newly_blocked"] == 1       # /b/y
        assert r["unchanged_allowed"] == 1   # /c/z
        assert r["n_urls"] == 4


class TestStreamingHeavyHitters:
    def test_guarantee_holds_across_restart(self, spark, tmp_path):
        """Any term with frequency > n_seen/(capacity+1) must be in the
        candidate set after every batch, including across a checkpoint
        restart — the MG guarantee is order-independent, so no arrival
        contract is needed."""
        from gc_spark.streaming.state import streaming_heavy_hitters

        schema = "host string, term string"
        wave1 = [("h", "hot")] * 30 + [("h", f"noise{i}") for i in range(60)]
        wave2 = [("h", "hot")] * 20 + [("h", f"late{i}") for i in range(40)]

        src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_heavy_hitters(stream, capacity=8)
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

        rows = sorted(
            spark.read.parquet(out).collect(), key=lambda r: r["n_seen"]
        )
        # after wave 1: hot has 30 of 90 > 90/9=10; after wave 2: 50 of 150
        assert rows[0]["n_seen"] == 90 and "hot" in rows[0]["candidates"]
        assert rows[-1]["n_seen"] == 150 and "hot" in rows[-1]["candidates"]
        assert all(len(r["candidates"]) <= 8 for r in rows)


class TestIncrementalComponents:
    def _cc(self, spark, pairs):
        from gc_spark.operators.text_dedup import connected_components

        return connected_components(
            spark.createDataFrame(pairs, "a long, b long")
        )

    def test_delta_merge_equals_full_recompute(self, spark):
        from gc_spark.operators.text_dedup import (
            connected_components, incremental_components,
        )

        e1 = [(1, 2), (2, 3), (10, 11), (20, 21)]
        e2 = [(3, 10), (11, 12), (30, 31)]  # bridge, extension, new island
        labels = self._cc(spark, e1)
        inc = {r["doc_id"]: r["cluster_id"] for r in incremental_components(
            labels, spark.createDataFrame(e2, "a long, b long")).collect()}
        full = {r["doc_id"]: r["cluster_id"] for r in connected_components(
            spark.createDataFrame(e1 + e2, "a long, b long")).collect()}
        assert inc == full
        assert inc[12] == 1          # bridged through 3-10
        assert inc[30] == 30 and inc[31] == 30   # new island, min label
        assert inc[20] == 20         # untouched cluster keeps its label

    def test_new_node_with_smallest_id_wins_the_label(self, spark):
        from gc_spark.operators.text_dedup import incremental_components

        labels = self._cc(spark, [(5, 6)])
        inc = {r["doc_id"]: r["cluster_id"] for r in incremental_components(
            labels, spark.createDataFrame([(1, 5)], "a long, b long")).collect()}
        assert inc == {1: 1, 5: 1, 6: 1}

    def test_internal_delta_edge_is_noop(self, spark):
        from gc_spark.operators.text_dedup import incremental_components

        labels = self._cc(spark, [(1, 2), (2, 3)])
        inc = {r["doc_id"]: r["cluster_id"] for r in incremental_components(
            labels, spark.createDataFrame([(1, 3)], "a long, b long")).collect()}
        assert inc == {1: 1, 2: 1, 3: 1}


class TestPowerlawAlpha:
    def _alpha(self, spark, degs, d_min=2):
        from gc_spark.operators.linkspam import powerlaw_alpha

        df = spark.createDataFrame([(d,) for d in degs], "deg long")
        return powerlaw_alpha(df, d_min=d_min).collect()[0]

    def test_matches_hill_closed_form(self, spark):
        import math

        degs = [2, 3, 5, 8, 13, 21, 40]
        r = self._alpha(spark, degs)
        s = sum(math.log(d / 2) for d in degs)
        assert r["n_tail"] == 7
        assert abs(r["alpha_hat"] - round(1 + 7 / s, 6)) < 1e-9

    def test_heavy_tail_scores_lower_than_uniform(self, spark):
        heavy = self._alpha(spark, [2, 2, 2, 3, 4, 8, 64, 512])["alpha_hat"]
        flat = self._alpha(spark, [3, 3, 3, 3, 3, 3, 3, 3])["alpha_hat"]
        assert heavy < flat  # manufactured uniformity pushes alpha UP

    def test_degenerate_tail_yields_null_not_infinity(self, spark):
        r = self._alpha(spark, [2, 2, 2])
        assert r["alpha_hat"] is None

    def test_below_dmin_excluded(self, spark):
        r = self._alpha(spark, [1, 1, 1, 2, 4])
        assert r["n_tail"] == 2
