"""Unit tests for the round-3d operators: DUST URL-rule learning, soft-404
template detection, DSIR importance weights, link-farm reciprocity, and
product quantization."""

from pyspark.sql import functions as F


class TestDustRules:
    def test_session_param_strippable_content_param_not(self, spark):
        from gc_spark.operators.dust import learn_param_rules

        # page drives content; sid never does. Two independent multi-value
        # groups per param so min_groups=2 is satisfiable.
        rows = []
        for path in ("/a", "/b"):
            for page in (0, 1):
                for sid in (0, 1, 2):
                    rows.append(
                        (
                            "h1",
                            path,
                            f"page={page}&sid={sid}",
                            f"content-{path}-{page}",
                        )
                    )
        df = spark.createDataFrame(
            rows, "host string, path string, query string, fp string"
        )
        got = {
            (r["host"], r["param"]): r
            for r in learn_param_rules(df, min_groups=2).collect()
        }
        sid = got[("h1", "sid")]
        assert sid["strippable"] and sid["violations"] == 0
        # 2 paths x 2 pages = 4 groups where sid varied
        assert sid["groups_multi"] == 4
        page = got[("h1", "page")]
        assert not page["strippable"] and page["violations"] == page["groups_multi"]

    def test_insufficient_support_is_not_trusted(self, spark):
        from gc_spark.operators.dust import learn_param_rules

        df = spark.createDataFrame(
            [
                ("h1", "/a", "sid=1", "c"),
                ("h1", "/a", "sid=2", "c"),
            ],
            "host string, path string, query string, fp string",
        )
        [r] = learn_param_rules(df, min_groups=2).collect()
        assert r["groups_multi"] == 1 and not r["strippable"]

    def test_single_value_groups_carry_no_evidence(self, spark):
        from gc_spark.operators.dust import learn_param_rules

        # sid never varies within a group -> no multi-value groups -> no row
        df = spark.createDataFrame(
            [("h1", "/a", "sid=1", "c1"), ("h1", "/b", "sid=1", "c2")],
            "host string, path string, query string, fp string",
        )
        assert learn_param_rules(df).count() == 0


class TestSoft404:
    def test_template_share_threshold(self, spark):
        from gc_spark.operators.soft404 import template_pages

        rows = [("h1", f"u{i}", "ERR" if i % 2 == 0 else f"b{i}") for i in range(20)]
        rows += [("h2", f"u{i}", f"b{i}") for i in range(20)]
        df = spark.createDataFrame(rows, "host string, url string, fp string")
        out = template_pages(df, min_share=0.1, min_count=5).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["host"], r["fp"], r["n_urls"], r["is_template"]) == (
            "h1",
            "ERR",
            10,
            True,
        )
        assert abs(r["share"] - 0.5) < 1e-9

    def test_small_clusters_not_flagged(self, spark):
        from gc_spark.operators.soft404 import template_pages

        rows = [("h1", f"u{i}", "DUP" if i < 3 else f"b{i}") for i in range(100)]
        df = spark.createDataFrame(rows, "host string, url string, fp string")
        [r] = template_pages(df, min_share=0.1, min_count=5).collect()
        assert r["fp"] == "DUP" and not r["is_template"]  # share 3% < 10%


class TestDsir:
    def test_target_like_docs_score_higher(self, spark):
        from gc_spark.operators.dsir import importance_weights

        # target vocabulary is disjoint from the noise vocabulary, so a
        # target-voc doc must outscore a noise-voc doc.
        docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma alpha beta"),
                (1, "alpha beta gamma beta alpha"),
                (2, "zz yy xx ww vv"),
                (3, "zz zz yy yy xx"),
            ],
            "doc_id long, text string",
        )
        target = docs.filter(F.col("doc_id") < 2)
        got = {
            r["doc_id"]: r["weight"]
            for r in importance_weights(docs, target, buckets=64).collect()
        }
        assert got[0] > got[2] and got[1] > got[3]
        assert got[0] > 0 > got[2]

    def test_counts_include_bigrams(self, spark):
        from gc_spark.operators.dsir import importance_weights

        docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        [r] = importance_weights(docs, docs, buckets=16).collect()
        # 3 unigrams + 2 bigrams
        assert r["n_feats"] == 5
        # target == raw -> every ratio is exactly 1 -> weight 0
        assert r["weight"] == 0.0


class TestLinkFarms:
    def test_clique_flagged_chain_not(self, spark):
        from gc_spark.operators.linkspam import reciprocity_stats

        farm = [
            (f"f{a}", f"f{b}") for a in range(6) for b in range(6) if a != b
        ]
        chain = [(f"c{i}", f"c{i+1}") for i in range(10)]
        df = spark.createDataFrame(farm + chain, "src string, dst string")
        got = {r["host"]: r for r in reciprocity_stats(df).collect()}
        for a in range(6):
            r = got[f"f{a}"]
            assert r["is_farm"] and r["ratio"] == 1.0 and r["out_degree"] == 5
        for i in range(10):
            r = got[f"c{i}"]
            assert not r["is_farm"] and r["reciprocal"] == 0

    def test_self_loops_and_dup_edges_ignored(self, spark):
        from gc_spark.operators.linkspam import reciprocity_stats

        df = spark.createDataFrame(
            [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a")],
            "src string, dst string",
        )
        got = {r["host"]: r for r in reciprocity_stats(df).collect()}
        assert got["a"]["out_degree"] == 1 and got["a"]["reciprocal"] == 1
        assert got["b"]["out_degree"] == 1 and got["b"]["reciprocal"] == 1


class TestPq:
    def test_codebook_members_reconstruct_exactly(self, spark):
        from gc_spark.operators.pq import pq_assign

        # 4 vectors, dim 4, m=2, k=4: every vector IS a codeword, so each
        # reconstructs itself with zero error and codes matching its rank.
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 1.0]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r for r in pq_assign(df, dim=4, m=2, k=4).collect()}
        assert all(out[i]["mse"] == 0.0 for i in range(4))
        assert out[0]["codes"] == "0:0-1:0"
        # first half [0,0] ties codes 2 and 3 at distance 0 -> min code 2
        assert out[3]["codes"] == "0:2-1:3"

    def test_non_codeword_assigned_to_nearest(self, spark):
        from gc_spark.operators.pq import pq_assign

        vecs = [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [9.0, 9.5]),  # not in codebook (k=2): nearest is code 1
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r for r in pq_assign(df, dim=2, m=1, k=2).collect()}
        assert out[2]["codes"] == "0:1"
        assert abs(out[2]["mse"] - (1.0 + 0.25) / 2.0) < 1e-6


class TestSourceKl:
    def test_identical_sources_have_zero_kl(self, spark):
        from gc_spark.operators.lm import source_kl

        docs = spark.createDataFrame(
            [("s1", "a b c"), ("s2", "a b c")], "source string, text string"
        )
        got = {r["source"]: r for r in source_kl(docs).collect()}
        assert got["s1"]["kl"] == 0.0 and got["s2"]["kl"] == 0.0
        assert got["s1"]["n_tokens"] == 3

    def test_divergent_source_scores_higher(self, spark):
        from gc_spark.operators.lm import source_kl

        docs = spark.createDataFrame(
            [("bal", "a b"), ("bal", "c d"), ("skew", "a a a a")],
            "source string, text string",
        )
        got = {r["source"]: r["kl"] for r in source_kl(docs).collect()}
        assert got["skew"] > got["bal"] > 0


class TestOovRate:
    def test_rare_terms_fall_out_of_vocab(self, spark):
        from gc_spark.operators.vocab import oov_rate

        docs = spark.createDataFrame(
            [(0, "hot hot hot cold"), (1, "hot hot rare1 rare2")],
            "doc_id long, text string",
        )
        # V=2 keeps {hot, cold} (count desc, term asc: hot=5, cold=1 ties
        # with rare1/rare2 at 1 -> cold wins lexically)
        got = {r["doc_id"]: r for r in oov_rate(docs, v=2).collect()}
        assert got[0]["oov"] == 0
        assert got[1]["oov"] == 2 and abs(got[1]["oov_rate"] - 0.5) < 1e-9

    def test_tie_break_is_lexical(self, spark):
        from gc_spark.operators.vocab import top_vocabulary

        docs = spark.createDataFrame(
            [(0, "bb aa cc")], "doc_id long, text string"
        )
        terms = [r["term"] for r in top_vocabulary(docs, 2).collect()]
        assert sorted(terms) == ["aa", "bb"]


class TestTriangles:
    def test_triangle_with_tail(self, spark):
        from gc_spark.operators.triangles import triangle_stats

        # triangle a-b-c plus a tail c-d (degree order exercises orientation)
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
            "src string, dst string",
        )
        got = {r["host"]: r for r in triangle_stats(df).collect()}
        assert got["a"]["triangles"] == 1 and got["a"]["coeff"] == 1.0
        assert got["c"]["triangles"] == 1
        # c has degree 3: coeff = 2*1/(3*2) = 1/3
        assert abs(got["c"]["coeff"] - 1.0 / 3.0) < 1e-5
        assert got["d"]["triangles"] == 0 and got["d"]["coeff"] == 0.0

    def test_k4_counts_and_duplicate_reversed_edges(self, spark):
        from gc_spark.operators.triangles import triangle_stats

        hosts = ["w", "x", "y", "z"]
        edges = [
            (a, b) for a in hosts for b in hosts if a != b
        ]  # both directions + implied dups -> one K4
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["host"]: r for r in triangle_stats(df).collect()}
        for h in hosts:
            assert got[h]["degree"] == 3
            assert got[h]["triangles"] == 3  # C(3,2)
            assert got[h]["coeff"] == 1.0


class TestWindowChunks:
    def test_overlap_and_tail(self, spark):
        from gc_spark.operators.chunking import window_chunks

        docs = spark.createDataFrame(
            [(0, " ".join(f"t{i}" for i in range(7)))],
            "doc_id long, text string",
        )
        out = sorted(
            window_chunks(docs, window=4, stride=3).collect(),
            key=lambda r: r["chunk_idx"],
        )
        # starts 1, 4, 7: windows t0-t3, t3-t6, t6 (short tail)
        assert [(r["start_token"], r["n_tokens"]) for r in out] == [
            (1, 4),
            (4, 4),
            (7, 1),
        ]

    def test_short_doc_single_chunk(self, spark):
        from gc_spark.operators.chunking import window_chunks

        docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        [r] = window_chunks(docs, window=50, stride=25).collect()
        assert (r["chunk_idx"], r["start_token"], r["n_tokens"]) == (0, 1, 2)

    def test_identical_windows_share_fingerprint(self, spark):
        from gc_spark.operators.chunking import window_chunks

        docs = spark.createDataFrame(
            [(0, "x y z"), (1, "x y z")], "doc_id long, text string"
        )
        fps = [r["chunk_fp"] for r in window_chunks(docs, 50, 25).collect()]
        assert len(fps) == 2 and fps[0] == fps[1]


class TestTemperatureSample:
    def test_alpha_upsamples_small_groups(self, spark):
        from gc_spark.operators.sampling import temperature_sample

        rows = [(i, "big") for i in range(900)] + [
            (1000 + i, "small") for i in range(100)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = temperature_sample(df, target=500, alpha=0.3).collect()
        probs = {r["source"]: r["keep_prob"] for r in out}
        # alpha=0.3: small group's keep PROBABILITY must exceed big's
        assert probs["small"] > probs["big"]
        # and the draw is deterministic: same call, same rows
        again = temperature_sample(df, target=500, alpha=0.3).collect()
        assert sorted(r["doc_id"] for r in out) == sorted(
            r["doc_id"] for r in again
        )

    def test_alpha_one_is_proportional(self, spark):
        from gc_spark.operators.sampling import temperature_sample

        rows = [(i, "a") for i in range(400)] + [
            (1000 + i, "b") for i in range(100)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        probs = {
            r["source"]: r["keep_prob"]
            for r in temperature_sample(df, target=100, alpha=1.0).collect()
        }
        # alpha=1 -> keep_prob identical across groups (target/N)
        assert abs(probs["a"] - probs["b"]) < 1e-9
        assert abs(probs["a"] - 0.2) < 1e-9


class TestKcore:
    def test_clique_survives_chain_peels(self, spark):
        from gc_spark.operators.kcore import kcore_peel

        k4 = [(f"k{a}", f"k{b}") for a in range(4) for b in range(4) if a < b]
        chain = [(f"c{i}", f"c{i+1}") for i in range(6)]
        df = spark.createDataFrame(k4 + chain, "src string, dst string")
        got = {r["host"]: r["degree"] for r in kcore_peel(df, k=3, rounds=4).collect()}
        assert got == {f"k{a}": 3 for a in range(4)}

    def test_cascade_needs_multiple_rounds(self, spark):
        from gc_spark.operators.kcore import kcore_peel

        # k3 clique with a pendant path: peeling the path tip raises new
        # below-k vertices round by round
        k3 = [("a", "b"), ("b", "c"), ("a", "c")]
        tail = [("c", "d"), ("d", "e")]
        df = spark.createDataFrame(k3 + tail, "src string, dst string")
        one = {r["host"] for r in kcore_peel(df, k=2, rounds=1).collect()}
        assert "e" not in one and "d" in one  # only the tip fell in round 1
        two = {r["host"] for r in kcore_peel(df, k=2, rounds=2).collect()}
        assert two == {"a", "b", "c"}

    def test_empty_core(self, spark):
        from gc_spark.operators.kcore import kcore_peel

        df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
        assert kcore_peel(df, k=5, rounds=2).count() == 0


def _mk_spans(spark, rows):
    """rows: (doc_id, [(kind, text, media_ref, offset), ...])"""
    from gc_spark.operators.spans import SPAN_ARRAY_T

    return spark.createDataFrame(rows, f"doc_id long, spans {SPAN_ARRAY_T}")


class TestTruncateSpans:
    def test_boundary_span_cut_midway(self, spark):
        from gc_spark.operators.spans import truncate_spans

        df = _mk_spans(
            spark,
            [
                (
                    0,
                    [
                        ("text", "abcdef", None, 0),
                        ("media", None, "blob://m1", 1),
                        ("text", "ghijkl", None, 2),
                        ("media", None, "blob://m2", 3),
                    ],
                )
            ],
        )
        [r] = truncate_spans(df, char_budget=8).collect()
        # abcdef (6) + media (budget left) + gh (2, cut) -> budget gone,
        # trailing media dropped
        assert (r["n_spans"], r["n_chars"], r["truncated"]) == (3, 8, True)

    def test_media_with_zero_budget_dropped(self, spark):
        from gc_spark.operators.spans import truncate_spans

        df = _mk_spans(
            spark,
            [(0, [("text", "abcd", None, 0), ("media", None, "m", 1)])],
        )
        [r] = truncate_spans(df, char_budget=4).collect()
        assert (r["n_spans"], r["n_chars"], r["truncated"]) == (1, 4, False)
        # truncated is False: total text fits exactly; only the media fell

    def test_under_budget_is_identity_fingerprint(self, spark):
        from gc_spark.operators.spans import (
            span_sequence_fingerprint,
            truncate_spans,
        )

        spans = [
            ("text", "hello", None, 0),
            ("media", None, "blob://x", 1),
            ("text", "world", None, 2),
        ]
        df = _mk_spans(spark, [(0, spans)])
        [t] = truncate_spans(df, char_budget=100).collect()
        [f] = span_sequence_fingerprint(df).collect()
        assert not t["truncated"] and t["span_seq_sha"] == f["span_seq_sha"]


class TestCaptionCandidates:
    def test_adjacent_text_is_caption_gap_is_not(self, spark):
        from gc_spark.operators.spans import caption_candidates

        df = _mk_spans(
            spark,
            [
                (
                    0,
                    [
                        ("media", None, "m0", 0),
                        ("text", "a caption here", None, 1),
                        ("media", None, "m1", 2),
                        ("media", None, "m2", 3),
                        ("text", "tail", None, 5),  # offset gap: not adjacent
                    ],
                )
            ],
        )
        got = {r["media_ref"]: r["caption"] for r in caption_candidates(df).collect()}
        assert got["m0"] == "a caption here"
        assert got["m1"] is None  # followed by media
        assert got["m2"] is None  # offset 4 missing -> not adjacent


class TestFairness:
    def test_even_vs_monopolized(self, spark):
        from gc_spark.operators.politeness import fairness_index

        rows = [("even", f"h{i % 4}") for i in range(40)]
        rows += [("hot", "h0")] * 37 + [("hot", "h1"), ("hot", "h2"), ("hot", "h3")]
        df = spark.createDataFrame(rows, "event_type string, host string")
        got = {r["event_type"]: r for r in fairness_index(df, "event_type").collect()}
        assert got["even"]["jain"] == 1.0 and got["even"]["n_hosts"] == 4
        # J = (40^2)/(4*(37^2+3)) = 1600/5488
        assert abs(got["hot"]["jain"] - 1600.0 / 5488.0) < 1e-5


class TestPseudonyms:
    def test_same_email_same_pseudonym_across_docs(self, spark):
        from gc_spark.functions.text import EMAIL_PATTERN
        from gc_spark.operators.pseudonym import apply_pseudonyms, pseudonym_map

        docs = spark.createDataFrame(
            [
                (0, "write to a@x.mil and b@y.mil today"),
                (1, "a@x.mil replied"),
                (2, "nothing here"),
            ],
            "doc_id long, text string",
        )
        m = {r["pii"]: r for r in pseudonym_map(docs, EMAIL_PATTERN).collect()}
        assert m["a@x.mil"]["n_docs"] == 2 and m["a@x.mil"]["first_doc"] == 0
        assert m["b@y.mil"]["n_docs"] == 1
        assert m["a@x.mil"]["pseudonym"] != m["b@y.mil"]["pseudonym"]
        assert m["a@x.mil"]["pseudonym"].endswith("@anon.invalid")

        rewritten = {
            r["doc_id"]: r["text"]
            for r in apply_pseudonyms(docs, EMAIL_PATTERN).collect()
        }
        assert "a@x.mil" not in rewritten[0] and "b@y.mil" not in rewritten[0]
        # consistency: doc 0 and doc 1 carry the SAME pseudonym for a@x.mil
        p = m["a@x.mil"]["pseudonym"]
        assert p in rewritten[0] and p in rewritten[1]
        assert rewritten[2] == "nothing here"

    def test_substring_identifier_does_not_corrupt_superstring(self, spark):
        # b@c.mil is a literal substring of ab@c.mil: replacing the shorter
        # first would leave "a" + pseudonym(b@c.mil) in doc 0, leaking the
        # "a" prefix and mislinking the pseudonym. Longest-first fold keeps
        # each match intact.
        from gc_spark.functions.text import EMAIL_PATTERN
        from gc_spark.operators.pseudonym import apply_pseudonyms, pseudonym_map

        docs = spark.createDataFrame(
            [(0, "contact ab@c.mil or b@c.mil now")],
            "doc_id long, text string",
        )
        m = {r["pii"]: r["pseudonym"] for r in pseudonym_map(docs, EMAIL_PATTERN).collect()}
        out = apply_pseudonyms(docs, EMAIL_PATTERN).collect()[0]["text"]
        assert m["ab@c.mil"] in out and m["b@c.mil"] in out
        # the long match must NOT have been rewritten as "a" + short pseudonym
        assert "a" + m["b@c.mil"] + " or" not in out
        assert "ab@c.mil" not in out and " b@c.mil" not in out

    def test_salt_rotation_unlinks(self, spark):
        from gc_spark.functions.text import EMAIL_PATTERN
        from gc_spark.operators.pseudonym import pseudonym_map

        docs = spark.createDataFrame(
            [(0, "a@x.mil")], "doc_id long, text string"
        )
        p1 = pseudonym_map(docs, EMAIL_PATTERN, salt="s1").collect()[0]["pseudonym"]
        p2 = pseudonym_map(docs, EMAIL_PATTERN, salt="s2").collect()[0]["pseudonym"]
        assert p1 != p2


class TestShardManifest:
    def test_partition_of_corpus_and_determinism(self, spark):
        from gc_spark.operators.sharding import shard_manifest

        docs = spark.createDataFrame(
            [(i, "w " * (i % 5 + 1)) for i in range(200)],
            "doc_id long, text string",
        )
        a = shard_manifest(docs, n_shards=8).collect()
        assert sum(r["n_docs"] for r in a) == 200
        assert {r["shard"] for r in a} <= set(range(8))
        b = {r["shard"]: r["manifest_sha"] for r in shard_manifest(docs, 8).collect()}
        assert all(b[r["shard"]] == r["manifest_sha"] for r in a)

    def test_manifest_detects_membership_change(self, spark):
        from gc_spark.operators.sharding import shard_manifest

        docs = spark.createDataFrame(
            [(i, "hello world") for i in range(50)], "doc_id long, text string"
        )
        full = {r["shard"]: r["manifest_sha"] for r in shard_manifest(docs, 4).collect()}
        dropped = {
            r["shard"]: r["manifest_sha"]
            for r in shard_manifest(docs.filter("doc_id <> 7"), 4).collect()
        }
        assert full != dropped  # exactly the shard holding doc 7 changed
        assert sum(full[s] != dropped.get(s) for s in full) == 1


class TestDelayCompliance:
    def test_violation_and_compliance(self, spark):
        from gc_spark.operators.politeness import delay_compliance

        rows = [
            # hA: gaps 2.0, 2.0 with delay 1.5 -> compliant
            ("hA", "2024-01-01 00:00:00", 1, 1.5),
            ("hA", "2024-01-01 00:00:02", 2, 1.5),
            ("hA", "2024-01-01 00:00:04", 3, 1.5),
            # hB: gap 0.5 with delay 1.0 -> one violation
            ("hB", "2024-01-01 00:00:00", 4, 1.0),
            ("hB", "2024-01-01 00:00:00.5", 5, 1.0),
            # hC: single fetch -> trivially compliant, null min_gap
            ("hC", "2024-01-01 00:00:00", 6, 1.0),
        ]
        df = spark.createDataFrame(
            rows, "host string, ts string, event_id long, crawl_delay double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {r["host"]: r for r in delay_compliance(df).collect()}
        assert got["hA"]["compliant"] and got["hA"]["min_gap"] == 2.0
        assert not got["hB"]["compliant"] and got["hB"]["violations"] == 1
        assert got["hC"]["compliant"] and got["hC"]["min_gap"] is None


class TestWeightedSample:
    def test_weights_bias_selection_and_exact_k(self, spark):
        from gc_spark.operators.sampling import weighted_sample_wor

        # 100 heavy rows (w=1000) + 900 light (w=1): heavy rows must
        # dominate the top-50 sample
        rows = [(i, 1000) for i in range(100)] + [
            (i, 1) for i in range(100, 1000)
        ]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = weighted_sample_wor(df, k=50, weight_col="w").collect()
        assert len(got) == 50
        heavy = sum(1 for r in got if r["doc_id"] < 100)
        assert heavy > 40

    def test_zero_and_null_weights_never_win_and_never_throw(self, spark):
        # ANSI mode throws DIVIDE_BY_ZERO on ln(u)/0 — zero-weight rows
        # (e.g. empty documents with n_chars=0) must get a null key
        # instead, and nulls sort last so they can never be sampled
        from gc_spark.operators.sampling import weighted_sample_wor

        rows = [(i, 1) for i in range(20)] + [(100, 0), (101, None)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = weighted_sample_wor(df, k=20, weight_col="w").collect()
        ids = {r["doc_id"] for r in got}
        assert len(got) == 20 and 100 not in ids and 101 not in ids

    def test_deterministic_and_salt_sensitive(self, spark):
        from gc_spark.operators.sampling import weighted_sample_wor

        df = spark.createDataFrame(
            [(i, i % 7 + 1) for i in range(500)], "doc_id long, w long"
        )
        a = sorted(r["doc_id"] for r in weighted_sample_wor(df, 20, "w").collect())
        b = sorted(r["doc_id"] for r in weighted_sample_wor(df, 20, "w").collect())
        c = sorted(
            r["doc_id"]
            for r in weighted_sample_wor(df, 20, "w", salt="other").collect()
        )
        assert a == b and a != c


class TestSizeAnomalies:
    def test_planted_outlier_flags(self, spark):
        from gc_spark.operators.anomaly import size_anomalies

        rows = [("h1", f"u{i}", 100.0 + (i % 5)) for i in range(50)]
        rows.append(("h1", "big", 50000.0))
        df = spark.createDataFrame(rows, "host string, url string, size double")
        got = {r["id"]: r for r in size_anomalies(df).collect()}
        assert got["big"]["is_anomaly"]
        assert sum(1 for r in got.values() if r["is_anomaly"]) == 1

    def test_mad_zero_host_flags_any_deviation(self, spark):
        from gc_spark.operators.anomaly import size_anomalies

        rows = [("h1", f"u{i}", 100.0) for i in range(9)] + [("h1", "odd", 101.0)]
        df = spark.createDataFrame(rows, "host string, url string, size double")
        got = {r["id"]: r for r in size_anomalies(df).collect()}
        # median 100, MAD 0: the lone deviating row flags, z is null
        assert got["odd"]["is_anomaly"] and got["odd"]["z"] is None
        assert not got["u0"]["is_anomaly"]


class TestRevisionSimilarity:
    def test_identical_append_and_rewrite(self, spark):
        from gc_spark.operators.snapshot_diff import revision_similarity

        old = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta"),
                (1, "one two three four five six seven"),
                (2, "foo bar baz qux"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta"),  # identical
                (1, "one two three four five six seven extra tail"),  # append
                (2, "completely different words entirely now"),  # rewrite
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in revision_similarity(old, new).collect()}
        assert got[0]["jaccard"] == 1.0 and got[0]["change_class"] == "minor"
        assert 0.5 <= got[1]["jaccard"] < 1.0 and got[1]["change_class"] == "minor"
        assert got[2]["jaccard"] == 0.0 and got[2]["change_class"] == "rewrite"

    def test_short_docs_no_shingles_count_as_unchanged(self, spark):
        from gc_spark.operators.snapshot_diff import revision_similarity

        old = spark.createDataFrame([(0, "hi")], "doc_id long, text string")
        new = spark.createDataFrame([(0, "yo")], "doc_id long, text string")
        [r] = revision_similarity(old, new).collect()
        # neither side has a 2+-token shingle: union 0 -> jaccard defined 1.0
        assert r["jaccard"] == 1.0


class TestVocabGrowth:
    def test_monotone_and_totals(self, spark):
        from gc_spark.operators.vocab import vocab_growth

        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} shared token") for i in range(40)],
            "doc_id long, text string",
        )
        [r] = vocab_growth(docs, n=1).collect()
        assert r["vocab_25"] <= r["vocab_50"] <= r["vocab_75"] <= r["vocab_100"]
        assert r["vocab_100"] == 43  # w0..w40 + shared + token
        assert r["n_tokens"] == 160

    def test_ngram_grain(self, spark):
        from gc_spark.operators.vocab import vocab_growth

        docs = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b c d")], "doc_id long, text string"
        )
        [r] = vocab_growth(docs, n=3).collect()
        assert r["vocab_100"] == 2  # 'a b c', 'b c d'


class TestRetryBackoff:
    def test_growth_cap_jitter_and_giveup(self, spark):
        from gc_spark.operators.eta import retry_backoff

        rows = [("uA", 0), ("uA2", 1), ("uB", 10), ("uC", 5), ("uD", 2)]
        df = spark.createDataFrame(rows, "url string, attempts int")
        got = {r["url"]: r for r in retry_backoff(df).collect()}
        # jittered into [0.5x, 1.0x) of the raw backoff
        assert 0.5 <= got["uA"]["backoff_sec"] < 1.0
        assert 1.0 <= got["uA2"]["backoff_sec"] < 2.0
        # capped at 60 before jitter
        assert got["uB"]["backoff_sec"] < 60.0 and got["uB"]["backoff_sec"] >= 30.0
        assert got["uB"]["give_up"] and got["uC"]["give_up"]
        assert not got["uD"]["give_up"]

    def test_deterministic_per_url(self, spark):
        from gc_spark.operators.eta import retry_backoff

        df = spark.createDataFrame([("u1", 3)], "url string, attempts int")
        a = retry_backoff(df).collect()[0]["backoff_sec"]
        b = retry_backoff(df).collect()[0]["backoff_sec"]
        assert a == b
