"""Unit tests for the round-3c operators: multi-source BFS depth,
byte-range coalescing, shingle containment, n-gram novelty."""

import pytest
from pyspark.sql import functions as F


class TestBfsDepths:
    def test_min_depth_and_cap(self, spark):
        from gc_spark.operators.bfs import bfs_depths

        # 0->1->2->3->4 chain plus a 0->2 shortcut; 10->11 is a separate
        # island with no seed: must stay unreached.
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (10, 11)],
            "src long, dst long",
        )
        seeds = spark.createDataFrame([(0,)], "node long")
        got = {r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 10).collect()}
        assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}

        capped = {
            r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 2).collect()
        }
        assert capped == {0: 0, 1: 1, 2: 1, 3: 2}  # 4 beyond the cap

    def test_multi_source_and_cycle(self, spark):
        from gc_spark.operators.bfs import bfs_depths

        # a cycle 1->2->3->1 must terminate; two seeds claim their sides
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (7, 3)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(1,), (7,)], "node long")
        got = {r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 10).collect()}
        assert got == {1: 0, 7: 0, 2: 1, 3: 1}

    def test_seed_only_no_edges_out(self, spark):
        from gc_spark.operators.bfs import bfs_depths

        edges = spark.createDataFrame([(5, 6)], "src long, dst long")
        seeds = spark.createDataFrame([(99,)], "node long")
        got = bfs_depths(edges, seeds, 3).collect()
        assert [(r["node"], r["depth"]) for r in got] == [(99, 0)]


class TestCoalesceRanges:
    def test_overlap_adjacent_gap(self, spark):
        from gc_spark.operators.ranges import coalesce_ranges

        rows = [
            # key 'a': [0,10) overlaps [5,20); [22,30) within gap=3 of 20;
            # [50,60) separate island
            ("a", 0, 10),
            ("a", 5, 20),
            ("a", 22, 30),
            ("a", 50, 60),
            # key 'b': adjacent-at-gap-0 case is NOT merged when gap=3? it is:
            # start 10 <= 10+3
            ("b", 0, 10),
            ("b", 10, 15),
        ]
        df = spark.createDataFrame(rows, "media_ref string, start long, end long")
        got = sorted(
            (r["media_ref"], r["start"], r["end"], r["n_ranges"])
            for r in coalesce_ranges(df, gap=3).collect()
        )
        assert got == [("a", 0, 30, 3), ("a", 50, 60, 1), ("b", 0, 15, 2)]

    def test_contained_range_absorbed(self, spark):
        from gc_spark.operators.ranges import coalesce_ranges

        # [0,100) fully contains [10,20); running-max (not lag) semantics
        # must keep [30,40) inside the island too
        df = spark.createDataFrame(
            [("x", 0, 100), ("x", 10, 20), ("x", 30, 40), ("x", 150, 160)],
            "media_ref string, start long, end long",
        )
        got = sorted(
            (r["start"], r["end"], r["n_ranges"])
            for r in coalesce_ranges(df, gap=0).collect()
        )
        assert got == [(0, 100, 3), (150, 160, 1)]

    def test_single_shuffle_plan(self, spark):
        """Window partitionBy == groupBy key: the agg must reuse the
        window's Exchange — exactly one shuffle in the plan."""
        from gc_spark.operators.ranges import coalesce_ranges

        df = spark.createDataFrame(
            [("x", 0, 10), ("x", 5, 20)], "media_ref string, start long, end long"
        )
        plan = (
            coalesce_ranges(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1


class TestContainmentPairs:
    def _docs(self, spark):
        big = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        quote = "alpha bravo charlie delta echo"  # prefix of big
        other = "zulu yankee xray whiskey victor uniform tango sierra"
        return spark.createDataFrame(
            [(1, big), (2, quote), (3, other)], "doc_id long, text string"
        )

    def test_asymmetric_containment(self, spark):
        from gc_spark.operators.containment import containment_pairs

        out = containment_pairs(self._docs(spark), threshold=0.9).collect()
        pairs = {(r["a"], r["b"]): r for r in out}
        # quote (3 shingles, all in big) contained in big at 1.0
        assert (2, 1) in pairs
        r = pairs[(2, 1)]
        assert r["containment"] == 1.0 and r["inter"] == 3 and r["size_a"] == 3
        # big is NOT contained in quote (3/8 < 0.9), no other pairs
        assert set(pairs) == {(2, 1)}

    def test_df_cap_drops_boilerplate(self, spark):
        from gc_spark.operators.containment import containment_pairs

        # the same boilerplate shingle in every doc; df_cap=2 removes it
        # from the index so no pair survives
        docs = spark.createDataFrame(
            [
                (1, "click here to download now one"),
                (2, "click here to download now two"),
                (3, "click here to download now three"),
            ],
            "doc_id long, text string",
        )
        capped = containment_pairs(docs, threshold=0.5, df_cap=2).collect()
        assert capped == []
        # without the cap the shared prefix makes every ordered pair pass
        uncapped = containment_pairs(docs, threshold=0.5, df_cap=None).collect()
        assert len(uncapped) == 6


class TestNoveltyScores:
    def test_first_copy_wins(self, spark):
        from gc_spark.operators.novelty import novelty_scores

        a = "one two three four five six seven eight"
        docs = spark.createDataFrame(
            [(1, 10, a), (2, 20, a), (3, 30, "nine ten eleven twelve thirteen")],
            "doc_id long, seq long, text string",
        )
        got = {r["doc_id"]: r for r in novelty_scores(docs, n=5).collect()}
        assert got[1]["novel_frac"] == 1.0  # first occurrence
        assert got[2]["novel_frac"] == 0.0  # exact mirror, later seq
        assert got[3]["novel_frac"] == 1.0  # disjoint content
        assert got[1]["n_grams"] == 4  # 8 tokens -> 4 distinct 5-grams

    def test_partial_overlap(self, spark):
        from gc_spark.operators.novelty import novelty_scores

        first = "a b c d e f"  # 5-grams: "a b c d e", "b c d e f"
        second = "a b c d e x"  # shares "a b c d e", adds "b c d e x"
        docs = spark.createDataFrame(
            [(1, 1, first), (2, 2, second)], "doc_id long, seq long, text string"
        )
        got = {r["doc_id"]: r for r in novelty_scores(docs, n=5).collect()}
        assert got[1]["novel_frac"] == 1.0
        assert got[2]["novel_frac"] == 0.5


class TestRobotsWildcards:
    def test_google_rep_semantics(self, spark):
        from gc_spark.operators.robots import match_robots, parse_robots_rules

        body = (
            "User-agent: *\nDisallow: /private/*\nAllow: /private/*.html$\n"
            "Disallow: /tmp/\nUser-agent: bot\nDisallow: /\n"
        )
        robots = spark.createDataFrame(
            [("h1", body), ("h2", "User-agent: other\nDisallow: /\n")],
            "host string, body string",
        )
        rules = parse_robots_rules(robots)
        # Allow survives the parse; bot-only and other-only groups don't
        got_rules = {(r["host"], r["rule_type"], r["pattern"]) for r in rules.collect()}
        assert got_rules == {
            ("h1", "disallow", "/private/*"),
            ("h1", "allow", "/private/*.html$"),
            ("h1", "disallow", "/tmp/"),
        }
        urls = spark.createDataFrame(
            [
                ("h1", "/private/a.html"),   # allow: longest match wins
                ("h1", "/private/a.htmlx"),  # $ anchor: allow doesn't fire
                ("h1", "/private/a.pdf"),    # disallow wildcard
                ("h1", "/tmp/x"),            # plain prefix disallow
                ("h1", "/pub/x"),            # no match -> allowed
                ("h2", "/anything"),         # no *-group rules -> allowed
                ("h3", "/no/robots"),        # host absent -> allowed
            ],
            "host string, path string",
        )
        got = {
            (r["host"], r["path"]): (r["allowed"], r["matched_pattern"])
            for r in match_robots(urls, rules).collect()
        }
        assert got[("h1", "/private/a.html")] == (True, "/private/*.html$")
        assert got[("h1", "/private/a.htmlx")] == (False, "/private/*")
        assert got[("h1", "/private/a.pdf")] == (False, "/private/*")
        assert got[("h1", "/tmp/x")] == (False, "/tmp/")
        assert got[("h1", "/pub/x")] == (True, None)
        assert got[("h2", "/anything")] == (True, None)
        assert got[("h3", "/no/robots")] == (True, None)

    def test_allow_wins_length_tie(self, spark):
        from gc_spark.operators.robots import match_robots

        rules = spark.createDataFrame(
            [("h", "allow", "/a/bb"), ("h", "disallow", "/a/bb")],
            "host string, rule_type string, pattern string",
        )
        urls = spark.createDataFrame([("h", "/a/bbq")], "host string, path string")
        r = match_robots(urls, rules).collect()[0]
        assert r["allowed"] is True and r["rule_type"] == "allow"

    def test_url_side_broadcast_only(self, spark):
        """The frontier side must reach the verdict through a broadcast
        join — no SortMergeJoin / no shuffle of the URL frame."""
        from gc_spark.operators.robots import match_robots

        rules = spark.createDataFrame(
            [("h", "disallow", "/x*")], "host string, rule_type string, pattern string"
        )
        urls = spark.createDataFrame([("h", "/x1")], "host string, path string")
        plan = (
            match_robots(urls, rules)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


class TestMirrorHosts:
    def test_planted_mirror_and_cap(self, spark):
        from gc_spark.operators.mirrors import mirror_host_pairs

        docs = spark.createDataFrame(
            [
                ("a", "doc one"), ("a", "doc two"), ("a", "shared everywhere"),
                ("b", "doc one"), ("b", "doc two"), ("b", "only b"),
                ("c", "doc three"), ("c", "shared everywhere"),
                ("d", "shared everywhere"),
            ],
            "host string, text string",
        )
        got = {
            (r["host_a"], r["host_b"]): r["shared"]
            for r in mirror_host_pairs(docs, min_shared=2).collect()
        }
        assert got == {("a", "b"): 2}  # only the real mirror pair
        # host_cap=2 drops 'shared everywhere' (on 3 hosts) from the index
        capped = mirror_host_pairs(docs, min_shared=1, host_cap=2).collect()
        assert {(r["host_a"], r["host_b"]) for r in capped} == {("a", "b")}


class TestScheduleEta:
    def test_waves_and_makespan(self, spark):
        from gc_spark.operators.eta import host_makespan, schedule_eta

        fr = spark.createDataFrame(
            [("h", f"u{i}", i, 2.0) for i in range(5)] + [("g", "u9", 0, 1.0)],
            "host string, url string, priority int, crawl_delay double",
        )
        eta = schedule_eta(fr, delay_col="crawl_delay", connections=2)
        got = {r["url"]: (r["wave"], r["eta_sec"]) for r in eta.collect()}
        # h: ranks 1..5 -> waves 0,0,1,1,2 at delay 2
        assert got["u0"] == (0, 0.0) and got["u1"] == (0, 0.0)
        assert got["u2"] == (1, 2.0) and got["u3"] == (1, 2.0)
        assert got["u4"] == (2, 4.0)
        assert got["u9"] == (0, 0.0)
        ms = {r["host"]: (r["n_urls"], r["makespan_sec"]) for r in host_makespan(eta).collect()}
        assert ms == {"h": (5, 4.0), "g": (1, 0.0)}


class TestBigramXent:
    def test_closed_form(self, spark):
        import math

        from gc_spark.operators.lm import interpolated_bigram_xent

        docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
        r = interpolated_bigram_xent(docs).collect()[0]
        # bigrams: "a b"x2 (p=.7*2/2+.3*2/4=.85), "b a" (p=.7*1/2+.3*2/4=.5)
        expect = -(2 * math.log(0.85) + math.log(0.5)) / 3
        assert r["n_bigrams"] == 3
        assert abs(r["xent"] - round(expect, 6)) < 1e-9

    def test_word_salad_scores_worse(self, spark):
        from gc_spark.operators.lm import interpolated_bigram_xent

        fluent = "the cat sat on the mat and the cat sat on the mat again"
        salad = "mat the on cat and sat the mat on again the sat cat the"
        docs = spark.createDataFrame(
            [(1, fluent), (2, fluent), (3, fluent), (4, salad)],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["xent"] for r in interpolated_bigram_xent(docs).collect()}
        assert got[4] > got[1]  # same unigram profile, impossible order

    def test_single_token_doc_dropped(self, spark):
        from gc_spark.operators.lm import interpolated_bigram_xent

        docs = spark.createDataFrame(
            [(1, "hello"), (2, "hello world")], "doc_id long, text string"
        )
        got = {r["doc_id"] for r in interpolated_bigram_xent(docs).collect()}
        assert got == {2}
