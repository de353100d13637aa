"""Hypothesis property tests for the round-3d operators: DUST rule
learning, span budget truncation, weighted sampling, and k-core peeling —
each checked against a brute-force Python model on arbitrary inputs."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from gc_spark.operators.spans import SPAN_ARRAY_T


@pytest.fixture(scope="module")
def spark_lazy(spark):
    return spark


span_lists = st.lists(
    st.tuples(
        st.booleans(),  # is_media
        st.text(alphabet="ab ", min_size=0, max_size=6),  # text payload
    ),
    min_size=1,
    max_size=10,
)


class TestTruncateSpansProperty:
    @settings(max_examples=12, deadline=None)
    @given(span_lists, st.integers(1, 20))
    def test_matches_sequential_model(self, spark_lazy, items, budget):
        from gc_spark.operators.spans import truncate_spans

        spans = []
        for off, (is_media, text) in enumerate(items):
            if is_media:
                spans.append(("media", None, f"blob://{off}", off))
            else:
                spans.append(("text", text, None, off))
        df = spark_lazy.createDataFrame(
            [(0, spans)], f"doc_id long, spans {SPAN_ARRAY_T}"
        )
        [r] = truncate_spans(df, char_budget=budget).collect()

        # sequential reference model
        rem, n_spans, n_chars, total = budget, 0, 0, 0
        for kind, text, _m, _off in spans:
            if kind == "text":
                total += len(text)
            if rem <= 0:
                continue
            n_spans += 1
            if kind == "text":
                take = min(len(text), rem)
                n_chars += take
                rem -= take
        assert r["n_spans"] == n_spans
        assert r["n_chars"] == n_chars
        assert r["truncated"] == (total > budget)


class TestDustProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 2)),
            min_size=2,
            max_size=30,
        )
    )
    def test_content_independent_param_never_violates(self, spark_lazy, combos):
        """fp depends only on (path, page) — 'sid' must never record a
        violation, and 'page' violates exactly in groups where it varies
        with >1 fp."""
        from gc_spark.operators.dust import learn_param_rules

        rows = [
            ("h", f"/p{path}", f"page={page}&sid={sid}", f"c-{path}-{page}")
            for path, page, sid in combos
        ]
        df = spark_lazy.createDataFrame(
            rows, "host string, path string, query string, fp string"
        )
        got = {r["param"]: r for r in learn_param_rules(df, min_groups=1).collect()}
        if "sid" in got:
            assert got["sid"]["violations"] == 0 and got["sid"]["strippable"]
        if "page" in got:
            # page value determines fp within a (path, sid) group, so every
            # multi-value group has >1 fp -> all groups violate
            assert got["page"]["violations"] == got["page"]["groups_multi"]
            assert not got["page"]["strippable"]


class TestWeightedSampleProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(1, 50), min_size=1, max_size=40),
        st.integers(1, 10),
    )
    def test_matches_bruteforce_race(self, spark_lazy, weights, k):
        from gc_spark.operators.sampling import (
            sample_hash_col,
            weighted_sample_wor,
        )

        rows = [(i, w) for i, w in enumerate(weights)]
        df = spark_lazy.createDataFrame(rows, "doc_id long, w long")
        got = sorted(
            r["doc_id"] for r in weighted_sample_wor(df, k, "w").collect()
        )

        # brute-force: same deterministic u and key, python-side
        import hashlib

        def u(i):
            h = hashlib.sha256(f"es|{i}".encode()).hexdigest()
            return ((int(h[:15], 16) % 1000000) + 0.5) / 1000000.0

        keys = sorted(
            ((math.log(u(i)) / w, -i) for i, w in rows), reverse=True
        )
        expect = sorted(-neg for _k, neg in keys[: min(k, len(rows))])
        assert got == expect
        assert len(got) == min(k, len(rows))


class TestKcoreProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=40,
        ),
        st.integers(1, 4),
    )
    def test_matches_sequential_peeling(self, spark_lazy, pairs, k):
        from gc_spark.operators.kcore import kcore_peel

        edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        if not edges:
            return
        df = spark_lazy.createDataFrame(
            [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
        )
        rounds = 6  # enough to converge on <=10 vertices
        got = {
            r["host"]: r["degree"]
            for r in kcore_peel(df, k=k, rounds=rounds).collect()
        }

        # sequential peeling to fixpoint
        e = set(edges)
        for _ in range(rounds):
            deg: dict = {}
            for a, b in e:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {v for v, d in deg.items() if d >= k}
            e = {(a, b) for a, b in e if a in keep and b in keep}
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        assert got == {f"n{v}": d for v, d in deg.items()}
