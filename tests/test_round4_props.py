"""Hypothesis property tests for the round-4 operators: Luhn checksum,
two-resource packing, CUSUM closed form, and RRF order-invariance — each
checked against a brute-force Python model on arbitrary inputs."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark_lazy(spark):
    return spark


def _luhn_check_digit(body: str) -> str:
    """Reference model: the digit d making body+d Luhn-valid."""
    total = 0
    for j, ch in enumerate(reversed(body), start=1):
        d = int(ch)
        # with the check digit appended, body digits shift to positions 2..
        if (j + 1) % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return str((10 - total % 10) % 10)


class TestLuhnProperty:
    @settings(max_examples=15, deadline=None)
    @given(st.text(alphabet="0123456789", min_size=12, max_size=18))
    def test_appended_check_digit_validates_and_any_flip_breaks(
        self, spark_lazy, body
    ):
        from gc_spark.operators.luhn import luhn_valid_col

        pan = body + _luhn_check_digit(body)
        flipped = pan[:-1] + str((int(pan[-1]) + 1) % 10)
        df = spark_lazy.createDataFrame([(pan,), (flipped,)], "c string")
        got = {
            r["c"]: r["ok"]
            for r in df.select("c", luhn_valid_col(F.col("c")).alias("ok")).collect()
        }
        assert got[pan] is True
        assert got[flipped] is False


class TestPackMultimodalProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 3)),
            min_size=1,
            max_size=30,
        ),
        st.integers(5, 20),
        st.integers(2, 6),
    )
    def test_bin_start_sums_bounded_and_bins_monotone(
        self, spark_lazy, sizes, bt, bm
    ):
        from gc_spark.operators.packing import pack_multimodal

        rows = [("s", i, t, m) for i, (t, m) in enumerate(sizes)]
        df = spark_lazy.createDataFrame(rows, "stream string, seq long, t long, m long")
        got = sorted(
            pack_multimodal(df, bt, bm, ["stream"], "seq", F.col("t"), F.col("m")).collect(),
            key=lambda r: r["seq"],
        )
        # bins nondecreasing in stream order
        bins = [r["bin"] for r in got]
        assert bins == sorted(bins)
        # within a bin, both floors constant -> start offsets of the bin's
        # docs span < one budget window per resource
        per_bin = {}
        for r in got:
            per_bin.setdefault(r["bin"], []).append(r)
        for rs in per_bin.values():
            toks = [r["tok_off"] for r in rs]
            meds = [r["media_off"] for r in rs]
            assert max(toks) - min(toks) < bt
            assert max(meds) - min(meds) < bm


class TestCusumProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.sampled_from([0.0, 1.0]), min_size=1, max_size=40),
        st.sampled_from([0.125, 0.25, 0.5]),
        st.sampled_from([1.0, 2.0, 3.0]),
    )
    def test_closed_form_equals_recursion(self, spark_lazy, xs, k, h):
        from gc_spark.operators.anomaly import cusum_alarms

        s, ref = 0.0, []
        for x in xs:
            s = max(0.0, s + x - k)
            ref.append(s)
        rows = [("h", i, i, x) for i, x in enumerate(xs)]
        df = spark_lazy.createDataFrame(
            rows, "host string, ts long, event_id long, fail double"
        )
        r = cusum_alarms(df, "fail", k_ref=k, h_threshold=h).collect()[0]
        assert abs(r["max_stat"] - max(ref)) < 1e-9
        assert r["n_alarms"] == sum(1 for v in ref if v >= h)
        first = next((i for i, v in enumerate(ref) if v >= h), None)
        assert r["first_alarm"] == first


class TestRrfProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(0, 30), min_size=1, max_size=10, unique=True),
        st.lists(st.integers(0, 30), min_size=1, max_size=10, unique=True),
    )
    def test_list_order_and_input_order_invariance(self, spark_lazy, ids_a, ids_b):
        from gc_spark.operators.fusion import rrf_fuse

        a = spark_lazy.createDataFrame(
            [(i, r + 1) for r, i in enumerate(ids_a)], "doc_id long, rank int"
        )
        b = spark_lazy.createDataFrame(
            [(i, r + 1) for r, i in enumerate(ids_b)], "doc_id long, rank int"
        )
        ab = [(r["doc_id"], r["rrf_score"]) for r in rrf_fuse([a, b], topk=50).collect()]
        ba = [(r["doc_id"], r["rrf_score"]) for r in rrf_fuse([b, a], topk=50).collect()]
        assert ab == ba
        # model check: score = sum of 1/(60+rank) over lists containing the id
        model = {}
        for ids in (ids_a, ids_b):
            for r, i in enumerate(ids):
                model[i] = model.get(i, 0.0) + 1.0 / (60 + r + 1)
        for doc, score in ab:
            assert abs(score - round(model[doc], 9)) < 1e-9
