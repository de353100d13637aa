"""Property tests for span algebra (operators/spans.py): the span-sequence
equality invariant must survive flatten → shuffle → regroup for ARBITRARY
interleaved sequences, and the fingerprint must be injective on sequences
(up to offset renumbering, which carries order but not identity)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gc_spark.operators.spans import (
    flatten_spans,
    span_sequence_fingerprint,
    spans_from_rows,
)

SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

# a span is text XOR media; payloads include '', '|', '\n' (delimiter abuse)
payload = st.sampled_from(
    # includes payloads that COLLIDE under naive 'kind|text|media' joining
    # (e.g. "x|\ntext|y" vs two spans "x"/"y") — the length-prefixed
    # encoding must keep them distinct
    ["", "a", "b", "x|y", "line\nbreak", "text|", "|media", "x|\ntext|y", "0||0|"]
)
span = st.one_of(
    st.tuples(st.just("text"), payload).map(lambda t: ("text", t[1], None)),
    st.tuples(st.just("media"), payload).map(
        lambda t: ("media", None, f"blob://{t[1]}")
    ),
)
docs = st.lists(
    st.lists(span, min_size=0, max_size=8), min_size=1, max_size=6
)


def _rows(seqs):
    return [
        (f"d{i}", [(k, t, m, off) for off, (k, t, m) in enumerate(sp)])
        for i, sp in enumerate(seqs)
    ]


class TestSpanProperties:
    @settings(max_examples=10, deadline=None)
    @given(docs)
    def test_roundtrip_fingerprint_identity(self, spark_lazy, seqs):
        """fingerprint(regroup(shuffle(flatten(x)))) == fingerprint(x) for
        arbitrary interleavings, including empty docs and hostile payloads."""
        spark = spark_lazy
        df = spark.createDataFrame(_rows(seqs), SCHEMA)
        direct = {
            r["doc_id"]: (r["n_spans"], r["n_media"], r["span_seq_sha"])
            for r in span_sequence_fingerprint(df).collect()
        }
        hostile = flatten_spans(df).orderBy(
            F.col("span_offset").desc(), F.col("kind"), F.col("doc_id").desc()
        )
        # empty-span docs vanish under explode — regroup only ever sees docs
        # with >=1 span, same as the engine (a document IS its spans)
        rt = span_sequence_fingerprint(spans_from_rows(hostile))
        got = {
            r["doc_id"]: (r["n_spans"], r["n_media"], r["span_seq_sha"])
            for r in rt.collect()
        }
        assert got == {k: v for k, v in direct.items() if v[0] > 0}

    @settings(max_examples=10, deadline=None)
    @given(docs)
    def test_fingerprint_equal_iff_sequences_equal(self, spark_lazy, seqs):
        """Across the generated corpus: two docs share a fingerprint iff
        their (kind, text, media_ref) sequences are identical — delimiter
        characters in payloads must not cause collisions."""
        spark = spark_lazy
        df = spark.createDataFrame(_rows(seqs), SCHEMA)
        fps = {
            r["doc_id"]: r["span_seq_sha"]
            for r in span_sequence_fingerprint(df).collect()
        }
        for i, a in enumerate(seqs):
            for j, b in enumerate(seqs):
                same_fp = fps[f"d{i}"] == fps[f"d{j}"]
                assert same_fp == (a == b), (a, b)


@pytest.fixture(scope="module")
def spark_lazy(spark):
    return spark
