"""Unit tests for operators/packing.pack_offsets and
operators/spans.coalesce_text_spans."""

from __future__ import annotations

from pyspark.sql import functions as F

from gc_spark.operators.packing import pack_offsets
from gc_spark.operators.spans import (
    build_interleaved_spans,
    coalesce_text_spans,
    flatten_spans,
    span_sequence_fingerprint,
)


class TestPackOffsets:
    def _pack(self, spark, rows, ctx=10):
        df = spark.createDataFrame(rows, ["source", "doc_id", "n"])
        out = pack_offsets(
            df, ctx_len=ctx, stream_cols=["source"], order_col="doc_id", tokens_col=F.col("n")
        )
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    def test_contiguous_offsets_and_bins(self, spark):
        got = self._pack(spark, [("a", 1, 4), ("a", 2, 4), ("a", 3, 4)], ctx=10)
        assert [got[i]["start_off"] for i in (1, 2, 3)] == [0, 4, 8]
        # doc 3 occupies tokens 8..11: it straddles the 10-token boundary
        assert (got[3]["bin_first"], got[3]["bin_last"], got[3]["n_bins"]) == (0, 1, 2)
        assert got[1]["n_bins"] == 1

    def test_streams_are_independent(self, spark):
        got = self._pack(spark, [("a", 1, 7), ("b", 2, 7)], ctx=10)
        assert got[1]["start_off"] == 0 and got[2]["start_off"] == 0

    def test_empty_doc_spans_one_bin(self, spark):
        got = self._pack(spark, [("a", 1, 10), ("a", 2, 0)], ctx=10)
        # doc 2 starts exactly on the boundary with zero tokens
        assert (got[2]["start_off"], got[2]["bin_first"], got[2]["n_bins"]) == (10, 1, 1)

    def test_doc_spanning_many_bins(self, spark):
        got = self._pack(spark, [("a", 1, 35)], ctx=10)
        assert (got[1]["bin_first"], got[1]["bin_last"], got[1]["n_bins"]) == (0, 3, 4)


class TestCoalesceTextSpans:
    def test_reconstructs_contiguous_segments(self, spark):
        # 553 chars = 7 chunks of 80; media after chunks 2 and 5 →
        # coalesced layout: text(0..239) media text(240..479) media text(480..)
        text = "".join(chr(97 + i % 26) * 1 for i in range(553))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        flat = flatten_spans(coalesce_text_spans(build_interleaved_spans(df)))
        rows = sorted(flat.collect(), key=lambda r: r["span_offset"])
        kinds = [r["kind"] for r in rows]
        assert kinds == ["text", "media", "text", "media", "text"]
        assert rows[0]["span_text"] == text[:240]
        assert rows[2]["span_text"] == text[240:480]
        assert rows[4]["span_text"] == text[480:]
        assert [r["span_offset"] for r in rows] == [0, 1, 2, 3, 4]

    def test_short_doc_single_span(self, spark):
        df = spark.createDataFrame([(2, "hello")], ["doc_id", "text"])
        rows = flatten_spans(coalesce_text_spans(build_interleaved_spans(df))).collect()
        assert len(rows) == 1
        assert rows[0]["span_text"] == "hello" and rows[0]["kind"] == "text"

    def test_idempotent(self, spark):
        df = spark.createDataFrame([(1, "x" * 553), (2, "y" * 48)], ["doc_id", "text"])
        once = coalesce_text_spans(build_interleaved_spans(df))
        twice = coalesce_text_spans(once)
        a = {r["doc_id"]: r["span_seq_sha"] for r in span_sequence_fingerprint(once).collect()}
        b = {r["doc_id"]: r["span_seq_sha"] for r in span_sequence_fingerprint(twice).collect()}
        assert a == b
