"""Unit tests for content-defined chunking (functions/text.cdc_chunks_col)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gc_spark.functions.text import cdc_chunks_col


def _chunks(spark, text, **kw):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(cdc_chunks_col(F.col("text"), **kw).alias("c")).first()["c"]


class TestCDC:
    def test_chunks_cover_text_contiguously(self, spark):
        # varied content (repeating text has few distinct windows and may
        # legitimately contain no cut points)
        text = " ".join(f"word{i * 37 % 1000}x{i}" for i in range(120))
        ch = _chunks(spark, text)
        assert ch[0]["start"] == 1
        starts = [c["start"] for c in ch]
        assert starts == sorted(starts) and len(set(starts)) == len(starts)
        assert len(ch) > 5  # ~32-char expected chunks over ~1kB

    def test_insertion_shifts_only_local_chunks(self, spark):
        # the CDC property: editing the head leaves the tail chunks'
        # HASHES intact (fixed-width chunking would re-key everything)
        base = " ".join(f"tok{i * 13 % 500}y{i}" for i in range(150))
        edited = "XY" + base
        h_base = {c["chunk_sha"] for c in _chunks(spark, base)}
        h_edit = {c["chunk_sha"] for c in _chunks(spark, edited)}
        assert len(h_base) > 5
        shared = len(h_base & h_edit)
        assert shared >= len(h_base) - 2  # only the first chunk(s) differ

    def test_identical_text_identical_chunks(self, spark):
        a = _chunks(spark, "some stable content here padded out to length")
        b = _chunks(spark, "some stable content here padded out to length")
        assert a == b

    def test_short_text_single_chunk(self, spark):
        ch = _chunks(spark, "tiny")
        assert len(ch) == 1 and ch[0]["start"] == 1
