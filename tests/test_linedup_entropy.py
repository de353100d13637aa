"""Unit tests for corpus line dedup (operators/linedup) and character
entropy (functions/text.char_entropy_col)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from gc_spark.functions.text import char_entropy_col
from gc_spark.operators.linedup import chunk_lines_col, dedup_lines, split_lines_col


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestChunkLines:
    def test_chunks_of_width(self, spark):
        df = spark.createDataFrame([("a b c d e f g h i j",)], ["text"])
        out = df.select(chunk_lines_col(F.col("text"), 4).alias("c")).first()["c"]
        assert out == ["a b c d", "e f g h", "i j"]

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([("x y",)], ["text"])
        out = df.select(chunk_lines_col(F.col("text"), 8).alias("c")).first()["c"]
        assert out == ["x y"]

    def test_split_lines_drops_blanks(self, spark):
        df = spark.createDataFrame([("one\n\ntwo\n three ",)], ["text"])
        out = df.select(split_lines_col(F.col("text")).alias("c")).first()["c"]
        assert out == ["one", "two", " three "]


class TestDedupLines:
    def test_boilerplate_removed_unique_kept(self, spark):
        # 'nav bar' is in 3 of 4 docs -> removed at min_docs=3; unique
        # chunks survive; doc 4 (all boilerplate) stays with sha('').
        df = spark.createDataFrame(
            [
                (1, "nav bar alpha beta"),
                (2, "nav bar gamma delta"),
                (3, "nav bar"),
                (4, "unique words only here"),
            ],
            ["doc_id", "text"],
        )
        out = _rows(
            dedup_lines(df, lines_col=chunk_lines_col(F.col("text"), 2), min_docs=3)
        )
        assert out[1]["n_lines"] == 2 and out[1]["n_removed"] == 1
        assert out[1]["kept_sha"] == hashlib.sha256(b"alpha beta").hexdigest()
        assert out[3]["n_lines"] == 1 and out[3]["n_removed"] == 1
        assert out[3]["kept_sha"] == hashlib.sha256(b"").hexdigest()
        assert out[4]["n_removed"] == 0
        assert (
            out[4]["kept_sha"]
            == hashlib.sha256(b"unique words only here").hexdigest()
        )

    def test_order_preserved_across_removals(self, spark):
        # removal in the middle must not reorder the survivors
        df = spark.createDataFrame(
            [(1, "aa bb XX YY cc dd"), (2, "XX YY"), (3, "XX YY")],
            ["doc_id", "text"],
        )
        out = _rows(
            dedup_lines(df, lines_col=chunk_lines_col(F.col("text"), 2), min_docs=3)
        )
        assert out[1]["kept_sha"] == hashlib.sha256(b"aa bb cc dd").hexdigest()


class TestCharEntropy:
    def test_degenerate_zero(self, spark):
        df = spark.createDataFrame([(1, "aaaaaa")], ["doc_id", "text"])
        assert df.select(char_entropy_col(F.col("text")).alias("h")).first()["h"] == 0.0

    def test_two_symbol_one_bit(self, spark):
        df = spark.createDataFrame([(1, "abab")], ["doc_id", "text"])
        h = df.select(char_entropy_col(F.col("text")).alias("h")).first()["h"]
        assert abs(h - 1.0) < 1e-12

    def test_matches_math_formula(self, spark):
        text = "mississippi river"
        counts: dict[str, int] = {}
        for ch in text:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(text)
        want = -sum(k / n * math.log2(k / n) for k in counts.values())
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        h = df.select(char_entropy_col(F.col("text")).alias("h")).first()["h"]
        assert abs(h - want) < 1e-9
