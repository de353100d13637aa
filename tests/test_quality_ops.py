"""Unit tests for the round-3 training-data hygiene kernels: Gopher-style
repetition metrics, PII redaction, and benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestRepetitionMetrics:
    def test_top_bigram_and_dup_word(self, spark):
        from gc_spark.functions.text import dup_word_frac_col, top_ngram_frac_col

        df = spark.createDataFrame([("a b a b c",)], "text string")
        row = df.select(
            top_ngram_frac_col(F.col("text"), 2).alias("t"),
            dup_word_frac_col(F.col("text")).alias("d"),
        ).first()
        # bigrams: [a b, b a, a b, b c] → top 'a b' = 2/4
        assert row["t"] == 0.5
        # 5 words, 3 distinct → 1 - 3/5
        assert row["d"] == 0.4

    def test_no_repetition(self, spark):
        from gc_spark.functions.text import dup_word_frac_col, top_ngram_frac_col

        df = spark.createDataFrame([("w x y z",)], "text string")
        row = df.select(
            top_ngram_frac_col(F.col("text"), 2).alias("t"),
            dup_word_frac_col(F.col("text")).alias("d"),
        ).first()
        assert abs(row["t"] - 1.0 / 3.0) < 1e-6  # 3 distinct bigrams, each once
        assert row["d"] == 0.0


class TestPiiRedaction:
    def test_redact_and_count(self, spark):
        from gc_spark.functions.text import (
            EMAIL_PATTERN,
            PHONE_PATTERN,
            count_pattern_col,
            redact_pii_col,
        )

        df = spark.createDataFrame(
            [("reach me at a.b+c@example.mil or 555-0001, backup x@y.org",)],
            "text string",
        )
        row = df.select(
            redact_pii_col(F.col("text")).alias("r"),
            count_pattern_col(F.col("text"), EMAIL_PATTERN).alias("ne"),
            count_pattern_col(F.col("text"), PHONE_PATTERN).alias("np"),
        ).first()
        assert row["r"] == "reach me at <EMAIL> or <PHONE>, backup <EMAIL>"
        assert row["ne"] == 2 and row["np"] == 1

    def test_plain_text_untouched(self, spark):
        from gc_spark.functions.text import redact_pii_col

        df = spark.createDataFrame([("no pii here at all",)], "text string")
        assert df.select(redact_pii_col(F.col("text")).alias("r")).first()["r"] == (
            "no pii here at all"
        )


class TestDecontaminate:
    def test_overlap_counts_distinct_grams(self, spark):
        from gc_spark.operators.decontam import ngram_decontaminate

        bench = spark.createDataFrame(
            [(100, "alpha bravo charlie delta echo foxtrot")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                # shares grams [alpha..echo] and [bravo..foxtrot] → 2
                (1, "alpha bravo charlie delta echo foxtrot golf"),
                # repeats the SAME leaked gram twice → still counts once
                (2, "alpha bravo charlie delta echo x alpha bravo charlie delta echo"),
                (3, "nothing in common with the benchmark text here"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_overlapping_ngrams"]
            for r in ngram_decontaminate(corpus, bench, n=5).collect()
        }
        assert got == {1: 2, 2: 1}

    def test_broadcast_plan(self, spark):
        """The benchmark gram set must broadcast — the corpus side never
        shuffles for the join (scan + BroadcastHashJoin + partial agg)."""
        from gc_spark.operators.decontam import ngram_decontaminate

        bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        corpus = spark.createDataFrame([(2, "a b c d e f")], "doc_id long, text string")
        plan = ngram_decontaminate(corpus, bench, n=5)._sc is not None and (
            ngram_decontaminate(corpus, bench, n=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestWinnowing:
    def test_shared_substring_guarantee(self, spark):
        """Winnowing's core property (k=8, w=4): any two docs sharing a
        substring of >= k+w-1 = 11 chars share at least one fingerprint;
        docs over disjoint alphabets share none."""
        from gc_spark.functions.text import winnow_fingerprints_col

        shared = "THE-COMMON-PASSAGE-XYZ"  # 22 chars >> 11
        df = spark.createDataFrame(
            [
                (1, "aaaa " + shared + " bbbb cccc dddd"),
                (2, "eeee ffff " + shared + " gggg"),
                (3, "zzzz yyyy xxxx wwww vvvv uuuu"),
            ],
            "doc_id long, text string",
        )
        fps = {
            r["doc_id"]: set(r["fp"])
            for r in df.select(
                "doc_id", winnow_fingerprints_col(F.col("text")).alias("fp")
            ).collect()
        }
        assert fps[1] & fps[2], "docs sharing an 11+ char substring must overlap"
        assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])

    def test_deterministic_and_sorted(self, spark):
        from gc_spark.functions.text import winnow_fingerprints_col

        df = spark.createDataFrame([("some document text here",)], "text string")
        a = df.select(winnow_fingerprints_col(F.col("text")).alias("fp")).first()["fp"]
        b = df.select(winnow_fingerprints_col(F.col("text")).alias("fp")).first()["fp"]
        assert a == b == sorted(set(a))
