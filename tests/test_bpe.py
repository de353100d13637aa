"""Unit tests for operators/bpe (BPE merge induction)."""

from __future__ import annotations

from gc_spark.operators.bpe import learn_bpe_merges


def _merges(spark, texts, rounds, audit=False):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    return learn_bpe_merges(df, rounds=rounds, audit=audit).orderBy("round").collect()


class TestBPE:
    def test_most_frequent_pair_merges_first(self, spark):
        rows = _merges(
            spark,
            ["new york is big", "new york city", "big apple", "new deal"],
            rounds=1,
        )
        assert (rows[0]["w1"], rows[0]["w2"], rows[0]["n"]) == ("new", "york", 2)

    def test_second_round_can_extend_first_merge(self, spark):
        rows = _merges(
            spark,
            ["new york city wins", "new york city sleeps", "new york state"],
            rounds=2,
        )
        assert (rows[0]["w1"], rows[0]["w2"]) == ("new", "york")
        assert (rows[1]["w1"], rows[1]["w2"]) == ("new+york", "city")

    def test_tie_breaks_lexicographically(self, spark):
        rows = _merges(spark, ["b c", "a d"], rounds=1)
        assert (rows[0]["w1"], rows[0]["w2"], rows[0]["n"]) == ("a", "d", 1)

    def test_corpus_sha_changes_per_round(self, spark):
        rows = _merges(
            spark,
            ["x y z w", "x y z q", "x y p"],
            rounds=2,
            audit=True,
        )
        assert rows[0]["corpus_sha"] != rows[1]["corpus_sha"]
        assert all(len(r["corpus_sha"]) == 64 for r in rows)

    def test_default_path_has_no_sha_and_matches_audit_merges(self, spark):
        """audit=False (contracted corpus) must learn the SAME merges as
        audit=True (raw corpus) — multiplicity-weighted pair counts are
        exact — while never emitting the corpus-sized sha column."""
        texts = ["new york is big", "new york city", "new york city hall",
                 "new york city", "big apple"]
        fast = _merges(spark, texts, rounds=3)
        slow = _merges(spark, texts, rounds=3, audit=True)
        assert "corpus_sha" not in fast[0].asDict()
        assert [
            (r["round"], r["w1"], r["w2"], r["n"]) for r in fast
        ] == [(r["round"], r["w1"], r["w2"], r["n"]) for r in slow]

    def test_contracted_path_weights_duplicate_texts(self, spark):
        # "a b" appears 3x as a duplicate text; "c d" once — the weighted
        # count must see 3, not 1.
        rows = _merges(spark, ["a b", "a b", "a b", "c d"], rounds=1)
        assert (rows[0]["w1"], rows[0]["w2"], rows[0]["n"]) == ("a", "b", 3)
