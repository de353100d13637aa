"""Unit tests for operators/bpe (BPE merge induction)."""

from __future__ import annotations

from gc_spark.operators.bpe import learn_bpe_merges


def _merges(spark, texts, rounds):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    return learn_bpe_merges(df, rounds=rounds).orderBy("round").collect()


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
        )
        assert rows[0]["corpus_sha"] != rows[1]["corpus_sha"]
        assert all(len(r["corpus_sha"]) == 64 for r in rows)
