"""BPE merge induction — learning a tokenizer vocabulary from the corpus.

Byte-pair encoding (Sennrich et al. 2016) builds a tokenizer by repeatedly
merging the most frequent adjacent token pair. functions/text.
bpe_ish_tokens_col applies a FIXED pre-tokenization; this operator runs the
LEARNING loop — the corpus-level step an LLM data pipeline executes once
per tokenizer release.

Word-level variant (merges whitespace-separated tokens, joiner '+'):
  round k: count adjacent pairs over the current corpus -> pick the top
  pair (count desc, then lexicographic — fully deterministic) -> rewrite
  the corpus replacing ' w1 w2 ' with ' w1+w2 ' on space-padded text.

Portability contract: the rewrite is a PLAIN substring replace (no regex),
and both Spark's `replace` and DuckDB's `replace` substitute
non-overlapping occurrences left-to-right — so a run like "a a a" merges
greedily-leftmost identically on both engines, and the whole loop is
oracle-checkable round by round.

Scale shape per round: one pair-count groupBy (map-side combined,
vocabulary²-bounded output), a 1-row top-pair broadcast back onto the
corpus (crossJoin — no collect), and a map-only rewrite. k rounds = k
shuffles of vocabulary-sized data; the corpus itself never shuffles.

The default path (`audit=False`) learns over a CONTRACTED (text, count)
table — duplicate documents collapse to one weighted row up front, and
every subsequent pass (pair counts, rewrite) touches only distinct texts.
Counts are multiplicity-weighted, so the learned merges are identical to
the raw-corpus run. `audit=True` additionally emits a per-round sha256 of
the doc_id-ordered rewritten corpus (the byte-identical-rewrites proof
used by the oracle tests); that sha is a collect_list of the WHOLE corpus
onto one reducer — an audit tool for test-sized data, never the
production path, which is why it is opt-in and off by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.text import word_ngrams_col

JOINER = "+"


def _pair_counts(
    df: DataFrame, text_col: str, weight_col: str | None = None
) -> DataFrame:
    """Adjacent-pair counts; with `weight_col`, each row's bigrams count
    `weight` times (the contracted-corpus path)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    grams = df.select(
        F.explode(word_ngrams_col(F.col(text_col), 2)).alias("g"),
        w.cast("long").alias("_w"),
    )
    return (
        grams.filter(F.col("g").contains(" "))  # drop degenerate 1-token rows
        .groupBy("g")
        .agg(F.sum("_w").cast("long").alias("n"))
        .select(
            F.split("g", " ")[0].alias("w1"),
            F.split("g", " ")[1].alias("w2"),
            "n",
        )
    )


def _rewrite_expr() -> str:
    return (
        "trim(replace(concat(' ', _t, ' '),"
        " concat(' ', _w1, ' ', _w2, ' '),"
        f" concat(' ', _w1, '{JOINER}', _w2, ' ')))"
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
    audit: bool = False,
) -> DataFrame:
    """(round, w1, w2, n[, corpus_sha]) — one row per merge round: the pair
    merged and its pre-merge count. Deterministic by construction (count
    desc, then lexicographic).

    Default (`audit=False`): the production shape. The corpus contracts
    once to weighted distinct texts; each round is one vocab-sized
    pair-count shuffle, a 1-row top-pair broadcast, and a map-only rewrite
    of the contraction. Nothing corpus-sized ever shuffles or collects.

    `audit=True` adds `corpus_sha`, the sha256 of the doc_id-ordered corpus
    AFTER each merge — byte-exact proof the rewrite matches the oracle
    engine, at the cost of collect_list-ing the corpus to one reducer per
    round. Test/audit-scale only; see module docstring."""
    if not audit:
        return _learn_contracted(df, text_col, rounds)
    cur = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    out = None
    for k in range(1, rounds + 1):
        top = (
            _pair_counts(cur, "_t")
            .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .select(
                F.col("w1").alias("_w1"), F.col("w2").alias("_w2"), F.col("n").alias("_n")
            )
        )
        rewritten = (
            cur.crossJoin(F.broadcast(top))
            .select(
                F.col(id_col),
                F.expr(_rewrite_expr()).alias("_t"),
                "_w1",
                "_w2",
                "_n",
            )
            .localCheckpoint(eager=False)
        )
        row = (
            rewritten.groupBy("_w1", "_w2", "_n")
            .agg(
                F.sha2(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("_t").alias("t")))
                            ),
                            lambda x: x["t"],
                        ),
                        "\x01",
                    ),
                    256,
                ).alias("corpus_sha")
            )
            .select(
                F.lit(k).alias("round"),
                F.col("_w1").alias("w1"),
                F.col("_w2").alias("w2"),
                F.col("_n").alias("n"),
                "corpus_sha",
            )
        )
        out = row if out is None else out.unionByName(row)
        cur = rewritten.select(id_col, "_t")
    return out


def _learn_contracted(df: DataFrame, text_col: str, rounds: int) -> DataFrame:
    """The scale path of learn_bpe_merges: the loop over the weighted
    distinct-text contraction. (round, w1, w2, n); merges identical to the
    raw-corpus run because pair counts are multiplicity-weighted."""
    cur = (
        df.groupBy(F.col(text_col).alias("_t"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=False)
    )
    out = None
    for k in range(1, rounds + 1):
        top = (
            _pair_counts(cur, "_t", "_c")
            .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .select(
                F.col("w1").alias("_w1"),
                F.col("w2").alias("_w2"),
                F.col("n").alias("_n"),
            )
            .localCheckpoint(eager=False)  # 1 row; reused by rewrite + output
        )
        row = top.select(
            F.lit(k).alias("round"),
            F.col("_w1").alias("w1"),
            F.col("_w2").alias("w2"),
            F.col("_n").alias("n"),
        )
        out = row if out is None else out.unionByName(row)
        cur = (
            cur.crossJoin(F.broadcast(top))
            .select(F.expr(_rewrite_expr()).alias("_t"), "_c")
            .localCheckpoint(eager=False)
        )
    return out


def apply_bpe_merges(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ENCODE half of the tokenizer loop: apply a learned merge table
    (learn_bpe_merges' output — the tokenizer release artifact) to any
    corpus, in merge order. (doc_id, encoded) where encoded is the text
    with every merge's ' w1 w2 ' collapsed to ' w1+w2 ', round by round —
    byte-identical to running the learning rewrite, so learn-then-apply
    on the same corpus reproduces the final learned corpus exactly.

    Scale shape: the merge table is vocabulary-sized — ONE row of sorted
    (round, w1, w2) structs crossJoin-broadcast onto the corpus, then the
    whole application is a per-row F.aggregate fold of plain substring
    replaces (same non-overlapping left-to-right semantics both engines,
    see the module contract). The corpus never shuffles, no driver
    collect: the tokenizer stays inside the dataflow."""
    marr = merges.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("round").alias("r"),
                    F.col("w1").alias("w1"),
                    F.col("w2").alias("w2"),
                )
            )
        ).alias("_m")
    )
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    folded = F.aggregate(
        F.col("_m"),
        padded,
        lambda acc, m: F.replace(
            acc,
            F.concat(F.lit(" "), m["w1"], F.lit(" "), m["w2"], F.lit(" ")),
            F.concat(
                F.lit(" "), m["w1"], F.lit(JOINER), m["w2"], F.lit(" ")
            ),
        ),
    )
    return df.crossJoin(F.broadcast(marr)).select(
        F.col(id_col), F.trim(folded).alias("encoded")
    )
