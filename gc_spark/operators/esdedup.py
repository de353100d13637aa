"""Exact-substring deduplication (masking form) — find every run of >= L
tokens that occurs more than once across the corpus, keep its canonical
(first) occurrence, and report the masked coverage per document.

This is the distributed re-expression of suffix-array exact-substring
dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better"): a single-node suffix array over 100 TB of text is not
buildable, but the SAME maximal-repeat semantics fall out of stride-1
L-token rolling grams + interval union:

  - any repeated run of M >= L tokens contributes M-L+1 flagged gram
    positions per non-canonical occurrence, and the union of their
    [pos, pos+L) windows is exactly [start, start+M) — so merging the
    flagged intervals per doc reconstructs the maximal repeated substring
    without ever materializing it;
  - the canonical occurrence of a gram is the globally smallest
    (doc_id, pos) — for a repeated run, every constituent gram's canonical
    lies in the same (first) copy, so the first copy keeps all its tokens
    and every later copy masks the whole run. First-occurrence-wins also
    resolves within-document self-repeats.

Scale shape (the part a suffix array can't do):
  - one scan -> posexplode to (doc_id, pos, gram): map-side only;
  - groupBy(gram) with partial aggregation (map-side combine collapses
    boilerplate hot grams before the shuffle — the skew case a window
    sort would choke on), keeping ONLY grams with count > 1: in real web
    corpora the surviving fraction is small, so the join back to the
    occurrence stream is dup-grams-only;
  - per-doc interval merge is an O(k) array fold (F.aggregate) after one
    doc_id shuffle — no per-token explode, no window.
  At 100 TB you additionally shuffle xxhash64(gram) instead of the gram
  string (hash_grams=True, 8 bytes vs ~60): 64-bit collisions over-mask a
  token window at ~birthday rates, the standard trade every production
  ESD pipeline makes; the string path exists for oracle parity and the
  two are asserted equal in tests at small scale.

No reference twin: gamechanger-crawlers has no training-data hygiene;
LLM-pipeline operator family (SURVEY.md §6 / round brief).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.text import bind_once

_ACC_T = "struct<masked:bigint,spans:bigint,e:bigint>"


def _positioned_grams(toks: Column, l: int) -> Column:
    """array<struct<pos:int,gram:string>> of stride-1 l-grams, 1-based pos;
    empty when the doc has fewer than l tokens."""
    empty = F.array().cast("array<struct<pos:int,gram:string>>")
    return bind_once(
        toks,
        lambda t: F.when(
            F.size(t) >= l,
            F.transform(
                # guard: sequence(1, 0) DESCENDS in Spark, so the short-doc
                # case must never reach it
                F.sequence(F.lit(1), F.size(t) - (l - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.array_join(F.slice(t, i, l), " ").alias("gram"),
                ),
            ),
        ).otherwise(empty),
    )


def exact_substring_mask_stats(
    df: DataFrame,
    l: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """Per-doc masking stats under exact-substring dedup at threshold l:
    (id, n_tokens, masked_tokens, n_masked_spans, kept_frac).

    masked_tokens is the size of the union of [pos, pos+l) over this doc's
    non-canonical repeated-gram positions; n_masked_spans counts the
    disjoint merged intervals (= maximal repeated substrings removed);
    kept_frac = 1 - masked/n_tokens. Docs with < l tokens are never masked.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tokens = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    base = df.select(F.col(id_col), n_tokens.alias("n_tokens"), toks.alias("_toks"))

    occ = base.select(
        id_col,
        F.explode(_positioned_grams(F.col("_toks"), l)).alias("g"),
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    if hash_grams:
        # hashed occ is a NARROW (id, pos, long) frame — cheap to
        # materialize once instead of running the split+slice+hash gram
        # construction for each of its two consumers (the dup aggregate
        # and the flag join). The string path keeps recompute: its occ
        # carries ~60-byte gram strings, where a second map-side pass is
        # cheaper than materializing the fat frame.
        occ = occ.withColumn("gram", F.xxhash64("gram")).localCheckpoint(
            eager=False
        )

    # dup grams only — partial agg absorbs hot boilerplate grams map-side
    dup = (
        occ.groupBy("gram")
        .agg(
            F.count("*").alias("c"),
            F.min(F.struct(id_col, "pos")).alias("first_occ"),
        )
        .where(F.col("c") > 1)
        .select("gram", "first_occ")
    )
    flagged = (
        occ.join(dup, "gram")
        .where(F.struct(id_col, "pos") != F.col("first_occ"))
        .select(id_col, "pos")
    )

    # interval union per doc: fold sorted starts with (masked, spans, end)
    def step(acc, p):
        p = p.cast("bigint")
        end = p + (l - 1)
        return F.struct(
            (acc["masked"] + F.least(F.lit(l).cast("bigint"), end - acc["e"])).alias(
                "masked"
            ),
            (acc["spans"] + (p > acc["e"] + 1).cast("bigint")).alias("spans"),
            end.alias("e"),
        )

    acc0 = F.struct(
        F.lit(0).cast("bigint").alias("masked"),
        F.lit(0).cast("bigint").alias("spans"),
        F.lit(-(2 * l)).cast("bigint").alias("e"),
    ).cast(_ACC_T)
    per_doc = (
        flagged.groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_ps"))
        .select(
            id_col,
            F.aggregate(F.col("_ps"), acc0, step).alias("_m"),
        )
        .select(
            id_col,
            F.col("_m.masked").alias("masked_tokens"),
            F.col("_m.spans").alias("n_masked_spans"),
        )
    )

    out = base.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("masked_tokens", F.lit(0)).alias("masked_tokens"),
        F.coalesce("n_masked_spans", F.lit(0)).alias("n_masked_spans"),
    )
    return out.withColumn(
        "kept_frac",
        F.lit(1.0)
        - F.col("masked_tokens").cast("double")
        / F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0)),
    )
