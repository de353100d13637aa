"""DSIR-style data selection: importance weights from hashed n-gram
features (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public literature). Score every raw document by
how much more likely its hashed unigram+bigram features are under a TARGET
corpus (the high-quality distribution you want more of) than under the RAW
corpus, then keep the top of the ranking. This is the standard cheap
alternative to classifier-based quality filtering at pre-training scale.

weight(doc) = sum_f c_doc(f) * ln( p_target(bucket(f)) / p_raw(bucket(f)) )

with features hashed into B buckets and both distributions add-1 smoothed
over the B-bucket space (buckets unseen in a corpus get the floor
1/(T+B), so the ratio is defined everywhere).

Scale shape: ONE scan of each corpus. The raw corpus shuffles once to
(doc, bucket) grain and that aggregate is materialized per invocation
(lazy localCheckpoint — the planner does not reuse the exchange across
its three consumers; measured plans show zero ReusedExchange), and the
target corpus contributes one B-sized aggregate. Bucket totals attach via an empty-partition window over the
B-sized counts (moves B rows, not the corpus), and the finished log-ratio
table (B rows) broadcasts into the per-doc rollup. No driver actions and
no Python: tokenize/ngram/hash are native expressions, and the hash is
the portable sha256-prefix (text_dedup.sha60_col) so oracles can
reproduce it.

The reference has no training-data selection at all; this extends the
corpus-quality family (q59 unigram LM, q71 Gopher rules, q98 bigram LM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.text_dedup import sha60_col


def _features(df: DataFrame, text_col: str, buckets: int, *extra_cols):
    """(extra..., bucket) — one row per hashed unigram+bigram occurrence."""
    from gc_spark.functions.text import word_ngrams_col

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    feats = F.concat(
        toks,
        F.filter(word_ngrams_col(F.col(text_col), 2), lambda g: g.contains(" ")),
    )
    return df.select(*extra_cols, F.explode(feats).alias("_f")).select(
        *extra_cols, (sha60_col(F.col("_f")) % buckets).alias("bucket")
    )


def _with_total(counts: DataFrame) -> DataFrame:
    """Attach sum(c) as a column via an empty-partition window — one
    single-partition pass over the B-sized counts, never the corpus."""
    from pyspark.sql import Window

    return counts.withColumn("t", F.sum("c").over(Window.partitionBy()))


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """(id, n_feats, weight) per raw document; higher weight = more
    target-like.

    `target_ids` (r6): when the target corpus is a SLICE of `raw` (the
    common data-selection case), pass its (id_col) frame instead of
    re-supplying the texts — the target bucket distribution then rolls up
    from the already-hashed per-doc features via one broadcast semi-join,
    skipping a second tokenize+sha256 pass over the target texts
    (guide §1.2; the counts are identical by construction). `target` is
    ignored when `target_ids` is given."""
    b = float(buckets)
    # doc_feats is a multi-consumer contraction (raw distribution, target
    # slice rollup when target_ids is given, and the final per-doc weight
    # rollup all read it). The planner does NOT collapse the copies —
    # measured executed plans show zero ReusedExchange and the tokenize+
    # sha256 corpus pass run once per consumer — so materialize it once
    # per invocation with a lazy localCheckpoint (the qlm/78d227e
    # pattern): q101 3.2 -> 1.6 s at sf0.1, one corpus scan at any scale.
    doc_feats = (
        _features(raw, text_col, buckets, F.col(id_col))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    # raw bucket distribution rolls up FROM the materialized doc_feats
    r_counts = _with_total(
        doc_feats.groupBy("bucket").agg(F.sum("_c").cast("double").alias("c"))
    )
    if target_ids is not None:
        t_counts = _with_total(
            doc_feats.join(F.broadcast(target_ids.select(id_col)), id_col, "left_semi")
            .groupBy("bucket")
            .agg(F.sum("_c").cast("double").alias("c"))
        )
    else:
        t_counts = _with_total(
            _features(target, text_col, buckets)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("double").alias("c"))
        )

    # full outer join of the two B-sized tables; a bucket missing on one
    # side falls back to that side's add-1 floor (coalesce c to 0); the
    # missing total backfills via the window-computed max (totals are
    # constant columns, max is just "any non-null").
    from pyspark.sql import Window

    t = t_counts.select("bucket", F.col("c").alias("_ct"), F.col("t").alias("_tt"))
    r = r_counts.select("bucket", F.col("c").alias("_cr"), F.col("t").alias("_tr"))
    w = Window.partitionBy()
    ratio = (
        t.join(r, "bucket", "full")
        .withColumn("_tt", F.coalesce(F.col("_tt"), F.max("_tt").over(w)))
        .withColumn("_tr", F.coalesce(F.col("_tr"), F.max("_tr").over(w)))
        .select(
            "bucket",
            F.log(
                ((F.coalesce(F.col("_ct"), F.lit(0.0)) + 1.0) / (F.col("_tt") + b))
                / ((F.coalesce(F.col("_cr"), F.lit(0.0)) + 1.0) / (F.col("_tr") + b))
            ).alias("log_ratio"),
        )
    )

    return (
        doc_feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_feats"),
            F.round(F.sum(F.col("_c") * F.col("log_ratio")), 6).alias("weight"),
        )
    )
