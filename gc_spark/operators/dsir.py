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

Scale shape: the bucket tables are B-sized (B ~ 10k-1M) regardless of
corpus size — ONE aggregate each over target and raw, then a broadcast
log-ratio lookup joined map-side into the per-doc feature counts. The only
corpus-sized shuffle is the per-(doc, bucket) count. No driver actions and
no Python: tokenize/ngram/hash are native expressions, the hash is the
portable sha256-prefix (text_dedup.sha60_col) so oracles can reproduce it;
feature totals ride along as 1-row crossJoins (unigram_lm pattern,
operators/lm.py), and identical count subplans collapse via
ReusedExchange.

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


def _bucket_counts(feats: DataFrame) -> DataFrame:
    """(bucket, c) raw feature counts; B-sized output, map-side combined."""
    return feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """(id, n_feats, weight) per raw document; higher weight = more
    target-like."""
    b = float(buckets)
    t_counts = _bucket_counts(_features(target, text_col, buckets))
    r_counts = _bucket_counts(_features(raw, text_col, buckets))
    t_total = t_counts.agg(F.sum("c").alias("_tt"))
    r_total = r_counts.agg(F.sum("c").alias("_tr"))

    # full outer join of the two B-sized tables; missing side -> add-1
    # floor (coalesce c to 0). Totals attach as broadcast 1-row frames.
    ratio = (
        t_counts.withColumnRenamed("c", "_ct")
        .join(r_counts.withColumnRenamed("c", "_cr"), "bucket", "full")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .select(
            "bucket",
            F.log(
                ((F.coalesce(F.col("_ct"), F.lit(0.0)) + 1.0) / (F.col("_tt") + b))
                / ((F.coalesce(F.col("_cr"), F.lit(0.0)) + 1.0) / (F.col("_tr") + b))
            ).alias("log_ratio"),
        )
    )

    doc_feats = (
        _features(raw, text_col, buckets, F.col(id_col))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
    )

    return (
        doc_feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_feats"),
            F.round(F.sum(F.col("_c") * F.col("log_ratio")), 6).alias("weight"),
        )
    )
