"""Snapshot content diff — classify every document across two corpus
snapshots as added / removed / changed / unchanged by content hash.

This is the incremental-recrawl delta the CDC chunker (operators/recrawl,
cdc) feeds on: crawl N and crawl N+1 land as two document tables; the
diff decides what downstream (re-embedding, re-indexing, re-dedup) must
reprocess. At 100 TB the comparison never touches text twice: each side
reduces to (id, sha256(text)) map-side, then ONE full-outer shuffle join
on id — the only wide op — and the verdict is a null/hash-equality case
split. Emitting only the non-`unchanged` rows keeps the output
delta-sized (the common case is ~99% unchanged).

No reference twin: the reference diffs per-URL via its previous-manifest
anti-join (S14/J1); this is the corpus-level generalization with change
detection, not just presence (SURVEY.md §6 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_content_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """(id, status) with status in added|removed|changed (|unchanged)."""

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col), F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias(tag)
        )

    j = hashed(old, "_old").join(hashed(new, "_new"), id_col, "full_outer")
    status = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(F.col("_old") != F.col("_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col(id_col), status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def revision_similarity(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    minor_threshold: float = 0.5,
) -> DataFrame:
    """Shingle-Jaccard similarity between two snapshots of the same URL —
    the recrawl analytics upgrade of snapshot_content_diff's binary
    changed/unchanged: a template-timestamp tweak scores ~1, a page
    REWRITE scores ~0, and change-rate estimators (operators/recrawl)
    should weight them differently. classification: 'minor' at
    jaccard >= minor_threshold, else 'rewrite'.

    Scale shape: ONE equi-join on the id (the only shuffle), then the
    whole shingle/intersection computation is per-row array expressions —
    distinct word 3-grams of each side, |A∩B| / (|A|+|B|-|A∩B|). No
    explode: shingle sets never leave their row.
    """
    from gc_spark.functions.text import word_ngrams_col

    def sh(col):
        return F.array_distinct(
            F.filter(word_ngrams_col(col, 3), lambda g: g.contains(" "))
        )

    o = old.select(F.col(id_col), sh(F.col(text_col)).alias("_a"))
    n = new.select(F.col(id_col), sh(F.col(text_col)).alias("_b"))
    inter = F.size(F.array_intersect(F.col("_a"), F.col("_b")))
    union = F.size("_a") + F.size("_b") - inter
    j = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return o.join(n, id_col).select(
        id_col,
        F.round(j, 6).alias("jaccard"),
        F.when(j >= minor_threshold, F.lit("minor"))
        .otherwise(F.lit("rewrite"))
        .alias("change_class"),
    )


def cdc_delta_stats(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bytes a recrawl actually has to store, per document, under
    content-defined chunk reuse (functions/text.cdc_chunks_col): chunk
    both snapshots, and every NEW-side chunk whose hash already exists in
    the OLD side is free — only unseen chunks upload. Because CDC cuts at
    content positions, an insertion re-keys only the chunks it touches, so
    reuse stays high for minor edits (the whole point vs fixed-width
    chunking, where one inserted byte re-keys every later chunk).

    Emits (id, n_chunks_new, n_reused, new_bytes, reused_bytes,
    reuse_frac). reuse_frac is the byte fraction of the new snapshot served
    from storage.

    Scale shape: ONE equi-join on the id is the only shuffle; chunking and
    the membership check are per-row array expressions (the old side
    reduces to its distinct chunk-hash array map-side, so no chunk-grain
    explode ever shuffles). This is the storage-planning companion to
    revision_similarity (how much changed) and recrawl.revalidation_plan
    (whether to fetch at all).
    """
    from gc_spark.functions.text import cdc_chunks_col

    o = old.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                cdc_chunks_col(F.col(text_col)), lambda c: c["chunk_sha"]
            )
        ).alias("_old_shas"),
    )
    n = new.select(
        F.col(id_col), cdc_chunks_col(F.col(text_col)).alias("_ch"),
        F.length(text_col).alias("_len"),
    )
    joined = n.join(o, id_col)
    # per-chunk byte length = next start - start (the last chunk runs to
    # end-of-text); pair each chunk with its reuse verdict in one pass
    sized = F.transform(
        F.col("_ch"),
        lambda c, i: F.struct(
            (
                F.when(
                    i < F.size("_ch") - 1,
                    F.element_at(F.col("_ch"), i + 2)["start"],
                ).otherwise(F.col("_len") + 1)
                - c["start"]
            ).alias("nbytes"),
            F.array_contains(F.col("_old_shas"), c["chunk_sha"]).alias("reused"),
        ),
    )
    reused_b = F.aggregate(
        sized, F.lit(0).cast("long"),
        lambda acc, s: acc + F.when(s["reused"], s["nbytes"]).otherwise(0),
    )
    total_b = F.aggregate(
        sized, F.lit(0).cast("long"), lambda acc, s: acc + s["nbytes"]
    )
    n_reused = F.size(F.filter(sized, lambda s: s["reused"]))
    return joined.select(
        id_col,
        F.size("_ch").alias("n_chunks_new"),
        n_reused.cast("long").alias("n_reused"),
        (total_b - reused_b).cast("long").alias("new_bytes"),
        reused_b.cast("long").alias("reused_bytes"),
        F.round(
            F.when(total_b > 0, reused_b / total_b).otherwise(F.lit(1.0)), 6
        ).alias("reuse_frac"),
    )
