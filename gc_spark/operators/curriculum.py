"""Deterministic curriculum / mixture ordering keys for training streams.

A training run wants documents of different difficulty buckets interleaved
smoothly (no 10M-easy-then-10M-hard blocks) AND reproducibly (same corpus +
salt → byte-identical stream). Materializing the order with a global sort
of 10^10 rows per epoch is the anti-pattern; instead we compute an ORDER
KEY per row and let the writer range-partition on it — sorting then happens
per output shard, never globally.

stream_key = pos_in_bucket * n_buckets + bucket is a round-robin interleave:
consecutive stream positions cycle through the buckets while each bucket's
internal order is a deterministic salted-hash shuffle.

Scale shape: a plain Window.partitionBy(bucket) would put ALL rows of a
bucket on one reducer (n_buckets is small by design — the exact hot-window
problem politeness.topk_per_host solves). So the dense per-bucket position
is computed two-phase: rank within (bucket, salt_shard) — n_buckets ×
salt_shards balanced window partitions — then add the broadcast cumulative
offset of the preceding shards. The per-bucket order this realizes is the
composite sort (shard, hash, id), itself a deterministic pseudo-random
permutation, so a single-window engine (the SQL oracle) reproduces it
exactly with ORDER BY (hash % shards, hash, id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gc_spark.operators.sampling import sample_hash_col


def curriculum_order(
    df: DataFrame,
    difficulty_col: str,
    id_col: str = "doc_id",
    bucket_width: int = 40,
    n_buckets: int = 5,
    salt: str = "epoch0",
    salt_shards: int = 32,
) -> DataFrame:
    """(id, bucket, pos_in_bucket, stream_key): a deterministic interleaved
    epoch ordering. Rotate `salt` per epoch for a fresh within-bucket
    shuffle with the same mixture shape."""
    bucket = F.least(
        F.floor(F.col(difficulty_col) / F.lit(float(bucket_width))),
        F.lit(n_buckets - 1),
    ).cast("int")
    h = sample_hash_col(F.col(id_col), salt)
    keyed = df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        h.alias("_h"),
        (h % salt_shards).cast("int").alias("_shard"),
    )
    w_local = Window.partitionBy("bucket", "_shard").orderBy("_h", id_col)
    local = keyed.withColumn("pos_local", F.row_number().over(w_local))
    # tiny frame: n_buckets * salt_shards rows -> cumulative shard offsets
    counts = keyed.groupBy("bucket", "_shard").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy("bucket")
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("bucket", "_shard", "_off")
    return (
        local.join(F.broadcast(offsets), ["bucket", "_shard"])
        .select(
            id_col,
            "bucket",
            (F.col("_off") + F.col("pos_local")).cast("int").alias("pos_in_bucket"),
            (
                (F.col("_off") + F.col("pos_local") - 1).cast("long") * n_buckets
                + F.col("bucket")
            ).alias("stream_key"),
        )
    )


def epoch_shuffle_keys(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    num_shards: int = 64,
) -> DataFrame:
    """Per-epoch global training shuffle WITHOUT a global sort: the classic
    two-level scheme — a deterministic per-epoch PERMUTATION of shards
    (every reader visits whole shards in a pseudo-random order) crossed
    with a per-epoch salted hash WITHIN each shard. Emits

      (.., shard, shard_rank, doc_rank)

    and (shard_rank, doc_rank) ascending IS the epoch's read order:
    writers repartition by `shard` + sortWithinPartitions(doc_rank);
    readers walk shards by shard_rank. No row ever needs a global sort or
    a driver-side permutation table — both levels are pure map-side
    hashes salted by the epoch, so epoch k+1 is a fresh resample and
    epoch k is reproducible forever (the property a training restart
    needs). The curriculum twin (curriculum_order) biases WHERE a doc
    lands; this one is the unbiased mixer run between curriculum stages.
    """
    from gc_spark.functions.text import _sha60_local

    sid = _sha60_local(F.concat(F.lit("shard#"), F.col(id_col).cast("string")))
    shard = (sid % num_shards).cast("int")
    shard_rank = _sha60_local(
        F.concat(F.lit(f"ep{epoch}#"), shard.cast("string"))
    )
    doc_rank = _sha60_local(
        F.concat(F.lit(f"doc{epoch}#"), F.col(id_col).cast("string"))
    )
    return df.select(
        "*",
        shard.alias("shard"),
        shard_rank.alias("shard_rank"),
        doc_rank.alias("doc_rank"),
    )
