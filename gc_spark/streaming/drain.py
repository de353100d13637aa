"""Structured Streaming frontier drain (SURVEY.md §2.10).

The reference is a cron-batch system; its streaming-shaped concerns map to
Structured Streaming primitives:

  trigger        cron 01:01 daily (crontab.sh:15-33)  → Trigger.AvailableNow
  state store    cumulative manifest on S3            → checkpointLocation +
                                                         the seen/frontier tables
  politeness     per-host caps (runspider_settings)   → foreachBatch → the same
                                                         batch top-k operator
  late data      none in reference (re-crawl wins)    → watermark + windowed
                                                         discovery-rate metrics

Pattern: a file-source stream of newly-discovered frontier rows; every
micro-batch runs the SAME batch operators (canonicalize → hash → dedup →
top-k) inside foreachBatch — one code path for batch and streaming, which is
exactly how a daily-crawl engine should absorb a continuous discovery feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gc_spark import schema as S
from gc_spark.functions.hashing import url_hash64
from gc_spark.functions.urls import canonicalize_url_col
from gc_spark.operators.politeness import topk_per_host


DISCOVERY_SCHEMA = None  # built lazily to avoid mutating S.SEEDS (add() mutates)


def discovery_schema():
    from pyspark.sql.types import StructField, StructType, TimestampType

    return StructType(
        list(S.SEEDS.fields) + [StructField("discovered_at", TimestampType(), True)]
    )


def _sink_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check (works for file:/, hdfs:/, s3a:/ alike) —
    distinguishes 'first batch, sink not created yet' from a read error."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def discovered_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of frontier rows (schema: SEEDS + discovered_at)."""
    return spark.readStream.schema(discovery_schema()).parquet(source_dir)


def stage_urls(stream: DataFrame) -> DataFrame:
    """Stateless staging: canonicalize → hash (pure codegen, streamable)."""
    return (
        stream.withColumn("canonical_url", canonicalize_url_col(F.col("url")))
        .withColumn("url_hash64", url_hash64(F.col("canonical_url")))
    )


def discovery_rate_metrics(staged: DataFrame, window: str = "10 seconds",
                           watermark: str = "30 seconds") -> DataFrame:
    """Windowed per-host discovery counts with a watermark for late rows —
    the streaming twin of the per-batch metrics table."""
    return (
        staged.withWatermark("discovered_at", watermark)
        .groupBy(F.window("discovered_at", window).alias("w"), "host")
        .agg(F.count("*").alias("urls_discovered"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "urls_discovered",
        )
    )


def streaming_drain(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    budget_per_host: int = 10,
    available_now: bool = True,
):
    """Drain the discovery stream: per micro-batch, dedup within the batch,
    anti-join everything already scheduled (state = the parquet sink itself),
    apply the per-host politeness top-k, append to the scheduled sink.

    Returns the StreamingQuery (await with .awaitTermination())."""
    staged = stage_urls(discovered_stream(spark, source_dir))

    def _drain_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(["url_hash64"])
        # explicit existence check — a blanket try/except here would treat a
        # transient read failure (corrupt file, FS hiccup) as "first batch",
        # silently disabling dedup for the micro-batch and double-scheduling
        if _sink_exists(sess, out_dir):
            already = sess.read.parquet(out_dir).select("url_hash64")
            fresh = fresh.join(already, "url_hash64", "left_anti")
        take = topk_per_host(
            fresh.withColumn("priority", F.lit(0))
            .withColumn("depth", F.lit(0))
            .withColumn("seq", F.col("url_hash64")),
            budget_per_host,
        )
        (
            take.select(
                "url", "canonical_url", "url_hash64", "host", "source",
                "drain_rank", F.lit(batch_id).alias("batch_id"),
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        staged.writeStream.foreachBatch(_drain_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_url_dedup(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """Bounded-state streaming URL dedup via dropDuplicatesWithinWatermark.

    The foreachBatch drain above dedups against the DURABLE seen sink —
    the long-horizon guarantee. This operator is the in-stream complement:
    collapse the burst duplicates a discovery feed produces (the same URL
    found on many pages within minutes) BEFORE they hit the drain at all.

    Why WithinWatermark and not plain dropDuplicates: a plain streaming
    dropDuplicates keeps every key in the state store forever — state
    grows with crawl history and a 10^10-URL frontier OOMs the store.
    WithinWatermark evicts keys once the event-time watermark passes them,
    so state is bounded by (discovery rate × watermark window) regardless
    of total crawl size; anything re-discovered later than the window is
    correctly left to the durable seen-table anti-join.

    Returns the started query (AvailableNow trigger, parquet sink)."""
    stream = (
        spark.readStream.schema(discovery_schema())
        .parquet(src_path)
        .withColumn("canonical_url", canonicalize_url_col(F.col("url")))
        .withColumn("url_hash64", url_hash64(F.col("canonical_url")))
    )
    deduped = stream.withWatermark("discovered_at", watermark).dropDuplicatesWithinWatermark(
        ["url_hash64"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
