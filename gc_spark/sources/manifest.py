"""Manifest and feed IO (reference S7/S8/S9 sinks & scans).

- read_manifest_jsonl: the cumulative JSON-lines manifest → seen table rows
  (pipelines.py:62-92 load semantics: blank lines skipped, rows with no
  crawler_used filter every crawler).
- write_feed_jsonl: crawl output as one JSON object per line
  (exporters.py:5-26 JSON-lines feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gc_spark.schema import SEEN


def read_manifest_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines manifest → SEEN-shaped DataFrame (url_hash64 null; blank
    lines are dropped by the json reader; corrupt lines land in
    _corrupt_record and are filtered, mirroring the reference's per-line
    try/except tolerance)."""
    raw = spark.read.schema(
        "version_hash string, doc_name string, crawler_used string, access_timestamp string"
    ).json(path)
    return raw.filter(F.col("version_hash").isNotNull()).select(
        "version_hash",
        "doc_name",
        "crawler_used",
        "access_timestamp",
        F.lit(None).cast("long").alias("url_hash64"),
    )


def write_feed_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line (jsonlines feed exporter parity)."""
    df.write.mode("overwrite").json(path)
