"""Bucketed table layout — pre-shuffled, pre-sorted storage so repeating
joins/aggregations on a stable key skip their Exchange entirely.

The crawl engine's hottest joins recur every batch on the same keys:
seen-set anti-join on url_hash64 (F1/J1), frontier-vs-fetch-log, LSH
index appends on (band, band_hash). At 10^10 URLs the big side of each
is corpus-scale; re-hashing it per micro-batch is the dominant shuffle.
Writing both sides `bucketBy(N, key)` + `sortBy(key)` once means every
subsequent sort-merge join reads co-located buckets: zero Exchange —
the test pins this plan shape. (The per-task in-bucket Sort survives:
Spark only trusts bucket sort metadata with exactly one file per bucket
and the legacy outputOrdering flag; it is memory-local and negligible
next to the eliminated network shuffle.)

Bucket count sizing: buckets are per-writer-task files, so N should be
chosen once for the table's lifetime at target scale (e.g. 2^13 for a
10^10-row seen table → ~1.2M rows/bucket) — NOT per-batch. Appends with
the same bucket spec keep the layout valid; Spark validates the spec on
write.

Uses the session catalog (in-memory or Hive alike) with an explicit
external `path`, so data lives next to the SnapshotStore warehouse and
survives catalog loss — re-registering is a CREATE TABLE ... USING
parquet with the same bucket spec.

Reference basis: the reference re-reads its full manifest per run
(gamechanger-crawlers' previous-manifest anti-join); bucketing is the
Spark-native way to make that rescan join-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and bucket-sorted) external parquet table."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols is None:
        sort_cols = bucket_cols
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table — the scan reports the bucket spec to the
    planner, which is what lets downstream joins drop their Exchange."""
    return spark.table(table)
