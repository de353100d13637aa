"""Byte-range coalescing: merge overlapping/adjacent fetch ranges per blob.

Media re-fetch after a partial failure (and segmented video/audio pulls)
produces many small byte ranges per media_ref; issuing them as-is wastes a
round-trip per range and hammers hosts. Before the fetch wave, coalesce
ranges that overlap or sit within `gap` bytes of each other into one
request — the classic gaps-and-islands computation, fully native:

  1. window per key ordered by (start, end)
  2. a row starts a new island iff start > running_max(end) + gap
  3. running sum of the island flags = island id
  4. groupBy (key, island) -> min(start), max(end), count

Scale shape: one shuffle (the window partitionBy key == the groupBy key, so
the aggregation reuses the window's partitioning — AQE keeps it a single
Exchange). Per-key range counts are small (requests per blob), so window
state is bounded; keys are media blobs, naturally high-cardinality, so no
skew. Everything is whole-stage-codegen window + hash-agg.

Reference basis: the reference downloads whole files per request
(gamechanger-crawlers' file pipeline); range planning is what replaces it
when a 100 TB media corpus is pulled incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_ranges(
    df: DataFrame,
    key: str = "media_ref",
    start: str = "start",
    end: str = "end",
    gap: int = 0,
) -> DataFrame:
    """Merge [start, end) ranges per `key` that overlap or are within `gap`
    bytes. Returns (key, start, end, n_ranges) — one row per coalesced
    request, n_ranges = how many raw ranges it absorbed."""
    w = Window.partitionBy(key).orderBy(start, end)
    run_max = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        run_max.isNull() | (F.col(start) > run_max + F.lit(gap)), 1
    ).otherwise(0)
    island = F.sum(new_island).over(w)
    return (
        df.select(F.col(key), F.col(start), F.col(end), island.alias("_island"))
        .groupBy(key, "_island")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count(F.lit(1)).alias("n_ranges"),
        )
        .drop("_island")
    )
