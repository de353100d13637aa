"""Skew-aware aggregation helpers.

Plain sums/counts don't need these — Spark's partial (map-side) aggregation
already collapses hot keys before the shuffle, and AQE splits skewed join
partitions (conf.py enables both). The operators here cover the cases where
built-in partial aggregation CAN'T help because the aggregation state is a
SET, and a hot key would funnel its entire value stream through one reducer:

  - salted_distinct_count: exact COUNT(DISTINCT v) per key at 10^10 rows.
    Phase 1 groups on (key, salt) where salt = hash(value) % buckets, so a
    hot key's values spread over `buckets` reducers and each bucket dedups
    its own value range (hash-partitioning by value makes the buckets
    disjoint — no double counting). Phase 2 sums the per-bucket distinct
    counts — `buckets` rows per key, trivially small.

Same pattern as the politeness top-k's two-phase salting
(operators/politeness.py) — salt on the EXPLODING dimension, never the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key distinct-value count via value-hash salting: the hot
    key's shuffle payload splits across `buckets` reducers; correctness is
    exact because a value always lands in the same bucket."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets))
    per_bucket = (
        df.groupBy(*key_cols, salt.alias("_salt"))
        .agg(F.countDistinct(value_col).alias("_n"))
    )
    return (
        per_bucket.groupBy(*key_cols)
        .agg(F.sum("_n").cast("bigint").alias(out_col))
    )
