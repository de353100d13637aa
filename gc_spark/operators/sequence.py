"""Deterministic distributed sequence assignment.

Discovery order (the `seq` column) is the engine's reproducible stand-in for
Scrapy's runtime queue position — it must be identical run-to-run AND not
funnel the whole batch through one task. `row_number()` over a global window
collapses to a single partition, so instead: **two-phase numbering, entirely
JVM-side** (round 1 used rdd.zipWithIndex, which deserialized every row
through Python and broke codegen/Arrow — the engine's #1 scale cost at 10^10
URLs):

  1. range-partition the batch by the order key (deterministic boundaries for
     identical input) and count rows per partition — a tiny driver-side
     aggregate (one long per partition);
  2. seq = partition_offset[pid] + (row_number within pid) - 1, where the
     per-pid window is parallel across partitions (never a single-partition
     global window).

Partition boundaries don't affect the numbering because the order is globally
total — only the (deterministic) sort order does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_dense_seq(
    df: DataFrame,
    order_cols: list[str],
    offset: int = 0,
    seq_col: str = "seq",
    partitions: int | None = None,
    track: list | None = None,
) -> DataFrame:
    """Assign seq = offset + 0-based rank in the total order of `order_cols`
    (which must be a unique key). Distributed: no single-partition window,
    no Python round-trip — the plan stays inside whole-stage codegen.

    BOTH the input and the post-shuffle frame are persisted: the input
    persist keeps the upstream pipeline (in the engine: the whole
    fetch+extract+dedup chain) at ONE execution even though the range
    partitioner's sampling pass and the shuffle pass each read it; the
    post-shuffle persist makes the counts job and the window job read the
    same MATERIALIZED partitioning — without it, a cache eviction under a
    nondeterministic upstream (live HTTP fetch) could let the two passes see
    different partition contents, silently duplicating/skipping seq values.
    Callers in a long-lived loop MUST pass `track` (a list the persisted
    frames are appended to) and unpersist after materializing downstream —
    relying on the ContextCleaner leaks storage across thousands of
    micro-batches until execution memory starves (observed as
    UNABLE_TO_ACQUIRE_MEMORY deep into the test suite)."""
    n = partitions or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    cols = [F.col(c) for c in order_cols]
    df = df.persist()
    arranged = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if track is not None:
        track.append(df)
        track.append(arranged)

    counts = {
        r["_pid"]: r["cnt"]
        for r in arranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    if not counts:
        return df.withColumn(seq_col, F.lit(offset).cast("long")).limit(0)

    acc = offset
    entries: list = []
    for pid in range(max(counts) + 1):
        entries += [F.lit(pid), F.lit(acc)]
        acc += counts.get(pid, 0)
    off_map = F.create_map(*entries)

    w = Window.partitionBy("_pid").orderBy(*[c.asc() for c in cols])
    return (
        arranged.withColumn(
            seq_col,
            (off_map[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_pid")
    )
