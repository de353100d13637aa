"""Recommended Spark session configuration for gc_spark at scale.

One place for the spill/skew/shuffle knobs so local tests, bench, and a real
1000-executor `spark-submit --py-files` deployment share the same tuning
rationale:

  - AQE on, with skew-join splitting: the frontier's host distribution is
    Zipf-like (a few .gov hosts dominate) — AQE splits oversized post-shuffle
    partitions that salting didn't catch.
  - shuffle partitions ~2x total cores: politeness windows + anti-joins are
    the only wide ops; AQE coalesces the excess at small scale.
  - 128 MB file partitions: parquet frontier/seen segments stay within
    executor memory at 10^10 rows (each row ~100 B ⇒ ~1.3 M rows/partition).
  - Arrow batch 10k (default) works for text; multimodal stages size their
    own batches against blob size (operators/multimodal.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable join/AQE tuning (r6, guide §3.1/§9): broadcast up to
# 64 MB relations (the frontier seen-set — ~10 MB of hashed keys per 1.3M
# URLs — must broadcast, not sort-merge; production executors at >=8 GB
# hold this trivially), and let the planner/AQE pick shuffled-hash joins
# so equi-joins skip the sort-merge sorts (partition sizes stay bounded by
# AQE coalescing, so the build side fits). Parameterised via env so a
# deployment can dial them; the values are size-based and hold at any
# scale factor — they are NOT local[32] tuning.
_BCAST = os.environ.get("GC_SPARK_BROADCAST_THRESHOLD", str(64 * 1024 * 1024))
RUNTIME_TUNING = {
    "spark.sql.autoBroadcastJoinThreshold": _BCAST,
    "spark.sql.adaptive.autoBroadcastJoinThreshold": _BCAST,
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": _BCAST,
}

_TUNED_SESSIONS: set[int] = set()


def tune_runtime(spark: SparkSession) -> None:
    """Apply RUNTIME_TUNING once per session — called from the hot entry
    points (table scans, politeness top-k, the crawl engine) so sessions
    built elsewhere (the frozen bench, notebooks) still get the join
    tuning without owning session construction."""
    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark)
    if key in _TUNED_SESSIONS:
        return
    for k, v in RUNTIME_TUNING.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover — read-only conf in odd envs
            pass
    _TUNED_SESSIONS.add(key)


SCALE_DEFAULTS = {
    **RUNTIME_TUNING,
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # long-lived drivers (a crawl is thousands of micro-batches): bound the
    # app/SQL status stores — by default they retain up to 1000 executions,
    # each holding the FULL physical-plan description string, and the
    # engine's per-batch AQE plans run to megabytes of text. Unbounded, that
    # is a driver-heap leak (observed as java.lang.OutOfMemoryError ~20k
    # stages into a single-JVM session).
    "spark.sql.ui.retainedExecutions": "50",
    "spark.ui.retainedJobs": "200",
    "spark.ui.retainedStages": "500",
}


def build_session(
    master: str | None = None,
    app_name: str = "gc_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """Session with the scale defaults. On a cluster, pass master=None and
    let spark-submit own deployment; locally pass cores for local[N]."""
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    elif cores:
        b = b.master(f"local[{cores}]")
    if shuffle_partitions is None and cores:
        shuffle_partitions = max(cores * 2, 8)
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in {**SCALE_DEFAULTS, **(extra or {})}.items():
        b = b.config(k, v)
    return b.getOrCreate()
