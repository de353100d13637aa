"""Per-host politeness budget: top-k per host per micro-batch.

Models the reference's downloader caps (CONCURRENT_REQUESTS=10 with
DOWNLOAD_DELAY=0.1s per host-slot, runspider_settings.py:20-25) as a
deterministic drain rule: each micro-batch schedules at most
``budget_per_batch`` URLs per host, in crawl order
(priority ASC, depth ASC, seq ASC) — giving reproducible crawl ordering
(BASELINE.json north_rule) instead of Scrapy's runtime-dependent queue.

Skew handling (the 10^10 problem — a handful of hosts like
federalregister.gov dominate the frontier; executive_orders_spider.py:18-20
and sorn_spider.py:14-16 both hit it):
  plain `row_number().over(partitionBy(host))` funnels every pending URL of a
  hot host through one task. We run **two-phase top-k**: a salted partial
  rank caps each (host, salt) slice at k rows, then the exact rank runs over
  at most k*S survivors per host. The first window's partition count is
  host×S so no single reducer sees more than ~1/S of a hot host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["priority", "depth", "seq"]


def topk_per_host(
    pending: DataFrame,
    k: int,
    host_budgets: DataFrame | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Select the next `k` (or per-host override) URLs per host in crawl
    order. Returns the selected rows with their final per-host rank as
    `drain_rank` (1-based).

    host_budgets: optional small DataFrame (host, budget_per_batch) —
    broadcast-joined; hosts absent fall back to `k`.
    """
    from gc_spark.conf import tune_runtime

    tune_runtime(pending.sparkSession)
    order = [F.col(c).asc() for c in ORDER_COLS]

    if host_budgets is not None:
        pending = pending.join(
            F.broadcast(host_budgets.select("host", "budget_per_batch")), "host", "left"
        )
        budget = F.coalesce(F.col("budget_per_batch"), F.lit(k))
    else:
        budget = F.lit(k)

    # rank on a NUMERIC host key: string partition keys make the window sort
    # ~10x slower (measured 26.6s vs 2.9s on 8M rows at local[32])
    pending = pending.withColumn("_hkey", F.xxhash64("host"))

    # phase 1: salted partial top-k — bounds any single window partition
    salt = (F.col("seq") % salt_buckets).cast("int")
    w1 = Window.partitionBy(F.col("_hkey"), salt).orderBy(*order)
    partial = pending.withColumn("_prank", F.row_number().over(w1)).filter(
        F.col("_prank") <= budget
    )

    # phase 2: exact top-k over ≤ k*salt_buckets survivors per host
    w2 = Window.partitionBy("_hkey").orderBy(*order)
    out = (
        partial.withColumn("drain_rank", F.row_number().over(w2))
        .filter(F.col("drain_rank") <= budget)
        .drop("_prank", "_hkey")
    )
    if host_budgets is not None:
        out = out.drop("budget_per_batch")
    return out


def salted_repartition(df: DataFrame, partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Spread a host-keyed batch across executors so one hot host doesn't pin
    a single fetch task: partition on (host, seq % S)."""
    return df.repartition(partitions, F.col("host"), (F.col("seq") % salt_buckets).cast("int"))


def fairness_index(
    df: DataFrame,
    group_col: str,
    host_col: str = "host",
) -> DataFrame:
    """Jain's fairness index of per-host scheduled work within each group:
    J = (sum x)^2 / (n * sum x^2), 1.0 = perfectly even, 1/n = one host
    got everything. The scheduler-health diagnostic read after every drain
    batch: a politeness top-k that keeps J high is spreading budget; J
    collapsing toward 1/n means a hot host is monopolizing the batch
    (salting or budget caps needed — operators/traps.skew_profile says
    which). Two hash aggregates, group-sized output."""
    per_host = df.groupBy(group_col, host_col).agg(
        F.count(F.lit(1)).cast("double").alias("_x")
    )
    return per_host.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.round(
            (F.sum("_x") * F.sum("_x"))
            / (F.count(F.lit(1)) * F.sum(F.col("_x") * F.col("_x"))),
            6,
        ).alias("jain"),
    )


def delay_compliance(
    df: DataFrame,
    delay_col: str = "crawl_delay",
    host_col: str = "host",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Politeness-compliance audit from the fetch log: per host, the
    observed gaps between consecutive fetches vs the configured delay —
    the evidence a crawl operator shows a site owner ("we honored your
    Crawl-delay"), and the regression check after any scheduler change
    (q97 predicts the schedule; this verifies the execution). One lag
    window per host, one rollup.

    Returns (host, n_fetches, min_gap, violations, compliant); a gap
    strictly below the delay is a violation; single-fetch hosts are
    trivially compliant (no gap exists)."""
    w = Window.partitionBy(host_col).orderBy(ts_col, order_col)
    # timestamp_diff is pure wall-clock arithmetic on NTZ (and instant
    # arithmetic on LTZ) — no session-tz round-trip, so gaps spanning a
    # DST transition stay exact (casting through session-tz timestamp
    # would shift by the DST delta across the transition)
    t = F.col(ts_col)
    gap = F.timestamp_diff("MICROSECOND", F.lag(t).over(w), t) / F.lit(1000000.0)
    per = df.select(
        F.col(host_col).alias("host"),
        F.col(delay_col).alias("_d"),
        gap.alias("_gap"),
    )
    return per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.round(F.min("_gap"), 6).alias("min_gap"),
        F.sum(
            F.when(F.col("_gap") < F.col("_d"), 1).otherwise(0)
        ).alias("violations"),
        (F.sum(F.when(F.col("_gap") < F.col("_d"), 1).otherwise(0)) == 0).alias(
            "compliant"
        ),
    )


def round_robin_take(
    pending: DataFrame,
    k: int,
    host_col: str = "host",
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """Host-diversity frontier selection: take `k` URLs round-robin across
    hosts — every host's best URL before any host's second.

    The reference achieves per-site diversity structurally (one Scrapy
    process per spider, runCrawler.sh fans them out); a single distributed
    frontier needs it as an operator or a hot site monopolizes each
    micro-batch. Ordering: (within-host rank, host, url) — a total order,
    so the batch is deterministic.

    Scale shape: one per-host window (host-partitioned, the same grain the
    frontier is already stored on), a cheap `rank <= k` prune, then a
    global top-k via orderBy+limit — Spark plans TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows), NOT a full sort. The
    window partitions by a numeric xxhash64 host key (string partition
    keys sort ~10x slower; see topk_per_host).
    """
    w = Window.partitionBy(F.xxhash64(host_col)).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    return (
        pending.withColumn("rr_rank", F.row_number().over(w))
        .filter(F.col("rr_rank") <= k)  # prune before the global top-k
        .orderBy("rr_rank", host_col, url_col)
        .limit(k)
    )
