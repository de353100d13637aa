"""Fetch-schedule ETA: when will each frontier URL actually be fetched?

Politeness turns the frontier into per-host queues drained `connections`
at a time with `crawl_delay` seconds between waves — so a 1M-URL host with
delay 2s and 2 connections takes ~11.6 days no matter how many executors
exist. Surfacing that BEFORE the crawl (per-URL ETA, per-host makespan)
is what lets an operator rebalance budgets (pagerank.allocate_budgets /
robots crawl-delay budgets) instead of discovering the long pole days in.

ETA model: within each host, URLs rank by priority; wave = floor(rank /
connections); eta_sec = wave * delay. Closed-form per row after one rank
window per host — the same window shape as politeness.topk_per_host, and
at production scale the same two-phase salted ranking applies when a
single host dominates a partition (operators/politeness.py holds that
machinery; this module keeps the plain window and is fed post-budget
frontiers, which are already host-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_eta(
    frontier: DataFrame,
    host_col: str = "host",
    order_cols: tuple = ("priority", "url"),
    delay_col: str | None = None,
    connections: int = 2,
    default_delay: float = 1.0,
) -> DataFrame:
    """frontier + (wave, eta_sec): the politeness-respecting fetch time of
    every URL, deterministic given the (priority, url) drain order. Pass
    `delay_col` for per-host crawl delays (robots.parse_crawl_delay);
    otherwise `default_delay` applies everywhere."""
    w = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in order_cols])
    delay = F.col(delay_col) if delay_col else F.lit(default_delay)
    wave = F.floor((F.row_number().over(w) - 1) / connections)
    return frontier.select(
        "*",
        wave.cast("long").alias("wave"),
        (wave * delay).cast("double").alias("eta_sec"),
    )


def host_makespan(eta: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, n_urls, makespan_sec): the drain completion time per host —
    the long-pole report. Same-key aggregate over schedule_eta's output, so
    it reuses the window's partitioning (no second Exchange)."""
    return eta.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.max("eta_sec").alias("makespan_sec"),
    )


def retry_backoff(
    df: DataFrame,
    base_sec: float = 1.0,
    cap_sec: float = 60.0,
    max_attempts: int = 5,
    url_col: str = "url",
    attempts_col: str = "attempts",
    salt: str = "bo",
) -> DataFrame:
    """Failure-path scheduling: capped exponential backoff with
    DETERMINISTIC half-jitter per URL — backoff = min(cap, base·2^n) ·
    (0.5 + 0.5·jitter(url)), jitter from the salted url hash, so retries
    of a failing host spread out (thundering-herd avoidance, public
    practice: exponential backoff with jitter) while re-planned batches
    reproduce the exact same schedule (no rand(): a speculative re-run of
    the task can't disagree with the original). give_up flags URLs at the
    attempt ceiling for the dead-letter path (plans/drain dead_letter).

    Map-side only — rides the fetch-log scan. Complements schedule_eta
    (the success-path politeness ETA)."""
    from gc_spark.operators.text_dedup import sha60_col

    n = F.col(attempts_col)
    raw = F.least(F.lit(cap_sec), F.lit(base_sec) * F.pow(F.lit(2.0), n))
    jitter = (
        sha60_col(F.concat(F.lit(salt + "|"), F.col(url_col))) % 1000
    ) / 1000.0
    return df.select(
        F.col(url_col),
        n.alias("attempts"),
        F.round(raw * (0.5 + 0.5 * jitter), 6).alias("backoff_sec"),
        (n >= max_attempts).alias("give_up"),
    )


def bandwidth_windows(
    fetch_log: DataFrame,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    bytes_col: str = "nbytes",
    window_sec: int = 60,
    cap_bytes_per_sec: float | None = None,
) -> DataFrame:
    """Per-host throughput accounting in fixed time windows: (host,
    window_start, n_fetches, total_bytes, bytes_per_sec[, over_cap]) —
    the observed counterpart of the crawl-delay budget (q63) on the BYTES
    axis: politeness bounds request RATE, this audits whether the bytes
    those requests moved exceed a per-host bandwidth cap (an egress
    budget, a courtesy cap for small origins).

    Fixed windows (floor(ts/window)) rather than sessions: windows are
    mergeable across partitions and micro-batches exactly like the
    histogram sketch — ONE (host, window) aggregate, map-side combined,
    no window function at all."""
    win = (F.floor(F.col(ts_col) / window_sec) * window_sec).cast("long")
    agg = fetch_log.groupBy(
        F.col(host_col), win.alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(bytes_col).cast("long").alias("total_bytes"),
    )
    out = agg.select(
        "*",
        F.round(F.col("total_bytes") / float(window_sec), 6).alias(
            "bytes_per_sec"
        ),
    )
    if cap_bytes_per_sec is not None:
        out = out.select(
            "*",
            (F.col("bytes_per_sec") > cap_bytes_per_sec)
            .cast("int")
            .alias("over_cap"),
        )
    return out
