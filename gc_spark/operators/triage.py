"""Fetch-failure triage — route every failed fetch to retry or dead-letter.

The reference drops failures into a dead-queue CSV with the raw response
code (gamechanger-crawlers' dead-letter handling around its download
middleware; our S10 twin in plans/drain.py writes the same sink). At
frontier scale the queue needs POLICY, not just a sink: permanent
failures (4xx) must never burn retry budget, transient ones (5xx,
network timeouts) retry with backoff until an attempt ceiling, and the
scheduler wants the per-host bill for all of it — how much of the next
batch is re-work.

Policy lattice: 2xx -> ok; 4xx -> dead_permanent (retrying a 404 is pure
waste); 5xx / status 0 (network-level: timeout, reset, DNS) -> retry
while attempts < max_attempts, else dead_exhausted.

Scale shape: the verdict is a map-side CASE; the rollup is ONE host-keyed
aggregate of conditional sums (no pivot shuffle). retry_budget_sec prices
the retry queue with the same capped exponential the backoff scheduler
(operators/eta.retry_backoff) uses, so the rollup and the schedule agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triage_action(
    status_col: str = "status",
    attempts_col: str = "attempts",
    max_attempts: int = 4,
):
    """The verdict column: ok / dead_permanent / retry / dead_exhausted."""
    s = F.col(status_col)
    return (
        F.when((s >= 200) & (s < 300), F.lit("ok"))
        .when((s >= 400) & (s < 500), F.lit("dead_permanent"))
        .when(F.col(attempts_col) < max_attempts, F.lit("retry"))
        .otherwise(F.lit("dead_exhausted"))
    )


def triage_rollup(
    df: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    attempts_col: str = "attempts",
    max_attempts: int = 4,
    base_sec: float = 1.0,
    cap_sec: float = 60.0,
) -> DataFrame:
    """(host, n_ok, n_dead_permanent, n_retry, n_dead_exhausted,
    retry_budget_sec): the per-host re-work bill. retry_budget_sec sums
    min(base * 2^attempts, cap) over the retry rows — integer-power
    arithmetic, engine-exact."""
    act = triage_action(status_col, attempts_col, max_attempts)
    backoff = F.least(
        F.lit(base_sec) * F.pow(F.lit(2.0), F.col(attempts_col)),
        F.lit(cap_sec),
    )
    one_if = lambda v: F.sum(F.when(act == v, 1).otherwise(0))  # noqa: E731
    return df.groupBy(host_col).agg(
        one_if("ok").alias("n_ok"),
        one_if("dead_permanent").alias("n_dead_permanent"),
        one_if("retry").alias("n_retry"),
        one_if("dead_exhausted").alias("n_dead_exhausted"),
        F.round(
            F.coalesce(
                F.sum(F.when(act == "retry", backoff)), F.lit(0.0)
            ),
            6,
        ).alias("retry_budget_sec"),
    )
