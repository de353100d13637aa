"""Fetch-log sessionization — gaps-and-islands over per-host fetch times.

A crawl log is analyzed in *visits*: bursts of fetches against one host
separated by idle gaps (politeness sleeps within a visit are seconds; the
scheduler coming BACK to a host is minutes-to-days). Cutting the log into
sessions at gaps > `gap_sec` yields the per-visit grain that host-health
dashboards and recrawl planners consume: how many distinct visits, how
long each lasted, how many fetches per visit — the observed counterpart
of the planned drain waves in operators/eta.schedule_eta.

Classic gaps-and-islands: one lag window per host marks rows whose gap
from the previous fetch exceeds the cutoff, a running sum of those marks
numbers the sessions, and a groupBy rolls sessions up. Session membership
is tie-safe by construction — equal timestamps have gap 0 and can never
open a session, so the result is invariant to the ordering of ties.

Scale shape: ONE shuffle on host, total — the (host, session) rollup's
clustering requirement is satisfied by the window's host hash
partitioning (grouping keys are a superset), so EnsureRequirements
inserts NO second exchange and both windows share one sort
(plan-asserted in the test). Hosts hot
enough to skew a partition are exactly the hosts the politeness salter
(operators/politeness) already profiles via traps.skew_profile.

No reference twin: the reference's stats are per-run counters
(SURVEY.md A1-A4); visit-grain log analytics is the scheduler-facing
generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    fetch_log: DataFrame,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """fetch_log rows + (session_seq): 1-based visit number per host.

    `ts_col` is epoch seconds (long/double). A row opens a new session when
    it is the host's first fetch or follows the previous fetch by more than
    `gap_sec` seconds.
    """
    w = Window.partitionBy(host_col).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    opens = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    run = Window.partitionBy(host_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return fetch_log.select(
        "*", F.sum(opens).over(run).cast("long").alias("session_seq")
    )


def session_stats(
    fetch_log: DataFrame,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """(host, session_seq, n_fetches, t_start, t_end, duration_sec) per
    visit — the rollup consumers actually read. Duration is last-minus-
    first fetch within the visit (a single-fetch visit has duration 0)."""
    s = sessionize(fetch_log, host_col, ts_col, gap_sec)
    return s.groupBy(host_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.min(ts_col).cast("long").alias("t_start"),
        F.max(ts_col).cast("long").alias("t_end"),
        (F.max(ts_col) - F.min(ts_col)).cast("long").alias("duration_sec"),
    )
