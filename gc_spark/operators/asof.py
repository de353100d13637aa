"""As-of (most-recent-state) join — attach the latest right-side state at
or before each left row's timestamp, per key.

The crawl engine needs this shape constantly: which robots.txt snapshot
governed THIS fetch, which per-host budget was in force, which manifest
generation a document was deduped against. The reference sidesteps it by
re-reading current state per run (manifest loaded once per crawl,
GCSpider start); at web scale state is a slowly-changing dimension table
and fetches must join against the version in force *at their own time*.

Spark has no ASOF join operator; the naive encodings are a range join
(O(n·m) without an interval index) or a per-key correlated subquery. The
scalable encoding is union + ordered window carry-forward:

  1. tag right rows side=0, left rows side=1, union on (key, ts, side);
  2. ONE shuffle on key, sort within partition by (ts, side) — right rows
     sort before left rows at equal ts, giving inclusive (<=) semantics;
  3. last(col, ignorenulls=True) over the running window carries each
     right column forward to every following left row;
  4. keep side=1 rows.

Cost: one shuffle + one sort over |left| + |right| — the same cost as the
equi-join you'd pay anyway, regardless of how many state versions a key
has. Skewed keys (one host with 10^8 fetches) sort within one partition;
if that bites, pre-split by (key, ts-bucket) upstream and carry the last
state of the previous bucket in — the operator composes with that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus `right_cols` from the latest
    right row with right.ts <= left.ts for the same `on` key (NULLs when no
    right row precedes). The right timestamp itself is attached as
    `asof_ts`. Right rows must be unique per (on, right_ts) — pre-aggregate
    ties upstream, otherwise which tie wins is unspecified."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_cols = left.columns
    lhs = left.select(
        *l_cols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    rhs = right.select(
        F.col(on),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
            if c != on
        ],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *l_cols,
        "_side",
        F.last("_rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
