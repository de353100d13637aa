"""First-order Markov transition model over crawl/fetch sequences.

"After fetching from host A, which host does a session hit next?" — the
navigation prior a frontier scheduler uses to pre-warm politeness budgets
and to seed discovery (the reference's spiders encode this statically as
per-site start_urls -> listing -> detail page chains; a web-scale frontier
has to LEARN the chain from its own fetch log). The model is the
transition matrix P(dst | src) estimated from consecutive events within a
session, kept as the top-N next-states per source.

Scale shape: one lead() window partitioned by the session key — the
partitioning the fetch log already carries — then a (src, dst) count with
map-side combine. Everything after the window runs on the state-pair
aggregate (|states|^2 rows at most), never on the log. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    df: DataFrame,
    session_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """(src, dst, n_trans) over consecutive in-session state pairs.
    Self-transitions are kept — a repeat fetch from the same host is a
    real (and scheduling-relevant) event."""
    w = Window.partitionBy(session_col).orderBy(*order_cols)
    return (
        df.select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_trans"))
    )


def transition_model(
    counts: DataFrame,
    top_n: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Row-normalized top-N transitions per source: (src, dst, n_trans, p,
    rnk). Ties break to the lexically smaller dst so the cut is
    deterministic in every engine."""
    tot = Window.partitionBy("src")
    rnk = Window.partitionBy("src").orderBy(
        F.col("n_trans").desc(), F.col("dst")
    )
    return (
        counts.withColumn(
            "p",
            F.round(
                F.col("n_trans").cast("double") / F.sum("n_trans").over(tot), round_digits
            ),
        )
        .withColumn("rnk", F.row_number().over(rnk))
        .where(F.col("rnk") <= top_n)
        .select("src", "dst", "n_trans", "p", "rnk")
    )
