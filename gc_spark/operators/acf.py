"""Lag-k autocorrelation (ACF) per series key — periodicity detection
for recrawl scheduling.

recrawl.py estimates IF a page changes (Poisson rate); the ACF detects
WHEN: strong autocorrelation at lag 24 (hourly grain) or lag 7 (daily
grain) in a host's change/traffic series is the signature of scheduled
publishing, and the scheduler should align revisits to the cycle instead
of spreading them uniformly. Standard sample ACF (Box & Jenkins):

    r_k = sum_{t=k+1..n} (y_t - ybar)(y_{t-k} - ybar)
          / sum_{t=1..n} (y_t - ybar)^2

with the denominator over the FULL series (the positive-semidefinite
estimator every stats package uses).

Scale shape: sequential-within-key, parallel-across-keys — the same
contract as holt.py. ONE window pass (partitionBy key, orderBy t)
produces every requested lag column at once, an unpivot turns lags into
rows, and one groupBy(key, lag) plus a key-grain stats join finishes.
Series length is bounded by the upstream time-window grain; no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def acf(
    df: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    y_col: str = "y",
    lags: Sequence[int] = (1, 2, 3),
    round_digits: int = 6,
) -> DataFrame:
    """(key, lag, n_pairs, r) for each requested lag; r is NULL for a
    constant series (zero variance). A series SHORTER than the lag
    produces no surviving pairs, so that (key, lag) row is OMITTED from
    the output entirely (not emitted with NULL r) — callers wanting a
    dense lag grid should left-join this result onto their lag list
    (ADVICE r5: docstring previously claimed a NULL row)."""
    lags = sorted(set(int(k) for k in lags))
    if not lags or lags[0] < 1:
        raise ValueError("lags must be positive integers")

    y = F.col(y_col).cast("double")
    stats = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.avg(y).alias("_mean")
    )
    # centered sum of squares via a second pass to avoid the raw-sum
    # cancellation featcorr.py documents: join the mean back and re-sum
    centered = (
        df.join(stats.select("_k", "_mean"), F.col(key_col) == F.col("_k"))
        .groupBy("_k")
        .agg(F.sum((y - F.col("_mean")) * (y - F.col("_mean"))).alias("_ss"))
    )

    w = Window.partitionBy(key_col).orderBy(t_col)
    lagged = df.select(
        F.col(key_col),
        y.alias("_y"),
        *[F.lag(y, k).over(w).alias(f"_yl{k}") for k in lags],
    )
    pairs = lagged.select(
        F.col(key_col),
        "_y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"_yl{k}").alias("_yp")
                    )
                    for k in lags
                ]
            )
        ).alias("_lp"),
    ).select(
        F.col(key_col),
        "_y",
        F.col("_lp")["lag"].alias("lag"),
        F.col("_lp")["_yp"].alias("_yp"),
    )

    num = (
        pairs.where(F.col("_yp").isNotNull())
        .join(stats, F.col(key_col) == F.col("_k"))
        .groupBy(key_col, "lag")
        .agg(
            F.sum(
                (F.col("_y") - F.col("_mean"))
                * (F.col("_yp") - F.col("_mean"))
            ).alias("_num"),
            F.count("*").alias("n_pairs"),
        )
    )
    return num.join(centered, num[key_col] == centered["_k"]).select(
        num[key_col],
        "lag",
        "n_pairs",
        F.when(
            F.col("_ss") > 0,
            F.round(F.col("_num") / F.col("_ss"), round_digits),
        ).alias("r"),
    )
