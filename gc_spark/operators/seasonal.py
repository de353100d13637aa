"""Additive seasonal decomposition per series key — the classical
moving-average method (the STL-lite every stats package ships as
`seasonal_decompose`).

acf.py DETECTS the publishing cycle; this operator QUANTIFIES it:
y = trend + seasonal + residual, where trend is the centered
period-length moving average, seasonal is the phase-mean of the
detrended series, and the variance share the seasonal component
explains is the "is this host actually periodic" gate the recrawl
aligner needs before trusting the cycle.

    trend_t    = avg(y_{t-h} .. y_{t+h}),  h = period // 2  (full
                 windows only — edges drop, the textbook convention)
    seasonal_p = avg(y_t - trend_t  |  t mod period = p)
    explained  = 1 - var(detrended - seasonal) / var(detrended)

Scale shape: sequential-within-key, parallel-across-keys (the
holt/acf contract — series bounded by the upstream time grain). One
centered-window pass per key, one (key, phase) groupBy, one key-grain
variance aggregate; the phase table joins back at (key, phase) grain.
No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def seasonal_decompose_phase(
    df: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    y_col: str = "y",
    period: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """(key, phase, n, seasonal, var_explained) — one row per (series,
    phase in 0..period-1) present in the interior (full-window) region;
    var_explained is the same key-grain scalar on each of the key's
    rows, NULL for a series whose detrended variance is 0. period must
    be odd so the centered window is symmetric."""
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be odd and >= 3")
    h = period // 2
    y = F.col(y_col).cast("double")
    w = (
        Window.partitionBy(key_col)
        .orderBy(t_col)
        .rowsBetween(-h, h)
    )
    det = (
        df.select(
            F.col(key_col).alias("_k"),
            (F.col(t_col) % period).alias("phase"),
            y.alias("_y"),
            F.avg(y).over(w).alias("_trend"),
            F.count("*").over(w).alias("_wn"),
        )
        .where(F.col("_wn") == period)  # full windows only
        .select("_k", "phase", (F.col("_y") - F.col("_trend")).alias("_d"))
        # feeds the phase means, the residual join and the variance
        # aggregate: materialize lazily, once
        .localCheckpoint(eager=False)
    )
    seas = det.groupBy("_k", "phase").agg(
        F.avg("_d").alias("_s"), F.count("*").alias("n")
    )
    resid = det.join(seas, ["_k", "phase"]).select(
        "_k", "_d", (F.col("_d") - F.col("_s")).alias("_r")
    )
    var = resid.groupBy("_k").agg(
        F.var_pop("_d").alias("_vd"), F.var_pop("_r").alias("_vr")
    )
    r = round_digits
    return seas.join(var, "_k").select(
        F.col("_k").alias(key_col),
        "phase",
        "n",
        F.round("_s", r).alias("seasonal"),
        F.when(
            F.col("_vd") > 0,
            F.round(F.lit(1.0) - F.col("_vr") / F.col("_vd"), r),
        ).alias("var_explained"),
    )
