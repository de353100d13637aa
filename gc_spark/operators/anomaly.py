"""Robust per-host response-size anomaly detection: median/MAD z-scores.
A fetched body whose size sits far from its host's typical size is the
cheap first-pass signal for soft errors the status code hides — truncated
responses, error pages served as 200 (complements operators/soft404's
fingerprint concentration), and accidental binary/HTML mixups. Median +
MAD instead of mean/stddev because crawl size distributions are heavy-
tailed and a few huge pages would swallow the signal (robust statistics —
standard public practice, e.g. Leys et al. 2013 on MAD outliers).

flag |x - median| / MAD > threshold, with the 1.4826 normal-consistency
constant so the threshold reads in sigma units.

Scale shape: two grouped aggregates on the host key (median, then MAD as
the median of |x - median| after one broadcast-shaped equi-join back) and
a map-side flag pass. Exact `percentile` is the verifier form; at 10^10
rows swap approx_percentile (t-digest, mergeable) for both medians — the
same exact-vs-sketch split documented on q45.

Hosts where MAD = 0 (all sizes identical) flag any deviation at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_K = 1.4826


def size_anomalies(
    df: DataFrame,
    size_col: str = "size",
    host_col: str = "host",
    id_col: str = "url",
    threshold: float = 3.0,
) -> DataFrame:
    """(host, id, size, med, mad_sigma, z, is_anomaly) per fetched row.
    z is null when the host's MAD is 0 and the size equals the median;
    any deviation on a MAD-0 host is flagged."""
    x = F.col(size_col).cast("double")
    med = df.groupBy(host_col).agg(
        F.expr(f"percentile({size_col}, 0.5)").alias("_med")
    )
    dev = df.join(med, host_col).select(
        F.col(host_col),
        F.col(id_col),
        x.alias("_x"),
        F.col("_med"),
        F.abs(x - F.col("_med")).alias("_adev"),
    )
    mad = dev.groupBy(host_col).agg(
        F.expr("percentile(_adev, 0.5)").alias("_mad")
    )
    sigma = F.col("_mad") * MAD_K
    z = F.when(sigma > 0, F.col("_adev") / sigma)
    return (
        dev.join(mad, host_col)
        .select(
            F.col(host_col).alias("host"),
            F.col(id_col).alias("id"),
            F.col("_x").alias("size"),
            F.round("_med", 4).alias("med"),
            F.round(sigma, 4).alias("mad_sigma"),
            F.round(z, 4).alias("z"),
            F.when(sigma > 0, z > threshold)
            .otherwise(F.col("_adev") > 0)
            .alias("is_anomaly"),
        )
    )


def cusum_alarms(
    df: DataFrame,
    x_col: str,
    host_col: str = "host",
    ts_col: str = "ts",
    order_col: str = "event_id",
    k_ref: float = 0.25,
    h_threshold: float = 3.0,
) -> DataFrame:
    """One-sided CUSUM change detection per host over an ordered event
    stream — catches a host whose failure rate DRIFTS up (gradual ban,
    rot, throttling) long before the mean over the whole history moves;
    the sequential complement to the EWMA level estimate (operators/ewma)
    and the MAD point-outlier flags above (public method: Page 1954).

    The textbook recursion S_i = max(0, S_{i-1} + x_i - k) is sequential,
    which would force a per-host Python fold; instead use its closed form
        S_i = C_i - min(0, min_{j<=i} C_j),   C = running sum of (x - k),
    (max-drawup identity) so the whole statistic is two window functions —
    pure JVM, one shuffle on the host key, no UDF, no iteration.

    Returns (host, n_events, max_stat, n_alarms, first_alarm) where
    first_alarm is the order_col value of the earliest S_i >= h.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(host_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = F.sum(F.col(x_col) - F.lit(k_ref)).over(w)
    staged = df.select(
        F.col(host_col).alias("host"),
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
        c.alias("_c"),
    ).withColumn(
        "_s",
        # the running-min window must walk rows in the SAME (ts, order)
        # sequence as the cumsum window or the closed form breaks
        F.col("_c")
        - F.least(
            F.lit(0.0),
            F.min("_c").over(
                Window.partitionBy("host")
                .orderBy("_ts", "_ord")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ),
    )
    alarm = F.col("_s") >= h_threshold
    return staged.groupBy("host").agg(
        F.count("*").alias("n_events"),
        F.round(F.max("_s"), 6).alias("max_stat"),
        F.sum(alarm.cast("int")).alias("n_alarms"),
        F.min(F.when(alarm, F.col("_ord"))).alias("first_alarm"),
    )
