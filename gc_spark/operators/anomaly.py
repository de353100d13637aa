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
