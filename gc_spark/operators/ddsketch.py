"""DDSketch — mergeable quantiles with a relative-error guarantee.

The crawl pipeline reports latency/size quantiles everywhere (the
reference's ops dashboards read p50/p95 fetch latency off its manifest
rows; our q45/q144 compute exact percentiles). Exact percentiles need a
full sort per rollup; percentile_approx is neither mergeable across days
nor error-bounded in VALUE. DDSketch (Masson, Rim, Lee — VLDB'19) buckets
values into geometric bins i = ceil(log_gamma(x)) with
gamma = (1+alpha)/(1-alpha): any returned quantile is within relative
error alpha of the true value, and sketches MERGE by summing bucket
counts — a day's sketch is ~hundreds of (bucket, cnt) rows, so the
90-day p99 never rescans the fetch log.

Scale shape: the build is ONE groupBy (group, bucket) with map-side
combine — shuffle volume is groups x occupied-buckets, never rows. The
quantile read is a window over the bucket table (tiny). Everything is
JVM-native expressions.

Cross-engine determinism: the bucket index uses
ceil(round(ln(x)/ln(gamma), 9)) — the round-to-9 quantization absorbs
libm ulp differences so Spark and the DuckDB oracle bin identically (the
same discipline as the kmeans round-6 trajectory); bucket->value uses
round(2*gamma^i/(gamma+1), 6).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gamma_of(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(col, alpha: float):
    """Geometric bucket index for a positive value column."""
    g = gamma_of(alpha)
    return F.ceil(F.round(F.log(col) / F.lit(math.log(g)), 9)).cast("int")


def ddsketch_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    alpha: float = 0.01,
) -> DataFrame:
    """(group..., bucket, cnt) — the mergeable sketch. Non-positive values
    are excluded (geometric bins are defined for x > 0; callers route
    zeros to an exact side-count if they need them)."""
    x = F.col(value_col).cast("double")
    return (
        df.where(x > 0)
        .select(*group_cols, dd_bucket(x, alpha).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def ddsketch_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two sketches: union + re-sum. Associative and commutative."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def ddsketch_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    alpha: float = 0.01,
) -> DataFrame:
    """Per (group, q): n, est_q. Rank rule: the ceil(q*n)-th smallest
    (1-based, floor at 1); est_q is the bucket midpoint 2*gamma^i/(gamma+1)
    — within alpha relative error of the true rank-th value."""
    g = gamma_of(alpha)
    tot = sketch.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    probes = tot.select(
        *group_cols,
        "n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn(
        "rnk",
        F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n")).cast("long")),
    )
    cum = sketch.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(*group_cols).orderBy("bucket")
        ),
    )
    picked = (
        probes.join(cum, group_cols)
        .where(F.col("cum") >= F.col("rnk"))
        .groupBy(*group_cols, "q", "n")
        .agg(F.min("bucket").alias("b"))
    )
    est = F.round(
        F.lit(2.0) * F.pow(F.lit(g), F.col("b")) / F.lit(g + 1.0), 6
    )
    return picked.select(*group_cols, "q", "n", est.alias("est_q"))
