"""Poisson bootstrap — distributed confidence intervals for pipeline metrics.

Every rollup this engine reports (per-spider counters, quality scores,
crawl throughput) is a point estimate; a production gate needs error
bars. The classical bootstrap resamples n rows WITH replacement B times —
impossible to do literally on a distributed table. The Poisson bootstrap
(Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012; Kleiner et al.'s BLB is the related bag-of-little-bootstraps)
replaces multinomial resampling with an independent Poisson(1) weight per
(row, replica): each row contributes w_b copies to replica b, and the
replica means' spread estimates the sampling distribution.

Scale shape: the replica fan-out (x B) happens INSIDE a map task and
collapses immediately via partial aggregation — shuffle volume is
(groups x B) partial sums, never rows x B. Weights are deterministic
(sha256-derived uniforms -> inverse Poisson CDF as a when-chain), so
reruns and the SQL oracle agree bit-for-bit. CI bounds are order
statistics of the B replica means (rank-based, no interpolation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# P(Poisson(1) <= k) for k = 0..8; u above the last entry maps to 9.
_POIS1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988747974021,
]


def uniform01_col(key: Column, salt: str) -> Column:
    """Deterministic uniform in (0,1) from a sha256 prefix — the same
    portable kernel the sampling operators use, reproducible in SQL."""
    h = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt + "|"), key.cast("string")), 256), 1, 15),
        16,
        10,
    ).cast("long")
    return ((h % 1000000) + 0.5) / 1000000.0


def poisson1_col(u: Column) -> Column:
    """Inverse CDF of Poisson(1) as a when-chain over a uniform."""
    expr = F.lit(9)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        expr = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    B: int = 200,
    lo_rank: int = 5,
    hi_rank: int = 196,
    salt: str = "bs",
) -> DataFrame:
    """Per group: (mean, ci_lo, ci_hi, n) where ci bounds are the
    lo_rank-th / hi_rank-th smallest of B Poisson-bootstrap replica
    means (defaults approximate a 95% interval at B=200)."""
    # The B-fold fan-out (and its per-replica sha256) happens map-side in
    # whatever parallelism the input arrives with; a filtered single-file
    # scan arrives as ONE task and serializes ~rows*B hash evaluations
    # (guide §2.5 input skew / §1.2 per-task work). Spread it first when —
    # and only when — the input is narrower than the cluster: at scale the
    # scan already has more splits than cores and this is a no-op.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    rep = df.select(
        *group_cols,
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("double").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("_b"),
    )
    u = uniform01_col(
        F.concat(F.col("_b").cast("string"), F.lit("|"), F.col("_id").cast("string")),
        salt,
    )
    weighted = rep.withColumn("_w", poisson1_col(u))
    means = weighted.groupBy(*group_cols, "_b").agg(
        (F.sum(F.col("_w") * F.col("_v")) / F.sum("_w")).alias("_m")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_m"), F.col("_b"))
    ranked = means.withColumn("_rn", F.row_number().over(w))
    bounds = (
        ranked.filter(F.col("_rn").isin(lo_rank, hi_rank))
        .groupBy(*group_cols)
        .agg(
            F.round(F.min("_m"), 6).alias("ci_lo"),
            F.round(F.max("_m"), 6).alias("ci_hi"),
        )
    )
    point = df.groupBy(*group_cols).agg(
        F.round(F.avg(value_col), 6).alias("mean"),
        F.count("*").cast("long").alias("n"),
    )
    return point.join(bounds, group_cols).select(
        *group_cols, "mean", "ci_lo", "ci_hi", "n"
    )
