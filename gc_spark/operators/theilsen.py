"""Theil-Sen robust trend — is this host's metric drifting?

Per-host trend questions (page bytes creeping up, latency degrading,
yield decaying) need a slope estimator that shrugs off the outliers
crawl metrics are full of. Theil-Sen (Theil 1950, Sen 1968) is the
standard robust choice: the MEDIAN of all pairwise slopes, with ~29%
breakdown, no distributional assumptions, and a closed form — against
OLS's 0% breakdown where one 10 GB response bends the line.

Scale shape: pairs are generated per group via a self-join, so a group
with n points emits n(n-1)/2 rows — the linkpred/triangles wedge
discipline applies: groups beyond max_points are df-capped out before
pairing (a host with thousands of observations should be trended from
its EWMA or sketch, not exact pairs). The slope median is a group-grain
percentile aggregate. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def theil_sen_trend(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    max_points: int = 512,
    round_digits: int = 6,
) -> DataFrame:
    """(group, n_points, n_pairs, slope, intercept) per group with
    2 <= n_points <= max_points. slope is the LOWER median of the
    pairwise slopes (the order statistic at index floor((n+1)/2) —
    exact, engine-portable: interpolated medians differ across engines
    in the last float bits, and the intercept multiplies that noise by
    median(x)); intercept = median(y) - slope * median(x) with the same
    lower-median convention. Pairs with equal x are skipped (vertical
    slopes) — so a group whose kept points ALL share one x value yields
    zero slope pairs and is OMITTED from the output entirely, exactly
    like a group outside the [2, max_points] size window (ADVICE r5: the
    n_points >= 2 contract alone doesn't guarantee a row)."""
    pts = df.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    sizes = pts.groupBy("grp").agg(F.count("*").alias("n_points"))
    keep = sizes.where(
        (F.col("n_points") >= 2) & (F.col("n_points") <= max_points)
    )
    # capped feeds four consumers (pair left/right sides, median-x,
    # median-y); the planner does not collapse the copies (no
    # ReusedExchange on self-join sides), so materialize once per
    # invocation — the post-cap frame is <= max_points rows per group.
    capped = pts.join(F.broadcast(keep), "grp").localCheckpoint(eager=False)

    left = capped.select("grp", "n_points", F.col("x").alias("x1"), F.col("y").alias("y1"))
    right = capped.select("grp", F.col("x").alias("x2"), F.col("y").alias("y2"))
    pairs = left.join(right, "grp").where(F.col("x1") < F.col("x2"))
    slopes = pairs.select(
        "grp",
        "n_points",
        ((F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))).alias(
            "m"
        ),
    )

    def _lower_median(
        df: DataFrame, col: str, out: str, extra: tuple = ()
    ) -> DataFrame:
        w = Window.partitionBy("grp").orderBy(col)
        wc = Window.partitionBy("grp")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .withColumn("_ct", F.count("*").over(wc))
            .where(F.col("_rn") == F.floor((F.col("_ct") + 1) / 2))
            .select(
                "grp",
                F.col(col).alias(out),
                F.col("_ct"),
                *[F.col(c) for c in extra],
            )
        )

    # n_points rides through the slope-median window (constant per group)
    # instead of a separate groupBy over `slopes` — that groupBy was a
    # SECOND full evaluation of the O(n^2) pair fan-out just to recover a
    # number every surviving row already carries.
    med = _lower_median(
        slopes, "m", "_slope", extra=("n_points",)
    ).withColumnRenamed("_ct", "n_pairs")
    mx = _lower_median(capped, "x", "_mx").drop("_ct")
    my = _lower_median(capped, "y", "_my").drop("_ct")
    centers = mx.join(my, "grp")
    return (
        med.join(centers, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_points",
            "n_pairs",
            # + 0.0 folds IEEE -0.0 (a tiny negative slope rounded to
            # zero) into +0.0 so downstream byte/text compares are stable
            (F.round("_slope", round_digits) + 0.0).alias("slope"),
            (
                F.round(
                    F.col("_my") - F.col("_slope") * F.col("_mx"),
                    round_digits,
                )
                + 0.0
            ).alias("intercept"),
        )
    )
