"""Score-calibration audit — reliability bins + expected calibration
error (ECE) for the pipeline's quality/spam/soft-404 classifiers.

Every scored gate in the engine (reputation, soft404, quality LM,
link-spam) emits a [0,1] score that downstream thresholds treat as a
probability; this operator audits whether score 0.8 actually means 80%
("reliability diagram" + ECE, the standard readout — Naeini et al.,
AAAI 2015):

    bin_i  = equal-width score bins
    gap_i  = |mean_score_i - frac_pos_i|
    ECE    = sum_i (n_i / N) * gap_i

Scale shape: one groupBy(bin) over map-side bin assignment, then a
1-row ECE aggregate broadcast back onto the bin rows (so a single
result frame carries both the per-bin diagram and the scalar). No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """(bin, n, mean_score, frac_pos, gap, ece) per non-empty bin; `bin`
    is the 0-based equal-width index (score 1.0 folds into the last
    bin); `ece` is the same global scalar on every row. Labels are
    truthy ints/booleans; scores outside [0,1] raise downstream checks
    rather than silently clamping (bin index just extends)."""
    b = F.least(
        F.floor(F.col(score_col).cast("double") * n_bins).cast("int"),
        F.lit(n_bins - 1),
    )
    y = F.col(label_col).cast("double")
    bins = (
        df.select(
            b.alias("bin"),
            F.col(score_col).cast("double").alias("_s"),
            y.alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.avg("_s").alias("_ms"),
            F.avg("_y").alias("_fp"),
        )
    )
    tot = bins.agg(
        F.sum("n").cast("double").alias("_nn"),
        F.sum(F.col("n") * F.abs(F.col("_ms") - F.col("_fp"))).alias("_wgap"),
    )
    r = round_digits
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round("_ms", r).alias("mean_score"),
        F.round("_fp", r).alias("frac_pos"),
        F.round(F.abs(F.col("_ms") - F.col("_fp")), r).alias("gap"),
        F.round(F.col("_wgap") / F.col("_nn"), r).alias("ece"),
    )
