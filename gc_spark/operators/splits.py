"""Leakage-safe train/val/test splitting and the cross-split leakage audit.

Eval contamination via near/exact duplicates across splits silently
inflates benchmark numbers, so (a) the split UNIT must be the correlation
unit (the host: all pages of a host co-assign — pages of one site are
heavily duplicated/templated), and (b) an explicit audit must prove no
content fingerprint crosses a split boundary (host splitting alone cannot
stop cross-host mirrors).

Assignment is a pure map-side salted hash (sampling.sample_hash_col —
reproducible across runs/partitionings, mergeable over increments); the
audit is one groupBy over (fingerprint, split) pairs — the only shuffle,
keyed on the fingerprint, output bounded by the leak count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.sampling import sample_hash_col

SPLIT_DENOM = 10_000


def split_col(
    key: Column, salt: str = "split0", val_bp: int = 500, test_bp: int = 500
) -> Column:
    """'train' / 'val' / 'test' from a salted hash of the unit key, in
    basis points (val_bp + test_bp <= 10000). Same key → same split,
    forever, on any engine that reproduces the sha256-prefix hash."""
    bucket = sample_hash_col(key, salt) % SPLIT_DENOM
    return (
        F.when(bucket < test_bp, F.lit("test"))
        .when(bucket < test_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def assign_splits(
    df: DataFrame,
    unit_col: str = "host",
    salt: str = "split0",
    val_bp: int = 500,
    test_bp: int = 500,
) -> DataFrame:
    """df + a 'split' column keyed on `unit_col` (all rows of one unit
    co-assign). Map-side only."""
    return df.withColumn(
        "split", split_col(F.col(unit_col), salt, val_bp, test_bp)
    )


def leakage_audit(
    df: DataFrame,
    split_col_name: str = "split",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Fingerprints present in MORE THAN ONE split: (fingerprint, n_splits,
    splits csv, n_docs). These are the rows that poison evals —
    the pipeline either drops them from eval splits or collapses them
    into train before release."""
    return (
        df.groupBy(fp_col)
        .agg(
            F.array_sort(F.collect_set(split_col_name)).alias("_s"),
            F.count("*").alias("n_docs"),
        )
        .where(F.size("_s") > 1)
        .select(
            fp_col,
            F.size("_s").alias("n_splits"),
            F.array_join("_s", ",").alias("splits"),
            "n_docs",
        )
    )
