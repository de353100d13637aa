"""Population-stability-index (PSI) drift between corpus snapshots.

A recurring crawl re-lands the "same" sources every epoch; a quiet upstream
change (template swap, paywall rollout, parser regression) shows up first
as a DISTRIBUTION shift — document lengths, not individual documents. PSI
over fixed buckets is the standard monitoring statistic for exactly this
(credit-risk/monitoring practice): psi = sum_b (p_A(b) - p_B(b)) *
ln(p_A(b) / p_B(b)), with add-half smoothing so empty buckets stay finite.

Buckets are FIXED-WIDTH (not quantiles) so the statistic is closed-form,
mergeable over increments, and identical across engines — a quantile
bucketing would make epoch A's edges data-dependent and the comparison
circular. Plan: one (group, epoch, bucket) aggregate over the corpus, then
a bucket-spine join on a frame of |groups| x n_buckets rows — corpus
touches exactly one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_drift(
    df: DataFrame,
    value_col: str,
    epoch_col: str = "epoch",
    group_col: str = "source",
    bucket_width: int = 32,
    n_buckets: int = 10,
    epochs: tuple = ("a", "b"),
) -> DataFrame:
    """(group, n_a, n_b, psi) between the two epochs, per group.

    bucket = min(floor(value / bucket_width), n_buckets - 1); smoothed
    p = (count + 0.5) / (n_epoch + 0.5 * n_buckets) over ALL n_buckets
    buckets (zero-count buckets included via a generated spine)."""
    ea, eb = epochs
    bucket: Column = F.least(
        F.floor(F.col(value_col) / F.lit(float(bucket_width))), F.lit(n_buckets - 1)
    ).cast("int")
    counts = (
        df.select(F.col(group_col).alias("grp"), F.col(epoch_col).alias("ep"), bucket.alias("b"))
        .groupBy("grp", "b")
        .agg(
            F.sum(F.when(F.col("ep") == ea, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("ep") == eb, 1).otherwise(0)).alias("cb"),
        )
    )
    totals = counts.groupBy("grp").agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    spine = totals.select("grp", "n_a", "n_b").crossJoin(
        F.broadcast(
            counts.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("b"))
        )
    )
    full = spine.join(counts, ["grp", "b"], "left").fillna(0, ["ca", "cb"])
    pa = (F.col("ca") + 0.5) / (F.col("n_a") + 0.5 * n_buckets)
    pb = (F.col("cb") + 0.5) / (F.col("n_b") + 0.5 * n_buckets)
    term = (pa - pb) * F.log(pa / pb)
    return (
        full.groupBy("grp", "n_a", "n_b")
        .agg(F.round(F.sum(term), 6).alias("psi"))
        .select(F.col("grp").alias(group_col), "n_a", "n_b", "psi")
    )


def centroid_drift(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "source",
    epoch_col: str = "epoch",
    dim: int = 64,
    epochs: tuple = ("a", "b"),
) -> DataFrame:
    """Embedding-space drift between two corpus epochs: cosine similarity
    of the per-group mean vectors — the cheap detector for "the encoder
    changed / the content changed" that PSI over scalars can't see.

    Scale shape: the per-position means are dim plain AVG aggregates in
    ONE groupBy pass (map-side partials, zero explode — a posexplode
    formulation would shuffle dim x corpus rows); the centroid frame is
    |groups| x 2 rows, so the epoch join is broadcast-trivial. element_at
    (1-based) keeps index parity with the SQL oracle.

    Returns (group, n_a, n_b, centroid_cos) rounded to 6 dp."""
    ea, eb = epochs
    cent = df.groupBy(F.col(group_col).alias("grp"), F.col(epoch_col).alias("ep")).agg(
        F.count("*").alias("n"),
        *[
            F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"_m{i}")
            for i in range(dim)
        ],
    )
    c = F.array(*[F.col(f"_m{i}") for i in range(dim)])
    a = cent.where(F.col("ep") == ea).select(
        "grp", F.col("n").alias("n_a"), c.alias("_ca")
    )
    b = cent.where(F.col("ep") == eb).select(
        "grp", F.col("n").alias("n_b"), c.alias("_cb")
    )
    dot = F.aggregate(
        F.zip_with("_ca", "_cb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return a.join(b, "grp").select(
        F.col("grp").alias(group_col),
        "n_a",
        "n_b",
        F.round(dot / (norm(F.col("_ca")) * norm(F.col("_cb"))), 6).alias(
            "centroid_cos"
        ),
    )
