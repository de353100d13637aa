"""Deterministic sampling for training-data pipelines.

Corpus assembly mixes sources at controlled rates (e.g. up-sample curated
text, down-sample raw crawl) and needs the SAME sample on every re-run —
rerunning a 100 TB job must not produce a different training set, and an
auditor must be able to re-derive membership per row. So both operators key
on a salted content hash, never on Spark's RNG (`df.sample` draws from
per-partition XORShift streams: partition-count-dependent and
non-reproducible across repartitions).

  stratified_sample — per-stratum Bernoulli keep: hash(salt|id) % 10^4
    compared against the stratum's rate. Pure map-side expression; zero
    shuffle; at 100 TB it rides the scan like any other filter and pushes
    nothing to the driver. Exactly reproducible AND mergeable: the union of
    two runs over disjoint inputs is the sample of the union.

  reservoir_topk — exact-size k per stratum: rank rows by the salted hash
    (a deterministic "uniform" draw) and keep the first k. Equivalent in
    distribution to reservoir sampling but associative/restartable. Uses
    the same two-phase salted window as operators/politeness.topk_per_host
    so a giant stratum (the raw-crawl bucket is always >90% of rows) never
    funnels through one reducer.

The hash is the portable 60-bit sha256 prefix (functions/text._sha60_local)
so a DuckDB/ANSI oracle reproduces membership bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gc_spark.functions.text import _sha60_local

RATE_DENOM = 10_000  # rates are basis points: 0.5 -> 5000


def sample_hash_col(id_col: Column, salt: str) -> Column:
    """Salted portable draw in [0, 2^60): sha60(salt || '|' || id)."""
    return _sha60_local(F.concat(F.lit(salt + "|"), id_col.cast("string")))


def stratified_sample(
    df: DataFrame,
    rate_col: Column,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Keep each row iff hash(salt|id) % 10^4 < rate_col (rate in basis
    points, e.g. F.when(lang=='en', 5000).otherwise(2000)). Map-side only."""
    return df.filter(
        sample_hash_col(F.col(id_col), salt) % RATE_DENOM < rate_col
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    out_col: str = "bucket",
) -> DataFrame:
    """Assign each row to a quantile bucket of `value_col` (1..len(probs)+1)
    — the curriculum/mixing assignment step (e.g. length-balanced batch
    composition). NOT ntile: a global ntile needs a total ordering of the
    corpus through one reducer. Instead the cutpoints are computed once by
    an exact-percentile aggregate (q45's verifier kernel; swap in
    approx_percentile's t-digest at 10^10 rows) and broadcast back — the
    corpus-sized side stays map-only. Bucket = 1 + #cutpoints strictly
    below the value, so rows equal to a cutpoint land in the lower bucket
    on both engines."""
    cuts = df.agg(
        *[
            F.expr(f"percentile({value_col}, {p})").alias(f"_q{i}")
            for i, p in enumerate(probs)
        ]
    )
    bucket = F.lit(1)
    for i in range(len(probs)):
        bucket = bucket + (F.col(value_col) > F.col(f"_q{i}")).cast("int")
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(out_col, bucket)
        .drop(*[f"_q{i}" for i in range(len(probs))])
    )


def reservoir_topk(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "r0",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exactly k rows per stratum, chosen by the salted hash order (ties
    broken by id for full determinism). Adds `sample_rank` (1-based).

    Two-phase: a (stratum, hash%S)-salted partial rank caps each slice at
    k, then the exact rank runs over <= k*S survivors per stratum — same
    skew shape as the politeness drain."""
    h = sample_hash_col(F.col(id_col), salt)
    df = df.withColumn("_draw", h)
    order = [F.col("_draw").asc(), F.col(id_col).asc()]
    strata = [F.col(c) for c in strata_cols]

    w1 = Window.partitionBy(*strata, (F.col("_draw") % salt_buckets).cast("int")).orderBy(
        *order
    )
    partial = df.withColumn("_prank", F.row_number().over(w1)).filter(
        F.col("_prank") <= k
    )
    w2 = Window.partitionBy(*strata).orderBy(*order)
    return (
        partial.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= k)
        .drop("_prank", "_draw")
    )


def mixture_weights(df: DataFrame, group_cols: list[str], alpha: float = 0.7) -> DataFrame:
    """Temperature-scaled corpus mixture weights — the sampling scheme
    multilingual/multi-source LLM corpora use to keep small sources from
    vanishing (alpha-sampling, e.g. mBERT/XLM-R's p_i ∝ (n_i/N)^alpha;
    alpha=1 is proportional, alpha→0 uniform):

        weight_g = (n_g / N)^alpha / Σ_h (n_h / N)^alpha

    Returns one row per group: (…group_cols, n_docs, weight,
    expected_per_epoch) where expected_per_epoch = round(weight * N) is the
    number of documents an N-sized training epoch draws from the group
    (before repetition caps). Two tiny aggregates (group cardinality rows)
    crossJoin-broadcast back — the corpus is scanned ONCE for the group
    counts; weights are rounded to 6 digits for cross-engine stability."""
    counts = df.groupBy(*group_cols).agg(F.count("*").alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").cast("double").alias("_n"),
    )
    powed = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_p", F.pow(F.col("n_docs") / F.col("_n"), F.lit(alpha))
    )
    z = powed.agg(F.sum("_p").alias("_z"))
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            *group_cols,
            "n_docs",
            F.round(F.col("_p") / F.col("_z"), 6).alias("weight"),
            F.round(F.col("_p") / F.col("_z") * F.col("_n"), 0)
            .cast("long")
            .alias("expected_per_epoch"),
        )
    )


def temperature_sample(
    df: DataFrame,
    target: int,
    alpha: float = 0.3,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled mixture sampling (public literature: the
    alpha-sampling of T5/mT5, Raffel et al. 2020 / Xue et al. 2021):
    sample ~`target` docs total with per-group quotas proportional to
    p_g^alpha (alpha < 1 upsamples small groups relative to their raw
    share — the standard fix for low-resource starvation). Deterministic:
    each row draws hash(salt|id) % 10^6 and keeps iff below its group's
    keep probability min(1, target*q_g/n_g), so re-runs and engines agree
    row-for-row (no rand(), no resample drift across incremental runs).

    Scale shape: one group-size aggregate (groups-sized output, the
    p^alpha normalization happens on that tiny frame via an
    empty-partition window), broadcast back; the keep decision is
    map-side. Same salted-draw kernel as stratified_sample.
    """
    from pyspark.sql import Window

    n = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    n = n.withColumn("_p", F.col("_n") / F.sum("_n").over(Window.partitionBy()))
    n = n.withColumn(
        "_q",
        F.pow(F.col("_p"), alpha)
        / F.sum(F.pow(F.col("_p"), alpha)).over(Window.partitionBy()),
    )
    quota = n.select(
        group_col,
        F.least(F.lit(1.0), F.lit(float(target)) * F.col("_q") / F.col("_n")).alias(
            "keep_prob"
        ),
    )
    draw = (
        sample_hash_col(F.col(id_col).cast("string"), salt) % 1000000
    ) / 1000000.0
    return (
        df.join(F.broadcast(quota), group_col)
        .filter(draw < F.col("keep_prob"))
        .select(
            id_col, group_col, F.round(F.col("keep_prob"), 6).alias("keep_prob")
        )
    )


def weighted_sample_wor(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "es",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the exponential race
    (public literature: Efraimidis & Spirakis 2006): each row draws a
    deterministic uniform u from its salted id hash and computes
    key = ln(u) / weight; the k largest keys are exactly a weight-
    proportional sample without replacement. THE distributed algorithm
    for the job — one map-side key computation plus a global top-k
    (TakeOrderedAndProject: per-partition heaps, no sort, no sequential
    pass like reservoir variants need).

    Deterministic draws mean re-runs, engines, and incremental reruns
    agree on the sample; rotate `salt` for a fresh epoch. Zero/negative/
    null-weight rows get a null key (never a division: ANSI mode would
    throw DIVIDE_BY_ZERO on weight=0, e.g. an empty document with
    n_chars=0), and nulls sort last under desc so they never win."""
    u = (
        (sample_hash_col(F.col(id_col).cast("string"), salt) % 1000000)
        + 0.5
    ) / 1000000.0
    key = F.when(F.col(weight_col) > 0, F.log(u) / F.col(weight_col))
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "weight", F.round("_key", 6).alias("es_key"))
    )
