"""KMV (k-minimum-values / theta) distinct sketch with set operations.

Why the frontier needs a SECOND distinct sketch next to HLL
(operators/hll.py): HLL registers merge by max() and answer "how many
distinct?", but they cannot INTERSECT — "how many URLs did crawler A and
crawler B both see?", "how many docs are in this week's snapshot AND last
week's?" are set-expression questions the ops reports ask constantly (the
reference diffs its previous/current manifests row-by-row for exactly this:
dataPipelines/gc_scrapy/gc_scrapy/middleware_utils/cached_response.py and
the manifest replay in pipelines.py:62-92). A KMV/theta sketch (Beyer et
al. SIGMOD'07; Dasgupta et al., the DataSketches theta sketch) keeps the k
smallest hash values per set; union/intersection/difference become array
ops on two k-row samples, with estimate (k-1)/theta.

Scale shape — the point of the implementation:
  - hashes are uniform in [0, 2^60), so the k-min of a 10^10-row set lives
    almost surely below t = safety*k/D_est * 2^60. We take a FREE estimate
    D_est from approx_count_distinct (native HLL++ partial agg, map-side
    combined), broadcast the per-group threshold, and FILTER the corpus to
    h <= t before the only exact shuffle. The heavy distinct-sort shrinks
    from O(D) rows to O(safety*k) rows per group.
  - the filter can never change the answer while >= k survivors remain
    (dropping values above t cannot disturb the k smallest); any group
    left with < k survivors is recomputed exactly over its full hash set
    (only tiny groups or a pathological estimate land there), so the
    output is the EXACT k-min regardless of the estimator — which is what
    makes the DuckDB oracle a plain row_number() <= k window.
  - set ops never touch the corpus again: they join two k-array sketches.

Estimators (all arithmetic in doubles over integer hash inputs — both
engines agree bit-for-bit):
  union:      ukmin = k smallest of (A.kmv UNION B.kmv); n_eff = |ukmin|;
              est = n_eff if n_eff < k else (k-1) / (max(ukmin)/2^60)
  intersect:  |{h in ukmin : h in A.kmv AND h in B.kmv}| / n_eff * est_u
  a_minus_b:  |{h in ukmin : h in A.kmv AND h NOT in B.kmv}| / n_eff * est_u
(every h in ukmin below theta_U <= theta_A is retained by A if A contains
it, so the sample is unbiased; n_eff < k is the exact small-set regime
where the "estimates" are exact counts.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.text_dedup import sha60_col

HASH_SPACE = float(2**60)


def kmv_sketch(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    k: int = 64,
    safety: int = 8,
) -> DataFrame:
    """Per-group KMV sketch: (group..., kmv array<long> of the k smallest
    distinct 60-bit item hashes, ascending). Exact k-min by construction
    (threshold pre-filter + fallback), so oracle-checkable."""
    g = [F.col(c) for c in group_cols]
    hashes = df.select(*g, sha60_col(F.col(item_col)).alias("h")).dropDuplicates(
        group_cols + ["h"]
    )

    # Free cardinality estimate -> conservative keep-threshold per group.
    est = hashes.groupBy(*group_cols).agg(
        F.approx_count_distinct("h").alias("d_est")
    )
    thresh = est.select(
        *group_cols,
        F.least(
            F.lit(HASH_SPACE),
            F.lit(float(safety * k)) * F.lit(HASH_SPACE)
            / F.greatest(F.col("d_est").cast("double"), F.lit(1.0)),
        ).alias("t"),
    )

    surv = hashes.join(F.broadcast(thresh), group_cols).where(
        F.col("h").cast("double") <= F.col("t")
    )
    kmin = surv.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("kmv")
    )

    # Exact fallback for groups the filter starved (< k survivors): their
    # true distinct count is small or the estimate overshot — recompute
    # the k-min over the unfiltered hash set for just those groups.
    short = kmin.where(F.size("kmv") < k).select(*group_cols)
    ok = kmin.where(F.size("kmv") >= k)
    # Groups with zero survivors never appear in `kmin`; recover them from
    # the estimate frame so no group is silently dropped.
    missing = est.select(*group_cols).exceptAll(kmin.select(*group_cols))
    redo_keys = short.unionByName(missing)
    redo = (
        hashes.join(F.broadcast(redo_keys), group_cols)
        .groupBy(*group_cols)
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("kmv"))
    )
    return ok.unionByName(redo)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate per group: exact when |kmv| < k, else the
    classic unbiased (k-1)/theta."""
    n = F.size("kmv")
    kth = F.element_at("kmv", n).cast("double") / F.lit(HASH_SPACE)
    est = F.when(n < k, n.cast("double")).otherwise(F.lit(float(k - 1)) / kth)
    return sketch.select(
        *[c for c in sketch.columns if c != "kmv"],
        n.alias("n_retained"),
        F.round(est, 0).cast("long").alias("est_distinct"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Union / intersection / difference estimates from two sketch frames
    (inner-joined on the group). Pure array arithmetic on 2k values per
    group — the corpus is never touched again."""
    aa = a.select(*group_cols, F.col("kmv").alias("kmv_a"))
    bb = b.select(*group_cols, F.col("kmv").alias("kmv_b"))
    j = aa.join(bb, group_cols)

    ukmin = F.slice(F.array_sort(F.array_union("kmv_a", "kmv_b")), 1, k)
    j = j.withColumn("ukmin", ukmin)
    n_eff = F.size("ukmin")
    kth = F.element_at("ukmin", n_eff).cast("double") / F.lit(HASH_SPACE)
    est_u = F.when(n_eff < k, n_eff.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth
    )
    m_inter = F.size(
        F.array_intersect("ukmin", F.array_intersect("kmv_a", "kmv_b"))
    )
    m_a_only = F.size(
        F.array_intersect("ukmin", F.array_except("kmv_a", "kmv_b"))
    )
    frac = n_eff.cast("double")
    return j.select(
        *group_cols,
        n_eff.alias("n_eff"),
        F.round(est_u, 0).cast("long").alias("est_union"),
        F.round(m_inter.cast("double") / frac * est_u, 0)
        .cast("long")
        .alias("est_intersect"),
        F.round(m_a_only.cast("double") / frac * est_u, 0)
        .cast("long")
        .alias("est_a_only"),
    )
