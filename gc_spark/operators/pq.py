"""Product quantization (PQ) for embedding compression and fast ANN
distance (Jégou et al., "Product quantization for nearest neighbor
search", TPAMI 2011 — public literature). Split each D-dim vector into m
subspaces of D/m dims; each subspace gets a k-codeword codebook; a vector
compresses to m small codes (m=4, k=16 → 2 bytes/vector here; production
m=8..64, k=256 → 8-64 bytes). Asymmetric distance then needs only m table
lookups per candidate — the layout IVF-PQ indexes (and the scale path of
operators/similarity.ivf_*) serve billions of vectors from.

Codebook here: the subvectors of the `k` lowest-id vectors — a
deterministic "sampled codebook". Production refines it with the
distributed Lloyd iterations already implemented in
operators/similarity.py:226-247 (per-subspace k-means); sampling-only
keeps this operator oracle-checkable and isolates the assignment/
reconstruction semantics from training.

Scale shape: the codebook is m×k rows (constant) and BROADCASTS; vectors
explode to m subvector rows (map-side, no shuffle), join the broadcast
codebook, and reduce back to vector grain with one hash aggregate keyed by
vec id — the same single-shuffle shape as q17 simhash. All arithmetic is
native array expressions in whole-stage codegen; distances are rounded to
9 decimals before the argmin so code assignment is stable across engines
and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _subvectors(df: DataFrame, dim: int, m: int, vec_col: str, *extra_cols):
    """Explode to (extra..., s, svec) — one row per subspace, map-side."""
    sub = dim // m
    parts = F.array(
        *[F.slice(F.col(vec_col).cast("array<double>"), s * sub + 1, sub) for s in range(m)]
    )
    return df.select(*extra_cols, F.posexplode(parts).alias("s", "svec"))


def _codebook(df: DataFrame, dim: int, m: int, k: int, vec_col: str, id_col: str):
    """(s, code, cvec) — sampled codebook from the k lowest-id vectors."""
    sample = df.orderBy(id_col).limit(k)
    coded = sample.select(
        (
            F.row_number().over(Window.orderBy(id_col)) - 1
        ).alias("code"),
        F.col(vec_col),
    )
    return _subvectors(coded, dim, m, vec_col, F.col("code")).select(
        "s", "code", F.col("svec").alias("cvec")
    )


def _sub_d2():
    """round-9 squared distance between the svec and cvec array columns."""
    return F.round(
        F.aggregate(
            F.zip_with(F.col("svec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )


def pq_code_rows(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, s, _b struct<_d2, code>) — the per-subspace code assignment
    shared by pq_assign (reconstruction view) and adc_topk (search view)."""
    codebook = _codebook(df, dim, m, k, vec_col, id_col)
    vecs = _subvectors(df, dim, m, vec_col, F.col(id_col))
    return (
        vecs.join(F.broadcast(codebook), "s")
        .select(F.col(id_col), "s", F.col("code"), _sub_d2().alias("_d2"))
        .groupBy(id_col, "s")
        .agg(F.min(F.struct(F.col("_d2"), F.col("code"))).alias("_b"))
    )


def pq_assign(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, mse, codes) — per-vector PQ reconstruction error (mean squared
    over all D dims) and the assigned code word per subspace as an
    's:code' string joined with '-', e.g. '0:3-1:7-2:0-3:12'."""
    best = pq_code_rows(df, dim, m, k, vec_col, id_col)
    return (
        best.groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("_b._d2")) / float(dim), 6).alias("mse"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("s"), F.col("_b.code")))
                    ),
                    lambda e: F.concat_ws(":", e["s"], e["code"]),
                ),
                "-",
            ).alias("codes"),
        )
    )


def adc_topk(
    df: DataFrame,
    query: list[float],
    dim: int,
    m: int = 4,
    k: int = 16,
    n_adc: int = 50,
    n_out: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search: the serving-path query of an
    IVF-PQ index. Score EVERY candidate from its m-byte PQ code via a
    broadcast m*k lookup table (query-subvector -> codeword distances), keep
    the best `n_adc` by that approximate score, then exact-rerank only those
    against the full vectors and return the best `n_out`.

    Scale shape: the LUT is m*k rows (constant, broadcast); candidate
    scoring touches codes only — at production scale the full vectors live
    in a separate (or columnar-pruned) table and the rerank join reads
    `n_adc` rows of it, not the corpus. Both cut-offs use orderBy+limit
    (TakeOrderedAndProject: per-partition heaps, no global sort). All
    ranked distances are round-9 quantized with id tie-breaks, so the
    result is engine-stable (same contract as pq_assign).
    """
    codes = pq_code_rows(df, dim, m, k, vec_col, id_col).select(
        F.col(id_col), "s", F.col("_b.code").alias("code")
    )
    qdf = df.sparkSession.createDataFrame([(0,)], "q int").select(
        F.array(*[F.lit(float(x)) for x in query]).alias(vec_col)
    )
    lut = (
        _subvectors(qdf, dim, m, vec_col)
        .join(F.broadcast(_codebook(df, dim, m, k, vec_col, id_col)), "s")
        .select("s", "code", _sub_d2().alias("_lut_d2"))
    )
    cand = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("_lut_d2"), 9).alias("adc_d2"))
        .orderBy("adc_d2", id_col)
        .limit(n_adc)
    )
    qlit = F.array(*[F.lit(float(x)) for x in query])
    exact = F.round(
        F.aggregate(
            F.zip_with(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                qlit,
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    return (
        df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), "adc_d2", exact.alias("exact_d2"))
        .orderBy("exact_d2", id_col)
        .limit(n_out)
    )
