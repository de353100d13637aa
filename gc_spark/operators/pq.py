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
    sample = df.orderBy(id_col).limit(k)
    coded = sample.select(
        (
            F.row_number().over(Window.orderBy(id_col)) - 1
        ).alias("code"),
        F.col(vec_col),
    )
    codebook = _subvectors(coded, dim, m, vec_col, F.col("code")).select(
        "s", "code", F.col("svec").alias("cvec")
    )

    vecs = _subvectors(df, dim, m, vec_col, F.col(id_col))
    d2 = F.round(
        F.aggregate(
            F.zip_with(F.col("svec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    best = (
        vecs.join(F.broadcast(codebook), "s")
        .select(F.col(id_col), "s", F.col("code"), d2.alias("_d2"))
        .groupBy(id_col, "s")
        .agg(F.min(F.struct(F.col("_d2"), F.col("code"))).alias("_b"))
    )
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
