"""Per-dimension int8 embedding quantization — the memory move that makes
billion-vector ANN serving fit: 64-dim float32 → 64 bytes (4× smaller,
and 8× vs the float64 compute form), at a reconstruction error bounded by
half a quantization step per dimension.

Corpus pass 1 computes per-dimension (min, max) WITHOUT exploding: one
aggregate with 2×dim min/max expressions over array elements — map-side
partial aggregation reduces every partition to a single stats row, the
driver never sees vectors, and the 1-row result broadcasts back via
crossJoin. Pass 2 is map-only: affine quantize q = round((x-mn)/(mx-mn)
·255), dequantize, and per-vector error stats in one array transform.
Constant dimensions (mx == mn) quantize to 0 with exact reconstruction.

Returns per-vector max |x - dequant(x)| and MSE — the acceptance gate a
quantized index must pass before the float vectors are dropped.

No reference twin: SURVEY.md §6 similarity-search family (composes with
operators/similarity IVF: quantized cells are the production layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantization_error_stats(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, max_abs_err, mse) of int8 round-trip per vector."""
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    stats = v.agg(
        F.array(*[F.min(F.col("_v")[i]) for i in range(dim)]).alias("_mn"),
        F.array(*[F.max(F.col("_v")[i]) for i in range(dim)]).alias("_mx"),
    )

    def err(x, i):
        mn = F.element_at(F.col("_mn"), i + 1)
        mx = F.element_at(F.col("_mx"), i + 1)
        scale = mx - mn
        q = F.when(scale == 0.0, F.lit(0.0)).otherwise(
            F.round((x - mn) / scale * 255.0)
        )
        deq = mn + q * scale / 255.0
        return F.abs(deq - x)

    errs = F.transform(F.col("_v"), err)
    return (
        v.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            errs.alias("_e"),
        )
        .select(
            F.col(id_col),
            F.array_max("_e").alias("max_abs_err"),
            (
                F.aggregate(
                    "_e", F.lit(0.0), lambda acc, e: acc + e * e
                )
                / float(dim)
            ).alias("mse"),
        )
    )
