"""Sliding-window document chunking: split long documents into overlapping
token windows (size W, stride S) — the segmentation step every
context-bounded training or embedding pipeline runs before packing
(operators/packing, q72) or embedding (operators/similarity). Overlap
(S < W) preserves cross-boundary context; the chunk fingerprint lets the
line/passage dedup family (q50, q80) run at chunk grain.

Scale shape: entirely map-side — one split, one transform over a
`sequence` of window starts, one posexplode. No shuffle, no Python; rides
the same scan as the other per-doc kernels. Chunk count per doc is
floor((n-1)/S)+1, so output size is predictable from token counts
(q11) before running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.text_dedup import sha60_col


def window_chunks(
    df: DataFrame,
    window: int = 50,
    stride: int = 25,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, start_token, n_tokens, chunk_fp) — one row per
    window; the final window may be short (callers drop short tails if
    the consumer needs fixed-size blocks)."""
    from gc_spark.functions.text import bind_once

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    chunks = bind_once(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(0), F.floor((F.size(t) - 1) / stride).cast("int")
            ),
            lambda i: F.struct(
                (i * stride + 1).alias("start_token"),
                F.slice(t, i * stride + 1, window).alias("_w"),
            ),
        ),
    )
    return df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")).select(
        id_col,
        "chunk_idx",
        F.col("_c.start_token").alias("start_token"),
        F.size("_c._w").alias("n_tokens"),
        sha60_col(F.array_join("_c._w", " ")).alias("chunk_fp"),
    )
