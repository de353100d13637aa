"""Perceptual-hash near-duplicate detection for media — SimHash's image twin.

Exact media dedup (operators/spans.media_dedup_stats) only catches
byte-identical refs; re-encoded / resized / re-compressed images need a
PERCEPTUAL 64-bit hash whose Hamming distance tracks visual similarity
(pHash/aHash family). Finding all pairs within Hamming distance k without
a quadratic self-join is the Manku/Jain/Sarma WWW'07 construction (the
one Google used for SimHash web dedup): split the hash into `bands`
bit-blocks — any pair within Hamming k < bands differs in at most k
blocks, so it MUST agree exactly on at least bands-k of them. Agreeing
blocks become equi-join keys; the exact Hamming check runs only on
band-collision candidates.

The hash itself comes from the media decode path (gc_spark/operators/
multimodal.py holds the decoder plumbing; this module consumes any 64-bit
int column), so the operator is decoder-agnostic — DCT-pHash, aHash, or a
learned binary code all drain through the same banding.

Scale shape: band keys are generated map-side (`bands` rows per media,
constant fan-out), ONE equi-join on (band_no, band_bits) — hot buckets are
capped the same way the text LSH caps df (a band value shared by B items
yields B² candidates; `max_band_df` drops degenerate bands, e.g. the
all-black-thumbnail block). Verification is a map-side
bit_count(a XOR b) <= k filter; pairs dedup once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash64",
    bands: int = 4,
    max_hamming: int = 3,
    max_band_df: int = 1000,
) -> DataFrame:
    """(id_a, id_b, hamming) for all pairs with Hamming(hash) <=
    max_hamming. Requires max_hamming < bands (the pigeonhole guarantee:
    k bit-flips can dirty at most k of the bands, so one band must match
    exactly). Band width is 64 // bands bits."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}) "
            "for the band-collision guarantee to hold"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    h = F.col(hash_col).cast("long")
    # bands is a plain int, so the band structs unroll at plan-build time
    # (shiftrightunsigned takes a literal bit count)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_no"),
                F.shiftrightunsigned(h, b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_bits"),
            )
            for b in range(bands)
        ]
    )
    banded = df.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.explode(band_arr).alias("bk"),
    ).select("_id", "_h", F.col("bk.band_no").alias("band_no"), F.col("bk.band_bits").alias("band_bits"))
    # cap degenerate band buckets (the all-zeros block of blank thumbnails
    # would otherwise square): dropped buckets lose only pairs that agree
    # on SOME other, uncapped band unless every shared band is degenerate
    df_counts = banded.groupBy("band_no", "band_bits").agg(
        F.count(F.lit(1)).alias("_bdf")
    )
    capped = banded.join(
        df_counts.filter(F.col("_bdf") <= max_band_df),
        ["band_no", "band_bits"],
    )
    a = capped.select(
        "band_no", "band_bits", F.col("_id").alias("id_a"), F.col("_h").alias("_ha")
    )
    b = capped.select(
        "band_no", "band_bits", F.col("_id").alias("id_b"), F.col("_h").alias("_hb")
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        a.join(b, ["band_no", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(ham <= max_hamming)
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .distinct()
    )
