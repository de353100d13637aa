"""Near-duplicate detection for training-data pipelines.

Four families, each picked for its scale profile:

  - exact dedup: hash-groupBy (see __spark_entry__ q10) — one shuffle.
  - MinHash + LSH banding: shingle → K minhashes → B bands → bucket-join.
    The minhash computation is a PURE JVM expression (array_min over
    transform(xxhash64)) — zero Python, zero shuffle until the tiny band
    bucket groupBy. At 100 TB the only shuffled payload is (doc_id,
    band_hash), never the text.
  - SimHash: Arrow-batched pandas UDF (bit-twiddling doesn't map to SQL
    expressions cleanly); map-side only — no shuffle at all. Near-dup pairs
    then come from banding the simhash bits.
  - exact n-gram Jaccard confirm: array_intersect/array_union sizes — native
    — run only on LSH candidate pairs (the classic cheap-filter/exact-confirm
    split, same shape as the Bloom + exact anti-join in the crawl path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_WORDS = 3


def _shingles(text_col) -> "F.Column":
    """Word 3-gram shingles as an array column (native)."""
    toks = F.split(F.trim(text_col), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (SHINGLE_WORDS - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, SHINGLE_WORDS), " ")
    )


def minhash_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds `minhash` array<long> of NUM_HASHES signature values — all
    whole-stage-codegen expressions (xxhash64 with per-function seed)."""
    sh = _shingles(F.col(text_col))
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, _i=i: F.xxhash64(s, F.lit(_i))))
            for i in range(NUM_HASHES)
        ]
    )
    return df.withColumn("minhash", sig)


def minhash_lsh_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LSH banding: bucket docs whose band signature collides.

    Returns one row per (band, band_hash) bucket with >1 member:
    (band, band_hash, n_docs, doc_ids sorted) — the candidate groups a
    pair-verify stage consumes.
    """
    sig = minhash_signature(df, text_col)
    bands = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("minhash")[b * ROWS_PER_BAND + r]
                                for r in range(ROWS_PER_BAND)
                            ],
                        )
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )
    return (
        bands.groupBy("band", "band_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def jaccard_verify_pairs(df: DataFrame, candidates: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard on LSH candidate pairs only (native set ops)."""
    pairs = (
        candidates.select(F.explode("doc_ids").alias("a"), F.col("doc_ids"))
        .select("a", F.explode("doc_ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col), F.array_distinct(_shingles(F.col(text_col))).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed(id_col, "b").withColumnRenamed("sh", "sh_b"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


@pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """63-bit SimHash per text (Arrow-batched; blake2b token hashes so the
    value is deterministic across processes — python's hash() is not)."""

    shifts = np.arange(63, dtype=np.uint64)

    def _h(text: str) -> int:
        if not text:
            return 0
        acc = np.zeros(63, dtype=np.int64)
        for tok in text.split():
            hv = np.uint64(
                int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                )
            )
            bits = (hv >> shifts) & np.uint64(1)
            acc += np.where(bits == np.uint64(1), 1, -1)
        out = 0
        for i in np.nonzero(acc > 0)[0]:
            out |= 1 << int(i)
        return out

    return texts.map(_h)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — map-side only, no shuffle."""
    return df.select(F.col(id_col), simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      band_bits: int = 16) -> DataFrame:
    """Near-dup candidates by banding the simhash into 63//band_bits chunks —
    two docs within small Hamming distance share at least one band."""
    s = simhash(df, text_col, id_col)
    nbands = 63 // band_bits
    bands = s.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * band_bits).bitwiseAND(
                        F.lit((1 << band_bits) - 1)
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("band", "band_val"),
    )
    return (
        bands.groupBy("band", "band_val")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )
