"""Partitioned Bloom filter over 64-bit URL hashes.

The reference holds its whole seen-set in a driver-side Python ``set``
(pipelines.py:44,62-92) — fine for 15k docs, impossible for a 10^10-URL
frontier. We shard a Bloom filter by hash bucket: each bucket's bitset is
built distributively with ``applyInPandas`` (numpy bit ops over Arrow
batches), stored as one binary row per bucket, and probed with a
bucket-equi-join + vectorized membership UDF. An executor only ever touches
the buckets its rows hash to, so the aggregate filter can exceed single-node
memory. Bloom "maybe" rows still pass through the exact anti-join — the
filter only exists to shrink the shuffle; false-drop is impossible.

Double hashing (Kirsch-Mitzenmacher): idx_i = h1 + i*h2 (mod m) gives k
index functions from one 64-bit key with no re-hashing.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("bits", BinaryType(), False),
        StructField("m", LongType(), False),
        StructField("k", IntegerType(), False),
    ]
)


def _params(expected_per_bucket: int, fpp: float) -> tuple[int, int]:
    n = max(expected_per_bucket, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64  # whole 64-bit words
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _indices(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(h), k) bit indices via double hashing on the uint64 key."""
    h = h.astype(np.uint64)
    h1 = h % np.uint64(m)
    h2 = (np.uint64(1) | (h >> np.uint64(17)) ^ (h << np.uint64(31))) % np.uint64(m - 1) + np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.uint64(m)


def _set_bits(bits: np.ndarray, idx: np.ndarray) -> None:
    words, offs = idx // 64, idx % 64
    np.bitwise_or.at(bits, words.ravel(), (np.uint64(1) << offs.ravel().astype(np.uint64)))


def _test_bits(bits: np.ndarray, idx: np.ndarray) -> np.ndarray:
    words, offs = idx // 64, idx % 64
    got = (bits[words] >> offs.astype(np.uint64)) & np.uint64(1)
    return got.all(axis=1)


def bucket_of(hash_col, num_buckets: int):
    """Stable bucket id in [0, num_buckets) from a signed 64-bit hash col."""
    return F.pmod(hash_col, F.lit(num_buckets)).cast("int")


def build_bloom(
    hashes: DataFrame,
    hash_col: str = "url_hash64",
    num_buckets: int = 32,
    expected_per_bucket: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Distributed build: one bloom row per bucket.

    Returns DataFrame[bucket, bits, m, k]. Deterministic for a given input set.
    """
    m, k = _params(expected_per_bucket, fpp)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 64, dtype=np.uint64)
        h = pdf[hash_col].to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
        if len(h):
            _set_bits(bits, _indices(h, m, k))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bits": [bits.tobytes()],
                "m": [m],
                "k": [k],
            }
        )

    with_bucket = hashes.withColumn("bucket", bucket_of(F.col(hash_col), num_buckets))
    return with_bucket.groupBy("bucket").applyInPandas(_build, schema=BLOOM_SCHEMA)


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two bloom tables bucket-wise (same m,k by construction)."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        m = int(pdf["m"].iloc[0])
        k = int(pdf["k"].iloc[0])
        for blob in pdf["bits"]:
            arr = np.frombuffer(blob, dtype=np.uint64)
            acc = arr.copy() if acc is None else (acc | arr)
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bits": [acc.tobytes()], "m": [m], "k": [k]}
        )

    return a.unionByName(b).groupBy("bucket").applyInPandas(_merge, schema=BLOOM_SCHEMA)


def bloom_maybe_contains(
    candidates: DataFrame,
    bloom: DataFrame,
    hash_col: str = "url_hash64",
    num_buckets: int = 32,
) -> DataFrame:
    """Adds boolean `bloom_maybe`: False ⇒ definitely NOT in the seen set.

    Bucket-equi-join (broadcast — bloom table is num_buckets rows) then a
    vectorized membership probe per Arrow batch.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def _probe(h: pd.Series, bits: pd.Series, m: pd.Series, k: pd.Series) -> pd.Series:
        out = np.zeros(len(h), dtype=bool)
        if len(h) == 0:
            return pd.Series(out)
        hv = h.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
        # rows may mix buckets (and null bits from the left join) within one
        # Arrow batch — probe per unique blob with that group's own m/k
        valid = bits.notna().to_numpy()
        for blob in bits[valid].unique():
            mask = (bits == blob).fillna(False).to_numpy()
            mm = int(m[mask].iloc[0])
            kk = int(k[mask].iloc[0])
            arr = np.frombuffer(blob, dtype=np.uint64)
            out[mask] = _test_bits(arr, _indices(hv[mask], mm, kk))
        return pd.Series(out)

    withb = candidates.withColumn("bucket", bucket_of(F.col(hash_col), num_buckets))
    joined = withb.join(F.broadcast(bloom), "bucket", "left")
    return (
        joined.withColumn(
            "bloom_maybe",
            F.when(F.col("bits").isNull(), F.lit(False)).otherwise(
                _probe(F.col(hash_col), F.col("bits"), F.col("m"), F.col("k"))
            ),
        )
        .drop("bits", "m", "k", "bucket")
    )
