"""Partitioned cuckoo filter over 64-bit URL hashes — the DELETABLE seen-set.

The Bloom twin (operators/bloom.py) answers "maybe seen?" but cannot forget:
a robots.txt change that newly blocks URL space (robots.robots_diff_impact's
`newly_blocked` class), a purged host, or a forced-recrawl directive all need
keys REMOVED from the approximate seen-set, and a Bloom filter can only be
rebuilt from scratch. A cuckoo filter (Fan et al., CoNEXT'14) stores short
fingerprints in a 2-choice bucketed table: membership checks two buckets,
deletion removes one matching fingerprint copy, and space is comparable to
Bloom at equal false-positive rate.

Sharding mirrors the Bloom design so either slots behind the same drain
seam: the key space shards by `pmod(hash, num_shards)`; each shard owns an
independent cuckoo table built in one `applyInPandas` pass (numpy, Arrow
batches), stored as ONE binary row per shard. Both candidate buckets of a
key live inside its shard — the partial-key displacement `b2 = b1 XOR
H(fp)` stays shard-local, so builds, probes, and deletes never cross
shards, and the aggregate filter can exceed single-node memory exactly like
the Bloom. Size `num_shards` so one shard's keys fit one executor's Arrow
group during the build (10^10 keys → ~10^4 shards of ~10^6 keys ≈ 8 MB of
hashes + a 2 MB table each). The probe joins on the shard id: broadcast
while the whole filter fits a broadcast (≤ a few GB); past that, drop the
hint and the same equi-join shuffles only (hash, shard) pairs to meet a
filter side already partitioned by shard — candidates never carry more
than those two columns into the exchange.

Semantics (the invariants the tests pin):
  - no false negatives: every inserted-and-not-deleted key probes True;
  - deletion is safe ONLY for keys actually inserted (the standard cuckoo
    filter contract; deleting a never-inserted key can evict a colliding
    fingerprint) — callers delete from the seen TABLE and mirror here;
  - overfull shards degrade SAFELY: keys that cannot place after the
    eviction budget are recorded in a per-shard `overflow` count and the
    shard is marked saturated; probes against a saturated shard return
    True (maybe) rather than risking a false negative.

Like the Bloom, "True" rows still pass through the exact anti-join — the
filter exists to shrink the shuffle, never to be the source of truth.
"""

from __future__ import annotations

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

SLOTS_PER_BUCKET = 4
MAX_KICKS = 250

CUCKOO_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("table", BinaryType(), False),  # uint16 fp per slot, 0=empty
        StructField("num_buckets", LongType(), False),
        StructField("n_keys", LongType(), False),
        StructField("overflow", LongType(), False),
    ]
)


def shard_of(hash_col, num_shards: int):
    """Stable shard id in [0, num_shards) from a signed 64-bit hash col."""
    return F.pmod(hash_col, F.lit(num_shards)).cast("int")


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from the key's high bits (the low bits
    already picked the shard and bucket — reusing them would correlate)."""
    fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _bucket1(h: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((h >> np.uint64(16)) % np.uint64(num_buckets)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, num_buckets: int) -> np.ndarray:
    """Partial-key displacement: b XOR (H(fp) masked to the table's bit
    width). num_buckets is a power of two by construction, so the pairing
    is a true involution — alt(alt(b, fp), fp) == b — which is what lets an
    EVICTED fingerprint be re-placed in its other legal bucket (a mod-based
    variant breaks this and silently manufactures false negatives)."""
    hfp = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
        num_buckets - 1
    )
    return (b.astype(np.uint64) ^ hfp).astype(np.int64)


def _hash_np(col: pd.Series) -> np.ndarray:
    return col.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)


def build_cuckoo(
    hashes: DataFrame,
    hash_col: str = "url_hash64",
    num_shards: int = 32,
    expected_per_shard: int = 1_000_000,
    load_factor: float = 0.84,
) -> DataFrame:
    """Distributed build: one cuckoo-table row per shard.

    DataFrame[shard, table, num_buckets, n_keys, overflow]. The table is
    sized for `expected_per_shard` keys at `load_factor` occupancy (0.84 is
    the 4-slot cuckoo sweet spot); keys that fail to place after the
    eviction budget count in `overflow` (probes then treat the shard as
    saturated — True for everything, still zero false negatives)."""
    need = max(2, int(np.ceil(expected_per_shard / (SLOTS_PER_BUCKET * load_factor))))
    num_buckets = 1 << (need - 1).bit_length()  # power of two: see _alt_bucket

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros(num_buckets * SLOTS_PER_BUCKET, dtype=np.uint16)
        rng_state = np.uint64(0x9E3779B97F4A7C15)  # deterministic evictions
        # shuffle delivery order is nondeterministic; sort so the table
        # layout (and thus the stored binary row) is reproducible
        pdf = pdf.sort_values(hash_col)
        h = _hash_np(pdf[hash_col])
        fps = _fingerprints(h)
        b1s = _bucket1(h, num_buckets)
        overflow = 0
        for fp0, b0 in zip(fps, b1s):
            fp, b = np.uint16(fp0), int(b0)
            placed = False
            for _kick in range(MAX_KICKS):
                row = slice(b * SLOTS_PER_BUCKET, (b + 1) * SLOTS_PER_BUCKET)
                empties = np.flatnonzero(table[row] == 0)
                if len(empties):
                    table[b * SLOTS_PER_BUCKET + int(empties[0])] = fp
                    placed = True
                    break
                alt = int(
                    _alt_bucket(np.array([b]), np.array([fp], dtype=np.uint16),
                                num_buckets)[0]
                )
                arow = slice(alt * SLOTS_PER_BUCKET, (alt + 1) * SLOTS_PER_BUCKET)
                empties = np.flatnonzero(table[arow] == 0)
                if len(empties):
                    table[alt * SLOTS_PER_BUCKET + int(empties[0])] = fp
                    placed = True
                    break
                # evict a deterministic pseudo-random victim from b
                rng_state = (
                    rng_state * np.uint64(6364136223846793005)
                    + np.uint64(1442695040888963407)
                )
                victim = int(rng_state % np.uint64(SLOTS_PER_BUCKET))
                slot = b * SLOTS_PER_BUCKET + victim
                fp, table[slot] = table[slot], fp
                b = int(
                    _alt_bucket(np.array([b]), np.array([fp], dtype=np.uint16),
                                num_buckets)[0]
                )
            if not placed:
                overflow += 1
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [table.tobytes()],
                "num_buckets": [num_buckets],
                "n_keys": [len(h)],
                "overflow": [overflow],
            }
        )

    with_shard = hashes.withColumn("shard", shard_of(F.col(hash_col), num_shards))
    return with_shard.groupBy("shard").applyInPandas(_build, schema=CUCKOO_SCHEMA)


def _probe_table(
    table: np.ndarray, num_buckets: int, h: np.ndarray
) -> np.ndarray:
    fps = _fingerprints(h)
    b1 = _bucket1(h, num_buckets)
    b2 = _alt_bucket(b1, fps, num_buckets)
    t = table.reshape(num_buckets, SLOTS_PER_BUCKET)
    hit1 = (t[b1] == fps[:, None]).any(axis=1)
    hit2 = (t[b2] == fps[:, None]).any(axis=1)
    return hit1 | hit2


def cuckoo_maybe_contains(
    candidates: DataFrame,
    cuckoo: DataFrame,
    hash_col: str = "url_hash64",
    num_shards: int = 32,
    broadcast: bool = True,
) -> DataFrame:
    """Adds boolean `cuckoo_maybe`: False ⇒ definitely NOT in the seen set.

    broadcast=True (the fits-in-memory case the module docstring scopes):
    the num_shards-row filter is collected ONCE — EAGERLY, at
    plan-construction time, a deliberate exception to lazy building — into
    a SparkContext broadcast and the probe is a pure map-side vectorized
    pandas UDF. The broadcast lives until the returned DataFrame is
    garbage-collected (Spark's ContextCleaner reclaims it); callers
    probing MANY filters in one long-lived session should reuse one
    filter frame per logical seen-set rather than rebuilding per call, or
    the stale broadcast copies accumulate until the next cleaner sweep
    (ADVICE r5) —
    candidates never shuffle and each executor receives each shard table
    exactly once. (A shard-equi broadcast JOIN — the prior shape — is a
    trap here: the join REPLICATES the multi-hundred-KB table blob onto
    every candidate row, and every row then crosses the JVM→Arrow
    boundary carrying its own copy; at 150k rows that is tens of GB of
    serialization for a 2 MB filter, ~70x slower end to end.)

    broadcast=False for filters too large for the driver: candidates
    shuffle by shard ONCE into a num_shards-way cogroup, so each shard's
    table row crosses once per shard task, never per candidate row. A
    saturated shard (overflow > 0) answers True for everything it cannot
    disprove in both paths."""
    from pyspark.sql.functions import pandas_udf

    if broadcast:
        tables = {
            int(r["shard"]): (
                None if r["table"] is None else bytes(r["table"]),
                int(r["num_buckets"]),
                int(r["overflow"]),
            )
            for r in cuckoo.collect()
        }
        bc = candidates.sparkSession.sparkContext.broadcast(tables)

        @pandas_udf(BooleanType())
        def _probe(h: pd.Series) -> pd.Series:
            out = np.zeros(len(h), dtype=bool)
            if len(h) == 0:
                return pd.Series(out)
            hv = _hash_np(h)
            # same shard rule as shard_of(): pmod of the signed hash
            shards = np.mod(hv.view(np.int64), num_shards)
            for s in np.unique(shards):
                entry = bc.value.get(int(s))
                if entry is None or entry[0] is None:
                    continue  # shard absent from the filter: definite no
                blob, nbuckets, overflow = entry
                mask = shards == s
                if overflow > 0:
                    out[mask] = True  # saturated: never claim absent
                    continue
                table = np.frombuffer(blob, dtype=np.uint16)
                out[mask] = _probe_table(table, nbuckets, hv[mask])
            return pd.Series(out)

        return candidates.withColumn("cuckoo_maybe", _probe(F.col(hash_col)))

    out_schema = StructType(
        list(candidates.schema.fields)
        + [StructField("cuckoo_maybe", BooleanType(), True)]
    )

    def _apply(key, cand: pd.DataFrame, filt: pd.DataFrame) -> pd.DataFrame:
        res = cand.drop(columns=["_shard"])
        if len(res) == 0:
            return res.assign(cuckoo_maybe=np.zeros(0, dtype=bool))
        if len(filt) == 0 or filt["table"].iloc[0] is None:
            return res.assign(cuckoo_maybe=False)
        if int(filt["overflow"].iloc[0]) > 0:
            return res.assign(cuckoo_maybe=True)
        table = np.frombuffer(bytes(filt["table"].iloc[0]), dtype=np.uint16)
        hit = _probe_table(
            table, int(filt["num_buckets"].iloc[0]), _hash_np(res[hash_col])
        )
        return res.assign(cuckoo_maybe=hit)

    withs = candidates.withColumn(
        "_shard", shard_of(F.col(hash_col), num_shards)
    )
    return (
        withs.groupby("_shard")
        .cogroup(cuckoo.groupby("shard"))
        .applyInPandas(_apply, schema=out_schema)
    )


def cuckoo_delete(
    cuckoo: DataFrame,
    deletions: DataFrame,
    hash_col: str = "url_hash64",
    num_shards: int = 32,
) -> DataFrame:
    """Remove previously-inserted keys: per shard, each deletion clears ONE
    matching fingerprint copy from the key's two candidate buckets
    (duplicate inserts need matching duplicate deletes, like the classic
    structure). Returns a new filter table; n_keys is decremented by the
    deletions that found a fingerprint.

    The deletion stream is typically tiny next to the filter (a purge of
    one host / one robots diff), so this is a num_shards-way cogroup where
    the filter side is one row per shard."""
    dels = deletions.select(
        shard_of(F.col(hash_col), num_shards).alias("shard"),
        F.col(hash_col).alias("_del_hash"),
    )

    def _apply(key, filt: pd.DataFrame, dd: pd.DataFrame) -> pd.DataFrame:
        if filt.empty:
            return filt.iloc[0:0]
        row = filt.iloc[0]
        table = np.frombuffer(row["table"], dtype=np.uint16).copy()
        nbuckets = int(row["num_buckets"])
        removed = 0
        if not dd.empty:
            hv = _hash_np(dd["_del_hash"])
            fps = _fingerprints(hv)
            b1s = _bucket1(hv, nbuckets)
            b2s = _alt_bucket(b1s, fps, nbuckets)
            for fp, b1, b2 in zip(fps, b1s, b2s):
                done = False
                for b in (int(b1), int(b2)):
                    for s in range(SLOTS_PER_BUCKET):
                        slot = b * SLOTS_PER_BUCKET + s
                        if table[slot] == fp:
                            table[slot] = 0
                            removed += 1
                            done = True
                            break
                    if done:
                        break
        return pd.DataFrame(
            {
                "shard": [int(key[0])],
                "table": [table.tobytes()],
                "num_buckets": [nbuckets],
                "n_keys": [max(0, int(row["n_keys"]) - removed)],
                "overflow": [int(row["overflow"])],
            }
        )

    return (
        cuckoo.groupBy("shard")
        .cogroup(dels.groupBy("shard"))
        .applyInPandas(_apply, schema=CUCKOO_SCHEMA)
    )
