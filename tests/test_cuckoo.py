"""operators/cuckoo — partitioned deletable seen-set (cuckoo filter).

Invariants pinned here:
  - no false negatives for inserted keys (the only property a prefilter
    must never break);
  - delete removes exactly the deleted keys' visibility while every other
    inserted key still probes True;
  - never-inserted keys mostly probe False (FPR sanity, not exactness);
  - the alt-bucket pairing is an involution (the eviction-correctness
    property — a broken pairing silently manufactures false negatives);
  - saturated shards (overflow > 0) answer True for everything.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gc_spark.operators.cuckoo import (
    SLOTS_PER_BUCKET,
    _alt_bucket,
    _bucket1,
    _fingerprints,
    build_cuckoo,
    cuckoo_delete,
    cuckoo_maybe_contains,
)


def _hashes(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "url_hash64 long")


def _probe_map(spark, filt, values, num_shards):
    rows = cuckoo_maybe_contains(
        _hashes(spark, values), filt, num_shards=num_shards
    ).collect()
    return {r["url_hash64"]: r["cuckoo_maybe"] for r in rows}


class TestCuckooFilter:
    def test_no_false_negatives(self, spark):
        keys = [hash(f"url{i}") for i in range(2000)]
        filt = build_cuckoo(
            _hashes(spark, keys), num_shards=8, expected_per_shard=1000
        )
        assert filt.agg(F.sum("overflow")).collect()[0][0] == 0
        got = _probe_map(spark, filt, keys, num_shards=8)
        assert all(got.values())  # every inserted key probes True

    def test_absent_keys_mostly_false(self, spark):
        keys = [hash(f"url{i}") for i in range(2000)]
        absent = [hash(f"other{i}") for i in range(2000)]
        filt = build_cuckoo(
            _hashes(spark, keys), num_shards=8, expected_per_shard=1000
        )
        got = _probe_map(spark, filt, absent, num_shards=8)
        fpr = sum(got.values()) / len(got)
        assert fpr < 0.02  # 16-bit fingerprints, 4-slot buckets: ~0.05% exp

    def test_delete_forgets_only_the_deleted(self, spark):
        keys = [hash(f"url{i}") for i in range(1000)]
        doomed = keys[::10]
        filt = build_cuckoo(
            _hashes(spark, keys), num_shards=4, expected_per_shard=512
        )
        after = cuckoo_delete(filt, _hashes(spark, doomed), num_shards=4)
        got = _probe_map(spark, after, keys, num_shards=4)
        survivors = [k for k in keys if k not in set(doomed)]
        assert all(got[k] for k in survivors)  # still zero false negatives
        # deleted keys are forgotten (a few may fingerprint-collide with a
        # surviving key in the same bucket — that is the documented FPR,
        # not a deletion failure)
        still = sum(got[k] for k in doomed)
        assert still <= max(2, len(doomed) // 20)
        # n_keys ledger decremented by the deletions that found their fp
        n_before = filt.agg(F.sum("n_keys")).collect()[0][0]
        n_after = after.agg(F.sum("n_keys")).collect()[0][0]
        assert n_before - n_after == len(doomed)

    def test_alt_bucket_is_involution(self):
        rng = np.random.default_rng(7)
        for nb in (2, 64, 1 << 14):
            fp = _fingerprints(rng.integers(0, 2**63, 500, dtype=np.uint64))
            b = rng.integers(0, nb, 500).astype(np.int64)
            assert (_alt_bucket(_alt_bucket(b, fp, nb), fp, nb) == b).all()

    def test_probe_checks_both_buckets(self):
        # keys landing in their ALT bucket (after eviction) must still hit
        rng = np.random.default_rng(3)
        h = rng.integers(0, 2**63, 100, dtype=np.uint64)
        nb = 256  # sparse enough that no alt bucket overflows its 4 slots
        fp = _fingerprints(h)
        b1 = _bucket1(h, nb)
        b2 = _alt_bucket(b1, fp, nb)
        table = np.zeros(nb * SLOTS_PER_BUCKET, dtype=np.uint16)
        # place every key in its SECOND bucket only
        for f, b in zip(fp, b2):
            row = table[b * SLOTS_PER_BUCKET : (b + 1) * SLOTS_PER_BUCKET]
            row[np.flatnonzero(row == 0)[0]] = f
        from gc_spark.operators.cuckoo import _probe_table

        assert _probe_table(table, nb, h).all()

    def test_saturated_shard_never_claims_absent(self, spark):
        # tiny table, far more keys than capacity: overflow > 0, and the
        # shard answers True for EVERYTHING (no false negatives possible)
        keys = [hash(f"u{i}") for i in range(5000)]
        filt = build_cuckoo(
            _hashes(spark, keys), num_shards=1, expected_per_shard=64
        )
        assert filt.collect()[0]["overflow"] > 0
        got = _probe_map(spark, filt, keys + [hash("anything-else")], num_shards=1)
        assert all(got.values())

    def test_build_is_deterministic(self, spark):
        keys = [hash(f"url{i}") for i in range(500)]
        a = {r["shard"]: r["table"] for r in build_cuckoo(
            _hashes(spark, keys), num_shards=4, expected_per_shard=256
        ).collect()}
        b = {r["shard"]: r["table"] for r in build_cuckoo(
            _hashes(spark, keys), num_shards=4, expected_per_shard=256
        ).collect()}
        assert a == b


class TestProbePaths:
    def test_cogroup_path_equals_broadcast_path(self, spark):
        """broadcast=False (shard cogroup) must return exactly the same
        verdicts as the SparkContext-broadcast map-side probe, including
        for keys the filter never saw."""
        keys = [hash(f"url{i}") & ((1 << 60) - 1) for i in range(3000)]
        probes = keys[:1500] + [
            hash(f"other{i}") & ((1 << 60) - 1) for i in range(1500)
        ]
        filt = build_cuckoo(_hashes(spark, keys), num_shards=8)
        cand = _hashes(spark, probes)
        a = {
            r["url_hash64"]: r["cuckoo_maybe"]
            for r in cuckoo_maybe_contains(
                cand, filt, num_shards=8, broadcast=True
            ).collect()
        }
        b = {
            r["url_hash64"]: r["cuckoo_maybe"]
            for r in cuckoo_maybe_contains(
                cand, filt, num_shards=8, broadcast=False
            ).collect()
        }
        assert a == b
        assert all(a[k & ((1 << 60) - 1)] for k in keys[:1500])
