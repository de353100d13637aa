"""Property tests for round-4b kernels: registrable-domain idempotence,
sessionization invariants, CDC delta byte accounting, water-filling
feasibility, epoch-shuffle bijectivity. Hypothesis drives the INPUTS; each
property is checked in one Spark pass over the whole generated batch (one
session, no per-example Spark jobs)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark_lazy(spark):
    # module-scoped alias: hypothesis rejects function-scoped fixtures
    return spark

_LABEL = st.text(alphabet="abcdefghij0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)


class TestRegistrableDomainProps:
    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.lists(_LABEL, min_size=1, max_size=5),
                    min_size=1, max_size=8))
    def test_idempotent_and_suffix_of_host(self, spark_lazy, hosts_labels):
        from gc_spark.functions.urls import registrable_domain_col

        spark = spark_lazy
        hosts = [".".join(ls) for ls in hosts_labels]
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        rows = df.select(
            "host",
            registrable_domain_col(F.col("host")).alias("d1"),
        ).select(
            "host", "d1", registrable_domain_col(F.col("d1")).alias("d2")
        ).collect()
        for r in rows:
            assert r["d1"] == r["d2"]                   # idempotent
            assert r["host"].lower().endswith(r["d1"])  # suffix of the host


class TestSessionizeProps:
    def test_session_count_monotone_in_gap(self, spark):
        """Raising the cutoff can only MERGE sessions, never split them."""
        from gc_spark.operators.sessions import session_stats

        ts = [0, 5, 40, 41, 200, 900, 905, 2000]
        log = spark.createDataFrame([("h", t) for t in ts], "host string, fetch_ts long")
        counts = [
            session_stats(log, gap_sec=g).count() for g in (10, 50, 500, 5000)
        ]
        assert counts == sorted(counts, reverse=True)
        # every fetch lands in exactly one session at every cutoff
        for g in (10, 50, 500, 5000):
            total = session_stats(log, gap_sec=g).agg(
                F.sum("n_fetches")
            ).collect()[0][0]
            assert total == len(ts)


class TestCdcDeltaProps:
    def test_reuse_bounds_over_random_edits(self, spark):
        """For ANY edit, bytes partition exactly and reuse_frac is in
        [0, 1] — checked over a batch of deterministic pseudo-random
        edits in one Spark pass."""
        from gc_spark.operators.snapshot_diff import cdc_delta_stats

        base = " ".join(f"w{(i * i) % 7919}" for i in range(300))
        rows_old, rows_new = [], []
        for k in range(25):
            pos = (k * 97) % len(base)
            ins = f" EDIT{k} " * (k % 3 + 1)
            rows_old.append((k, base))
            rows_new.append((k, base[:pos] + ins + base[pos:]))
        old = spark.createDataFrame(rows_old, "doc_id long, text string")
        new = spark.createDataFrame(rows_new, "doc_id long, text string")
        bad = (
            cdc_delta_stats(old, new)
            .join(new.select("doc_id", F.length("text").alias("L")), "doc_id")
            .filter(
                (F.col("reused_bytes") + F.col("new_bytes") != F.col("L"))
                | (F.col("reuse_frac") < 0)
                | (F.col("reuse_frac") > 1)
                | (F.col("n_reused") > F.col("n_chunks_new"))
            )
            .count()
        )
        assert bad == 0


class TestWaterfillProps:
    def test_never_exceeds_budget_or_demand(self, spark):
        from gc_spark.operators.waterfill import waterfill_budgets

        demands = [(f"h{i}", (i * 37) % 500 + 1) for i in range(40)]
        df = spark.createDataFrame(demands, "host string, demand long")
        for budget in (1, 100, 3000, 10**6):
            rows = waterfill_budgets(df, total_budget=budget).collect()
            total = sum(r["allocation"] for r in rows)
            assert total <= budget + 1e-6 or total <= sum(d for _, d in demands)
            assert all(r["allocation"] <= r["demand"] + 1e-9 for r in rows)
            assert all(r["allocation"] >= 0 for r in rows)


class TestEpochShuffleProps:
    def test_order_key_is_injective_per_epoch(self, spark):
        from gc_spark.operators.curriculum import epoch_shuffle_keys

        d = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        out = epoch_shuffle_keys(d, epoch=7, num_shards=8)
        n_keys = out.select("shard_rank", "doc_rank").distinct().count()
        assert n_keys == 500  # total order: no two docs share a key
