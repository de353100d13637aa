"""Property test: topk_per_host equals the brute-force per-host top-k for
arbitrary (host, priority, depth, seq) inputs — budget invariant + exact
crawl-order selection, including the salted two-phase path."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from gc_spark.operators.politeness import topk_per_host

rows = st.lists(
    st.tuples(
        st.integers(0, 5),  # host id
        st.integers(0, 3),  # priority
        st.integers(0, 4),  # depth
        st.integers(0, 10_000),  # seq (unique-ified below)
    ),
    min_size=1,
    max_size=60,
)


class TestTopkProperty:
    @settings(max_examples=12, deadline=None)
    @given(rows, st.integers(1, 4), st.integers(1, 5))
    def test_matches_bruteforce(self, spark_lazy, data, k, salts):
        spark = spark_lazy
        # unique seq per row (the engine guarantees this by construction)
        data = [
            (f"h{h}.mil", p, d, i * 100_000 + s)
            for i, (h, p, d, s) in enumerate(data)
        ]
        df = spark.createDataFrame(data, ["host", "priority", "depth", "seq"])
        got = {
            (r["host"], r["seq"], r["drain_rank"])
            for r in topk_per_host(df, k, salt_buckets=salts).collect()
        }

        expected = set()
        by_host: dict = {}
        for h, p, d, s in data:
            by_host.setdefault(h, []).append((p, d, s))
        for h, items in by_host.items():
            for rank, (p, d, s) in enumerate(sorted(items)[:k], start=1):
                expected.add((h, s, rank))
        assert got == expected


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_lazy(spark):
    # reuse the session fixture under a hypothesis-friendly name
    return spark
