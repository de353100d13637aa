"""Round-5h operators: KS two-sample test, chi-squared independence,
lag-k autocorrelation, SALSA, RM3 pseudo-relevance feedback.

Pins hand-computed statistics on tiny frames, distribution identities
(identical samples, disjoint supports, perfect independence/association),
shard-width invariance of the two-phase ECDF, SALSA mass conservation
and its indegree-proportional fixed point, and RM3's recall win (a doc
with zero query terms enters the top-k via the expanded terms).
"""

from __future__ import annotations

import math

import pytest

from gc_spark.operators.acf import acf
from gc_spark.operators.chisq import chi_squared_independence
from gc_spark.operators.kstest import ks_two_sample
from gc_spark.operators.rm3 import rm3_expand_topk
from gc_spark.operators.salsa import salsa


class TestKsTwoSample:
    def test_identical_samples(self, spark):
        rows = [("a", float(v)) for v in range(20)] + [
            ("b", float(v)) for v in range(20)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = ks_two_sample(df, "g", "v", "a", "b").collect()
        assert r["d_stat"] == 0.0
        assert r["p_value"] == 1.0

    def test_disjoint_supports(self, spark):
        rows = [("a", float(v)) for v in range(10)] + [
            ("b", 100.0 + v) for v in range(10)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = ks_two_sample(df, "g", "v", "a", "b").collect()
        assert r["d_stat"] == 1.0
        # asymptotic p at n=10 per side: small but not microscopic
        assert r["p_value"] < 0.01

    def test_hand_computed_d(self, spark):
        # a = {1,2,3,4}, b = {3,4,5,6}: max gap at v=2 (Fa=.5, Fb=0)
        rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [
            ("b", v) for v in [3.0, 4.0, 5.0, 6.0]
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = ks_two_sample(df, "g", "v", "a", "b").collect()
        assert r["d_stat"] == pytest.approx(0.5)
        assert r["n_a"] == 4 and r["n_b"] == 4

    def test_shard_width_invariance(self, spark):
        rows = [("a", float((i * 13) % 37)) for i in range(60)] + [
            ("b", float((i * 7) % 41)) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r1 = ks_two_sample(df, "g", "v", "a", "b", shard_width=4.0).collect()
        r2 = ks_two_sample(df, "g", "v", "a", "b", shard_width=64.0).collect()
        assert r1 == r2


class TestChiSquared:
    def test_perfect_independence(self, spark):
        rows = [(r, c) for r in "xy" for c in "pq" for _ in range(25)]
        df = spark.createDataFrame(rows, "r string, c string")
        [out] = chi_squared_independence(df, "r", "c").collect()
        assert out["chi2"] == pytest.approx(0.0)
        assert out["cramers_v"] == pytest.approx(0.0)
        assert out["dof"] == 1 and out["n"] == 100

    def test_perfect_association(self, spark):
        rows = [("x", "p")] * 30 + [("y", "q")] * 30
        df = spark.createDataFrame(rows, "r string, c string")
        [out] = chi_squared_independence(df, "r", "c").collect()
        # 2x2 perfect diagonal: chi2 = n, V = 1
        assert out["chi2"] == pytest.approx(60.0)
        assert out["cramers_v"] == pytest.approx(1.0)

    def test_hand_computed_with_zero_cell(self, spark):
        # contingency: x:(p=10, q=0), y:(p=5, q=15) — the (x,q) cell is
        # never observed; expected full-grid chi2 computed by hand
        rows = [("x", "p")] * 10 + [("y", "p")] * 5 + [("y", "q")] * 15
        df = spark.createDataFrame(rows, "r string, c string")
        [out] = chi_squared_independence(df, "r", "c").collect()
        obs = {("x", "p"): 10, ("x", "q"): 0, ("y", "p"): 5, ("y", "q"): 15}
        rt, ct, n = {"x": 10, "y": 20}, {"p": 15, "q": 15}, 30
        chi2 = sum(
            (o - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
            for (r, c), o in obs.items()
        )
        assert out["chi2"] == pytest.approx(round(chi2, 6))
        assert out["dof"] == 1

    def test_dof_three_by_two(self, spark):
        rows = [(r, c) for r in "xyz" for c in "pq" for _ in range(4)]
        df = spark.createDataFrame(rows, "r string, c string")
        [out] = chi_squared_independence(df, "r", "c").collect()
        assert out["n_rows"] == 3 and out["n_cols"] == 2
        assert out["dof"] == 2


def _py_acf(ys, k):
    n = len(ys)
    m = sum(ys) / n
    den = sum((y - m) ** 2 for y in ys)
    num = sum((ys[t] - m) * (ys[t - k] - m) for t in range(k, n))
    return num / den if den > 0 else None


class TestAcf:
    def test_alternating_series(self, spark):
        ys = [1.0 if t % 2 == 0 else -1.0 for t in range(10)]
        rows = [("h", t, y) for t, y in enumerate(ys)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        out = {r["lag"]: r for r in acf(df, "key", "t", "y", lags=(1, 2)).collect()}
        assert out[1]["r"] == pytest.approx(-0.9)  # -(n-1)/n
        assert out[2]["r"] == pytest.approx(0.8)  # (n-2)/n
        assert out[1]["n_pairs"] == 9

    def test_matches_python(self, spark):
        ys = [3.0, 7.0, 1.0, 9.0, 4.0, 6.0, 2.0, 8.0]
        rows = [("h", t, y) for t, y in enumerate(ys)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        out = {r["lag"]: r["r"] for r in acf(df, "key", "t", "y", lags=(1, 3)).collect()}
        assert out[1] == pytest.approx(round(_py_acf(ys, 1), 6), abs=1e-6)
        assert out[3] == pytest.approx(round(_py_acf(ys, 3), 6), abs=1e-6)

    def test_constant_series_null(self, spark):
        rows = [("h", t, 5.0) for t in range(6)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        out = acf(df, "key", "t", "y", lags=(1,)).collect()
        assert len(out) == 1 and out[0]["r"] is None

    def test_lag_beyond_series_absent(self, spark):
        rows = [("h", t, float(t)) for t in range(3)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        out = {r["lag"] for r in acf(df, "key", "t", "y", lags=(1, 5)).collect()}
        assert out == {1}

    def test_bad_lags_raise(self, spark):
        df = spark.createDataFrame([("h", 0, 1.0)], "key string, t long, y double")
        with pytest.raises(ValueError):
            acf(df, "key", "t", "y", lags=(0, 1))


class TestSalsa:
    def test_two_hubs_one_authority(self, spark):
        e = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
        out = {r["node"]: r for r in salsa(e, iters=3).collect()}
        assert out[3]["authority"] == pytest.approx(1.0)
        assert out[1]["hub"] == pytest.approx(0.5)
        assert out[2]["hub"] == pytest.approx(0.5)
        assert out[1]["authority"] == 0.0

    def test_mass_conserved(self, spark):
        rows = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(0, 5), (2, 5)]
        e = spark.createDataFrame(rows, "src long, dst long")
        out = salsa(e, iters=4).collect()
        assert sum(r["authority"] for r in out) == pytest.approx(1.0)
        assert sum(r["hub"] for r in out) == pytest.approx(1.0)

    def test_converges_to_indegree_proportional(self, spark):
        # single connected bipartite component: stationary authority
        # weights are indegree / total edges
        e = spark.createDataFrame(
            [(1, 2), (1, 3), (4, 3)], "src long, dst long"
        )
        # geometric convergence (error ratio ~1/4 per round here):
        # 16 rounds also crosses the eager-checkpoint boundary twice
        out = {r["node"]: r["authority"] for r in salsa(e, iters=16).collect()}
        assert out[2] == pytest.approx(1.0 / 3.0, abs=1e-6)
        assert out[3] == pytest.approx(2.0 / 3.0, abs=1e-6)


class TestRm3:
    DOCS = [
        (1, "alpha beta beta"),
        (2, "alpha beta gamma"),
        (3, "beta beta delta"),
        (4, "gamma delta"),
        (5, "alpha alpha beta"),
        (6, "epsilon zeta"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_expansion_recalls_no_query_term_doc(self, spark):
        # doc 3 has NO query term; 'beta' dominates the feedback docs,
        # gets expanded, and doc 3 enters the result set
        out = rm3_expand_topk(
            self._df(spark), ["alpha"], k=6, fb_docs=3, fb_terms=1, lam=0.5
        ).collect()
        ids = {r["doc_id"] for r in out}
        assert 3 in ids
        assert all(r["n_terms"] == 2 for r in out)

    def test_lam_zero_matches_plain_bm25_order(self, spark):
        from gc_spark.operators.maxscore import maxscore_topk

        terms = ["alpha", "beta"]
        exp = maxscore_topk(self._df(spark), terms, k=5).collect()
        got = rm3_expand_topk(
            self._df(spark), terms, k=5, fb_docs=2, fb_terms=2, lam=0.0
        ).collect()
        exp_order = [r["doc_id"] for r in sorted(exp, key=lambda r: r["rank"])]
        got_order = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
        assert got_order == exp_order

    def test_n_terms_caps_at_q_plus_fb(self, spark):
        out = rm3_expand_topk(
            self._df(spark), ["alpha", "gamma"], k=3, fb_docs=3, fb_terms=2
        ).collect()
        assert all(r["n_terms"] == 4 for r in out)

    def test_ranks_dense_from_one(self, spark):
        out = rm3_expand_topk(self._df(spark), ["beta"], k=4).collect()
        assert sorted(r["rank"] for r in out) == list(range(1, len(out) + 1))
