"""Round-5g operators: OPIC on-line importance, MaxScore pruned BM25
top-k, Holt linear-trend smoothing, epsilon-DP Laplace count release.

Pins hand-computed cash rounds on tiny graphs (dangling redistribution,
parallel-edge collapse, probability-mass conservation), the MaxScore
soundness invariant (pruned top-k == unpruned top-k, with pruning
actually firing), the Holt recurrence against a pure-Python fold, and
the DP release's determinism / clamping / noise-magnitude bounds.
"""

from __future__ import annotations

import math

import pytest

from gc_spark.operators.dprelease import laplace_release
from gc_spark.operators.holt import holt_forecast
from gc_spark.operators.maxscore import maxscore_topk
from gc_spark.operators.opic import opic


def _imp(df):
    return {r["node"]: r["importance"] for r in df.collect()}


class TestOpic:
    def test_two_node_cycle_splits_evenly(self, spark):
        e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        out = _imp(opic(e, iters=4))
        assert out[0] == pytest.approx(0.5)
        assert out[1] == pytest.approx(0.5)

    def test_dangling_redistribution_hand_computed(self, spark):
        # 0 -> 1, node 1 dangling. c0=(.5,.5), h0=0. Round 1:
        # dangling=.5 -> each gets .25; incoming(1)=.5
        # c1=(0+.25, .5+.25)=(.25,.75), h1=(.5,.5)
        # importance = (h1+c1)/2 = (.375, .625)
        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        out = _imp(opic(e, iters=1))
        assert out[0] == pytest.approx(0.375)
        assert out[1] == pytest.approx(0.625)

    def test_parallel_edges_collapse(self, spark):
        e1 = spark.createDataFrame([(0, 1), (0, 1), (1, 0)], "src long, dst long")
        e2 = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        assert _imp(opic(e1, iters=3)) == _imp(opic(e2, iters=3))

    def test_mass_conserved_and_sink_favored(self, spark):
        # star into node 9 plus a back-edge so the graph has cycles
        rows = [(i, 9) for i in range(9)] + [(9, 0)]
        e = spark.createDataFrame(rows, "src long, dst long")
        out = _imp(opic(e, iters=5))
        assert sum(out.values()) == pytest.approx(1.0)
        assert out[9] == max(out.values())


def _py_bm25_topk(docs, terms, k, k1=1.2, b=0.75):
    """Unpruned reference: exact BM25 over sums of 6dp-rounded
    contributions, the maxscore module's scoring protocol."""
    toks = {i: t.split() for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) for v in toks.values()) / n
    tf = {}
    for i, ts in toks.items():
        for t in ts:
            if t in terms:
                tf[(i, t)] = tf.get((i, t), 0.0) + 1.0
    df = {}
    for (_, t), _v in tf.items():
        df[t] = df.get(t, 0.0) + 1.0
    scores = {}
    for (i, t), f in tf.items():
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        c = round(
            idf * f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * len(toks[i]) / avgdl)),
            6,
        )
        scores[i] = scores.get(i, 0.0) + c
    ranked = sorted(
        ((round(s, 6), i) for i, s in scores.items()), key=lambda x: (-x[0], x[1])
    )
    return [(i, s, r + 1) for r, (s, i) in enumerate(ranked[:k])], len(scores)


class TestMaxScore:
    DOCS = [
        (1, "spark spark merge line"),
        (2, "spark data"),
        (3, "data data data filler filler"),
        (4, "merge merge spark data"),
        (5, "filler filler filler data"),
        (6, "spark merge data spark"),
        (7, "filler words only here"),
        (8, "data filler"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_matches_unpruned_topk(self, spark):
        terms = ["spark", "data", "merge"]
        out = maxscore_topk(self._df(spark), terms, k=3).collect()
        exp, n_matched = _py_bm25_topk(self.DOCS, set(terms), k=3)
        got = [(r["doc_id"], r["score"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
        assert [(i, r) for i, _, r in got] == [(i, r) for i, _, r in exp]
        for (gi, gs, _), (ei, es, _) in zip(got, exp):
            assert gs == pytest.approx(es, abs=2e-6)
        assert out[0]["n_matched"] == n_matched

    def test_pruning_fires_and_stays_sound(self, spark):
        # many docs match only the common (low-idf) term; two-term docs
        # dominate the top-2, so single-term docs prune away
        docs = [(i, "common filler%d" % i) for i in range(1, 30)] + [
            (100, "rare common rare"),
            (101, "rare common"),
            (102, "rare rare rare common"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = maxscore_topk(df, ["rare", "common"], k=2).collect()
        exp, n_matched = _py_bm25_topk(docs, {"rare", "common"}, k=2)
        got = sorted(out, key=lambda r: r["rank"])
        assert [(r["doc_id"], r["rank"]) for r in got] == [
            (i, r) for i, _, r in exp
        ]
        assert got[0]["n_matched"] == n_matched == 32
        assert got[0]["n_scored"] < got[0]["n_matched"]

    def test_k_larger_than_matches_returns_all(self, spark):
        out = maxscore_topk(self._df(spark), ["merge"], k=50).collect()
        matched = {i for i, t in self.DOCS if "merge" in t.split()}
        assert {r["doc_id"] for r in out} == matched
        assert all(r["n_scored"] == len(matched) for r in out)


def _py_holt(ys, alpha, beta):
    l, b, sae = ys[0], 0.0, 0.0
    for y in ys[1:]:
        sae += abs(y - (l + b))
        l_new = alpha * y + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
    mae = sae / (len(ys) - 1) if len(ys) > 1 else None
    return l, b, mae


class TestHolt:
    def test_constant_series(self, spark):
        rows = [("h", t, 7.5) for t in range(10)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        [r] = holt_forecast(df, "key", "t", "y", alpha=0.4, beta=0.2, horizon=5).collect()
        assert r["level"] == pytest.approx(7.5)
        assert r["trend"] == pytest.approx(0.0)
        assert r["forecast"] == pytest.approx(7.5)
        assert r["mae"] == pytest.approx(0.0)

    def test_matches_python_fold(self, spark):
        ys = [3.0, 5.0, 4.0, 8.0, 7.0, 11.0, 10.0]
        rows = [("h", t, y) for t, y in enumerate(ys)]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        [r] = holt_forecast(df, "key", "t", "y", alpha=0.5, beta=0.3, horizon=2).collect()
        l, b, mae = _py_holt(ys, 0.5, 0.3)
        assert r["level"] == pytest.approx(round(l, 6))
        assert r["trend"] == pytest.approx(round(b, 6))
        assert r["forecast"] == pytest.approx(round(l + 2 * b, 6))
        assert r["mae"] == pytest.approx(round(mae, 6))
        assert r["n"] == len(ys)

    def test_length_one_series_null_mae(self, spark):
        df = spark.createDataFrame([("h", 0, 4.0)], "key string, t long, y double")
        [r] = holt_forecast(df, "key", "t", "y").collect()
        assert (r["level"], r["trend"], r["forecast"]) == (4.0, 0.0, 4.0)
        assert r["mae"] is None

    def test_row_order_independent(self, spark):
        ys = [3.0, 5.0, 4.0, 8.0, 7.0]
        fwd = [("h", t, y) for t, y in enumerate(ys)]
        rev = list(reversed(fwd))
        df_f = spark.createDataFrame(fwd, "key string, t long, y double")
        df_r = spark.createDataFrame(rev, "key string, t long, y double")
        a = holt_forecast(df_f, "key", "t", "y").collect()
        b = holt_forecast(df_r, "key", "t", "y").collect()
        assert a == b

    def test_keys_independent(self, spark):
        rows = [("a", t, float(t)) for t in range(6)] + [
            ("b", t, 2.0) for t in range(4)
        ]
        df = spark.createDataFrame(rows, "key string, t long, y double")
        out = {r["key"]: r for r in holt_forecast(df, "key", "t", "y").collect()}
        la, ba, _ = _py_holt([float(t) for t in range(6)], 0.5, 0.3)
        assert out["a"]["level"] == pytest.approx(round(la, 6))
        assert out["b"]["trend"] == pytest.approx(0.0)


class TestLaplaceRelease:
    def _groups(self, spark):
        rows = [("big",)] * 500 + [("small",)] * 3
        return spark.createDataFrame(rows, "host string")

    def test_deterministic(self, spark):
        df = self._groups(spark)
        a = sorted(laplace_release(df, "host", epsilon=0.5, salt="s").collect())
        b = sorted(laplace_release(df, "host", epsilon=0.5, salt="s").collect())
        assert a == b

    def test_noise_bounded_and_metadata(self, spark):
        df = self._groups(spark)
        out = {r["group"]: r for r in laplace_release(df, "host", epsilon=0.8, salt="x").collect()}
        scale = 1.0 / 0.8
        # the discretized uniform keeps |noise| <= scale * ln(1e6)
        bound = scale * math.log(1e6) + 1
        assert abs(out["big"]["released"] - 500) <= bound
        assert out["big"]["epsilon"] == pytest.approx(0.8)
        assert out["big"]["scale"] == pytest.approx(scale)

    def test_clamped_at_zero(self, spark):
        # epsilon tiny -> scale huge; some salt drives a small count
        # negative pre-clamp; released must never be negative
        rows = [(f"g{i}",) for i in range(40)]
        df = spark.createDataFrame(rows, "host string")
        out = laplace_release(df, "host", epsilon=0.01, salt="clamp").collect()
        assert all(r["released"] >= 0 for r in out)
        # with scale=100 and count=1, at least one group must have been
        # clamped (half the noise draws are negative)
        raw_hits = sum(1 for r in out if r["released"] == 0)
        assert raw_hits > 0

    def test_salt_changes_noise(self, spark):
        rows = [(f"g{i}",) for i in range(20) for _ in range(50)]
        df = spark.createDataFrame(rows, "host string")
        a = {r["group"]: r["released"] for r in laplace_release(df, "host", epsilon=0.05, salt="a").collect()}
        b = {r["group"]: r["released"] for r in laplace_release(df, "host", epsilon=0.05, salt="b").collect()}
        assert a != b
