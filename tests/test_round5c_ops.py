"""Round-5c operators: IR ranking-quality metrics (MRR/NDCG/recall@k).

Pins the hand-computable geometry the DuckDB oracle can't isolate: exact
metric values on a tiny labelled run, the zero-relevant convention, the
cutoff semantics (rank k+1 hits don't count, but they do count toward
recall's denominator via qrels), and ideal-DCG saturation when n_rel > k.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gc_spark.operators.ir_eval import ir_metrics


def _frames(spark, run_rows, qrel_rows):
    run = spark.createDataFrame(run_rows, "qid string, doc_id string, rank int")
    qrels = spark.createDataFrame(qrel_rows, "qid string, doc_id string, rel int")
    return run, qrels


class TestIrMetrics:
    def test_hand_computed_values(self, spark):
        # q1: hits at ranks 2 and 4 of 3 relevant docs.
        run, qrels = _frames(
            spark,
            [("q1", f"d{r}", r) for r in range(1, 6)],
            [("q1", "d2", 1), ("q1", "d4", 1), ("q1", "d9", 1)],
        )
        [row] = ir_metrics(run, qrels, k=10).collect()
        assert row["n_rel"] == 3
        assert row["mrr"] == pytest.approx(0.5, abs=1e-6)
        dcg = 1 / math.log2(3) + 1 / math.log2(5)
        idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert row["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
        assert row["recall"] == pytest.approx(2 / 3, abs=1e-6)

    def test_no_relevant_scores_zero(self, spark):
        run, qrels = _frames(
            spark,
            [("q1", "d1", 1), ("q1", "d2", 2)],
            [("q1", "d1", 0)],  # graded 0 → not relevant
        )
        [row] = ir_metrics(run, qrels, k=10).collect()
        assert (row["n_rel"], row["mrr"], row["ndcg"], row["recall"]) == (
            0,
            0.0,
            0.0,
            0.0,
        )

    def test_cutoff_excludes_deep_hits(self, spark):
        # Only relevant doc sits at rank 3; with k=2 nothing counts.
        run, qrels = _frames(
            spark,
            [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3)],
            [("q1", "d3", 1)],
        )
        [row] = ir_metrics(run, qrels, k=2).collect()
        assert row["n_rel"] == 1
        assert row["mrr"] == 0.0 and row["ndcg"] == 0.0 and row["recall"] == 0.0

    def test_ideal_dcg_saturates_at_k(self, spark):
        # 5 relevant docs, k=3, all top-3 are hits → perfect NDCG@3,
        # recall still counts the full 5-doc denominator.
        run, qrels = _frames(
            spark,
            [("q1", f"d{r}", r) for r in range(1, 4)],
            [("q1", f"d{r}", 1) for r in range(1, 6)],
        )
        [row] = ir_metrics(run, qrels, k=3).collect()
        assert row["ndcg"] == pytest.approx(1.0, abs=1e-6)
        assert row["recall"] == pytest.approx(3 / 5, abs=1e-6)
        assert row["mrr"] == pytest.approx(1.0, abs=1e-6)

    def test_multi_query_independent(self, spark):
        run, qrels = _frames(
            spark,
            [("q1", "a", 1), ("q2", "b", 1), ("q2", "c", 2)],
            [("q1", "a", 1), ("q2", "c", 1)],
        )
        out = {r["qid"]: r for r in ir_metrics(run, qrels, k=10).collect()}
        assert out["q1"]["mrr"] == pytest.approx(1.0)
        assert out["q2"]["mrr"] == pytest.approx(0.5)

    def test_plan_stays_native(self, spark):
        run, qrels = _frames(spark, [("q1", "a", 1)], [("q1", "a", 1)])
        plan = ir_metrics(run, qrels)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
