"""Unit tests for similarity.semantic_dedup (SemDeDup pruning)."""

from __future__ import annotations

from gc_spark.operators.similarity import semantic_dedup, train_ivf_centroids


def _rows(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs], ["vec_id", "embedding"]
    )


class TestSemanticDedup:
    def test_within_cluster_dup_dropped_lowest_kept(self, spark):
        # two well-separated directions; 1 and 2 are scaled copies (cos 1.0)
        df = _rows(
            spark,
            [
                (0, [1.0, 0.0, 0.0, 0.0]),
                (1, [0.0, 1.0, 0.0, 0.0]),
                (2, [0.0, 2.0, 0.0, 0.0]),
            ],
        )
        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
        kept = {r["vec_id"]: r["cell"] for r in semantic_dedup(df, cents, 0.9).collect()}
        assert set(kept) == {0, 1}
        assert kept[1] == 1  # dup 2 dropped, lowest id kept, right cell

    def test_cross_cluster_dups_survive(self, spark):
        # identical vectors forced into different cells are NOT compared —
        # the SemDeDup locality contract (prune is intra-cluster only)
        df = _rows(spark, [(0, [1.0, 0.9]), (1, [0.9, 1.0])])  # cos ~ 0.994
        cents = [[1.0, 0.0], [0.0, 1.0]]  # each point snaps to its own cell
        kept = semantic_dedup(df, cents, threshold=0.9)
        assert kept.count() == 2

    def test_below_threshold_kept(self, spark):
        df = _rows(spark, [(0, [1.0, 0.0]), (1, [0.8, 0.6])])  # cos = 0.8
        cents = [[1.0, 0.0]]
        assert semantic_dedup(df, cents, threshold=0.9).count() == 2
        assert semantic_dedup(df, cents, threshold=0.79).count() == 1

    def test_seed_training_iters0_returns_unit_seeds(self, spark):
        df = _rows(spark, [(0, [3.0, 0.0]), (1, [0.0, 5.0]), (2, [1.0, 1.0])])
        cents = train_ivf_centroids(df, num_cells=2, dim=2, iters=0)
        assert cents == [[1.0, 0.0], [0.0, 1.0]]
