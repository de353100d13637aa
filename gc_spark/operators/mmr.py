"""MMR — maximal marginal relevance diversification of a top-k run.

The retrieval family (cosine/IVF/PQ top-k, BM25, RRF fusion) returns the
k highest-scoring docs; near-duplicate corpora make those k copies of one
another. MMR (Carbonell & Goldstein, SIGIR'98) re-picks greedily:

    next = argmax  lam * rel(d) - (1 - lam) * max_{s in selected} sim(d, s)

Scale shape: relevance and the candidate pool come from the distributed
ranker (run-sized, k' rows per query); the greedy loop is PER QUERY over
that tiny pool, so it runs as one applyInPandas group per query with a
vectorized numpy pairwise-cosine matrix — the loop is k picks, never
corpus-sized. Decision arithmetic is fixed-point: similarities and
relevances round to `round_digits` BEFORE the argmax, so the pick
sequence is stable across engines/BLAS orderings and the SQL oracle can
replay it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def mmr_diversify(
    cands: DataFrame,
    k: int,
    lam: float = 0.7,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
    round_digits: int = 6,
) -> DataFrame:
    """(qid, rank, vec_id, mmr_score): the first min(k, n) MMR picks per
    query. Ties break toward the smaller id (candidates are processed in
    id order)."""

    def step(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((V * V).sum(axis=1))
        S = np.round((V @ V.T) / np.outer(norms, norms), round_digits)
        rel = np.round(pdf[rel_col].to_numpy(dtype=float), round_digits)
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        chosen = np.zeros(n, dtype=bool)
        maxsim = None  # empty selected set: no diversity penalty at all
        ranks, out_ids, scores = [], [], []
        for r in range(1, min(k, n) + 1):
            if maxsim is None:
                score = lam * rel
            else:
                # raw max over selected — a NEGATIVE max-sim legitimately
                # boosts the score above lam*rel (anti-similar candidate).
                score = lam * rel - (1.0 - lam) * maxsim
            score[chosen] = -np.inf
            best = int(np.argmax(score))  # first max = smallest id
            ranks.append(r)
            out_ids.append(ids[best])
            scores.append(round(float(score[best]), round_digits))
            chosen[best] = True
            maxsim = (
                S[:, best].copy()
                if maxsim is None
                else np.maximum(maxsim, S[:, best])
            )
        return pd.DataFrame(
            {
                "qid": key[0],
                "rank": np.array(ranks, dtype=np.int32),
                id_col: out_ids,
                "mmr_score": scores,
            }
        )

    return cands.groupBy(qid_col).applyInPandas(
        step, f"qid string, rank int, {id_col} long, mmr_score double"
    )
