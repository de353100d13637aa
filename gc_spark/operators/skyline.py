"""Skyline (Pareto frontier) — multi-criteria crawl-candidate selection.

Frontier scheduling constantly trades off incomparable signals — link
authority vs freshness vs depth; corpus curation trades quality vs
length vs dedup distance. A scalar weighted score hides the trade-off;
the skyline (Borzsonyi et al., ICDE'01 "The Skyline Operator") returns
exactly the rows NOT DOMINATED by any other row (another row >= on every
criterion and > on at least one), i.e. every candidate that is optimal
under SOME monotone preference.

Scale shape (the standard two-phase distributed skyline):
  - phase 1 prunes each partition to its LOCAL skyline with a vectorized
    numpy dominance test inside one mapInPandas pass — local skylines
    are tiny relative to partitions (dominance removes all but the
    Pareto shell), so this is the data-reducing step;
  - phase 2 re-prunes the unioned survivors in a single final group —
    safe because a global skyline point is necessarily a local skyline
    point in its own partition, and the survivor set is small by
    construction (documented bound: if the final shell does not fit one
    task, raise `max_survivors` awareness below — the operator counts).

All criteria are maximized; negate a column to minimize it.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prune(arr: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: row i survives iff no row dominates it.

    Rows are processed in sum-descending order. Domination implies a
    strictly greater coordinate sum, so any dominator of row i is
    processed BEFORE i and has already cleared i's keep bit (directly,
    or — if that dominator was itself killed — via a transitive
    dominator even earlier in the order). Each surviving row does one
    vectorized (n x k) kill-pass; dominated rows are skipped, so the
    cost is O(n x shell-size), not O(n^2), on real data."""
    keep = np.ones(arr.shape[0], dtype=bool)
    order = np.argsort(-arr.sum(axis=1), kind="stable")
    for idx in order:
        if not keep[idx]:
            continue
        dom = (arr[idx] >= arr).all(axis=1) & (arr[idx] > arr).any(axis=1)
        keep &= ~dom
    return keep


def skyline(df: DataFrame, criteria: list[str]) -> DataFrame:
    """Rows of `df` not dominated on the (maximized) `criteria` columns.
    Exact: two-phase local-prune / global-prune; ties and duplicate
    points all survive (neither dominates the other)."""
    cols = list(df.columns)

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield pdf[_prune(pdf[criteria].to_numpy(dtype=float))]

    survivors = df.mapInPandas(local, df.schema)

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[_prune(pdf[criteria].to_numpy(dtype=float))]

    return (
        survivors.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda key, pdf: final(key, pdf)[cols], df.schema)
    )
