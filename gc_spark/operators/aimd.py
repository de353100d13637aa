"""AIMD adaptive per-host crawl delay — congestion control for politeness.

The reference crawls with a fixed per-spider DOWNLOAD_DELAY and relies on
Scrapy's AutoThrottle for adaptation (scrapy settings in
config/config.py); the Spark-native engine schedules fetches in
micro-batches, so the adaptive-delay twin is a batch recurrence: each
host's delay halves-ish on success and doubles on throttle signals —
TCP's AIMD rule (additive decrease here, multiplicative increase on
failure, both clamped), the standard public congestion-control shape.

    d_0 = base
    after outcome i:  fail    -> min(2 * d_{i-1}, dmax)
                      success -> max(d_{i-1} - dec, dmin)

Scale shape: the recurrence is sequential PER HOST but independent ACROSS
hosts, so the grid is flipped — hosts are bucketed by hash into
`n_buckets` groups (same salted-host seam as the drain), and inside each
Arrow batch the recurrence runs VECTORIZED ACROSS ALL HOSTS of the bucket,
one numpy step per sequence position. The Python loop length is the max
per-host history length (bounded by the politeness budget per scheduling
window), never the row count; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def aimd_delays(
    df: DataFrame,
    host_col: str = "host",
    order_col: str = "seq",
    fail_col: str = "fail",
    base: float = 1000.0,
    dmin: float = 100.0,
    dmax: float = 8000.0,
    dec: float = 250.0,
    n_buckets: int = 32,
) -> DataFrame:
    """(host, rn, delay_ms): the delay in force AFTER the rn-th outcome
    (1-based, ordered by `order_col` within each host) under the AIMD
    rule. Deterministic; ties in `order_col` are broken by it being
    required unique per host (use event ids)."""
    ranked = df.select(
        F.col(host_col).alias("host"),
        F.col(fail_col).cast("boolean").alias("fail"),
        F.row_number()
        .over(Window.partitionBy(host_col).orderBy(F.col(order_col)))
        .alias("rn"),
        F.pmod(F.xxhash64(F.col(host_col)), F.lit(n_buckets)).alias("_b"),
    )

    def step(pdf: pd.DataFrame) -> pd.DataFrame:
        # hosts × steps grid; NaN marks positions past a host's history.
        grid = pdf.pivot(index="host", columns="rn", values="fail")
        grid = grid.reindex(columns=sorted(grid.columns))
        hosts = grid.index.to_numpy()
        fails = grid.to_numpy()  # object/float with NaN holes
        active = ~pd.isna(fails)
        n_hosts, n_steps = fails.shape
        d = np.full(n_hosts, float(base))
        out_h, out_rn, out_d = [], [], []
        for j in range(n_steps):
            f = fails[:, j]
            is_fail = np.where(active[:, j], f.astype(object), False).astype(bool)
            nxt = np.where(
                is_fail,
                np.minimum(2.0 * d, float(dmax)),
                np.maximum(d - float(dec), float(dmin)),
            )
            d = np.where(active[:, j], nxt, d)
            sel = active[:, j]
            out_h.append(hosts[sel])
            out_rn.append(np.full(int(sel.sum()), j + 1, dtype=np.int32))
            out_d.append(d[sel])
        return pd.DataFrame(
            {
                "host": np.concatenate(out_h) if out_h else [],
                "rn": np.concatenate(out_rn) if out_rn else [],
                "delay_ms": np.round(np.concatenate(out_d), 6) if out_d else [],
            }
        )

    return ranked.groupBy("_b").applyInPandas(
        step, "host string, rn int, delay_ms double"
    )
