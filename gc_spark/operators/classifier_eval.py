"""Classifier evaluation — ROC-AUC and a precision/recall threshold
sweep for the engine's binary scorers.

calibration.py audits whether a score is a probability; these two audit
whether it RANKS and where to CUT it. Together they close the
classifier-evaluation seam (soft404, link-spam, quality gates):

  roc_auc — the probability a random positive outranks a random
    negative, computed by the tie-aware rank-sum identity
    AUC = (R_pos - n1(n1+1)/2) / (n1 n0), with the Hanley-McNeil
    standard error. Ranks come from the DISTINCT-SCORE contraction with
    two-phase sharded prefix sums (the ranktest discipline — no global
    sort at any scale).

  pr_at_thresholds — precision/recall/F1 at k operating points,
    computed as ONE conditional aggregate pass (3k counters unpivoted
    to rows) — never k scans, never a score-grain inequality join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    shard_width: float = 0.125,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (n_pos, n_neg, auc, gini, se). Ties get half credit
    (mid-rank identity); se is Hanley-McNeil."""
    y = F.col(label_col).cast("int")
    vals = (
        df.groupBy(F.col(score_col).cast("double").alias("v"))
        .agg(
            F.sum(F.when(y == 1, 1).otherwise(0)).alias("np"),
            F.sum(F.when(y == 1, 0).otherwise(1)).alias("nn"),
        )
        .withColumn("t", F.col("np") + F.col("nn"))
        .withColumn("_shard", F.floor(F.col("v") / F.lit(shard_width)))
        # feeds both the local cumsum and the shard totals: lazy
        # checkpoint = one corpus scan instead of two
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("_shard")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = vals.withColumn(
        "_cum", F.coalesce(F.sum("t").over(w_local), F.lit(0))
    )
    shard_tot = vals.groupBy("_shard").agg(F.sum("t").alias("_st"))
    w_off = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = shard_tot.withColumn(
        "_off", F.coalesce(F.sum("_st").over(w_off), F.lit(0))
    ).select("_shard", "_off")
    ranked = local.join(F.broadcast(offsets), "_shard").withColumn(
        "avg_rank", F.col("_off") + F.col("_cum") + (F.col("t") + 1) / 2.0
    )
    agg = ranked.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np") * F.col("avg_rank")).alias("_rp"),
    )
    n1 = F.col("n_pos").cast("double")
    n0 = F.col("n_neg").cast("double")
    auc = (F.col("_rp") - n1 * (n1 + 1.0) / 2.0) / (n1 * n0)
    q1 = auc / (2.0 - auc)
    q2 = 2.0 * auc * auc / (1.0 + auc)
    se = F.sqrt(
        (
            auc * (1.0 - auc)
            + (n1 - 1.0) * (q1 - auc * auc)
            + (n0 - 1.0) * (q2 - auc * auc)
        )
        / (n1 * n0)
    )
    r = round_digits
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(auc, r).alias("auc"),
        F.round(2.0 * auc - 1.0, r).alias("gini"),
        F.round(se, r).alias("se"),
    )


def pr_at_thresholds(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    round_digits: int = 6,
) -> DataFrame:
    """(threshold, n_pred_pos, tp, precision, recall, f1) per operating
    point (predicted positive = score >= threshold); precision is NULL
    when nothing is predicted positive, f1 NULL when undefined."""
    ths = sorted(set(float(t) for t in thresholds))
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    aggs = [F.sum(F.when(y == 1, 1).otherwise(0)).alias("_p")]
    for i, t in enumerate(ths):
        pred = s >= F.lit(t)
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"_pp{i}"))
        aggs.append(
            F.sum(F.when(pred & (y == 1), 1).otherwise(0)).alias(f"_tp{i}")
        )
    one = df.agg(*aggs)
    rows = one.select(
        "_p",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("threshold"),
                        F.col(f"_pp{i}").alias("n_pred_pos"),
                        F.col(f"_tp{i}").alias("tp"),
                    )
                    for i, t in enumerate(ths)
                ]
            )
        ).alias("_s"),
    ).select("_p", "_s.threshold", "_s.n_pred_pos", "_s.tp")
    r = round_digits
    prec = F.when(
        F.col("n_pred_pos") > 0,
        F.round(F.col("tp") / F.col("n_pred_pos").cast("double"), r),
    )
    rec = F.when(
        F.col("_p") > 0, F.round(F.col("tp") / F.col("_p").cast("double"), r)
    ).otherwise(F.lit(0.0))
    return rows.select(
        "threshold",
        "n_pred_pos",
        "tp",
        prec.alias("precision"),
        rec.alias("recall"),
        # F1 via the 2TP/(PP+P) identity — exact, no composition of
        # rounded precision/recall; 0 when TP=0 but either side is
        # non-empty, NULL only when PP = P = 0
        F.when(
            (F.col("n_pred_pos") + F.col("_p")) > 0,
            F.round(
                2.0
                * F.col("tp").cast("double")
                / (F.col("n_pred_pos") + F.col("_p")).cast("double"),
                r,
            ),
        ).alias("f1"),
    )
