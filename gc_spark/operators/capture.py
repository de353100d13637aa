"""Capture-recapture corpus-size estimation — "how big is this source?".

A crawler never sees a source's full corpus; it sees samples. Two
quasi-independent crawl passes over the same source give the classic
mark-recapture estimate of the true corpus size: if pass 1 saw n1 docs,
pass 2 saw n2, and m appeared in both, Chapman's bias-corrected
Lincoln-Petersen estimator is

    N_hat = (n1 + 1)(n2 + 1) / (m + 1) - 1

with closed-form standard error (Chapman 1951; Seber's "Estimation of
Animal Abundance" is the standard reference). Crawl planning reads this
directly: `unseen_share` (estimated docs neither pass surfaced) is the
payoff of scheduling a third pass, the same exhaustion question
goodturing.py answers from within a single pass.

Scale shape: each pass contracts to distinct (group, id) once — the only
corpus-sized shuffles — then everything is per-group counts joined at
group grain (tiny). No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capture_recapture(
    cap1: DataFrame,
    cap2: DataFrame,
    id_col: str,
    group_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """(group, n1, n2, m, n_hat, se, unseen_share) per group.

    n_hat is Chapman's bias-corrected estimate; se its closed-form
    standard error; unseen_share = 1 - (n1 + n2 - m)/n_hat, clamped at 0
    (the estimated fraction of the corpus neither pass surfaced).
    Groups with zero overlap still get a finite estimate (the +1 terms).
    """
    d1 = cap1.select(F.col(group_col).alias("grp"), F.col(id_col).alias("id")).distinct()
    d2 = cap2.select(F.col(group_col).alias("grp"), F.col(id_col).alias("id")).distinct()

    n1 = d1.groupBy("grp").agg(F.count("*").alias("n1"))
    n2 = d2.groupBy("grp").agg(F.count("*").alias("n2"))
    m = (
        d1.join(d2, ["grp", "id"])
        .groupBy("grp")
        .agg(F.count("*").alias("m"))
    )

    j = (
        n1.join(n2, "grp", "outer")
        .join(m, "grp", "left")
        .fillna(0, ["n1", "n2", "m"])
    )
    n1c = F.col("n1").cast("double")
    n2c = F.col("n2").cast("double")
    mc = F.col("m").cast("double")
    n_hat = (n1c + 1) * (n2c + 1) / (mc + 1) - 1
    var = (
        (n1c + 1)
        * (n2c + 1)
        * (n1c - mc)
        * (n2c - mc)
        / ((mc + 1) * (mc + 1) * (mc + 2))
    )
    seen = n1c + n2c - mc
    return j.select(
        F.col("grp").alias(group_col),
        "n1",
        "n2",
        "m",
        F.round(n_hat, round_digits).alias("n_hat"),
        F.round(F.sqrt(var), round_digits).alias("se"),
        F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - seen / n_hat), round_digits
        ).alias("unseen_share"),
    )
