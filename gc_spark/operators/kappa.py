"""Cohen's kappa — chance-corrected agreement between two labelers.

When two quality classifiers (a heuristic filter and a model scorer, two
LLM judges, a new language-ID against the old one) label the same
corpus, raw agreement overstates consistency: two labelers that both say
"good" 95% of the time agree 90.25% by luck alone. Cohen's kappa (Cohen
1960) corrects for that chance floor:

    kappa = (p_o - p_e) / (1 - p_e)

with p_o the observed agreement and p_e the agreement expected from the
marginal label distributions. The standard gate before swapping a
pipeline classifier: kappa >= 0.8 is near-interchangeable, <= 0.4 means
the new labeler is a different opinion, not a cheaper copy.

Scale shape: one (label_a, label_b) groupBy over the corpus — the only
corpus-sized shuffle — then marginals and the diagonal are label-grain
aggregates joined at label grain (tiny). Output is a single summary row.
No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (n, p_o, p_e, kappa). Labels are compared as-is; rows
    where either label is NULL are excluded."""
    cm = (
        df.where(F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull())
        .groupBy(F.col(rater_a).alias("la"), F.col(rater_b).alias("lb"))
        .agg(F.count("*").alias("cnt"))
    )
    row_m = cm.groupBy("la").agg(F.sum("cnt").alias("rm"))
    col_m = cm.groupBy(F.col("lb").alias("la")).agg(F.sum("cnt").alias("cm_"))
    expected = (
        row_m.join(col_m, "la")
        .agg(F.sum(F.col("rm").cast("double") * F.col("cm_")).alias("_e"))
    )
    base = cm.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("cnt")).otherwise(0))
        .cast("double")
        .alias("_diag"),
    )
    j = base.crossJoin(F.broadcast(expected))
    po = F.col("_diag") / F.col("n")
    pe = F.col("_e") / (F.col("n").cast("double") * F.col("n"))
    return j.select(
        "n",
        F.round(po, round_digits).alias("p_o"),
        F.round(pe, round_digits).alias("p_e"),
        F.round((po - pe) / (F.lit(1.0) - pe), round_digits).alias("kappa"),
    )
