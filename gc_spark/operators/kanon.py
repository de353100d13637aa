"""k-anonymity / l-diversity audit — release-safety gate for crawled metadata.

Before a crawled corpus's metadata (host, date, doc type, office symbol...)
ships to a downstream consumer, the release question is Sweeney's
k-anonymity: does every quasi-identifier combination describe at least k
rows? Rows in smaller equivalence classes are re-identifiable. The
companion l-diversity check (Machanavajjhala et al. 2007) catches the
homogeneity attack k-anonymity misses: a class can be large yet leak the
sensitive value outright when every row in it shares one.

This is the table-level audit that complements the row-level PII ops
(luhn.py span detection, pseudonym.py redaction): those scrub values,
this one says whether the *shape* of what remains is safe to release.

Scale shape: one groupBy over the quasi-identifier columns (the only
corpus-sized shuffle, map-side combined), then scalar aggregates over the
class table. The sensitive-diversity pass rides the same grouping with a
count_distinct. Output is a single summary row — nothing wider than the
class table ever shuffles, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """One summary row: (k, n_rows, n_classes, min_class_size,
    violating_classes, rows_at_risk, risk_share[, homogeneous_classes,
    rows_exposed]).

    A class is violating when its size < k; rows_at_risk is the number of
    rows in violating classes. With sensitive_col, homogeneous_classes
    counts classes (of any size >= 2) where every row shares one
    sensitive value — the l-diversity (l=2) failure — and rows_exposed
    their row total.
    """
    aggs = [F.count("*").alias("sz")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("n_sens"))
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)

    out_cols = [
        F.lit(k).alias("k"),
        F.sum("sz").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("sz").alias("min_class_size"),
        F.sum(F.when(F.col("sz") < k, 1).otherwise(0)).alias(
            "violating_classes"
        ),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0)).alias(
            "rows_at_risk"
        ),
    ]
    summary = classes.agg(*out_cols).withColumn(
        "risk_share",
        F.round(
            F.col("rows_at_risk").cast("double") / F.col("n_rows"),
            round_digits,
        ),
    )
    if sensitive_col is not None:
        homog = classes.agg(
            F.sum(
                F.when((F.col("sz") >= 2) & (F.col("n_sens") == 1), 1).otherwise(0)
            ).alias("homogeneous_classes"),
            F.sum(
                F.when(
                    (F.col("sz") >= 2) & (F.col("n_sens") == 1), F.col("sz")
                ).otherwise(0)
            ).alias("rows_exposed"),
        )
        summary = summary.crossJoin(F.broadcast(homog))
    return summary
