"""Token-budget corpus selection — greedily keep the best documents per
group until a token budget is exhausted (the final cut every pretraining
mix makes: "N billion tokens per source, best-first").

Semantics: within each group, order docs by (score desc, id asc); a doc
is kept iff the cumulative token count of strictly-better docs is still
below the budget (so the budget-crossing doc is the last one kept —
standard greedy prefix, deterministic).

Plan shape: ONE window per group (cumulative sum over the group ordering)
— a single hash-partition shuffle on the group key plus a sort within
partitions; no self-join, no driver iteration. Group skew (a source with
10^9 docs) is the window-sort bound; at that scale pre-bucket the group
by score range (mixture-weights' broadcast cutpoints, operators/
quantiles) and run the window per bucket with carried offsets.

No reference twin: LLM-pipeline family (SURVEY.md §6 / round brief);
composes with q67 length buckets and q76 mixture weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str,
    tokens_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of `df` that survive the per-group greedy budget, plus
    cum_tokens (inclusive running total in selection order)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("bigint")).over(w)
    return (
        df.withColumn("cum_tokens", cum)
        .where(F.col("cum_tokens") - F.col(tokens_col) < F.lit(budget))
    )
