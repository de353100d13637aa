"""Best-passage extraction — where in the document does the query hit
densest?

The serving stack ranks documents (BM25/MaxScore/QLM/RM3); the snippet
generator needs the OFFSET: the width-w token window containing the
most query-term occurrences, which is also the passage-level relevance
signal passage-ranking rerankers consume. Classic density maximization,
deterministically tie-broken to the earliest window.

Scale shape: the corpus-side explode is filtered to the query terms at
the scan (a |q|/|V| sliver survives, as in maxscore/rm3), so the
per-doc window runs over MATCH POSITIONS only — the count-in-[p, p+w)
sweep is a single range-frame window per doc over those few rows, never
over the token stream. No self-joins, no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def best_passage(
    df: DataFrame,
    query_terms: Sequence[str],
    width: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, passage_start, n_hits) for every doc matching >= 1 term:
    passage_start is the 0-based token offset of the best width-token
    window (max hits, then earliest), n_hits the query-term occurrences
    inside it. Every candidate window starts AT a match (an optimal
    window always exists with a match at its left edge)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pos = (
        df.select(F.col(id_col), F.posexplode(toks).alias("pos", "term"))
        .where(F.col("term").isin(list(query_terms)))
        .select(id_col, F.col("pos").cast("long").alias("pos"))
    )
    w_range = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rangeBetween(Window.currentRow, width - 1)
    )
    hits = pos.withColumn("n_hits", F.count("*").over(w_range))
    w_pick = Window.partitionBy(id_col).orderBy(
        F.desc("n_hits"), F.asc("pos")
    )
    return (
        hits.withColumn("_r", F.row_number().over(w_pick))
        .where(F.col("_r") == 1)
        .select(id_col, F.col("pos").alias("passage_start"), "n_hits")
    )
