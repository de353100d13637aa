"""Percolation — match a document stream against a table of STORED queries.

The reference runs 41 per-site spiders whose item pipelines decide, per
document, which downstream consumers care (notification fan-out in
common/slack-style reporting); the search-engine generalization is
percolation (Elasticsearch's percolator): thousands of registered
term queries, and each crawled batch asks "which stored queries does this
new doc satisfy?" — alerting, routing, and saved-search evaluation.

Scale shape (the classic inversion):
  - the QUERY side is exploded into a (term -> query_id) index — tiny
    relative to the corpus and broadcast to every executor;
  - the DOC side tokenizes and immediately semi-joins against the
    broadcast term index, so only tokens that appear in at least one
    stored query survive past the scan;
  - one (doc, query) groupBy counts matched must-terms; a query fires
    when the count equals its must-term cardinality (AND semantics).
  Nothing corpus-sized ever shuffles except the filtered (doc, term)
  slice — the same shape as serving-side query_eval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    terms_col: str = "must_terms",
) -> DataFrame:
    """(query_id, doc_id) for every stored query whose must-terms ALL
    appear in the document. Duplicate terms in a query count once."""
    qterms = queries.select(
        F.col(qid_col), F.explode(F.array_distinct(F.col(terms_col))).alias("term")
    )
    qsize = queries.select(
        F.col(qid_col),
        F.size(F.array_distinct(F.col(terms_col))).alias("_need"),
    )
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .join(F.broadcast(qterms), "term")
        .select(id_col, qid_col, "term")
        .distinct()
    )
    hits = toks.groupBy(id_col, qid_col).agg(
        F.count("*").cast("int").alias("_got")
    )
    return (
        hits.join(F.broadcast(qsize), qid_col)
        .filter(F.col("_got") == F.col("_need"))
        .select(qid_col, id_col)
    )
