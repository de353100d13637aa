"""Serving-side query evaluation over the corpus — phrase and boolean match.

The reference's crawl output feeds the GAMECHANGER search stack (its
manifest + documents are the indexer's input, reference
`gamechangerml`-facing manifest contract in common/models.py); the engine
already builds the positional index (operators/inverted.py) and ranks with
BM25 (operators/bm25.py). This module closes the loop with the two exact
query primitives a search serving layer needs and Spark lacks as
built-ins: positional PHRASE match and minimum-should-match BOOLEAN match.

Scale shape (10^10-doc corpus):
  - tokenize once and FILTER TO THE QUERY TERMS immediately — the filter
    sits directly above the scan, so only the tiny matching slice of the
    token stream ever shuffles;
  - ONE shuffle total: groupBy(doc) building a term->positions map;
    the per-term position arrays are bounded by per-doc term frequency,
    not corpus size;
  - the phrase adjacency fold is a pure column expression
    (array_intersect over shifted positions), n-1 intersections for an
    n-term phrase, no joins, no UDF — whole-stage codegen end to end.

Phrase semantics: positions are 0-based token offsets; a phrase matches
where term i+1 occurs at (position of term i) + 1. Repeated query terms
are supported (the map entry is reused per slot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _term_positions(
    df: DataFrame, terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """(doc, term -> sorted positions map) for docs containing every term."""
    uniq = sorted(set(terms))
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "term"),
    ).filter(F.col("term").isin(uniq))
    plists = toks.groupBy(id_col, "term").agg(
        F.sort_array(F.collect_list("pos")).alias("plist")
    )
    return plists.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("term"), F.col("plist")))
        ).alias("_tm")
    )


def phrase_match(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_occurrences, first_pos) for docs containing the exact
    consecutive token sequence `phrase`. first_pos is the 0-based token
    offset where the earliest occurrence starts."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    docs = _term_positions(df, phrase, text_col, id_col).filter(
        F.size("_tm") == len(set(phrase))
    )
    cur: Column = F.element_at("_tm", F.lit(phrase[0]))
    for term in phrase[1:]:
        cur = F.array_intersect(
            F.transform(cur, lambda p: p + 1),
            F.element_at("_tm", F.lit(term)),
        )
    # `cur` holds the positions of the LAST term of each full match.
    return (
        docs.select(F.col(id_col), cur.alias("_m"))
        .filter(F.size("_m") > 0)
        .select(
            F.col(id_col),
            F.size("_m").cast("long").alias("n_occurrences"),
            (F.array_min("_m") - F.lit(len(phrase) - 1)).alias("first_pos"),
        )
    )


def boolean_match(
    df: DataFrame,
    must: list[str],
    should: list[str] | None = None,
    min_should: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_should) for docs containing ALL `must` terms and at
    least `min_should` distinct `should` terms (Lucene's
    minimum-should-match). With no should-terms the should clause is
    vacuously satisfied."""
    should = should or []
    all_terms = sorted(set(must) | set(should))
    if not all_terms:
        raise ValueError("need at least one term")
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.col("term").isin(all_terms))
    agg = toks.groupBy(id_col).agg(
        F.collect_set("term").alias("_terms"),
    )
    must_arr = F.array(*[F.lit(t) for t in sorted(set(must))])
    should_arr = F.array(*[F.lit(t) for t in sorted(set(should))])
    n_should = F.size(F.array_intersect(F.col("_terms"), should_arr))
    return agg.filter(
        (F.size(F.array_intersect(F.col("_terms"), must_arr)) == len(set(must)))
        & (F.lit(len(should) == 0) | (n_should >= min_should))
    ).select(
        F.col(id_col),
        F.greatest(n_should, F.lit(0)).cast("long").alias("n_should"),
    )
