"""Per-host boilerplate line detection & stripping — the CCNet-style
template filter: a line that appears in a large fraction of one host's
pages (nav bars, cookie banners, copyright footers) is template, not
content, and should not survive into training text.

Distinct from C4 line dedup (operators/linedup): that removes globally
duplicate lines wherever they occur; this measures DOCUMENT frequency of
a line WITHIN a host and flags lines crossing a fraction threshold —
host-local template detection that keeps a quote legitimately repeated
across two hosts.

Plan shape: docs split to per-doc DISTINCT lines map-side (array_distinct
before the explode, so a line repeated inside one doc counts once), one
(host, line) groupBy with map-side combine, then a broadcast join of the
host-cardinality doc-count table for the fraction. Stripping is the same
explode anti-joined against the (small, broadcast) boilerplate set and
re-assembled in original line order — one doc_id regroup.

No reference twin: SURVEY.md §6 / LLM-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_lines(df: DataFrame, host_col: str, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(host_col).alias("host"),
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), r"\n"))
        ).alias("line"),
    ).where(F.trim(F.col("line")) != "")


def boilerplate_lines(
    df: DataFrame,
    threshold: float = 0.3,
    host_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(host, line, n_docs_with_line, doc_frac) for lines appearing in
    >= threshold of the host's documents."""
    host_docs = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("_hn")
    )
    lines = _doc_lines(df, host_col, text_col, id_col)
    counts = lines.groupBy("host", "line").agg(
        F.count("*").alias("n_docs_with_line")
    )
    return (
        counts.join(F.broadcast(host_docs), "host")
        .withColumn(
            "doc_frac",
            F.round(
                F.col("n_docs_with_line").cast("double") / F.col("_hn").cast("double"),
                6,
            ),
        )
        .where(F.col("doc_frac") >= threshold)
        .select("host", "line", "n_docs_with_line", "doc_frac")
    )


def strip_boilerplate(
    df: DataFrame,
    boilerplate: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text) with each host's boilerplate lines removed, remaining
    lines re-joined in original order. `boilerplate` is (host, line, ...)
    from boilerplate_lines — template-cardinality, so it broadcasts."""
    pos_lines = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_pos", "line"),
    )
    kept = pos_lines.join(
        F.broadcast(boilerplate.select("host", "line")), ["host", "line"], "left_anti"
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
