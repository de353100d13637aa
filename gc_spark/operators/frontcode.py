"""Front coding — delta-prefix compression stats for sorted URL sets.

A 10^10-row URL frontier/seen manifest is dominated by long shared
prefixes (scheme://host/path segments); storing each sorted URL as
(length of prefix shared with its predecessor, remaining suffix) is the
classic front coding used by Lucene term dictionaries and WebGraph URL
lists. This operator computes the exact per-host storage win so the sink
can decide layout (sort-by-url within host partitions before write — the
same ordering the seen-set manifest already uses, reference manifest
contract in common/models.py).

Scale shape: one window per host (the partition key the frontier already
shuffles on — no extra shuffle when composed with the drain), and the
longest-common-prefix is a NATIVE fold (F.aggregate over a character
index sequence with a monotone accumulator) — per-row cost is URL length,
no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lcp_col(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of two strings, as a native
    fold: the accumulator advances only while every earlier character
    matched (acc == i-1), so the first mismatch freezes it."""
    return F.coalesce(
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.length(a), F.length(b))),
            F.lit(0),
            lambda acc, i: F.when(
                (acc == i - 1) & (a.substr(i, F.lit(1)) == b.substr(i, F.lit(1))),
                acc + 1,
            ).otherwise(acc),
        ),
        F.lit(0),  # empty sequence (an empty string) folds to null
    )


def front_coding_stats(
    df: DataFrame,
    url_col: str = "url",
    group_col: str = "host",
    overhead_bytes: int = 2,
) -> DataFrame:
    """(host, n_urls, raw_bytes, coded_bytes, saved_frac): exact front-
    coded size of each host's sorted distinct URL set, counting
    `overhead_bytes` per entry for the prefix-length varint. The first
    URL of each host is stored whole."""
    w = Window.partitionBy(group_col).orderBy(url_col)
    u = df.select(group_col, url_col).distinct()
    lcp = lcp_col(F.col(url_col), F.lag(url_col).over(w))
    per = u.select(
        F.col(group_col),
        F.length(url_col).alias("_raw"),
        (
            F.length(url_col)
            - F.coalesce(lcp, F.lit(0))
            + F.lit(overhead_bytes)
        ).alias("_coded"),
    )
    return per.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum("_raw").cast("long").alias("raw_bytes"),
        F.sum("_coded").cast("long").alias("coded_bytes"),
        F.round(
            F.lit(1.0) - F.sum("_coded") / F.sum("_raw"), 6
        ).alias("saved_frac"),
    )
