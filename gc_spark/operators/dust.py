"""DUST-style URL parameter-rule learning — "Different URLs, Similar Text"
(Bar-Yossef et al., WWW'07 — public literature): learn, per (host, query
parameter), whether the parameter is CONTENT-IRRELEVANT (session ids,
tracking tags, sort orders that don't change the body) so the canonicalizer
can strip it and the frontier stops re-fetching the same page under
thousands of aliases. On a 10^10-URL frontier this is the single biggest
dedup lever after exact URL canonicalization (q18): one sticky sessionid
parameter multiplies a site's URL space by the session count.

Evidence model: group URLs that are identical except for ONE parameter's
value (same host, path, and remaining query string). If every such group
maps to exactly one content fingerprint, the parameter never changed the
content; any group with >1 fingerprint is a counterexample. A rule needs
`min_groups` independent multi-value groups of support before it's trusted.

Scale shape: one str_to_map parse + one explode (rows × params-per-url),
one hash aggregate keyed by (host, path, rest-of-query, param) — the same
shuffle a groupBy dedup would do — then a vocabulary-sized rollup to
(host, param). No self-joins, no Python. The learned rule table is tiny
(hosts × param names) and broadcasts back into the canonicalizer
(functions/urls.canonical_url) as a strip-list.

Complements (not in the reference, which hand-writes per-site URL rules in
each spider — e.g. spiders/dha_pubs.py pins exact query strings): this
LEARNS the strip rules from crawl evidence instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_rest(params_col, param_col) -> "F.Column":
    """Remaining query string with `param` removed, entries sorted by key —
    the group identity 'identical except this parameter'."""
    rest = F.map_filter(params_col, lambda k, _: k != param_col)
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(rest)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        "&",
    )


def learn_param_rules(
    df: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    query_col: str = "query",
    fp_col: str = "fp",
    min_groups: int = 2,
) -> DataFrame:
    """(host, param, groups_multi, violations, strippable) per query
    parameter observed on the host.

    groups_multi  — URL groups identical but for this param that saw >= 2
                    distinct values (the only groups that carry evidence).
    violations    — of those, groups whose content fingerprint changed.
    strippable    — groups_multi >= min_groups and violations == 0.
    """
    params = F.str_to_map(F.col(query_col), F.lit("&"), F.lit("="))
    long = df.select(
        F.col(host_col).alias("host"),
        F.col(path_col).alias("path"),
        F.col(fp_col).alias("fp"),
        params.alias("_params"),
    ).select(
        "host",
        "path",
        "fp",
        F.explode("_params").alias("param", "value"),
        F.col("_params"),
    )
    # Contract to distinct (host, path, rest, param, value, fp) tuples
    # BEFORE the two countDistincts: a multi-distinct aggregate plans as an
    # Expand (x2 rows) over its input, so feeding it the contracted tuple
    # set instead of the raw exploded stream bounds the expansion by true
    # combination cardinality, not observation count (guide §2.3).
    six = (
        long.select(
            "host",
            "param",
            "value",
            "fp",
            _canonical_rest(F.col("_params"), F.col("param")).alias("rest"),
            "path",
        )
        .groupBy("host", "path", "rest", "param", "value", "fp")
        .agg(F.lit(1).alias("_one"))
    )
    groups = six.groupBy("host", "path", "rest", "param").agg(
        F.countDistinct("value").alias("_nv"),
        F.countDistinct("fp").alias("_nf"),
    )
    return (
        groups.filter(F.col("_nv") >= 2)
        .groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).alias("groups_multi"),
            F.sum((F.col("_nf") > 1).cast("long")).alias("violations"),
        )
        .select(
            "host",
            "param",
            "groups_multi",
            "violations",
            (
                (F.col("groups_multi") >= F.lit(min_groups))
                & (F.col("violations") == 0)
            ).alias("strippable"),
        )
    )
