"""URL path-template mining — structural clustering of a host's URL space.

The param-based DUST learner (operators/dust.py) and the trap detector
(operators/traps.py) work on query strings and cardinality explosions; this
operator abstracts the PATH: each segment is classified to a type token
(<num>, <hex>, <uuid>, <mixed>, or the literal segment for plain words) and
URLs collapse to their template. Per (host, template) counts drive crawl
policy: calendar/session templates show up as one template with exploding
URL cardinality (budget-cap it), singleton templates are usually junk, and
stable templates with modest cardinality are the site's real content shape.

Everything up to the (host, template) aggregate is map-side array work on
the split path — one shuffle, keyed on (host, template), output bounded by
the template vocabulary (tiny vs the frontier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_RE = "^[0-9]+$"
HEX_RE = "^[0-9a-f]{16,}$"
UUID_RE = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
WORD_RE = "^[a-z0-9_.-]+$"


def _classify(seg: Column) -> Column:
    return (
        F.when(seg.rlike(NUM_RE), F.lit("<num>"))
        .when(seg.rlike(UUID_RE), F.lit("<uuid>"))
        .when(seg.rlike(HEX_RE), F.lit("<hex>"))
        .when(seg.rlike(WORD_RE), seg)
        .otherwise(F.lit("<mixed>"))
    )


def url_template_col(url: Column) -> Column:
    """'/'-joined type signature of the URL's path, e.g.
    https://h/news/2024/01/story-x -> /news/<num>/<num>/story-x.
    Pure string/array expressions — map-side."""
    # path = everything after the authority, query/fragment stripped
    path = F.regexp_replace(
        F.regexp_extract(url, "^[a-z]+://[^/]+(/[^?#]*)?", 1), "/+$", ""
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    return F.concat(
        F.lit("/"), F.array_join(F.transform(segs, _classify), "/")
    )


def template_stats(
    df: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """(host, template, n_urls, sample_url): the per-host URL-space map.
    sample_url = lexicographic min, a deterministic representative."""
    return (
        df.select(
            F.col(host_col).alias("host"),
            url_template_col(F.col(url_col)).alias("template"),
            F.col(url_col).alias("_u"),
        )
        .groupBy("host", "template")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("_u").alias("sample_url"),
        )
    )
