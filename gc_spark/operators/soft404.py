"""Soft-404 / template-page detection: hosts that answer HTTP 200 with the
same "not found" (or login-wall / consent-wall) body for unboundedly many
URLs. A crawler that can't spot these pollutes its corpus with millions of
identical error pages AND wastes frontier budget expanding links found on
them. Standard crawl-engineering practice (public literature: Bar-Yossef
et al. "Sic transit gloria telae", WWW'04 — probing for soft-404s; here we
detect them post-hoc from fingerprint concentration, which needs no extra
probe fetches).

Signal: within one host, a single body fingerprint claimed by a large
SHARE of the host's distinct URLs is a template, not content — real pages
are (near-)unique. Thresholds: share >= min_share of the host's URLs AND
at least min_count distinct URLs (small hosts can't produce evidence).

Scale shape: two hash aggregates — (host, fp) -> distinct-URL count, then
host -> total — joined back on host. The (host, fp) aggregate is the same
shuffle key the mirror detector (operators/mirrors) uses, so at 10^10 rows
the two share a partitioning when run in one pass. Output is
fingerprint-vocabulary sized, broadcastable into the drain loop as a
drop-filter (plans/drain applies it exactly like the CAC filter,
drain.py:468).

The reference has no equivalent (its per-site spiders assume curated
sites); this is a new-capability operator for the open-web tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def template_pages(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    fp_col: str = "fp",
    min_share: float = 0.1,
    min_count: int = 5,
) -> DataFrame:
    """(host, fp, n_urls, share, is_template) for every (host, fingerprint)
    with >= 2 distinct URLs — the multi-URL fingerprints are the only
    candidates, and emitting them keeps the output vocabulary-sized."""
    by_fp = (
        df.groupBy(host_col, fp_col)
        .agg(F.countDistinct(url_col).alias("n_urls"))
    )
    totals = df.groupBy(host_col).agg(
        F.countDistinct(url_col).alias("_host_urls")
    )
    return (
        by_fp.filter(F.col("n_urls") >= 2)
        .join(totals, host_col)
        .select(
            F.col(host_col).alias("host"),
            F.col(fp_col).alias("fp"),
            "n_urls",
            F.round(F.col("n_urls") / F.col("_host_urls"), 6).alias("share"),
            (
                (F.col("n_urls") / F.col("_host_urls") >= F.lit(min_share))
                & (F.col("n_urls") >= F.lit(min_count))
            ).alias("is_template"),
        )
    )
