"""Crawler-trap detection and frontier skew profiling.

Two host-level diagnostics a web-scale frontier runs every batch:

  detect_traps — flag hosts whose URL space is exploding (calendar pages,
    session ids, faceted search: infinitely many URLs mapping to few
    distinct pages). Signal: distinct URLs per distinct PATH — a trap host
    mints unbounded query-string variants of the same paths. Flagged hosts
    get their politeness budget cut / patterns excluded, which is how real
    crawlers (cf. Heritrix's "pathological URI" rules) keep 10^10 frontiers
    from filling with junk. The reference never needs this (41 fixed
    sites); it is load-bearing at open-web scale.

  skew_profile — quantify per-host frontier skew and recommend the salt
    bucket count for the politeness window (operators/politeness takes
    salt_buckets; this computes it instead of guessing). The north rule
    calls for explicit skew handling — this makes the decision data-driven:
    buckets = ceil(host_rows / target_rows_per_task), capped.

Both are single groupBy(host) aggregates (map-side partials, one shuffle of
per-host rows). Exact count_distinct here doubles as the oracle-checkable
form; at 10^10 rows swap approx_count_distinct(HLL, mergeable sketch) for
the distinct-URL/path counts — flagging needs ratios, not exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe URL pieces (no lookarounds; DuckDB runs them verbatim)
HOST_RE = r"^[a-z]+://([^/?#]+)"
PATH_RE = r"^[a-z]+://[^/?#]+([^?#]*)"


def detect_traps(
    urls: DataFrame,
    url_col: str = "url",
    max_urls_per_path: float = 5.0,
    min_urls: int = 20,
) -> DataFrame:
    """Per-host URL-space stats + trap flag:

      (host, n_urls, n_paths, urls_per_path, query_frac, is_trap)

    is_trap: >= min_urls URLs AND distinct-URLs/distinct-paths above
    `max_urls_per_path` — i.e. the host keeps minting new URLs for the
    same paths (query/session/calendar explosion)."""
    u = F.col(url_col)
    parsed = urls.select(
        F.regexp_extract(u, HOST_RE, 1).alias("host"),
        u.alias("_url"),
        F.regexp_extract(u, PATH_RE, 1).alias("_path"),
        F.when(u.contains("?"), 1).otherwise(0).alias("_q"),
    )
    per_host = parsed.groupBy("host").agg(
        F.count_distinct("_url").alias("n_urls"),
        F.count_distinct("_path").alias("n_paths"),
        F.round(F.avg("_q"), 6).alias("query_frac"),
    )
    upp = F.round(
        F.col("n_urls").cast("double") / F.greatest(F.col("n_paths"), F.lit(1)), 6
    )
    return per_host.select(
        "host",
        "n_urls",
        "n_paths",
        upp.alias("urls_per_path"),
        "query_frac",
        ((F.col("n_urls") >= min_urls) & (upp > max_urls_per_path)).alias("is_trap"),
    )


def skew_profile(
    frontier: DataFrame,
    key_col: str = "host",
    target_rows_per_task: int = 50_000,
    max_buckets: int = 256,
) -> DataFrame:
    """Per-key row counts, share of the batch, and the recommended salt
    bucket count for the politeness window:

      (key, n_rows, frac_of_total, salt_buckets)

    salt_buckets = clamp(ceil(n_rows / target_rows_per_task), 1,
    max_buckets). Feed the hot keys' max into politeness.topk_per_host /
    salted_repartition instead of a guessed constant. The total enters as
    a 1-row aggregate crossJoin-broadcast, keeping the whole profile one
    lazy plan."""
    counts = frontier.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    total = frontier.agg(F.count("*").cast("double").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("frac_of_total"),
        F.least(
            F.greatest(
                F.ceil(F.col("n_rows").cast("double") / target_rows_per_task).cast("int"),
                F.lit(1),
            ),
            F.lit(max_buckets),
        ).alias("salt_buckets"),
    )
