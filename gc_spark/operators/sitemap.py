"""sitemap.xml parsing + incremental recrawl selection.

The discovery-side complement of operators/robots.py: fetched sitemap
bodies become (url, lastmod) rows (pure regexp expressions — RE2-subset
patterns so ANSI SQL reproduces them), and `stale_urls` joins them against
the seen manifest to schedule ONLY documents whose sitemap lastmod is newer
than the last fetch — the incremental-recrawl path that avoids re-walking
every listing page at 10^10-frontier scale.

Scale shape: parse is map-side only; the staleness join is an equi-join on
canonical URL (broadcast when the sitemap batch is small, shuffle-hash
otherwise — Catalyst's pick), never a crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

URL_BLOCK_PAT = r"(?s)<url>(.*?)</url>"
LOC_PAT = r"<loc>([^<]+)</loc>"
LASTMOD_PAT = r"<lastmod>([^<]+)</lastmod>"


def parse_sitemap(df: DataFrame, body_col: str = "body") -> DataFrame:
    """(…, body) → one row per <url> entry: (url, lastmod) — lastmod null
    when the entry omits it. Non-<url> content is ignored (default-lenient,
    like the robots parser)."""
    blocks = F.regexp_extract_all(F.col(body_col), F.lit(URL_BLOCK_PAT), 1)
    entry = F.explode(blocks).alias("_entry")
    loc = F.regexp_extract("_entry", LOC_PAT, 1)
    lastmod = F.regexp_extract("_entry", LASTMOD_PAT, 1)
    return (
        df.select(entry)
        .select(
            loc.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("url") != "")
    )


def stale_urls(
    sitemap: DataFrame, seen: DataFrame, url_col: str = "url", fetched_col: str = "fetched_at"
) -> DataFrame:
    """URLs to (re)crawl: never-seen entries, plus seen entries whose
    sitemap lastmod is strictly newer than the recorded fetch time.
    String-comparable ISO timestamps on both sides — no timezone math."""
    s = seen.select(F.col(url_col).alias("url"), F.col(fetched_col).alias("_fetched"))
    j = sitemap.join(s, "url", "left")
    fresh_reason = F.when(F.col("_fetched").isNull(), F.lit("new")).when(
        F.col("lastmod").isNotNull() & (F.col("lastmod") > F.col("_fetched")),
        F.lit("updated"),
    )
    return (
        j.withColumn("reason", fresh_reason)
        .filter(F.col("reason").isNotNull())
        .select("url", "lastmod", "reason")
    )
