"""robots.txt parsing — raw fetched bodies → the (host, disallow) rules
table the drain loop's robots filter consumes (plans/drain._apply_robots).

The reference crawlers explicitly disable robots (settings.py
ROBOTSTXT_OBEY=False); this engine keeps the filter default-allow but makes
the full loop available: fetch /robots.txt per host → parse_robots →
CrawlEngine(robots=rules).

The parser is ONE aggregate fold over the body's lines — pure JVM
expressions, no UDF — implementing group semantics:

  - a run of consecutive ``User-agent:`` lines opens a group; the group is
    active if ANY of its agents is ``*`` (or the requested agent)
  - ``Disallow:`` lines inside an active group contribute their (non-empty)
    path prefix; empty Disallow means allow-all and adds nothing
  - comments (#…) and other directives (Allow, Crawl-delay, Sitemap) are
    ignored — default-allow keeps unknown syntax harmless

The fold is reproducible in ANSI SQL (DuckDB list_reduce with a struct
accumulator) — oracled by q42.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UA_PAT = r"(?i)^\s*user-agent\s*:\s*(\S+)"
DIS_PAT = r"(?i)^\s*disallow\s*:\s*([^#\s]+)"


def parse_robots(
    df: DataFrame, agent: str = "*", host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) → one row per (host, disallow) prefix for `agent`."""
    lines = F.split(F.col(body_col), r"\r?\n")
    ua = lambda l: F.regexp_extract(l, UA_PAT, 1)  # noqa: E731
    dis = lambda l: F.regexp_extract(l, DIS_PAT, 1)  # noqa: E731

    init = F.named_struct(
        F.lit("in_ua"), F.lit(False),
        F.lit("active"), F.lit(False),
        F.lit("rules"), F.array().cast("array<string>"),
    )

    def step(acc, l):
        is_ua = ua(l) != ""
        matches = ua(l).isin(agent, "*") if agent != "*" else (ua(l) == "*")
        new_active = F.when(
            acc["in_ua"], acc["active"] | matches
        ).otherwise(matches)
        has_dis = dis(l) != ""
        rules = F.when(
            ~is_ua & has_dis & acc["active"],
            F.array_append(acc["rules"], dis(l)),
        ).otherwise(acc["rules"])
        return F.named_struct(
            F.lit("in_ua"), is_ua,
            F.lit("active"), F.when(is_ua, new_active).otherwise(acc["active"]),
            F.lit("rules"), rules,
        )

    folded = F.aggregate(lines, init, step)["rules"]
    return (
        df.select(F.col(host_col).alias("host"), folded.alias("_rules"))
        .select("host", F.explode("_rules").alias("disallow"))
        .distinct()
    )
