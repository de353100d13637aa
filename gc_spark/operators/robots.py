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
  - comments (#…) and other directives (Allow, Sitemap) are ignored —
    default-allow keeps unknown syntax harmless; Crawl-delay has its own
    fold (parse_crawl_delay → budgets_from_crawl_delay feeds the
    politeness drain)

The fold is reproducible in ANSI SQL (DuckDB list_reduce with a struct
accumulator) — oracled by q42.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UA_PAT = r"(?i)^\s*user-agent\s*:\s*(\S+)"
DIS_PAT = r"(?i)^\s*disallow\s*:\s*([^#\s]+)"
CD_PAT = r"(?i)^\s*crawl-delay\s*:\s*([0-9.]+)"


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


def parse_crawl_delay(
    df: DataFrame, agent: str = "*", host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) → (host, crawl_delay) for `agent`: the delay declared by
    the FIRST active group that has one (later declarations are ignored —
    deterministic, and matches the "first matching record wins" reading of
    the de-facto spec). Hosts whose robots.txt declares none come back with
    crawl_delay NULL (callers default it). Same group-semantics fold as
    parse_robots, one pure-expression pass per body."""
    lines = F.split(F.col(body_col), r"\r?\n")
    ua = lambda l: F.regexp_extract(l, UA_PAT, 1)  # noqa: E731
    cd = lambda l: F.regexp_extract(l, CD_PAT, 1)  # noqa: E731

    init = F.named_struct(
        F.lit("in_ua"), F.lit(False),
        F.lit("active"), F.lit(False),
        F.lit("delay"), F.lit(None).cast("double"),
    )

    def step(acc, l):
        is_ua = ua(l) != ""
        matches = ua(l).isin(agent, "*") if agent != "*" else (ua(l) == "*")
        new_active = F.when(acc["in_ua"], acc["active"] | matches).otherwise(matches)
        has_cd = cd(l) != ""
        delay = F.when(
            acc["delay"].isNull() & ~is_ua & has_cd & acc["active"],
            cd(l).cast("double"),
        ).otherwise(acc["delay"])
        return F.named_struct(
            F.lit("in_ua"), is_ua,
            F.lit("active"), F.when(is_ua, new_active).otherwise(acc["active"]),
            F.lit("delay"), delay,
        )

    folded = F.aggregate(lines, init, step)["delay"]
    return df.select(F.col(host_col).alias("host"), folded.alias("crawl_delay"))


def budgets_from_crawl_delay(
    delays: DataFrame,
    batch_seconds: float = 60.0,
    default_delay: float = 1.0,
    max_budget: int = 1_000,
    keep_delay: bool = False,
) -> DataFrame:
    """Crawl-delay → the politeness drain's per-host budgets: a host
    allowing one request per `delay` seconds gets floor(batch_seconds /
    delay) slots per micro-batch, clamped to [1, max_budget]. Output
    (host, budget_per_batch) is politeness.topk_per_host's host_budgets
    input — the robots-compliant counterpart of the rank-proportional
    allocate_budgets (take the elementwise least() to honor both)."""
    d = F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
    budget = F.least(
        F.greatest(F.floor(F.lit(batch_seconds) / d).cast("int"), F.lit(1)),
        F.lit(max_budget),
    ).alias("budget_per_batch")
    cols = ["host", "crawl_delay"] if keep_delay else ["host"]
    return delays.select(*cols, budget)
