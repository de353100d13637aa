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


RULE_PAT = r"(?i)^\s*(allow|disallow)\s*:\s*([^#\s]+)"


def parse_robots_rules(
    df: DataFrame, agent: str = "*", host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) → (host, rule_type, pattern) for `agent`, keeping BOTH
    Allow and Disallow lines with their patterns verbatim (wildcards
    preserved for match_robots). Same group-semantics fold as parse_robots
    — one pure-expression pass per body, no UDF."""
    lines = F.split(F.col(body_col), r"\r?\n")
    ua = lambda l: F.regexp_extract(l, UA_PAT, 1)  # noqa: E731
    rty = lambda l: F.lower(F.regexp_extract(l, RULE_PAT, 1))  # noqa: E731
    pat = lambda l: F.regexp_extract(l, RULE_PAT, 2)  # noqa: E731

    init = F.named_struct(
        F.lit("in_ua"), F.lit(False),
        F.lit("active"), F.lit(False),
        F.lit("rules"),
        F.array().cast("array<struct<rule_type:string,pattern:string>>"),
    )

    def step(acc, l):
        is_ua = ua(l) != ""
        matches = ua(l).isin(agent, "*") if agent != "*" else (ua(l) == "*")
        new_active = F.when(acc["in_ua"], acc["active"] | matches).otherwise(matches)
        has_rule = pat(l) != ""
        rules = F.when(
            ~is_ua & has_rule & acc["active"],
            F.array_append(
                acc["rules"],
                F.named_struct(
                    F.lit("rule_type"), rty(l), F.lit("pattern"), pat(l)
                ),
            ),
        ).otherwise(acc["rules"])
        return F.named_struct(
            F.lit("in_ua"), is_ua,
            F.lit("active"), F.when(is_ua, new_active).otherwise(acc["active"]),
            F.lit("rules"), rules,
        )

    folded = F.aggregate(lines, init, step)["rules"]
    return (
        df.select(F.col(host_col).alias("host"), folded.alias("_rules"))
        .select("host", F.explode("_rules").alias("_r"))
        .select("host", F.col("_r.rule_type").alias("rule_type"), F.col("_r.pattern").alias("pattern"))
        .distinct()
    )


def robots_regex_col(pattern) -> "F.Column":
    """Google-REP pattern → anchored regex: `*` = any chars, trailing `$` =
    end anchor, everything else a prefix match. `.` is the only regex
    metachar that appears in real robots paths; it's escaped (the same
    replace chain is reproducible in ANSI SQL, which is what keeps
    match_robots oracle-able)."""
    ends = pattern.endswith("$")
    core = F.when(ends, F.regexp_replace(pattern, r"\$$", "")).otherwise(pattern)
    esc = F.replace(F.replace(core, F.lit("."), F.lit("\\.")), F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), esc, F.when(ends, F.lit("$")).otherwise(F.lit("")))


def match_robots(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-URL robots verdict under full Google-REP semantics: the rule with
    the LONGEST pattern wins; allow wins length ties; no matching rule =
    allowed (default-allow, like the reference's ROBOTSTXT_OBEY=False
    posture but with the full loop available).

    Scale shape: rules collapse to ONE array per host and broadcast-join
    onto the frontier; the winner is picked by a per-row array fold
    (filter matching rules → sort by (−len, rule_type, pattern) → first).
    ZERO shuffle of the URL side — the plan a 10^10-URL frontier needs
    (a window over (host, path) would re-shuffle the whole frontier
    purely to rank 2-5 candidate rules per URL)."""
    per_host = rules.groupBy(host_col).agg(
        F.collect_list(
            F.struct(
                (-F.length("pattern")).alias("neg_len"),
                F.col("rule_type"),
                F.col("pattern"),
                robots_regex_col(F.col("pattern")).alias("regex"),
            )
        ).alias("_rules")
    )
    j = urls.join(F.broadcast(per_host), host_col, "left")
    matching = F.filter(
        F.coalesce(
            F.col("_rules"),
            F.array().cast(
                "array<struct<neg_len:int,rule_type:string,pattern:string,regex:string>>"
            ),
        ),
        lambda r: F.regexp_like(F.col(path_col), r["regex"]),
    )
    winner = F.get(F.array_sort(matching), 0)  # null when nothing matches (ANSI-safe)
    return j.select(
        "*",
        F.when(winner.isNull(), F.lit(True))
        .otherwise(winner["rule_type"] == "allow")
        .alias("allowed"),
        winner["rule_type"].alias("rule_type"),
        winner["pattern"].alias("matched_pattern"),
    ).drop("_rules")


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


def robots_diff_impact(
    urls: DataFrame,
    old_rules: DataFrame,
    new_rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """What a robots.txt CHANGE does to the frontier: verdicts under the
    old and new rule sets per URL, classified and rolled up per host —

      newly_blocked   — queued/scheduled work that must be purged NOW
                        (continuing to fetch it is a compliance violation)
      newly_allowed   — URL space to backfill into the frontier
      unchanged_allowed / unchanged_blocked — no action

    A recrawl of robots.txt (revalidation_plan treats it like any URL)
    that changes content-hash triggers exactly this diff; the per-host
    counts are the blast radius the scheduler acts on.

    Scale shape: two broadcast rule matchings CHAINED over the same frame
    (match_robots — the URL side never shuffles), one host-keyed
    conditional-sum rollup. No self-join: both verdicts are columns of one
    pass, so a duplicate (host, path) row in `urls` counts once — not
    quadratically, which is what a (host, path) self-join would do."""
    o = match_robots(
        urls.select(host_col, path_col), old_rules, host_col, path_col
    ).select(host_col, path_col, F.col("allowed").alias("_old"))
    j = match_robots(o, new_rules, host_col, path_col).select(
        host_col, F.col("_old"), F.col("allowed").alias("_new")
    )
    cnt = lambda c: F.sum(c.cast("int"))  # noqa: E731
    return j.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_urls"),
        cnt(F.col("_old") & F.col("_new")).alias("unchanged_allowed"),
        cnt(~F.col("_old") & ~F.col("_new")).alias("unchanged_blocked"),
        cnt(F.col("_old") & ~F.col("_new")).alias("newly_blocked"),
        cnt(~F.col("_old") & F.col("_new")).alias("newly_allowed"),
    )
