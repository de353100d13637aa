"""Adaptive recrawl scheduling — estimate per-URL change rates from fetch
history and prioritize what to refetch.

operators/sitemap.stale_urls covers the cooperative case (the site
publishes lastmod); this operator covers everything else: infer each URL's
Poisson change rate from its own fetch history (Cho & Garcia-Molina,
"Estimating Frequency of Change", ACM TOIT 2003 — the bias-corrected
estimator for change detection at fixed visit intervals), then rank by the
probability the page changed since we last saw it. The reference recrawls
every site on an external cron with no change model
(gamechanger-crawlers runs full spider sweeps); at web scale the frontier
must instead spend its politeness budget where change probability is
highest.

Everything is one groupBy(url) aggregate over the fetch log (map-side
partial aggs — the log is append-only and naturally partitioned by batch,
so the shuffle carries one row per URL) followed by pure per-row math. No
iteration, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def change_rate(n: Column, x: Column, avg_interval_s: Column) -> Column:
    """Bias-corrected Poisson rate estimate (changes/sec):
        lambda = -ln((n - x + 0.5) / (n + 0.5)) / avg_interval
    where n = visits, x = visits that observed a change. The +0.5
    correction keeps the estimate finite when every visit saw a change
    (x == n) and small-sample-stable (Cho & Garcia-Molina 2003, §4)."""
    return -F.log((n - x + 0.5) / (n + 0.5)) / avg_interval_s


def recrawl_priority(
    fetch_log: DataFrame,
    url_col: str = "url_id",
    ts_col: str = "ts",
    changed_col: str = "changed",
    now_ts: Column | None = None,
) -> DataFrame:
    """Per-URL recrawl scores from a (url, fetch ts, changed?) history:

      (url_col, n_visits, n_changes, lambda_day, p_changed)

    p_changed = 1 - exp(-lambda * age) — the Poisson probability the page
    changed since its last fetch; drain the refetch frontier by it
    descending (it IS a priority column for politeness.topk_per_host).
    URLs with a single visit carry no interval signal and are dropped
    (callers seed them with a default revisit period instead).

    `now_ts` (epoch seconds) defaults to the max fetch timestamp in the
    log + 1h — pinned from the data so runs are deterministic; pass the
    batch timestamp in production."""
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    per_url = (
        fetch_log.select(
            F.col(url_col),
            epoch.alias("_ts"),
            F.col(changed_col).cast("int").alias("_chg"),
        )
        .groupBy(url_col)
        .agg(
            F.count("*").cast("long").alias("n_visits"),
            F.sum("_chg").cast("long").alias("n_changes"),
            F.min("_ts").alias("_first"),
            F.max("_ts").alias("_last"),
        )
        .filter(F.col("n_visits") >= 2)
    )
    if now_ts is None:
        now_df = fetch_log.agg((F.max(epoch) + 3600).alias("_now"))
        per_url = per_url.crossJoin(F.broadcast(now_df))
        now_col = F.col("_now")
    else:
        now_col = now_ts
    # >=1s floor: a log with identical fetch timestamps (replays) must not
    # divide by zero
    interval = F.greatest(
        (F.col("_last") - F.col("_first")).cast("double") / (F.col("n_visits") - 1),
        F.lit(1.0),
    )
    lam = change_rate(F.col("n_visits"), F.col("n_changes"), interval)
    age = (now_col - F.col("_last")).cast("double")
    return per_url.select(
        url_col,
        "n_visits",
        "n_changes",
        F.round(lam * 86400.0, 6).alias("lambda_day"),
        F.round(1.0 - F.exp(-lam * age), 6).alias("p_changed"),
    )


def revalidation_plan(
    fetch_log: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    bytes_col: str = "bytes",
    skip_below: float = 0.1,
    full_above: float = 0.5,
    header_bytes: float = 500.0,
) -> DataFrame:
    """Conditional-GET planning: per URL, decide the next fetch mode from
    observed change history and estimate the bandwidth it costs.

    HTTP gives three prices for freshness: a FULL fetch (avg body bytes),
    a REVALIDATE (If-Modified-Since/ETag: ~header_bytes for a 304, body
    only when actually changed), and SKIP (0 bytes — accept staleness).
    With p = smoothed per-visit change probability
    (changes + 0.5) / (observations + 1.0) over consecutive-fetch hash
    comparisons (Laplace-style smoothing keeps never-changed URLs off
    exactly 0):

        p < skip_below  -> skip        expected = 0
        p < full_above  -> revalidate  expected = header + p * avg_bytes
        else            -> full        expected = avg_bytes

    Single-observation URLs have no change evidence and stay 'full'.
    saved_bytes = avg_bytes - expected (vs the reference's behavior of a
    full unconditional sweep every run). One window (lag hash per URL) +
    one groupBy(url) — the log shuffles once on the URL key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(ts_col)
    changed = (
        F.col(hash_col) != F.lag(hash_col).over(w)
    ).cast("int")
    per = (
        fetch_log.select(
            F.col(url_col),
            F.col(bytes_col).alias("_b"),
            changed.alias("_chg"),
        )
        .groupBy(url_col)
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum("_chg").alias("n_changes"),  # null for 1-fetch URLs
            F.round(F.avg("_b"), 4).alias("avg_bytes"),
        )
    )
    p = (F.col("n_changes") + 0.5) / (F.col("n_fetches") - 1 + 1.0)
    decision = (
        F.when(F.col("n_changes").isNull(), F.lit("full"))
        .when(p < skip_below, F.lit("skip"))
        .when(p < full_above, F.lit("revalidate"))
        .otherwise(F.lit("full"))
    )
    expected = (
        F.when(decision == "skip", F.lit(0.0))
        .when(decision == "revalidate", header_bytes + p * F.col("avg_bytes"))
        .otherwise(F.col("avg_bytes"))
    )
    return per.select(
        url_col,
        "n_fetches",
        F.coalesce("n_changes", F.lit(0)).alias("n_changes"),
        F.round(F.when(F.col("n_changes").isNotNull(), p), 6).alias("p_change"),
        decision.alias("decision"),
        "avg_bytes",
        F.round(expected, 4).alias("expected_bytes"),
        F.round(F.col("avg_bytes") - expected, 4).alias("saved_bytes"),
    )


def refresh_value(
    scored: DataFrame,
    ranks: DataFrame,
    node_col: str = "node",
    rank_col: str = "rank",
    p_col: str = "p_changed",
    round_digits: int = 6,
) -> DataFrame:
    """Freshness-weighted recrawl ordering — the Cho/Garcia-Molina pair of
    questions closed into one number: `p_changed` (recrawl_priority) says
    how LIKELY a page moved, PageRank says how much anyone CARES; the
    expected value of a refetch is their product, and draining by it
    descending spends the politeness budget where staleness costs most
    (a dead blog at p=0.9 loses to a hub page at p=0.2).

    `scored` is recrawl_priority's output plus a `node_col` mapping each
    URL onto the rank graph (its host). Ranks are node-cardinality —
    broadcast join, the URL table never shuffles. The product is computed
    in EXACT DECIMAL arithmetic over the two rounded factors: a
    double-precision product of rounded factors can land exactly on a
    rounding half-boundary (e.g. 0.036125 × 0.02 = 0.0007225), where the
    last float ulp decides the rounded digit differently per engine/sum
    order — decimals make the boundary case deterministic everywhere.
    """
    dec = f"decimal(18,{round_digits})"
    r = ranks.select(
        F.col(node_col),
        F.round(F.col(rank_col), round_digits).alias("_rank"),
    )
    rank_d = F.coalesce(F.col("_rank"), F.lit(0.0)).cast(dec)
    return scored.join(F.broadcast(r), node_col, "left").select(
        *[c for c in scored.columns],
        F.coalesce(F.col("_rank"), F.lit(0.0)).alias("host_rank"),
        (rank_d * F.col(p_col).cast(dec))
        .cast(dec)
        .cast("double")
        .alias("refresh_value"),
    )
