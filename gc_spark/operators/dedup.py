"""Dedup operators: manifest anti-join, in-run dedup, frontier URL dedup.

Reference parity:
  - seen-set anti-join on version_hash, pre-scoped to the current crawler
    (pipelines.py:62-92 load + :125-129 skip) → F1/J1
  - in-run dedup on doc_name, first occurrence wins (DeduplicaterPipeline,
    pipelines.py:302-316) → F2/J2
  - frontier URL dedup: a URL enters the frontier once, ever (Scrapy's
    request dupefilter analogue) — ours is explicit: anti-join on url_hash64
    vs the cumulative frontier + within-batch first-wins.

Scale:
  - `anti_join_seen` takes an optional bloom pre-filter: rows the bloom
    rejects skip the shuffle entirely; only "maybe" rows join exactly.
  - when the seen side is small (single-source incremental crawl) Catalyst
    broadcasts it — we leave the hint to AQE rather than forcing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gc_spark.operators.bloom import bloom_maybe_contains


def anti_join_seen(
    items: DataFrame,
    seen: DataFrame,
    key: str = "version_hash",
    crawler: str | None = None,
    bloom: DataFrame | None = None,
    bloom_hash_col: str | None = None,
    num_buckets: int = 32,
) -> DataFrame:
    """Rows of `items` whose `key` is NOT in `seen` (scoped to `crawler`).

    Mirrors the reference's crawler_used scoping: hashes of other crawlers
    don't filter this one (pipelines.py:83-89); legacy rows with no
    crawler_used filter everything (pipelines.py:85-86).
    """
    seen_keys = seen
    if crawler is not None:
        seen_keys = seen_keys.filter(
            F.col("crawler_used").isNull() | (F.col("crawler_used") == crawler)
        )
    # NO .distinct(): LEFT ANTI semantics don't care about right-side dupes,
    # and deduplicating a table that grows with crawl history is a full extra
    # aggregation paid every micro-batch
    seen_keys = seen_keys.select(key)

    if bloom is not None and bloom_hash_col is not None:
        probed = bloom_maybe_contains(items, bloom, hash_col=bloom_hash_col, num_buckets=num_buckets)
        definitely_new = probed.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
        maybe = probed.filter(F.col("bloom_maybe")).drop("bloom_maybe")
        confirmed_new = maybe.join(seen_keys, on=key, how="left_anti")
        return definitely_new.unionByName(confirmed_new)

    return items.join(seen_keys, on=key, how="left_anti")


def in_run_dedup(items: DataFrame, key: str = "doc_name", order_col: str = "seq") -> DataFrame:
    """First occurrence (by `order_col`) of each `key` wins — deterministic
    twin of the reference's arrival-order set check (pipelines.py:306-314).
    Also drops null/empty keys (pipelines.py:307-308 'No doc_name')."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    return (
        items.filter(F.col(key).isNotNull() & (F.length(key) > 0))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def frontier_url_dedup(
    new_links: DataFrame,
    frontier_all: DataFrame,
    hash_col: str = "url_hash64",
    order_cols: list[str] | tuple[str, ...] = ("seq",),
    bloom: DataFrame | None = None,
    num_buckets: int = 32,
) -> DataFrame:
    """URLs never re-enter the frontier: within-batch first-wins + anti-join
    vs everything ever discovered. With a bloom table (the partitioned
    URL-seen filter), rows the bloom rejects skip the anti-join shuffle
    entirely — at 10^10 frontier rows that's the difference between shuffling
    the whole discovery wave and shuffling only the maybe-duplicates.

    `order_cols` must be a TOTAL key of new_links (e.g. (parent_seq, idx)):
    with a partial key, two identical hrefs on one page tie arbitrarily and
    the surviving row's other columns shift downstream seq assignment —
    breaking the run-to-run determinism contract."""
    w = Window.partitionBy(hash_col).orderBy(*[F.col(c).asc() for c in order_cols])
    in_batch = (
        new_links.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    seen_hashes = frontier_all.select(hash_col)  # anti-join: dupes harmless
    if bloom is not None:
        probed = bloom_maybe_contains(in_batch, bloom, hash_col=hash_col, num_buckets=num_buckets)
        definitely_new = probed.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
        maybe = probed.filter(F.col("bloom_maybe")).drop("bloom_maybe")
        confirmed_new = maybe.join(seen_hashes, on=hash_col, how="left_anti")
        return definitely_new.unionByName(confirmed_new)
    return in_batch.join(seen_hashes, on=hash_col, how="left_anti")
