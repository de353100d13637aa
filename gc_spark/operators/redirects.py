"""Redirect-chain resolution by pointer doubling.

A crawl's fetch log accumulates 301/302 edges (src -> dst); before dedup
and scheduling, every discovered URL must resolve to its final target —
otherwise the same document is crawled once per alias and the seen-set
fragments. (The reference follows redirects inline per request —
sasc_spider.py rewrites a redirected detail URL — which works at 41 sites;
a 10^10 frontier resolves the whole alias graph as data instead.)

Algorithm: pointer doubling (a.k.a. pointer jumping) — each round joins
the mapping with ITSELF, so a chain of length L resolves in ceil(log2 L)
rounds, not L. With `max_hops` = 2^rounds the loop is a fixed count of
self-joins: no driver-side convergence checks at all. Chains still
unterminated after the last round (longer than max_hops, or cyclic —
redirect loops exist in the wild) come back flagged, which is itself the
crawl signal (drop + dead-letter).

Scale shape: each round shuffles the mapping on the join key once; the
mapping shrinks to one row per alias. hops is carried through the doubling
(s' = s_a + s_b), so the resolved chain length is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 8,
) -> DataFrame:
    """(src, final, hops, resolved) for every redirect source. `redirects`
    must be functional (one dst per src — HTTP gives exactly one Location
    per URL); `final` is the first node with no outgoing redirect, reached
    in `hops` edges. resolved=false marks chains longer than max_hops and
    redirect cycles; their `final`/`hops` are the pointer state after the
    last doubling round."""
    rounds = max(1, (max_hops - 1).bit_length())  # 2^rounds >= max_hops
    edges = redirects.select(
        F.col(src).alias("x"), F.col(dst).alias("y")
    ).localCheckpoint(eager=False)

    p = edges.select("x", "y", F.lit(1).cast("long").alias("s"))
    for _ in range(rounds):
        b = p.select(
            F.col("x").alias("_bx"), F.col("y").alias("_by"), F.col("s").alias("_bs")
        )
        p = (
            p.join(b, p["y"] == b["_bx"], "left")
            .select(
                "x",
                F.coalesce(F.col("_by"), F.col("y")).alias("y"),
                (F.col("s") + F.coalesce(F.col("_bs"), F.lit(0))).alias("s"),
            )
            .localCheckpoint(eager=False)
        )

    # terminal iff the pointer has no outgoing redirect
    heads = edges.select(F.col("x").alias("_hx")).distinct()
    return (
        p.join(heads, p["y"] == heads["_hx"], "left")
        .select(
            F.col("x").alias(src),
            F.col("y").alias("final"),
            F.col("s").alias("hops"),
            F.col("_hx").isNull().alias("resolved"),
        )
    )
