"""Mirror-host detection: host pairs sharing many identical documents.

Syndication networks and site mirrors burn crawl budget — once host B is
known to mirror host A, B's frontier can be deprioritized wholesale (and
the dup-cluster stage gets a host-level prior instead of rediscovering the
same pairs doc by doc). The reference crawls a curated 41-site list where
mirrors are excluded by hand; an open-web frontier has to detect them.

Plan: one content fingerprint per (host, doc) — sha-60 of the text, the
same portable kernel as the dedup stack — de-duplicated to (host, fp),
then an inverted self-join on fp with hosts ordered (a < b), counted per
pair. `host_cap` drops fingerprints present on more than that many hosts
BEFORE the join (empty pages, "404" bodies, boilerplate stubs live on
thousands of hosts and would square the join) — identical to the df-cap
prefix filter in operators/containment.

Scale shape: shuffles are groupBy(fp) and groupBy(host_pair), both on
high-cardinality keys; the host_cap bounds every fingerprint's pair
contribution to host_cap^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.text_dedup import sha60_col


def mirror_host_pairs(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_shared: int = 2,
    host_cap: int | None = None,
) -> DataFrame:
    """(host_a, host_b, shared) for host pairs (a < b) sharing at least
    `min_shared` identical-content fingerprints."""
    fp = docs.select(
        F.col(host_col).alias("h"), sha60_col(F.col(text_col)).alias("fp")
    ).distinct()
    if host_cap is not None:
        hot = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("nh"))
            .filter(F.col("nh") > host_cap)
            .select("fp")
        )
        fp = fp.join(hot, "fp", "left_anti")
    a = fp.select(F.col("h").alias("host_a"), "fp")
    b = fp.select(F.col("h").alias("host_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
