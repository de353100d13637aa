"""Count-min sketch — fixed-memory frequency estimates for unbounded streams.

Misra-Gries (operators/heavy_hitters) answers "which terms are frequent";
a count-min sketch (Cormode & Muthukrishnan 2005) answers "how frequent is
THIS term" for ANY term, from depth×width counters regardless of
vocabulary size — the per-batch frequency surface a streaming crawl keeps
when the (term, count) table itself would be 10^9 rows. Guarantees:
estimate >= true count always (only overcounts, from bucket collisions),
and estimate <= true + eps*N with probability 1-delta for width=ceil(e/eps),
depth=ceil(ln 1/delta).

Sketches are MERGEABLE: same (depth, width, hash) sketches from disjoint
inputs combine by adding counters — per-partition sketches roll up without
reprocessing, and per-batch sketches append across micro-batches
(streaming/ uses the same shape for its stateful counters).

Scale shape: the build explodes each term row `depth` times (a constant
fan-out, not a join) and aggregates to at most depth×width rows — the
map-side partial combine absorbs almost everything, so the shuffle is
sketch-sized, not corpus-sized. Queries broadcast the sketch (it is tiny
by construction) onto the probe terms: map-side min over depth lookups.

Hash kernel: the portable 60-bit sha prefix (operators/text_dedup.sha60_col)
over `term || '|' || row` so both engines compute bit-identical buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.text_dedup import sha60_col


def _bucket(term, row: int, width: int):
    return sha60_col(F.concat(term, F.lit(f"|{row}"))) % width


def cms_build(
    df: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, bucket, cnt): the sketch counters — at most depth×width rows.
    Input is one row per term OCCURRENCE (pre-tokenized); build sketches
    per partition-disjoint slices and `cms_merge` them freely.

    With `weight_col`, input is one row per DISTINCT term carrying its
    occurrence count (or any long weight): counters are sum(weight)
    instead of count(*) — bit-identical to the occurrence build over the
    expanded stream (the bucket hash depends only on the term), but the
    depth× fan-out runs over the vocabulary, not the corpus. Build the
    (term, cnt) contraction once and feed sketch AND exact-truth consumers
    from it."""
    t = F.col(term_col)
    rows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda r: F.struct(
                r.cast("int").alias("row"),
                (sha60_col(F.concat(t, F.lit("|"), r.cast("string"))) % width)
                .cast("int")
                .alias("bucket"),
            ),
        )
    ).alias("rb")
    cnt = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    ).alias("cnt")
    sel = [rows] if weight_col is None else [rows, F.col(weight_col)]
    return (
        df.select(*sel)
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(cnt)
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Add counters of same-shaped sketches (disjoint input slices /
    successive micro-batches)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """probes + (cms_est): min over the depth counters each probe term
    hashes into. The sketch is broadcast — probe rows never shuffle.

    The depth fan-out re-collapses on a per-row id, NOT on the probe
    columns: duplicate probe rows stay distinct in the output (row count
    in == row count out), and the sketch's (row, bucket, cnt) columns are
    aliased to internal names so a probe frame carrying columns of those
    names cannot collide."""
    t = F.col(term_col)
    keys = list(probes.columns)
    probed = (
        probes.select("*", F.monotonically_increasing_id().alias("_probe_id"))
        .select(
            "*",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(depth - 1)),
                    lambda r: F.struct(
                        r.cast("int").alias("r"),
                        (
                            sha60_col(F.concat(t, F.lit("|"), r.cast("string")))
                            % width
                        )
                        .cast("int")
                        .alias("b"),
                    ),
                )
            ).alias("_rb"),
        )
        .select("*", F.col("_rb.r").alias("_r"), F.col("_rb.b").alias("_b"))
    )
    sk = sketch.select(
        F.col("row").alias("_sk_r"),
        F.col("bucket").alias("_sk_b"),
        F.col("cnt").alias("_sk_cnt"),
    )
    joined = probed.join(
        F.broadcast(sk),
        (F.col("_r") == F.col("_sk_r")) & (F.col("_b") == F.col("_sk_b")),
        "left",
    )
    return (
        joined.groupBy("_probe_id")
        .agg(
            *[F.first(c).alias(c) for c in keys],
            F.min(F.coalesce(F.col("_sk_cnt"), F.lit(0))).alias("cms_est"),
        )
        .select(*keys, "cms_est")
    )
