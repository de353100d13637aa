"""Rendezvous (highest-random-weight) sharding — stable assignment of URLs
(or hosts, or any key) to a set of workers.

A distributed frontier must decide which fetcher owns which URL. Modulo
hashing (`hash(url) % n`) reassigns ~all keys when n changes; rendezvous
hashing (Thaler & Ravishankar 1998) reassigns only the keys whose new
winner appears/disappears — adding a worker moves ~1/(n+1) of keys, the
provable minimum. The same primitive assigns hosts to politeness queues
and documents to embedding-index shards.

Implementation is a pure expression: score(key, shard) = xxhash64(key,
shard_salt); owner = argmax over the shard list via array_max on
(score, shard) structs — lexicographic struct ordering gives deterministic
tie-breaking (higher shard id wins a score tie), zero UDFs, zero shuffle.
At 10^10 URLs this is a map-only pass; the shard list (10²-10⁴ workers)
lives in the plan as literals, broadcast implicitly with the task binary.

The portable twin (sha256-prefix scores, `portable=True`) exists so the
DuckDB oracle can reproduce assignments bit-for-bit; production uses the
xxhash64 path (JVM codegen, no string building).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _score(key_col: Column, shard: int, portable: bool) -> Column:
    if portable:
        # 60-bit sha256 prefix of "<key>#<shard>" — engine-portable
        return F.conv(
            F.substring(F.sha2(F.concat(key_col, F.lit(f"#{shard}")), 256), 1, 15),
            16,
            10,
        ).cast("long")
    return F.xxhash64(key_col, F.lit(shard))


def rendezvous_shard_col(
    key_col: Column, num_shards: int, portable: bool = False
) -> Column:
    """Winning shard id for each key: argmax_{s in 0..num_shards-1}
    score(key, s)."""
    scored = F.array(
        *[
            F.named_struct(
                F.lit("s"), _score(key_col, s, portable), F.lit("c"), F.lit(s)
            )
            for s in range(num_shards)
        ]
    )
    return F.array_max(scored)["c"]


def assign_shards(
    df: DataFrame,
    key: str,
    num_shards: int,
    out_col: str = "shard",
    portable: bool = False,
) -> DataFrame:
    return df.withColumn(
        out_col, rendezvous_shard_col(F.col(key), num_shards, portable)
    )


def reassignment_fraction(
    df: DataFrame, key: str, n_before: int, n_after: int, portable: bool = False
) -> DataFrame:
    """1-row frame: the fraction of keys whose owner changes when the shard
    count moves n_before → n_after — the operational question every resize
    asks. For rendezvous hashing growing n→n+k moves ≈ k/(n+k) of keys
    (only keys won by the new shards move); modulo hashing moves ≈ 1-1/k'.
    One map-only pass, one scalar aggregate."""
    before = rendezvous_shard_col(F.col(key), n_before, portable)
    after = rendezvous_shard_col(F.col(key), n_after, portable)
    return df.select(
        F.round(
            F.avg((before != after).cast("double")), 6
        ).alias("moved_frac"),
        F.count("*").alias("n_keys"),
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-shard manifest: docs assigned to shards by
    portable content-independent hash of the id (re-runs and engines
    agree), with per-shard stats and an order-independent content
    fingerprint — the publishable receipt that lets a consumer verify a
    shard byte-for-byte without re-reading the corpus. One shuffle to
    shard grain; the manifest is n_shards rows.

    manifest_sha = sha256 over 'id:textlen' lines in id order — injective
    enough for shard verification while staying cheap (no full-text
    re-hash; swap sha60(text) in for content-addressed manifests)."""
    from gc_spark.operators.text_dedup import sha60_col

    rows = df.select(
        F.pmod(sha60_col(F.col(id_col).cast("string")), F.lit(n_shards)).alias(
            "shard"
        ),
        F.col(id_col).alias("_id"),
        F.length(F.col(text_col)).alias("_len"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_tok"),
    )
    line = lambda s: F.concat_ws(":", s["_id"], s["_len"])  # noqa: E731
    return rows.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
        F.sum("_len").alias("n_chars"),
        F.sha2(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_id", "_len"))), line
                ),
                "\n",
            ),
            256,
        ).alias("manifest_sha"),
    )


def bounded_load_shards(
    df: DataFrame,
    key: str,
    num_shards: int,
    cap_per_shard: int,
    weight_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Rendezvous assignment with a LOAD CAP — consistent hashing with
    bounded loads (Mirrokni/Thorup/Zadimoghaddam), two-choice form: every
    key keeps its HRW first preference unless that shard is over
    `cap_per_shard` (by key count, or by `weight_col` mass), in which
    case it spills to its second preference. Hot-host skew is exactly the
    failure this bounds: a shard that would drown in one host's URLs
    sheds the overflow deterministically instead of becoming the straggler
    (the same skew the politeness salter fights, applied to shard
    ASSIGNMENT rather than drain order).

    Within an overloaded shard, the keys that STAY are the ones with the
    highest rendezvous score there (they "belong" most strongly; ties
    broken by key) — so assignments remain stable under key churn, and a
    resize re-homes only the minimal HRW fraction (q78/q79's property),
    plus whatever the cap forces.

    (key, shard, spilled): one map-side preference computation (top-2 of
    the score array per row), one window per first-preference shard for
    the capacity cumsum. Spilled keys count against NOBODY's cap in this
    one-round form (two-choice, not waterfall) — callers needing a hard
    global bound run it with cap slack or iterate.
    """
    scored = F.array(
        *[
            F.named_struct(
                F.lit("s"), _score(F.col(key), s, portable), F.lit("c"), F.lit(s)
            )
            for s in range(num_shards)
        ]
    )
    top2 = F.slice(
        F.array_sort(
            scored, lambda a, b: F.when(a["s"] < b["s"], 1).when(a["s"] > b["s"], -1).otherwise(0)
        ),
        1,
        2,
    )
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    prefs = df.select(
        "*",
        F.element_at(top2, 1)["c"].alias("_p1"),
        F.element_at(top2, 1)["s"].alias("_s1"),
        F.element_at(top2, 2)["c"].alias("_p2"),
        w.alias("_w"),
    )
    from pyspark.sql import Window

    cum = (
        Window.partitionBy("_p1")
        .orderBy(F.desc("_s1"), F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loaded = prefs.select("*", F.sum("_w").over(cum).alias("_cum"))
    spilled = F.col("_cum") > cap_per_shard
    return loaded.select(
        key,
        F.when(spilled, F.col("_p2")).otherwise(F.col("_p1")).alias("shard"),
        spilled.cast("int").alias("spilled"),
    )
