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
    cap_per_shard: int | None = None,
    weight_col: str | None = None,
    portable: bool = False,
    cap_ratio: tuple[int, int] | None = None,
    cum_shards: int = 32,
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
    the score array per row), then the capacity cumsum. Spilled keys count
    against NOBODY's cap in this one-round form (two-choice, not
    waterfall) — callers needing a hard global bound run it with cap slack
    or iterate.

    Scale shape of the cumsum: a plain Window.partitionBy(first_pref)
    would put EVERY key of a shard on one reducer — with 8 shards and
    10^10 keys that is the exact hot-window politeness.topk_per_host was
    salted to avoid. Instead the cumsum is two-phase: scores are uniform
    hashes, so bucketing each key by its score's top bits gives
    `cum_shards` balanced, ORDER-ALIGNED salt partitions per shard (the
    bucket is a monotone function of the score, so (bucket desc, score
    desc, key) IS the global (score desc, key) order). Phase 1 ranks
    within (shard, bucket); phase 2 broadcasts the tiny per-bucket totals
    back as cumulative offsets — num_shards × cum_shards window rows, the
    same scheme as curriculum.curriculum_order.

    The cap: pass `cap_per_shard` (an absolute count / weight mass), or
    `cap_ratio=(num, den)` meaning ceil(num/den × n_keys / num_shards),
    computed INSIDE the dataflow from the per-bucket totals the two-phase
    cumsum already aggregates — exact integer arithmetic, no driver-side
    count, no extra pass over the data.
    """
    if (cap_per_shard is None) == (cap_ratio is None):
        raise ValueError("pass exactly one of cap_per_shard / cap_ratio")
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
    if cum_shards < 1 or (cum_shards & (cum_shards - 1)) != 0:
        raise ValueError("cum_shards must be a power of two")
    kb = cum_shards.bit_length() - 1

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    # bucket by the score's top bits — monotone in the score, so buckets
    # are order-aligned salt partitions (portable scores are 60-bit
    # non-negative; xxhash64 is signed, flip the sign bit first)
    if portable:
        bkt = F.shiftrightunsigned(F.col("_s1"), 60 - kb) if kb else F.lit(0)
    else:
        bkt = (
            F.shiftrightunsigned(
                F.col("_s1").bitwiseXOR(F.lit(-(2**63))), 64 - kb
            )
            if kb
            else F.lit(0)
        )
    # narrow to exactly the cumsum's columns and lazily checkpoint: the
    # score array (num_shards hashes per key) is computed ONCE, then both
    # the ranking window and the bucket-totals aggregate read the
    # materialized (key + 5 scalars) frame — not the full input row, and
    # not a re-hash per plan branch
    prefs = (
        df.select(
            F.col(key),
            F.element_at(top2, 1)["c"].alias("_p1"),
            F.element_at(top2, 1)["s"].alias("_s1"),
            F.element_at(top2, 2)["c"].alias("_p2"),
            w.alias("_w"),
        )
        .withColumn("_bkt", bkt.cast("int"))
        .localCheckpoint(eager=False)
    )

    from pyspark.sql import Window

    cum_local = (
        Window.partitionBy("_p1", "_bkt")
        .orderBy(F.desc("_s1"), F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = prefs.select("*", F.sum("_w").over(cum_local).alias("_lcum"))
    # tiny frame: num_shards * cum_shards rows -> cumulative bucket offsets
    totals = prefs.groupBy("_p1", "_bkt").agg(
        F.sum("_w").alias("_tot"), F.count(F.lit(1)).alias("_cnt")
    )
    w_off = (
        Window.partitionBy("_p1")
        .orderBy(F.desc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    if cap_per_shard is not None:
        cap_col = F.lit(cap_per_shard)
    else:
        num, den = cap_ratio
        if weight_col is None:
            # exact integer ceil(num/den * n / num_shards) — oracle-portable
            cap_col = F.expr(
                f"({num} * sum(_cnt) over () + {den * num_shards - 1})"
                f" div {den * num_shards}"
            )
        else:
            cap_col = (
                F.sum("_tot").over(Window.partitionBy()) * num
            ) / (den * num_shards)
    offsets = totals.select(
        "_p1",
        "_bkt",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0.0)).alias("_off"),
        cap_col.alias("_cap"),
    )
    loaded = local.join(F.broadcast(offsets), ["_p1", "_bkt"])

    spilled = (F.col("_off") + F.col("_lcum")) > F.col("_cap")
    return loaded.select(
        key,
        F.when(spilled, F.col("_p2")).otherwise(F.col("_p1")).alias("shard"),
        spilled.cast("int").alias("spilled"),
    )
