"""Runtime bloom-filter join pruning — shrink the big side before it shuffles.

The frontier's seen-check (operators/bloom.py, cuckoo.py) guards the DRAIN;
this operator is the same idea applied to an arbitrary JOIN: build a tiny
bit-set from the small side's keys, broadcast it, and drop big-side rows
whose key provably isn't on the small side BEFORE the shuffle. That is
Spark's own InjectRuntimeFilter / bloom runtime-filter strategy made
explicit and measurable — at a 10^10-row probe side, the shuffle that the
exact join pays is proportional to bloom survivors (true matches + the
quantified false-positive tail), not to the probe table.

Unlike operators/bloom.py (numpy bitset in applyInPandas — the
high-throughput path), this variant keeps the filter as a DISTINCT
bit-position table probed with k broadcast equi-joins of pure column
expressions: slightly fatter (one long per set bit) but every step is
JVM-native, Catalyst can reorder it, and the DuckDB oracle replays it
bit-for-bit — which is how the no-false-negative contract is CHECKED, not
assumed. Positions use the portable 60-bit sha kernel with per-probe
salts: pos_i(key) = sha60("rf{i}|" + key) mod m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.operators.text_dedup import sha60_col


def _pos(key_col, salt: str, m: int):
    return sha60_col(F.concat(F.lit(salt + "|"), key_col)) % F.lit(m)


def bloom_bits(build: DataFrame, key_col: str, m: int = 16384, k: int = 2) -> DataFrame:
    """Distinct set-bit positions of the bloom filter over build-side keys.
    At most m rows regardless of build cardinality."""
    cols = [_pos(F.col(key_col), f"rf{i}", m).alias("pos") for i in range(k)]
    return build.select(F.explode(F.array(*cols)).alias("pos")).distinct()


def bloom_prune(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = 16384,
    k: int = 2,
) -> DataFrame:
    """Probe rows + a `bloom_pass` flag: True iff ALL k positions are set.
    Build-side members always pass (no false negatives); non-members pass
    with the classic (1-e^{-kn/m})^k probability. k broadcast equi-joins
    against the <= m-row bit table — nothing probe-sized shuffles."""
    out = probe
    cond = F.lit(True)
    drop = []
    for i in range(k):
        b = bits.select(F.col("pos").alias(f"_set{i}"))
        out = out.withColumn(f"_pos{i}", _pos(F.col(key_col), f"rf{i}", m)).join(
            F.broadcast(b), F.col(f"_pos{i}") == F.col(f"_set{i}"), "left"
        )
        cond = cond & F.col(f"_set{i}").isNotNull()
        drop += [f"_pos{i}", f"_set{i}"]
    return out.withColumn("bloom_pass", cond).drop(*drop)


def bloom_prune_join_stats(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    group_cols: list[str],
    m: int = 16384,
    k: int = 2,
) -> DataFrame:
    """Per-group accounting of what the runtime filter buys: probe rows,
    bloom survivors, true matches, and the false-positive tail the exact
    join still has to reject. n_match <= n_pass_bloom always (the
    no-false-negative contract)."""
    keys = build.select(key_col).distinct().withColumn("_member", F.lit(1))
    bits = bloom_bits(keys, key_col, m=m, k=k)
    flagged = bloom_prune(probe, bits, key_col, m=m, k=k).join(
        F.broadcast(keys), key_col, "left"
    )
    passed = F.col("bloom_pass").cast("long")
    matched = F.col("_member").isNotNull().cast("long")
    return flagged.groupBy(*group_cols).agg(
        F.count("*").alias("n_probe"),
        F.sum(passed).alias("n_pass_bloom"),
        F.sum(matched).alias("n_match"),
        F.sum(passed * (1 - matched)).alias("n_false_pos"),
    )
