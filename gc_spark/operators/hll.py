"""HyperLogLog distinct-count sketch over portable 60-bit hashes.

Crawl-scale motivation: "how many distinct URLs has each host contributed?"
is the per-host frontier-health metric the reference reads off its manifest
(dataPipelines/gc_scrapy/gc_scrapy/spiders each append one manifest row per
NEW doc; the ops dashboards count them). An exact count(distinct url) at a
10^10-row frontier is a full shuffle of every URL string; the HLL sketch
shuffles 256 single-byte registers per host instead, and — like the
Bloom/cuckoo seen-set twins (operators/bloom.py, cuckoo.py) — the register
table is MERGEABLE: daily sketches combine with a max() per register, so
the rollup over N days never rescans the frontier.

Shape (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007 — public algorithm):
  - h = sha60(item): the repo's portable 60-bit hash (text_dedup.sha60_col),
    reproducible bit-for-bit in DuckDB for the oracle;
  - register index = h mod m (m = 2^p), the bottom p bits;
  - rho = 1 + leading zeros of the remaining (60-p)-bit word w, computed
    EXACTLY as (60-p+1) - bitlength(w) via length(bin(w)) — no floating
    log2, identical in both engines;
  - per (key, register) max(rho): the only corpus-sized shuffle, keyed
    (key, register) with map-side combine, then a register-sized (m rows
    per key) final aggregate;
  - estimate = alpha_m * m^2 / (sum 2^-rho + zeros), with the standard
    small-range linear-counting correction m*ln(m/zeros).

All expressions are JVM-native (no Python in the hot path); the register
frame is the checkpointable state for incremental use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60


def hll_registers(
    df: DataFrame,
    item_col,
    key_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Per-key HLL register table: (key..., register, rho_max).

    `item_col` is a string column (or Column) hashed with the portable
    60-bit sha256 prefix. Output has at most m = 2^p rows per key and is
    mergeable across batches with groupBy(key, register).max(rho_max).
    """
    from gc_spark.operators.text_dedup import sha60_col

    m = 1 << p
    wbits = HASH_BITS - p
    h = sha60_col(item_col if isinstance(item_col, Column) else F.col(item_col))
    w = F.shiftright(h, p)
    # bitlength via bin(): minimal binary string in both Spark and DuckDB.
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*key_cols, F.pmod(h, F.lit(m)).cast("int").alias("register"), rho.alias("rho"))
        .groupBy(*key_cols, "register")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(registers: DataFrame, key_cols: list[str], p: int = 8) -> DataFrame:
    """Collapse a register table to per-key cardinality estimates.

    Returns (key..., n_registers, est_distinct) where est_distinct is the
    bias-corrected HLL estimate rounded to a bigint. Registers absent from
    the table count as rho=0 (2^-0 = 1 each); the small-range correction
    m*ln(m/zeros) applies when raw <= 2.5m and zeros > 0.
    """
    m = 1 << p
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = registers.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho_max"))).alias("_z"),
    )
    zeros = (F.lit(m) - F.col("n_registers")).cast("double")
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / (F.col("_z") + zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *key_cols,
        "n_registers",
        F.round(est, 0).cast("long").alias("est_distinct"),
    )


def hll_merge(a: DataFrame, b: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge two register tables (e.g. daily sketches): per-register max."""
    return (
        a.unionByName(b)
        .groupBy(*key_cols, "register")
        .agg(F.max("rho_max").alias("rho_max"))
    )
