"""Z-order (Morton) data layout — multi-dimensional file clustering for
data-skipping.

The north-star lands crawl output in Iceberg; at 10^10 rows the dominant
read cost is how many files a typical predicate touches. Sorting by ONE
column gives perfect skipping on that column and none on the others;
interleaving the bits of k columns (Morton order, the layout Iceberg's
own `sort_order(zorder(...))` and Delta `OPTIMIZE ZORDER BY` use) bounds
the per-file min/max range on EVERY interleaved dimension, so a box
predicate prunes files on all of them at once.

Scale shape: the z-value is a pure integer-bit expression (k·bits shifted
AND/OR terms, whole-stage codegen, no UDF); grid scaling needs one global
min/max aggregate per column (a broadcastable 1-row frame); file
assignment is fixed-width z-range bucketing (a shift), which at cluster
scale becomes `repartitionByRange(z)` + write — the stats computed here
are exactly the per-file min/max Iceberg keeps in its manifests.

Public algorithm: Morton 1966; same layout as Delta/Iceberg Z-ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_col(col: Column, mn: Column, mx: Column, bits: int = 8) -> Column:
    """Linear min/max scaling of a numeric column onto [0, 2^bits).

    Deterministic (same IEEE double ops both engines run); production
    would use equi-depth boundaries from approxQuantile instead — the
    interleave below is boundary-scheme-agnostic.
    """
    top = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - mn) * F.lit(float(top)) / (mx - mn)
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(top)).cast("long")


def zvalue_col(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low `bits` bits of each column (already integers in
    [0, 2^bits)) into one Morton code. cols[0] gets the most-significant
    bit of each group."""
    k = len(cols)
    z: Column = F.lit(0).cast("long")
    for b in range(bits):  # bit b of each input
        for i, c in enumerate(cols):
            shift = b * k + (k - 1 - i)
            z = z + F.shiftleft(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), shift
            )
    return z


def layout_stats(
    df: DataFrame, file_col: Column, dims: list[Column], names: list[str]
) -> DataFrame:
    """Per-file (min, max) of each dimension — the manifest stats a
    data-skipping reader prunes with."""
    aggs = []
    for d, n in zip(dims, names):
        aggs += [F.min(d).alias(f"{n}_min"), F.max(d).alias(f"{n}_max")]
    aggs.append(F.count("*").cast("long").alias("n_rows"))
    return df.groupBy(file_col.alias("file_id")).agg(*aggs)


def skip_effectiveness(
    stats: DataFrame, box: dict[str, tuple[int, int]]
) -> DataFrame:
    """(n_files, files_hit, rows_in_hit_files) for a box predicate against
    per-file min/max stats: a file is HIT iff its [min,max] overlaps the
    query range on every dimension (exactly Iceberg's manifest pruning
    rule)."""
    cond = F.lit(True)
    for name, (lo, hi) in sorted(box.items()):
        cond = cond & (F.col(f"{name}_max") >= lo) & (F.col(f"{name}_min") <= hi)
    return stats.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(cond.cast("long")).alias("files_hit"),
        F.sum(F.when(cond, F.col("n_rows")).otherwise(0)).alias(
            "rows_in_hit_files"
        ),
    )
