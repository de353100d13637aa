"""Deterministic distributed sequence assignment.

Discovery order (the `seq` column) is the engine's reproducible stand-in for
Scrapy's runtime queue position — it must be identical run-to-run AND not
funnel the whole batch through one task. `row_number()` over a global window
collapses to a single partition, so instead: total-sort the batch by the
order key (repartitionByRange + sortWithinPartitions) and number rows with
``zipWithIndex``. Partition boundaries don't affect the numbering because the
order is globally total — only the (deterministic) sort order does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField


def with_dense_seq(
    df: DataFrame,
    order_cols: list[str],
    offset: int = 0,
    seq_col: str = "seq",
    partitions: int | None = None,
) -> DataFrame:
    """Assign seq = offset + 0-based rank in the total order of `order_cols`
    (which must be a unique key). Distributed: no single-partition window.
    """
    n = partitions or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    cols = [F.col(c) for c in order_cols]
    arranged = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)

    out_schema = arranged.schema.add(StructField(seq_col, LongType(), False))

    rdd = arranged.rdd.zipWithIndex().map(
        lambda t, _off=offset: (*t[0], _off + t[1])
    )
    return df.sparkSession.createDataFrame(rdd, schema=out_schema)
