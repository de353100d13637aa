"""Compression-ratio quality signal — zlib ratio per document, the
cheap repetitiveness detector Gopher/MassiveText used alongside the
rule-based filters: machine-generated or keyword-stuffed pages compress
far better than natural prose, so a very LOW ratio is a spam flag and a
ratio near 1.0 flags binary junk that leaked into a text field.

This is the repo's canonical "Python is genuinely required" operator:
zlib is not expressible in Spark SQL, so the kernel is an Arrow-batched
pandas UDF (per-BATCH vectorized transfer, never per-row Python) riding
the same document scan as the native quality metrics. State-free and
map-only — at 100 TB it scales exactly like the scan itself; the only
cost is one Arrow hop, which is why every metric that CAN be native
(entropy, repetition, Gopher rules) is native and only this one pays it.

No oracle: DuckDB has no zlib — the driver records the weaker rows-only
check; correctness is pinned by unit tests against the reference zlib
output directly (same library, asserted byte-for-byte on fixed inputs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def _zlib_len(texts: pd.Series) -> pd.Series:
    import zlib

    return texts.fillna("").map(
        lambda t: len(zlib.compress(t.encode("utf-8"), 6))
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, raw_len, comp_len, ratio) — ratio = comp/raw utf-8 bytes;
    null ratio for empty docs."""
    raw_len = F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
    return df.select(
        F.col(id_col),
        raw_len.alias("raw_len"),
        _zlib_len(F.col(text_col)).alias("comp_len"),
    ).withColumn(
        "ratio",
        F.round(
            F.col("comp_len").cast("double")
            / F.nullif(F.col("raw_len").cast("double"), F.lit(0.0)),
            6,
        ),
    )
