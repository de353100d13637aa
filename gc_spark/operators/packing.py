"""Sequence packing — mapping a deduped/filtered corpus onto fixed-length
training context windows.

LLM pretraining consumes documents as a single token stream cut into
ctx_len-sized windows ("concat-and-chunk" packing, the scheme GPT-style
pipelines use: docs are concatenated in a deterministic order, separated
implicitly by position, and every window is exactly full). The batch
question a data pipeline must answer per document is: *where does this doc
land* — its start offset in the stream, which windows it touches, and how
many windows it spans (docs crossing a boundary get split across windows).

Scale shape: a single global stream would mean one global sort — instead
documents pack into per-stream token sequences (stream = e.g. source shard
or lang), so the cumulative-offset window runs PARTITIONED by stream: one
shuffle on the stream key, then per-partition prefix sums. Streams are
independent by construction (training shards), so this is exact, not an
approximation. At 10^10 docs each stream's window state is a running sum —
no skew beyond the stream-size distribution itself (profile with
operators/skew.py and split hot streams upstream if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    ctx_len: int,
    stream_cols: list[str],
    order_col: str,
    tokens_col,
) -> DataFrame:
    """Per-document placement in the packed token stream of its shard:

      (…stream_cols, order_col, n_tokens, start_off, bin_first, bin_last,
       n_bins)

    where start_off is the prefix-sum of token counts in `order_col` order
    within the stream, bin_first/bin_last the first/last ctx_len window the
    doc's tokens fall in, and n_bins how many windows it spans. Empty docs
    (0 tokens) land fully inside the window at their offset (bin_last =
    bin_first, n_bins = 1)."""
    w = (
        Window.partitionBy(*stream_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = tokens_col.cast("long")
    out = df.select(*stream_cols, order_col, n_tok.alias("n_tokens"))
    out = out.withColumn("_end", F.sum("n_tokens").over(w))
    start = F.col("_end") - F.col("n_tokens")
    bin_first = F.floor(start / ctx_len)
    # the doc's LAST token sits at _end - 1; empty docs clamp to bin_first
    bin_last = F.greatest(F.floor((F.col("_end") - 1) / ctx_len), bin_first)
    return out.select(
        *stream_cols,
        order_col,
        "n_tokens",
        start.alias("start_off"),
        bin_first.alias("bin_first"),
        bin_last.alias("bin_last"),
        (bin_last - bin_first + 1).alias("n_bins"),
    )
