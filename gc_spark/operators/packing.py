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


def pack_multimodal(
    df: DataFrame,
    token_budget: int,
    media_budget: int,
    stream_cols: list[str],
    order_col: str,
    tokens_col,
    media_col,
) -> DataFrame:
    """Two-resource packing for INTERLEAVED text+media documents: assign
    each doc to a training bin under BOTH a token budget and a media-slot
    budget (vision-language batches are limited by context tokens AND by
    image slots per sequence).

      (…stream_cols, order_col, n_tokens, n_media, tok_off, media_off,
       bin)  with  bin = floor(tok_off / token_budget)
                       + floor(media_off / media_budget)

    A bin boundary opens whenever EITHER cumulative resource crosses its
    budget window (the SUM of the two floors increments exactly then), so
    within any bin BOTH floors are constant: the docs starting in a bin
    sit inside one token window AND one media window — their token total
    is < token_budget and media total < media_budget, up to the one
    straddling doc at each edge (same doc-granular caveat as
    pack_offsets). A max() of the floors would NOT give this: a
    media-driven bin could quietly accumulate several token windows.
    Bin ids may skip when both resources cross between two docs (empty
    bins are fine — they're ids, not allocations).

    This is deliberately NOT the sequential greedy packer (which resets
    both counters at each boundary and can fit strictly more per bin):
    greedy is an inherently sequential recurrence per stream, while this
    boundary-union form is two prefix sums — exact, deterministic, and
    embarrassingly parallel at 10^10 docs. The fill lost to the union of
    boundaries is bounded by one budget window per resource per bin.

    Docs larger than a budget on their own still get a bin (they straddle;
    the trainer truncates or splits downstream — same policy as
    pack_offsets' n_bins > 1 docs)."""
    w = (
        Window.partitionBy(*stream_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = tokens_col.cast("long")
    n_med = media_col.cast("long")
    out = df.select(
        *stream_cols, order_col, n_tok.alias("n_tokens"), n_med.alias("n_media")
    )
    out = (
        out.withColumn("_tend", F.sum("n_tokens").over(w))
        .withColumn("_mend", F.sum("n_media").over(w))
    )
    tok_off = F.col("_tend") - F.col("n_tokens")
    media_off = F.col("_mend") - F.col("n_media")
    bin_ = F.floor(tok_off / token_budget) + F.floor(media_off / media_budget)
    return out.select(
        *stream_cols,
        order_col,
        "n_tokens",
        "n_media",
        tok_off.alias("tok_off"),
        media_off.alias("media_off"),
        bin_.alias("bin"),
    )
