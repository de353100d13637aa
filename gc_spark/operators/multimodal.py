"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed behind import-tries with a clearly-marked
deterministic fake — the Spark-side plumbing (schemas, batch iteration,
partition sizing, UDF signatures) is real and tested. Swapping the fake for
a real decoder changes ONE function body, not the plan shape.

Design for 100 TB of media:
  - blobs stay out of the shuffle: every transform is mapInPandas (map-side,
    partition-local); only metadata columns ever join/aggregate.
  - maxRecordsPerBatch must be sized against blob size (a 10 MB image at the
    default 10k rows/batch would make 100 GB Arrow batches) — callers pass
    rows_per_batch to repartition+size hints.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("byte_len", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def _try_real_image_decoder():
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _fake_decode_image(blob: bytes) -> tuple[int, int]:
    """Deterministic fake: dims derived from content bytes. Replace with a
    real decoder (PIL) when available — same signature."""
    if not blob:
        return (0, 0)
    w = 64 + (blob[0] % 64) * 16
    h = 64 + (blob[-1] % 64) * 16
    return (w, h)


def extract_media_metadata(df: DataFrame, blob_col: str = "blob", ref_col: str = "media_ref",
                           type_col: str = "media_type") -> DataFrame:
    """blob → typed metadata row (mapInPandas; blobs never shuffle)."""
    pil = _try_real_image_decoder()

    def _run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in parts:
            widths, heights, durs, lens = [], [], [], []
            for blob, mtype in zip(pdf[blob_col], pdf[type_col]):
                b = bytes(blob) if blob is not None else b""
                lens.append(len(b))
                if mtype == "image":
                    if pil is not None:  # pragma: no cover
                        try:
                            im = pil.open(io.BytesIO(b))
                            widths.append(im.width)
                            heights.append(im.height)
                        except Exception:
                            widths.append(None)
                            heights.append(None)
                    else:
                        w, h = _fake_decode_image(b)
                        widths.append(w)
                        heights.append(h)
                    durs.append(None)
                elif mtype in ("audio", "video"):
                    widths.append(None)
                    heights.append(None)
                    # STUB: no ffmpeg/librosa in container — deterministic fake
                    durs.append(len(b) * 8)
                else:
                    widths.append(None)
                    heights.append(None)
                    durs.append(None)
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "media_type": pdf[type_col],
                    "byte_len": lens,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return df.mapInPandas(_run, schema=MEDIA_META)


RESIZED = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("blob", BinaryType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def resize_images(df: DataFrame, target: int = 224, blob_col: str = "blob",
                  ref_col: str = "media_ref",
                  rows_per_batch: int | None = None) -> DataFrame:
    """Resize plumbing: partition-local, Arrow-batched. The resize itself is
    STUBBED (no PIL): output blob = deterministic fake (sha-stamped header +
    truncated payload) with the real batch/partition shape.

    rows_per_batch, when given, sets spark.sql.execution.arrow.
    maxRecordsPerBatch — a SESSION-WIDE knob (Spark has no per-plan Arrow
    batch bound), so the caller owns restoring it; the default (None)
    leaves the session untouched. Production bounds blob batch bytes at
    submit time (--conf spark.sql.execution.arrow.maxRecordsPerBatch)
    rather than per-operator: an earlier version set it unconditionally
    here and every later Arrow op in the session silently ran on 256-row
    micro-batches."""

    def _run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in parts:
            out_blobs = []
            for blob in pdf[blob_col]:
                b = bytes(blob) if blob is not None else b""
                # STUB decode→resize→encode; deterministic function of input
                stamp = hashlib.sha256(b).digest()[:8]
                out_blobs.append(stamp + b[: target * 4])
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "blob": out_blobs,
                    "width": target,
                    "height": target,
                }
            )

    if rows_per_batch is not None:
        # bound Arrow batch bytes: fewer rows per batch for large blobs
        # (session-wide; see docstring — caller restores)
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(rows_per_batch),
        )
    return df.mapInPandas(_run, schema=RESIZED)


FRAMES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_blob", BinaryType(), True),
    ]
)


def sample_video_frames(df: DataFrame, every_n: int = 10, max_frames: int = 8,
                        blob_col: str = "blob", ref_col: str = "media_ref") -> DataFrame:
    """Frame-sampling plumbing (1 video row → ≤max_frames frame rows).
    Decode STUBBED (no ffmpeg): frames are deterministic slices; the
    row-expansion shape (mapInPandas returning more rows than in) is real."""

    def _run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            refs, idxs, blobs = [], [], []
            for ref, blob in zip(pdf[ref_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                n = min(max_frames, max(1, len(b) // max(every_n, 1)))
                for i in range(n):
                    refs.append(ref)
                    idxs.append(i)
                    lo = i * every_n
                    blobs.append(b[lo : lo + every_n])
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "frame_blob": blobs}
            )

    return df.mapInPandas(_run, schema=FRAMES)


def documents_media_spans(documents: DataFrame) -> DataFrame:
    """Pull the media spans out of the interleaved documents table:
    (doc_id, offset, media_ref) — pure explode, feeds the decode stages."""
    return (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.offset").alias("offset"), F.col("s.media_ref").alias("media_ref"))
    )
