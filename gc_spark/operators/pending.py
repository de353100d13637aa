"""Pending-docs resolution — the distributed twin of Scrapy's meta-carry.

Reference pattern (marine_corp_spider.py:335-360 → 370-395 and a dozen other
spiders): the listing row builds an INCOMPLETE DocItem, a follow request
carries it via `response.meta` to parse_download_page, which finds the real
download href and only then computes the version hash.

Driver-side mutable state doesn't distribute; the dataflow twin is a join:

  listing batch N   → pending doc (detail_url, no download_url) → pending_docs
                    → detail_url enters the frontier as a normal link
  detail batch N+k  → extractor emits a detail record (detail_download_href)
                    → engine joins records onto open pendings by
                      url_hash64(detail_url) and completes them
  completed keys    → pending_done (merge-on-read, like frontier_done)

Politeness, URL dedup, resume, and crawl-order determinism all apply to the
second hop for free because it rides the frontier. At scale the join is
(pending ⋈ detail_records) on a 64-bit key — detail_records is one row per
fetched detail page in THIS batch, so Catalyst broadcast-joins it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_ITEM = StructType(
    [
        StructField("doc_type", StringType()),
        StructField("download_url", StringType()),
        StructField("compression_type", StringType()),
    ]
)
_SEG = StructType(
    [StructField("kind", StringType()), StructField("payload", StringType())]
)

# flattened doc columns as they leave the parse stage, plus pending bookkeeping
PENDING_DOCS = StructType(
    [
        StructField("source", StringType()),
        StructField("parent_seq", LongType()),
        StructField("doc_idx", IntegerType()),
        StructField("doc_name", StringType()),
        StructField("doc_title", StringType()),
        StructField("doc_num", StringType()),
        StructField("doc_type", StringType()),
        StructField("display_doc_type", StringType()),
        StructField("publication_date", StringType()),
        StructField("cac_login_required", BooleanType()),
        StructField("download_url", StringType()),
        StructField("downloadable_items", ArrayType(_ITEM)),
        StructField("version_hash_raw_data", MapType(StringType(), StringType())),
        StructField("segments", ArrayType(_SEG)),
        StructField("source_page_url", StringType()),
        # per-doc feed-field overrides (extractors/base.py DOC_JSON_SCHEMA)
        # ride along so completed pendings keep them
        StructField("display_title", StringType()),
        StructField("file_ext", StringType()),
        StructField("is_revoked", BooleanType()),
        StructField("detail_url", StringType()),
        # which version-hash key the completing href fills: 'download_url'
        # (marine/samm) or 'item_currency' (dod_coronavirus_spider.py:190-196)
        StructField("pending_hash_key", StringType()),
        StructField("detail_url_hash64", LongType()),
        StructField("discovered_at_batch", IntegerType()),
    ]
)

PENDING_DONE = StructType(
    [
        StructField("detail_url_hash64", LongType()),
        StructField("batch", IntegerType()),
    ]
)

PENDING_COLS = [f.name for f in PENDING_DOCS.fields]


def resolve_pending(pending: DataFrame, detail_records: DataFrame) -> DataFrame:
    """Complete pending docs whose detail page was fetched this batch.

    detail_records: (detail_url_hash64, detail_download_href) — one row per
    detail page. Mirrors parse_download_page (marine_corp_spider.py:370-395):
    raw href goes INTO the hash dict, the space-encoded href becomes the
    download_url and the single downloadable item; file type from the href
    extension. Returns pending columns (detail bookkeeping retained so the
    caller can record completions)."""
    from gc_spark.functions.urls import file_extension_col, url_encode_spaces_col

    href = F.col("detail_download_href")
    enc = url_encode_spaces_col(href)
    return (
        # detail_records is one row per detail page fetched THIS batch —
        # bounded by the politeness budget, so explicitly broadcast: the
        # (possibly huge) open-pending side never shuffles
        pending.join(F.broadcast(detail_records), "detail_url_hash64")
        .withColumn("download_url", enc)
        .withColumn(
            "downloadable_items",
            F.array(
                F.struct(
                    file_extension_col(href).alias("doc_type"),
                    enc.alias("download_url"),
                    F.lit(None).cast("string").alias("compression_type"),
                )
            ),
        )
        .withColumn(
            "version_hash_raw_data",
            # defensively drop the completing key first: map_concat throws at
            # runtime (spark.sql.mapKeyDedupPolicy=EXCEPTION default) if an
            # extractor ever pre-sets 'download_url'/'item_currency' in a
            # pending doc's raw map — an unguarded invariant across 44
            # registered sources. The detail-page href wins, as in the
            # reference (parse_download_page overwrites the meta dict key).
            F.map_concat(
                F.map_filter(
                    "version_hash_raw_data",
                    lambda k, _: k
                    != F.coalesce(F.col("pending_hash_key"), F.lit("download_url")),
                ),
                F.create_map(
                    F.coalesce(F.col("pending_hash_key"), F.lit("download_url")), href
                ),
            ),
        )
        .drop("detail_download_href")
    )
