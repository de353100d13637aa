"""Table schemas for the gc_spark engine (SURVEY.md §1.4, FIXTURES.md).

All tables are fixed StructTypes enforced on write — this replaces the
reference's runtime JSON-Schema validation pipeline
(reference: pipelines.py:375-394, validators.py:14-60, output_spec.json).
"""

from __future__ import annotations

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

# ---------------------------------------------------------------------------
# documents — interleaved text+media span sequences (BASELINE.json input_hint).
# Per-row correctness invariant: span-sequence equality (kind, text,
# media_ref, order).
# ---------------------------------------------------------------------------
SPAN = StructType(
    [
        StructField("kind", StringType(), False),  # 'text' | 'media'
        StructField("text", StringType(), True),  # non-null when kind='text'
        StructField("media_ref", StringType(), True),  # non-null when kind='media'
        StructField("offset", IntegerType(), False),  # 0-based position
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
    ]
)

# ---------------------------------------------------------------------------
# frontier — the explicit URL frontier (replaces Scrapy's in-memory scheduler
# queue, reference: spiders yield Request objects, e.g.
# executive_orders_spider.py:75-88). Partition key: host_hash bucket.
# ---------------------------------------------------------------------------
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("canonical_url", StringType(), False),
        StructField("url_hash64", LongType(), False),  # xxhash64(canonical_url)
        StructField("host", StringType(), False),
        StructField("host_hash", IntegerType(), False),  # bucket key
        StructField("source", StringType(), False),  # spider/source name
        StructField("priority", IntegerType(), False),  # lower drains first
        StructField("depth", IntegerType(), False),
        StructField("discovered_at_batch", IntegerType(), False),
        StructField("seq", LongType(), False),  # discovery order tie-break
        StructField("state", StringType(), False),  # pending|fetched|dead
    ]
)

# ---------------------------------------------------------------------------
# seen — the cumulative manifest as a table
# (reference record schema: pipelines.py:197-214).
# url_hash64 added by our engine to feed the partitioned Bloom filter.
# ---------------------------------------------------------------------------
SEEN = StructType(
    [
        StructField("version_hash", StringType(), False),
        StructField("doc_name", StringType(), False),
        StructField("crawler_used", StringType(), False),
        StructField("access_timestamp", StringType(), False),
        StructField("url_hash64", LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# doc_items — crawl output record, 22 required fields
# (reference: output_spec.json:29-52, items.py:9-32).
# ---------------------------------------------------------------------------
DOWNLOADABLE_ITEM = StructType(
    [
        StructField("doc_type", StringType(), True),
        StructField("download_url", StringType(), True),
        StructField("compression_type", StringType(), True),  # null|tar|tar.gz|tar.bz|zip
    ]
)

DOC_ITEMS = StructType(
    [
        StructField("doc_name", StringType(), False),
        StructField("doc_title", StringType(), True),
        StructField("doc_num", StringType(), True),
        StructField("doc_type", StringType(), True),
        StructField("display_doc_type", StringType(), True),
        StructField("publication_date", StringType(), True),
        StructField("cac_login_required", BooleanType(), True),
        StructField("crawler_used", StringType(), True),
        StructField("source_page_url", StringType(), True),
        StructField("source_fqdn", StringType(), True),
        StructField("download_url", StringType(), True),
        StructField("downloadable_items", ArrayType(DOWNLOADABLE_ITEM), True),
        StructField("version_hash_raw_data", MapType(StringType(), StringType()), True),
        StructField("version_hash", StringType(), True),
        StructField("access_timestamp", StringType(), True),
        StructField("display_org", StringType(), True),
        StructField("display_source", StringType(), True),
        StructField("display_title", StringType(), True),
        StructField("data_source", StringType(), True),
        StructField("source_title", StringType(), True),
        StructField("file_ext", StringType(), True),
        StructField("is_revoked", BooleanType(), True),
    ]
)

# ---------------------------------------------------------------------------
# seeds — the source-site seed list (reference: start_urls of 41 spiders)
# ---------------------------------------------------------------------------
SEEDS = StructType(
    [
        StructField("source", StringType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("allowed_domains", ArrayType(StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# hosts / robots — politeness config (reference: runspider_settings.py:20-25;
# robots disabled in reference via ROBOTSTXT_OBEY: False at
# runspider_settings.py:16 — our engine supports rules, default-allow).
# ---------------------------------------------------------------------------
HOSTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("host_hash", IntegerType(), False),
        StructField("budget_per_batch", IntegerType(), False),
        StructField("delay_ms", IntegerType(), False),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("allow", ArrayType(StringType()), True),
        StructField("disallow", ArrayType(StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# dead_letter — failed downloads + reason (reference: pipelines.py:179-195)
# ---------------------------------------------------------------------------
DEAD_LETTER = StructType(
    [
        StructField("url", StringType(), True),
        StructField("doc_name", StringType(), True),
        StructField("source", StringType(), True),
        StructField("failure_reason", StringType(), False),
        StructField("batch", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# metrics — per-source, per-batch counters (reference: GCSpider.py:28-31,
# 51-66 'Required CAC' / 'In Previous Hashes' / scraped count / elapsed)
# ---------------------------------------------------------------------------
METRICS = StructType(
    [
        StructField("source", StringType(), False),
        StructField("batch", IntegerType(), False),
        StructField("urls_scheduled", LongType(), False),
        StructField("urls_deduped", LongType(), False),
        StructField("docs_emitted", LongType(), False),
        StructField("in_previous_hashes", LongType(), False),
        StructField("required_cac", LongType(), False),
        StructField("dead", LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# lineage — per-partition provenance rows for each committed micro-batch
# ---------------------------------------------------------------------------
LINEAGE = StructType(
    [
        StructField("batch", IntegerType(), False),
        StructField("table", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("rows_written", LongType(), False),
        StructField("snapshot_id", StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# pages — synthetic site graph for the injectable fake fetcher (FIXTURES.md §6)
# ---------------------------------------------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("status", IntegerType(), False),
        StructField("body", StringType(), True),
        StructField("links", ArrayType(StringType()), True),
        StructField("kind", StringType(), False),  # listing|detail|binary
        StructField("media_sha", StringType(), True),
        StructField("zip_entries", ArrayType(StringType()), True),  # entry stems for kind='binary' zips
    ]
)

# fetch-stage output: PAGES columns joined onto the drained frontier rows
FETCH_RESULT_EXTRA = ["status", "body", "kind", "media_sha", "zip_entries"]
