"""Enrichment + validation stages (the reference's ordered item-pipeline
chain re-expressed as DataFrame transforms).

Reference parity (priorities 50→400, runspider_settings.py:2-8):
  - FileNameFixerPipeline   pipelines.py:419-426  → fix_doc_names
  - AdditionalFieldsPipeline pipelines.py:319-372 → enrich_with_source_defaults
  - ValidateJsonPipeline    pipelines.py:375-394  → validate_items (invalid →
    dead_letter rows instead of DropItem)
  - CAC filter              pipelines.py:131-134  → split_cac
  - first-supported-item    pipelines.py:109-112,137 → first_supported_item
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.urls import fqdn_col

SUPPORTED_FILE_EXTENSIONS = ["pdf", "html", "txt", "zip"]  # pipelines.py:30-35


def fix_doc_names(items: DataFrame) -> DataFrame:
    """doc_name: '/'→'_', truncate to 235 chars, drop empties
    (pipelines.py:419-426 + DropItem on falsy name)."""
    return items.withColumn(
        "doc_name", F.substring(F.regexp_replace("doc_name", "/", "_"), 1, 235)
    ).filter(F.col("doc_name").isNotNull() & (F.length("doc_name") > 0))


def enrich_with_source_defaults(
    items: DataFrame, source_config: DataFrame, batch_ts: str
) -> DataFrame:
    """Broadcast-join items × per-source defaults and coalesce item-level
    values over spider-level ones (AdditionalFieldsPipeline semantics: the
    spider attr *wins* for display_org/data_source/source_title/display_source
    when set — pipelines.py:322-332 — while crawler_used / source_page_url /
    source_fqdn / timestamps only fill gaps).

    source_config columns: source, display_org, data_source, source_title,
    display_source, start_url, cac_login_required_default.
    """
    sc = F.broadcast(
        source_config.select(
            F.col("source").alias("_src"),
            F.col("display_org").alias("_display_org"),
            F.col("data_source").alias("_data_source"),
            F.col("source_title").alias("_source_title"),
            F.col("display_source").alias("_display_source"),
            F.col("start_url").alias("_start_url"),
            F.col("cac_login_required_default").alias("_cac_default"),
        )
    )
    out = items.join(sc, items["crawler_used"] == sc["_src"], "left").drop("_src")

    # spider-level values override when present (reference :322-332); items
    # from the drain loop don't carry these columns at all — then the config
    # value IS the column
    for col in ["display_org", "data_source", "source_title", "display_source"]:
        if col in items.columns:
            out = out.withColumn(col, F.coalesce(F.col(f"_{col}"), F.col(col)))
        else:
            out = out.withColumn(col, F.col(f"_{col}"))

    out = (
        out.withColumn("source_page_url", F.coalesce("source_page_url", "_start_url"))
        .withColumn("source_fqdn", F.coalesce("source_fqdn", fqdn_col(F.col("source_page_url"))))
        .withColumn("access_timestamp", F.coalesce("access_timestamp", F.lit(batch_ts)))
        .withColumn(
            "cac_login_required",
            F.coalesce("cac_login_required", "_cac_default", F.lit(False)),
        )
        .drop("_display_org", "_data_source", "_source_title", "_display_source", "_start_url", "_cac_default")
    )
    return out


REQUIRED_FIELDS = [
    # output_spec.json:29-52 — the fields our engine materializes as NOT NULL
    "doc_name",
    "crawler_used",
    "source_page_url",
    "version_hash",
    "access_timestamp",
]


def validate_items(items: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split (valid, invalid): nulls in required fields or malformed
    source_page_url (pattern ^https?://\\S+$, output_spec.json) go to the
    dead-letter side with a reason — replaces DropItem (pipelines.py:393-394).
    """
    checks = [
        (F.col(c).isNull(), f"missing required field: {c}") for c in REQUIRED_FIELDS
    ]
    checks.append(
        (~F.col("source_page_url").rlike(r"^https?://\S+$"), "invalid source_page_url"),
    )
    reason = F.lit(None).cast("string")
    for cond, msg in reversed(checks):
        reason = F.when(cond, F.lit(msg)).otherwise(reason)
    tagged = items.withColumn("_invalid_reason", reason)
    valid = tagged.filter(F.col("_invalid_reason").isNull()).drop("_invalid_reason")
    invalid = tagged.filter(F.col("_invalid_reason").isNotNull())
    return valid, invalid


def split_cac(items: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(downloadable, cac_blocked) — CAC-gated items skip the fetch but still
    reach crawl output (pipelines.py:131-134)."""
    blocked = items.filter(F.col("cac_login_required") == True)  # noqa: E712
    ok = items.filter((F.col("cac_login_required") == False) | F.col("cac_login_required").isNull())  # noqa: E712
    return ok, blocked


def first_supported_item(items: DataFrame) -> DataFrame:
    """Adds `file_item` = first downloadable_items element whose doc_type is
    supported (pipelines.py:109-112) — pure array expression, no shuffle."""
    supported = F.array([F.lit(x) for x in SUPPORTED_FILE_EXTENSIONS])
    return items.withColumn(
        "file_item",
        F.try_element_at(
            F.filter("downloadable_items", lambda x: F.array_contains(supported, x["doc_type"])),
            F.lit(1),
        ),
    )
