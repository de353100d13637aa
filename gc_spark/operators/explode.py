"""Archive explode + span assembly.

Zip-explode parity (pipelines.py:94-107 create_items_from_nested_zip +
item_completed :261-283): one downloaded zip item expands into one child
DocItem per entry; children REPLACE the parent in crawl output, manifest and
seen-set (verified against the us_code goldens: 57 parents + 6 Title-42
children = 63 rows, no Title-42 parent row anywhere).

Child field semantics:
  - doc_name  = entry stem
  - doc_title = stem.split('-', 1)[1].strip()   (far_subpart_regs: stem as-is)
  - version_hash_raw_data['doc_name'] = child doc_name
  - version_hash = dict_to_sha256_hex_digest(updated raw map)  — confirmed
    byte-exact against the 6 golden child hashes.

Span assembly: every emitted document lands in the `documents` table as an
interleaved span sequence (BASELINE.json input_hint) — text spans from page
text, media spans referencing content-addressed blobs; offsets are the
0-based sequence positions. Child media blobs are addressed as
sha256(parent_sha ':' stem) so explode is deterministic and needs no bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.hashing import version_hash_udf


def explode_zip_items(items: DataFrame) -> DataFrame:
    """Split items into pass-through rows and zip-children rows.

    Input must carry: downloadable_items, version_hash_raw_data, doc_name,
    doc_title, version_hash, crawler_used, media_sha (parent blob sha),
    zip_entries (array of entry stems; null/empty for non-zip items).

    Returns the union with children substituted for exploded parents, plus
    `parent_version_hash` (null for pass-through rows) for lineage.
    """
    is_zip_bundle = (
        F.col("zip_entries").isNotNull() & (F.size("zip_entries") > 0)
    )

    passthrough = items.filter(~is_zip_bundle).withColumn(
        "parent_version_hash", F.lit(None).cast("string")
    )

    parents = items.filter(is_zip_bundle)
    # raw entry names are sorted first (utils.py:251-252 unzipped_files.sort)
    # then Title-42 nested pdfs get the chapter/section-range rename of
    # extract_title_42_subfile_names (utils.py:211-227): 'usc42ch{a}to{b}…
    # Secs{c}to{d}.pdf' → '{parent stem} - Ch{a} to Ch{b} - Sec{c} to Sec{d}'
    ch_a = F.regexp_extract("_entry_raw", r"ch(\d+)to(\d+)", 1)
    ch_b = F.regexp_extract("_entry_raw", r"ch(\d+)to(\d+)", 2)
    sc_a = F.regexp_extract("_entry_raw", r"Secs(\d+)to(\d+)", 1)
    sc_b = F.regexp_extract("_entry_raw", r"Secs(\d+)to(\d+)", 2)
    is_t42 = (
        F.col("_entry_raw").startswith("usc42") & (ch_a != "") & (sc_a != "")
    )
    derived_stem = F.concat(
        F.col("doc_name"),
        F.lit(" - Ch"), ch_a, F.lit(" to Ch"), ch_b,
        F.lit(" - Sec"), sc_a, F.lit(" to Sec"), sc_b,
    )
    # non-T42 doc_name = Path(entry).stem (pipelines.py:98 sub_path.stem):
    # strip the LAST extension only, require >=1 char before the dot so
    # '.hidden' and 'foo.tar.gz' match pathlib ('.hidden', 'foo.tar')
    stem = F.regexp_replace("_entry_raw", r"^(.+)\.[^.]+$", "$1")
    children = (
        parents.withColumn("_entry_raw", F.explode(F.sort_array("zip_entries")))
        .withColumn("_entry", F.when(is_t42, derived_stem).otherwise(stem))
        .withColumn("parent_version_hash", F.col("version_hash"))
        .withColumn("doc_name", F.col("_entry"))
        .withColumn(
            "doc_title",
            # stem.split('-', 1)[1].strip() — everything after the FIRST '-'
            F.when(
                F.col("crawler_used") == "far_subpart_regs", F.col("_entry")
            ).otherwise(
                F.trim(F.expr("substring(_entry, instr(_entry, '-') + 1)"))
            ),
        )
        .withColumn(
            "version_hash_raw_data",
            F.map_concat(
                F.map_filter("version_hash_raw_data", lambda k, v: k != F.lit("doc_name")),
                F.create_map(F.lit("doc_name"), F.col("_entry")),
            ),
        )
        .withColumn("version_hash", version_hash_udf("version_hash_raw_data"))
        .withColumn(
            "media_sha",
            F.sha2(F.concat_ws(":", F.col("media_sha"), F.col("_entry")), 256),
        )
        .drop("_entry", "_entry_raw")
    )
    return passthrough.unionByName(children)


def assemble_spans(items: DataFrame, source_col: str = "crawler_used") -> DataFrame:
    """Build `documents` rows: doc_id + interleaved spans.

    For crawl items: span 0 = text (the display/doc title text), span 1 =
    media blob when a download happened. Items without a downloaded blob get
    a single text span. Pure array expressions — no shuffle, no Python.
    """
    ext = F.coalesce(
        F.col("file_item.doc_type"),
        F.try_element_at(F.col("downloadable_items"), F.lit(1))["doc_type"],
        F.lit("bin"),
    )
    text_span = F.struct(
        F.lit("text").alias("kind"),
        F.coalesce(F.col("doc_title"), F.col("doc_name")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("blob://sha256/"), F.col("media_sha"), F.lit("."), ext).alias("media_ref"),
        F.lit(1).alias("offset"),
    )
    spans = F.when(
        F.col("media_sha").isNotNull(), F.array(text_span, media_span)
    ).otherwise(F.array(text_span))
    return items.select(
        F.concat(F.col(source_col), F.lit("::"), F.col("doc_name")).alias("doc_id"),
        spans.alias("spans"),
    )


def artifact_download_path_col(output_file_name, compression_type) -> "F.Column":
    """Relative artifact path for a downloaded binary — the file-layout rule
    of the reference's FilePipeline (pipelines.py:235-250):

      - compressed items: '<name>.<compression_type>'
      - jbook items ('rdte;year;name' / 'procurement;year;name'): ';'→'/'
        so artifacts land under 'type/year/name' (pipelines.py:242-247)
      - everything else: the name as-is

    Pure expressions; pair with the content-addressed blob ref for
    dual-addressing (path for humans/S3 layout, sha for dedup)."""
    name = output_file_name if not isinstance(output_file_name, str) else F.col(output_file_name)
    comp = compression_type if not isinstance(compression_type, str) else F.col(compression_type)
    is_jbook = name.contains("rdte;") | name.contains("procurement;")
    return (
        F.when(comp.isNotNull(), F.concat(name, F.lit("."), comp))
        .when(is_jbook, F.regexp_replace(name, ";", "/"))
        .otherwise(name)
    )


def interleave_spans_from_segments(df: DataFrame, segments_col: str = "segments") -> DataFrame:
    """Generic interleaved-document builder: given an array<struct<kind,
    payload>> column (e.g. from a detail-page extractor), produce the spans
    array with sequential offsets — transform() keeps it JVM-side."""
    return df.withColumn(
        "spans",
        F.transform(
            F.col(segments_col),
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                F.when(s["kind"] == "text", s["payload"]).cast("string").alias("text"),
                F.when(s["kind"] == "media", s["payload"]).cast("string").alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ),
    )
