"""Extractor base + the mapInPandas execution harness."""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# One output row per fetched page: discovered links + extracted docs.
# Docs travel as JSON strings (schema variance across sources lives inside),
# then get parsed once with from_json into the fixed DOC_ITEMS-compatible
# struct by the engine.
EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("source", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("seq", LongType(), False),
        StructField("links", ArrayType(StringType()), True),  # hrefs in page order
        StructField("docs", ArrayType(StringType()), True),  # JSON doc dicts in page order
    ]
)


class Extractor:
    """Pure per-source parse function: (url, body, kind) → (links, docs)."""

    source: str = "?"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        raise NotImplementedError


registry: dict[str, Extractor] = {}


def register(ex):
    """Register an Extractor instance (or class — instantiated on the spot)."""
    inst = ex() if isinstance(ex, type) else ex
    registry[inst.source] = inst
    return ex


def run_extractors(fetched_ok: DataFrame) -> DataFrame:
    """Run the registry over a fetched micro-batch.

    Input: frontier cols + fetch-result cols. Output: EXTRACTED_SCHEMA.
    Unregistered sources yield no links/docs (counted upstream as fetched,
    nothing extracted).

    Two execution paths ("UDFs are the slow path" applied to parsing):
    extractors that define ``native_extract(df) -> DataFrame`` run as pure
    JVM expressions (regexp_extract/transform — whole-stage codegen, no
    Arrow transfer, no Python workers); everything else goes through ONE
    Arrow-batched mapInPandas. A parity test pins native == pandas on the
    same pages before a source earns the native path.
    """
    # Late import keeps worker pickles small: only the registry module names
    # travel; extractors re-register on executor import.
    cols = ["url", "source", "depth", "seq", "body", "kind"]
    import gc_spark.extractors  # noqa: F401 — populate the registry (driver side)

    native_srcs = [
        s for s, ex in registry.items() if callable(getattr(ex, "native_extract", None))
    ]

    def _run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gc_spark.extractors import registry as reg

        for pdf in parts:
            links_out, docs_out = [], []
            for url, source, body, kind in zip(
                pdf["url"], pdf["source"], pdf["body"], pdf["kind"]
            ):
                ex = reg.get(source)
                if ex is None or body is None:
                    links_out.append([])
                    docs_out.append([])
                    continue
                links, docs = ex.extract(url, body, kind)
                links_out.append(list(links))
                docs_out.append([json.dumps(d) for d in docs])
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "source": pdf["source"],
                    "depth": pdf["depth"],
                    "seq": pdf["seq"],
                    "links": links_out,
                    "docs": docs_out,
                }
            )

    base = fetched_ok.select(*cols)
    if not native_srcs:
        return base.mapInPandas(_run, schema=EXTRACTED_SCHEMA)
    out = base.filter(~F.col("source").isin(native_srcs)).mapInPandas(
        _run, schema=EXTRACTED_SCHEMA
    )
    for s in native_srcs:
        nat = registry[s].native_extract(base.filter(F.col("source") == s))
        out = out.unionByName(nat.select([f.name for f in EXTRACTED_SCHEMA.fields]))
    return out


# JSON shape each extractor emits per doc (parsed with from_json by the engine)
from pyspark.sql.types import MapType  # noqa: E402

DOC_JSON_SCHEMA = StructType(
    [
        StructField("doc_name", StringType()),
        StructField("doc_title", StringType()),
        StructField("doc_num", StringType()),
        StructField("doc_type", StringType()),
        StructField("display_doc_type", StringType()),
        StructField("publication_date", StringType()),
        StructField("cac_login_required", StringType()),  # 'true'/'false'
        StructField("download_url", StringType()),
        StructField(
            "downloadable_items",
            ArrayType(
                StructType(
                    [
                        StructField("doc_type", StringType()),
                        StructField("download_url", StringType()),
                        StructField("compression_type", StringType()),
                    ]
                )
            ),
        ),
        StructField("version_hash_raw_data", MapType(StringType(), StringType())),
        # two-hop items (Scrapy meta-carry twin, operators/pending.py):
        # detail_url marks a PENDING doc awaiting its download page;
        # detail_download_href marks a detail RECORD completing one
        StructField("detail_url", StringType()),
        StructField("detail_download_href", StringType()),
        StructField("pending_hash_key", StringType()),
        # per-doc overrides of engine-derived feed fields — set only by
        # sources whose reference spider diverges from the defaults:
        # source_page_url (SORN uses the row's html_url, sorn_spider.py:50),
        # display_title (set_display_name, e.g. disa_pubs_spider.py:73),
        # file_ext (the file_ext=doc_type quirk, fmr_spider.py:151),
        # is_revoked ('true' when status != Active, maradmin_spider.py:50)
        StructField("source_page_url", StringType()),
        StructField("display_title", StringType()),
        StructField("file_ext", StringType()),
        StructField("is_revoked", StringType()),
        StructField(
            "segments",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("payload", StringType()),
                    ]
                )
            ),
        ),
    ]
)
