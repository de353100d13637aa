"""Fetch stage — injectable fetcher behind one interface.

The engine never talks to the network directly; a Fetcher maps a drained
frontier batch (DataFrame) to the same rows + fetch-result columns
(status, body, kind, media_sha, zip_entries). Two implementations:

  - TableFetcher: joins the batch against a `pages` table (the synthetic
    site graph, FIXTURES.md §6) — a pure DataFrame join, fully distributed,
    used by every test and benchmark (sandbox has no network). Missing URLs
    become status 404 (dead-letter path, pipelines.py:161-170 semantics:
    non-2xx or empty body → failure).
  - HttpFetcher: Arrow-batched mapInPandas doing real GETs with per-host
    politeness delay inside each partition — the production path (reference
    downloader semantics: DOWNLOAD_DELAY=0.1, timeout 3.5s, 2 retries,
    runspider_settings.py:20-25). Import-gated; not exercised in CI.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Fetcher:
    def fetch(self, batch: DataFrame) -> DataFrame:  # pragma: no cover - interface
        raise NotImplementedError


class TableFetcher(Fetcher):
    """Resolve fetches against a synthetic pages table keyed by url."""

    def __init__(self, pages: DataFrame):
        self.pages = pages

    def fetch(self, batch: DataFrame) -> DataFrame:
        pages = self.pages.select(
            F.col("url").alias("_page_url"),
            "status",
            "body",
            "kind",
            "media_sha",
            "zip_entries",
        )
        out = batch.join(pages, batch["url"] == pages["_page_url"], "left").drop("_page_url")
        return (
            out.withColumn("status", F.coalesce("status", F.lit(404)))
            .withColumn("kind", F.coalesce("kind", F.lit("missing")))
        )


class HttpFetcher(Fetcher):
    """Real HTTP fetch via mapInPandas. delay_ms/timeout/retries mirror the
    reference downloader config."""

    def __init__(self, delay_ms: int = 100, timeout_s: float = 3.5, retries: int = 2):
        self.delay_ms = delay_ms
        self.timeout_s = timeout_s
        self.retries = retries

    def fetch(self, batch: DataFrame) -> DataFrame:
        delay_s = self.delay_ms / 1000.0
        timeout = self.timeout_s
        retries = self.retries

        from pyspark.sql.types import (
            ArrayType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        out_schema = StructType(
            list(batch.schema.fields)
            + [
                StructField("status", IntegerType()),
                StructField("body", StringType()),
                StructField("kind", StringType()),
                StructField("media_sha", StringType()),
                StructField("zip_entries", ArrayType(StringType())),
            ]
        )

        def _fetch(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib
            import time

            try:
                import requests
            except ImportError as e:  # pragma: no cover
                raise RuntimeError("HttpFetcher requires the 'requests' package") from e

            session = requests.Session()
            for pdf in parts:
                statuses, bodies, kinds, shas = [], [], [], []
                for url in pdf["url"]:
                    body, status = None, 0
                    for _ in range(retries + 1):
                        try:
                            r = session.get(url, timeout=timeout)
                            status, body = r.status_code, r.text
                            break
                        except Exception:
                            status = 0
                        time.sleep(delay_s)
                    time.sleep(delay_s)
                    statuses.append(status)
                    bodies.append(body)
                    kinds.append("fetched" if 200 <= status < 300 else "missing")
                    shas.append(
                        hashlib.sha256(body.encode()).hexdigest() if body else None
                    )
                pdf = pdf.assign(
                    status=statuses, body=bodies, kind=kinds, media_sha=shas
                )
                pdf["zip_entries"] = None
                yield pdf

        return batch.mapInPandas(_fetch, schema=out_schema)


def split_fetch_results(fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok, failed) by status + empty-body rule (pipelines.py:161-170)."""
    ok = fetched.filter(
        (F.col("status") >= 200)
        & (F.col("status") < 300)
        & ~(F.col("body").isNull() & F.col("media_sha").isNull())
    )
    failed = fetched.join(ok.select("url_hash64"), "url_hash64", "left_anti")
    return ok, failed
