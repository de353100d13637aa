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


# BanEvasionMiddleware's browser-agent pool (downloader_middlewares.py:14-53;
# the reference's commented-out entries are site-banned strings it no longer
# sends, so they are omitted here too). Public header strings, not code.
USER_AGENT_LIST = (
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/98.0.4758.80 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/97.0.9290.21 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/98.0.4758.82 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/97.0.4692.99 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/98.0.4758.102 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/98.0.4758.105 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/98.0.4758.102 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/97.0.4674.2 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/79.0.1434.80 Safari/537.36",
)


class HttpFetcher(Fetcher):
    """Real HTTP fetch via mapInPandas. delay_ms/timeout/retries mirror the
    reference downloader config; ban-evasion knobs mirror
    BanEvasionMiddleware (downloader_middlewares.py:209-233):

      - rotate_user_agent: pick a fresh User-Agent per request; False sends
        one stable agent chosen per partition (the reference chooses per
        spider process)
      - randomly_delay_request: an int range bound — sleep a DETERMINISTIC
        pseudo-random 0..n-1 seconds derived from xxhash of the URL (the
        reference uses random.choice(range(0,3)); determinism keeps crawls
        replayable)
    """

    def __init__(
        self,
        delay_ms: int = 100,
        timeout_s: float = 3.5,
        retries: int = 2,
        rotate_user_agent: bool = False,
        randomly_delay_request: int = 0,
        user_agents: tuple[str, ...] = USER_AGENT_LIST,
        response_handler=None,
    ):
        self.delay_ms = delay_ms
        self.timeout_s = timeout_s
        self.retries = retries
        self.rotate_user_agent = rotate_user_agent
        self.randomly_delay_request = randomly_delay_request
        self.user_agents = user_agents
        # download_response_handler override point (GCSpider.py:100-102):
        # (url, status, body) -> body, applied before the body is emitted.
        # Must be a pure picklable fn — it runs inside the Arrow batches.
        self.response_handler = response_handler

    def fetch(self, batch: DataFrame) -> DataFrame:
        delay_s = self.delay_ms / 1000.0
        timeout = self.timeout_s
        retries = self.retries
        rotate_ua = self.rotate_user_agent
        rand_delay = self.randomly_delay_request
        agents = list(self.user_agents)
        response_handler = self.response_handler

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

            import zlib

            session = requests.Session()
            # stable agent = deterministic per-partition pick (:212)
            stable_agent = agents[0] if agents else None
            for pdf in parts:
                statuses, bodies, kinds, shas = [], [], [], []
                for url in pdf["url"]:
                    headers = {}
                    h = zlib.crc32(url.encode())
                    if agents:
                        headers["User-Agent"] = (
                            agents[h % len(agents)] if rotate_ua else stable_agent
                        )
                    if rand_delay:
                        time.sleep(h % rand_delay)
                    body, status = None, 0
                    for _ in range(retries + 1):
                        try:
                            r = session.get(url, timeout=timeout, headers=headers)
                            status, body = r.status_code, r.text
                            break
                        except Exception:
                            status = 0
                        time.sleep(delay_s)
                    time.sleep(delay_s)
                    if response_handler is not None and body is not None:
                        body = response_handler(url, status, body)
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


class RendererFetcher(Fetcher):
    """Headed/JS fetch (SURVEY §2.1-S4) — the SeleniumMiddleware policy shape
    behind the standard Fetcher interface.

    Mirrors downloader_middlewares.py:143-201 + GCSeleniumSpider.py:23-24:
      - wait_until: a predicate over the rendered page source; while False
        the fetch retries, up to `retries` times, sleeping `retry_wait_s`
        between attempts (reference defaults 5 / 30s)
      - wait_time: per-attempt render wait budget passed to the renderer
      - script: post-load JS hook executed before the source is captured

    `render_fn(url) -> {"status", "body", "current_url"}` is injectable: the
    real implementation drives headless Chrome (selenium is import-gated —
    not in this container; the branch is pinned by a fake-module contract
    test), tests inject a fake renderer to pin the retry/wait machinery.
    Runs distributed via mapInPandas exactly like HttpFetcher; one renderer
    per partition (the reference holds one driver per spider process).

    Two wait-condition flavors, matching the two places the reference
    expresses them:
      - `wait_until(body) -> bool`: predicate over the rendered page source,
        evaluated in the generic retry loop (works with ANY render_fn)
      - `dom_wait_until(driver) -> bool`: a selenium expected-condition
        passed to WebDriverWait(driver, wait_time) inside the browser —
        exactly downloader_middlewares.py:166-168; a TimeoutException marks
        the attempt unsatisfied so the same retry loop re-renders
        (:169-176, retries+1 attempts, retry_wait_s sleeps between)."""

    def __init__(
        self,
        render_fn=None,
        wait_time: float = 5.0,
        wait_until=None,
        retries: int = 5,
        retry_wait_s: float = 30.0,
        script: str | None = None,
        dom_wait_until=None,
    ):
        self.render_fn = render_fn
        self.wait_time = wait_time
        self.wait_until = wait_until
        self.retries = retries
        self.retry_wait_s = retry_wait_s
        self.script = script
        self.dom_wait_until = dom_wait_until

    def _make_renderer(self):
        try:
            from selenium import webdriver  # noqa: F401
            from selenium.common.exceptions import TimeoutException
            from selenium.webdriver.support.ui import WebDriverWait
        except ImportError as e:
            raise NotImplementedError(
                "RendererFetcher needs an injected render_fn or the selenium "
                "package + a browser (not available in this container)"
            ) from e

        dom_wait_until = self.dom_wait_until
        wait_time = self.wait_time
        script = self.script

        def _render(url):
            opts = webdriver.ChromeOptions()
            opts.add_argument("--headless=new")
            driver = webdriver.Chrome(options=opts)
            try:
                driver.get(url)
                if dom_wait_until is not None:
                    try:
                        WebDriverWait(driver, wait_time).until(dom_wait_until)
                    except TimeoutException:
                        # unsatisfied: the generic retry loop re-renders
                        # after retry_wait_s (downloader_middlewares.py:169)
                        return {"status": 0, "body": None, "timed_out": True}
                if script:
                    driver.execute_script(script)
                return {
                    "status": 200,
                    "body": driver.page_source,
                    "current_url": driver.current_url,
                }
            finally:
                driver.quit()

        return _render

    def fetch(self, batch: DataFrame) -> DataFrame:
        from pyspark.sql.types import (
            ArrayType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        render_fn = self.render_fn or self._make_renderer()
        wait_until = self.wait_until
        retries = self.retries
        retry_wait_s = self.retry_wait_s

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
            import time

            for pdf in parts:
                statuses, bodies, kinds = [], [], []
                for url in pdf["url"]:
                    status, body = 0, None
                    # retry-until-condition loop, downloader_middlewares.py:157-177
                    attempts_remaining = retries + 1
                    while attempts_remaining:
                        r = render_fn(url)
                        status, body = int(r.get("status", 0)), r.get("body")
                        satisfied = not r.get("timed_out") and (
                            wait_until is None
                            or (body is not None and wait_until(body))
                        )
                        if satisfied:
                            break
                        attempts_remaining -= 1
                        if attempts_remaining:
                            time.sleep(retry_wait_s)
                    else:
                        status, body = 0, None  # condition never satisfied
                    statuses.append(status)
                    bodies.append(body)
                    kinds.append("rendered" if 200 <= status < 300 else "missing")
                pdf = pdf.assign(status=statuses, body=bodies, kind=kinds)
                pdf["media_sha"] = None
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
