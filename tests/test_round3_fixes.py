"""Round-3 fix coverage (VERDICT r2 items 4-5, 7-8 + ADVICE r2 items):

  - selenium-branch contract for RendererFetcher (the wait/retry call shape
    of downloader_middlewares.py:156-180, pinned with a fake selenium module)
  - dom_wait_until TimeoutException → generic retry loop re-renders
  - bloom false-positive injection: the exact-confirm join keeps zero false
    drops on both the URL-dedup and version-hash paths
  - non-Title-42 zip children take the reference's Path.stem doc_name rule
  - resolve_pending survives a pending doc whose raw map pre-sets the
    completing hash key (map_concat EXCEPTION dedup policy)
  - pending age-out: a detail page that never completes routes the doc to
    dead_letter instead of losing it invisibly
  - the real-decoder branch of extract_media_metadata anchored to actual
    PNG bytes (PIL if importable, else a PIL-shaped IHDR shim)
"""

from __future__ import annotations

import base64
import struct
import sys
import types

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------- selenium contract


def _install_fake_selenium(monkeypatch, page_source="<html>rendered</html>",
                           current_url="https://final.example.mil/",
                           wait_raises=False):
    """Install a minimal fake selenium package into sys.modules that records
    every call RendererFetcher's browser branch makes."""
    calls = {"options_args": [], "gets": [], "scripts": [], "waits": [],
             "quits": 0, "constructed_with": []}

    class FakeTimeout(Exception):
        pass

    class FakeOptions:
        def __init__(self):
            self.args = []

        def add_argument(self, a):
            self.args.append(a)
            calls["options_args"].append(a)

    class FakeDriver:
        def __init__(self, options=None):
            calls["constructed_with"].append(options)
            self.page_source = page_source
            self.current_url = current_url

        def get(self, url):
            calls["gets"].append(url)

        def execute_script(self, s):
            calls["scripts"].append(s)

        def quit(self):
            calls["quits"] += 1

    class FakeWait:
        def __init__(self, driver, timeout):
            calls["waits"].append((driver, timeout))
            self._driver = driver

        def until(self, cond):
            if wait_raises:
                raise FakeTimeout("condition never satisfied")
            return cond(self._driver)

    selenium = types.ModuleType("selenium")
    webdriver = types.ModuleType("selenium.webdriver")
    webdriver.ChromeOptions = FakeOptions
    webdriver.Chrome = FakeDriver
    common = types.ModuleType("selenium.common")
    exceptions = types.ModuleType("selenium.common.exceptions")
    exceptions.TimeoutException = FakeTimeout
    support = types.ModuleType("selenium.webdriver.support")
    ui = types.ModuleType("selenium.webdriver.support.ui")
    ui.WebDriverWait = FakeWait
    selenium.webdriver = webdriver
    selenium.common = common
    common.exceptions = exceptions
    webdriver.support = support
    support.ui = ui
    for name, mod in [
        ("selenium", selenium),
        ("selenium.webdriver", webdriver),
        ("selenium.common", common),
        ("selenium.common.exceptions", exceptions),
        ("selenium.webdriver.support", support),
        ("selenium.webdriver.support.ui", ui),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return calls


class TestSeleniumBranchContract:
    """S4: the selenium branch constructs the exact call sequence of the
    reference's SeleniumMiddleware (downloader_middlewares.py:156-198) —
    driver.get → WebDriverWait(driver, wait_time).until(cond) →
    execute_script → page_source/current_url capture → quit."""

    def test_render_call_shape(self, monkeypatch):
        from gc_spark.sources.fetch import RendererFetcher

        calls = _install_fake_selenium(monkeypatch)
        cond_seen = []

        def dom_cond(driver):
            cond_seen.append(driver)
            return True

        f = RendererFetcher(
            wait_time=7.5, dom_wait_until=dom_cond, script="window.scrollTo(0, 9e9)"
        )
        render = f._make_renderer()
        r = render("https://www.dcsa.mil/")

        assert calls["options_args"] == ["--headless=new"]
        assert calls["gets"] == ["https://www.dcsa.mil/"]
        # WebDriverWait got THE driver and THE configured wait_time, and the
        # condition was invoked with the driver (selenium EC protocol)
        assert len(calls["waits"]) == 1
        wait_driver, wait_timeout = calls["waits"][0]
        assert wait_timeout == 7.5
        assert cond_seen == [wait_driver]
        # script runs AFTER the wait, before capture (middleware :186-187)
        assert calls["scripts"] == ["window.scrollTo(0, 9e9)"]
        assert r == {
            "status": 200,
            "body": "<html>rendered</html>",
            "current_url": "https://final.example.mil/",
        }
        assert calls["quits"] == 1  # driver always released

    def test_timeout_marks_attempt_unsatisfied_and_quits(self, monkeypatch):
        from gc_spark.sources.fetch import RendererFetcher

        calls = _install_fake_selenium(monkeypatch, wait_raises=True)
        f = RendererFetcher(wait_time=2.0, dom_wait_until=lambda d: True,
                            script="should.not.run()")
        r = f._make_renderer()("https://www.dcsa.mil/")
        assert r["timed_out"] is True and r["status"] == 0 and r["body"] is None
        assert calls["scripts"] == []  # timeout short-circuits the script
        assert calls["quits"] == 1  # quit still happens on the failure path

    def test_no_selenium_raises_not_implemented(self, monkeypatch):
        from gc_spark.sources.fetch import RendererFetcher

        monkeypatch.setitem(sys.modules, "selenium", None)
        with pytest.raises(NotImplementedError):
            RendererFetcher()._make_renderer()

    def test_timed_out_attempts_retry_through_fetch(self, spark):
        """A render_fn reporting timed_out consumes retry attempts exactly
        like the middleware's TimeoutException loop (:169-176), and a later
        clean render wins."""
        from gc_spark.sources.fetch import RendererFetcher

        class FlakyRenderer:
            def __init__(self, fail_times):
                self.fail_times = fail_times
                self.calls = 0

            def __call__(self, url):
                self.calls += 1
                if self.calls <= self.fail_times:
                    return {"status": 0, "body": None, "timed_out": True}
                return {"status": 200, "body": f"<html>{url}</html>"}

        batch = spark.createDataFrame(
            [("https://x.mil/a", 1)], "url string, url_hash64 long"
        ).repartition(1)
        f = RendererFetcher(render_fn=FlakyRenderer(2), retries=5, retry_wait_s=0.0)
        rows = f.fetch(batch).collect()
        assert len(rows) == 1
        assert rows[0]["status"] == 200
        assert rows[0]["body"] == "<html>https://x.mil/a</html>"

        # and when every attempt times out, the row comes back failed
        f2 = RendererFetcher(render_fn=FlakyRenderer(99), retries=2, retry_wait_s=0.0)
        rows2 = f2.fetch(batch).collect()
        assert rows2[0]["status"] == 0 and rows2[0]["body"] is None


# ------------------------------------------------- bloom false positives


class TestBloomFalsePositiveNoFalseDrop:
    """Plant guaranteed bloom 'maybe' hits for keys that are NOT in the
    exact table (a superset bloom simulates false positives deterministically)
    and prove the exact-confirm join keeps them: zero false drops."""

    def test_url_path(self, spark):
        from gc_spark.operators.bloom import build_bloom
        from gc_spark.operators.dedup import frontier_url_dedup

        seen_hashes = list(range(1, 101))
        planted_fp = 999_999  # in the bloom, NOT in the frontier
        bloom = build_bloom(
            spark.createDataFrame(
                [(h,) for h in seen_hashes + [planted_fp]], "url_hash64 long"
            ),
            num_buckets=4,
        )
        frontier_all = spark.createDataFrame(
            [(h,) for h in seen_hashes], "url_hash64 long"
        )
        new_links = spark.createDataFrame(
            [(planted_fp, 1), (50, 2), (777_777, 3)],
            "url_hash64 long, seq long",
        )
        got = {
            r["url_hash64"]
            for r in frontier_url_dedup(
                new_links, frontier_all, bloom=bloom, num_buckets=4
            ).collect()
        }
        # 50 is truly seen → dropped; the planted FP and the clean-new URL
        # both survive (the bloom only shrinks the shuffle, never drops)
        assert got == {planted_fp, 777_777}

    def test_version_hash_path(self, spark):
        from gc_spark.operators.bloom import build_bloom
        from gc_spark.operators.dedup import anti_join_seen

        seen_rows = [(f"vh{i}", f"d{i}", "src") for i in range(1, 101)]
        seen = spark.createDataFrame(
            seen_rows, "version_hash string, doc_name string, crawler_used string"
        )
        planted_fp = "vh_planted_fp"
        bloom = build_bloom(
            spark.createDataFrame(
                [(h,) for h in [f"vh{i}" for i in range(1, 101)] + [planted_fp]],
                "vh string",
            ).select(F.xxhash64("vh").alias("url_hash64")),
            num_buckets=4,
        )
        items = spark.createDataFrame(
            [(planted_fp, "new1"), ("vh50", "old"), ("vh_clean_new", "new2")],
            "version_hash string, doc_name string",
        ).withColumn("_vh64", F.xxhash64("version_hash"))
        got = {
            r["version_hash"]
            for r in anti_join_seen(
                items, seen, key="version_hash", bloom=bloom,
                bloom_hash_col="_vh64", num_buckets=4,
            ).collect()
        }
        assert got == {planted_fp, "vh_clean_new"}


# ------------------------------------------------- zip child stem rule


class TestZipChildStem:
    """Non-T42 children: doc_name = Path(entry).stem, doc_title = text after
    the first '-' (pipelines.py:95-107); far_subpart_regs keeps the stem."""

    def _explode(self, spark, crawler, entries):
        from gc_spark.operators.explode import explode_zip_items

        df = spark.createDataFrame(
            [
                {
                    "doc_name": "Parent Doc",
                    "doc_title": "Parent Title",
                    "crawler_used": crawler,
                    "version_hash": "parenthash",
                    "version_hash_raw_data": {"doc_name": "Parent Doc", "k": "v"},
                    "media_sha": "aa" * 32,
                    "zip_entries": entries,
                }
            ]
        )
        return {r["doc_name"]: r for r in explode_zip_items(df).collect()}

    def test_stem_strips_last_extension_only(self, spark):
        got = self._explode(
            spark, "some_crawler",
            ["chapter1 - Intro.pdf", "archive - Part.tar.gz", "noext - Raw"],
        )
        assert set(got) == {"chapter1 - Intro", "archive - Part.tar", "noext - Raw"}
        assert got["chapter1 - Intro"]["doc_title"] == "Intro"
        assert got["archive - Part.tar"]["doc_title"] == "Part.tar"
        # hash raw data carries the STEM, and the version hash was recomputed
        assert got["chapter1 - Intro"]["version_hash_raw_data"]["doc_name"] == "chapter1 - Intro"
        assert got["chapter1 - Intro"]["version_hash"] != "parenthash"

    def test_far_subpart_regs_keeps_stem_as_title(self, spark):
        got = self._explode(spark, "far_subpart_regs", ["FAR - Subpart 1.1.pdf"])
        assert set(got) == {"FAR - Subpart 1.1"}
        assert got["FAR - Subpart 1.1"]["doc_title"] == "FAR - Subpart 1.1"

    def test_matches_pathlib_stem_semantics(self, spark):
        """Engine stem rule == pathlib's for dotfiles and multi-dot names."""
        from pathlib import PurePosixPath

        names = ["a - b.pdf", ".hidden", "x - y.tar.gz", "plain", "dot.end."]
        got = self._explode(spark, "c", names)
        assert set(got) == {str(PurePosixPath(n).stem) for n in names}


# ------------------------------------------------- pending guard + age-out


class TestPendingPresetKeyGuard:
    def test_preset_completing_key_does_not_throw(self, spark):
        """If an extractor ever pre-sets the completing key in the raw map,
        resolve_pending must not die on map_concat's EXCEPTION dedup policy —
        the detail-page href wins (parse_download_page overwrite semantics)."""
        from gc_spark.operators.pending import PENDING_DOCS, resolve_pending

        row = {f.name: None for f in PENDING_DOCS.fields}
        row.update(
            {
                "source": "s",
                "doc_name": "D",
                "version_hash_raw_data": {"doc_name": "D", "download_url": "STALE"},
                "detail_url": "https://x.mil/detail",
                "detail_url_hash64": 42,
                "discovered_at_batch": 1,
                "pending_hash_key": None,  # defaults to download_url
            }
        )
        pending = spark.createDataFrame([row], PENDING_DOCS)
        detail = spark.createDataFrame(
            [(42, "https://x.mil/files/real%20doc.pdf")],
            "detail_url_hash64 long, detail_download_href string",
        )
        out = resolve_pending(pending, detail).collect()
        assert len(out) == 1
        raw = out[0]["version_hash_raw_data"]
        assert raw["download_url"] == "https://x.mil/files/real%20doc.pdf"
        assert raw["doc_name"] == "D"


class TestPendingAgeOut:
    def test_never_completing_detail_reaches_dead_letter(self, spark, tmp_path):
        """The coronavirus two-hop fixture with the follow page REMOVED: the
        detail fetch 404s, the pending can never complete, and after
        pending_max_age_batches it lands in dead_letter (with the open
        pending closed) instead of vanishing. ADVICE r2 (drain.py:601)."""
        from gc_spark import schema as S
        from gc_spark.plans.drain import CrawlEngine, EngineConfig
        from gc_spark.sources.fetch import TableFetcher
        from gc_spark.sources.tables import SnapshotStore
        from gc_spark.operators.pending import PENDING_DOCS, PENDING_DONE
        from tests.fixtures import PAGES, SEEDS, media_sha_for

        start = "https://www.defense.gov/Explore/Spotlight/Coronavirus/Latest-DOD-Guidance/"
        grid = (
            '<div class="dgov-grid"><div class="block"><h2 class="cat">Travel</h2>'
            '<div class="common-grid">'
            '<div class="item"><a class="title" href="/memo.pdf">Travel Memo</a>'
            '<p class="date">March 1, 2021</p></div>'
            '<div class="item"><a class="title" href="https://www.defense.gov/guide-page">Guide Page</a>'
            '<p class="date">April 5, 2021</p></div>'
            "</div></div></div>"
        )
        rows = [
            {"url": start, "status": 200, "body": grid, "links": None,
             "kind": "listing", "media_sha": None, "zip_entries": None},
            # NOTE: no row for /guide-page → TableFetcher 404s the detail hop
            {"url": "https://www.defense.gov/memo.pdf", "status": 200, "body": None,
             "links": None, "kind": "binary",
             "media_sha": media_sha_for("https://www.defense.gov/memo.pdf"),
             "zip_entries": None},
        ]
        # a synthetic listing chain on another host keeps the frontier alive
        # past the age threshold so the PER-BATCH expiry path fires (not just
        # the end-of-crawl flush): page p is only discovered from page p-1
        chain_host = "chain.example.mil"
        for p in range(8):
            nxt = f'<a href="/list/{p + 1}">next</a>' if p < 7 else ""
            rows.append(
                {"url": f"https://{chain_host}/list/{p}", "status": 200,
                 "body": nxt or "<div>end</div>", "links": None,
                 "kind": "listing", "media_sha": None, "zip_entries": None}
            )
        pages = spark.createDataFrame(rows, schema=PAGES)
        seeds = spark.createDataFrame(
            [
                {"source": "DOD_Coronavirus_Guidance", "url": start,
                 "host": "www.defense.gov"},
                {"source": "synthetic", "url": f"https://{chain_host}/list/0",
                 "host": chain_host},
            ],
            schema=SEEDS,
        )
        store = SnapshotStore(spark, str(tmp_path / "ageout"))
        eng = CrawlEngine(
            spark, store, TableFetcher(pages),
            config=EngineConfig(
                budget_per_host=10, fetch_partitions=4,
                pending_max_age_batches=2, compact_every=0,
            ),
        )
        eng.bootstrap(seeds)
        stats = eng.run(max_batches=8)

        # the loss is OBSERVABLE: one aged-out pending in dead_letter
        dead = store.read("dead_letter", S.DEAD_LETTER).filter(
            F.col("failure_reason") == "Pending detail page never completed"
        ).collect()
        assert len(dead) == 1
        assert dead[0]["doc_name"] == "Travel: Guide Page"
        assert dead[0]["url"] == "https://www.defense.gov/guide-page"
        assert sum(s.get("pending_expired", 0) for s in stats) == 1

        # and the open-pending set is CLOSED afterward (bounded state)
        still_open = store.read("pending_docs", PENDING_DOCS).join(
            store.read("pending_done", PENDING_DONE).select("detail_url_hash64"),
            "detail_url_hash64", "left_anti",
        )
        assert still_open.count() == 0

        # the direct-download sibling was unaffected
        feed_names = {r["doc_name"] for r in store.read("feed", S.DOC_ITEMS).collect()}
        assert "Travel: Travel Memo" in feed_names


# ------------------------------------------------- real-decoder anchoring

# a real, valid 1x1 transparent PNG (89 bytes)
PNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


class TestRealDecoderPath:
    def test_real_png_decodes_1x1(self, spark, monkeypatch):
        """Anchor the REAL-decoder branch of extract_media_metadata to actual
        PNG bytes: with PIL importable use it directly; otherwise install a
        PIL-shaped shim that truly parses the IHDR chunk — either way the
        code path exercised is the `pil is not None` branch, against a real
        image file, not the deterministic fake."""
        from gc_spark.operators import multimodal as mm

        try:
            import PIL.Image  # noqa: F401  (absent in this container)
        except ImportError:
            class _ShimImage:
                def __init__(self, w, h):
                    self.width, self.height = w, h

            class _PilShim:
                @staticmethod
                def open(fp):
                    data = fp.read()
                    if data[:8] != b"\x89PNG\r\n\x1a\n":
                        raise ValueError("not a PNG")
                    w, h = struct.unpack(">II", data[16:24])
                    return _ShimImage(w, h)

            monkeypatch.setattr(mm, "_try_real_image_decoder", lambda: _PilShim)

        df = spark.createDataFrame(
            [
                ("img1", "image", bytearray(PNG_1X1)),
                ("img2", "image", bytearray(b"\x00garbage-not-a-png")),
            ],
            "media_ref string, media_type string, blob binary",
        )
        got = {r["media_ref"]: r for r in mm.extract_media_metadata(df).collect()}
        assert (got["img1"]["width"], got["img1"]["height"]) == (1, 1)
        assert got["img1"]["byte_len"] == len(PNG_1X1)
        # corrupt bytes → None dims via the decoder's exception path
        assert got["img2"]["width"] is None and got["img2"]["height"] is None

    def test_png_fixture_is_a_real_png(self):
        assert PNG_1X1[:8] == b"\x89PNG\r\n\x1a\n"
        assert struct.unpack(">II", PNG_1X1[16:24]) == (1, 1)
