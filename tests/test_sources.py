"""Source-family tests: JSON-API pagination crawl (S5/X3), real HTTP fetch
against a localhost server (S3), robots filtering, per-host budget overrides."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from gc_spark import schema as S
from gc_spark.plans.drain import CrawlEngine, EngineConfig, _done_schema, fetch_history
from gc_spark.sources.fetch import HttpFetcher, TableFetcher
from gc_spark.sources.tables import SnapshotStore

from tests.fixtures import (
    json_api_pages,
    json_api_seeds,
    scale_site_pages,
    scale_site_seeds,
)


class TestJsonApiSource:
    def test_paginated_api_crawl(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "api"))
        eng = CrawlEngine(
            spark,
            store,
            TableFetcher(json_api_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=4),
        )
        eng.bootstrap(json_api_seeds(spark))
        stats = eng.run(max_batches=10)

        # 3 api pages chained by next_page_url -> 3 batches (depth growth)
        assert len(stats) == 3
        done = store.read("frontier_done", _done_schema())
        assert done.count() == 3

        seen = store.read("seen", S.SEEN)
        assert seen.count() == 12  # 3 pages x 4 docs, all downloaded
        names = {r["doc_name"] for r in seen.collect()}
        assert "API 2024-00000" in names and "API 2024-00011" in names

        docs = store.read("documents", S.DOCUMENTS)
        media = docs.select(F.explode("spans").alias("s")).filter(
            F.col("s.kind") == "media"
        )
        assert media.count() == 12
        assert media.filter(~F.col("s.media_ref").endswith(".pdf")).count() == 0


class TestIssuancesSource:
    def test_table_listing_crawl(self, spark, tmp_path):
        """dod_issuances-style source: display maps (C13), fix_oprs (C10),
        mixed-format dates (C8), CAC gating (F3) — all through the engine."""
        from tests.fixtures import issuances_pages, issuances_seeds

        store = SnapshotStore(spark, str(tmp_path / "iss"))
        eng = CrawlEngine(
            spark,
            store,
            TableFetcher(issuances_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=4),
        )
        eng.bootstrap(issuances_seeds(spark))
        eng.run(max_batches=5)

        feed = store.read("feed", S.DOC_ITEMS)
        rows = {r["doc_name"]: r for r in feed.collect()}
        assert len(rows) == 8
        # display map applied
        assert rows["DODD 24-001"]["doc_type"] == "Directive"
        assert rows["DODI 24-002"]["doc_type"] == "Instruction"
        assert rows["DTMS 24-000"]["doc_type"] == "DTM"
        # mixed-format dates all normalized
        assert rows["DTMS 24-000"]["publication_date"] == "2024-03-04T00:00:00"
        assert rows["DODD 24-001"]["publication_date"] == "2024-03-05T00:00:00"
        assert rows["DODI 24-002"]["publication_date"] == "2024-03-06T00:00:00"
        # OPR scrubbed of phone + email in the hash raw data
        opr = rows["DTMS 24-000"]["version_hash_raw_data"]["opr"]
        assert "703" not in opr and "@" not in opr and opr.startswith("Office 0")
        # CAC-gated row: in feed, NOT in seen
        assert rows["DODI 24-005"]["cac_login_required"] is True
        seen_names = {r["doc_name"] for r in store.read("seen", S.SEEN).collect()}
        assert "DODI 24-005" not in seen_names
        assert len(seen_names) == 7


class TestPriorityQueue:
    def test_priority_overrides_discovery_order(self, spark, tmp_path):
        """Seeds with explicit priorities drain low-priority-first within a
        host budget, overriding discovery (seq) order."""
        from gc_spark.schema import PAGES

        pages = spark.createDataFrame(
            [
                {
                    "url": f"https://p.mil/doc/{i}",
                    "status": 200,
                    "body": f"<h1>p-doc-{i}</h1><p>t</p>",
                    "links": None,
                    "kind": "detail",
                    "media_sha": None,
                    "zip_entries": None,
                }
                for i in range(4)
            ],
            schema=PAGES,
        )
        # seed 4 urls on ONE host, budget 2/batch; urls 2,3 get priority -1
        seeds = spark.createDataFrame(
            [
                {
                    "source": "synthetic",
                    "url": f"https://p.mil/doc/{i}",
                    "host": "p.mil",
                    "allowed_domains": [],
                    "priority": -1 if i >= 2 else 0,
                }
                for i in range(4)
            ],
            schema="source string, url string, host string, allowed_domains array<string>, priority int",
        )
        store = SnapshotStore(spark, str(tmp_path / "prio"))
        eng = CrawlEngine(
            spark,
            store,
            TableFetcher(pages),
            config=EngineConfig(budget_per_host=2, fetch_partitions=4),
        )
        eng.bootstrap(seeds)
        eng.run(max_batches=5)
        done = store.read("frontier_done", _done_schema())
        by_batch = {r["url"]: r["batch"] for r in done.collect()}
        # priority -1 urls (2,3) drained in batch 1; 0-priority in batch 2
        assert by_batch["https://p.mil/doc/2"] == 1
        assert by_batch["https://p.mil/doc/3"] == 1
        assert by_batch["https://p.mil/doc/0"] == 2
        assert by_batch["https://p.mil/doc/1"] == 2


class TestSubmitDriver:
    def test_cli_driver_end_to_end(self, spark, tmp_path):
        """The spark-submit driver file, driven exactly as a cluster user
        would (fresh process, CLI args), crawls and reports, and a second
        invocation resumes as a no-op."""
        import json
        import subprocess
        import sys

        from tests.fixtures import issuances_pages

        pages_path = str(tmp_path / "pages")
        issuances_pages(spark).write.parquet(pages_path)
        seeds_path = tmp_path / "seeds.json"
        seeds_path.write_text(
            json.dumps(
                {
                    "source": "issuances",
                    "url": "https://issuances.example.mil/listing",
                    "host": "issuances.example.mil",
                    "allowed_domains": [],
                }
            )
            + "\n"
        )
        wh = str(tmp_path / "wh")

        def run():
            out = subprocess.run(
                [
                    sys.executable,
                    "gc_spark/plans/main.py",
                    "--warehouse", wh,
                    "--pages", pages_path,
                    "--seeds", str(seeds_path),
                    "--batches", "5",
                    "--cores", "4",
                ],
                capture_output=True,
                text=True,
                timeout=600,
                cwd="/root/repo",
            )
            assert out.returncode == 0, out.stderr[-2000:]
            return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]

        lines = run()
        summary = lines[-1]
        assert summary["done"] and summary["seen"] == 7 and summary["documents"] == 7

        # resume on a finished warehouse: no new batches, same totals
        lines2 = run()
        assert lines2[-1]["batches"] == 0 and lines2[-1]["seen"] == 7


class _Handler:
    """Tiny stdlib HTTP server serving deterministic pages."""

    @staticmethod
    def make(pages: dict[str, tuple[int, str]]):
        from http.server import BaseHTTPRequestHandler

        class H(BaseHTTPRequestHandler):
            seen_agents: list[str] = []

            def do_GET(self):
                H.seen_agents.append(self.headers.get("User-Agent", ""))
                status, body = pages.get(self.path, (404, "not found"))
                data = body.encode()
                self.send_response(status)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):  # silence
                pass

        return H


class TestHttpFetcher:
    @pytest.fixture(scope="class")
    def server(self):
        from http.server import ThreadingHTTPServer

        pages = {
            "/list": (200, '<ul><li><a href="/doc/1">Doc 1</a></li></ul>'),
            "/doc/1": (200, "<h1>hello</h1><p>world</p>"),
            "/boom": (500, "server error"),
        }
        handler = _Handler.make(pages)
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}", handler
        srv.shutdown()

    def test_real_http_fetch(self, spark, server):
        """The production fetch path (mapInPandas + requests + politeness
        delay) against a real localhost socket."""
        server, _handler = server
        batch = spark.createDataFrame(
            [
                (f"{server}/list", "s", 0, 0),
                (f"{server}/doc/1", "s", 0, 1),
                (f"{server}/missing", "s", 0, 2),
                (f"{server}/boom", "s", 0, 3),
            ],
            ["url", "source", "depth", "seq"],
        )
        fetcher = HttpFetcher(delay_ms=10, timeout_s=2.0, retries=1)
        out = {r["url"]: r for r in fetcher.fetch(batch).collect()}
        assert out[f"{server}/list"]["status"] == 200
        assert "Doc 1" in out[f"{server}/list"]["body"]
        assert out[f"{server}/doc/1"]["media_sha"] is not None
        assert out[f"{server}/missing"]["status"] == 404
        assert out[f"{server}/boom"]["status"] == 500

    def test_user_agent_rotation(self, spark, server):
        """Ban-evasion config (downloader_middlewares.py:209-233): rotating
        fetch sends several distinct User-Agents; non-rotating sends one."""
        server, handler = server
        urls = [(f"{server}/doc/1?i={i}", "s", 0, i) for i in range(12)]
        batch = spark.createDataFrame(urls, ["url", "source", "depth", "seq"]).coalesce(1)

        handler.seen_agents.clear()
        HttpFetcher(delay_ms=1, timeout_s=2.0, rotate_user_agent=True).fetch(batch).count()
        rotated = set(handler.seen_agents)
        assert len(rotated) > 1
        from gc_spark.sources.fetch import USER_AGENT_LIST
        assert rotated <= set(USER_AGENT_LIST)

        handler.seen_agents.clear()
        HttpFetcher(delay_ms=1, timeout_s=2.0, rotate_user_agent=False).fetch(batch).count()
        assert len(set(handler.seen_agents)) == 1


class TestScopeAndHelpers:
    def test_allowed_domains_offsite_filter(self, spark, tmp_path):
        """F7: a listing that links offsite — scoped source never schedules
        the offsite URL; unscoped source would."""
        from gc_spark.schema import PAGES, SEEDS

        pages = spark.createDataFrame(
            [
                {
                    "url": "https://in.mil/list/0",
                    "status": 200,
                    "body": '<ul><li><a href="/doc/1">a</a></li>'
                    '<li><a href="https://offsite.com/doc/2">b</a></li></ul>',
                    "links": None,
                    "kind": "listing",
                    "media_sha": None,
                    "zip_entries": None,
                },
                {
                    "url": "https://in.mil/doc/1",
                    "status": 200,
                    "body": "<h1>in-doc</h1><p>t</p>",
                    "links": None,
                    "kind": "detail",
                    "media_sha": None,
                    "zip_entries": None,
                },
                {
                    "url": "https://offsite.com/doc/2",
                    "status": 200,
                    "body": "<h1>off-doc</h1><p>t</p>",
                    "links": None,
                    "kind": "detail",
                    "media_sha": None,
                    "zip_entries": None,
                },
            ],
            schema=PAGES,
        )
        seeds = spark.createDataFrame(
            [
                {
                    "source": "synthetic",
                    "url": "https://in.mil/list/0",
                    "host": "in.mil",
                    "allowed_domains": ["in.mil"],
                }
            ],
            schema=SEEDS,
        )
        store = SnapshotStore(spark, str(tmp_path / "scope"))
        eng = CrawlEngine(
            spark,
            store,
            TableFetcher(pages),
            config=EngineConfig(budget_per_host=10, fetch_partitions=4),
            scope=seeds.select("source", "allowed_domains"),
        )
        eng.bootstrap(seeds)
        eng.run(max_batches=5)
        fetched = {r["url"] for r in fetch_history(store).collect()}
        assert "https://in.mil/doc/1" in fetched
        assert "https://offsite.com/doc/2" not in fetched

    def test_manifest_jsonl_roundtrip(self, spark, tmp_path):
        """S7/S8: JSON-lines manifest read + feed export."""
        import json

        from gc_spark.sources.manifest import read_manifest_jsonl, write_feed_jsonl

        p = tmp_path / "manifest.json"
        rows = [
            {"version_hash": "a" * 64, "doc_name": "Doc A", "crawler_used": "x",
             "access_timestamp": "2022-05-20 17:45:56.579087"},
            {"version_hash": "b" * 64, "doc_name": "Doc B", "crawler_used": None,
             "access_timestamp": "2022-05-20 17:45:57"},
        ]
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n\n")
        seen = read_manifest_jsonl(spark, str(p))
        got = {r["version_hash"]: r["crawler_used"] for r in seen.collect()}
        assert got == {"a" * 64: "x", "b" * 64: None}

        out = tmp_path / "feed"
        write_feed_jsonl(seen.drop("url_hash64"), str(out))
        back = spark.read.json(str(out))
        assert back.count() == 2

    def test_encode_url_params_and_display_map(self, spark):
        from gc_spark.functions.text import display_map_col
        from gc_spark.functions.urls import encode_url_params

        assert encode_url_params({"page": 1, "per_page": 1000}) == "page=1&per_page=1000"
        df = spark.createDataFrame([("CI",), ("CJCSI",), ("???",)], ["t"])
        got = [
            r["d"]
            for r in df.select(
                display_map_col(
                    F.col("t"), {"CI": "Instruction", "CJCSI": "Instruction CJCS"}
                ).alias("d")
            ).collect()
        ]
        assert got == ["Instruction", "Instruction CJCS", "???"]


class TestRobotsAndBudgets:
    def test_robots_disallow_blocks_links(self, spark, tmp_path):
        robots = spark.createDataFrame(
            [("host00.example.mil", [], ["/doc"])], schema=S.ROBOTS
        )
        store = SnapshotStore(spark, str(tmp_path / "rb"))
        eng = CrawlEngine(
            spark,
            store,
            TableFetcher(scale_site_pages(spark, num_hosts=2)),
            config=EngineConfig(budget_per_host=50, fetch_partitions=4),
            robots=robots,
        )
        eng.bootstrap(scale_site_seeds(spark, num_hosts=2))
        eng.run(max_batches=10)
        done = fetch_history(store)
        # host00's /doc/* links never scheduled; its /list/* pages still are
        h0 = [r["url"] for r in done.filter(F.col("host") == "host00.example.mil").collect()]
        assert all("/doc/" not in u for u in h0)
        assert any("/list/" in u for u in h0)
        # host01 unaffected
        h1 = [r["url"] for r in done.filter(F.col("host") == "host01.example.mil").collect()]
        assert any("/doc/" in u for u in h1)

    def test_per_host_budget_override(self, spark, tmp_path):
        budgets = spark.createDataFrame(
            [("host00.example.mil", 0, 2, 100)], schema=S.HOSTS
        ).select("host", "budget_per_batch")
        store = SnapshotStore(spark, str(tmp_path / "hb"))
        eng = CrawlEngine(
            spark,
            store,
            TableFetcher(scale_site_pages(spark, num_hosts=2)),
            config=EngineConfig(budget_per_host=50, fetch_partitions=4),
            host_budgets=budgets,
        )
        eng.bootstrap(scale_site_seeds(spark, num_hosts=2))
        eng.run(max_batches=30)
        done = fetch_history(store)
        per = done.groupBy("host", "batch").count()
        assert per.filter(
            (F.col("host") == "host00.example.mil") & (F.col("count") > 2)
        ).count() == 0
        assert per.filter(
            (F.col("host") == "host01.example.mil") & (F.col("count") > 2)
        ).count() > 0  # default budget lets the other host go wide


class TestExecutiveOrdersSource:
    def test_eo_api_crawl(self, spark, tmp_path):
        """ex_orders family: landing → bulk JSON link → paginated results →
        per-doc detail JSON, EO-specific hash dict, CHAMPUS skip, numberless
        title fallback (executive_orders_spider.py:70-180)."""
        from gc_spark.functions.hashing import dict_to_sha256_hex_digest
        from tests.fixtures import EO_HOST, ex_orders_pages, ex_orders_seeds

        store = SnapshotStore(spark, str(tmp_path / "eo"))
        eng = CrawlEngine(
            spark, store, TableFetcher(ex_orders_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=4),
        )
        eng.bootstrap(ex_orders_seeds(spark))
        eng.run(max_batches=10)

        feed = {r["doc_name"]: r for r in store.read("feed", S.DOC_ITEMS).collect()}
        # CHAMPUS mis-numbered notice skipped; numberless falls back to title
        assert set(feed) == {"EO 12988", "EO Closing of departments in memory"}
        row = feed["EO 12988"]
        assert row["doc_type"] == "EO"
        assert row["display_doc_type"] == "Order"
        assert row["publication_date"] == "1996-02-09T00:00:00"
        assert [it["doc_type"] for it in row["downloadable_items"]] == ["pdf", "xml", "txt"]
        expected_hash = dict_to_sha256_hex_digest(
            {
                "publication_date": "1996-02-09T00:00:00",
                "signing_date": "1996-02-05",
                "disposition_notes": "Revokes EO 12800",
                "doc_name": "EO 12988",
                "doc_num": "12988",
                "download_url": f"https://{EO_HOST}/pdf/eo12988.pdf",
                "display_title": "EO 12988: Improving Analytics",
            }
        )
        assert row["version_hash"] == expected_hash
        seen = {r["doc_name"] for r in store.read("seen", S.SEEN).collect()}
        assert seen == {"EO 12988", "EO Closing of departments in memory"}


class TestAirForceSource:
    def test_carving_cascade(self):
        """Doc-name carving parity, air_force_spider.py:156-197 — including
        the cross-row doc_num carry the reference exhibits."""
        from gc_spark.extractors.air_force import carve_doc_fields

        assert carve_doc_fields("AFI21-101", "") == ("AFI", "21-101", "AFI 21-101")
        assert carve_doc_fields("CFETP2A3X3", "") == ("CFETP", "2A3X3", "CFETP 2A3X3")
        assert carve_doc_fields("2T0X1_F-35_AFJQS", "") == (
            "AFJQS", "2T0X1_F-35", "AFJQS 2T0X1_F-35")
        assert carve_doc_fields("AFHandbook1", "") == ("AFH", "1", "AFH 1")
        # BOWFUSF never assigns doc_num: inherits the previous row's value
        assert carve_doc_fields("BOWFUSF", "1") == ("AF MISC", "1", "BOWFUSF")
        assert carve_doc_fields("AFI16-1404SMALL", "") == ("AFI", "16-1404", "AFI 16-1404")
        assert carve_doc_fields("DODI8510.01_AFI17-101", "") == ("AFI", "17-101", "AFI 17-101")
        assert carve_doc_fields("dafgm2024-36-01", "") == (
            "DAFGM", "dafgm2024-36-01", "DAFGM dafgm2024-36-01")
        assert carve_doc_fields("AFMAN17-1301-S", "") == (
            "AFMAN", "17-1301-S", "AFMAN 17-1301-S")

    def test_af_table_crawl(self, spark, tmp_path):
        from gc_spark.functions.hashing import dict_to_sha256_hex_digest
        from tests.fixtures import air_force_pages, air_force_seeds

        store = SnapshotStore(spark, str(tmp_path / "af"))
        eng = CrawlEngine(
            spark, store, TableFetcher(air_force_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=4),
        )
        eng.bootstrap(air_force_seeds(spark))
        eng.run(max_batches=5)

        feed = {r["doc_name"]: r for r in store.read("feed", S.DOC_ITEMS).collect()}
        assert set(feed) == {
            "AFI 21-101", "CFETP 2A3X3", "AFJQS 2T0X1_F-35", "AFH 1", "BOWFUSF",
            "AFI 16-1404", "AFI 17-101", "DAFGM dafgm2024-36-01", "AFMAN 17-1301-S",
        }
        row = feed["AFI 21-101"]
        # punctuation stripped from the title (:291)
        assert row["doc_title"] == "Maintenance Mgmt of Systems"
        assert row["publication_date"] == "2024-01-02T00:00:00"
        expected_hash = dict_to_sha256_hex_digest(
            {
                "doc_name": "AFI 21-101",
                "doc_num": "21-101",
                "publication_date": "2024-01-02T00:00:00",
                "download_url": "afi21-101.pdf",  # basename only (:275)
                "display_title": "AFI 21-101: Maintenance Mgmt of Systems",
            }
        )
        assert row["version_hash"] == expected_hash
        # '-S' product suffix gates CAC: feed yes, seen no
        assert feed["AFMAN 17-1301-S"]["cac_login_required"] is True
        seen = {r["doc_name"] for r in store.read("seen", S.SEEN).collect()}
        assert "AFMAN 17-1301-S" not in seen and len(seen) == 8
        # BOWFUSF inherited the previous row's doc_num (reference quirk)
        assert feed["BOWFUSF"]["doc_num"] == "1"


class TestMarineCorpSource:
    def test_two_hop_pending_join(self, spark, tmp_path):
        """marine_pubs family: dispatch-table transforms on the listing, the
        download href resolved ONE BATCH LATER via the pending-docs join, and
        the version hash computed only after completion — the distributed
        twin of the reference's response.meta carry
        (marine_corp_spider.py:335-395)."""
        from gc_spark.functions.hashing import dict_to_sha256_hex_digest
        from gc_spark.operators.pending import PENDING_DOCS, PENDING_DONE
        from tests.fixtures import MC_HOST, marine_pages, marine_seeds

        store = SnapshotStore(spark, str(tmp_path / "mc"))
        eng = CrawlEngine(
            spark, store, TableFetcher(marine_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=4),
        )
        eng.bootstrap(marine_seeds(spark))
        eng.run(max_batches=10)

        feed = {r["doc_name"]: r for r in store.read("feed", S.DOC_ITEMS).collect()}
        # Deleted + unknown-type rows skipped; no-download-link row never completes
        assert set(feed) == {
            "MCO 5215.1K", "NAVMC 2915", "Historical: Historic Pubs",
            "SECNAV M-5210.1", "IRM-2300-05A",
        }
        row = feed["MCO 5215.1K"]
        assert row["download_url"] == f"https://{MC_HOST}/files/mco-5215.pdf"
        expected_hash = dict_to_sha256_hex_digest(
            {
                "doc_num": "5215.1K",
                "doc_name": "MCO 5215.1K",
                "publication_date": "None",
                "status": "Active",
                "display_title": "MCO 5215.1K: Marine Corps Directives System",
            }
            | {"download_url": f"https://{MC_HOST}/files/mco-5215.pdf"}
        )
        assert row["version_hash"] == expected_hash
        # FOUO title gates CAC (feed only)
        assert feed["IRM-2300-05A"]["cac_login_required"] is True
        seen = {r["doc_name"] for r in store.read("seen", S.SEEN).collect()}
        assert seen == {
            "MCO 5215.1K", "NAVMC 2915", "Historical: Historic Pubs", "SECNAV M-5210.1"
        }
        # the no-download row can never complete (its detail page was fetched
        # and yielded no href): the end-of-crawl flush routes it to
        # dead_letter and CLOSES the pending — observable loss, bounded state
        # (round 2 left it silently open forever)
        open_pending = store.read("pending_docs", PENDING_DOCS).join(
            store.read("pending_done", PENDING_DONE).select("detail_url_hash64"),
            "detail_url_hash64", "left_anti",
        ).collect()
        assert open_pending == []
        from pyspark.sql import functions as F

        lost = store.read("dead_letter", S.DEAD_LETTER).filter(
            F.col("failure_reason") == "Pending detail page never completed"
        ).collect()
        assert [r["doc_name"] for r in lost] == ["MCO P1080.40C"]


class TestRendererFetcher:
    def test_retry_until_condition(self, spark):
        """S4 policy shape (downloader_middlewares.py:157-177): the renderer
        retries while wait_until is false, then succeeds; rows whose
        condition never holds come back as failures."""
        from gc_spark.sources.fetch import RendererFetcher, split_fetch_results

        calls: dict[str, int] = {}

        def fake_render(url):
            n = calls.get(url, 0) + 1
            calls[url] = n
            if "flaky" in url:
                # JS table renders only on the 3rd attempt
                body = "<table>loaded</table>" if n >= 3 else "<spinner/>"
            elif "dead" in url:
                body = "<spinner/>"  # never loads
            else:
                body = "<table>loaded</table>"
            return {"status": 200, "body": body, "current_url": url}

        fetcher = RendererFetcher(
            render_fn=fake_render,
            wait_until=lambda body: "loaded" in body,
            retries=4,
            retry_wait_s=0.0,
        )
        batch = spark.createDataFrame(
            [
                ("https://js.example.mil/ok", 1),
                ("https://js.example.mil/flaky", 2),
                ("https://js.example.mil/dead", 3),
            ],
            "url string, url_hash64 long",
        ).coalesce(1)
        out = fetcher.fetch(batch)
        ok, failed = split_fetch_results(out)
        assert {r["url"].rsplit("/", 1)[1] for r in ok.collect()} == {"ok", "flaky"}
        assert [r["url"].rsplit("/", 1)[1] for r in failed.collect()] == ["dead"]

    def test_real_renderer_requires_selenium(self, spark):
        """Without an injected render_fn the real path needs selenium —
        absent in this container, so it must raise NotImplementedError."""
        import pytest as _pytest

        from gc_spark.sources.fetch import RendererFetcher

        batch = spark.createDataFrame([("https://x",)], "url string")
        with _pytest.raises(NotImplementedError):
            RendererFetcher().fetch(batch)


class TestNotifier:
    def test_run_report_via_notifier(self, spark, tmp_path):
        """S13: the engine posts a formatted crawl report to the injected
        notifier at end of run; the webhook transport prints instead of
        sending when disabled (slack.py:30-31 parity)."""
        from gc_spark.plans.notify import LogNotifier, WebhookNotifier, format_crawl_report
        from tests.fixtures import json_api_pages, json_api_seeds

        notifier = LogNotifier()
        store = SnapshotStore(spark, str(tmp_path / "ntf"))
        eng = CrawlEngine(
            spark, store, TableFetcher(json_api_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=4),
            notifier=notifier,
        )
        eng.bootstrap(json_api_seeds(spark))
        stats = eng.run(max_batches=10)
        assert len(notifier.messages) == 1
        msg = notifier.messages[0]
        assert msg.splitlines()[0] == "crawl report"
        assert len(msg.splitlines()) == len(stats) + 1
        assert "scheduled 1" in msg.splitlines()[1]

        wh = WebhookNotifier()  # disabled: must never open a socket
        wh.notify(format_crawl_report(stats))
        assert wh.sent == []


def _strip_wrapper(url, status, body):
    """module-level so Spark can pickle it into the Arrow batches"""
    return body.replace("<wrapper>", "").replace("</wrapper>", "")


class TestResponseHandler:
    def test_response_transform_hook(self, spark):
        """download_response_handler override point (GCSpider.py:100-102):
        a per-fetcher pure fn rewrites the body before emission."""
        from http.server import ThreadingHTTPServer

        pages = {"/w": (200, "<wrapper><h1>x</h1></wrapper>")}
        srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler.make(pages))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{srv.server_address[1]}"
            batch = spark.createDataFrame([(f"{base}/w", "s", 0, 0)],
                                          ["url", "source", "depth", "seq"])
            out = HttpFetcher(delay_ms=1, timeout_s=2.0,
                              response_handler=_strip_wrapper).fetch(batch).first()
            assert out["body"] == "<h1>x</h1>"
        finally:
            srv.shutdown()


class TestNativeExtractorParity:
    """A source earns the native-expression parse path only if it matches
    the pandas path on the same pages, field for field."""

    def test_synthetic_native_equals_pandas(self, spark):
        import json

        from pyspark.sql import functions as F

        from gc_spark.extractors.base import EXTRACTED_SCHEMA
        from gc_spark.extractors.synthetic import SyntheticExtractor, _native_synthetic
        from tests.fixtures import scale_site_pages

        pages = scale_site_pages(spark, num_hosts=2, docs_host0=8).select(
            "url",
            F.lit("synthetic").alias("source"),
            F.lit(0).alias("depth"),
            F.monotonically_increasing_id().alias("seq"),
            "body",
            "kind",
        )
        native = {
            r["url"]: (list(r["links"]), [json.loads(d) for d in r["docs"]])
            for r in _native_synthetic(pages).collect()
        }
        ex = SyntheticExtractor()
        for r in pages.collect():
            links, docs = ex.extract(r["url"], r["body"], r["kind"])
            n_links, n_docs = native[r["url"]]
            assert n_links == links, r["url"]
            assert len(n_docs) == len(docs)
            for nd, pdoc in zip(n_docs, docs):
                # to_json drops null fields; compare on the pandas twin's
                # non-null keys plus require no extra non-null fields
                pd_nn = {k: v for k, v in pdoc.items() if v not in (None, [])}
                nd_nn = {k: v for k, v in nd.items() if v not in (None, [])}
                pd_nn.pop("downloadable_items", None)
                nd_nn.pop("downloadable_items", None)
                # segments arrive as list[dict] on both sides
                assert nd_nn == pd_nn, r["url"]

    def test_run_extractors_routes_native(self, spark):
        """run_extractors must produce one output row per input row with the
        native source handled JVM-side (no rows lost or duplicated when
        native and pandas paths are unioned)."""
        from pyspark.sql import functions as F

        from gc_spark.extractors.base import run_extractors
        from tests.fixtures import scale_site_pages

        pages = scale_site_pages(spark, num_hosts=2, docs_host0=6).select(
            "url",
            F.lit("synthetic").alias("source"),
            F.lit(0).alias("depth"),
            F.monotonically_increasing_id().alias("seq"),
            "body",
            F.col("kind"),
            F.lit(200).alias("status"),
        )
        out = run_extractors(pages)
        assert out.count() == pages.count()
        assert out.select("url").distinct().count() == pages.count()


class TestBucketedTables:
    def test_bucketed_join_no_exchange(self, spark, tmp_path):
        """Two tables bucketed on the same key join with ZERO Exchange in
        the physical plan — the layout the per-batch seen-set anti-join
        relies on at frontier scale. (A per-task in-bucket Sort remains:
        Spark 3+ only trusts bucket sort metadata with one file per
        bucket + the legacy outputOrdering flag — memory-local and cheap
        next to the network shuffle that's eliminated.)"""
        from pyspark.sql import functions as F

        from gc_spark.sources.bucketed import read_bucketed, write_bucketed

        seen = spark.range(10000).select(
            F.xxhash64("id").alias("url_hash64"), F.col("id").alias("first_batch")
        )
        frontier = spark.range(5000, 15000).select(
            F.xxhash64("id").alias("url_hash64"), F.col("id").alias("prio")
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            write_bucketed(
                seen, "t_seen", str(tmp_path / "seen"), ["url_hash64"], 8
            )
            write_bucketed(
                frontier, "t_frontier", str(tmp_path / "frontier"), ["url_hash64"], 8
            )
            a = read_bucketed(spark, "t_seen")
            b = read_bucketed(spark, "t_frontier")
            joined = b.join(a, "url_hash64", "left_anti")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert "SortMergeJoin" in plan
            assert "Bucketed: true" in plan
            assert joined.count() == 5000  # ids 10000..14999 unseen
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS t_seen")
            spark.sql("DROP TABLE IF EXISTS t_frontier")
