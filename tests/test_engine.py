"""End-to-end engine tests (SURVEY.md §5 strategy):

(a) golden parity — the engine's seen-set over the synthetic us_code site
    equals the reference's committed 63-record manifest exactly,
(b) crawl-order equality vs the sequential reference simulator under the
    same seed list + politeness budget,
(c) URL-seen-set + span-sequence equality on a skewed multi-host site,
(d) resume-from-snapshot equals an uninterrupted run,
(e) politeness budget never exceeded per host per batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gc_spark import schema as S
from gc_spark.plans.drain import CrawlEngine, EngineConfig, _done_schema
from gc_spark.sources.fetch import TableFetcher
from gc_spark.sources.tables import SnapshotStore

from tests.fixtures import (
    load_us_code_site,
    scale_site_pages,
    scale_site_rows,
    scale_site_seeds,
    us_code_pages,
    us_code_seeds,
)
from tests.simulator import simulate


def _mk_engine(spark, tmpdir, pages, budget=10, **cfg_kw):
    store = SnapshotStore(spark, str(tmpdir))
    cfg = EngineConfig(budget_per_host=budget, fetch_partitions=8, **cfg_kw)
    return CrawlEngine(spark, store, TableFetcher(pages), config=cfg), store


@pytest.fixture(scope="module")
def us_code_run(spark, tmp_path_factory):
    eng, store = _mk_engine(
        spark, tmp_path_factory.mktemp("uscode"), us_code_pages(spark, include_dead_row=True)
    )
    eng.bootstrap(us_code_seeds(spark))
    stats = eng.run(max_batches=5)
    return store, stats


class TestUSCodeGoldenParity:
    def test_seen_set_equals_reference_manifest(self, spark, us_code_run):
        store, _ = us_code_run
        got = {
            (r["doc_name"], r["version_hash"])
            for r in store.read("seen", S.SEEN).collect()
        }
        exp = {(n, h) for n, h in load_us_code_site()["expected"]}
        assert got == exp  # 63 records incl. the 6 Title-42 zip children

    def test_single_batch_drain(self, us_code_run):
        _, stats = us_code_run
        assert len(stats) == 1 and stats[0]["scheduled"] == 1

    def test_dead_letter(self, spark, us_code_run):
        store, _ = us_code_run
        dead = store.read("dead_letter", S.DEAD_LETTER).collect()
        assert len(dead) == 1
        assert "404" in dead[0]["failure_reason"]
        assert "usc99" in dead[0]["url"]

    def test_documents_span_shape(self, spark, us_code_run):
        store, _ = us_code_run
        docs = store.read("documents", S.DOCUMENTS)
        assert docs.count() == 63
        bad = docs.filter(
            (F.size("spans") != 2)
            | (F.col("spans")[0]["kind"] != "text")
            | (F.col("spans")[1]["kind"] != "media")
            | ~F.col("spans")[1]["media_ref"].rlike(r"^blob://sha256/[0-9a-f]{64}\.pdf$")
        ).count()
        assert bad == 0

    def test_feed_22_fields(self, spark, us_code_run):
        """The crawl feed carries the full 22-field DocItem record
        (output_spec.json:29-52), including the failed-download item."""
        store, _ = us_code_run
        feed = store.read("feed", S.DOC_ITEMS)
        assert set(feed.columns) == {f.name for f in S.DOC_ITEMS.fields}
        assert feed.count() == 64  # 63 golden + 1 dead-download item
        required_nulls = feed.filter(
            F.col("doc_name").isNull()
            | F.col("crawler_used").isNull()
            | F.col("version_hash").isNull()
            | F.col("source_page_url").isNull()
            | F.col("access_timestamp").isNull()
        ).count()
        assert required_nulls == 0
        # spot-check derived fields
        row = feed.filter(F.col("doc_name") == "Title 1 - General Provisions").first()
        assert row["display_title"] == "Title 1: General Provisions"
        assert row["file_ext"] == "zip"
        assert row["source_fqdn"] == "uscode.house.gov"

    def test_prev_manifest_filtering(self, spark, tmp_path_factory):
        """Second crawl with the first run's manifest: everything filtered,
        nothing re-downloaded (pipelines.py:125-129)."""
        site = load_us_code_site()
        prev = spark.createDataFrame(
            [
                {
                    "version_hash": h,
                    "doc_name": n,
                    "crawler_used": "us_code",
                    "access_timestamp": "2022-05-20 17:45:56",
                }
                for n, h in site["expected"]
            ]
        )
        eng, store = _mk_engine(
            spark, tmp_path_factory.mktemp("uscode2"), us_code_pages(spark)
        )
        eng.bootstrap(us_code_seeds(spark), prev_manifest=prev)
        stats = eng.run(max_batches=5)
        # zip children were in prev manifest but the PARENT hash was not —
        # parent re-downloads (its hash never entered the manifest; matches
        # reference: parent hash is not in manifest either)
        seen_new = (
            store.read("seen", S.SEEN)
            .filter(F.col("access_timestamp") != "2022-05-20 17:45:56")
            .collect()
        )
        new_names = {r["doc_name"] for r in seen_new}
        assert all("Title 42" in n for n in new_names)
        assert stats[0]["in_previous_hashes"] == 57  # all non-T42 parents skipped


class TestScaleSiteSimulatorEquality:
    BUDGET = 3

    @pytest.fixture(scope="class")
    def runs(self, spark, tmp_path_factory):
        eng, store = _mk_engine(
            spark, tmp_path_factory.mktemp("scale"), scale_site_pages(spark), budget=self.BUDGET
        )
        eng.bootstrap(scale_site_seeds(spark))
        stats = eng.run(max_batches=30)

        pages_dict = {r["url"]: r for r in scale_site_rows()}
        seeds = [
            {
                "source": "synthetic",
                "url": f"https://host{h:02d}.example.mil/list/0",
                "host": f"host{h:02d}.example.mil",
            }
            for h in range(5)
        ]
        sim = simulate(seeds, pages_dict, budget_per_host=self.BUDGET)
        return store, stats, sim

    def test_crawl_order_equality(self, runs):
        store, _, sim = runs
        # full fetch history = live done-markers ∪ compaction-archived rows
        done = store.read("frontier_done", _done_schema()).unionByName(
            store.read("fetch_log", _done_schema())
        )
        eng_map = {r["url"]: r["batch"] for r in done.collect()}
        assert eng_map == sim.fetch_batch

    def test_seen_set_equality(self, runs):
        store, _, sim = runs
        eng_seen = {
            (r["doc_name"], r["version_hash"]) for r in store.read("seen", S.SEEN).collect()
        }
        assert eng_seen == sim.seen

    def test_span_sequence_equality(self, runs):
        store, _, sim = runs
        eng_spans = {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
            for r in store.read("documents", S.DOCUMENTS).collect()
        }
        assert eng_spans == sim.spans

    def test_span_fingerprint_equality(self, runs):
        """Same invariant as test_span_sequence_equality, but compared the
        way a 10^10-doc run would: one span_sequence_fingerprint sha per doc
        (operators/spans.py) vs the simulator's python-twin encoding —
        never exploding/collecting full span payloads."""
        import hashlib

        from gc_spark.operators.spans import span_sequence_fingerprint

        store, _, sim = runs
        eng = {
            r["doc_id"]: (r["n_spans"], r["span_seq_sha"])
            for r in span_sequence_fingerprint(
                store.read("documents", S.DOCUMENTS)
            ).collect()
        }
        exp = {}
        for doc_id, spans in sim.spans.items():
            lines = []
            for kind, text, media_ref, _off in sorted(spans, key=lambda s: s[3]):
                t, m = text or "", media_ref or ""
                lines.append(f"{kind}|{len(t)}|{t}|{len(m)}|{m}")
            exp[doc_id] = (
                len(spans),
                hashlib.sha256("\n".join(lines).encode()).hexdigest(),
            )
        assert eng == exp

    def test_politeness_budget_never_exceeded(self, runs):
        store, _, _ = runs
        done = store.read("frontier_done", _done_schema()).unionByName(
            store.read("fetch_log", _done_schema())
        )
        over = (
            done.groupBy("host", "batch")
            .count()
            .filter(F.col("count") > self.BUDGET)
            .count()
        )
        assert over == 0

    def test_interleaved_spans_strictly_ordered(self, runs):
        store, _, _ = runs
        docs = store.read("documents", S.DOCUMENTS)
        bad = docs.filter(
            F.exists(
                F.transform(F.col("spans"), lambda s, i: s["offset"] == i),
                lambda ok: ~ok,
            )
        ).count()
        assert bad == 0


class TestResume:
    def test_resume_equals_uninterrupted(self, spark, tmp_path):
        pages = scale_site_pages(spark, num_hosts=3, docs_host0=12)
        seeds = scale_site_seeds(spark, num_hosts=3)

        eng_a, store_a = _mk_engine(spark, tmp_path / "a", pages, budget=4)
        eng_a.bootstrap(seeds)
        eng_a.run(max_batches=30)

        eng_b, store_b = _mk_engine(spark, tmp_path / "b", pages, budget=4)
        eng_b.bootstrap(seeds)
        eng_b.run(max_batches=2)  # "crash" after batch 2 (snapshot committed)
        # brand-new engine instance resumes from the snapshot store
        eng_b2, _ = CrawlEngine(
            spark,
            store_b,
            TableFetcher(pages),
            config=EngineConfig(budget_per_host=4, fetch_partitions=8),
        ), None
        eng_b2.store = store_b
        eng_b2.run(max_batches=30)

        for table, schema, key in [
            ("frontier_done", _done_schema(), ["url_hash64"]),
            ("seen", S.SEEN, ["version_hash"]),
            ("documents", S.DOCUMENTS, ["doc_id"]),
        ]:
            a = sorted(store_a.read(table, schema).collect(), key=lambda r: str(r))
            b = sorted(store_b.read(table, schema).collect(), key=lambda r: str(r))
            assert a == b, f"{table} diverged after resume"

    def test_compaction_preserves_results(self, spark, tmp_path):
        """Compacting the frontier every 2 batches must not change seen-set,
        documents, or the union of fetch history."""
        pages = scale_site_pages(spark, num_hosts=3, docs_host0=12)
        seeds = scale_site_seeds(spark, num_hosts=3)

        eng_a, store_a = _mk_engine(spark, tmp_path / "nc", pages, budget=4)
        eng_a.bootstrap(seeds)
        eng_a.run(max_batches=30)

        eng_c, store_c = _mk_engine(spark, tmp_path / "cc", pages, budget=4, compact_every=2)
        eng_c.bootstrap(seeds)
        eng_c.run(max_batches=30)

        for table, schema in [("seen", S.SEEN), ("documents", S.DOCUMENTS)]:
            a = sorted(store_a.read(table, schema).collect(), key=lambda r: str(r))
            c = sorted(store_c.read(table, schema).collect(), key=lambda r: str(r))
            assert a == c, f"{table} diverged under compaction"

        hist_a = {
            (r["url"], r["batch"]) for r in store_a.read("frontier_done", _done_schema()).collect()
        }
        done_c = store_c.read("frontier_done", _done_schema())
        log_c = store_c.read("fetch_log", _done_schema())
        hist_c = {(r["url"], r["batch"]) for r in done_c.unionByName(log_c).collect()}
        assert hist_a == hist_c
        # and the frontier actually got smaller than the uncompacted one
        assert store_c.read("frontier", S.FRONTIER).count() <= store_a.read(
            "frontier", S.FRONTIER
        ).count()

    def test_rollback(self, spark, tmp_path):
        pages = scale_site_pages(spark, num_hosts=3, docs_host0=12)
        eng, store = _mk_engine(spark, tmp_path / "rb", pages, budget=4)
        eng.bootstrap(scale_site_seeds(spark, num_hosts=3))
        eng.run(max_batches=3)
        n3 = store.read("frontier_done", _done_schema()).count()
        store.rollback_to(2)
        n2 = store.read("frontier_done", _done_schema()).count()
        assert n2 < n3
        assert store.latest_batch() == 2


class TestCompactionCycles:
    def test_cyclic_links_terminate_once_each(self, spark, tmp_path):
        """Pages link BACK to earlier pages (nav/home cycles) and compaction
        runs every batch. URL dedup must anti-join frontier ∪ fetch_log, so
        archived rows still block rediscovery: the crawl terminates with
        every URL fetched exactly once and max_seq stays monotonic."""
        from gc_spark.schema import PAGES, SEEDS

        host = "cyc.example.mil"
        n = 6
        rows = []
        for p in range(n):
            nxt = (p + 1) % n  # last page closes the cycle back to page 0
            body = (
                f'<a href="/list/{nxt}">next</a><a href="/list/0">home</a>'
                f'<li><a href="/doc/{p}">d</a></li>'
            )
            rows.append(
                {"url": f"https://{host}/list/{p}", "status": 200, "body": body,
                 "links": None, "kind": "listing", "media_sha": None, "zip_entries": None}
            )
            rows.append(
                {"url": f"https://{host}/doc/{p}", "status": 200,
                 "body": f"<h1>{host}-doc-{p}</h1>"
                         f'<span class="date">2022-03-01</span><p>text {p}</p>',
                 "links": None, "kind": "detail", "media_sha": None, "zip_entries": None}
            )
        pages = spark.createDataFrame(rows, schema=PAGES)
        seeds = spark.createDataFrame(
            [{"source": "synthetic", "url": f"https://{host}/list/0", "host": host}],
            schema=SEEDS,
        )
        eng, store = _mk_engine(spark, tmp_path / "cyc", pages, budget=2, compact_every=1)
        eng.bootstrap(seeds)
        stats = eng.run(max_batches=40)
        assert len(stats) < 40, "cyclic site did not terminate"
        done = store.read("frontier_done", _done_schema())
        log = store.read("fetch_log", _done_schema())
        hist = [r["url"] for r in done.unionByName(log).collect()]
        assert len(hist) == len(set(hist)) == 2 * n  # each URL exactly once
        # global seq uniqueness survived compaction (meta-carried max_seq)
        assert store.latest_meta()["max_seq"] == 2 * n - 1


class TestSingleNetworkPass:
    def test_fetch_executes_once_per_url(self, spark, tmp_path):
        """The failed-path anti-join must read the PERSISTED fetch result,
        never re-run the fetch: count actual fetch-row executions with an
        accumulator and require exactly one per crawled page."""
        from gc_spark.sources.fetch import Fetcher

        class AccumFetcher(Fetcher):
            def __init__(self, sc, pages):
                self.acc = sc.accumulator(0)
                self.table = TableFetcher(pages)

            def fetch(self, batch):
                acc = self.acc
                joined = self.table.fetch(batch)

                def _count(parts):
                    for pdf in parts:
                        acc.add(len(pdf))
                        yield pdf

                return joined.mapInPandas(_count, schema=joined.schema)

        rows = scale_site_rows(num_hosts=3, docs_host0=12)
        pages = scale_site_pages(spark, num_hosts=3, docs_host0=12)
        fetcher = AccumFetcher(spark.sparkContext, pages)
        store = SnapshotStore(spark, str(tmp_path / "single"))
        eng = CrawlEngine(
            spark, store, fetcher,
            config=EngineConfig(budget_per_host=4, fetch_partitions=8),
        )
        eng.bootstrap(scale_site_seeds(spark, num_hosts=3))
        eng.run(max_batches=30)
        crawled = store.read("frontier_done", _done_schema()).count() + store.read(
            "fetch_log", _done_schema()
        ).count()
        assert crawled == len(rows)  # every page visited
        assert fetcher.acc.value == len(rows)  # and fetched exactly once
