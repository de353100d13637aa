"""CrawlEngine — the micro-batch frontier drain loop (SURVEY.md §3.4).

Replaces the reference's sequential Scrapy reactor (cli.py:211-236) with a
driver loop over DataFrame stages; the only driver-side state is the batch
counter and the snapshot store handle. Each batch:

  pending = frontier ⟕anti frontier_done           (merge-on-read state)
  take    = top-k per host in (priority, depth, seq) order   (politeness)
  fetched = fetcher.fetch(salted take)             (injectable; no network in CI)
  links   → canonicalize → valid/mailto/scope filters → hash → bloom+exact
            dedup vs frontier → append (depth+1, deterministic seq)
  docs    → fix names → in-run dedup → enrich → validate(+dead_letter)
            → anti-join seen (version_hash, crawler-scoped)
            → CAC split → first-supported item → download fetch
            → zip-explode → span assembly → append documents/seen
  metrics + lineage appended; snapshot committed (atomic) → resumable.

Determinism: no wall clock (pinned batch_ts), no Python dict order reliance,
seq assigned by total-sort rank — reruns and resumed runs produce identical
tables (tested: kill-at-batch-k resume equality).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gc_spark import schema as S
from gc_spark.extractors.base import DOC_JSON_SCHEMA, run_extractors
from gc_spark.functions.hashing import url_hash64, version_hash_udf
from gc_spark.functions.urls import (
    canonicalize_url_udf,
    fqdn_col,
    is_mailto_col,
    is_valid_web_url_udf,
)
from gc_spark.operators.bloom import build_bloom, merge_blooms, BLOOM_SCHEMA
from gc_spark.operators.dedup import anti_join_seen, frontier_url_dedup, in_run_dedup
from gc_spark.operators.explode import assemble_spans, explode_zip_items
from gc_spark.operators.pending import (
    PENDING_COLS,
    PENDING_DOCS,
    PENDING_DONE,
    resolve_pending,
)
from gc_spark.operators.politeness import salted_repartition, topk_per_host
from gc_spark.operators.sequence import with_dense_seq
from gc_spark.sources.fetch import Fetcher, split_fetch_results
from gc_spark.sources.tables import SnapshotStore


@dataclass
class EngineConfig:
    budget_per_host: int = 10  # reference CONCURRENT_REQUESTS, runspider_settings.py:25
    num_buckets: int = 32
    salt_buckets: int = 16
    bloom_fpp: float = 0.01
    bloom_expected_per_bucket: int = 100_000
    use_bloom: bool = True
    batch_ts: str = "2024-01-01T00:00:00"  # pinned (determinism) vs pipelines.py:354 now()
    max_depth: int = 32
    fetch_partitions: int = 32
    # fold frontier+done segments into a compacted pending-only frontier
    # every N batches (merge-on-read maintenance; 0 = never). Safe to leave
    # on: URL dedup anti-joins frontier ∪ fetch_log, so archived rows still
    # block rediscovery, and max_seq is snapshot metadata (never recomputed
    # from the shrunken frontier).
    compact_every: int = 8
    # False skips driver-side counts that exist only for the returned stats
    # dict (the metrics TABLE is unaffected) - fewer jobs per batch
    collect_stats: bool = True
    # a pending doc whose detail page never yields a download href (fetch
    # failed, extractor found nothing) would otherwise stay open FOREVER and
    # the document silently vanish: after this many batches it is routed to
    # dead_letter and closed. 0 = never expire (round-2 behavior).
    pending_max_age_batches: int = 8


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        fetcher: Fetcher,
        download_fetcher: Fetcher | None = None,
        config: EngineConfig | None = None,
        host_budgets: DataFrame | None = None,
        robots: DataFrame | None = None,
        scope: DataFrame | None = None,
        notifier=None,
    ):
        from gc_spark.conf import tune_runtime

        tune_runtime(spark)  # r6 join/AQE tuning (idempotent per session)
        self.spark = spark
        self.store = store
        self.fetcher = fetcher
        self.download_fetcher = download_fetcher or fetcher
        self.cfg = config or EngineConfig()
        self.host_budgets = host_budgets
        self.robots = robots
        # F7 allowed_domains offsite rule: small (source, allowed_domains)
        # config, broadcast-joined onto discovered links
        self.scope = scope
        # per-source display defaults for the 22-field feed (J3); optional
        self.source_config: DataFrame | None = None
        # S13: pluggable end-of-run notification sink (plans/notify.py)
        self.notifier = notifier

    # ------------------------------------------------------------------ util

    def _frontier_cols(self, df: DataFrame, depth, batch: int, state: str = "pending") -> DataFrame:
        # priority queue: lower drains first (north_rule); rows may carry an
        # explicit priority (seeds or extractor), default 0
        priority = (
            F.coalesce(F.col("priority"), F.lit(0)) if "priority" in df.columns else F.lit(0)
        )
        return df.select(
            "url",
            "canonical_url",
            "url_hash64",
            "host",
            "host_hash",
            "source",
            priority.cast("int").alias("priority"),
            F.lit(depth).cast("int").alias("depth") if isinstance(depth, int) else depth.cast("int").alias("depth"),
            F.lit(batch).alias("discovered_at_batch"),
            "seq",
            F.lit(state).alias("state"),
        )

    # ------------------------------------------------------------- bootstrap

    def bootstrap(self, seeds: DataFrame, prev_manifest: DataFrame | None = None) -> None:
        """Batch 0: seeds → frontier; previous manifest → seen (+ bloom)."""
        cfg = self.cfg
        canon = (
            seeds.withColumn("canonical_url", canonicalize_url_udf("url"))
            .withColumn("url_hash64", url_hash64(F.col("canonical_url")))
            .withColumn("host_hash", F.pmod(F.xxhash64("host"), F.lit(cfg.num_buckets)).cast("int"))
        )
        _boot_persists: list = []
        seeded = with_dense_seq(
            canon, ["source", "canonical_url"], offset=0, track=_boot_persists
        )
        frontier0 = self._frontier_cols(seeded, 0, 0)

        txn = self.store.begin(0)
        txn.replace("frontier", frontier0)
        max_seq0 = frontier0.agg(F.max("seq")).first()[0]
        txn.set_meta("max_seq", int(max_seq0) if max_seq0 is not None else -1)
        if prev_manifest is not None:
            seen0 = prev_manifest.select(
                "version_hash",
                "doc_name",
                "crawler_used",
                "access_timestamp",
                F.lit(None).cast("long").alias("url_hash64"),
            )
            txn.append("seen", seen0)
            if cfg.use_bloom:
                txn.replace("bloom_seen", self._seen_bloom(seen0))
        if cfg.use_bloom:
            bloom0 = build_bloom(
                frontier0.select("url_hash64"),
                num_buckets=cfg.num_buckets,
                expected_per_bucket=cfg.bloom_expected_per_bucket,
                fpp=cfg.bloom_fpp,
            )
            txn.replace("bloom_frontier", bloom0)
        txn.commit()
        for df in _boot_persists:
            df.unpersist()

    def _seen_bloom(self, seen_rows: DataFrame) -> DataFrame:
        """Bloom over xxhash64(version_hash) — the prefilter for the seen-set
        anti-join (same shape as the frontier URL bloom)."""
        cfg = self.cfg
        return build_bloom(
            seen_rows.select(F.xxhash64("version_hash").alias("url_hash64")),
            num_buckets=cfg.num_buckets,
            expected_per_bucket=cfg.bloom_expected_per_bucket,
            fpp=cfg.bloom_fpp,
        )

    # ------------------------------------------------------------------ loop

    def run(self, max_batches: int = 100) -> list[dict]:
        stats = []
        start = (self.store.latest_batch() or 0) + 1
        for b in range(start, start + max_batches):
            st = self.drain_one(b)
            if st is None:
                break
            stats.append(st)
            if self.cfg.compact_every and b % self.cfg.compact_every == 0:
                self.compact_frontier(b)
        if self.notifier is not None:
            from gc_spark.plans.notify import format_crawl_report

            self.notifier.notify(format_crawl_report(stats))
        return stats

    def compact_frontier(self, after_batch: int) -> None:
        """Merge-on-read maintenance (Iceberg compaction analog): rewrite the
        frontier as pending-only in one segment; archive drained-history rows
        to `fetch_log` (crawl-order provenance keeps accumulating there) and
        reset frontier_done so future pending scans stay small. Crawl
        semantics and batch numbering unchanged ('c'-suffixed snapshot)."""
        frontier = self.store.read("frontier", S.FRONTIER)
        done = self.store.read("frontier_done", _done_schema())
        pending = frontier.join(done.select("url_hash64"), "url_hash64", "left_anti")
        txn = self.store.begin(after_batch, suffix="c")
        txn.replace("frontier", pending)
        txn.append("fetch_log", done)
        txn.replace("frontier_done", done.limit(0))
        # fold completed pendings out of pending_docs and truncate the
        # done-marker table — both anti-join sides stay bounded by OPEN
        # pendings instead of growing with crawl history
        if self.store.segment_count("pending_docs"):
            open_pending = self.store.read("pending_docs", PENDING_DOCS).join(
                self.store.read("pending_done", PENDING_DONE).select("detail_url_hash64"),
                "detail_url_hash64",
                "left_anti",
            )
            txn.replace("pending_docs", open_pending)
            txn.replace(
                "pending_done",
                self.store.read("pending_done", PENDING_DONE).limit(0),
            )
        txn.commit()

    def _flush_dead_pendings(self, batch: int) -> None:
        """End-of-crawl pending flush: when the frontier drains empty, any
        OPEN pending whose detail URL was already fetched can never complete
        (the hop happened and produced no record — non-2xx detail page or an
        extractor that found no href) — without this it would stay open
        forever and the document silently vanish. Route those to dead_letter
        and close them. Pendings whose detail URL was never discovered stay
        open (a resumed crawl with new seeds could still reach them)."""
        store = self.store
        if not store.segment_count("pending_docs"):
            return
        open_pending = store.read("pending_docs", PENDING_DOCS).join(
            store.read("pending_done", PENDING_DONE).select("detail_url_hash64"),
            "detail_url_hash64",
            "left_anti",
        )
        hist = fetch_history(store).select(
            F.col("url_hash64").alias("detail_url_hash64")
        )
        lost = open_pending.join(hist, "detail_url_hash64", "left_semi").persist()
        if lost.count():
            txn = store.begin(batch, suffix="p")
            txn.append(
                "dead_letter",
                lost.select(
                    F.col("detail_url").alias("url"),
                    "doc_name",
                    "source",
                    F.lit("Pending detail page never completed").alias(
                        "failure_reason"
                    ),
                    F.lit(batch).alias("batch"),
                ),
            )
            txn.append(
                "pending_done",
                lost.select("detail_url_hash64")
                .distinct()
                .withColumn("batch", F.lit(batch)),
            )
            txn.commit()
        lost.unpersist()

    # ------------------------------------------------------------- one batch

    def drain_one(self, batch: int) -> dict | None:
        cfg = self.cfg
        store = self.store
        _seq_persists: list = []  # frames persisted by with_dense_seq, freed at batch end

        frontier = store.read("frontier", S.FRONTIER)
        done = store.read("frontier_done", _done_schema())
        pending = frontier.join(done.select("url_hash64"), "url_hash64", "left_anti").filter(
            F.col("depth") <= cfg.max_depth
        )

        take = topk_per_host(
            pending, cfg.budget_per_host, host_budgets=self.host_budgets, salt_buckets=cfg.salt_buckets
        ).drop("drain_rank")
        take = take.persist()
        n_take = take.count()
        if n_take == 0:
            take.unpersist()
            self._flush_dead_pendings(batch)
            return None

        # ---- fetch (salted to spread hot hosts) ---------------------------
        # persist BEFORE the ok/failed split: `failed` anti-joins `ok`, and
        # without a materialized fetch result that recomputes the fetch —
        # with a real HTTP fetcher every batch would re-GET its URLs
        fetched = self.fetcher.fetch(
            salted_repartition(take, cfg.fetch_partitions, cfg.salt_buckets)
        ).persist()
        ok, failed = split_fetch_results(fetched)

        extracted = run_extractors(ok).persist()

        # ---- new frontier links ------------------------------------------
        # max_seq rides in snapshot metadata (monotonic across compactions);
        # the aggregate fallback covers stores bootstrapped by older writers
        max_seq = store.latest_meta().get("max_seq")
        if max_seq is None:
            max_seq = frontier.agg(F.max("seq")).first()[0] or 0
        links = (
            extracted.select(
                F.col("source"),
                F.col("depth").alias("parent_depth"),
                F.col("seq").alias("parent_seq"),
                F.posexplode_outer("links").alias("idx", "href"),
            )
            .filter(F.col("href").isNotNull())
            .filter(~is_mailto_col(F.col("href")))
            .withColumn("url", F.col("href"))
            .filter(is_valid_web_url_udf("url"))
            .withColumn("canonical_url", canonicalize_url_udf("url"))
            .withColumn("url_hash64", url_hash64(F.col("canonical_url")))
            .withColumn("host", fqdn_col(F.col("url")))
            .withColumn("host_hash", F.pmod(F.xxhash64("host"), F.lit(cfg.num_buckets)).cast("int"))
        )
        if self.scope is not None:
            from gc_spark.functions.urls import in_allowed_domains_col

            sc = F.broadcast(
                self.scope.select(
                    F.col("source").alias("_s"), F.col("allowed_domains").alias("_ad")
                )
            )
            links = (
                links.join(sc, links["source"] == F.col("_s"), "left")
                .filter(in_allowed_domains_col(F.col("host"), F.col("_ad")))
                .drop("_s", "_ad")
            )
        if self.robots is not None:
            links = _apply_robots(links, self.robots)

        bloom = (
            store.read("bloom_frontier", BLOOM_SCHEMA) if cfg.use_bloom else None
        )
        # dedup against everything EVER discovered: the live frontier PLUS
        # rows compaction archived to fetch_log — without the union, a link
        # back to an already-fetched URL re-enters after compaction and a
        # cyclic site crawls forever
        ever_discovered = frontier.select("url_hash64")
        if store.segment_count("fetch_log"):
            ever_discovered = ever_discovered.unionByName(
                store.read("fetch_log", _done_schema()).select("url_hash64")
            )
        deduped = frontier_url_dedup(
            links,
            ever_discovered,
            order_cols=("parent_seq", "idx"),
            bloom=bloom,
            num_buckets=cfg.num_buckets,
        )
        new_seq = with_dense_seq(
            deduped.select(
                "url", "canonical_url", "url_hash64", "host", "host_hash", "source",
                "parent_depth", "parent_seq", "idx",
            ),
            ["parent_seq", "idx"],
            offset=int(max_seq) + 1,
            track=_seq_persists,
        )
        new_frontier = self._frontier_cols(
            new_seq, F.col("parent_depth") + 1, batch
        )
        new_frontier = new_frontier.persist()
        n_new_links = new_frontier.count()
        n_links_raw = links.count() if cfg.collect_stats else -1

        # ---- docs ---------------------------------------------------------
        parsed = (
            extracted.select(
                "source",
                F.col("url").alias("source_page_url_page"),
                F.col("seq").alias("parent_seq"),
                F.posexplode_outer("docs").alias("doc_idx", "doc_json"),
            )
            .filter(F.col("doc_json").isNotNull())
            .withColumn("doc", F.from_json("doc_json", DOC_JSON_SCHEMA))
            .select(
                "source",
                "parent_seq",
                "doc_idx",
                F.col("doc.doc_name").alias("doc_name"),
                F.col("doc.doc_title").alias("doc_title"),
                F.col("doc.doc_num").alias("doc_num"),
                F.col("doc.doc_type").alias("doc_type"),
                F.col("doc.display_doc_type").alias("display_doc_type"),
                F.col("doc.publication_date").alias("publication_date"),
                (F.col("doc.cac_login_required") == "true").alias("cac_login_required"),
                F.col("doc.download_url").alias("download_url"),
                F.col("doc.downloadable_items").alias("downloadable_items"),
                F.col("doc.version_hash_raw_data").alias("version_hash_raw_data"),
                F.col("doc.segments").alias("segments"),
                # per-doc overrides (base.py DOC_JSON_SCHEMA tail): a doc may
                # pin its own source_page_url (SORN rows), display_title,
                # file_ext, or is_revoked; engine derivations fill the rest
                F.coalesce(F.col("doc.source_page_url"), F.col("source_page_url_page")).alias(
                    "source_page_url"
                ),
                F.col("doc.display_title").alias("display_title"),
                F.col("doc.file_ext").alias("file_ext"),
                F.when(F.col("doc.is_revoked").isNotNull(), F.col("doc.is_revoked") == "true")
                .alias("is_revoked"),
                F.col("doc.detail_url").alias("detail_url"),
                F.col("doc.pending_hash_key").alias("pending_hash_key"),
                F.col("doc.detail_download_href").alias("detail_download_href"),
            )
        )

        # two-hop items (operators/pending.py): listing rows that still need
        # their download page park in pending_docs; detail pages fetched this
        # batch complete matching pendings via a broadcast-sized join
        detail_records = parsed.filter(F.col("detail_download_href").isNotNull()).select(
            url_hash64(F.col("source_page_url")).alias("detail_url_hash64"),
            F.col("detail_download_href"),
        )
        regular = parsed.filter(F.col("detail_download_href").isNull()).drop(
            "detail_download_href"
        )
        new_pending = (
            regular.filter(F.col("detail_url").isNotNull())
            .withColumn("detail_url_hash64", url_hash64(F.col("detail_url")))
            .withColumn("discovered_at_batch", F.lit(batch))
            .select(*PENDING_COLS)
        )
        new_pending = new_pending.persist()
        n_pending_new = new_pending.count()
        ready = regular.filter(F.col("detail_url").isNull()).drop(
            "detail_url", "pending_hash_key"
        )
        aged = None
        n_expired = 0
        if n_pending_new or store.segment_count("pending_docs"):
            pending_open = store.read("pending_docs", PENDING_DOCS).join(
                store.read("pending_done", PENDING_DONE).select("detail_url_hash64"),
                "detail_url_hash64",
                "left_anti",
            )
            # age-out: an open pending whose detail page STILL produced no
            # record after N batches is dead (non-2xx detail fetch or an
            # extractor that found no href marks the URL done in
            # frontier_done, so the hop never retries) — surface it instead
            # of losing the document invisibly
            if cfg.pending_max_age_batches:
                aged = (
                    pending_open.filter(
                        F.lit(batch) - F.col("discovered_at_batch")
                        > cfg.pending_max_age_batches
                    )
                    .join(
                        detail_records.select("detail_url_hash64"),
                        "detail_url_hash64",
                        "left_anti",
                    )
                    .persist()
                )
                n_expired = aged.count()
            completed_full = resolve_pending(
                pending_open.unionByName(new_pending), detail_records
            )
            completed = completed_full.drop(
                "detail_url", "detail_url_hash64", "discovered_at_batch", "pending_hash_key"
            )
        else:
            # fast path: nothing pending anywhere — skip the join entirely
            # (most sources are single-hop; don't tax every batch for the
            # few that aren't)
            completed_full = None
            completed = ready.limit(0)

        docs_raw = (
            ready.unionByName(completed)
            .withColumn("crawler_used", F.col("source"))
            .withColumn("version_hash", version_hash_udf("version_hash_raw_data"))
            .withColumn("doc_seq", F.col("parent_seq") * 100000 + F.col("doc_idx"))
        )

        # pipeline chain (priority order 50→400, runspider_settings.py:2-8)
        docs = docs_raw.withColumn(
            "doc_name", F.substring(F.regexp_replace("doc_name", "/", "_"), 1, 235)
        )
        docs = in_run_dedup(docs, key="doc_name", order_col="doc_seq")
        emitted_names = store.read("doc_items", _emitted_schema())
        docs = docs.join(
            emitted_names.select("crawler_used", "doc_name"),
            ["crawler_used", "doc_name"],
            "left_anti",
        )
        docs = docs.withColumn("access_timestamp", F.lit(cfg.batch_ts))
        docs = docs.withColumn("source_fqdn", fqdn_col(F.col("source_page_url")))
        docs = docs.persist()
        n_docs = docs.count() if cfg.collect_stats else -1

        # seen-set anti-join (F1/J1) — bloom-prefiltered: rows the bloom
        # rejects skip the shuffle; only "maybe" rows join exactly. If the
        # store predates bloom_seen (or was written with use_bloom=False),
        # fall back to the exact join this batch and self-heal at commit.
        seen = store.read("seen", S.SEEN)
        have_seen_bloom = cfg.use_bloom and store.segment_count("bloom_seen") > 0
        bloom_seen = store.read("bloom_seen", BLOOM_SCHEMA) if have_seen_bloom else None
        fresh = anti_join_seen(
            docs.withColumn("_vh64", F.xxhash64("version_hash")),
            seen,
            key="version_hash",
            bloom=bloom_seen,
            bloom_hash_col="_vh64" if have_seen_bloom else None,
            num_buckets=cfg.num_buckets,
        ).drop("_vh64").persist()
        n_fresh = fresh.count()
        n_in_prev = (n_docs - n_fresh) if cfg.collect_stats else -1

        # schema-validation filter (F8) → dead_letter
        from gc_spark.operators.enrich import validate_items

        fresh_valid, invalid = validate_items(fresh)
        invalid_rows = invalid.select(
            F.lit(None).cast("string").alias("url"),
            "doc_name",
            "source",
            F.col("_invalid_reason").alias("failure_reason"),
            F.lit(batch).alias("batch"),
        )

        # CAC split (F3)
        cac_blocked = fresh_valid.filter(F.col("cac_login_required"))
        to_fetch = fresh_valid.filter(~F.col("cac_login_required"))
        n_cac = cac_blocked.count() if cfg.collect_stats else -1

        # first supported downloadable item (W2/F4) + download fetch
        supported = F.array([F.lit(x) for x in ["pdf", "html", "txt", "zip"]])
        to_fetch = to_fetch.withColumn(
            "file_item",
            F.try_element_at(
                F.filter("downloadable_items", lambda x: F.array_contains(supported, x["doc_type"])),
                F.lit(1),
            ),
        )
        dl = to_fetch.filter(F.col("file_item").isNotNull())
        no_dl = to_fetch.filter(F.col("file_item").isNull())

        dl_batch = dl.withColumn("url", F.col("file_item.download_url")).withColumn(
            "url_hash64", url_hash64(F.col("url"))
        )
        # persisted for the same reason as `fetched`: dl_failed anti-joins
        # dl_ok, which would otherwise re-run the download fetch
        dl_fetched = self.download_fetcher.fetch(dl_batch).persist()
        dl_ok = dl_fetched.filter(
            (F.col("status") >= 200) & (F.col("status") < 300) & F.col("media_sha").isNotNull()
        )
        dl_failed = dl_fetched.join(dl_ok.select("doc_seq"), "doc_seq", "left_anti")
        n_dead = dl_failed.count() if cfg.collect_stats else -1

        # zip explode (X1): children replace parents
        exploded = explode_zip_items(
            dl_ok.withColumn("compression", F.col("file_item.compression_type"))
        )

        # docs with inline segments (page-content documents) get media=None
        inline = no_dl.unionByName(cac_blocked, allowMissingColumns=True).withColumn(
            "media_sha", F.lit(None).cast("string")
        )

        final_docs = exploded.unionByName(inline, allowMissingColumns=True).persist()

        # ---- sinks --------------------------------------------------------
        # only actually-landed content reaches documents AND seen: downloads
        # or page content; CAC-blocked items reach the feed only
        # (pipelines.py:131-134,293-294)
        landed = final_docs.filter(
            (F.col("media_sha").isNotNull() | F.col("segments").isNotNull())
            & ~F.coalesce(F.col("cac_login_required"), F.lit(False))
        ).persist()
        documents = _build_documents(landed)
        new_seen = landed.select(
            "version_hash",
            "doc_name",
            F.col("crawler_used"),
            F.col("access_timestamp"),
            F.coalesce(F.col("url_hash64"), F.lit(None).cast("long")).alias("url_hash64"),
        )

        dead_rows = dl_failed.select(
            F.col("url"),
            F.col("doc_name"),
            F.col("source"),
            F.concat(F.lit("HTTP Response Code "), F.col("status").cast("string")).alias(
                "failure_reason"
            ),
            F.lit(batch).alias("batch"),
        ).unionByName(
            failed.select(
                F.col("url"),
                F.lit(None).cast("string").alias("doc_name"),
                F.col("source"),
                F.concat(F.lit("HTTP Response Code "), F.col("status").cast("string")).alias(
                    "failure_reason"
                ),
                F.lit(batch).alias("batch"),
            )
        ).unionByName(invalid_rows)
        if n_expired:
            dead_rows = dead_rows.unionByName(
                aged.select(
                    F.col("detail_url").alias("url"),
                    "doc_name",
                    "source",
                    F.lit("Pending detail page never completed").alias("failure_reason"),
                    F.lit(batch).alias("batch"),
                )
            )

        # crawl feed membership (reference parity): exploded/inline docs PLUS
        # manifest-skipped items (pipelines.py:125-129 "dont download anything
        # just send item to crawl output") PLUS failed-download items
        # (item_completed adds to dead queue but still returns the item)
        in_prev_docs = docs.join(fresh.select("doc_seq"), "doc_seq", "left_anti")
        feed_docs = (
            final_docs.unionByName(in_prev_docs, allowMissingColumns=True)
            .unionByName(dl_failed, allowMissingColumns=True)
        )
        emitted = feed_docs.select(
            "crawler_used", "doc_name", "version_hash", F.lit(batch).alias("batch")
        )
        feed = _build_feed(feed_docs, self.source_config, cfg.batch_ts)

        # per-source counters (GCSpider stats parity: 'Required CAC',
        # 'In Previous Hashes', scraped count — GCSpider.py:28-31,51-66)
        def _cnt(df, col):
            return df.groupBy("source").agg(F.count("*").alias(col))

        metrics = (
            _cnt(take, "urls_scheduled")
            .join(_cnt(links.select("source"), "links_found"), "source", "left")
            .join(_cnt(new_frontier.select("source"), "links_new"), "source", "left")
            .join(
                _cnt(final_docs.select(F.col("crawler_used").alias("source")), "docs_emitted"),
                "source",
                "left",
            )
            .join(
                _cnt(in_prev_docs.select(F.col("crawler_used").alias("source")), "in_previous_hashes"),
                "source",
                "left",
            )
            .join(
                _cnt(cac_blocked.select(F.col("crawler_used").alias("source")), "required_cac"),
                "source",
                "left",
            )
            .join(_cnt(dead_rows.select("source"), "dead"), "source", "left")
            .select(
                "source",
                F.lit(batch).alias("batch"),
                F.coalesce("urls_scheduled", F.lit(0)).alias("urls_scheduled"),
                (F.coalesce("links_found", F.lit(0)) - F.coalesce("links_new", F.lit(0))).alias("urls_deduped"),
                F.coalesce("docs_emitted", F.lit(0)).alias("docs_emitted"),
                F.coalesce("in_previous_hashes", F.lit(0)).alias("in_previous_hashes"),
                F.coalesce("required_cac", F.lit(0)).alias("required_cac"),
                F.coalesce("dead", F.lit(0)).alias("dead"),
            )
        )

        # ---- commit --------------------------------------------------------
        txn = store.begin(batch)
        if n_new_links:
            txn.append("frontier", new_frontier)
        txn.append(
            "frontier_done",
            take.select("url_hash64", "url", "host", "source").withColumn("batch", F.lit(batch)),
        )
        txn.append("documents", documents)
        if n_fresh:
            txn.append("seen", new_seen)
        txn.append("doc_items", emitted)
        txn.append("feed", feed)
        txn.append("dead_letter", dead_rows)
        txn.append("metrics", metrics)
        if n_pending_new:
            txn.append("pending_docs", new_pending)
        if n_pending_new or store.segment_count("pending_docs"):
            done_keys = completed_full.select("detail_url_hash64")
            if n_expired:
                # expired pendings close too — the open set stays bounded
                done_keys = done_keys.unionByName(aged.select("detail_url_hash64"))
            done_keys = done_keys.distinct().withColumn("batch", F.lit(batch))
            if done_keys.count():
                txn.append("pending_done", done_keys)
        txn.set_meta("max_seq", int(max_seq) + int(n_new_links))
        if cfg.use_bloom and n_new_links:
            old_bloom = store.read("bloom_frontier", BLOOM_SCHEMA)
            nb = build_bloom(
                new_frontier.select("url_hash64"),
                num_buckets=cfg.num_buckets,
                expected_per_bucket=cfg.bloom_expected_per_bucket,
                fpp=cfg.bloom_fpp,
            )
            txn.replace("bloom_frontier", merge_blooms(old_bloom, nb))
        if cfg.use_bloom:
            if not have_seen_bloom:
                # self-heal: cover the FULL seen set once, then incrementally
                txn.replace("bloom_seen", self._seen_bloom(seen.unionByName(new_seen)))
            elif n_fresh:
                txn.replace(
                    "bloom_seen", merge_blooms(bloom_seen, self._seen_bloom(new_seen))
                )
        txn.add_lineage(
            [
                {"batch": batch, "table": "frontier", "rows": int(n_new_links)},
                {"batch": batch, "table": "documents", "rows": int(final_docs.count()) if cfg.collect_stats else -1},
                {"batch": batch, "table": "seen", "rows": int(n_fresh)},
            ]
        )
        txn.commit()

        out = {
            "batch": batch,
            "scheduled": int(n_take),
            "new_links": int(n_new_links),
            "links_deduped": int(n_links_raw - n_new_links),
            "docs": int(n_docs),
            "in_previous_hashes": int(n_in_prev),
            "dead": int(n_dead),
            "pending_expired": int(n_expired),
        }
        for df in (take, fetched, dl_fetched, extracted, new_frontier, new_pending, docs, fresh, final_docs, landed, *_seq_persists):
            df.unpersist()
        if aged is not None:
            aged.unpersist()
        return out


# ---------------------------------------------------------------- helpers


def fetch_history(store) -> "DataFrame":
    """Complete fetch provenance: live done-markers PLUS rows compaction
    archived to fetch_log. Readers of crawl history must use this union —
    frontier_done alone only covers batches since the last compaction."""
    return store.read("frontier_done", _done_schema()).unionByName(
        store.read("fetch_log", _done_schema())
    )


def _done_schema():
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    return StructType(
        [
            StructField("url_hash64", LongType()),
            StructField("url", StringType()),
            StructField("host", StringType()),
            StructField("source", StringType()),
            StructField("batch", IntegerType()),
        ]
    )


def _emitted_schema():
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    return StructType(
        [
            StructField("crawler_used", StringType()),
            StructField("doc_name", StringType()),
            StructField("version_hash", StringType()),
            StructField("batch", IntegerType()),
        ]
    )


def _apply_robots(links: DataFrame, robots: DataFrame) -> DataFrame:
    """Default-allow robots filter: drop links whose path matches a disallow
    prefix for the host (the reference explicitly disables robots,
    runspider_settings.py:16 — we support rules but ship default-allow).
    Broadcast join on host with the disallow list kept as an array — one row
    per link in/out, no fan-out."""
    r = robots.select("host", F.col("disallow").alias("_disallow"))
    joined = links.join(F.broadcast(r), "host", "left")
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    blocked = F.exists("_disallow", lambda p: path.startswith(p))
    return joined.filter(~F.coalesce(blocked, F.lit(False))).drop("_disallow")


def _build_feed(feed_docs: DataFrame, source_config: DataFrame | None, batch_ts: str) -> DataFrame:
    """Full 22-field DocItem rows (output_spec.json:29-52) for the crawl
    feed: item-level values win; source defaults / derivations fill gaps
    (AdditionalFieldsPipeline semantics, pipelines.py:319-372)."""
    from gc_spark.functions.text import display_title_col
    from gc_spark.functions.urls import file_extension_col

    d = feed_docs
    # per-doc override columns may be absent when callers assemble docs
    # outside drain_one (streaming, entry queries) — default them to null
    for opt_col, typ in [
        ("display_title", "string"), ("file_ext", "string"), ("is_revoked", "boolean"),
    ]:
        if opt_col not in d.columns:
            d = d.withColumn(opt_col, F.lit(None).cast(typ))
    if source_config is not None:
        from gc_spark.operators.enrich import enrich_with_source_defaults

        d = enrich_with_source_defaults(d, source_config, batch_ts)
    else:
        for col, default in [
            ("display_org", "Unlisted Org"),
            ("data_source", "Unlisted Source"),
            ("source_title", "Unlisted Source"),
        ]:
            if col not in d.columns:
                d = d.withColumn(col, F.lit(default))

    dl_url = F.coalesce(
        F.col("download_url"), F.col("file_item.download_url")
    ) if "file_item" in d.columns else F.col("download_url")

    return d.select(
        F.col("doc_name"),
        F.col("doc_title"),
        F.col("doc_num"),
        F.col("doc_type"),
        F.coalesce("display_doc_type", "doc_type").alias("display_doc_type"),
        F.coalesce("publication_date", F.lit("N/A")).alias("publication_date"),
        F.coalesce("cac_login_required", F.lit(False)).alias("cac_login_required"),
        F.col("crawler_used"),
        F.col("source_page_url"),
        F.coalesce(F.col("source_fqdn"), F.parse_url("source_page_url", F.lit("HOST"))).alias(
            "source_fqdn"
        ),
        dl_url.alias("download_url"),
        F.col("downloadable_items"),
        F.col("version_hash_raw_data"),
        F.col("version_hash"),
        F.coalesce("access_timestamp", F.lit(batch_ts)).alias("access_timestamp"),
        F.col("display_org"),
        F.concat_ws(" - ", "data_source", "source_title").alias("display_source"),
        F.coalesce(
            F.col("display_title"),  # per-doc override (set_display_name)
            display_title_col(F.col("doc_type"), F.col("doc_num"), F.col("doc_title")),
            F.col("doc_title"),
        ).alias("display_title"),
        F.col("data_source"),
        F.col("source_title"),
        F.coalesce(
            F.col("file_ext"),  # per-doc override (file_ext=doc_type quirks)
            file_extension_col(dl_url),
            F.lit("html"),
        ).alias("file_ext"),
        F.coalesce(F.col("is_revoked"), F.lit(False)).alias("is_revoked"),
    )


def _build_documents(final_docs: DataFrame) -> DataFrame:
    """Interleaved span assembly: segments-docs get their page segments;
    download-docs get [title text, media blob]."""
    from gc_spark.operators.explode import interleave_spans_from_segments

    with_segments = final_docs.filter(
        F.col("segments").isNotNull() & (F.size("segments") > 0)
    )
    seg_docs = interleave_spans_from_segments(with_segments).select(
        F.concat(F.col("crawler_used"), F.lit("::"), F.col("doc_name")).alias("doc_id"),
        "spans",
    )
    dl_docs = assemble_spans(
        final_docs.filter(F.col("segments").isNull() | (F.size("segments") == 0))
    )
    return seg_docs.unionByName(dl_docs)
