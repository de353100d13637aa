"""spark-submit driver for the crawl engine.

    spark-submit --py-files gc_spark.zip gc_spark/plans/main.py \
        --warehouse /data/crawl --batches 50 --budget-per-host 10 \
        [--seeds seeds.json] [--prev-manifest manifest.json] \
        [--pages pages.parquet | --http] [--compact-every 8]

Defaults to the built-in 41-source GAMECHANGER seed list (sources/seeds.py).
With --pages the fetch stage resolves against a synthetic site table (no
network); with --http it performs real GETs under the reference politeness
config (0.1 s delay / 3.5 s timeout / 2 retries, runspider_settings.py:20-25).
Resumable: re-running with the same --warehouse continues from the last
committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python gc_spark/plans/main.py` execution (no --py-files zip):
# put the repo root on the path
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def parse_args(argv):
    p = argparse.ArgumentParser(description="gc_spark crawl driver")
    p.add_argument("--warehouse", required=True, help="snapshot store root")
    p.add_argument("--batches", type=int, default=100)
    p.add_argument("--budget-per-host", type=int, default=10)
    p.add_argument("--seeds", help="JSON-lines seeds (source,url,host,allowed_domains); default: built-in 41 sources")
    p.add_argument("--prev-manifest", help="cumulative JSON-lines manifest to seed the seen-set")
    p.add_argument("--pages", help="parquet pages table for the injectable fetcher")
    p.add_argument("--http", action="store_true", help="real HTTP fetching")
    p.add_argument("--compact-every", type=int, default=0)
    p.add_argument("--cores", type=int, default=None, help="local[N] when not under spark-submit")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv or sys.argv[1:])

    from gc_spark.conf import build_session

    spark = build_session(cores=args.cores, app_name="gc_spark-crawl")
    spark.sparkContext.setLogLevel("WARN")

    from gc_spark import schema as S
    from gc_spark.plans.drain import CrawlEngine, EngineConfig
    from gc_spark.sources.fetch import HttpFetcher, TableFetcher
    from gc_spark.sources.manifest import read_manifest_jsonl
    from gc_spark.sources.seeds import seeds_df
    from gc_spark.sources.tables import SnapshotStore

    if args.seeds:
        seeds = spark.read.schema(S.SEEDS).json(args.seeds)
    else:
        seeds = seeds_df(spark)

    if args.http:
        fetcher = HttpFetcher()
    elif args.pages:
        fetcher = TableFetcher(spark.read.schema(S.PAGES).parquet(args.pages))
    else:
        raise SystemExit("choose a fetch mode: --pages <parquet> or --http")

    store = SnapshotStore(spark, args.warehouse)
    engine = CrawlEngine(
        spark,
        store,
        fetcher,
        config=EngineConfig(
            budget_per_host=args.budget_per_host, compact_every=args.compact_every
        ),
        scope=seeds.select("source", "allowed_domains"),
    )

    if store.latest_batch() is None:
        prev = read_manifest_jsonl(spark, args.prev_manifest) if args.prev_manifest else None
        engine.bootstrap(seeds, prev_manifest=prev)

    stats = engine.run(max_batches=args.batches)
    for st in stats:
        print(json.dumps(st))
    print(
        json.dumps(
            {
                "done": True,
                "batches": len(stats),
                "last_batch": store.latest_batch(),
                "documents": store.read("documents", S.DOCUMENTS).count(),
                "seen": store.read("seen", S.SEEN).count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
