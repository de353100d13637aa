"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
timing identical to bench.py's methodology, phase breakdowns for the frontier
drain and the minhash kernel, and .explain("formatted") capture.

bench.py is FROZEN for measurement; this file exists so optimization evidence
(per-query before/after, plan diffs) can be collected without touching it.

Usage:
  python bench_extra.py q16 q39 ...        # bench-style timing of named queries
  python bench_extra.py --explain q16 ...  # write plans/r06/<q>_<tag>.txt
  python bench_extra.py --frontier         # phased frontier-drain breakdown
  python bench_extra.py --engine           # engine drain timing
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_spark  # same session config as the frozen bench


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


ITERATIVE = {
    "q32_ivf_ann",
    "q36_dup_clusters",
    "q39_connected_components",
    "q52_pagerank",
    "q60_canonical_docs",
    "q68_bpe_merges",
}


def time_query(spark, name, fn, repeats=2):
    """Same methodology as bench.bench_queries: warmup + min of `repeats`."""
    times = []
    if name in ITERATIVE:
        _noop(fn(spark, SF_DIR))
        for _ in range(repeats):
            t0 = time.time()
            _noop(fn(spark, SF_DIR))
            times.append(time.time() - t0)
    else:
        df = fn(spark, SF_DIR)
        _noop(df)
        for _ in range(repeats):
            t0 = time.time()
            _noop(df)
            times.append(time.time() - t0)
    return round(min(times), 3), [round(t, 3) for t in times]


def bench_frontier_phases(spark):
    from pyspark.sql import functions as F

    from bench import BUDGET, N_HOSTS, N_URLS, synthetic_frontier
    from gc_spark.functions.hashing import url_hash64
    from gc_spark.functions.urls import canonicalize_url_col
    from gc_spark.operators.politeness import topk_per_host

    import tempfile

    frontier = synthetic_frontier(spark, N_URLS, N_HOSTS)
    seen_path = os.path.join(tempfile.mkdtemp(prefix="gc_benchx_"), "seen")
    (
        synthetic_frontier(spark, N_URLS, N_HOSTS)
        .filter(F.col("seq") % 3 == 0)
        .select(url_hash64(canonicalize_url_col(F.col("url"))).alias("url_hash64"))
        .write.parquet(seen_path)
    )
    seen = spark.read.parquet(seen_path)

    def staged_df():
        return (
            frontier.withColumn("canonical_url", canonicalize_url_col(F.col("url")))
            .withColumn("url_hash64", url_hash64(F.col("canonical_url")))
            .withColumn(
                "host", F.substring_index(F.substring_index("url", "/", 3), "//", -1)
            )
        )

    phases = {
        "p0_generate": lambda: frontier,
        "p1_canon_hash": staged_df,
        "p2_anti_join": lambda: staged_df().join(seen, "url_hash64", "left_anti"),
        "p3_topk": lambda: topk_per_host(
            staged_df().join(seen, "url_hash64", "left_anti"), BUDGET, salt_buckets=16
        ),
    }
    out = {}
    for name, mk in phases.items():
        df = mk()
        spark.sparkContext.setJobDescription(f"benchx frontier {name}")
        _noop(df)  # warmup / codegen
        times = []
        for _ in range(3):
            t0 = time.time()
            _noop(df)
            times.append(time.time() - t0)
        out[name] = [round(t, 3) for t in times]
        spark.sparkContext.setJobDescription(None)
    # the bench's own timed shape: count() on the topk result
    t0 = time.time()
    n = phases["p3_topk"]().count()
    out["p3_topk_count_like_bench"] = [round(time.time() - t0, 3), n]
    return out


def bench_minhash_phases(spark):
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from gc_spark.operators import text_dedup as td

    d = entry._t_wide(spark, SF_DIR, "documents")
    sh = td._shingles(F.col("text"))
    phases = {
        "m0_scan": d.select("doc_id"),
        "m1_shingles": d.select("doc_id", F.size(sh).alias("n")),
        "m2_pairs": d.select(
            "doc_id", F.size(F.transform(sh, td.sha_pair_col)).alias("n")
        ),
        "m3_signature": td.minhash_signature(d, portable=True).select(
            "doc_id", "minhash"
        ),
        "m4_bands": td.lsh_band_rows(d, portable=True),
        "m5_full_q16": entry.q16_minhash_bands(spark, SF_DIR),
    }
    out = {}
    for name, df in phases.items():
        spark.sparkContext.setJobDescription(f"benchx minhash {name}")
        _noop(df)
        times = []
        for _ in range(3):
            t0 = time.time()
            _noop(df)
            times.append(time.time() - t0)
        out[name] = [round(t, 3) for t in times]
        spark.sparkContext.setJobDescription(None)
    return out


def main():
    args = sys.argv[1:]
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    t_session = time.time()

    if "--frontier" in args:
        print(json.dumps({"frontier_phases": bench_frontier_phases(spark)}))
    if "--minhash" in args:
        print(json.dumps({"minhash_phases": bench_minhash_phases(spark)}))
    if "--engine" in args:
        from bench import bench_engine_drain

        print(json.dumps({"engine": bench_engine_drain(spark)}))

    explain = "--explain" in args
    tag = None
    for a in list(args):
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
    qnames = [a for a in args if a.startswith("q")]
    if qnames:
        import __spark_entry__ as entry

        qs = entry.queries()
        results = {}
        for short in qnames:
            matches = [k for k in qs if k == short or k.startswith(short + "_")]
            for name in matches:
                if explain:
                    os.makedirs("plans/r06", exist_ok=True)
                    df = qs[name](spark, SF_DIR)
                    p = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                    path = f"plans/r06/{name}_{tag or 'now'}.txt"
                    with open(path, "w") as f:
                        f.write(p)
                    print("wrote", path)
                else:
                    best, all_t = time_query(spark, name, qs[name])
                    results[name] = {"best": best, "all": all_t}
                    print(name, best, all_t, flush=True)
        if results:
            print(json.dumps({"queries": results, "session_wall": round(time.time() - t_session, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
