"""sf1 bench: the five heaviest queries + the engine drain at 10x sf0.1.

VERDICT r2 asked for a second measured scale point so the 100 TB scaling
story rests on data, not just plan shape. /root/testdata has no sf1, so this
tool synthesizes a DERIVED one (documents + embeddings only — the tables the
heavy queries read) at SCALE x sf0.1 under .bench_sf1/ (gitignored):

  - documents: SCALE copies, doc_id offset per copy; every word in copy i>0
    is prefixed "c{i}" so shingles DON'T collide across copies — each copy is
    an independent sf0.1-like corpus and the near-dup workload scales
    linearly instead of exploding quadratically on artificial cross-copy
    duplicates.
  - embeddings: SCALE copies, vec_id offset per copy; the vector is ROTATED
    by i positions (norm-preserving, deterministic) so copies decorrelate.

Prints one JSON line with per-query seconds at sf0.1 and sf1 plus engine
drain at 200k and 2M URLs. Timing protocol matches bench.py: per query,
one warm-up pass at EACH scale point absorbs codegen JIT, then timed runs
ALTERNATE sf0.1/sf1 (best-of-3 each) so host drift and cold-start effects
hit both columns equally and the two-scale table is like-for-like.
Iterative operators (q32/q36/q39/...) are timed inclusive of their
driver-loop construction.

Run: python tools/sf1_bench.py   (env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SF1_SCALE)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_SF1_SCALE", "10"))
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_sf1")
HEAVY = ["q16_minhash_bands", "q32_ivf_ann", "q33_jaccard_pairs",
         "q36_dup_clusters", "q39_connected_components",
         # round-3 heavy corpus ops (documents-only inputs, so the scaled
         # set covers them): line dedup shuffles line hashes; tfidf/lm are
         # the broadcast-vocab joins; canonical_docs is the full LSH ->
         # verify -> cluster -> keep pipeline
         "q50_line_dedup", "q53_tfidf_topterms", "q59_lm_xent",
         "q60_canonical_docs",
         # round-3 continuation ops (documents/embeddings inputs): DSIR is
         # the hashed-ngram double aggregate, PQ the broadcast-codebook
         # assignment, span truncate the pure array fold
         "q101_dsir_weights", "q103_pq_codes", "q110_span_truncate",
         # round-4 ops (documents/embeddings inputs): CDC delta is the
         # one-id-join chunk-reuse accounting, CMS the sketch build+probe,
         # span redact the coalesce+regex fold, embed decontam the
         # broadcast benchmark crossJoin, BPE encode the learn+apply loop
         "q137_cdc_delta", "q140_cms_estimates", "q142_span_redact",
         "q145_embed_decontam", "q149_bpe_encode",
         # round-5 closing-wave ops (documents inputs): maxscore is the
         # pruned two-pass BM25, rm3 the two-corpus-pass feedback
         # expansion, best_passage the match-position density window
         "q202_maxscore_topk", "q209_rm3_topk", "q214_best_passage",
         # round-6 second-wave ops (documents inputs): the lazy-checkpoint
         # contraction pattern (q65/q94/q105/q162/q165/q172), the hashed-
         # gram ESD path (q80), and the rewritten simhash/winnow kernels
         # (q17/q49) — their 10x behavior is the scale question the
         # checkpoints raise (materialization grows with data)
         "q17_simhash", "q49_winnow_fingerprints", "q65_bigram_pmi",
         "q80_exact_substring_mask", "q94_ngram_novelty", "q105_oov_rate",
         "q162_incremental_index", "q165_ir_metrics",
         "q172_allpairs_jaccard"]
ITERATIVE = {"q32_ivf_ann", "q36_dup_clusters", "q39_connected_components",
             "q60_canonical_docs", "q149_bpe_encode"}
ID_STRIDE = 10_000_000


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(OUT_DIR, "_SCALED_OK")):
        return
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    dim = len(embs.select("embedding").first()["embedding"])

    doc_copies = []
    for i in range(SCALE):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * ID_STRIDE))
        if i:
            # prefix every word: shingles never collide across copies
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(^|\s)(\S)", f"$1c{i}$2")
            )
        doc_copies.append(c)
    out_docs = doc_copies[0]
    for c in doc_copies[1:]:
        out_docs = out_docs.unionByName(c)
    out_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT_DIR, "documents.parquet")
    )

    emb_copies = []
    for i in range(SCALE):
        c = embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * ID_STRIDE))
        if i:
            rot = i % dim
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ),
            )
        emb_copies.append(c)
    out_embs = emb_copies[0]
    for c in emb_copies[1:]:
        out_embs = out_embs.unionByName(c)
    out_embs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT_DIR, "embeddings.parquet")
    )
    open(os.path.join(OUT_DIR, "_SCALED_OK"), "w").write("ok\n")


def time_queries(spark, sf_dirs: list[str]) -> list[dict]:
    """Per query: warm once at each scale point, then interleave timed runs
    across the scale points (best-of-REPEATS per point). Interleaving is
    what makes the sf0.1 and sf1 columns like-for-like: any host drift or
    JIT/cache cold-start lands on both, not just the first column."""
    import __spark_entry__ as entry

    repeats = int(os.environ.get("SPARK_GRAFT_SF1_REPEATS", "3"))
    qs = entry.queries()
    out = [{} for _ in sf_dirs]

    def one_run(name, fn, sf_dir):
        # iterative ops rebuild their driver loop inside the timed section
        # (construction runs jobs via eager checkpoints); pure-plan ops
        # time only the execution
        if name in ITERATIVE:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        else:
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in HEAVY:
        fn = qs[name]
        times = [[] for _ in sf_dirs]
        for i, d in enumerate(sf_dirs):  # warm-up, untimed, per scale point
            fn(spark, d).write.format("noop").mode("overwrite").save()
        for _ in range(max(repeats, 1)):
            for i, d in enumerate(sf_dirs):
                times[i].append(one_run(name, fn, d))
        for i in range(len(sf_dirs)):
            out[i][name] = round(min(times[i]), 3)
    return out


def main():
    import bench

    spark = bench.build_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)

    q_small, q_big = time_queries(spark, [BASE_SF, OUT_DIR])

    os.environ["SPARK_GRAFT_BENCH_ENGINE_URLS"] = "200000"
    eng_small = bench.bench_engine_drain(spark)
    os.environ["SPARK_GRAFT_BENCH_ENGINE_URLS"] = "2000000"
    eng_big = bench.bench_engine_drain(spark)

    result = {
        "metric": "sf1_heavy_queries_and_engine",
        "scale": SCALE,
        "protocol": "per query: warm at each scale point, then interleaved"
        " best-of-%s timed runs per point" % os.environ.get(
            "SPARK_GRAFT_SF1_REPEATS", "3"
        ),
        "queries_sf0.1": q_small,
        "queries_sf1": q_big,
        "engine_drain_200k": eng_small,
        "engine_drain_2m": eng_big,
        "cpus": bench.CPUS,
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(OUT_DIR), "BENCH", "sf1.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
