"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the gc_spark engine's own operator functions where possible; the
matching ``oracle_sql()`` is the ANSI-SQL twin DuckDB runs on the same
parquet. Column names/types are aligned on both sides (the driver's compare
sorts columns by name before value-hashing); float aggregates are rounded on
both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from gc_spark.conf import tune_runtime

    tune_runtime(spark)  # idempotent per session (r6 join/AQE tuning)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _t_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan for COMPUTE-heavy queries (per-token/shingle hashing, embedding
    FMAs): the bench tables are single-row-group parquet files, which Spark
    reads as ONE task regardless of cores — expression cost then runs
    single-threaded. Round-robin to defaultParallelism only when the scan
    has fewer partitions; at production scale the scan already has thousands
    of splits and this is a no-op."""
    df = _t(spark, sf_dir, name)
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def _with_planted_docs(
    d: DataFrame,
    every: int = 25,
    offset: int = 10_000_000,
    suffix: str = " extraword",
) -> DataFrame:
    """Corpus + planted near-dup copies (every `every`-th doc re-appears
    with `suffix` appended and id shifted by `offset`) built in ONE pass:
    the original unionByName(planted) shape instantiated the scan +
    _t_wide repartition subtree twice (guide §7.2 duplicated subtrees);
    exploding one-or-two structs per row yields the identical row set from
    a single scan. Row multiset is unchanged — only construction differs."""
    base = F.struct(F.col("doc_id"), F.col("text"))
    copy = F.struct(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.concat("text", F.lit(suffix)).alias("text"),
    )
    rows = F.when(
        F.col("doc_id") % every == 0, F.array(base, copy)
    ).otherwise(F.array(base))
    return d.select(F.explode(rows).alias("_r")).select("_r.doc_id", "_r.text")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary rollup (per-source metrics rollup analog,
    SURVEY.md §2.4-A1) on sf0.001."""
    return q01_rollup(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries — one per operator family
# ---------------------------------------------------------------------------


def q01_rollup(spark, sf_dir):
    """A1: grouped counters/sums (metrics rollup)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q02_seen_anti_join(spark, sf_dir):
    """F1/J1: seen-set anti-join — orders whose customer is in the 'seen'
    nation set are dropped (gc_spark.operators.dedup.anti_join_seen)."""
    from gc_spark.operators.dedup import anti_join_seen

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    seen = cust.filter(F.col("c_nationkey") < 5).select(
        F.col("c_custkey").alias("o_custkey")
    )
    out = anti_join_seen(orders, seen, key="o_custkey")
    return out.select("o_orderkey", "o_custkey", "o_orderstatus")


def q03_in_run_dedup(spark, sf_dir):
    """F2/J2: in-run dedup — first event per (user_id, event_type) in
    arrival order (gc_spark.operators.dedup.in_run_dedup semantics)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "dedup_key", F.concat_ws("|", "user_id", "event_type")
    )
    from gc_spark.operators.dedup import in_run_dedup

    out = in_run_dedup(ev, key="dedup_key", order_col="event_id")
    return out.select("user_id", "event_type", "event_id")


def q04_topk_per_host(spark, sf_dir):
    """W3/O5: politeness top-k per host — top-3 events per user in
    (ts, event_id) order via gc_spark.operators.politeness.topk_per_host."""
    from gc_spark.operators.politeness import topk_per_host

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("host"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("depth"),
        F.col("event_id").alias("seq"),
        "event_id",
        "event_type",
    )
    out = topk_per_host(ev, k=3)
    return out.select(
        F.col("host").cast("bigint").alias("user_id"), "event_id", "drain_rank"
    )


def q05_lag_carry(spark, sf_dir):
    """W1: prev-value carry (us_code prev_doc_num lag analog)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )


def q06_explode(spark, sf_dir):
    """X1/X2/X3: explode — one embedding row → 64 element rows."""
    em = _t_wide(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("val"))


def q07_version_hash(spark, sf_dir):
    """C6: sha256 version hash of a canonical concat (str_to_sha256)."""
    from gc_spark.functions.hashing import sha256_col

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        sha256_col(F.concat_ws("|", F.col("c_name"), F.col("c_nationkey"))).alias(
            "version_hash"
        ),
    )


def q08_json_extract(spark, sf_dir):
    """C16: JSON body field pluck (API-scan parse analog)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
        )
    )


def q09_except(spark, sf_dir):
    """J4: EXCEPT — high-value purchasers who never triggered an error on a
    high-value event (non-empty at every sf, unlike a bare type EXCEPT)."""
    ev = _t(spark, sf_dir, "events")
    buyers = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 90))
        .select("user_id")
        .distinct()
    )
    errs = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 90))
        .select("user_id")
        .distinct()
    )
    return buyers.exceptAll(errs)


def q10_dedup_exact(spark, sf_dir):
    """Training-data op: exact text dedup via hash-groupBy — canonical
    representative (min doc_id) + duplicate count per distinct text."""
    d = _t_wide(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count")
    ).select("keep_id", "dup_count")


def q11_token_count(spark, sf_dir):
    """Training-data op: token counting (whitespace tokenizer)."""
    d = _t_wide(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
        F.col("n_chars"),
    )


def q12_lang_id(spark, sf_dir):
    """Training-data op: language-ID heuristic (stopword hit)."""
    d = _t_wide(spark, sf_dir, "documents")
    is_en = (
        F.col("text").like("% the %")
        | F.col("text").like("the %")
        | F.col("text").like("% a %")
    )
    return d.select(
        "doc_id", F.when(is_en, "en").otherwise("other").alias("lang_guess")
    )


def q13_fingerprint(spark, sf_dir):
    """Training-data op: document fingerprint — sha256 of the first 5
    whitespace tokens (deterministic shingle prefix)."""
    d = _t_wide(spark, sf_dir, "documents")
    first5 = F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 5), " ")
    return d.select("doc_id", F.sha2(first5, 256).alias("fingerprint"))


def q14_quality_score(spark, sf_dir):
    """Training-data op: quality scoring — stopword ratio + mean token len."""
    d = _t_wide(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    stop = F.array(F.lit("the"), F.lit("a"), F.lit("and"), F.lit("of"))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return d.select(
        "doc_id",
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
        F.round(F.length(F.trim("text")).cast("double") / F.size(toks), 6).alias(
            "chars_per_token"
        ),
    )


def q15_cosine_topk(spark, sf_dir):
    """Similarity search: brute-force cosine top-10 against a fixed query
    vector (F.aggregate/zip_with dot product, double precision)."""
    em = _t_wide(spark, sf_dir, "embeddings")
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]  # deterministic query
    qcol = F.array([F.lit(float(x)) for x in q])
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(emb_d, qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(
        F.aggregate(
            F.transform(emb_d, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    norm_q = float(sum(x * x for x in q)) ** 0.5
    sim = dot / (norm_a * F.lit(norm_q))
    return (
        em.select("vec_id", F.round(sim, 4).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


def q16_minhash_bands(spark, sf_dir):
    """Dedup via MinHash+LSH banding (portable sha256-prefix hash kernel so
    DuckDB oracles it exactly): shingle → 16 minhashes → 4 bands →
    candidate buckets with >1 doc."""
    from gc_spark.operators.text_dedup import minhash_lsh_candidates

    d = _t_wide(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", portable=True, ids_as_csv=True
    )


def q17_simhash(spark, sf_dir):
    """Dedup via 60-bit SimHash — pure JVM expressions, DuckDB-oracled."""
    from gc_spark.operators.text_dedup import simhash

    d = _t_wide(spark, sf_dir, "documents")
    return simhash(d, text_col="text", id_col="doc_id")


def q18_url_canonicalize(spark, sf_dir):
    """C2-C5: URL kernels over a synthesized URL column."""
    from gc_spark.functions.urls import file_extension_col
    from gc_spark.functions.hashing import url_hash64

    p = _t(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://Example.MIL/files/"),
        F.regexp_replace("p_name", " ", "_"),
        F.lit(".pdf"),
    )
    return p.select(
        "p_partkey",
        F.lower(url).alias("canonical_url"),
        file_extension_col(url).alias("ext"),
    )


def q19_ann_lsh(spark, sf_dir):
    """Similarity: multi-table LSH ANN. Probing is sized (8 tables × Hamming
    ≤2) so the candidate set provably covers the exact top-10 at test scale —
    the oracle is then the same SQL as exact brute-force cosine top-k."""
    from gc_spark.operators.similarity import lsh_bucket_ann

    em = _t_wide(spark, sf_dir, "embeddings")
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    return lsh_bucket_ann(em, q, k=10, num_planes=8, probe_bits=2, num_tables=8)


def q20_near_dup_embeddings(spark, sf_dir):
    """Dedup: embedding-cosine near-dup pairs via LSH self-join. The base
    fixture has no pairs ≥0.9, so plant deterministic near-dups (every 50th
    vector rescaled by 0.5 — scaling preserves the sign-bit signature EXACTLY
    and cosine=1.0, so the LSH path is guaranteed to recover each planted
    pair); the oracle is the honest quadratic pair join."""
    from gc_spark.operators.similarity import embedding_near_dup_pairs

    em = _t_wide(spark, sf_dir, "embeddings")
    planted = em.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
        "label",
    )
    un = em.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    ).unionByName(planted)
    return embedding_near_dup_pairs(un, threshold=0.9, num_planes=10, dim=64)


def q21_media_metadata(spark, sf_dir):
    """Multimodal: binary column → typed metadata via mapInPandas. Blobs are
    the utf-8 bytes of documents.text (deterministic), so the fake decoder's
    width/height/byte_len are SQL-expressible."""
    from gc_spark.operators.multimodal import extract_media_metadata

    d = _t_wide(spark, sf_dir, "documents")
    media = d.select(
        F.concat(F.lit("blob://doc/"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("blob"),
    )
    return extract_media_metadata(media).select(
        "media_ref", "byte_len", "width", "height"
    )


def q22_frame_sample(spark, sf_dir):
    """Multimodal: video frame sampling — 1 row → ≤8 frame rows. The fake
    decoder is a pure function of the blob length, so the row expansion and
    per-frame byte counts are SQL-expressible (oracled)."""
    from gc_spark.operators.multimodal import sample_video_frames

    d = _t_wide(spark, sf_dir, "documents")
    vids = d.select(
        F.concat(F.lit("blob://vid/"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.encode("text", "utf-8").alias("blob"),
    )
    return sample_video_frames(vids, every_n=40, max_frames=8).select(
        "media_ref", "frame_idx", F.length("frame_blob").alias("frame_bytes")
    )


def q23_first_supported(spark, sf_dir):
    """W2/F4: first-supported-downloadable pick over a built array column."""
    from gc_spark.operators.enrich import first_supported_item

    p = _t(spark, sf_dir, "part")
    mk = lambda t: F.struct(  # noqa: E731
        F.lit(t).alias("doc_type"),
        F.concat(F.lit("https://x.mil/"), F.col("p_partkey").cast("string"), F.lit("." + t)).alias("download_url"),
        F.lit(None).cast("string").alias("compression_type"),
    )
    items = F.when(
        F.col("p_partkey") % 5 == 0, F.array(mk("exe"), mk("docx"))
    ).otherwise(F.array(mk("exe"), mk("pdf"), mk("zip")))
    out = first_supported_item(p.withColumn("downloadable_items", items))
    return out.select(
        "p_partkey", F.col("file_item.download_url").alias("picked_url")
    )


def q24_enrich_defaults(spark, sf_dir):
    """J3: broadcast enrich join + coalesce of item-level over defaults."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    enriched = o.join(
        F.broadcast(c.select("c_custkey", "c_name", "c_nationkey")),
        o["o_custkey"] == c["c_custkey"],
        "left",
    )
    return enriched.select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("UNKNOWN")).alias("display_name"),
        F.coalesce("c_nationkey", F.lit(-1)).cast("bigint").alias("nation"),
    )


def q25_union_sources(spark, sf_dir):
    """§2.7: multi-source union into one feed (unionByName + distinct)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "view").select("user_id")
    return a.unionByName(b).distinct()


def q26_carry_forward(spark, sf_dir):
    """W1 variant: last non-null carry-forward (prev_doc_num semantics —
    appendix rows inherit the preceding title's number)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(val, ignorenulls=True).over(w), 2).alias("last_purchase_value"),
    )


def q27_domain_scope(spark, sf_dir):
    """F7: allowed-domains offsite filter (subdomain-aware) over synthesized
    hosts — gc_spark.functions.urls.in_allowed_domains_col."""
    from gc_spark.functions.urls import in_allowed_domains_col

    n = _t(spark, sf_dir, "nation")
    host = F.concat(F.lower(F.regexp_replace("n_name", r"[^A-Za-z]", "")), F.lit(".example.mil"))
    allowed = F.when(
        F.col("n_nationkey") % 2 == 0, F.array(F.lit("example.mil"))
    ).otherwise(F.array(F.lit("other.gov")))
    df = n.select(
        "n_nationkey",
        host.alias("host"),
        in_allowed_domains_col(host, allowed).alias("in_scope"),
    )
    return df


def q28_robots_prefix(spark, sf_dir):
    """Robots disallow-prefix filtering semantics as a standalone op: drop
    rows whose synthesized path starts with a disallowed prefix."""
    o = _t(spark, sf_dir, "orders")
    path = F.concat(F.lit("/"), F.lower("o_orderpriority"), F.lit("/"), F.col("o_orderkey").cast("string"))
    disallow = F.array(F.lit("/1-urgent"), F.lit("/3-medium"))
    blocked = F.exists(disallow, lambda p: path.startswith(p))
    return o.select("o_orderkey", path.alias("path")).filter(~blocked)


def q29_artifact_paths(spark, sf_dir):
    """S12 binary-sink file layout (operators/explode.artifact_download_path_col,
    reference pipelines.py:235-250): compressed items get a compression
    suffix; jbook 'type;year;name' items become 'type/year/name' paths;
    everything else keeps its name. Names synthesized from `part` to cover
    all three branches."""
    from gc_spark.operators.explode import artifact_download_path_col

    p = _t(spark, sf_dir, "part")
    shape = F.pmod("p_partkey", F.lit(3))
    base = F.regexp_replace("p_name", " ", "_")
    name = (
        F.when(shape == 0,
               F.concat(F.lit("rdte;"),
                        (F.pmod("p_partkey", F.lit(30)) + F.lit(1995)).cast("string"),
                        F.lit(";"), base))
        .when(shape == 1, base)
        .otherwise(F.concat(base, F.lit(".pdf")))
    )
    comp = F.when(shape == 2, F.lit("zip")).otherwise(F.lit(None).cast("string"))
    return p.select(
        "p_partkey",
        name.alias("output_file_name"),
        artifact_download_path_col(name, comp).alias("artifact_path"),
    )


def q30_span_flatten(spark, sf_dir):
    """Interleaved span model (input-hint shape): build deterministic
    text+media spans from flat text (operators/spans.build_interleaved_spans)
    and flatten to one row per span — order carried by span_offset, never by
    row order. 80-char text chunks; a media span follows every 3rd chunk."""
    from gc_spark.operators.spans import build_interleaved_spans, flatten_spans

    d = _t_wide(spark, sf_dir, "documents")
    return flatten_spans(build_interleaved_spans(d))


def q31_span_fingerprint(spark, sf_dir):
    """Span-sequence equality (the north-rule invariant: kind, text,
    media_ref, order) as one comparable value per document. Routes through
    the FULL roundtrip — build → flatten → regroup (shuffle) → reorder →
    sha256 — so the oracle checks that span order survives a shuffle."""
    from gc_spark.operators.spans import (
        build_interleaved_spans,
        flatten_spans,
        span_sequence_fingerprint,
        spans_from_rows,
    )

    d = _t_wide(spark, sf_dir, "documents")
    spans = build_interleaved_spans(d)
    return span_sequence_fingerprint(spans_from_rows(flatten_spans(spans)))


def q32_ivf_ann(spark, sf_dir):
    """Similarity: IVF (inverted-file) ANN — deterministic k-means coarse
    quantizer, probe nprobe=2 of 8 cells, exact rerank inside. Planted
    duplicates of the query vector (scaled by exact binary factors) make the
    exact top-10 recoverable BY CONSTRUCTION: nearest-centroid assignment is
    scale-invariant, so every planted vector lands in the query's own cell
    and nprobe>=1 covers them — the oracle is honest exact brute-force
    cosine top-k over the same union. Natural-data recall properties are
    pinned separately in pytest (tests/test_operators.py)."""
    from gc_spark.operators.similarity import ivf_ann, train_ivf_centroids

    em = _t_wide(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    planted = spark.range(12).select(
        (F.col("id") + 20_000_000).alias("vec_id"),
        F.array(
            *[((F.lit(2.0) + F.col("id").cast("double")) / F.lit(4.0)) * F.lit(float(x)) for x in q]
        ).alias("embedding"),
    )
    un = em.unionByName(planted)
    cents = train_ivf_centroids(un, num_cells=8, dim=64, iters=1)
    return ivf_ann(un, q, cents, k=10, nprobe=2)


def q33_jaccard_pairs(spark, sf_dir):
    """Dedup: exact n-gram Jaccard confirm on MinHash+LSH candidate pairs
    (the cheap-filter/exact-confirm split). Near-dup docs are planted (every
    25th doc re-appears with one appended token → jaccard ≈ (n-2)/n); the
    oracle reproduces the IDENTICAL portable-kernel LSH banding in SQL, so
    both sides verify the same candidate set — no banding-recall gap."""
    from gc_spark.operators.text_dedup import jaccard_verify_pairs, minhash_lsh_candidates

    d = _t_wide(spark, sf_dir, "documents").select("doc_id", "text")
    un = _with_planted_docs(d)
    cands = minhash_lsh_candidates(un, portable=True)
    return jaccard_verify_pairs(un, cands, threshold=0.5)


def q36_dup_clusters(spark, sf_dir):
    """Dedup cluster formation: connected components over the verified
    near-dup pairs of q33 via iterative min-label propagation
    (operators/text_dedup.dup_clusters, 3 rounds = components of diameter
    <=3, plenty for LSH near-clique clusters; the operator then CONFIRMS
    convergence via a label-set checksum and keeps propagating if a
    pathological long-chain component remains — enforced, not assumed).
    Oracle: recursive CTE walking labels along edges to depth 3 — equal to
    the converged result because LSH dup components here have diameter <=3
    (q39's FIXPOINT oracle over the same pairs independently pins the true
    components)."""
    from gc_spark.operators.text_dedup import dup_clusters

    return dup_clusters(q33_jaccard_pairs(spark, sf_dir), iters=3)


def q39_connected_components(spark, sf_dir):
    """Exact connected components over the q33 near-dup pairs via
    alternating large-star/small-star rounds (text_dedup.connected_components)
    — the O(log^2 n)-round scale path (q36's plain propagation is the
    O(diameter) baseline). Oracle: a FIXPOINT recursive CTE (UNION
    semantics) computing transitive-closure minima — round counts don't
    matter, only the true components."""
    from gc_spark.operators.text_dedup import connected_components

    return connected_components(q33_jaccard_pairs(spark, sf_dir))


def q37_rolling_hash(spark, sf_dir):
    """Training-data op: Rabin-Karp document fingerprint — polynomial
    rolling hash over characters, h = fold(h*257 + code) mod 2^31-1
    (gc_spark.functions.text.rolling_hash_col; exact int64 both engines)."""
    from gc_spark.functions.text import rolling_hash_col

    d = _t_wide(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_hash_col(F.col("text")).alias("rolling_hash"))


def q38_bpe_tokens(spark, sf_dir):
    """Training-data op: BPE-ish pre-tokenization (word runs | single
    symbols) — token count and distinct-token count per doc
    (gc_spark.functions.text.bpe_ish_tokens_col)."""
    from gc_spark.functions.text import bpe_ish_tokens_col

    d = _t_wide(spark, sf_dir, "documents")
    toks = bpe_ish_tokens_col(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def q40_windowed_rate(spark, sf_dir):
    """§2.10 watermark/window semantics, batch-oracled: tumbling 1-hour
    windows per event_type (the discovery-rate metric the streaming drain
    emits) — F.window vs DuckDB time_bucket."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "avg_value")
    )


def q41_sessionize(spark, sf_dir):
    """Gap-based sessionization — the batch twin of the stateful streaming
    session operator: a >30-minute silence starts a new session; session_id
    = cumulative count of session starts per user (lag + windowed sum, all
    native)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic keeps NTZ timestamps timezone-free on both engines
    gap = F.col("ts") - F.lag("ts").over(w)
    is_new = F.when(
        gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )


def q42_robots_parse(spark, sf_dir):
    """robots.txt body → (host, disallow) rules table
    (operators/robots.parse_robots): one expression fold per body with
    User-agent GROUP semantics (a run of consecutive UA lines is one group,
    active if any agent is '*'). Bodies are synthesized per nation host —
    wrong-agent sections, empty Disallow, trailing comments, and a
    multi-agent group are all covered. Oracle reconstructs the same group
    semantics with window functions."""
    from gc_spark.operators.robots import parse_robots

    n = _t(spark, sf_dir, "nation")
    host = F.concat(
        F.lower(F.regexp_replace("n_name", r"[^A-Za-z]", "")), F.lit(".example.mil")
    )
    key = F.col("n_nationkey").cast("string")
    body = F.concat(
        F.lit("User-agent: googlebot\nDisallow: /g/\n"),
        F.lit("User-agent: *\nDisallow: /p"), key, F.lit("/\nDisallow:\n"),
        F.when(
            F.col("n_nationkey") % 2 == 1,
            F.lit("User-agent: badbot\nUser-agent: *\nDisallow: /extra/   # comment\n"),
        ).otherwise(F.lit("")),
    )
    return parse_robots(n.select(host.alias("host"), body.alias("body")))


def q43_sitemap_stale(spark, sf_dir):
    """Sitemap-driven incremental recrawl (operators/sitemap.py): parse
    synthesized sitemap bodies into (url, lastmod) entries, then select only
    never-seen or lastmod-newer-than-fetch URLs against a seen manifest —
    new entries (key%5==0 missing from seen), updated entries (key%3==0:
    lastmod 2024 > fetched 2023), and current entries (dropped)."""
    from gc_spark.operators.sitemap import parse_sitemap, stale_urls

    p = _t(spark, sf_dir, "part")
    key = F.col("p_partkey")
    url = F.concat(F.lit("https://x.mil/doc/"), key.cast("string"))
    lastmod = F.when(key % 3 == 0, F.lit("2024-02-01")).otherwise(F.lit("2023-01-01"))
    entry = F.concat(
        F.lit("<url>\n  <loc>"), url, F.lit("</loc>\n"),
        F.when(key % 7 != 0, F.concat(F.lit("  <lastmod>"), lastmod, F.lit("</lastmod>\n"))).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    sitemaps = p.groupBy((key % 10).alias("_shard")).agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws("\n", F.collect_list(entry)),
            F.lit("</urlset>"),
        ).alias("body")
    )
    seen = p.filter(key % 5 != 0).select(
        F.concat(F.lit("https://x.mil/doc/"), key.cast("string")).alias("url"),
        F.lit("2023-06-01").alias("fetched_at"),
    )
    return stale_urls(parse_sitemap(sitemaps), seen)


def q44_salted_distinct(spark, sf_dir):
    """Skew-safe exact distinct count (operators/skew.salted_distinct_count):
    distinct users per event_type where the hot type would otherwise funnel
    through one reducer — phase 1 groups on (key, hash(value)%16), phase 2
    sums the disjoint per-bucket counts. Oracle: plain COUNT(DISTINCT)."""
    from gc_spark.operators.skew import salted_distinct_count

    ev = _t(spark, sf_dir, "events")
    return salted_distinct_count(
        ev, ["event_type"], "user_id", buckets=16, out_col="n_users"
    )


def q45_percentiles(spark, sf_dir):
    """Distribution stats per key: exact linear-interpolation percentiles
    (Spark `percentile` == DuckDB quantile_cont, bit-equal at 4 dp). At
    100 TB the drop-in scale path is approx_percentile (t-digest sketch,
    mergeable map-side state) — exact percentile shuffles every value; the
    exact form is the verifier here, same split as brute-force vs LSH ANN."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )


def q46_repetition_flags(spark, sf_dir):
    """Training-data op: Gopher-style repetition metrics — the most frequent
    word-bigram's share of all bigrams (boilerplate/keyword-stuffing
    detector) and the duplicate-word fraction, plus the resulting quality
    flag (Rae et al. thresholds). Per-row array expressions, map-side only
    (functions/text.top_ngram_frac_col, dup_word_frac_col)."""
    from gc_spark.functions.text import dup_word_frac_col, top_ngram_frac_col

    d = _t_wide(spark, sf_dir, "documents")
    top2 = top_ngram_frac_col(F.col("text"), 2)
    dupw = dup_word_frac_col(F.col("text"))
    return d.select(
        "doc_id",
        top2.alias("top_bigram_frac"),
        dupw.alias("dup_word_frac"),
        ((top2 > 0.2) | (dupw > 0.9)).alias("flagged"),
    )


def q47_pii_redact(spark, sf_dir):
    """Training-data op: PII scrub — emails/phone-shaped digit runs planted
    deterministically (doc_id mod 7 / mod 11), then redacted to typed
    placeholders with RE2-safe regexes (functions/text.redact_pii_col).
    Returns per-doc PII counts + sha256 of the redacted text so the oracle
    pins the exact rewritten bytes without shipping them."""
    from gc_spark.functions.text import (
        EMAIL_PATTERN,
        PHONE_PATTERN,
        count_pattern_col,
        redact_pii_col,
    )

    d = _t_wide(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.mil")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(" call 555-"), F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        count_pattern_col(planted, EMAIL_PATTERN).alias("n_emails"),
        count_pattern_col(planted, PHONE_PATTERN).alias("n_phones"),
        F.sha2(redact_pii_col(planted), 256).alias("redacted_sha"),
    )


def q48_decontaminate(spark, sf_dir):
    """Training-data op: benchmark decontamination — flag corpus docs whose
    word 5-grams overlap a held-out benchmark slice (doc_id mod 97 == 0),
    GPT-3-style exact n-gram check (operators/decontam.ngram_decontaminate:
    benchmark grams broadcast, corpus never shuffles). A fixed leak phrase
    is planted in every benchmark doc AND in corpus docs with doc_id mod
    41 == 3, so the fixture has known contamination, not just the rare
    natural 5-gram collisions of the synthetic vocabulary."""
    from gc_spark.operators.decontam import ngram_decontaminate

    d = _t_wide(spark, sf_dir, "documents")
    leak = " alpha bravo charlie delta echo"
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when((F.col("doc_id") % 97 == 0) | (F.col("doc_id") % 41 == 3), F.lit(leak))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    bench = planted.filter(F.col("doc_id") % 97 == 0)
    corpus = planted.filter(F.col("doc_id") % 97 != 0)
    return ngram_decontaminate(corpus, bench, n=5)


def q49_winnow_fingerprints(spark, sf_dir):
    """Training-data op: winnowing fingerprints (Schleimer et al. — the MOSS
    local-similarity algorithm): per-character-8-gram portable 60-bit hashes,
    window-of-4 minima, sorted distinct set (functions/text.
    winnow_fingerprints_col). Complements minhash: guarantees detection of
    any shared substring >= k+w-1 chars, so it catches partial-overlap/
    quotation duplication that whole-document minhash misses. The array is
    csv-rendered so the oracle's value hash is comparable."""
    from gc_spark.functions.text import winnow_fingerprints_col

    d = _t_wide(spark, sf_dir, "documents")
    fp = winnow_fingerprints_col(F.col("text"), k=8, w=4)
    return d.select(
        "doc_id",
        F.size(fp).alias("n_fp"),
        F.array_join(F.transform(fp, lambda x: x.cast("string")), ",").alias("fp_csv"),
    )


def q50_line_dedup(spark, sf_dir):
    """Training-data op: corpus-level line dedup (C4/CCNet boilerplate
    removal, operators/linedup.dedup_lines) — fixed-width word chunks stand
    in for lines (the synthetic corpus has no newlines); an 8-word
    boilerplate "banner" is planted as a prefix on every doc_id%4==0 doc so
    the fixture has guaranteed cross-doc repeats (short tail chunks also
    collide naturally). Lines occurring in >=5 distinct docs are removed;
    kept_sha pins the exact surviving bytes in original order."""
    from gc_spark.operators.linedup import dedup_lines

    d = _t_wide(spark, sf_dir, "documents")
    boiler = "terms of use privacy policy all rights reserved"
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat(F.lit(boiler + " "), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup_lines(planted, min_docs=5)


def q51_char_entropy(spark, sf_dir):
    """Training-data op: character-level Shannon entropy (bits/char,
    functions/text.char_entropy_col) — the quality tail-filter that catches
    degenerate repeats (near 0) and base64/binary junk (>5) which
    length/stopword ratios miss. Pure map-side array expressions."""
    from gc_spark.functions.text import char_entropy_col

    d = _t_wide(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(char_entropy_col(F.col("text")), 4).alias("entropy_bits"),
    )


def q52_pagerank(spark, sf_dir):
    """Crawl-frontier prioritization: PageRank over a 50-node host graph
    synthesized deterministically from events (operators/pagerank.pagerank)
    — 5 power iterations with damping 0.85 and full dangling-mass
    redistribution, dangling scalar kept inside the dataflow (no per-round
    driver collects). Oracle: the same 5 iterations as chained SQL CTEs."""
    from gc_spark.operators.pagerank import pagerank

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    pr = pagerank(edges, iters=5, damping=0.85)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def q53_tfidf_topterms(spark, sf_dir):
    """Keyword extraction: top-3 tf-idf terms per doc (operators/tfidf.
    tfidf_top_terms) — doc-frequency table broadcast onto the term counts,
    corpus size as a 1-row crossJoin broadcast, scores rounded BEFORE the
    rank window so both engines order identical values."""
    from gc_spark.operators.tfidf import tfidf_top_terms

    d = _t_wide(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=3)


def q54_stratified_sample(spark, sf_dir):
    """Deterministic corpus mixing: per-language Bernoulli sample keyed on a
    salted portable hash (operators/sampling.stratified_sample) — en kept at
    50%, other languages at 20%; membership is a pure map-side filter,
    reproducible across runs/partitionings, and the oracle re-derives it
    row-for-row."""
    from gc_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(5000)).otherwise(F.lit(2000))
    return stratified_sample(d, rate, salt="smp1").select("doc_id", "lang")


def q55_reservoir_sample(spark, sf_dir):
    """Deterministic reservoir: exactly 5 docs per source, drawn by salted-
    hash order (operators/sampling.reservoir_topk — two-phase salted window,
    politeness-drain skew shape). Equivalent in distribution to reservoir
    sampling but associative and restartable."""
    from gc_spark.operators.sampling import reservoir_topk

    d = _t(spark, sf_dir, "documents")
    return reservoir_topk(d, ["source"], k=5, salt="rsv").select(
        "doc_id", "source", "sample_rank"
    )


def q56_recrawl_priority(spark, sf_dir):
    """Adaptive recrawl scheduling (operators/recrawl.recrawl_priority):
    Cho & Garcia-Molina bias-corrected Poisson change-rate per URL from its
    fetch history, then P(changed since last fetch) as the refetch drain
    priority. events = the fetch log (user_id ~ url, click ~ content
    changed); 'now' pinned to max(ts)+1h inside the dataflow."""
    from gc_spark.operators.recrawl import recrawl_priority

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("url_id"),
        "ts",
        (F.col("event_type") == "click").alias("changed"),
    )
    return recrawl_priority(log)


def q57_trap_detect(spark, sf_dir):
    """Crawler-trap detection (operators/traps.detect_traps): URLs
    synthesized from orders — every host serves 40 paths, but host h7 mints
    a unique ?session= per URL (the classic session-id trap) while the rest
    reuse a tiny ?page= set. Flag = distinct-URLs/distinct-paths above
    threshold."""
    from gc_spark.operators.traps import detect_traps

    o = _t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://h"),
        (F.col("o_custkey") % 20).cast("string"),
        F.lit(".example.mil/p/"),
        (F.col("o_orderkey") % 40).cast("string"),
        F.when(
            F.col("o_custkey") % 20 == 7,
            F.concat(F.lit("?session="), F.col("o_orderkey").cast("string")),
        )
        .when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(F.lit("?page="), (F.col("o_orderkey") % 2).cast("string")),
        )
        .otherwise(F.lit("")),
    )
    return detect_traps(o.select(url.alias("url")), max_urls_per_path=5.0, min_urls=20)


def q58_skew_profile(spark, sf_dir):
    """Frontier skew profiler (operators/traps.skew_profile): per-host row
    counts + batch share + the recommended politeness salt_buckets
    (ceil(rows/target), capped) — the data-driven version of the engine's
    salted windows. Host h0 is planted hot (~53% of rows)."""
    from gc_spark.operators.traps import skew_profile

    ev = _t(spark, sf_dir, "events")
    host = F.concat(
        F.lit("h"),
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id") % 16)
        .cast("string"),
    )
    return skew_profile(
        ev.select(host.alias("host")), target_rows_per_task=500, max_buckets=8
    )


def q59_lm_xent(spark, sf_dir):
    """CCNet-style quality scoring: per-doc token cross-entropy under a
    corpus-trained unigram LM (operators/lm) — the LM is vocabulary-sized
    and broadcast; the corpus shuffles once for the per-doc aggregate."""
    from gc_spark.operators.lm import cross_entropy_score, unigram_lm

    d = _t_wide(spark, sf_dir, "documents")
    return cross_entropy_score(d, unigram_lm(d))


def q60_canonical_docs(spark, sf_dir):
    """End-to-end dedup decision: LSH candidates -> exact-jaccard pairs
    (q33) -> cluster formation (q36's operator) -> keep the highest-quality
    member per cluster, quality = text length, ties to min doc_id
    (operators/text_dedup.select_canonical). The planted '+extraword'
    copies are LONGER than their originals, so the keep flags prove the
    quality ordering is real (the copy wins, not the lower id)."""
    from gc_spark.operators.text_dedup import dup_clusters, select_canonical

    clusters = dup_clusters(q33_jaccard_pairs(spark, sf_dir), iters=3)
    d = _t_wide(spark, sf_dir, "documents").select("doc_id", "text")
    quality = _with_planted_docs(d).select(
        "doc_id", F.length("text").alias("quality")
    )
    return select_canonical(clusters, quality)


def q61_budget_allocation(spark, sf_dir):
    """The rank -> budget -> drain loop closed: PageRank over the q52 host
    graph turned into per-host politeness budgets (operators/pagerank.
    allocate_budgets) — proportional-to-rank, floored (every host
    progresses) and capped (no host monopolizes the batch); the output is
    exactly politeness.topk_per_host's host_budgets input."""
    from gc_spark.operators.pagerank import allocate_budgets, pagerank

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    return allocate_budgets(
        pagerank(edges, iters=5, damping=0.85),
        total_budget=10_000,
        min_budget=5,
        max_budget=500,
    )


def q62_redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution by pointer doubling (operators/redirects.
    resolve_redirects): chains of up to 5 hops synthesized from part
    (edges k->k+1 within each 8-block) plus a planted 2-cycle; log2(8)=3
    self-joins resolve every chain, the cycle comes back resolved=false
    with the pointer state after 8 followed edges — bit-equal to the
    oracle's bounded recursive walk."""
    from gc_spark.operators.redirects import resolve_redirects

    p = _t(spark, sf_dir, "part")
    chain = p.filter(F.col("p_partkey") % 8 < 5).select(
        F.col("p_partkey").cast("long").alias("src"),
        (F.col("p_partkey") + 1).cast("long").alias("dst"),
    )
    cycle = spark.range(1).select(
        F.lit(10_000_001).cast("long").alias("src"),
        F.lit(10_000_002).cast("long").alias("dst"),
    ).unionByName(
        spark.range(1).select(
            F.lit(10_000_002).cast("long").alias("src"),
            F.lit(10_000_001).cast("long").alias("dst"),
        )
    )
    return resolve_redirects(chain.unionByName(cycle), max_hops=8)


def q63_crawl_delay_budget(spark, sf_dir):
    """Robots-compliant politeness budgets (operators/robots.
    parse_crawl_delay + budgets_from_crawl_delay): per-host Crawl-delay
    extracted with the same User-agent group fold as the disallow rules
    (wrong-agent delays ignored, first active declaration wins, fractional
    values), then budget_per_batch = floor(batch_seconds/delay) clamped.
    Hosts without a declared delay default to 1s."""
    from gc_spark.operators.robots import budgets_from_crawl_delay, parse_crawl_delay

    n = _t(spark, sf_dir, "nation")
    host = F.concat(
        F.lit("n"), F.col("n_nationkey").cast("string"), F.lit(".example.mil")
    )
    key = F.col("n_nationkey")
    body = F.concat(
        # wrong-agent group: its delay must be ignored
        F.lit("User-agent: googlebot\nCrawl-delay: 99\nDisallow: /g/\n"),
        F.lit("User-agent: *\nDisallow: /p/\n"),
        F.when(
            key % 3 == 0,
            F.concat(
                F.lit("Crawl-delay: "),
                (F.lit(0.5) + (key % 4).cast("double")).cast("string"),
                F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
        # a SECOND active group declaring a different delay: first wins
        F.when(
            key % 6 == 0,
            F.lit("User-agent: *\nCrawl-delay: 30\n"),
        ).otherwise(F.lit("")),
    )
    delays = parse_crawl_delay(n.select(host.alias("host"), body.alias("body")))
    return budgets_from_crawl_delay(
        delays, batch_seconds=60.0, max_budget=100, keep_delay=True
    )


def q64_inverted_index(spark, sf_dir):
    """Search-index sink: positional inverted index over the corpus
    (operators/inverted.inverted_index) — one (term, doc) shuffle, postings
    rendered as deterministic sorted bytes; segments=1 keeps the
    oracle-comparable single-row-per-term form (production partitions by
    hash(doc) segment, Lucene-style)."""
    from gc_spark.operators.inverted import inverted_index

    d = _t_wide(spark, sf_dir, "documents")
    return inverted_index(d)


def q65_bigram_pmi(spark, sf_dir):
    """Collocation extraction: PMI over adjacent token pairs
    (operators/collocations.bigram_pmi) — phrase discovery for the
    tokenizer/vocab step; unigram table broadcast onto the min_count-
    filtered candidates, totals as 1-row broadcasts."""
    from gc_spark.operators.collocations import bigram_pmi

    d = _t_wide(spark, sf_dir, "documents")
    return bigram_pmi(d, min_count=5)


def q66_cdc_chunks(spark, sf_dir):
    """Delta-storage primitive: content-defined chunking (functions/text.
    cdc_chunks_col, rsync/LBFS lineage) — cut points wherever the 8-char
    window hash % 32 == 0, so an edit shifts only the chunks it touches;
    recrawl storage keeps chunk hashes per URL and re-uploads only new
    ones. Emits per-doc chunk count + the portable chunk-hash bytes."""
    from gc_spark.functions.text import cdc_chunks_col

    d = _t_wide(spark, sf_dir, "documents")
    ch = cdc_chunks_col(F.col("text"))
    return d.select(
        "doc_id",
        F.size(ch).alias("n_chunks"),
        F.array_join(
            F.transform(ch, lambda x: x["chunk_sha"].cast("string")), ","
        ).alias("chunk_shas"),
    )


def q67_length_buckets(spark, sf_dir):
    """Curriculum/mixing assignment: quartile buckets of document length
    (operators/sampling.quantile_buckets) — exact-percentile cutpoints
    broadcast onto a map-only corpus pass instead of a global-sort ntile;
    t-digest approx_percentile is the documented 10^10 swap-in."""
    from gc_spark.operators.sampling import quantile_buckets

    d = _t(spark, sf_dir, "documents")
    return quantile_buckets(d, "n_chars").select("doc_id", "n_chars", "bucket")


def q68_bpe_merges(spark, sf_dir):
    """Tokenizer-vocabulary induction: 3 rounds of word-level BPE merge
    learning (operators/bpe.learn_bpe_merges) — per round, the most
    frequent adjacent pair (deterministic tie-break) is merged corpus-wide
    via an engine-portable padded-space substring replace over the weighted
    distinct-text contraction. Top pair enters the rewrite as a 1-row
    broadcast, never a collect; the byte-exact corpus-sha audit path is
    opt-in (`audit=True`, unit-tested) and stays out of the scale path."""
    from gc_spark.operators.bpe import learn_bpe_merges

    d = _t_wide(spark, sf_dir, "documents")
    return learn_bpe_merges(d, rounds=3)


def q69_hits(spark, sf_dir):
    """Link-analysis twin of q52: HITS hubs & authorities (operators/hits.
    hits) over the same 50-node host graph — 3 iterations, L1-normalized
    each half-step, normalizing sums as 1-row broadcast aggregates (no
    driver collects in the loop). Hub score ranks listing/index pages for
    re-crawl frequency; authority ranks fetch priority."""
    from gc_spark.operators.hits import hits

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    s = hits(edges, iters=3)
    return s.select("node", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth"))


def q70_semantic_dedup(spark, sf_dir):
    """SemDeDup (similarity.semantic_dedup): cluster in embedding space
    (deterministic 8 lowest-id seed centroids — Lloyd refinement is the
    production swap-in, the seed assignment keeps the oracle exact), then
    drop within-cluster cosine-dups keeping the lowest id. Planted dups as
    in q20 (every 50th vector ×0.5 → cosine 1.0, same cell) so the prune
    provably fires; oracle replicates assignment + drop rule row-for-row."""
    from gc_spark.operators.similarity import semantic_dedup, train_ivf_centroids

    em = _t_wide(spark, sf_dir, "embeddings")
    planted = em.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
    )
    un = em.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(planted)
    cents = train_ivf_centroids(un, num_cells=8, iters=0)
    return semantic_dedup(un, cents, threshold=0.9)


def q71_gopher_quality(spark, sf_dir):
    """Gopher-rule quality gate (functions/text.gopher_quality_cols): word
    count / mean word length / symbol ratio / alpha fraction / stopword
    floor, plus the conjunction flag — one codegen'd map pass, the
    LLM-corpus filter you run before anything expensive."""
    from gc_spark.functions.text import gopher_quality_cols

    d = _t_wide(spark, sf_dir, "documents")
    return d.select("doc_id", *gopher_quality_cols(F.col("text")))


def q72_pack_offsets(spark, sf_dir):
    """Training-window packing (operators/packing.pack_offsets): per-source
    concat-and-chunk placement of every doc in its shard's 512-token
    stream — prefix-sum window partitioned by source, one shuffle total.
    Token count = whitespace words (the q12 convention)."""
    from gc_spark.operators.packing import pack_offsets

    d = _t_wide(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
    return pack_offsets(d, ctx_len=512, stream_cols=["source"], order_col="doc_id", tokens_col=toks)


_PACK_ORACLE = """
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), o AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS e
      FROM t
    )
    SELECT source, doc_id, n_tokens,
           e - n_tokens AS start_off,
           CAST(floor((e - n_tokens) / 512.0) AS BIGINT) AS bin_first,
           greatest(CAST(floor((e - 1) / 512.0) AS BIGINT),
                    CAST(floor((e - n_tokens) / 512.0) AS BIGINT)) AS bin_last,
           greatest(CAST(floor((e - 1) / 512.0) AS BIGINT),
                    CAST(floor((e - n_tokens) / 512.0) AS BIGINT))
             - CAST(floor((e - n_tokens) / 512.0) AS BIGINT) + 1 AS n_bins
    FROM o
"""


def q73_span_coalesce(spark, sf_dir):
    """Interleaved-span normalization (operators/spans.coalesce_text_spans):
    runs of consecutive text spans merge into one maximal span (media spans
    are boundaries), offsets renumbered densely — a pure per-row array
    fold, zero shuffle. Coalescing the deterministic builder's chunks
    reconstructs each contiguous text segment exactly."""
    from gc_spark.operators.spans import (
        build_interleaved_spans,
        coalesce_text_spans,
        flatten_spans,
    )

    d = _t_wide(spark, sf_dir, "documents")
    return flatten_spans(coalesce_text_spans(build_interleaved_spans(d)))


def q74_winnow_overlap(spark, sf_dir):
    """Partial-overlap detection (text_dedup.winnow_overlap_pairs): MOSS-
    style pairing over winnowing fingerprints — df-capped rare-key
    self-join, containment score shared/min(|fp|). Catches quotation/
    inclusion duplication whole-doc minhash (q16) misses."""
    from gc_spark.operators.text_dedup import winnow_overlap_pairs

    d = _t_wide(spark, sf_dir, "documents")
    return winnow_overlap_pairs(d, k=8, w=4, max_df=10, min_shared=3)


def q75_anchor_texts(spark, sf_dir):
    """Anchor-text aggregation (operators/anchors.top_anchor_texts): top-3
    anchor texts per link target with per-target in-link totals — counts
    reduce to (target, anchor) cardinality map-side before the rank window,
    so hot targets cost distinct-anchors, not in-links. Links synthesized
    from events on the q52 host graph, anchor = event_type."""
    from gc_spark.operators.anchors import top_anchor_texts

    ev = _t(spark, sf_dir, "events")
    links = ev.select(
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("target"),
        F.col("event_type").alias("anchor"),
    )
    return top_anchor_texts(links, k=3)


def q76_mixture_weights(spark, sf_dir):
    """Corpus mixing: temperature-scaled (alpha=0.7) per-(source, lang)
    sampling weights and expected epoch draws (operators/sampling.
    mixture_weights) — the alpha-sampling scheme multilingual corpora use;
    one corpus scan, totals broadcast in-dataflow."""
    from gc_spark.operators.sampling import mixture_weights

    d = _t(spark, sf_dir, "documents")
    return mixture_weights(d, ["source", "lang"], alpha=0.7)


def q77_asof_state(spark, sf_dir):
    """As-of join (operators/asof.asof_join): every fetch event gets the
    per-host state snapshot in force at its own timestamp (latest snapshot
    ts <= fetch ts) — union + ordered window carry-forward, ONE shuffle on
    host, cost independent of how many state versions a host has. Oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from gc_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    snaps = (
        ev.filter(F.col("event_type") == "error")
        .groupBy((F.col("user_id") % 20).alias("host"), F.col("ts"))
        .agg(F.max("value").alias("budget"))
    )
    fetches = ev.filter(F.col("event_type") != "error").select(
        "event_id", (F.col("user_id") % 20).alias("host"), "ts"
    )
    return asof_join(fetches, snaps, on="host", left_ts="ts", right_ts="ts")


def q78_rendezvous_shards(spark, sf_dir):
    """Frontier sharding (operators/sharding.rendezvous_shard_col): stable
    rendezvous/HRW owner for every document URL across 8 fetcher shards —
    map-only argmax over per-shard hash scores, zero shuffle. Portable
    sha256 scores so the oracle reproduces assignments bit-for-bit
    (production path is xxhash64)."""
    from gc_spark.operators.sharding import assign_shards

    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
    )
    return assign_shards(keyed, "url", num_shards=8, portable=True).select(
        "doc_id", "shard"
    )


def q79_shard_rebalance(spark, sf_dir):
    """Resize cost probe (operators/sharding.reassignment_fraction): the
    fraction of URL keys that change owner when the fetcher fleet grows
    8 → 10 shards — rendezvous hashing's minimal-disruption property,
    measured (expected ≈ 2/10); one map pass + one scalar aggregate."""
    from gc_spark.operators.sharding import reassignment_fraction

    d = _t(spark, sf_dir, "documents")
    keyed = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id").cast("string")
        ).alias("url")
    )
    return reassignment_fraction(keyed, "url", n_before=8, n_after=10, portable=True)


def _rendezvous_cte(num_shards: int, key_expr: str) -> str:
    return (
        f"SELECT doc_id, url, s, CAST(('0x' || substr(sha256(url || '#' || CAST(s AS VARCHAR)), 1, 15)) AS BIGINT) AS sc"
        f" FROM (SELECT doc_id, {key_expr} AS url FROM documents)"
        f" CROSS JOIN (SELECT UNNEST(range(0, {num_shards})) AS s)"
    )


_SHARD_KEY = "'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR)"

_RENDEZVOUS_ORACLE = f"""
    WITH scored AS ({_rendezvous_cte(8, _SHARD_KEY)}),
    r AS (
      SELECT doc_id, CAST(s AS INTEGER) AS shard,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc DESC, s DESC) AS rn
      FROM scored
    )
    SELECT doc_id, shard FROM r WHERE rn = 1
"""

_REBALANCE_ORACLE = f"""
    WITH s8 AS ({_rendezvous_cte(8, _SHARD_KEY)}),
    s10 AS ({_rendezvous_cte(10, _SHARD_KEY)}),
    w8 AS (
      SELECT doc_id, s AS shard FROM (
        SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc DESC, s DESC) AS rn
        FROM s8) WHERE rn = 1
    ), w10 AS (
      SELECT doc_id, s AS shard FROM (
        SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc DESC, s DESC) AS rn
        FROM s10) WHERE rn = 1
    )
    SELECT ROUND(AVG(CASE WHEN w8.shard <> w10.shard THEN 1.0 ELSE 0.0 END), 6) AS moved_frac,
           COUNT(*) AS n_keys
    FROM w8 JOIN w10 ON w8.doc_id = w10.doc_id
"""


def q80_exact_substring_mask(spark, sf_dir):
    """Exact-substring dedup masking (operators/esdedup): per-doc coverage
    of repeated >=8-token runs — stride-1 8-gram flagging (canonical =
    globally first occurrence) + per-doc interval-union fold; the
    distributed re-expression of Lee et al. 2022 suffix-array ESD. One
    gram shuffle with map-side combine (only count>1 grams survive to the
    join), one doc_id regroup, O(k) array fold — no per-token explode."""
    from gc_spark.operators.esdedup import exact_substring_mask_stats

    d = _t(spark, sf_dir, "documents")
    # r6: hash_grams — the gram groupBy shuffles 8-byte xxhash64 keys
    # instead of ~60-byte gram strings (guide §2.3 narrower types), the
    # operator's documented 100 TB path. Collisions over-mask at ~2^-64
    # per pair (none at any tested SF: oracle hash-exact at sf0.01/sf0.1;
    # string==hash equality pinned in test_operators).
    return exact_substring_mask_stats(d, l=8, hash_grams=True).orderBy("doc_id")


_ESD_ORACLE = """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    occ AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             array_to_string(toks[i:i+7], ' ') AS gram
      FROM base, UNNEST(range(1, n_tokens - 8 + 2)) AS t(i)
      WHERE n_tokens >= 8
    ),
    ranked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY gram) AS c,
             ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
      FROM occ
    ),
    flagged AS (
      SELECT doc_id, pos,
             LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM ranked WHERE c > 1 AND rn > 1
    ),
    per_doc AS (
      SELECT doc_id,
             SUM(CASE WHEN prev IS NULL THEN 8 ELSE LEAST(8, pos - prev) END) AS masked_tokens,
             SUM(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END) AS n_masked_spans
      FROM flagged GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           COALESCE(p.masked_tokens, 0) AS masked_tokens,
           COALESCE(p.n_masked_spans, 0) AS n_masked_spans,
           1.0 - CAST(COALESCE(p.masked_tokens, 0) AS DOUBLE)
               / NULLIF(CAST(b.n_tokens AS DOUBLE), 0.0) AS kept_frac
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    ORDER BY b.doc_id
"""


def q81_bm25_topk(spark, sf_dir):
    """BM25 retrieval (operators/bm25.bm25_topk): top-15 docs for a 3-term
    query — postings filtered to query terms right above the scan (a
    |q|/|V| sliver reaches the shuffle), df/N/avgdl broadcast, one global
    k-row top-k. Lucene idf, k1=1.2 b=0.75, scores rounded to 6 dp before
    ranking so the oracle ranks identically."""
    from gc_spark.operators.bm25 import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(d, ["spark", "query", "merge"], k=15)


_BM25_ORACLE = """
    WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
    len AS (SELECT doc_id, array_length(toks) AS dl FROM d),
    stats AS (SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n FROM len),
    post AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM d, UNNEST(toks) AS t(term)
      WHERE term IN ('spark', 'query', 'merge')
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM post GROUP BY term),
    sc AS (
      SELECT p.doc_id,
             SUM(
               ln(1.0 + (s.n - f.dfreq + 0.5) / (f.dfreq + 0.5))
               * p.tf * 2.2
               / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
             ) AS raw
      FROM post p JOIN dfq f USING (term) JOIN len l USING (doc_id) CROSS JOIN stats s
      GROUP BY p.doc_id
    ),
    r AS (
      SELECT doc_id, ROUND(raw, 6) AS score,
             ROW_NUMBER() OVER (ORDER BY ROUND(raw, 6) DESC, doc_id ASC) AS rank
      FROM sc
    )
    SELECT doc_id, score, rank FROM r WHERE rank <= 15
"""


def q82_snapshot_diff(spark, sf_dir):
    """Cross-snapshot delta (operators/snapshot_diff): two deterministic
    snapshot views of documents (old drops doc_id%11==3; new drops
    doc_id%13==5 and appends ' v2' to text of doc_id%10==2) classified
    added/removed/changed by content sha — map-side hashing, one
    full-outer id join, delta-sized output."""
    from gc_spark.operators.snapshot_diff import snapshot_content_diff

    d = _t(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 11 != 3)
    new = d.where(F.col("doc_id") % 13 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 2, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_content_diff(old, new).orderBy("doc_id")


_SNAPDIFF_ORACLE = """
    WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 2 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 13 <> 5
    ),
    j AS (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN sha256(COALESCE(o.text, '')) <> sha256(COALESCE(n.text, '')) THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT doc_id, status FROM j WHERE status <> 'unchanged' ORDER BY doc_id
"""


def q83_budget_select(spark, sf_dir):
    """Token-budget corpus cut (operators/budget_select): per source keep
    the longest docs (n_chars desc, doc_id asc) until 700 tokens are
    spent — one window cumsum per group, greedy prefix with the
    budget-crossing doc kept."""
    from gc_spark.operators.budget_select import token_budget_select

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"),
    )
    return token_budget_select(
        d, budget=700, score_col="n_chars", tokens_col="n_toks"
    ).select("doc_id", "source", "n_toks", "cum_tokens")


_BUDGET_ORACLE = """
    WITH t AS (
      SELECT doc_id, source, n_chars,
             array_length(regexp_split_to_array(trim(text), '\\s+')) AS n_toks
      FROM documents
    ),
    c AS (
      SELECT *, SUM(n_toks) OVER (
        PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_toks, cum_tokens FROM c WHERE cum_tokens - n_toks < 700
"""


def q84_host_reputation(spark, sf_dir):
    """Wilson lower-bound host trust (operators/reputation): per-source
    quality fraction scored with the small-sample-penalizing Wilson
    interval — one host-cardinality groupBy + closed-form arithmetic,
    formula textually mirrored in the oracle so both engines run the same
    IEEE ops."""
    from gc_spark.operators.reputation import host_reputation

    d = _t(spark, sf_dir, "documents")
    return host_reputation(d, good=(F.col("n_chars") >= 250)).orderBy("host")


_REPUTATION_ORACLE = """
    WITH a AS (
      SELECT source AS host, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_good
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT host, n_docs, n_good,
             CAST(n_docs AS DOUBLE) AS n,
             CAST(n_good AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p
      FROM a
    )
    SELECT host, n_docs, n_good,
           ROUND(
             (p + (1.96 * 1.96) / (2.0 * n)
                - 1.96 * sqrt(p * (1.0 - p) / n + (1.96 * 1.96) / (4.0 * n * n)))
             / (1.0 + (1.96 * 1.96) / n), 6) AS wilson_lb,
           ROUND(
             (p + (1.96 * 1.96) / (2.0 * n)
                - 1.96 * sqrt(p * (1.0 - p) / n + (1.96 * 1.96) / (4.0 * n * n)))
             / (1.0 + (1.96 * 1.96) / n), 6) >= 0.5 AS trusted
    FROM w ORDER BY host
"""


def q85_incremental_lsh(spark, sf_dir):
    """Incremental near-dup detection (text_dedup.incremental_lsh_
    candidates): a crawl increment (every 5th doc re-idded +100000, same
    text — guaranteed collisions with its original) banded and joined
    against the stored LSH index; old×old pairs never recomputed. Result
    equals the pairs-involving-new-docs slice of a full recompute (the
    oracle)."""
    from gc_spark.operators.text_dedup import (
        incremental_lsh_candidates,
        lsh_band_rows,
    )

    d = _t(spark, sf_dir, "documents")
    index = lsh_band_rows(d, portable=True)
    new = d.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return incremental_lsh_candidates(index, new, portable=True).orderBy("a", "b")


_INCR_LSH_ORACLE = """
    WITH un AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    ),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                            i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')) AS shingles
      FROM un
    ), pairs AS (
      SELECT doc_id,
             list_transform(shingles, s -> struct_pack(
                 a := CAST('0x' || substr(sha256(s), 1, 14) AS BIGINT),
                 b := CAST('0x' || substr(sha256(s), 15, 14) AS BIGINT))) AS ab
      FROM sh
    ), sig AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
                 list_min(list_transform(ab, p -> p.a + i * p.b))) AS mh
      FROM pairs
    ), bands AS (
      SELECT doc_id, CAST(b AS INT) AS band,
             CAST('0x' || substr(sha256(array_to_string(list_slice(mh, b * 4 + 1, b * 4 + 4), ',')), 1, 15) AS BIGINT) AS band_hash
      FROM (SELECT doc_id, mh, UNNEST(range(0, 4)) AS b FROM sig)
    )
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
    WHERE x.doc_id >= 100000 OR y.doc_id >= 100000
    ORDER BY a, b
"""


def q86_heavy_hitters(spark, sf_dir):
    """Exact top-10 terms in two passes (operators/heavy_hitters): per-
    partition Misra-Gries candidates (map-only, O(capacity) memory), then
    exact counts on the broadcast candidate set — the term stream never
    takes a full groupBy shuffle. Exact because freq(10th) >> N/65 here;
    oracle is the naive exact top-k."""
    from gc_spark.operators.heavy_hitters import exact_topk_terms

    d = _t(spark, sf_dir, "documents")
    return exact_topk_terms(d, k=10, capacity=64)


_HH_ORACLE = """
    WITH t AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term FROM documents
    ),
    c AS (SELECT term, COUNT(*) AS cnt FROM t WHERE term <> '' GROUP BY term),
    r AS (SELECT term, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank FROM c)
    SELECT term, cnt, rank FROM r WHERE rank <= 10
"""


def q87_boilerplate_lines(spark, sf_dir):
    """Host-template detection (operators/boilerplate): per-host line
    document-frequency over a deterministically planted corpus (75% of
    each source's docs get a NAV header + Copyright footer) — per-doc
    distinct lines map-side, one (host,line) groupBy, host doc-counts
    broadcast back. source = f(doc_id%20) correlates with doc_id%4, so 15
    of 20 sources plant at 100% frequency and 5 plant nothing — 30 rows at
    threshold 0.5."""
    from gc_spark.operators.boilerplate import boilerplate_lines

    d = _t(spark, sf_dir, "documents")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 != 0,
            F.concat(
                F.lit("NAV "), F.col("source"), F.lit(" MENU\n"),
                F.col("text"),
                F.lit("\nCopyright "), F.col("source"),
            ),
        ).otherwise(F.col("text")),
    )
    return boilerplate_lines(planted, threshold=0.5).orderBy("host", "line")


_BOILERPLATE_ORACLE = """
    WITH planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 4 <> 0
                  THEN 'NAV ' || source || ' MENU' || chr(10) || text || chr(10) || 'Copyright ' || source
                  ELSE text END AS text
      FROM documents
    ),
    hostn AS (SELECT source AS host, COUNT(*) AS hn FROM planted GROUP BY source),
    lines AS (
      SELECT host, doc_id, line FROM (
        SELECT source AS host, doc_id,
               unnest(list_distinct(string_split(text, chr(10)))) AS line
        FROM planted
      ) WHERE trim(line) <> ''
    ),
    c AS (SELECT host, line, COUNT(*) AS n_docs_with_line FROM lines GROUP BY host, line)
    SELECT c.host, c.line, c.n_docs_with_line,
           ROUND(CAST(n_docs_with_line AS DOUBLE) / CAST(hn AS DOUBLE), 6) AS doc_frac
    FROM c JOIN hostn USING (host)
    WHERE ROUND(CAST(n_docs_with_line AS DOUBLE) / CAST(hn AS DOUBLE), 6) >= 0.5
    ORDER BY host, line
"""


def q88_compression_ratio(spark, sf_dir):
    """zlib compression-ratio quality signal (operators/compress_quality):
    the Gopher-style repetitiveness detector — Arrow-batched pandas UDF
    (the one metric that genuinely needs Python), map-only. No SQL oracle
    (DuckDB has no zlib): driver records the rows-only check; byte-level
    correctness is pinned by unit tests against zlib directly."""
    from gc_spark.operators.compress_quality import compression_ratio

    d = _t(spark, sf_dir, "documents")
    return compression_ratio(d).orderBy("doc_id")


def q89_ewma_failure(spark, sf_dir):
    """Adaptive host health (operators/ewma): geometric-discount failure
    rate per host via the closed form alpha*sum(x_i*(1-alpha)^(n-i)) —
    one rank window + one same-key groupBy (no second exchange), no fold,
    no UDF. The signal an adaptive retry/budget policy keys on."""
    from gc_spark.operators.ewma import ewma_by_group

    e = _t(spark, sf_dir, "events")
    return ewma_by_group(
        e,
        group_col=(F.col("user_id") % 20),
        order_col="ts",
        value=F.when(F.col("event_type") == "error", 1.0).otherwise(0.0),
        alpha=0.3,
    ).orderBy("group")


_EWMA_ORACLE = """
    WITH r AS (
      SELECT user_id % 20 AS g,
             CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS x,
             ROW_NUMBER() OVER (PARTITION BY user_id % 20 ORDER BY ts) AS rn,
             COUNT(*) OVER (PARTITION BY user_id % 20) AS n
      FROM events
    )
    SELECT g AS "group", COUNT(*) AS n_events,
           ROUND(0.3 * SUM(x * pow(1.0 - 0.3, n - rn)), 6) AS ewma
    FROM r GROUP BY g ORDER BY g
"""


def q90_quantization_error(spark, sf_dir):
    """int8 embedding quantization acceptance gate (operators/quantize):
    per-dimension (min,max) via ONE no-explode aggregate (map-side
    partials, 1-row broadcast back), then map-only quantize/dequantize
    and per-vector max-abs-err + MSE in a single array transform."""
    from gc_spark.operators.quantize import quantization_error_stats

    e = _t(spark, sf_dir, "embeddings")
    return quantization_error_stats(e, dim=64).orderBy("vec_id")


def q91_bfs_depth(spark, sf_dir):
    """Multi-source BFS crawl depth (operators/bfs.bfs_depths): link graph
    synthesized from part — chain edges k->k+1 within each 16-block plus
    skip edges k->k+2 from even offsets (so min-depth semantics are
    actually exercised: two paths to most nodes); seeds at block starts.
    Depth cap 6 leaves deep-offset nodes unreached — the crawl-cap filter
    the reference bakes into per-site spider control flow."""
    from gc_spark.operators.bfs import bfs_depths

    p = _t(spark, sf_dir, "part")
    chain = p.filter(F.col("p_partkey") % 16 < 15).select(
        F.col("p_partkey").cast("long").alias("src"),
        (F.col("p_partkey") + 1).cast("long").alias("dst"),
    )
    skip = p.filter(
        (F.col("p_partkey") % 16 <= 13) & (F.col("p_partkey") % 2 == 0)
    ).select(
        F.col("p_partkey").cast("long").alias("src"),
        (F.col("p_partkey") + 2).cast("long").alias("dst"),
    )
    seeds = p.filter(F.col("p_partkey") % 16 == 0).select(
        F.col("p_partkey").cast("long").alias("node")
    )
    return bfs_depths(chain.unionByName(skip), seeds, max_depth=6)


def q92_range_coalesce(spark, sf_dir):
    """Byte-range coalescing (operators/ranges.coalesce_ranges): per-blob
    gaps-and-islands merge of overlapping/near-adjacent (gap<=8) fetch
    ranges before the media wave — one request per island instead of one
    per raw range. Ranges synthesized per lineitem row."""
    from gc_spark.operators.ranges import coalesce_ranges

    li = _t(spark, sf_dir, "lineitem")
    start = ((F.col("l_partkey") % 20) * 50 + F.col("l_linenumber")).cast("long")
    ranges = li.select(
        F.col("l_orderkey").alias("media_ref"),
        start.alias("start"),
        (start + 30 + (F.col("l_suppkey") % 40) * 2).cast("long").alias("end"),
    )
    return coalesce_ranges(ranges, gap=8)


def q93_containment_quotes(spark, sf_dir):
    """Shingle-containment quote detection (operators/containment): planted
    quote docs (first 12 tokens of every 7th document, id+1000000) come
    back contained in their source with containment 1.0; threshold 0.9.
    Exact mode (df_cap=None) so the oracle is the honest inverted join;
    the df-capped prefix-filter path is pinned by the unit test."""
    from gc_spark.operators.containment import containment_pairs

    d = _t(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    quotes = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12), " "
        ).alias("text"),
    )
    return containment_pairs(base.unionByName(quotes), threshold=0.9).orderBy(
        "a", "b"
    )


def q94_ngram_novelty(spark, sf_dir):
    """First-occurrence 5-gram novelty by crawl order (operators/novelty):
    seq = doc_id (stands in for the engine's dense crawl seq); one
    corpus-wide min(seq) per gram hash, joined back. Late mirrors of
    syndicated content score ~0 — the recrawl/curation signal."""
    from gc_spark.operators.novelty import novelty_scores

    # r6: _t_wide — the 5-gram hash/explode is per-row compute that a
    # single-row-group scan would otherwise run in ONE task (guide §1.2)
    d = _t_wide(spark, sf_dir, "documents").select(
        "doc_id", F.col("doc_id").alias("seq"), "text"
    )
    return novelty_scores(d, n=5).orderBy("doc_id")


def q95_robots_wildcards(spark, sf_dir):
    """Full Google-REP robots matching (operators/robots.parse_robots_rules
    + match_robots): wildcard `*`, end-anchor `$`, Allow/Disallow with
    longest-match precedence and allow-on-tie, default-allow. Bodies are
    synthesized per host (8 hosts from nation) including an inactive
    gcbot group and a host-specific `Disallow: /pH/*.pdf$`; paths from
    part hit every branch. The URL side never shuffles: rules collapse to
    one array per host, broadcast, winner picked by a per-row fold."""
    from gc_spark.operators.robots import match_robots, parse_robots_rules

    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 8)
    robots = n.select(
        F.concat(F.lit("h"), F.col("n_nationkey")).alias("host"),
        F.concat(
            F.lit("User-agent: gcbot\nDisallow: /\n"),
            F.lit(
                "User-agent: *\nDisallow: /private/*\n"
                "Allow: /private/*.html$\nDisallow: /tmp/\n"
            ),
            F.lit("Disallow: /p"),
            F.col("n_nationkey"),
            F.lit("/*.pdf$\n"),
        ).alias("body"),
    )
    rules = parse_robots_rules(robots)
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("string")
    urls = p.select(
        F.concat(F.lit("h"), (F.col("p_partkey") % 8).cast("string")).alias("host"),
        F.when(F.col("p_partkey") % 5 == 0, F.concat(F.lit("/private/doc"), pk, F.lit(".html")))
        .when(F.col("p_partkey") % 5 == 1, F.concat(F.lit("/private/doc"), pk, F.lit(".pdf")))
        .when(F.col("p_partkey") % 5 == 2, F.concat(F.lit("/tmp/f"), pk))
        .when(
            F.col("p_partkey") % 5 == 3,
            F.concat(F.lit("/p"), (F.col("p_partkey") % 8).cast("string"), F.lit("/doc"), pk, F.lit(".pdf")),
        )
        .otherwise(F.concat(F.lit("/pub/doc"), pk, F.lit(".html")))
        .alias("path"),
    )
    return match_robots(urls, rules)


def q96_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (operators/mirrors.mirror_host_pairs): host
    pairs sharing >= 2 identical content fingerprints. Mirrors planted by
    re-hosting every 4th document under 'mirror-'||source; the inverted
    fingerprint self-join recovers each (source, mirror-source) pair plus
    any organic cross-source duplicates."""
    from gc_spark.operators.mirrors import mirror_host_pairs

    d = _t(spark, sf_dir, "documents")
    mirrored = d.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("mirror-"), F.col("source")).alias("source"), "text"
    )
    corpus = d.select("source", "text").unionByName(mirrored)
    return mirror_host_pairs(corpus, host_col="source", min_shared=2)


def q97_fetch_eta(spark, sf_dir):
    """Politeness-aware fetch ETA (operators/eta.schedule_eta): per-URL
    wave and eta_sec under per-host crawl delays and 2 connections —
    the long-pole report an operator reads before the crawl, not after.
    Frontier synthesized from part (10 hosts, delay 1-3s)."""
    from gc_spark.operators.eta import schedule_eta

    p = _t(spark, sf_dir, "part")
    fr = p.select(
        F.concat(F.lit("h"), (F.col("p_partkey") % 10).cast("string")).alias("host"),
        F.concat(F.lit("u"), F.col("p_partkey").cast("string")).alias("url"),
        (F.col("p_partkey") % 100).cast("int").alias("priority"),
        (1.0 + (F.col("p_partkey") % 10) % 3).cast("double").alias("crawl_delay"),
    )
    return schedule_eta(fr, delay_col="crawl_delay", connections=2)


def q98_bigram_xent(spark, sf_dir):
    """Interpolated bigram LM scoring (operators/lm.interpolated_bigram_
    xent): Jelinek-Mercer p = 0.7·c(w1w2)/c(w1) + 0.3·c(w2)/N over the
    corpus itself — the word-order-sensitive upgrade of q59's unigram
    cross-entropy. Bigram table joins by key (too big to broadcast at
    corpus scale); unigram lookups broadcast."""
    from gc_spark.operators.lm import interpolated_bigram_xent

    d = _t(spark, sf_dir, "documents")
    return interpolated_bigram_xent(d).orderBy("doc_id")


def q99_url_param_rules(spark, sf_dir):
    """DUST-style URL-rule learning (operators/dust.learn_param_rules):
    which query parameters never change the content fingerprint and can be
    stripped by the canonicalizer. Synthetic URL space from events digits:
    'page' drives the content (not strippable), 'sid' and 'ref' are
    session/tracking noise (strippable). The operator parses the raw query
    string with str_to_map; the oracle derives the same groups
    analytically."""
    from gc_spark.operators.dust import learn_param_rules

    e = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 10).alias("d0"),
        (F.floor(F.col("event_id") / 10) % 10).alias("d1"),
        (F.floor(F.col("event_id") / 100) % 10).alias("d2"),
        (F.floor(F.col("event_id") / 1000) % 10).alias("d3"),
    )
    from gc_spark.operators.text_dedup import sha60_col

    urls = e.select(
        F.concat(F.lit("h"), F.col("d3").cast("string")).alias("host"),
        F.concat(F.lit("/p/"), F.col("d2").cast("string")).alias("path"),
        F.concat(
            F.lit("page="),
            (F.col("d1") % 3).cast("string"),
            F.lit("&ref="),
            F.floor(F.col("d0") / 5).cast("string"),
            F.lit("&sid="),
            (F.col("d0") % 5).cast("string"),
        ).alias("query"),
        sha60_col(
            F.concat(
                F.lit("h"),
                F.col("d3").cast("string"),
                F.lit("/p/"),
                F.col("d2").cast("string"),
                F.lit("#"),
                (F.col("d1") % 3).cast("string"),
            )
        ).alias("fp"),
    )
    return learn_param_rules(urls, min_groups=2)


def q100_soft404_templates(spark, sf_dir):
    """Soft-404 / template-page detection (operators/soft404.template_
    pages): per-host body fingerprints claimed by an outsized share of the
    host's URLs. Planted: every 5th URL shares the host's 'soft404' body,
    every 7th-shifted-3 shares a 'consent' wall; the rest are unique."""
    from gc_spark.operators.soft404 import template_pages
    from gc_spark.operators.text_dedup import sha60_col

    p = _t(spark, sf_dir, "part")
    host = F.concat(F.lit("h"), (F.col("p_partkey") % 10).cast("string"))
    body = (
        F.when(F.col("p_partkey") % 5 == 0, F.concat(F.lit("soft404 "), host))
        .when(F.col("p_partkey") % 7 == 3, F.concat(F.lit("consent "), host))
        .otherwise(F.concat(F.lit("body "), F.col("p_partkey").cast("string")))
    )
    pages = p.select(
        host.alias("host"),
        F.concat(F.lit("u"), F.col("p_partkey").cast("string")).alias("url"),
        sha60_col(body).alias("fp"),
    )
    return template_pages(pages, min_share=0.1, min_count=5)


def q101_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/dsir.importance_weights): hashed
    unigram+bigram bucket distributions of a target slice (src0-src2, the
    'high-quality' proxy) vs the whole corpus; per-doc log-ratio weight is
    the data-selection score. Bucket tables are B-sized and broadcast."""
    from gc_spark.operators.dsir import importance_weights

    d = _t_wide(spark, sf_dir, "documents")
    target = d.filter(F.col("source").isin("src0", "src1", "src2"))
    # r6: the target is a slice of the raw corpus — its bucket counts roll
    # up from the already-hashed features (target_ids), skipping a second
    # tokenize+sha256 pass over the target texts (identical counts)
    return importance_weights(
        d, target, buckets=4096, target_ids=target.select("doc_id")
    )


def q102_link_farms(spark, sf_dir):
    """Reciprocal-link / link-farm detection (operators/linkspam.
    reciprocity_stats). Organic host graph from events (each host links to
    ~21 pseudo-random targets; reciprocity ~4%) plus a planted 10-host
    clique linked in both directions from part — the clique's ratio 1.0
    trips the farm flag, organic hosts stay clean."""
    from gc_spark.operators.linkspam import reciprocity_stats

    ev = _t(spark, sf_dir, "events")
    organic = ev.select(
        F.concat(F.lit("n"), (F.col("event_id") % 499).cast("string")).alias("src"),
        F.concat(
            F.lit("n"),
            ((F.floor(F.col("event_id") / 499) + F.col("event_id") * 7) % 499).cast(
                "string"
            ),
        ).alias("dst"),
    )
    p = _t(spark, sf_dir, "part")
    farm = p.select(
        F.concat(F.lit("f"), (F.col("p_partkey") % 10).cast("string")).alias("src"),
        F.concat(
            F.lit("f"), (F.floor(F.col("p_partkey") / 10) % 10).cast("string")
        ).alias("dst"),
    )
    return reciprocity_stats(
        organic.unionByName(farm), min_ratio=0.5, min_degree=5
    )


def q103_pq_codes(spark, sf_dir):
    """Product quantization (operators/pq.pq_assign): 64-dim embeddings →
    4 subspaces × 16 sampled codewords; per-vector reconstruction MSE and
    code string. The broadcast-codebook + single-shuffle assignment is the
    IVF-PQ serving layout for billion-vector ANN."""
    from gc_spark.operators.pq import pq_assign

    e = _t_wide(spark, sf_dir, "embeddings")
    return pq_assign(e, dim=64, m=4, k=16)


def q104_source_kl(spark, sf_dir):
    """Per-source KL divergence from the corpus unigram distribution
    (operators/lm.source_kl) — the mixture-design diagnostic telling which
    sources' vocabulary usage diverges from the blend (pairs with q76
    mixture_weights). One corpus scan; corpus table rolls up from the
    (source, term) aggregate."""
    from gc_spark.operators.lm import source_kl

    d = _t_wide(spark, sf_dir, "documents")
    return source_kl(d)


def q105_oov_rate(spark, sf_dir):
    """Per-doc out-of-vocabulary rate against the corpus's own top-V
    vocabulary (operators/vocab.oov_rate, V=16 — the synthetic corpus has
    31 distinct terms, so the rare half of the vocabulary is genuinely
    out-of-vocabulary). Top-V is
    TakeOrderedAndProject (per-partition heaps, no global sort); the V-row
    vocab broadcasts."""
    from gc_spark.operators.vocab import oov_rate

    d = _t_wide(spark, sf_dir, "documents")
    return oov_rate(d, v=16)


def q106_triangles(spark, sf_dir):
    """Triangle counts + local clustering coefficient on the host graph
    (operators/triangles.triangle_stats, degree-oriented node-iterator —
    the skew-safe wedge join). Organic sparse graph from events plus a
    planted K5 clique from nation whose members must come out with
    coeff 1.0."""
    from gc_spark.operators.triangles import triangle_stats

    ev = _t(spark, sf_dir, "events")
    organic = ev.select(
        F.concat(F.lit("g"), (F.col("event_id") % 211).cast("string")).alias("src"),
        F.concat(
            F.lit("g"),
            ((F.col("event_id") * 3 + F.floor(F.col("event_id") / 211)) % 211).cast(
                "string"
            ),
        ).alias("dst"),
    )
    n = _t(spark, sf_dir, "nation")
    clique = n.select(
        F.concat(F.lit("k"), (F.col("n_nationkey") % 5).cast("string")).alias("src"),
        F.concat(
            F.lit("k"), (F.floor(F.col("n_nationkey") / 5) % 5).cast("string")
        ).alias("dst"),
    )
    return triangle_stats(organic.unionByName(clique))


def q107_window_chunks(spark, sf_dir):
    """Sliding-window chunking (operators/chunking.window_chunks, W=50
    S=25): per-doc overlapping token windows with start offset and chunk
    fingerprint — the segmentation pass before packing (q72) or chunk-
    grain dedup (q50). Entirely map-side."""
    from gc_spark.operators.chunking import window_chunks

    d = _t_wide(spark, sf_dir, "documents")
    return window_chunks(d, window=50, stride=25)


def q108_temperature_sample(spark, sf_dir):
    """Temperature-scaled mixture sampling (operators/sampling.
    temperature_sample, alpha=0.3, target=200 over the lang groups —
    'en' is 44% of the corpus, so alpha<1 visibly upsamples the small
    languages). Deterministic salted-hash draws; quota table broadcast."""
    from gc_spark.operators.sampling import temperature_sample

    d = _t(spark, sf_dir, "documents")
    return temperature_sample(d, target=200, alpha=0.3, group_col="lang")


def q109_kcore(spark, sf_dir):
    """Bounded k-core peeling (operators/kcore.kcore_peel, k=10, 4
    rounds): the organic host graph (undirected degree ~9) peels away in
    cascades; a planted K12 clique from part (degree 11 >= 10) survives
    every round."""
    from gc_spark.operators.kcore import kcore_peel

    ev = _t(spark, sf_dir, "events")
    organic = ev.select(
        F.concat(F.lit("v"), (F.col("event_id") % 1999).cast("string")).alias("src"),
        F.concat(
            F.lit("v"),
            ((F.col("event_id") * 3 + F.floor(F.col("event_id") / 1999)) % 1999).cast(
                "string"
            ),
        ).alias("dst"),
    )
    p = _t(spark, sf_dir, "part")
    clique = p.select(
        F.concat(F.lit("c"), (F.col("p_partkey") % 12).cast("string")).alias("src"),
        F.concat(
            F.lit("c"), (F.floor(F.col("p_partkey") / 12) % 12).cast("string")
        ).alias("dst"),
    )
    return kcore_peel(organic.unionByName(clique), k=10, rounds=4)


def q110_span_truncate(spark, sf_dir):
    """Interleaved context-budget truncation (operators/spans.
    truncate_spans, 250-char text budget — the corpus median is ~306 chars, so most sequences genuinely truncate): cut each span sequence at the
    budget, media spans kept only while budget remains, boundary text span
    cut mid-way; per-doc fingerprint of the truncated sequence. One array
    fold per doc, no shuffle — the multimodal packing step of the
    north-rule payload."""
    from gc_spark.operators.spans import build_interleaved_spans, truncate_spans

    d = _t_wide(spark, sf_dir, "documents")
    return truncate_spans(build_interleaved_spans(d), char_budget=250)


def q111_caption_candidates(spark, sf_dir):
    """Caption mining over interleaved spans (operators/spans.
    caption_candidates): each media span pairs with the immediately
    following text span (offset adjacency); media at document end gets a
    null caption. Map-side array pairing, no self-join."""
    from gc_spark.operators.spans import build_interleaved_spans, caption_candidates

    d = _t_wide(spark, sf_dir, "documents")
    return caption_candidates(build_interleaved_spans(d), prefix=40)


def q112_fairness(spark, sf_dir):
    """Jain fairness of per-host scheduled work within each event_type
    (operators/politeness.fairness_index) — the post-batch scheduler
    health check (1.0 = even spread, 1/n = one hot host)."""
    from gc_spark.operators.politeness import fairness_index

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias("host"),
    )
    return fairness_index(ev, group_col="event_type")


def q113_pseudonyms(spark, sf_dir):
    """Consistent keyed-hash pseudonymization (operators/pseudonym.
    pseudonym_map): emails planted on every 3rd doc from a 40-identifier
    pool, so identifiers recur across docs and the mapping's stability is
    visible (n_docs > 1). Assignment is pure map-side hashing — no rank
    window, no mapping-table join."""
    from gc_spark.functions.text import EMAIL_PATTERN
    from gc_spark.operators.pseudonym import pseudonym_map

    d = _t_wide(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" mail user"),
                    (F.col("doc_id") % 40).cast("string"),
                    F.lit("@example.mil"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pseudonym_map(planted, pattern=EMAIL_PATTERN, salt="r3")


def q114_shard_manifest(spark, sf_dir):
    """Deterministic training-shard manifest (operators/sharding.
    shard_manifest, 16 shards): hash-assigned shards with per-shard stats
    and an order-independent manifest fingerprint — the publishable
    receipt for corpus releases."""
    from gc_spark.operators.sharding import shard_manifest

    d = _t_wide(spark, sf_dir, "documents")
    return shard_manifest(d, n_shards=16)


def q115_politeness_audit(spark, sf_dir):
    """Politeness-compliance audit (operators/politeness.delay_compliance):
    observed inter-fetch gaps per host vs the configured delay (1 + host%3
    seconds) — q97 predicts the schedule, this verifies the execution from
    the fetch log."""
    from gc_spark.operators.politeness import delay_compliance

    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias("host"),
        "ts",
        "event_id",
        (1.0 + (F.col("user_id") % 50) % 3).alias("crawl_delay"),
    )
    return delay_compliance(ev)


def q116_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement via the exponential race
    (operators/sampling.weighted_sample_wor, k=50, weight=n_chars):
    deterministic Efraimidis-Spirakis keys + one global top-k
    (TakeOrderedAndProject, no sort)."""
    from gc_spark.operators.sampling import weighted_sample_wor

    d = _t(spark, sf_dir, "documents")
    return weighted_sample_wor(d, k=50, weight_col="n_chars")


def q117_size_anomalies(spark, sf_dir):
    """Robust response-size anomaly detection (operators/anomaly.
    size_anomalies): median/MAD z-score per host, 3-sigma flag; every
    211th event's size is inflated 40x and must flag. Exact percentile is
    the verifier form (approx_percentile is the 10^10 swap-in, q45)."""
    from gc_spark.operators.anomaly import size_anomalies

    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias("host"),
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("url"),
        (
            F.col("value")
            * 100.0
            * F.when(F.col("event_id") % 211 == 0, 40.0).otherwise(1.0)
        ).alias("size"),
    )
    return size_anomalies(fetches)


def q118_revision_similarity(spark, sf_dir):
    """Recrawl revision classification (operators/snapshot_diff.
    revision_similarity): shingle-Jaccard between two snapshots of each
    doc — every 4th doc fully rewritten (must classify 'rewrite'), the
    rest get an appended tail ('minor'). One id join; shingle sets never
    leave their row."""
    from gc_spark.operators.snapshot_diff import revision_similarity

    d = _t_wide(spark, sf_dir, "documents")
    old = d.select("doc_id", "text")
    new = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("totally different content doc "),
                F.col("doc_id").cast("string"),
                F.lit(" now rewritten entirely"),
            ),
        )
        .otherwise(F.concat(F.col("text"), F.lit(" tail tokens appended here")))
        .alias("text"),
    )
    return revision_similarity(old, new, minor_threshold=0.5)


def q119_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth (operators/vocab.vocab_growth, word
    trigrams): distinct shingles at 25/50/75/100% of the corpus in ONE
    aggregate with conditional distincts — the dedup-ROI forecast
    (unigram vocab saturates on this corpus; trigram grain grows
    5.4k -> 16.2k across the quarters)."""
    from gc_spark.operators.vocab import vocab_growth

    d = _t_wide(spark, sf_dir, "documents")
    return vocab_growth(d, n=3)


def q120_retry_backoff(spark, sf_dir):
    """Exponential backoff with deterministic jitter (operators/eta.
    retry_backoff): capped base·2^attempts spread by a salted url-hash
    jitter; attempt ceiling flags the dead-letter path. Map-side only —
    the failure-path twin of q97's politeness ETA."""
    from gc_spark.operators.eta import retry_backoff

    p = _t(spark, sf_dir, "part")
    failures = p.select(
        F.concat(F.lit("u"), F.col("p_partkey").cast("string")).alias("url"),
        (F.col("p_partkey") % 7).cast("int").alias("attempts"),
    )
    return retry_backoff(failures, base_sec=1.0, cap_sec=60.0, max_attempts=5)


def q121_hybrid_fusion(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical top-20 (operators/bm25) fused with
    embedding-cosine semantic top-20 (operators/fusion.cosine_topk_ranked)
    via reciprocal-rank fusion (operators/fusion.rrf_fuse, k0=60) — the
    standard rank-only fusion, robust to incomparable score scales. Only
    the two 20-row rank lists reach the fusion; the corpus never does."""
    from gc_spark.operators.bm25 import bm25_topk
    from gc_spark.operators.fusion import cosine_topk_ranked, rrf_fuse

    d = _t(spark, sf_dir, "documents")
    lex = bm25_topk(d, ["spark", "query", "merge"], k=20).select("doc_id", "rank")
    em = (
        _t_wide(spark, sf_dir, "embeddings")
        .join(d.select("doc_id"), F.col("vec_id") == F.col("doc_id"))
        .select("vec_id", "embedding")
    )
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    sem = cosine_topk_ranked(em, q, k=20).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex, sem], k0=60, topk=10)


def q122_span_audit(spark, sf_dir):
    """Interleaved-span integrity audit (operators/spans.audit_spans) —
    the well-formedness gate under the north-rule span-sequence invariant.
    Spans built deterministically (q30 shape), then three corruption
    classes planted map-side (first matching class wins): doc%7 — the
    offset-1 span rewritten to offset 0 (order violation); doc%11 — the
    offset-0 text span's text nulled (payload violation); doc%13 — the
    offset-0 span's kind set to 'mystery'. All checks are per-row array
    folds; text/blobs never shuffle."""
    from gc_spark.operators.spans import audit_spans, build_interleaved_spans

    d = _t_wide(spark, sf_dir, "documents")
    spans = build_interleaved_spans(d)
    doc = F.col("doc_id")

    def _rw(kind_fn, text_fn, off_fn):
        return F.transform(
            F.col("spans"),
            lambda s: F.struct(
                kind_fn(s).alias("kind"),
                text_fn(s).alias("text"),
                s["media_ref"].alias("media_ref"),
                off_fn(s).cast("int").alias("offset"),
            ),
        )

    ident_k = lambda s: s["kind"]  # noqa: E731
    ident_t = lambda s: s["text"]  # noqa: E731
    ident_o = lambda s: s["offset"]  # noqa: E731
    corrupt_off = _rw(
        ident_k,
        ident_t,
        lambda s: F.when(s["offset"] == 1, F.lit(0)).otherwise(s["offset"]),
    )
    corrupt_pay = _rw(
        ident_k,
        lambda s: F.when(
            s["offset"] == 0, F.lit(None).cast("string")
        ).otherwise(s["text"]),
        ident_o,
    )
    corrupt_kind = _rw(
        lambda s: F.when(s["offset"] == 0, F.lit("mystery")).otherwise(s["kind"]),
        ident_t,
        ident_o,
    )
    staged = spans.select(
        "doc_id",
        F.when(doc % 7 == 0, corrupt_off)
        .when(doc % 11 == 0, corrupt_pay)
        .when(doc % 13 == 0, corrupt_kind)
        .otherwise(F.col("spans"))
        .alias("spans"),
    )
    return audit_spans(staged)


def q123_encoding_audit(spark, sf_dir):
    """Encoding-quality triage (operators/encoding.encoding_stats):
    mojibake digraphs, U+FFFD lossy decodes, control-byte junk — planted
    on disjoint-ish doc classes (13/17/19 moduli; overlaps resolved by
    verdict precedence). Pure regexp counting in whole-stage codegen."""
    from gc_spark.operators.encoding import encoding_stats

    d = _t_wide(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    planted = d.select(
        "doc_id",
        F.concat(
            "text",
            # explicit escapes (the artifacts contain invisible codepoints)
            F.when(
                doc % 13 == 0,
                F.lit(
                    " caf\u00c3\u00a9 don\u00c3\u00a9es"
                    " \u00e2\u0080\u0099quoted\u00e2\u0080\u0099"
                ),
            ).otherwise(F.lit("")),
            F.when(doc % 17 == 0, F.lit(" bin\x07\x0bjunk")).otherwise(
                F.lit("")
            ),
            F.when(doc % 19 == 0, F.lit(" lossy \ufffd char")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return encoding_stats(planted)


def q124_split_leakage(spark, sf_dir):
    """Leakage-safe splits + the cross-split contamination audit
    (operators/splits): hosts hash-assign whole units to train/val/test
    (15%/15%), then three boilerplate banners planted across hosts (doc%25
    classes) surface as fingerprints crossing split boundaries — exactly
    the rows that would poison an eval."""
    from gc_spark.operators.splits import assign_splits, leakage_audit

    d = _t_wide(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    text = (
        F.when(
            doc % 25 == 0,
            F.lit("breaking: site maintenance notice boilerplate"),
        )
        .when(doc % 25 == 7, F.lit("copyright footer all rights reserved"))
        .when(doc % 25 == 14, F.lit("cookie consent accept to continue"))
        .otherwise(F.col("text"))
    )
    staged = d.select(
        "doc_id",
        F.concat(F.lit("h"), (doc % 37).cast("string")).alias("host"),
        text.alias("text"),
    )
    w = assign_splits(staged, "host", salt="split0", val_bp=1500, test_bp=1500)
    return leakage_audit(w.withColumn("fingerprint", F.sha2("text", 256)))


def q125_revalidation_plan(spark, sf_dir):
    """Conditional-GET planning (operators/recrawl.revalidation_plan):
    per-URL skip / revalidate / full decisions from observed content-hash
    change history, with expected-bytes accounting vs the reference's
    unconditional full sweep. URLs with user_id%5==0 get a constant hash
    (never change → skip); the rest toggle with the event value."""
    from gc_spark.operators.recrawl import revalidation_plan

    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id")
    url = F.concat(
        F.lit("https://h"),
        (u % 40).cast("string"),
        F.lit("/p"),
        (u % 120).cast("string"),
    )
    log = ev.select(
        url.alias("url"),
        F.col("event_id"),
        F.sha2(
            F.concat(
                url,
                F.when(u % 5 == 0, F.lit("s")).otherwise(
                    (F.col("value") > 7.0).cast("string")
                ),
            ),
            256,
        ).alias("content_hash"),
        (F.lit(1000.0) + F.col("value") * 100.0).alias("bytes"),
    )
    return revalidation_plan(log, ts_col="event_id")


def q126_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift detection (operators/anomaly.cusum_alarms):
    per-host failure-rate change points via the max-drawup closed form
    S_i = C_i - min(0, running-min C) — two windows, zero iteration, zero
    Python. Host h3's post-5000 events are forced failures (a planted
    gradual ban); natural error-rate hosts stay under the k=0.25 drift
    allowance (0.25: increments are binary-exact, so the running statistic
    is bit-identical on every engine — no float drift at the threshold)."""
    from gc_spark.operators.anomaly import cusum_alarms

    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id")
    fail = F.when(
        (u % 30 == 3) & (F.col("event_id") > 5000), F.lit(1.0)
    ).otherwise((F.col("event_type") == "error").cast("double"))
    log = ev.select(
        F.concat(F.lit("h"), (u % 30).cast("string")).alias("host"),
        "ts",
        "event_id",
        fail.alias("fail"),
    )
    return cusum_alarms(log, "fail", k_ref=0.25, h_threshold=3.0)


def q127_psi_drift(spark, sf_dir):
    """PSI distribution drift between corpus epochs (operators/drift.
    psi_drift): fixed-width length buckets, add-half smoothing over a
    generated bucket spine (zero-count buckets included). Epoch b of
    src3 is shifted +96 chars — the planted template change; every other
    source's epochs are interleaved halves of the same distribution."""
    from gc_spark.operators.drift import psi_drift

    d = _t_wide(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    staged = d.select(
        "source",
        F.when(doc % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("epoch"),
        F.when(
            (F.col("source") == "src3") & (doc % 2 == 1),
            F.col("n_chars") + 96,
        )
        .otherwise(F.col("n_chars"))
        .alias("len"),
    )
    return psi_drift(
        staged, "len", epoch_col="epoch", group_col="source",
        bucket_width=32, n_buckets=10,
    )


def q128_curriculum_order(spark, sf_dir):
    """Deterministic curriculum interleave (operators/curriculum.
    curriculum_order): fixed-width difficulty buckets, two-phase salted dense numbering (rank within (bucket, shard) +
    broadcast shard offsets — no single-reducer bucket window); stream_key =
    round-robin interleave, an ORDER KEY for range-partitioned writes, never
    a global sort."""
    from gc_spark.operators.curriculum import curriculum_order

    d = _t_wide(spark, sf_dir, "documents")
    return curriculum_order(
        d, "n_chars", bucket_width=40, n_buckets=5, salt="epoch0"
    )


def q129_multimodal_pack(spark, sf_dir):
    """Two-resource interleaved packing (operators/packing.pack_multimodal):
    bins under a 512-token AND an 8-media-slot budget via the boundary-union
    (sum-of-floors) form — two prefix sums per stream, no sequential greedy
    recurrence. Media counts derived deterministically (doc_id % 4)."""
    from gc_spark.operators.packing import pack_multimodal

    d = _t_wide(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return pack_multimodal(
        d,
        token_budget=512,
        media_budget=8,
        stream_cols=["source"],
        order_col="doc_id",
        tokens_col=toks,
        media_col=F.col("doc_id") % 4,
    )


def q130_centroid_drift(spark, sf_dir):
    """Embedding centroid drift between epochs (operators/drift.
    centroid_drift): per-position means as 64 plain AVG aggregates in one
    groupBy (zero explode), cosine between the per-group epoch centroids.
    Group g2's epoch-b vectors are negated — the planted encoder flip
    (centroid_cos ≈ -1); undrifted groups sit near +1."""
    from gc_spark.operators.drift import centroid_drift

    em = _t_wide(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    flipped = F.when(
        (F.col("label") == 2) & (F.col("vec_id") % 2 == 1),
        F.transform(v, lambda x: -x),
    ).otherwise(v)
    staged = em.select(
        F.concat(F.lit("g"), F.col("label").cast("string")).alias("source"),
        F.when(F.col("vec_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("epoch"),
        flipped.alias("embedding"),
    )
    return centroid_drift(staged, dim=64)


def q131_release_report(spark, sf_dir):
    """Corpus release ledger (operators/report.release_report): per-source
    docs/tokens/chars, exact-dup count, language share, cheap quality pass
    rate — ONE scan, one groupBy, count_distinct riding the same shuffle
    (approx_count_distinct is the documented 10^10 swap)."""
    from gc_spark.operators.report import release_report

    return release_report(_t_wide(spark, sf_dir, "documents"))


def q132_url_templates(spark, sf_dir):
    """URL path-template mining (operators/templates.template_stats):
    segments classified to <num>/<hex>/<uuid>/<mixed>/literal type tokens,
    URLs collapsed per (host, template) — the PATH-side complement to the
    param-based DUST learner (q99) and the trap detector (q57). Four URL
    shapes planted: dated news paths, hex32 session paths, a static doc,
    and uuid item pages."""
    from gc_spark.operators.templates import template_stats

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    # 19 is coprime to the URL-class modulus 4, so every host sees all
    # four template shapes (pk%20 would lock each host to one class)
    host = F.concat(F.lit("h"), (pk % 19).cast("string"))
    sha = F.sha2(pk.cast("string"), 256)
    uuid = F.concat_ws(
        "-",
        F.substring(sha, 1, 8),
        F.substring(sha, 9, 4),
        F.substring(sha, 13, 4),
        F.substring(sha, 17, 4),
        F.substring(sha, 21, 12),
    )
    url = (
        F.when(
            pk % 4 == 0,
            F.concat(
                F.lit("https://"), host, F.lit("/news/"),
                (2000 + pk % 25).cast("string"), F.lit("/"),
                (pk % 12).cast("string"), F.lit("/"), pk.cast("string"),
            ),
        )
        .when(
            pk % 4 == 1,
            F.concat(
                F.lit("https://"), host, F.lit("/session/"),
                F.substring(sha, 1, 32),
            ),
        )
        .when(
            pk % 4 == 2,
            F.concat(F.lit("https://"), host, F.lit("/docs/guide")),
        )
        .otherwise(
            F.concat(F.lit("https://"), host, F.lit("/item/"), uuid)
        )
    )
    staged = p.select(host.alias("host"), url.alias("url"))
    return template_stats(staged)


def q133_pan_findings(spark, sf_dir):
    """Luhn-validated payment-card detection (operators/luhn.pan_findings):
    13-19 digit runs checked by an expression-fold Luhn checksum (no UDF),
    emitted MASKED. Planted: a valid test PAN (doc%9), an off-by-one
    invalid twin (doc%10), and a 20-digit run that greedily splits 19+1
    (doc%15; the 1-digit tail is not a candidate)."""
    from gc_spark.operators.luhn import pan_findings

    d = _t_wide(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    planted = d.select(
        "doc_id",
        F.concat(
            "text",
            F.when(doc % 9 == 0, F.lit(" card 4111111111111111 ok")).otherwise(
                F.lit("")
            ),
            F.when(doc % 10 == 0, F.lit(" num 4111111111111112 bad")).otherwise(
                F.lit("")
            ),
            F.when(
                doc % 15 == 0, F.lit(" tel 12345678901234567890 long")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pan_findings(planted)


def q134_media_dedup(spark, sf_dir):
    """Cross-document media-span dedup (operators/spans.media_dedup_stats):
    media refs remapped onto a shared 97-image pool so refs recur across
    docs; per-doc duplicate-media fraction via one ref-keyed docfreq
    aggregate joined back — span structs and blobs never shuffle."""
    from gc_spark.operators.spans import build_interleaved_spans, media_dedup_stats

    d = _t_wide(spark, sf_dir, "documents")
    spans = build_interleaved_spans(d)
    remapped = spans.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                F.when(
                    s["kind"] == "media",
                    F.concat(
                        F.lit("img://"),
                        ((F.col("doc_id") * 7 + s["offset"]) % 97).cast("string"),
                    ),
                )
                .otherwise(s["media_ref"])
                .alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
    return media_dedup_stats(remapped)


def q135_link_prediction(spark, sf_dir):
    """Adamic-Adar link prediction on the host graph (operators/linkpred.
    adamic_adar): wedges generated at the shared neighbor with hub capping
    (the triangle-counting discipline), 1/ln(deg) scored, existing edges
    anti-joined out — frontier-discovery prioritization."""
    from gc_spark.operators.linkpred import adamic_adar

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    edges = p.select(
        F.concat(F.lit("h"), (pk % 211).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((pk * pk + 1) % 211).cast("string")).alias("dst"),
    )
    return adamic_adar(edges, max_degree=64)


def q136_fetch_sessions(spark, sf_dir):
    """Fetch-log sessionization (operators/sessions.session_stats):
    gaps-and-islands visits per host — gap > 30 min opens a new session;
    per-visit fetch counts/extent/duration. Log synthesized from events:
    40 hosts, the k-th fetch of a host at k*600 + (k//5)*3600 s, so every
    5 fetches the scheduler leaves and comes back an hour later (intra-
    visit gap 600 <= 1800 keeps the session; the hourly jump opens one)."""
    from gc_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    k = F.floor(eid / 40)
    log = ev.select(
        F.concat(F.lit("h"), (eid % 40).cast("string")).alias("host"),
        (k * 600 + F.floor(k / 5) * 3600).cast("long").alias("fetch_ts"),
    )
    return session_stats(log, gap_sec=1800)


def q137_cdc_delta(spark, sf_dir):
    """Recrawl delta-storage accounting (operators/snapshot_diff.
    cdc_delta_stats): CDC-chunk two snapshots of each document, reuse every
    new-side chunk whose hash the old side already stores, report
    new/reused bytes + reuse fraction. Edits planted per doc: %3==0 gets a
    mid-document insertion (only the chunks it touches re-key — the CDC
    property), %3==1 an appended tail, %3==2 unchanged (reuse_frac 1)."""
    from gc_spark.operators.snapshot_diff import cdc_delta_stats

    d = _t_wide(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    t = F.col("text")
    edited = (
        F.when(
            doc % 3 == 0,
            F.concat(
                t.substr(F.lit(1), F.lit(100)),
                F.lit(" EDITED SEGMENT INSERTED HERE "),
                t.substr(F.lit(101), F.length(t)),
            ),
        )
        .when(doc % 3 == 1, F.concat(t, F.lit(" appended tail content")))
        .otherwise(t)
    )
    new = d.select("doc_id", edited.alias("text"))
    return cdc_delta_stats(d.select("doc_id", "text"), new)


def q138_trustrank(spark, sf_dir):
    """TrustRank spam screen (operators/pagerank.trustrank): personalized
    PageRank with teleport + dangling mass flowing back to a trusted seed
    set (hosts ≡ 0 mod 10 on a 60-node graph from events) — link farms
    with no trusted in-path stay at exactly 0. Oracle: the same 5
    iterations as chained SQL CTEs with the seed vector as a CASE column."""
    from gc_spark.operators.pagerank import trustrank

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 60).alias("src"),
        ((F.col("user_id") * 11 + F.col("event_id") * 3) % 60).alias("dst"),
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    seeds = nodes.filter(F.col("node") % 10 == 0)
    tr = trustrank(edges, seeds, iters=5, damping=0.85)
    return tr.select("node", F.round("trust", 6).alias("trust"))


def q139_modality_mix(spark, sf_dir):
    """Per-source modality ledger (operators/spans.modality_mix): text
    tokens / media spans / media-per-token density / media-leading doc
    share from interleaved span arrays — one array fold per doc, one
    source-keyed aggregate; span structs never shuffle. Docs ≡ 0 mod 5
    have their offset-0 text span dropped so media leads (caption-style),
    making leading_media_frac non-degenerate."""
    from gc_spark.operators.spans import build_interleaved_spans, modality_mix

    d = _t_wide(spark, sf_dir, "documents")
    spans_df = build_interleaved_spans(d).join(
        d.select("doc_id", "source"), "doc_id"
    )
    doc = F.col("doc_id")
    staged = spans_df.select(
        "doc_id",
        "source",
        F.when(
            doc % 5 == 0,
            F.filter(
                "spans",
                lambda s: ~((s["kind"] == "text") & (s["offset"] == 0)),
            ),
        )
        .otherwise(F.col("spans"))
        .alias("spans"),
    )
    return modality_mix(staged)


def q140_cms_estimates(spark, sf_dir):
    """Count-min sketch frequency surface (operators/cms): depth-4 ×
    width-512 counters built in one constant-fan-out pass over document
    tokens (shuffle is sketch-sized — map-side combine absorbs the rest),
    then probed for every term with true count >= 30; estimate = min over
    the 4 counters, always >= truth, identical in both engines because the
    bucket hash is the shared portable sha-60 kernel."""
    from gc_spark.operators.cms import cms_build, cms_estimate

    d = _t_wide(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    # r6: ONE tokenize pass — the checkpointed (term, cnt) contraction
    # feeds both the sketch (weighted build: counters are sums of term
    # counts, bit-identical to the occurrence build) and the exact-truth
    # probe; the depth×4 fan-out now runs over the vocabulary, not every
    # token occurrence (guide §2.3 aggregate before you shuffle)
    counts = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .localCheckpoint(eager=False)
    )
    sketch = cms_build(counts, depth=4, width=512, weight_col="true_cnt")
    truth = counts.filter(F.col("true_cnt") >= 30)
    return cms_estimate(sketch, truth, depth=4, width=512)


def q141_phash_dups(spark, sf_dir):
    """Perceptual-hash media near-dup pairs (operators/phash.
    phash_near_dup_pairs): Manku-style 4×16-bit banding + exact
    bit_count(xor) <= 3 verify on band-collision candidates only. Planted
    over a 50-image pool: class (pk//50)%5==0 carries the pool hash with
    2 bits flipped (near-dup), class 1 the exact pool hash, the rest
    unique hashes (Hamming ~30 apart — band collisions happen,
    verification kills them). Class is decoupled from the pool id so
    variant and exact copies of the SAME image coexist: output mixes
    hamming-0 (exact) and hamming-2 (near) pairs."""
    from gc_spark.operators.phash import phash_near_dup_pairs
    from gc_spark.operators.text_dedup import sha60_col

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    cls = F.floor(pk / 50) % 5
    base = sha60_col(F.concat(F.lit("img"), (pk % 50).cast("string")))
    h = (
        F.when(cls == 0, base.bitwiseXOR(F.lit(3)))
        .when(cls == 1, base)
        .otherwise(sha60_col(F.concat(F.lit("uniq"), pk.cast("string"))))
    )
    media = p.select(pk.cast("long").alias("media_id"), h.alias("phash64"))
    return phash_near_dup_pairs(
        media, id_col="media_id", hash_col="phash64", bands=4, max_hamming=3
    )


def q142_span_redact(spark, sf_dir):
    """Structure-preserving PII redaction over interleaved documents
    (operators/spans.redact_spans after coalesce_text_spans): emails/phones
    planted into the raw text (q47's plants), spans built and text runs
    coalesced so only REAL media boundaries split text, then redaction +
    audit counts inside the span arrays — the sequence fingerprint pins the
    exact redacted interleaved bytes."""
    from gc_spark.operators.spans import (
        build_interleaved_spans,
        coalesce_text_spans,
        redact_spans,
        span_sequence_fingerprint,
    )

    d = _t_wide(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            doc % 7 == 0,
            F.concat(
                F.lit(" contact user"), doc.cast("string"), F.lit("@example.mil")
            ),
        ).otherwise(F.lit("")),
        F.when(
            doc % 11 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad(F.pmod(doc, F.lit(10000)).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    staged = d.select("doc_id", planted.alias("text"))
    red = redact_spans(coalesce_text_spans(build_interleaved_spans(staged)))
    fp = span_sequence_fingerprint(red.select("doc_id", "spans"))
    return red.select("doc_id", "n_emails", "n_phones").join(fp, "doc_id")


def q143_span_langs(spark, sf_dir):
    """Span-grain language segmentation (operators/spans.
    span_language_profile): the q12 stopword heuristic per COALESCED text
    run, rolled up to (en span counts, en_frac, majority doc_lang,
    is_mixed) — the mixed-language docs doc-grain language ID mislabels.
    Docs ≡ 0 mod 6 get a 300-char non-English tail so mixed docs exist by
    construction."""
    from gc_spark.operators.spans import (
        build_interleaved_spans,
        coalesce_text_spans,
        span_language_profile,
    )

    d = _t_wide(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    planted = F.concat(
        "text",
        F.when(doc % 6 == 0, F.lit(" zzz qqq vvv kkk" * 20)).otherwise(
            F.lit("")
        ),
    )
    staged = d.select("doc_id", planted.alias("text"))
    return span_language_profile(
        coalesce_text_spans(build_interleaved_spans(staged))
    )


def q144_size_quantiles(spark, sf_dir):
    """Mergeable log2-histogram quantiles (operators/qsketch): per-host
    p50/p95/p99 response-size upper-bound estimates from integer
    bit-length buckets — counters merge across partitions/micro-batches,
    the raw stream collapses map-side, and the quantile read is one
    window over a ~64-row-per-host table. Thresholds are integer
    ceil(P*n/100); bucketing is bit length, not float log2, so engines
    agree bit-exactly."""
    from gc_spark.operators.qsketch import histogram_quantiles, log2_histogram

    ev = _t(spark, sf_dir, "events")
    staged = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string")).alias(
            "host"
        ),
        F.floor(F.abs(F.col("value")) * 1000).cast("long").alias("sz"),
    )
    hist = log2_histogram(staged, value_col="sz", group_col="host")
    return histogram_quantiles(hist).withColumnRenamed("group", "host")


def q145_embed_decontam(spark, sf_dir):
    """Embedding-space benchmark decontamination (operators/similarity.
    embedding_decontaminate): best cosine per corpus vector against a
    broadcast benchmark set (vec_id ≡ 0 mod 50) — the semantic complement
    of exact 5-gram decontamination (q48). Corpus vectors ≡ 1 mod 50 are
    replaced by 2× the preceding benchmark vector (scale-invariant plant:
    cosine 1 by construction)."""
    from gc_spark.operators.similarity import embedding_decontaminate

    em = _t(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    bench = em.filter(vid % 50 == 0).select("vec_id", "embedding")
    planted_src = em.filter(vid % 50 == 0).select(
        (vid + 1).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 2.0).alias(
            "_pl"
        ),
    )
    corpus = (
        em.filter(vid % 50 != 0)
        .join(planted_src, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(
                F.col("_pl"),
                F.transform("embedding", lambda x: x.cast("double")),
            ).alias("embedding"),
        )
    )
    return embedding_decontaminate(corpus, bench, threshold=0.95)


def q146_failure_triage(spark, sf_dir):
    """Dead-letter policy rollup (operators/triage): 2xx ok, 4xx
    dead_permanent (never retried), 5xx/status-0 (network) retry under an
    attempt ceiling else dead_exhausted; retry_budget_sec prices the retry
    queue with the same capped exponential as eta.retry_backoff. The
    policy layer over the reference's raw dead-queue CSV sink (S10)."""
    from gc_spark.operators.triage import triage_rollup

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    staged = o.select(
        # 23 is coprime to the status modulus 10, so every host sees the
        # full policy lattice (k%25 would lock each host to 2 classes)
        F.concat(F.lit("h"), (k % 23).cast("string")).alias("host"),
        F.when(k % 10 <= 5, 200)
        .when(k % 10 == 6, 404)
        .when(k % 10 == 7, 500)
        .when(k % 10 == 8, 0)
        .otherwise(503)
        .cast("int")
        .alias("status"),
        (k % 5).cast("int").alias("attempts"),
    )
    return triage_rollup(staged, max_attempts=4)


def q147_refresh_value(spark, sf_dir):
    """Freshness-weighted recrawl ordering (operators/recrawl.
    refresh_value): expected value of a refetch = P(changed since last
    fetch) (q56's Cho & Garcia-Molina estimator) × host PageRank (q52's
    graph — url_id % 50 IS the host node id, so the two judged pipelines
    compose exactly). Ranks broadcast onto the URL table; the URL side
    never shuffles beyond q56's own aggregate."""
    from gc_spark.operators.pagerank import pagerank
    from gc_spark.operators.recrawl import recrawl_priority, refresh_value

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("url_id"),
        "ts",
        (F.col("event_type") == "click").alias("changed"),
    )
    scored = recrawl_priority(log).withColumn(
        "node", F.col("url_id") % 50
    )
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    ranks = pagerank(edges, iters=5, damping=0.85)
    out = refresh_value(scored, ranks)
    return out.select(
        "url_id", "node", "p_changed", "host_rank", "refresh_value"
    )


def q148_waterfill(spark, sf_dir):
    """Max-min fair budget split under a global fetch cap (operators/
    waterfill.waterfill_budgets): closed-form water level over the sorted
    demand table (one host-grain window + a broadcast 1-row level), no
    iteration — the fairness-first alternative to q61's proportional
    split; small hosts are served fully, the slack flows to big ones.
    Demands synthesized from nation (25 hosts, skewed), budget 3000 —
    5 hosts saturate, the rest share level 134.5."""
    from gc_spark.operators.waterfill import waterfill_budgets

    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    demands = n.select(
        F.col("n_name").alias("host"),
        ((k + 1) * (F.pmod(k, F.lit(5)) + 1) * 10).cast("long").alias("demand"),
    )
    return waterfill_budgets(demands, total_budget=3000)


def q149_bpe_encode(spark, sf_dir):
    """Tokenizer ENCODE (operators/bpe.apply_bpe_merges): the merge table
    learned by q68 (3 rounds) applied back to the corpus as one broadcast
    fold of substring replaces — learn-then-apply must reproduce the final
    learned corpus byte-exactly, pinned per doc via (n_tokens, sha256).
    The corpus never shuffles; the tokenizer never leaves the dataflow."""
    from gc_spark.operators.bpe import apply_bpe_merges, learn_bpe_merges

    d = _t_wide(spark, sf_dir, "documents").select("doc_id", "text")
    merges = learn_bpe_merges(d, rounds=3).select("round", "w1", "w2")
    enc = apply_bpe_merges(d, merges)
    return enc.select(
        "doc_id",
        F.size(F.split(F.trim("encoded"), r"\s+")).alias("n_tokens"),
        F.sha2(F.col("encoded"), 256).alias("enc_sha"),
    )


def q150_registrable_domains(spark, sf_dir):
    """eTLD+1 grouping (functions/urls.registrable_domain_col): subdomain
    sprawl collapsed to the registrable domain — the grain politeness
    budgets and host reputation should key on. Hosts synthesized from
    customer as w<k>.site<m>.<suffix> over a mix of 1- and 2-label public
    suffixes ('co.uk' must beat 'uk'); rollup = URLs and distinct hosts
    per registrable domain, one map-side expression + one aggregate."""
    from gc_spark.functions.urls import registrable_domain_col

    c = _t(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    suffix = (
        F.when(ck % 5 == 0, F.lit("com"))
        .when(ck % 5 == 1, F.lit("co.uk"))
        .when(ck % 5 == 2, F.lit("mil"))
        .when(ck % 5 == 3, F.lit("org.uk"))
        .otherwise(F.lit("io"))
    )
    # 37 is coprime to the suffix modulus 5, so every site appears under
    # several suffixes (ck%40 would lock each site to one)
    host = F.concat(
        F.lit("w"), (ck % 7).cast("string"),
        F.lit(".site"), (ck % 37).cast("string"),
        F.lit("."), suffix,
    )
    staged = c.select(host.alias("host"))
    return (
        staged.groupBy(
            registrable_domain_col(F.col("host")).alias("domain")
        )
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("host").alias("n_hosts"),
        )
    )


def q151_bandwidth_windows(spark, sf_dir):
    """Per-host bandwidth audit (operators/eta.bandwidth_windows): bytes
    moved per host per 60s fixed window, with an over-cap flag at 1.5 KB/s —
    the BYTES-axis audit next to the request-rate compliance check (q115).
    Fixed windows are mergeable (no window function — one aggregate).
    Log synthesized from events: ts from the q136 visit pattern, bytes
    from value."""
    from gc_spark.operators.eta import bandwidth_windows

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    k = F.floor(eid / 40)
    log = ev.select(
        F.concat(F.lit("h"), (eid % 40).cast("string")).alias("host"),
        (k * 7).cast("long").alias("fetch_ts"),
        F.floor(F.abs(F.col("value")) * 100).cast("long").alias("nbytes"),
    )
    return bandwidth_windows(
        log, window_sec=60, cap_bytes_per_sec=1500.0
    )


def q152_blob_integrity(spark, sf_dir):
    """Blob referential-integrity audit (operators/spans.blob_integrity):
    span media refs (q134's shared 97-image pool) full-outer-joined at
    distinct-ref grain against a manifest synthesized from part that
    (a) is missing refs 0 and 90-96 — orphan_ref, the broken-image class —
    and (b) stores blobs 100-109 nothing references — the compactor's
    reclaim feed."""
    from gc_spark.operators.spans import blob_integrity, build_interleaved_spans

    d = _t_wide(spark, sf_dir, "documents")
    spans = build_interleaved_spans(d)
    remapped = spans.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                F.when(
                    s["kind"] == "media",
                    F.concat(
                        F.lit("img://"),
                        ((F.col("doc_id") * 7 + s["offset"]) % 97).cast(
                            "string"
                        ),
                    ),
                )
                .otherwise(s["media_ref"])
                .alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    manifest = p.filter((pk < 90) | ((pk >= 100) & (pk < 110))).select(
        F.concat(F.lit("img://"), pk.cast("string")).alias("media_ref")
    )
    return blob_integrity(remapped, manifest)


def q153_bounded_shards(spark, sf_dir):
    """Consistent hashing with bounded loads (operators/sharding.
    bounded_load_shards, portable-hash mode): HRW first preference with a
    per-shard cap at ceil(110% of average) — overflow keys spill to their
    second preference deterministically (highest-affinity keys keep their
    home). The assignment-side answer to hot-host skew, next to q78/q79's
    plain rendezvous stability. The cap derives from cap_ratio=(11, 10)
    INSIDE the dataflow (exact integer arithmetic over the two-phase
    cumsum's own bucket totals) — no driver-side count, no extra scan."""
    from gc_spark.operators.sharding import bounded_load_shards

    o = _t(spark, sf_dir, "orders")
    keys = o.select(
        F.concat(F.lit("u"), F.col("o_orderkey").cast("string")).alias("url")
    )
    return bounded_load_shards(
        keys, key="url", num_shards=8, cap_ratio=(11, 10), portable=True
    )


def q158_cuckoo_seen(spark, sf_dir):
    """Deletable approximate seen-set (operators/cuckoo): a partitioned
    cuckoo filter — the north-star's 'bloom/cuckoo' alternative that can
    FORGET (robots newly_blocked purges, forced recrawls) where the Bloom
    twin (q02's prefilter) can only rebuild. Built per shard in one
    applyInPandas pass over portable 60-bit URL hashes, probed by a
    shard-equi broadcast join. The query probes the inserted set itself:
    the no-false-negative invariant makes every row deterministically True
    — end-to-end oracle-checkable even though the filter is
    fingerprint-approximate. Deletion and FPR behavior are pinned by
    tests/test_cuckoo.py (fingerprint-collision-dependent, so not
    SQL-oracle material)."""
    from gc_spark.operators.cuckoo import build_cuckoo, cuckoo_maybe_contains
    from gc_spark.operators.text_dedup import sha60_col

    o = _t(spark, sf_dir, "orders")
    seen = o.select(
        sha60_col(
            F.concat(F.lit("u"), F.col("o_orderkey").cast("string"))
        ).alias("url_hash64")
    )
    filt = build_cuckoo(seen, num_shards=8, expected_per_shard=65536)
    return cuckoo_maybe_contains(seen, filt, num_shards=8).select(
        "url_hash64", "cuckoo_maybe"
    )


def q159_hll_distinct(spark, sf_dir):
    """Per-host distinct-URL HyperLogLog (operators/hll): the frontier-health
    metric ("how many distinct URLs has each host contributed") as a
    256-register mergeable sketch instead of an exact count(distinct url)
    full shuffle. rho is computed EXACTLY via length(bin(w)) — no floating
    log2 — so the register table and the rounded estimate are
    oracle-checkable bit-for-bit; the exact distinct count rides along to
    show the sketch error (~6% at p=8)."""
    from gc_spark.operators.hll import hll_estimate, hll_registers

    o = _t(spark, sf_dir, "orders")
    items = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 8).cast("string")).alias(
            "host"
        ),
        F.concat(F.lit("u"), (F.col("o_orderkey") % 4096).cast("string")).alias(
            "item"
        ),
    )
    regs = hll_registers(items, "item", ["host"], p=8)
    est = hll_estimate(regs, ["host"], p=8)
    exact = items.groupBy("host").agg(
        F.countDistinct("item").alias("exact_distinct")
    )
    return est.join(exact, "host").select(
        "host", "n_registers", "est_distinct", "exact_distinct"
    )


def q160_kmeans_clusters(spark, sf_dir):
    """Semantic corpus clustering (operators/kmeans): 2 Lloyd iterations,
    k=4, seeded from the 4 lowest vec_ids. The corpus never shuffles —
    assignment is a broadcast-centroid native expression; the update is a
    (k*dim)-row aggregate; centroids are round(.,6)-quantized at every
    boundary so the DuckDB twin replays the identical trajectory."""
    from gc_spark.operators.kmeans import cluster_profile, kmeans_lloyd

    e = _t_wide(spark, sf_dir, "embeddings")
    assigned = kmeans_lloyd(e, "embedding", "vec_id", k=4, iters=2)
    return cluster_profile(assigned).select("cluster", "n_points", "avg_dist2")


def q161_round_robin(spark, sf_dir):
    """Host-diversity frontier selection (politeness.round_robin_take):
    take 500 URLs round-robin across hosts — every host's best URL before
    any host's second — so one hot site can't monopolize a micro-batch.
    Per-host window + rank<=k prune + TakeOrdered; no global sort."""
    from gc_spark.operators.politeness import round_robin_take

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    urls = p.select(
        F.concat(F.lit("h"), (pk % 50).cast("string")).alias("host"),
        F.concat(F.lit("/d/"), pk.cast("string")).alias("url"),
        ((pk * 7) % 100).cast("int").alias("priority"),
    )
    return round_robin_take(urls, 500).select(
        "host", "url", "priority", "rr_rank"
    )


def q162_incremental_index(spark, sf_dir):
    """Incremental inverted-index update (inverted.incremental_postings):
    the last 10% of doc_ids arrive as a crawl delta; only the delta is
    tokenized and the stored index is touched by one broadcast-semi-join
    prune — the index twin of q156's incremental connected components.
    Oracle: full recompute over the union, restricted to the delta's
    terms; the merged rows must equal it byte-for-byte. The 90% threshold
    is derived inside the dataflow (1-row broadcast), not driver-side."""
    from gc_spark.operators.inverted import incremental_postings, inverted_index

    docs = _t_wide(spark, sf_dir, "documents")
    thr = docs.agg(F.expr("max(doc_id) * 9 div 10").alias("_thr"))
    tagged = docs.crossJoin(F.broadcast(thr))
    old = tagged.filter(F.col("doc_id") < F.col("_thr")).select("doc_id", "text")
    delta = tagged.filter(F.col("doc_id") >= F.col("_thr")).select(
        "doc_id", "text"
    )
    stored = inverted_index(old)
    return incremental_postings(stored, delta).select(
        "term", "doc_freq", "postings"
    )


def q163_lpa_communities(spark, sf_dir):
    """Host-graph communities via synchronous label propagation
    (operators/community): 2 deterministic rounds, ties to the smallest
    label — the mirror-farm / crawl-sharding neighborhood finder. Graph:
    5-node stars over part keys (hub = key rounded down to a multiple of
    5), so the 2-round trajectory exercises both the adopt-the-hub and the
    hub-adopts-minority-leaf cases."""
    from gc_spark.operators.community import label_propagation

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("long")
    edges = p.filter(F.col("p_partkey") % 5 != 0).select(
        pk.alias("a"), (pk - pk % 5).alias("b")
    )
    return label_propagation(edges, iters=2)


def q164_adc_rerank(spark, sf_dir):
    """PQ asymmetric-distance search + exact rerank (operators/pq.adc_topk):
    the serving-path query of an IVF-PQ index. Candidates are scored from
    their 2-byte PQ codes via a broadcast 4x16 lookup table (the corpus
    vectors are NOT read), the best 50 by ADC go to an exact rerank, and
    the 10 true nearest of those come back — completing the ANN family
    (q15 brute, q19 LSH, q32 IVF, q103 PQ codes) with the
    compressed-domain query step. Query vector: q121's deterministic
    64-dim probe."""
    from gc_spark.operators.pq import adc_topk

    e = _t_wide(spark, sf_dir, "embeddings")
    query = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    return adc_topk(e, query, dim=64, m=4, k=16, n_adc=50, n_out=10).select(
        "vec_id", "adc_d2", "exact_d2"
    )


def q165_ir_metrics(spark, sf_dir):
    """Retrieval-quality evaluation (operators/ir_eval.ir_metrics): MRR@10,
    NDCG@10, recall@10 for three single-term queries whose run is the
    tf-ranked top-15 and whose relevance labels are tf >= 2 — the
    regression gate a tokenizer or index change would be held to. The
    ideal DCG is a native sequence fold; everything after the ranker is
    run-sized (k rows per query)."""
    from gc_spark.operators.ir_eval import ir_metrics

    d = _t_wide(spark, sf_dir, "documents")
    # r6: tf feeds both the run and the qrels — a lazy checkpoint of the
    # tiny (3-term) filtered frame stops the corpus tokenize running twice
    tf = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("qid"),
        )
        .filter(F.col("qid").isin("spark", "query", "merge"))
        .groupBy("qid", "doc_id")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("tf"), F.asc("doc_id"))
    run = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 15)
        .select("qid", "doc_id", "rank")
    )
    qrels = tf.select(
        "qid", "doc_id", (F.col("tf") >= 2).cast("int").alias("rel")
    )
    return ir_metrics(run, qrels, k=10).select(
        "qid", "n_rel", "mrr", "ndcg", "recall"
    )


def q166_phrase_match(spark, sf_dir):
    """Exact phrase query (operators/query_eval.phrase_match): docs
    containing the consecutive token sequence "order fast", with
    occurrence count and first 0-based start offset. One shuffle (the
    term-filtered token stream), adjacency as a native array_intersect
    fold — the serving twin of the positional index q64 builds."""
    from gc_spark.operators.query_eval import phrase_match

    d = _t_wide(spark, sf_dir, "documents")
    return phrase_match(d, ["order", "fast"]).select(
        "doc_id",
        "n_occurrences",
        F.col("first_pos").cast("long").alias("first_pos"),
    )


def q167_boolean_match(spark, sf_dir):
    """Minimum-should-match boolean query (operators/query_eval.
    boolean_match): docs containing BOTH "spark" and "merge" plus at
    least 2 of {"vector","window","group"} — Lucene's msm semantics as
    one term-filtered groupBy + set intersections."""
    from gc_spark.operators.query_eval import boolean_match

    d = _t_wide(spark, sf_dir, "documents")
    return boolean_match(
        d,
        must=["spark", "merge"],
        should=["vector", "window", "group"],
        min_should=2,
    )


def q168_zorder_skipping(spark, sf_dir):
    """Z-order layout vs single-column layout (operators/zorder): scale
    (o_totalprice, order-date day) onto an 8-bit grid, interleave to a
    Morton code, bucket into 16 fixed-width z-range files vs 16
    totalprice-range files, and measure Iceberg-style manifest pruning
    (files whose per-file min/max box overlaps the query box) for the
    box gx∈[64,127] × gy∈[32,95]. The z layout should hit strictly
    fewer rows for the 2-D predicate — that difference IS the
    data-skipping payoff the layout buys at 10^10 rows."""
    from gc_spark.operators.zorder import (
        grid_col,
        layout_stats,
        skip_effectiveness,
        zvalue_col,
    )

    o = _t(spark, sf_dir, "orders")
    dims = o.select(
        F.col("o_totalprice").alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("double")
        .alias("y"),
    )
    mm = dims.agg(
        F.min("x").alias("xmn"),
        F.max("x").alias("xmx"),
        F.min("y").alias("ymn"),
        F.max("y").alias("ymx"),
    )
    g = dims.crossJoin(F.broadcast(mm)).select(
        grid_col(F.col("x"), F.col("xmn"), F.col("xmx"), 8).alias("gx"),
        grid_col(F.col("y"), F.col("ymn"), F.col("ymx"), 8).alias("gy"),
    )
    g = g.withColumn("z", zvalue_col([F.col("gx"), F.col("gy")], 8))
    box = {"gx": (64, 127), "gy": (32, 95)}
    out = []
    for layout, fcol in (
        ("linear_x", F.shiftright(F.col("gx"), 4)),
        ("zorder", F.shiftright(F.col("z"), 12)),
    ):
        stats = layout_stats(
            g, fcol, [F.col("gx"), F.col("gy")], ["gx", "gy"]
        )
        out.append(
            skip_effectiveness(stats, box).select(
                F.lit(layout).alias("layout"),
                "n_files",
                "files_hit",
                "rows_in_hit_files",
            )
        )
    return out[0].unionByName(out[1])


def q169_aimd_delay(spark, sf_dir):
    """AIMD adaptive per-host crawl delay (operators/aimd.aimd_delays):
    20 synthetic hosts from events user_id, outcome = error event type,
    delay doubles (clamped 8000 ms) on failure and decays 250 ms
    (floored 100 ms) on success. The recurrence is vectorized ACROSS
    hosts per Arrow batch — the Python loop is sequence length, not row
    count."""
    from gc_spark.operators.aimd import aimd_delays

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    f = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias(
            "host"
        ),
        F.col("event_id").alias("seq"),
        (F.col("event_type") == "error").alias("fail"),
    )
    return aimd_delays(f).select("host", "rn", "delay_ms")


def q170_percolate(spark, sf_dir):
    """Stored-query percolation (operators/percolate.percolate): five
    registered term queries evaluated against every document in one
    pass — the query side is exploded to a broadcast term index and the
    corpus token stream is semi-joined against it straight off the scan,
    so only query-relevant tokens shuffle. AND semantics: a query fires
    iff every must-term appears."""
    from gc_spark.operators.percolate import percolate

    d = _t_wide(spark, sf_dir, "documents")
    stored = spark.createDataFrame(
        [
            ("alert1", ["merge", "spark"]),
            ("alert2", ["group", "vector", "window"]),
            ("alert3", ["the"]),
            ("alert4", ["nosuchterm", "spark"]),
            ("alert5", ["fast", "filter", "join", "slow"]),
        ],
        "query_id string, must_terms array<string>",
    )
    return percolate(d, stored)


def q171_front_coding(spark, sf_dir):
    """Front-coded URL-manifest sizing (operators/frontcode.
    front_coding_stats): synthesize a per-host sorted URL set from part
    (20 hosts, catalog-style paths), and compute the exact storage win
    of delta-prefix coding — the Lucene/WebGraph layout decision for a
    10^10-row seen manifest. LCP is a native character fold, one window
    per host on the partitioning the frontier already has."""
    from gc_spark.operators.frontcode import front_coding_stats

    p = _t(spark, sf_dir, "part")
    urls = p.select(
        F.concat(F.lit("h"), (F.col("p_partkey") % 20).cast("string")).alias(
            "host"
        ),
        F.concat(
            F.lit("https://h"),
            (F.col("p_partkey") % 20).cast("string"),
            F.lit(".example/catalog/"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("-")),
            F.lit("/"),
            F.col("p_partkey").cast("string"),
        ).alias("url"),
    )
    return front_coding_stats(urls).select(
        "host", "n_urls", "raw_bytes", "coded_bytes", "saved_frac"
    )


def q172_allpairs_jaccard(spark, sf_dir):
    """EXACT set-similarity self-join with prefix filtering
    (operators/setjoin.allpairs_jaccard, Bayardo WWW'07): every doc pair
    with 4-gram-shingle Jaccard >= 0.6, guaranteed — the exact
    complement of q33's MinHash+LSH sketch path. Near-dups are planted
    (every 25th doc re-appears with one appended token) exactly like
    q33; candidates come only from the rare-first prefix index plus the
    length bound, then exact verification."""
    from gc_spark.operators.setjoin import allpairs_jaccard

    d = _t_wide(spark, sf_dir, "documents").select("doc_id", "text")
    return allpairs_jaccard(_with_planted_docs(d), threshold=0.6)


def q173_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap 95% CI (operators/bootstrap.bootstrap_ci,
    Chamandy et al. 2012) for the per-event-type mean value: B=100
    deterministic Poisson(1) replica weights per row (sha256 uniforms ->
    inverse-CDF when-chain), replica means collapse via partial
    aggregation so shuffle volume is groups x B, and the CI bounds are
    the 3rd/98th order statistics of the replica means."""
    from gc_spark.operators.bootstrap import bootstrap_ci

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20000)
    return bootstrap_ci(
        e,
        value_col="value",
        group_cols=["event_type"],
        id_col="event_id",
        B=100,
        lo_rank=3,
        hi_rank=98,
    )


def q174_skyline(spark, sf_dir):
    """Skyline / Pareto frontier (operators/skyline.skyline, Borzsonyi
    ICDE'01): documents not dominated on (n_chars, vocabulary richness,
    conciseness = -total tokens) — the multi-criteria curation pick
    where no scalar score is agreed. Two-phase: vectorized local prune
    per partition (the data-reducing step), then one small global
    re-prune of the local shells."""
    from gc_spark.operators.skyline import skyline

    d = _t_wide(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.col("text")), r"\s+")
    feat = d.select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(arr)).cast("long").alias("distinct_tokens"),
        F.size(arr).cast("long").alias("total_tokens"),
        (-F.size(arr)).cast("long").alias("_neg_total"),
    )
    return skyline(
        feat, ["n_chars", "distinct_tokens", "_neg_total"]
    ).select("doc_id", "n_chars", "distinct_tokens", "total_tokens")


def q175_edit1_join(spark, sf_dir):
    """Edit-distance-1 string self-join via SymSpell deletion variants
    (operators/symspell.edit1_pairs): catalog-style keys from part plus
    planted first-char-dropped typos; candidates come from a native
    deletion-variant EQUI-join (never a quadratic fuzzy join), then the
    exact levenshtein verifies — the DUST-style near-URL detector."""
    from gc_spark.operators.symspell import edit1_pairs

    p = _t(spark, sf_dir, "part")
    key = F.concat(
        F.lower(F.element_at(F.split(F.col("p_name"), " "), 1)),
        F.lit("-"),
        (F.col("p_partkey") % 97).cast("string"),
    )
    base = p.select(key.alias("s"))
    typos = p.filter(F.col("p_partkey") % 37 == 0).select(
        key.substr(F.lit(2), F.length(key)).alias("s")
    )
    return edit1_pairs(base.unionByName(typos), "s")


def q176_mmr_diversify(spark, sf_dir):
    """MMR diversified top-k (operators/mmr.mmr_diversify, Carbonell &
    Goldstein SIGIR'98): three probe queries, candidate pool = cosine
    top-8 from the distributed ranker, then 3 greedy MMR picks per query
    at lambda=0.7 inside one per-query Arrow group (the loop is k picks
    over a run-sized pool, never corpus-sized). Fixed-point rounding
    before every argmax keeps the pick sequence engine-stable."""
    from gc_spark.operators.fusion import cosine_topk_ranked
    from gc_spark.operators.mmr import mmr_diversify

    em = _t_wide(spark, sf_dir, "embeddings")
    pools = []
    for qid, m in (("p0", 37), ("p1", 41), ("p2", 43)):
        probe = [((i * m) % 13 - 6) / 10.0 for i in range(64)]
        pools.append(
            cosine_topk_ranked(em, probe, k=8)
            .select(F.lit(qid).alias("qid"), "vec_id", F.col("sim").alias("rel"))
        )
    cands = pools[0].unionByName(pools[1]).unionByName(pools[2]).join(
        em.select("vec_id", F.col("embedding").alias("vec")), "vec_id"
    )
    return mmr_diversify(cands, k=3, lam=0.7).select(
        "qid", "rank", "vec_id", "mmr_score"
    )


def q154_epoch_shuffle(spark, sf_dir):
    """Two-level per-epoch training shuffle (operators/curriculum.
    epoch_shuffle_keys): a per-epoch shard permutation crossed with a
    per-epoch salted within-shard hash — the global training read order
    with NO global sort and no driver permutation table; epoch 3 here,
    reproducible forever, resampled at epoch 4."""
    from gc_spark.operators.curriculum import epoch_shuffle_keys

    d = _t_wide(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle_keys(d, epoch=3, num_shards=16)


def q155_robots_diff(spark, sf_dir):
    """Robots-change blast radius (operators/robots.robots_diff_impact):
    verdicts under the old and new robots.txt per URL, classified into
    unchanged / newly_blocked (purge from queues NOW) / newly_allowed
    (backfill), rolled up per host. The new body adds an
    `Allow: /private/*.html$` exception (newly allowed via longest-match)
    and a `Disallow: /pub/*` (newly blocked); q95's path classes hit all
    four cells."""
    from gc_spark.operators.robots import parse_robots_rules, robots_diff_impact

    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 8)
    old_body = "User-agent: *\nDisallow: /private/*\nDisallow: /tmp/\n"
    new_body = old_body + "Allow: /private/*.html$\nDisallow: /pub/*\n"
    mk = lambda body: parse_robots_rules(  # noqa: E731
        n.select(
            F.concat(F.lit("h"), F.col("n_nationkey")).alias("host"),
            F.lit(body).alias("body"),
        )
    )
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("string")
    urls = p.select(
        F.concat(F.lit("h"), (F.col("p_partkey") % 8).cast("string")).alias(
            "host"
        ),
        F.when(
            F.col("p_partkey") % 5 == 0,
            F.concat(F.lit("/private/doc"), pk, F.lit(".html")),
        )
        .when(
            F.col("p_partkey") % 5 == 1,
            F.concat(F.lit("/private/doc"), pk, F.lit(".pdf")),
        )
        .when(F.col("p_partkey") % 5 == 2, F.concat(F.lit("/tmp/f"), pk))
        .when(
            F.col("p_partkey") % 5 == 3,
            F.concat(F.lit("/p"), (F.col("p_partkey") % 8).cast("string"),
                     F.lit("/doc"), pk, F.lit(".pdf")),
        )
        .otherwise(F.concat(F.lit("/pub/doc"), pk, F.lit(".html")))
        .alias("path"),
    )
    return robots_diff_impact(urls, mk(old_body), mk(new_body))


def q156_incremental_cc(spark, sf_dir):
    """Incremental connected components (text_dedup.incremental_components):
    a stored min-labeled assignment over yesterday's near-dup graph
    absorbs today's edge delta by contracting the delta to the LABEL
    graph, running the star algorithm only there, and broadcasting the
    delta-sized relabel map back — the corpus table sees one broadcast
    join, zero iterations. Edges: 10-chains from part; the delta holds
    the bridging back halves (merging old components) plus brand-new tail
    nodes. Oracle: full recursive-CTE recompute over the union — the
    incremental answer must equal it exactly."""
    from gc_spark.operators.text_dedup import (
        connected_components,
        incremental_components,
    )

    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    base = p.select(
        pk.cast("long").alias("a"),
        (pk + 1).cast("long").alias("b"),
        (pk % 10).alias("m"),
    ).filter(F.col("m") < 9)
    e1 = base.filter(F.col("m") < 5).select("a", "b")
    e2 = base.filter(F.col("m") >= 5).select("a", "b")
    labels = connected_components(e1)
    return incremental_components(labels, e2)


def q157_powerlaw_alpha(spark, sf_dir):
    """Degree-distribution shape alarm (operators/linkspam.powerlaw_alpha):
    Hill MLE of the in-degree power-law exponent over the q52 host graph
    (distinct in-neighbors per host, tail d >= 2) — link farms flatten
    the tail and push alpha up; mirror sprawl pushes it down."""
    from gc_spark.operators.linkspam import powerlaw_alpha

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    ).distinct()
    degs = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    return powerlaw_alpha(degs, d_min=2)


_MIRRORS_ORACLE = """
    WITH corpus AS (
      SELECT source AS h, text FROM documents
      UNION ALL
      SELECT 'mirror-' || source, text FROM documents WHERE doc_id % 4 = 0
    ), fp AS (
      SELECT DISTINCT h, CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT) AS fp
      FROM corpus
    )
    SELECT a.h AS host_a, b.h AS host_b, COUNT(*) AS shared
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.h < b.h
    GROUP BY a.h, b.h HAVING COUNT(*) >= 2
"""


_ETA_ORACLE = """
    WITH fr AS (
      SELECT 'h' || CAST(p_partkey % 10 AS VARCHAR) AS host,
             'u' || CAST(p_partkey AS VARCHAR) AS url,
             CAST(p_partkey % 100 AS INT) AS priority,
             CAST(1.0 + (p_partkey % 10) % 3 AS DOUBLE) AS crawl_delay
      FROM part
    ), r AS (
      SELECT host, url, priority, crawl_delay,
             CAST(floor((ROW_NUMBER() OVER (PARTITION BY host
               ORDER BY priority, url) - 1) / 2.0) AS BIGINT) AS wave
      FROM fr
    )
    SELECT host, url, priority, crawl_delay, wave,
           CAST(wave * crawl_delay AS DOUBLE) AS eta_sec
    FROM r
"""


_BIGRAM_XENT_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), big AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                    i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS bg
      FROM toks
    ), bigf AS (
      SELECT doc_id, bg FROM big WHERE contains(bg, ' ')
    ), bc AS (
      SELECT bg, CAST(COUNT(*) AS DOUBLE) AS cb FROM bigf GROUP BY bg
    ), uni AS (
      SELECT UNNEST(t) AS term FROM toks
    ), uc AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS cu FROM uni GROUP BY term
    ), tot AS (SELECT SUM(cu) AS n FROM uc),
    pt AS (
      SELECT bg, 0.7 * cb / c1.cu
                 + (1.0 - 0.7) * c2.cu / (SELECT n FROM tot) AS p
      FROM bc
      JOIN uc c1 ON c1.term = split_part(bg, ' ', 1)
      JOIN uc c2 ON c2.term = split_part(bg, ' ', 2)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(-AVG(ln(p)), 6) AS xent
    FROM bigf JOIN pt USING (bg)
    GROUP BY doc_id ORDER BY doc_id
"""


_DUST_ORACLE = """
    WITH e AS (
      SELECT event_id % 10 AS d0, (event_id // 10) % 10 AS d1,
             (event_id // 100) % 10 AS d2, (event_id // 1000) % 10 AS d3
      FROM events
    ), u AS (
      SELECT 'h' || CAST(d3 AS VARCHAR) AS host,
             CAST(d2 AS VARCHAR) AS path,
             CAST(d1 % 3 AS VARCHAR) AS page,
             CAST(d0 // 5 AS VARCHAR) AS ref,
             CAST(d0 % 5 AS VARCHAR) AS sid,
             CAST('0x' || substr(sha256(
               'h' || CAST(d3 AS VARCHAR) || '/p/' || CAST(d2 AS VARCHAR)
               || '#' || CAST(d1 % 3 AS VARCHAR)), 1, 15) AS BIGINT) AS fp
      FROM e
    ), grp AS (
      SELECT host, 'page' AS param,
             host || '|' || path || '|' || ref || '|' || sid AS gkey,
             page AS val, fp FROM u
      UNION ALL
      SELECT host, 'ref', host || '|' || path || '|' || page || '|' || sid,
             ref, fp FROM u
      UNION ALL
      SELECT host, 'sid', host || '|' || path || '|' || page || '|' || ref,
             sid, fp FROM u
    ), agg AS (
      SELECT host, param, gkey,
             COUNT(DISTINCT val) AS nv, COUNT(DISTINCT fp) AS nf
      FROM grp GROUP BY 1, 2, 3
    )
    SELECT host, param, COUNT(*) AS groups_multi,
           CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           (COUNT(*) >= 2
            AND SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) = 0) AS strippable
    FROM agg WHERE nv >= 2 GROUP BY host, param
"""


_SOFT404_ORACLE = """
    WITH pages AS (
      SELECT 'h' || CAST(p_partkey % 10 AS VARCHAR) AS host,
             'u' || CAST(p_partkey AS VARCHAR) AS url,
             CAST('0x' || substr(sha256(
               CASE WHEN p_partkey % 5 = 0
                      THEN 'soft404 h' || CAST(p_partkey % 10 AS VARCHAR)
                    WHEN p_partkey % 7 = 3
                      THEN 'consent h' || CAST(p_partkey % 10 AS VARCHAR)
                    ELSE 'body ' || CAST(p_partkey AS VARCHAR) END
             ), 1, 15) AS BIGINT) AS fp
      FROM part
    ), by_fp AS (
      SELECT host, fp, COUNT(DISTINCT url) AS n_urls
      FROM pages GROUP BY host, fp
    ), totals AS (
      SELECT host, COUNT(DISTINCT url) AS host_urls FROM pages GROUP BY host
    )
    SELECT b.host, b.fp, b.n_urls,
           ROUND(CAST(b.n_urls AS DOUBLE) / t.host_urls, 6) AS share,
           (CAST(b.n_urls AS DOUBLE) / t.host_urls >= 0.1
            AND b.n_urls >= 5) AS is_template
    FROM by_fp b JOIN totals t USING (host)
    WHERE b.n_urls >= 2
"""


_DSIR_ORACLE = """
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id, source, UNNEST(t) AS f FROM toks
      UNION ALL
      SELECT doc_id, source, bg AS f FROM (
        SELECT doc_id, source,
               UNNEST(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                      i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS bg
        FROM toks
      ) WHERE contains(bg, ' ')
    ), hashed AS (
      SELECT doc_id, source,
             CAST('0x' || substr(sha256(f), 1, 15) AS BIGINT) % 4096 AS bucket
      FROM feats
    ), tc AS (
      SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS c FROM hashed
      WHERE source IN ('src0', 'src1', 'src2') GROUP BY bucket
    ), rc AS (
      SELECT bucket, CAST(COUNT(*) AS DOUBLE) AS c FROM hashed GROUP BY bucket
    ), tt AS (SELECT SUM(c) AS t FROM tc), rt AS (SELECT SUM(c) AS t FROM rc),
    ratio AS (
      SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
             ln(((COALESCE(tc.c, 0.0) + 1.0) / ((SELECT t FROM tt) + 4096.0))
                / ((COALESCE(rc.c, 0.0) + 1.0) / ((SELECT t FROM rt) + 4096.0)))
               AS log_ratio
      FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket
    ), doc_feats AS (
      SELECT doc_id, bucket, COUNT(*) AS c FROM hashed GROUP BY doc_id, bucket
    )
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_feats,
           ROUND(SUM(c * log_ratio), 6) AS weight
    FROM doc_feats JOIN ratio USING (bucket)
    GROUP BY doc_id
"""


_LINKFARM_ORACLE = """
    WITH raw AS (
      SELECT 'n' || CAST(event_id % 499 AS VARCHAR) AS src,
             'n' || CAST((event_id // 499 + event_id * 7) % 499 AS VARCHAR) AS dst
      FROM events
      UNION ALL
      SELECT 'f' || CAST(p_partkey % 10 AS VARCHAR),
             'f' || CAST((p_partkey // 10) % 10 AS VARCHAR)
      FROM part
    ), edges AS (
      SELECT DISTINCT src, dst FROM raw WHERE src <> dst
    ), marked AS (
      SELECT e.src, e.dst,
             CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS rec
      FROM edges e LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
    )
    SELECT src AS host, COUNT(*) AS out_degree,
           CAST(SUM(rec) AS BIGINT) AS reciprocal,
           ROUND(CAST(SUM(rec) AS DOUBLE) / COUNT(*), 6) AS ratio,
           (CAST(SUM(rec) AS DOUBLE) / COUNT(*) >= 0.5
            AND COUNT(*) >= 5) AS is_farm
    FROM marked GROUP BY src
"""


_PQ_ORACLE = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cb0 AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code FROM e
      QUALIFY code < 16
    ), subs AS (SELECT UNNEST(range(0, 4)) AS s),
    cb AS (
      SELECT s, code, list_slice(v, s * 16 + 1, s * 16 + 16) AS cvec
      FROM cb0, subs
    ), vs AS (
      SELECT vec_id, s, list_slice(v, s * 16 + 1, s * 16 + 16) AS svec
      FROM e, subs
    ), d AS (
      SELECT vec_id, vs.s, code,
             ROUND(list_sum(list_transform(range(1, 17),
               i -> (svec[i] - cvec[i]) * (svec[i] - cvec[i]))), 9) AS d2
      FROM vs JOIN cb ON vs.s = cb.s
    ), best AS (
      SELECT vec_id, s, code, d2 FROM d
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) = 1
    )
    SELECT vec_id, ROUND(SUM(d2) / 64.0, 6) AS mse,
           STRING_AGG(CAST(s AS VARCHAR) || ':' || CAST(code AS VARCHAR),
                      '-' ORDER BY s) AS codes
    FROM best GROUP BY vec_id
"""


_SOURCE_KL_ORACLE = """
    WITH gt AS (
      SELECT source AS grp,
             UNNEST(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), c AS (
      SELECT grp, term, CAST(COUNT(*) AS DOUBLE) AS cg FROM gt GROUP BY 1, 2
    ), corp AS (
      SELECT term, SUM(cg) AS cc FROM c GROUP BY term
    ), tc AS (SELECT SUM(cc) AS t FROM corp),
    tg AS (SELECT grp, SUM(cg) AS t FROM c GROUP BY grp)
    SELECT c.grp AS source, CAST(SUM(cg) AS BIGINT) AS n_tokens,
           ROUND(SUM((cg / tg.t) * ln((cg / tg.t) / (cc / (SELECT t FROM tc)))),
                 6) AS kl
    FROM c JOIN corp USING (term) JOIN tg ON c.grp = tg.grp
    GROUP BY c.grp
"""


_OOV_ORACLE = """
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS n FROM toks GROUP BY term
      ) QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) <= 16
    )
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov,
           ROUND(CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.doc_id
"""


_TRIANGLES_ORACLE = """
    WITH raw AS (
      SELECT 'g' || CAST(event_id % 211 AS VARCHAR) AS src,
             'g' || CAST((event_id * 3 + event_id // 211) % 211 AS VARCHAR)
               AS dst
      FROM events
      UNION ALL
      SELECT 'k' || CAST(n_nationkey % 5 AS VARCHAR),
             'k' || CAST((n_nationkey // 5) % 5 AS VARCHAR)
      FROM nation
    ), edges AS (
      SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
      FROM raw WHERE src <> dst
    ), deg AS (
      SELECT h, COUNT(*) AS degree FROM (
        SELECT lo AS h FROM edges UNION ALL SELECT hi FROM edges
      ) GROUP BY h
    ), tri AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM edges e1
      JOIN edges e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
      JOIN edges e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    ), per AS (
      SELECT h, COUNT(*) AS triangles FROM (
        SELECT a AS h FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY h
    )
    SELECT d.h AS host, d.degree, COALESCE(p.triangles, 0) AS triangles,
           CASE WHEN d.degree >= 2
                THEN ROUND(2.0 * COALESCE(p.triangles, 0)
                           / (d.degree * (d.degree - 1.0)), 6)
                ELSE CAST(0.0 AS DOUBLE) END AS coeff
    FROM deg d LEFT JOIN per p ON p.h = d.h
"""


_CHUNKS_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), idx AS (
      SELECT doc_id, t, UNNEST(range(0, (len(t) - 1) // 25 + 1)) AS i
      FROM toks
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(i * 25 + 1 AS INT) AS start_token,
           CAST(len(list_slice(t, i * 25 + 1, i * 25 + 50)) AS INT) AS n_tokens,
           CAST('0x' || substr(sha256(
             array_to_string(list_slice(t, i * 25 + 1, i * 25 + 50), ' ')
           ), 1, 15) AS BIGINT) AS chunk_fp
    FROM idx
"""


_TEMPERATURE_ORACLE = """
    WITH n AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ), tot AS (SELECT SUM(n) AS t FROM n),
    q AS (
      SELECT lang, n, pow(n / (SELECT t FROM tot), 0.3) AS pa FROM n
    ), sq AS (SELECT SUM(pa) AS s FROM q),
    quota AS (
      SELECT lang,
             least(1.0, 200.0 * (pa / (SELECT s FROM sq)) / n) AS keep_prob
      FROM q
    )
    SELECT d.doc_id, d.lang, ROUND(keep_prob, 6) AS keep_prob
    FROM documents d JOIN quota USING (lang)
    WHERE (CAST('0x' || substr(sha256('temp|' || CAST(doc_id AS VARCHAR)), 1, 15)
           AS BIGINT) % 1000000) / 1000000.0 < keep_prob
"""


_KCORE_ORACLE = """
    WITH raw AS (
      SELECT 'v' || CAST(event_id % 1999 AS VARCHAR) AS src,
             'v' || CAST((event_id * 3 + event_id // 1999) % 1999 AS VARCHAR)
               AS dst
      FROM events
      UNION ALL
      SELECT 'c' || CAST(p_partkey % 12 AS VARCHAR),
             'c' || CAST((p_partkey // 12) % 12 AS VARCHAR)
      FROM part
    ), canon AS (
      SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
      FROM raw WHERE src <> dst
    ), e0 AS (
      SELECT lo AS u, hi AS v FROM canon
      UNION ALL SELECT hi, lo FROM canon
    ), k0 AS (
      SELECT u FROM (SELECT u, COUNT(*) AS n FROM e0 GROUP BY u)
      WHERE n >= 10
    ), e1 AS (
      SELECT e.u, e.v FROM e0 e
      JOIN k0 a ON e.u = a.u JOIN k0 b ON e.v = b.u
    ), k1 AS (
      SELECT u FROM (SELECT u, COUNT(*) AS n FROM e1 GROUP BY u)
      WHERE n >= 10
    ), e2 AS (
      SELECT e.u, e.v FROM e1 e
      JOIN k1 a ON e.u = a.u JOIN k1 b ON e.v = b.u
    ), k2 AS (
      SELECT u FROM (SELECT u, COUNT(*) AS n FROM e2 GROUP BY u)
      WHERE n >= 10
    ), e3 AS (
      SELECT e.u, e.v FROM e2 e
      JOIN k2 a ON e.u = a.u JOIN k2 b ON e.v = b.u
    ), k3 AS (
      SELECT u FROM (SELECT u, COUNT(*) AS n FROM e3 GROUP BY u)
      WHERE n >= 10
    ), e4 AS (
      SELECT e.u, e.v FROM e3 e
      JOIN k3 a ON e.u = a.u JOIN k3 b ON e.v = b.u
    )
    SELECT u AS host, COUNT(*) AS degree FROM e4 GROUP BY u
"""


_SPANS_CTE = """
    WITH base AS (
      SELECT doc_id, text,
             UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1)
               AS BIGINT))) AS i
      FROM documents
    ), spans AS (
      SELECT doc_id, i + i // 3 AS o, 'text' AS kind,
             substring(text, CAST(i * 80 + 1 AS INT), 80) AS t,
             CAST(NULL AS VARCHAR) AS m
      FROM base
      UNION ALL
      SELECT doc_id, i + i // 3 + 1, 'media', CAST(NULL AS VARCHAR),
             'blob://doc/' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
      FROM base WHERE i % 3 = 2
    )
"""

_SPAN_TRUNCATE_ORACLE = _SPANS_CTE + """
    , w AS (
      SELECT doc_id, o, kind, t, m,
             length(coalesce(t, '')) AS len,
             COALESCE(SUM(CASE WHEN kind = 'text' THEN length(t) ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY o
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bef
      FROM spans
    ), kept AS (
      SELECT doc_id, o, kind, m,
             CASE WHEN kind = 'text'
                  THEN substring(t, 1, CAST(least(len, 250 - bef) AS INT))
                  ELSE NULL END AS kt
      FROM w WHERE 250 - bef > 0
    ), tot AS (
      SELECT doc_id,
             SUM(CASE WHEN kind = 'text' THEN length(t) ELSE 0 END) AS total
      FROM spans GROUP BY doc_id
    )
    SELECT k.doc_id,
           CAST(COUNT(*) AS INT) AS n_spans,
           CAST(COALESCE(SUM(length(kt)), 0) AS INT) AS n_chars,
           (MAX(tot.total) > 250) AS truncated,
           sha256(string_agg(
             kind || '|' || CAST(length(coalesce(kt, '')) AS VARCHAR) || '|'
               || coalesce(kt, '') || '|'
               || CAST(length(coalesce(m, '')) AS VARCHAR) || '|'
               || coalesce(m, ''),
             chr(10) ORDER BY o)) AS span_seq_sha
    FROM kept k JOIN tot ON k.doc_id = tot.doc_id
    GROUP BY k.doc_id
"""

_CAPTIONS_ORACLE = _SPANS_CTE + """
    SELECT s.doc_id, s.m AS media_ref, substring(t2.t, 1, 40) AS caption
    FROM spans s LEFT JOIN spans t2
      ON t2.doc_id = s.doc_id AND t2.o = s.o + 1 AND t2.kind = 'text'
    WHERE s.kind = 'media'
"""


_FAIRNESS_ORACLE = """
    WITH per_host AS (
      SELECT event_type, 'h' || CAST(user_id % 50 AS VARCHAR) AS host,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, COUNT(*) AS n_hosts,
           ROUND((SUM(x) * SUM(x)) / (COUNT(*) * SUM(x * x)), 6) AS jain
    FROM per_host GROUP BY event_type
"""


_PSEUDONYM_ORACLE = """
    WITH planted AS (
      SELECT doc_id,
             'user' || CAST(doc_id % 40 AS VARCHAR) || '@example.mil' AS pii
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT pii,
           'user-' || substr(sha256('r3|' || pii), 1, 12) || '@anon.invalid'
             AS pseudonym,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM planted GROUP BY pii
"""


_SHARD_MANIFEST_ORACLE = """
    WITH rows_ AS (
      SELECT CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) % 16 AS shard,
             doc_id, length(text) AS len,
             len(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(SUM(len) AS BIGINT) AS n_chars,
           sha256(string_agg(CAST(doc_id AS VARCHAR) || ':'
                             || CAST(len AS VARCHAR), chr(10)
                             ORDER BY doc_id)) AS manifest_sha
    FROM rows_ GROUP BY shard
"""


_POLITENESS_AUDIT_ORACLE = """
    WITH f AS (
      SELECT 'h' || CAST(user_id % 50 AS VARCHAR) AS host, ts, event_id,
             1.0 + (user_id % 50) % 3 AS d
      FROM events
    ), g AS (
      SELECT host, d,
             epoch(ts) - epoch(lag(ts) OVER (PARTITION BY host
                                             ORDER BY ts, event_id)) AS gap
      FROM f
    )
    SELECT host, COUNT(*) AS n_fetches,
           ROUND(MIN(gap), 6) AS min_gap,
           CAST(SUM(CASE WHEN gap < d THEN 1 ELSE 0 END) AS BIGINT)
             AS violations,
           (SUM(CASE WHEN gap < d THEN 1 ELSE 0 END) = 0) AS compliant
    FROM g GROUP BY host
"""


_WEIGHTED_SAMPLE_ORACLE = """
    WITH keyed AS (
      SELECT doc_id, n_chars AS weight,
             ln(((CAST('0x' || substr(sha256('es|' || CAST(doc_id AS VARCHAR)),
                       1, 15) AS BIGINT) % 1000000) + 0.5) / 1000000.0)
               / n_chars AS k
      FROM documents
    )
    SELECT doc_id, weight, ROUND(k, 6) AS es_key FROM keyed
    QUALIFY ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) <= 50
"""


_SIZE_ANOMALY_ORACLE = """
    WITH f AS (
      SELECT 'h' || CAST(user_id % 50 AS VARCHAR) AS host,
             'e' || CAST(event_id AS VARCHAR) AS id,
             value * 100.0 * (CASE WHEN event_id % 211 = 0
                                   THEN 40.0 ELSE 1.0 END) AS size
      FROM events
    ), med AS (
      SELECT host, quantile_cont(size, 0.5) AS med FROM f GROUP BY host
    ), dev AS (
      SELECT f.host, id, size, med, ABS(size - med) AS adev
      FROM f JOIN med USING (host)
    ), mad AS (
      SELECT host, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY host
    )
    SELECT d.host, id, size, ROUND(med, 4) AS med,
           ROUND(mad * 1.4826, 4) AS mad_sigma,
           ROUND(CASE WHEN mad * 1.4826 > 0
                      THEN adev / (mad * 1.4826) END, 4) AS z,
           CASE WHEN mad * 1.4826 > 0 THEN adev / (mad * 1.4826) > 3.0
                ELSE adev > 0 END AS is_anomaly
    FROM dev d JOIN mad USING (host)
"""


_REVISION_ORACLE = """
    WITH newt AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                  THEN 'totally different content doc '
                       || CAST(doc_id AS VARCHAR) || ' now rewritten entirely'
                  ELSE text || ' tail tokens appended here' END AS text
      FROM documents
    ), sho AS (
      SELECT doc_id, list_distinct(list_filter(
               list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                 i -> array_to_string(list_slice(t, i, i + 2), ' ')),
               g -> contains(g, ' '))) AS a
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents)
    ), shn AS (
      SELECT doc_id, list_distinct(list_filter(
               list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                 i -> array_to_string(list_slice(t, i, i + 2), ' ')),
               g -> contains(g, ' '))) AS b
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM newt)
    ), j AS (
      SELECT sho.doc_id,
             len(list_intersect(a, b)) AS inter,
             len(a) + len(b) - len(list_intersect(a, b)) AS un
      FROM sho JOIN shn USING (doc_id)
    )
    SELECT doc_id,
           ROUND(CASE WHEN un > 0
                      THEN CAST(inter AS DOUBLE) / un ELSE 1.0 END, 6)
             AS jaccard,
           CASE WHEN (CASE WHEN un > 0 THEN CAST(inter AS DOUBLE) / un
                           ELSE 1.0 END) >= 0.5
                THEN 'minor' ELSE 'rewrite' END AS change_class
    FROM j
"""


_VOCAB_GROWTH_ORACLE = """
    WITH tk AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, UNNEST(list_filter(
        list_transform(range(1, greatest(len(t) - 2, 1) + 1),
          i -> array_to_string(list_slice(t, i, i + 2), ' ')),
        g -> contains(g, ' '))) AS term
      FROM tk
    ), mx AS (SELECT MAX(doc_id) AS m FROM documents)
    SELECT
      COUNT(DISTINCT CASE WHEN doc_id <= (SELECT m FROM mx) * 0.25
                          THEN term END) AS vocab_25,
      COUNT(DISTINCT CASE WHEN doc_id <= (SELECT m FROM mx) * 0.50
                          THEN term END) AS vocab_50,
      COUNT(DISTINCT CASE WHEN doc_id <= (SELECT m FROM mx) * 0.75
                          THEN term END) AS vocab_75,
      COUNT(DISTINCT term) AS vocab_100,
      COUNT(*) AS n_tokens
    FROM toks
"""


_BACKOFF_ORACLE = """
    WITH f AS (
      SELECT 'u' || CAST(p_partkey AS VARCHAR) AS url,
             CAST(p_partkey % 7 AS INT) AS attempts
      FROM part
    )
    SELECT url, attempts,
           ROUND(least(60.0, 1.0 * pow(2.0, attempts))
                 * (0.5 + 0.5 * ((CAST('0x' || substr(sha256('bo|' || url),
                      1, 15) AS BIGINT) % 1000) / 1000.0)), 6) AS backoff_sec,
           (attempts >= 5) AS give_up
    FROM f
"""


_ROBOTS_WILDCARD_ORACLE = """
    WITH hosts AS (
      SELECT 'h' || CAST(n_nationkey AS VARCHAR) AS host, n_nationkey AS h
      FROM nation WHERE n_nationkey < 8
    ), rules AS (
      SELECT host, 'disallow' AS rule_type, '/private/*' AS pattern FROM hosts
      UNION ALL SELECT host, 'allow', '/private/*.html$' FROM hosts
      UNION ALL SELECT host, 'disallow', '/tmp/' FROM hosts
      UNION ALL SELECT host, 'disallow',
                '/p' || CAST(h AS VARCHAR) || '/*.pdf$' FROM hosts
    ), urls AS (
      SELECT 'h' || CAST(p_partkey % 8 AS VARCHAR) AS host,
             CASE CAST(p_partkey % 5 AS INT)
               WHEN 0 THEN '/private/doc' || CAST(p_partkey AS VARCHAR) || '.html'
               WHEN 1 THEN '/private/doc' || CAST(p_partkey AS VARCHAR) || '.pdf'
               WHEN 2 THEN '/tmp/f' || CAST(p_partkey AS VARCHAR)
               WHEN 3 THEN '/p' || CAST(p_partkey % 8 AS VARCHAR)
                        || '/doc' || CAST(p_partkey AS VARCHAR) || '.pdf'
               ELSE '/pub/doc' || CAST(p_partkey AS VARCHAR) || '.html'
             END AS path
      FROM part
    ), rx AS (
      SELECT host, rule_type, pattern,
             '^' || replace(replace(
                      CASE WHEN pattern LIKE '%$'
                           THEN substr(pattern, 1, length(pattern) - 1)
                           ELSE pattern END,
                      '.', '\\.'), '*', '.*')
                 || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS regex,
             length(pattern) AS plen
      FROM rules
    ), m AS (
      SELECT u.host, u.path, r.rule_type, r.pattern, r.plen
      FROM urls u LEFT JOIN rx r
        ON u.host = r.host AND regexp_matches(u.path, r.regex)
    ), w AS (
      SELECT host, path, rule_type, pattern,
             ROW_NUMBER() OVER (PARTITION BY host, path
               ORDER BY (pattern IS NOT NULL) DESC, plen DESC,
                        rule_type ASC, pattern ASC) AS rn
      FROM m
    )
    SELECT host, path,
           CASE WHEN pattern IS NULL THEN TRUE
                ELSE rule_type = 'allow' END AS allowed,
           rule_type, pattern AS matched_pattern
    FROM w WHERE rn = 1
"""


_BFS_ORACLE = """
    WITH RECURSIVE bfs_edges AS (
      SELECT CAST(p_partkey AS BIGINT) AS src, CAST(p_partkey + 1 AS BIGINT) AS dst
      FROM part WHERE p_partkey % 16 < 15
      UNION ALL
      SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey + 2 AS BIGINT)
      FROM part WHERE p_partkey % 16 <= 13 AND p_partkey % 2 = 0
    ), bfs AS (
      SELECT CAST(p_partkey AS BIGINT) AS node, 0 AS depth
      FROM part WHERE p_partkey % 16 = 0
      UNION
      SELECT e.dst, b.depth + 1
      FROM bfs b JOIN bfs_edges e ON e.src = b.node
      WHERE b.depth < 6
    )
    SELECT node, CAST(MIN(depth) AS INT) AS depth FROM bfs GROUP BY node
"""


_RANGES_ORACLE = """
    WITH r AS (
      SELECT l_orderkey AS media_ref,
             CAST((l_partkey % 20) * 50 + l_linenumber AS BIGINT) AS s,
             CAST((l_partkey % 20) * 50 + l_linenumber
                  + 30 + (l_suppkey % 40) * 2 AS BIGINT) AS e
      FROM lineitem
    ), m AS (
      SELECT media_ref, s, e,
             MAX(e) OVER (PARTITION BY media_ref ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
      FROM r
    ), f AS (
      SELECT media_ref, s, e,
             CASE WHEN run_max IS NULL OR s > run_max + 8 THEN 1 ELSE 0 END AS ni
      FROM m
    ), g AS (
      SELECT media_ref, s, e,
             SUM(ni) OVER (PARTITION BY media_ref ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM f
    )
    SELECT media_ref, MIN(s) AS start, MAX(e) AS "end",
           COUNT(*) AS n_ranges
    FROM g GROUP BY media_ref, island
"""


_CONTAINMENT_ORACLE = """
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
    ), un AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id + 1000000,
             array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 1, 12), ' ')
      FROM base
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
               i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM un
    ), ex AS (
      SELECT doc_id,
             CAST('0x' || substr(sha256(UNNEST(shingles)), 1, 15) AS BIGINT) AS shh
      FROM sh
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS size_a FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
      FROM ex x JOIN ex y ON x.shh = y.shh AND x.doc_id <> y.doc_id
      GROUP BY x.doc_id, y.doc_id
    )
    SELECT i.a, i.b, i.inter, s.size_a,
           ROUND(CAST(i.inter AS DOUBLE) / s.size_a, 6) AS containment
    FROM inter i JOIN sizes s ON s.doc_id = i.a
    WHERE ROUND(CAST(i.inter AS DOUBLE) / s.size_a, 6) >= 0.9
    ORDER BY a, b
"""


_NOVELTY_ORACLE = """
    WITH g AS (
      SELECT doc_id, doc_id AS seq,
             UNNEST(list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 4, 1) + 1),
               i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 4), ' ')
             ))) AS gram
      FROM documents
    ), h AS (
      SELECT doc_id, seq,
             CAST('0x' || substr(sha256(gram), 1, 15) AS BIGINT) AS gh
      FROM g
    ), f AS (
      SELECT gh, MIN(seq) AS first_seq FROM h GROUP BY gh
    )
    SELECT doc_id, seq, COUNT(*) AS n_grams,
           ROUND(AVG(CASE WHEN seq = first_seq THEN CAST(1 AS DOUBLE)
                          ELSE CAST(0 AS DOUBLE) END), 6) AS novel_frac
    FROM h JOIN f USING (gh)
    GROUP BY doc_id, seq ORDER BY doc_id
"""


_QUANT_ORACLE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    d AS (SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM e),
    s AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM d GROUP BY dim),
    p AS (
      SELECT vec_id, x, mn, mx,
             CASE WHEN mx - mn = 0.0 THEN 0.0
                  ELSE round((x - mn) / (mx - mn) * 255.0) END AS q
      FROM d JOIN s USING (dim)
    ),
    r AS (SELECT vec_id, ABS(mn + q * (mx - mn) / 255.0 - x) AS err FROM p)
    SELECT vec_id, MAX(err) AS max_abs_err, SUM(err * err) / 64.0 AS mse
    FROM r GROUP BY vec_id ORDER BY vec_id
"""


_ASOF_ORACLE = """
    WITH snaps AS (
      SELECT user_id % 20 AS host, ts, MAX(value) AS budget
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ), fetches AS (
      SELECT event_id, user_id % 20 AS host, ts
      FROM events WHERE event_type <> 'error'
    )
    SELECT f.event_id, f.host, f.ts, s.ts AS asof_ts, s.budget
    FROM fetches f ASOF LEFT JOIN snaps s
      ON f.host = s.host AND f.ts >= s.ts
"""


_MIXTURE_ORACLE = """
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n_docs FROM documents GROUP BY source, lang
    ), t AS (
      SELECT CAST(SUM(n_docs) AS DOUBLE) AS n FROM c
    ), p AS (
      SELECT source, lang, n_docs, pow(n_docs / (SELECT n FROM t), 0.7) AS pw FROM c
    )
    SELECT source, lang, n_docs,
           ROUND(pw / (SELECT SUM(pw) FROM p), 6) AS weight,
           CAST(ROUND(pw / (SELECT SUM(pw) FROM p) * (SELECT n FROM t), 0) AS BIGINT)
             AS expected_per_epoch
    FROM p
"""


_ANCHOR_ORACLE = """
    WITH links AS (
      SELECT (user_id * 7 + event_id) % 50 AS target, event_type AS anchor
      FROM events
    ), c AS (
      SELECT target, anchor, COUNT(*) AS n FROM links GROUP BY target, anchor
    ), r AS (
      SELECT target, anchor, n,
             ROW_NUMBER() OVER (PARTITION BY target ORDER BY n DESC, anchor ASC) AS "rank",
             SUM(n) OVER (PARTITION BY target) AS total_links
      FROM c
    )
    SELECT target, anchor, n, "rank", total_links FROM r WHERE "rank" <= 3
"""


_WINNOW_OVERLAP_ORACLE = """
    WITH h AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(len(text) - 7, 1) + 1),
               i -> CAST(('0x' || substr(sha256(substr(text, i, 8)), 1, 15)) AS BIGINT)
             ) AS hs
      FROM documents
    ), w AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               j -> list_min(list_slice(hs, j, j + 3))
             ))) AS fp
      FROM h
    ), e AS (
      SELECT doc_id, UNNEST(fp) AS f FROM w
    ), rare AS (
      SELECT f FROM e GROUP BY f HAVING COUNT(*) BETWEEN 2 AND 10
    ), ek AS (
      SELECT e.doc_id, e.f FROM e JOIN rare ON rare.f = e.f
    ), p AS (
      SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS shared
      FROM ek a JOIN ek b ON a.f = b.f AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT p.a, p.b, p.shared,
           ROUND(p.shared / least(CAST(len(wa.fp) AS DOUBLE), CAST(len(wb.fp) AS DOUBLE)), 6) AS overlap
    FROM p JOIN w wa ON wa.doc_id = p.a JOIN w wb ON wb.doc_id = p.b
"""


_SPAN_COALESCE_ORACLE = """
    WITH base AS (
      SELECT doc_id, text,
             UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1) AS BIGINT))) AS i
      FROM documents
    ), flat AS (
      SELECT doc_id, CAST(i + i // 3 AS INT) AS span_offset, 'text' AS kind,
             substring(text, CAST(i * 80 + 1 AS INT), 80) AS span_text,
             CAST(NULL AS VARCHAR) AS media_ref
      FROM base
      UNION ALL
      SELECT doc_id, CAST(i + i // 3 + 1 AS INT), 'media', CAST(NULL AS VARCHAR),
             'blob://doc/' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
      FROM base WHERE i % 3 = 2
    ), lagged AS (
      SELECT *, lag(kind) OVER (PARTITION BY doc_id ORDER BY span_offset) AS prev_kind
      FROM flat
    ), runs AS (
      SELECT *, SUM(CASE WHEN kind = 'media' OR prev_kind IS NULL
                           OR prev_kind = 'media' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY span_offset) AS grp
      FROM lagged
    )
    SELECT doc_id, CAST(grp - 1 AS INT) AS span_offset, min(kind) AS kind,
           CASE WHEN min(kind) = 'text'
                THEN string_agg(span_text, '' ORDER BY span_offset) END AS span_text,
           max(media_ref) AS media_ref
    FROM runs GROUP BY doc_id, grp
"""


_GOPHER_ORACLE = """
    WITH tk AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             ROUND(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
                   / len(toks), 6) AS mean_word_len,
             ROUND(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                   / CAST(len(toks) AS DOUBLE), 6) AS alpha_frac,
             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                                  s -> list_contains(toks, s))) AS INTEGER) AS stop_hits,
             ROUND(((length(text) - length(replace(text, '#', '')))
                    + (length(text) - length(replace(text, '...', ''))) / 3.0)
                   / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio
      FROM tk
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits, symbol_ratio,
           (n_words BETWEEN 20 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_ratio < 0.1
            AND alpha_frac > 0.8
            AND stop_hits >= 2) AS quality_pass
    FROM m
"""


def _semantic_dedup_oracle() -> str:
    """Twin of q70: argmax-cosine assignment to the 8 lowest-id unit seeds
    (ties → larger cell id, matching ivf_cell_col's struct array_max), then
    drop b if some a < b in the same cell has round(cos, 6) >= 0.9."""
    return """
        WITH un AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          UNION ALL
          SELECT vec_id + 10000000,
                 list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.5)
          FROM embeddings WHERE vec_id % 50 = 0
        ), cents AS (
          SELECT vec_id AS c,
                 list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS ce
          FROM un WHERE vec_id < 8
        ), unit AS (
          SELECT vec_id,
                 list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u
          FROM un
        ), asg AS (
          SELECT vec_id, u, c AS cell FROM (
            SELECT vec_id, u, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY list_dot_product(u, ce) DESC, c DESC) AS rn
            FROM unit CROSS JOIN cents
          ) WHERE rn = 1
        ), dropped AS (
          SELECT DISTINCT b.vec_id
          FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE ROUND(list_dot_product(a.u, b.u), 6) >= 0.9
        )
        SELECT asg.vec_id, cell
        FROM asg LEFT JOIN dropped d ON asg.vec_id = d.vec_id
        WHERE d.vec_id IS NULL
    """


def _hits_oracle(iters: int = 3) -> str:
    """Chained-CTE twin of operators/hits.hits: per iteration an authority
    half-step (sum of in-neighbor hubs, L1-normalized) then a hub half-step
    (sum of out-neighbor auths, L1-normalized)."""
    parts = [
        "WITH e AS (SELECT DISTINCT user_id % 50 AS src,"
        " (user_id * 7 + event_id) % 50 AS dst FROM events)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "h0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS h FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = f"h{k - 1}"
        parts.append(
            f"ar{k} AS (SELECT e.dst AS node, SUM({p}.h) AS a"
            f" FROM e JOIN {p} ON {p}.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"a{k} AS (SELECT nd.node, COALESCE(ar.a, 0) /"
            f" (SELECT COALESCE(SUM(a), 1) FROM ar{k}) AS a"
            f" FROM nodes nd LEFT JOIN ar{k} ar ON nd.node = ar.node)"
        )
        parts.append(
            f"hr{k} AS (SELECT e.src AS node, SUM(a{k}.a) AS h"
            f" FROM e JOIN a{k} ON a{k}.node = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"h{k} AS (SELECT nd.node, COALESCE(hr.h, 0) /"
            f" (SELECT COALESCE(SUM(h), 1) FROM hr{k}) AS h"
            f" FROM nodes nd LEFT JOIN hr{k} hr ON nd.node = hr.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.node, ROUND(h.h, 6) AS hub, ROUND(a.a, 6) AS auth"
        f" FROM h{iters} h JOIN a{iters} a ON h.node = a.node"
    )


def _bpe_oracle(rounds: int = 3, audit: bool = False) -> str:
    """Chained-CTE twin of learn_bpe_merges: pair counts -> top-1 ->
    padded-space replace per round; with audit=True, corpus sha via
    ordered string_agg (matches the operator's audit=True schema)."""
    parts = ["t0 AS (SELECT doc_id, text AS t FROM documents)"]
    rows = []
    for k in range(1, rounds + 1):
        p = f"t{k - 1}"
        parts.append(
            f"p{k} AS (SELECT string_split(g, ' ')[1] AS w1,"
            f" string_split(g, ' ')[2] AS w2, COUNT(*) AS n FROM ("
            f" SELECT UNNEST(list_transform(range(1, greatest(len(tok) - 1, 1) + 1),"
            f" i -> array_to_string(list_slice(tok, i, i + 1), ' '))) AS g"
            f" FROM (SELECT string_split_regex(trim(t), '\\s+') AS tok FROM {p})"
            f" ) WHERE contains(g, ' ') GROUP BY 1, 2)"
        )
        parts.append(
            f"top{k} AS (SELECT w1, w2, n FROM p{k}"
            f" ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 1)"
        )
        parts.append(
            f"t{k} AS (SELECT doc_id, trim(replace(' ' || t || ' ',"
            f" ' ' || (SELECT w1 FROM top{k}) || ' ' || (SELECT w2 FROM top{k}) || ' ',"
            f" ' ' || (SELECT w1 FROM top{k}) || '+' || (SELECT w2 FROM top{k}) || ' '))"
            f" AS t FROM {p})"
        )
        sha = (
            f", (SELECT sha256(string_agg(t, chr(1) ORDER BY doc_id)) FROM t{k})"
            f" AS corpus_sha"
            if audit
            else ""
        )
        rows.append(f'SELECT {k} AS "round", w1, w2, n{sha} FROM top{k}')
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


def _pagerank_cte(iters: int = 5, damping: float = 0.85) -> str:
    """Chained-CTE power iteration — r{k} from r{k-1}, dangling mass as a
    scalar subquery, constants cast to DOUBLE so both engines do the same
    float arithmetic. Shared by the q52 (ranks) and q61 (budget
    allocation) oracles."""
    d = f"CAST({damping} AS DOUBLE)"
    n = "(SELECT n FROM nn)"
    parts = [
        "WITH e AS (SELECT DISTINCT user_id % 50 AS src,"
        " (user_id * 7 + event_id) % 50 AS dst FROM events)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        f"r0 AS (SELECT node, 1.0 / {n} AS r FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = f"r{k - 1}"
        parts.append(
            f"r{k} AS (SELECT nd.node, (1.0 - {d}) / {n} + {d} * (COALESCE(c.s, 0)"
            f" + (SELECT COALESCE(SUM({p}.r), 0) FROM {p} LEFT JOIN deg"
            f" ON {p}.node = deg.src WHERE deg.src IS NULL) / {n}) AS r"
            f" FROM nodes nd LEFT JOIN"
            f" (SELECT e.dst AS node, SUM({p}.r / deg.d) AS s"
            f" FROM {p} JOIN deg ON {p}.node = deg.src JOIN e ON e.src = {p}.node"
            f" GROUP BY e.dst) c ON nd.node = c.node)"
        )
    return ",\n".join(parts) + "\n"


def _pagerank_oracle(iters: int = 5, damping: float = 0.85) -> str:
    return (
        _pagerank_cte(iters, damping)
        + f'SELECT node, ROUND(r, 6) AS "rank" FROM r{iters}'
    )


def _opic_oracle(iters: int = 5) -> str:
    """Chained-CTE OPIC cash rounds — s{k}(node, cash, hist) from s{k-1},
    dangling cash as a scalar subquery redistributed uniformly, the same
    recurrence operators/opic.py folds (hist_k = hist+cash; cash_k =
    incoming + dangling/n)."""
    n = "(SELECT n FROM nn)"
    parts = [
        "WITH e AS (SELECT DISTINCT user_id % 50 AS src,"
        " (user_id * 7 + event_id) % 50 AS dst FROM events)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        f"s0 AS (SELECT node, 1.0 / {n} AS cash, CAST(0 AS DOUBLE) AS hist"
        " FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = f"s{k - 1}"
        parts.append(
            f"s{k} AS (SELECT nd.node,"
            f" COALESCE(c.s, 0) + (SELECT COALESCE(SUM({p}.cash), 0) FROM {p}"
            f" LEFT JOIN deg ON {p}.node = deg.src WHERE deg.src IS NULL)"
            f" / {n} AS cash,"
            f" pr.hist + pr.cash AS hist"
            f" FROM nodes nd LEFT JOIN"
            f" (SELECT e.dst AS node, SUM({p}.cash / deg.d) AS s"
            f" FROM {p} JOIN deg ON {p}.node = deg.src JOIN e ON e.src = {p}.node"
            f" GROUP BY e.dst) c ON nd.node = c.node"
            f" JOIN {p} pr ON nd.node = pr.node)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT node, ROUND((hist + cash) / {float(iters + 1)}, 6)"
        f" AS importance FROM s{iters}"
    )


_SCORED_EVENTS_SQL = """
      SELECT ((event_id % 100) + 0.5) / 100.0 AS v,
             CASE WHEN (user_id % 100) < (event_id % 100)
                  THEN 1 ELSE 0 END AS y
      FROM events
"""


def _pr_sweep_oracle(ths) -> str:
    """One conditional-aggregate pass + a VALUES unpivot — the same
    27-counter shape operators/classifier_eval.pr_at_thresholds runs."""
    counters = ["SUM(y) AS p"]
    for i, t in enumerate(ths):
        counters.append(
            f"SUM(CASE WHEN v >= {t} THEN 1 ELSE 0 END) AS pp{i}"
        )
        counters.append(
            f"SUM(CASE WHEN v >= {t} AND y = 1 THEN 1 ELSE 0 END) AS tp{i}"
        )
    branches = "\n      UNION ALL ".join(
        f"SELECT CAST({t} AS DOUBLE) AS threshold, pp{i} AS n_pred_pos,"
        f" tp{i} AS tp, p FROM a"
        for i, t in enumerate(ths)
    )
    return f"""
    WITH e AS ({_SCORED_EVENTS_SQL}),
    a AS (SELECT {', '.join(counters)} FROM e),
    rows AS ({branches})
    SELECT threshold, n_pred_pos, tp,
           CASE WHEN n_pred_pos > 0
                THEN ROUND(tp / CAST(n_pred_pos AS DOUBLE), 6) END AS precision,
           CASE WHEN p > 0 THEN ROUND(tp / CAST(p AS DOUBLE), 6)
                ELSE 0.0 END AS recall,
           CASE WHEN (n_pred_pos + p) > 0
                THEN ROUND(2.0 * CAST(tp AS DOUBLE)
                           / CAST(n_pred_pos + p AS DOUBLE), 6) END AS f1
    FROM rows
"""


def _salsa_oracle(iters: int = 5) -> str:
    """Chained-CTE SALSA bipartite walk — h{k} from a{k-1}, a{k} from
    h{k}, the same normalized propagation operators/salsa.py runs."""
    parts = [
        "WITH e AS (SELECT DISTINCT user_id % 50 AS src,"
        " (user_id * 7 + event_id) % 50 AS dst FROM events)",
        "ind AS (SELECT dst AS an, CAST(COUNT(*) AS DOUBLE) AS ind"
        " FROM e GROUP BY dst)",
        "outd AS (SELECT src AS hn, CAST(COUNT(*) AS DOUBLE) AS outd"
        " FROM e GROUP BY src)",
        "a0 AS (SELECT an AS node,"
        " 1.0 / (SELECT CAST(COUNT(*) AS DOUBLE) FROM ind) AS a FROM ind)",
    ]
    for k in range(1, iters + 1):
        p = f"a{k - 1}"
        parts.append(
            f"h{k} AS (SELECT e.src AS node, SUM({p}.a / ind.ind) AS h"
            f" FROM {p} JOIN ind ON {p}.node = ind.an"
            f" JOIN e ON e.dst = {p}.node GROUP BY e.src)"
        )
        parts.append(
            f"a{k} AS (SELECT e.dst AS node, SUM(h{k}.h / outd.outd) AS a"
            f" FROM h{k} JOIN outd ON h{k}.node = outd.hn"
            f" JOIN e ON e.src = h{k}.node GROUP BY e.dst)"
        )
    return (
        ",\n".join(parts)
        + f"""
    SELECT COALESCE(a.node, h.node) AS node,
           ROUND(COALESCE(a.a, 0), 6) AS authority,
           ROUND(COALESCE(h.h, 0), 6) AS hub
    FROM a{iters} a FULL OUTER JOIN h{iters} h ON a.node = h.node
"""
    )


def q34_pending_join(spark, sf_dir):
    """§2.11 meta-carry twin: pending-docs completion join
    (operators/pending.resolve_pending) — listing-built pendings keyed by a
    64-bit detail key are completed by this batch's detail records: the raw
    href enters the version-hash map under pending_hash_key, the encoded
    href becomes download_url and the single downloadable item (type from
    the extension). Two of three pendings complete; one stays open."""
    from gc_spark.operators.pending import resolve_pending

    p = _t(spark, sf_dir, "part")
    pending = p.select(
        F.col("p_partkey"),
        F.col("p_partkey").cast("long").alias("detail_url_hash64"),
        F.lit(None).cast("string").alias("download_url"),
        F.lit(None).cast(
            "array<struct<doc_type:string,download_url:string,compression_type:string>>"
        ).alias("downloadable_items"),
        F.create_map(F.lit("doc_name"), F.concat(F.lit("part-"), F.col("p_partkey").cast("string"))).alias(
            "version_hash_raw_data"
        ),
        F.when(F.col("p_partkey") % 2 == 0, F.lit("item_currency")).alias("pending_hash_key"),
    )
    details = p.filter(F.col("p_partkey") % 3 != 0).select(
        F.col("p_partkey").cast("long").alias("detail_url_hash64"),
        F.concat(
            F.lit("https://x.mil/files/f"),
            F.col("p_partkey").cast("string"),
            F.when(F.col("p_partkey") % 2 == 0, F.lit(".pdf")).otherwise(F.lit(".zip")),
        ).alias("detail_download_href"),
    )
    out = resolve_pending(pending, details)
    return out.select(
        "p_partkey",
        "download_url",
        F.col("downloadable_items")[0]["doc_type"].alias("picked_type"),
        F.col("version_hash_raw_data")["doc_name"].alias("hash_doc_name"),
        F.coalesce(
            F.col("version_hash_raw_data")["item_currency"],
            F.col("version_hash_raw_data")["download_url"],
        ).alias("hash_href"),
    )


def q35_validate_split(spark, sf_dir):
    """F8 schema-validation split (operators/enrich.validate_items): nulls
    in required fields / malformed source_page_url go to the dead-letter
    side with a first-failing-check reason string. Returns the invalid side
    — the interesting one (the reason derivation is ordered)."""
    from gc_spark.operators.enrich import validate_items

    o = _t(spark, sf_dir, "orders")
    items = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 != 0, F.concat(F.lit("doc-"), F.col("o_orderkey").cast("string"))).alias("doc_name"),
        F.lit("synthetic").alias("crawler_used"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("not a url"))
        .otherwise(F.concat(F.lit("https://x.mil/p/"), F.col("o_orderkey").cast("string")))
        .alias("source_page_url"),
        F.when(F.col("o_orderkey") % 13 != 0, F.sha2(F.col("o_orderkey").cast("string"), 256)).alias("version_hash"),
        F.lit("2024-01-02T00:00:00").alias("access_timestamp"),
    )
    _valid, invalid = validate_items(items)
    return invalid.select("o_orderkey", F.col("_invalid_reason").alias("reason"))


def q177_kmv_setops(spark, sf_dir):
    """Theta/KMV sketch set algebra (operators/kmv): the manifest-diff
    question HLL can't answer — per priority class, how many distinct
    customers appear in BOTH the finished-order stream and the open-order
    stream, estimated from two 64-value sketches instead of a corpus-sized
    join. The sketch build pre-filters the corpus to h <= safety*k/D_est
    (D_est free via approx_count_distinct) so the exact k-min shuffle is
    O(k) rows per group, with an exact fallback for starved groups — the
    output is the true k-min, which is why a plain row_number()<=k window
    oracles it. Exact union/intersection ride along to show the error."""
    from gc_spark.operators.kmv import kmv_set_ops, kmv_sketch

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderstatus").alias("st"),
        F.concat(F.lit("u"), (F.col("o_custkey") % 4000).cast("string")).alias(
            "item"
        ),
    )
    a = base.where(F.col("st") != "O").select("g", "item")
    b = base.where(F.col("st") == "O").select("g", "item")
    ops = kmv_set_ops(
        kmv_sketch(a, "item", ["g"], k=64),
        kmv_sketch(b, "item", ["g"], k=64),
        ["g"],
        k=64,
    )
    da, db = a.distinct(), b.distinct()
    exact_u = (
        da.unionByName(db)
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("exact_union"))
    )
    exact_i = (
        da.join(db, ["g", "item"]).groupBy("g").agg(F.count("*").alias("exact_intersect"))
    )
    return ops.join(exact_u, "g").join(exact_i, "g").select(
        "g",
        "n_eff",
        "est_union",
        "est_intersect",
        "est_a_only",
        "exact_union",
        "exact_intersect",
    )


def q178_ddsketch_quantiles(spark, sf_dir):
    """Mergeable relative-error quantiles (operators/ddsketch): p50/p90/p99
    of order-line value per return flag from a DDSketch built as TWO shard
    sketches merged by bucket-count sum — the 90-day-p99-without-rescan
    layout. The build shuffles (group, bucket) partial counts, never rows;
    the exact rank-th value rides along to show the <= alpha relative
    error. Bucketing is ceil(round(ln(x)/ln_gamma, 9)) with the divisor
    embedded as one double literal in both engines, so Spark and DuckDB
    bin identically."""
    from gc_spark.operators.ddsketch import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantiles,
    )

    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").cast("double").alias("x"),
        (F.col("l_linenumber") % 2).alias("shard"),
    ).where(F.col("x") > 0)
    sk = ddsketch_merge(
        ddsketch_build(v.where(F.col("shard") == 0), "x", ["g"], alpha=0.01),
        ddsketch_build(v.where(F.col("shard") == 1), "x", ["g"], alpha=0.01),
        ["g"],
    )
    est = ddsketch_quantiles(sk, ["g"], [0.5, 0.9, 0.99], alpha=0.01)
    est = est.withColumn(
        "rnk",
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("q") * F.col("n")).cast("long"),
        ),
    )
    ranked = v.select(
        "g",
        "x",
        F.row_number().over(Window.partitionBy("g").orderBy("x")).alias("rn"),
    )
    return (
        est.alias("e")
        .join(
            ranked.alias("r"),
            (F.col("e.g") == F.col("r.g")) & (F.col("e.rnk") == F.col("r.rn")),
        )
        .select(
            F.col("e.g").alias("g"),
            "q",
            "n",
            "est_q",
            F.round(F.col("r.x"), 2).alias("exact_q"),
        )
    )


def _ddsketch_oracle(alpha: float = 0.01, qs=(0.5, 0.9, 0.99)) -> str:
    """DuckDB twin of operators/ddsketch over lineitem: same bucket rule
    (shared ln-gamma double literal), same rank rule, same midpoint
    formula. Shard-split-then-merge on the Spark side is invisible here —
    bucket-count sums are associative, which is the mergeability law."""
    import math as _m

    g = (1.0 + alpha) / (1.0 - alpha)
    lng = _m.log(g)
    qvals = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in qs)
    return f"""
    WITH v AS (
      SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS x
      FROM lineitem WHERE l_extendedprice > 0
    ), b AS (
      SELECT g, CAST(ceil(round(ln(x) / {lng!r}, 9)) AS INTEGER) AS bucket,
             COUNT(*) AS cnt
      FROM v GROUP BY 1, 2
    ), tot AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM b GROUP BY g),
    probes AS (
      SELECT g, n, q, GREATEST(CAST(1 AS BIGINT),
                               CAST(ceil(q * n) AS BIGINT)) AS rnk
      FROM tot CROSS JOIN (VALUES {qvals}) AS t(q)
    ), cum AS (
      SELECT g, bucket, SUM(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum
      FROM b
    ), pick AS (
      SELECT p.g, p.q, p.n, p.rnk, MIN(c.bucket) AS bk
      FROM probes p JOIN cum c ON c.g = p.g AND c.cum >= p.rnk
      GROUP BY p.g, p.q, p.n, p.rnk
    ), ranked AS (
      SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn FROM v
    )
    SELECT pick.g, pick.q, pick.n,
           ROUND(2.0 * power({g!r}, bk) / {g + 1.0!r}, 6) AS est_q,
           ROUND(r.x, 2) AS exact_q
    FROM pick JOIN ranked r ON r.g = pick.g AND r.rn = pick.rnk
"""


def q179_bloom_prune_join(spark, sf_dir):
    """Runtime bloom-filter join pruning (operators/bloomjoin): the
    frontier-vs-seen-manifest join with the big side pre-filtered by a
    broadcast bit-set built from the small side — Spark's runtime-filter
    strategy made explicit and measured. Per priority class: probe rows,
    bloom survivors, true matches, and the false-positive tail
    (n_match <= n_pass_bloom is the checked no-false-negative contract;
    the survivor count is what the exact join would shuffle at 10^10
    rows). m=16384 bits, k=2 salted 60-bit sha positions — replayed
    bit-for-bit by the oracle."""
    from gc_spark.operators.bloomjoin import bloom_prune_join_stats

    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    probe = o.select(
        F.col("o_orderpriority").alias("g"),
        F.concat(F.lit("k"), (F.col("o_orderkey") % 6000).cast("string")).alias(
            "key"
        ),
    )
    build = p.select(
        F.concat(
            F.lit("k"), ((F.col("p_partkey") * 3) % 6000).cast("string")
        ).alias("key")
    )
    return bloom_prune_join_stats(probe, build, "key", ["g"], m=16384, k=2)


def q180_host_transitions(spark, sf_dir):
    """First-order Markov host-transition model (operators/markov): which
    host a session hits next, learned from the fetch log — the navigation
    prior that pre-warms politeness budgets. One lead() window on the
    log's own session partitioning, then a (src, dst) count; the top-3
    normalized rows per source with deterministic (count desc, dst)
    tie-break."""
    from gc_spark.operators.markov import transition_counts, transition_model

    e = _t(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        F.concat(F.lit("h"), (F.col("event_id") % 12).cast("string")).alias(
            "host"
        ),
    )
    counts = transition_counts(log, "user_id", ["ts", "event_id"], "host")
    return transition_model(counts, top_n=3)


def q181_good_turing(spark, sf_dir):
    """Good-Turing discovery-rate estimate (operators/goodturing): from the
    fetch log's URL visit counts, the probability the NEXT fetch surfaces a
    never-seen URL (p_unseen = N1/N) plus the smoothed head of the
    count-of-counts table (r* = (r+1)N_{r+1}/N_r) — the one-number
    "is this source exhausted?" signal behind q119's vocab curve. One
    corpus-sized count shuffle; everything after runs on the tiny r
    table. The URL space scales with the data (one bucket per
    (customer, weekday-ish slot), ~1.4 visits each at every SF), so the
    count-of-counts head is populated at sf0.001 and sf1 alike."""
    from gc_spark.operators.goodturing import good_turing

    o = _t(spark, sf_dir, "orders")
    visits = o.select(
        F.concat(
            F.lit("u"),
            (F.col("o_custkey") * 13 + F.col("o_orderkey") % 7).cast(
                "string"
            ),
        ).alias("url")
    )
    return good_turing(visits, "url", max_r=6)


def q182_set_cover(spark, sf_dir):
    """Greedy max-coverage mirror selection (operators/setcover): pick 3
    suppliers covering the most distinct parts — the (1-1/e) greedy
    set-cover planner for "which k sources to crawl next". Membership
    dedups once; each round aggregates only still-uncovered rows and
    collects a single argmax row (the kmeans/MMR bounded-picks
    discipline), ties to the smaller source id, so the 3-pick sequence is
    replayed exactly by the unrolled-CTE oracle."""
    from gc_spark.operators.setcover import greedy_set_cover

    li = _t(spark, sf_dir, "lineitem")
    m = li.select(
        F.concat(F.lit("s"), (F.col("l_suppkey") % 25).cast("string")).alias(
            "src"
        ),
        F.col("l_partkey").alias("doc"),
    )
    return greedy_set_cover(m, "src", "doc", k=3)


def q183_capture_recapture(spark, sf_dir):
    """Chapman capture-recapture corpus-size estimate (operators/capture):
    two quasi-independent crawl passes over each source shard (even line
    numbers vs even order keys) yield per-shard n1/n2/overlap, the
    bias-corrected total-size estimate, its standard error, and the
    still-unseen share — "is a third pass over this source worth it?".
    Passes contract to distinct (shard, part) once; everything after is
    shard-grain."""
    from gc_spark.operators.capture import capture_recapture

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_suppkey") % 8).alias("src"),
        F.col("l_partkey").alias("id"),
        "l_linenumber",
        "l_orderkey",
    )
    p1 = base.where(F.col("l_linenumber") % 2 == 0)
    p2 = base.where(F.col("l_orderkey") % 2 == 0)
    return capture_recapture(p1, p2, "id", "src")


def q184_k_anonymity(spark, sf_dir):
    """k-anonymity + l-diversity release audit (operators/kanon): is the
    crawled order metadata safe to release with quasi-identifiers
    (priority, order year, customer bucket)? One summary row: classes
    smaller than k=5, rows re-identifiable through them, and classes
    whose rows all share one o_orderstatus (the homogeneity leak). One
    QI-grain groupBy is the only corpus-sized shuffle."""
    from gc_spark.operators.kanon import k_anonymity

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("oyear"),
        (F.col("o_custkey") % 500).alias("cbucket"),
        "o_orderstatus",
    )
    return k_anonymity(
        o,
        ["o_orderpriority", "oyear", "cbucket"],
        k=5,
        sensitive_col="o_orderstatus",
    )


def q185_ht_totals(spark, sf_dir):
    """Horvitz-Thompson stratified totals (operators/htsample): a
    priority-stratified crawl sample (urgent strata fetched at 0.5, the
    tail at 0.1; deterministic LCG uniforms) read back into unbiased
    per-stratum corpus totals with Poisson-sampling standard errors —
    the "estimated corpus value" line of a crawl report computed from
    the biased sample. One stratum-grain groupBy, pure expressions."""
    from gc_spark.operators.htsample import ht_stratified_total

    o = _t(spark, sf_dir, "orders")
    pi = (
        F.when(F.col("o_orderpriority").startswith("1"), 0.5)
        .when(F.col("o_orderpriority").startswith("2"), 0.4)
        .when(F.col("o_orderpriority").startswith("3"), 0.25)
        .when(F.col("o_orderpriority").startswith("4"), 0.2)
        .otherwise(0.1)
    )
    u = ((F.col("o_orderkey") * F.lit(2654435761)) % 1000003).cast(
        "double"
    ) / 1000003.0
    sample = o.withColumn("pi", pi).where(u < F.col("pi"))
    return ht_stratified_total(
        sample, "o_orderpriority", "o_totalprice", "pi"
    )


def q186_benford(spark, sf_dir):
    """Benford first-digit deviation per source (operators/benford):
    chi-square and total-variation distance of each supplier shard's
    price first-digit distribution against Benford's law — the
    generated-content / forged-metadata alarm over numeric columns.
    One (shard, digit) count is the only corpus-sized shuffle; the
    9-row-per-shard fold carries missing-digit mass exactly."""
    from gc_spark.operators.benford import benford_deviation

    li = _t(spark, sf_dir, "lineitem")
    vals = li.select(
        F.concat(F.lit("s"), (F.col("l_suppkey") % 25).cast("string")).alias(
            "src"
        ),
        F.col("l_extendedprice").alias("v"),
    )
    return benford_deviation(vals, "src", "v")


def q187_gini_budget(spark, sf_dir):
    """Crawl-budget concentration report (operators/concentration): per
    event family, the Gini coefficient, Herfindahl index, and top-host
    share of fetch counts across hosts — "is this family's budget spread
    or monopolized?". Events contract to (family, host) counts first;
    the rank window only ever sees host-grain rows."""
    from gc_spark.operators.concentration import gini_concentration

    e = _t(spark, sf_dir, "events")
    units = e.groupBy(
        F.col("event_type").alias("family"),
        F.concat(F.lit("h"), (F.col("user_id") % 1000).cast("string")).alias(
            "host"
        ),
    ).agg(F.count("*").alias("fetches"))
    return gini_concentration(units, "family", "host", "fetches")


def q188_postings_sizing(spark, sf_dir):
    """Elias-Fano vs gap-varint postings pricing (operators/eliasfano):
    per term of the documents corpus, the closed-form bit cost of both
    posting-list encodings and the winner — the storage planner that runs
    before materializing q64's inverted index. One distinct (term, doc)
    contraction; gaps from a term-grain LAG window."""
    from gc_spark.operators.eliasfano import postings_size_plan

    d = _t_wide(spark, sf_dir, "documents")
    return postings_size_plan(d, "text", "doc_id")


def q189_cocitation(spark, sf_dir):
    """Co-citation + bibliographic coupling (operators/cocite): part
    pairs repeatedly ordered together (shared citing order) and order
    pairs sharing cited parts, df-capped at the shared neighbor exactly
    like the triangle/Adamic-Adar wedge generators, n_common >= 2 keeps
    the pair set sparse. Raw order/part keys keep both node degrees
    SF-invariant (orders carry ~4 lines, parts ~30 lines at EVERY TPC-H
    scale factor), so the wedge fan-out stays linear in the data and the
    output non-degenerate from sf0.001 to sf1."""
    from gc_spark.operators.cocite import cocitation_coupling

    li = _t(spark, sf_dir, "lineitem")
    # long node ids through the wedge shuffle (the 10M-row stage); the
    # display prefix is applied to the few-thousand-row result instead
    edges = li.select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    pairs = cocitation_coupling(edges, max_degree=64, min_common=2)
    tag = F.when(F.col("kind") == "cocitation", F.lit("p")).otherwise(
        F.lit("o")
    )
    return pairs.select(
        "kind",
        F.concat(tag, F.col("a").cast("string")).alias("a"),
        F.concat(tag, F.col("b").cast("string")).alias("b"),
        "n_common",
    )


def q190_ucb1_schedule(spark, sf_dir):
    """UCB1 explore/exploit source ranking (operators/bandit): sources'
    past fetches are bandit pulls, a fulfilled order is reward 1 — the
    scheduler picks the highest upper-confidence arm next, exploring
    thin sources before writing them off. One source-grain groupBy; N
    rides as a 1-row broadcast."""
    from gc_spark.operators.bandit import ucb1_schedule

    o = _t(spark, sf_dir, "orders")
    log = o.select(
        F.concat(F.lit("s"), (F.col("o_custkey") % 40).cast("string")).alias(
            "source"
        ),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias(
            "reward"
        ),
    )
    return ucb1_schedule(log, "source", "reward")


def q191_dirichlet_qlm(spark, sf_dir):
    """Dirichlet query-likelihood ranking (operators/qlm): the LM
    retrieval model (Zhai-Lafferty smoothing toward the corpus model)
    over the documents table for the query {spark, merge, vector} —
    the third classic ranker next to q53's tf-idf and q63's BM25, with
    only matched (term, doc) rows entering the join."""
    from gc_spark.operators.qlm import dirichlet_qlm

    d = _t_wide(spark, sf_dir, "documents")
    return dirichlet_qlm(
        d, ["spark", "merge", "vector"], mu=500.0, top_k=12
    )


def q192_feature_corr(spark, sf_dir):
    """Quality-feature redundancy audit (operators/featcorr): the
    pairwise Pearson matrix over four per-row numeric features in two
    algebraic aggregate passes (means, then centered second moments —
    the cancellation-safe formulation). Which features are clones is
    read off one k(k-1)/2-row frame."""
    from gc_spark.operators.featcorr import pearson_matrix

    li = _t(spark, sf_dir, "lineitem")
    return pearson_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def q193_kappa(spark, sf_dir):
    """Cohen's kappa between two labelers (operators/kappa): the order
    status vs a price-threshold classifier over the same rows —
    chance-corrected agreement, the gate before swapping a pipeline
    classifier for a cheaper one. One (label, label) groupBy, then
    label-grain marginals."""
    from gc_spark.operators.kappa import cohens_kappa

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("la"),
        F.when(F.col("o_totalprice") > 150000, "F")
        .when(F.col("o_totalprice") > 75000, "O")
        .otherwise("P")
        .alias("lb"),
    )
    return cohens_kappa(o, "la", "lb")


def q194_prop_ztest(spark, sf_dir):
    """Two-proportion z-test (operators/proptest): policy A vs B (order
    key parity) on fulfilled-order rate — the fixed-n A/B verdict for a
    binary crawl outcome, one conditional aggregate, one row out."""
    from gc_spark.operators.proptest import two_proportion_ztest

    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 2 == 0, "A").otherwise("B").alias(
            "policy"
        ),
        (F.col("o_orderstatus") == "F").cast("int").alias("ok"),
    )
    return two_proportion_ztest(o, "policy", "ok", "A", "B")


def q195_mann_whitney(spark, sf_dir):
    """Mann-Whitney rank-sum test (operators/ranktest): did policy B
    shift the quantity distribution? Tie-corrected normal approximation
    over the DISTINCT-VALUE contraction, prefix sums two-phased through
    fixed-width value-range shards (the curriculum.py dense-numbering
    scheme) — no global sort at any scale."""
    from gc_spark.operators.ranktest import mann_whitney_u

    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, "A").otherwise("B").alias(
            "policy"
        ),
        "l_quantity",
    )
    return mann_whitney_u(li, "policy", "l_quantity", "A", "B", shard_width=16.0)


def q196_sprt(spark, sf_dir):
    """Wald SPRT early stopping (operators/sprt): per host, walk the
    error-outcome log-likelihood ratio (H1: 30% errors vs H0: 15%) in
    event order and report the first boundary crossing — the sequential
    test that retires a failing source trial in a fraction of the
    fixed-n sample. One per-host window cumsum, verdicts from a
    host-grain aggregate."""
    from gc_spark.operators.sprt import sprt_decisions

    e = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias(
            "host"
        ),
        "event_id",
        (F.col("event_type") == "error").cast("int").alias("err"),
    )
    return sprt_decisions(
        e, "host", "event_id", "err", p0=0.15, p1=0.3
    )


def q197_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend per host (operators/theilsen): median
    pairwise slope of the metric over event order — the drift detector
    one 10 GB outlier response can't bend. Hosts beyond 512 points are
    df-capped out before pairing (the wedge discipline); slope medians
    are group-grain percentile aggregates."""
    from gc_spark.operators.theilsen import theil_sen_trend

    e = _t(spark, sf_dir, "events")
    pts = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 2000).cast("string")).alias(
            "host"
        ),
        F.col("event_id").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    return theil_sen_trend(pts, "host", "x", "y", max_points=512)


def q198_kendall_tau(spark, sf_dir):
    """Kendall tau-b ranker agreement (operators/kendall): do the
    char-count and token-count scorers order the first 100 docs the same
    way? Pairwise by definition, so the candidate set is capped by the
    caller (the rerank-window contract); one crossJoin fold."""
    from gc_spark.operators.kendall import kendall_tau

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    scored = d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("a"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("double")
        .alias("b"),
    )
    return kendall_tau(scored, "doc_id", "a", "b")


def q199_cuped(spark, sf_dir):
    """CUPED variance-reduced A/B readout (operators/cuped): price as
    the metric, quantity as the pre-period covariate, order-key parity
    as the arms — theta fit on the pooled sample, two centered aggregate
    passes, one row out with the variance fraction the covariate
    removed."""
    from gc_spark.operators.cuped import cuped_adjusted

    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, "A").otherwise("B").alias(
            "policy"
        ),
        "l_extendedprice",
        "l_quantity",
    )
    return cuped_adjusted(
        li, "policy", "l_extendedprice", "l_quantity", "A", "B"
    )


def q200_eb_shrinkage(spark, sf_dir):
    """Empirical-Bayes rate shrinkage (operators/shrinkage): per-host
    fulfilled rates shrunk toward a method-of-moments Beta prior — the
    borrowing-strength estimate that feeds schedulers, next to
    reputation.py's pessimistic Wilson gate. One host groupBy, one
    1-row-broadcast moment fit, closed-form map pass."""
    from gc_spark.operators.shrinkage import eb_shrink_rates

    o = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("c"), (F.col("o_custkey") % 200).cast("string")).alias(
            "host"
        ),
        (F.col("o_orderstatus") == "F").cast("int").alias("ok"),
    )
    return eb_shrink_rates(o, "host", "ok")


def q201_opic(spark, sf_dir):
    """OPIC on-line page importance (operators/opic): 5 synchronous
    cash-distribution rounds over the SAME 50-node host graph as q52 —
    the crawl-time alternative to PageRank whose estimate is valid at
    every step (history + cash share). Same one-shuffle-per-round shape
    as pagerank; dangling cash redistributes via a 1-row broadcast.
    Oracle: the identical rounds as chained (cash, hist) CTEs."""
    from gc_spark.operators.opic import opic

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    imp = opic(edges, iters=5)
    return imp.select("node", F.round("importance", 6).alias("importance"))


def q202_maxscore_topk(spark, sf_dir):
    """MaxScore upper-bound-pruned BM25 top-k (operators/maxscore): the
    dynamic-pruning serving twin of q81 — per-term max-contribution
    bounds seed a theta from k exactly-scored candidates, docs whose
    bound can't reach theta are never scored. Returns the top-10 plus
    the audit constants (n_matched vs n_scored = the pruning win); every
    branch value is 6dp-rounded so both engines prune identically."""
    from gc_spark.operators.maxscore import maxscore_topk

    d = _t_wide(spark, sf_dir, "documents")
    return maxscore_topk(d, ["spark", "data", "merge"], k=10)


def q203_holt_forecast(spark, sf_dir):
    """Holt linear-trend smoothing per host (operators/holt): level,
    trend, next-window forecast and one-step MAE over per-host event
    series — the capacity-planning feed for the bandwidth/budget
    schedulers. One groupBy, the recurrence as a JVM F.aggregate fold
    (sequential within a host, parallel across hosts). Oracle: the same
    recurrence as a recursive CTE, bit-identical double arithmetic."""
    from gc_spark.operators.holt import holt_forecast

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 8000)
    series = ev.select(
        (F.col("user_id") % 16).alias("host"),
        F.col("event_id").alias("t"),
        F.col("value").alias("y"),
    )
    return holt_forecast(
        series, "host", "t", "y", alpha=0.5, beta=0.3, horizon=3
    )


def q204_dp_release(spark, sf_dir):
    """Epsilon-DP Laplace count release (operators/dprelease): per-host
    event counts + deterministic-seed Laplace(1/eps) noise via the
    portable sha256 uniform kernel, clamped and integer-rounded
    (post-processing) — the publish side of the privacy family (q184
    audits, q134/q139 redact). One count shuffle, map-side noise."""
    from gc_spark.operators.dprelease import laplace_release

    ev = _t(spark, sf_dir, "events")
    g = ev.select(
        F.concat(F.lit("host-"), (F.col("user_id") % 25).cast("string")).alias(
            "host"
        )
    )
    return laplace_release(g, "host", epsilon=0.8, salt="r5-census")


def q205_ks_test(spark, sf_dir):
    """Kolmogorov-Smirnov two-sample test (operators/kstest): the
    binless shape-shift readout between the click and view cohorts'
    value distributions — max ECDF gap + the 5-term asymptotic p.
    Distinct-value contraction, two-phase sharded prefix sums (the
    ranktest discipline), one output row."""
    from gc_spark.operators.kstest import ks_two_sample

    ev = _t(spark, sf_dir, "events")
    return ks_two_sample(ev, "event_type", "value", "click", "view")


def q206_chi_squared(spark, sf_dir):
    """Chi-squared independence test (operators/chisq): is order status
    independent of priority class — the r x c generalization of the
    two-group tests, with Cramer's V effect size and the Wilson-Hilferty
    z. Contingency contraction + broadcast marginals; zero-observed
    cells enter via the n - sum(e_observed) identity, never generated."""
    from gc_spark.operators.chisq import chi_squared_independence

    o = _t(spark, sf_dir, "orders")
    return chi_squared_independence(o, "o_orderpriority", "o_orderstatus")


def q207_acf(spark, sf_dir):
    """Lag-k autocorrelation per host (operators/acf): the periodicity
    detector feeding recrawl alignment — lags 1/2/7 over per-host event
    series. One window pass emits every lag at once; denominator is the
    full-series centered sum of squares (two-pass, cancellation-safe)."""
    from gc_spark.operators.acf import acf

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 8000)
    series = ev.select(
        (F.col("user_id") % 8).alias("host"),
        F.col("event_id").alias("t"),
        F.col("value").alias("y"),
    )
    return acf(series, "host", "t", "y", lags=(1, 2, 7))


def q208_salsa(spark, sf_dir):
    """SALSA authority/hub walk (operators/salsa): the TKC-spam-
    resistant cousin of HITS (q69) on the SAME 50-node host graph as
    q52/q201 — each step normalizes into a bipartite random walk, so
    one strong hub can't inflate a whole community. Two edge-joins per
    round, mass conserved, oracled as chained CTEs."""
    from gc_spark.operators.salsa import salsa

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"),
    )
    out = salsa(edges, iters=5)
    return out.select(
        "node",
        F.round("authority", 6).alias("authority"),
        F.round("hub", 6).alias("hub"),
    )


def q209_rm3_topk(spark, sf_dir):
    """RM3 pseudo-relevance feedback retrieval (operators/rm3): the
    vocabulary-mismatch fix for the serving stack — top-5 feedback docs
    for ('spark','data','merge') build a relevance model, the top-3 new
    terms join the query, and the expanded weighted query re-retrieves
    the top-10 via the same 6dp-rounded BM25 contributions maxscore
    uses. n_terms audits the expanded set size."""
    from gc_spark.operators.rm3 import rm3_expand_topk

    d = _t_wide(spark, sf_dir, "documents")
    return rm3_expand_topk(
        d, ["spark", "data", "merge"], k=10, fb_docs=5, fb_terms=3, lam=0.5
    )


def q210_welch_ttest(spark, sf_dir):
    """Welch unequal-variance t-test (operators/ttest): did the MEAN
    move between the click and view cohorts — the variance-robust
    default, with sample variances from a second centered pass (the
    featcorr cancellation discipline) and the Welch-Satterthwaite df."""
    from gc_spark.operators.ttest import welch_ttest

    ev = _t(spark, sf_dir, "events")
    return welch_ttest(ev, "event_type", "value", "click", "view")


def q211_assoc_rules(spark, sf_dir):
    """Two-item association rules (operators/assoc): support /
    confidence / lift over order baskets of part classes — the
    basket-grain co-occurrence readout (vs collocations' adjacent-token
    PMI). Pairs generated AT the basket with a deterministic size cap,
    marginals joined unhinted so AQE broadcasts the pruned rule table."""
    from gc_spark.operators.assoc import pair_rules

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"),
        F.concat(F.lit("p"), (F.col("l_partkey") % 25).cast("string")).alias(
            "item"
        ),
    )
    return pair_rules(li, "basket", "item", min_count=10)


def q212_calibration(spark, sf_dir):
    """Reliability bins + expected calibration error (operators/
    calibration): audits whether a [0,1] score behaves like a
    probability — deterministic synthetic scorer over events whose
    label rate tracks the score by construction, 10 equal-width bins,
    global ECE broadcast onto the bin rows."""
    from gc_spark.operators.calibration import calibration_bins

    ev = _t(spark, sf_dir, "events")
    scored = ev.select(
        (((F.col("event_id") % 100) + 0.5) / 100.0).alias("score"),
        F.when(
            (F.col("user_id") % 100) < (F.col("event_id") % 100), 1.0
        )
        .otherwise(0.0)
        .alias("label"),
    )
    return calibration_bins(scored, "score", "label", n_bins=10)


def q213_pettitt(spark, sf_dir):
    """Pettitt change-point test (operators/pettitt): WHERE did each
    host's value regime shift — a +30 step injected at t=5000 that the
    rank-based sweep must localize. The O(n^2) textbook statistic
    collapses to two per-key windows via U_t = 2 S_t - t(n+1) over
    mid-ranks from the distinct-value contraction."""
    from gc_spark.operators.pettitt import pettitt_test

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 8000)
    series = ev.select(
        (F.col("user_id") % 12).alias("host"),
        F.col("event_id").alias("t"),
        (
            F.col("value").cast("double")
            + F.when(F.col("event_id") > 5000, 30.0).otherwise(0.0)
        ).alias("y"),
    )
    return pettitt_test(series, "host", "t", "y")


def q214_best_passage(spark, sf_dir):
    """Best-passage extraction (operators/passage): the snippet offset —
    for every doc matching ('spark','data','merge'), the 15-token window
    with the most query hits (earliest on ties). The range-frame window
    runs over MATCH POSITIONS only (scan-side term filter), never the
    token stream."""
    from gc_spark.operators.passage import best_passage

    d = _t_wide(spark, sf_dir, "documents")
    return best_passage(d, ["spark", "data", "merge"], width=15)


def q215_funnel(spark, sf_dir):
    """Ordered funnel (operators/funnel): view -> click -> purchase with
    strict temporal order, each step the earliest qualifying event after
    the previous step. Step k is one user-grain join + min-aggregate —
    no per-user folds or windows. Rates vs first and previous step."""
    from gc_spark.operators.funnel import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


def q216_trimmed_mean(spark, sf_dir):
    """Exact 10%-trimmed mean per host (operators/trimmed): the robust
    center the sketches approximate, computed from the distinct-value
    contraction + interval-overlap closed form — no per-row sort at any
    scale."""
    from gc_spark.operators.trimmed import trimmed_mean

    ev = _t(spark, sf_dir, "events")
    g = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias(
            "host"
        ),
        F.col("value"),
    )
    return trimmed_mean(g, "host", "value", trim_frac=0.1)


def _scored_events(spark, sf_dir):
    """The shared synthetic scorer of q212/q217/q218: deterministic
    [0,1] score whose label rate tracks it by construction."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        (((F.col("event_id") % 100) + 0.5) / 100.0).alias("score"),
        F.when((F.col("user_id") % 100) < (F.col("event_id") % 100), 1)
        .otherwise(0)
        .alias("label"),
    )


def q217_roc_auc(spark, sf_dir):
    """ROC-AUC with Hanley-McNeil SE (operators/classifier_eval): does
    the q212 scorer RANK — tie-aware rank-sum identity over the
    distinct-score contraction with two-phase sharded prefix sums (the
    ranktest discipline), one output row."""
    from gc_spark.operators.classifier_eval import roc_auc

    return roc_auc(_scored_events(spark, sf_dir), "score", "label")


def q218_pr_sweep(spark, sf_dir):
    """Precision/recall/F1 threshold sweep (operators/classifier_eval):
    where to CUT the q212 scorer — 9 operating points from ONE
    conditional-aggregate pass (27 counters unpivoted to rows), F1 via
    the exact 2TP/(PP+P) identity."""
    from gc_spark.operators.classifier_eval import pr_at_thresholds

    return pr_at_thresholds(_scored_events(spark, sf_dir), "score", "label")


def q219_seasonal(spark, sf_dir):
    """Additive seasonal decomposition (operators/seasonal): quantify
    the weekly cycle ACF detects — an injected period-7 sawtooth over
    per-host event series must surface in the phase means and a high
    variance-explained share. Centered MA trend (full windows only),
    phase-mean seasonal, key-grain variance audit."""
    from gc_spark.operators.seasonal import seasonal_decompose_phase

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 8000)
    series = ev.select(
        (F.col("user_id") % 10).alias("host"),
        F.col("event_id").alias("t"),
        (
            F.col("value").cast("double") + 4.0 * (F.col("event_id") % 7)
        ).alias("y"),
    )
    return seasonal_decompose_phase(series, "host", "t", "y", period=7)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_rollup": q01_rollup,
        "q02_seen_anti_join": q02_seen_anti_join,
        "q03_in_run_dedup": q03_in_run_dedup,
        "q04_topk_per_host": q04_topk_per_host,
        "q05_lag_carry": q05_lag_carry,
        "q06_explode": q06_explode,
        "q07_version_hash": q07_version_hash,
        "q08_json_extract": q08_json_extract,
        "q09_except": q09_except,
        "q10_dedup_exact": q10_dedup_exact,
        "q11_token_count": q11_token_count,
        "q12_lang_id": q12_lang_id,
        "q13_fingerprint": q13_fingerprint,
        "q14_quality_score": q14_quality_score,
        "q15_cosine_topk": q15_cosine_topk,
        "q16_minhash_bands": q16_minhash_bands,
        "q17_simhash": q17_simhash,
        "q18_url_canonicalize": q18_url_canonicalize,
        "q19_ann_lsh": q19_ann_lsh,
        "q20_near_dup_embeddings": q20_near_dup_embeddings,
        "q21_media_metadata": q21_media_metadata,
        "q22_frame_sample": q22_frame_sample,
        "q23_first_supported": q23_first_supported,
        "q24_enrich_defaults": q24_enrich_defaults,
        "q25_union_sources": q25_union_sources,
        "q26_carry_forward": q26_carry_forward,
        "q27_domain_scope": q27_domain_scope,
        "q28_robots_prefix": q28_robots_prefix,
        "q29_artifact_paths": q29_artifact_paths,
        "q30_span_flatten": q30_span_flatten,
        "q31_span_fingerprint": q31_span_fingerprint,
        "q32_ivf_ann": q32_ivf_ann,
        "q33_jaccard_pairs": q33_jaccard_pairs,
        "q34_pending_join": q34_pending_join,
        "q35_validate_split": q35_validate_split,
        "q36_dup_clusters": q36_dup_clusters,
        "q37_rolling_hash": q37_rolling_hash,
        "q38_bpe_tokens": q38_bpe_tokens,
        "q39_connected_components": q39_connected_components,
        "q40_windowed_rate": q40_windowed_rate,
        "q41_sessionize": q41_sessionize,
        "q42_robots_parse": q42_robots_parse,
        "q43_sitemap_stale": q43_sitemap_stale,
        "q44_salted_distinct": q44_salted_distinct,
        "q45_percentiles": q45_percentiles,
        "q46_repetition_flags": q46_repetition_flags,
        "q47_pii_redact": q47_pii_redact,
        "q48_decontaminate": q48_decontaminate,
        "q49_winnow_fingerprints": q49_winnow_fingerprints,
        "q50_line_dedup": q50_line_dedup,
        "q51_char_entropy": q51_char_entropy,
        "q52_pagerank": q52_pagerank,
        "q53_tfidf_topterms": q53_tfidf_topterms,
        "q54_stratified_sample": q54_stratified_sample,
        "q55_reservoir_sample": q55_reservoir_sample,
        "q56_recrawl_priority": q56_recrawl_priority,
        "q57_trap_detect": q57_trap_detect,
        "q58_skew_profile": q58_skew_profile,
        "q59_lm_xent": q59_lm_xent,
        "q60_canonical_docs": q60_canonical_docs,
        "q61_budget_allocation": q61_budget_allocation,
        "q62_redirect_resolve": q62_redirect_resolve,
        "q63_crawl_delay_budget": q63_crawl_delay_budget,
        "q64_inverted_index": q64_inverted_index,
        "q65_bigram_pmi": q65_bigram_pmi,
        "q66_cdc_chunks": q66_cdc_chunks,
        "q67_length_buckets": q67_length_buckets,
        "q68_bpe_merges": q68_bpe_merges,
        "q69_hits": q69_hits,
        "q70_semantic_dedup": q70_semantic_dedup,
        "q71_gopher_quality": q71_gopher_quality,
        "q72_pack_offsets": q72_pack_offsets,
        "q73_span_coalesce": q73_span_coalesce,
        "q74_winnow_overlap": q74_winnow_overlap,
        "q75_anchor_texts": q75_anchor_texts,
        "q76_mixture_weights": q76_mixture_weights,
        "q77_asof_state": q77_asof_state,
        "q78_rendezvous_shards": q78_rendezvous_shards,
        "q79_shard_rebalance": q79_shard_rebalance,
        "q80_exact_substring_mask": q80_exact_substring_mask,
        "q81_bm25_topk": q81_bm25_topk,
        "q82_snapshot_diff": q82_snapshot_diff,
        "q83_budget_select": q83_budget_select,
        "q84_host_reputation": q84_host_reputation,
        "q85_incremental_lsh": q85_incremental_lsh,
        "q86_heavy_hitters": q86_heavy_hitters,
        "q87_boilerplate_lines": q87_boilerplate_lines,
        "q88_compression_ratio": q88_compression_ratio,
        "q89_ewma_failure": q89_ewma_failure,
        "q90_quantization_error": q90_quantization_error,
        "q91_bfs_depth": q91_bfs_depth,
        "q92_range_coalesce": q92_range_coalesce,
        "q93_containment_quotes": q93_containment_quotes,
        "q94_ngram_novelty": q94_ngram_novelty,
        "q95_robots_wildcards": q95_robots_wildcards,
        "q96_mirror_hosts": q96_mirror_hosts,
        "q97_fetch_eta": q97_fetch_eta,
        "q98_bigram_xent": q98_bigram_xent,
        "q99_url_param_rules": q99_url_param_rules,
        "q100_soft404_templates": q100_soft404_templates,
        "q101_dsir_weights": q101_dsir_weights,
        "q102_link_farms": q102_link_farms,
        "q103_pq_codes": q103_pq_codes,
        "q104_source_kl": q104_source_kl,
        "q105_oov_rate": q105_oov_rate,
        "q106_triangles": q106_triangles,
        "q107_window_chunks": q107_window_chunks,
        "q108_temperature_sample": q108_temperature_sample,
        "q109_kcore": q109_kcore,
        "q110_span_truncate": q110_span_truncate,
        "q111_caption_candidates": q111_caption_candidates,
        "q112_fairness": q112_fairness,
        "q113_pseudonyms": q113_pseudonyms,
        "q114_shard_manifest": q114_shard_manifest,
        "q115_politeness_audit": q115_politeness_audit,
        "q116_weighted_sample": q116_weighted_sample,
        "q117_size_anomalies": q117_size_anomalies,
        "q118_revision_similarity": q118_revision_similarity,
        "q119_vocab_growth": q119_vocab_growth,
        "q120_retry_backoff": q120_retry_backoff,
        "q121_hybrid_fusion": q121_hybrid_fusion,
        "q122_span_audit": q122_span_audit,
        "q123_encoding_audit": q123_encoding_audit,
        "q124_split_leakage": q124_split_leakage,
        "q125_revalidation_plan": q125_revalidation_plan,
        "q126_cusum_drift": q126_cusum_drift,
        "q127_psi_drift": q127_psi_drift,
        "q128_curriculum_order": q128_curriculum_order,
        "q129_multimodal_pack": q129_multimodal_pack,
        "q130_centroid_drift": q130_centroid_drift,
        "q131_release_report": q131_release_report,
        "q132_url_templates": q132_url_templates,
        "q133_pan_findings": q133_pan_findings,
        "q134_media_dedup": q134_media_dedup,
        "q135_link_prediction": q135_link_prediction,
        "q136_fetch_sessions": q136_fetch_sessions,
        "q137_cdc_delta": q137_cdc_delta,
        "q138_trustrank": q138_trustrank,
        "q139_modality_mix": q139_modality_mix,
        "q140_cms_estimates": q140_cms_estimates,
        "q141_phash_dups": q141_phash_dups,
        "q142_span_redact": q142_span_redact,
        "q143_span_langs": q143_span_langs,
        "q144_size_quantiles": q144_size_quantiles,
        "q145_embed_decontam": q145_embed_decontam,
        "q146_failure_triage": q146_failure_triage,
        "q147_refresh_value": q147_refresh_value,
        "q148_waterfill": q148_waterfill,
        "q149_bpe_encode": q149_bpe_encode,
        "q150_registrable_domains": q150_registrable_domains,
        "q151_bandwidth_windows": q151_bandwidth_windows,
        "q152_blob_integrity": q152_blob_integrity,
        "q153_bounded_shards": q153_bounded_shards,
        "q154_epoch_shuffle": q154_epoch_shuffle,
        "q155_robots_diff": q155_robots_diff,
        "q156_incremental_cc": q156_incremental_cc,
        "q157_powerlaw_alpha": q157_powerlaw_alpha,
        "q158_cuckoo_seen": q158_cuckoo_seen,
        "q159_hll_distinct": q159_hll_distinct,
        "q160_kmeans_clusters": q160_kmeans_clusters,
        "q161_round_robin": q161_round_robin,
        "q162_incremental_index": q162_incremental_index,
        "q163_lpa_communities": q163_lpa_communities,
        "q164_adc_rerank": q164_adc_rerank,
        "q165_ir_metrics": q165_ir_metrics,
        "q166_phrase_match": q166_phrase_match,
        "q167_boolean_match": q167_boolean_match,
        "q168_zorder_skipping": q168_zorder_skipping,
        "q169_aimd_delay": q169_aimd_delay,
        "q170_percolate": q170_percolate,
        "q171_front_coding": q171_front_coding,
        "q172_allpairs_jaccard": q172_allpairs_jaccard,
        "q173_bootstrap_ci": q173_bootstrap_ci,
        "q174_skyline": q174_skyline,
        "q175_edit1_join": q175_edit1_join,
        "q176_mmr_diversify": q176_mmr_diversify,
        "q177_kmv_setops": q177_kmv_setops,
        "q178_ddsketch_quantiles": q178_ddsketch_quantiles,
        "q179_bloom_prune_join": q179_bloom_prune_join,
        "q180_host_transitions": q180_host_transitions,
        "q181_good_turing": q181_good_turing,
        "q182_set_cover": q182_set_cover,
        "q183_capture_recapture": q183_capture_recapture,
        "q184_k_anonymity": q184_k_anonymity,
        "q185_ht_totals": q185_ht_totals,
        "q186_benford": q186_benford,
        "q187_gini_budget": q187_gini_budget,
        "q188_postings_sizing": q188_postings_sizing,
        "q189_cocitation": q189_cocitation,
        "q190_ucb1_schedule": q190_ucb1_schedule,
        "q191_dirichlet_qlm": q191_dirichlet_qlm,
        "q192_feature_corr": q192_feature_corr,
        "q193_kappa": q193_kappa,
        "q194_prop_ztest": q194_prop_ztest,
        "q195_mann_whitney": q195_mann_whitney,
        "q196_sprt": q196_sprt,
        "q197_theil_sen": q197_theil_sen,
        "q198_kendall_tau": q198_kendall_tau,
        "q199_cuped": q199_cuped,
        "q200_eb_shrinkage": q200_eb_shrinkage,
        "q201_opic": q201_opic,
        "q202_maxscore_topk": q202_maxscore_topk,
        "q203_holt_forecast": q203_holt_forecast,
        "q204_dp_release": q204_dp_release,
        "q205_ks_test": q205_ks_test,
        "q206_chi_squared": q206_chi_squared,
        "q207_acf": q207_acf,
        "q208_salsa": q208_salsa,
        "q209_rm3_topk": q209_rm3_topk,
        "q210_welch_ttest": q210_welch_ttest,
        "q211_assoc_rules": q211_assoc_rules,
        "q212_calibration": q212_calibration,
        "q213_pettitt": q213_pettitt,
        "q214_best_passage": q214_best_passage,
        "q215_funnel": q215_funnel,
        "q216_trimmed_mean": q216_trimmed_mean,
        "q217_roc_auc": q217_roc_auc,
        "q218_pr_sweep": q218_pr_sweep,
        "q219_seasonal": q219_seasonal,
    }


def _kmeans_oracle(k: int = 4, dim: int = 64, iters: int = 2) -> str:
    """DuckDB twin of operators/kmeans.kmeans_lloyd: replays the identical
    centroid trajectory (seed = k lowest ids; round(.,6)-quantized update;
    argmin ties to the lower cid) as chained CTEs, one assign/update pair
    per iteration."""
    d2 = (
        "list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (p.v[i] - c.cent[i]) * (p.v[i] - c.cent[i])))"
    ).format(dim=dim)
    parts = [
        f"""
        WITH pts AS (
          SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), gs AS (
          SELECT UNNEST(generate_series(1, {dim})) AS i
        ), c0 AS (
          SELECT row_number() OVER (ORDER BY id) - 1 AS cid, v AS cent
          FROM (SELECT id, v FROM pts ORDER BY id LIMIT {k})
        )"""
    ]
    for it in range(iters):
        parts.append(
            f""", a{it} AS (
          SELECT id, v, cid, d2,
                 row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
          FROM (SELECT p.id, p.v, c.cid, {d2} AS d2
                FROM pts p CROSS JOIN c{it} c)
        ), w{it} AS (
          SELECT id, v, cid FROM a{it} WHERE rn = 1
        ), u{it} AS (
          SELECT cid, list(cv ORDER BY i) AS cent
          FROM (SELECT w.cid, g.i, ROUND(AVG(w.v[g.i]), 6) AS cv
                FROM w{it} w CROSS JOIN gs g GROUP BY w.cid, g.i)
          GROUP BY cid
        ), c{it + 1} AS (
          SELECT s.cid, COALESCE(u.cent, s.cent) AS cent
          FROM c{it} s LEFT JOIN u{it} u USING (cid)
        )"""
        )
    parts.append(
        f""", afin AS (
          SELECT id, cid, d2,
                 row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
          FROM (SELECT p.id, c.cid, {d2} AS d2
                FROM pts p CROSS JOIN c{iters} c)
        )
        SELECT CAST(cid AS INTEGER) AS cluster, COUNT(*) AS n_points,
               ROUND(AVG(d2), 4) AS avg_dist2
        FROM afin WHERE rn = 1 GROUP BY cid"""
    )
    return "".join(parts)


def _mmr_oracle(lam: float = 0.7, pool: int = 8) -> str:
    """DuckDB twin of q176: same rounded-cosine candidate pools, same
    pairwise-sim matrix, and the 3-pick greedy unrolled as three
    argmax CTE stages (legal because round-6 fixed-point decision values
    are engine-identical)."""

    def qlit(m: int) -> str:
        q = [((i * m) % 13 - 6) / 10.0 for i in range(64)]
        return "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in q) + "]"

    def cos(v: str, q: str) -> str:
        return (
            f"list_dot_product({v}, {q}) / (sqrt(list_dot_product({v}, {v}))"
            f" * sqrt(list_dot_product({q}, {q})))"
        )

    pools = []
    for qid, m in (("p0", 37), ("p1", 41), ("p2", 43)):
        pools.append(f"""
      SELECT * FROM (
        SELECT '{qid}' AS qid, vec_id, ROUND({cos("v", qlit(m))}, 6) AS rel, v
        FROM e ORDER BY rel DESC, vec_id LIMIT {pool})""")
    cands = " UNION ALL ".join(pools)
    lo = 1.0 - lam
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cands AS ({cands}
    ), sims AS (
      SELECT a.qid, a.vec_id AS i, b.vec_id AS j,
             ROUND(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 6) AS s
      FROM cands a JOIN cands b ON a.qid = b.qid
    ), p1 AS (
      SELECT qid, vec_id, {lam} * rel AS sc FROM cands
      QUALIFY row_number() OVER (
        PARTITION BY qid ORDER BY {lam} * rel DESC, vec_id) = 1
    ), s2 AS (
      SELECT c.qid, c.vec_id, {lam} * c.rel - {lo} * s.s AS sc
      FROM cands c
      JOIN p1 ON p1.qid = c.qid AND c.vec_id <> p1.vec_id
      JOIN sims s ON s.qid = c.qid AND s.i = c.vec_id AND s.j = p1.vec_id
    ), p2 AS (
      SELECT qid, vec_id, sc FROM s2
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) = 1
    ), s3 AS (
      SELECT c.qid, c.vec_id,
             {lam} * c.rel - {lo} * GREATEST(sa.s, sb.s) AS sc
      FROM cands c
      JOIN p1 ON p1.qid = c.qid
      JOIN p2 ON p2.qid = c.qid
      JOIN sims sa ON sa.qid = c.qid AND sa.i = c.vec_id AND sa.j = p1.vec_id
      JOIN sims sb ON sb.qid = c.qid AND sb.i = c.vec_id AND sb.j = p2.vec_id
      WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id
    ), p3 AS (
      SELECT qid, vec_id, sc FROM s3
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sc DESC, vec_id) = 1
    )
    SELECT qid, CAST(1 AS INTEGER) AS rank, vec_id, ROUND(sc, 6) AS mmr_score FROM p1
    UNION ALL
    SELECT qid, CAST(2 AS INTEGER), vec_id, ROUND(sc, 6) FROM p2
    UNION ALL
    SELECT qid, CAST(3 AS INTEGER), vec_id, ROUND(sc, 6) FROM p3
"""


def _zorder_oracle(bits: int = 8) -> str:
    """DuckDB twin of q168: same grid scaling, Morton interleave (gx gets
    the high bit of each pair, matching zvalue_col), fixed-width file
    buckets, and Iceberg-style min/max overlap pruning."""
    terms = []
    for b in range(bits):
        terms.append(f"(((gx >> {b}) & 1) << {b * 2 + 1})")
        terms.append(f"(((gy >> {b}) & 1) << {b * 2})")
    interleave = " + ".join(terms)
    top = (1 << bits) - 1
    hit = "gx_max >= 64 AND gx_min <= 127 AND gy_max >= 32 AND gy_min <= 95"
    return f"""
    WITH dims AS (
      SELECT o_totalprice AS x,
             CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS DOUBLE) AS y
      FROM orders
    ), mm AS (
      SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, max(y) AS ymx FROM dims
    ), g AS (
      SELECT CAST(least(greatest(floor((x - xmn) * {float(top)} / (xmx - xmn)), 0), {top}) AS BIGINT) AS gx,
             CAST(least(greatest(floor((y - ymn) * {float(top)} / (ymx - ymn)), 0), {top}) AS BIGINT) AS gy
      FROM dims, mm
    ), z AS (
      SELECT gx, gy, {interleave} AS z FROM g
    ), files AS (
      SELECT 'linear_x' AS layout, gx >> {bits - 4} AS file_id, gx, gy FROM z
      UNION ALL
      SELECT 'zorder' AS layout, z >> {2 * bits - 4} AS file_id, gx, gy FROM z
    ), stats AS (
      SELECT layout, file_id,
             min(gx) AS gx_min, max(gx) AS gx_max,
             min(gy) AS gy_min, max(gy) AS gy_max,
             count(*) AS n_rows
      FROM files GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
           CAST(SUM(CASE WHEN {hit} THEN n_rows ELSE 0 END) AS BIGINT) AS rows_in_hit_files
    FROM stats GROUP BY layout
"""


def _adc_oracle(n_adc: int = 50, n_out: int = 10) -> str:
    """DuckDB twin of operators/pq.adc_topk over the q103 codebook: LUT
    from the q121 probe vector, ADC top-n_adc, exact rerank to n_out."""
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    qlit = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in q) + "]"
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cb0 AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code FROM e
      QUALIFY code < 16
    ), subs AS (SELECT UNNEST(range(0, 4)) AS s),
    cb AS (
      SELECT s, code, list_slice(v, s * 16 + 1, s * 16 + 16) AS cvec
      FROM cb0, subs
    ), vs AS (
      SELECT vec_id, s, list_slice(v, s * 16 + 1, s * 16 + 16) AS svec
      FROM e, subs
    ), d AS (
      SELECT vec_id, vs.s, code,
             ROUND(list_sum(list_transform(range(1, 17),
               i -> (svec[i] - cvec[i]) * (svec[i] - cvec[i]))), 9) AS d2
      FROM vs JOIN cb ON vs.s = cb.s
    ), best AS (
      SELECT vec_id, s, code FROM d
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) = 1
    ), qv AS (
      SELECT s, list_slice({qlit}, s * 16 + 1, s * 16 + 16) AS qsub FROM subs
    ), lut AS (
      SELECT cb.s, cb.code,
             ROUND(list_sum(list_transform(range(1, 17),
               i -> (qv.qsub[i] - cb.cvec[i]) * (qv.qsub[i] - cb.cvec[i]))), 9) AS lut_d2
      FROM cb JOIN qv ON cb.s = qv.s
    ), cand AS (
      SELECT vec_id, ROUND(SUM(lut_d2), 9) AS adc_d2
      FROM best JOIN lut ON best.s = lut.s AND best.code = lut.code
      GROUP BY vec_id
      ORDER BY adc_d2, vec_id LIMIT {n_adc}
    )
    SELECT c.vec_id, c.adc_d2,
           ROUND(list_sum(list_transform(range(1, 65),
             i -> (e.v[i] - ({qlit})[i]) * (e.v[i] - ({qlit})[i]))), 9) AS exact_d2
    FROM cand c JOIN e ON c.vec_id = e.vec_id
    ORDER BY exact_d2, c.vec_id LIMIT {n_out}
"""


def _fusion_oracle() -> str:
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    qlit = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in q) + "]"
    return f"""
        WITH lens AS (
          SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl FROM documents
        ), stats AS (
          SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n FROM lens
        ), post AS (
          SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
          FROM (SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS term FROM documents)
          WHERE term IN ('spark', 'query', 'merge') GROUP BY doc_id, term
        ), dfq AS (
          SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM post GROUP BY term
        ), bm AS (
          SELECT p.doc_id,
                 ROUND(SUM(ln(1.0 + (s.n - d.dfreq + 0.5) / (d.dfreq + 0.5))
                           * p.tf * 2.2
                           / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))), 6) AS score
          FROM post p JOIN dfq d USING (term) JOIN lens l USING (doc_id) CROSS JOIN stats s
          GROUP BY p.doc_id
        ), lex AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
          FROM bm QUALIFY rank <= 20
        ), semraw AS (
          SELECT e.vec_id AS doc_id,
                 ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), {qlit})
                       / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                CAST(embedding AS DOUBLE[])))
                          * sqrt(list_dot_product({qlit}, {qlit}))), 6) AS sim
          FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        ), sem AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rank
          FROM semraw QUALIFY rank <= 20
        ), u AS (
          SELECT * FROM lex UNION ALL SELECT * FROM sem
        ), fused AS (
          SELECT doc_id, ROUND(SUM(1.0 / (60 + rank)), 9) AS rrf_score,
                 COUNT(*) AS n_lists
          FROM u GROUP BY doc_id
        )
        SELECT doc_id, rrf_score, n_lists,
               ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS fused_rank
        FROM fused QUALIFY fused_rank <= 10
    """


_SPAN_AUDIT_ORACLE = """
    WITH base AS (
      SELECT doc_id, text,
             UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1) AS BIGINT))) AS i
      FROM documents
    ), spans AS (
      SELECT doc_id, CAST(i + i // 3 AS INT) AS o, 'text' AS kind,
             substring(text, CAST(i * 80 + 1 AS INT), 80) AS t,
             CAST(NULL AS VARCHAR) AS m
      FROM base
      UNION ALL
      SELECT doc_id, CAST(i + i // 3 + 1 AS INT), 'media', CAST(NULL AS VARCHAR),
             'blob://doc/' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
      FROM base WHERE i % 3 = 2
    ), corrupted AS (
      SELECT doc_id, o AS orig_o,
             CASE WHEN doc_id % 7 = 0 AND o = 1 THEN 0 ELSE o END AS o2,
             CASE WHEN doc_id % 7 <> 0 AND doc_id % 11 = 0 AND o = 0
                  THEN NULL ELSE t END AS t2,
             m,
             CASE WHEN doc_id % 7 <> 0 AND doc_id % 11 <> 0 AND doc_id % 13 = 0 AND o = 0
                  THEN 'mystery' ELSE kind END AS k2
      FROM spans
    ), seq AS (
      SELECT doc_id, o2, t2, m, k2,
             LEAD(o2) OVER (PARTITION BY doc_id ORDER BY orig_o) AS next_o
      FROM corrupted
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_spans,
           CAST(SUM(CASE WHEN next_o IS NOT NULL AND next_o <= o2 THEN 1 ELSE 0 END) AS INT)
             AS offset_violations,
           CAST(SUM(CASE WHEN k2 NOT IN ('text', 'media') THEN 1 ELSE 0 END) AS INT)
             AS kind_violations,
           CAST(SUM(CASE WHEN (k2 = 'text' AND (t2 IS NULL OR m IS NOT NULL))
                           OR (k2 = 'media' AND (m IS NULL OR t2 IS NOT NULL))
                         THEN 1 ELSE 0 END) AS INT) AS payload_violations,
           (SUM(CASE WHEN next_o IS NOT NULL AND next_o <= o2 THEN 1 ELSE 0 END) = 0
            AND SUM(CASE WHEN k2 NOT IN ('text', 'media') THEN 1 ELSE 0 END) = 0
            AND SUM(CASE WHEN (k2 = 'text' AND (t2 IS NULL OR m IS NOT NULL))
                           OR (k2 = 'media' AND (m IS NULL OR t2 IS NOT NULL))
                         THEN 1 ELSE 0 END) = 0) AS is_valid
    FROM seq GROUP BY doc_id
"""


def _encoding_oracle() -> str:
    from gc_spark.operators.encoding import MOJIBAKE_PATTERN

    moji = " caf\u00c3\u00a9 don\u00c3\u00a9es \u00e2\u0080\u0099quoted\u00e2\u0080\u0099"
    return f"""
        WITH planted AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 13 = 0 THEN '{moji}' ELSE '' END
                 || CASE WHEN doc_id % 17 = 0
                         THEN ' bin' || chr(7) || chr(11) || 'junk' ELSE '' END
                 || CASE WHEN doc_id % 19 = 0
                         THEN ' lossy ' || chr(65533) || ' char' ELSE '' END AS t
          FROM documents
        ), counted AS (
          SELECT doc_id, t,
                 CAST(len(regexp_extract_all(t, '{MOJIBAKE_PATTERN}')) AS INT) AS n_mojibake,
                 CAST(len(regexp_extract_all(t, chr(65533))) AS INT) AS n_replacement,
                 CAST(len(regexp_extract_all(t, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS INT) AS n_ctrl
          FROM planted
        )
        SELECT doc_id, n_mojibake, n_replacement, n_ctrl,
               CASE WHEN length(t) > 0
                    THEN ROUND(CAST(length(regexp_replace(t, '[\\x00-\\x7f]', '', 'g')) AS DOUBLE)
                               / length(t), 6)
                    ELSE 0.0 END AS nonascii_ratio,
               CASE WHEN n_mojibake > 0 THEN 'mojibake'
                    WHEN n_replacement > 0 THEN 'lossy_decode'
                    WHEN n_ctrl > 0 THEN 'binary_junk'
                    ELSE 'clean' END AS verdict
        FROM counted
    """


_SPLIT_LEAKAGE_ORACLE = """
    WITH staged AS (
      SELECT doc_id, 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
             CASE WHEN doc_id % 25 = 0 THEN 'breaking: site maintenance notice boilerplate'
                  WHEN doc_id % 25 = 7 THEN 'copyright footer all rights reserved'
                  WHEN doc_id % 25 = 14 THEN 'cookie consent accept to continue'
                  ELSE text END AS text
      FROM documents
    ), sp AS (
      SELECT doc_id, sha256(text) AS fingerprint,
             CASE WHEN CAST('0x' || substr(sha256('split0|' || host), 1, 15) AS BIGINT) % 10000 < 1500
                    THEN 'test'
                  WHEN CAST('0x' || substr(sha256('split0|' || host), 1, 15) AS BIGINT) % 10000 < 3000
                    THEN 'val'
                  ELSE 'train' END AS split
      FROM staged
    ), agg AS (
      SELECT fingerprint, list_sort(list(DISTINCT split)) AS sl, COUNT(*) AS n_docs
      FROM sp GROUP BY fingerprint
    )
    SELECT fingerprint, CAST(len(sl) AS INT) AS n_splits,
           array_to_string(sl, ',') AS splits, n_docs
    FROM agg WHERE len(sl) > 1
"""


_REVALIDATION_ORACLE = """
    WITH log AS (
      SELECT 'https://h' || CAST(user_id % 40 AS VARCHAR)
               || '/p' || CAST(user_id % 120 AS VARCHAR) AS url,
             event_id,
             sha256('https://h' || CAST(user_id % 40 AS VARCHAR)
                    || '/p' || CAST(user_id % 120 AS VARCHAR)
                    || CASE WHEN user_id % 5 = 0 THEN 's'
                            ELSE CAST(value > 7.0 AS VARCHAR) END) AS h,
             1000.0 + value * 100.0 AS b
      FROM events
    ), seq AS (
      SELECT url, b,
             CASE WHEN LAG(h) OVER (PARTITION BY url ORDER BY event_id) IS NULL THEN NULL
                  WHEN h <> LAG(h) OVER (PARTITION BY url ORDER BY event_id) THEN 1
                  ELSE 0 END AS chg
      FROM log
    ), per AS (
      SELECT url, COUNT(*) AS n_fetches, SUM(chg) AS nc,
             ROUND(AVG(b), 4) AS avg_bytes
      FROM seq GROUP BY url
    ), planned AS (
      SELECT url, n_fetches, nc, avg_bytes,
             (nc + 0.5) / CAST(n_fetches AS DOUBLE) AS p,
             CASE WHEN nc IS NULL THEN 'full'
                  WHEN (nc + 0.5) / CAST(n_fetches AS DOUBLE) < 0.1 THEN 'skip'
                  WHEN (nc + 0.5) / CAST(n_fetches AS DOUBLE) < 0.5 THEN 'revalidate'
                  ELSE 'full' END AS decision
      FROM per
    )
    SELECT url, n_fetches, COALESCE(nc, 0) AS n_changes,
           CASE WHEN nc IS NULL THEN NULL ELSE ROUND(p, 6) END AS p_change,
           decision, avg_bytes,
           ROUND(CASE WHEN decision = 'skip' THEN 0.0
                      WHEN decision = 'revalidate' THEN 500.0 + p * avg_bytes
                      ELSE avg_bytes END, 4) AS expected_bytes,
           ROUND(avg_bytes - CASE WHEN decision = 'skip' THEN 0.0
                                  WHEN decision = 'revalidate' THEN 500.0 + p * avg_bytes
                                  ELSE avg_bytes END, 4) AS saved_bytes
    FROM planned
"""


_CUSUM_ORACLE = """
    WITH log AS (
      SELECT 'h' || CAST(user_id % 30 AS VARCHAR) AS host, ts, event_id,
             CASE WHEN user_id % 30 = 3 AND event_id > 5000 THEN 1.0
                  WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS fail
      FROM events
    ), c AS (
      SELECT host, ts, event_id,
             SUM(fail - 0.25) OVER (PARTITION BY host ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
      FROM log
    ), s AS (
      SELECT host, event_id,
             cum - LEAST(0.0, MIN(cum) OVER (PARTITION BY host ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING)) AS stat
      FROM c
    )
    SELECT host, COUNT(*) AS n_events, ROUND(MAX(stat), 6) AS max_stat,
           SUM(CASE WHEN stat >= 3.0 THEN 1 ELSE 0 END) AS n_alarms,
           MIN(CASE WHEN stat >= 3.0 THEN event_id END) AS first_alarm
    FROM s GROUP BY host
"""


_PSI_ORACLE = """
    WITH staged AS (
      SELECT source,
             CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS ep,
             CASE WHEN source = 'src3' AND doc_id % 2 = 1
                  THEN n_chars + 96 ELSE n_chars END AS len
      FROM documents
    ), counts AS (
      SELECT source, LEAST(CAST(len // 32 AS INT), 9) AS b,
             SUM(CASE WHEN ep = 'a' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN ep = 'b' THEN 1 ELSE 0 END) AS cb
      FROM staged GROUP BY source, LEAST(CAST(len // 32 AS INT), 9)
    ), totals AS (
      SELECT source, SUM(ca) AS n_a, SUM(cb) AS n_b FROM counts GROUP BY source
    ), spine AS (
      SELECT t.source, t.n_a, t.n_b, CAST(r.range AS INT) AS b
      FROM totals t CROSS JOIN range(10) r
    ), filled AS (
      SELECT s.source, s.n_a, s.n_b,
             COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
      FROM spine s LEFT JOIN counts c ON s.source = c.source AND s.b = c.b
    )
    SELECT source, n_a, n_b,
           ROUND(SUM(((ca + 0.5) / (n_a + 5.0) - (cb + 0.5) / (n_b + 5.0))
                     * ln(((ca + 0.5) / (n_a + 5.0)) / ((cb + 0.5) / (n_b + 5.0)))), 6) AS psi
    FROM filled GROUP BY source, n_a, n_b
"""


_CURRICULUM_ORACLE = """
    WITH b AS (
      SELECT doc_id, LEAST(CAST(n_chars // 40 AS INT), 4) AS bucket FROM documents
    ), p AS (
      SELECT doc_id, bucket,
             ROW_NUMBER() OVER (
               PARTITION BY bucket
               ORDER BY CAST('0x' || substr(sha256('epoch0|' || CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT) % 32,
                        CAST('0x' || substr(sha256('epoch0|' || CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT),
                        doc_id
             ) AS pos_in_bucket
      FROM b
    )
    SELECT doc_id, bucket, CAST(pos_in_bucket AS INT) AS pos_in_bucket,
           CAST((pos_in_bucket - 1) * 5 + bucket AS BIGINT) AS stream_key
    FROM p
"""


_MULTIPACK_ORACLE = """
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(doc_id % 4 AS BIGINT) AS n_media
      FROM documents
    ), c AS (
      SELECT source, doc_id, n_tokens, n_media,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS tend,
             SUM(n_media) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS mend
      FROM d
    )
    SELECT source, doc_id, n_tokens, n_media,
           CAST(tend - n_tokens AS BIGINT) AS tok_off,
           CAST(mend - n_media AS BIGINT) AS media_off,
           CAST((tend - n_tokens) // 512 + (mend - n_media) // 8 AS BIGINT) AS bin
    FROM c
"""


_CENTROID_DRIFT_ORACLE = """
    WITH e AS (
      SELECT 'g' || CAST(label AS VARCHAR) AS grp,
             CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS ep,
             CASE WHEN label = 2 AND vec_id % 2 = 1
                  THEN list_transform(CAST(embedding AS DOUBLE[]), x -> -x)
                  ELSE CAST(embedding AS DOUBLE[]) END AS v
      FROM embeddings
    ), pos AS (
      SELECT grp, ep, i, AVG(v[i]) AS m, COUNT(*) AS n
      FROM e CROSS JOIN range(1, 65) r(i)
      GROUP BY grp, ep, i
    ), cent AS (
      SELECT grp, ep, MAX(n) AS n, list(m ORDER BY i) AS c
      FROM pos GROUP BY grp, ep
    )
    SELECT a.grp AS source, a.n AS n_a, b.n AS n_b,
           ROUND(list_dot_product(a.c, b.c)
                 / (sqrt(list_dot_product(a.c, a.c))
                    * sqrt(list_dot_product(b.c, b.c))), 6) AS centroid_cos
    FROM cent a JOIN cent b ON a.grp = b.grp AND a.ep = 'a' AND b.ep = 'b'
"""


_RELEASE_REPORT_ORACLE = """
    WITH s AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t,
             CAST(length(text) AS BIGINT) AS c,
             sha256(text) AS fp,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs, SUM(t) AS n_tokens, SUM(c) AS n_chars,
           COUNT(*) - COUNT(DISTINCT fp) AS dup_docs,
           ROUND(AVG(en), 6) AS pct_en,
           ROUND(AVG(CASE WHEN t >= 10
                          THEN (CASE WHEN CAST(c AS DOUBLE) / t < 12.0
                                     THEN 1 ELSE 0 END)
                          ELSE 0 END), 6) AS quality_pass_rate,
           ROUND(AVG(t), 4) AS mean_tokens
    FROM s GROUP BY source
"""


_URL_TEMPLATE_ORACLE = """
    WITH base AS (
      SELECT p_partkey AS pk, 'h' || CAST(p_partkey % 19 AS VARCHAR) AS host,
             sha256(CAST(p_partkey AS VARCHAR)) AS sha
      FROM part
    ), urls AS (
      SELECT host,
             CASE WHEN pk % 4 = 0 THEN
                    'https://' || host || '/news/' || CAST(2000 + pk % 25 AS VARCHAR)
                    || '/' || CAST(pk % 12 AS VARCHAR) || '/' || CAST(pk AS VARCHAR)
                  WHEN pk % 4 = 1 THEN
                    'https://' || host || '/session/' || substr(sha, 1, 32)
                  WHEN pk % 4 = 2 THEN
                    'https://' || host || '/docs/guide'
                  ELSE
                    'https://' || host || '/item/' || substr(sha, 1, 8) || '-'
                    || substr(sha, 9, 4) || '-' || substr(sha, 13, 4) || '-'
                    || substr(sha, 17, 4) || '-' || substr(sha, 21, 12)
             END AS url
      FROM base
    ), tpl AS (
      SELECT host, url,
             '/' || array_to_string(
               list_transform(
                 list_filter(string_split(
                   regexp_replace(regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)?', 1),
                                  '/+$', '', 'g'), '/'), s -> s <> ''),
                 s -> CASE
                        WHEN regexp_matches(s, '^[0-9]+$') THEN '<num>'
                        WHEN regexp_matches(s, '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$') THEN '<uuid>'
                        WHEN regexp_matches(s, '^[0-9a-f]{16,}$') THEN '<hex>'
                        WHEN regexp_matches(s, '^[a-z0-9_.-]+$') THEN s
                        ELSE '<mixed>'
                      END), '/') AS template
      FROM urls
    )
    SELECT host, template, COUNT(*) AS n_urls, MIN(url) AS sample_url
    FROM tpl GROUP BY host, template
"""


_PAN_ORACLE = """
    WITH planted AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 9 = 0 THEN ' card 4111111111111111 ok' ELSE '' END
             || CASE WHEN doc_id % 10 = 0 THEN ' num 4111111111111112 bad' ELSE '' END
             || CASE WHEN doc_id % 15 = 0 THEN ' tel 12345678901234567890 long' ELSE '' END AS t
      FROM documents
    ), cand AS (
      SELECT doc_id, UNNEST(regexp_extract_all(t, '\\d{13,19}')) AS c FROM planted
    ), digits AS (
      SELECT doc_id, c, i,
             CAST(substring(reverse(c), CAST(i AS INT), 1) AS INT) AS d
      FROM cand CROSS JOIN range(1, 20) r(i)
      WHERE i <= length(c)
    ), summed AS (
      SELECT doc_id, c,
             SUM(CASE WHEN i % 2 = 0
                      THEN (CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END)
                      ELSE d END) AS s
      FROM digits GROUP BY doc_id, c
    )
    SELECT doc_id,
           substring(c, 1, 6) || '*' || substring(c, length(c) - 3, 4) AS masked,
           CAST(length(c) AS INT) AS n_digits,
           (s % 10 = 0) AS luhn_valid
    FROM summed
"""


_MEDIA_DEDUP_ORACLE = """
    WITH base AS (
      SELECT doc_id, text,
             UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1) AS BIGINT))) AS i
      FROM documents
    ), media AS (
      SELECT doc_id,
             'img://' || CAST((doc_id * 7 + (i + i // 3 + 1)) % 97 AS VARCHAR) AS ref
      FROM base WHERE i % 3 = 2
    ), df_ AS (
      SELECT ref, COUNT(DISTINCT doc_id) AS dfq FROM media GROUP BY ref
    )
    SELECT doc_id, COUNT(*) AS n_media,
           SUM(CASE WHEN dfq > 1 THEN 1 ELSE 0 END) AS n_dup_media,
           ROUND(SUM(CASE WHEN dfq > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS dup_media_frac
    FROM media JOIN df_ USING (ref) GROUP BY doc_id
"""


def _trustrank_oracle(iters: int = 5, damping: float = 0.85) -> str:
    """Chained-CTE personalized PageRank: teleport AND dangling mass go to
    the seed vector sv (a CASE column on nodes), r0 = sv — the q52 oracle
    shape with s(v) replacing 1/n."""
    d = f"CAST({damping} AS DOUBLE)"
    parts = [
        "WITH e AS (SELECT DISTINCT user_id % 60 AS src,"
        " (user_id * 11 + event_id * 3) % 60 AS dst FROM events)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "sm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM nodes WHERE node % 10 = 0)",
        "s AS (SELECT node, CASE WHEN node % 10 = 0 THEN 1.0 / (SELECT m FROM sm)"
        " ELSE CAST(0.0 AS DOUBLE) END AS sv FROM nodes)",
        "r0 AS (SELECT node, sv AS r FROM s)",
    ]
    for k in range(1, iters + 1):
        p = f"r{k - 1}"
        parts.append(
            f"r{k} AS (SELECT s.node, (1.0 - {d}) * s.sv + {d} * (COALESCE(c.cs, 0)"
            f" + (SELECT COALESCE(SUM({p}.r), 0) FROM {p} LEFT JOIN deg"
            f" ON {p}.node = deg.src WHERE deg.src IS NULL) * s.sv) AS r"
            f" FROM s LEFT JOIN"
            f" (SELECT e.dst AS node, SUM({p}.r / deg.d) AS cs"
            f" FROM {p} JOIN deg ON {p}.node = deg.src JOIN e ON e.src = {p}.node"
            f" GROUP BY e.dst) c ON s.node = c.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, ROUND(r, 6) AS trust FROM r{iters}"


_MODALITY_MIX_ORACLE = """
    WITH base AS (
      SELECT doc_id, source, text,
             UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1) AS BIGINT))) AS i
      FROM documents
    ), tspans AS (
      SELECT doc_id, substr(text, CAST(i * 80 + 1 AS INTEGER), 80) AS chunk,
             i + i // 3 AS off
      FROM base
    ), t2 AS (
      SELECT * FROM tspans WHERE NOT (doc_id % 5 = 0 AND off = 0)
    ), mspans AS (
      SELECT doc_id, i + i // 3 + 1 AS off FROM base WHERE i % 3 = 2
    ), tok AS (
      SELECT doc_id,
             SUM(len(string_split_regex(trim(chunk), '\\s+'))) AS toks,
             MIN(off) AS tmin
      FROM t2 GROUP BY doc_id
    ), med AS (
      SELECT doc_id, COUNT(*) AS m, MIN(off) AS mmin FROM mspans GROUP BY doc_id
    ), perdoc AS (
      SELECT d.doc_id, d.source,
             COALESCE(toks, 0) AS toks, COALESCE(m, 0) AS m,
             CASE WHEN mmin IS NOT NULL AND (tmin IS NULL OR mmin < tmin)
                  THEN 1 ELSE 0 END AS lead
      FROM documents d
      LEFT JOIN tok USING (doc_id)
      LEFT JOIN med USING (doc_id)
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS text_tokens,
           CAST(SUM(m) AS BIGINT) AS n_media,
           ROUND(SUM(m) * 1.0 / greatest(SUM(toks), 1), 6) AS media_text_ratio,
           ROUND(AVG(lead), 6) AS leading_media_frac
    FROM perdoc GROUP BY source
"""


_CMS_ORACLE = """
    WITH toks AS (
      SELECT UNNEST(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), sk AS (
      SELECT dd AS "row",
             CAST('0x' || substr(sha256(term || '|' || CAST(dd AS VARCHAR)),
               1, 15) AS BIGINT) % 512 AS bucket,
             COUNT(*) AS cnt
      FROM toks CROSS JOIN (SELECT UNNEST(range(0, 4)) AS dd)
      GROUP BY 1, 2
    ), truth AS (
      SELECT term, COUNT(*) AS true_cnt FROM toks
      GROUP BY term HAVING COUNT(*) >= 30
    ), probes AS (
      SELECT term, true_cnt, dd,
             CAST('0x' || substr(sha256(term || '|' || CAST(dd AS VARCHAR)),
               1, 15) AS BIGINT) % 512 AS b
      FROM truth CROSS JOIN (SELECT UNNEST(range(0, 4)) AS dd)
    )
    SELECT term, true_cnt, MIN(COALESCE(cnt, 0)) AS cms_est
    FROM probes LEFT JOIN sk ON sk."row" = probes.dd AND sk.bucket = probes.b
    GROUP BY term, true_cnt
"""


_PHASH_ORACLE = """
    WITH m AS (
      SELECT CAST(p_partkey AS BIGINT) AS media_id,
             CASE WHEN (p_partkey // 50) % 5 = 0 THEN
                    xor(CAST('0x' || substr(sha256('img'
                      || CAST(p_partkey % 50 AS VARCHAR)), 1, 15) AS BIGINT), 3)
                  WHEN (p_partkey // 50) % 5 = 1 THEN
                    CAST('0x' || substr(sha256('img'
                      || CAST(p_partkey % 50 AS VARCHAR)), 1, 15) AS BIGINT)
                  ELSE
                    CAST('0x' || substr(sha256('uniq'
                      || CAST(p_partkey AS VARCHAR)), 1, 15) AS BIGINT)
             END AS h
      FROM part
    ), banded AS (
      SELECT media_id, h, b AS band_no, (h >> (b * 16)) & 65535 AS band_bits
      FROM m CROSS JOIN (SELECT UNNEST(range(0, 4)) AS b)
    ), df_ AS (
      SELECT band_no, band_bits, COUNT(*) AS c
      FROM banded GROUP BY band_no, band_bits
    ), capped AS (
      SELECT banded.* FROM banded JOIN df_ USING (band_no, band_bits)
      WHERE c <= 1000
    )
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming
    FROM capped a JOIN capped b USING (band_no, band_bits)
    WHERE a.media_id < b.media_id AND bit_count(xor(a.h, b.h)) <= 3
"""


_SPAN_REDACT_ORACLE = """
    WITH p AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.mil'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS t
      FROM documents
    ), base AS (
      SELECT doc_id, t,
             CAST(greatest(ceil(length(t) / 80.0), 1) AS BIGINT) AS nch
      FROM p
    ), runs AS (
      SELECT doc_id, t, (nch + 2) // 3 AS nruns, nch // 3 AS nmedia
      FROM base
    ), lines AS (
      SELECT doc_id, nruns, nmedia,
             flatten(list_transform(range(0, nruns), r ->
               CASE WHEN r < nmedia THEN
                 [concat_ws('|', 'text',
                    CAST(length(regexp_replace(regexp_replace(
                      substr(t, CAST(r * 240 + 1 AS INTEGER), 240),
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'), '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g'))
                      AS VARCHAR),
                    regexp_replace(regexp_replace(
                      substr(t, CAST(r * 240 + 1 AS INTEGER), 240),
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'), '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
                    '0', ''),
                  concat_ws('|', 'media', '0', '',
                    CAST(length('blob://doc/' || CAST(doc_id AS VARCHAR) || '/'
                      || CAST(3 * r + 2 AS VARCHAR)) AS VARCHAR),
                    'blob://doc/' || CAST(doc_id AS VARCHAR) || '/'
                      || CAST(3 * r + 2 AS VARCHAR))]
               ELSE
                 [concat_ws('|', 'text',
                    CAST(length(regexp_replace(regexp_replace(
                      substr(t, CAST(r * 240 + 1 AS INTEGER), 240),
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'), '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g'))
                      AS VARCHAR),
                    regexp_replace(regexp_replace(
                      substr(t, CAST(r * 240 + 1 AS INTEGER), 240),
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'), '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
                    '0', '')]
               END)) AS ls,
             list_sum(list_transform(range(0, nruns), r ->
               len(regexp_extract_all(substr(t, CAST(r * 240 + 1 AS INTEGER), 240),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')))) AS ne,
             list_sum(list_transform(range(0, nruns), r ->
               len(regexp_extract_all(substr(t, CAST(r * 240 + 1 AS INTEGER), 240),
                 '\\b\\d{3}-\\d{4}\\b')))) AS np
      FROM runs
    )
    SELECT doc_id,
           CAST(COALESCE(ne, 0) AS INTEGER) AS n_emails,
           CAST(COALESCE(np, 0) AS INTEGER) AS n_phones,
           CAST(nruns + nmedia AS INTEGER) AS n_spans,
           CAST(nmedia AS INTEGER) AS n_media,
           sha256(array_to_string(ls, chr(10))) AS span_seq_sha
    FROM lines
"""


_SPAN_LANGS_ORACLE = """
    WITH p AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 6 = 0
                          THEN repeat(' zzz qqq vvv kkk', 20) ELSE '' END AS t
      FROM documents
    ), runs AS (
      SELECT doc_id,
             (CAST(greatest(ceil(length(t) / 80.0), 1) AS BIGINT) + 2) // 3
               AS nruns,
             t
      FROM p
    ), graded AS (
      SELECT doc_id, nruns,
             list_sum(list_transform(range(0, nruns), r ->
               CASE WHEN substr(t, CAST(r * 240 + 1 AS INTEGER), 240)
                      LIKE '% the %'
                    OR substr(t, CAST(r * 240 + 1 AS INTEGER), 240)
                      LIKE 'the %'
                    OR substr(t, CAST(r * 240 + 1 AS INTEGER), 240)
                      LIKE '% a %'
                    THEN 1 ELSE 0 END)) AS nen
      FROM runs
    )
    SELECT doc_id,
           CAST(nruns AS INTEGER) AS n_text_spans,
           CAST(COALESCE(nen, 0) AS INTEGER) AS n_en_spans,
           ROUND(COALESCE(nen, 0) * 1.0 / nruns, 6) AS en_frac,
           CASE WHEN COALESCE(nen, 0) * 2 >= nruns THEN 'en'
                ELSE 'other' END AS doc_lang,
           CASE WHEN COALESCE(nen, 0) > 0 AND nen < nruns
                THEN 1 ELSE 0 END AS is_mixed
    FROM graded
"""


_SIZE_QUANTILES_ORACLE = """
    WITH s AS (
      SELECT 'h' || CAST(user_id % 40 AS VARCHAR) AS host,
             CAST(floor(abs(value) * 1000) AS BIGINT) AS sz
      FROM events
    ), h AS (
      SELECT host,
             CAST(length(bin(greatest(sz, 1))) AS INTEGER) AS bucket,
             COUNT(*) AS cnt
      FROM s GROUP BY host, bucket
    ), c AS (
      SELECT host, bucket,
             SUM(cnt) OVER (PARTITION BY host ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY host) AS n
      FROM h
    )
    SELECT host, CAST(MAX(n) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= (n * 50 + 99) // 100
                    THEN CAST(pow(2, bucket) AS BIGINT) - 1 END) AS p50_est,
           MIN(CASE WHEN cum >= (n * 95 + 99) // 100
                    THEN CAST(pow(2, bucket) AS BIGINT) - 1 END) AS p95_est,
           MIN(CASE WHEN cum >= (n * 99 + 99) // 100
                    THEN CAST(pow(2, bucket) AS BIGINT) - 1 END) AS p99_est
    FROM c GROUP BY host
"""


_EMBED_DECONTAM_ORACLE = """
    WITH bench AS (
      SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS be
      FROM embeddings WHERE vec_id % 50 = 0
    ), planted AS (
      SELECT vec_id + 1 AS vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0) AS pl
      FROM embeddings WHERE vec_id % 50 = 0
    ), corpus AS (
      SELECT e.vec_id,
             COALESCE(p.pl, CAST(e.embedding AS DOUBLE[])) AS ce
      FROM embeddings e LEFT JOIN planted p USING (vec_id)
      WHERE e.vec_id % 50 <> 0
    ), scored AS (
      SELECT c.vec_id, b.bench_id,
             ROUND(list_dot_product(c.ce, b.be)
               / (sqrt(list_dot_product(c.ce, c.ce))
                  * sqrt(list_dot_product(b.be, b.be))), 4) AS cosine
      FROM corpus c CROSS JOIN bench b
    ), ranked AS (
      SELECT vec_id, bench_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, bench_id) AS rn
      FROM scored
    )
    SELECT vec_id, bench_id, cosine,
           CAST(cosine >= 0.95 AS INTEGER) AS contaminated
    FROM ranked WHERE rn = 1
"""


_TRIAGE_ORACLE = """
    WITH s AS (
      SELECT 'h' || CAST(o_orderkey % 23 AS VARCHAR) AS host,
             CASE WHEN o_orderkey % 10 <= 5 THEN 200
                  WHEN o_orderkey % 10 = 6 THEN 404
                  WHEN o_orderkey % 10 = 7 THEN 500
                  WHEN o_orderkey % 10 = 8 THEN 0
                  ELSE 503 END AS status,
             CAST(o_orderkey % 5 AS INTEGER) AS attempts
      FROM orders
    ), v AS (
      SELECT host, attempts,
             CASE WHEN status >= 200 AND status < 300 THEN 'ok'
                  WHEN status >= 400 AND status < 500 THEN 'dead_permanent'
                  WHEN attempts < 4 THEN 'retry'
                  ELSE 'dead_exhausted' END AS action
      FROM s
    )
    SELECT host,
           SUM(CASE WHEN action = 'ok' THEN 1 ELSE 0 END) AS n_ok,
           SUM(CASE WHEN action = 'dead_permanent' THEN 1 ELSE 0 END)
             AS n_dead_permanent,
           SUM(CASE WHEN action = 'retry' THEN 1 ELSE 0 END) AS n_retry,
           SUM(CASE WHEN action = 'dead_exhausted' THEN 1 ELSE 0 END)
             AS n_dead_exhausted,
           ROUND(COALESCE(SUM(CASE WHEN action = 'retry'
             THEN least(1.0 * pow(2, attempts), 60.0) END), 0), 6)
             AS retry_budget_sec
    FROM v GROUP BY host
"""


def _refresh_value_oracle() -> str:
    """q52's pagerank CTE chain composed with q56's change-rate estimator:
    refresh_value = round6(rank) * round6(p_changed), rounded again."""
    return _pagerank_cte(5, 0.85).rstrip() + """,
    log AS (
      SELECT user_id AS url_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS chg
      FROM events
    ), agg AS (
      SELECT url_id, COUNT(*) AS n_visits, CAST(SUM(chg) AS BIGINT) AS n_changes,
             MIN(ep) AS f, MAX(ep) AS l
      FROM log GROUP BY url_id HAVING COUNT(*) >= 2
    ), nw AS (
      SELECT MAX(ep) + 3600 AS now FROM log
    ), calc AS (
      SELECT url_id, n_visits, n_changes,
             greatest(CAST(l - f AS DOUBLE) / (n_visits - 1), 1.0) AS itv,
             CAST((SELECT now FROM nw) - l AS DOUBLE) AS age
      FROM agg
    ), scored AS (
      SELECT url_id, url_id % 50 AS node,
             ROUND(1.0 - exp(ln((n_visits - n_changes + 0.5) / (n_visits + 0.5))
               / itv * age), 6) AS p_changed
      FROM calc
    ), rk AS (
      SELECT node, ROUND(r, 6) AS host_rank FROM r5
    )
    SELECT s.url_id, s.node, s.p_changed,
           COALESCE(rk.host_rank, 0.0) AS host_rank,
           CAST(ROUND(CAST(COALESCE(rk.host_rank, 0.0) AS DECIMAL(18,6))
                * CAST(s.p_changed AS DECIMAL(18,6)), 6)
                AS DOUBLE) AS refresh_value
    FROM scored s LEFT JOIN rk USING (node)
"""


_WATERFILL_ORACLE = """
    WITH d AS (
      SELECT n_name AS host,
             CAST((n_nationkey + 1) * ((n_nationkey % 5) + 1) * 10 AS BIGINT)
               AS demand
      FROM nation
    ), ranked AS (
      SELECT host, CAST(demand AS DOUBLE) AS dd, demand,
             ROW_NUMBER() OVER (ORDER BY demand, host) AS rn,
             COALESCE(SUM(demand) OVER (ORDER BY demand, host
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx,
             COUNT(*) OVER () AS n
      FROM d
    ), sat AS (
      SELECT *, (pfx + (n - rn + 1) * dd <= 3000) AS s FROM ranked
    ), lvl AS (
      SELECT CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS i,
             COALESCE(SUM(CASE WHEN s THEN dd END), 0) AS si,
             MAX(n) AS nn
      FROM sat
    )
    SELECT host, demand,
           ROUND(least(dd, CASE WHEN (SELECT i FROM lvl) < (SELECT nn FROM lvl)
             THEN (3000.0 - (SELECT si FROM lvl))
                  / ((SELECT nn FROM lvl) - (SELECT i FROM lvl))
             ELSE dd END), 6) AS allocation,
           CAST(s AS INTEGER) AS saturated
    FROM sat
"""


def _bpe_encode_oracle(rounds: int = 3) -> str:
    """q68's learn CTEs re-used; the encoded corpus is the final t{rounds}
    table — learn-then-apply equals the learned rewrite by construction."""
    learn = _bpe_oracle(rounds)
    ctes = learn.split("\nSELECT 1 AS")[0]  # keep only the WITH chain
    # _bpe_oracle ends with the UNION ALL of per-round rows; rebuild just
    # the CTE prefix by cutting at the first top-level SELECT
    idx = ctes.rfind(")")
    ctes = ctes[: idx + 1]
    return (
        ctes
        + f"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(t), '\\s+')) AS INTEGER)
             AS n_tokens,
           sha256(t) AS enc_sha
    FROM t{rounds}
"""
    )


_REG_DOMAIN_ORACLE = """
    WITH hosts AS (
      SELECT 'w' || CAST(c_custkey % 7 AS VARCHAR)
             || '.site' || CAST(c_custkey % 37 AS VARCHAR) || '.'
             || CASE WHEN c_custkey % 5 = 0 THEN 'com'
                     WHEN c_custkey % 5 = 1 THEN 'co.uk'
                     WHEN c_custkey % 5 = 2 THEN 'mil'
                     WHEN c_custkey % 5 = 3 THEN 'org.uk'
                     ELSE 'io' END AS host
      FROM customer
    ), reg AS (
      SELECT host,
             CASE WHEN len(l) > 2 AND array_to_string(l[-2:], '.') IN
                    ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
                     'org.au','co.jp','ac.jp','go.jp')
                  THEN array_to_string(l[-3:], '.')
                  WHEN len(l) > 1 AND l[-1] IN
                    ('com','org','net','mil','gov','edu','int','io')
                  THEN array_to_string(l[-2:], '.')
                  ELSE host END AS domain
      FROM (SELECT host, string_split(host, '.') AS l FROM hosts)
    )
    SELECT domain, COUNT(*) AS n_urls, COUNT(DISTINCT host) AS n_hosts
    FROM reg GROUP BY domain
"""


_BANDWIDTH_ORACLE = """
    WITH log AS (
      SELECT 'h' || CAST(event_id % 40 AS VARCHAR) AS host,
             (event_id // 40) * 7 AS fetch_ts,
             CAST(floor(abs(value) * 100) AS BIGINT) AS nbytes
      FROM events
    ), agg AS (
      SELECT host, (fetch_ts // 60) * 60 AS window_start,
             COUNT(*) AS n_fetches,
             CAST(SUM(nbytes) AS BIGINT) AS total_bytes
      FROM log GROUP BY host, window_start
    )
    SELECT host, CAST(window_start AS BIGINT) AS window_start, n_fetches,
           total_bytes,
           ROUND(total_bytes / 60.0, 6) AS bytes_per_sec,
           CAST(total_bytes / 60.0 > 1500.0 AS INTEGER) AS over_cap
    FROM agg
"""


_BLOB_INTEGRITY_ORACLE = """
    WITH base AS (
      SELECT doc_id, text,
             UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1) AS BIGINT))) AS i
      FROM documents
    ), refs AS (
      SELECT 'img://' || CAST((doc_id * 7 + (i + i // 3 + 1)) % 97 AS VARCHAR)
               AS ref,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM base WHERE i % 3 = 2 GROUP BY 1
    ), man AS (
      SELECT DISTINCT 'img://' || CAST(p_partkey AS VARCHAR) AS ref, 1 AS st
      FROM part
      WHERE p_partkey < 90 OR (p_partkey >= 100 AND p_partkey < 110)
    )
    SELECT COALESCE(refs.ref, man.ref) AS ref,
           CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs,
           CASE WHEN n_docs IS NOT NULL AND st IS NOT NULL THEN 'ok'
                WHEN n_docs IS NOT NULL THEN 'orphan_ref'
                ELSE 'unreferenced' END AS class
    FROM refs FULL OUTER JOIN man ON refs.ref = man.ref
"""


_BOUNDED_SHARDS_ORACLE = """
    WITH keys AS (
      SELECT 'u' || CAST(o_orderkey AS VARCHAR) AS k FROM orders
    ), cap AS (
      SELECT (11 * COUNT(*) + 79) // 80 AS c FROM keys
    ), sc AS (
      SELECT k, s,
             CAST('0x' || substr(sha256(k || '#' || CAST(s AS VARCHAR)), 1, 15)
               AS BIGINT) AS score
      FROM keys CROSS JOIN (SELECT UNNEST(range(0, 8)) AS s)
    ), rk AS (
      SELECT k, s, score,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY score DESC, s) AS rn
      FROM sc
    ), prefs AS (
      SELECT k,
             MAX(CASE WHEN rn = 1 THEN s END) AS p1,
             MAX(CASE WHEN rn = 1 THEN score END) AS s1,
             MAX(CASE WHEN rn = 2 THEN s END) AS p2
      FROM rk GROUP BY k
    ), loaded AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p1 ORDER BY s1 DESC, k) AS cum
      FROM prefs
    )
    SELECT k AS url,
           CAST(CASE WHEN cum > (SELECT c FROM cap) THEN p2 ELSE p1 END
             AS INTEGER) AS shard,
           CAST(cum > (SELECT c FROM cap) AS INTEGER) AS spilled
    FROM loaded
"""


_EPOCH_SHUFFLE_ORACLE = """
    WITH d AS (SELECT doc_id FROM documents),
    s AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(sha256('shard#'
               || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 16
               AS INTEGER) AS shard
      FROM d
    )
    SELECT doc_id, shard,
           CAST('0x' || substr(sha256('ep3#' || CAST(shard AS VARCHAR)), 1, 15)
             AS BIGINT) AS shard_rank,
           CAST('0x' || substr(sha256('doc3#' || CAST(doc_id AS VARCHAR)), 1, 15)
             AS BIGINT) AS doc_rank
    FROM s
"""


def _robots_diff_oracle() -> str:
    """Two q95-style REP matchings (old/new rule sets) joined per URL and
    rolled up into the four change classes per host."""
    def verdict(tag: str, rules_rows: str) -> str:
        return f"""
    rx{tag} AS (
      SELECT host, rule_type, pattern,
             '^' || replace(replace(
                      CASE WHEN pattern LIKE '%$'
                           THEN substr(pattern, 1, length(pattern) - 1)
                           ELSE pattern END,
                      '.', '\\.'), '*', '.*')
                 || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS regex,
             length(pattern) AS plen
      FROM ({rules_rows})
    ), m{tag} AS (
      SELECT u.host, u.path, r.rule_type, r.pattern, r.plen
      FROM urls u LEFT JOIN rx{tag} r
        ON u.host = r.host AND regexp_matches(u.path, r.regex)
    ), w{tag} AS (
      SELECT host, path,
             CASE WHEN pattern IS NULL THEN TRUE
                  ELSE rule_type = 'allow' END AS allowed,
             ROW_NUMBER() OVER (PARTITION BY host, path
               ORDER BY (pattern IS NOT NULL) DESC, plen DESC,
                        rule_type ASC, pattern ASC) AS rn
      FROM m{tag}
    ), v{tag} AS (SELECT host, path, allowed FROM w{tag} WHERE rn = 1)"""

    old_rules = (
        "SELECT host, 'disallow' AS rule_type, '/private/*' AS pattern FROM hosts"
        " UNION ALL SELECT host, 'disallow', '/tmp/' FROM hosts"
    )
    new_rules = (
        old_rules
        + " UNION ALL SELECT host, 'allow', '/private/*.html$' FROM hosts"
        + " UNION ALL SELECT host, 'disallow', '/pub/*' FROM hosts"
    )
    return f"""
    WITH hosts AS (
      SELECT 'h' || CAST(n_nationkey AS VARCHAR) AS host
      FROM nation WHERE n_nationkey < 8
    ), urls AS (
      SELECT 'h' || CAST(p_partkey % 8 AS VARCHAR) AS host,
             CASE CAST(p_partkey % 5 AS INT)
               WHEN 0 THEN '/private/doc' || CAST(p_partkey AS VARCHAR) || '.html'
               WHEN 1 THEN '/private/doc' || CAST(p_partkey AS VARCHAR) || '.pdf'
               WHEN 2 THEN '/tmp/f' || CAST(p_partkey AS VARCHAR)
               WHEN 3 THEN '/p' || CAST(p_partkey % 8 AS VARCHAR)
                        || '/doc' || CAST(p_partkey AS VARCHAR) || '.pdf'
               ELSE '/pub/doc' || CAST(p_partkey AS VARCHAR) || '.html'
             END AS path
      FROM part
    ),{verdict("o", old_rules)},{verdict("n", new_rules)}
    SELECT vo.host, COUNT(*) AS n_urls,
           SUM(CASE WHEN vo.allowed AND vn.allowed THEN 1 ELSE 0 END)
             AS unchanged_allowed,
           SUM(CASE WHEN NOT vo.allowed AND NOT vn.allowed THEN 1 ELSE 0 END)
             AS unchanged_blocked,
           SUM(CASE WHEN vo.allowed AND NOT vn.allowed THEN 1 ELSE 0 END)
             AS newly_blocked,
           SUM(CASE WHEN NOT vo.allowed AND vn.allowed THEN 1 ELSE 0 END)
             AS newly_allowed
    FROM vo JOIN vn ON vo.host = vn.host AND vo.path = vn.path
    GROUP BY vo.host
"""


_INC_CC_ORACLE = """
    WITH RECURSIVE pairs AS (
      SELECT CAST(p_partkey AS BIGINT) AS a, CAST(p_partkey + 1 AS BIGINT) AS b
      FROM part WHERE p_partkey % 10 < 9
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b, a FROM pairs
    ), reach(node, label) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""


_SESSIONS_ORACLE = """
    WITH log AS (
      SELECT 'h' || CAST(event_id % 40 AS VARCHAR) AS host,
             (event_id // 40) * 600 + ((event_id // 40) // 5) * 3600 AS fetch_ts
      FROM events
    ), marks AS (
      SELECT host, fetch_ts,
             CASE WHEN lag(fetch_ts) OVER (PARTITION BY host ORDER BY fetch_ts)
                    IS NULL
                  OR fetch_ts - lag(fetch_ts)
                       OVER (PARTITION BY host ORDER BY fetch_ts) > 1800
                  THEN 1 ELSE 0 END AS opens
      FROM log
    ), numbered AS (
      SELECT host, fetch_ts,
             SUM(opens) OVER (PARTITION BY host ORDER BY fetch_ts
                              ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marks
    )
    SELECT host, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_fetches,
           CAST(MIN(fetch_ts) AS BIGINT) AS t_start,
           CAST(MAX(fetch_ts) AS BIGINT) AS t_end,
           CAST(MAX(fetch_ts) - MIN(fetch_ts) AS BIGINT) AS duration_sec
    FROM numbered GROUP BY host, session_seq
"""


_CDC_DELTA_ORACLE = """
    WITH nd AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
                    substr(text, 1, 100) || ' EDITED SEGMENT INSERTED HERE '
                      || substr(text, 101, length(text))
                  WHEN doc_id % 3 = 1 THEN text || ' appended tail content'
                  ELSE text END AS text
      FROM documents
    ), oc AS (
      SELECT doc_id, text,
             list_concat(list_concat([1],
               list_filter(range(2, greatest(length(text) - 7, 2) + 1),
                 i -> i <= length(text) - 7
                      AND CAST('0x' || substr(sha256(substr(text, i, 8)), 1, 15)
                          AS BIGINT) % 32 = 0)),
               [length(text) + 1]) AS cuts
      FROM documents
    ), osh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(cuts)), j ->
               CAST('0x' || substr(sha256(substr(text, cuts[j],
                 cuts[j + 1] - cuts[j])), 1, 15) AS BIGINT))) AS old_shas
      FROM oc
    ), nc AS (
      SELECT doc_id, text, length(text) AS n,
             list_concat(list_concat([1],
               list_filter(range(2, greatest(length(text) - 7, 2) + 1),
                 i -> i <= length(text) - 7
                      AND CAST('0x' || substr(sha256(substr(text, i, 8)), 1, 15)
                          AS BIGINT) % 32 = 0)),
               [length(text) + 1]) AS cuts
      FROM nd
    ), sized AS (
      SELECT nc.doc_id, nc.n, len(cuts) - 1 AS n_chunks_new,
             list_transform(range(1, len(cuts)), j ->
               CASE WHEN list_contains(old_shas,
                      CAST('0x' || substr(sha256(substr(text, cuts[j],
                        cuts[j + 1] - cuts[j])), 1, 15) AS BIGINT))
                    THEN cuts[j + 1] - cuts[j] ELSE 0 END) AS rb,
             list_transform(range(1, len(cuts)), j ->
               CASE WHEN list_contains(old_shas,
                      CAST('0x' || substr(sha256(substr(text, cuts[j],
                        cuts[j + 1] - cuts[j])), 1, 15) AS BIGINT))
                    THEN 1 ELSE 0 END) AS rc
      FROM nc JOIN osh USING (doc_id)
    )
    SELECT doc_id,
           CAST(n_chunks_new AS INTEGER) AS n_chunks_new,
           CAST(list_sum(rc) AS BIGINT) AS n_reused,
           CAST(n - list_sum(rb) AS BIGINT) AS new_bytes,
           CAST(list_sum(rb) AS BIGINT) AS reused_bytes,
           ROUND(CASE WHEN n > 0 THEN list_sum(rb) * 1.0 / n
                 ELSE 1.0 END, 6) AS reuse_frac
    FROM sized
"""


_LINKPRED_ORACLE = """
    WITH raw AS (
      SELECT 'h' || CAST(p_partkey % 211 AS VARCHAR) AS src,
             'h' || CAST((p_partkey * p_partkey + 1) % 211 AS VARCHAR) AS dst
      FROM part
    ), und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst
    ), adj AS (
      SELECT a, b FROM und UNION ALL SELECT b, a FROM und
    ), deg AS (
      SELECT a AS z, COUNT(*) AS deg FROM adj GROUP BY a
    ), capped AS (
      SELECT n.z, d.deg, n.n
      FROM (SELECT b AS z, a AS n FROM adj) n
      JOIN deg d ON n.z = d.z
      WHERE d.deg <= 64
    ), wedges AS (
      SELECT l.z, l.deg, l.n AS x, r.n AS y
      FROM capped l JOIN (SELECT z, n FROM capped) r ON l.z = r.z
      WHERE l.n < r.n
    ), scored AS (
      SELECT x AS host_a, y AS host_b, COUNT(*) AS n_common,
             ROUND(SUM(1.0 / ln(deg)), 6) AS aa_score
      FROM wedges GROUP BY x, y
    )
    SELECT s.host_a, s.host_b, s.n_common, s.aa_score
    FROM scored s
    WHERE NOT EXISTS (
      SELECT 1 FROM und e WHERE e.a = s.host_a AND e.b = s.host_b
    ) AND s.aa_score > 0.0
"""


def oracle_sql() -> dict[str, str]:
    return {
        "q01_rollup": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_seen_anti_join": """
            SELECT o_orderkey, o_custkey, o_orderstatus
            FROM orders o
            WHERE NOT EXISTS (
                SELECT 1 FROM customer c
                WHERE c.c_nationkey < 5 AND c.c_custkey = o.o_custkey
            )
        """,
        "q03_in_run_dedup": """
            SELECT user_id, event_type, event_id FROM (
                SELECT user_id, event_type, event_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, event_type ORDER BY event_id
                       ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "q04_topk_per_host": """
            SELECT user_id, event_id, drain_rank FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY event_id
                       ) AS drain_rank
                FROM events
            ) WHERE drain_rank <= 3
        """,
        "q05_lag_carry": """
            SELECT event_id, user_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY event_id
                   ) AS prev_type
            FROM events
        """,
        "q06_explode": """
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS pos,
                   ROUND(CAST(UNNEST(embedding) AS DOUBLE), 6) AS val
            FROM embeddings
        """,
        "q07_version_hash": """
            SELECT c_custkey,
                   sha256(c_name || '|' || CAST(c_nationkey AS VARCHAR)) AS version_hash
            FROM customer
        """,
        "q08_json_extract": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
            FROM events
            GROUP BY event_type
        """,
        "q09_except": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND value > 90
            EXCEPT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'error' AND value > 90
        """,
        "q10_dedup_exact": """
            SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
            FROM documents GROUP BY text
        """,
        "q11_token_count": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                   n_chars
            FROM documents
        """,
        "q12_lang_id": """
            SELECT doc_id,
                   CASE WHEN text LIKE '% the %' OR text LIKE 'the %'
                             OR text LIKE '% a %'
                        THEN 'en' ELSE 'other' END AS lang_guess
            FROM documents
        """,
        "q13_fingerprint": """
            SELECT doc_id,
                   sha256(array_to_string(
                       string_split_regex(trim(text), '\\s+')[1:5], ' '
                   )) AS fingerprint
            FROM documents
        """,
        "q14_quality_score": """
            SELECT doc_id,
                   ROUND(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                         t -> t IN ('the','a','and','of')))
                         / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE),
                         6) AS stopword_ratio,
                   ROUND(length(trim(text))
                         / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE),
                         6) AS chars_per_token
            FROM documents
        """,
        "q15_cosine_topk": _cosine_oracle(round_digits=4),
        "q16_minhash_bands": """
            WITH sh AS (
              SELECT doc_id,
                     list_transform(range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                                    i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')) AS shingles
              FROM documents
            ), pairs AS (
              SELECT doc_id,
                     list_transform(shingles, s -> struct_pack(
                         a := CAST('0x' || substr(sha256(s), 1, 14) AS BIGINT),
                         b := CAST('0x' || substr(sha256(s), 15, 14) AS BIGINT))) AS ab
              FROM sh
            ), sig AS (
              SELECT doc_id,
                     list_transform(range(0, 16), i ->
                         list_min(list_transform(ab, p -> p.a + i * p.b))) AS mh
              FROM pairs
            ), bands AS (
              SELECT doc_id, CAST(b AS INT) AS band,
                     CAST('0x' || substr(sha256(array_to_string(list_slice(mh, b * 4 + 1, b * 4 + 4), ',')), 1, 15) AS BIGINT) AS band_hash
              FROM (SELECT doc_id, mh, UNNEST(range(0, 4)) AS b FROM sig)
            )
            SELECT band, band_hash, COUNT(*) AS n_docs,
                   array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
            FROM bands GROUP BY band, band_hash HAVING COUNT(*) > 1
        """,
        "q17_simhash": """
            WITH hv AS (
              SELECT doc_id,
                     list_transform(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''),
                                    t -> CAST('0x' || substr(sha256(t), 1, 15) AS BIGINT)) AS hs
              FROM documents
            )
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, 60), b ->
                       CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> b) & 1)) > len(hs)
                            THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
            FROM hv
        """,
        "q19_ann_lsh": _cosine_oracle(round_digits=6),
        "q20_near_dup_embeddings": """
            WITH un AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
              UNION ALL
              SELECT vec_id + 10000000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.5)
              FROM embeddings WHERE vec_id % 50 = 0
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_dot_product(a.e, b.e) /
                         (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
            FROM un a JOIN un b ON a.vec_id < b.vec_id
            WHERE ROUND(list_dot_product(a.e, b.e) /
                        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.9
        """,
        "q22_frame_sample": """
            WITH v AS (
              SELECT 'blob://vid/' || CAST(doc_id AS VARCHAR) AS media_ref,
                     octet_length(encode(text)) AS bl
              FROM documents
            )
            SELECT media_ref, CAST(i AS INT) AS frame_idx,
                   CAST(CASE WHEN bl < 40 THEN bl ELSE 40 END AS INT) AS frame_bytes
            FROM (SELECT media_ref, bl, UNNEST(range(0, least(8, greatest(1, bl // 40)))) AS i FROM v)
        """,
        "q21_media_metadata": """
            SELECT 'blob://doc/' || CAST(doc_id AS VARCHAR) AS media_ref,
                   octet_length(encode(text)) AS byte_len,
                   CAST(64 + (ascii(substr(text, 1, 1)) % 64) * 16 AS INT) AS width,
                   CAST(64 + (ascii(substr(text, length(text), 1)) % 64) * 16 AS INT) AS height
            FROM documents
        """,
        "q23_first_supported": """
            SELECT p_partkey,
                   CASE WHEN p_partkey % 5 = 0 THEN NULL
                        ELSE 'https://x.mil/' || CAST(p_partkey AS VARCHAR) || '.pdf'
                   END AS picked_url
            FROM part
        """,
        "q24_enrich_defaults": """
            SELECT o_orderkey,
                   COALESCE(c_name, 'UNKNOWN') AS display_name,
                   CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS nation
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "q25_union_sources": """
            SELECT DISTINCT user_id FROM (
                SELECT user_id FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT user_id FROM events WHERE event_type = 'view'
            )
        """,
        "q27_domain_scope": """
            SELECT n_nationkey,
                   lower(regexp_replace(n_name, '[^A-Za-z]', '', 'g')) || '.example.mil' AS host,
                   (n_nationkey % 2 = 0) AS in_scope
            FROM nation
        """,
        "q28_robots_prefix": """
            SELECT o_orderkey,
                   '/' || lower(o_orderpriority) || '/' || CAST(o_orderkey AS VARCHAR) AS path
            FROM orders
            WHERE lower(o_orderpriority) NOT LIKE '1-urgent%'
              AND lower(o_orderpriority) NOT LIKE '3-medium%'
        """,
        "q29_artifact_paths": """
            SELECT p_partkey,
                   name AS output_file_name,
                   CASE WHEN comp IS NOT NULL THEN name || '.' || comp
                        WHEN name LIKE '%rdte;%' OR name LIKE '%procurement;%'
                             THEN replace(name, ';', '/')
                        ELSE name END AS artifact_path
            FROM (
                SELECT p_partkey,
                       CASE p_partkey % 3
                            WHEN 0 THEN 'rdte;' || CAST(p_partkey % 30 + 1995 AS VARCHAR)
                                        || ';' || replace(p_name, ' ', '_')
                            WHEN 1 THEN replace(p_name, ' ', '_')
                            ELSE replace(p_name, ' ', '_') || '.pdf' END AS name,
                       CASE WHEN p_partkey % 3 = 2 THEN 'zip' END AS comp
                FROM part
            )
        """,
        "q26_carry_forward": """
            SELECT event_id, user_id,
                   ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                       AS last_purchase_value
            FROM events
        """,
        "q18_url_canonicalize": """
            SELECT p_partkey,
                   lower('https://Example.MIL/files/' || replace(p_name, ' ', '_') || '.pdf')
                       AS canonical_url,
                   'pdf' AS ext
            FROM part
        """,
        "q30_span_flatten": """
            WITH base AS (
              SELECT doc_id, text,
                     UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1) AS BIGINT))) AS i
              FROM documents
            )
            SELECT doc_id, CAST(i + i // 3 AS INT) AS span_offset,
                   'text' AS kind,
                   substring(text, CAST(i * 80 + 1 AS INT), 80) AS span_text,
                   CAST(NULL AS VARCHAR) AS media_ref
            FROM base
            UNION ALL
            SELECT doc_id, CAST(i + i // 3 + 1 AS INT), 'media',
                   CAST(NULL AS VARCHAR),
                   'blob://doc/' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
            FROM base WHERE i % 3 = 2
        """,
        "q31_span_fingerprint": """
            WITH base AS (
              SELECT doc_id, text,
                     UNNEST(range(0, CAST(greatest(ceil(length(text) / 80.0), 1) AS BIGINT))) AS i
              FROM documents
            ), spans AS (
              SELECT doc_id, i + i // 3 AS o, 'text' AS kind,
                     substring(text, CAST(i * 80 + 1 AS INT), 80) AS t,
                     CAST(NULL AS VARCHAR) AS m
              FROM base
              UNION ALL
              SELECT doc_id, i + i // 3 + 1, 'media', CAST(NULL AS VARCHAR),
                     'blob://doc/' || CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR)
              FROM base WHERE i % 3 = 2
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS INT) AS n_spans,
                   CAST(SUM(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS INT) AS n_media,
                   sha256(string_agg(kind || '|' || CAST(length(coalesce(t, '')) AS VARCHAR)
                                          || '|' || coalesce(t, '')
                                          || '|' || CAST(length(coalesce(m, '')) AS VARCHAR)
                                          || '|' || coalesce(m, ''),
                                     chr(10) ORDER BY o)) AS span_seq_sha
            FROM spans GROUP BY doc_id
        """,
        "q32_ivf_ann": _ivf_oracle(),
        "q39_connected_components": "WITH RECURSIVE " + _JACCARD_PAIRS_BODY + """,
            edges AS (
                SELECT a AS src, b AS dst FROM jpairs
                UNION
                SELECT b, a FROM jpairs
            ),
            reach(node, label) AS (
                SELECT src, src FROM (SELECT DISTINCT src FROM edges)
                UNION
                SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
            )
            SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
        """,
        "q45_percentiles": """
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.5), 4) AS p50,
                   ROUND(quantile_cont(value, 0.95), 4) AS p95
            FROM events GROUP BY event_type
        """,
        "q49_winnow_fingerprints": """
            WITH h AS (
              SELECT doc_id,
                     list_transform(
                       range(1, greatest(len(text) - 7, 1) + 1),
                       i -> CAST(('0x' || substr(sha256(substr(text, i, 8)), 1, 15)) AS BIGINT)
                     ) AS hs
              FROM documents
            ), w AS (
              SELECT doc_id,
                     list_sort(list_distinct(list_transform(
                       range(1, greatest(len(hs) - 3, 1) + 1),
                       j -> list_min(list_slice(hs, j, j + 3))
                     ))) AS fp
              FROM h
            )
            SELECT doc_id,
                   CAST(len(fp) AS INTEGER) AS n_fp,
                   array_to_string(fp, ',') AS fp_csv
            FROM w
        """,
        "q50_line_dedup": """
            WITH planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0
                          THEN 'terms of use privacy policy all rights reserved ' || text
                          ELSE text END AS text
              FROM documents
            ), w AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM planted
            ), lines AS (
              SELECT doc_id,
                     UNNEST(list_transform(
                       range(0, greatest(CAST(ceil(len(toks) / 8.0) AS BIGINT), 1)),
                       i -> struct_pack(
                         pos := i,
                         line := array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' '))),
                       recursive := true)
              FROM w
            ), common AS (
              SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 5
            )
            SELECT l.doc_id,
                   COUNT(*) AS n_lines,
                   CAST(SUM(CASE WHEN c.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                   sha256(coalesce(
                     string_agg(l.line, ' ' ORDER BY l.pos) FILTER (WHERE c.line IS NULL),
                     '')) AS kept_sha
            FROM lines l LEFT JOIN common c ON l.line = c.line
            GROUP BY l.doc_id
        """,
        "q51_char_entropy": """
            WITH chars AS (
              SELECT doc_id, UNNEST(string_split_regex(text, '')) AS c FROM documents
            ), cnt AS (
              SELECT doc_id, c, COUNT(*) AS k FROM chars WHERE c <> '' GROUP BY doc_id, c
            ), tot AS (
              SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY doc_id
            )
            SELECT cnt.doc_id,
                   ROUND(log2(CAST(tot.n AS DOUBLE))
                         - SUM(k * log2(CAST(k AS DOUBLE))) / tot.n, 4) AS entropy_bits
            FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
            GROUP BY cnt.doc_id, tot.n
        """,
        "q52_pagerank": _pagerank_oracle(iters=5, damping=0.85),
        "q68_bpe_merges": _bpe_oracle(rounds=3),
        "q69_hits": _hits_oracle(iters=3),
        "q70_semantic_dedup": _semantic_dedup_oracle(),
        "q71_gopher_quality": _GOPHER_ORACLE,
        "q72_pack_offsets": _PACK_ORACLE,
        "q73_span_coalesce": _SPAN_COALESCE_ORACLE,
        "q74_winnow_overlap": _WINNOW_OVERLAP_ORACLE,
        "q75_anchor_texts": _ANCHOR_ORACLE,
        "q76_mixture_weights": _MIXTURE_ORACLE,
        "q77_asof_state": _ASOF_ORACLE,
        "q78_rendezvous_shards": _RENDEZVOUS_ORACLE,
        "q79_shard_rebalance": _REBALANCE_ORACLE,
        "q80_exact_substring_mask": _ESD_ORACLE,
        "q81_bm25_topk": _BM25_ORACLE,
        "q82_snapshot_diff": _SNAPDIFF_ORACLE,
        "q83_budget_select": _BUDGET_ORACLE,
        "q84_host_reputation": _REPUTATION_ORACLE,
        "q85_incremental_lsh": _INCR_LSH_ORACLE,
        "q86_heavy_hitters": _HH_ORACLE,
        "q87_boilerplate_lines": _BOILERPLATE_ORACLE,
        "q89_ewma_failure": _EWMA_ORACLE,
        "q90_quantization_error": _QUANT_ORACLE,
        "q91_bfs_depth": _BFS_ORACLE,
        "q92_range_coalesce": _RANGES_ORACLE,
        "q93_containment_quotes": _CONTAINMENT_ORACLE,
        "q94_ngram_novelty": _NOVELTY_ORACLE,
        "q95_robots_wildcards": _ROBOTS_WILDCARD_ORACLE,
        "q96_mirror_hosts": _MIRRORS_ORACLE,
        "q97_fetch_eta": _ETA_ORACLE,
        "q98_bigram_xent": _BIGRAM_XENT_ORACLE,
        "q99_url_param_rules": _DUST_ORACLE,
        "q100_soft404_templates": _SOFT404_ORACLE,
        "q101_dsir_weights": _DSIR_ORACLE,
        "q102_link_farms": _LINKFARM_ORACLE,
        "q103_pq_codes": _PQ_ORACLE,
        "q104_source_kl": _SOURCE_KL_ORACLE,
        "q105_oov_rate": _OOV_ORACLE,
        "q106_triangles": _TRIANGLES_ORACLE,
        "q107_window_chunks": _CHUNKS_ORACLE,
        "q108_temperature_sample": _TEMPERATURE_ORACLE,
        "q109_kcore": _KCORE_ORACLE,
        "q110_span_truncate": _SPAN_TRUNCATE_ORACLE,
        "q111_caption_candidates": _CAPTIONS_ORACLE,
        "q112_fairness": _FAIRNESS_ORACLE,
        "q113_pseudonyms": _PSEUDONYM_ORACLE,
        "q114_shard_manifest": _SHARD_MANIFEST_ORACLE,
        "q115_politeness_audit": _POLITENESS_AUDIT_ORACLE,
        "q116_weighted_sample": _WEIGHTED_SAMPLE_ORACLE,
        "q117_size_anomalies": _SIZE_ANOMALY_ORACLE,
        "q118_revision_similarity": _REVISION_ORACLE,
        "q119_vocab_growth": _VOCAB_GROWTH_ORACLE,
        "q120_retry_backoff": _BACKOFF_ORACLE,
        "q121_hybrid_fusion": _fusion_oracle(),
        "q122_span_audit": _SPAN_AUDIT_ORACLE,
        "q123_encoding_audit": _encoding_oracle(),
        "q124_split_leakage": _SPLIT_LEAKAGE_ORACLE,
        "q125_revalidation_plan": _REVALIDATION_ORACLE,
        "q126_cusum_drift": _CUSUM_ORACLE,
        "q127_psi_drift": _PSI_ORACLE,
        "q128_curriculum_order": _CURRICULUM_ORACLE,
        "q129_multimodal_pack": _MULTIPACK_ORACLE,
        "q130_centroid_drift": _CENTROID_DRIFT_ORACLE,
        "q131_release_report": _RELEASE_REPORT_ORACLE,
        "q132_url_templates": _URL_TEMPLATE_ORACLE,
        "q133_pan_findings": _PAN_ORACLE,
        "q134_media_dedup": _MEDIA_DEDUP_ORACLE,
        "q135_link_prediction": _LINKPRED_ORACLE,
        "q136_fetch_sessions": _SESSIONS_ORACLE,
        "q137_cdc_delta": _CDC_DELTA_ORACLE,
        "q138_trustrank": _trustrank_oracle(),
        "q139_modality_mix": _MODALITY_MIX_ORACLE,
        "q140_cms_estimates": _CMS_ORACLE,
        "q141_phash_dups": _PHASH_ORACLE,
        "q142_span_redact": _SPAN_REDACT_ORACLE,
        "q143_span_langs": _SPAN_LANGS_ORACLE,
        "q144_size_quantiles": _SIZE_QUANTILES_ORACLE,
        "q145_embed_decontam": _EMBED_DECONTAM_ORACLE,
        "q146_failure_triage": _TRIAGE_ORACLE,
        "q147_refresh_value": _refresh_value_oracle(),
        "q148_waterfill": _WATERFILL_ORACLE,
        "q149_bpe_encode": _bpe_encode_oracle(),
        "q150_registrable_domains": _REG_DOMAIN_ORACLE,
        "q151_bandwidth_windows": _BANDWIDTH_ORACLE,
        "q152_blob_integrity": _BLOB_INTEGRITY_ORACLE,
        "q153_bounded_shards": _BOUNDED_SHARDS_ORACLE,
        "q154_epoch_shuffle": _EPOCH_SHUFFLE_ORACLE,
        "q155_robots_diff": _robots_diff_oracle(),
        "q156_incremental_cc": _INC_CC_ORACLE,
        # q158: probing the inserted set — no false negatives means every
        # row is True by the filter's contract, independent of fingerprints
        "q158_cuckoo_seen": """
    SELECT CAST('0x' || substr(sha256('u' || CAST(o_orderkey AS VARCHAR)),
                 1, 15) AS BIGINT) AS url_hash64,
           TRUE AS cuckoo_maybe
    FROM orders
""",
        "q157_powerlaw_alpha": """
    WITH e AS (
      SELECT DISTINCT user_id % 50 AS src,
             (user_id * 7 + event_id) % 50 AS dst
      FROM events
    ), degs AS (
      SELECT dst, COUNT(*) AS deg FROM e GROUP BY dst
    ), tail AS (
      SELECT CAST(deg AS DOUBLE) AS d FROM degs WHERE deg >= 2
    )
    SELECT COUNT(*) AS n_tail, CAST(2 AS INTEGER) AS d_min,
           ROUND(CASE WHEN SUM(ln(d / 2)) > 0
                 THEN 1.0 + COUNT(*) / SUM(ln(d / 2)) END, 6) AS alpha_hat
    FROM tail
""",
        # q159: rho via length(bin(w)) is exact integer arithmetic in both
        # engines; the estimate formula is evaluated with the same literals
        "q159_hll_distinct": """
    WITH items AS (
      SELECT 'h' || CAST(o_custkey % 8 AS VARCHAR) AS host,
             'u' || CAST(o_orderkey % 4096 AS VARCHAR) AS item
      FROM orders
    ), h AS (
      SELECT host, item,
             CAST('0x' || substr(sha256(item), 1, 15) AS BIGINT) AS hash
      FROM items
    ), regs AS (
      SELECT host, hash % 256 AS register,
             MAX(CASE WHEN (hash >> 8) = 0 THEN 53
                 ELSE 53 - length(bin(hash >> 8)) END) AS rho_max
      FROM h GROUP BY host, hash % 256
    ), agg AS (
      SELECT host, COUNT(*) AS n_registers,
             SUM(power(2.0, -rho_max)) AS z
      FROM regs GROUP BY host
    ), est AS (
      SELECT host, n_registers,
             (256.0 - n_registers) AS zeros,
             (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
               / (z + (256.0 - n_registers)) AS raw
      FROM agg
    ), ex AS (
      SELECT host, COUNT(DISTINCT item) AS exact_distinct
      FROM items GROUP BY host
    )
    SELECT e.host, e.n_registers,
           CAST(ROUND(CASE WHEN e.raw <= 640.0 AND e.zeros > 0
                THEN 256.0 * ln(256.0 / e.zeros) ELSE e.raw END, 0)
                AS BIGINT) AS est_distinct,
           x.exact_distinct
    FROM est e JOIN ex x USING (host)
""",
        "q160_kmeans_clusters": _kmeans_oracle(k=4, dim=64, iters=2),
        "q161_round_robin": """
    WITH urls AS (
      SELECT 'h' || CAST(p_partkey % 50 AS VARCHAR) AS host,
             '/d/' || CAST(p_partkey AS VARCHAR) AS url,
             CAST((p_partkey * 7) % 100 AS INTEGER) AS priority
      FROM part
    ), r AS (
      SELECT host, url, priority,
             row_number() OVER (PARTITION BY host
                                ORDER BY priority DESC, url) AS rr
      FROM urls
    )
    SELECT host, url, priority, CAST(rr AS INTEGER) AS rr_rank
    FROM r ORDER BY rr, host, url LIMIT 500
""",
        # q162: full recompute over old+delta, restricted to the delta's
        # terms — must equal the incremental merge byte-for-byte
        "q162_incremental_index": """
    WITH thr AS (SELECT (MAX(doc_id) * 9) // 10 AS t FROM documents),
    toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(text), '\\s+')) AS term,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) - 1 AS pos
      FROM documents
    ), perdoc AS (
      SELECT term, doc_id, list_sort(list(pos)) AS plist
      FROM toks GROUP BY term, doc_id
    ), full_idx AS (
      SELECT term, COUNT(*) AS doc_freq,
             string_agg(CAST(doc_id AS VARCHAR) || ':' || array_to_string(plist, '|'),
                        ',' ORDER BY doc_id) AS postings
      FROM perdoc GROUP BY term
    ), delta_terms AS (
      SELECT DISTINCT term FROM toks WHERE doc_id >= (SELECT t FROM thr)
    )
    SELECT f.term, f.doc_freq, f.postings
    FROM full_idx f JOIN delta_terms USING (term)
""",
        # q163: synchronous LPA is reproducible — each round reads only the
        # previous labeling; ties break to the smallest label in both engines
        "q163_lpa_communities": """
    WITH raw AS (
      SELECT CAST(p_partkey AS BIGINT) AS a,
             CAST(p_partkey - (p_partkey % 5) AS BIGINT) AS b
      FROM part WHERE p_partkey % 5 <> 0
    ), sym AS (
      SELECT a, b FROM raw WHERE a <> b
      UNION
      SELECT b AS a, a AS b FROM raw WHERE a <> b
    ), lab0 AS (
      SELECT DISTINCT a AS node, a AS label FROM sym
    ), c1 AS (
      SELECT s.a AS node, l.label, COUNT(*) AS c
      FROM sym s JOIN lab0 l ON s.b = l.node GROUP BY s.a, l.label
    ), lab1 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        FROM c1) WHERE rn = 1
    ), c2 AS (
      SELECT s.a AS node, l.label, COUNT(*) AS c
      FROM sym s JOIN lab1 l ON s.b = l.node GROUP BY s.a, l.label
    ), lab2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        FROM c2) WHERE rn = 1
    )
    SELECT node, label AS community FROM lab2
""",
        "q164_adc_rerank": _adc_oracle(n_adc=50, n_out=10),
        "q165_ir_metrics": r"""
    WITH tf AS (
      SELECT t.qid, d.doc_id, COUNT(*) AS tf
      FROM documents d,
           LATERAL (SELECT unnest(regexp_split_to_array(trim(d.text), '\s+')) AS qid) t
      WHERE t.qid IN ('spark', 'query', 'merge')
      GROUP BY t.qid, d.doc_id
    ), run AS (
      SELECT qid, doc_id, rank FROM (
        SELECT qid, doc_id,
               row_number() OVER (PARTITION BY qid ORDER BY tf DESC, doc_id ASC) AS rank
        FROM tf) WHERE rank <= 15
    ), rels AS (
      SELECT qid, doc_id FROM tf WHERE tf >= 2
    ), nrel AS (
      SELECT qid, COUNT(*) AS n_rel FROM rels GROUP BY qid
    ), j AS (
      SELECT r.qid,
             SUM(CASE WHEN x.doc_id IS NOT NULL
                      THEN 1.0 / log2(r.rank + 1) ELSE 0 END) AS dcg,
             MIN(CASE WHEN x.doc_id IS NOT NULL THEN r.rank END) AS first_hit,
             SUM(CASE WHEN x.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS hits
      FROM run r
      LEFT JOIN rels x ON r.qid = x.qid AND r.doc_id = x.doc_id
      WHERE r.rank <= 10
      GROUP BY r.qid
    ), disc AS (
      SELECT g.i AS m, SUM(1.0 / log2(h.i + 1)) AS idcg
      FROM generate_series(1, 10) AS g(i)
      JOIN generate_series(1, 10) AS h(i) ON h.i <= g.i
      GROUP BY g.i
    ), idcg AS (
      SELECT n.qid, d.idcg
      FROM nrel n JOIN disc d ON d.m = LEAST(n.n_rel, 10)
    )
    SELECT j.qid,
           COALESCE(n.n_rel, 0) AS n_rel,
           ROUND(COALESCE(1.0 / j.first_hit, 0), 6) AS mrr,
           ROUND(CASE WHEN COALESCE(n.n_rel, 0) > 0
                      THEN j.dcg / i.idcg ELSE 0 END, 6) AS ndcg,
           ROUND(CASE WHEN COALESCE(n.n_rel, 0) > 0
                      THEN CAST(j.hits AS DOUBLE) / n.n_rel ELSE 0 END, 6) AS recall
    FROM j
    LEFT JOIN nrel n ON j.qid = n.qid
    LEFT JOIN idcg i ON j.qid = i.qid
""",
        "q166_phrase_match": r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr FROM documents
    ), toks AS (
      SELECT doc_id, u.i AS pos, arr[u.i + 1] AS term
      FROM t, LATERAL (SELECT unnest(range(len(arr))) AS i) u
    ), p0 AS (
      SELECT doc_id, list_sort(list(pos)) AS pl FROM toks WHERE term = 'order' GROUP BY doc_id
    ), p1 AS (
      SELECT doc_id, list_sort(list(pos)) AS pl FROM toks WHERE term = 'fast' GROUP BY doc_id
    ), m AS (
      SELECT p0.doc_id,
             list_intersect(list_transform(p0.pl, x -> x + 1), p1.pl) AS mm
      FROM p0 JOIN p1 USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(mm) AS BIGINT) AS n_occurrences,
           CAST(list_min(mm) - 1 AS BIGINT) AS first_pos
    FROM m WHERE len(mm) > 0
""",
        "q167_boolean_match": r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr FROM documents
    ), toks AS (
      SELECT DISTINCT doc_id, u.term
      FROM t, LATERAL (SELECT unnest(arr) AS term) u
      WHERE u.term IN ('spark', 'merge', 'vector', 'window', 'group')
    ), agg AS (
      SELECT doc_id,
             SUM(CASE WHEN term IN ('merge', 'spark') THEN 1 ELSE 0 END) AS nm,
             SUM(CASE WHEN term IN ('group', 'vector', 'window') THEN 1 ELSE 0 END) AS ns
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, CAST(ns AS BIGINT) AS n_should
    FROM agg WHERE nm = 2 AND ns >= 2
""",
        "q168_zorder_skipping": _zorder_oracle(bits=8),
        "q169_aimd_delay": """
    WITH RECURSIVE seq AS (
      SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS host,
             CAST(row_number() OVER (
               PARTITION BY user_id % 20 ORDER BY event_id) AS INTEGER) AS rn,
             (event_type = 'error') AS fail
      FROM events WHERE event_id < 4000
    ), steps AS (
      SELECT host, 0 AS rn, CAST(1000.0 AS DOUBLE) AS delay
      FROM (SELECT DISTINCT host FROM seq)
      UNION ALL
      SELECT q.host, q.rn,
             CASE WHEN q.fail THEN LEAST(2 * s.delay, 8000.0)
                  ELSE GREATEST(s.delay - 250.0, 100.0) END
      FROM steps s JOIN seq q ON q.host = s.host AND q.rn = s.rn + 1
    )
    SELECT host, rn, ROUND(delay, 6) AS delay_ms FROM steps WHERE rn > 0
""",
        "q170_percolate": r"""
    WITH q(query_id, must_terms) AS (VALUES
      ('alert1', ['merge', 'spark']),
      ('alert2', ['group', 'vector', 'window']),
      ('alert3', ['the']),
      ('alert4', ['nosuchterm', 'spark']),
      ('alert5', ['fast', 'filter', 'join', 'slow'])
    ), qt AS (
      SELECT query_id, unnest(must_terms) AS term FROM q
    ), qs AS (
      SELECT query_id, len(must_terms) AS need FROM q
    ), toks AS (
      SELECT DISTINCT d.doc_id, u.term
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM documents) d,
           LATERAL (SELECT unnest(arr) AS term) u
    ), hits AS (
      SELECT t.doc_id, qt.query_id, count(*) AS got
      FROM toks t JOIN qt USING (term)
      GROUP BY t.doc_id, qt.query_id
    )
    SELECT h.query_id, h.doc_id
    FROM hits h JOIN qs USING (query_id) WHERE h.got = qs.need
""",
        "q171_front_coding": r"""
    WITH urls AS (
      SELECT DISTINCT
        'h' || CAST(p_partkey % 20 AS VARCHAR) AS host,
        'https://h' || CAST(p_partkey % 20 AS VARCHAR) || '.example/catalog/'
          || replace(p_name, ' ', '-') || '/' || CAST(p_partkey AS VARCHAR) AS url
      FROM part
    ), lagged AS (
      SELECT host, url,
             lag(url) OVER (PARTITION BY host ORDER BY url) AS prev
      FROM urls
    ), coded AS (
      SELECT host, len(url) AS raw,
             len(url) + 2 - COALESCE(
               (SELECT max(g.i)
                FROM (SELECT unnest(range(1, least(len(url), len(prev)) + 1)) AS i) g
                WHERE substr(url, 1, g.i) = substr(prev, 1, g.i)), 0) AS coded
      FROM lagged
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(SUM(raw) AS BIGINT) AS raw_bytes,
           CAST(SUM(coded) AS BIGINT) AS coded_bytes,
           ROUND(1.0 - CAST(SUM(coded) AS DOUBLE) / SUM(raw), 6) AS saved_frac
    FROM coded GROUP BY host
""",
        "q172_allpairs_jaccard": r"""
    WITH un AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, text || ' extraword' AS text
      FROM documents WHERE doc_id % 25 = 0
    ), t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr FROM un
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(arr[u.i + 1 : u.i + 4], ' ') AS term
      FROM t, LATERAL (SELECT unnest(range(len(arr) - 3)) AS i) u
      WHERE len(arr) >= 4
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), j AS (
      SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
      FROM pairs
      JOIN sz sa ON sa.doc_id = pairs.doc_a
      JOIN sz sb ON sb.doc_id = pairs.doc_b
    )
    SELECT doc_a, doc_b, ROUND(jac, 6) AS jaccard FROM j WHERE jac >= 0.6
""",
        "q173_bootstrap_ci": """
    WITH e AS (
      SELECT event_type, event_id, value FROM events WHERE event_id < 20000
    ), rep AS (
      SELECT event_type, event_id, value, u.b
      FROM e, LATERAL (SELECT unnest(range(100)) AS b) u
    ), uni AS (
      SELECT event_type, b, value,
             ((CAST('0x' || substr(sha256('bs|' || CAST(b AS VARCHAR) || '|'
                 || CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
               % 1000000) + 0.5) / 1000000.0 AS u
      FROM rep
    ), wt AS (
      SELECT event_type, b, value,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  WHEN u < 0.9999167588507119 THEN 6
                  WHEN u < 0.9999897508033253 THEN 7
                  WHEN u < 0.9999988747974021 THEN 8
                  ELSE 9 END AS w
      FROM uni
    ), means AS (
      SELECT event_type, b, SUM(w * value) / SUM(w) AS m
      FROM wt GROUP BY event_type, b
    ), ranked AS (
      SELECT event_type, m, b,
             row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rn
      FROM means
    ), bounds AS (
      SELECT event_type, ROUND(MIN(m), 6) AS ci_lo, ROUND(MAX(m), 6) AS ci_hi
      FROM ranked WHERE rn IN (3, 98) GROUP BY event_type
    ), pt AS (
      SELECT event_type, ROUND(AVG(value), 6) AS mean,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY event_type
    )
    SELECT p.event_type, p.mean, bo.ci_lo, bo.ci_hi, p.n
    FROM pt p JOIN bounds bo USING (event_type)
""",
        "q174_skyline": r"""
    WITH f AS (
      SELECT doc_id, n_chars,
             CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
               AS distinct_tokens,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS total_tokens
      FROM documents
    )
    SELECT doc_id, n_chars, distinct_tokens, total_tokens FROM f a
    WHERE NOT EXISTS (
      SELECT 1 FROM f b
      WHERE b.n_chars >= a.n_chars
        AND b.distinct_tokens >= a.distinct_tokens
        AND b.total_tokens <= a.total_tokens
        AND (b.n_chars > a.n_chars
             OR b.distinct_tokens > a.distinct_tokens
             OR b.total_tokens < a.total_tokens))
""",
        "q175_edit1_join": """
    WITH base AS (
      SELECT lower(split_part(p_name, ' ', 1)) || '-'
               || CAST(p_partkey % 97 AS VARCHAR) AS s
      FROM part
    ), typos AS (
      SELECT substr(lower(split_part(p_name, ' ', 1)) || '-'
               || CAST(p_partkey % 97 AS VARCHAR), 2) AS s
      FROM part WHERE p_partkey % 37 = 0
    ), un AS (
      SELECT DISTINCT s FROM (SELECT s FROM base UNION ALL SELECT s FROM typos)
    )
    SELECT a.s AS s_a, b.s AS s_b,
           CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
    FROM un a JOIN un b
      ON a.s < b.s AND abs(len(a.s) - len(b.s)) <= 1
    WHERE levenshtein(a.s, b.s) = 1
""",
        "q176_mmr_diversify": _mmr_oracle(lam=0.7, pool=8),
        "q178_ddsketch_quantiles": _ddsketch_oracle(alpha=0.01, qs=(0.5, 0.9, 0.99)),
        "q181_good_turing": """
    WITH items AS (
      SELECT 'u' || CAST(o_custkey * 13 + o_orderkey % 7 AS VARCHAR) AS item
      FROM orders
    ), tc AS (SELECT item, COUNT(*) AS r FROM items GROUP BY item),
    cofc AS (SELECT r, COUNT(*) AS n_r FROM tc GROUP BY r),
    nn AS (SELECT CAST(SUM(r) AS DOUBLE) AS nn FROM tc),
    n1 AS (SELECT CAST(COALESCE(SUM(CASE WHEN r = 1 THEN n_r END), 0)
                       AS DOUBLE) AS n1 FROM cofc)
    SELECT a.r, a.n_r,
           ROUND(CAST(a.r + 1 AS DOUBLE) * CAST(b.n_r AS DOUBLE)
                 / CAST(a.n_r AS DOUBLE), 6) AS r_star,
           ROUND(CAST(a.r AS DOUBLE) * CAST(a.n_r AS DOUBLE)
                 / (SELECT nn FROM nn), 6) AS mass,
           ROUND((SELECT n1 FROM n1) / (SELECT nn FROM nn), 6) AS p_unseen
    FROM cofc a LEFT JOIN cofc b ON b.r = a.r + 1
    WHERE a.r <= 6
""",
        # q182: the greedy pick sequence is deterministic (gain desc, set
        # asc), so three unrolled rounds replay it exactly
        "q182_set_cover": """
    WITH pairs AS (
      SELECT DISTINCT 's' || CAST(l_suppkey % 25 AS VARCHAR) AS s,
             l_partkey AS e
      FROM lineitem
    ), g1 AS (SELECT s, COUNT(*) AS gain FROM pairs GROUP BY s),
    p1 AS (SELECT s, gain FROM g1 ORDER BY gain DESC, s LIMIT 1),
    c1 AS (SELECT e FROM pairs WHERE s = (SELECT s FROM p1)),
    r2 AS (SELECT * FROM pairs WHERE s <> (SELECT s FROM p1)
           AND e NOT IN (SELECT e FROM c1)),
    g2 AS (SELECT s, COUNT(*) AS gain FROM r2 GROUP BY s),
    p2 AS (SELECT s, gain FROM g2 ORDER BY gain DESC, s LIMIT 1),
    c2 AS (SELECT e FROM pairs WHERE s = (SELECT s FROM p2)),
    r3 AS (SELECT * FROM r2 WHERE s <> (SELECT s FROM p2)
           AND e NOT IN (SELECT e FROM c2)),
    g3 AS (SELECT s, COUNT(*) AS gain FROM r3 GROUP BY s),
    p3 AS (SELECT s, gain FROM g3 ORDER BY gain DESC, s LIMIT 1)
    SELECT CAST(1 AS INTEGER) AS pick, s AS chosen_set,
           gain, gain AS cum_covered FROM p1
    UNION ALL
    SELECT CAST(2 AS INTEGER), s, gain,
           gain + (SELECT gain FROM p1) FROM p2
    UNION ALL
    SELECT CAST(3 AS INTEGER), s, gain,
           gain + (SELECT gain FROM p1) + (SELECT gain FROM p2) FROM p3
""",
        "q183_capture_recapture": """
    WITH p1 AS (
      SELECT DISTINCT l_suppkey % 8 AS src, l_partkey AS id
      FROM lineitem WHERE l_linenumber % 2 = 0
    ), p2 AS (
      SELECT DISTINCT l_suppkey % 8 AS src, l_partkey AS id
      FROM lineitem WHERE l_orderkey % 2 = 0
    ), a AS (SELECT src, COUNT(*) AS n1 FROM p1 GROUP BY src),
    b AS (SELECT src, COUNT(*) AS n2 FROM p2 GROUP BY src),
    mm AS (SELECT src, COUNT(*) AS m
           FROM p1 JOIN p2 USING (src, id) GROUP BY src),
    j AS (
      SELECT COALESCE(a.src, b.src) AS src, COALESCE(n1, 0) AS n1,
             COALESCE(n2, 0) AS n2, COALESCE(m, 0) AS m
      FROM a FULL OUTER JOIN b ON a.src = b.src
      LEFT JOIN mm ON COALESCE(a.src, b.src) = mm.src
    )
    SELECT src, n1, n2, m,
           ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1, 6) AS n_hat,
           ROUND(SQRT((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                      / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 6) AS se,
           ROUND(GREATEST(0.0, 1.0 - (n1 + n2 - m)
                 / ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1)), 6)
             AS unseen_share
    FROM j
""",
        "q184_k_anonymity": """
    WITH base AS (
      SELECT o_orderpriority, EXTRACT(year FROM o_orderdate) AS oyear,
             o_custkey % 500 AS cbucket, o_orderstatus
      FROM orders
    ), cls AS (
      SELECT o_orderpriority, oyear, cbucket, COUNT(*) AS sz,
             COUNT(DISTINCT o_orderstatus) AS n_sens
      FROM base GROUP BY 1, 2, 3
    )
    SELECT CAST(5 AS INTEGER) AS k, SUM(sz) AS n_rows,
           COUNT(*) AS n_classes, MIN(sz) AS min_class_size,
           SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS violating_classes,
           SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS rows_at_risk,
           ROUND(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
                 / SUM(sz), 6) AS risk_share,
           SUM(CASE WHEN sz >= 2 AND n_sens = 1 THEN 1 ELSE 0 END)
             AS homogeneous_classes,
           SUM(CASE WHEN sz >= 2 AND n_sens = 1 THEN sz ELSE 0 END)
             AS rows_exposed
    FROM cls
""",
        "q185_ht_totals": """
    WITH s AS (
      SELECT o_orderpriority AS stratum, o_totalprice AS y,
             CASE WHEN o_orderpriority LIKE '1%' THEN 0.5
                  WHEN o_orderpriority LIKE '2%' THEN 0.4
                  WHEN o_orderpriority LIKE '3%' THEN 0.25
                  WHEN o_orderpriority LIKE '4%' THEN 0.2
                  ELSE 0.1 END AS pi,
             CAST((o_orderkey * 2654435761) % 1000003 AS DOUBLE)
               / 1000003.0 AS u
      FROM orders
    ), samp AS (SELECT * FROM s WHERE u < pi)
    SELECT stratum, COUNT(*) AS n_sampled,
           ROUND(SUM(1.0 / pi), 6) AS ht_count,
           ROUND(SUM(y / pi), 6) AS ht_total,
           ROUND(SQRT(SUM((1.0 - pi) / (pi * pi) * y * y)), 6) AS se
    FROM samp GROUP BY stratum
    UNION ALL
    SELECT '__all__', COUNT(*),
           ROUND(SUM(1.0 / pi), 6), ROUND(SUM(y / pi), 6),
           ROUND(SQRT(SUM((1.0 - pi) / (pi * pi) * y * y)), 6)
    FROM samp
""",
        "q186_benford": """
    WITH vals AS (
      SELECT 's' || CAST(l_suppkey % 25 AS VARCHAR) AS src,
             l_extendedprice AS v
      FROM lineitem WHERE l_extendedprice > 0
    ), digits AS (
      SELECT src,
             CAST(FLOOR(v / POWER(10.0, FLOOR(LOG10(v)))) AS INTEGER) AS d,
             COUNT(*) AS obs
      FROM vals GROUP BY 1, 2
    ), nn AS (SELECT src, SUM(obs) AS n FROM digits GROUP BY src),
    bf AS (SELECT CAST(range AS INTEGER) AS d,
                  LOG10(1.0 + 1.0 / range) AS p
           FROM range(1, 10)),
    grid AS (
      SELECT nn.src, bf.d, bf.p, nn.n, COALESCE(dg.obs, 0) AS obs
      FROM nn CROSS JOIN bf
      LEFT JOIN digits dg ON dg.src = nn.src AND dg.d = bf.d
    ), agg AS (
      SELECT src, MAX(n) AS n,
             ROUND(SUM(POWER(obs - p * n, 2) / (p * n)), 6) AS chi2,
             ROUND(SUM(ABS(CAST(obs AS DOUBLE) / n - p)) / 2.0, 6) AS tvd,
             ROUND(CAST(MAX(obs) AS DOUBLE) / MAX(n), 6) AS top_digit_share
      FROM grid GROUP BY src
    )
    SELECT src, n, chi2, tvd, top_digit_share,
           chi2 > 15.507 AS benford_alarm
    FROM agg
""",
        "q187_gini_budget": """
    WITH units AS (
      SELECT event_type AS family,
             'h' || CAST(user_id % 1000 AS VARCHAR) AS host,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT family, x,
             ROW_NUMBER() OVER (PARTITION BY family ORDER BY x, host) AS i
      FROM units
    )
    SELECT family, COUNT(*) AS n_units, ROUND(SUM(x), 6) AS total,
           ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
           ROUND(SUM(x * x) / (SUM(x) * SUM(x)), 6) AS hhi,
           ROUND(MAX(x) / SUM(x), 6) AS top_share
    FROM ranked GROUP BY family
""",
        "q188_postings_sizing": """
    WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents),
    toks AS (
      SELECT DISTINCT doc_id AS doc, t.term
      FROM d, UNNEST(toks) AS t(term) WHERE t.term <> ''
    ), u AS (SELECT CAST(MAX(doc_id) + 1 AS DOUBLE) AS uu FROM documents),
    g AS (
      SELECT term, doc,
             doc - LAG(doc) OVER (PARTITION BY term ORDER BY doc) AS lg
      FROM toks
    ), g2 AS (SELECT term, COALESCE(lg, doc + 1) AS gap FROM g),
    per AS (
      SELECT term, COUNT(*) AS doc_freq,
             SUM(8 * (CAST(FLOOR(FLOOR(LOG2(GREATEST(gap, 1))) / 7)
                      AS BIGINT) + 1)) AS varint_bits
      FROM g2 GROUP BY term
    ), sized AS (
      SELECT term, doc_freq,
             doc_freq * (2 + GREATEST(0, CAST(CEIL(LOG2(
               (SELECT uu FROM u) / doc_freq)) AS BIGINT))) AS ef_bits,
             varint_bits
      FROM per
    )
    SELECT term, doc_freq, ef_bits, varint_bits,
           CASE WHEN ef_bits <= varint_bits THEN 'ef' ELSE 'varint' END
             AS best,
           ABS(ef_bits - varint_bits) AS bits_saved
    FROM sized
""",
        "q189_cocitation": """
    WITH e AS (
      SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem
    ),
    a1 AS (SELECT src AS z, dst AS n FROM e),
    d1 AS (SELECT z FROM a1 GROUP BY z HAVING COUNT(*) <= 64),
    c1 AS (SELECT a1.z, a1.n FROM a1 JOIN d1 USING (z)),
    co AS (
      SELECT 'cocitation' AS kind, l.n AS a, r.n AS b, COUNT(*) AS n_common
      FROM c1 l JOIN c1 r ON l.z = r.z AND l.n < r.n
      GROUP BY 2, 3 HAVING COUNT(*) >= 2
    ),
    a2 AS (SELECT dst AS z, src AS n FROM e),
    d2 AS (SELECT z FROM a2 GROUP BY z HAVING COUNT(*) <= 64),
    c2 AS (SELECT a2.z, a2.n FROM a2 JOIN d2 USING (z)),
    cp AS (
      SELECT 'coupling' AS kind, l.n AS a, r.n AS b, COUNT(*) AS n_common
      FROM c2 l JOIN c2 r ON l.z = r.z AND l.n < r.n
      GROUP BY 2, 3 HAVING COUNT(*) >= 2
    ),
    u AS (SELECT * FROM co UNION ALL SELECT * FROM cp)
    SELECT kind,
           CASE WHEN kind = 'cocitation' THEN 'p' ELSE 'o' END
             || CAST(a AS VARCHAR) AS a,
           CASE WHEN kind = 'cocitation' THEN 'p' ELSE 'o' END
             || CAST(b AS VARCHAR) AS b,
           n_common
    FROM u
""",
        "q190_ucb1_schedule": """
    WITH log AS (
      SELECT 's' || CAST(o_custkey % 40 AS VARCHAR) AS source,
             CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS r
      FROM orders
    ), arms AS (
      SELECT source, COUNT(*) AS n_pulls, AVG(r) AS m FROM log
      GROUP BY source
    ), t AS (SELECT CAST(SUM(n_pulls) AS DOUBLE) AS nn FROM arms)
    SELECT source, n_pulls, ROUND(m, 6) AS mean_reward,
           ROUND(m + SQRT(2.0 * LN((SELECT nn FROM t)) / n_pulls), 6)
             AS ucb,
           CAST(ROW_NUMBER() OVER (
             ORDER BY m + SQRT(2.0 * LN((SELECT nn FROM t)) / n_pulls)
               DESC, source) AS INTEGER) AS rank
    FROM arms
""",
        "q191_dirichlet_qlm": """
    WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents),
    toks AS (
      SELECT doc_id AS doc, t.term
      FROM d, UNNEST(toks) AS t(term) WHERE t.term <> ''
    ), dl AS (SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc),
    c AS (SELECT CAST(COUNT(*) AS DOUBLE) AS clen FROM toks),
    cf AS (
      SELECT term, COUNT(*) / (SELECT clen FROM c) AS p_c
      FROM toks WHERE term IN ('spark', 'merge', 'vector') GROUP BY term
    ), tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('spark', 'merge', 'vector') GROUP BY doc, term
    ), m AS (
      SELECT tf.doc, COUNT(*) AS n_matched,
             SUM(LN(1.0 + tf / (500.0 * p_c))) AS msum
      FROM tf JOIN cf USING (term) GROUP BY tf.doc
    )
    SELECT m.doc AS doc_id, n_matched,
           ROUND(msum + 3.0 * LN(500.0 / (dl + 500.0)), 6) AS score
    FROM m JOIN dl ON m.doc = dl.doc
    ORDER BY score DESC, doc_id
    LIMIT 12
""",
        "q192_feature_corr": """
    WITH m AS (
      SELECT AVG(CAST(l_quantity AS DOUBLE)) AS m1,
             AVG(CAST(l_extendedprice AS DOUBLE)) AS m2,
             AVG(CAST(l_discount AS DOUBLE)) AS m3,
             AVG(CAST(l_tax AS DOUBLE)) AS m4
      FROM lineitem
    ), s AS (
      SELECT COUNT(*) AS n,
             SUM((l_quantity - m1) * (l_quantity - m1)) AS v1,
             SUM((l_extendedprice - m2) * (l_extendedprice - m2)) AS v2,
             SUM((l_discount - m3) * (l_discount - m3)) AS v3,
             SUM((l_tax - m4) * (l_tax - m4)) AS v4,
             SUM((l_quantity - m1) * (l_extendedprice - m2)) AS x12,
             SUM((l_quantity - m1) * (l_discount - m3)) AS x13,
             SUM((l_quantity - m1) * (l_tax - m4)) AS x14,
             SUM((l_extendedprice - m2) * (l_discount - m3)) AS x23,
             SUM((l_extendedprice - m2) * (l_tax - m4)) AS x24,
             SUM((l_discount - m3) * (l_tax - m4)) AS x34
      FROM lineitem CROSS JOIN m
    )
    SELECT 'l_quantity' AS feat_a, 'l_extendedprice' AS feat_b, n,
           ROUND(x12 / SQRT(v1 * v2), 6) AS r FROM s
    UNION ALL SELECT 'l_quantity', 'l_discount', n,
           ROUND(x13 / SQRT(v1 * v3), 6) FROM s
    UNION ALL SELECT 'l_quantity', 'l_tax', n,
           ROUND(x14 / SQRT(v1 * v4), 6) FROM s
    UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
           ROUND(x23 / SQRT(v2 * v3), 6) FROM s
    UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
           ROUND(x24 / SQRT(v2 * v4), 6) FROM s
    UNION ALL SELECT 'l_discount', 'l_tax', n,
           ROUND(x34 / SQRT(v3 * v4), 6) FROM s
""",
        "q193_kappa": """
    WITH lab AS (
      SELECT o_orderstatus AS la,
             CASE WHEN o_totalprice > 150000 THEN 'F'
                  WHEN o_totalprice > 75000 THEN 'O'
                  ELSE 'P' END AS lb
      FROM orders
    ), cm AS (SELECT la, lb, COUNT(*) AS cnt FROM lab GROUP BY la, lb),
    rm AS (SELECT la, SUM(cnt) AS rm FROM cm GROUP BY la),
    cl AS (SELECT lb AS la, SUM(cnt) AS cl FROM cm GROUP BY lb),
    e AS (SELECT SUM(CAST(rm.rm AS DOUBLE) * cl.cl) AS ee
          FROM rm JOIN cl USING (la)),
    b AS (SELECT SUM(cnt) AS n,
                 CAST(SUM(CASE WHEN la = lb THEN cnt ELSE 0 END) AS DOUBLE)
                   AS diag
          FROM cm)
    SELECT n, ROUND(diag / n, 6) AS p_o,
           ROUND((SELECT ee FROM e) / (CAST(n AS DOUBLE) * n), 6) AS p_e,
           ROUND((diag / n - (SELECT ee FROM e) / (CAST(n AS DOUBLE) * n))
                 / (1.0 - (SELECT ee FROM e) / (CAST(n AS DOUBLE) * n)), 6)
             AS kappa
    FROM b
""",
        "q194_prop_ztest": """
    WITH log AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS g,
             CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS s
      FROM orders
    ), agg AS (
      SELECT SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN g = 'A' THEN s ELSE 0.0 END) AS sa,
             SUM(CASE WHEN g = 'B' THEN s ELSE 0.0 END) AS sb
      FROM log
    ), z AS (
      SELECT n_a, n_b, sa / n_a AS pa, sb / n_b AS pb,
             (sa / n_a - sb / n_b)
               / SQRT((sa + sb) / (n_a + n_b)
                      * (1.0 - (sa + sb) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)) AS zz
      FROM agg
    )
    SELECT 'A' AS group_a, 'B' AS group_b, n_a, n_b,
           ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
           ROUND(zz, 6) AS z,
           ABS(ROUND(zz, 6)) > 1.959964 AS significant
    FROM z
""",
        "q195_mann_whitney": """
    WITH vals AS (
      SELECT CAST(l_quantity AS DOUBLE) AS v,
             SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS nb
      FROM lineitem GROUP BY 1
    ), r AS (
      SELECT v, na, nb, na + nb AS t,
             COALESCE(SUM(na + nb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumt
      FROM vals
    ), a AS (
      SELECT SUM(na) AS n_a, SUM(nb) AS n_b,
             SUM(na * (cumt + (t + 1) / 2.0)) AS ra,
             SUM(CAST(t AS DOUBLE) * t * t - t) AS tie
      FROM r
    ), f AS (
      SELECT n_a, n_b,
             ra - n_a * (n_a + 1.0) / 2.0 AS ua,
             CAST(n_a AS DOUBLE) * n_b / 2.0 AS mu,
             SQRT(CAST(n_a AS DOUBLE) * n_b / 12.0
                  * ((n_a + n_b + 1.0)
                     - tie / (CAST(n_a + n_b AS DOUBLE)
                              * (n_a + n_b - 1.0)))) AS sigma
      FROM a
    )
    SELECT n_a, n_b, ROUND(ua, 6) AS u_a, ROUND(mu, 6) AS mu,
           ROUND(sigma, 6) AS sigma,
           ROUND((ua - mu) / sigma, 6) AS z,
           ABS(ROUND((ua - mu) / sigma, 6)) > 1.959964 AS significant
    FROM f
""",
        "q196_sprt": """
    WITH log AS (
      SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS source, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      FROM events
    ), w AS (
      SELECT source, event_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY event_id)
               AS trial,
             SUM(CASE WHEN y = 1 THEN LN(0.3 / 0.15)
                      ELSE LN((1.0 - 0.3) / (1.0 - 0.15)) END)
               OVER (PARTITION BY source ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS llr
      FROM log
    ), per AS (
      SELECT source, COUNT(*) AS n_trials,
             ROUND(ARG_MAX(llr, trial), 6) AS llr_final,
             MIN(CASE WHEN llr >= LN((1.0 - 0.05) / 0.05)
                      THEN trial END) AS up,
             MIN(CASE WHEN llr <= LN(0.05 / (1.0 - 0.05))
                      THEN trial END) AS dn
      FROM w GROUP BY source
    )
    SELECT source, n_trials, llr_final,
           CASE WHEN up IS NULL AND dn IS NULL THEN 'continue'
                WHEN COALESCE(up, 4611686018427387904)
                     <= COALESCE(dn, 4611686018427387904)
                  THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           CASE WHEN up IS NOT NULL OR dn IS NOT NULL
                THEN LEAST(COALESCE(up, 4611686018427387904),
                           COALESCE(dn, 4611686018427387904)) END
             AS n_at_decision
    FROM per
""",
        "q197_theil_sen": """
    WITH pts AS (
      SELECT 'h' || CAST(user_id % 2000 AS VARCHAR) AS grp,
             CAST(event_id AS DOUBLE) AS x, value AS y
      FROM events
    ), sizes AS (
      SELECT grp, COUNT(*) AS n_points FROM pts GROUP BY grp
      HAVING COUNT(*) BETWEEN 2 AND 512
    ), cap AS (SELECT pts.*, sizes.n_points FROM pts JOIN sizes USING (grp)),
    pr AS (
      SELECT l.grp, l.n_points, (r.y - l.y) / (r.x - l.x) AS m,
             ROW_NUMBER() OVER (PARTITION BY l.grp
                                ORDER BY (r.y - l.y) / (r.x - l.x)) AS rn,
             COUNT(*) OVER (PARTITION BY l.grp) AS n_pairs
      FROM cap l JOIN cap r ON l.grp = r.grp AND l.x < r.x
    ), med AS (
      SELECT grp, n_points, n_pairs, m AS slope FROM pr
      WHERE rn = (n_pairs + 1) // 2
    ), rx AS (
      SELECT grp, x,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS ct
      FROM cap
    ), ry AS (
      SELECT grp, y,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY y) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS ct
      FROM cap
    ), ctr AS (
      SELECT rx.grp, rx.x AS mx, ry.y AS my
      FROM rx JOIN ry ON rx.grp = ry.grp
      WHERE rx.rn = (rx.ct + 1) // 2 AND ry.rn = (ry.ct + 1) // 2
    )
    SELECT med.grp AS host, med.n_points, n_pairs,
           ROUND(slope, 6) + 0.0 AS slope,
           ROUND(my - slope * mx, 6) + 0.0 AS intercept
    FROM med JOIN ctr ON med.grp = ctr.grp
""",
        "q198_kendall_tau": """
    WITH c AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS a,
             CAST(array_length(regexp_split_to_array(trim(text), '\\s+'))
                  AS DOUBLE) AS b
      FROM documents WHERE doc_id < 100
    ), p AS (
      SELECT l.a - r.a AS da, l.b - r.b AS db
      FROM c l JOIN c r ON l.doc_id < r.doc_id
    ), agg AS (
      SELECT COUNT(*) AS n_pairs,
             SUM(CASE WHEN da * db > 0 THEN 1 ELSE 0 END) AS concordant,
             SUM(CASE WHEN da * db < 0 THEN 1 ELSE 0 END) AS discordant,
             SUM(CASE WHEN da = 0 THEN 1 ELSE 0 END) AS ties_a,
             SUM(CASE WHEN db = 0 THEN 1 ELSE 0 END) AS ties_b
      FROM p
    )
    SELECT (SELECT COUNT(*) FROM c) AS n, n_pairs, concordant, discordant,
           ties_a, ties_b,
           ROUND(CAST(concordant - discordant AS DOUBLE)
                 / SQRT(CAST((n_pairs - ties_a) AS DOUBLE)
                        * (n_pairs - ties_b)), 6) AS tau_b
    FROM agg
""",
        "q199_cuped": """
    WITH log AS (
      SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS g,
             CAST(l_extendedprice AS DOUBLE) AS y,
             CAST(l_quantity AS DOUBLE) AS x
      FROM lineitem
    ), m AS (SELECT AVG(y) AS my, AVG(x) AS mx FROM log),
    s AS (
      SELECT SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS n_b,
             SUM((x - mx) * (x - mx)) AS vx,
             SUM((y - my) * (y - my)) AS vy,
             SUM((x - mx) * (y - my)) AS cxy,
             SUM(CASE WHEN g = 'A' THEN y ELSE 0.0 END) AS ya,
             SUM(CASE WHEN g = 'B' THEN y ELSE 0.0 END) AS yb,
             SUM(CASE WHEN g = 'A' THEN x ELSE 0.0 END) AS xa,
             SUM(CASE WHEN g = 'B' THEN x ELSE 0.0 END) AS xb,
             MAX(mx) AS mx
      FROM log CROSS JOIN m
    )
    SELECT 'A' AS group_a, 'B' AS group_b, n_a, n_b,
           ROUND(cxy / vx, 6) AS theta,
           ROUND(ya / n_a - yb / n_b, 6) AS diff_raw,
           ROUND((ya / n_a - (cxy / vx) * (xa / n_a - mx))
                 - (yb / n_b - (cxy / vx) * (xb / n_b - mx)), 6)
             AS diff_adj,
           ROUND((cxy / vx) * (cxy / vx) * vx / vy, 6) AS var_reduction
    FROM s
""",
        "q200_eb_shrinkage": """
    WITH per AS (
      SELECT 'c' || CAST(o_custkey % 200 AS VARCHAR) AS host,
             COUNT(*) AS n,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS s
      FROM orders GROUP BY 1
    ), r AS (SELECT host, n, s, CAST(s AS DOUBLE) / n AS raw FROM per),
    mom AS (SELECT AVG(raw) AS m, VAR_POP(raw) AS v FROM r),
    st AS (
      SELECT m, CASE WHEN v > 0
                     THEN GREATEST(m * (1.0 - m) / v - 1.0, 1.0)
                     ELSE 1e9 END AS k
      FROM mom
    )
    SELECT host, n, s, ROUND(raw, 6) AS raw_rate,
           ROUND((s + (SELECT m * k FROM st))
                 / (n + (SELECT k FROM st)), 6) AS shrunk_rate
    FROM r
""",
        "q180_host_transitions": """
    WITH log AS (
      SELECT user_id, ts, event_id,
             'h' || CAST(event_id % 12 AS VARCHAR) AS host
      FROM events
    ), pairs AS (
      SELECT host AS src,
             lead(host) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS dst
      FROM log
    ), counts AS (
      SELECT src, dst, COUNT(*) AS n_trans
      FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
    ), ranked AS (
      SELECT src, dst, n_trans,
             ROUND(CAST(n_trans AS DOUBLE)
                   / SUM(n_trans) OVER (PARTITION BY src), 6) AS p,
             row_number() OVER (PARTITION BY src
                                ORDER BY n_trans DESC, dst) AS rnk
      FROM counts
    )
    SELECT src, dst, n_trans, p, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
""",
        "q179_bloom_prune_join": """
    WITH probe AS (
      SELECT o_orderpriority AS g,
             'k' || CAST(o_orderkey % 6000 AS VARCHAR) AS key
      FROM orders
    ), build AS (
      SELECT DISTINCT 'k' || CAST((p_partkey * 3) % 6000 AS VARCHAR) AS key
      FROM part
    ), bits AS (
      SELECT DISTINCT pos FROM (
        SELECT CAST('0x' || substr(sha256('rf0|' || key), 1, 15) AS BIGINT)
               % 16384 AS pos FROM build
        UNION
        SELECT CAST('0x' || substr(sha256('rf1|' || key), 1, 15) AS BIGINT)
               % 16384 FROM build)
    ), flagged AS (
      SELECT g, key,
             (EXISTS (SELECT 1 FROM bits WHERE pos =
                CAST('0x' || substr(sha256('rf0|' || probe.key), 1, 15) AS BIGINT) % 16384)
              AND EXISTS (SELECT 1 FROM bits WHERE pos =
                CAST('0x' || substr(sha256('rf1|' || probe.key), 1, 15) AS BIGINT) % 16384))
               AS pass,
             EXISTS (SELECT 1 FROM build b WHERE b.key = probe.key) AS matched
      FROM probe
    )
    SELECT g, COUNT(*) AS n_probe,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
           CAST(SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           CAST(SUM(CASE WHEN pass AND NOT matched THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos
    FROM flagged GROUP BY g
""",
        # q177: the sketch build is exact-k-min by contract (threshold
        # prefilter + fallback), so the oracle is the definitional
        # row_number()<=k window over the portable 60-bit hashes.
        "q177_kmv_setops": """
    WITH base AS (
      SELECT o_orderpriority AS g, o_orderstatus AS st,
             'u' || CAST(o_custkey % 4000 AS VARCHAR) AS item
      FROM orders
    ), da AS (SELECT DISTINCT g, item FROM base WHERE st <> 'O'),
    db AS (SELECT DISTINCT g, item FROM base WHERE st = 'O'),
    ha AS (SELECT DISTINCT g,
             CAST('0x' || substr(sha256(item), 1, 15) AS BIGINT) AS h FROM da),
    hb AS (SELECT DISTINCT g,
             CAST('0x' || substr(sha256(item), 1, 15) AS BIGINT) AS h FROM db),
    ka AS (SELECT g, h FROM (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM ha)
      WHERE rn <= 64),
    kb AS (SELECT g, h FROM (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM hb)
      WHERE rn <= 64),
    uk AS (SELECT g, h FROM (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM (SELECT g, h FROM ka UNION SELECT g, h FROM kb))
      WHERE rn <= 64),
    st AS (SELECT g, COUNT(*) AS n_eff, MAX(h) AS kth FROM uk GROUP BY g),
    mi AS (SELECT uk.g, COUNT(*) AS m FROM uk
           JOIN ka ON uk.g = ka.g AND uk.h = ka.h
           JOIN kb ON uk.g = kb.g AND uk.h = kb.h
           GROUP BY uk.g),
    ma AS (SELECT uk.g, COUNT(*) AS m FROM uk
           JOIN ka ON uk.g = ka.g AND uk.h = ka.h
           WHERE NOT EXISTS (SELECT 1 FROM kb
                             WHERE kb.g = uk.g AND kb.h = uk.h)
           GROUP BY uk.g),
    eu AS (SELECT g, n_eff,
             CASE WHEN n_eff < 64 THEN CAST(n_eff AS DOUBLE)
                  ELSE 63.0 / (CAST(kth AS DOUBLE) / 1152921504606846976.0)
             END AS est_u
           FROM st),
    xu AS (SELECT g, COUNT(*) AS exact_union FROM
             (SELECT g, item FROM da UNION SELECT g, item FROM db)
           GROUP BY g),
    xi AS (SELECT da.g, COUNT(*) AS exact_intersect
           FROM da JOIN db USING (g, item) GROUP BY da.g)
    SELECT eu.g, CAST(eu.n_eff AS INTEGER) AS n_eff,
           CAST(ROUND(eu.est_u, 0) AS BIGINT) AS est_union,
           CAST(ROUND(CAST(COALESCE(mi.m, 0) AS DOUBLE)
                      / eu.n_eff * eu.est_u, 0) AS BIGINT) AS est_intersect,
           CAST(ROUND(CAST(COALESCE(ma.m, 0) AS DOUBLE)
                      / eu.n_eff * eu.est_u, 0) AS BIGINT) AS est_a_only,
           xu.exact_union, xi.exact_intersect
    FROM eu LEFT JOIN mi ON eu.g = mi.g
            LEFT JOIN ma ON eu.g = ma.g
            JOIN xu ON eu.g = xu.g
            JOIN xi ON eu.g = xi.g
""",
        "q61_budget_allocation": _pagerank_cte(iters=5, damping=0.85) + """
            SELECT node AS host,
                   CAST(least(greatest(
                     CAST(floor(10000 * r / (SELECT SUM(r) FROM r5)) AS INTEGER),
                     5), 500) AS INTEGER) AS budget_per_batch
            FROM r5
        """,
        "q62_redirect_resolve": """
            WITH RECURSIVE redirects AS (
              SELECT CAST(p_partkey AS BIGINT) AS src,
                     CAST(p_partkey + 1 AS BIGINT) AS dst
              FROM part WHERE p_partkey % 8 < 5
              UNION ALL SELECT 10000001, 10000002
              UNION ALL SELECT 10000002, 10000001
            ), heads AS (
              SELECT DISTINCT src FROM redirects
            ), walk(src, cur, hops) AS (
              SELECT src, dst, CAST(1 AS BIGINT) FROM redirects
              UNION ALL
              SELECT w.src, r.dst, w.hops + 1
              FROM walk w JOIN redirects r ON r.src = w.cur
              WHERE w.hops < 8
            ), last AS (
              SELECT src, cur, hops,
                     ROW_NUMBER() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
              FROM walk
            )
            SELECT l.src, l.cur AS final, l.hops,
                   (h.src IS NULL) AS resolved
            FROM last l LEFT JOIN heads h ON l.cur = h.src
            WHERE l.rn = 1
        """,
        "q53_tfidf_topterms": """
            WITH terms AS (
              SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
            ), dfq AS (
              SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM tf GROUP BY term
            ), nn AS (
              SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents
            ), scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     ROUND(tf.tf * (ln((1.0 + (SELECT n FROM nn)) / (1.0 + dfq.dfreq)) + 1.0), 6) AS score
              FROM tf JOIN dfq ON tf.term = dfq.term
            )
            SELECT doc_id, term, tf, score, term_rank FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC) AS term_rank
              FROM scored
            ) WHERE term_rank <= 3
        """,
        "q54_stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST('0x' || substr(sha256('smp1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                  % 10000
                  < CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END
        """,
        "q55_reservoir_sample": """
            SELECT doc_id, source, sample_rank FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY CAST('0x' || substr(sha256('rsv|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
                                doc_id ASC) AS sample_rank
              FROM documents
            ) WHERE sample_rank <= 5
        """,
        "q56_recrawl_priority": """
            WITH log AS (
              SELECT user_id AS url_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS e,
                     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS chg
              FROM events
            ), agg AS (
              SELECT url_id, COUNT(*) AS n_visits, CAST(SUM(chg) AS BIGINT) AS n_changes,
                     MIN(e) AS f, MAX(e) AS l
              FROM log GROUP BY url_id HAVING COUNT(*) >= 2
            ), nw AS (
              SELECT MAX(e) + 3600 AS now FROM log
            ), calc AS (
              SELECT url_id, n_visits, n_changes,
                     greatest(CAST(l - f AS DOUBLE) / (n_visits - 1), 1.0) AS itv,
                     CAST((SELECT now FROM nw) - l AS DOUBLE) AS age
              FROM agg
            )
            SELECT url_id, n_visits, n_changes,
                   ROUND(-ln((n_visits - n_changes + 0.5) / (n_visits + 0.5)) / itv * 86400.0, 6) AS lambda_day,
                   ROUND(1.0 - exp(ln((n_visits - n_changes + 0.5) / (n_visits + 0.5)) / itv * age), 6) AS p_changed
            FROM calc
        """,
        "q57_trap_detect": """
            WITH urls AS (
              SELECT 'https://h' || CAST(o_custkey % 20 AS VARCHAR) || '.example.mil/p/'
                     || CAST(o_orderkey % 40 AS VARCHAR)
                     || CASE WHEN o_custkey % 20 = 7
                             THEN '?session=' || CAST(o_orderkey AS VARCHAR)
                             WHEN o_orderkey % 3 = 0
                             THEN '?page=' || CAST(o_orderkey % 2 AS VARCHAR)
                             ELSE '' END AS url
              FROM orders
            ), parsed AS (
              SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                     url,
                     regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
                     CASE WHEN contains(url, '?') THEN 1 ELSE 0 END AS q
              FROM urls
            ), per_host AS (
              SELECT host,
                     COUNT(DISTINCT url) AS n_urls,
                     COUNT(DISTINCT path) AS n_paths,
                     ROUND(AVG(q), 6) AS query_frac
              FROM parsed GROUP BY host
            )
            SELECT host, n_urls, n_paths,
                   ROUND(CAST(n_urls AS DOUBLE) / greatest(n_paths, 1), 6) AS urls_per_path,
                   query_frac,
                   (n_urls >= 20 AND CAST(n_urls AS DOUBLE) / greatest(n_paths, 1) > 5.0) AS is_trap
            FROM per_host
        """,
        "q58_skew_profile": """
            WITH f AS (
              SELECT 'h' || CAST(CASE WHEN event_id % 2 = 0 THEN 0
                                      ELSE user_id % 16 END AS VARCHAR) AS key
              FROM events
            ), counts AS (
              SELECT key, COUNT(*) AS n_rows FROM f GROUP BY key
            ), total AS (
              SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM f
            )
            SELECT key, n_rows,
                   ROUND(n_rows / (SELECT t FROM total), 6) AS frac_of_total,
                   CAST(least(greatest(CAST(ceil(CAST(n_rows AS DOUBLE) / 500) AS INTEGER), 1), 8) AS INTEGER) AS salt_buckets
            FROM counts
        """,
        "q63_crawl_delay_budget": """
            WITH r AS (
              SELECT 'n' || CAST(n_nationkey AS VARCHAR) || '.example.mil' AS host,
                     'User-agent: googlebot' || chr(10) || 'Crawl-delay: 99' || chr(10)
                     || 'Disallow: /g/' || chr(10)
                     || 'User-agent: *' || chr(10) || 'Disallow: /p/' || chr(10)
                     || CASE WHEN n_nationkey % 3 = 0
                             THEN 'Crawl-delay: ' || CAST(0.5 + (n_nationkey % 4) AS VARCHAR) || chr(10)
                             ELSE '' END
                     || CASE WHEN n_nationkey % 6 = 0
                             THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 30' || chr(10)
                             ELSE '' END AS body
              FROM nation
            ), lines AS (
              SELECT host,
                     UNNEST(string_split_regex(body, chr(13) || '?' || chr(10))) AS l,
                     generate_subscripts(string_split_regex(body, chr(13) || '?' || chr(10)), 1) AS i
              FROM r
            ), marked AS (
              SELECT host, i,
                     regexp_extract(l, '(?i)^\\s*user-agent\\s*:\\s*(\\S+)', 1) AS ua,
                     regexp_extract(l, '(?i)^\\s*crawl-delay\\s*:\\s*([0-9.]+)', 1) AS cd
              FROM lines
            ), grp AS (
              SELECT host, i, ua, cd,
                     SUM(CASE WHEN ua <> '' AND NOT prev_ua THEN 1 ELSE 0 END)
                         OVER (PARTITION BY host ORDER BY i) AS gid
              FROM (
                  SELECT *, COALESCE(LAG(ua <> '') OVER (PARTITION BY host ORDER BY i), FALSE) AS prev_ua
                  FROM marked
              )
            ), active AS (
              SELECT host, gid, bool_or(ua = '*') AS act
              FROM grp WHERE ua <> '' GROUP BY host, gid
            ), firstcd AS (
              SELECT host, CAST(cd AS DOUBLE) AS crawl_delay FROM (
                SELECT g.host, g.cd,
                       ROW_NUMBER() OVER (PARTITION BY g.host ORDER BY g.i) AS rn
                FROM grp g JOIN active a ON a.host = g.host AND a.gid = g.gid
                WHERE g.ua = '' AND g.cd <> '' AND a.act
              ) WHERE rn = 1
            )
            SELECT h.host, f.crawl_delay,
                   CAST(least(greatest(
                     CAST(floor(60.0 / COALESCE(f.crawl_delay, 1.0)) AS INTEGER),
                     1), 100) AS INTEGER) AS budget_per_batch
            FROM (SELECT DISTINCT host FROM r) h
            LEFT JOIN firstcd f ON h.host = f.host
        """,
        "q64_inverted_index": """
            WITH toks AS (
              SELECT doc_id,
                     UNNEST(string_split_regex(trim(text), '\\s+')) AS term,
                     generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) - 1 AS pos
              FROM documents
            ), perdoc AS (
              SELECT term, doc_id, list_sort(list(pos)) AS plist
              FROM toks GROUP BY term, doc_id
            )
            SELECT term, COUNT(*) AS doc_freq,
                   string_agg(CAST(doc_id AS VARCHAR) || ':' || array_to_string(plist, '|'),
                              ',' ORDER BY doc_id) AS postings
            FROM perdoc GROUP BY term
        """,
        "q65_bigram_pmi": """
            WITH toks AS (
              SELECT UNNEST(string_split_regex(trim(text), '\\s+')) AS w FROM documents
            ), uni AS (
              SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY w
            ), tu AS (
              SELECT SUM(c) AS tu FROM uni
            ), grams AS (
              SELECT UNNEST(list_transform(
                       range(1, greatest(len(t) - 1, 1) + 1),
                       i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
              FROM (SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents)
            ), big AS (
              SELECT g, CAST(COUNT(*) AS DOUBLE) AS n FROM grams GROUP BY g
            ), tb AS (
              SELECT SUM(n) AS tb FROM big
            ), cand AS (
              SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2, n
              FROM big WHERE n >= 5
            )
            SELECT w1, w2, CAST(n AS BIGINT) AS n,
                   ROUND(ln((n / (SELECT tb FROM tb))
                         / ((u1.c / (SELECT tu FROM tu)) * (u2.c / (SELECT tu FROM tu)))), 6) AS pmi
            FROM cand JOIN uni u1 ON cand.w1 = u1.w JOIN uni u2 ON cand.w2 = u2.w
        """,
        "q66_cdc_chunks": """
            WITH b AS (
              SELECT doc_id, text, len(text) AS n,
                     list_filter(
                       range(2, greatest(len(text) - 7, 2) + 1),
                       i -> i <= len(text) - 7
                            AND CAST('0x' || substr(sha256(substr(text, i, 8)), 1, 15) AS BIGINT) % 32 = 0
                     ) AS bnds
              FROM documents
            ), c AS (
              SELECT doc_id, text,
                     list_concat(list_concat([1], bnds), [n + 1]) AS cuts
              FROM b
            )
            SELECT doc_id,
                   CAST(len(cuts) - 1 AS INTEGER) AS n_chunks,
                   array_to_string(list_transform(range(1, len(cuts)), j ->
                     CAST(CAST('0x' || substr(sha256(substr(text, cuts[j], cuts[j + 1] - cuts[j])), 1, 15) AS BIGINT) AS VARCHAR)
                   ), ',') AS chunk_shas
            FROM c
        """,
        "q67_length_buckets": """
            WITH cuts AS (
              SELECT quantile_cont(n_chars, 0.25) AS q0,
                     quantile_cont(n_chars, 0.5) AS q1,
                     quantile_cont(n_chars, 0.75) AS q2
              FROM documents
            )
            SELECT doc_id, n_chars,
                   1 + CAST(n_chars > (SELECT q0 FROM cuts) AS INTEGER)
                     + CAST(n_chars > (SELECT q1 FROM cuts) AS INTEGER)
                     + CAST(n_chars > (SELECT q2 FROM cuts) AS INTEGER) AS bucket
            FROM documents
        """,
        "q46_repetition_flags": """
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, toks,
                     list_transform(
                       range(1, greatest(len(toks) - 1, 1) + 1),
                       i -> array_to_string(list_slice(toks, i, i + 1), ' ')
                     ) AS bg
              FROM t
            ), m AS (
              SELECT doc_id,
                     ROUND(CAST(list_max(list_transform(list_distinct(bg),
                               d -> len(list_filter(bg, x -> x = d)))) AS DOUBLE)
                           / len(bg), 6) AS top_bigram_frac,
                     ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                           / len(toks), 6) AS dup_word_frac
              FROM g
            )
            SELECT doc_id, top_bigram_frac, dup_word_frac,
                   (top_bigram_frac > 0.2 OR dup_word_frac > 0.9) AS flagged
            FROM m
        """,
        "q47_pii_redact": """
            WITH p AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 7 = 0
                             THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.mil'
                             ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                             THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                             ELSE '' END AS t
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(t,
                     '\\b\\d{3}-\\d{4}\\b')) AS INTEGER) AS n_phones,
                   sha256(regexp_replace(
                       regexp_replace(t,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) AS redacted_sha
            FROM p
        """,
        "q48_decontaminate": """
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(trim(
                       text || CASE WHEN doc_id % 97 = 0 OR doc_id % 41 = 3
                                    THEN ' alpha bravo charlie delta echo'
                                    ELSE '' END), '\\s+') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - 4, 1) + 1),
                       i -> array_to_string(list_slice(toks, i, i + 4), ' ')
                     )) AS grams
              FROM t
            ), bench AS (
              SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
            ), corpus AS (
              SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0
            )
            SELECT c.doc_id, COUNT(*) AS n_overlapping_ngrams
            FROM corpus c JOIN bench b USING (gram)
            GROUP BY c.doc_id
        """,
        "q44_salted_distinct": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "q43_sitemap_stale": """
            SELECT 'https://x.mil/doc/' || CAST(p_partkey AS VARCHAR) AS url,
                   CASE WHEN p_partkey % 7 <> 0 THEN
                        CASE WHEN p_partkey % 3 = 0 THEN '2024-02-01'
                             ELSE '2023-01-01' END END AS lastmod,
                   CASE WHEN p_partkey % 5 = 0 THEN 'new'
                        WHEN p_partkey % 7 <> 0 AND p_partkey % 3 = 0 THEN 'updated'
                   END AS reason
            FROM part
            WHERE p_partkey % 5 = 0 OR (p_partkey % 7 <> 0 AND p_partkey % 3 = 0)
        """,
        "q42_robots_parse": r"""
            WITH r AS (
              SELECT lower(regexp_replace(n_name, '[^A-Za-z]', '', 'g')) || '.example.mil' AS host,
                     'User-agent: googlebot' || chr(10) || 'Disallow: /g/' || chr(10)
                     || 'User-agent: *' || chr(10) || 'Disallow: /p' || CAST(n_nationkey AS VARCHAR)
                     || '/' || chr(10) || 'Disallow:' || chr(10)
                     || CASE WHEN n_nationkey % 2 = 1
                             THEN 'User-agent: badbot' || chr(10) || 'User-agent: *' || chr(10)
                                  || 'Disallow: /extra/   # comment' || chr(10)
                             ELSE '' END AS body
              FROM nation
            ), lines AS (
              SELECT host,
                     UNNEST(string_split_regex(body, chr(13) || '?' || chr(10))) AS l,
                     generate_subscripts(string_split_regex(body, chr(13) || '?' || chr(10)), 1) AS i
              FROM r
            ), marked AS (
              SELECT host, i,
                     regexp_extract(l, '(?i)^\s*user-agent\s*:\s*(\S+)', 1) AS ua,
                     regexp_extract(l, '(?i)^\s*disallow\s*:\s*([^#\s]+)', 1) AS dis
              FROM lines
            ), grp AS (
              SELECT host, i, ua, dis,
                     SUM(CASE WHEN ua <> '' AND NOT prev_ua THEN 1 ELSE 0 END)
                         OVER (PARTITION BY host ORDER BY i) AS gid
              FROM (
                  SELECT *, COALESCE(LAG(ua <> '') OVER (PARTITION BY host ORDER BY i), FALSE) AS prev_ua
                  FROM marked
              )
            ), active AS (
              SELECT host, gid, bool_or(ua = '*') AS act
              FROM grp WHERE ua <> '' GROUP BY host, gid
            )
            SELECT DISTINCT g.host, g.dis AS disallow
            FROM grp g JOIN active a ON a.host = g.host AND a.gid = g.gid
            WHERE g.ua = '' AND g.dis <> '' AND a.act
        """,
        "q40_windowed_rate": """
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
                   event_type, COUNT(*) AS n,
                   ROUND(AVG(value), 6) AS avg_value
            FROM events
            GROUP BY 1, 2
        """,
        "q41_sessionize": """
            SELECT event_id, user_id,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM (
                SELECT event_id, user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) > INTERVAL 30 MINUTE
                            OR LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id
                            ) IS NULL
                            THEN 1 ELSE 0 END AS is_new
                FROM events
            )
        """,
        "q37_rolling_hash": r"""
            SELECT doc_id,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(text) + 1),
                           i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
                       (a, c) -> (a * 257 + c) % 2147483647) AS rolling_hash
            FROM documents
        """,
        "q38_bpe_tokens": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS n_bpe_tokens,
                   CAST(len(list_distinct(regexp_extract_all(text, '\w+|[^\w\s]'))) AS INT)
                       AS n_distinct_tokens
            FROM documents
        """,
        "q34_pending_join": """
            SELECT p_partkey,
                   'https://x.mil/files/f' || CAST(p_partkey AS VARCHAR)
                       || CASE WHEN p_partkey % 2 = 0 THEN '.pdf' ELSE '.zip' END
                       AS download_url,
                   CASE WHEN p_partkey % 2 = 0 THEN 'pdf' ELSE 'zip' END AS picked_type,
                   'part-' || CAST(p_partkey AS VARCHAR) AS hash_doc_name,
                   'https://x.mil/files/f' || CAST(p_partkey AS VARCHAR)
                       || CASE WHEN p_partkey % 2 = 0 THEN '.pdf' ELSE '.zip' END
                       AS hash_href
            FROM part WHERE p_partkey % 3 <> 0
        """,
        "q35_validate_split": """
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'missing required field: doc_name'
                        WHEN o_orderkey % 13 = 0 THEN 'missing required field: version_hash'
                        WHEN o_orderkey % 11 = 0 THEN 'invalid source_page_url'
                   END AS reason
            FROM orders
            WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 = 0 OR o_orderkey % 11 = 0
        """,
        "q33_jaccard_pairs": "WITH " + _JACCARD_PAIRS_BODY + """
            SELECT a, b, jaccard FROM jpairs
        """,
        "q59_lm_xent": """
            WITH terms AS (
              SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS term
              FROM documents
            ), tot AS (
              SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM terms
            ), lm AS (
              SELECT term, CAST(COUNT(*) AS DOUBLE) / (SELECT t FROM tot) AS p
              FROM terms GROUP BY term
            )
            SELECT terms.doc_id, COUNT(*) AS n_tokens,
                   ROUND(-AVG(ln(p)), 6) AS xent
            FROM terms JOIN lm ON terms.term = lm.term
            GROUP BY terms.doc_id
        """,
        "q60_canonical_docs": "WITH RECURSIVE " + _JACCARD_PAIRS_BODY + """,
            edges AS (
                SELECT a AS src, b AS dst FROM jpairs
                UNION
                SELECT b, a FROM jpairs
            ),
            walk(iter, node, label) AS (
                SELECT 0, src, src FROM (SELECT DISTINCT src FROM edges)
                UNION ALL
                SELECT w.iter + 1, e.dst, w.label
                FROM walk w JOIN edges e ON e.src = w.node
                WHERE w.iter < 3
            ),
            clusters AS (
                SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node
            ),
            qual AS (SELECT doc_id, len(text) AS quality FROM un)
            SELECT c.doc_id, c.cluster_id,
                   (ROW_NUMBER() OVER (
                      PARTITION BY c.cluster_id
                      ORDER BY q.quality DESC, c.doc_id ASC) = 1) AS keep
            FROM clusters c JOIN qual q ON c.doc_id = q.doc_id
        """,
        "q36_dup_clusters": "WITH RECURSIVE " + _JACCARD_PAIRS_BODY + """,
            edges AS (
                SELECT a AS src, b AS dst FROM jpairs
                UNION
                SELECT b, a FROM jpairs
            ),
            walk(iter, node, label) AS (
                SELECT 0, src, src FROM (SELECT DISTINCT src FROM edges)
                UNION ALL
                SELECT w.iter + 1, e.dst, w.label
                FROM walk w JOIN edges e ON e.src = w.node
                WHERE w.iter < 3
            )
            SELECT node AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY node
        """,
        "q201_opic": _opic_oracle(iters=5),
        "q202_maxscore_topk": r"""
    WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents),
    len AS (SELECT doc_id, array_length(toks) AS dl FROM d),
    stats AS (SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n FROM len),
    post AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM d, UNNEST(toks) AS t(term)
      WHERE term IN ('spark', 'data', 'merge')
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM post GROUP BY term),
    contrib AS (
      SELECT p.doc_id, p.term,
             ROUND(ln(1.0 + (s.n - f.dfreq + 0.5) / (f.dfreq + 0.5))
                   * p.tf * 2.2
                   / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6) AS c
      FROM post p JOIN dfq f USING (term) JOIN len l USING (doc_id)
      CROSS JOIN stats s
    ),
    ubt AS (SELECT term, MAX(c) AS ub FROM contrib GROUP BY term),
    ubd AS (
      SELECT c.doc_id, ROUND(SUM(u.ub), 6) AS ubd
      FROM contrib c JOIN ubt u USING (term) GROUP BY c.doc_id
    ),
    exact AS (SELECT doc_id, ROUND(SUM(c), 6) AS score FROM contrib GROUP BY doc_id),
    seed AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY ubd DESC, doc_id ASC) AS r
        FROM ubd
      ) WHERE r <= 10
    ),
    theta AS (SELECT MIN(e.score) AS th FROM seed s JOIN exact e USING (doc_id)),
    surv AS (SELECT doc_id FROM ubd WHERE ubd >= (SELECT th FROM theta)),
    nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_matched FROM ubd),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_scored FROM surv),
    fin AS (
      SELECT s.doc_id, e.score,
             row_number() OVER (ORDER BY e.score DESC, s.doc_id ASC) AS rank
      FROM surv s JOIN exact e USING (doc_id)
    )
    SELECT doc_id, score, CAST(rank AS INTEGER) AS rank,
           (SELECT n_matched FROM nm) AS n_matched,
           (SELECT n_scored FROM ns) AS n_scored
    FROM fin WHERE rank <= 10
""",
        "q203_holt_forecast": """
    WITH RECURSIVE src AS (
      SELECT user_id % 16 AS host, event_id AS t, CAST(value AS DOUBLE) AS y
      FROM events WHERE event_id < 8000
    ), ord AS (
      SELECT host, y,
             row_number() OVER (PARTITION BY host ORDER BY t, y) AS rn,
             COUNT(*) OVER (PARTITION BY host) AS n
      FROM src
    ), rec AS (
      SELECT host, rn, n, y AS l, CAST(0 AS DOUBLE) AS b,
             CAST(0 AS DOUBLE) AS sae
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.host, o.rn, o.n,
             0.5 * o.y + 0.5 * (r.l + r.b) AS l,
             0.3 * ((0.5 * o.y + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b AS b,
             r.sae + ABS(o.y - (r.l + r.b)) AS sae
      FROM rec r JOIN ord o ON o.host = r.host AND o.rn = r.rn + 1
    )
    SELECT host, n, ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
           ROUND(l + 3.0 * b, 6) AS forecast,
           CASE WHEN n > 1 THEN ROUND(sae / (n - 1), 6) END AS mae
    FROM rec WHERE rn = n
""",
        "q204_dp_release": """
    WITH counts AS (
      SELECT 'host-' || CAST(user_id % 25 AS VARCHAR) AS "group",
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ), u AS (
      SELECT "group", n,
             ((CAST('0x' || substr(sha256('r5-census|' || "group"), 1, 15)
                    AS BIGINT) % 1000000) + 0.5) / 1000000.0 AS u
      FROM counts
    )
    SELECT "group",
           GREATEST(0, CAST(ROUND(
             n + (-1.25) * (CASE WHEN u < 0.5 THEN -1.0
                                 WHEN u > 0.5 THEN 1.0
                                 ELSE 0.0 END)
                 * ln(1.0 - 2.0 * ABS(u - 0.5)), 0) AS BIGINT)) AS released,
           CAST(0.8 AS DOUBLE) AS epsilon,
           CAST(1.25 AS DOUBLE) AS scale
    FROM u
""",
        "q205_ks_test": """
    WITH e AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
      WHERE event_type IN ('click', 'view')
    ), vals AS (
      SELECT v,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
      FROM e GROUP BY v
    ), tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM vals),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
             SUM(cb) OVER (ORDER BY v) AS cum_b
      FROM vals
    ), dmax AS (
      SELECT MAX(ABS(CAST(cum_a AS DOUBLE) / (SELECT n_a FROM tot)
                     - CAST(cum_b AS DOUBLE) / (SELECT n_b FROM tot))) AS d
      FROM cum
    ), f AS (
      SELECT (SELECT n_a FROM tot) AS n_a, (SELECT n_b FROM tot) AS n_b,
             ROUND(d, 6) AS d_stat,
             SQRT(CAST((SELECT n_a FROM tot) AS DOUBLE)
                  * (SELECT n_b FROM tot)
                  / ((SELECT n_a FROM tot) + (SELECT n_b FROM tot))) AS en
      FROM dmax
    ), lamt AS (
      SELECT n_a, n_b, d_stat,
             (SQRT(en) + 0.12 + 0.11 / SQRT(en)) * d_stat AS lam
      FROM f
    )
    SELECT n_a, n_b, d_stat,
           ROUND(LEAST(1.0, GREATEST(0.0,
             0.0 + 2.0 * EXP(-2.0 * lam * lam)
                 - 2.0 * EXP(-8.0 * lam * lam)
                 + 2.0 * EXP(-18.0 * lam * lam)
                 - 2.0 * EXP(-32.0 * lam * lam)
                 + 2.0 * EXP(-50.0 * lam * lam))), 6) AS p_value
    FROM lamt
""",
        "q206_chi_squared": """
    WITH cells AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c,
             CAST(COUNT(*) AS DOUBLE) AS o
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1, 2
    ),
    rm AS (SELECT r, SUM(o) AS rt FROM cells GROUP BY r),
    cm AS (SELECT c, SUM(o) AS ct FROM cells GROUP BY c),
    nn AS (
      SELECT SUM(o) AS n, COUNT(DISTINCT r) AS n_rows,
             COUNT(DISTINCT c) AS n_cols
      FROM cells
    ),
    j AS (
      SELECT nn.n, nn.n_rows, nn.n_cols, rm.rt * cm.ct / nn.n AS e, cells.o
      FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN nn
    ),
    a AS (
      SELECT MAX(n) AS n, MAX(n_rows) AS n_rows, MAX(n_cols) AS n_cols,
             SUM((o - e) * (o - e) / e) AS chi_obs, SUM(e) AS e_obs
      FROM j
    ),
    f AS (
      SELECT n, n_rows, n_cols,
             (n_rows - 1) * (n_cols - 1) AS dof,
             chi_obs + (n - e_obs) AS chi2
      FROM a
    )
    SELECT CAST(n AS BIGINT) AS n, n_rows, n_cols, dof,
           ROUND(chi2, 6) AS chi2,
           CASE WHEN dof > 0 THEN ROUND(SQRT(chi2
             / (n * CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE))), 6)
           END AS cramers_v,
           CASE WHEN dof > 0 THEN ROUND(
             (POW(chi2 / CAST(dof AS DOUBLE), 1.0 / 3.0)
              - (1.0 - 2.0 / (9.0 * CAST(dof AS DOUBLE))))
             / SQRT(2.0 / (9.0 * CAST(dof AS DOUBLE))), 6)
           END AS z_wh
    FROM f
""",
        "q207_acf": """
    WITH src AS (
      SELECT user_id % 8 AS host, event_id AS t, CAST(value AS DOUBLE) AS y
      FROM events WHERE event_id < 8000
    ),
    m AS (SELECT host, AVG(y) AS mean FROM src GROUP BY host),
    ss AS (
      SELECT s.host, SUM((y - mean) * (y - mean)) AS ss
      FROM src s JOIN m USING (host) GROUP BY s.host
    ),
    lagd AS (
      SELECT host, y,
             lag(y, 1) OVER w AS yl1,
             lag(y, 2) OVER w AS yl2,
             lag(y, 7) OVER w AS yl7
      FROM src WINDOW w AS (PARTITION BY host ORDER BY t)
    ),
    pairs AS (
      SELECT host, y, 1 AS lg, yl1 AS yp FROM lagd
      UNION ALL SELECT host, y, 2, yl2 FROM lagd
      UNION ALL SELECT host, y, 7, yl7 FROM lagd
    ),
    num AS (
      SELECT p.host, p.lg, SUM((p.y - m.mean) * (p.yp - m.mean)) AS num,
             COUNT(*) AS n_pairs
      FROM pairs p JOIN m USING (host)
      WHERE p.yp IS NOT NULL GROUP BY p.host, p.lg
    )
    SELECT n.host, n.lg AS "lag", n.n_pairs,
           CASE WHEN s.ss > 0 THEN ROUND(n.num / s.ss, 6) END AS r
    FROM num n JOIN ss s USING (host)
""",
        "q208_salsa": _salsa_oracle(iters=5),
        "q209_rm3_topk": r"""
    WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents),
    len AS (SELECT doc_id, array_length(toks) AS dl FROM d),
    stats AS (SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n FROM len),
    post1 AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM d, UNNEST(toks) AS t(term)
      WHERE term IN ('spark', 'data', 'merge')
      GROUP BY doc_id, term
    ),
    dfq1 AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM post1 GROUP BY term),
    c1 AS (
      SELECT p.doc_id,
             ROUND(ln(1.0 + (s.n - f.dfreq + 0.5) / (f.dfreq + 0.5))
                   * p.tf * 2.2
                   / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6) AS c
      FROM post1 p JOIN dfq1 f USING (term) JOIN len l USING (doc_id)
      CROSS JOIN stats s
    ),
    s1 AS (SELECT doc_id, ROUND(SUM(c), 6) AS s FROM c1 GROUP BY doc_id),
    fb AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
        FROM s1
      ) WHERE r <= 5
    ),
    fcnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS f FROM fb),
    fb_post AS (
      SELECT d.doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM d JOIN fb USING (doc_id), UNNEST(d.toks) AS t(term)
      GROUP BY d.doc_id, term
    ),
    rm AS (
      SELECT term,
             ROUND(0.5 * SUM(fp.tf / l.dl) / (SELECT f FROM fcnt), 6) AS rmw
      FROM fb_post fp JOIN len l USING (doc_id) GROUP BY term
    ),
    newt AS (
      SELECT term, rmw AS w FROM (
        SELECT term, rmw,
               row_number() OVER (ORDER BY rmw DESC, term ASC) AS r
        FROM rm WHERE term NOT IN ('spark', 'data', 'merge')
      ) WHERE r <= 3
    ),
    origt AS (
      SELECT term, ROUND(rmw + 0.166667, 6) AS w FROM rm
      WHERE term IN ('spark', 'data', 'merge')
      UNION ALL
      SELECT q.term, 0.166667 AS w
      FROM (VALUES ('spark'), ('data'), ('merge')) q(term)
      WHERE q.term NOT IN (SELECT term FROM rm)
    ),
    terms AS (SELECT * FROM origt UNION ALL SELECT * FROM newt),
    nt AS (SELECT COUNT(*) AS n_terms FROM terms),
    post2 AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM d, UNNEST(toks) AS t(term)
      WHERE term IN (SELECT term FROM terms)
      GROUP BY doc_id, term
    ),
    dfq2 AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM post2 GROUP BY term),
    c2 AS (
      SELECT p.doc_id, t.w,
             ROUND(ln(1.0 + (s.n - f2.dfreq + 0.5) / (f2.dfreq + 0.5))
                   * p.tf * 2.2
                   / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6) AS c
      FROM post2 p JOIN dfq2 f2 USING (term) JOIN len l USING (doc_id)
      CROSS JOIN stats s JOIN terms t USING (term)
    ),
    s2 AS (SELECT doc_id, ROUND(SUM(w * c), 6) AS score FROM c2 GROUP BY doc_id),
    fin AS (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
      FROM s2
    )
    SELECT doc_id, score, CAST(rank AS INTEGER) AS rank,
           (SELECT n_terms FROM nt) AS n_terms
    FROM fin WHERE rank <= 10
""",
        "q210_welch_ttest": """
    WITH e AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
      WHERE event_type IN ('click', 'view')
    ),
    m AS (SELECT g, AVG(v) AS m, COUNT(*) AS n FROM e GROUP BY g),
    c AS (
      SELECT e.g, SUM((v - m.m) * (v - m.m)) AS ssd
      FROM e JOIN m ON e.g = m.g GROUP BY e.g
    ),
    st AS (
      SELECT m.g, m.n, m.m, c.ssd / CAST(m.n - 1 AS DOUBLE) AS s2
      FROM m JOIN c ON m.g = c.g
    ),
    a AS (SELECT n AS n_a, m AS ma, s2 AS va FROM st WHERE g = 'click'),
    b AS (SELECT n AS n_b, m AS mb, s2 AS vb FROM st WHERE g = 'view'),
    j AS (
      SELECT *, va / CAST(n_a AS DOUBLE) AS sa, vb / CAST(n_b AS DOUBLE) AS sb
      FROM a CROSS JOIN b
    )
    SELECT n_a, n_b, ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           ROUND((ma - mb) / SQRT(sa + sb), 6) AS t,
           ROUND((sa + sb) * (sa + sb)
                 / (sa * sa / CAST(n_a - 1 AS DOUBLE)
                    + sb * sb / CAST(n_b - 1 AS DOUBLE)), 6) AS df_welch,
           ABS(ROUND((ma - mb) / SQRT(sa + sb), 6)) > 1.959964 AS significant
    FROM j
""",
        "q211_assoc_rules": """
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b,
             'p' || CAST(l_partkey % 25 AS VARCHAR) AS i
      FROM lineitem
    ),
    capped AS (
      SELECT b, i FROM (
        SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS r
        FROM bi
      ) WHERE r <= 1000
    ),
    item_n AS (SELECT i, COUNT(*) AS n_item FROM capped GROUP BY i),
    nb AS (SELECT CAST(COUNT(DISTINCT b) AS DOUBLE) AS nb FROM capped),
    pairs AS (
      SELECT l.i AS a, r.i AS c, COUNT(*) AS n_pair
      FROM capped l JOIN capped r ON l.b = r.b AND l.i < r.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 10
    ),
    rules AS (
      SELECT a AS ante, c AS cons, n_pair FROM pairs
      UNION ALL SELECT c, a, n_pair FROM pairs
    )
    SELECT ante, cons, n_pair,
           ROUND(n_pair / (SELECT nb FROM nb), 6) AS support,
           ROUND(n_pair / CAST(na.n_item AS DOUBLE), 6) AS confidence,
           ROUND((n_pair / CAST(na.n_item AS DOUBLE))
                 / (nc.n_item / (SELECT nb FROM nb)), 6) AS lift
    FROM rules
    JOIN item_n na ON rules.ante = na.i
    JOIN item_n nc ON rules.cons = nc.i
""",
        "q212_calibration": """
    WITH e AS (
      SELECT ((event_id % 100) + 0.5) / 100.0 AS s,
             CASE WHEN (user_id % 100) < (event_id % 100)
                  THEN 1.0 ELSE 0.0 END AS y
      FROM events
    ),
    b AS (
      SELECT LEAST(CAST(FLOOR(s * 10) AS INTEGER), 9) AS bin,
             COUNT(*) AS n, AVG(s) AS ms, AVG(y) AS fp
      FROM e GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS nn,
             SUM(n * ABS(ms - fp)) AS wgap
      FROM b
    )
    SELECT bin, n, ROUND(ms, 6) AS mean_score, ROUND(fp, 6) AS frac_pos,
           ROUND(ABS(ms - fp), 6) AS gap,
           ROUND((SELECT wgap FROM t) / (SELECT nn FROM t), 6) AS ece
    FROM b
""",
        "q213_pettitt": """
    WITH obs AS (
      SELECT user_id % 12 AS k, event_id AS t,
             CAST(value AS DOUBLE)
               + CASE WHEN event_id > 5000 THEN 30.0 ELSE 0.0 END AS v
      FROM events WHERE event_id < 8000
    ),
    vals AS (SELECT k, v, COUNT(*) AS c FROM obs GROUP BY k, v),
    ranks AS (
      SELECT k, v,
             COALESCE(SUM(c) OVER (PARTITION BY k ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS ar
      FROM vals
    ),
    nn AS (SELECT k, COUNT(*) AS n FROM obs GROUP BY k),
    walked AS (
      SELECT o.k, o.t, nn.n,
             SUM(r.ar) OVER (PARTITION BY o.k ORDER BY o.t) AS s,
             row_number() OVER (PARTITION BY o.k ORDER BY o.t) AS i
      FROM obs o JOIN ranks r ON o.k = r.k AND o.v = r.v
      JOIN nn ON o.k = nn.k
    ),
    u AS (
      SELECT k, t, n, 2.0 * s - i * CAST(n + 1 AS DOUBLE) AS u
      FROM walked WHERE i < n
    ),
    best AS (
      SELECT k, t, n, u,
             row_number() OVER (PARTITION BY k
               ORDER BY ABS(u) DESC, t ASC) AS r
      FROM u
    )
    SELECT k AS host, n, t AS cp_t, ROUND(ABS(u), 6) AS k_stat,
           ROUND(LEAST(1.0, 2.0 * EXP(-6.0 * ABS(u) * ABS(u)
             / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))), 6)
             AS p_value
    FROM best WHERE r = 1
""",
        "q214_best_passage": r"""
    WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents),
    pos AS (
      SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
             UNNEST(toks) AS term
      FROM d
    ),
    mp AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM pos
      WHERE term IN ('spark', 'data', 'merge')
    ),
    hits AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
               RANGE BETWEEN CURRENT ROW AND 14 FOLLOWING) AS n_hits
      FROM mp
    ),
    best AS (
      SELECT doc_id, pos, n_hits,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY n_hits DESC, pos ASC) AS r
      FROM hits
    )
    SELECT doc_id, pos AS passage_start, n_hits FROM best WHERE r = 1
""",
        "q215_funnel": """
    WITH s1 AS (
      SELECT user_id AS u, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
      SELECT 1 AS step_idx, 'view' AS step,
             (SELECT COUNT(*) FROM s1) AS n
      UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
      UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    )
    SELECT step_idx, step, n AS n_users,
           CASE WHEN (SELECT COUNT(*) FROM s1) > 0
                THEN ROUND(n / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE), 6)
                ELSE 0.0 END AS rate_from_first,
           CASE WHEN lag(n) OVER (ORDER BY step_idx) IS NULL THEN 1.0
                WHEN lag(n) OVER (ORDER BY step_idx) > 0
                THEN ROUND(n / CAST(lag(n) OVER (ORDER BY step_idx)
                                    AS DOUBLE), 6)
                ELSE 0.0 END AS rate_from_prev
    FROM c
""",
        "q216_trimmed_mean": """
    WITH src AS (
      SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS g,
             CAST(value AS DOUBLE) AS v
      FROM events
    ),
    vals AS (SELECT g, v, COUNT(*) AS c FROM src GROUP BY g, v),
    cum AS (
      SELECT g, v, c,
             COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
      FROM vals
    ),
    tot AS (SELECT g, SUM(c) AS n, SUM(v * c) AS sv FROM vals GROUP BY g),
    j AS (
      SELECT cum.g, tot.n, cum.v, tot.sv,
             CAST(FLOOR(0.1 * tot.n) AS BIGINT) AS lo,
             GREATEST(0, LEAST(cum.st + cum.c,
                               tot.n - CAST(FLOOR(0.1 * tot.n) AS BIGINT))
                         - GREATEST(cum.st,
                                    CAST(FLOOR(0.1 * tot.n) AS BIGINT)))
               AS kept
      FROM cum JOIN tot ON cum.g = tot.g
    ),
    a AS (
      SELECT g, n, lo, sv, SUM(kept) AS nk, SUM(v * kept) AS sk
      FROM j GROUP BY g, n, lo, sv
    )
    SELECT g AS "group", n,
           CASE WHEN nk > 0 THEN 2 * lo ELSE 0 END AS n_trimmed,
           ROUND(sv / CAST(n AS DOUBLE), 6) AS mean_raw,
           ROUND(CASE WHEN nk > 0 THEN sk / CAST(nk AS DOUBLE)
                      ELSE sv / CAST(n AS DOUBLE) END, 6) AS mean_trimmed
    FROM a
""",
        "q217_roc_auc": f"""
    WITH e AS ({_SCORED_EVENTS_SQL}),
    vals AS (SELECT v, SUM(y) AS np, SUM(1 - y) AS nn FROM e GROUP BY v),
    r AS (
      SELECT v, np, nn, np + nn AS t,
             COALESCE(SUM(np + nn) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM vals
    ),
    a AS (
      SELECT SUM(np) AS n_pos, SUM(nn) AS n_neg,
             SUM(np * (cum + (t + 1) / 2.0)) AS rp
      FROM r
    ),
    f AS (
      SELECT n_pos, n_neg,
             (rp - CAST(n_pos AS DOUBLE) * (n_pos + 1.0) / 2.0)
               / (CAST(n_pos AS DOUBLE) * n_neg) AS auc
      FROM a
    )
    SELECT n_pos, n_neg, ROUND(auc, 6) AS auc,
           ROUND(2.0 * auc - 1.0, 6) AS gini,
           ROUND(SQRT((auc * (1.0 - auc)
                       + (n_pos - 1.0) * (auc / (2.0 - auc) - auc * auc)
                       + (n_neg - 1.0) * (2.0 * auc * auc / (1.0 + auc)
                                          - auc * auc))
                      / (CAST(n_pos AS DOUBLE) * n_neg)), 6) AS se
    FROM f
""",
        "q218_pr_sweep": _pr_sweep_oracle(
            (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
        ),
        "q219_seasonal": """
    WITH src AS (
      SELECT user_id % 10 AS k, event_id AS t,
             CAST(value AS DOUBLE) + 4.0 * (event_id % 7) AS y
      FROM events WHERE event_id < 8000
    ),
    det AS (
      SELECT k, t % 7 AS phase, y - trend AS d FROM (
        SELECT k, t, y,
               AVG(y) OVER w AS trend, COUNT(*) OVER w AS wn
        FROM src WINDOW w AS (PARTITION BY k ORDER BY t
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      ) WHERE wn = 7
    ),
    seas AS (
      SELECT k, phase, AVG(d) AS s, COUNT(*) AS n FROM det GROUP BY k, phase
    ),
    resid AS (
      SELECT det.k, det.d, det.d - seas.s AS r
      FROM det JOIN seas ON det.k = seas.k AND det.phase = seas.phase
    ),
    v AS (SELECT k, VAR_POP(d) AS vd, VAR_POP(r) AS vr FROM resid GROUP BY k)
    SELECT seas.k AS host, seas.phase, seas.n, ROUND(seas.s, 6) AS seasonal,
           CASE WHEN v.vd > 0 THEN ROUND(1.0 - v.vr / v.vd, 6)
           END AS var_explained
    FROM seas JOIN v ON seas.k = v.k
""",
    }


# the portable-kernel LSH banding + exact-jaccard pipeline as a CTE chain
# ending in jpairs(a, b, jaccard) — shared by the q33 and q36 oracles
_JACCARD_PAIRS_BODY = """\
            un AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000, text || ' extraword'
              FROM documents WHERE doc_id % 25 = 0
            ), sh AS (
              SELECT doc_id,
                     list_transform(range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                                    i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')) AS shingles
              FROM un
            ), ab AS (
              SELECT doc_id,
                     list_transform(shingles, s -> struct_pack(
                         a := CAST('0x' || substr(sha256(s), 1, 14) AS BIGINT),
                         b := CAST('0x' || substr(sha256(s), 15, 14) AS BIGINT))) AS ab
              FROM sh
            ), sig AS (
              SELECT doc_id,
                     list_transform(range(0, 16), i ->
                         list_min(list_transform(ab, p -> p.a + i * p.b))) AS mh
              FROM ab
            ), bands AS (
              SELECT doc_id, CAST(b AS INT) AS band,
                     CAST('0x' || substr(sha256(array_to_string(list_slice(mh, b * 4 + 1, b * 4 + 4), ',')), 1, 15) AS BIGINT) AS band_hash
              FROM (SELECT doc_id, mh, UNNEST(range(0, 4)) AS b FROM sig)
            ), buckets AS (
              SELECT list(doc_id) AS ids
              FROM bands GROUP BY band, band_hash HAVING COUNT(*) > 1
            ), cand AS (
              SELECT DISTINCT a, b FROM (
                  SELECT a, UNNEST(ids) AS b
                  FROM (SELECT UNNEST(ids) AS a, ids FROM buckets)
              ) WHERE a < b
            ), shd AS (
              SELECT doc_id, list_distinct(shingles) AS s FROM sh
            ), jpairs AS (
              SELECT c.a, c.b,
                     ROUND(len(list_intersect(sa.s, sb.s))
                           / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE), 6) AS jaccard
              FROM cand c
              JOIN shd sa ON sa.doc_id = c.a
              JOIN shd sb ON sb.doc_id = c.b
              WHERE ROUND(len(list_intersect(sa.s, sb.s))
                          / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE), 6) >= 0.5
            )
"""


def _ivf_oracle() -> str:
    """Exact brute-force cosine top-10 over embeddings ∪ 12 planted scaled
    copies of the query vector — the q32 IVF probe must equal this."""
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    qlit = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in q) + "]"
    return f"""
        WITH un AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          UNION ALL
          SELECT 20000000 + i,
                 list_transform({qlit}, x -> ((2.0 + CAST(i AS DOUBLE)) / 4.0) * x)
          FROM (SELECT UNNEST(range(0, 12)) AS i)
        )
        SELECT vec_id, ROUND(
            list_dot_product(e, {qlit})
            / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product({qlit}, {qlit}))), 6) AS sim
        FROM un
        ORDER BY sim DESC, vec_id
        LIMIT 10
    """


def _cosine_oracle(round_digits: int = 4) -> str:
    q = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    qlit = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in q) + "]"
    return f"""
        SELECT vec_id, ROUND(
            list_dot_product(CAST(embedding AS DOUBLE[]), {qlit})
            / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[])))
               * sqrt(list_dot_product({qlit}, {qlit}))), {round_digits}) AS sim
        FROM embeddings
        ORDER BY sim DESC, vec_id
        LIMIT 10
    """
