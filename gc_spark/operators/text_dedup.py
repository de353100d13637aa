"""Near-duplicate detection for training-data pipelines.

Four families, each picked for its scale profile:

  - exact dedup: hash-groupBy (see __spark_entry__ q10) — one shuffle.
  - MinHash + LSH banding: shingle → K minhashes → B bands → bucket-join.
    The minhash computation is a PURE JVM expression; zero Python, zero
    shuffle until the tiny band bucket groupBy. At 100 TB the only shuffled
    payload is (doc_id, band_hash), never the text. Two hash kernels:
    xxhash64 (fast, default — Spark-native) and a portable sha256-prefix
    kernel that DuckDB/ANSI SQL can reproduce bit-for-bit (the oracle path).
  - SimHash: 60-bit, pure JVM expressions — per-token sha256-prefix hash,
    per-bit ±1 fold via a single aggregate over the token array. Map-side
    only, no shuffle, no Python (replaces the round-1 Arrow UDF: ~100x less
    per-row overhead and SQL-oracle-able). Near-dup pairs then come from
    banding the simhash bits.
  - exact n-gram Jaccard confirm: array_intersect/array_union sizes — native
    — run only on LSH candidate pairs (the classic cheap-filter/exact-confirm
    split, same shape as the Bloom + exact anti-join in the crawl path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gc_spark.functions.text import winnow_fingerprints_col

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_WORDS = 3
SIMHASH_BITS = 60  # fits a positive signed long with headroom (15 hex chars)


def sha60_col(col) -> "F.Column":
    """Portable 60-bit hash: first 15 hex chars of sha256 as a long. Exactly
    reproducible in DuckDB as CAST('0x' || substr(sha256(x),1,15) AS BIGINT)
    — the cross-engine twin of xxhash64 for oracle-checked queries."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def _shingles(text_col) -> "F.Column":
    """Word 3-gram shingles as an array column (native). Token array bound
    once (functions/text.bind_once) — HOF lambdas re-evaluate captured
    subtrees per element, so an unbound `toks` re-splits the text per
    shingle."""
    from gc_spark.functions.text import bind_once

    return bind_once(
        F.split(F.trim(text_col), r"\s+"),
        lambda t: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(t) - (SHINGLE_WORDS - 1), F.lit(1))
            ),
            lambda i: F.array_join(F.slice(t, i, SHINGLE_WORDS), " "),
        ),
    )


def sha_pair_col(col) -> "F.Column":
    """(a, b) 56-bit pair from ONE sha256 — seed material for the affine
    minhash family h_i(x) = a + i·b. Exact in signed-64 arithmetic on both
    engines: a, b < 2^56 so a + 15·b < 2^60. One sha256 per shingle instead
    of NUM_HASHES of them — the portable kernel's hot-path cost drops 16x."""
    x = F.sha2(col, 256)
    return F.struct(
        F.conv(F.substring(x, 1, 14), 16, 10).cast("long").alias("a"),
        F.conv(F.substring(x, 15, 14), 16, 10).cast("long").alias("b"),
    )


def _minhash_fn(i: int):
    """xxhash64 function #i for the fast kernel. NOTE: must be a closure
    factory — a `lambda s, _i=i:` default-arg would be read by PySpark as a
    TWO-parameter higher-order-function lambda and `_i` would silently bind
    to the array index column instead of the loop value."""
    return lambda s: F.xxhash64(s, F.lit(i))


def _affine_min(i: int):
    """min over shingles of h_i = a + i·b (closure factory, see above)."""
    return lambda p: p["a"] + F.lit(i) * p["b"]


def minhash_signature(
    df: DataFrame, text_col: str = "text", portable: bool = False
) -> DataFrame:
    """Adds `minhash` array<long> of NUM_HASHES signature values — all
    whole-stage-codegen expressions. Fast kernel: per-seed xxhash64.
    Portable kernel: one sha256 per shingle → (a,b) pair → affine family
    a + i·b, bit-for-bit reproducible in ANSI SQL/DuckDB."""
    sh = _shingles(F.col(text_col))
    if portable:
        # materialize the pairs once per row; the 16 array_min passes then
        # traverse cheap arithmetic, not 16 sha256 recomputations
        df = df.withColumn("_mh_pairs", F.transform(sh, sha_pair_col))
        sig = F.array(
            *[
                F.array_min(F.transform(F.col("_mh_pairs"), _affine_min(i)))
                for i in range(NUM_HASHES)
            ]
        )
        return df.withColumn("minhash", sig).drop("_mh_pairs")
    sig = F.array(
        *[F.array_min(F.transform(sh, _minhash_fn(i))) for i in range(NUM_HASHES)]
    )
    return df.withColumn("minhash", sig)


def lsh_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(id, band, band_hash) — the persistable LSH index rows for each doc.
    This is what an incremental pipeline stores between crawls (bucketed by
    (band, band_hash) on disk so appends co-locate without reshuffling the
    index); minhash_lsh_candidates and incremental_lsh_candidates both
    build on it."""
    sig = minhash_signature(df, text_col, portable)
    band_hash = (
        (lambda c: sha60_col(c)) if portable else (lambda c: F.xxhash64(c))
    )
    return sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    band_hash(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("minhash")[b * ROWS_PER_BAND + r]
                                for r in range(ROWS_PER_BAND)
                            ],
                        )
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )


def incremental_lsh_candidates(
    index_bands: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Near-dup candidate pairs (a < b) introduced by a crawl increment,
    WITHOUT recomputing the corpus: new docs are banded and joined against
    the stored index (old×new) plus themselves (new×new); old×old pairs —
    the O(N²) part already known from previous runs — are never touched.

    Scale shape: the index side is read bucketed by (band, band_hash), so
    the old×new join co-locates with zero index shuffle; the new side is
    increment-sized and typically broadcastable. Signatures depend only on
    the doc text, so the result equals exactly the pairs-involving-new-docs
    slice of a full recompute (asserted by the q85 oracle)."""
    # nb feeds three join sides (old×new plus both legs of new×new); the
    # planner instantiates the increment's shingle+minhash pass once per
    # copy (no exchange reuse), so materialize the increment-sized band
    # rows once per invocation.
    nb = lsh_band_rows(new_docs, text_col, id_col, portable).localCheckpoint(
        eager=False
    )
    old_new = (
        nb.alias("n")
        .join(index_bands.alias("o"), ["band", "band_hash"])
        .where(F.col(f"o.{id_col}") != F.col(f"n.{id_col}"))
        .select(
            F.least(F.col(f"o.{id_col}"), F.col(f"n.{id_col}")).alias("a"),
            F.greatest(F.col(f"o.{id_col}"), F.col(f"n.{id_col}")).alias("b"),
        )
    )
    new_new = (
        nb.alias("x")
        .join(nb.alias("y"), ["band", "band_hash"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
    )
    return old_new.union(new_new).distinct()


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    ids_as_csv: bool = False,
) -> DataFrame:
    """LSH banding: bucket docs whose band signature collides.

    Returns one row per (band, band_hash) bucket with >1 member:
    (band, band_hash, n_docs, doc_ids sorted) — the candidate groups a
    pair-verify stage consumes. `ids_as_csv` renders doc_ids as a
    comma-joined string (sortable/hashable downstream); `portable` switches
    both the minhash and band-hash kernels to the sha256-prefix hash so the
    whole query is reproducible in ANSI SQL.
    """
    bands = lsh_band_rows(df, text_col, id_col, portable)
    ids = F.sort_array(F.collect_list(id_col))
    if ids_as_csv:
        ids = F.array_join(F.transform(ids, lambda x: x.cast("string")), ",")
    return (
        bands.groupBy("band", "band_hash")
        .agg(F.count("*").alias("n_docs"), ids.alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def jaccard_verify_pairs(df: DataFrame, candidates: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard on LSH candidate pairs only (native set ops)."""
    pairs = (
        candidates.select(F.explode("doc_ids").alias("a"), F.col("doc_ids"))
        .select("a", F.explode("doc_ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    # both probe legs instantiate `sh` and re-run the shingle pass —
    # MEASURED CHEAPER than materializing it (r6: a lazy localCheckpoint
    # of the fat shingle arrays read q33 1.34 -> 2.04 s A/B — the two
    # passes are fused map-side work that overlaps, while the checkpoint
    # serializes ~2-3x the corpus bytes through the block store; same
    # verdict as the r6 single-probe regroup revert)
    sh = df.select(
        F.col(id_col), F.array_distinct(_shingles(F.col(text_col))).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed(id_col, "b").withColumnRenamed("sh", "sh_b"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def simhash_col(text_col) -> "F.Column":
    """60-bit SimHash as pure JVM expressions — no UDF, no shuffle.

    tokens → portable 60-bit hash each → one aggregate pass accumulating the
    per-bit ±1 counts into an array → bit b set iff ones outnumber zeros.
    Deterministic across engines (sha256-based), so DuckDB can oracle it.
    """
    from gc_spark.functions.text import bind_once

    toks = F.filter(F.split(F.trim(text_col), r"\s+"), lambda t: t != "")
    hvs = F.transform(toks, sha60_col)

    # r6 kernel: one scalar integer accumulator per bit instead of a
    # zip_with fold that allocated TWO 60-int arrays per token (HOFs are
    # interpreted — CodegenFallback — so those allocations dominated).
    # 60 array passes of plain int adds beat 1 pass with per-token array
    # churn by ~3.4x measured on the sf0.1 corpus; bit math, fold order
    # and the majority test are unchanged (exact integer arithmetic), so
    # the output is bit-identical. `hvs` is bound once (bind_once) — the
    # 60 aggregates share the evaluated token-hash array.
    def _bit_step(b: int):
        # closure factory, NOT a default-arg lambda (see _minhash_fn)
        return lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(
            F.lit(1)
        ).cast("int")

    def _pack(h):
        n = F.size(h)
        # a FLAT 60-element array of independent aggregates, then the
        # original reverse-fold packing (bit 59 first: acc*2 + bit): a
        # 60-deep nested sum resolves one type-coercion level per analyzer
        # iteration and blows the 100-iteration cap / costs ~0.7 s of
        # analysis; the flat array resolves in one pass
        counts = F.array(
            *[
                F.aggregate(h, F.lit(0), _bit_step(b))
                for b in range(SIMHASH_BITS)
            ]
        )
        return F.aggregate(
            F.reverse(counts),
            F.lit(0).cast("long"),
            lambda acc, c: acc * 2
            + F.when(c * 2 > n, F.lit(1)).otherwise(F.lit(0)),
        )

    return bind_once(hvs, _pack).cast("long")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — map-side only, no shuffle, whole-stage codegen."""
    return df.select(F.col(id_col), simhash_col(F.col(text_col)).alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      band_bits: int = 15) -> DataFrame:
    """Near-dup candidates by banding the simhash into SIMHASH_BITS//band_bits
    chunks — two docs within small Hamming distance share at least one band."""
    s = simhash(df, text_col, id_col)
    nbands = SIMHASH_BITS // band_bits
    bands = s.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * band_bits).bitwiseAND(
                        F.lit((1 << band_bits) - 1)
                    )
                    for b in range(nbands)
                ]
            )
        ).alias("band", "band_val"),
    )
    return (
        bands.groupBy("band", "band_val")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def _set_checksum(df: DataFrame, *cols: str) -> tuple:
    """(count, sum(xxhash64(cols))) — an order-independent fingerprint of a
    row SET. Two cheap aggregate scans replace a full exceptAll shuffle when
    all we need is "did this set change since last round?" (collision odds
    ~2^-64 per comparison). Driver receives two scalars, never row data."""
    r = df.agg(
        F.count("*").alias("n"),
        # sum in decimal: long-sum overflows under ANSI mode; decimal(28,0)
        # inputs sum into decimal(38,0) — exact for any realistic row count
        F.sum(
            F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(28,0)")
        ).alias("s"),
    ).first()
    return (r["n"], r["s"])


EDGES_PER_PARTITION = 250_000


def _right_size(df: DataFrame, n_rows: int, key: str | None = None) -> DataFrame:
    """Shrink an iterative loop's working frame to ceil(n/EDGES_PER_
    PARTITION) partitions when the measured row count is far below the
    inherited parallelism — tiny edge sets stop paying 64-partition
    scheduling per round; big ones are left alone (never grows).

    With `key`, the repartition hashes on that column instead of
    round-robin: the checkpointed LogicalRDD then carries hash
    partitioning on the loop's join/groupBy key, so every round's
    equi-operation on it reuses the layout instead of re-exchanging the
    edge frame (guide §2.4 — two operations keyed the same way share one
    exchange)."""
    cur = df.rdd.getNumPartitions() or 1
    want = min(int(n_rows // EDGES_PER_PARTITION) + 1, cur)
    if want < cur:
        rep = df.repartition(want, F.col(key)) if key else df.repartition(want)
        return rep.localCheckpoint(eager=False)
    return df


class _scoped_shuffle_partitions:
    """Bound the loop's shuffle width to the MEASURED working-set size:
    ceil(n_rows/EDGES_PER_PARTITION), never above the session setting.
    Scale-adaptive, not local-tuned — at 10^10 edges the quotient exceeds
    any configured width and this is a no-op; at bench scale it stops each
    round paying a 64-reducer fan-out for a few hundred rows that AQE
    cannot always coalesce (the loop materializes through localCheckpoint
    RDDs). Restores the session value on exit."""

    def __init__(self, spark, n_rows: int):
        self.spark = spark
        self.n_rows = max(int(n_rows), 1)

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        want = min(self.n_rows // EDGES_PER_PARTITION + 1, int(self.old))
        self.spark.conf.set("spark.sql.shuffle.partitions", str(want))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    iters: int = 3,
    max_rounds: int = 50,
    ensure_converged: bool = True,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over near-dup pairs
    (the step after LSH+verify in a training-data dedup pipeline — keep one
    doc per cluster, drop the rest).

    Iterative min-label propagation: every node starts labelled with itself;
    each round a node adopts the smallest label within one hop. After k
    rounds the label is the component minimum for components of diameter
    <= k. Each round is one join + one groupBy — k shuffles total, no
    driver-side graph. (At 10^10 edges the round count matters: the
    large-star/small-star variant halves diameter per round; plain
    propagation is kept here because dup clusters are near-cliques — LSH
    pairs connect almost-identical docs, so diameters are tiny.)

    The near-clique assumption is ENFORCED, not assumed: with
    `ensure_converged` (default) propagation continues past `iters` until a
    label-set checksum stops changing (up to `max_rounds`), so a pathological
    long-chain component still gets its true component minimum — it just
    pays O(diameter) rounds for it. The checksum is two aggregate scalars
    per extra round, never an edge shuffle.

    Returns (doc_id, cluster_id) for every doc that appears in a pair;
    cluster_id = min doc_id of the component.
    """
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # every propagation round references `edges`; without materialization the
    # upstream pair pipeline (LSH + jaccard) would be re-executed k+1 times
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # same adaptive right-sizing as connected_components: the count is a
    # cheap scan of the just-materialized checkpoint blocks, and the
    # repartitioned frame re-checkpoints lazily on first use. Hashing on
    # src (not round-robin) lets every round's src==node join reuse the
    # checkpointed layout instead of re-exchanging the edges (guide §2.4).
    n_edges = edges.count()
    edges = _right_size(edges, n_edges, key="src")

    def _round(lbls: DataFrame) -> DataFrame:
        prop = (
            edges.join(lbls, edges["src"] == lbls["node"])
            .select(F.col("dst").alias("node"), "label")
        )
        return (
            lbls.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )

    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    with _scoped_shuffle_partitions(pairs.sparkSession, n_edges):
        for _ in range(iters):
            labels = _round(labels)
        if ensure_converged:
            # keep going until the label set stops changing. Each round is
            # ONE driver job: the lazy localCheckpoint is materialized by
            # the checksum aggregate itself (eager=True would spend a
            # separate job per round purely on materialization — at sf0.1
            # these iterative operators are driver-job-overhead-bound, not
            # shuffle-bound)
            labels = labels.localCheckpoint(eager=False)
            prev = _set_checksum(labels, "node", "label")
            for _ in range(max_rounds - iters):
                labels = _round(labels).localCheckpoint(eager=False)
                cur = _set_checksum(labels, "node", "label")
                if cur == prev:
                    break
                prev = cur
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def select_canonical(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "quality",
) -> DataFrame:
    """The step after cluster formation in a dedup pipeline: keep ONE
    representative per duplicate cluster — the highest-quality member, ties
    broken by min id for determinism. Returns every clustered doc with a
    `keep` flag (the caller anti-joins `keep = false` ids against the
    corpus; unclustered docs are implicitly kept and never enter this op).

    `quality` is any (id, quality) frame — text length here, a composite
    quality_score / LM score in production. One broadcast-or-shuffle join
    (clusters only hold docs that appeared in near-dup pairs — a small
    fraction of the corpus) and one per-cluster window; dup clusters are
    near-cliques of a handful of docs, so the window partitions are tiny by
    construction."""
    joined = clusters.join(quality, id_col)
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return joined.withColumn("keep", F.row_number().over(w) == 1).select(
        id_col, cluster_col, "keep"
    )


def connected_components(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_rounds: int = 25
) -> DataFrame:
    """Exact connected components over near-dup pairs via alternating
    large-star / small-star rounds (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — the 100 TB-grade path: converges in O(log^2 n)
    rounds regardless of component diameter, where plain min-label
    propagation (dup_clusters) needs O(diameter) rounds.

      large-star: every node's strictly-larger neighbors re-attach to the
                  minimum of its closed neighborhood
      small-star: every node's smaller-or-equal neighbors (and the node)
                  re-attach to that minimum

    Each round is a groupBy + join (two shuffles); the edge list shrinks
    toward a star forest and the loop stops when a round changes nothing.
    Convergence is detected by comparing an order-independent (count,
    sum(xxhash64)) checksum of the canonical edge set against the previous
    round's — one aggregate scan per round, two scalars to the driver. (The
    round-2 version ran 2× exceptAll here: a full hash-aggregate shuffle of
    BOTH edge frames per round purely to test convergence — at 10^10 edges
    that doubled the per-round shuffle volume.)
    Returns (doc_id, cluster_id = component min) for every node in a pair.
    """
    # lazy checkpoints throughout: the per-round checksum aggregate doubles
    # as the materialization action, so every round costs ONE driver job
    # (checkpoint-then-scan was two) — lineage is still cut once the
    # checksum runs
    e = (
        pairs.select(F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _star(edges: DataFrame, large: bool) -> DataFrame:
        # single-window form (r6): the round-5 groupBy(min)+join needed two
        # exchanges of `und` per star; one window over u delivers the
        # closed-neighborhood minimum to every row in one exchange+sort,
        # and the small-star's per-node self row (u -> m) is synthesized
        # from the rank-1 row via array_compact+explode instead of a third
        # union branch re-deriving the aggregate. The large-star's trailing
        # distinct is dropped too: duplicate pairs only multiply rows
        # WITHIN the round and the small-star's distinct restores set
        # semantics before the convergence checksum sees them.
        und = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        w = Window.partitionBy("u").orderBy("v")
        wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        x = und.select(
            "u",
            "v",
            F.least(F.min("v").over(wf), F.col("u")).alias("m"),
            F.row_number().over(w).alias("_rn"),
        )
        pair = F.struct(
            F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v")
        )
        if large:
            out = x.filter((F.col("v") > F.col("u")) & (F.col("v") != F.col("m"))).select(
                pair.alias("_p")
            )
        else:
            keep = F.when(
                (F.col("v") <= F.col("u")) & (F.col("v") != F.col("m")), pair
            )
            self_pair = F.when(
                (F.col("_rn") == 1) & (F.col("u") != F.col("m")),
                F.struct(F.col("m").alias("u"), F.col("u").alias("v")),
            )
            out = x.select(
                F.explode(F.array_compact(F.array(keep, self_pair))).alias("_p")
            )
        res = out.select("_p.u", "_p.v")
        return res if large else res.distinct()

    prev = _set_checksum(e, "u", "v")
    # right-size the iteration to the MEASURED edge count (the checksum
    # already paid for it): a few hundred LSH pairs at test scale would
    # otherwise run every round's stages over 64 inherited shuffle
    # partitions of ~10 rows each — pure task-scheduling overhead. At
    # 10^10 edges the quotient keeps thousands of partitions, so the
    # repartition is a no-op in spirit (same grow-only behavior as AQE
    # coalescing, decided once instead of per-stage). The loop's shuffle
    # width is bounded the same way (scoped, restored on exit).
    e = _right_size(e, prev[0], key="u")
    with _scoped_shuffle_partitions(pairs.sparkSession, prev[0]):
        for _ in range(max_rounds):
            e = _star(_star(e, large=True), large=False).localCheckpoint(eager=False)
            cur = _set_checksum(e, "u", "v")
            if cur == prev:
                break
            prev = cur

    nodes = e.select(F.col("v").alias("doc_id"), F.col("u").alias("cluster_id"))
    roots = e.select(F.col("u").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    return nodes.unionByName(roots).distinct()


def winnow_overlap_pairs(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    max_df: int = 10,
    min_shared: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Partial-overlap (containment) candidate pairs from winnowing
    fingerprints — the MOSS pairing step (Schleimer et al. 2003 §4) on top
    of functions/text.winnow_fingerprints_col: documents sharing >=
    `min_shared` selected fingerprints, scored by

        overlap = shared / min(|fp_a|, |fp_b|)

    (containment, not Jaccard: a quotation of A inside a much larger B
    scores high). Complements whole-document minhash (q16), which misses
    partial overlap by construction.

    Scale shape: fingerprints with document frequency > `max_df` are
    dropped BEFORE the self-join — they are corpus-common boilerplate that
    carries no pairing signal and, at 10^10 docs, the hot keys that would
    make the join quadratic. What remains is a rare-key equi-join: one
    shuffle on fingerprint, pair counts aggregate map-side. The df-filter
    is the same cheap-filter/exact-confirm split the LSH path uses
    (jaccard_verify_pairs is the downstream confirm)."""
    fp = winnow_fingerprints_col(F.col(text_col), k=k, w=w)
    base = df.select(F.col(id_col).alias("_id"), fp.alias("_fp")).localCheckpoint(
        eager=False
    )
    nfp = base.select("_id", F.size("_fp").alias("_n"))
    e = base.select("_id", F.explode("_fp").alias("_f"))
    rare = (
        e.groupBy("_f")
        .agg(F.count("*").alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("_f")
    )
    ek = e.join(rare, "_f")
    a = ek.select("_f", F.col("_id").alias("a"))
    b = ek.select("_f", F.col("_id").alias("b"))
    pairs = (
        a.join(b, "_f")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    na = nfp.select(F.col("_id").alias("a"), F.col("_n").alias("_na"))
    nb = nfp.select(F.col("_id").alias("b"), F.col("_n").alias("_nb"))
    return (
        pairs.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            "shared",
            F.round(F.col("shared") / F.least("_na", "_nb"), 6).alias("overlap"),
        )
    )


def incremental_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 25,
) -> DataFrame:
    """Maintain a connected-components labeling under EDGE INSERTIONS
    without recomputing the graph: the nightly-crawl reality is a stored
    (doc, cluster) assignment over 10^10 docs plus a delta of new near-dup
    pairs — rerunning connected_components over everything to absorb a
    0.1% delta is the anti-pattern this kills.

    Contract: `labels` is a min-labeled assignment (cluster_id = component
    min, what connected_components emits); returns the updated FULL
    assignment, exactly equal to connected_components over the union of
    old and new edges (old labels are component mins, so merging on the
    contracted label graph preserves the global-min labeling; a new doc
    with a smaller id than every old label wins, as it must).

    Scale shape: new endpoints look up their label (one delta-sized join —
    the labels side prunes to matching ids), edges CONTRACT to the label
    graph (<= 2|delta| nodes, orders of magnitude smaller than the
    corpus), the iterative star algorithm runs ONLY on that contracted
    graph, and the resulting old→new label mapping (delta-sized) is
    broadcast onto the stored assignment for a map-side relabel. The
    10^10-row table is touched by exactly one broadcast join, zero
    iterations."""
    lab = labels.select(
        F.col(id_col).alias("_n"), F.col(cluster_col).alias("_l")
    )

    def with_label(col):
        side = new_pairs.select(F.col(col).cast("long").alias("_n")).distinct()
        return side.join(lab, "_n", "left").select(
            F.col("_n").alias(col), F.coalesce("_l", F.col("_n")).alias(f"_l{col}")
        )

    la, lb = with_label(a_col), with_label(b_col)
    edges = (
        new_pairs.join(la, a_col).join(lb, b_col)
        .select(
            F.col(f"_l{a_col}").alias("a"), F.col(f"_l{b_col}").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    merged = connected_components(edges, max_rounds=max_rounds)
    mapping = merged.select(
        F.col(id_col).alias("_old"), F.col(cluster_col).alias("_new")
    )
    updated = labels.join(
        F.broadcast(mapping), labels[cluster_col] == F.col("_old"), "left"
    ).select(
        id_col,
        F.coalesce("_new", F.col(cluster_col)).alias(cluster_col),
    )
    new_nodes = (
        new_pairs.select(F.col(a_col).cast("long").alias("_n"))
        .unionByName(new_pairs.select(F.col(b_col).cast("long").alias("_n")))
        .distinct()
        .join(lab.select("_n"), "_n", "left_anti")
    )
    new_labeled = new_nodes.join(
        F.broadcast(mapping), new_nodes["_n"] == F.col("_old"), "left"
    ).select(
        F.col("_n").alias(id_col),
        F.coalesce("_new", F.col("_n")).alias(cluster_col),
    )
    return updated.unionByName(new_labeled)
