"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the bloom/exact split used everywhere else in this
engine:

  - brute_force_topk: exact cosine top-k — JVM-side zip_with/aggregate dot
    product in double precision, a single narrow scan + top-k. The baseline
    and the verifier.
  - lsh_bucket_ann: random-hyperplane LSH — sign-bit signature per vector
    (pure expressions), candidates = bucket collisions with the query's
    signature (probing all buckets within Hamming distance `probe_bits`),
    exact cosine only on candidates. At 100 TB the scan prunes to
    ~1/2^bits of the table per probe; signatures can be precomputed and
    stored as a column (write_signatures).

Hyperplanes are deterministic: component h[p][d] = sign derived from
xxhash64(p, d) — no RNG state, same planes on every run/executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def _emb_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_sim_col(emb_col, query: list[float]):
    qlit = F.array([F.lit(float(x)) for x in query])
    qnorm = float(sum(x * x for x in query)) ** 0.5
    e = _emb_double(emb_col)
    return _dot(e, qlit) / (_norm(e) * F.lit(qnorm))


def brute_force_topk(
    df: DataFrame, query: list[float], k: int = 10, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k: one scan, no shuffle except the final top-k."""
    return (
        df.select(F.col(id_col), F.round(cosine_sim_col(F.col(emb_col), query), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), id_col)
        .limit(k)
    )


# -- deterministic random hyperplanes ---------------------------------------


def _plane_sign(p: int, d: int) -> float:
    """Deterministic ±1 from a splitmix-style integer hash (no RNG state)."""
    x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 31)) * 0x7FB5D329728EA185 & 0xFFFFFFFFFFFFFFFF
    return 1.0 if (x >> 63) else -1.0


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    return [[_plane_sign(p, d) for d in range(dim)] for p in range(num_planes)]


def signature_col(emb_col, planes: list[list[float]]):
    """Integer LSH signature: bit p = sign(h_p · v) — pure expressions."""
    e = _emb_double(emb_col)
    bits = [
        F.when(_dot(e, F.array([F.lit(x) for x in plane])) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        for p, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def write_signatures(df: DataFrame, num_planes: int, dim: int, emb_col: str = "embedding") -> DataFrame:
    return df.withColumn("lsh_sig", signature_col(F.col(emb_col), hyperplanes(num_planes, dim)))


def lsh_bucket_ann(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    num_planes: int = 8,
    probe_bits: int = 1,
    num_tables: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-table LSH ANN: `num_tables` independent sign-bit signatures
    (plane sets disjoint by construction); a vector is a candidate if ANY
    table's signature is within `probe_bits` of the query's — the standard
    recall amplification. Exact cosine runs only on the candidate union.
    """
    cond = None
    for t in range(num_tables):
        planes = [
            [_plane_sign(t * 10_000 + p, d) for d in range(len(query))]
            for p in range(num_planes)
        ]
        sig = signature_col(F.col(emb_col), planes)
        qsig = 0
        for p, plane in enumerate(planes):
            if sum(a * b for a, b in zip(plane, query)) >= 0:
                qsig |= 1 << p
        probe = [qsig]
        if probe_bits >= 1:
            probe += [qsig ^ (1 << i) for i in range(num_planes)]
        if probe_bits >= 2:
            probe += [
                qsig ^ (1 << i) ^ (1 << j)
                for i in range(num_planes)
                for j in range(i + 1, num_planes)
            ]
        this = sig.isin(probe)
        cond = this if cond is None else (cond | this)

    cand = df.filter(cond)
    return (
        cand.select(
            F.col(id_col), F.round(cosine_sim_col(F.col(emb_col), query), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), id_col)
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 12,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket self-join (only same-signature
    pairs compared) then exact cosine filter — never the quadratic pair set.
    """
    sigs = write_signatures(df, num_planes, dim, emb_col).select(
        F.col(id_col), F.col(emb_col), F.col("lsh_sig")
    )
    a = sigs.select(
        F.col("lsh_sig"),
        F.col(id_col).alias("a"),
        F.col(emb_col).alias("emb_a"),
    )
    b = sigs.select(
        F.col("lsh_sig"),
        F.col(id_col).alias("b"),
        F.col(emb_col).alias("emb_b"),
    )
    ea, eb = _emb_double(F.col("emb_a")), _emb_double(F.col("emb_b"))
    sim = _dot(ea, eb) / (_norm(ea) * _norm(eb))
    return (
        a.join(b, "lsh_sig")
        .filter(F.col("a") < F.col("b"))
        .withColumn("sim", F.round(sim, 6))
        .filter(F.col("sim") >= threshold)
        .select("a", "b", "sim")
        .distinct()
    )


# -- IVF (inverted-file) ANN --------------------------------------------------
#
# The third scale path the task brief asks for alongside brute-force and LSH:
# a coarse quantizer (k-means centroids) splits the table into `num_cells`
# inverted lists; a query probes only the `nprobe` cells whose centroids are
# nearest, then exact-reranks inside them. At 100 TB the table is WRITTEN
# partitioned by `ivf_cell` (write_ivf_partitioned), so a probe is a
# partition-pruned scan of nprobe/num_cells of the data — the pruning happens
# in the parquet source, not in a filter over a full scan.
#
# Training is the standard offline step: deterministic seeds (lowest ids, no
# RNG state) + Lloyd iterations computed DISTRIBUTIVELY (posexplode →
# groupBy(cell, dim).avg); only the num_cells×dim centroid means ever reach
# the driver.


def _normalize(v: list[float]) -> list[float]:
    n = sum(x * x for x in v) ** 0.5 or 1.0
    return [x / n for x in v]


def ivf_cell_col(emb_col, centroids: list[list[float]]):
    """Nearest-centroid id by cosine — since |v| is constant across
    centroids, argmax cosine == argmax dot with UNIT centroids, so the norm
    is never computed. Argmax via array_max over (sim, cell) structs —
    lexicographic struct ordering, pure expressions."""
    e = _emb_double(emb_col)
    # r6: ONE nested-array literal instead of k*dim individual F.lit
    # calls — the per-training-round expression build was thousands of
    # py4j round-trips and a fresh codegen unit per centroid update (the
    # literals change every round, defeating the codegen cache); as a
    # transform over a matrix literal the expression SHAPE is stable and
    # tiny. Arithmetic identical: same zip_with/aggregate fold order,
    # same (s, c) struct argmax.
    cm = F.lit([_normalize(list(c)) for c in centroids])
    scored = F.transform(
        cm,
        # named_struct, not struct(alias) — aliases don't survive inside
        # HOF lambdas (the lambda-variable name leaks as the field name)
        lambda c, i: F.named_struct(
            F.lit("s"), _dot(e, c), F.lit("c"), i
        ),
    )
    return F.array_max(scored)["c"].alias("ivf_cell")


def train_ivf_centroids(
    df: DataFrame,
    num_cells: int = 8,
    dim: int = 64,
    iters: int = 1,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic IVF training: seeds = the num_cells lowest-id vectors,
    then `iters` Lloyd steps. Each step is one distributed pass: assign
    (expressions) → per-(cell, dim) mean (posexplode + groupBy) → collect
    num_cells*dim scalars. An emptied cell keeps its previous centroid."""
    seeds = (
        df.orderBy(id_col)
        .limit(num_cells)
        .select(F.transform(emb_col, lambda x: x.cast("double")).alias("e"))
        .collect()
    )
    cents = [_normalize(list(r["e"])) for r in seeds]
    for _ in range(iters):
        assigned = df.select(
            ivf_cell_col(F.col(emb_col), cents),
            F.posexplode(_emb_double(F.col(emb_col))).alias("d", "val"),
        )
        means = (
            assigned.groupBy("ivf_cell", "d")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        nxt = [list(c) for c in cents]
        touched = set()
        for r in means:
            nxt[r["ivf_cell"]][r["d"]] = r["m"]
            touched.add(r["ivf_cell"])
        cents = [
            _normalize(nxt[i]) if i in touched else cents[i]
            for i in range(num_cells)
        ]
    return cents


def assign_ivf_cells(
    df: DataFrame, centroids: list[list[float]], emb_col: str = "embedding"
) -> DataFrame:
    return df.withColumn("ivf_cell", ivf_cell_col(F.col(emb_col), centroids))


def write_ivf_partitioned(
    df: DataFrame, centroids: list[list[float]], path: str, emb_col: str = "embedding"
) -> None:
    """Materialize the inverted file: parquet partitioned by ivf_cell, so a
    probe's `ivf_cell IN (...)` filter becomes PartitionFilters at the scan
    (verified by the plan test) — nprobe/num_cells of the bytes ever read."""
    assign_ivf_cells(df, centroids, emb_col).write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(path)


def probe_cells(query: list[float], centroids: list[list[float]], nprobe: int) -> list[int]:
    """The nprobe cells whose centroids are nearest the query (driver-side —
    centroids are num_cells×dim scalars, never big data)."""
    qn = _normalize(query)
    scored = sorted(
        ((sum(a * b for a, b in zip(qn, c)), i) for i, c in enumerate(centroids)),
        reverse=True,
    )
    return [i for _, i in scored[:nprobe]]


def ivf_ann(
    df: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: restrict to the nprobe nearest cells, exact-rerank inside.
    If `df` already carries an ivf_cell column (a pre-partitioned inverted
    file), the filter prunes partitions at the source; otherwise cells are
    computed on the fly (full scan, but still expression-only)."""
    cells = probe_cells(query, centroids, nprobe)
    if "ivf_cell" not in df.columns:
        df = assign_ivf_cells(df, centroids, emb_col)
    cand = df.filter(F.col("ivf_cell").isin(cells))
    return (
        cand.select(
            F.col(id_col), F.round(cosine_sim_col(F.col(emb_col), query), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), id_col)
        .limit(k)
    )


# -- SemDeDup: semantic (embedding-space) near-duplicate pruning -------------


def unit_col(emb_col):
    """Unit-normalized double vector — cosine becomes a plain dot."""
    e = _emb_double(emb_col)
    return F.transform(e, lambda x: x / _norm(e))


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus in
    embedding space, then inside each cluster drop every vector that has a
    cosine-near-duplicate with a smaller id — the keep-lowest-id rule makes
    the prune deterministic and restartable. Returns the KEPT rows as
    (id, cell).

    Scale shape: the pairwise cosine join is confined to a cluster (the
    SemDeDup trick — k sized so |cluster| ~ n/k keeps the quadratic local),
    expressed as a self-equi-join on cell, so Spark shuffles each cluster to
    one place once; with the corpus pre-partitioned by cell (e.g. via
    write_ivf_partitioned) the join is co-located and shuffle-free. All
    vector math is unit-normalized ONCE before the join, so each candidate
    pair costs a single dot product.

    The drop rule is a pair predicate (exists u < v in the same cell with
    cos(u,v) >= threshold), not a transitive closure — matching the paper,
    which dedups against cluster "exemplars" rather than chaining. Cosines
    are rounded to 6 digits before the threshold compare so the decision is
    reproducible across engines (same contract as brute_force_topk)."""
    assigned = assign_ivf_cells(df, centroids, emb_col).select(
        F.col(id_col).alias("_id"), F.col("ivf_cell").alias("cell"), unit_col(F.col(emb_col)).alias("_u")
    ).localCheckpoint(eager=False)
    a = assigned.select(F.col("_id").alias("_ida"), "cell", F.col("_u").alias("_ua"))
    b = assigned.select(F.col("_id").alias("_idb"), "cell", F.col("_u").alias("_ub"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(F.round(_dot(F.col("_ua"), F.col("_ub")), 6) >= F.lit(threshold))
        .select(F.col("_idb").alias("_id"))
        .distinct()
    )
    return assigned.join(dropped, "_id", "left_anti").select(
        F.col("_id").alias(id_col), "cell"
    )


def embedding_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    round_digits: int = 4,
) -> DataFrame:
    """Benchmark decontamination in EMBEDDING space — the semantic
    complement of the exact word-5-gram screen (operators/decontam): a
    paraphrased eval question shares no 5-gram with the training doc but
    sits next to it in embedding space. For every corpus vector, the best
    cosine against the benchmark set decides (vec_id, bench_id, cosine,
    contaminated).

    Scale shape: benchmark sets are small by nature (eval suites, not
    corpora) — broadcast crossJoin, so the corpus NEVER shuffles; one
    window per corpus id picks the argmax deterministically (cosine desc,
    bench_id asc — ties can exist after rounding). Cosine is rounded
    BEFORE the comparison and the threshold test so the emitted verdict
    and the ordering use the same number.
    """
    from pyspark.sql import Window

    b = benchmark.select(
        F.col(id_col).alias("bench_id"), _emb_double(F.col(emb_col)).alias("_be")
    )
    c = corpus.select(
        F.col(id_col), _emb_double(F.col(emb_col)).alias("_ce")
    )
    cos = _dot(F.col("_ce"), F.col("_be")) / (
        _norm(F.col("_ce")) * _norm(F.col("_be"))
    )
    scored = c.crossJoin(F.broadcast(b)).select(
        id_col, "bench_id", F.round(cos, round_digits).alias("cosine")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), F.col("bench_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            "bench_id",
            "cosine",
            (F.col("cosine") >= threshold).cast("int").alias("contaminated"),
        )
    )
