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
