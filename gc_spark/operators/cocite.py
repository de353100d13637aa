"""Co-citation and bibliographic coupling — relatedness without new links.

Two pages repeatedly linked FROM the same sources (co-citation: Small
1973) or linking TO the same targets (bibliographic coupling: Kessler
1963) are related even when no edge joins them directly — the oldest
similarity signals in citation analysis and still the backbone of
"related pages" on web graphs. For a crawler they rank discovery
candidates (pages co-cited with known-good seeds) and expose coordinated
link farms (clusters with abnormally high coupling), complementing
adamic_adar which scores the same wedges with hub damping.

Scale shape: identical wedge discipline to linkpred.adamic_adar and the
triangle counter — pairs are generated AT the shared neighbor, so its
degree drives fan-out, and neighbors past max_degree are df-capped
before pairing (a hub citing everything says nothing about relatedness
anyway). One groupBy(pair) aggregate after the wedge expansion, a
min_common filter keeps the output sparse. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbor_pairs(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    shared: str = "src",
    max_degree: int = 64,
    min_common: int = 2,
) -> DataFrame:
    """(a, b, n_common) pairs (a < b) sharing >= min_common neighbors.

    shared='src' pairs dst nodes by common citing source (co-citation);
    shared='dst' pairs src nodes by common cited target (coupling).
    Shared neighbors with fan-out > max_degree are excluded before
    pairing.
    """
    if shared == "src":
        z, n = src_col, dst_col
    elif shared == "dst":
        z, n = dst_col, src_col
    else:
        raise ValueError("shared must be 'src' or 'dst'")
    adj = edges.select(
        F.col(z).alias("z"), F.col(n).alias("n")
    ).distinct()
    return _pairs_from_adj(adj, max_degree, min_common)


def _pairs_from_adj(
    adj: DataFrame, max_degree: int, min_common: int
) -> DataFrame:
    """Wedge pairing over a deduped (z, n) adjacency frame."""
    deg = adj.groupBy("z").agg(F.count("*").alias("deg"))
    capped = adj.join(
        F.broadcast(deg.where(F.col("deg") <= max_degree)).select("z"), "z"
    )
    # r6 shape: pairs are generated AT the shared neighbor from its
    # sorted, df-capped neighbor array, so the (a,b) count can partially
    # aggregate map-side BEFORE its exchange (guide §2.3) — the r5
    # left×right self-join shuffled every wedge row instead. The explicit
    # hash repartition on z keeps the O(deg²) explode WIDE: its input is
    # only a few MB here and AQE would coalesce the stage to one task,
    # serializing the 10M-row fan-out it cannot foresee. The cap still
    # applies before any array materializes, so a 10^6-degree hub never
    # builds a giant array.
    grouped = (
        capped.repartition(F.col("z"))
        .groupBy("z")
        .agg(F.sort_array(F.collect_list("n")).alias("_ns"))
    )
    ns = F.col("_ns")
    pair_arr = F.flatten(
        F.transform(
            ns,
            lambda x, i: F.transform(
                F.slice(ns, i + F.lit(2), F.size(ns)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    # The pair stream is repartitioned on (a, b) BEFORE the count rather
    # than letting the aggregate plan its usual partial/final split: pairs
    # are near-unique by construction (a pair repeats only once per extra
    # shared neighbor, and the df-cap bounds that), so the map-side
    # partial aggregate built a hash table over virtually every exploded
    # row for no reduction — pure overhead charged to the explode stage
    # (guide §8: the min_common filter shape is knowledge the optimizer
    # doesn't have). Shuffle bytes are unchanged (no reduction either
    # way); measured −24% on the coupling side at sf0.1.
    return (
        grouped.select(F.explode(pair_arr).alias("_p"))
        .select("_p.a", "_p.b")
        .repartition("a", "b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def cocitation_coupling(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int = 64,
    min_common: int = 2,
) -> DataFrame:
    """Both signals in one frame: (kind, a, b, n_common) with kind in
    {'cocitation', 'coupling'}.

    The two sides share ONE deduped edge set: (src, dst) distinct equals
    (dst, src) distinct with roles swapped, but as separate subtrees the
    scan+distinct is instantiated 4× across the two pipelines (each side's
    main path + its broadcast degree filter). A lazy localCheckpoint (the
    opic/salsa pattern) materializes it once per invocation — computed
    fresh from the inputs every run, never reused across runs."""
    d = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    co = _pairs_from_adj(
        d.select(F.col("src").alias("z"), F.col("dst").alias("n")),
        max_degree,
        min_common,
    ).select(F.lit("cocitation").alias("kind"), "a", "b", "n_common")
    bc = _pairs_from_adj(
        d.select(F.col("dst").alias("z"), F.col("src").alias("n")),
        max_degree,
        min_common,
    ).select(F.lit("coupling").alias("kind"), "a", "b", "n_common")
    return co.unionByName(bc)
