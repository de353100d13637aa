"""Pairwise Pearson correlation matrix — quality-feature redundancy audit.

The quality-scoring family (compress_quality, vocab, novelty...) emits
per-document feature columns; before they feed a filter or a trained
scorer, the audit question is which features are redundant. Pearson's r
for every feature pair comes from two algebraic aggregate passes:

  pass 1: per-column means (one map-side-combined aggregate);
  pass 2: centered second moments sum((x-mx)(y-my)) for every pair,
          r_ab = S_ab / sqrt(S_aa * S_bb).

Two passes instead of the textbook one-pass raw-sum identity on purpose:
n*S_xy - S_x*S_y cancels catastrophically for weakly-correlated
large-magnitude features (the exact case an audit exists to find), while
centered products keep full precision. Both passes are single
full-corpus aggregates — no shuffle beyond the 1-row combine, the means
ride as a broadcast, and only an O(k^2)-column row reaches the pair
expansion. No windows, no UDFs. Rows with a NULL in any audited column
are dropped first so every pair sees the same n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pearson_matrix(
    df: DataFrame, cols: list[str], round_digits: int = 6
) -> DataFrame:
    """(feat_a, feat_b, n, r) for every unordered column pair (a < b in
    list order). r is NULL when either column is constant."""
    clean = df.dropna(subset=cols)
    means = clean.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"_m_{c}") for c in cols]
    )
    centered = clean.crossJoin(F.broadcast(means))

    aggs = [F.count("*").alias("_n")]
    for c in cols:
        xc = F.col(c).cast("double") - F.col(f"_m_{c}")
        aggs.append(F.sum(xc * xc).alias(f"_v_{c}"))
    for i, a in enumerate(cols):
        xa = F.col(a).cast("double") - F.col(f"_m_{a}")
        for b in cols[i + 1 :]:
            xb = F.col(b).cast("double") - F.col(f"_m_{b}")
            aggs.append(F.sum(xa * xb).alias(f"_x_{a}_{b}"))
    stats = centered.agg(*aggs)

    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            pairs.append(
                F.struct(
                    F.lit(a).alias("feat_a"),
                    F.lit(b).alias("feat_b"),
                    F.col("_n").alias("n"),
                    F.when(
                        F.col(f"_v_{a}") * F.col(f"_v_{b}") > 0,
                        F.round(
                            F.col(f"_x_{a}_{b}")
                            / F.sqrt(F.col(f"_v_{a}") * F.col(f"_v_{b}")),
                            round_digits,
                        ),
                    ).alias("r"),
                )
            )
    return stats.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")
