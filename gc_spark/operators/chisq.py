"""Chi-squared test of independence — is crawl outcome independent of
source / host / content-type?

The experimentation family tests two groups (z-test, Mann-Whitney, KS);
this is the r x c generalization: one shot over a full contingency table
("does HTTP outcome depend on host family", "does dedup verdict depend
on source"), with effect size (Cramer's V) so significance at crawl
scale — where everything is significant — stays interpretable, and the
Wilson-Hilferty normal approximation as an engine-portable p-readout
(the chi-square CDF itself is not expressible in closed form):

    chi2 = sum_cells (o - e)^2 / e,   e = rowtot * coltot / n
    V    = sqrt(chi2 / (n * min(r-1, c-1)))
    z_wh = ((chi2/dof)^(1/3) - (1 - 2/(9 dof))) / sqrt(2/(9 dof))

Zero-observed cells are never materialized: since sum over ALL cells of
e equals n, their contribution is n - sum over OBSERVED cells of e — the
full r x c grid is never generated.

Scale shape: the corpus contracts to the observed contingency table in
one groupBy (map-side partials); row and column marginals are
table-grain aggregates broadcast back; one output row. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chi_squared_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """One row: (n, n_rows, n_cols, dof, chi2, cramers_v, z_wh). Rows
    with a NULL in either dimension are excluded (they would form
    phantom categories)."""
    cells = (
        df.where(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(F.col(row_col).alias("_r"), F.col(col_col).alias("_c"))
        .agg(F.count("*").cast("double").alias("o"))
    )
    rm = cells.groupBy("_r").agg(F.sum("o").alias("_rt"))
    cm = cells.groupBy("_c").agg(F.sum("o").alias("_ct"))
    nn = cells.agg(
        F.sum("o").alias("_n"),
        F.countDistinct("_r").alias("n_rows"),
        F.countDistinct("_c").alias("n_cols"),
    )

    # marginal joins unhinted: a dimension can be unbounded (hosts), and
    # cells is always >= the marginal's size — AQE broadcasts the right
    # side at runtime
    joined = (
        cells.join(rm, "_r")
        .join(cm, "_c")
        .crossJoin(F.broadcast(nn))
        .select(
            "_n",
            "n_rows",
            "n_cols",
            (F.col("_rt") * F.col("_ct") / F.col("_n")).alias("e"),
            "o",
        )
    )
    agg = joined.agg(
        F.max("_n").alias("_n"),
        F.max("n_rows").alias("n_rows"),
        F.max("n_cols").alias("n_cols"),
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "_chi_obs"
        ),
        F.sum("e").alias("_e_obs"),
    )
    chi2 = F.col("_chi_obs") + (F.col("_n") - F.col("_e_obs"))
    dof = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    dofd = dof.cast("double")
    v = F.sqrt(
        chi2
        / (
            F.col("_n")
            * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1).cast("double")
        )
    )
    z_wh = (
        F.pow(chi2 / dofd, F.lit(1.0 / 3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dofd))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dofd))
    r = round_digits
    return agg.select(
        F.col("_n").cast("long").alias("n"),
        "n_rows",
        "n_cols",
        dof.alias("dof"),
        F.round(chi2, r).alias("chi2"),
        F.when(dof > 0, F.round(v, r)).alias("cramers_v"),
        F.when(dof > 0, F.round(z_wh, r)).alias("z_wh"),
    )
