"""Water-filling (max-min fair) budget allocation under a global cap.

allocate_budgets (operators/pagerank) splits a batch PROPORTIONALLY to
rank; when the constraint is a hard global fetch-rate cap (downstream
pipeline capacity, egress budget), proportional splits starve small hosts
while big hosts waste allocation above their own demand. Max-min
fairness is the classic alternative: raise one water level L and give
every host min(demand_i, L), with L chosen so the total exactly spends
the budget — no host gets more than it can use, unused slack flows to
the hosts that can. Jain's index (operators/politeness.fairness_index)
over the result is 1.0 whenever no demand saturates, by construction.

Closed form, no iteration: sort demands ascending; host j SATURATES iff
serving every earlier host fully and giving everyone from j on c_j each
still fits the budget (prefix_{j-1} + (n-j+1)*c_j <= B). With i = number
of saturated hosts, L = (B - prefix_i) / (n - i).

Scale shape: hosts-with-demands is a host-cardinality table (tiny next
to the frontier): one global-order window over it (acceptable at host
grain; the frontier itself never enters), one 1-row aggregate for (i,
prefix_i) broadcast back, then a map-side min. If ALL hosts saturate
(sum demand <= budget) every host simply gets its demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def waterfill_budgets(
    demands: DataFrame,
    total_budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
    round_digits: int = 6,
) -> DataFrame:
    """(host, demand, allocation, saturated): max-min fair split of
    `total_budget` across hosts, allocation = min(demand, L). Ordering is
    (demand, host) so ties are deterministic."""
    w = Window.orderBy(F.col(demand_col), F.col(host_col))
    ranked = demands.select(
        F.col(host_col),
        F.col(demand_col).cast("double").alias("_d"),
        F.row_number().over(w).alias("_rn"),
        F.sum(demand_col)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("_prefix"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
    ).select(
        "*",
        F.coalesce(F.col("_prefix"), F.lit(0.0)).alias("_pfx"),
    )
    sat = ranked.select(
        "*",
        (
            F.col("_pfx") + (F.col("_n") - F.col("_rn") + 1) * F.col("_d")
            <= total_budget
        ).alias("_sat"),
    )
    level_src = sat.agg(
        F.sum(F.col("_sat").cast("long")).alias("_i"),
        F.coalesce(
            F.sum(F.when(F.col("_sat"), F.col("_d"))), F.lit(0.0)
        ).alias("_si"),
        F.max("_n").alias("_nn"),
    )
    out = sat.crossJoin(F.broadcast(level_src))
    level = F.when(
        F.col("_i") < F.col("_nn"),
        (F.lit(float(total_budget)) - F.col("_si"))
        / (F.col("_nn") - F.col("_i")),
    ).otherwise(F.col("_d"))  # all saturated: everyone gets demand
    return out.select(
        host_col,
        F.col("_d").alias("demand"),
        F.round(F.least(F.col("_d"), level), round_digits).alias("allocation"),
        F.col("_sat").cast("int").alias("saturated"),
    )
