"""UCB1 source scheduling — explore/exploit over crawl sources.

Which source gets the next fetch batch? Each source is a bandit arm:
pulls are past fetches, reward is the yield (new-doc rate, change rate —
anything in [0, 1]). UCB1 (Auer, Cesa-Bianchi & Fischer 2002) scores
each arm mean + sqrt(2 ln N / n) and plays the max — logarithmic regret,
no tuning. Fleshes out the scheduler family: waterfill.py divides a
fixed budget given KNOWN value, recrawl.py prices staleness; UCB1 is
the allocator when value must still be LEARNED.

Scale shape: one groupBy(source) over the reward log (the only
corpus-sized shuffle, map-side combined); N rides as a 1-row broadcast;
the rank window runs at source grain (arms are few by definition —
documented contract, same grain the politeness ops window at). No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ucb1_schedule(
    df: DataFrame,
    source_col: str,
    reward_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """(source, n_pulls, mean_reward, ucb, rank) — rank 1 is the arm
    UCB1 plays next. Ties break to the lexically smaller source."""
    arms = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_pulls"),
        F.avg(F.col(reward_col).cast("double")).alias("_mean"),
    )
    total = arms.agg(F.sum("n_pulls").cast("double").alias("nn"))
    scored = arms.crossJoin(F.broadcast(total)).withColumn(
        "_ucb",
        F.col("_mean")
        + F.sqrt(2.0 * F.log(F.col("nn")) / F.col("n_pulls")),
    )
    w = Window.orderBy(F.col("_ucb").desc(), F.col("source").asc())
    return scored.select(
        "source",
        "n_pulls",
        F.round("_mean", round_digits).alias("mean_reward"),
        F.round("_ucb", round_digits).alias("ucb"),
        F.row_number().over(w).alias("rank"),
    )
