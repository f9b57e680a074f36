"""Top-k with tolerance-based tie flag.

Re-expresses the reference's trickiest semantic (reference
datamart.py:28-47): take the top-10 scores per target; let ``last`` be
the lowest score that made the cut; count rows tolerance-equal
(np.isclose, rtol=1e-5 atol=1e-8) to ``last`` inside the top-10 vs in
the entire group. If the counts differ (i.e. the cutoff truncated a tie
cluster), flag every kept row with the *overall* tie count, else 0 —
column ``has_duplicates_of_last_largest_score``.

Spark-first: two window passes over one shuffle on the group key (rank,
then group-scoped min/counts) — no per-group driver loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from finalpipeline_spark.functions.numeric import isclose


def top_k_with_tie_flag(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    tiebreak_cols: Sequence[str],
    k: int = 10,
    flag_col: str = "has_duplicates_of_last_largest_score",
) -> DataFrame:
    """Top-k per group by descending score, with the reference tie flag."""
    gcols = [F.col(c) for c in group_cols]
    order = [F.desc(score_col)] + [F.col(c) for c in tiebreak_cols]
    w_rank = Window.partitionBy(*gcols).orderBy(*order)
    w_grp = Window.partitionBy(*gcols)

    score = F.col(score_col)
    ranked = df.withColumn("_rn", F.row_number().over(w_rank))
    last = F.min(F.when(F.col("_rn") <= k, score)).over(w_grp)
    flagged = (
        ranked.withColumn("_last", last)
        .withColumn("_close", isclose(score, F.col("_last")))
        .withColumn(
            "_cnt_all", F.sum(F.col("_close").cast("long")).over(w_grp)
        )
        .withColumn(
            "_cnt_top",
            F.sum((F.col("_close") & (F.col("_rn") <= k)).cast("long")).over(w_grp),
        )
        .withColumn(
            flag_col,
            F.when(F.col("_cnt_all") != F.col("_cnt_top"), F.col("_cnt_all"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return flagged.filter(F.col("_rn") <= k).drop(
        "_rn", "_last", "_close", "_cnt_all", "_cnt_top"
    )
