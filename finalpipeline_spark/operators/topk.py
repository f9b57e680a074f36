"""Per-group top-k — the reference's central datamart operator.

Reference: per-target ``sort_values(...).head(10)`` in a Python loop
(reference datamart.py:28-47). Spark-first: a single window
``row_number`` over the whole dataset — one shuffle on the group key,
no driver loop, scales to any number of groups.

Scale note: row_number over a window is a full sort per group; for
hot/skewed groups at 100 TB, pre-aggregate with a partial top-k per
partition first (AQE skew-join handles the shuffle skew; the window
itself is streaming within each group, no buffering beyond k would be
needed only with a custom physical op — not worth it vs. built-in).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = True,
) -> DataFrame:
    """Deterministic top-k rows per group.

    ``order_by`` must end with a unique tiebreaker so results are stable
    across engines and runs (floating scores alone are not enough).
    """
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
