"""Incremental aggregate materialized-view maintenance.

The 100 TB alternative to re-aggregating a fact table per refresh: keep
the MV as (keys, partial aggregates) and fold each change batch in with
a partial-aggregate merge.  sum and count are self-decomposable
(retractions are just negative partials), so maintenance cost is
O(|batch| + |touched groups|), never O(|fact|); avg/ratios are derived
from the partials at read time.  min/max are NOT maintainable under
retraction without a re-scan of the group — callers needing those
should use the quality/profile scans instead (documented limitation,
same as every incremental-view engine).

This composes with the repo's other incremental machinery: the change
batches can come from the streaming sinks (`streaming/sinks.py`) or the
ledger anti-join (`operators/incremental.py`); idempotence across
re-delivered batches is the caller's concern (dedupe by change id
first — see `streaming/sinks.stream_scd2_to_parquet` for the pattern).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_partials(
    facts: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str = "n_rows",
    sign: int = 1,
) -> DataFrame:
    """Collapse raw fact rows to (keys, partial sums, count).  With
    ``sign=-1`` the partials are retractions (deletes)."""
    aggs = [
        (F.lit(sign) * F.sum(F.expr(src))).cast("long").alias(dst)
        for dst, src in sum_cols.items()
    ]
    aggs.append((F.lit(sign) * F.count(F.lit(1))).cast("long").alias(count_alias))
    return facts.groupBy(*keys).agg(*aggs)


def merge_partials(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measure_cols: list[str],
) -> DataFrame:
    """Fold a partial-aggregate delta into the MV: full-outer on keys,
    componentwise exact-integer adds, groups that net to zero rows
    dropped.  Both inputs must already be at (keys, partials) grain."""
    d = reduce(
        lambda df, c: df.withColumnRenamed(c, f"__d_{c}"),
        measure_cols,
        delta,
    )
    merged = mv.join(d, on=keys, how="full_outer")
    for c in measure_cols:
        merged = merged.withColumn(
            c,
            (F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"__d_{c}"), F.lit(0))).cast(
                "long"
            ),
        )
    count_col = measure_cols[-1]
    return merged.select(*keys, *measure_cols).filter(F.col(count_col) != 0)


def maintain_agg_mv(
    mv: DataFrame,
    batch: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str = "n_rows",
    retract: bool = False,
) -> DataFrame:
    """One maintenance step: partial-aggregate the raw batch (negated
    when ``retract``), then merge into the MV."""
    delta = aggregate_partials(
        batch, keys, sum_cols, count_alias=count_alias, sign=-1 if retract else 1
    )
    return merge_partials(mv, delta, keys, [*sum_cols.keys(), count_alias])
