"""Bucketed (co-located) joins — the 100 TB repeated-join strategy.

The reference re-joined the same keys every run by shipping rows to
Postgres (SURVEY.md §4 'join pushdown'). At Spark scale the analogous
investment is bucketing: pay one shuffle at write time
(``bucketBy(orderkey)``), then every subsequent orders⋈lineitem join
is shuffle-free — both sides are already hash-partitioned on the join
key on disk. For a fact table joined daily at 100 TB this converts the
dominant per-query cost into a one-time layout cost.

Verified in tests/test_bucketing.py: the join plan over the bucketed
tables contains NO shuffle exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join key."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two co-bucketed tables — planner elides both exchanges."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
