"""Incremental cardinality tracking: a persisted HLL register table
maintained per ingest batch.

The growing-corpus counterpart of `lineitem_hll_distinct`: at 100 TB a
"how many distinct X so far" question must not rescan the corpus, and a
persisted exact key set is itself a 100 TB table.  The HLL register
table is 256 rows, and because registers merge by elementwise max —
associative, commutative, **idempotent** — maintenance is:

    batch -> registers (one narrow agg) -> max-merge with stored -> swap

Idempotence is the operational win: re-delivering a batch (at-least-
once ingestion, checkpoint replays) leaves the registers bit-identical,
with no change-id bookkeeping at all — max() of the same contribution
twice is itself.  Compare `streaming/sinks.stream_scd2_to_parquet`,
which needs change-id lineage to get the same guarantee for non-
idempotent state.

Storage uses the same atomic tmp-dir swap as the other persisted plans
(`operators/compaction.atomic_replace`), so a crash mid-update leaves
the previous register table intact and recoverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions.hll import (
    hll_estimate,
    hll_registers,
    merge_registers,
)
from finalpipeline_spark.operators.compaction import atomic_replace, dir_exists


def update_sketch(
    spark: SparkSession, store_path: str, batch: DataFrame, key_col: str
) -> None:
    """Fold one batch's keys into the persisted register table."""
    regs = hll_registers(batch, key_col)
    if dir_exists(spark, store_path):
        existing = spark.read.parquet(store_path)
        regs = merge_registers(existing, regs)
    tmp = store_path.rstrip("/") + "._tmp_swap"
    # Materialize BEFORE the swap: regs lazily reads store_path, so
    # writing over it in place would corrupt its own input.
    regs.write.mode("overwrite").parquet(tmp)
    atomic_replace(spark, store_path, tmp)


def read_registers(spark: SparkSession, store_path: str) -> DataFrame:
    return spark.read.parquet(store_path)


def sketch_estimate(spark: SparkSession, store_path: str) -> DataFrame:
    """One-row (est, zero_buckets) from the persisted registers —
    answering the cardinality question from 256 rows, not the corpus."""
    return hll_estimate(read_registers(spark, store_path))
