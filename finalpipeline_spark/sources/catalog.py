"""Catalog/sink helpers (SURVEY.md §2.1 S2, S3, S5, S7, S12, S13).

Postgres DDL + to_sql + pg_class probes from the reference
(db_interact.py:54-113, 168-178) map onto the Spark catalog; the
CSV/parquet staging writers map onto partitioned DataFrame writes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from finalpipeline_spark.functions.frames import empty_df, local_df


def table_exists(spark: SparkSession, name: str) -> bool:
    """S3: existence probe (reference queried pg_class)."""
    return spark.catalog.tableExists(name)


def save_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    """S2: df.to_sql(if_exists='replace'|'append') equivalent."""
    df.write.mode(mode).saveAsTable(name)


def create_view(spark: SparkSession, name: str, sql: str) -> None:
    """S7: CREATE OR REPLACE VIEW."""
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")


def append_ledger_entries(
    spark: SparkSession, ledger_path: str, files: Sequence[str]
) -> None:
    """S5: ledger inserts — one batched append with a timestamp column,
    not the reference's row-at-a-time INSERT loop (tanimoto.py:47-58)."""
    if not files:
        return
    df = local_df(spark, [(f,) for f in files], "file string").withColumn(
        "ts", F.current_timestamp()
    )
    df.coalesce(1).write.mode("append").parquet(ledger_path)


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    """Empty-safe ledger read (first run: no ledger yet).

    Existence is probed at the filesystem level (dir_exists), never via
    spark.read + try/except: a transient read error misread as 'no
    ledger' would re-process every input file downstream.  A failing
    read of an EXISTING ledger propagates instead."""
    from finalpipeline_spark.operators.compaction import dir_exists

    if dir_exists(spark, ledger_path):
        return spark.read.parquet(ledger_path).select("file")
    return empty_df(spark, "file string")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """S13: one-parquet-per-key becomes partitionBy layout."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
