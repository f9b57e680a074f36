"""Source readers (SURVEY.md §2.1 S1, S10, S11, S14).

The reference hand-rolled S3 listing + per-file pandas reads with an
imposed schema, permissive bad-line handling and a utf-8→cp1252
fallback (reference S3_interact.py:34-38, 78-109). Spark-first: one
globbed reader call with an explicit schema and PERMISSIVE mode — the
listing loop, the per-file loop and the chunked reads all disappear
into partitioned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# Imposed 3-column input schema (reference tanimoto.py:88 — including
# the throwaway third column the reference named `Ellipsis`).
TARGET_INPUT_SCHEMA = StructType(
    [
        StructField("molecule_name", StringType()),
        StructField("smiles", StringType()),
        StructField("extra", StringType()),
    ]
)


def read_target_csvs(
    spark: SparkSession, path_glob: str, encoding: str = "UTF-8"
) -> DataFrame:
    """S10+S11: globbed CSV read with imposed schema, bad lines dropped.

    DROPMALFORMED matches the reference's on_bad_lines='warn' (skip the
    row, keep the file — S3_interact.py:84); the input filename is kept
    as a column so the ledger (operators/incremental.py) can anti-join
    on it — replacing the reference's per-file Python loop with one
    scan. Encoding is explicit (the reference's utf-8→cp1252 retry
    becomes a parameter: re-read the failing glob with the fallback).
    """
    df = (
        spark.read.schema(TARGET_INPUT_SCHEMA)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .option("encoding", encoding)
        .csv(path_glob)
    )
    return df.withColumn("input_file", F.input_file_name())


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """S14: partitioned parquet read — one scan replaces the
    reference's loop of per-file get_object + BytesIO reads."""
    return spark.read.parquet(path)
