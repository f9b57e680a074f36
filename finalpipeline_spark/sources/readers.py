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
from pyspark.sql.types import LongType, StringType, StructField, StructType

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


DOCUMENT_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path_glob: str, keep_corrupt: bool = False
) -> DataFrame:
    """JSONL corpus reader — the dominant interchange format for
    training-data pipelines (one JSON document per line).

    Explicit schema (never infer at 100 TB: inference is a second full
    scan). Malformed lines never fail the job — a bad shard quarantines
    instead of killing a 10-hour run: ``keep_corrupt=False`` reads
    DROPMALFORMED (bad lines skipped at the scan); ``keep_corrupt=True``
    reads PERMISSIVE with the raw line in ``_corrupt_record`` for a
    dead-letter sink (NB Spark requires materializing before a query
    that touches ONLY the corrupt column —
    QUERY_ONLY_CORRUPT_RECORD_COLUMN). The input filename rides along
    for ledger anti-joins, exactly as with the CSV reader.
    """
    if keep_corrupt:
        schema = StructType(
            DOCUMENT_JSONL_SCHEMA.fields
            + [StructField("_corrupt_record", StringType())]
        )
        df = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path_glob)
        )
    else:
        # DROPMALFORMED only drops lines that fail to PARSE; a valid
        # JSON object whose field fails type coercion yields a null
        # field instead — so the required-key (identity) filter is
        # explicit.
        df = (
            spark.read.schema(DOCUMENT_JSONL_SCHEMA)
            .option("mode", "DROPMALFORMED")
            .json(path_glob)
            .filter(F.col("doc_id").isNotNull())
        )
    return df.withColumn("input_file", F.input_file_name())


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """JSONL writer (one JSON object per line, one file per partition)
    — the export half of the corpus interchange round-trip."""
    df.write.mode("overwrite").json(path)


def write_table_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink — the second columnar at-rest format (Hive-estate
    interchange). Same layout discipline as parquet: optional
    partition columns become directory partitions the scan can prune.
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_table_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Predicate pushdown and column pruning work exactly as
    with parquet (PushedFilters / ReadSchema in the formatted plan) —
    asserted in tests/test_sources.py."""
    return spark.read.orc(path)


def read_table_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan, gated: spark-avro is an external module (not bundled
    with a plain pyspark install), so absence is reported as a clear
    capability error instead of an opaque ClassNotFoundException.
    """
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # pragma: no cover - depends on jar presence
        raise NotImplementedError(
            "Avro requires the spark-avro package "
            "(--packages org.apache.spark:spark-avro_2.13:<version>)"
        ) from e
