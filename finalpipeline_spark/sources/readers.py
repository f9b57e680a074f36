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


def read_target_csvs_with_fallback(
    spark: SparkSession,
    path_glob: str,
    encoding: str = "UTF-8",
    # Spark 4 whitelists CSV charsets; iso-8859-1 is the supported
    # stand-in for the reference's cp1252 (identical for the common
    # accented-letter code points).
    fallback_encoding: str = "iso-8859-1",
) -> DataFrame:
    """S11 with the reference's encoding fallback (S3_interact.py:82-95:
    read utf-8, on UnicodeDecodeError retry cp1252) — per FILE, not per
    job, and without a driver-side pandas loop.

    Spark never raises on a bad byte sequence: the charset decoder
    emits U+FFFD replacement characters instead, so a cp1252 file
    "reads" under utf-8 with silently corrupted text. Detection is
    therefore explicit: scan once in the primary encoding, aggregate
    the set of files containing U+FFFD (a per-file boolean — tiny,
    driver-safe like the ledger's new-file list), and re-read only
    those files in the fallback encoding. Clean files keep their
    single-scan plan; a mixed directory yields a two-scan union.

    A file legitimately containing U+FFFD in valid UTF-8 would re-read
    via the fallback — same acceptable ambiguity as the reference's
    whole-file retry.
    """
    utf8 = read_target_csvs(spark, path_glob, encoding=encoding)
    damaged_col = F.max(
        (
            F.coalesce(F.col("molecule_name"), F.lit("")).contains("�")
            | F.coalesce(F.col("smiles"), F.lit("")).contains("�")
            | F.coalesce(F.col("extra"), F.lit("")).contains("�")
        ).cast("int")
    )
    per_file = utf8.groupBy("input_file").agg(damaged_col.alias("damaged"))
    bad_files = [r.input_file for r in per_file.filter("damaged = 1").collect()]
    if not bad_files:
        return utf8
    clean = utf8.filter(~F.col("input_file").isin(bad_files))
    # csv() accepts a list of paths — re-read only the damaged files.
    refetched = (
        spark.read.schema(TARGET_INPUT_SCHEMA)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .option("encoding", fallback_encoding)
        .csv(bad_files)
        .withColumn("input_file", F.input_file_name())
    )
    return clean.unionByName(refetched)


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
