"""Structured Streaming surface (SURVEY.md §2.8).

The reference's only 'streaming' is a hand-rolled processed-file
ledger (tanimoto.py:28-58); its Spark equivalent is the file-source
checkpoint, and the windowed/sessionized operators are built-ins. The
batch analogues used for oracle checking live in queries/events.py;
this module is the true streaming path:

  * file-source ingestion with Trigger.AvailableNow — the exact
    replacement for the monthly-cron + ledger pattern (I1/I3): each
    run processes only files the checkpoint hasn't seen
  * event-time tumbling windows with a watermark for late data
  * session_window (the built-in counterpart of the gaps-and-islands
    batch sessionization)

At scale: state lives in the state store keyed by (window, group);
watermark bounds state size; file-source checkpointing replaces the
ledger table with exactly-once semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.tables import load_table

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def events_with_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a proper TIMESTAMP event-time column (the raw table
    stores nanoseconds; see tables.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))


def tumbling_hourly(df: DataFrame, time_col: str = "ts") -> DataFrame:
    """1-hour tumbling window counts/sums — works on batch AND
    streaming DataFrames (same code path, Spark's unified model)."""
    return (
        df.groupBy(F.window(time_col, "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Built-in session_window — the streaming-capable counterpart of
    queries/events.py::events_sessionize (gaps-and-islands)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_events(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over parquet event files (checkpoint = the
    ledger: each file processed exactly once across runs)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)


def stream_hourly_counts(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming tumbling-window agg with late-data watermark."""
    return tumbling_hourly(stream_events(spark, source_dir).withWatermark("ts", watermark))
