"""Structured Streaming surface: file-source + watermark + windows via
Trigger.AvailableNow must agree with the batch computation, and
session_window must agree with the gaps-and-islands batch
sessionization."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.queries.registry import load_all
from finalpipeline_spark.streaming.windows import (
    events_with_timestamp,
    session_windows,
    stream_hourly_counts,
    tumbling_hourly,
)


def test_stream_matches_batch_tumbling(spark, sf_dir, tmp_path):
    ev = events_with_timestamp(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "stream_src")
    # Three arrival chunks — the file source must checkpoint through all.
    ev.filter("event_id % 3 = 0").write.parquet(src + "/c0")
    ev.filter("event_id % 3 = 1").write.parquet(src + "/c1")
    ev.filter("event_id % 3 = 2").write.parquet(src + "/c2")

    q = (
        stream_hourly_counts(spark, src + "/*")
        .writeStream.format("memory")
        .queryName("hourly_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.table("hourly_counts")
    batch = tumbling_hourly(ev)
    assert streamed.count() == batch.count()
    diff = streamed.select("window_start", "event_type", "n_events").exceptAll(
        batch.select("window_start", "event_type", "n_events")
    )
    assert diff.count() == 0


def test_session_window_matches_gaps_and_islands(spark, sf_dir):
    ev = events_with_timestamp(spark, sf_dir)
    builtin = session_windows(ev)
    per_user_builtin = (
        builtin.groupBy("user_id").count().withColumnRenamed("count", "n_sessions")
    )
    batch = load_all()["events_sessionize"].fn(spark, sf_dir)
    per_user_batch = (
        batch.groupBy("user_id").count().withColumnRenamed("count", "n_sessions")
    )
    diff = per_user_builtin.exceptAll(per_user_batch)
    assert diff.count() == 0
    # Event totals must match too (no event lost or double-counted).
    assert (
        builtin.agg(F.sum("n_events")).first()[0]
        == batch.agg(F.sum("n_events")).first()[0]
    )
