"""Exactly-once across restarts: the file-source checkpoint is the
streaming replacement for the reference's used_input_files ledger
(SURVEY.md I1). Stop the query, add a new file, restart with the same
checkpoint — every event is counted exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.streaming.windows import events_with_timestamp


def _run_once(spark, src, ckpt, out):
    q = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .parquet(src + "/*")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .writeStream.format("memory")
        .queryName(out)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_checkpoint_is_the_ledger(spark, sf_dir, tmp_path):
    ev = events_with_timestamp(spark, sf_dir).select("event_id", "user_id", "value")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    ev.filter("event_id % 2 = 0").write.parquet(src + "/batch0")
    _run_once(spark, src, ckpt, "profiles_run1")
    first = spark.table("profiles_run1").agg(F.sum("n")).first()[0]
    assert first == ev.filter("event_id % 2 = 0").count()

    # New arrival, then restart from the SAME checkpoint.
    ev.filter("event_id % 2 = 1").write.parquet(src + "/batch1")
    _run_once(spark, src, ckpt, "profiles_run2")
    total = spark.table("profiles_run2").agg(F.sum("n")).first()[0]
    # Exactly once: old file not re-counted, new file counted.
    assert total == ev.count()

    # Re-running with nothing new does no work at all: no batch fires,
    # the sink receives nothing ("if there are no new files, silver
    # tables are not modified" — reference readme.MD:46-48).
    _run_once(spark, src, ckpt, "profiles_run3")
    assert spark.table("profiles_run3").count() == 0
