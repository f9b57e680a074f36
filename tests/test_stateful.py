"""Custom stateful streaming operator test: the per-user running
profile accumulated across micro-batches must equal the batch
aggregate over all events."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.streaming.stateful import running_user_profiles
from finalpipeline_spark.streaming.windows import events_with_timestamp


def test_stateful_profiles_match_batch(spark, sf_dir, tmp_path):
    ev = events_with_timestamp(spark, sf_dir).select(
        "user_id", "value", F.col("ts_epoch_s").alias("es")
    )
    src = str(tmp_path / "src")
    # Two arrival chunks so state must carry across micro-batches.
    ev.filter("es % 2 = 0").write.parquet(src + "/c0")
    ev.filter("es % 2 = 1").write.parquet(src + "/c1")

    stream = spark.readStream.schema("user_id long, value double, es long").parquet(
        src + "/*"
    )
    q = (
        running_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # Latest profile per user (update mode appends one row per batch).
    out = spark.table("profiles")
    latest = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("last_seen_epoch_s").alias("last_seen_epoch_s"),
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("es").alias("last_seen_epoch_s"),
    )
    assert latest.exceptAll(expected).count() == 0
    assert expected.exceptAll(latest).count() == 0


def test_transform_with_state_matches_batch(spark, sf_dir, tmp_path):
    import pytest

    from finalpipeline_spark.streaming.stateful import running_user_profiles_tws

    if running_user_profiles_tws is None:
        pytest.skip("transformWithState needs protobuf (not in this env)")

    ev = events_with_timestamp(spark, sf_dir).select(
        "user_id", "value", F.col("ts_epoch_s").alias("es")
    )
    src = str(tmp_path / "src")
    ev.filter("es % 2 = 0").write.parquet(src + "/c0")
    ev.filter("es % 2 = 1").write.parquet(src + "/c1")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "user_id long, value double, es long"
        ).parquet(src + "/*")
        q = (
            running_user_profiles_tws(stream)
            .writeStream.format("memory")
            .queryName("profiles_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    latest = spark.table("profiles_tws").groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("last_seen_epoch_s").alias("last_seen_epoch_s"),
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("es").alias("last_seen_epoch_s"),
    )
    assert latest.exceptAll(expected).count() == 0
    assert expected.exceptAll(latest).count() == 0
