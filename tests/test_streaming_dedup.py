"""Streaming dedup and stream-stream join agree with their batch
equivalents when the whole input is replayed through the stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.streaming.dedup import (
    stream_click_purchase_join,
    stream_dedup_exact,
    stream_enrich_with_dim,
)
from finalpipeline_spark.streaming.windows import EVENT_SCHEMA, events_with_timestamp


def _drain(stream_df, name, ckpt):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    ev = events_with_timestamp(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    # The same records delivered twice (two files), plus a disjoint file:
    # re-delivery is the failure mode the ledger/checkpoint can't catch
    # (distinct files, duplicate CONTENT).
    ev.filter("event_id % 3 = 0").write.parquet(src + "/a")
    ev.filter("event_id % 3 = 0").write.parquet(src + "/a_redelivered")
    ev.filter("event_id % 3 = 1").write.parquet(src + "/b")

    deduped = stream_dedup_exact(
        spark.readStream.schema(EVENT_SCHEMA).parquet(src + "/*")
    )
    _drain(deduped, "dedup_sink", str(tmp_path / "ckpt"))

    got = spark.table("dedup_sink")
    expect = ev.filter("event_id % 3 IN (0, 1)")
    assert got.count() == expect.count()
    assert got.select("event_id").distinct().count() == expect.count()


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    ev = events_with_timestamp(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks_b = ev.filter("event_type = 'click'")
    purch_b = ev.filter("event_type = 'purchase'")
    clicks_b.write.parquet(csrc + "/c0")
    purch_b.write.parquet(psrc + "/p0")

    joined = stream_click_purchase_join(
        spark.readStream.schema(EVENT_SCHEMA).parquet(csrc + "/*"),
        spark.readStream.schema(EVENT_SCHEMA).parquet(psrc + "/*"),
    )
    _drain(joined, "attr_sink", str(tmp_path / "ckpt2"))

    streamed = spark.table("attr_sink").select("click_id", "purchase_id")
    batch = (
        clicks_b.alias("c")
        .join(
            purch_b.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 hour")),
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
        )
    )
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    ev = events_with_timestamp(spark, sf_dir).select("event_id", "user_id", "value")
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn(
            "segment", F.concat(F.lit("seg_"), (F.col("user_id") % 3).cast("string"))
        )
        # leave one known user unmatched to exercise the left side
        .filter("user_id != 1")
    )
    src = str(tmp_path / "src_enrich")
    ev.write.parquet(src + "/b0")
    stream = spark.readStream.schema("event_id long, user_id long, value double").parquet(
        src + "/*"
    )
    enriched = stream_enrich_with_dim(stream, dim, "user_id")
    _drain(enriched, "enriched_stream", str(tmp_path / "ckpt_enrich"))

    got = spark.table("enriched_stream")
    exp = ev.join(dim, "user_id", "left")
    assert got.count() == ev.count()  # left join keeps every event
    assert got.select(*sorted(got.columns)).exceptAll(
        exp.select(*sorted(exp.columns))
    ).count() == 0
    # The dim-less user survives with a null segment.
    assert got.filter("user_id = 1 AND segment IS NULL").count() == ev.filter(
        "user_id = 1"
    ).count()
