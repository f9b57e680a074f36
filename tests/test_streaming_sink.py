"""foreachBatch upsert sink: streaming MERGE into a parquet gold table
with exactly-once effect across triggers (checkpoint = ledger; merge =
constraint-free upsert)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.streaming.sinks import stream_upsert_to_parquet

_SCHEMA = "user_id long, status string, version long"


def _drain(spark, src, gold, ckpt):
    q = stream_upsert_to_parquet(
        spark.readStream.schema(_SCHEMA).parquet(src + "/*"),
        gold,
        keys=["user_id"],
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)


def test_stream_upsert_gold_table(spark, tmp_path):
    src = str(tmp_path / "src")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "new", 1), (2, "new", 1), (3, "new", 1)], _SCHEMA
    ).write.parquet(src + "/b0")
    _drain(spark, src, gold, ckpt)
    t1 = spark.read.parquet(gold)
    assert t1.count() == 3
    assert t1.filter("status = 'new'").count() == 3

    # Second batch: update user 2, insert user 4. Users 1/3 survive.
    spark.createDataFrame(
        [(2, "active", 2), (4, "new", 1)], _SCHEMA
    ).write.parquet(src + "/b1")
    _drain(spark, src, gold, ckpt)
    t2 = spark.read.parquet(gold)
    assert t2.count() == 4  # keyed: no duplicate user 2
    got = {r.user_id: (r.status, r.version) for r in t2.collect()}
    assert got[2] == ("active", 2)  # incoming won
    assert got[1] == ("new", 1) and got[3] == ("new", 1)  # survivors
    assert got[4] == ("new", 1)  # inserted

    # Nothing new: no batch fires, the table is untouched.
    _drain(spark, src, gold, ckpt)
    assert spark.read.parquet(gold).count() == 4

    # Same data re-delivered as a NEW file (fresh checkpoint entry):
    # the merge converges — no duplicates, same values (idempotence).
    spark.createDataFrame(
        [(2, "active", 2), (4, "new", 1)], _SCHEMA
    ).write.parquet(src + "/b1_redelivered")
    _drain(spark, src, gold, ckpt)
    t3 = spark.read.parquet(gold)
    assert t3.count() == 4
    assert {r.user_id: (r.status, r.version) for r in t3.collect()} == got
