"""End-to-end lakehouse streaming loop: a Structured Streaming
producer appends micro-batches to a versioned table
(streaming/sinks.stream_append_versioned, one atomic commit per epoch)
and an independent Structured Streaming consumer tails the SAME table
through the Python DataSource CDF stream
(``spark.readStream.format("versioned")``), resuming from its own
checkpoint.  The two halves were previously tested separately; this
drives the full producer → commit log → consumer path and checks
exactly-once accounting on both sides: a replayed producer epoch
commits nothing, and the consumer receives every produced row exactly
once across multiple drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.versioned import VersionedTable
from finalpipeline_spark.streaming.sinks import (
    stream_append_versioned,
    versioned_append_epoch,
)

_SCHEMA = "id long, payload string"


def _produce(spark, src, root, ckpt):
    q = stream_append_versioned(
        spark.readStream.schema(_SCHEMA).parquet(src + "/*"), root, ckpt
    )
    q.awaitTermination(120)


def _consume(spark, root, out, ckpt):
    q = (
        spark.readStream.format("versioned")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _rows(spark, path):
    try:
        return sorted(r["id"] for r in spark.read.parquet(path).collect())
    except Exception:
        return []


def test_producer_log_consumer_exactly_once(spark, tmp_path):
    register_versioned_source(spark)
    src = str(tmp_path / "src")
    root = str(tmp_path / "vt")
    out = str(tmp_path / "out")
    pckpt = str(tmp_path / "pckpt")
    cckpt = str(tmp_path / "cckpt")

    # epoch 1: producer lands rows 0..9 as one atomic commit
    spark.createDataFrame([(i, f"p{i}") for i in range(10)], _SCHEMA).write.parquet(
        src + "/b0"
    )
    _produce(spark, src, root, pckpt)
    vt = VersionedTable(spark, root)
    assert vt.read().count() == 10
    v_after_e1 = vt.latest_version()

    # a crash-replayed epoch must be a no-op on the log (commit identity)
    replay = spark.createDataFrame([(99, "dup")], _SCHEMA)
    assert versioned_append_epoch(replay, root, pckpt.rstrip("/"), 0) is False
    assert vt.latest_version() == v_after_e1

    # consumer drain 1: initial snapshot, exactly once
    _consume(spark, root, out, cckpt)
    assert _rows(spark, out) == list(range(10))

    # epoch 2: more rows; consumer resumes from its checkpoint and
    # receives ONLY the delta
    spark.createDataFrame([(i, f"p{i}") for i in range(10, 15)], _SCHEMA).write.parquet(
        src + "/b1"
    )
    _produce(spark, src, root, pckpt)
    _consume(spark, root, out, cckpt)
    assert _rows(spark, out) == list(range(15))  # no double delivery

    # idle drain on both sides: nothing moves
    _produce(spark, src, root, pckpt)
    _consume(spark, root, out, cckpt)
    assert _rows(spark, out) == list(range(15))
    # the log records one commit per non-empty epoch, each pinnable
    actions = [vt._read_manifest_file(v)["action"] for v in vt.versions()]
    assert actions == ["append", "append"]
    # per-epoch lineage: every commit carries its (checkpoint, epoch) id
    epochs = vt.committed_meta("sink_epoch")
    assert len(epochs) == 2 and all(e.startswith(pckpt.rstrip("/")) for e in epochs)
