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


def test_stream_replicate_versioned_cdc_loop(spark, tmp_path):
    """Full streaming CDC: producer versioned table → changeFeed
    stream → per-epoch atomic merge into a consumer. The consumer
    converges across appends AND CoW deletes/replaces, bootstraps
    itself from the initial snapshot, and a replayed epoch is a
    no-op."""
    from pyspark.sql import functions as SF

    from finalpipeline_spark.streaming.sinks import (
        replicate_epoch,
        stream_replicate_versioned,
    )

    register_versioned_source(spark)
    prod = VersionedTable(spark, str(tmp_path / "prod"))
    cons_root = str(tmp_path / "cons")
    ckpt = str(tmp_path / "rckpt")
    prod.commit_overwrite(
        spark.range(0, 50).selectExpr("id", "concat('v', id) AS payload")
    )

    def sync():
        q = stream_replicate_versioned(
            spark, prod.root, cons_root, keys=["id"], checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    def rows(vt_root):
        return sorted(
            tuple(r) for r in VersionedTable(spark, vt_root).read().collect()
        )

    sync()  # bootstrap from initial snapshot
    assert rows(cons_root) == sorted(tuple(r) for r in prod.read().collect())

    prod.commit_append(
        spark.range(50, 60).selectExpr("id", "concat('v', id) AS payload")
    )
    prod.delete_where("id < 5")
    prod.replace_where(
        "id >= 58", spark.range(100, 103).selectExpr("id", "'r' AS payload")
    )
    sync()
    assert rows(cons_root) == sorted(tuple(r) for r in prod.read().collect())

    # replayed epoch: same (checkpoint, epoch) identity → no new commit
    cons = VersionedTable(spark, cons_root)
    v = cons.latest_version()
    replay = (
        prod.read()
        .limit(1)
        .withColumn("_change_type", SF.lit("insert"))
        .withColumn("_commit_version", SF.lit(999))
    )
    assert replicate_epoch(replay, cons_root, ["id"], ckpt.rstrip("/"), 0) is False
    assert cons.latest_version() == v
    # idle sync moves nothing
    sync()
    assert rows(cons_root) == sorted(tuple(r) for r in prod.read().collect())


def test_stream_replicate_across_schema_evolution(spark, tmp_path):
    """Producer evolves ADDITIVELY mid-replication (VERDICT r4 item 5):
    the next sync (stream restart re-resolves the evolved schema from
    the latest manifest) must carry the new column through the change
    feed — pre-evolution commits NULL-backfill — and the consumer's
    merge follows the evolution instead of silently projecting it
    away."""
    from finalpipeline_spark.streaming.sinks import stream_replicate_versioned

    register_versioned_source(spark)
    prod = VersionedTable(spark, str(tmp_path / "eprod"))
    cons_root = str(tmp_path / "econs")
    ckpt = str(tmp_path / "eckpt")
    prod.commit_overwrite(
        spark.range(0, 30).selectExpr("id", "concat('v', id) AS payload")
    )

    def sync():
        q = stream_replicate_versioned(
            spark, prod.root, cons_root, keys=["id"], checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    sync()  # bootstrap pre-evolution
    cons = VersionedTable(spark, cons_root)
    assert cons.read().columns == ["id", "payload"]

    # additive evolution + post-evolution lifecycle on the producer
    widened = spark.range(30, 40).selectExpr(
        "id", "concat('v', id) AS payload", "cast(id * 2 as bigint) AS score"
    )
    prod.commit_append(widened, merge_schema=True)
    prod.delete_where("id < 3")
    sync()  # stream restart resolves the evolved schema
    assert cons.read().columns == ["id", "payload", "score"]
    assert sorted(tuple(r) for r in cons.read().collect()) == sorted(
        tuple(r) for r in prod.read().collect()
    )


def test_stream_replicate_fan_in_two_producers(spark, tmp_path):
    """Streaming fan-in: two producers' change feeds drain into ONE
    consumer through separate checkpoints (separate epoch identities),
    folding disjoint key spaces; after each drain pair the consumer
    equals the union of producer snapshots."""
    from finalpipeline_spark.streaming.sinks import stream_replicate_versioned

    register_versioned_source(spark)
    pa = VersionedTable(spark, str(tmp_path / "fpa"))
    pb = VersionedTable(spark, str(tmp_path / "fpb"))
    cons_root = str(tmp_path / "fcons")
    cka, ckb = str(tmp_path / "fcka"), str(tmp_path / "fckb")
    pa.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "concat('a', id) AS payload")
    )
    pb.commit_overwrite(
        spark.range(1000, 1020).selectExpr("id", "concat('b', id) AS payload")
    )

    def sync(root, ckpt):
        q = stream_replicate_versioned(
            spark, root, cons_root, keys=["id"], checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    sync(pa.root, cka)
    sync(pb.root, ckb)
    cons = VersionedTable(spark, cons_root)

    def union_rows():
        return sorted(
            tuple(r) for r in pa.read().unionByName(pb.read()).collect()
        )

    assert sorted(tuple(r) for r in cons.read().collect()) == union_rows()

    # interleaved post-bootstrap lifecycle, drains in swapped order
    pa.delete_where("id < 5")
    pb.commit_append(
        spark.range(1020, 1030).selectExpr("id", "concat('b', id) AS payload")
    )
    sync(pb.root, ckb)
    sync(pa.root, cka)
    assert sorted(tuple(r) for r in cons.read().collect()) == union_rows()
