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


def test_stream_epochs_into_identity_generated_table(spark, tmp_path):
    """Streaming appends compose with r8's engine-assigned columns:
    each micro-batch epoch gets fresh, unique, monotone identity values
    and computed generated columns, and a FULL RE-DELIVERY of every
    epoch (crash between table commit and checkpoint commit) is a
    no-op — the (sink, epoch) commit identity short-circuits before any
    identity assignment runs, so replays neither burn nor re-assign
    ids."""
    from finalpipeline_spark.sources.versioned import VersionedTable
    from finalpipeline_spark.streaming.sinks import versioned_append_epoch

    root = str(tmp_path / "ident_sink")
    vt = VersionedTable(spark, root)
    vt.commit_overwrite(spark.range(0).selectExpr("id as k"))
    vt.add_identity_column("rid", start=1000, step=7)
    vt.add_generated_column("k2", "bigint", "k * k")

    def batch(lo, hi):
        return spark.range(lo, hi).selectExpr("id as k")

    epochs = [(0, (0, 5)), (1, (5, 9)), (2, (9, 12))]
    seen_after_epoch = {}
    for eid, (lo, hi) in epochs:
        assert versioned_append_epoch(batch(lo, hi), root, "ck", eid)
        seen_after_epoch[eid] = {r.k: r.rid for r in vt.read().collect()}
    v_done = vt.latest_version()

    rows = {r.k: r for r in vt.read().collect()}
    assert len(rows) == 12
    rids = [r.rid for r in rows.values()]
    assert len(set(rids)) == 12 and all((v - 1000) % 7 == 0 for v in rids)
    # monotone ACROSS epochs: every epoch's fresh ids sit strictly
    # above the previous watermark (stats-derived)
    e0 = {seen_after_epoch[0][k] for k in range(0, 5)}
    e1 = {seen_after_epoch[1][k] for k in range(5, 9)}
    e2 = {seen_after_epoch[2][k] for k in range(9, 12)}
    assert min(e1) > max(e0) and min(e2) > max(e1)
    # generated column computed per micro-batch
    assert all(r.k2 == r.k * r.k for r in rows.values())

    # full re-delivery of every epoch: zero new commits, ids untouched
    for eid, (lo, hi) in epochs:
        assert not versioned_append_epoch(batch(lo, hi), root, "ck", eid)
    assert vt.latest_version() == v_done
    after = {r.k: r.rid for r in vt.read().collect()}
    assert after == {k: r.rid for k, r in rows.items()}
