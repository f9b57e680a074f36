"""Python DataSource over versioned tables: batch snapshot/time-travel
reads and the change-data-feed stream source."""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 100).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )
    t.commit_append(
        spark.range(100, 130).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )
    return t


def test_batch_read_latest_and_time_travel(spark, vt):
    df = spark.read.format("versioned").option("root", vt.root).load()
    assert df.count() == 130
    assert set(df.columns) == {"id", "bucket"}
    v0 = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .option("version", "0")
        .load()
    )
    assert v0.count() == 100
    # values, not just counts: matches the native reader
    native = vt.read().selectExpr("id", "bucket")
    assert df.exceptAll(native).count() == 0
    assert native.exceptAll(df).count() == 0


def test_batch_read_is_partitioned_per_file(spark, vt):
    df = spark.read.format("versioned").option("root", vt.root).load()
    n_files = len(vt.manifest()["files"])
    assert df.rdd.getNumPartitions() == n_files


def test_stream_cdf_delivers_snapshot_then_deltas(spark, vt, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", vt.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # initial snapshot: both existing versions
    assert spark.read.parquet(out).count() == 130

    vt.commit_append(
        spark.range(130, 140).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )
    drain()  # only the delta should arrive
    got = spark.read.parquet(out)
    assert got.count() == 140
    assert got.select("id").distinct().count() == 140  # no double-delivery

    drain()  # nothing new: no rows added
    assert spark.read.parquet(out).count() == 140


def test_stream_rejects_content_mutation(spark, vt, tmp_path):
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", vt.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    vt.delete_where("id < 5")  # CoW delete: no row-level delta exists
    with pytest.raises(Exception, match="no row-level delta|StreamingQueryException"):
        drain()


def test_batch_filter_pushdown_prunes_files(spark, tmp_path):
    register_versioned_source(spark)
    vt = VersionedTable(spark, str(tmp_path / "vtp"))
    for lo in (0, 1000, 2000):
        vt.commit_append(
            spark.range(lo, lo + 100).selectExpr("id", "id * 2 as v").coalesce(1)
        )
    df = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .load()
        .filter("id >= 1000 and id < 1050")
    )
    # values exact (Spark re-applies the filter after pruning)
    assert sorted(r.id for r in df.collect()) == list(range(1000, 1050))
    # stats pruning dropped two of the three files at planning time
    assert df.rdd.getNumPartitions() == 1
    # a provably-empty predicate prunes everything
    empty = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .load()
        .filter("id = 999999")
    )
    assert empty.count() == 0
    assert empty.rdd.getNumPartitions() <= 1  # one empty split at most
