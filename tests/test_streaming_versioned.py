"""Streaming append sink onto the versioned table: each micro-batch is
one atomic commit; replayed epochs are recognized by commit identity
and skipped (exactly-once effect); history stays time-travelable."""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.versioned import VersionedTable
from finalpipeline_spark.streaming.sinks import stream_append_versioned

_SCHEMA = "id long, v string"


def _drain(spark, src, root, ckpt):
    q = stream_append_versioned(
        spark.readStream.schema(_SCHEMA).parquet(src + "/*"),
        root,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)


def test_stream_versioned_append_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "a"), (2, "a")], _SCHEMA).write.parquet(src + "/b0")
    _drain(spark, src, root, ckpt)
    vt = VersionedTable(spark, root)
    assert vt.read().count() == 2
    v_after_b0 = vt.latest_version()

    spark.createDataFrame([(3, "b")], _SCHEMA).write.parquet(src + "/b1")
    _drain(spark, src, root, ckpt)
    assert vt.read().count() == 3
    # each epoch is one commit; the first snapshot is still pinnable
    assert vt.read(version=v_after_b0).count() == 2
    # and the second epoch is retrievable as a file-level delta
    delta = vt.read_changes(since_version=v_after_b0)
    assert [r.id for r in delta.collect()] == [3]

    # replayed epoch: a crash between table commit and checkpoint
    # commit re-delivers epoch 1 — run the sink's own per-epoch unit
    # again with the same identity; it must recognize and skip it.
    from finalpipeline_spark.streaming.sinks import versioned_append_epoch

    batch = spark.read.schema(_SCHEMA).parquet(src + "/b1")
    n_versions = len(vt.versions())
    assert versioned_append_epoch(batch, root, ckpt.rstrip("/"), 1) is False
    assert len(vt.versions()) == n_versions
    assert vt.read().count() == 3
    # a genuinely new epoch through the same unit does commit
    assert versioned_append_epoch(batch, root, ckpt.rstrip("/"), 99) is True
    assert vt.read().count() == 4
    vt.rollback(n_versions - 1)  # restore pre-99 content for the drain check
    n_versions = len(vt.versions())

    # a drain with no new files fires no batch and adds no version
    _drain(spark, src, root, ckpt)
    assert len(vt.versions()) == n_versions
    assert vt.read().count() == 3


def test_stream_append_respects_check_constraints(spark, tmp_path):
    """A violating micro-batch must FAIL the epoch commit (surfacing as
    a stream error) rather than silently landing bad rows — and no
    version bump happens, so the retried epoch starts clean."""
    from finalpipeline_spark.sources.versioned import (
        ConstraintViolationError,
        VersionedTable,
    )
    from finalpipeline_spark.streaming.sinks import versioned_append_epoch

    root = str(tmp_path / "vt")
    vt = VersionedTable(spark, root)
    vt.commit_overwrite(
        spark.createDataFrame([(1, "a")], _SCHEMA)
    )
    vt.add_constraint("id_pos", "id > 0")
    v = vt.latest_version()
    bad = spark.createDataFrame([(2, "b"), (-7, "x")], _SCHEMA)
    with pytest.raises(ConstraintViolationError, match="id_pos"):
        versioned_append_epoch(bad, root, "ck", 0)
    assert vt.latest_version() == v
    good = spark.createDataFrame([(2, "b")], _SCHEMA)
    assert versioned_append_epoch(good, root, "ck", 0) is True
    assert vt.read().count() == 2
