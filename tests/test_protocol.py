"""Reader/writer protocol gates (Delta's protocol-action contract,
applied per manifest): a manifest that uses a capability this build
would MISREAD must refuse loudly everywhere it is parsed — JVM reads,
Python-source batch/stream/CDF/history — and a table whose head demands
a newer writer must refuse new commits BEFORE claiming a version.
"""

from __future__ import annotations

import json
import os

import pytest

from finalpipeline_spark.sources import pyds
from finalpipeline_spark.sources.versioned import (
    SUPPORTED_READER_VERSION,
    ProtocolVersionError,
    VersionedTable,
)


@pytest.fixture()
def vt(spark, tmp_path):
    pyds.register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 20).selectExpr("id"))
    t.commit_append(spark.range(20, 30).selectExpr("id"))
    return t


def _stamp(root: str, version: int, **fields) -> None:
    p = os.path.join(root, "_log", "v%012d.json" % version)
    with open(p) as fh:
        m = json.load(fh)
    m.update(fields)
    with open(p, "w") as fh:
        json.dump(m, fh)
    pyds._invalidate_live_cache(root)
    pyds._PARSE_CACHE.clear()


def test_future_reader_version_refuses_everywhere(spark, vt):
    _stamp(vt.root, 1, reader=SUPPORTED_READER_VERSION + 97)
    # JVM surfaces
    with pytest.raises(ProtocolVersionError, match="reader protocol 99"):
        vt.manifest(1)
    with pytest.raises(ProtocolVersionError, match="upgrade"):
        vt.history()
    with pytest.raises(ProtocolVersionError, match="reader protocol"):
        vt.read().count()
    # version 0 predates the feature: still readable (per-manifest
    # gating, finer than Delta's table-wide protocol action)
    assert vt.read(version=0).count() == 20
    # Python-source surfaces: the snapshot planner resolves the FULL
    # live map (timestampAsOf etc.), so one future manifest refuses the
    # whole table — exactly Delta's table-wide protocol behavior
    # (coarser than the JVM's per-manifest gate, never less safe)
    with pytest.raises(Exception, match="reader protocol"):
        (
            spark.read.format("versioned")
            .option("root", vt.root)
            .load()
            .count()
        )
    with pytest.raises(Exception, match="reader protocol"):
        (
            spark.read.format("versioned")
            .option("root", vt.root)
            .option("version", "0")
            .load()
            .count()
        )
    with pytest.raises(Exception, match="reader protocol"):
        pyds.table_changes(spark, vt.root, 0).collect()


def test_future_writer_version_refuses_commits_not_reads(spark, vt):
    _stamp(vt.root, 1, writer=42)
    # reads stay fine: the writer gate protects INVARIANTS this build
    # would fail to maintain on new commits, not existing bytes
    assert vt.read().count() == 30
    with pytest.raises(ProtocolVersionError, match="writer protocol 42"):
        vt.commit_append(spark.range(30, 35).selectExpr("id"))
    # the refusal happened before any version claim: the log head is
    # unchanged and still readable
    assert vt.latest_version() == 1
    assert vt.read().count() == 30


def test_readd_commit_carries_reader_requirement(spark, vt):
    vt.add_column("tag", "string")
    vt.drop_column("tag")
    vt.add_column("tag", "string")  # re-add: cmap feature, reader 2
    m = vt.manifest()
    assert m["action"] == "readd_column"
    assert m["reader"] == 2
    # this build supports it: everything still reads
    assert vt.read().count() == 30
    assert (
        spark.read.format("versioned")
        .option("root", vt.root)
        .load()
        .count()
        == 30
    )


def test_reader_requirement_sticky_table_wide(spark, vt):
    """Delta's protocol action is table-wide: once a commit demands
    reader N, every DESCENDANT manifest carries it — a pre-cmap reader
    that refused the readd commit must refuse the next append too (its
    file list still holds the cmap'd entries it would misread)."""
    vt.add_column("tag", "string")
    vt.drop_column("tag")
    vt.add_column("tag", "string")  # re-add: cmap feature, reader 2
    assert vt.manifest()["reader"] == 2
    vt.commit_append(
        spark.range(30, 35).selectExpr("id", "cast(null as string) as tag")
    )
    assert vt.manifest()["reader"] == 2  # carried forward
    vt.delete_where("id >= 33")
    assert vt.manifest()["reader"] == 2
    vt.optimize()
    assert vt.manifest()["reader"] == 2
    # a build that only speaks reader 1 refuses the APPEND manifest,
    # not just the readd commit itself
    # the constant's one patchable owner is versioned_base (the
    # protocol mixins resolve it dynamically through that module)
    import finalpipeline_spark.sources.versioned_base as V

    readd_v = None
    for v in vt.versions():
        if vt.manifest(v).get("action") == "readd_column":
            readd_v = v
    old = V.SUPPORTED_READER_VERSION
    V.SUPPORTED_READER_VERSION = 1
    try:
        with pytest.raises(ProtocolVersionError, match="reader protocol 2"):
            vt.manifest()  # the head (an append) still demands reader 2
        # pre-readd versions remain readable to the old build
        assert vt.manifest(readd_v - 1) is not None
    finally:
        V.SUPPORTED_READER_VERSION = old


def test_shallow_clone_imports_reader_requirement(spark, vt, tmp_path):
    """A shallow clone references the source's cmap'd files by pointer,
    so it must import the source's reader requirement; a deep clone
    rewrote every file (cmaps purged) and starts clean."""
    vt.add_column("tag", "string")
    vt.drop_column("tag")
    vt.add_column("tag", "string")  # reader-2 head
    shallow = vt.clone_to(str(tmp_path / "shallow"))
    assert shallow.manifest()["reader"] == 2
    deep = vt.clone_to(str(tmp_path / "deep"), deep=True)
    assert "reader" not in deep.manifest()
    assert deep.read().count() == vt.read().count()
