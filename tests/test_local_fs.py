"""The local_fs adapter must reproduce the Hadoop FileSystem semantics
the commit protocol reasons about — exclusive create, no-clobber rename
claims, delete/list behavior, FNF signaling — and VersionedTable must
select it exactly for local roots."""

from __future__ import annotations

import os
import time

import pytest

from finalpipeline_spark.sources.local_fs import (
    LocalFs,
    LocalPath,
    default_fs_is_local,
    is_local_root,
)
from finalpipeline_spark.sources.versioned import VersionedTable
from finalpipeline_spark.sources.versioned_base import (
    _is_file_not_found,
    parse_ddl_cached,
)


def test_is_local_root():
    assert is_local_root("/tmp/x/y")
    assert is_local_root("relative/path")
    assert not is_local_root("hdfs://nn/warehouse/t")
    assert not is_local_root("s3a://bucket/t")
    assert not is_local_root("file:/tmp/x")
    assert not is_local_root("file:///tmp/x")


class _StubSC:
    """sparkContext stub exposing exactly the py4j chain
    default_fs_is_local walks, with a configurable fs.defaultFS."""

    def __init__(self, default_fs):
        self._default_fs = default_fs

    @property
    def _jsc(self):
        outer = self

        class _JSC:
            def hadoopConfiguration(self):
                class _Conf:
                    def get(self, key, default):
                        return outer._default_fs or default

                return _Conf()

        return _JSC()


class _StubSpark:
    def __init__(self, default_fs):
        self.sparkContext = _StubSC(default_fs)


def test_default_fs_gate():
    # Hadoop's own default (unset → file:///) is local
    assert default_fs_is_local(_StubSpark(None))
    assert default_fs_is_local(_StubSpark("file:///"))
    # a cluster default makes scheme-less roots REMOTE: a local-path
    # string resolves to HDFS, so the pure-Python adapter must not
    # engage (split-brain guard)
    assert not default_fs_is_local(_StubSpark("hdfs://namenode:8020"))
    assert not default_fs_is_local(_StubSpark("s3a://bucket"))
    # failure to read the conf is conservative: NOT local
    assert not default_fs_is_local(object())


def test_versioned_table_selects_adapter_by_resolved_fs(spark, tmp_path):
    # real session: fs.defaultFS is file-scheme → local root gets the
    # pure-Python adapter
    t = VersionedTable(spark, str(tmp_path / "sel"))
    assert t._fs_local
    # same path string under a cluster defaultFS must NOT: simulate by
    # poisoning the memo for this context (the decision input is the
    # resolved scheme, not the path shape)
    from finalpipeline_spark.sources import local_fs as lf

    sc = spark.sparkContext
    lf._DEFAULT_FS_MEMO[id(sc)] = (sc, False)
    try:
        t2 = VersionedTable(spark, str(tmp_path / "sel2"))
        assert not t2._fs_local
    finally:
        del lf._DEFAULT_FS_MEMO[id(sc)]


def test_exclusive_create_is_atomic_claim(tmp_path):
    fs = LocalFs()
    p = LocalPath(str(tmp_path / "deep" / "dir" / "v0.json"))
    out = fs.create(p, False)  # parents auto-created like Hadoop
    out.write(bytearray(b"{}"))
    out.close()
    assert fs.exists(p)
    with pytest.raises(FileExistsError):
        fs.create(p, False)  # the loser of a claim race must raise
    # overwrite=True truncates in place (tombstone rewrite path)
    out = fs.create(p, True)
    out.write(b"xy")
    out.close()
    with open(str(p), "rb") as fh:
        assert fh.read() == b"xy"


def test_rename_false_on_failure_and_clobber_parity(tmp_path):
    fs = LocalFs()
    src = LocalPath(str(tmp_path / "a"))
    dst = LocalPath(str(tmp_path / "b"))
    assert not fs.rename(src, dst)  # missing source: False, no raise
    fs.create(src, False).close()
    assert fs.rename(src, dst)
    assert not fs.exists(src) and fs.exists(dst)
    # clobbering rename over an existing dst succeeds (POSIX renameTo —
    # the documented LocalFileSystem behavior _rename_claim pre-checks
    # around on both backends)
    fs.create(src, False).close()
    assert fs.rename(src, dst)


def test_delete_and_list_semantics(tmp_path):
    fs = LocalFs()
    d = tmp_path / "dir"
    d.mkdir()
    (d / "f1").write_bytes(b"1")
    (d / ".hidden").write_bytes(b"2")
    sub = d / "sub"
    sub.mkdir()
    sts = {st.getPath().getName(): st for st in fs.listStatus(LocalPath(str(d)))}
    assert set(sts) == {"f1", ".hidden", "sub"}  # listing hides nothing
    assert sts["f1"].isFile() and not sts["f1"].isDirectory()
    assert sts["sub"].isDirectory() and not sts["sub"].isFile()
    assert sts["f1"].getLen() == 1
    assert abs(sts["f1"].getModificationTime() - time.time() * 1000) < 60_000
    # non-recursive delete refuses a non-empty dir (returns False);
    # missing path is False, not a raise — both per Hadoop-local use
    (sub / "x").write_bytes(b"")
    assert not fs.delete(LocalPath(str(sub)), False)
    assert fs.exists(LocalPath(str(sub)))
    assert fs.delete(LocalPath(str(sub)), True)
    assert not fs.delete(LocalPath(str(sub)), True)
    # listStatus of a vanished dir raises (Hadoop raises FNF)
    with pytest.raises(FileNotFoundError):
        fs.listStatus(LocalPath(str(sub)))


def test_fnf_signal_recognized():
    assert _is_file_not_found(FileNotFoundError("x"))
    assert not _is_file_not_found(ValueError("x"))


def test_versioned_table_selects_adapter_and_protocol_runs(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    assert isinstance(t._fs, LocalFs) and t._fs_local
    t.commit_overwrite(spark.createDataFrame([(1,)], "id bigint"))
    t.commit_append(spark.createDataFrame([(2,)], "id bigint"))
    assert t.latest_version() == 1
    assert t.read().count() == 2
    assert t.read(version=0).count() == 1
    # aborted-fragment recovery drives the rename-claim machinery
    frag = os.path.join(t.root, "_log", "v%012d.json" % 2)
    with open(frag, "w") as fh:
        fh.write("{not json")
    old = time.time() - 3600
    os.utime(frag, (old, old))
    t.commit_append(spark.createDataFrame([(3,)], "id bigint"))
    assert t.latest_version() == 2
    assert t.read().count() == 3


def test_parse_ddl_cached_fresh_equal_objects():
    ddl = "struct<a:bigint,b:array<string>,c:decimal(12,2)>"
    first = parse_ddl_cached(ddl)
    second = parse_ddl_cached(ddl)
    assert first == second and first is not second  # no aliasing
    assert parse_ddl_cached("string").typeName() == "string"
    with pytest.raises(Exception):
        parse_ddl_cached("not a <<type")
