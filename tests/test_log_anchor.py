"""Log anchors + manifest archival: the hot ``_log`` listing stays
O(commits since the last vacuum) at any table age, with anchored
manifests readable from ``_log/archive/`` by direct name probe."""

from __future__ import annotations

import os

import pytest

from finalpipeline_spark.sources.versioned import (
    VersionedTable,
    VersionNotFoundError,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).selectExpr("id", f"'{tag}' as tag")


def _log_names(root):
    return sorted(os.listdir(os.path.join(root, "_log")))


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=4
    )


def test_auto_anchor_every_interval(spark, table):
    table.commit_overwrite(_df(spark, 0, 5, "v0"))
    for i in range(1, 9):
        table.commit_append(_df(spark, 5 * i, 5 * i + 5, f"v{i}"))
    names = _log_names(table.root)
    assert "checkpoint-%012d.json" % 4 in names
    assert "checkpoint-%012d.json" % 8 in names
    assert table.versions() == list(range(9))
    assert table.latest_version() == 8


def test_vacuum_archives_anchored_manifests(spark, table):
    table.commit_overwrite(_df(spark, 0, 5, "v0"))
    for i in range(1, 7):
        table.commit_append(_df(spark, 5 * i, 5 * i + 5, f"v{i}"))
    before_rows = table.read().count()
    before_versions = table.versions()
    v2 = sorted(r.id for r in table.read(version=2).collect())
    table.vacuum(retain_last=3, grace_seconds=0)
    # hot log now holds only the latest anchor plus the LATEST manifest
    # (kept hot as defense-in-depth for racing directory listings)
    hot = [n for n in _log_names(table.root) if n != "archive"]
    assert hot == ["checkpoint-%012d.json" % 6, "v%012d.json" % 6]
    arch = sorted(
        os.listdir(os.path.join(table.root, "_log", "archive"))
    )
    assert arch == ["v%012d.json" % v for v in range(6)]
    # everything still works off the archive
    assert table.versions() == before_versions
    assert table.read().count() == before_rows
    assert table.versions_live() == [4, 5, 6]
    assert sorted(r.id for r in table.read(version=4).collect())
    assert table.history().count() == 3
    # expired (vacuumed) version errors cleanly, as before
    with pytest.raises(Exception, match="expired|version"):
        table.read(version=2)
    # new commits land in the hot log and read seamlessly
    table.commit_append(_df(spark, 100, 105, "v7"))
    assert table.latest_version() == 7
    assert table.read().count() == before_rows + 5


def test_vacuum_archival_preserves_reads_exactly(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt2"), checkpoint_interval=0)
    t.commit_overwrite(_df(spark, 0, 5, "v0"))
    for i in range(1, 5):
        t.commit_append(_df(spark, 5 * i, 5 * i + 5, f"v{i}"))
    full = sorted(r.id for r in t.read().collect())
    tt = sorted(r.id for r in t.read(version=2).collect())
    # vacuum with nothing expired (retain all live) still archives
    t.vacuum(retain_last=5, grace_seconds=0)
    assert sorted(r.id for r in t.read().collect()) == full
    assert sorted(r.id for r in t.read(version=2).collect()) == tt
    # CDC across an archived range
    delta = sorted(r.id for r in t.read_changes(since_version=1).collect())
    assert delta == list(range(10, 25))
    # second vacuum expires old versions: the flip lands on the ARCHIVE
    # copy (no hot resurrection); only the latest manifest stays hot
    t.vacuum(retain_last=1, grace_seconds=0)
    assert [
        n for n in _log_names(t.root) if n.startswith("v")
    ] == ["v%012d.json" % 4]
    assert t.versions_live() == [4]


def test_reader_racing_archival_finds_the_archive_copy(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt3"), checkpoint_interval=0)
    t.commit_overwrite(_df(spark, 0, 5, "v0"))
    t.commit_append(_df(spark, 5, 10, "v1"))
    m = t._read_manifest_file(0)
    # simulate a concurrent vacuum's archival rename mid-read
    arch_dir = os.path.join(t.root, "_log", "archive")
    os.makedirs(arch_dir, exist_ok=True)
    os.rename(
        os.path.join(t.root, "_log", "v%012d.json" % 0),
        os.path.join(arch_dir, "v%012d.json" % 0),
    )
    assert t._read_manifest_file(0) == m  # archive probe, not an error
    with pytest.raises(VersionNotFoundError):
        t._read_manifest_file(99)


def test_pyds_reads_across_archived_log(spark, tmp_path):
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt4"), checkpoint_interval=0)
    t.commit_overwrite(spark.range(0, 50).selectExpr("id"))
    t.commit_append(spark.range(50, 80).selectExpr("id"))
    t.commit_append(spark.range(80, 100).selectExpr("id"))
    t.vacuum(retain_last=3, grace_seconds=0)  # archives everything
    df = spark.read.format("versioned").option("root", t.root).load()
    assert df.count() == 100
    v0 = (
        spark.read.format("versioned")
        .option("root", t.root)
        .option("version", "0")
        .load()
    )
    assert v0.count() == 50
    # streaming source: initial snapshot + catch-up across the archive
    out = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ck4")
    q = (
        spark.readStream.format("versioned")
        .option("root", t.root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100


def test_racing_writers_and_vacuum_archival(spark, tmp_path):
    """Appenders racing a vacuum loop (anchor + archival every pass):
    every commit lands exactly once, the log stays contiguous across
    hot+archive, and no reader/recovery path errors — the 100 TB shape
    where table maintenance runs beside live ingest."""
    import threading

    t = VersionedTable(
        spark, str(tmp_path / "vtr2"), checkpoint_interval=3
    )
    t.commit_overwrite(_df(spark, 0, 5, "seed"))
    errors: list[BaseException] = []
    stop = threading.Event()

    def appender(worker: int) -> None:
        try:
            w = VersionedTable(
                spark, t.root, checkpoint_interval=3
            )
            def attempt(tt, w=worker, i=0):
                m = tt.manifest()  # ONE snapshot per attempt (CAS base)
                return tt._commit(
                    "append",
                    list(m["files"])
                    + tt._write_data_files(
                        _df(
                            spark,
                            1000 * (w + 1) + 10 * i,
                            1000 * (w + 1) + 10 * i + 5,
                            f"w{w}c{i}",
                        )
                    ),
                    m["schema"],
                    base_version=m["version"],
                )

            for i in range(6):
                w.commit_with_retry(
                    lambda tt, i=i: attempt(tt, i=i), attempts=30
                )
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def vacuumer() -> None:
        try:
            while not stop.is_set():
                # real-world grace: reclamation skips fresh files (the
                # in-flight-commit protection the contract requires with
                # live writers); ANCHORING + ARCHIVAL are grace-free and
                # exercised on every pass
                t.vacuum(retain_last=5, grace_seconds=3600)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=appender, args=(w,)) for w in range(3)]
    vac = threading.Thread(target=vacuumer)
    vac.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    stop.set()
    vac.join()
    assert errors == [], errors
    assert t.latest_version() == 18  # 1 overwrite + 3 workers x 6
    assert t.versions() == list(range(19))
    # exactly-once content: every worker's 30 rows present
    rows = t.read().count()
    assert rows == 5 + 3 * 6 * 5
    # the log is split across hot and archive but contiguous overall
    hot = {n for n in _log_names(t.root) if n.startswith("v")}
    arch = set(
        os.listdir(os.path.join(t.root, "_log", "archive"))
    ) if os.path.isdir(os.path.join(t.root, "_log", "archive")) else set()
    assert {"v%012d.json" % v for v in range(19)} <= (hot | arch)


def test_junk_log_names_do_not_break_listings(spark, table):
    """A stray file whose name merely looks like an anchor or manifest
    (someone drops ``verify.json`` or ``checkpoint-backup.json`` into
    _log/) must be skipped by every listing — not raise ValueError on
    the int parse and take down every read."""
    table.commit_overwrite(_df(spark, 0, 5, "v0"))
    table.commit_append(_df(spark, 5, 10, "v1"))
    log = os.path.join(table.root, "_log")
    for junk in ("verify.json", "checkpoint-backup.json", "vnotes.json"):
        with open(os.path.join(log, junk), "w") as fh:
            fh.write("{}")
    assert table.versions() == [0, 1]
    assert table.latest_version() == 1
    assert table.read().count() == 10
    # vacuum's archival pass must also tolerate the junk names
    table.commit_append(_df(spark, 10, 15, "v2"))
    table.vacuum(retain_last=1, grace_seconds=0)
    assert table.latest_version() == 2
    assert table.read().count() == 15


def test_write_anchor_rejects_uncommitted_version(spark, table):
    """An anchor asserts 0..V committed and listings TRUST it
    (contiguity): anchoring past the true head would make versions()
    report phantom versions forever and the next commit claim a slot
    past a permanent gap. write_anchor must refuse."""
    table.commit_overwrite(_df(spark, 0, 5, "v0"))
    table.commit_append(_df(spark, 5, 10, "v1"))
    with pytest.raises(ValueError, match="cannot anchor"):
        table.write_anchor(version=99)
    # the refused anchor left no file and the log is intact
    assert not any(
        n.startswith("checkpoint-") for n in _log_names(table.root)
    )
    assert table.versions() == [0, 1]
    # a committed version anchors fine — including an expired tombstone
    # (expired versions are still committed; the anchor assertion holds)
    assert table.write_anchor(version=1) == 1
    table.commit_append(_df(spark, 10, 15, "v2"))
    table.vacuum(retain_last=1, grace_seconds=0)  # expires 0 and 1
    assert table.write_anchor(version=0) == 0
    assert table.versions() == [0, 1, 2]
