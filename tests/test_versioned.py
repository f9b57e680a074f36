"""Versioned parquet table: snapshots, time travel, copy-on-write
delete, rollback, concurrency, crash recovery, vacuum, stats pruning."""

from __future__ import annotations

import glob
import json
import os

import pytest

from finalpipeline_spark.sources.versioned import (
    ConcurrentCommitError,
    VersionedTable,
    VersionNotFoundError,
)


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "vt"))


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).selectExpr("id", f"'{tag}' as tag")


def _age(path, seconds=3600):
    """Back-date a planted manifest fragment past the recovery grace
    (a real crash fragment is permanently stale; tests plant fresh
    files)."""
    import time as _t

    t = _t.time() - seconds
    os.utime(path, (t, t))


def test_snapshot_and_time_travel(spark, table):
    c0 = table.commit_overwrite(_df(spark, 0, 100, "a"))
    c1 = table.commit_append(_df(spark, 100, 150, "b"))
    c2 = table.commit_overwrite(_df(spark, 0, 10, "c"))
    assert (c0.version, c1.version, c2.version) == (0, 1, 2)
    assert table.read().count() == 10
    assert table.read(version=1).count() == 150
    assert table.read(version=0).count() == 100
    # append carried v0's files by reference: no rewrite happened
    m0, m1 = table.manifest(0), table.manifest(1)
    assert {f["path"] for f in m0["files"]} <= {f["path"] for f in m1["files"]}


def test_delete_where_rewrites_only_hit_files(spark, table):
    # two appends → two commit dirs; delete touches only the second
    table.commit_overwrite(_df(spark, 0, 100, "a").coalesce(1))
    table.commit_append(_df(spark, 100, 200, "b").coalesce(1))
    before = table.manifest()["files"]
    info = table.delete_where("id >= 150")
    after = table.manifest()["files"]
    assert table.read().count() == 150
    assert info.action == "delete"
    # the untouched first file survives by reference (same path)
    a_paths = {f["path"] for f in before if f["stats"]["id"][1] < 100}
    assert a_paths <= {f["path"] for f in after}
    # the hit file's path is gone, replaced by a rewritten survivor file
    assert not {f["path"] for f in before if f["stats"]["id"][1] >= 150} & {
        f["path"] for f in after
    }
    # old version still reads the pre-delete rows (time travel unaffected)
    assert table.read(version=1).count() == 200


def test_delete_where_no_match_is_metadata_only(spark, table):
    table.commit_overwrite(_df(spark, 0, 50, "a"))
    files_before = {f["path"] for f in table.manifest()["files"]}
    table.delete_where("id > 1000000")
    assert {f["path"] for f in table.manifest()["files"]} == files_before
    assert table.read().count() == 50


def test_rollback_is_roll_forward(spark, table):
    table.commit_overwrite(_df(spark, 0, 100, "a"))
    table.commit_overwrite(_df(spark, 0, 5, "b"))
    info = table.rollback(0)
    assert info.version == 2
    assert table.read().count() == 100
    # history preserved: v1 still readable, log is append-only
    assert table.read(version=1).count() == 5
    hist = {r["version"]: r["action"] for r in table.history().collect()}
    assert hist == {0: "overwrite", 1: "overwrite", 2: "rollback"}


def test_concurrent_commit_conflict(spark, table):
    table.commit_overwrite(_df(spark, 0, 10, "a"))
    # simulate a racing writer that claimed v1 first
    other = VersionedTable(spark, table.root)
    other.commit_append(_df(spark, 10, 20, "b"))
    ddl = _df(spark, 0, 1, "x").schema.simpleString()
    files = table._write_data_files(_df(spark, 20, 30, "c"))
    manifest = {"version": 1, "parent": 0, "action": "append",
                "schema": ddl, "files": files}
    with pytest.raises(ConcurrentCommitError):
        table._write_manifest(manifest)
    # loser retries on the new latest and succeeds
    info = table._commit("append", table.manifest()["files"] + files, ddl)
    assert info.version == 2
    assert table.read().count() == 30


def test_aborted_commit_is_invisible_and_recoverable(spark, table):
    table.commit_overwrite(_df(spark, 0, 10, "a"))
    # crash A: data files written, manifest never created → invisible
    table._write_data_files(_df(spark, 0, 999, "orphan"))
    assert table.read().count() == 10
    # crash B: manifest truncated mid-write → ignored by readers
    log_dir = os.path.join(table.root, "_log")
    partial = os.path.join(log_dir, "v%012d.json" % 1)
    with open(partial, "w") as fh:
        fh.write('{"version": 1, "files": [')  # truncated JSON
    assert table.latest_version() == 0
    assert table.read().count() == 10
    # a FRESH fragment could be a live writer mid-write: grace-protected
    assert table.recover_log() == []
    _age(partial)  # the crash happened long ago
    # recover_log retires it so version 1 is claimable again
    assert table.recover_log() == [1]
    info = table.commit_append(_df(spark, 10, 20, "b"))
    assert info.version == 1
    assert table.read().count() == 20


def test_vacuum_reclaims_unreferenced_files(spark, table):
    table.commit_overwrite(_df(spark, 0, 100, "a"))
    table.commit_overwrite(_df(spark, 0, 10, "b"))   # v0's files now dead
    table._write_data_files(_df(spark, 0, 5, "orphan"))  # aborted commit
    deleted = table.vacuum(retain_last=1, grace_seconds=0)
    assert deleted  # v0's files + the orphan dir
    # live version intact, expired version errors cleanly
    assert table.read().count() == 10
    with pytest.raises(VersionNotFoundError):
        table.read(version=0)
    # every file referenced by the retained manifest still exists
    for f in table.manifest()["files"]:
        assert os.path.exists(os.path.join(table.root, f["path"]))
    # idempotent
    assert table.vacuum(retain_last=1, grace_seconds=0) == []


def test_read_pruned_skips_files_but_matches_full_scan(spark, table):
    # three appends with disjoint id ranges → three prunable files
    for lo in (0, 1000, 2000):
        table.commit_append(
            _df(spark, lo, lo + 100, f"r{lo}").coalesce(1)
        )
    pruned = table.read_pruned("id", 1000, 1050)
    full = table.read().filter("id between 1000 and 1050")
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    # provably fewer files scanned: the pruned plan reads 1 of 3 files
    n_scanned = len(pruned.inputFiles())
    assert n_scanned == 1
    assert len(full.inputFiles()) == 3


def test_manifest_stats_recorded(spark, table):
    table.commit_overwrite(_df(spark, 5, 50, "a"))
    m = table.manifest()
    mins = min(f["stats"]["id"][0] for f in m["files"])
    maxs = max(f["stats"]["id"][1] for f in m["files"])
    assert (mins, maxs) == (5, 49)
    assert sum(f["rows"] for f in m["files"]) == 45
    assert json.dumps(m)  # manifest is valid JSON end-to-end


def test_read_changes_is_file_level_delta(spark, table):
    table.commit_overwrite(_df(spark, 0, 100, "a"))
    table.commit_append(_df(spark, 100, 130, "b"))
    table.commit_append(_df(spark, 130, 140, "c"))
    delta = table.read_changes(since_version=0)
    assert sorted(r["id"] for r in delta.collect()) == list(range(100, 140))
    # delta scans only the new files, never the base snapshot
    assert len(delta.inputFiles()) < len(table.read().inputFiles())
    assert table.read_changes(since_version=2).count() == 0
    # crossing an overwrite has no row-level delta
    table.commit_overwrite(_df(spark, 0, 5, "d"))
    with pytest.raises(ValueError):
        table.read_changes(since_version=0)


def test_optimize_binpacks_and_clusters(spark, table):
    # many small appends → many small files
    for lo in range(0, 500, 100):
        table.commit_append(_df(spark, lo, lo + 100, "x").repartition(4))
    files_before = len(table.manifest()["files"])
    assert files_before >= 20
    before_rows = sorted(r["id"] for r in table.read().collect())
    v_before = table.latest_version()

    info = table.optimize(target_rows_per_file=300, cluster_by=["id"])
    assert info.action == "optimize"
    # content identical, far fewer files
    assert sorted(r["id"] for r in table.read().collect()) == before_rows
    assert info.n_files == 2  # ceil(500/300)
    # clustering tightened stats: file ranges are disjoint, so a point
    # lookup prunes to a single file
    assert len(table.read_pruned("id", 450, 460).inputFiles()) == 1
    # history preserved: the pre-optimize snapshot still reads
    assert table.read(version=v_before).count() == 500


def test_optimize_compact_carries_big_files_by_reference(spark, table):
    # one well-sized file + a small-file backlog from streaming appends
    table.commit_overwrite(_df(spark, 0, 1000, "big").coalesce(1))
    for lo in range(1000, 1200, 50):
        table.commit_append(_df(spark, lo, lo + 50, "s").coalesce(1))
    big = {f["path"] for f in table.manifest(0)["files"]}
    before_rows = sorted(r["id"] for r in table.read().collect())

    info = table.optimize(target_rows_per_file=500, mode="compact")
    assert info.action == "optimize"
    after = {f["path"] for f in table.manifest()["files"]}
    # the well-sized file was NOT rewritten; the 4 small files were
    # packed into ceil(200/500) = 1
    assert big <= after
    assert len(after) == 2
    assert sorted(r["id"] for r in table.read().collect()) == before_rows


def test_optimize_compact_folds_deletion_vectors(spark, table):
    table.commit_overwrite(_df(spark, 0, 1000, "a").coalesce(1))
    table.delete_where("id % 10 = 0", mode="mor")
    assert any(f.get("dv") for f in table.manifest()["files"])
    # the DV'd file is well-sized but must still be rewritten to fold
    # the vector away
    table.optimize(target_rows_per_file=500, mode="compact")
    after = table.manifest()["files"]
    assert not any(f.get("dv") for f in after)
    assert table.read().count() == 900
    assert table.count_rows() == 900


def test_optimize_compact_noop_when_packed(spark, table):
    table.commit_overwrite(_df(spark, 0, 1000, "a").coalesce(1))
    before = {f["path"] for f in table.manifest()["files"]}
    info = table.optimize(target_rows_per_file=500, mode="compact")
    # single clean well-sized file: metadata-only commit, same layout
    assert {f["path"] for f in table.manifest()["files"]} == before
    assert info.action == "optimize"
    assert table.read().count() == 1000


def test_bloom_point_lookup_skips_files(spark, tmp_path):
    from finalpipeline_spark.sources.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vtb"), bloom_col="id")
    # high-cardinality key appended in interleaved batches: min/max
    # ranges all overlap, so stats pruning is useless — only the bloom
    # can skip files for a point lookup
    for off in range(4):
        vt.commit_append(
            spark.range(0, 400).selectExpr(f"id * 4 + {off} as id").coalesce(1)
        )
    key = 4 * 123 + 2  # lives in exactly one file (off=2)
    got = vt.read_point_lookup(key)
    assert [r.id for r in got.collect()] == [key]
    n_opened = len(got.inputFiles())
    assert n_opened < 4  # bloom actually skipped files
    # spot-check a sample instead of all 1600 (driver-side loop cost)
    for r in vt.read().limit(25).collect():
        assert vt.read_point_lookup(r.id).count() == 1
    # absent key: zero rows (possibly zero files opened)
    assert vt.read_point_lookup(10_000_000).count() == 0
    # files committed without a bloom are conservatively kept
    vt_plain = VersionedTable(spark, vt.root)  # no bloom_col on writes
    vt_plain.commit_append(spark.range(5000, 5001).selectExpr("id"))
    vt2 = VersionedTable(spark, vt.root, bloom_col="id")
    assert vt2.read_point_lookup(5000).count() == 1


def test_optimize_zorder_prunes_both_columns(spark, table):
    # two independent uniform columns: neither single-column clustering
    # nor append order makes BOTH prunable; z-order does
    df = spark.range(0, 4096).selectExpr(
        "id", "cast((id * 2654435761) % 4096 as bigint) as x",
        "cast((id * 40503) % 4096 as bigint) as y",
    )
    table.commit_overwrite(df.repartition(8))
    info = table.optimize(target_rows_per_file=512, zorder_by=["x", "y"])
    assert info.n_files == 8
    # content unchanged
    assert table.read().count() == 4096
    # a narrow range on EITHER z-ordered column prunes files
    nx = len(table.read_pruned("x", 0, 255).inputFiles())
    ny = len(table.read_pruned("y", 0, 255).inputFiles())
    assert nx < 8 and ny < 8
    # and pruned results equal the full-scan filter
    full = sorted(
        r.id for r in table.read().filter("x between 0 and 255").collect()
    )
    assert sorted(r.id for r in table.read_pruned("x", 0, 255).collect()) == full


def test_shallow_clone_zero_copy_fork(spark, table, tmp_path):
    table.commit_overwrite(_df(spark, 0, 100, "a"))
    table.commit_append(_df(spark, 100, 120, "b"))
    src_files = {f["path"] for f in table.manifest()["files"]}

    clone = table.clone_to(str(tmp_path / "clone"))
    # zero-copy: the clone references the source's files by pointer
    m0 = clone.manifest()
    assert m0["action"] == "clone"
    assert m0["meta"] == {
        "cloned_from": table.root, "source_version": 1, "deep": False
    }
    assert {f["path"] for f in m0["files"]} == src_files
    assert all(f["base"] == table.root for f in m0["files"])
    assert clone.read().count() == 120
    # no data directory was created under the clone's root by the clone
    assert not os.path.exists(os.path.join(clone.root, "data"))

    # diverge: clone-side delete rewrites into the CLONE's root only
    clone.delete_where("id >= 100")
    assert clone.read().count() == 100
    assert table.read().count() == 120  # source untouched
    # source-side append does not affect the clone
    table.commit_append(_df(spark, 200, 210, "c"))
    assert clone.read().count() == 100
    # stats pruning still works through the pointer indirection
    pruned = clone.read_pruned("id", 0, 5)
    assert sorted(r.id for r in pruned.collect()) == [0, 1, 2, 3, 4, 5]


def test_deep_clone_survives_source_vacuum(spark, table, tmp_path):
    table.commit_overwrite(_df(spark, 0, 100, "a"))
    table.add_constraint("id_pos", "id >= 0")
    table.delete_where("id % 10 = 0", mode="mor")
    want = sorted(r.id for r in table.read().collect())

    clone = table.clone_to(str(tmp_path / "deep"), deep=True)
    m0 = clone.manifest()
    assert m0["meta"]["deep"] is True
    # the clone owns every byte: no pointer entries, no carried vectors
    assert all("base" not in f for f in m0["files"])
    assert not any(f.get("dv") for f in m0["files"])
    assert sorted(r.id for r in clone.read().collect()) == want
    # constraints travelled
    assert "id_pos" in clone.constraints()

    # nuke the source entirely — the deep clone is unaffected
    import shutil

    shutil.rmtree(table.root)
    assert sorted(r.id for r in clone.read().collect()) == want
    # and the clone enforces the carried constraint on its own writes
    with pytest.raises(Exception, match="id_pos"):
        clone.commit_append(_df(spark, -5, -1, "bad"))


def test_files_metadata_table(spark, table):
    table.commit_overwrite(_df(spark, 0, 50, "a").coalesce(1))
    table.commit_append(_df(spark, 50, 60, "b").coalesce(1))
    files = table.files()
    assert files.columns == [
        "path", "base", "rows", "bytes", "stats", "stats_trunc",
        "has_bloom", "dv_deleted",
    ]
    rows = files.collect()
    assert sum(r.rows for r in rows) == 60
    assert all(r.base == table.root for r in rows)
    assert all(r.bytes > 0 for r in rows)
    assert all(r.stats_trunc == [] for r in rows)  # short strings only
    assert files.filter("has_bloom").count() == 0  # no bloom_col declared
    # the metadata table is queryable with plain SQL
    files.createOrReplaceTempView("vt_files")
    assert spark.sql("select sum(rows) n from vt_files").first().n == 60


def test_lifecycle_soak_many_commits(spark, table):
    """Operational soak: 60 commits → CDF reads stay delta-sized →
    optimize compacts → vacuum reclaims → latest content exact.
    Exercises the full maintenance lifecycle a streaming-ingested
    table cycles through, including log scaling (30 manifests)."""
    for i in range(30):
        table.commit_append(_df(spark, i * 10, i * 10 + 10, f"b{i}").coalesce(1))
    assert table.latest_version() == 29
    assert table.read().count() == 300
    # CDF across the last 10 commits reads only 10 files
    delta = table.read_changes(since_version=19)
    assert delta.count() == 100
    assert len(delta.inputFiles()) == 10
    # compact 30 small files, then reclaim the old generation
    table.optimize(target_rows_per_file=150, cluster_by=["id"])
    assert len(table.manifest()["files"]) == 2
    deleted = table.vacuum(retain_last=1, grace_seconds=0)
    assert len(deleted) >= 30  # all pre-optimize files reclaimed
    assert sorted(r.id for r in table.read().collect()) == list(range(300))
    # expired history errors cleanly; live manifest count is 1
    with pytest.raises(VersionNotFoundError):
        table.read(version=0)
    assert table.versions_live() == [30]


def test_vacuum_grace_period_protects_inflight_commits(spark, table):
    """An unreferenced data file younger than the grace period must
    survive vacuum — data files of an IN-FLIGHT commit (manifest not
    yet created) are indistinguishable from aborted-commit orphans, so
    only age can make reclamation safe."""
    table.commit_overwrite(_df(spark, 0, 50, "a"))
    table.commit_overwrite(_df(spark, 0, 50, "b"))  # v0's files unreferenced
    # a just-written orphan: exactly what a racing writer's in-flight
    # commit looks like before its manifest lands
    orphan_dir = os.path.join(table.root, "data", "c-inflight")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-000.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"PAR1-pending")
    assert table.vacuum(retain_last=1) == []  # default 7-day grace: nothing
    assert os.path.exists(orphan)
    assert table.read(version=1).count() == 50  # retained snapshot intact
    deleted = table.vacuum(retain_last=1, grace_seconds=0)
    assert deleted != []  # old unreferenced files reclaimed
    assert not os.path.exists(orphan)


def test_read_pruned_date_stats_keep_file(spark, table):
    """Manifest stats for date columns are stringified by _json_safe;
    comparing them to date bounds is a TypeError — read_pruned must
    conservatively keep the file, not raise."""
    import datetime

    df = spark.sql(
        "SELECT id, date_add(date'2024-01-01', cast(id as int)) AS d "
        "FROM range(0, 30)"
    )
    table.commit_overwrite(df)
    lo, hi = datetime.date(2024, 1, 5), datetime.date(2024, 1, 10)
    got = table.read_pruned("d", lo, hi)
    assert got.count() == 6
    assert {r["d"] for r in got.collect()} == {
        lo + datetime.timedelta(days=i) for i in range(6)
    }


def test_commit_auto_recovers_from_aborted_manifest(spark, table):
    """A crash mid-manifest-write must not wedge the table: the next
    commit auto-retires the unparseable manifest and claims the same
    version, without a manual recover_log call."""
    table.commit_overwrite(_df(spark, 0, 20, "a"))
    # simulate the crash: partial (unparseable) manifest for version 1
    partial = os.path.join(table.root, "_log", "v%012d.json" % 1)
    with open(partial, "w") as fh:
        fh.write('{"version": 1, "files": [')
    # while FRESH, the fragment is grace-protected (could be a live
    # writer mid-write) — the claim conflicts instead of recovering
    with pytest.raises(ConcurrentCommitError):
        table.commit_append(_df(spark, 20, 30, "b"))
    _age(partial)  # the crash happened long ago
    info = table.commit_append(_df(spark, 20, 30, "b"))
    assert info.version == 1
    assert table.read().count() == 30
    # forensic trail kept under a unique quarantine name (never deleted)
    assert glob.glob(partial + ".aborted-*")
    # a PARSEABLE existing manifest is still a genuine conflict
    existing = json.load(open(os.path.join(table.root, "_log", "v%012d.json" % 1)))
    with pytest.raises(ConcurrentCommitError):
        table._write_manifest(dict(existing))  # version 1 already claimed


def test_replace_where_is_single_atomic_commit(spark, table):
    """replaceWhere = CoW delete + insert in ONE commit: no reader can
    see the deleted-but-not-replaced intermediate a delete+append pair
    would expose."""
    df = spark.range(0, 100).selectExpr("id", "cast(id % 4 as bigint) AS bucket")
    table.commit_overwrite(df.repartition("bucket"))
    v_before = table.latest_version()
    repl = spark.range(1000, 1010).selectExpr("id", "cast(2 as bigint) AS bucket")
    info = table.replace_where("bucket = 2", repl)
    assert info.version == v_before + 1  # exactly one commit
    assert table.manifest()["action"] == "replace"
    got = table.read()
    assert got.filter("bucket = 2 AND id < 1000").count() == 0  # deleted
    assert got.filter("bucket = 2").count() == 10  # replaced
    assert got.filter("bucket != 2").count() == 75  # untouched
    # old snapshot still time-travelable
    assert table.read(version=v_before).count() == 100


def test_schema_evolution_additive_merge(spark, table):
    """merge_schema appends new columns metadata-only: old files
    backfill NULL at read, column order is stable, old snapshots keep
    the old schema, and CoW ops work across the evolution."""
    from finalpipeline_spark.sources.versioned import SchemaMismatchError

    table.commit_overwrite(_df(spark, 0, 50, "a"))
    widened = spark.range(50, 70).selectExpr(
        "id", "'b' AS tag", "cast(id * 10 as bigint) AS score"
    )
    # default: differing schema is rejected, not silently recorded
    with pytest.raises(SchemaMismatchError, match="merge_schema"):
        table.commit_append(widened)
    table.commit_append(widened, merge_schema=True)
    got = table.read()
    assert got.columns == ["id", "tag", "score"]  # old fields first
    assert got.count() == 70
    assert got.filter("score IS NULL").count() == 50  # backfilled
    assert got.filter("score IS NOT NULL AND id >= 50").count() == 20
    # time travel still shows the pre-evolution schema
    assert table.read(version=0).columns == ["id", "tag"]
    # an append MISSING the new column also needs merge_schema, then
    # backfills NULL for its own rows
    with pytest.raises(SchemaMismatchError):
        table.commit_append(_df(spark, 70, 80, "c"))
    table.commit_append(_df(spark, 70, 80, "c"), merge_schema=True)
    assert table.read().filter("score IS NULL").count() == 60
    # CDF delta across the evolution reads with the evolved schema
    delta = table.read_changes(since_version=1)
    assert delta.columns == ["id", "tag", "score"]
    assert delta.count() == 10
    # CoW delete rewrites survivors under the evolved schema
    table.delete_where("id < 10")
    assert table.read().count() == 70  # 80 rows - 10 deleted
    assert table.read().columns == ["id", "tag", "score"]


def test_schema_evolution_rejects_type_change(spark, table):
    from finalpipeline_spark.sources.versioned import SchemaMismatchError

    table.commit_overwrite(_df(spark, 0, 10, "a"))
    retyped = spark.range(10, 20).selectExpr("id", "cast(7 as bigint) AS tag")
    with pytest.raises(SchemaMismatchError, match="type change"):
        table.commit_append(retyped, merge_schema=True)


def test_count_rows_is_metadata_only(spark, table):
    table.commit_overwrite(_df(spark, 0, 100, "a"))
    table.commit_append(_df(spark, 100, 130, "b"))
    assert table.count_rows() == 130
    assert table.count_rows(version=0) == 100
    table.delete_where("id < 20")
    assert table.count_rows() == 110
    assert table.count_rows() == table.read().count()


def test_read_changes_rows_across_cow_commits(spark, table):
    """Row-level CDF survives delete/replace commits: deletes are the
    dropped-minus-added row diff (bounded by the rewritten files), and
    every change carries its commit version."""
    table.commit_overwrite(_df(spark, 0, 100, "a"))        # v0
    table.commit_append(_df(spark, 100, 120, "b"))          # v1: +20
    table.delete_where("id < 10")                           # v2: -10
    table.replace_where("id >= 115", _df(spark, 200, 205, "c"))  # v3: -5 +5

    ch = table.read_changes_rows(0)
    got = {
        (r["_commit_version"], r["_change_type"], r["id"]) for r in ch.collect()
    }
    assert {(1, "insert", i) for i in range(100, 120)} <= got
    assert {(2, "delete", i) for i in range(10)} <= got
    assert {(3, "delete", i) for i in range(115, 120)} <= got
    assert {(3, "insert", i) for i in range(200, 205)} <= got
    assert len(got) == 20 + 10 + 5 + 5
    # replaying the feed onto the base snapshot reproduces the head
    base = {r["id"] for r in table.read(version=0).collect()}
    for v in (1, 2, 3):
        ins = {r["id"] for r in ch.filter(
            f"_commit_version = {v} AND _change_type = 'insert'").collect()}
        dels = {r["id"] for r in ch.filter(
            f"_commit_version = {v} AND _change_type = 'delete'").collect()}
        base = (base - dels) | ins
    assert base == {r["id"] for r in table.read().collect()}
    # empty range: zero rows, stable schema
    empty = table.read_changes_rows(3)
    assert empty.count() == 0
    assert "_change_type" in empty.columns
    # whole-table rewrites still refuse
    table.commit_overwrite(_df(spark, 0, 5, "d"))
    with pytest.raises(ValueError, match="row-level delta"):
        table.read_changes_rows(0)


def test_merge_upserts_deletes_one_commit_with_file_pruning(spark, table):
    """MERGE = whole-row upsert + flagged delete in ONE commit; only
    files containing matched keys are rewritten."""
    table.commit_overwrite(_df(spark, 0, 100, "a").coalesce(1))   # file A
    table.commit_append(_df(spark, 100, 200, "b").coalesce(1))    # file B
    v_before = table.latest_version()
    files_before = {f["path"] for f in table.manifest()["files"]}
    # touch only file B's key range: update 150, insert 500, delete 199
    src = spark.createDataFrame(
        [(150, "updated", False), (500, "new", False), (199, "x", True)],
        "id long, tag string, is_del boolean",
    )
    info = table.merge(src, keys=["id"], delete_col="is_del")
    assert info.version == v_before + 1  # atomic
    assert table.manifest()["action"] == "replace"
    got = {r["id"]: r["tag"] for r in table.read().collect()}
    assert got[150] == "updated" and got[500] == "new"
    assert 199 not in got and len(got) == 200  # 200 - 1 del + 1 ins
    # exactly one pre-merge file survives by reference: file A, whose
    # key range the merge never touched
    kept = {f["path"] for f in table.manifest()["files"]}
    assert len(files_before & kept) == 1
    # non-unique source is rejected
    bad = spark.createDataFrame(
        [(1, "x", False), (1, "y", False)], "id long, tag string, is_del boolean"
    )
    with pytest.raises(ValueError, match="not unique"):
        table.merge(bad, keys=["id"], delete_col="is_del")


def test_replicate_from_converges_to_producer(spark, tmp_path):
    """CDC loop: producer commits appends, CoW deletes and replaces;
    the consumer folds the row-level change feed with one merge per
    sync and converges to the producer's snapshot each time."""
    prod = VersionedTable(spark, str(tmp_path / "prod"))
    cons = VersionedTable(spark, str(tmp_path / "cons"))
    prod.commit_overwrite(_df(spark, 0, 100, "a"))
    cons.commit_overwrite(prod.read())  # initial seed at version 0
    seeded = prod.latest_version()

    prod.commit_append(_df(spark, 100, 130, "b"))
    prod.delete_where("id < 20")
    prod.replace_where("id >= 125", _df(spark, 300, 305, "c"))
    cons.replicate_from(prod, keys=["id"], since_version=seeded)
    assert sorted(r["id"] for r in cons.read().collect()) == sorted(
        r["id"] for r in prod.read().collect()
    )
    # second sync window
    synced = prod.latest_version()
    prod.commit_append(_df(spark, 400, 410, "d"))
    prod.delete_where("id BETWEEN 50 AND 59")
    cons.replicate_from(prod, keys=["id"], since_version=synced)
    p_rows = sorted(tuple(r) for r in prod.read().collect())
    c_rows = sorted(tuple(r) for r in cons.read().collect())
    assert p_rows == c_rows
    # lineage recorded
    assert cons.manifest()["meta"]["replicated_from"] == prod.root


def test_cdc_replication_soak_random_commit_sequence(spark, table, tmp_path):
    """Soak the CDC loop: a seeded-random interleaving of appends, CoW
    deletes, replaceWhere commits, AND optimize maintenance (r11:
    zero-change-row commits inside replication ranges) on the
    producer, synced to a consumer at random version boundaries —
    after every sync the consumer must equal the producer
    row-for-row."""
    import random

    rng = random.Random(20260814)
    prod = table
    cons = VersionedTable(spark, str(tmp_path / "soak_cons"))
    prod.commit_overwrite(_df(spark, 0, 200, "seed"))
    cons.commit_overwrite(prod.read())
    synced = prod.latest_version()
    next_id = 200

    def present_ids():
        return [r["id"] for r in prod.read().select("id").collect()]

    for step in range(14):
        op = rng.choice(["append", "delete", "replace", "optimize"])
        if op == "append":
            n = rng.randrange(5, 30)
            prod.commit_append(_df(spark, next_id, next_id + n, f"a{step}"))
            next_id += n
        elif op == "optimize":
            prod.optimize(
                target_rows_per_file=rng.choice([20, 1_000_000]),
                mode="compact",
            )
        elif op == "delete":
            ids = present_ids()
            victims = rng.sample(ids, min(len(ids), rng.randrange(1, 15)))
            prod.delete_where("id IN (" + ",".join(map(str, victims)) + ")")
        else:
            ids = present_ids()
            victims = rng.sample(ids, min(len(ids), rng.randrange(1, 10)))
            n = rng.randrange(1, 8)
            prod.replace_where(
                "id IN (" + ",".join(map(str, victims)) + ")",
                _df(spark, next_id, next_id + n, f"r{step}"),
            )
            next_id += n
        if rng.random() < 0.4 or step == 11:  # sync at random boundaries
            cons.replicate_from(prod, keys=["id"], since_version=synced)
            synced = prod.latest_version()
            assert sorted(tuple(r) for r in cons.read().collect()) == sorted(
                tuple(r) for r in prod.read().collect()
            ), f"diverged after step {step}"


def test_recovery_restores_mid_race_valid_manifest(spark, table, monkeypatch):
    """TOCTOU closure (verify-after-claim): if a racing writer commits
    a VALID manifest between this writer's unparseability probe and its
    quarantine rename, the rename steals a live commit — recovery must
    detect that on the claimed file, restore it, and back off. The old
    code deleted/overwrote it: a silently lost commit."""
    table.commit_overwrite(_df(spark, 0, 20, "a"))
    # the racing writer commits a VALID v1
    other = VersionedTable(spark, table.root)
    other.commit_append(_df(spark, 20, 30, "b"))
    path1 = os.path.join(table.root, "_log", "v%012d.json" % 1)
    valid = json.load(open(path1))
    _age(path1)  # past the grace, so recovery would normally proceed
    # simulate this writer's STALE probe: it saw an unparseable fragment
    orig = table._read_manifest_file

    def stale_probe(v):
        if v == 1:
            raise json.JSONDecodeError("stale probe", "", 0)
        return orig(v)

    monkeypatch.setattr(table, "_read_manifest_file", stale_probe)
    ddl = _df(spark, 0, 1, "x").schema.simpleString()
    files = table._write_data_files(_df(spark, 30, 40, "c"))
    with pytest.raises(ConcurrentCommitError, match="mid-flight"):
        table._write_manifest(
            {"version": 1, "parent": 0, "action": "append",
             "schema": ddl, "files": files}
        )
    monkeypatch.undo()
    # the racer's commit survived intact — nothing deleted or replaced
    assert json.load(open(path1)) == valid
    assert table.latest_version() == 1
    assert table.read().count() == 30


def test_recover_log_restores_mid_race_valid_manifest(spark, table, monkeypatch):
    """Same verify-after-claim protocol in recover_log: a manifest that
    became valid between the probe and the rename is restored, never
    retired."""
    table.commit_overwrite(_df(spark, 0, 20, "a"))
    table.commit_append(_df(spark, 20, 30, "b"))
    path1 = os.path.join(table.root, "_log", "v%012d.json" % 1)
    valid = json.load(open(path1))
    _age(path1)  # past the grace, so recovery would normally proceed
    orig = table._read_manifest_file

    def stale_probe(v):
        if v == 1:
            raise json.JSONDecodeError("stale probe", "", 0)
        return orig(v)

    monkeypatch.setattr(table, "_read_manifest_file", stale_probe)
    assert table.recover_log() == []  # nothing retired
    monkeypatch.undo()
    assert json.load(open(path1)) == valid
    assert table.read().count() == 30


def test_read_changes_rows_across_schema_evolution(spark, table, tmp_path):
    """Row-level CDF whose range SPANS an additive merge_schema commit:
    every step is imposed the target version's schema (pre-evolution
    rows NULL-backfill the new column), so the cross-step union is
    well-typed and replication follows the producer's evolution."""
    table.commit_overwrite(_df(spark, 0, 30, "a"))                      # v0
    widened = spark.range(30, 40).selectExpr(
        "id", "'b' AS tag", "cast(id * 10 as bigint) AS score"
    )
    table.commit_append(widened, merge_schema=True)                     # v1
    table.delete_where("id < 5")                                        # v2
    ch = table.read_changes_rows(0)  # spans the evolution commit
    assert ch.columns == ["id", "tag", "score", "_change_type", "_commit_version", "_commit_timestamp"]
    got = {
        (r["_commit_version"], r["_change_type"], r["id"], r["score"])
        for r in ch.collect()
    }
    assert {(1, "insert", i, i * 10) for i in range(30, 40)} <= got
    assert {(2, "delete", i, None) for i in range(5)} <= got
    assert len(got) == 15
    # CDC replication across the evolution: consumer seeded PRE-evolution
    # follows the producer's schema and converges row-for-row
    cons = VersionedTable(spark, str(tmp_path / "cons_evo"))
    cons.commit_overwrite(table.read(version=0))
    cons.replicate_from(table, keys=["id"], since_version=0)
    assert cons.read().columns == ["id", "tag", "score"]
    assert sorted(tuple(r) for r in cons.read().collect()) == sorted(
        tuple(r) for r in table.read().collect()
    )


def test_merge_rejects_evolved_source_without_flag(spark, table):
    """Silently projecting away a source column the table lacks would
    diverge a replica — merge must reject unless merge_schema=True."""
    from finalpipeline_spark.sources.versioned import SchemaMismatchError

    table.commit_overwrite(_df(spark, 0, 10, "a"))
    src = spark.createDataFrame(
        [(3, "upd", 99, False)], "id long, tag string, score long, is_del boolean"
    )
    with pytest.raises(SchemaMismatchError, match="merge_schema"):
        table.merge(src, keys=["id"], delete_col="is_del")
    table.merge(src, keys=["id"], delete_col="is_del", merge_schema=True)
    got = {r["id"]: (r["tag"], r["score"]) for r in table.read().collect()}
    assert got[3] == ("upd", 99)
    assert got[0] == ("a", None)  # NULL-backfilled
    # type conflict is still rejected
    bad = spark.createDataFrame([(1, 7, False)], "id long, tag long, is_del boolean")
    with pytest.raises(SchemaMismatchError, match="type change"):
        table.merge(bad, keys=["id"], delete_col="is_del", merge_schema=True)


def test_changefeed_batch_read_requires_explicit_start(spark, table):
    """Batch changeFeed is supported (Delta readChangeFeed parity) but
    an unbounded feed would be the whole table history — an explicit
    startingVersion/startingTimestamp is required, and with one the
    feed delivers tagged rows."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    table.commit_overwrite(_df(spark, 0, 10, "a"))
    with pytest.raises(
        (ValueError, AnalysisException), match="startingVersion"
    ):
        (
            spark.read.format("versioned")
            .option("root", table.root)
            .option("changeFeed", "true")
            .load()
            .collect()
        )
    feed = (
        spark.read.format("versioned")
        .option("root", table.root)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    assert feed.count() == 10
    assert {r._change_type for r in feed.collect()} == {"insert"}


def test_cdf_final_state_deterministic_tiebreak(spark):
    """A non-key-unique producer emitting two DIFFERENT insert rows for
    one key in the same commit must resolve to the same winner on every
    run — the tiebreak orders by the value columns, not partition
    luck."""
    from finalpipeline_spark.sources.versioned import cdf_final_state

    rows = [
        (1, "zebra", "insert", 3),
        (1, "apple", "insert", 3),
        (1, "old", "insert", 2),
        (2, "kept", "insert", 3),
    ]
    ch = spark.createDataFrame(
        rows, "id long, tag string, _change_type string, _commit_version long"
    )
    winners = {
        (r["id"], r["tag"], r["__delete"])
        for r in cdf_final_state(ch, ["id"]).collect()
    }
    # desc_nulls_last on the value column: 'zebra' > 'apple'
    assert winners == {(1, "zebra", False), (2, "kept", False)}
    # stable across repartitionings (the nondeterminism the old code had)
    for n in (1, 7):
        again = {
            (r["id"], r["tag"], r["__delete"])
            for r in cdf_final_state(ch.repartition(n), ["id"]).collect()
        }
        assert again == winners


def test_cdc_fan_in_two_producers_one_consumer(spark, tmp_path):
    """Fan-in replication (VERDICT r4 item 5): two producers with
    disjoint key spaces fold into ONE consumer via interleaved
    replicate_from syncs; after each producer's sync the consumer
    equals the union of both producers' snapshots."""
    pa = VersionedTable(spark, str(tmp_path / "pa"))
    pb = VersionedTable(spark, str(tmp_path / "pb"))
    cons = VersionedTable(spark, str(tmp_path / "fan_cons"))
    pa.commit_overwrite(_df(spark, 0, 50, "a"))
    pb.commit_overwrite(_df(spark, 1000, 1050, "b"))
    cons.commit_overwrite(pa.read().unionByName(pb.read()))
    sa, sb = pa.latest_version(), pb.latest_version()

    # interleaved lifecycle on both producers
    pa.commit_append(_df(spark, 50, 70, "a2"))
    pb.delete_where("id < 1010")
    pa.delete_where("id >= 60")
    pb.commit_append(_df(spark, 1050, 1060, "b2"))
    pb.replace_where("id >= 1055", _df(spark, 2000, 2003, "b3"))

    cons.replicate_from(pa, keys=["id"], since_version=sa)
    cons.replicate_from(pb, keys=["id"], since_version=sb)
    want = sorted(
        tuple(r) for r in pa.read().unionByName(pb.read()).collect()
    )
    assert sorted(tuple(r) for r in cons.read().collect()) == want

    # second round, syncs in the opposite order
    sa, sb = pa.latest_version(), pb.latest_version()
    pa.delete_where("id BETWEEN 10 AND 19")
    pb.commit_append(_df(spark, 3000, 3010, "b4"))
    cons.replicate_from(pb, keys=["id"], since_version=sb)
    cons.replicate_from(pa, keys=["id"], since_version=sa)
    want = sorted(
        tuple(r) for r in pa.read().unionByName(pb.read()).collect()
    )
    assert sorted(tuple(r) for r in cons.read().collect()) == want


def test_concurrent_commit_soak_with_planted_partials(spark, table):
    """Real-thread concurrency soak for the commit protocol: racing
    appenders (optimistic retry on ConcurrentCommitError) while a chaos
    writer keeps planting PARTIAL manifests at the next version. The
    unique-quarantine recovery must retire fragments without ever
    destroying a valid commit: afterwards the log is a contiguous
    parent-linked chain and every appended row is present exactly
    once."""
    import threading
    import time as _t

    # short recovery grace: the soak plants fragments continuously and
    # must see them auto-recovered within the test's lifetime; real
    # writes complete far inside even this short grace, so the
    # live-writer protection still holds
    grace = 1.0
    table = VersionedTable(spark, table.root, recovery_grace_seconds=grace)
    table.commit_overwrite(_df(spark, 0, 10, "seed"))
    n_threads, n_commits, batch = 4, 3, 10
    errors: list[Exception] = []
    stop = threading.Event()

    def appender(t: int) -> None:
        try:
            vt = VersionedTable(spark, table.root, recovery_grace_seconds=grace)
            for c in range(n_commits):
                lo = 1000 + (t * n_commits + c) * batch
                deadline = _t.time() + 60
                while True:  # optimistic retry loop
                    try:
                        vt.commit_append(_df(spark, lo, lo + batch, f"t{t}c{c}"))
                        break
                    except ConcurrentCommitError:
                        if _t.time() > deadline:
                            raise RuntimeError(
                                f"thread {t} never won a commit"
                            ) from None
                        _t.sleep(0.05)
        except Exception as e:  # noqa: BLE001 - surfaced to the assert
            errors.append(e)

    def chaos() -> None:
        log_dir = os.path.join(table.root, "_log")
        while not stop.is_set():
            try:
                nxt = (VersionedTable(spark, table.root).latest_version() or 0) + 1
                frag = os.path.join(log_dir, "v%012d.json" % nxt)
                with open(frag, "x") as fh:  # "x": never clobber a commit
                    fh.write('{"version": %d, "files": [' % nxt)
            except Exception:
                pass  # racing the appenders is the point
            stop.wait(0.05)

    chaos_t = threading.Thread(target=chaos, daemon=True)
    chaos_t.start()
    threads = [threading.Thread(target=appender, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    stop.set()
    chaos_t.join(timeout=10)
    assert not errors, errors
    # contiguous parent-linked log
    vs = table.versions()
    assert vs == list(range(len(vs)))
    for v in vs[1:]:
        assert table._read_manifest_file(v)["parent"] == v - 1
    # every appended row exactly once, seed intact
    got = sorted(r["id"] for r in table.read().collect())
    want = sorted(
        list(range(10))
        + [
            1000 + k * batch + i
            for k in range(n_threads * n_commits)
            for i in range(batch)
        ]
    )
    assert got == want


def test_commit_cas_rejects_stale_snapshot(spark, table):
    """Deterministic unit form of the soak's lost-update scenario: a
    commit prepared against a snapshot that went stale during the data
    write must be rejected by the compare-and-swap guard, and the retry
    against the fresh snapshot must keep BOTH writers' rows."""
    table.commit_overwrite(_df(spark, 0, 10, "a"))
    m = table.manifest()
    files = table._write_data_files(_df(spark, 10, 20, "b"))
    # another writer advances the table during our data write
    VersionedTable(spark, table.root).commit_append(_df(spark, 50, 60, "z"))
    with pytest.raises(ConcurrentCommitError, match="advanced"):
        table._commit(
            "append", list(m["files"]) + files, m["schema"],
            base_version=m["version"],
        )
    m2 = table.manifest()
    info = table._commit(
        "append", list(m2["files"]) + files, m2["schema"],
        base_version=m2["version"],
    )
    assert info.version == m2["version"] + 1
    assert table.read().count() == 30  # nothing lost


def test_concurrent_mixed_cow_soak(spark, table):
    """Racing append + CoW delete threads (each owning a disjoint key
    range, optimistic retry on ConcurrentCommitError): the CAS guard
    must serialize the interleaving so no thread's rows are lost to a
    stale-snapshot rewrite — the delete path's version of the
    lost-update race."""
    import threading
    import time as _t

    grace = 1.0
    table = VersionedTable(spark, table.root, recovery_grace_seconds=grace)
    table.commit_overwrite(_df(spark, 0, 10, "seed"))
    errors: list[Exception] = []

    def worker(t: int) -> None:
        base = 10_000 * (t + 1)
        try:
            vt = VersionedTable(spark, table.root, recovery_grace_seconds=grace)

            def attempt(fn):
                deadline = _t.time() + 90
                while True:
                    try:
                        return fn()
                    except ConcurrentCommitError:
                        if _t.time() > deadline:
                            raise
                        _t.sleep(0.05)

            attempt(lambda: vt.commit_append(_df(spark, base, base + 30, f"t{t}")))
            attempt(
                lambda: vt.delete_where(
                    f"id >= {base + 20} AND id < {base + 30}"
                )
            )
            attempt(
                lambda: vt.commit_append(
                    _df(spark, base + 100, base + 110, f"t{t}b")
                )
            )
        except Exception as e:  # noqa: BLE001 - surfaced to the assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    vs = table.versions()
    assert vs == list(range(len(vs)))  # contiguous log
    want = set(range(10))
    for t in range(3):
        b = 10_000 * (t + 1)
        want |= set(range(b, b + 20)) | set(range(b + 100, b + 110))
    got = {r["id"] for r in table.read().collect()}
    assert got == want  # every append kept, every delete scoped to owner


def test_vacuum_reclaims_aged_quarantines(spark, table):
    """Recovery quarantines (.aborted-<uuid>) are junk after the grace:
    vacuum reclaims aged ones and keeps fresh ones (same retention
    threshold as data files)."""
    table.commit_overwrite(_df(spark, 0, 10, "a"))
    log_dir = os.path.join(table.root, "_log")
    partial = os.path.join(log_dir, "v%012d.json" % 1)
    with open(partial, "w") as fh:
        fh.write('{"version": 1, "files": [')
    _age(partial)
    assert table.recover_log() == [1]
    (q,) = glob.glob(partial + ".aborted-*")
    os.utime(q)  # rename kept the back-dated mtime; make it fresh again
    # fresh quarantine survives the graced vacuum
    table.vacuum(retain_last=1, grace_seconds=3600)
    assert os.path.exists(q)
    # aged quarantine is reclaimed
    _age(q)
    deleted = table.vacuum(retain_last=1, grace_seconds=3600)
    assert not os.path.exists(q)
    assert any(".aborted-" in d for d in deleted)
    # the live table is untouched
    assert table.read().count() == 10


def test_commit_with_retry_racing_writers_no_manual_loop(spark, table):
    """VERDICT r5 #4: the snapshot-based writers (merge / delete_where /
    replace_where) retry lost CAS races internally — racing threads use
    them bare, with NO test-side ConcurrentCommitError handling, and
    every write lands exactly once."""
    import threading

    from pyspark.sql import functions as F

    table.commit_overwrite(
        spark.range(0, 100).selectExpr("id", "'seed' as tag")
    )
    errors: list[Exception] = []

    def upserter(t: int) -> None:
        try:
            vt = VersionedTable(spark, table.root)
            src = spark.range(1000 + t * 10, 1000 + t * 10 + 10).selectExpr(
                "id", f"'t{t}' as tag"
            )
            vt.merge(src, keys=["id"])  # no retry loop here — internal
        except Exception as e:  # noqa: BLE001 - surfaced to the assert
            errors.append(e)

    def deleter() -> None:
        try:
            VersionedTable(spark, table.root).delete_where("id >= 90 AND id < 100")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def replacer() -> None:
        try:
            VersionedTable(spark, table.root).replace_where(
                "id >= 80 AND id < 90",
                spark.range(80, 90).selectExpr("id", "'replaced' as tag"),
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=upserter, args=(t,)) for t in range(3)
    ] + [threading.Thread(target=deleter), threading.Thread(target=replacer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    got = {(r["id"], r["tag"]) for r in table.read().collect()}
    assert {id_ for id_, _ in got} == set(range(0, 90)) | set(
        range(1000, 1030)
    )
    assert {tag for id_, tag in got if 80 <= id_ < 90} == {"replaced"}
    for t in range(3):
        assert {
            tag for id_, tag in got if 1000 + t * 10 <= id_ < 1000 + t * 10 + 10
        } == {f"t{t}"}
    # retry on conflict can be disabled: attempts=1 restores raise-on-race
    with pytest.raises(ValueError):
        table.delete_where("id < 0", attempts=0)


def test_writer_self_verification_detects_stolen_slot(spark, table):
    """The commit point is the writer's read-back of its own manifest:
    if a racing recovery quarantined the manifest mid-write and the
    slot was re-committed by another writer, the stalled writer must
    raise ConcurrentCommitError, never report success (the lost-rows
    mode the r5 soak exposed)."""
    table.commit_overwrite(_df(spark, 0, 10, "seed"))
    payload = json.dumps({"version": 1, "parent": 0}).encode()
    # foreign VALID manifest at our slot → definitive loss
    with open(os.path.join(table.root, "_log", "v%012d.json" % 1), "w") as fh:
        fh.write(
            json.dumps(
                {"version": 1, "parent": 0, "action": "append",
                 "schema": "id bigint", "files": []}
            )
        )
    with pytest.raises(ConcurrentCommitError):
        table._verify_own_commit(table._manifest_path(1), payload, 1)
    # slot vanished entirely → indeterminate, then loss after the poll
    missing = table._manifest_path(7)
    with pytest.raises(ConcurrentCommitError):
        table._verify_own_commit(missing, payload, 7)
    # own bytes present → success (the normal path)
    own = json.loads(
        open(os.path.join(table.root, "_log", "v%012d.json" % 0)).read()
    )
    table._verify_own_commit(
        table._manifest_path(0), json.dumps(own).encode("utf-8"), 0
    )


def test_fnf_detection_and_vanish_normalization(spark, table):
    """The vanished-mid-read TOCTOU normalization keys on the Java
    FileNotFoundException itself (an exists() re-probe can be fooled by
    a fragment REPLANTED at the same slot within the race window)."""
    from finalpipeline_spark.sources.versioned import _is_file_not_found

    table.commit_overwrite(_df(spark, 0, 5, "seed"))
    missing = table._p("_log", "definitely-not-there.json")
    try:
        table._read_raw(missing)
        raise AssertionError("open of a missing path must fail")
    except Exception as exc:  # noqa: BLE001
        assert _is_file_not_found(exc)
    assert not _is_file_not_found(ValueError("nope"))


def test_restore_quarantined_fresh_leaves_junk_quietly(spark, table):
    """Fresh case: the quarantined commit's writer is still inside its
    read-back poll — a failed restore must NOT raise (the writer will
    fail verification and retry; the quarantine is ordinary junk), and
    must never steal the fresh occupant of the slot."""
    import json as _json
    import time as _t

    table.commit_overwrite(_df(spark, 0, 5, "seed"))
    log = os.path.join(table.root, "_log")
    slot = os.path.join(log, "v%012d.json" % 1)
    quarantine = os.path.join(log, "v%012d.json.aborted-deadbeef" % 1)
    valid = _json.dumps(
        {"version": 1, "parent": 0, "action": "append",
         "schema": "id bigint", "files": []}
    )
    with open(quarantine, "w") as fh:  # fresh mtime: writer still polling
        fh.write(valid)
    with open(slot, "w") as fh:  # fresh unparseable occupant (live writer)
        fh.write('{"version": 1, "files": [')
    t0 = _t.time()
    table._restore_quarantined(
        table._p("_log", os.path.basename(quarantine)),
        table._p("_log", os.path.basename(slot)),
        1,
    )
    # waited out the writer's poll deadline, left both files alone
    assert _t.time() - t0 >= 1.0
    assert os.path.exists(quarantine)
    with open(slot) as fh:
        assert fh.read() == '{"version": 1, "files": ['


def test_restore_quarantined_stale_raises_loudly(spark, table):
    """Stale case: the quarantined manifest predates the verification
    window (its writer may have reported success long ago) — a failed
    restore must raise, never silently junk a possibly-committed
    version."""
    import json as _json

    table.commit_overwrite(_df(spark, 0, 5, "seed"))
    log = os.path.join(table.root, "_log")
    slot = os.path.join(log, "v%012d.json" % 1)
    quarantine = os.path.join(log, "v%012d.json.aborted-cafebabe" % 1)
    with open(quarantine, "w") as fh:
        fh.write(
            _json.dumps(
                {"version": 1, "parent": 0, "action": "append",
                 "schema": "id bigint", "files": []}
            )
        )
    _age(quarantine, seconds=30)  # written long before any live poll
    # slot blocked by a VALID foreign manifest (not stealable)
    with open(slot, "w") as fh:
        fh.write(
            _json.dumps(
                {"version": 1, "parent": 0, "action": "append",
                 "schema": "id bigint", "files": [], "meta": {"w": "other"}}
            )
        )
    with pytest.raises(RuntimeError, match="preserved at"):
        table._restore_quarantined(
            table._p("_log", os.path.basename(quarantine)),
            table._p("_log", os.path.basename(slot)),
            1,
        )


def test_timestamp_time_travel(spark, table):
    """Delta TIMESTAMP AS OF parity: read(as_of_timestamp=...) resolves
    the latest version committed at or before the instant; history()
    carries the recorded wall clock."""
    import time as _t

    table.commit_overwrite(_df(spark, 0, 5, "v0"))
    t0 = _t.time()
    _t.sleep(0.05)
    table.commit_append(_df(spark, 5, 8, "v1"))
    _t.sleep(0.05)
    t1 = _t.time()
    table.commit_append(_df(spark, 8, 10, "v2"))

    assert table.read(as_of_timestamp=t0).count() == 5
    assert table.read(as_of_timestamp=t1).count() == 8
    assert table.read(as_of_timestamp=_t.time() + 5).count() == 10
    with pytest.raises(VersionNotFoundError):
        table.read(as_of_timestamp=t0 - 3600)
    with pytest.raises(ValueError):
        table.read(version=0, as_of_timestamp=t0)
    hist = table.history().collect()
    ts_by_v = {r["version"]: r["commit_ts"] for r in hist}
    assert all(ts_by_v[v] is not None for v in (0, 1, 2))


def test_history_operation_metrics(spark, table):
    table.commit_overwrite(_df(spark, 0, 100, "a").coalesce(1))
    table.commit_append(_df(spark, 100, 200, "b").coalesce(1))
    table.delete_where("id >= 150", mode="mor")
    table.delete_where("id < 10")  # CoW: rewrites only the first file
    h = {r["version"]: r for r in table.history().collect()}
    assert (
        h[0]["n_added_files"], h[0]["n_removed_files"], h[0]["n_dv_new_deleted"]
    ) == (1, 0, 0)
    assert (h[1]["n_added_files"], h[1]["n_removed_files"]) == (1, 0)
    # merge-on-read: no file churn, 50 rows newly vectored
    assert h[2]["n_added_files"] == 0 and h[2]["n_removed_files"] == 0
    assert h[2]["n_dv_new_deleted"] == 50
    # copy-on-write: one file swapped, no vector change
    assert h[3]["n_added_files"] == 1 and h[3]["n_removed_files"] == 1
    assert h[3]["n_dv_new_deleted"] == 0


def test_timestamp_resolution_is_monotonic_under_clock_skew(spark, table):
    """A later version carrying an EARLIER raw wall clock (multi-writer
    skew) must not make time travel non-monotonic: resolution adjusts
    commit times to be strictly increasing (Delta semantics), and the
    recorded values in history() stay honest (unadjusted)."""
    import json as _json

    table.commit_overwrite(_df(spark, 0, 5, "v0"))
    table.commit_append(_df(spark, 5, 8, "v1"))
    table.commit_append(_df(spark, 8, 10, "v2"))
    # skew v1's recorded clock an hour into the past
    p1 = os.path.join(table.root, "_log", "v%012d.json" % 1)
    m1 = _json.loads(open(p1).read())
    t0 = _json.loads(
        open(os.path.join(table.root, "_log", "v%012d.json" % 0)).read()
    )["ts"]
    m1["ts"] = t0 - 3600.0
    with open(p1, "w") as fh:
        fh.write(_json.dumps(m1))
    # adjusted order is still v0 < v1 < v2: asking for v0's instant
    # yields v0 (not the skewed v1), and versions stay reachable in order
    assert table.version_as_of_timestamp(t0) == 0
    v2_ts = table.history().collect()[-1]["commit_ts"]
    assert table.version_as_of_timestamp(v2_ts + 1) == 2
    # history reports the raw recorded value
    hist = {r["version"]: r["commit_ts"] for r in table.history().collect()}
    assert hist[1] == m1["ts"]


def test_timestamp_fallback_to_manifest_mtime_for_legacy_tables(spark, table):
    """Tables written before commit timestamps existed resolve via the
    manifest file's mtime."""
    import json as _json
    import time as _t

    table.commit_overwrite(_df(spark, 0, 5, "v0"))
    p0 = os.path.join(table.root, "_log", "v%012d.json" % 0)
    m0 = _json.loads(open(p0).read())
    del m0["ts"]
    with open(p0, "w") as fh:
        fh.write(_json.dumps(m0))
    assert table.version_as_of_timestamp(_t.time() + 1) == 0


def test_check_constraints_enforced_on_writes(spark, table):
    """Delta CHECK-constraint parity: add_constraint validates the
    existing snapshot, every subsequent write validates its written
    rows, NULL predicate results pass (ANSI CHECK semantics), and the
    rules survive overwrite/optimize and can be dropped."""
    from finalpipeline_spark.sources.versioned import ConstraintViolationError

    table.commit_overwrite(_df(spark, 0, 10, "seed"))
    table.add_constraint("id_nonneg", "id >= 0")
    assert table.constraints() == {"id_nonneg": "id >= 0"}

    # adding a constraint the existing data violates: rejected, no commit
    v = table.latest_version()
    with pytest.raises(ConstraintViolationError, match="id_small"):
        table.add_constraint("id_small", "id < 5")
    assert table.latest_version() == v
    assert table.constraints() == {"id_nonneg": "id >= 0"}

    # violating append rejected before any version bump
    with pytest.raises(ConstraintViolationError, match="id_nonneg"):
        table.commit_append(_df(spark, -5, -1, "bad"))
    assert table.latest_version() == v
    table.commit_append(_df(spark, 10, 15, "ok"))

    # violating merge source rejected
    with pytest.raises(ConstraintViolationError, match="id_nonneg"):
        table.merge(_df(spark, -3, -2, "bad"), keys=["id"])

    # NULL predicate result passes (ANSI CHECK): tag IS NULL → NULL > check
    table.add_constraint("tag_t", "length(tag) >= 0 OR tag IS NULL")
    nulls = spark.range(100, 103).selectExpr("id", "cast(NULL as string) as tag")
    table.commit_append(nulls)

    # constraints survive overwrite and optimize
    table.commit_overwrite(_df(spark, 0, 4, "ow"))
    assert set(table.constraints()) == {"id_nonneg", "tag_t"}
    table.optimize(target_rows_per_file=100)
    assert set(table.constraints()) == {"id_nonneg", "tag_t"}
    with pytest.raises(ConstraintViolationError):
        table.commit_append(_df(spark, -1, 0, "bad"))

    # drop ends enforcement
    table.drop_constraint("id_nonneg")
    table.commit_append(_df(spark, -1, 0, "now ok"))
    with pytest.raises(ValueError, match="no constraint"):
        table.drop_constraint("id_nonneg")
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint("tag_t", "1 = 1")


def test_check_constraint_cow_delete_skips_survivor_revalidation(spark, table):
    """CoW delete rewrites surviving rows verbatim — enforcement is
    skipped for them (they were validated when written), but the
    delete still carries the constraints forward."""
    table.commit_overwrite(_df(spark, 0, 10, "seed"))
    table.add_constraint("id_nonneg", "id >= 0")
    table.delete_where("id >= 5")
    assert table.read().count() == 5
    assert table.constraints() == {"id_nonneg": "id >= 0"}


def test_vacuum_dry_run_lists_without_deleting(spark, table):
    """VACUUM DRY RUN parity: same reclaimable-path list, zero effect —
    no file deleted, no manifest expired, and the subsequent real
    vacuum reclaims exactly the previewed paths."""
    table.commit_overwrite(_df(spark, 0, 10, "v0"))
    table.commit_overwrite(_df(spark, 10, 20, "v1"))
    preview = sorted(table.vacuum(retain_last=1, grace_seconds=0, dry_run=True))
    assert preview  # v0's files are unreferenced by the retained head
    # nothing happened: old snapshot still readable, files on disk
    assert table.read(version=0).count() == 10
    assert sorted(table.versions_live()) == [0, 1]
    real = sorted(table.vacuum(retain_last=1, grace_seconds=0))
    assert real == preview
    with pytest.raises(VersionNotFoundError):
        table.read(version=0)


def test_read_changes_skips_metadata_only_commits(spark, table):
    """File-level CDF must treat metadata-only commits (constraint
    add/drop, widen, no-op compaction) as zero-delta instead of raising
    'no incremental row delta' — their file refs are unchanged, so the
    delta is provably empty (mirrors read_changes_rows/_same_file_refs)."""
    table.commit_overwrite(_df(spark, 0, 5, "seed"))  # v0
    table.commit_append(_df(spark, 5, 8, "a"))  # v1
    table.add_constraint("id_nonneg", "id >= 0")  # v2: metadata-only
    table.commit_append(_df(spark, 8, 10, "b"))  # v3
    delta = table.read_changes(since_version=0)
    assert sorted(r.id for r in delta.collect()) == list(range(5, 10))
    # a range that ENDS on the metadata-only commit is simply the
    # appends before it
    assert table.read_changes(since_version=1, version=2).count() == 0
    # a rename is metadata-only too: the feed serves in the TARGET
    # frame, pre-rename files' values under the new name via their
    # target-manifest column mappings (r10 — was a refusal before)
    table.rename_column("tag", "label")
    delta = table.read_changes(since_version=0)
    assert "label" in delta.columns
    assert delta.filter("label IS NULL").count() == 0
    assert sorted(r.id for r in delta.collect()) == list(range(5, 10))


def test_restore_quarantined_stale_steals_aged_junk(spark, table):
    """Stale case self-heal: when the slot's occupant is unparseable
    AND older than the recovery grace it is provably an abandoned
    fragment — the restore must steal it and reinstate the committed
    manifest rather than raise the manual-restore error."""
    table.commit_overwrite(_df(spark, 0, 5, "seed"))
    log = os.path.join(table.root, "_log")
    slot = os.path.join(log, "v%012d.json" % 1)
    quarantine = os.path.join(log, "v%012d.json.aborted-feedface" % 1)
    valid = json.dumps(
        {"version": 1, "parent": 0, "action": "append",
         "schema": "id bigint", "files": []}
    )
    with open(quarantine, "w") as fh:
        fh.write(valid)
    _age(quarantine, seconds=30)  # stale: predates any live poll window
    with open(slot, "w") as fh:  # unparseable junk occupant
        fh.write('{"version": 1, "files": [')
    _age(slot)  # aged far past the recovery grace: provably abandoned
    table._restore_quarantined(
        table._p("_log", os.path.basename(quarantine)),
        table._p("_log", os.path.basename(slot)),
        1,
    )
    with open(slot) as fh:
        assert fh.read() == valid
    assert not os.path.exists(quarantine)


def _null_df(spark, lo, hi, null_every):
    """tag is NULL on ids divisible by null_every (0 = never null)."""
    cond = "NULL" if null_every == 1 else (
        f"CASE WHEN id % {null_every} = 0 THEN NULL ELSE 'v' END"
        if null_every else "'v'"
    )
    return spark.range(lo, hi).selectExpr("id", f"CAST({cond} AS STRING) as tag")


def test_null_counts_recorded_in_manifest(spark, table):
    table.commit_overwrite(_null_df(spark, 0, 100, 10).coalesce(1))
    f = table.manifest()["files"][0]
    assert f["nulls"] == {"id": 0, "tag": 10}


def test_read_null_pruned_skips_files(spark, table):
    table.commit_append(_null_df(spark, 0, 100, 0).coalesce(1))  # no nulls
    table.commit_append(_null_df(spark, 100, 200, 10).coalesce(1))  # some
    table.commit_append(_null_df(spark, 200, 300, 1).coalesce(1))  # all null
    nulls = table.read_null_pruned("tag", is_null=True)
    assert sorted(r.id for r in nulls.collect()) == (
        [i for i in range(100, 200) if i % 10 == 0] + list(range(200, 300))
    )
    assert len(nulls.inputFiles()) == 2  # zero-null file skipped
    notnull = table.read_null_pruned("tag", is_null=False)
    assert notnull.count() == 100 + 90
    assert len(notnull.inputFiles()) == 2  # all-null file skipped
    # evolution: a column added later is provably NULL in older files
    table.add_column("score", "double")
    table.commit_append(
        spark.range(300, 310).selectExpr(
            "id", "'v' as tag", "cast(id as double) as score"
        ).coalesce(1),
        merge_schema=True,
    )
    got = table.read_null_pruned("score", is_null=False)
    assert got.count() == 10
    assert len(got.inputFiles()) == 1  # only the post-evolution file


def test_add_not_null_metadata_only_and_enforced(spark, table):
    table.commit_overwrite(_null_df(spark, 0, 50, 0))
    table.add_not_null("tag")
    assert table.constraints()["tag_not_null"] == "tag IS NOT NULL"
    from finalpipeline_spark.sources.versioned import ConstraintViolationError
    with pytest.raises(Exception, match="tag_not_null|NULL"):
        table.commit_append(_null_df(spark, 50, 60, 5))
    # rejected when existing rows are NULL — straight from metadata
    t2 = VersionedTable(spark, table.root + "_2")
    t2.commit_overwrite(_null_df(spark, 0, 50, 7))
    with pytest.raises(ValueError, match="existing NULL"):
        t2.add_not_null("tag")
    with pytest.raises(ValueError, match="no column"):
        t2.add_not_null("ghost")


def test_column_stats_metadata_only(spark, table):
    table.commit_append(_null_df(spark, 5, 100, 10).coalesce(2))
    table.commit_append(_null_df(spark, 100, 150, 1).coalesce(1))
    st = table.column_stats("id")
    assert st == {"rows": 145, "null_count": 0, "min": 5, "max": 149}
    st = table.column_stats("tag")
    assert st["rows"] == 145
    assert st["null_count"] == 9 + 50  # every 10th of 5..99, plus all-null
    assert st["min"] == st["max"] == "v"
    # a column added by evolution is all-NULL in pre-evolution files
    table.add_column("score", "double")
    assert table.column_stats("score") == {
        "rows": 145, "null_count": 145, "min": None, "max": None
    }
    with pytest.raises(ValueError, match="no column"):
        table.column_stats("ghost")
    # deletion vectors make metadata aggregates unprovable
    table.delete_where("id = 7", mode="mor")
    with pytest.raises(ValueError, match="deletion-vectored"):
        table.column_stats("id")


def test_vacuum_retain_hours_expires_by_commit_age(spark, table):
    import json as _json

    table.commit_overwrite(_df(spark, 0, 10, "old0"))
    table.commit_overwrite(_df(spark, 0, 10, "old1"))  # v0's files dead
    table.commit_overwrite(_df(spark, 0, 10, "new"))   # v1's files dead
    # back-date the first two COMMIT TIMES (manifest ts, the input of
    # time-based retention), leaving the head fresh — a mixed-age log
    log_dir = os.path.join(table.root, "_log")
    for v, age in ((0, 7200.0), (1, 7200.0)):
        p = os.path.join(log_dir, "v%012d.json" % v)
        m = _json.load(open(p))
        m["ts"] = m["ts"] - age
        with open(p, "w") as fh:
            fh.write(_json.dumps(m))
    # fresh FILE mtimes + default grace: expiry happens, but no file
    # is reclaimed yet (the in-flight guard is age-based on files)
    assert table.vacuum(retain_hours=1.0) == []
    with pytest.raises(VersionNotFoundError):
        table.read(version=0)
    with pytest.raises(VersionNotFoundError):
        table.read(version=1)
    assert table.read().count() == 10  # head retained (always)
    # grace lifted: exactly the old versions' dead files reclaim
    deleted = table.vacuum(retain_hours=1.0, grace_seconds=0)
    assert deleted
    for f in table.manifest()["files"]:
        assert os.path.exists(os.path.join(table.root, f["path"]))
    # a horizon wider than every age expires nothing further
    table.commit_append(_df(spark, 10, 20, "tail"))
    assert table.vacuum(retain_hours=48.0, grace_seconds=0) == []
    assert {v for v in table.versions_live()} == {2, 3}


def test_vacuum_retain_hours_unions_with_retain_last(spark, table):
    import json as _json

    for tag in ("a", "b", "c"):
        table.commit_overwrite(_df(spark, 0, 5, tag))
    log_dir = os.path.join(table.root, "_log")
    for v in (0, 1, 2):  # everything is "old" by commit time
        p = os.path.join(log_dir, "v%012d.json" % v)
        m = _json.load(open(p))
        m["ts"] = m["ts"] - 7200.0
        with open(p, "w") as fh:
            fh.write(_json.dumps(m))
    # hour-horizon alone would expire ALL of them; retain_last=2 keeps
    # the newest two anyway (the rules union)
    table.vacuum(retain_last=2, retain_hours=0.5, grace_seconds=0)
    assert table.versions_live() == [1, 2]
    with pytest.raises(ValueError):
        table.vacuum(retain_hours=-1.0)


def test_read_changes_rows_across_optimize(spark, table):
    """A CDF range crossing OPTIMIZE serves: the layout rewrite's row
    delta is provably empty, so the commit emits ZERO change rows and
    the rest of the range flows (Delta parity — a consumer's range
    spanning routine maintenance must not break). Covers bin-packing,
    a byte-targeted optimize, and a z-ordered full rewrite; replay-
    onto-base equality holds across all of them."""
    table.commit_overwrite(_df(spark, 0, 100, "a").repartition(4))   # v0
    table.commit_append(_df(spark, 100, 120, "b").repartition(3))    # v1
    table.optimize(target_rows_per_file=1_000, mode="compact")       # v2
    table.commit_append(_df(spark, 120, 140, "c"))                   # v3
    table.delete_where("id < 10")                                    # v4 CoW
    table.optimize(target_bytes_per_file=1 << 30, mode="compact")    # v5
    table.commit_append(_df(spark, 200, 210, "d"))                   # v6
    table.optimize(zorder_by=["id"], mode="full")                    # v7
    table.commit_append(_df(spark, 300, 305, "e"))                   # v8

    ch = table.read_changes_rows(0)
    vers = {r["_commit_version"] for r in ch.collect()}
    assert vers == {1, 3, 4, 6, 8}  # no optimize version emits a row
    got = {
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in ch.collect()
    }
    assert {(4, "delete", i) for i in range(10)} <= got
    assert len(got) == 20 + 20 + 10 + 10 + 5
    # replay-onto-base equality across the maintenance commits
    base = {r["id"] for r in table.read(version=0).collect()}
    for v in sorted(vers):
        ins = {r["id"] for r in ch.filter(
            f"_commit_version = {v} AND _change_type = 'insert'").collect()}
        dels = {r["id"] for r in ch.filter(
            f"_commit_version = {v} AND _change_type = 'delete'").collect()}
        base = (base - dels) | ins
    assert base == {r["id"] for r in table.read().collect()}
    # a range made ONLY of optimize commits: zero rows, stable schema
    only_opt = table.read_changes_rows(6, 7)
    assert only_opt.count() == 0
    assert "_change_type" in only_opt.columns
    # the FILE-level feed serves across optimize too: appends only,
    # nothing re-delivered from the rewrites
    fl = table.read_changes(5, 8)
    assert sorted(r["id"] for r in fl.collect()) == (
        list(range(200, 210)) + list(range(300, 305))
    )
    assert table.read_changes(6, 7).count() == 0
    # a ROLLBACK in the range now SERVES (Delta RESTORE-through-CDF
    # parity): its net delta vs the pre-rollback state — resurrected
    # rows as inserts, since-V rows as deletes
    table.rollback(0)                                                 # v9
    rb = table.read_changes_rows(8)
    got_rb = {
        (r["_change_type"], r["id"]) for r in rb.collect()
    }
    assert {v for v, _ in got_rb} == {"insert", "delete"}
    assert {i for c, i in got_rb if c == "insert"} == set(range(10))
    assert {i for c, i in got_rb if c == "delete"} == (
        set(range(100, 140)) | set(range(200, 210)) | set(range(300, 305))
    )
    # whole-table overwrite still refuses — it names no prior version,
    # so there is no bounded changed-file set
    table.commit_overwrite(_df(spark, 0, 5, "z"))                     # v10
    with pytest.raises(ValueError, match="row-level delta"):
        table.read_changes_rows(9)


def test_read_changes_rows_across_rollback(spark, table):
    """CDF ranges crossing ROLLBACK/RESTORE serve (Delta parity:
    RESTORE flows through readChangeFeed as deletes+inserts vs the
    pre-restore state) — including the rollback-only deletion-vector
    SHRINK (a restored entry references an older, smaller vector:
    the removed positions are resurrected rows, emitted as inserts)
    and the roll-forward direction (a later rollback that re-applies
    the vector). Replay-onto-base equality holds across all of it;
    a schema-reverting rollback still refuses."""
    table.commit_overwrite(_df(spark, 0, 100, "a").coalesce(1))        # v0
    table.delete_where("id < 20", mode="mor")                          # v1 MoR
    table.commit_append(_df(spark, 100, 110, "b"))                     # v2
    table.rollback(0)                                                  # v3: resurrect 0-19, drop 100-109
    table.rollback(2)                                                  # v4: re-kill 0-19, re-add 100-109

    ch = table.read_changes_rows(0)
    got = {
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in ch.collect()
    }
    assert {(1, "delete", i) for i in range(20)} <= got
    # v3: vector shrink resurrection + dropped append files
    assert {(3, "insert", i) for i in range(20)} <= got
    assert {(3, "delete", i) for i in range(100, 110)} <= got
    # v4: the roll-forward — vector grows back, append files return
    assert {(4, "delete", i) for i in range(20)} <= got
    assert {(4, "insert", i) for i in range(100, 110)} <= got
    assert len(got) == 20 + 10 + (20 + 10) + (20 + 10)  # v1+v2+v3+v4
    # replay-onto-base equality across both rollbacks
    base = {r["id"] for r in table.read(version=0).collect()}
    for v in sorted({x for x, _, _ in got}):
        ins = {i for vv, c, i in got if vv == v and c == "insert"}
        dels = {i for vv, c, i in got if vv == v and c == "delete"}
        base = (base - dels) | ins
    assert base == {r["id"] for r in table.read().collect()}
    # a sub-range landing ON the rollback serves just its delta
    only_rb = table.read_changes_rows(2, 3)
    rb = {(r["_change_type"], r["id"]) for r in only_rb.collect()}
    assert rb == {("insert", i) for i in range(20)} | {
        ("delete", i) for i in range(100, 110)
    }
    # a schema-reverting rollback refuses: no single logical frame.
    # (With IDENTICAL file refs it would be a provably-zero-delta
    # metadata commit and serve as empty — so change data too.)
    table.add_column("extra", "int")                                   # v5
    table.commit_append(
        _df(spark, 110, 115, "c").selectExpr(
            "id", "tag", "cast(1 as int) as extra"
        )
    )                                                                  # v6
    table.rollback(4)                                                  # v7 reverts schema + files
    with pytest.raises(ValueError, match="SCHEMA-REVERTING"):
        table.read_changes_rows(4)
    # ... but a range that stops BEFORE it still serves
    assert table.read_changes_rows(4, 5).count() == 0
    assert table.read_changes_rows(4, 6).count() == 5


def test_type_widening_through_schema_evolution(spark, table):
    """A merge_schema append/merge whose source carries a provably
    LOSSLESS wider type (the widen_column set) evolves the table type
    in the same commit — Delta's type-widening-in-mergeSchema. Old
    files upcast at read in BOTH readers; time travel keeps the old
    type; CDF ranges cross the widening; narrowing still refuses."""
    table.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "cast(id as int) as n")
    )                                                                  # v0
    wide = spark.range(10, 15).selectExpr(
        "id", "cast(id + 10000000000 as bigint) as n"
    )
    with pytest.raises(Exception, match="widen|merge_schema"):
        table.commit_append(wide)  # widening requires the opt-in
    table.commit_append(wide, merge_schema=True)                       # v1
    assert dict(table.read().dtypes)["n"] == "bigint"
    assert table.read().count() == 15
    # old files upcast at read; values intact
    got = {r["id"]: r["n"] for r in table.read().collect()}
    assert got[3] == 3 and got[12] == 10000000012
    # time travel keeps the OLD type
    assert dict(table.read(version=0).dtypes)["n"] == "int"
    # the Python DataSource reader upcasts the same way
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    pyds = (
        spark.read.format("versioned").option("root", table.root).load()
    )
    assert dict(pyds.dtypes)["n"] == "bigint"
    assert pyds.count() == 15
    assert {r["n"] for r in pyds.filter("id = 3").collect()} == {3}
    # CDF across the widening serves in the target (wide) type
    ch = table.read_changes_rows(0)
    assert dict(ch.dtypes)["n"] == "bigint"
    assert {r["id"] for r in ch.collect()} == set(range(10, 15))
    # a NARROWER source still refuses (the widen_column contract:
    # subsequent writes must supply the widened type)
    src = spark.createDataFrame(
        [(0, 7), (100, 8)], "id bigint, n int"
    )
    with pytest.raises(Exception, match="type change"):
        table.merge(src, ["id"])
    assert dict(table.read().dtypes)["n"] == "bigint"


def test_merge_type_widening_requires_opt_in(spark, table):
    table.commit_overwrite(
        spark.range(0, 5).selectExpr("id", "cast(id as int) as n")
    )
    src = spark.createDataFrame([(1, 99), (50, 1)], "id bigint, n bigint")
    with pytest.raises(Exception, match="widens|merge_schema"):
        table.merge(src, ["id"])
    table.merge(src, ["id"], merge_schema=True)
    assert dict(table.read().dtypes)["n"] == "bigint"
    got = {r["id"]: r["n"] for r in table.read().collect()}
    assert got[1] == 99 and got[50] == 1 and got[2] == 2
    # a genuinely incompatible change still refuses
    bad = spark.createDataFrame([(1, "x")], "id bigint, n string")
    with pytest.raises(Exception, match="type change"):
        table.merge(bad, ["id"], merge_schema=True)


def test_refresh_file_sizes_backfills_legacy_entries(spark, table):
    """refresh_file_sizes(): a pre-bytes (legacy) manifest gets exact
    per-file bytes stamped in ONE metadata-only commit — DESCRIBE
    DETAIL's sizeInBytes becomes exact, byte-targeted OPTIMIZE bins by
    real bytes, change feeds skip the commit (zero row delta), and the
    call is idempotent."""
    import json as _json
    import os as _os

    table.commit_overwrite(_df(spark, 0, 100, "a").repartition(3))
    table.commit_append(_df(spark, 100, 120, "b"))
    # age the manifest to the pre-r10 shape: strip the bytes field
    head = table.latest_version()
    path = _os.path.join(table.root, "_log", "v%012d.json" % head)
    m = _json.loads(open(path).read())
    for e in m["files"]:
        e.pop("bytes", None)
    open(path, "w").write(_json.dumps(m))
    assert all(f.get("bytes") is None for f in table.manifest()["files"])

    files_before = {f["path"] for f in table.manifest()["files"]}
    info = table.refresh_file_sizes()
    assert info.action == "refresh_stats"
    m2 = table.manifest()
    assert {f["path"] for f in m2["files"]} == files_before
    for f in m2["files"]:
        assert f["bytes"] == _os.stat(table._abs(f)).st_size
    # the backfill commit is metadata-only to the row-level change feed
    ch = table.read_changes_rows(head)
    assert ch.count() == 0
    # byte-targeted optimize now bins by REAL bytes: a target far above
    # the true total packs everything into one file (no estimate path)
    total = sum(f["bytes"] for f in m2["files"])
    table.optimize(target_bytes_per_file=total * 10, mode="compact")
    assert len(table.manifest()["files"]) == 1
    # idempotent: second refresh is a no-op commit, bytes unchanged
    before = {f["path"]: f["bytes"] for f in table.manifest()["files"]}
    table.refresh_file_sizes()
    assert {
        f["path"]: f["bytes"] for f in table.manifest()["files"]
    } == before
