"""SQL WRITE surface of the versioned lakehouse layer.

Two complementary paths (see sources/pyds_write.py, sources/sql_dml.py):

* **Native V2 writes** — ``INSERT INTO|OVERWRITE <USING versioned
  view>`` and ``df.write.format("versioned")`` route through the
  Python DataSource writer: executor tasks stream Arrow batches into
  fresh parquet files (stats folded in-line), the driver hook claims
  the next version with the os-primitive twin of the JVM commit
  protocol. Exactly-once under racing writers via CAS retry.
* **``versioned_sql()``** — full-fidelity DML text (INSERT/UPDATE/
  DELETE/MERGE) driven through the Spark-side VersionedTable API, for
  everything the engine-less native hooks refuse (constraints,
  generated, identity) or Spark cannot route (row-level ops).

Oracle cross-check: every mutation is verified by reading the table
BACK through the independent JVM reader (VersionedTable.read) — the
two implementations must agree on the committed state.
"""

from __future__ import annotations

import threading

import pytest

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.sql_dml import versioned_sql
from finalpipeline_spark.sources.versioned import (
    ConstraintViolationError,
    VersionedTable,
)


@pytest.fixture()
def vt(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "cast(id % 3 as int) as grp")
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW sqlw USING versioned "
        f"OPTIONS (root '{t.root}')"
    )
    yield t
    spark.catalog.dropTempView("sqlw")


def _ids(spark, vt):
    return sorted(r.id for r in vt.read().collect())


# -- native V2 path ----------------------------------------------------
def test_insert_into_view_pure_sql(spark, vt):
    spark.sql("INSERT INTO sqlw VALUES (100, 1), (101, 2)")
    assert _ids(spark, vt) == list(range(10)) + [100, 101]
    m = vt.manifest()
    assert m["action"] == "append" and m["version"] == 1
    # the SQL-written file carries the same stats shape the JVM writer
    # records: min/max for both columns plus null counts
    seed_paths = {e["path"] for e in vt.manifest(0)["files"]}
    new = [e for e in m["files"] if e["path"] not in seed_paths]
    assert len(new) >= 1 and sum(e["rows"] for e in new) == 2
    joined = [e["stats"]["id"] for e in new]
    assert min(lo for lo, _ in joined) == 100
    assert max(hi for _, hi in joined) == 101
    assert all(e["nulls"] == {"id": 0, "grp": 0} for e in new)
    # and the view reads its own write back (fresh plan per query)
    assert spark.sql("SELECT count(*) c FROM sqlw").first().c == 12


def test_insert_overwrite_view(spark, vt):
    spark.sql("INSERT OVERWRITE sqlw VALUES (7, 0)")
    assert _ids(spark, vt) == [7]
    assert vt.manifest()["action"] == "overwrite"


def test_df_write_bootstraps_and_appends(spark, tmp_path):
    register_versioned_source(spark)
    root = str(tmp_path / "boot")
    df = spark.range(0, 5).selectExpr("id", "cast(id as double) as v")
    df.write.format("versioned").option("root", root).mode("append").save()
    t = VersionedTable(spark, root)
    assert t.latest_version() == 0 and t.count_rows() == 5
    df.write.format("versioned").option("root", root).mode("append").save()
    assert t.latest_version() == 1 and t.count_rows() == 10
    spark.range(9, 12).selectExpr("id", "cast(id as double) as v").write.format(
        "versioned"
    ).option("root", root).mode("overwrite").save()
    assert t.count_rows() == 3 and t.manifest()["action"] == "overwrite"
    # time travel still sees the pre-overwrite snapshot
    assert t.read(version=1).count() == 10


def test_insert_schema_mismatch_refused(spark, vt):
    with pytest.raises(Exception, match="[Ss]chema|columns"):
        spark.range(3).write.format("versioned").option("root", vt.root).mode(
            "append"
        ).save()


def test_snapshot_views_are_read_only(spark, vt):
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW sqlw_v0 USING versioned "
        f"OPTIONS (root '{vt.root}', version '0')"
    )
    with pytest.raises(Exception, match="read-only"):
        spark.sql("INSERT INTO sqlw_v0 VALUES (1, 1)")
    spark.catalog.dropTempView("sqlw_v0")


def test_native_path_refuses_engine_features(spark, vt):
    vt.add_constraint("pos", "id >= 0")
    with pytest.raises(Exception, match="versioned_sql"):
        spark.sql("INSERT INTO sqlw VALUES (200, 1)")
    # the refusal left no trace: same version, no orphan rows
    assert vt.manifest()["version"] == 1 and vt.count_rows() == 10


def test_racing_sql_inserts_land_exactly_once(spark, vt):
    """Concurrent INSERTs through the SQL path must each commit exactly
    once (CAS retry on version collisions), racing a JVM-side writer."""
    errs = []

    def sql_writer(lo):
        try:
            spark.sql(f"INSERT INTO sqlw VALUES ({lo}, 0), ({lo + 1}, 1)")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def jvm_writer():
        try:
            vt.commit_with_retry(
                lambda t: t.commit_append(
                    spark.range(500, 503).selectExpr(
                        "id", "cast(id % 3 as int) as grp"
                    )
                )
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=sql_writer, args=(lo,))
        for lo in (100, 200, 300)
    ] + [threading.Thread(target=jvm_writer)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    expect = (
        list(range(10))
        + [100, 101, 200, 201, 300, 301]
        + [500, 501, 502]
    )
    assert _ids(spark, vt) == expect
    # seed (v0) + four racing commits, contiguous, no gaps
    assert vt.versions() == list(range(5))


# -- versioned_sql (full-fidelity DML text) ----------------------------
def test_sql_insert_with_constraints_enforced(spark, vt):
    vt.add_constraint("pos", "id >= 0")
    info = versioned_sql(
        spark, f"INSERT INTO versioned.`{vt.root}` VALUES (42, 1)"
    )
    assert info.action == "append"
    assert 42 in _ids(spark, vt)
    with pytest.raises(ConstraintViolationError):
        versioned_sql(spark, "INSERT INTO sqlw VALUES (-5, 1)")


def test_sql_insert_identity_column_list(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "ident"))
    t.commit_overwrite(spark.range(0).selectExpr("id as n"))
    t.add_identity_column("rid", start=10, step=2)
    t.commit_append(spark.range(0, 3).selectExpr("id as n"))
    versioned_sql(spark, f"INSERT INTO versioned.`{t.root}` (n) VALUES (7), (8)")
    rows = {r.n: r.rid for r in t.read().collect()}
    new_rids = sorted(rid for n, rid in rows.items() if n in (7, 8))
    assert len(new_rids) == 2 and all(
        rid >= 10 and (rid - 10) % 2 == 0 for rid in new_rids
    )
    # supplying the identity column is refused (ALWAYS semantics)
    with pytest.raises(Exception, match="IDENTITY|identity"):
        versioned_sql(
            spark,
            f"INSERT INTO versioned.`{t.root}` (n, rid) VALUES (9, 99)",
        )


def test_sql_update_and_delete(spark, vt):
    versioned_sql(spark, "UPDATE sqlw SET grp = grp + 10 WHERE id >= 8")
    got = {r.id: r.grp for r in vt.read().collect()}
    assert got[9] == 9 % 3 + 10 and got[0] == 0
    versioned_sql(spark, "DELETE FROM sqlw WHERE id < 2")
    assert _ids(spark, vt) == list(range(2, 10))


def test_sql_merge_upsert(spark, vt):
    src = spark.createDataFrame(
        [(5, 77), (100, 1)], "id bigint, grp int"
    )
    src.createOrReplaceTempView("merge_src")
    versioned_sql(
        spark,
        """MERGE INTO sqlw AS t USING merge_src AS s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET grp = s.grp
           WHEN NOT MATCHED THEN INSERT *""",
    )
    got = {r.id: r.grp for r in vt.read().collect()}
    assert got[5] == 77 and got[100] == 1 and len(got) == 11
    spark.catalog.dropTempView("merge_src")


def test_sql_merge_matched_delete_conditional(spark, vt):
    src = spark.createDataFrame(
        [(3, True), (4, False)], "id bigint, doom boolean"
    )
    src.createOrReplaceTempView("merge_del")
    versioned_sql(
        spark,
        """MERGE INTO sqlw AS t USING merge_del AS s ON t.id = s.id
           WHEN MATCHED AND s.doom THEN DELETE""",
    )
    ids = _ids(spark, vt)
    assert 3 not in ids and 4 in ids and len(ids) == 9
    # row 4 carried through UNCHANGED (no whole-row replacement)
    assert {r.grp for r in vt.read().filter("id = 4").collect()} == {4 % 3}
    spark.catalog.dropTempView("merge_del")


def test_sql_merge_not_matched_by_source_delete(spark, vt):
    src = spark.createDataFrame([(i,) for i in range(5)], "id bigint")
    src.createOrReplaceTempView("merge_keep")
    versioned_sql(
        spark,
        """MERGE INTO sqlw AS t USING merge_keep AS s ON t.id = s.id
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
    )
    assert _ids(spark, vt) == list(range(5))
    spark.catalog.dropTempView("merge_keep")


def test_sql_merge_subquery_source(spark, vt):
    versioned_sql(
        spark,
        """MERGE INTO sqlw AS t
           USING (SELECT id * 1000 AS id, 0 AS grp FROM range(2)) AS s
           ON t.id = s.id
           WHEN NOT MATCHED THEN INSERT *""",
    )
    ids = _ids(spark, vt)
    assert 1000 in ids and 0 in ids and len(ids) == 11  # id 0 matched


def test_sql_select_passthrough_and_bad_shapes(spark, vt):
    assert versioned_sql(spark, "SELECT 1 AS x").first().x == 1
    with pytest.raises(ValueError, match="INSERT"):
        versioned_sql(spark, "INSERT sqlw VALUES (1, 2)")
    with pytest.raises(ValueError, match="MERGE ON"):
        versioned_sql(
            spark,
            "MERGE INTO sqlw AS t USING sqlw AS s ON t.id > s.id "
            "WHEN NOT MATCHED THEN INSERT *",
        )


def test_empty_insert_is_a_noop_append(spark, vt):
    spark.sql("INSERT INTO sqlw SELECT id, 0 FROM range(10) WHERE id < 0")
    assert vt.count_rows() == 10 and vt.manifest()["action"] == "append"


# -- streaming writes (writeStream.format("versioned")) ----------------
def test_writestream_versioned_format(spark, tmp_path):
    """The streaming sink as a first-class format: a file stream lands
    in a versioned table via df.writeStream.format('versioned'), one
    commit per micro-batch, each carrying its (sinkId, batchId) commit
    identity; restarting the SAME query over the same checkpoint adds
    nothing (engine-level recovery), and new source data keeps
    appending through the same checkpoint."""
    register_versioned_source(spark)
    src = str(tmp_path / "src")
    spark.range(0, 6).selectExpr("id", "id * 2 as v").write.parquet(
        src + "/b0"
    )
    root = str(tmp_path / "stream_vt")
    ck = str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.schema("id bigint, v bigint")
            .parquet(src + "/*")
            .writeStream.format("versioned")
            .option("root", root)
            .option("sinkId", "sqlw-e2e")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    t = VersionedTable(spark, root)
    assert t.count_rows() == 6
    assert "sink_epoch" in (t.manifest().get("meta") or {})
    v_first = t.latest_version()
    run_once()  # restart, no new data: nothing re-appends
    assert t.latest_version() == v_first and t.count_rows() == 6
    spark.range(6, 10).selectExpr("id", "id * 2 as v").write.parquet(
        src + "/b1"
    )
    run_once()
    assert t.count_rows() == 10
    got = {r.id: r.v for r in t.read().collect()}
    assert got == {i: 2 * i for i in range(10)}


def test_stream_writer_epoch_replay_is_noop(spark, tmp_path):
    """Direct replay drive of the stream writer's commit hook: the
    crash window between table commit and engine checkpoint re-delivers
    a batch with fresh staged files — the second commit() must drop
    them and write NO new version."""
    import os as _os

    from pyspark.sql.types import StructType

    from finalpipeline_spark.sources.pyds_write import (
        FileCommitMessage,
        VersionedStreamDataSourceWriter,
        _write_partition,
    )

    root = str(tmp_path / "replay_vt")
    vt = VersionedTable(spark, root)
    vt.commit_overwrite(spark.range(0, 3).selectExpr("id as n"))
    schema = StructType.fromDDL("n bigint")
    w = VersionedStreamDataSourceWriter(
        {"root": root, "sinkId": "replay-test"}, schema, False
    )

    import pyarrow as pa

    def staged():
        batch = pa.record_batch([pa.array([7, 8], pa.int64())], names=["n"])
        return [_write_partition(root, w._commit_dir, w._fields, iter([batch]))]

    w.commit(staged(), batchId=0)
    assert vt.count_rows() == 5 and vt.latest_version() == 1
    replay = staged()  # re-delivered epoch stages fresh files
    w.commit(replay, batchId=0)
    assert vt.count_rows() == 5 and vt.latest_version() == 1
    # the replayed batch's staged file was cleaned up, not leaked
    assert not _os.path.exists(
        _os.path.join(root, replay[0].entry["path"])
    )
    w.commit(staged(), batchId=1)  # the NEXT epoch commits normally
    assert vt.count_rows() == 7 and vt.latest_version() == 2


def test_stream_writer_refuses_complete_mode_and_engine_features(
    spark, tmp_path
):
    from pyspark.sql.types import StructType

    from finalpipeline_spark.sources.pyds_write import (
        VersionedStreamDataSourceWriter,
    )

    schema = StructType.fromDDL("n bigint")
    with pytest.raises(ValueError, match="append output mode"):
        VersionedStreamDataSourceWriter(
            {"root": str(tmp_path / "x"), "sinkId": "s"}, schema, True
        )
    # sinkId is REQUIRED: a defaulted identity shared by two queries
    # would silently drop the second query's early batches as replays
    with pytest.raises(ValueError, match="sinkId"):
        VersionedStreamDataSourceWriter(
            {"root": str(tmp_path / "x")}, schema, False
        )
    t = VersionedTable(spark, str(tmp_path / "cons"))
    t.commit_overwrite(spark.range(3).selectExpr("id as n"))
    t.add_constraint("pos", "n >= 0")
    with pytest.raises(ValueError, match="versioned_sql"):
        VersionedStreamDataSourceWriter(
            {"root": t.root, "sinkId": "s"}, schema, False
        )


# -- maintenance statements through versioned_sql -----------------------
def test_sql_optimize_vacuum_describe_history(spark, vt):
    spark.sql("INSERT INTO sqlw VALUES (100, 1)")
    spark.sql("INSERT INTO sqlw VALUES (101, 2)")
    hist = versioned_sql(spark, "DESCRIBE HISTORY sqlw")
    assert [r.action for r in hist.orderBy("version").collect()] == [
        "overwrite", "append", "append",
    ]
    n_files_before = vt.manifest()["files"]
    info = versioned_sql(spark, "OPTIMIZE sqlw")
    assert info.action == "optimize"
    assert len(vt.manifest()["files"]) <= len(n_files_before)
    assert sorted(r.id for r in vt.read().collect()) == list(range(10)) + [100, 101]
    # dry run reports reclaimable paths without touching them
    dry = versioned_sql(
        spark,
        f"VACUUM versioned.`{vt.root}` RETAIN 1 VERSIONS "
        "GRACE 0 SECONDS DRY RUN",
    )
    assert dry.count() > 0
    assert vt.read(version=0).count() == 10  # nothing deleted yet
    real = versioned_sql(
        spark, "VACUUM sqlw RETAIN 1 VERSIONS GRACE 0 SECONDS"
    )
    assert sorted(r.path for r in real.collect()) == sorted(
        r.path for r in dry.collect()
    )
    assert vt.count_rows() == 12  # head intact


def test_sql_written_files_prune_by_stats(spark, vt):
    """The stats the SQL writer folds in-line must be USABLE, not just
    present: a read_pruned over the SQL-written table skips the files
    whose [min, max] excludes the predicate."""
    for lo in (1000, 2000, 3000):
        spark.sql(f"INSERT INTO sqlw VALUES ({lo}, 0), ({lo + 1}, 1)")
    m = vt.manifest()
    may_hit = [
        e
        for e in m["files"]
        if e["stats"]["id"][0] is None
        or (e["stats"]["id"][1] >= 2000 and e["stats"]["id"][0] <= 2001)
    ]
    assert 0 < len(may_hit) < len(m["files"])  # stats actually exclude
    got = vt.read_pruned("id", 2000, 2001)
    assert sorted(r.id for r in got.collect()) == [2000, 2001]


# -- additive schema evolution on the native path ------------------------
def test_df_write_merge_schema_evolution(spark, tmp_path):
    """option('mergeSchema','true') extends the table schema additively
    (Delta parity): old files NULL-backfill the new column at read;
    without the option the mismatch refuses; type conflicts and
    re-adds of previously-dropped names always refuse."""
    register_versioned_source(spark)
    root = str(tmp_path / "ev")
    spark.range(0, 4).selectExpr("id").write.format("versioned").option(
        "root", root
    ).mode("append").save()
    t = VersionedTable(spark, root)
    evolved = spark.range(4, 6).selectExpr("id", "id * 10 as extra")
    with pytest.raises(Exception, match="mergeSchema"):
        evolved.write.format("versioned").option("root", root).mode(
            "append"
        ).save()
    evolved.write.format("versioned").option("root", root).option(
        "mergeSchema", "true"
    ).mode("append").save()
    got = {r.id: r.extra for r in t.read().collect()}
    assert got == {0: None, 1: None, 2: None, 3: None, 4: 40, 5: 50}
    assert t.manifest()["schema"] == "struct<id:bigint,extra:bigint>"
    # type conflict refuses even with the option
    bad = spark.range(6, 7).selectExpr("id", "cast(id as string) as extra")
    with pytest.raises(Exception, match="type change"):
        bad.write.format("versioned").option("root", root).option(
            "mergeSchema", "true"
        ).mode("append").save()
    # re-add of a dropped name refuses (would resurrect old values)
    t.drop_column("extra")
    with pytest.raises(Exception, match="previously dropped"):
        evolved.write.format("versioned").option("root", root).option(
            "mergeSchema", "true"
        ).mode("append").save()


def test_committed_epoch_scan_is_incremental(spark, tmp_path, monkeypatch):
    """The stream writer's replay lookup must not re-open every
    manifest on every micro-batch (the read-side r8 poll-cost class):
    after the first scan, a new call probes only the tail."""
    import finalpipeline_spark.sources.pyds as pyds
    from finalpipeline_spark.sources import pyds_write

    root = str(tmp_path / "epochs")
    vt = VersionedTable(spark, root)
    vt.commit_overwrite(spark.range(2).selectExpr("id as n"))
    for e in range(4):
        vt.commit_append(
            spark.range(2).selectExpr("id as n"),
            meta={"sink_epoch": f"s#{e}"},
        )
    first = pyds_write._committed_epochs(root)
    assert first == {f"s#{e}" for e in range(4)}
    calls = []
    real = pyds._manifest_any

    def counting(r, v):
        calls.append(v)
        return real(r, v)

    monkeypatch.setattr(pyds, "_manifest_any", counting)
    again = pyds_write._committed_epochs(root)
    assert again == first
    # head probe (head+1 miss) + v0 replacement canary — NOT a rescan
    # of all five committed manifests
    assert len(calls) <= 3
    # a NEW commit extends the set incrementally
    vt.commit_append(
        spark.range(2).selectExpr("id as n"), meta={"sink_epoch": "s#4"}
    )
    calls.clear()
    assert pyds_write._committed_epochs(root) == first | {"s#4"}
    assert len(calls) <= 4
    # table REPLACEMENT at the same root must drop the cached epochs
    monkeypatch.undo()
    import shutil as _shutil

    _shutil.rmtree(root)
    vt2 = VersionedTable(spark, root)
    vt2.commit_overwrite(spark.range(1).selectExpr("id as n"))
    assert pyds_write._committed_epochs(root) == set()


def test_sql_ctas_clone_restore(spark, vt, tmp_path):
    # CTAS bootstraps a new root; plain CREATE refuses an existing one
    dst = str(tmp_path / "ctas")
    info = versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{dst}` AS "
        "SELECT id, grp FROM sqlw WHERE id < 4",
    )
    assert info.action == "overwrite"
    t2 = VersionedTable(spark, dst)
    assert sorted(r.id for r in t2.read().collect()) == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="already exists"):
        versioned_sql(
            spark, f"CREATE TABLE versioned.`{dst}` AS SELECT 1 AS x"
        )
    versioned_sql(
        spark,
        f"CREATE OR REPLACE TABLE versioned.`{dst}` AS "
        "SELECT id, grp FROM sqlw WHERE id >= 8",
    )
    assert sorted(r.id for r in t2.read().collect()) == [8, 9]
    assert t2.read(version=0).count() == 4  # history preserved

    # SHALLOW CLONE at a pinned version
    c1 = str(tmp_path / "clone1")
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{c1}` SHALLOW CLONE "
        f"versioned.`{dst}` VERSION AS OF 0",
    )
    assert sorted(
        r.id for r in VersionedTable(spark, c1).read().collect()
    ) == [0, 1, 2, 3]

    # RESTORE by version: roll-forward commit, history intact
    info = versioned_sql(
        spark, f"RESTORE TABLE versioned.`{dst}` TO VERSION AS OF 0"
    )
    assert info.action == "rollback"
    assert sorted(r.id for r in t2.read().collect()) == [0, 1, 2, 3]
    assert t2.read(version=1).count() == 2  # nothing rewritten


def test_sql_written_commits_flow_through_change_feed(spark, vt, tmp_path):
    """SQL-written tables are full lakehouse citizens: commits made by
    the native INSERT path must stream through the change feed exactly
    like JVM-written ones — right rows, right _commit_version tags."""
    spark.sql("INSERT INTO sqlw VALUES (50, 0)")
    spark.sql("INSERT INTO sqlw VALUES (51, 1)")
    from finalpipeline_spark.sources.pyds import table_changes

    ch = table_changes(spark, vt.root, 1).collect()
    assert {(r.id, r._commit_version, r._change_type) for r in ch} == {
        (50, 1, "insert"),
        (51, 2, "insert"),
    }
    # and the STREAMING change feed sees them too
    out = str(tmp_path / "cdf_out")
    ck = str(tmp_path / "cdf_ck")
    q = (
        spark.readStream.format("versioned")
        .option("root", vt.root)
        .option("changeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.filter("_commit_version >= 1").count() == 2
    assert got.count() == 12  # snapshot (10) + the two SQL inserts


def test_bloom_index_is_a_durable_table_property(spark, tmp_path):
    """The bloom geometry must survive the writer that declared it: a
    config-less JVM handle AND the SQL INSERT path both keep the index
    populated from the manifest's bloom_index property, and point
    lookups prune from either handle."""
    register_versioned_source(spark)
    root = str(tmp_path / "bloomy")
    t = VersionedTable(spark, root, bloom_col="k", bloom_bits=4096, bloom_k=3)
    t.commit_overwrite(
        spark.range(0, 50).selectExpr("cast(id as string) as k", "id as v")
    )
    m = t.manifest()
    assert m["bloom_index"] == {"col": "k", "bits": 4096, "k": 3}
    assert all("bloom" in e for e in m["files"])

    # config-less handle appends: property carried, new files bloomed
    plain = VersionedTable(spark, root)
    plain.commit_append(
        spark.range(50, 90).selectExpr("cast(id as string) as k", "id as v")
    )
    m = plain.manifest()
    assert m["bloom_index"]["col"] == "k"
    assert all("bloom" in e for e in m["files"])

    # SQL INSERT path: new entries carry executor-computed blooms
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW bloomy USING versioned "
        f"OPTIONS (root '{root}')"
    )
    spark.sql("INSERT INTO bloomy VALUES ('990', 990), ('991', 991)")
    m = plain.manifest()
    assert m["bloom_index"]["col"] == "k"
    assert all("bloom" in e for e in m["files"])

    # point lookup from the CONFIG-LESS handle prunes to the right file
    # and returns the exact row — including a SQL-written key
    for key, val in (("7", 7), ("990", 990)):
        got = plain.read_point_lookup(key).collect()
        assert [(r.k, r.v) for r in got] == [(key, val)]
    # pruning actually skips: a missing key probes no candidate files
    # in the common case (allow bloom false positives, bound them)
    probed = [
        e for e in m["files"]
        if plain._bloom_might_contain(e["bloom"], "no-such-key", 4096, 3)
    ]
    assert len(probed) < len(m["files"])
    assert plain.read_point_lookup("no-such-key").count() == 0
    spark.catalog.dropTempView("bloomy")


# -- ALTER TABLE surface -------------------------------------------------
def test_sql_alter_add_drop_rename_widen(spark, vt):
    versioned_sql(spark, "ALTER TABLE sqlw ADD COLUMN note string")
    df = vt.read()
    assert "note" in df.columns
    assert df.filter("note IS NOT NULL").count() == 0  # NULL-backfilled

    versioned_sql(
        spark, "ALTER TABLE sqlw ADD COLUMNS (a int, b decimal(10,2))"
    )
    types = dict(vt.read().dtypes)
    assert types["a"] == "int" and types["b"] == "decimal(10,2)"

    versioned_sql(spark, "ALTER TABLE sqlw ALTER COLUMN a TYPE bigint")
    assert dict(vt.read().dtypes)["a"] == "bigint"
    with pytest.raises(ValueError, match="lossless"):
        versioned_sql(spark, "ALTER TABLE sqlw ALTER COLUMN b TYPE int")

    versioned_sql(spark, "ALTER TABLE sqlw RENAME COLUMN note TO comment")
    cols = vt.read().columns
    assert "comment" in cols and "note" not in cols
    # pre-rename data survives the mapping: grp still reads its values
    assert vt.read().filter("grp IS NULL").count() == 0

    versioned_sql(spark, "ALTER TABLE sqlw DROP COLUMN b")
    assert "b" not in vt.read().columns
    versioned_sql(spark, "ALTER TABLE sqlw DROP COLUMNS (a, comment)")
    assert set(vt.read().columns) == {"id", "grp"}

    # the whole evolution flow stays SQL-writable afterwards
    spark.sql("INSERT INTO sqlw VALUES (100, 1)")
    assert vt.count_rows() == 11

    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        versioned_sql(spark, "ALTER TABLE sqlw FROBNICATE COLUMN x")


def test_sql_alter_constraints_and_not_null(spark, vt):
    versioned_sql(
        spark,
        "ALTER TABLE sqlw ADD CONSTRAINT grp_range CHECK (grp BETWEEN 0 AND 2)",
    )
    assert vt.constraints() == {"grp_range": "grp BETWEEN 0 AND 2"}
    with pytest.raises(ConstraintViolationError):
        versioned_sql(spark, "INSERT INTO sqlw VALUES (500, 99)")
    versioned_sql(spark, "ALTER TABLE sqlw DROP CONSTRAINT grp_range")
    versioned_sql(spark, "INSERT INTO sqlw VALUES (500, 99)")
    assert vt.count_rows() == 11

    versioned_sql(spark, "ALTER TABLE sqlw ALTER COLUMN id SET NOT NULL")
    assert "id_not_null" in vt.constraints()
    # a column with existing NULLs refuses NOT NULL loudly
    versioned_sql(spark, "ALTER TABLE sqlw ADD COLUMN opt string")
    with pytest.raises(ValueError, match="NULL"):
        versioned_sql(spark, "ALTER TABLE sqlw ALTER COLUMN opt SET NOT NULL")


def test_sql_alter_generated_and_identity(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "gen"))
    t.commit_overwrite(
        spark.range(0).selectExpr("cast(id as string) as k", "id as v")
    )  # stage the schema empty, then declare rules (Delta: at creation)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW altgen USING versioned "
        f"OPTIONS (root '{t.root}')"
    )
    versioned_sql(
        spark,
        "ALTER TABLE altgen ADD COLUMN v2 bigint GENERATED ALWAYS AS (v * 2)",
    )
    versioned_sql(
        spark,
        "ALTER TABLE altgen ADD COLUMN rid BIGINT GENERATED ALWAYS AS "
        "IDENTITY (START WITH 10 INCREMENT BY 5)",
    )
    assert t.generated() == {"v2": "v * 2"}
    assert t.identity() == {"rid": {"start": 10, "step": 5}}
    versioned_sql(spark, "INSERT INTO altgen (k, v) VALUES ('a', 1), ('b', 2)")
    rows = {r.k: r for r in t.read().collect()}
    assert rows["a"].v2 == 2 and rows["b"].v2 == 4
    assert {rows["a"].rid, rows["b"].rid} <= {10, 15}
    # a non-BIGINT identity declaration refuses at parse time
    with pytest.raises(ValueError, match="BIGINT"):
        versioned_sql(
            spark,
            "ALTER TABLE altgen ADD COLUMN oops int GENERATED ALWAYS AS IDENTITY",
        )
    spark.catalog.dropTempView("altgen")


def test_sql_alter_routing_edges(spark, vt, tmp_path):
    # a snapshot view is read-only for evolution too
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW sqlw_v0 USING versioned "
        f"OPTIONS (root '{vt.root}', version '0')"
    )
    with pytest.raises(ValueError, match="read-only"):
        versioned_sql(spark, "ALTER TABLE sqlw_v0 ADD COLUMN x int")
    spark.catalog.dropTempView("sqlw_v0")
    # a non-versioned relation routes to Spark's own ALTER TABLE (which
    # refuses schema changes on plain temp views with its own error)
    spark.range(3).createOrReplaceTempView("plainv")
    with pytest.raises(Exception, match="(?i)plainv|not supported|expect"):
        versioned_sql(spark, "ALTER TABLE plainv ADD COLUMN x int")
    spark.catalog.dropTempView("plainv")


def test_sql_vacuum_retain_hours(spark, vt):
    import json as _json
    import os

    spark.sql("INSERT OVERWRITE sqlw VALUES (1, 0)")  # v0 files dead
    p = os.path.join(vt.root, "_log", "v%012d.json" % 0)
    m = _json.load(open(p))
    m["ts"] = m["ts"] - 7200.0
    with open(p, "w") as fh:
        fh.write(_json.dumps(m))
    got = versioned_sql(
        spark, "VACUUM sqlw RETAIN 1 HOURS GRACE 0 SECONDS"
    )
    assert got.count() > 0  # v0's files reclaimed by the hour horizon
    assert vt.versions_live() == [1]
    # fractional horizons parse; VERSIONS with a fraction refuses
    versioned_sql(spark, "VACUUM sqlw RETAIN 0.5 HOURS GRACE 0 SECONDS")
    with pytest.raises(ValueError, match="integer"):
        versioned_sql(spark, "VACUUM sqlw RETAIN 1.5 VERSIONS")


def test_create_table_column_list_full_roundtrip(spark, tmp_path):
    """CREATE TABLE (col ...) empty-table DDL: declared schema, NOT
    NULL, a CHECK constraint, generated + identity columns, and the
    bloom property land in one statement; INSERTs are then enforced
    exactly as if each clause had been declared through the Python
    API, and declared column order is preserved."""
    register_versioned_source(spark)
    root = str(tmp_path / "created")
    info = versioned_sql(
        spark,
        f"""CREATE TABLE versioned.`{root}` (
              id bigint NOT NULL,
              name string,
              price double,
              cents bigint GENERATED ALWAYS AS (cast(price * 100 as bigint)),
              rid bigint GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 5),
              CONSTRAINT price_pos CHECK (price >= 0)
            ) TBLPROPERTIES ('bloom.column' = 'name')""",
    )
    t = VersionedTable(spark, root)
    assert t.count_rows() == 0
    assert t._schema_of(t.manifest()).fieldNames() == [
        "id", "name", "price", "cents", "rid"
    ]
    assert t.generated() == {"cents": "cast(price * 100 as bigint)"}
    assert t.identity() == {"rid": {"start": 5, "step": 5}}
    assert t.table_properties().get("bloom.column") == "name"
    assert info.version == t.latest_version()

    # engine-enforced INSERT: identity assigned, generated computed
    versioned_sql(
        spark,
        f"INSERT INTO versioned.`{root}` (id, name, price) "
        "VALUES (1, 'a', 1.5), (2, 'b', 2.25)",
    )
    rows = {r["id"]: r for r in t.read().collect()}
    assert rows[1]["cents"] == 150 and rows[2]["cents"] == 225
    rids = sorted(r["rid"] for r in rows.values())
    assert rids[0] >= 5 and all(v % 5 == 0 for v in rids)
    assert len(set(rids)) == 2
    # NOT NULL and CHECK refuse violating writes
    with pytest.raises(Exception, match="id_not_null|constraint"):
        versioned_sql(
            spark,
            f"INSERT INTO versioned.`{root}` (id, name, price) "
            "VALUES (NULL, 'x', 1.0)",
        )
    with pytest.raises(Exception, match="price_pos|constraint"):
        versioned_sql(
            spark,
            f"INSERT INTO versioned.`{root}` (id, name, price) "
            "VALUES (3, 'x', -1.0)",
        )
    # evolution on the created table keeps working
    versioned_sql(spark, f"ALTER TABLE versioned.`{root}` ADD COLUMN tag string")
    assert "tag" in t._schema_of(t.manifest()).fieldNames()


def test_create_table_column_list_guards(spark, tmp_path):
    register_versioned_source(spark)
    root = str(tmp_path / "g")
    versioned_sql(spark, f"CREATE TABLE versioned.`{root}` (id bigint)")
    with pytest.raises(ValueError, match="already exists"):
        versioned_sql(spark, f"CREATE TABLE versioned.`{root}` (id bigint)")
    with pytest.raises(ValueError, match="OR REPLACE"):
        versioned_sql(
            spark,
            f"CREATE OR REPLACE TABLE versioned.`{root}2` (id bigint)",
        )
    # the whole declaration stages into ONE atomic commit now, so an
    # identity-first column list is legal and order is preserved
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{root}3` "
        "(rid bigint GENERATED ALWAYS AS IDENTITY, v int)",
    )
    t3 = VersionedTable(spark, f"{root}3")
    assert t3.latest_version() == 0  # one commit, atomic
    assert t3._schema_of(t3.manifest()).fieldNames() == ["rid", "v"]
    assert t3.identity() == {"rid": {"start": 1, "step": 1}}
    # ... and no whitespace is needed before the column list
    versioned_sql(spark, f"CREATE TABLE versioned.`{root}6`(id bigint)")
    assert VersionedTable(spark, f"{root}6").latest_version() == 0
    # a bad clause must leave NO half-declared root behind (atomicity):
    # the failing statement aborts before any commit, so a corrected
    # re-run succeeds instead of hitting 'already exists'
    with pytest.raises(Exception, match="nope|unparseable|cannot resolve"):
        versioned_sql(
            spark,
            f"CREATE TABLE versioned.`{root}7` (id bigint, "
            "c bigint GENERATED ALWAYS AS (nope + 1))",
        )
    versioned_sql(spark, f"CREATE TABLE versioned.`{root}7` (id bigint)")
    assert VersionedTable(spark, f"{root}7").latest_version() == 0
    with pytest.raises(ValueError, match="unparseable DDL type"):
        versioned_sql(
            spark, f"CREATE TABLE versioned.`{root}4` (id notatype)"
        )
    with pytest.raises(ValueError, match="trailer"):
        versioned_sql(
            spark, f"CREATE TABLE versioned.`{root}5` (id bigint) WITH x"
        )


def test_analyze_table_backfills_bytes(spark, tmp_path):
    """ANALYZE TABLE <versioned> COMPUTE STATISTICS maps onto the
    metadata-only bytes backfill; other ANALYZE text passes through."""
    import json as _json
    import os as _os

    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 30).selectExpr("id").repartition(2))
    path = _os.path.join(t.root, "_log", "v%012d.json" % t.latest_version())
    m = _json.loads(open(path).read())
    for e in m["files"]:
        e.pop("bytes", None)
    open(path, "w").write(_json.dumps(m))
    info = versioned_sql(
        spark, f"ANALYZE TABLE versioned.`{t.root}` COMPUTE STATISTICS"
    )
    assert info.action == "refresh_stats"
    for f in t.manifest()["files"]:
        assert f["bytes"] == _os.stat(t._abs(f)).st_size
    # ordinary catalog table: pass through to Spark's own ANALYZE
    spark.range(5).write.mode("overwrite").saveAsTable("an_plain")
    try:
        versioned_sql(spark, "ANALYZE TABLE an_plain COMPUTE STATISTICS")
    finally:
        spark.sql("DROP TABLE IF EXISTS an_plain")


def test_sql_insert_replace_where(spark, tmp_path):
    """INSERT INTO ... REPLACE WHERE: one commit deletes the
    predicate's rows and inserts the query's (Delta's SQL
    replaceWhere), with subquery-bearing predicates parsing intact."""
    root = str(tmp_path / "rw")
    t = VersionedTable(spark, root)
    t.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "cast(id % 2 as int) as par")
    )
    head = t.latest_version()
    versioned_sql(
        spark,
        f"INSERT INTO versioned.`{root}` REPLACE WHERE par = 1 "
        "SELECT id, cast(1 as int) AS par FROM range(100, 103)",
    )
    assert t.latest_version() == head + 1  # ONE commit
    got = sorted(r["id"] for r in t.read().collect())
    assert got == [0, 2, 4, 6, 8, 100, 101, 102]
    # subquery inside the predicate must not truncate the parse
    versioned_sql(
        spark,
        f"INSERT INTO versioned.`{root}` REPLACE WHERE id IN "
        "(SELECT id FROM range(100, 103)) "
        "SELECT id, cast(1 as int) AS par FROM range(200, 201)",
    )
    got = sorted(r["id"] for r in t.read().collect())
    assert got == [0, 2, 4, 6, 8, 200]
    # refusals: OVERWRITE pairing and column lists
    with pytest.raises(ValueError, match="INSERT INTO"):
        versioned_sql(
            spark,
            f"INSERT OVERWRITE versioned.`{root}` REPLACE WHERE par = 0 "
            "SELECT id, cast(0 as int) AS par FROM range(1)",
        )
    with pytest.raises(ValueError, match="column"):
        versioned_sql(
            spark,
            f"INSERT INTO versioned.`{root}` (id) REPLACE WHERE par = 0 "
            "SELECT id FROM range(1)",
        )


def test_sql_insert_replace_where_partition_scoped(spark, tmp_path):
    """On a PARTITIONED table a partition-only REPLACE WHERE drops the
    matching partitions metadata-only: zero survivor rewrites, only
    the replacement's files are new."""
    root = str(tmp_path / "rwp")
    t = VersionedTable(spark, root, partition_by=["par"])
    t.commit_overwrite(
        spark.range(0, 40).selectExpr("id", "cast(id % 4 as int) as par")
    )
    before = {f["path"] for f in t.manifest()["files"]}
    versioned_sql(
        spark,
        f"INSERT INTO versioned.`{root}` REPLACE WHERE par = 2 "
        "SELECT id, cast(2 as int) AS par FROM range(1000, 1002)",
    )
    m = t.manifest()
    new = [f for f in m["files"] if f["path"] not in before]
    # every new file is replacement data (pv par=2), no survivor
    # rewrite of other partitions
    assert all(f["pv"]["par"] == "2" for f in new)
    kept = [f for f in m["files"] if f["path"] in before]
    assert all(f["pv"]["par"] != "2" for f in kept)
    assert t.read().filter("par = 2").count() == 2
    assert t.read().count() == 32
