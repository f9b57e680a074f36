"""ALTER TABLE RENAME COLUMN via entry-level column mapping.

Delta gates renames behind ``columnMapping=name`` because scans match
parquet columns by name; here each file entry records its column's
PHYSICAL parquet name (``cmap``) and every reader scans in per-mapping
groups (sources/versioned.py rename_column, _scan_entries,
_lineage_scan; sources/pyds.py _read_file_batches). The mapping
travels WITH the entry, so time travel, clones, vectors and mixed
file generations are correct by construction.
"""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.versioned import (
    SchemaMismatchError,
    VersionedTable,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 100).selectExpr(
            "id", "cast(id % 10 as int) as grp", "id * 2 as v"
        )
    )
    return t


def test_rename_is_metadata_only(spark, table):
    before = {f["path"] for f in table.manifest()["files"]}
    info = table.rename_column("v", "score")
    assert info.action == "rename_column"
    assert {f["path"] for f in table.manifest()["files"]} == before
    got = table.read()
    assert got.columns == ["id", "grp", "score"]
    # old values visible under the new name
    assert got.filter("score = 84").count() == 1
    assert got.filter("score IS NULL").count() == 0
    # time travel reads the old name through the old manifest
    assert table.read(0).columns == ["id", "grp", "v"]


def test_rename_mixed_file_generations(spark, table):
    table.rename_column("v", "score")
    # post-rename files carry the new name physically (no mapping)
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(0 as int) as grp", "id * 3 as score"
        )
    )
    ents = table.manifest()["files"]
    assert any(e.get("cmap") == {"score": "v"} for e in ents)
    assert any(not e.get("cmap") for e in ents)
    got = {r["id"]: r["score"] for r in table.read().collect()}
    assert got[50] == 100 and got[105] == 315 and len(got) == 110
    # predicates, updates and deletes work on the logical name across
    # both generations
    assert table.read().filter("score > 290").count() == 10  # new gen only
    assert table.read().filter("score > 150").count() == 34  # both gens
    table.update_where("id IN (1, 101)", {"score": "score + 1"})
    got = {r["id"]: r["score"] for r in table.read().collect()}
    assert got[1] == 3 and got[101] == 304
    table.delete_where("score = 84", mode="mor")
    assert table.read().filter("id = 42").count() == 0
    assert table.count_rows() == 109


def test_rename_chains_and_collapses(spark, table):
    table.rename_column("v", "a")
    table.rename_column("a", "b")
    ents = table.manifest()["files"]
    # chain folded: one mapping to the original physical name
    assert all(e.get("cmap") == {"b": "v"} for e in ents)
    assert table.read().filter("b = 84").count() == 1
    # renaming back to the physical name collapses the mapping away
    table.rename_column("b", "v")
    assert all(not e.get("cmap") for e in table.manifest()["files"])
    assert table.read().filter("v = 84").count() == 1


def test_rename_guards_and_ghost(spark, table):
    with pytest.raises(ValueError, match="no column"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("v", "grp")
    table.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="v_pos"):
        table.rename_column("v", "score")
    table.drop_constraint("v_pos")
    table.rename_column("v", "score")
    # the old name is a ghost: pre-rename files still physically
    # contain it, so DATA-CARRYING schema evolution still refuses the
    # re-add (its new files would collide with the old physical name)
    with pytest.raises(SchemaMismatchError, match="resurrect"):
        table.commit_append(
            spark.range(100, 105).selectExpr(
                "id", "cast(0 as int) as grp", "id * 2 as score", "id as v"
            ),
            merge_schema=True,
        )
    # ...but the explicit ALTER-style add_column re-adds SAFELY via a
    # fresh-physical-name mapping (r8): the re-added column reads NULL
    # (old values stay dead) while the renamed column keeps serving
    # them from the same physical bytes
    table.add_column("v", "bigint")
    got = table.read()
    assert got.filter("v IS NOT NULL").count() == 0
    assert got.filter("score = 84").count() == 1


def test_rename_stats_pruning_and_optimize_purge(spark, table):
    table.commit_append(
        spark.range(100, 200).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as v"
        )
    )
    table.rename_column("v", "score")
    table.commit_append(
        spark.range(200, 300).selectExpr(
            "id", "cast(2 as int) as grp", "id * 2 as score"
        )
    )
    # pruning on the LOGICAL name skips files via physical stats keys
    pruned = table.read_pruned("score", 500, 520)
    assert sorted(r["id"] for r in pruned.collect()) == list(range(250, 261))
    assert len(pruned.inputFiles()) < len(table.manifest()["files"])
    # a full OPTIMIZE rewrites under logical names: mappings purge
    table.optimize(target_rows_per_file=1000)
    assert all(not e.get("cmap") for e in table.manifest()["files"])
    assert table.read().filter("score = 598").count() == 1


def test_rename_cdc_serves_crossing_in_target_frame(spark, table):
    """A feed range crossing a rename serves in the TARGET version's
    logical schema: pre-rename steps' rows emit their values under the
    post-rename name (the rename is value-preserving metadata), and
    replay-onto-base equality holds with the base read in the target
    frame."""
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as v"
        )
    )  # v1: pre-rename append
    table.rename_column("v", "score")  # v2 (metadata-only)
    table.commit_append(
        spark.range(110, 120).selectExpr(
            "id", "cast(2 as int) as grp", "id * 2 as score"
        )
    )  # v3: post-rename append
    table.delete_where("id < 5")  # v4: CoW rewrite of PRE-rename files
    ch = table.read_changes_rows(0)
    assert "score" in ch.columns and "v" not in ch.columns
    rows = ch.collect()
    by_ver = {}
    for r in rows:
        by_ver.setdefault(r["_commit_version"], []).append(r)
    # the pre-rename append's values flow under the new name
    assert sorted(r["score"] for r in by_ver[1]) == [
        i * 2 for i in range(100, 110)
    ]
    # the CoW delete step emits pre-rename file rows under the new
    # name too (deletes AND rewrite-survivor churn cancel in exceptAll)
    assert all(r["score"] is not None for r in by_ver[4])
    # replay-onto-base equality, base read in the target frame
    base = table.read(0).withColumnRenamed("v", "score")
    ins = ch.filter("_change_type = 'insert'").select("id", "grp", "score")
    dels = ch.filter("_change_type = 'delete'").select("id", "grp", "score")
    replayed = sorted(
        map(tuple, base.unionByName(ins).exceptAll(dels).collect())
    )
    assert replayed == sorted(map(tuple, table.read().collect()))
    # file-level feed across the rename: entry-aware scan, no NULLs
    app_only = table.read_changes(0, version=3)
    assert app_only.filter("score IS NULL").count() == 0
    assert app_only.count() == 20


def test_cdc_chained_remaps_fold_in_version_order(spark, table):
    """Chained renames inside one BATCH feed range compose in version
    order (the ops replay the commits' own per-entry stamps), folding
    v→w→x into one mapping — the rows arrive under the final name."""
    table.commit_append(
        spark.range(100, 105).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as v"
        )
    )
    table.rename_column("v", "w")
    table.rename_column("w", "x")
    ch = table.read_changes_rows(0)
    assert "x" in ch.columns and ch.count() == 5
    assert sorted(r["x"] for r in ch.collect()) == [
        i * 2 for i in range(100, 105)
    ]
    # rename-then-re-add of ONE name in one range: old era dead, new
    # era flows — same fold
    table.drop_column("x")
    table.add_column("x", "bigint")
    table.commit_append(
        spark.range(200, 203).selectExpr(
            "id", "cast(1 as int) as grp", "id * 7 as x"
        )
    )
    ch = table.read_changes_rows(0)
    assert ch.filter("x IS NOT NULL").count() == 3
    assert ch.count() == 8


def test_rename_clones(spark, table, tmp_path):
    table.rename_column("v", "score")
    shallow = table.clone_to(str(tmp_path / "sc"))
    assert shallow.read().filter("score = 84").count() == 1
    deep = table.clone_to(str(tmp_path / "dc"), deep=True)
    assert all(not e.get("cmap") for e in deep.manifest()["files"])
    assert deep.read().filter("score = 84").count() == 1


def test_rename_pyds_batch_and_stream(spark, tmp_path, table):
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    table.delete_where("id = 7", mode="mor")  # vectors + mapping together
    table.rename_column("v", "score")
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as score"
        )
    )
    df = spark.read.format("versioned").option("root", table.root).load()
    assert set(df.columns) == {"id", "grp", "score"}
    assert df.count() == 109
    assert df.filter("score = 84").count() == 1     # pre-rename file
    assert df.filter("score = 208").count() == 1    # post-rename file
    assert df.filter("score IS NULL").count() == 0
    assert df.filter("id = 7").count() == 0         # vector still honored

    # a fresh stream whose range crosses the rename serves in ITS
    # pinned (post-rename) frame: pre-rename steps' rows flow under
    # the new name — no NULLs, no lost values
    q = (
        spark.readStream.format("versioned")
        .option("root", table.root)
        .option("changeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert "score" in got.columns and "v" not in got.columns
    ins = got.filter("_change_type = 'insert'")
    assert ins.filter("score IS NULL").count() == 0
    assert ins.filter("score = 84").count() == 1   # pre-rename value
    assert ins.filter("score = 208").count() == 1  # post-rename value


def test_rename_midstream_keeps_pinned_schema(spark, tmp_path, table):
    """A LIVE stream that crosses a rename keeps receiving the column
    it subscribed to (the pinned pre-rename name), with post-rename
    files' values reverse-aligned onto it — the stream never silently
    NULLs or drops its column mid-flight."""
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_available(trigger_table):
        q = (
            spark.readStream.format("versioned")
            .option("root", trigger_table.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available(table)  # consume the seed under the pinned v-schema
    table.rename_column("v", "score")
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as score"
        )
    )
    # the resumed query object is re-planned from the CURRENT schema
    # (post-rename) — the checkpointed offsets carry on, and the
    # pre-rename steps already consumed stay consumed; the new batch
    # serves the post-rename append under the fresh pinned frame
    q = (
        spark.readStream.format("versioned")
        .option("root", table.root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # first era wrote v-named files, second era score-named: the union
    # directory carries both shapes; per-era content is value-correct
    assert got.count() == 110
    new_rows = got.filter("id >= 100")
    assert new_rows.count() == 10


def test_stream_reader_reverse_aligns_to_pinned_old_frame(spark, table):
    """Unit-level check of the REVERSE direction: a reader pinned to
    the pre-rename schema (a live stream mid-flight) keeps serving the
    subscribed column, with post-rename files' values aligned back
    onto the pinned name."""
    import pyarrow as pa

    from finalpipeline_spark.sources.pyds import (
        VersionedStreamReader,
        _live_manifests,
    )

    v_pin = table.latest_version()
    fields = [
        ("id", "bigint"), ("grp", "int"), ("v", "bigint"),
        ("_change_type", "string"), ("_commit_version", "bigint"),
        ("_commit_timestamp", "timestamp"),
    ]
    reader = VersionedStreamReader(table.root, fields, cdf=True)
    table.rename_column("v", "score")
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as score"
        )
    )
    live = _live_manifests(table.root)
    parts = reader._cdf_partitions(
        {"version": v_pin}, v_pin, max(live), live
    )
    rows = []
    for p in parts:
        for b in reader.read(p):
            rows += pa.Table.from_batches([b]).to_pylist()
    # the post-rename append's values arrive under the pinned name `v`
    assert sorted(x["v"] for x in rows) == [i * 2 for i in range(100, 110)]
    assert all(x["_change_type"] == "insert" for x in rows)


def _drain(reader, s, e, live):
    import pyarrow as pa

    rows = []
    for p in reader._cdf_partitions({"version": s}, s, e, live):
        for b in reader.read(p):
            rows += pa.Table.from_batches([b]).to_pylist()
    return rows


def test_stream_chained_renames_across_microbatches(spark, table):
    """A live stream pinned pre-rename that crosses v→score in one
    micro-batch and score→points in a LATER one: the second op touches
    no pinned name, but it moves the pinned frame's chain — the reader
    must scan ops across the whole pin↔range span (not just inside the
    batch range) and reverse-compose BOTH renames, or the second era's
    values silently read NULL (the r10 bug)."""
    from finalpipeline_spark.sources.pyds import (
        VersionedStreamReader,
        _live_manifests,
    )

    meta = [
        ("_change_type", "string"),
        ("_commit_version", "bigint"),
        ("_commit_timestamp", "timestamp"),
    ]
    v_pin = table.latest_version()
    reader = VersionedStreamReader(
        table.root,
        [("id", "bigint"), ("grp", "int"), ("v", "bigint")] + meta,
        cdf=True,
    )
    assert reader._pin == v_pin

    table.rename_column("v", "score")
    table.commit_append(
        spark.range(100, 105).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as score"
        )
    )
    e1 = table.latest_version()
    live = _live_manifests(table.root)
    rows = _drain(reader, v_pin, e1, live)
    assert sorted(x["v"] for x in rows) == [i * 2 for i in range(100, 105)]

    # second era: a rename that touches NO pinned name, then an append
    table.rename_column("score", "points")
    table.commit_append(
        spark.range(105, 110).selectExpr(
            "id", "cast(1 as int) as grp", "id * 3 as points"
        )
    )
    e2 = table.latest_version()
    live = _live_manifests(table.root)
    # micro-batch (e1, e2] contains only the second rename + append —
    # the first rename is OUTSIDE the range but inside the pin span
    rows = _drain(reader, e1, e2, live)
    by_id = {x["id"]: x["v"] for x in rows}
    assert by_id == {i: i * 3 for i in range(105, 110)}, by_id


def test_stream_replayed_range_before_rename_forward_aligns(spark, table):
    """A restarted stream (re-planned on the post-rename schema)
    replaying a checkpointed range that ENDED before the rename: no op
    lies inside the range, but the pinned frame is newer — the reader
    must scan forward to its pin and serve the old-era files' values
    under the new pinned name, not NULL (the r10 bug's other half)."""
    from finalpipeline_spark.sources.pyds import (
        VersionedStreamReader,
        _live_manifests,
    )

    meta = [
        ("_change_type", "string"),
        ("_commit_version", "bigint"),
        ("_commit_timestamp", "timestamp"),
    ]
    v0 = table.latest_version()
    table.commit_append(
        spark.range(100, 105).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as v"
        )
    )
    e_replay = table.latest_version()
    table.rename_column("v", "score")

    # reader re-planned NOW (pin = head, post-rename schema)
    reader = VersionedStreamReader(
        table.root,
        [("id", "bigint"), ("grp", "int"), ("score", "bigint")] + meta,
        cdf=True,
    )
    live = _live_manifests(table.root)
    rows = _drain(reader, v0, e_replay, live)
    by_id = {x["id"]: x["score"] for x in rows}
    assert by_id == {i: i * 2 for i in range(100, 105)}, by_id
