"""ALTER TABLE DROP COLUMN as a metadata-only commit, plus the
metadata-only-commit CDC skip it relies on.

Delta needs column-mapping mode to drop a column without rewriting;
here every reader imposes the manifest schema on every scan, so a
narrowed manifest IS the drop (sources/versioned.py drop_column). The
re-add guard exists because scans match parquet columns BY NAME: a
re-added name would resurrect old values still physically present in
pre-drop files. The reference engine had no schema evolution at all
(tables were overwritten whole — db_interact.py), so this is engine
capability, not parity.
"""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.versioned import (
    SchemaMismatchError,
    VersionedTable,
    cdf_final_state,
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


def test_drop_column_is_metadata_only(spark, table):
    before = {f["path"] for f in table.manifest()["files"]}
    info = table.drop_column("v")
    assert info.action == "drop_column"
    # no file moved; the column is gone from reads
    assert {f["path"] for f in table.manifest()["files"]} == before
    assert table.read().columns == ["id", "grp"]
    # time travel still sees it through the old manifest's schema
    old = table.read(0)
    assert old.columns == ["id", "grp", "v"]
    assert old.filter("v = 84").count() == 1


def test_drop_column_guards(spark, table):
    with pytest.raises(ValueError, match="no column"):
        table.drop_column("nope")
    table.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="v_pos"):
        table.drop_column("v")
    table.drop_constraint("v_pos")
    table.drop_column("v")
    table.drop_column("grp")
    with pytest.raises(ValueError, match="only column"):
        table.drop_column("id")


def test_dropped_name_cannot_be_readded(spark, table):
    table.drop_column("v")
    # plain append with the ghost column: ordinary mismatch error
    with pytest.raises(SchemaMismatchError, match="merge_schema"):
        table.commit_append(table.read(0).limit(1))
    # evolution re-adding the ghost name: the resurrect guard fires
    with pytest.raises(SchemaMismatchError, match="resurrect"):
        table.commit_append(table.read(0).limit(1), merge_schema=True)
    with pytest.raises(SchemaMismatchError, match="resurrect"):
        table.merge(
            spark.range(0, 1).selectExpr("id", "cast(1 as int) as grp",
                                         "id as v"),
            ["id"],
            merge_schema=True,
        )
    # a FRESH name evolves fine
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(0 as int) as grp", "id as w"
        ),
        merge_schema=True,
    )
    assert table.read().columns == ["id", "grp", "w"]
    # a clean slate (overwrite) makes the old name safe again
    table.commit_overwrite(
        spark.range(0, 5).selectExpr("id", "cast(0 as int) as grp")
    )
    table.commit_append(
        spark.range(5, 10).selectExpr(
            "id", "cast(0 as int) as grp", "id as v"
        ),
        merge_schema=True,
    )
    assert "v" in table.read().columns


def test_writes_and_updates_after_drop(spark, table):
    table.drop_column("v")
    table.commit_append(
        spark.range(100, 110).selectExpr("id", "cast(3 as int) as grp")
    )
    table.update_where("id = 5", {"grp": "99"})
    table.delete_where("id = 6", mode="mor")
    got = table.read()
    assert got.columns == ["id", "grp"]
    assert got.count() == 109
    assert got.filter("grp = 99").count() == 1
    # the update's rewritten file physically lacks the dropped column
    rewritten = [
        f for f in table.manifest()["files"]
        if "v" not in (f.get("stats") or {})
    ]
    assert rewritten


def test_cdc_skips_metadata_only_commits(spark, table):
    """Constraint add/drop, column drop, and no-op compaction commits
    have provably zero row delta: the row-level feed must skip them
    instead of raising, and emit rows in the TARGET (narrowed)
    schema."""
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(1 as int) as grp", "id * 2 as v"
        )
    )
    table.add_constraint("id_pos", "id >= 0")
    table.drop_constraint("id_pos")
    table.drop_column("v")
    # a true no-op compaction: no file is under 1 row, no vectors
    table.optimize(target_rows_per_file=1, mode="compact")
    table.commit_append(
        spark.range(110, 120).selectExpr("id", "cast(2 as int) as grp")
    )
    ch = table.read_changes_rows(0)
    assert set(ch.columns) == {"id", "grp", "_change_type", "_commit_version", "_commit_timestamp"}
    assert ch.count() == 20  # the two appends only
    final = cdf_final_state(ch, ["id"]).filter("NOT __delete")
    assert final.count() == 20


def test_stream_survives_metadata_only_commits(spark, tmp_path, table):
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    table.add_constraint("id_pos", "id >= 0")
    table.drop_column("v")
    table.commit_append(
        spark.range(100, 110).selectExpr("id", "cast(1 as int) as grp")
    )
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("versioned")
        .option("root", table.root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    fed = spark.read.parquet(out)
    # narrowed schema, snapshot + post-drop append, no error
    assert set(fed.columns) == {"id", "grp"}
    assert fed.count() == 110


def test_add_column_metadata_only(spark, table):
    before = {f["path"] for f in table.manifest()["files"]}
    info = table.add_column("score", "double")
    assert info.action == "add_column"
    assert {f["path"] for f in table.manifest()["files"]} == before
    got = table.read()
    assert got.columns == ["id", "grp", "v", "score"]
    assert got.filter("score IS NULL").count() == 100  # NULL backfill
    # subsequent writes fill it without merge_schema
    table.commit_append(
        spark.range(100, 105).selectExpr(
            "id", "cast(0 as int) as grp", "id * 2 as v",
            "cast(1.5 as double) as score",
        )
    )
    assert table.read().filter("score = 1.5").count() == 5
    # UPDATE can populate it on pre-evolution rows
    table.update_where("id < 3", {"score": "cast(id as double)"})
    assert table.read().filter("score IS NOT NULL").count() == 8
    with pytest.raises(ValueError, match="already exists"):
        table.add_column("grp", "int")
    with pytest.raises(Exception):
        table.add_column("bad", "not_a_type")
    # explicit ADD of a dropped name is the column-mapping re-add path
    table.drop_column("score")
    info = table.add_column("score", "double")
    assert info.action == "readd_column"
    assert table.read().filter("score IS NOT NULL").count() == 0


# -- RE-ADD via column mapping ---------------------------------------------


def test_readd_column_round_trip(spark, table):
    """write → drop → re-add: old values must NOT resurrect (every
    current entry maps the logical name to a fresh physical name no
    file contains), new writes fill the column normally, and time
    travel to pre-drop versions still reads the ORIGINAL values."""
    before = {f["path"] for f in table.manifest()["files"]}
    table.drop_column("v")                          # version 1
    info = table.add_column("v", "bigint")          # version 2: re-add
    assert info.action == "readd_column"
    # metadata-only: same files by reference, only cmap stamped
    assert {f["path"] for f in table.manifest()["files"]} == before
    ghost = table.manifest()["files"][0]["cmap"]["v"]
    assert ghost != "v" and all(
        f["cmap"]["v"] == ghost for f in table.manifest()["files"]
    )
    got = table.read()
    assert got.columns == ["id", "grp", "v"]
    assert got.count() == 100
    assert got.filter("v IS NOT NULL").count() == 0  # old values dead
    # new writes carry the re-added column physically
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(0 as int) as grp", "id * 3 as v"
        )
    )
    cur = table.read()
    assert cur.filter("v IS NOT NULL").count() == 10
    assert cur.filter("v = 300").count() == 1
    assert cur.filter("id < 100 AND v IS NOT NULL").count() == 0
    # time travel: pre-drop version still reads the original values
    old = table.read(0)
    assert old.filter("v = 84").count() == 1
    assert old.filter("v IS NOT NULL").count() == 100
    # Python DataSource path agrees (Arrow-side cmap NULL backfill)
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    via_pyds = (
        spark.read.format("versioned").option("root", table.root).load()
    )
    assert via_pyds.filter("id < 100 AND v IS NOT NULL").count() == 0
    assert via_pyds.filter("v = 300").count() == 1
    assert (
        spark.read.format("versioned")
        .option("root", table.root)
        .option("version", "0")
        .load()
        .filter("v = 84")
        .count()
        == 1
    )


def test_readd_column_chained_ddl(spark, table):
    """Re-add composes with the rest of the DDL surface: rename after
    re-add folds the ghost mapping; a second drop + re-add ghosts the
    between-era values too; rewrites (optimize) materialize the column
    and purge the mapping."""
    table.drop_column("v")
    table.add_column("v", "bigint")
    table.commit_append(
        spark.range(100, 105).selectExpr(
            "id", "cast(0 as int) as grp", "id * 3 as v"
        )
    )
    # rename after re-add: ghost mapping folds (score → ghost)
    table.rename_column("v", "score")
    got = table.read()
    assert got.columns == ["id", "grp", "score"]
    assert got.filter("id < 100 AND score IS NOT NULL").count() == 0
    assert got.filter("score = 300").count() == 1
    # second drop + re-add: era-2 values (the appended file, which
    # physically contains 'v') must be dead too
    table.drop_column("score")
    table.add_column("v", "bigint")
    assert table.read().filter("v IS NOT NULL").count() == 0
    # a rewrite materializes the column physically and purges cmaps
    table.optimize()
    assert all(
        "cmap" not in f for f in table.manifest()["files"]
    )
    assert table.read().filter("v IS NOT NULL").count() == 0


def test_readd_column_cdc_serves_in_target_frame(spark, table):
    """A feed range crossing a re-add serves in the TARGET version's
    logical schema: pre-re-add steps emit NULL for the re-added name
    (old-era values are dead in the target frame, exactly as a target
    snapshot reads those files), post-re-add steps emit the new-era
    values — so a consumer never reads new-era values under an
    old-era column, the hazard the old refusal guarded."""
    v0 = table.latest_version()
    table.commit_append(
        spark.range(100, 110).selectExpr(
            "id", "cast(0 as int) as grp", "id * 2 as v"
        )
    )  # version 1
    table.drop_column("v")                      # version 2 (metadata-only)
    readd = table.add_column("v", "bigint")     # version 3: re-add
    table.commit_append(
        spark.range(110, 120).selectExpr(
            "id", "cast(0 as int) as grp", "id * 5 as v"
        )
    )  # version 4
    ch = table.read_changes_rows(since_version=v0)
    assert ch.count() == 20
    pre = ch.filter("_commit_version = 1")
    post = ch.filter("_commit_version = 4")
    assert pre.filter("v IS NOT NULL").count() == 0  # old era: dead
    assert sorted(r["v"] for r in post.collect()) == [
        i * 5 for i in range(110, 120)
    ]
    # file-level feed: same frame, same NULL semantics
    fl = table.read_changes(since_version=v0)
    assert fl.count() == 20
    assert fl.filter("v IS NOT NULL").count() == 10
    # replay-onto-base equality, base read in the target frame (the
    # base predates the re-add, so its v values are dead too)
    import pyspark.sql.functions as F

    base = table.read(v0).withColumn("v", F.lit(None).cast("bigint"))
    ins = ch.filter("_change_type = 'insert'").select("id", "grp", "v")
    dels = ch.filter("_change_type = 'delete'").select("id", "grp", "v")
    replayed = sorted(
        map(tuple, base.unionByName(ins).exceptAll(dels).collect())
    )
    assert replayed == sorted(map(tuple, table.read().collect()))
    # sub-ranges on either side still work
    assert table.read_changes(v0, version=2).count() == 10
    after = table.read_changes_rows(readd.version)
    assert after.count() == 10 and "v" in after.columns


# -- TYPE WIDENING --------------------------------------------------------


def test_widen_column_metadata_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 50).selectExpr(
            "id", "cast(id as int) as n", "cast(id / 2 as float) as x"
        )
    )
    before = {f["path"] for f in t.manifest()["files"]}
    t.widen_column("n", "bigint")
    t.widen_column("x", "double")
    assert {f["path"] for f in t.manifest()["files"]} == before
    got = t.read()
    assert dict(got.dtypes) == {"id": "bigint", "n": "bigint", "x": "double"}
    assert got.filter("n = 42").count() == 1
    assert abs(got.filter("id = 9").first()["x"] - 4.5) < 1e-9
    # time travel shows the old types
    assert dict(t.read(0).dtypes)["n"] == "int"
    # post-widen writes speak the wide type; mixed generations unify
    t.commit_append(
        spark.range(50, 60).selectExpr(
            "id", "cast(id * 10 as bigint) as n", "cast(id as double) as x"
        )
    )
    assert t.read().filter("n = 550").count() == 1
    assert t.count_rows() == 60
    # CDC across the widen works: the wide target schema imposes on
    # narrow pre-widen files via the reader's native upcast
    # CDC spanning the widen: a NARROW pre-widen append is scanned
    # under the wide target schema (native upcast), the widen commits
    # themselves skip (metadata-only), and the wide append follows
    ch = t.read_changes_rows(0)
    assert dict(ch.dtypes)["n"] == "bigint"
    assert ch.count() == 10
    t2 = VersionedTable(spark, t.root + "2")
    t2.commit_overwrite(spark.range(0, 5).selectExpr("id", "cast(id as int) as n"))
    t2.commit_append(spark.range(5, 10).selectExpr("id", "cast(id as int) as n"))
    t2.widen_column("n", "bigint")
    t2.commit_append(spark.range(10, 15).selectExpr("id", "cast(id as bigint) as n"))
    ch2 = t2.read_changes_rows(0)
    assert dict(ch2.dtypes)["n"] == "bigint"
    assert sorted(r["n"] for r in ch2.collect()) == list(range(5, 15))


def test_widen_column_guards(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 5).selectExpr("id", "cast(id as int) as n")
    )
    with pytest.raises(ValueError, match="no column"):
        t.widen_column("nope", "bigint")
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("id", "int")       # narrowing
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("id", "double")    # bigint→double is lossy
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("n", "string")
    # narrow appends after a widen are rejected loudly
    t.widen_column("n", "bigint")
    with pytest.raises(Exception, match="type change"):
        t.commit_append(
            spark.range(5, 6).selectExpr("id", "cast(id as int) as n")
        )


def test_widen_column_pyds_batch(spark, tmp_path):
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 20).selectExpr("id", "cast(id as int) as n")
    )
    t.widen_column("n", "bigint")
    t.commit_append(
        spark.range(20, 30).selectExpr("id", "cast(id as bigint) as n")
    )
    df = spark.read.format("versioned").option("root", t.root).load()
    assert dict(df.dtypes)["n"] == "bigint"
    vals = {r["id"]: r["n"] for r in df.collect()}
    assert len(vals) == 30 and vals[5] == 5 and vals[25] == 25


def test_stream_reader_readd_direction_rules(spark, table):
    """Streaming re-add crossings resolve by VERSION ORDER against the
    reader's pin (sources/pyds.py _pin_directions):

    * pinned schema LACKS the re-added name (stream planned between
      the drop and the re-add) → the crossing is harmless: the column
      is never selected, the feed keeps flowing;
    * re-add AT/BEFORE the pin (any reader planned after it, whatever
      its range's base schema) → serve forward: the pin provably
      postdates the re-add, so old-era steps emit NULL and new-era
      values flow — even when the base schema still carries the name
      (the r10 membership inference refused this servable case);
    * re-add AFTER the pin touching a pinned column (a genuinely
      old-era live consumer) → REFUSE loudly: new-era values under an
      old-era column is the corruption the guard exists for.
    """
    import pyarrow as pa
    import pytest as _pytest

    from finalpipeline_spark.sources.pyds import (
        VersionedStreamReader,
        _live_manifests,
    )

    meta = [
        ("_change_type", "string"),
        ("_commit_version", "bigint"),
        ("_commit_timestamp", "timestamp"),
    ]
    v_full = table.latest_version()          # v0: schema has old-era v
    table.drop_column("v")                   # v1
    v_dropped = table.latest_version()
    table.commit_append(
        spark.range(100, 105).selectExpr("id", "cast(0 as int) as grp")
    )                                        # v2: drop-era append
    table.add_column("v", "bigint")          # v3: re-add
    table.commit_append(
        spark.range(105, 110).selectExpr(
            "id", "cast(0 as int) as grp", "id * 5 as v"
        )
    )                                        # v4: new-era append
    live = _live_manifests(table.root)
    end = max(live)

    def read_all(reader, s):
        rows = []
        for p in reader._cdf_partitions({"version": s}, s, end, live):
            for b in reader.read(p):
                rows += pa.Table.from_batches([b]).to_pylist()
        return rows

    # case 1: pinned schema lacks v (planned in the drop era) — flows
    r_nov = VersionedStreamReader(
        table.root, [("id", "bigint"), ("grp", "int")] + meta, cdf=True
    )
    rows = read_all(r_nov, v_dropped)
    assert sorted(x["id"] for x in rows) == list(range(100, 110))

    # case 2: pinned schema has v, base schema lacks it (resumed on the
    # fresh schema) — forward: old era NULL, new era values
    r_fresh = VersionedStreamReader(
        table.root,
        [("id", "bigint"), ("grp", "int"), ("v", "bigint")] + meta,
        cdf=True,
    )
    rows = read_all(r_fresh, v_dropped)
    by_id = {x["id"]: x["v"] for x in rows}
    assert all(by_id[i] is None for i in range(100, 105))
    assert all(by_id[i] == i * 5 for i in range(105, 110))

    # case 3: same reader (planned at head, pin postdates the re-add),
    # range based at v_full whose schema still carries v — the r10
    # membership inference refused this, but the pin proves the
    # consumer subscribed to the NEW-era column: serve forward
    rows = read_all(r_fresh, v_full)
    by_id = {x["id"]: x["v"] for x in rows}
    assert all(by_id[i] is None for i in range(100, 105))
    assert all(by_id[i] == i * 5 for i in range(105, 110))

    # case 4: a reader PINNED BEFORE the re-add (a live old-era
    # consumer mid-flight) whose range crosses it — the one genuinely
    # unserveable case: refuse loudly
    r_old = VersionedStreamReader(
        table.root,
        [("id", "bigint"), ("grp", "int"), ("v", "bigint")] + meta,
        cdf=True,
        pin_version=v_full,
    )
    with _pytest.raises(ValueError, match="re-adds"):
        read_all(r_old, v_full)
