"""Merge-on-read deletion vectors: delete without rewriting data files.

Delta deletion-vector parity for the versioned table
(sources/versioned.py): ``delete_where(mode="mor")`` records matching
rows' (file, position) pairs in a tiny ``_dv/`` parquet instead of
copy-on-write rewriting every hit file; every reader — snapshot,
pruned, point-lookup, CDC, the format("versioned") DataSource, batch
and stream — anti-joins the positions back out.  The reference engine
overwrote tables in place (db_interact.py:115-130), so all deletion
semantics here are new capability, not parity.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from finalpipeline_spark.sources.versioned import VersionedTable, cdf_final_state


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 100)
        .withColumn("grp", (F.col("id") % 10).cast("int"))
        .repartition(4)
    )
    return t


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_mor_delete_rewrites_nothing(spark, table):
    before = {f["path"] for f in table.manifest()["files"]}
    info = table.delete_where("id % 7 = 0", mode="mor")
    after = table.manifest()["files"]
    # identical data-file set — the delete was pure metadata + a vector
    assert {f["path"] for f in after} == before
    assert info.action == "delete" and info.n_rows == 85
    assert _ids(table.read()) == [i for i in range(100) if i % 7]
    # live row count stays metadata-only and DV-adjusted
    assert table.count_rows() == 85
    assert sum(f["dv"]["deleted"] for f in after if f.get("dv")) == 15
    # history's n_rows is the live count too
    hist = {r["version"]: r["n_rows"] for r in table.history().collect()}
    assert hist[1] == 85


def test_mor_consolidates_and_time_travels(spark, table):
    table.delete_where("id % 7 = 0", mode="mor")
    table.delete_where("id % 5 = 0", mode="mor")
    want = [i for i in range(100) if i % 7 and i % 5]
    assert _ids(table.read()) == want
    # each entry references exactly ONE vector (old ∪ new consolidated)
    for e in table.manifest()["files"]:
        if e.get("dv"):
            assert isinstance(e["dv"]["path"], str)
    # time travel sees every historical snapshot
    assert table.read(0).count() == 100
    assert _ids(table.read(1)) == [i for i in range(100) if i % 7]


def test_mor_noop_and_fully_dead_file(spark, tmp_path, table):
    v = table.latest_version()
    table.delete_where("id > 1000", mode="mor")  # no matches
    assert table.latest_version() == v + 1
    assert all("dv" not in f for f in table.manifest()["files"])
    t2 = VersionedTable(spark, str(tmp_path / "dead"))
    t2.commit_overwrite(spark.range(0, 10).repartition(2))
    t2.delete_where("true", mode="mor")
    # fully-dead files are dropped from the manifest outright
    assert t2.manifest()["files"] == [] and t2.count_rows() == 0


def test_rewrites_apply_vectors_first(spark, table):
    table.delete_where("id % 5 = 0", mode="mor")
    # CoW delete of grp=3 rewrites those files WITH the vector applied:
    # nothing resurrects, rewritten files carry no vector
    table.delete_where("grp = 3", mode="cow")
    want = [i for i in range(100) if i % 5 and i % 10 != 3]
    assert _ids(table.read()) == want
    # merge: upsert one key, DV'd keys stay dead
    src = spark.createDataFrame([(41, 99), (999, 1)], "id bigint, grp int")
    table.merge(src, ["id"])
    got = {r["id"]: r["grp"] for r in table.read().collect()}
    assert got[41] == 99 and got[999] == 1 and 40 not in got
    # optimize purges every vector while preserving content
    n = table.count_rows()
    table.optimize(target_rows_per_file=1000)
    assert all("dv" not in f for f in table.manifest()["files"])
    assert table.count_rows() == n == table.read().count()


def test_pruned_and_point_reads_honor_vectors(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"), bloom_col="id")
    t.commit_overwrite(spark.range(0, 100).repartition(4))
    t.delete_where("id = 42", mode="mor")
    assert t.read_pruned("id", 40, 45).count() == 5
    assert t.read_point_lookup(42).count() == 0
    assert t.read_point_lookup(43).count() == 1


def test_cdc_streams_mor_deletes(spark, table):
    table.delete_where("id % 7 = 0", mode="mor")
    table.delete_where("id % 5 = 0", mode="mor")
    ch = table.read_changes_rows(0)
    assert ch.filter("_change_type = 'insert'").count() == 0
    d1 = _ids(ch.filter("_commit_version = 1"))
    d2 = _ids(ch.filter("_commit_version = 2"))
    assert d1 == [i for i in range(100) if i % 7 == 0]
    assert d2 == [i for i in range(100) if i % 5 == 0 and i % 7]
    # replication converges through a MoR producer
    final = cdf_final_state(ch, ["id"])
    dead = _ids(final.filter("__delete"))
    assert dead == sorted(set(d1) | set(d2))


def test_cdc_mixed_mor_and_cow(spark, table):
    table.delete_where("id % 7 = 0", mode="mor")
    table.commit_append(
        spark.range(200, 210).withColumn("grp", F.lit(1).cast("int"))
    )
    table.delete_where("grp = 3", mode="cow")
    ch = table.read_changes_rows(0)
    final = cdf_final_state(ch, ["id"])
    # the feed is a DELTA over the v0 snapshot: CoW churn (survivor
    # delete+insert) collapses, DV deletes and the append survive
    dead = set(_ids(final.filter("__delete")))
    ups = set(_ids(final.filter("NOT __delete")))
    assert dead == {i for i in range(100) if i % 7 == 0 or i % 10 == 3}
    assert ups == set(range(200, 210))
    # folding the delta onto the base reproduces the head snapshot
    base = {r["id"] for r in table.read(0).collect()}
    assert sorted((base - dead) | ups) == _ids(table.read())


def test_replicate_from_mor_producer(spark, tmp_path, table):
    table.delete_where("id % 7 = 0", mode="mor")
    consumer = VersionedTable(spark, str(tmp_path / "replica"))
    consumer.commit_overwrite(table.read(0))
    consumer.replicate_from(table, ["id"], since_version=0)
    assert _ids(consumer.read()) == _ids(table.read())


def test_vacuum_reclaims_expired_vectors(spark, table):
    table.delete_where("id % 7 = 0", mode="mor")   # vector A (v1)
    table.delete_where("id % 5 = 0", mode="mor")   # vector B (v2, consolidated)
    dv_a = next(
        f["dv"]["path"] for f in table.manifest(1)["files"] if f.get("dv")
    )
    dv_b = next(
        f["dv"]["path"] for f in table.manifest(2)["files"] if f.get("dv")
    )
    assert dv_a != dv_b
    preview = table.vacuum(retain_last=1, grace_seconds=0, dry_run=True)
    assert dv_a in preview and dv_b not in preview
    deleted = table.vacuum(retain_last=1, grace_seconds=0)
    assert dv_a in deleted and dv_b not in deleted
    # the live snapshot still reads correctly through vector B
    assert _ids(table.read()) == [i for i in range(100) if i % 7 and i % 5]
    assert not glob.glob(f"{table.root}/{dv_a}")


def test_clone_carries_vectors(spark, tmp_path, table):
    table.delete_where("id % 7 = 0", mode="mor")
    clone = table.clone_to(str(tmp_path / "clone"))
    assert _ids(clone.read()) == _ids(table.read())
    # the clone's own MoR delete lands under its own root
    clone.delete_where("id = 1", mode="mor")
    assert clone.read().filter("id = 1").count() == 0
    assert table.read().filter("id = 1").count() == 1


def test_mor_respects_check_constraints_scope(spark, table):
    # deletes can't violate CHECK constraints: a MoR delete on a
    # constrained table commits without a validation scan
    table.add_constraint("pos_id", "id >= 0")
    table.delete_where("id % 2 = 0", mode="mor")
    assert table.count_rows() == 50
    assert "pos_id" in table.constraints()


def test_pyds_batch_honors_vectors(spark, table):
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    table.delete_where("id % 7 = 0", mode="mor")
    df = spark.read.format("versioned").option("root", table.root).load()
    assert _ids(df) == [i for i in range(100) if i % 7]
    # filter pushdown pruning composes with the vector mask
    assert _ids(df.filter("id < 20")) == [i for i in range(20) if i % 7]
    v0 = (
        spark.read.format("versioned")
        .option("root", table.root)
        .option("version", 0)
        .load()
    )
    assert v0.count() == 100


def test_pyds_change_feed_streams_mor_deletes(spark, tmp_path, table):
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    table.delete_where("id % 7 = 0", mode="mor")
    table.delete_where("id % 5 = 0", mode="mor")
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("versioned")
        .option("root", table.root)
        .option("changeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    fed = spark.read.parquet(out)
    assert _ids(fed.filter("_change_type = 'insert'")) == list(range(100))
    d1 = _ids(fed.filter("_change_type = 'delete' AND _commit_version = 1"))
    d2 = _ids(fed.filter("_change_type = 'delete' AND _commit_version = 2"))
    assert d1 == [i for i in range(100) if i % 7 == 0]
    assert d2 == [i for i in range(100) if i % 5 == 0 and i % 7]
    # keyed replay of the feed converges to the head snapshot
    alive = _ids(cdf_final_state(fed, ["id"]).filter("NOT __delete"))
    assert alive == _ids(table.read())


def test_pyds_change_feed_streams_mor_updates(spark, tmp_path, table):
    """A merge-on-read UPDATE commit carries added files AND vector
    diffs in one version: the stream must emit the old values as
    deletes and the updated rows as inserts, converging on replay."""
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    table.update_where("id < 5", {"grp": "grp + 100"}, mode="mor")
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("versioned")
        .option("root", table.root)
        .option("changeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    fed = spark.read.parquet(out)
    step = fed.filter("_commit_version = 1")
    assert _ids(step.filter("_change_type = 'delete'")) == [0, 1, 2, 3, 4]
    ups = {
        r["id"]: r["grp"]
        for r in step.filter("_change_type = 'insert'").collect()
    }
    assert ups == {i: i % 10 + 100 for i in range(5)}
    # keyed replay of the whole feed converges to the head snapshot
    final = cdf_final_state(fed, ["id"]).filter("NOT __delete")
    assert sorted(map(tuple, final.select("id", "grp").collect())) == sorted(
        map(tuple, table.read().select("id", "grp").collect())
    )


# -- UPDATE (copy-on-write) ----------------------------------------------


def test_update_where_basic(spark, table):
    info = table.update_where("id < 10", {"grp": "grp + 100"})
    assert info.action == "replace"
    got = {r["id"]: r["grp"] for r in table.read().collect()}
    for i in range(100):
        assert got[i] == (i % 10 + 100 if i < 10 else i % 10)
    # time travel still sees the pre-update values
    assert table.read(0).filter("grp >= 100").count() == 0


def test_update_where_rewrites_only_hit_files(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 100).selectExpr("id", "id * 2 as v").coalesce(1))
    t.commit_append(spark.range(100, 200).selectExpr("id", "id * 2 as v").coalesce(1))
    before = {f["path"] for f in t.manifest()["files"]}
    t.update_where("id >= 150", {"v": "v + 1"})
    after = {f["path"] for f in t.manifest()["files"]}
    # the first file (ids 0-99) carried over by reference
    assert len(before & after) == 1
    assert t.read().filter("v % 2 = 1").count() == 50


def test_update_where_respects_vectors(spark, table):
    table.delete_where("id % 2 = 0", mode="mor")
    table.update_where("grp = 3", {"grp": "30"})
    got = table.read()
    # dead rows neither resurrect nor get updated
    assert got.count() == 50 and got.filter("id % 2 = 0").count() == 0
    assert _ids(got.filter("grp = 30")) == [i for i in range(100) if i % 2 and i % 10 == 3]


def test_update_where_validates_and_rejects(spark, table):
    table.add_constraint("grp_cap", "grp < 1000")
    with pytest.raises(Exception, match="grp_cap"):
        table.update_where("id = 1", {"grp": "5000"})
    v = table.latest_version()
    table.update_where("id = 1", {"grp": "999"})
    assert table.latest_version() == v + 1
    with pytest.raises(ValueError, match="unknown columns"):
        table.update_where("id = 1", {"nope": "1"})


def test_update_where_cdc_roundtrip(spark, table):
    table.update_where("id < 3", {"grp": "77"})
    ch = table.read_changes_rows(0)
    final = cdf_final_state(ch, ["id"])
    ups = {r["id"]: r["grp"] for r in final.filter("NOT __delete").collect()}
    assert all(ups[i] == 77 for i in range(3))


# -- UPDATE (merge-on-read) ----------------------------------------------


def test_mor_update_rewrites_nothing(spark, table):
    before = {f["path"] for f in table.manifest()["files"]}
    info = table.update_where("id % 7 = 0", {"grp": "grp + 100"}, mode="mor")
    assert info.action == "replace"
    after = table.manifest()["files"]
    # every original data file survives by reference; only new files appear
    assert before <= {f["path"] for f in after}
    # old values died via vector, updated rows appended exactly once
    got = {r["id"]: r["grp"] for r in table.read().collect()}
    assert len(got) == 100
    for i in range(100):
        assert got[i] == (i % 10 + 100 if i % 7 == 0 else i % 10)
    assert table.count_rows() == 100
    assert sum(f["dv"]["deleted"] for f in after if f.get("dv")) == 15
    # time travel still sees the pre-update values
    assert table.read(0).filter("grp >= 100").count() == 0


def test_mor_update_equals_cow_update(spark, tmp_path):
    """The two physical strategies must produce identical logical
    snapshots from identical histories."""
    snaps = []
    for mode in ("cow", "mor"):
        t = VersionedTable(spark, str(tmp_path / f"vt_{mode}"))
        t.commit_overwrite(
            spark.range(0, 100)
            .withColumn("grp", (F.col("id") % 10).cast("int"))
            .repartition(4)
        )
        t.delete_where("id % 2 = 0", mode="mor")
        t.update_where("grp = 3", {"grp": "30"}, mode=mode)
        t.update_where("grp = 30 AND id < 50", {"grp": "60"}, mode=mode)
        snaps.append(sorted(map(tuple, t.read().collect())))
    assert snaps[0] == snaps[1]


def test_mor_update_drops_fully_dead_file(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 50).selectExpr("id", "id * 2 as v").coalesce(1))
    t.commit_append(spark.range(50, 100).selectExpr("id", "id * 2 as v").coalesce(1))
    first = {f["path"] for f in t.manifest(0)["files"]}
    # update EVERY row of the first file: its entry must drop, no vector
    t.update_where("id < 50", {"v": "v + 1"}, mode="mor")
    after = t.manifest()["files"]
    assert not (first & {f["path"] for f in after})
    assert not any(f.get("dv") for f in after)
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert all(got[i] == 2 * i + 1 for i in range(50))
    assert all(got[i] == 2 * i for i in range(50, 100))


def test_mor_update_checks_constraints_before_vector(spark, table):
    table.add_constraint("grp_cap", "grp < 1000")
    v = table.latest_version()
    with pytest.raises(Exception, match="grp_cap"):
        table.update_where("id = 1", {"grp": "5000"}, mode="mor")
    # the failed update left no commit and killed no rows
    assert table.latest_version() == v
    assert table.read().count() == 100


def test_mor_update_cdc_roundtrip(spark, table):
    table.update_where("id < 3", {"grp": "77"}, mode="mor")
    ch = table.read_changes_rows(0)
    # the update step emits exactly 3 deletes (old values) + 3 inserts
    step = ch.filter("_commit_version = 1")
    assert step.filter("_change_type = 'delete'").count() == 3
    assert step.filter("_change_type = 'insert'").count() == 3
    final = cdf_final_state(ch, ["id"])
    # the feed covers (0, head]: exactly the 3 updated keys, new values
    ups = {r["id"]: r["grp"] for r in final.filter("NOT __delete").collect()}
    assert ups == {0: 77, 1: 77, 2: 77}


def test_concurrent_mixed_mor_soak(spark, tmp_path):
    """Racing appenders + merge-on-read deleters + updaters, each
    owning a disjoint key range, relying ONLY on the writers' built-in
    CAS retry: the vector write happens before the manifest claim like
    any data file, so a lost race must re-derive positions from the
    fresh snapshot — no thread's delete may leak onto another's rows
    and no vectored row may resurrect."""
    import threading

    root = str(tmp_path / "vt")
    table = VersionedTable(spark, root)
    table.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "cast(0 as int) as grp")
    )
    errors: list[Exception] = []

    def worker(t: int) -> None:
        base = 10_000 * (t + 1)
        try:
            vt = VersionedTable(spark, root)
            vt.commit_with_retry(
                lambda x: x.commit_append(
                    spark.range(base, base + 30).selectExpr(
                        "id", f"cast({t} as int) as grp"
                    )
                ),
                attempts=40,
            )
            vt.delete_where(
                f"id >= {base + 20} AND id < {base + 30}",
                mode="mor",
                attempts=40,
            )
            vt.update_where(
                f"id >= {base} AND id < {base + 5}",
                {"grp": "grp + 100"},
                attempts=40,
                mode="mor" if t % 2 else "cow",
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
    got = {r["id"]: r["grp"] for r in table.read().collect()}
    want_ids = set(range(10))
    for t in range(3):
        b = 10_000 * (t + 1)
        want_ids |= set(range(b, b + 20))
    assert set(got) == want_ids
    for t in range(3):
        b = 10_000 * (t + 1)
        for i in range(b, b + 5):
            assert got[i] == t + 100  # update applied exactly once
        for i in range(b + 5, b + 20):
            assert got[i] == t
    # metadata row accounting stayed exact through the races
    assert table.count_rows() == len(want_ids)
