"""Table-property evolution: the durable bloom point-lookup index as a
first-class, SQL-settable property (Delta's ALTER TABLE SET
TBLPROPERTIES shape), plus SHOW TBLPROPERTIES / DESCRIBE DETAIL for
the SQL-only persona."""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.sql_dml import versioned_sql
from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit_overwrite(
        spark.range(0, 40).selectExpr("cast(id as string) as k", "id as v")
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW props USING versioned "
        f"OPTIONS (root '{t.root}')"
    )
    yield t
    spark.catalog.dropTempView("props")


def test_set_bloom_index_python_api(spark, vt):
    info = vt.set_bloom_index("k", bits=4096, k=3)
    assert info.action == "set_properties"
    assert vt.manifest()["bloom_index"] == {"col": "k", "bits": 4096, "k": 3}
    # pre-property files have no words: conservatively probed, exact
    assert [r.v for r in vt.read_point_lookup("7").collect()] == [7]
    # post-property appends from a CONFIG-LESS handle carry words
    plain = VersionedTable(spark, vt.root)
    plain.commit_append(
        spark.range(100, 120).selectExpr("cast(id as string) as k", "id as v")
    )
    new_entries = [
        e for e in plain.manifest()["files"]
        if (e.get("stats") or {}).get("v", [None])[0] == 100
    ]
    assert new_entries and all("bloom" in e for e in new_entries)
    assert [r.v for r in plain.read_point_lookup("105").collect()] == [105]
    # validation: unknown column refuses
    with pytest.raises(ValueError, match="no column"):
        vt.set_bloom_index("nope")
    # drop: property gone, point lookup refuses again on a fresh handle
    vt.drop_bloom_index()
    assert "bloom_index" not in vt.manifest()
    with pytest.raises(ValueError, match="no bloom index"):
        VersionedTable(spark, vt.root).read_point_lookup("7")


def test_set_tblproperties_sql(spark, vt):
    versioned_sql(
        spark,
        "ALTER TABLE props SET TBLPROPERTIES ("
        "'bloom.column' = 'k', 'bloom.bits' = '4096', 'bloom.k' = '3')",
    )
    assert vt.manifest()["bloom_index"] == {"col": "k", "bits": 4096, "k": 3}
    # SQL INSERT path blooms its files under the property
    spark.sql("INSERT INTO props VALUES ('900', 900)")
    m = vt.manifest()
    inserted = [e for e in m["files"] if e["rows"] == 1]
    assert inserted and all("bloom" in e for e in inserted)
    assert [r.v for r in vt.read_point_lookup("900").collect()] == [900]
    # SHOW TBLPROPERTIES round-trips the property
    shown = {
        r.key: r.value
        for r in versioned_sql(spark, "SHOW TBLPROPERTIES props").collect()
    }
    assert shown["bloom.column"] == "k"
    assert shown["bloom.bits"] == "4096" and shown["bloom.k"] == "3"
    # defaults apply when only the column is given
    versioned_sql(spark, "ALTER TABLE props UNSET TBLPROPERTIES ('bloom.column')")
    assert "bloom_index" not in vt.manifest()
    versioned_sql(
        spark, "ALTER TABLE props SET TBLPROPERTIES ('bloom.column' = 'k')"
    )
    b = vt.manifest()["bloom_index"]
    assert b["col"] == "k" and b["bits"] > 0 and b["k"] > 0
    # unknown property keys refuse loudly (silent drop is corruption)
    with pytest.raises(ValueError, match="unsupported table propert"):
        versioned_sql(
            spark, "ALTER TABLE props SET TBLPROPERTIES ('foo.bar' = '1')"
        )


def test_describe_detail_sql(spark, vt):
    vt.set_bloom_index("k")
    vt.add_constraint("v_nonneg", "v >= 0")
    row = versioned_sql(spark, "DESCRIBE DETAIL props").first()
    assert row.format == "versioned"
    assert row.location == vt.root
    assert row.numFiles == len(vt.manifest()["files"])
    assert row.numRows == vt.count_rows()
    assert row.version == vt.latest_version()
    assert "bloom.column" in row.properties
    assert row.numConstraints == 1


def test_entries_record_bytes_and_detail_sums_them(spark, vt):
    for e in vt.manifest()["files"]:
        assert e.get("bytes", 0) > 0
    spark.sql("INSERT INTO props VALUES ('z1', 1)")  # SQL path too
    m = vt.manifest()
    assert all(e.get("bytes", 0) > 0 for e in m["files"])
    row = versioned_sql(spark, "DESCRIBE DETAIL props").first()
    assert row.sizeInBytes == sum(e["bytes"] for e in m["files"])


def test_optimize_by_target_bytes(spark, vt):
    # fragment the table: many tiny files
    for lo in range(100, 160, 10):
        vt.commit_append(
            spark.range(lo, lo + 10)
            .selectExpr("cast(id as string) as k", "id as v")
            .coalesce(1)
        )
    m = vt.manifest()
    assert len(m["files"]) >= 7
    big = max(e["bytes"] for e in m["files"])
    # compact by BYTES: everything under the (generous) target packs
    info = vt.optimize(mode="compact", target_bytes_per_file=big * 100)
    assert info.action == "optimize"
    m2 = vt.manifest()
    assert len(m2["files"]) < len(m["files"])
    assert vt.count_rows() == 100
    # idempotent at the same target: files now sized, nothing to pack
    before = {e["path"] for e in m2["files"]}
    vt.optimize(mode="compact", target_bytes_per_file=min(
        e["bytes"] for e in m2["files"]
    ))
    assert {e["path"] for e in vt.manifest()["files"]} == before
    with pytest.raises(ValueError, match=">= 1"):
        vt.optimize(target_bytes_per_file=0)
