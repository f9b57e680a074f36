"""snapshot_view: native-scan fast path for plain versioned snapshots.

A plain snapshot (no deletion vectors, no column-mapped entries) must
be served as a NATIVE parquet scan — no Python DataSource node in the
plan, so Catalyst column pruning/pushdown reach the files — while
merge-on-read and column-mapped snapshots keep the Python DataSource
view. Both branches must return exactly what the ``USING versioned``
view returns.
"""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.pyds import snapshot_view
from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 50).selectExpr("id", "cast(id % 5 as int) as grp")
    )
    t.commit_append(
        spark.range(50, 80).selectExpr("id", "cast(id % 5 as int) as grp")
    )
    return t


def _plan(spark, sql):
    return spark.sql(sql)._jdf.queryExecution().executedPlan().toString()


def test_plain_snapshot_is_native_scan(spark, vt):
    snapshot_view(spark, "sv_plain", vt.root)
    plan = _plan(spark, "SELECT grp, count(*) AS n FROM sv_plain GROUP BY grp")
    assert "versioned" not in plan  # no Python DataSource BatchScan
    assert "Scan parquet" in plan
    rows = spark.sql(
        "SELECT grp, count(*) AS n FROM sv_plain GROUP BY grp ORDER BY grp"
    ).collect()
    assert [r["n"] for r in rows] == [16] * 5


def test_version_pin_and_timestamp(spark, vt):
    snapshot_view(spark, "sv_v0", vt.root, version=0)
    assert spark.sql("SELECT count(*) AS n FROM sv_v0").first()["n"] == 50
    ts_v0 = vt.manifest(0)["ts"]
    snapshot_view(spark, "sv_ts", vt.root, timestamp_as_of=ts_v0)
    assert spark.sql("SELECT count(*) AS n FROM sv_ts").first()["n"] == 50
    with pytest.raises(ValueError, match="not both"):
        snapshot_view(spark, "sv_bad", vt.root, version=0, timestamp_as_of=ts_v0)


def test_native_pins_snapshot_at_call_time(spark, vt):
    snapshot_view(spark, "sv_pin", vt.root)
    vt.commit_append(spark.range(80, 90).selectExpr("id", "cast(0 as int) as grp"))
    # snapshot semantics: the view serves the state at creation time
    assert spark.sql("SELECT count(*) AS n FROM sv_pin").first()["n"] == 80


def test_mor_snapshot_falls_back_to_pyds(spark, vt):
    vt.delete_where("id >= 70", mode="mor")
    snapshot_view(spark, "sv_mor", vt.root)
    plan = _plan(spark, "SELECT count(*) AS n FROM sv_mor")
    assert "versioned" in plan  # Python DataSource owns MoR shapes
    assert spark.sql("SELECT count(*) AS n FROM sv_mor").first()["n"] == 70


def test_cmap_snapshot_falls_back_to_pyds(spark, vt):
    vt.rename_column("grp", "bucket")
    snapshot_view(spark, "sv_cmap", vt.root)
    plan = _plan(spark, "SELECT count(*) AS n FROM sv_cmap")
    assert "versioned" in plan
    rows = spark.sql(
        "SELECT bucket, count(*) AS n FROM sv_cmap GROUP BY bucket ORDER BY bucket"
    ).collect()
    assert [r["n"] for r in rows] == [16] * 5


def test_matches_using_versioned_view(spark, vt):
    snapshot_view(spark, "sv_nat", vt.root)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW sv_pyds USING versioned "
        f"OPTIONS (root '{vt.root}')"
    )
    nat = sorted(spark.sql("SELECT * FROM sv_nat").collect())
    pyd = sorted(spark.sql("SELECT * FROM sv_pyds").collect())
    assert nat == pyd
