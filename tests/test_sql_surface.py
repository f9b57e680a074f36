"""SQL-only surface of the versioned lakehouse layer.

A SQL-only consumer (the reference's users live in SQL — views_p1.py)
must be able to reach snapshot reads, VERSION AS OF / TIMESTAMP AS OF
time travel, and the change feed through pure ``spark.sql`` — no
Python imports from this repo beyond the one-time format registration.
These tests drive the same assertions test_versioned makes through the
Python API, but via ``CREATE TEMPORARY VIEW ... USING versioned``
(option names are Delta's readChangeFeed options verbatim), plus the
``table_changes`` helper (Delta's SQL TVF shape).
"""

from __future__ import annotations

import time

import pytest

from finalpipeline_spark.sources.pyds import (
    register_versioned_source,
    table_changes,
)
from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 50).selectExpr("id", "cast(id % 5 as int) as grp")
    )
    t.commit_append(
        spark.range(50, 80).selectExpr("id", "cast(id % 5 as int) as grp")
    )
    return t


def _mkview(spark, name, opts):
    kv = ", ".join(f"{k} '{v}'" for k, v in opts.items())
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} USING versioned OPTIONS ({kv})")


def test_sql_snapshot_and_version_as_of(spark, vt):
    _mkview(spark, "t_sql", {"root": vt.root})
    assert spark.sql("SELECT count(*) AS n FROM t_sql").first()["n"] == 80
    _mkview(spark, "t_v0", {"root": vt.root, "version": "0"})
    assert spark.sql("SELECT count(*) AS n FROM t_v0").first()["n"] == 50
    assert (
        spark.sql("SELECT max(id) AS m FROM t_v0").first()["m"] == 49
    )
    # aggregation pushdown sanity: grouping works through the view
    rows = spark.sql(
        "SELECT grp, count(*) AS n FROM t_sql GROUP BY grp ORDER BY grp"
    ).collect()
    assert [r["n"] for r in rows] == [16] * 5


def test_sql_timestamp_as_of(spark, vt):
    ts_v0 = vt.manifest(0)["ts"]
    ts_v1 = vt.manifest(1)["ts"]
    mid = (ts_v0 + ts_v1) / 2 if ts_v1 > ts_v0 + 2e-3 else ts_v0
    _mkview(spark, "t_asof", {"root": vt.root, "timestampAsOf": repr(mid)})
    assert spark.sql("SELECT count(*) AS n FROM t_asof").first()["n"] == 50
    _mkview(
        spark, "t_now", {"root": vt.root, "timestampAsOf": repr(time.time())}
    )
    assert spark.sql("SELECT count(*) AS n FROM t_now").first()["n"] == 80


def test_sql_change_feed_matches_python_cdf(spark, vt):
    vt.delete_where("id < 10", mode="cow")  # version 2: CoW delete
    _mkview(
        spark,
        "t_cdf",
        {"root": vt.root, "changeFeed": "true", "startingVersion": "1"},
    )
    # The SQL/batch feed is FILE-granularity (a CoW survivor churns as
    # delete+insert of identical content — documented contract), while
    # read_changes_rows is row-level; the two agree exactly on appends
    # and on the NET effect of every commit.
    got = {
        (r[0], r[1]): r[2]
        for r in spark.sql(
            """
            SELECT _commit_version, _change_type, count(*) AS n
            FROM t_cdf GROUP BY 1, 2
            """
        ).collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in vt.read_changes_rows(0)  # Python API: exclusive base
        .groupBy("_commit_version", "_change_type")
        .count()
        .collect()
    }
    assert got[(1, "insert")] == want[(1, "insert")] == 30
    net = lambda d, v: d.get((v, "insert"), 0) - d.get((v, "delete"), 0)  # noqa: E731
    assert net(got, 2) == net(want, 2) == -10
    # startingVersion 0 additionally delivers commit 0's initial rows
    _mkview(
        spark,
        "t_cdf",
        {"root": vt.root, "changeFeed": "true", "startingVersion": "0"},
    )
    v0 = spark.sql(
        "SELECT _change_type, count(*) AS n FROM t_cdf "
        "WHERE _commit_version = 0 GROUP BY 1"
    ).collect()
    assert [(r[0], r[1]) for r in v0] == [("insert", 50)]
    # meta columns carry the Delta triple, including the commit ts
    assert spark.sql(
        "SELECT count(*) AS n FROM t_cdf WHERE _commit_timestamp IS NULL"
    ).first()["n"] == 0
    # ending bound through SQL
    _mkview(
        spark,
        "t_cdf01",
        {
            "root": vt.root,
            "changeFeed": "true",
            "startingVersion": "0",
            "endingVersion": "1",
        },
    )
    assert (
        spark.sql("SELECT count(*) AS n FROM t_cdf01").first()["n"] == 80
    )
    # net row effect of the full feed reconciles with the snapshot
    net = spark.sql(
        """
        SELECT sum(CASE WHEN _change_type = 'insert' THEN 1 ELSE -1 END) AS n
        FROM t_cdf
        """
    ).first()["n"]
    assert net == vt.read().count()


def test_sql_change_feed_starting_timestamp(spark, vt):
    exact = vt.manifest(1)["ts"]
    _mkview(
        spark,
        "t_cdf_ts",
        {
            "root": vt.root,
            "changeFeed": "true",
            "startingTimestamp": repr(exact),
        },
    )
    # inclusive at exact equality: commit 1's 30 inserts are included
    rows = spark.sql(
        "SELECT min(_commit_version) AS v, count(*) AS n FROM t_cdf_ts"
    ).first()
    assert (rows["v"], rows["n"]) == (1, 30)


def test_table_changes_helper_matches_sql_view(spark, vt):
    df = table_changes(spark, vt.root, 0, 1)
    assert df.count() == 80
    assert {"_change_type", "_commit_version", "_commit_timestamp"} <= set(
        df.columns
    )
    full = table_changes(spark, vt.root, 0)
    assert full.count() == 80


def test_sql_history_matches_python_history(spark, vt):
    """DESCRIBE HISTORY through pure SQL: the `history 'true'` view
    returns exactly VersionedTable.history() — columns, metrics, and
    commit timestamps — so SQL-only users can audit the log."""
    vt.delete_where("id >= 70", mode="mor")  # DV commit: nontrivial metrics
    _mkview(spark, "t_hist", {"root": vt.root, "history": "true"})
    got = {
        r["version"]: r.asDict()
        for r in spark.sql("SELECT * FROM t_hist").collect()
    }
    want = {r["version"]: r.asDict() for r in vt.history().collect()}
    assert got == want
    assert len(want) == 3
    assert spark.sql(
        "SELECT action FROM t_hist WHERE version = 1"
    ).first()["action"] == "append"


def test_sql_history_rejects_cdf_combo(spark, vt):
    _mkview(
        spark,
        "t_bad",
        {"root": vt.root, "history": "true", "changeFeed": "true"},
    )
    with pytest.raises(Exception, match="history or changeFeed"):
        spark.sql("SELECT * FROM t_bad").collect()


def test_sql_change_feed_across_rename_and_readd(spark, vt):
    """A BATCH changeFeed view whose range crosses a rename (and a
    drop + re-add) serves in the view's pinned frame — the LATEST
    schema — with pre-rename steps' values under the new name and
    pre-re-add values dead (NULL)."""
    vt.rename_column("grp", "bucket")          # v2
    vt.commit_append(
        spark.range(80, 90).selectExpr(
            "id", "cast(id % 5 as int) as bucket"
        )
    )                                           # v3
    _mkview(
        spark,
        "t_cdf_ren",
        {"root": vt.root, "changeFeed": "true", "startingVersion": "1"},
    )
    got = spark.sql(
        "SELECT * FROM t_cdf_ren WHERE _change_type = 'insert'"
    )
    assert "bucket" in got.columns and "grp" not in got.columns
    # v1's pre-rename append (ids 50..79) flows values under `bucket`
    assert got.filter("bucket IS NULL").count() == 0
    assert got.count() == 40  # 30 pre-rename + 10 post-rename inserts
    assert (
        got.filter("_commit_version = 1 AND bucket = id % 5").count() == 30
    )

    # drop + re-add: old-era values are dead in the latest frame
    vt.drop_column("bucket")                    # v4
    vt.add_column("bucket", "int")              # v5 (re-add)
    vt.commit_append(
        spark.range(90, 95).selectExpr("id", "cast(7 as int) as bucket")
    )                                           # v6
    _mkview(
        spark,
        "t_cdf_readd",
        {"root": vt.root, "changeFeed": "true", "startingVersion": "1"},
    )
    got = spark.sql(
        "SELECT * FROM t_cdf_readd WHERE _change_type = 'insert'"
    )
    assert got.count() == 45
    assert got.filter("bucket IS NOT NULL").count() == 5  # new era only
    assert got.filter("_commit_version = 6 AND bucket = 7").count() == 5
    spark.catalog.dropTempView("t_cdf_ren")
    spark.catalog.dropTempView("t_cdf_readd")


def test_iso_timestamp_options_and_restore_text(spark, vt, tmp_path):
    """Delta parity: timestamp options accept ISO-8601 text, not just
    epoch floats — tz-anchored strings in the engine-less view options,
    session-tz text in RESTORE (resolved by Spark itself)."""
    import datetime

    from finalpipeline_spark.sources.sql_dml import versioned_sql

    ts_v0 = vt.manifest(0)["ts"]
    ts_v1 = vt.manifest(1)["ts"]
    mid = (ts_v0 + ts_v1) / 2 if ts_v1 > ts_v0 + 2e-3 else ts_v0
    iso = datetime.datetime.fromtimestamp(
        mid, tz=datetime.timezone.utc
    ).isoformat()
    _mkview(spark, "t_iso", {"root": vt.root, "timestampAsOf": iso})
    assert spark.sql("SELECT count(*) AS n FROM t_iso").first()["n"] == 50
    # tz-naive text refuses loudly at plan time (the engine-less
    # planner cannot anchor it)
    with pytest.raises(Exception, match="offset"):
        _mkview(
            spark, "t_naive",
            {"root": vt.root, "timestampAsOf": "2024-01-01T00:00:00"},
        )
    # RESTORE with quoted timestamp text resolves in the SESSION tz
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        text = datetime.datetime.fromtimestamp(
            mid, tz=datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f")
        info = versioned_sql(
            spark, f"RESTORE TABLE t_iso TO TIMESTAMP AS OF '{text}'"
        )
        assert info.action == "rollback"
        assert vt.read().count() == 50  # restored to the v0 content
        with pytest.raises(ValueError, match="unparseable"):
            versioned_sql(
                spark, "RESTORE TABLE t_iso TO TIMESTAMP AS OF 'not a time'"
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    spark.catalog.dropTempView("t_iso")
