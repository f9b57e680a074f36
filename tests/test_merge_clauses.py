"""Conditional MERGE clauses (Delta parity): WHEN MATCHED [AND cond]
THEN UPDATE SET, WHEN NOT MATCHED (omittable), and WHEN NOT MATCHED BY
SOURCE THEN DELETE — sources/versioned.py merge(when_matched_update=,
when_matched_condition=, insert_unmatched=, not_matched_by_source_
delete=). The default whole-row upsert path is untouched (same
machinery replicate_from depends on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 10).selectExpr(
            "id", "id * 10 as amount", "'old' as status"
        )
    )
    return t


def _rows(t):
    return {
        r["id"]: (r["amount"], r["status"]) for r in t.read().collect()
    }


def test_when_matched_update_with_partial_source(spark, table):
    # partial source: keys + one payload column only
    src = spark.createDataFrame(
        [(2, 5), (4, 7), (100, 9)], "id bigint, delta bigint"
    )
    table.merge(
        src, ["id"], when_matched_update={"amount": "t.amount + s.delta"}
    )
    got = _rows(table)
    assert got[2] == (25, "old") and got[4] == (47, "old")
    # untouched matched columns and unmatched rows carry through
    assert got[3] == (30, "old")
    # unmatched source row inserted with NULL backfill for absent cols
    assert got[100] == (None, None)
    assert len(got) == 11


def test_when_matched_condition_gates_update(spark, table):
    src = spark.createDataFrame(
        [(1, 1000), (2, 1)], "id bigint, amount bigint"
    )
    table.merge(
        src,
        ["id"],
        when_matched_update={"amount": "s.amount", "status": "'bumped'"},
        when_matched_condition="s.amount > t.amount",
    )
    got = _rows(table)
    assert got[1] == (1000, "bumped")   # 1000 > 10: updated
    assert got[2] == (20, "old")        # 1 < 20: carried unchanged
    assert len(got) == 10


def test_update_only_join_no_inserts(spark, table):
    src = spark.createDataFrame(
        [(5, 99), (200, 1)], "id bigint, amount bigint"
    )
    table.merge(
        src,
        ["id"],
        when_matched_update={"amount": "s.amount"},
        insert_unmatched=False,
    )
    got = _rows(table)
    assert got[5] == (99, "old")
    assert 200 not in got and len(got) == 10


def test_not_matched_by_source_delete(spark, table):
    # feed covers ids 0-4; retire source-less rows with amount >= 70
    src = spark.range(0, 5).selectExpr("id", "id * 10 as amount",
                                       "'new' as status")
    table.merge(
        src, ["id"], not_matched_by_source_delete="amount >= 70"
    )
    got = _rows(table)
    # matched rows whole-row replaced
    assert all(got[i] == (i * 10, "new") for i in range(5))
    # source-less, predicate-true: retired; predicate-false: kept
    assert 7 not in got and 8 not in got and 9 not in got
    assert got[5] == (50, "old") and got[6] == (60, "old")


def test_nmbs_delete_with_update_and_flagged_delete(spark, table):
    src = spark.createDataFrame(
        [(0, 5, False), (1, 0, True)],
        "id bigint, delta bigint, gone boolean",
    )
    table.merge(
        src,
        ["id"],
        delete_col="gone",
        when_matched_update={"amount": "t.amount + s.delta"},
        not_matched_by_source_delete="amount > 80",
    )
    got = _rows(table)
    assert got[0] == (5, "old")   # updated
    assert 1 not in got           # flagged delete wins
    assert 9 not in got           # source-less retire (90 > 80)
    assert got[8] == (80, "old")  # boundary kept
    assert len(got) == 8


def test_clause_merge_prunes_files(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 50).selectExpr("id", "id as v").coalesce(1)
    )
    t.commit_append(
        spark.range(50, 100).selectExpr("id", "id as v").coalesce(1)
    )
    before = {f["path"] for f in t.manifest()["files"]}
    src = spark.createDataFrame([(70, 1)], "id bigint, v bigint")
    t.merge(src, ["id"], when_matched_update={"v": "s.v"})
    after = {f["path"] for f in t.manifest()["files"]}
    # the file without matches carried over by reference
    assert len(before & after) == 1
    assert t.read().filter("id = 70 AND v = 1").count() == 1
    assert t.read().count() == 100


def test_clause_validation(spark, table):
    src = spark.createDataFrame([(1, 2)], "id bigint, amount bigint")
    with pytest.raises(ValueError, match="merge keys"):
        table.merge(src, ["id"], when_matched_update={"id": "1"})
    with pytest.raises(ValueError, match="unknown columns"):
        table.merge(src, ["id"], when_matched_update={"nope": "1"})
    with pytest.raises(ValueError, match="requires when_matched_update"):
        table.merge(src, ["id"], when_matched_condition="1 = 1")


def test_clause_merge_respects_vectors_and_history(spark, table):
    table.delete_where("id % 2 = 1", mode="mor")
    src = spark.createDataFrame([(2, 7), (3, 7)], "id bigint, d bigint")
    v = table.latest_version()
    table.merge(
        src, ["id"], when_matched_update={"amount": "t.amount + s.d"}
    )
    got = _rows(table)
    assert got[2] == (27, "old")
    # id=3 is vector-dead: it neither matches nor resurrects, and the
    # source row counts as UNMATCHED (Delta semantics) → re-inserted
    assert got[3] == (None, None)
    assert table.read(v).filter("id = 2 AND amount = 20").count() == 1
