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


def test_multi_clause_first_match_wins(spark, table):
    """Delta multi-clause MERGE: ordered WHEN MATCHED clauses apply
    first-match-wins — the CDC-apply shape ``WHEN MATCHED AND op='D'
    THEN DELETE WHEN MATCHED THEN UPDATE SET ...`` — in ONE atomic
    commit; matched rows taking no clause carry through unchanged."""
    src = spark.createDataFrame(
        [(1, "D", 0), (2, "U", 999), (3, "X", 5), (200, "I", 7)],
        "id bigint, op string, val bigint",
    )
    v = table.latest_version()
    table.merge(
        src,
        ["id"],
        matched_clauses=[
            {"condition": "s.op = 'D'", "action": "delete", "set": None},
            {
                "condition": "s.op = 'U'",
                "action": "update",
                "set": {"amount": "s.val", "status": "'upd'"},
            },
        ],
    )
    got = _rows(table)
    assert 1 not in got                     # first clause took it
    assert got[2] == (999, "upd")           # second clause
    assert got[3] == (30, "old")            # matched, no clause: carried
    assert got[200] == (None, None)         # unmatched: inserted
    assert got[0] == (0, "old") and len(got) == 10
    assert table.latest_version() == v + 1  # one commit, atomic


def test_multi_clause_update_order_and_unconditional_tail(spark, table):
    """A conditional UPDATE ahead of an unconditional one: rows taking
    the first clause must NOT also take the second (first-match-wins,
    not last-writer-wins)."""
    src = spark.createDataFrame(
        [(1, 100), (2, 1)], "id bigint, val bigint"
    )
    table.merge(
        src,
        ["id"],
        matched_clauses=[
            {
                "condition": "s.val > t.amount",
                "action": "update",
                "set": {"status": "'raised'"},
            },
            {"condition": None, "action": "update",
             "set": {"status": "'touched'"}},
        ],
        insert_unmatched=False,
    )
    got = _rows(table)
    assert got[1] == (10, "raised")    # 100 > 10: first clause
    assert got[2] == (20, "touched")   # 1 < 20: falls to the tail
    assert got[3] == (30, "old")       # unmatched by source: carried


def test_not_matched_by_source_update_and_delete(spark, table):
    """WHEN NOT MATCHED BY SOURCE supports UPDATE too (the SCD
    stamp-or-retire pair), first-match-wins within the group."""
    src = spark.range(0, 3).selectExpr("id")  # covers ids 0-2
    table.merge(
        src,
        ["id"],
        matched_clauses=[],  # matched rows carry (insert/stamp-only run)
        insert_unmatched=False,
        not_matched_by_source_clauses=[
            {"condition": "amount >= 80", "action": "delete", "set": None},
            {"condition": None, "action": "update",
             "set": {"status": "'stale'"}},
        ],
    )
    got = _rows(table)
    assert all(got[i] == (i * 10, "old") for i in range(3))  # matched carry
    assert 8 not in got and 9 not in got                     # retired
    assert got[5] == (50, "stale")                           # stamped
    assert len(got) == 8


def test_insert_condition_gates_new_keys_only(spark, table):
    src = spark.createDataFrame(
        [(1, 100), (300, 1), (400, 100)], "id bigint, amount bigint"
    )
    table.merge(
        src,
        ["id"],
        matched_clauses=[
            {"condition": None, "action": "update",
             "set": {"amount": "s.amount"}},
        ],
        insert_condition="amount > 50",  # source frame
    )
    got = _rows(table)
    assert got[1] == (100, "old")       # matched: updated regardless
    assert 300 not in got               # gated out (1 <= 50)
    assert got[400] == (100, None)      # gated in
    assert len(got) == 11


def test_insert_only_clause_merge_rewrites_nothing(spark, table):
    """matched_clauses=[] + INSERT: matched target rows carry through
    UNCHANGED and their files are NOT rewritten (zero-rewrite commit)."""
    before = {f["path"] for f in table.manifest()["files"]}
    src = spark.createDataFrame(
        [(1, 999, "x"), (500, 1, "n")], "id bigint, amount bigint, status string"
    )
    table.merge(src, ["id"], matched_clauses=[])
    got = _rows(table)
    assert got[1] == (10, "old")        # matched: untouched
    assert got[500] == (1, "n")
    after = {f["path"] for f in table.manifest()["files"]}
    assert before <= after              # every old file carried by reference


def test_multi_clause_validation(spark, table):
    src = spark.createDataFrame([(1, 2)], "id bigint, amount bigint")
    with pytest.raises(ValueError, match="unreachable"):
        table.merge(
            src,
            ["id"],
            matched_clauses=[
                {"condition": None, "action": "delete", "set": None},
                {"condition": "1=1", "action": "update",
                 "set": {"amount": "1"}},
            ],
        )
    with pytest.raises(ValueError, match="exclusive"):
        table.merge(
            src,
            ["id"],
            matched_clauses=[{"condition": None, "action": "delete",
                              "set": None}],
            when_matched_update={"amount": "1"},
        )
    with pytest.raises(ValueError, match="SET assignments"):
        table.merge(
            src, ["id"],
            matched_clauses=[{"condition": None, "action": "update",
                              "set": None}],
        )


def test_sql_multi_clause_merge_end_to_end(spark, table):
    """The SQL surface routes multi-clause MERGE natively: CDC-apply
    (conditional DELETE then UPDATE), conditional INSERT, and
    NOT MATCHED BY SOURCE UPDATE, all in one statement."""
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    src = spark.createDataFrame(
        [(0, "D", 0), (1, "U", 111), (300, "I", 60), (400, "I", 10)],
        "id bigint, op string, val bigint",
    )
    src.createOrReplaceTempView("mc_src")
    versioned_sql(
        spark,
        f"""MERGE INTO versioned.`{table.root}` AS t USING mc_src AS s
            ON t.id = s.id
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET amount = s.val, status = 'upd'
            WHEN NOT MATCHED AND s.val > 50 THEN INSERT *
            WHEN NOT MATCHED BY SOURCE AND amount >= 90 THEN DELETE
            WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'
        """,
    )
    got = _rows(table)
    assert 0 not in got                      # matched DELETE
    assert got[1] == (111, "upd")            # matched UPDATE
    assert 300 in got and 400 not in got     # conditional INSERT
    assert 9 not in got                      # NMBS DELETE (90 >= 90)
    assert got[5] == (50, "stale")           # NMBS UPDATE
    spark.catalog.dropTempView("mc_src")


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


def test_sql_merge_with_schema_evolution(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION (Delta 3.2 SQL): source columns
    absent from the target evolve additively (metadata-only ADD COLUMN
    pass before the clause merge — documented nuance vs Delta's
    in-commit fold); pre-merge rows read NULL for them. WITHOUT the
    modifier extra source columns are IGNORED: that is the CDC
    op-column shape (clause conditions reference s.<col>s that must
    not land in the table)."""
    from finalpipeline_spark.sources.sql_dml import versioned_sql
    from finalpipeline_spark.sources.versioned import VersionedTable

    root = str(tmp_path / "mse")
    t = VersionedTable(spark, root)
    t.commit_overwrite(
        spark.range(0, 6).selectExpr("id", "id * 10 as v")
    )
    spark.range(4, 8).selectExpr(
        "id", "id * 100 as v", "concat('x', id) as note"
    ).createOrReplaceTempView("__mse_src")
    versioned_sql(
        spark,
        f"MERGE INTO versioned.`{root}` AS t USING __mse_src AS s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert t.read().columns == ["id", "v"]  # extras ignored, no modifier
    t.rollback(0)  # back to the pre-merge content for the evolved run
    versioned_sql(
        spark,
        f"MERGE WITH SCHEMA EVOLUTION INTO versioned.`{root}` AS t "
        "USING __mse_src AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r["id"]: (r["v"], r["note"]) for r in t.read().collect()}
    assert set(got) == set(range(8))
    for i in range(4):
        assert got[i] == (i * 10, None)  # pre-merge rows: NULL backfill
    for i in range(4, 6):
        assert got[i][0] == i * 100  # matched update took the new v
    for i in range(6, 8):
        assert got[i] == (i * 100, f"x{i}")  # inserts carry the column


# -- rewrite-join broadcast gate (guide §3.1) ---------------------------

def _spy_write_plans(monkeypatch):
    """Capture the executed-plan string of every _write_data_files call."""
    import finalpipeline_spark.sources.versioned_dml as VD

    captured = []
    orig = VD.DmlMixin._write_data_files

    def spy(self, df, enforce=True):
        captured.append(df._jdf.queryExecution().executedPlan().toString())
        return orig(self, df, enforce)

    monkeypatch.setattr(VD.DmlMixin, "_write_data_files", spy)
    return captured


def test_merge_broadcast_gate_plan_and_parity(spark, tmp_path, monkeypatch):
    """A small source whose SIZE ESTIMATE is join-inflated must still
    broadcast under the gate (probe count is exact), the planner's own
    choice must return when the budget is 0, and both plans must land
    identical table content."""
    from finalpipeline_spark.sources.versioned_dml import (
        _MERGE_BROADCAST_CONF,
        _est_row_bytes,
    )

    base = spark.range(0, 20000).selectExpr("id as k", "id * 2 as v")
    dim = spark.range(0, 20000).selectExpr("id as kk", "id % 7 as tag")
    # join + dedup: tiny true size, inflated planner estimate
    lazy_src = (
        base.join(dim, F.expr("k = kk"))
        .filter("k % 400 = 3")
        .dropDuplicates(["k"])
        .selectExpr("k", "v + 1 as v")
    )
    results = {}
    for label, budget in (("on", str(32 << 20)), ("off", "0")):
        t = VersionedTable(spark, str(tmp_path / f"vt_{label}"))
        t.commit_overwrite(base.repartition(4, "k"))
        captured = _spy_write_plans(monkeypatch)
        spark.conf.set(_MERGE_BROADCAST_CONF, budget)
        try:
            t.merge(lazy_src, ["k"])
        finally:
            spark.conf.set(_MERGE_BROADCAST_CONF, str(32 << 20))
            monkeypatch.undo()
        plan = captured[-1]
        if label == "on":
            # gate engaged: rewrite side is never exchange-shuffled
            assert "BroadcastHashJoin" in plan
            assert "SortMergeJoin" not in plan
        else:
            # budget 0: planner's own choice on the inflated estimate
            assert "SortMergeJoin" in plan
        results[label] = sorted(
            (r["k"], r["v"]) for r in t.read().collect()
        )
    assert results["on"] == results["off"]
    # width estimate sanity: bigint+bigint = 16 bytes/row
    assert _est_row_bytes(lazy_src.select("k", "v").schema) == 16
