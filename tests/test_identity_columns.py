"""GENERATED ALWAYS AS IDENTITY columns: engine-assigned, unique,
monotone-in-step with gaps allowed (Delta's contract), watermark
derived from the manifest's per-file stats (zero extra state), ALWAYS
semantics (providing the column refuses), immutable under UPDATE,
declared before data.
"""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0).selectExpr("id as k"))
    t.add_identity_column("rid", start=100, step=5)
    return t


def _rids(vt):
    return [r["rid"] for r in vt.read().collect()]


def test_assignment_unique_monotone_with_gaps(spark, vt):
    vt.commit_append(spark.range(0, 20).selectExpr("id as k"))
    first = _rids(vt)
    assert len(first) == 20 and len(set(first)) == 20
    assert min(first) >= 100
    assert all((v - 100) % 5 == 0 for v in first)
    # second batch strictly above the first (stats-derived watermark)
    vt.commit_append(spark.range(20, 30).selectExpr("id as k"))
    both = _rids(vt)
    assert len(set(both)) == 30
    assert min(set(both) - set(first)) > max(first)


def test_always_semantics_and_immutability(spark, vt):
    vt.commit_append(spark.range(0, 5).selectExpr("id as k"))
    with pytest.raises(ValueError, match="IDENTITY"):
        vt.commit_append(
            spark.range(5, 8).selectExpr("id as k", "id as rid")
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        vt.update_where("k = 1", {"rid": "999"})
    with pytest.raises(ValueError, match="cannot be renamed"):
        vt.rename_column("rid", "row_id")
    with pytest.raises(ValueError, match="IDENTITY"):
        vt.merge(
            spark.range(0, 2).selectExpr("id as k", "id as rid"), keys=["k"]
        )
    # non-identity updates carry the ids through both rewrite modes
    before = dict((r["k"], r["rid"]) for r in vt.read().collect())
    vt.update_where("k = 1", {"k": "k + 100"}, mode="cow")
    vt.update_where("k = 2", {"k": "k + 100"}, mode="mor")
    after = dict((r["k"], r["rid"]) for r in vt.read().collect())
    assert after[101] == before[1] and after[102] == before[2]


def test_merge_retains_matched_ids_assigns_fresh(spark, vt):
    """Whole-row MERGE must not re-identify matched rows: they retain
    the target's identity values; only genuinely new keys get fresh
    ids, strictly above the table max."""
    vt.commit_append(
        spark.range(0, 6).selectExpr("id as k")
    )
    before = {r["k"]: r["rid"] for r in vt.read().collect()}
    hi = max(before.values())
    vt.merge(spark.range(3, 9).selectExpr("id as k"), keys=["k"])
    after = {r["k"]: r["rid"] for r in vt.read().collect()}
    assert len(after) == 9
    for k in (3, 4, 5):
        assert after[k] == before[k]  # matched: retained
    fresh = [after[k] for k in (6, 7, 8)]
    assert all(v > hi for v in fresh)  # inserts: fresh, above the max
    assert len(set(after.values())) == 9  # still unique
    assert all((v - 100) % 5 == 0 for v in after.values())
    # SET-clause merge: updates keep ids, clause inserts get fresh ids
    vt.add_column("val", "bigint")
    src = spark.range(8, 11).selectExpr("id as k", "id * 10 as bump")
    vt.merge(
        src, keys=["k"],
        when_matched_update={"val": "s.bump"},
        insert_unmatched=True,
    )
    rows = {r["k"]: r for r in vt.read().collect()}
    assert rows[8]["rid"] == after[8]  # updated row kept its id
    assert rows[8]["val"] == 80
    final_ids = [r["rid"] for r in rows.values()]
    assert len(set(final_ids)) == 11  # clause inserts unique too
    assert all((v - 100) % 5 == 0 for v in final_ids)


def test_sequence_survives_overwrite_and_declared_before_data(spark, vt, tmp_path):
    vt.commit_append(spark.range(0, 10).selectExpr("id as k"))
    hi = max(_rids(vt))
    vt.commit_overwrite(spark.range(0, 3).selectExpr("id as k"))
    fresh = _rids(vt)
    assert len(fresh) == 3
    assert min(fresh) > hi  # the sequence never restarts
    t2 = VersionedTable(spark, str(tmp_path / "t2"))
    t2.commit_overwrite(spark.range(0, 2).selectExpr("id as k"))
    with pytest.raises(ValueError, match="before rows exist"):
        t2.add_identity_column("rid")
    with pytest.raises(ValueError, match="step"):
        vt.add_identity_column("rid2", step=0)


def test_identity_feeds_generated_and_time_travel(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t3"))
    t.commit_overwrite(spark.range(0).selectExpr("id as k"))
    t.add_identity_column("rid", start=1, step=1)
    t.add_generated_column("rid_mod", "bigint", "rid % 7")
    t.commit_append(spark.range(0, 12).selectExpr("id as k"))
    rows = t.read().collect()
    assert all(r["rid_mod"] == r["rid"] % 7 for r in rows)
    v = t.latest_version()
    t.commit_append(spark.range(12, 15).selectExpr("id as k"))
    assert t.read(version=v).count() == 12  # time travel intact
    ids = [r["rid"] for r in t.read().collect()]
    assert len(set(ids)) == 15


def test_watermark_race_trips_cas_not_duplicate_ids(spark, vt):
    """TOCTOU regression: the watermark and the CAS base_version must
    come from the SAME manifest read. A racer committing between the
    victim's snapshot and its commit must trip ConcurrentCommitError —
    never let the CAS pass with a stale watermark (which would hand two
    commits overlapping identity values)."""
    from finalpipeline_spark.sources.versioned import ConcurrentCommitError

    vt.commit_append(spark.range(0, 5).selectExpr("id as k"))
    racer = VersionedTable(spark, vt.root)
    orig = vt._identity_watermark
    fired = {}

    def hijack(m, col, spec):
        # fire exactly AT the watermark derivation — the narrowest
        # possible window between deriving the watermark and reading
        # the CAS base (the exact interleaving that used to slip by
        # when the two came from separate manifest() reads)
        if not fired:
            fired["x"] = True
            racer.commit_append(spark.range(100, 110).selectExpr("id as k"))
        return orig(m, col, spec)

    vt._identity_watermark = hijack
    try:
        with pytest.raises(ConcurrentCommitError):
            vt.commit_append(spark.range(5, 10).selectExpr("id as k"))
    finally:
        vt._identity_watermark = orig
    # the racer's commit landed; the victim retries from a fresh
    # snapshot and every id stays unique
    vt.commit_append(spark.range(5, 10).selectExpr("id as k"))
    rids = _rids(vt)
    assert len(rids) == 20 and len(set(rids)) == 20


def test_watermark_race_in_merge_trips_cas(spark, vt):
    """Same TOCTOU guard on the MERGE path: its watermark derives from
    the manifest snapshot its CAS guards."""
    from finalpipeline_spark.sources.versioned import ConcurrentCommitError

    vt.commit_append(spark.range(0, 5).selectExpr("id as k"))
    racer = VersionedTable(spark, vt.root)
    orig = vt._identity_watermark
    fired = {}

    def hijack(m, col, spec):
        if not fired:
            fired["x"] = True
            racer.commit_append(spark.range(50, 55).selectExpr("id as k"))
        return orig(m, col, spec)

    vt._identity_watermark = hijack
    try:
        with pytest.raises(ConcurrentCommitError):
            vt._merge_once(spark.range(3, 8).selectExpr("id as k"), keys=["k"])
    finally:
        vt._identity_watermark = orig
    vt.merge(spark.range(3, 8).selectExpr("id as k"), keys=["k"])
    rids = _rids(vt)
    assert len(rids) == 13 and len(set(rids)) == 13


def test_replace_where_assigns_identity_and_generated(spark, tmp_path):
    """replaceWhere's replacement rows behave like an append: engine
    assigns fresh identity values (never NULL, never reused) and
    computes omitted generated columns."""
    t = VersionedTable(spark, str(tmp_path / "rw"))
    t.commit_overwrite(spark.range(0).selectExpr("id as k"))
    t.add_identity_column("rid", start=1, step=1)
    t.add_generated_column("k2", "bigint", "k * 2")
    t.commit_append(spark.range(0, 10).selectExpr("id as k"))
    hi = max(r["rid"] for r in t.read().collect())
    t.replace_where("k >= 5", spark.range(20, 25).selectExpr("id as k"))
    rows = t.read().collect()
    assert len(rows) == 10
    rids = [r["rid"] for r in rows]
    assert all(v is not None for v in rids)
    assert len(set(rids)) == 10
    assert all(r["k2"] == r["k"] * 2 for r in rows)
    new = [r["rid"] for r in rows if r["k"] >= 20]
    assert all(v > hi for v in new)  # fresh ids, never reused
