"""Unit tests for the pandas-UDF chemistry kernels (F1-F4) and the
tie-flag/top-k operators' algebraic properties (SURVEY.md §5.4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from finalpipeline_spark.functions.fingerprints import fingerprint, tanimoto
from finalpipeline_spark.operators.tiebreak import top_k_with_tie_flag


@pytest.fixture()
def mols(spark):
    return spark.createDataFrame(
        [
            (1, "CCON"),
            (2, "CCON"),  # identical smiles -> identical fp
            (3, "CCCCCCON"),
            (4, "BAD SMILES"),  # whitespace -> parse fail -> null
            (5, None),
        ],
        "id long, smiles string",
    ).withColumn("fp", fingerprint(F.col("smiles")))


def test_fingerprint_null_semantics(mols):
    got = {r.id: r.fp is not None for r in mols.collect()}
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False}


def test_tanimoto_identity_and_symmetry(spark, mols):
    valid = mols.filter(F.col("fp").isNotNull())
    a = valid.select(F.col("id").alias("ida"), F.col("fp").alias("fpa"))
    b = valid.select(F.col("id").alias("idb"), F.col("fp").alias("fpb"))
    pairs = a.crossJoin(b).withColumn("sim", tanimoto(F.col("fpa"), F.col("fpb")))
    rows = {(r.ida, r.idb): r.sim for r in pairs.collect()}
    # identity: sim(x, x) == 1
    for i in (1, 2, 3):
        assert rows[(i, i)] == 1.0
    # identical inputs -> identical fingerprints
    assert rows[(1, 2)] == 1.0
    # symmetry + bounds
    assert rows[(1, 3)] == rows[(3, 1)]
    assert 0.0 <= rows[(1, 3)] < 1.0


def test_tie_flag_semantics(spark):
    # Group 1: scores 5,5,4,4,4 with k=3 -> cutoff value 4 has 3 copies
    # overall but only 1 in the top-3... wait: top3 = [5,5,4]; last=4;
    # in-top count=1, overall=3 -> flag=3.
    # Group 2: clean top-3 (no truncated tie) -> flag=0.
    rows = [
        (1, 10, 5.0), (1, 11, 5.0), (1, 12, 4.0), (1, 13, 4.0), (1, 14, 4.0),
        (2, 20, 9.0), (2, 21, 8.0), (2, 22, 7.0), (2, 23, 1.0),
    ]
    df = spark.createDataFrame(rows, "g long, id long, score double")
    out = top_k_with_tie_flag(df, ["g"], "score", ["id"], k=3)
    res = {(r.g, r.id): r.has_duplicates_of_last_largest_score for r in out.collect()}
    assert len(res) == 6  # 3 rows per group
    assert all(v == 3 for (g, _), v in res.items() if g == 1)
    assert all(v == 0 for (g, _), v in res.items() if g == 2)


def test_tie_flag_group_smaller_than_k(spark):
    # Fewer rows than k: last = group min; counts agree -> flag 0.
    df = spark.createDataFrame([(1, 1, 3.0), (1, 2, 2.0)], "g long, id long, score double")
    out = top_k_with_tie_flag(df, ["g"], "score", ["id"], k=10).collect()
    assert len(out) == 2
    assert all(r.has_duplicates_of_last_largest_score == 0 for r in out)


def test_tie_flag_tolerance_is_isclose(spark):
    # Scores within atol=1e-8 of the cutoff count as ties (np.isclose
    # defaults — reference datamart.py:33-39, NOT the readme's 1e-9).
    rows = [(1, 1, 5.0), (1, 2, 4.0), (1, 3, 4.0 + 5e-9), (1, 4, 3.0)]
    df = spark.createDataFrame(rows, "g long, id long, score double")
    out = top_k_with_tie_flag(df, ["g"], "score", ["id"], k=2)
    flags = {r.id: r.has_duplicates_of_last_largest_score for r in out.collect()}
    # top2 = [5.0, 4.0+5e-9]; last=4.0+5e-9; isclose matches ids 2,3 ->
    # in-top 1, overall 2 -> flag 2.
    assert set(flags) == {1, 3}
    assert all(v == 2 for v in flags.values())


def test_holt_smoothing_matches_python_reference_fold(spark, sf_dir):
    """The engines agreeing (oracle parity) is not enough for an
    iterative kernel — both could share a fold bug (DuckDB's
    list_reduce struct-accumulator in-place aliasing was exactly such
    a trap, documented in _holt_sql). Rebuild the expected values with
    plain Python floats from the same dense daily series and require
    EXACT equality."""
    from pyspark.sql import functions as F

    from finalpipeline_spark.queries.analytics import events_holt_smoothing
    from finalpipeline_spark.tables import load_table

    got = {
        r["event_type"]: (r["n_days"], r["level"], r["trend"], r["forecast_next"])
        for r in events_holt_smoothing(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            "event_type", F.expr("cast(ts_epoch_s div 86400 as bigint)").alias("day")
        )
        .count()
        .collect()
    )
    by_type: dict[str, dict[int, int]] = {}
    for r in cells:
        by_type.setdefault(r["event_type"], {})[r["day"]] = r["count"]
    dmin = min(d for m in by_type.values() for d in m)
    dmax = max(d for m in by_type.values() for d in m)
    alpha, beta = 0.3, 0.1
    for t, m in by_type.items():
        ys = [float(m.get(d, 0)) for d in range(dmin, dmax + 1)]
        if len(ys) < 3:
            assert t not in got
            continue
        lv, tr = ys[0], ys[1] - ys[0]
        for x in ys[2:]:
            lp = alpha * x + (1.0 - alpha) * (lv + tr)
            tr = beta * (lp - lv) + (1.0 - beta) * tr
            lv = lp
        assert got[t] == (len(ys), lv, tr, lv + tr), t
