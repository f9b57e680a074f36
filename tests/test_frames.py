"""local_df's Arrow fast path must be value-identical to the
single-slice RDD path it replaces, and unsafe shapes (NaN floats,
datetimes, non-Arrow sessions) must fall back to that path."""

from __future__ import annotations

import datetime

from pyspark.sql.types import StructType

from finalpipeline_spark.functions.frames import empty_df, local_df


def _rdd_path(spark, rows, ddl):
    st = StructType.fromDDL(ddl)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), st)


def test_local_df_matches_rdd_path(spark):
    cases = [
        ([("a", 1, 2.5, True, None)], "s string, i bigint, d double, b boolean, n string"),
        ([(None, None, None, None)], "s string, i bigint, d double, b boolean"),
        # big ints and binary survive exactly (no float64 widening)
        ([("x", 2**62, -1.5e300, b"\x00\xff")], "s string, i bigint, d double, y binary"),
        ([(i, f"r{i}") for i in range(100)], "k bigint, v string"),
    ]
    for rows, ddl in cases:
        fast = local_df(spark, rows, ddl)
        slow = _rdd_path(spark, rows, ddl)
        assert fast.schema == slow.schema
        assert fast.collect() == slow.collect()


def test_local_df_single_partition_plan(spark):
    # the point of local_df: no defaultParallelism fan-out
    df = local_df(spark, [(1,), (2,)], "i bigint")
    assert df.rdd.getNumPartitions() <= 2
    assert [r["i"] for r in df.orderBy("i").collect()] == [1, 2]


def test_local_df_type_mismatch_falls_back_to_verifier(spark):
    import pytest

    # a float in a bigint column must RAISE (the RDD path's verifier
    # semantics), never Arrow-truncate 2.5 → 2
    with pytest.raises(Exception):
        local_df(spark, [(2.5,)], "i bigint").collect()
    # bool in an int column likewise keeps the strict path
    with pytest.raises(Exception):
        local_df(spark, [(True,)], "i bigint").collect()
    # a str in a double column: strict, not Arrow-cast
    with pytest.raises(Exception):
        local_df(spark, [("1.5",)], "d double").collect()
    # int in a double column is value-identical on both paths: allowed
    assert local_df(spark, [(5,)], "d double").collect()[0]["d"] == 5.0


def test_local_df_nan_and_datetime_fall_back_exact(spark):
    v = local_df(spark, [(float("nan"), 1)], "d double, i bigint").collect()[0]["d"]
    assert v != v  # NaN preserved, not nulled
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    got = local_df(spark, [(ts,)], "t timestamp").collect()[0]["t"]
    expected = _rdd_path(spark, [(ts,)], "t timestamp").collect()[0]["t"]
    assert got == expected


def test_empty_df_zero_partitions(spark):
    df = empty_df(spark, "a string, b bigint")
    assert df.count() == 0
    assert df.rdd.getNumPartitions() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]
