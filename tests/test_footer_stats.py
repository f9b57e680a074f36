"""Differential coverage for the parquet-footer manifest-stats fast
path (`DmlMixin._footer_stats`): a write's file entries normally come
from the footers the write just produced — a driver-side metadata
read, no Spark job — and must be byte-identical to the Spark
aggregation pass they replace. Shapes that the footers cannot answer
exactly (bloom index, nested columns, >4KB string values, INT96
timestamps) must fall back to the Spark pass, not approximate."""

from __future__ import annotations

import pytest

import finalpipeline_spark.sources.versioned_dml as vd
from finalpipeline_spark.sources.versioned import VersionedTable


def _commit(spark, tmp_path, df, sub, force_spark=False, partition_by=None):
    """Commit ``df`` into a fresh table, optionally forcing the Spark
    stats pass, and report whether the footer path produced the
    entries."""
    used = {"footer": None}
    orig = vd.DmlMixin._footer_stats

    def spy(self, *a, **k):
        if force_spark:
            used["footer"] = False
            return None
        r = orig(self, *a, **k)
        used["footer"] = r is not None
        return r

    vd.DmlMixin._footer_stats = spy
    try:
        t = VersionedTable(
            spark, str(tmp_path / sub), partition_by=partition_by
        )
        t.commit_overwrite(df)
    finally:
        vd.DmlMixin._footer_stats = orig
    return t, used["footer"]


def _entry_key(e):
    return (e["rows"], repr(sorted(e["stats"].items())), repr(e.get("pv")))


def _assert_same_entries(m_footer, m_spark):
    f1 = sorted(m_footer["files"], key=_entry_key)
    f2 = sorted(m_spark["files"], key=_entry_key)
    assert len(f1) == len(f2)
    for a, b in zip(f1, f2):
        assert a["rows"] == b["rows"]
        assert a["bytes"] == b["bytes"]
        assert a["stats"] == b["stats"]
        assert a["nulls"] == b["nulls"]
        assert sorted(a.get("stats_trunc", [])) == sorted(
            b.get("stats_trunc", [])
        )
        assert a.get("pv") == b.get("pv")


SHAPES = {
    # every flat atomic type the stats pass records
    "flat_mixed": [
        "format_string('k%03d', id % 7) as sk",
        "cast(id as double) / 7 as dbl",
        "cast(id % 2 = 0 as boolean) as flag",
        "date_add(date'2024-01-01', cast(id as int)) as d",
        "cast(id as float) as flt",
        "cast(id as smallint) as si",
    ],
    # NaN must fold as the LARGEST double (Spark max semantics)
    "nan_double": [
        "case when id % 50 = 3 then cast('NaN' as double) "
        "else cast(id as double) end as dn"
    ],
    "all_null_col": [
        "cast(null as string) as ns",
        "format_string('v%d', id) as v",
    ],
    "some_null": [
        "case when id % 3 = 0 then null "
        "else format_string('v%05d', id) end as v",
        "case when id % 5 = 0 then null else id * 2 end as w",
    ],
    # > _STR_STAT_MAX chars but < parquet-mr's 4KB stats cutoff:
    # the footer path must truncate and mark exactly like the Spark one
    "mid_string": [
        "concat(format_string('c-%06d-', id), repeat('y', 80)) as c"
    ],
}


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_footer_entries_match_spark_pass(spark, tmp_path, shape):
    df = spark.range(0, 200).selectExpr("id", *SHAPES[shape]).repartition(
        3, "id"
    )
    t1, used1 = _commit(spark, tmp_path, df, f"f_{shape}")
    t2, used2 = _commit(spark, tmp_path, df, f"s_{shape}", force_spark=True)
    assert used1 is True, "footer path should serve this shape"
    assert used2 is False
    _assert_same_entries(t1.manifest(), t2.manifest())


@pytest.mark.parametrize(
    "shape, exprs",
    [
        # parquet-mr drops stats for >4KB values — no bounds to copy
        ("long_body", [
            "concat(format_string('doc-%06d-', id), repeat('x', 5000)) "
            "as body"
        ]),
        # INT96 timestamps carry no footer stats
        ("ts_col", [
            "timestamp'2024-03-15 10:30:00' + "
            "make_interval(0,0,0,0,0,0,id) as ts"
        ]),
        # nested columns: footers only know leaf-level null counts
        ("arr_col", ["array(id, id+1) as a", "cast(id as double) as x"]),
    ],
)
def test_footer_falls_back_where_inexact(spark, tmp_path, shape, exprs):
    df = spark.range(0, 120).selectExpr("id", *exprs).repartition(2, "id")
    t, used = _commit(spark, tmp_path, df, f"fb_{shape}")
    assert used is False, "shape must fall back to the Spark stats pass"
    m = t.manifest()
    assert sum(e["rows"] for e in m["files"]) == 120


def test_footer_partitioned_entries_match(spark, tmp_path):
    df = spark.range(0, 200).selectExpr(
        "id", "format_string('k%01d', id % 3) as sk",
        "cast(id as double) as x",
    ).repartition(3, "id")
    t1, used1 = _commit(spark, tmp_path, df, "fp", partition_by=["sk"])
    t2, _ = _commit(
        spark, tmp_path, df, "sp", force_spark=True, partition_by=["sk"]
    )
    assert used1 is True
    _assert_same_entries(t1.manifest(), t2.manifest())
    # pruning still exact on the partition column
    got = t1.read().filter("sk = 'k1'")
    assert got.count() == t2.read().filter("sk = 'k1'").count()


def test_footer_bloom_config_falls_back(spark, tmp_path):
    df = spark.range(0, 100).selectExpr("id", "id * 3 as k")
    t, used = _commit_bloom(spark, tmp_path, df)
    assert used is False
    m = t.manifest()
    assert all("bloom" in e for e in m["files"])


def _commit_bloom(spark, tmp_path, df):
    used = {"footer": None}
    orig = vd.DmlMixin._footer_stats

    def spy(self, *a, **k):
        r = orig(self, *a, **k)
        used["footer"] = r is not None
        return r

    vd.DmlMixin._footer_stats = spy
    try:
        t = VersionedTable(
            spark, str(tmp_path / "bl"), bloom_col="k",
            bloom_bits=1024, bloom_k=3,
        )
        t.commit_overwrite(df)
    finally:
        vd.DmlMixin._footer_stats = orig
    return t, used["footer"]
