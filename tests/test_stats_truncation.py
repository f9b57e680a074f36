"""Iceberg-style string-bound truncation in manifest stats.

A document-body string column must never put two whole documents into
every manifest entry as min/max — at 10^5 files that turns the O(MB)
planning read into an O(table) one. Bounds are capped at
``_STR_STAT_MAX`` characters with validity preserved (lower = prefix
min, upper = incremented prefix max), pruning only ever over-selects,
and ``column_stats`` refuses truncated columns instead of returning
bounds as if they were exact extremes."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.versioned import VersionedTable
from finalpipeline_spark.sources.versioned_base import (
    _STR_STAT_MAX,
    _trunc_upper,
)


def _docs(spark, lo, hi):
    # 5 KB bodies with an orderable prefix so pruning is testable
    return spark.range(lo, hi).selectExpr(
        "id",
        "concat(format_string('doc-%06d-', id), repeat('x', 5000)) as body",
        "format_string('k%03d', id % 7) as short_key",
    )


def test_trunc_upper_bound_math():
    assert _trunc_upper("abc") == "abd"
    assert _trunc_upper("ab" + chr(0x10FFFF)) == "ac"
    assert _trunc_upper(chr(0x10FFFF) * 3) is None
    assert _trunc_upper("a") == "b"


def test_manifest_never_carries_whole_documents(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(_docs(spark, 0, 200).repartition(4))
    raw = json.load(
        open(os.path.join(t.root, "_log", "v%012d.json" % 0))
    )
    for e in raw["files"]:
        mn, mx = e["stats"]["body"]
        assert len(mn) <= _STR_STAT_MAX
        assert len(mx) <= _STR_STAT_MAX
        assert "body" in e.get("stats_trunc", [])
        # short strings stay exact, no marker
        assert "short_key" not in e.get("stats_trunc", [])
        assert len(e["stats"]["short_key"][0]) == 4
        # bounds are valid: min <= the true per-file extremes' prefixes
        assert mn <= mx
    # the whole manifest stays small even with 5 KB bodies
    assert os.path.getsize(
        os.path.join(t.root, "_log", "v%012d.json" % 0)
    ) < 64_000


def test_truncated_bounds_still_prune_correctly(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    # three appends with disjoint body prefixes → three prunable files
    for lo in (0, 1000, 2000):
        t.commit_append(_docs(spark, lo, lo + 50).coalesce(1))
    lo_k, hi_k = "doc-001000", "doc-001049~"
    pruned = t.read_pruned("body", lo_k, hi_k)
    full = t.read().filter(
        (F.col("body") >= lo_k) & (F.col("body") <= hi_k)
    )
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    )
    assert pruned.count() == 50
    # pruning actually skipped files (1 of 3)
    assert len(pruned.inputFiles()) == 1


def test_column_stats_refuses_truncated_exact_for_short(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(_docs(spark, 0, 30))
    with pytest.raises(ValueError, match="TRUNCATED"):
        t.column_stats("body")
    # short string columns keep the exact metadata-only path
    cs = t.column_stats("short_key")
    assert cs["min"] == "k000" and cs["max"] == "k006"
    assert t.column_stats("id") == {
        "rows": 30, "null_count": 0, "min": 0, "max": 29,
    }


def test_sql_write_path_truncates_identically(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(_docs(spark, 0, 10))
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW trunc_v USING versioned "
        f"OPTIONS (root '{t.root}')"
    )
    _docs(spark, 100, 130).createOrReplaceTempView("trunc_src")
    spark.sql("INSERT INTO trunc_v SELECT * FROM trunc_src")
    m = t.manifest()
    new = [e for e in m["files"] if e["stats"]["id"][0] == 100]
    assert new
    for e in new:
        mn, mx = e["stats"]["body"]
        assert len(mn) <= _STR_STAT_MAX and len(mx) <= _STR_STAT_MAX
        assert "body" in e.get("stats_trunc", [])
    # truncated SQL-written bounds prune the same way
    got = t.read_pruned("body", "doc-000100", "doc-000129~")
    assert got.count() == 30
    spark.catalog.dropTempView("trunc_v")
    spark.catalog.dropTempView("trunc_src")
