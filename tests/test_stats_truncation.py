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


def test_trunc_upper_boundary_properties():
    """Hypothesis boundary sweep over BOTH writer populations' twins
    (versioned_base and the engine-less pyds_write): bounds are valid
    Unicode SCALAR values (surrogate block skipped — U+D7FF increments
    to U+E000), strict-JSON round-trip safe, and > every value sharing
    the prefix."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finalpipeline_spark.sources import pyds_write
    from finalpipeline_spark.sources import versioned_base

    edge = st.sampled_from(
        ["", "퟿", "￿", chr(0x10FFFF)]
    )
    scalar_char = st.characters(  # valid scalar values only (as UTF-8 data)
        min_codepoint=0, max_codepoint=0x10FFFF,
        blacklist_categories=("Cs",),
    )
    prefixes = st.one_of(
        st.text(scalar_char, max_size=6),
        st.tuples(st.text(scalar_char, max_size=3), edge, edge).map(
            lambda t: t[0] + t[1] + t[2]
        ),
    )

    @given(prefix=prefixes, suffix=st.text(scalar_char, max_size=4))
    @settings(max_examples=400, deadline=None)
    def check(prefix, suffix):
        for fn in (versioned_base._trunc_upper, pyds_write._trunc_upper):
            up = fn(prefix)
            if up is None:
                # only when every char is U+10FFFF (no safe bound)
                assert prefix == chr(0x10FFFF) * len(prefix)
                continue
            # valid scalar values only: encodable and strict-JSON safe
            up.encode("utf-8")
            assert _json.loads(_json.dumps({"u": up}))["u"] == up
            # bound validity: > every string with the prefix
            assert up > prefix + suffix
        assert versioned_base._trunc_upper(prefix) == pyds_write._trunc_upper(
            prefix
        )

    check()


def test_trunc_upper_surrogate_adjacent_prunes_safely(spark, tmp_path):
    """End-to-end on the boundary key: values whose 64th char is
    U+D7FF force the incremented bound across the surrogate block; the
    manifest stays valid strict JSON and pruning on those keys is
    exact-or-over-selecting (never drops a match)."""
    import json as _json
    import os as _os

    t = VersionedTable(spark, str(tmp_path / "vt"))
    # 63-char prefix + U+D7FF at the truncation edge + a long tail
    df = spark.range(0, 40).selectExpr(
        "id",
        "concat(format_string('p%062d', id), '퟿', repeat('y', 200)) as body",
    )
    t.commit_overwrite(df.repartition(4))
    m = t.manifest()
    for e in m["files"]:
        assert "body" in e.get("stats_trunc", [])
        mx = e["stats"]["body"][1]
        assert "\ud800" not in mx and mx.encode("utf-8")
    # strict JSON parse of the raw manifest file (RFC-8259 shape)
    raw = open(
        _os.path.join(t.root, "_log", "v%012d.json" % t.latest_version())
    ).read()
    assert _json.loads(raw)
    # pruning ≡ full scan on the boundary keys
    lo = "p" + "0" * 62
    hi = "p%062d" % 39 + "퟿" + "y" * 200
    assert t.read_pruned("body", lo, hi).count() == 40
    one = "p%062d" % 7 + "퟿" + "y" * 200
    assert t.read_pruned("body", one, one).count() == 1
