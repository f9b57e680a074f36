"""Log-listing cost guards for long-lived tables: version resolution
(JVM side) and the stream's latestOffset poll (pyds side) must do O(1)
directory work past a log anchor — counted syscalls, not vibes. A
year of minutely commits must not make every poll re-walk the whole
log; anchors + vacuum's archival keep the hot ``_log/`` bounded and
the caches make steady-state polls O(commits since last poll)."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from finalpipeline_spark.sources.versioned import VersionedTable


class _CountingFS:
    """Python proxy around the JVM FileSystem handle that counts method
    invocations (listStatus / exists / open / getFileStatus)."""

    def __init__(self, fs):
        object.__setattr__(self, "_inner", fs)
        object.__setattr__(self, "calls", Counter())

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if callable(attr):
            calls = self.calls

            def wrapped(*a, **kw):
                calls[name] += 1
                return attr(*a, **kw)

            return wrapped
        return attr


def _grow(spark, t, lo, hi):
    for i in range(lo, hi):
        t.commit_append(
            spark.createDataFrame([(i,)], "id bigint").coalesce(1)
        )


def _jvm_listing_cost(spark, tmp_path, n_commits):
    t = VersionedTable(
        spark, str(tmp_path / f"t{n_commits}"), checkpoint_interval=8
    )
    t.commit_overwrite(spark.createDataFrame([(0,)], "id bigint"))
    _grow(spark, t, 1, n_commits)
    # vacuum archives every anchored manifest out of the hot log
    t.vacuum(retain_last=1, grace_seconds=0)
    counting = _CountingFS(t._fs)
    t._fs = counting
    head = t.latest_version()
    assert head == n_commits - 1
    assert t.manifest()["version"] == head
    return counting.calls


def test_jvm_version_resolution_o1_past_anchor(spark, tmp_path):
    """versions()/manifest() after vacuum's archival: ONE hot-log
    listing plus a bounded handful of name probes — and the bound must
    NOT grow with table age (counted at two ages, 3x apart)."""
    small = _jvm_listing_cost(spark, tmp_path, 16)
    large = _jvm_listing_cost(spark, tmp_path, 48)
    for calls in (small, large):
        assert calls["listStatus"] <= 2, dict(calls)
        # name probes: head manifest + forward-probe miss + anchor
        # bookkeeping — a constant, not O(commits)
        assert calls["exists"] + calls["open"] <= 12, dict(calls)
    # O(1) means the 3x-older table costs the same, not 3x
    assert (
        large["exists"] + large["open"] <= small["exists"] + small["open"] + 2
    ), (dict(small), dict(large))


def _pyds_poll_cost(spark, tmp_path, n_commits, monkeypatch):
    from finalpipeline_spark.sources import pyds

    t = VersionedTable(
        spark, str(tmp_path / f"p{n_commits}"), checkpoint_interval=8
    )
    t.commit_overwrite(spark.createDataFrame([(0,)], "id bigint"))
    _grow(spark, t, 1, n_commits)
    t.vacuum(retain_last=n_commits, grace_seconds=0)  # archival only
    pyds._invalidate_live_cache(t.root)
    reader = pyds.VersionedStreamReader(t.root, [("id", "bigint")])
    reader.initialOffset()
    reader.latestOffset()  # warm the resolved-log cache
    counts = Counter()
    real_listdir, real_stat = os.listdir, os.stat

    def counting_listdir(p, *a, **kw):
        counts["listdir"] += 1
        return real_listdir(p, *a, **kw)

    def counting_stat(p, *a, **kw):
        counts["stat"] += 1
        return real_stat(p, *a, **kw)

    monkeypatch.setattr(os, "listdir", counting_listdir)
    monkeypatch.setattr(os, "stat", counting_stat)
    off = reader.latestOffset()  # the steady-state poll being measured
    monkeypatch.undo()
    assert off == {"version": n_commits - 1}
    return counts


def test_pyds_latest_offset_o1_past_anchor(spark, tmp_path, monkeypatch):
    """A steady-state latestOffset poll: one hot-log readdir, a canary
    stat, and a bounded head probe — independent of how many commits
    the table has ever had (counted at two ages, 3x apart)."""
    small = _pyds_poll_cost(spark, tmp_path, 16, monkeypatch)
    large = _pyds_poll_cost(spark, tmp_path, 48, monkeypatch)
    for counts in (small, large):
        assert counts["listdir"] == 1, dict(counts)
        assert counts["stat"] <= 6, dict(counts)
    assert large["stat"] <= small["stat"] + 2, (dict(small), dict(large))


def test_archival_is_safe_for_every_reader_surface(spark, tmp_path):
    """Archival safety: after vacuum moves anchored manifests into
    _log/archive/, time travel, CDF, the DataSource batch read, and
    NEW commits all behave exactly as before — and the hot log stays
    bounded (only post-anchor manifests + the anchor file remain)."""
    t = VersionedTable(spark, str(tmp_path / "s"), checkpoint_interval=4)
    t.commit_overwrite(spark.createDataFrame([(0,)], "id bigint"))
    _grow(spark, t, 1, 12)
    t.vacuum(retain_last=12, grace_seconds=0)  # nothing expires: archival only
    hot = [
        n
        for n in os.listdir(os.path.join(t.root, "_log"))
        if n.startswith("v") and n.endswith(".json")
    ]
    assert len(hot) < 12  # pre-anchor manifests left the hot dir
    assert os.path.isdir(os.path.join(t.root, "_log", "archive"))
    # every version still resolves: time travel + CDF + pyds
    assert t.read(version=0).count() == 1
    assert t.read(version=5).count() == 6
    assert t.read().count() == 12
    assert t.read_changes_rows(3, 7).count() == 4
    from finalpipeline_spark.sources.pyds import register_versioned_source

    register_versioned_source(spark)
    df = (
        spark.read.format("versioned")
        .option("root", t.root)
        .option("version", "4")
        .load()
    )
    assert df.count() == 5
    # the table keeps committing normally past the archival
    t.commit_append(spark.createDataFrame([(99,)], "id bigint"))
    assert t.latest_version() == 12
    assert t.read().count() == 13
