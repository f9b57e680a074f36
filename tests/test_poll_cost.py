"""Bounded per-poll cost of the Python-source log walk.

``_live_manifests`` backs every batch plan and every stream poll, and
the engine polls ``latestOffset`` 16+ times per trigger — so its
steady-state cost must be O(commits since the last call), not O(all
commits ever).  These tests drive the per-root resolved-log cache with
synthetic manifest logs (pure JSON on disk — the function under test is
deliberately JVM-free so it pickles to executors) and count the actual
``os.stat`` traffic.

Soundness cases mirror the commit protocol's mutation surface
(sources/versioned.py): append-only tail growth, vacuum's terminal
``expired`` flip (always a prefix of the live list), archival renames
(content-preserving), transient unreadable fragments, and the
rmtree-and-recreate shape that any cache keyed on version numbers alone
would get wrong.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from finalpipeline_spark.sources import pyds


@pytest.fixture(autouse=True)
def _fresh_caches(monkeypatch):
    monkeypatch.setattr(pyds, "_LIVE_CACHE", {})
    monkeypatch.setattr(pyds, "_PARSE_CACHE", {})


def _write_manifest(root, v, *, ts=None, expired=False, action=None, files=()):
    log = os.path.join(root, "_log")
    os.makedirs(log, exist_ok=True)
    m = {
        "version": v,
        "parent": v - 1 if v else None,
        "action": action or ("append" if v else "overwrite"),
        "schema": "struct<id:bigint>",
        "ts": 1000.0 + v if ts is None else ts,
        "files": list(files),
    }
    if expired:
        m["expired"] = True
    with open(os.path.join(log, "v%012d.json" % v), "w") as fh:
        json.dump(m, fh)


def _mk_table(root, n, **kw):
    for v in range(n):
        _write_manifest(root, v, **kw)


def _counting_stat(monkeypatch):
    real = os.stat
    calls = []

    def counted(path, *a, **kw):
        if isinstance(path, (str, bytes)):
            calls.append(path)
        return real(path, *a, **kw)

    monkeypatch.setattr(os, "stat", counted)
    return calls


def test_cold_then_steady_state_poll_is_o_tail(tmp_path, monkeypatch):
    """The 200-commit table from the poll-cost brief: after one warm
    call, a repeat poll does a handful of stats (canary + forward
    probe), not ~2 per version."""
    root = str(tmp_path / "vt")
    _mk_table(root, 200)
    assert sorted(pyds._live_manifests(root)) == list(range(200))
    calls = _counting_stat(monkeypatch)
    assert sorted(pyds._live_manifests(root)) == list(range(200))
    # canary (1 hot hit) + tail probe past head (hot + archive miss)
    assert len(calls) <= 6, calls


def test_new_commits_resolve_incrementally(tmp_path, monkeypatch):
    root = str(tmp_path / "vt")
    _mk_table(root, 50)
    assert len(pyds._live_manifests(root)) == 50
    for v in (50, 51, 52):
        _write_manifest(root, v)
    calls = _counting_stat(monkeypatch)
    assert sorted(pyds._live_manifests(root)) == list(range(53))
    # canary + 3 new versions + end-of-log probe
    assert len(calls) <= 10, calls


def test_expired_flip_caught_by_canary(tmp_path, monkeypatch):
    """Vacuum flips ``expired`` on a prefix of the live list; the next
    poll must drop exactly that prefix, re-validating only up to the
    first still-live version."""
    root = str(tmp_path / "vt")
    _mk_table(root, 20)
    assert len(pyds._live_manifests(root)) == 20
    for v in range(5):
        _write_manifest(root, v, expired=True)
    calls = _counting_stat(monkeypatch)
    assert sorted(pyds._live_manifests(root)) == list(range(5, 20))
    assert len(calls) <= 12, calls  # 6 canary walk + tail probe
    # steady state again after the flip
    calls.clear()
    assert sorted(pyds._live_manifests(root)) == list(range(5, 20))
    assert len(calls) <= 6, calls


def test_archival_rename_keeps_cache_sound(tmp_path):
    """Vacuum moves anchored manifests into _log/archive/ by rename
    (content-preserving); cached entries must survive the move and the
    canary must find its version at the new location."""
    root = str(tmp_path / "vt")
    _mk_table(root, 10)
    assert len(pyds._live_manifests(root)) == 10
    log = os.path.join(root, "_log")
    arch = os.path.join(log, "archive")
    os.makedirs(arch)
    for v in range(8):
        name = "v%012d.json" % v
        os.rename(os.path.join(log, name), os.path.join(arch, name))
    with open(os.path.join(log, "checkpoint-%012d.json" % 9), "w") as fh:
        json.dump({"version": 9}, fh)
    assert sorted(pyds._live_manifests(root)) == list(range(10))


def test_table_recreate_invalidates_cache(tmp_path):
    """rmtree + re-create at the same root: the canary sees different
    content at the lowest live version and rebuilds — serving the old
    table's tail would be a wrong-answer bug."""
    root = str(tmp_path / "vt")
    _mk_table(root, 10)
    assert len(pyds._live_manifests(root)) == 10
    shutil.rmtree(root)
    _mk_table(root, 3, ts=2000.0)
    assert sorted(pyds._live_manifests(root)) == [0, 1, 2]


def test_table_recreate_shorter_same_prefix(tmp_path):
    """Recreation where the new v0 happens to be byte-identical: the
    head-vanished check (listing regressed below the cached latest and
    the old head no longer resolves) must still rebuild."""
    root = str(tmp_path / "vt")
    _mk_table(root, 10)
    assert len(pyds._live_manifests(root)) == 10
    shutil.rmtree(root)
    _mk_table(root, 3)  # identical bytes for v0..v2
    assert sorted(pyds._live_manifests(root)) == [0, 1, 2]


def test_junk_log_names_ignored(tmp_path):
    """Stray files whose names merely look versioned must not break the
    walk (a dropped ``verify.json`` matches the v-prefix pattern)."""
    root = str(tmp_path / "vt")
    _mk_table(root, 4)
    log = os.path.join(root, "_log")
    for junk in ("verify.json", "checkpoint-junk.json", "vnotes.json"):
        with open(os.path.join(log, junk), "w") as fh:
            fh.write("{}")
    assert sorted(pyds._live_manifests(root)) == [0, 1, 2, 3]


def test_transient_hole_is_reprobed_not_frozen(tmp_path):
    """An unreadable mid-log fragment (crash mid-write being recovered)
    is invisible this call but must be re-probed on later calls — the
    cache may not freeze it invisible forever."""
    root = str(tmp_path / "vt")
    _mk_table(root, 10)
    frag = os.path.join(root, "_log", "v%012d.json" % 4)
    with open(frag, "w") as fh:
        fh.write("{corrupt")
    assert sorted(pyds._live_manifests(root)) == [v for v in range(10) if v != 4]
    _write_manifest(root, 4)  # recovery completed the slot
    assert sorted(pyds._live_manifests(root)) == list(range(10))


def test_starting_timestamp_inclusive_at_exact_equality(tmp_path):
    """Delta contract: 'all changes committed AT or after the
    timestamp' — a consumer resuming from a commit timestamp copied out
    of the history must replay that commit, not silently skip it."""
    root = str(tmp_path / "vt")
    _mk_table(root, 10)  # ts = 1000.0 + v
    live = pyds._live_manifests(root)
    assert pyds._first_version_at_or_after(root, live, 1003.0) == 3
    assert pyds._first_version_at_or_after(root, live, 1003.5) == 4
    assert pyds._first_version_at_or_after(root, live, 999.0) == 0
    assert pyds._first_version_at_or_after(root, live, 5000.0) == 10
    assert pyds._first_version_at_or_after(root, {}, 1.0) == 0
    # boundary agreement with version-as-of (shared adjusted walk)
    assert pyds._version_as_of_timestamp(root, live, 1003.0) == 3


def test_version_as_of_mtime_fallback_reads_archive(tmp_path):
    """Pre-timestamp manifests resolve by file mtime; one that lives
    only in the archive must resolve through the getmtime fallthrough
    (the old exists()-then-getmtime pair was a TOCTOU under racing
    archival)."""
    root = str(tmp_path / "vt")
    _mk_table(root, 3, ts=0)
    log = os.path.join(root, "_log")
    arch = os.path.join(log, "archive")
    os.makedirs(arch)
    for v in range(3):  # strip ts to force the mtime path
        p = os.path.join(log, "v%012d.json" % v)
        with open(p) as fh:
            m = json.load(fh)
        del m["ts"]
        with open(p, "w") as fh:
            json.dump(m, fh)
    name = "v%012d.json" % 0
    os.rename(os.path.join(log, name), os.path.join(arch, name))
    live = pyds._live_manifests(root)
    assert len(live) == 3
    far_future = 4e12
    assert pyds._version_as_of_timestamp(root, live, far_future) == 2
