"""Live stream vs racing commits + vacuum archival.

The r8 poll-cost cache (pyds._live_manifests) is exercised here in
anger: a versioned stream drains repeatedly while a writer thread
commits (anchors every 4 versions) and a vacuum thread archives
anchored manifests and swaps anchor files under the reader's feet.
Every poll therefore races archival renames (the transient-hole path),
anchor swaps (the listed-max path), and tail growth (the forward
probe). The assertion is the only one that matters: exactly-once
delivery of every committed row.

The synthetic flip/replacement cases live in tests/test_poll_cost.py;
the cross-JVM write-path soaks in tests/test_multiprocess_commits.py —
this is the READ-side integration of the same races.
"""

from __future__ import annotations

import threading
import time

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.versioned import VersionedTable

_BATCH = 40
_N_BATCHES = 12


def test_stream_exactly_once_under_racing_archival(spark, tmp_path):
    register_versioned_source(spark)
    root = str(tmp_path / "vt")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # anchor every 4 commits so vacuum has fresh archival work all run
    vt = VersionedTable(spark, root, checkpoint_interval=4)
    vt.commit_overwrite(spark.range(0, _BATCH).selectExpr("id"))

    stop = threading.Event()
    errors: list[BaseException] = []

    def writer():
        try:
            w = VersionedTable(spark, root, checkpoint_interval=4)
            for i in range(1, _N_BATCHES):
                lo = i * _BATCH
                df = spark.range(lo, lo + _BATCH).selectExpr("id")
                w.commit_with_retry(lambda t, df=df: t.commit_append(df))
                time.sleep(0.05)
        except BaseException as exc:  # surfaced by the main thread
            errors.append(exc)

    def vacuumer():
        try:
            v = VersionedTable(spark, root, checkpoint_interval=4)
            while not stop.is_set():
                # retain everything (no expired flips — the stream may
                # lag arbitrarily) and keep a REAL grace: grace=0 with
                # live writers legitimately reaps their in-flight data
                # dirs (that window is exactly what grace protects).
                # Manifest archival + anchor swaps — the race under
                # test — run every pass regardless of grace.
                v.vacuum(retain_last=10_000, grace_seconds=30)
                time.sleep(0.1)
        except BaseException as exc:
            errors.append(exc)

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    wt = threading.Thread(target=writer)
    vc = threading.Thread(target=vacuumer)
    wt.start()
    vc.start()
    try:
        # drains interleave with live commits + archival renames; each
        # plans partitions against a moving log (Python sources run
        # availableNow as single-batch semantics, so loop)
        for _ in range(8):
            drain()
            time.sleep(0.15)
    finally:
        wt.join(timeout=120)
        stop.set()
        vc.join(timeout=60)
    assert not errors, errors
    drain()  # writer done: collect whatever the interleaved drains missed

    total = _BATCH * _N_BATCHES
    got = spark.read.parquet(out)
    assert got.count() == total, "lost or duplicated rows under the race"
    assert got.select("id").distinct().count() == total
    # the log really did archive under the stream: hot dir is bounded
    assert vt.read().count() == total
    assert vt.latest_version() == _N_BATCHES - 1

    # catch-up after expiry: with the stream fully caught up, flip a
    # prefix expired (the canary path), keep committing, keep draining
    vt.vacuum(retain_last=2, grace_seconds=0)
    vt.commit_append(
        spark.range(total, total + _BATCH).selectExpr("id")
    )
    drain()
    got = spark.read.parquet(out)
    assert got.count() == total + _BATCH
    assert got.select("id").distinct().count() == total + _BATCH
