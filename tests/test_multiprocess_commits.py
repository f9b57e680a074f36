"""Cross-PROCESS commit-protocol soak: racing writers in separate
driver JVMs against ONE versioned table.

Every other concurrency soak races threads inside one SparkSession —
but at scale the real contention is between independent driver
processes (jobs on different machines sharing a table root), where no
in-process lock can help: the only serialization is the manifest log's
file-level claim protocol (exclusive create + CAS + read-back
verification). This soak proves that protocol cross-process: each
worker subprocess starts its own SparkSession and appends / merge-on-
read deletes / copy-on-write updates its own key range relying ONLY on
the built-in commit retry; the parent then asserts a contiguous
parent-linked log and exactly-once content for every worker.

The reference had no multi-writer story at all (one Airflow worker
owned the warehouse — dags/db_interact.py); this is engine capability
the 100 TB deployment shape requires.
"""

from __future__ import annotations

import os
import subprocess
import sys

from finalpipeline_spark.sources.versioned import VersionedTable

_WORKER = r"""
import sys
sys.path.insert(0, ".")
root, wid = sys.argv[1], int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"mp-writer-{wid}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.sources.versioned import VersionedTable

vt = VersionedTable(spark, root)
base = 10_000 * (wid + 1)
for step in range(2):
    lo = base + 30 * step
    vt.commit_with_retry(
        lambda t, lo=lo: t.commit_append(
            spark.range(lo, lo + 30).selectExpr(
                "id", f"cast({wid} as int) as grp"
            )
        ),
        attempts=60,
    )
vt.delete_where(
    f"id >= {base + 40} AND id < {base + 60}", mode="mor", attempts=60
)
vt.update_where(
    f"id >= {base} AND id < {base + 5}",
    {"grp": "grp + 100"},
    attempts=60,
    mode="mor" if wid % 2 else "cow",
)
print("WORKER-OK", wid)
"""


def test_cross_process_racing_writers(spark, tmp_path):
    root = str(tmp_path / "vt")
    table = VersionedTable(spark, root)
    table.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "cast(-1 as int) as grp")
    )

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, root, str(w)],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for w in range(3)
    ]
    outs = [p.communicate(timeout=800)[0] for p in procs]
    for w, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {w} failed:\n{out[-4000:]}"
        assert f"WORKER-OK {w}" in out

    # contiguous parent-linked log: every commit landed exactly once
    vs = table.versions()
    assert vs == list(range(len(vs)))
    assert len(vs) == 1 + 3 * 4  # seed + 3 workers x (2 appends + del + upd)
    got = {r["id"]: r["grp"] for r in table.read().collect()}
    want_ids = set(range(10))
    for w in range(3):
        b = 10_000 * (w + 1)
        want_ids |= set(range(b, b + 40))
    assert set(got) == want_ids
    for w in range(3):
        b = 10_000 * (w + 1)
        for i in range(b, b + 5):
            assert got[i] == w + 100  # update applied exactly once
        for i in range(b + 5, b + 40):
            assert got[i] == w
    assert table.count_rows() == len(want_ids)


_VACUUMER = r"""
import sys, time
sys.path.insert(0, ".")
root, seconds = sys.argv[1], float(sys.argv[2])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName("mp-vacuumer")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
from finalpipeline_spark.sources.versioned import VersionedTable

vt = VersionedTable(spark, root)
deadline = time.time() + seconds
n = 0
while time.time() < deadline:
    # real-world grace (in-flight-commit protection); anchoring +
    # archival run every pass regardless
    vt.vacuum(retain_last=5, grace_seconds=3600)
    n += 1
print("VACUUM-OK", n)
"""


def test_cross_process_writers_vs_vacuum_archival(spark, tmp_path):
    """The anchors+archival maintenance path racing INDEPENDENT driver
    JVMs: writers commit through the file-level claim protocol while a
    separate vacuum process anchors the log and renames anchored
    manifests into the archive. Every commit must land exactly once
    and every read path must keep working across the hot/archive
    split."""
    root = str(tmp_path / "vtva")
    table = VersionedTable(spark, root)
    table.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "cast(-1 as int) as grp")
    )

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    writers = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, root, str(w)],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for w in range(3)
    ]
    vac = subprocess.Popen(
        [sys.executable, "-c", _VACUUMER, root, "45"],
        cwd="/root/repo",
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    outs = [p.communicate(timeout=800)[0] for p in writers]
    vout = vac.communicate(timeout=800)[0]
    for w, (p, out) in enumerate(zip(writers, outs)):
        assert p.returncode == 0, f"worker {w} failed:\n{out[-4000:]}"
        assert f"WORKER-OK {w}" in out
    assert vac.returncode == 0, f"vacuumer failed:\n{vout[-4000:]}"
    assert "VACUUM-OK" in vout

    vs = table.versions()
    assert vs == list(range(len(vs)))
    assert len(vs) == 1 + 3 * 4
    got = {r["id"]: r["grp"] for r in table.read().collect()}
    want_ids = set(range(10))
    for w in range(3):
        b = 10_000 * (w + 1)
        want_ids |= set(range(b, b + 40))
    assert set(got) == want_ids
    for w in range(3):
        b = 10_000 * (w + 1)
        for i in range(b, b + 5):
            assert got[i] == w + 100
        for i in range(b + 5, b + 40):
            assert got[i] == w
    assert table.count_rows() == len(want_ids)
    # the vacuum process actually archived part of the log
    arch = os.path.join(root, "_log", "archive")
    assert os.path.isdir(arch) and len(os.listdir(arch)) > 0

_IDENTITY_WORKER = r"""
import sys
sys.path.insert(0, ".")
root, wid = sys.argv[1], int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"mp-ident-{wid}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.sources.versioned import VersionedTable

vt = VersionedTable(spark, root)
base = 1_000 * (wid + 1)
for step in range(3):
    lo = base + 20 * step
    vt.commit_with_retry(
        lambda t, lo=lo: t.commit_append(
            spark.range(lo, lo + 20).selectExpr("id as n")
        ),
        attempts=60,
    )
print("IDENT-OK", wid)
"""


def test_cross_process_identity_allocation(spark, tmp_path):
    """Identity allocation under TRUE cross-JVM contention — the proof
    the r8 TOCTOU fix was designed for (versioned_schema._apply_identity:
    watermark and CAS base from ONE manifest snapshot). Three driver
    processes append concurrently into one GENERATED ALWAYS AS IDENTITY
    table relying only on the built-in commit retry; every row must get
    a globally distinct, step-aligned id — an overlapping watermark
    would surface here as a duplicate rid."""
    root = str(tmp_path / "vti")
    table = VersionedTable(spark, root)
    table.commit_overwrite(spark.range(0).selectExpr("id as n"))
    table.add_identity_column("rid", start=100, step=3)

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _IDENTITY_WORKER, root, str(w)],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for w in range(3)
    ]
    outs = [p.communicate(timeout=800)[0] for p in procs]
    for w, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {w} failed:\n{out[-4000:]}"
        assert f"IDENT-OK {w}" in out

    vs = table.versions()
    assert vs == list(range(len(vs)))
    assert len(vs) == 2 + 3 * 3  # seed + declare + 3 workers x 3 appends
    rows = table.read().collect()
    assert len(rows) == 3 * 3 * 20
    rids = [r["rid"] for r in rows]
    assert all(v is not None for v in rids)
    # globally distinct across processes — the uniqueness guarantee
    assert len(set(rids)) == len(rids)
    # step alignment: every id is start + k*step
    assert all(v >= 100 and (v - 100) % 3 == 0 for v in rids)


_SQL_WRITER = r"""
import sys
sys.path.insert(0, ".")
root, wid = sys.argv[1], int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"mp-sqlw-{wid}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.sources.pyds import register_versioned_source

register_versioned_source(spark)
spark.sql(
    f"CREATE TEMPORARY VIEW t USING versioned OPTIONS (root '{root}')"
)
base = 1_000 * (wid + 1)
for step in range(3):
    lo = base + 10 * step
    spark.sql(
        f"INSERT INTO t SELECT id, cast({wid} as int) as grp "
        f"FROM range({lo}, {lo + 10})"
    )
print("SQLW-OK", wid)
"""


_JVM_API_WRITER = r"""
import sys
sys.path.insert(0, ".")
root = sys.argv[1]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("mp-jvmw")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.sources.versioned import VersionedTable

vt = VersionedTable(spark, root)
for step in range(3):
    lo = 9_000 + 10 * step
    vt.commit_with_retry(
        lambda t, lo=lo: t.commit_append(
            spark.range(lo, lo + 10).selectExpr(
                "id", "cast(9 as int) as grp"
            )
        ),
        attempts=60,
    )
print("JVMW-OK 7")
"""


def test_cross_process_sql_inserts_race_jvm_writer(spark, tmp_path):
    """The os-primitive commit protocol (pyds_write) racing the JVM
    protocol (versioned_log) ACROSS PROCESSES: two subprocess drivers
    append through pure SQL INSERT INTO while a third appends through
    the VersionedTable API — the two claim implementations must
    interoperate on one log with every commit landing exactly once."""
    root = str(tmp_path / "vtsql")
    table = VersionedTable(spark, root)
    table.commit_overwrite(
        spark.range(0, 5).selectExpr("id", "cast(-1 as int) as grp")
    )

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SQL_WRITER, root, str(w)],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for w in range(2)
    ] + [
        subprocess.Popen(
            [sys.executable, "-c", _JVM_API_WRITER, root],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
    ]
    outs = [p.communicate(timeout=800)[0] for p in procs]
    for w, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"writer {w} failed:\n{out[-4000:]}"
    assert "SQLW-OK 0" in outs[0] and "SQLW-OK 1" in outs[1]
    assert "JVMW-OK 7" in outs[2]

    vs = table.versions()
    assert vs == list(range(len(vs)))
    assert len(vs) == 1 + 3 * 3  # seed + 3 writers x 3 appends
    got = {r["id"]: r["grp"] for r in table.read().collect()}
    want = {i: -1 for i in range(5)}
    for w in range(2):
        b = 1_000 * (w + 1)
        want |= {i: w for i in range(b, b + 30)}
    want |= {i: 9 for i in range(9_000, 9_030)}
    assert got == want
