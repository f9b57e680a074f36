"""Cross-PROCESS soak: a checkpointed append-only stream consuming a
versioned table WHILE a separate driver JVM appends to and compacts it.

The per-commit stream planner (sources/pyds.py) must deliver every
appended row exactly once under live maintenance: optimize commits
landing between (or during) micro-batches relocate already-delivered
rows into new files, and a one-shot base→end diff would re-deliver
them — the planner's per-commit diff must not. The only coordination
between the two JVMs is the manifest log itself.

A second, deterministic phase replays the final table through a fresh
checkpoint under maxVersionsPerTrigger pacing: bounded incremental
drains must converge to the identical row set across a history whose
interior is full of optimize commits.
"""

from __future__ import annotations

import os
import subprocess
import sys

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.versioned import VersionedTable

_WRITER = r"""
import sys
sys.path.insert(0, ".")
root = sys.argv[1]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("mp-stream-writer")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.sources.versioned import VersionedTable

vt = VersionedTable(spark, root)
base = 10_000
for step in range(8):
    lo = base + 25 * step
    vt.commit_with_retry(
        lambda t, lo=lo: t.commit_append(
            spark.range(lo, lo + 25).selectExpr("id").repartition(2)
        ),
        attempts=60,
    )
    if step % 2 == 1:
        # alternate sizing units; both are 'optimize' commits the
        # consumer must see as zero new rows
        vt.optimize(
            target_rows_per_file=1_000_000 if step % 4 == 1 else 10,
            mode="compact",
            attempts=60,
        )
print("WRITER-OK")
"""


def test_stream_consumes_exactly_once_under_live_maintenance(
    spark, tmp_path
):
    register_versioned_source(spark)
    root = str(tmp_path / "vt")
    t = VersionedTable(spark, root)
    t.commit_overwrite(spark.range(0, 50).selectExpr("id").repartition(3))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    proc = subprocess.Popen(
        [sys.executable, "-c", _WRITER, root],
        cwd="/root/repo",
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )

    def drain(path, cp, **opts):
        r = spark.readStream.format("versioned").option("root", root)
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # drain concurrently with the writer's appends + compactions
    while proc.poll() is None:
        drain(out, ckpt)
    out_w = proc.communicate(timeout=60)[0]
    assert proc.returncode == 0, f"writer failed:\n{out_w[-4000:]}"
    assert "WRITER-OK" in out_w
    drain(out, ckpt)  # final catch-up past the writer's last commits

    want = list(range(0, 50)) + list(range(10_000, 10_000 + 25 * 8))
    got = [r["id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == sorted(want)
    assert len(got) == len(set(got)), "a row was delivered twice"

    # deterministic replay: fresh checkpoint, paced 2 versions/run —
    # bounded incremental drains across the optimize-riddled history
    # must take multiple runs and converge to the same set
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    runs = 0
    prev = -1
    while True:
        drain(out2, ckpt2, maxVersionsPerTrigger="2")
        runs += 1
        n = spark.read.parquet(out2).count()
        if n == prev:
            break
        prev = n
        assert runs < 40, "paced replay failed to converge"
    got2 = [r["id"] for r in spark.read.parquet(out2).collect()]
    assert sorted(got2) == sorted(want)
    assert runs > 2, "pacing cap did not bound the drains"
