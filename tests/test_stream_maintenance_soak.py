"""Randomized soak: an append-only stream (checkpointed, availableNow
drains interleaved with commits) over a table whose history mixes
appends with OPTIMIZE maintenance must deliver every appended row
EXACTLY ONCE — compaction relocating rows between drains must be
invisible (Delta parity: streaming ignores dataChange=false actions).
Seeded RNG: failures reproduce."""

from __future__ import annotations

import random

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.versioned import VersionedTable


def test_append_stream_exactly_once_under_random_optimize(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rng = random.Random(0xC0FFEE)

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", t.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t.commit_overwrite(spark.range(0, 50).selectExpr("id").repartition(3))
    appended = list(range(0, 50))
    nxt = 50
    for _ in range(12):
        op = rng.random()
        if op < 0.45:
            n = rng.randint(1, 40)
            t.commit_append(
                spark.range(nxt, nxt + n).selectExpr("id").repartition(
                    rng.randint(1, 3)
                )
            )
            appended += list(range(nxt, nxt + n))
            nxt += n
        elif op < 0.75:
            t.optimize(
                target_rows_per_file=rng.choice([10, 1_000_000]),
                mode="compact",
            )
        else:
            drain()
    drain()
    got = [r["id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == sorted(appended)          # every row arrived
    assert len(got) == len(set(got)) == len(appended)  # exactly once
