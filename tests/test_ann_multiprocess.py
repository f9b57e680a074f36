"""Cross-PROCESS ANN maintenance soak: one driver ingesting batches in
a loop while another driver retrains/epoch-swaps the SAME index.

Every other ANN concurrency test runs ingest and retrain from one
SparkSession; at scale the realistic contention is two independent
maintenance drivers (an ingest job and a periodic retrain job) sharing
an index root, where the only coordination is the atomic epoch-pointer
rename plus ingest's post-write epoch re-check and retrain's post-swap
catch-up pass (plans/incremental_ann.py ingest_batch/retrain). This
soak proves that protocol cross-JVM, the same treatment the commit
protocol gets in test_multiprocess_commits.py: after both drivers
finish, NO ingested vector may be missing from the live epoch, and an
all-lists search must equal brute force over the live postings."""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finalpipeline_spark.plans import incremental_ann as A

# Deterministic synthetic vectors: each process generates its OWN id
# range, so cross-JVM float determinism is never relied on — the
# parent's assertions read embeddings back from the index itself.
_SYNTH_ID = "id as vec_id"
_SYNTH_EMB = (
    "array("
    "cast(sin(id) * 100 as float), cast(cos(id) * 100 as float), "
    "cast(sin(id * 0.3) * 50 as float), cast(cos(id * 0.7) * 50 as float)"
    ") as embedding"
)

_INGESTER = rf"""
import sys, time
sys.path.insert(0, ".")
idx = sys.argv[1]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("ann-ingester")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.plans import incremental_ann as A
for step in range(5):
    lo = 1000 + 200 * step
    batch = spark.range(lo, lo + 200).selectExpr("{_SYNTH_ID}", "{_SYNTH_EMB}")
    A.ingest_batch(spark, batch, idx)
print("INGEST-OK")
"""

_RETRAINER = r"""
import sys, time
sys.path.insert(0, ".")
idx = sys.argv[1]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("ann-retrainer")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.plans import incremental_ann as A
for i in range(3):
    info = A.retrain(spark, idx, rounds=1)
    print("RETRAIN", i, info["epoch"], info["n_caught_up"], flush=True)
    time.sleep(0.5)
print("RETRAIN-OK")
"""


def test_cross_process_ingest_vs_retrain(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    # founding batch from the parent so both workers start on a live
    # index (founding is the one non-concurrent step by design)
    A.ingest_batch(
        spark, spark.range(0, 400).selectExpr(_SYNTH_ID, _SYNTH_EMB), idx
    )

    env = {**os.environ, "PYTHONPATH": "."}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", src, idx],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for src in (_INGESTER, _RETRAINER)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
    for out, tag in zip(outs, ("INGEST-OK", "RETRAIN-OK")):
        assert tag in out, out[-4000:]

    # every ingested vector is in the LIVE epoch exactly once — the
    # post-write epoch re-check + the retrain catch-up pass may both
    # fire, but idempotent anti-joins make the union exactly-once
    _cent, post_path = A._paths(idx)
    live = spark.read.parquet(post_path)
    expect = set(range(0, 400)) | set(range(1000, 2000))
    got = {r.vec_id for r in live.select("vec_id").collect()}
    assert got == expect, (
        f"lost={sorted(expect - got)[:10]} extra={sorted(got - expect)[:10]}"
    )
    assert live.count() == len(expect)  # no duplicates either

    # all-lists search ≡ brute force over the live postings (exact,
    # same deterministic tiebreak)
    queries = spark.range(0, 2000, 97).selectExpr(_SYNTH_ID, _SYNTH_EMB)
    out = A.search(spark, queries, idx, nprobe=A.K_LISTS, k=5)
    q = A._with_nrm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    brute = (
        q.crossJoin(live)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            A._dot("q_emb", "embedding")
            / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rn")
    )
    got_rows = sorted(
        (r.query_id, r.neighbor_id, r.rn) for r in out.collect()
    )
    brute_rows = sorted(
        (r.query_id, r.neighbor_id, r.rn) for r in brute.collect()
    )
    assert got_rows == brute_rows
