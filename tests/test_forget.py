"""Deletion propagation: every derived asset scrubbed, atomic, and
idempotent; partitioned assets rewrite only hit partitions; the
tombstone ledger replays after a partial crash."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finalpipeline_spark.plans import forget as FG
from finalpipeline_spark.plans import incremental_ann as A
from finalpipeline_spark.plans import incremental_dedup as IDD
from finalpipeline_spark.tables import load_table


def test_forget_propagates_across_assets(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    corpus = str(tmp_path / "corpus")
    dedup_idx = str(tmp_path / "lsh")
    ann_idx = str(tmp_path / "ivf")

    IDD.dedup_batch(spark, docs, dedup_idx).write.parquet(corpus)
    A.ingest_batch(spark, vecs, ann_idx)

    doomed = spark.createDataFrame([(i,) for i in range(0, 50, 7)], ["doc_id"])
    doomed_ids = {r.doc_id for r in doomed.collect()}

    assets = [
        (corpus, "doc_id"),
        (dedup_idx + "/bands", "doc_id"),
        (dedup_idx + "/shingles", "doc_id"),
        (ann_idx + "/postings", "vec_id", "list_id"),
    ]
    removed = FG.forget(
        spark, doomed, assets, ledger_path=str(tmp_path / "tombstones")
    )
    assert removed[corpus] > 0
    assert removed[ann_idx + "/postings"] > 0

    for path, key_col, *_ in assets:
        left = (
            spark.read.parquet(path)
            .filter(F.col(key_col).isin(list(doomed_ids)))
            .count()
        )
        assert left == 0, path

    # idempotent: second delivery removes nothing
    again = FG.forget(
        spark, doomed, assets, ledger_path=str(tmp_path / "tombstones")
    )
    assert all(v == 0 for v in again.values())

    # non-tombstoned rows survived
    assert spark.read.parquet(corpus).count() > 0
    assert spark.read.parquet(ann_idx + "/postings").count() > 0


def test_partitioned_forget_rewrites_only_hit_partitions(spark, sf_dir, tmp_path):
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ann_idx = str(tmp_path / "ivf")
    A.ingest_batch(spark, vecs, ann_idx)
    post = ann_idx + "/postings"

    # pick one vector; find its list; snapshot other partitions' files
    victim = spark.read.parquet(post).limit(1).collect()[0]
    other_parts = {
        e: sorted(os.listdir(os.path.join(post, e)))
        for e in os.listdir(post)
        if e.startswith("list_id=") and e != f"list_id={victim.list_id}"
    }
    ids = spark.createDataFrame([(victim.vec_id,)], ["vec_id"])
    n = FG.forget_asset(spark, ids, post, "vec_id", partition_col="list_id")
    assert n == 1
    after = {
        e: sorted(os.listdir(os.path.join(post, e)))
        for e in os.listdir(post)
        if e.startswith("list_id=") and e != f"list_id={victim.list_id}"
    }
    assert after == other_parts  # untouched partitions keep their files


def test_forget_from_ledger_replays(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    ledger = str(tmp_path / "tombstones")
    doomed = spark.createDataFrame([(3,), (9,)], ["doc_id"])

    # simulate: tombstones recorded, but the asset scrub crashed
    doomed.selectExpr("doc_id as key").write.parquet(ledger)
    res = FG.forget_from_ledger(spark, ledger, [(corpus, "doc_id")])
    assert res[corpus] == 2
    assert (
        spark.read.parquet(corpus).filter(F.col("doc_id").isin([3, 9])).count()
        == 0
    )
    # replay is a no-op
    assert FG.forget_from_ledger(spark, ledger, [(corpus, "doc_id")])[corpus] == 0
