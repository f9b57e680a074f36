"""Incremental IVF index: grow-by-batch semantics, idempotent ingest,
search correctness vs a restricted brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.plans import incremental_ann as A
from finalpipeline_spark.tables import load_table


def _vecs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_incremental_ann_lifecycle(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf")
    vecs = _vecs(spark, sf_dir)
    batch1 = vecs.filter(F.col("vec_id") % 2 == 0)
    batch2 = vecs.filter(F.col("vec_id") % 2 == 1)

    n1 = A.ingest_batch(spark, batch1, idx)
    assert n1 == batch1.count()

    # centroids frozen at founding: K rows
    cents = spark.read.parquet(idx + "/centroids")
    assert cents.count() == A.K_LISTS

    n2 = A.ingest_batch(spark, batch2, idx)
    assert n2 == batch2.count()

    # re-delivery is a no-op (the ledger property)
    assert A.ingest_batch(spark, batch2, idx) == 0
    postings = spark.read.parquet(idx + "/postings")
    assert postings.count() == vecs.count()
    # every vector indexed exactly once
    assert postings.select("vec_id").distinct().count() == vecs.count()

    queries = vecs.filter(F.col("vec_id") % 50 == 0)
    out = A.search(spark, queries, idx, nprobe=2, k=5).toPandas()
    assert (out.groupby("query_id").size() <= 5).all()
    assert len(out) > 0

    # search result == brute force restricted to the probed lists
    # (verify one query end-to-end)
    qid = int(out.query_id.iloc[0])
    got = out[out.query_id == qid].sort_values("rn")
    # recompute: which lists did this query probe?
    q = A._with_nrm(queries.filter(F.col("vec_id") == qid))
    cents_df = cents.select(
        "list_id", "centroid", F.col("nrm").alias("cnrm")
    )
    probed = (
        q.crossJoin(F.broadcast(cents_df))
        .withColumn("qcdot", A._dot("embedding", "centroid"))
        .orderBy(F.desc("qcdot"), "list_id")
        .limit(2)
        .select("list_id")
        .toPandas()
        .list_id.tolist()
    )
    brute = (
        postings.filter(F.col("list_id").isin(probed))
        .filter(F.col("vec_id") != qid)
        .crossJoin(
            q.select(
                F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
            )
        )
        .withColumn(
            "cosine",
            A._dot("q_emb", "embedding") / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(5)
        .toPandas()
    )
    assert list(got.neighbor_id) == list(brute.vec_id)


def test_search_prunes_to_probed_partitions(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf")
    A.ingest_batch(spark, _vecs(spark, sf_dir), idx)
    # list_id must be a physical partition column of the postings dir
    import os

    entries = os.listdir(idx + "/postings")
    assert any(e.startswith("list_id=") for e in entries)
