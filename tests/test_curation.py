"""Property tests for the curation/ANN-training operators beyond the
oracle-differential suite: structural invariants and the determinism
claims the docstrings make (hash sampling survives repartitioning,
PQ codes are in range, k-means emits exactly K x DIM centroids)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.queries import curation as C
from finalpipeline_spark.queries import embeddings as E
from finalpipeline_spark.tables import load_table


def test_weighted_sample_deterministic_across_partitionings(spark, sf_dir):
    a = C.doc_quality_weighted_sample(spark, sf_dir)
    kept_a = {r.doc_id for r in a.select("doc_id").collect()}
    # Re-run with the source shuffled into a different partitioning:
    # the content-addressed decision must be identical (rand() is not).
    load_table(spark, sf_dir, "documents").repartition(13).createOrReplaceTempView(
        C.SPARK_VIEW
    )
    from finalpipeline_spark.functions import dialect as D

    b = spark.sql(C._weighted_sample_sql(D.SPARK))
    kept_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert kept_a == kept_b
    assert 0 < len(kept_a)  # keeps something...
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(kept_a) < n_docs  # ...but not everything


def test_weighted_sample_u_bounds(spark, sf_dir):
    df = C.doc_quality_weighted_sample(spark, sf_dir)
    bad = df.filter(
        (F.col("sample_u") < 0)
        | (F.col("sample_u") >= 1)
        | (F.col("sample_u") >= F.col("quality_score"))
    )
    assert bad.count() == 0


def test_pq_codes_in_range_and_total(spark, sf_dir):
    df = C.emb_pq_encode(spark, sf_dir).cache()
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert df.count() == n_vec
    for s in range(C._PQ_M):
        col = f"code_{s}"
        bad = df.filter((F.col(col) < 0) | (F.col(col) >= C._PQ_CODES))
        assert bad.count() == 0, col
    # Seed rows encode to themselves => zero reconstruction error.
    seeds = df.filter(F.col("vec_id") < C._PQ_CODES)
    assert seeds.filter(F.col("recon_err") > 1e-9).count() == 0
    assert df.filter(F.col("recon_err") < 0).count() == 0
    df.unpersist()


def test_kmeans_emits_k_by_dim_and_partitions_corpus(spark, sf_dir):
    df = C.emb_kmeans_lloyd(spark, sf_dir).cache()
    rows = df.count()
    n_centroids = df.select("cid").distinct().count()
    assert n_centroids <= C._KM_K
    assert rows == n_centroids * E.DIM
    # Every centroid carries a constant cluster size across its dims,
    # and the sizes sum to the corpus.
    per_cid = df.groupBy("cid").agg(
        F.countDistinct("n_vectors").alias("nsizes"),
        F.first("n_vectors").alias("size"),
    )
    assert per_cid.filter(F.col("nsizes") != 1).count() == 0
    total = per_cid.agg(F.sum("size")).first()[0]
    assert total == load_table(spark, sf_dir, "embeddings").count()
    df.unpersist()


def test_lm_cross_entropy_bounds(spark, sf_dir):
    df = C.doc_lm_perplexity(spark, sf_dir).cache()
    # H is bounded by [0, ln(total)]; equality only for degenerate docs.
    total = (
        C.load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")))
        .count()
    )
    import math

    hmax = math.log(total) + 1e-9
    assert df.filter((F.col("cross_entropy") < 0) | (F.col("cross_entropy") > hmax)).count() == 0
    df.unpersist()


def test_dedup_lsh_recall_consistency(spark, sf_dir):
    row = C.doc_dedup_lsh_recall(spark, sf_dir).first()
    assert row.n_hit <= row.n_exact
    assert row.n_hit <= row.n_lsh
    assert 0.0 <= row.recall <= 1.0
