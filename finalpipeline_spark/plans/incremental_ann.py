"""Incremental ANN index maintenance: grow an IVF index batch by batch.

The batch queries (emb_ivf_topk, emb_ivf_pq_topk) build their index
in-plan — right for a one-shot job, wrong for a production corpus that
receives embedding batches continuously: re-deriving centroids and
re-scanning the corpus per batch is O(corpus), and at 100 TB the index
IS the asset. This plan persists the two IVF state tables and maintains
them per batch:

  /centroids  (list_id, centroid: array<double>, nrm)   — tiny, broadcast
  /postings   (list_id=…/ partitioned; vec_id, embedding, nrm)

Per batch: assign each new vector to its nearest centroid (one
broadcast join + per-row dot products — no shuffle of the batch beyond
the partitioned write), anti-join against already-indexed vec_ids so
re-delivery is a no-op (the ledger property, like the medallion), and
append to the matching list partitions. Searches probe nprobe lists
and read ONLY those partitions — `list_id` is the physical partition
key, so the scan prunes to ~nprobe/nlist of the data.

Centroids are fixed at first build (deterministic: the K lowest vec_ids
of the founding batch) — the standard production compromise: retrain
offline when drift accumulates; never mutate synchronously. Centroid
drift does not affect correctness (recall only): assignment and probe
use the same frozen centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finalpipeline_spark.operators.compaction import dir_exists

K_LISTS = 8


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def _with_nrm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("nrm", _dot(vec_col, vec_col))


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K-row centroid table,
    score per row, keep the argmin — a per-row map, no shuffle."""
    scored = vecs.crossJoin(
        F.broadcast(centroids.select("list_id", "centroid", F.col("nrm").alias("cnrm")))
    ).withColumn(
        "dist", F.col("nrm") - 2 * _dot("embedding", "centroid") + F.col("cnrm")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "list_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("list_id", "vec_id", "embedding", "nrm")
    )


def ingest_batch(spark: SparkSession, new_vecs: DataFrame, index_path: str) -> int:
    """Add a batch of (vec_id, embedding) to the index; returns the
    number of vectors actually added (re-delivered vec_ids are skipped
    — idempotent like every ingest in this engine)."""
    vecs = _with_nrm(
        new_vecs.select("vec_id", "embedding").dropDuplicates(["vec_id"])
    )

    cent_path = index_path + "/centroids"
    post_path = index_path + "/postings"
    if not dir_exists(spark, cent_path):
        # Founding batch: deterministic seed centroids (K lowest ids).
        seeds = (
            vecs.orderBy("vec_id")
            .limit(K_LISTS)
            .select(
                F.row_number()
                .over(Window.orderBy("vec_id"))
                .cast("int")
                .alias("list_id"),
                F.col("embedding").alias("centroid"),
                "nrm",
            )
        )
        seeds.write.parquet(cent_path)

    centroids = spark.read.parquet(cent_path)

    if dir_exists(spark, post_path):
        seen = spark.read.parquet(post_path).select("vec_id")
        vecs = vecs.join(seen, "vec_id", "left_anti")

    assigned = _assign(vecs, centroids)
    # Count BEFORE the write consumes the plan; ids-only, small.
    n_new = assigned.count()
    if n_new:
        assigned.write.mode("append").partitionBy("list_id").parquet(post_path)
    return n_new


def search(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF search against the persisted index: probe each query's
    ``nprobe`` nearest lists, scan only those posting partitions,
    exact-score within them, top-k per query.

    Scale shape: the probe set is |queries| x nprobe list ids; the
    postings read prunes to those partitions (list_id is the physical
    partition column), so the scan is ~nprobe/nlist of the corpus.
    """
    centroids = spark.read.parquet(index_path + "/centroids")
    q = _with_nrm(queries.select("vec_id", "embedding")).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    probe = (
        q.crossJoin(
            F.broadcast(
                centroids.select("list_id", "centroid", F.col("nrm").alias("cnrm"))
            )
        )
        .withColumn("qcdot", _dot("q_emb", "centroid"))
        .withColumn(
            "pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("qcdot"), F.col("list_id")
                )
            ),
        )
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", "list_id")
    )
    postings = spark.read.parquet(index_path + "/postings")
    scored = (
        probe.join(postings, "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot("q_emb", "embedding") / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rn")
    )
