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
of the founding batch). Centroid drift does not affect correctness
(recall only): assignment and probe use the same frozen centroids —
but under distribution drift recall decays silently, so the plan also
maintains the repair loop:

  * every ingest records its mean quantization distance (the mean
    distance of the batch's vectors to their assigned centroids) in a
    tiny ``ingest_stats`` table — the drift signal, free at assignment
    time;
  * ``drift_ratio`` compares the latest batch's mean against the
    current epoch's founding batch — a ratio well above 1 means new
    data lands far from every centroid;
  * ``retrain`` (or ``maybe_retrain`` with a threshold) runs warm-
    started Lloyd rounds over the indexed corpus (optionally a sample —
    at 100 TB you train on a fraction and only the final reassignment
    touches everything), rewrites the postings under the new
    assignment, and ATOMICALLY swaps the index to the new epoch via a
    single pointer-file rename (``_index_state.json`` — the minimal
    form of the versioned commit protocol: monotone epochs, readers
    resolve through the pointer, old epoch dirs stay readable for
    in-flight searches).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finalpipeline_spark.operators.compaction import dir_exists

K_LISTS = 8
_STATE = "_index_state.json"


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )


def _with_nrm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("nrm", _dot(vec_col, vec_col))


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K-row centroid table,
    score per row, keep the argmin — a per-row map, no shuffle. Keeps
    the squared quantization distance (``dist``) for drift stats."""
    scored = vecs.crossJoin(
        F.broadcast(centroids.select("list_id", "centroid", F.col("nrm").alias("cnrm")))
    ).withColumn(
        "dist", F.col("nrm") - 2 * _dot("embedding", "centroid") + F.col("cnrm")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "list_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("list_id", "vec_id", "embedding", "nrm", "dist")
    )


def _state(index_path: str) -> dict:
    """Current epoch pointer. Legacy layout (no pointer file) is
    epoch 0 over the original dir names."""
    try:
        with open(os.path.join(index_path, _STATE)) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"epoch": 0, "centroids": "centroids", "postings": "postings"}


def _swap_state(index_path: str, state: dict) -> None:
    """Atomic epoch swap: temp-write + rename of the pointer file (the
    one mutation readers resolve through). Old epoch dirs are left in
    place — an in-flight search keeps reading a consistent index."""
    tmp = os.path.join(index_path, f".{_STATE}.tmp{state['epoch']}")
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, os.path.join(index_path, _STATE))


def _paths(index_path: str) -> tuple[str, str]:
    s = _state(index_path)
    return (
        f"{index_path}/{s['centroids']}",
        f"{index_path}/{s['postings']}",
    )


def _record_ingest(spark: SparkSession, index_path: str, epoch: int,
                   n: int, sum_dist: float) -> None:
    stats = spark.createDataFrame(
        [(epoch, float(time.time()), n, float(sum_dist))],
        "epoch int, ingested_at double, n bigint, sum_dist double",
    )
    stats.coalesce(1).write.mode("append").parquet(index_path + "/ingest_stats")


def ingest_batch(spark: SparkSession, new_vecs: DataFrame, index_path: str) -> int:
    """Add a batch of (vec_id, embedding) to the index; returns the
    number of vectors actually added (re-delivered vec_ids are skipped
    — idempotent like every ingest in this engine). Records the batch's
    mean quantization distance in ``ingest_stats`` (the drift signal
    ``drift_ratio``/``maybe_retrain`` act on)."""
    vecs = _with_nrm(
        new_vecs.select("vec_id", "embedding").dropDuplicates(["vec_id"])
    )

    cent_path, post_path = _paths(index_path)
    epoch = _state(index_path)["epoch"]
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
    # One pass: count + quantization-distance sum (tiny 1-row agg),
    # then the partitioned write.
    row = assigned.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dist").alias("sd")
    ).first()
    n_new = int(row["n"])
    if n_new:
        assigned.drop("dist").write.mode("append").partitionBy(
            "list_id"
        ).parquet(post_path)
        _record_ingest(spark, index_path, epoch, n_new, row["sd"] or 0.0)
    return n_new


def drift_ratio(spark: SparkSession, index_path: str) -> float:
    """Mean quantization distance of the LATEST ingested batch over the
    current epoch's FOUNDING batch — the drift signal. ~1.0 means new
    data still lands near the trained centroids; well above 1.0 means
    the distribution moved and recall is silently decaying. O(stats
    rows) — one tiny parquet read, no corpus scan."""
    if not dir_exists(spark, index_path + "/ingest_stats"):
        return 1.0
    epoch = _state(index_path)["epoch"]
    rows = (
        spark.read.parquet(index_path + "/ingest_stats")
        .filter(F.col("epoch") == epoch)
        .filter(F.col("n") > 0)
        .orderBy("ingested_at")
        .collect()  # bounded: one row per ingested batch
    )
    if len(rows) < 2:
        return 1.0
    first, last = rows[0], rows[-1]
    base = first["sum_dist"] / first["n"]
    cur = last["sum_dist"] / last["n"]
    return cur / base if base > 0 else 1.0


def _mean_centroids(assigned: DataFrame, old: DataFrame) -> DataFrame:
    """One Lloyd update: per-list per-dimension means (a K x DIM
    partial-sum shuffle — bounded by the centroid table, not the
    corpus); lists that captured no vectors keep their old centroid."""
    ex = assigned.select(
        "list_id", F.posexplode("embedding").alias("dim_i", "comp")
    )
    means = ex.groupBy("list_id", "dim_i").agg(
        F.avg(F.col("comp").cast("double")).alias("m")
    )
    fresh = (
        means.groupBy("list_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim_i", "m"))).alias("s"))
        .select("list_id", F.expr("transform(s, x -> x.m)").alias("centroid"))
    )
    merged = (
        old.select("list_id", F.col("centroid").alias("old_c"))
        .join(fresh, "list_id", "left")
        .select(
            "list_id", F.coalesce("centroid", "old_c").alias("centroid")
        )
    )
    return _with_nrm(merged, "centroid").select("list_id", "centroid", "nrm")


def _farthest_point_seeds(train: DataFrame, k: int) -> DataFrame:
    """Deterministic k-center init (greedy farthest-point traversal):
    start from the lowest vec_id, then k-1 times take the vector
    farthest from its nearest chosen seed. For well-separated clusters
    this provably covers each cluster before refining — the property a
    DRIFT retrain needs (warm-starting from the old centroids cannot
    escape the local optimum where new-region structure stays invisible
    to them). Cost: k bounded passes over the (sampled) training set,
    each a broadcast map + 1-row argmax — no shuffle."""
    seeds = train.orderBy("vec_id").limit(1).select(
        F.lit(1).cast("int").alias("list_id"),
        F.col("embedding").alias("centroid"),
        "nrm",
    )
    for i in range(2, k + 1):
        cand = (
            train.crossJoin(
                F.broadcast(
                    seeds.select(
                        F.col("centroid").alias("s_c"),
                        F.col("nrm").alias("s_nrm"),
                    )
                )
            )
            .withColumn(
                "d", F.col("nrm") - 2 * _dot("embedding", "s_c") + F.col("s_nrm")
            )
            .groupBy("vec_id", "embedding", "nrm")
            .agg(F.min("d").alias("dmin"))
            .orderBy(F.desc("dmin"), "vec_id")
            .limit(1)
            .select(
                F.lit(i).cast("int").alias("list_id"),
                F.col("embedding").alias("centroid"),
                "nrm",
            )
        )
        seeds = seeds.unionByName(cand).localCheckpoint(eager=True)
    return seeds


def retrain(
    spark: SparkSession,
    index_path: str,
    rounds: int = 3,
    sample_fraction: float = 1.0,
    init: str = "farthest",
) -> dict:
    """Drift-amortized re-train: re-seed centroids from the CURRENT
    corpus (``init="farthest"`` — deterministic greedy k-center, which
    covers drifted regions the old centroids never saw; ``init="warm"``
    refines the existing centroids for mild drift), run Lloyd rounds,
    reassign every posting under the new centroids, then ATOMICALLY
    swap the index to the new epoch.

    Scale shape: each Lloyd round is the broadcast-assign map plus a
    K x DIM partial-sum shuffle; ``sample_fraction < 1`` trains the
    init and rounds on a deterministic sample (at 100 TB you never
    Lloyd the full corpus) — only the FINAL reassignment write touches
    every posting, and that rewrite is the point of the retrain. The
    swap is one pointer-file rename: searches racing it read a
    consistent old or new epoch, never a mix, and re-ingest of any
    batch remains idempotent because vec_ids carry over."""
    cent_path, post_path = _paths(index_path)
    state = _state(index_path)
    vecs = spark.read.parquet(post_path).select("vec_id", "embedding", "nrm")
    train = (
        vecs.sample(fraction=sample_fraction, seed=7)
        if sample_fraction < 1.0
        else vecs
    )
    train = train.persist()
    try:
        if init == "farthest":
            centroids = _farthest_point_seeds(train, K_LISTS)
        elif init == "warm":
            centroids = spark.read.parquet(cent_path)
        else:
            raise ValueError(f"unknown init {init!r}: 'farthest' or 'warm'")
        for _ in range(max(1, rounds)):
            centroids = _mean_centroids(_assign(train, centroids), centroids)
        epoch = state["epoch"] + 1
        new_cent = f"centroids_e{epoch}"
        new_post = f"postings_e{epoch}"
        centroids.coalesce(1).write.parquet(f"{index_path}/{new_cent}")
        final_cent = spark.read.parquet(f"{index_path}/{new_cent}")
        final = _assign(vecs, final_cent).persist()
        final.drop("dist").write.partitionBy("list_id").parquet(
            f"{index_path}/{new_post}"
        )
        # the retrained quantization distance seeds the new epoch's
        # drift baseline, so drift_ratio is meaningful immediately
        row = final.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("sd")
        ).first()
        final.unpersist()
    finally:
        train.unpersist()
    _swap_state(
        index_path,
        {"epoch": epoch, "centroids": new_cent, "postings": new_post},
    )
    if int(row["n"]):
        _record_ingest(spark, index_path, epoch, int(row["n"]), row["sd"] or 0.0)
    return {"epoch": epoch, "n_vectors": int(row["n"])}


def maybe_retrain(
    spark: SparkSession,
    index_path: str,
    factor: float = 1.5,
    rounds: int = 3,
    sample_fraction: float = 1.0,
) -> bool:
    """Retrain iff the drift signal crossed ``factor`` (latest batch's
    mean quantization distance vs the epoch's founding batch). The
    check is O(stats); the retrain is the amortized O(corpus) repair."""
    if drift_ratio(spark, index_path) < factor:
        return False
    retrain(spark, index_path, rounds=rounds, sample_fraction=sample_fraction)
    return True


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
    cent_path, post_path = _paths(index_path)
    centroids = spark.read.parquet(cent_path)
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
    postings = spark.read.parquet(post_path)
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
