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
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finalpipeline_spark.functions.frames import local_df
from finalpipeline_spark.operators.compaction import dir_exists

K_LISTS = 8
_STATE = "_index_state.json"


def _append_atomic(
    df: DataFrame, target: str, partition_col: str | None = None
) -> None:
    """Concurrent-safe append into a shared parquet directory.

    Spark's ``mode("append")`` stages every job's output under ONE
    ``_temporary/0`` scratch dir inside the target path, so two DRIVER
    PROCESSES appending the same postings/stats dir race their
    committers — the first commit deletes the other's scratch
    (observed cross-JVM by tests/test_ann_multiprocess.py as
    ``FileNotFoundException: .../_temporary/0``). Instead each append
    writes to a PRIVATE staging dir and moves the finished data files
    in with ``os.rename`` — atomic per file, and task-UUID file names
    make collisions impossible. Readers list whole files only.
    The index root is already required to be locally mounted (the
    epoch pointer uses ``open``/``os.replace`` — see ``_state`` /
    ``_swap_state``), so plain os renames are the right primitive; an
    object-store deployment would swap this seam for a conditional
    put, exactly like the versioned log's documented S3 caveat."""
    base = os.path.dirname(target.rstrip("/"))
    stage = os.path.join(base, f".stage-{uuid.uuid4().hex}")
    try:
        w = df.write
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(stage)
        for dirpath, _dirs, files in os.walk(stage):
            rel = os.path.relpath(dirpath, stage)
            dst_dir = target if rel == "." else os.path.join(target, rel)
            moved_any = False
            for name in files:
                if name.startswith(("_", ".")):
                    continue  # committer lint (_SUCCESS, .crc)
                if not moved_any:
                    os.makedirs(dst_dir, exist_ok=True)
                    moved_any = True
                os.rename(
                    os.path.join(dirpath, name), os.path.join(dst_dir, name)
                )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


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


def _paths(index_path: str, s: dict | None = None) -> tuple[str, str]:
    s = s if s is not None else _state(index_path)
    return (
        f"{index_path}/{s['centroids']}",
        f"{index_path}/{s['postings']}",
    )


def _next_seq(spark: SparkSession, index_path: str, epoch: int) -> int:
    """Monotone per-epoch batch sequence number: the count of stats
    rows already recorded for the epoch. Wall-clock timestamps are NOT
    the ordering key — clock skew between driver processes could
    reorder them and make drift_ratio compare the wrong batches."""
    if not dir_exists(spark, index_path + "/ingest_stats"):
        return 0
    return (
        spark.read.parquet(index_path + "/ingest_stats")
        .filter(F.col("epoch") == epoch)
        .count()
    )


def _record_ingest(spark: SparkSession, index_path: str, epoch: int,
                   n: int, sum_dist: float) -> None:
    stats = local_df(
        spark,
        [(
            epoch,
            _next_seq(spark, index_path, epoch),
            float(time.time()),  # advisory only — ordering uses seq
            n,
            float(sum_dist),
        )],
        "epoch int, seq bigint, ingested_at double, n bigint, sum_dist double",
    )
    _append_atomic(stats.coalesce(1), index_path + "/ingest_stats")


def ingest_batch(spark: SparkSession, new_vecs: DataFrame, index_path: str) -> int:
    """Add a batch of (vec_id, embedding) to the index; returns the
    number of vectors actually added (re-delivered vec_ids are skipped
    — idempotent like every ingest in this engine). Records the batch's
    mean quantization distance in ``ingest_stats`` (the drift signal
    ``drift_ratio``/``maybe_retrain`` act on).

    Concurrency: the epoch pointer is read ONCE per attempt and both
    the data paths and the recorded epoch derive from that same
    snapshot — a racing ``retrain`` swap can never make this ingest
    record stats under a mismatched epoch/paths pair. An ingest that
    lands in the OLD epoch before a retrain's corpus snapshot rides
    the rewrite; one that lands after it is recovered by the retrain's
    post-swap catch-up pass (see ``retrain``). An ingest that
    STRADDLES the swap itself — pointer read pre-swap, postings write
    completing after the catch-up scan — is closed by the post-write
    re-check here: after writing, the pointer is read again, and if
    the epoch moved the batch re-ingests into the live epoch (the
    vec_id anti-join makes every retry exactly-once, and depth is
    bounded by the number of concurrent retrains). Ordering argument:
    either the swap precedes this re-check (we retry into the new
    epoch) or it follows the completed write (the catch-up scan,
    which runs after the swap, sees the rows). Proven cross-JVM by
    tests/test_ann_multiprocess.py."""
    vecs = _with_nrm(
        new_vecs.select("vec_id", "embedding").dropDuplicates(["vec_id"])
    )

    n_landed = 0
    while True:
        state = _state(index_path)
        cent_path, post_path = _paths(index_path, state)
        epoch = state["epoch"]
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

        batch = vecs
        if dir_exists(spark, post_path):
            seen = spark.read.parquet(post_path).select("vec_id")
            batch = batch.join(seen, "vec_id", "left_anti")

        assigned = _assign(batch, centroids)
        # One pass: count + quantization-distance sum (tiny 1-row agg),
        # then the partitioned write.
        row = assigned.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("sd")
        ).first()
        n_new = int(row["n"])
        if not n_new:
            # nothing missing from the CURRENT epoch — either all
            # duplicates, or a prior attempt's rows were carried over
            # by the retrain/catch-up
            return n_landed
        assigned = assigned.localCheckpoint(eager=True)
        _append_atomic(assigned.drop("dist"), post_path, "list_id")
        pq = state.get("pq")
        if pq:
            # PQ layer enabled: encode the batch with the SAME epoch's
            # codebooks and append to its codes table (partitioned by
            # list_id like the postings, so ADC scans prune identically)
            cb = spark.read.parquet(f"{index_path}/{pq['codebooks']}")
            _append_atomic(
                _pq_encode(assigned, cb, pq["m"]),
                f"{index_path}/{pq['codes']}",
                "list_id",
            )
        _record_ingest(spark, index_path, epoch, n_new, row["sd"] or 0.0)
        n_landed = max(n_landed, n_new)
        post_state = _state(index_path)
        if (
            post_state["epoch"] == epoch
            and post_state["postings"] == state["postings"]
        ):
            return n_landed
        # a retrain swapped the epoch under this write: it may have
        # landed in the dead epoch after the catch-up scan — retry
        # into the live epoch (anti-join keeps it exactly-once)


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
        # the monotone per-epoch sequence number, NOT wall-clock time:
        # clock skew between driver processes could reorder timestamps
        # and compare the wrong batches
        .orderBy("seq")
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
    batch remains idempotent because vec_ids carry over.

    A batch ingested into the OLD epoch between this function's corpus
    snapshot and its pointer swap is NOT lost: after the swap a
    catch-up pass re-reads the old epoch's postings, anti-joins the
    new epoch's, and re-ingests anything missing under the new
    centroids (and codebooks). An ingest STRADDLING the swap itself is
    closed on the ingest side — its post-write epoch re-check retries
    the batch into the live epoch (see ``ingest_batch``; proven
    cross-JVM by tests/test_ann_multiprocess.py)."""
    state = _state(index_path)
    cent_path, post_path = _paths(index_path, state)
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
        new_state = {"epoch": epoch, "centroids": new_cent, "postings": new_post}
        pq = state.get("pq")
        if pq:
            # the PQ layer rides the SAME atomic swap: retrain the
            # per-subspace codebooks on the reassigned corpus (the old
            # codebooks quantize drifted data terribly — exactly the
            # signal that fired this retrain), then re-encode every
            # vector into the new epoch's codes table
            new_cb_name = f"pq_codebooks_e{epoch}"
            new_codes_name = f"pq_codes_e{epoch}"
            cb = _pq_train_codebooks(
                final.select("vec_id", "embedding"), pq["m"], pq["k"],
                rounds=rounds,
            )
            cb.coalesce(1).write.parquet(f"{index_path}/{new_cb_name}")
            cb_read = spark.read.parquet(f"{index_path}/{new_cb_name}")
            _pq_encode(final, cb_read, pq["m"]).write.partitionBy(
                "list_id"
            ).parquet(f"{index_path}/{new_codes_name}")
            new_state["pq"] = {
                **pq, "codebooks": new_cb_name, "codes": new_codes_name,
            }
        # the retrained quantization distance seeds the new epoch's
        # drift baseline, so drift_ratio is meaningful immediately
        row = final.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("sd")
        ).first()
        final.unpersist()
    finally:
        train.unpersist()
    _swap_state(index_path, new_state)
    if int(row["n"]):
        _record_ingest(spark, index_path, epoch, int(row["n"]), row["sd"] or 0.0)
    # Catch-up: a batch ingested into the OLD epoch after this
    # retrain's corpus snapshot is absent from the rewrite — re-ingest
    # anything in the old postings the new epoch lacks (a vec_id-keyed
    # anti-join; empty in the single-writer case, bounded by the
    # straggler batch otherwise).
    stragglers = (
        spark.read.parquet(post_path)
        .select("vec_id", "embedding")
        .join(
            spark.read.parquet(f"{index_path}/{new_post}").select("vec_id"),
            "vec_id",
            "left_anti",
        )
    )
    n_caught = ingest_batch(spark, stragglers, index_path)
    return {
        "epoch": epoch,
        "n_vectors": int(row["n"]) + n_caught,
        "n_caught_up": n_caught,
    }


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


# -- PQ layer: per-epoch codebooks + ADC search ------------------------------
#
# Product quantization under the IVF index (the IVF-PQ shape, Jégou et
# al.): each vector is split into m contiguous subvectors, each encoded
# as the id of its nearest entry in that subspace's k-entry codebook —
# m small ints per vector instead of dim floats. The codebooks and the
# codes table are EPOCH STATE exactly like the coarse centroids: a
# drift retrain re-trains them on the reassigned corpus and the whole
# trio (centroids, postings, codebooks+codes) swaps in one atomic
# pointer rename — stale codebooks quantize drifted data terribly, so
# leaving them static while the centroids move would silently cap ADC
# recall (the gap this closes vs the query-side literals in
# queries/curation.py emb_pq_encode/emb_ivf_pq_topk).


def _pq_subvecs(df: DataFrame, m: int) -> DataFrame:
    """(vec_id [, list_id], s, sv, svnrm) — one row per subvector; a
    row-local explode, no shuffle."""
    keep = [c for c in ("vec_id", "list_id") if c in df.columns]
    sub = (
        df.select(
            *keep,
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
            "embedding",
        )
        .withColumn(
            "sv",
            F.expr(
                f"slice(embedding, s * (size(embedding) div {m}) + 1,"
                f" size(embedding) div {m})"
            ),
        )
        .drop("embedding")
    )
    return sub.withColumn("svnrm", _dot("sv", "sv"))


def _pq_assign(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest-codebook-entry per (vec_id, s): broadcast the m*k-row
    codebook, join on the subspace, keep the argmin."""
    scored = sub.join(
        F.broadcast(
            cb.select(
                "s", "code", F.col("cv").alias("c_cv"), F.col("cnrm").alias("c_cnrm")
            )
        ),
        "s",
    ).withColumn(
        "dist", F.col("svnrm") - 2 * _dot("sv", "c_cv") + F.col("c_cnrm")
    )
    w = Window.partitionBy("vec_id", "s").orderBy("dist", "code")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "c_cv", "c_cnrm")
    )


def _pq_train_codebooks(
    vecs: DataFrame, m: int, k: int, rounds: int = 2
) -> DataFrame:
    """Per-subspace k-means codebooks (s, code, cv, cnrm): deterministic
    init (the k lowest vec_ids' subvectors per subspace), then Lloyd
    rounds — every round is one broadcast assign plus an (m*k) x subdim
    partial-sum shuffle, bounded by the codebook not the corpus."""
    sub = _pq_subvecs(vecs, m).persist()
    try:
        w = Window.partitionBy("s").orderBy("vec_id")
        cb = (
            sub.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(
                "s",
                F.col("rn").cast("int").alias("code"),
                F.col("sv").alias("cv"),
                F.col("svnrm").alias("cnrm"),
            )
        )
        for _ in range(max(0, rounds)):
            asg = _pq_assign(sub, cb)
            ex = asg.select(
                "s", "code", F.posexplode("sv").alias("dim_i", "comp")
            )
            means = ex.groupBy("s", "code", "dim_i").agg(
                F.avg(F.col("comp").cast("double")).alias("mcomp")
            )
            fresh = (
                means.groupBy("s", "code")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("dim_i", "mcomp"))
                    ).alias("pairs")
                )
                .select(
                    "s",
                    "code",
                    F.expr("transform(pairs, x -> x.mcomp)").alias("cv"),
                )
            )
            cb = (
                cb.select("s", "code", F.col("cv").alias("old_cv"))
                .join(fresh, ["s", "code"], "left")
                .select(
                    "s", "code", F.coalesce("cv", "old_cv").alias("cv")
                )
                .withColumn("cnrm", _dot("cv", "cv"))
                .localCheckpoint(eager=True)
            )
        return cb
    finally:
        sub.unpersist()


def _pq_encode(assigned: DataFrame, cb: DataFrame, m: int) -> DataFrame:
    """(list_id, vec_id, codes array<int>) for a batch that already
    carries its list assignment — the codes table rides the same
    list_id partitioning as the postings so ADC scans prune
    identically."""
    asg = _pq_assign(_pq_subvecs(assigned, m), cb)
    return (
        asg.groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("s", "code"))).alias("pairs")
        )
        .select(
            "vec_id", F.expr("transform(pairs, x -> x.code)").alias("codes")
        )
        .join(assigned.select("vec_id", "list_id"), "vec_id")
        .select("list_id", "vec_id", "codes")
    )


def enable_pq(
    spark: SparkSession,
    index_path: str,
    m: int = 4,
    k: int = 8,
    rounds: int = 2,
) -> dict:
    """Add the PQ layer to an existing index: train per-subspace
    codebooks on the current epoch's corpus, encode every indexed
    vector, and publish both through the same atomic pointer swap the
    epoch machinery uses. Subsequent ingests encode their batches with
    the live codebooks; retrains re-train and re-encode."""
    state = _state(index_path)
    _, post_path = _paths(index_path, state)
    epoch = state["epoch"]
    vecs = spark.read.parquet(post_path).select(
        "list_id", "vec_id", "embedding"
    )
    cb_name = f"pq_codebooks_e{epoch}"
    codes_name = f"pq_codes_e{epoch}"
    cb = _pq_train_codebooks(
        vecs.select("vec_id", "embedding"), m, k, rounds=rounds
    )
    cb.coalesce(1).write.parquet(f"{index_path}/{cb_name}")
    cb_read = spark.read.parquet(f"{index_path}/{cb_name}")
    _pq_encode(vecs, cb_read, m).write.partitionBy("list_id").parquet(
        f"{index_path}/{codes_name}"
    )
    new_state = {
        **state,
        "pq": {"m": m, "k": k, "codebooks": cb_name, "codes": codes_name},
    }
    _swap_state(index_path, new_state)
    return new_state["pq"]


def search_adc(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    nprobe: int = 2,
    k: int = 5,
    rescore: int = 4,
) -> DataFrame:
    """IVF-PQ search with asymmetric distance computation: probe each
    query's ``nprobe`` lists, rank candidates by table-lookup PQ
    distance over the CODES (m ints per vector — the only per-vector
    data the first pass touches), keep ``rescore * k`` per query, then
    exact-rescore just those against the postings.

    Scale shape: the distance tables are |queries| x m x k rows
    (broadcastable); the codes scan prunes to the probed list_id
    partitions and reads m ints per vector instead of dim floats —
    the memory-bandwidth win that makes PQ worth its recall cost at
    100 TB; the exact pass touches only rescore*k rows per query."""
    state = _state(index_path)
    pq = state.get("pq")
    if not pq:
        raise ValueError(
            f"index at {index_path} has no PQ layer — call enable_pq first"
        )
    cent_path, post_path = _paths(index_path, state)
    centroids = spark.read.parquet(cent_path)
    cb = spark.read.parquet(f"{index_path}/{pq['codebooks']}")
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
        .select("query_id", "list_id")
    )
    # per-query distance tables: partial distance of each query
    # subvector to every codebook entry
    qsub = _pq_subvecs(
        q.select(
            F.col("query_id").alias("vec_id"),
            F.col("q_emb").alias("embedding"),
        ),
        pq["m"],
    )
    dtab = (
        qsub.join(F.broadcast(cb), "s")
        .withColumn(
            "pd", F.col("svnrm") - 2 * _dot("sv", "cv") + F.col("cnrm")
        )
        .select(F.col("vec_id").alias("query_id"), "s", "code", "pd")
    )
    codes = spark.read.parquet(f"{index_path}/{pq['codes']}")
    cand = (
        probe.join(codes, "list_id")  # prunes to probed partitions
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "list_id", "vec_id",
            F.posexplode("codes").alias("s", "code"),
        )
        .join(dtab, ["query_id", "s", "code"])
        .groupBy("query_id", "list_id", "vec_id")
        .agg(F.sum("pd").alias("adist"))
    )
    wc = Window.partitionBy("query_id").orderBy("adist", "vec_id")
    shortlist = (
        cand.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= rescore * k)
        .select("query_id", "list_id", "vec_id")
    )
    postings = spark.read.parquet(post_path)
    exact = (
        shortlist.join(postings, ["list_id", "vec_id"])
        .join(q, "query_id")
        .withColumn(
            "cosine",
            _dot("q_emb", "embedding") / F.sqrt(F.col("q_nrm") * F.col("nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rn")
    )
