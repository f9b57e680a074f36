"""Incremental corpus dedup against a persisted MinHash band index.

Batch near-dup queries (doc_dedup_minhash_lsh) answer "which pairs in
this corpus collide" — but a production corpus grows: each ingest batch
must be deduped against *everything already accepted* without
re-scanning it. The state that makes this O(batch) instead of
O(corpus) is exactly the LSH asset: the accepted docs' (band, key)
bucket index plus their shingle sets for verification.

Per batch:
  1. signatures for the new docs (one narrow pass — minhash_base),
  2. within-batch pairing (band self-join) — keep-smallest-id wins,
  3. batch-vs-index pairing (band join against the stored index) —
     the index side only ever matches on colliding buckets, so the
     join touches ~collisions, not the whole corpus,
  4. survivors append their bands + shingles to the index.

At 100 TB the index is partitioned by (band, key-hash range) and the
join prunes to colliding partitions; re-ingesting a batch converges to
zero survivors (the test asserts this), which is the dedup analogue of
the medallion ledger's exactly-once property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.operators.compaction import dir_exists
from finalpipeline_spark.queries.documents import minhash_bands, minhash_base

JACCARD_MIN = 0.2


def _verified_dups(
    pairs: DataFrame, sh_new: DataFrame, sh_old: DataFrame, drop_col: str
) -> DataFrame:
    """Exact-Jaccard-verify candidate pairs; return doc_ids to drop."""
    jac = F.expr(D.jaccard("sh_a", "sh_b", D.SPARK))
    return (
        pairs.join(sh_new, "doc_id_a")
        .join(sh_old, "doc_id_b")
        .filter(jac >= JACCARD_MIN)
        .select(F.col(drop_col).alias("doc_id"))
        .distinct()
    )


def dedup_batch(
    spark: SparkSession, new_docs: DataFrame, index_path: str
) -> DataFrame:
    """Dedup ``new_docs`` (doc_id, text, ...) within the batch and
    against the index at ``index_path``; append the survivors' LSH
    state to the index; return the surviving rows.

    Within-batch semantics: the smaller doc_id of a verified pair is
    canonical (first-seen wins, matching the curation funnel's
    deterministic pick). Docs with <3 tokens have no shingles and pass
    through unexamined (they are exact-dedup territory, not near-dup).
    """
    base = minhash_base(
        new_docs.repartition(spark.sparkContext.defaultParallelism)
    ).cache()
    bands = minhash_bands(base)
    sh_a = base.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b"))

    a, b = bands.alias("a"), bands.alias("b")
    within_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    dups = _verified_dups(within_pairs, sh_a, sh_b, "doc_id_b")

    # Filesystem-level existence probe — a try/except around the read
    # would turn a transient index-read failure into "no index", admit
    # duplicates of the whole corpus AND append them to the index.
    has_index = dir_exists(spark, index_path + "/bands")
    if has_index:
        idx_bands = spark.read.parquet(index_path + "/bands")
        idx_sh = spark.read.parquet(index_path + "/shingles")
        vs_index = (
            bands.join(
                idx_bands.select(
                    "band", "key", F.col("doc_id").alias("doc_id_b")
                ),
                ["band", "key"],
            )
            .select(F.col("doc_id").alias("doc_id_a"), "doc_id_b")
            .distinct()
        )
        idx_sh_b = idx_sh.select(
            F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b")
        )
        dups = dups.unionByName(
            _verified_dups(vs_index, sh_a, idx_sh_b, "doc_id_a")
        ).distinct()

    # Materialize the dup set (it's small — ids only) so the returned
    # survivors don't drag the cached base's lineage around, and the
    # cache can be released before returning.
    dups = dups.localCheckpoint()
    survivors = new_docs.join(dups, "doc_id", "left_anti")
    surv_base = base.join(dups, "doc_id", "left_anti")
    # Shingles BEFORE bands: bands are what generates candidates, so a
    # crash between the writes leaves orphan shingles (harmless — never
    # joined without a band row) instead of band rows whose
    # verification join silently drops real candidates forever.
    surv_base.select("doc_id", "shingles").write.mode("append").parquet(
        index_path + "/shingles"
    )
    minhash_bands(surv_base).write.mode("append").parquet(index_path + "/bands")
    base.unpersist()
    return survivors
