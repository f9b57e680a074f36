"""Incremental dedup against the persisted band index: new batches are
deduped in O(batch) via bucket joins, and re-ingest converges to zero."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.plans.incremental_dedup import dedup_batch
from finalpipeline_spark.tables import load_table


def test_incremental_dedup_batches(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "dedup_index")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # Batch 1: even docs seed the corpus. Survivors = all minus the
    # batch's own internal near-dups (the synthetic corpus contains
    # exact/near duplicates by construction).
    b1 = docs.filter("doc_id % 2 = 0").cache()
    s1 = dedup_batch(spark, b1, idx).cache()
    n_b1, n_s1 = b1.count(), s1.count()
    assert 0 < n_s1 <= n_b1
    # Canonical pick is the smallest id: every dropped doc must have a
    # smaller surviving near-dup, so the minimum id always survives.
    assert s1.agg(F.min("doc_id")).first()[0] == b1.agg(F.min("doc_id")).first()[0]

    # Batch 2: exact copies of accepted docs under NEW ids + fresh odd
    # docs. The copies must be caught by the INDEX (not within-batch:
    # their pair partner is in the corpus, not the batch).
    copies = s1.limit(20).select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    fresh = docs.filter("doc_id % 2 = 1")
    b2 = copies.unionByName(fresh)
    s2 = dedup_batch(spark, b2, idx).cache()
    surviving_copy_ids = s2.filter("doc_id >= 1000000").count()
    assert surviving_copy_ids == 0, "verbatim copies of indexed docs must drop"
    assert s2.count() > 0  # genuinely new content landed

    # Re-ingesting batch 2 verbatim: everything is indexed now — zero
    # survivors (the dedup analogue of exactly-once ingestion).
    s3 = dedup_batch(spark, b2, idx)
    assert s3.count() == 0
