"""Deletion propagation (takedown / right-to-be-forgotten).

A training-data estate is not one table: an accepted document also
lives in the LSH dedup index (bands + shingles), its embedding in the
ANN postings, its stats in derived marts. A takedown request must
remove the key from EVERY derived asset, atomically per asset, and be
idempotent (requests get re-delivered). The reference has no analogue
— its closest machinery is the delete-free append-only ledger
(tanimoto.py:28-58) — but no production corpus ships without this.

Design: each asset is (path, key_col). Per asset: anti-join the stored
rows against the (small, broadcast) tombstone set and rewrite through
the same tmp + atomic-rename discipline as compaction — a crash
mid-rewrite leaves the original readable (`recover_swap` heals the
rename window). The tombstone set is also persisted to a ledger so
re-delivered requests and assets restored from backups can be
re-scrubbed (`forget_from_ledger`).

Scale shape: the rewrite is the unavoidable cost of physical deletion
in immutable storage (same as Delta/Iceberg MERGE DELETE without the
log). For partitioned assets only partitions containing tombstoned
keys need rewriting — pass `partition_col` and the plan prunes the
rewrite set to those partitions, leaving every other partition's files
untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.operators.compaction import (
    atomic_replace,
    dir_exists,
    recover_swap,
)


def _tombstones(ids: DataFrame, key_col: str) -> DataFrame:
    return ids.selectExpr(f"{ids.columns[0]} as {key_col}").dropDuplicates()


def forget_asset(
    spark: SparkSession,
    ids: DataFrame,
    path: str,
    key_col: str,
    partition_col: str | None = None,
) -> int:
    """Remove rows whose ``key_col`` is in ``ids`` from the parquet
    asset at ``path``. Returns rows removed. Idempotent; atomic per
    asset (readers see old-or-new, never partial).

    With ``partition_col``, only partitions that actually contain a
    tombstoned key are rewritten (partition pruning on the read +
    dynamic overwrite on the write); without it the whole asset
    rewrites through a tmp dir + rename pair.
    """
    recover_swap(spark, path)
    if not dir_exists(spark, path):
        return 0
    tomb = F.broadcast(_tombstones(ids, key_col))
    df = spark.read.parquet(path)

    if partition_col is not None:
        hit_parts = (
            df.join(tomb, key_col)
            .select(partition_col)
            .distinct()
            .collect()  # small by construction: list of partition values
        )
        if not hit_parts:
            return 0
        values = [r[0] for r in hit_parts]
        sub = df.filter(F.col(partition_col).isin(values))
        removed = sub.join(tomb, key_col, "semi").count()
        if removed == 0:
            return 0
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                sub.join(tomb, key_col, "left_anti")
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            # restore — a leaked session-wide dynamic mode changes the
            # meaning of every later INSERT OVERWRITE (see
            # operators/incremental.overwrite_partitions)
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return removed

    removed = df.join(tomb, key_col, "semi").count()
    if removed == 0:
        return 0
    kept = df.join(tomb, key_col, "left_anti")
    tmp = path + "__forget_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    atomic_replace(spark, path, tmp)
    return removed


def forget(
    spark: SparkSession,
    ids: DataFrame,
    assets: Sequence[tuple[str, str] | tuple[str, str, str]],
    ledger_path: str | None = None,
) -> dict[str, int]:
    """Propagate a takedown across every derived asset.

    ``assets``: (path, key_col) or (path, key_col, partition_col).
    Appends the ids to ``ledger_path`` (the tombstone ledger) first —
    write-ordered so a crash mid-propagation can always be finished by
    re-running `forget_from_ledger`; never the reverse (a scrub that
    precedes its record can't be replayed).
    """
    if ledger_path is not None:
        key0 = ids.columns[0]
        new = ids.selectExpr(f"{key0} as key").dropDuplicates()
        if dir_exists(spark, ledger_path):
            seen = spark.read.parquet(ledger_path)
            new = new.join(seen, "key", "left_anti")
        new.write.mode("append").parquet(ledger_path)

    out: dict[str, int] = {}
    for asset in assets:
        path, key_col = asset[0], asset[1]
        part = asset[2] if len(asset) > 2 else None
        out[path] = forget_asset(spark, ids, path, key_col, partition_col=part)
    return out


def forget_from_ledger(
    spark: SparkSession,
    ledger_path: str,
    assets: Sequence[tuple[str, str] | tuple[str, str, str]],
) -> dict[str, int]:
    """Re-apply the full tombstone ledger to every asset — the recovery
    path after a crash mid-propagation or an asset restore from backup.
    Idempotent: scrubbed assets report 0."""
    if not dir_exists(spark, ledger_path):
        return {a[0]: 0 for a in assets}
    ids = spark.read.parquet(ledger_path)
    return forget(spark, ids, assets, ledger_path=None)
