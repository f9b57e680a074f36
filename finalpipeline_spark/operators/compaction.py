"""Small-files compaction.

At 100 TB, incremental pipelines (ledger appends, per-trigger streaming
sinks, dynamic partition overwrites — everything in operators/
incremental.py and streaming/) accrete thousands of small files per
partition; scan throughput then dies on open/seek overhead and the
driver chokes on file listings. Compaction rewrites a parquet directory
to ~target-sized files and swaps it in atomically.

The reference never needed this (one Postgres, one parquet per target —
reference tanimoto.py:192-195), but its one-file-per-key layout is
exactly how a naive port would create the problem at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def parquet_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under `path`, recursively."""
    fs, hpath, _ = _fs_and_path(spark, path)
    it = fs.listFiles(hpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def recover_swap(spark: SparkSession, path: str) -> bool:
    """Heal a crash between atomic_replace's two renames: if only the
    backup survives, rename it back into place. Returns True if a
    recovery happened. Call-sites that probe for table existence must
    run this first, or a half-swapped table reads as absent."""
    fs, hpath, jvm = _fs_and_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    bak = P(path + "__swap_bak")
    if fs.exists(bak) and not fs.exists(hpath):
        if not fs.rename(bak, hpath):
            raise IOError(f"swap recovery failed: could not restore {path}")
        return True
    return False


def atomic_replace(spark: SparkSession, path: str, tmp: str) -> None:
    """Swap the directory at ``tmp`` into ``path`` with two renames, so
    readers never observe a half-written directory (rename is atomic
    per directory on HDFS-like stores; on S3 use a committer or table
    format instead). Rolls back if the second rename fails. A crash
    between the renames leaves the old data in ``<path>__swap_bak``;
    recover_swap() restores it, and the backup is only deleted while a
    live copy exists at ``path``."""
    recover_swap(spark, path)
    fs, hpath, jvm = _fs_and_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    bak = path + "__swap_bak"
    if fs.exists(hpath):
        fs.delete(P(bak), True)  # stale backup from a completed swap
        if not fs.rename(hpath, P(bak)):
            raise IOError(f"atomic swap failed: could not move {path} aside")
    if not fs.rename(P(tmp), hpath):
        fs.rename(P(bak), hpath)  # roll back
        raise IOError(f"atomic swap failed: could not move {tmp} into place")
    fs.delete(P(bak), True)


def dir_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem existence probe (NOT spark.read + try/except, which
    turns transient read errors into 'absent' — a data-loss trap for
    write-if-absent callers). Heals interrupted swaps first."""
    recover_swap(spark, path)
    fs, hpath, _ = _fs_and_path(spark, path)
    return fs.exists(hpath)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into ceil(total/target) files.

    coalesce (not repartition) — compaction must not shuffle, it only
    narrows the partition count; row order within files is irrelevant.
    The rewrite lands in a sibling temp dir and is swapped in atomically.
    For a hive-partitioned table pass ``partition_by`` so the rewrite
    preserves the directory layout (the partition columns are recovered
    from the paths by the read and re-emitted by the write).

    Returns {files_before, files_after, total_bytes}.
    """
    files_before, total = parquet_file_stats(spark, path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path + "__compact_tmp"
    w = df.coalesce(n_out).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    atomic_replace(spark, path, tmp)
    files_after, _ = parquet_file_stats(spark, path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "total_bytes": total,
    }
