"""File-level zone maps: persisted per-file min/max stats + pruned scan.

Parquet already stores row-group min/max, but the engine must still
*open every file* to use them. A zone map lifts those stats into one
tiny table (one row per data file), so query planning touches the
stats table instead of 100 TB of footers — the mechanism behind Delta
file skipping / Iceberg manifests, as plain Spark over plain parquet.

Pairs with `operators/zorder.py`: z-order clustering is what makes the
per-file ranges *tight* on several columns at once; the zone map is
what turns tight ranges into skipped I/O. tests/test_zonemap.py proves
both columns of a z-ordered rewrite prune, and that the pruned scan is
result-identical to the full scan.

The pruned read collects the qualifying file list to the driver — the
same planning-state shape as Delta's file listing: bounded by file
count, never by data size (and zone-map rows for a 100 TB table at
1 GiB/file is ~10^5 rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.operators.compaction import atomic_replace
from finalpipeline_spark.functions.frames import empty_df


def write_zonemap(
    spark: SparkSession,
    data_path: str,
    cols: Sequence[str],
    zonemap_path: str,
) -> None:
    """Build the per-file stats table for ``cols`` over every parquet
    file under ``data_path``.  One column-pruned scan, grouped by the
    file-metadata path — the stats aggregation combines map-side, so
    the shuffle carries one row per (file, partial)."""
    df = spark.read.parquet(data_path).select(
        F.col("_metadata.file_path").alias("file"), *cols
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = df.groupBy("file").agg(*aggs)
    tmp = zonemap_path.rstrip("/") + "._tmp_swap"
    stats.coalesce(1).write.mode("overwrite").parquet(tmp)
    atomic_replace(spark, zonemap_path, tmp)


def pruned_read(
    spark: SparkSession,
    data_path: str,
    zonemap_path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Scan only the files whose [min, max] range for ``col``
    intersects [lo, hi], then apply the exact predicate.

    Returns (rows, n_files_selected, n_files_total) so callers and
    tests can observe the skipping. Result rows are identical to a
    full scan + filter by construction: the zone map can only
    over-select (a file range containing no qualifying row), never
    under-select, and the exact filter removes over-selection."""
    zm = spark.read.parquet(zonemap_path)
    total = zm.count()
    files = [
        r["file"]
        for r in zm.filter(
            (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
        ).collect()
    ]
    schema = spark.read.parquet(data_path).schema
    if not files:
        return empty_df(spark, schema), 0, total
    rows = (
        spark.read.schema(schema)
        .parquet(*files)
        .filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )
    return rows, len(files), total
