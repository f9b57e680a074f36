"""JDBC source/sink (reference db_interact.py:87-130 — its primary
at-rest store was Postgres via psycopg2/SQLAlchemy).

Spark-first equivalent: ``spark.read.jdbc`` / ``df.write.jdbc`` with
*partitioned* reads — ``partitionColumn/lowerBound/upperBound/
numPartitions`` turn the reference's LIMIT/OFFSET pagination
(db_interact.py:185, self-documented broken there) into N concurrent
range-predicate scans, and ``pushDownPredicate`` (on by default) sends
filters to the database instead of shipping the table.

Capability-gated like Avro: a JDBC driver jar is not bundled with a
plain pyspark install, so the absence surfaces as a clear
NotImplementedError naming the fix, not an opaque
ClassNotFoundException from the JVM. Where a driver jar IS available,
the path is integration-tested for real (tests/test_jdbc.py runs
read_jdbc's plain/partitioned/subquery scans and write_jdbc's batched
write against DuckDB over its public JDBC driver in a subprocess
session with spark.jars set).

At scale: the JDBC side is the small side — dimension tables, ID maps,
ledgers. The 100 TB fact data lives columnar (parquet/ORC); a JDBC
read of a dimension should end up broadcast in the join, which Spark's
size estimation does automatically once ``fetchsize`` keeps the read
bounded. Never point a 1000-executor job's fact scan at one database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _gate(e: Exception, url: str) -> NotImplementedError:
    return NotImplementedError(
        f"JDBC access to {url!r} requires the matching driver jar on the "
        "Spark classpath (e.g. spark.jars.packages=org.postgresql:postgresql:42.7.3 "
        "or --jars /path/to/driver.jar)"
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S4/S9 over JDBC: SELECT→DataFrame with an optional range-
    partitioned parallel scan.

    ``table`` may be a table name or a pushdown subquery
    ``"(select ... ) t"`` — the reference's join-pushdown pattern
    (tanimoto.py:177-183) expressed as a derived-table scan.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - depends on jar presence
        if _is_driver_missing(e):
            raise _gate(e, url) from e
        raise


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """S2/S5 over JDBC: batched insert (the reference's row-at-a-time
    executemany loop becomes one batched write per partition).

    ``mode='overwrite'`` maps to the reference's if_exists='replace';
    note JDBC overwrite is NOT atomic (TRUNCATE/DROP then insert) —
    for exactly-once semantics stage to a side table and swap in the
    database, mirroring operators/compaction.atomic_replace.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as e:  # pragma: no cover - depends on jar presence
        if _is_driver_missing(e):
            raise _gate(e, url) from e
        raise


def _is_driver_missing(e: Exception) -> bool:
    msg = str(e)
    return (
        "No suitable driver" in msg
        or "ClassNotFoundException" in msg
        or "CANNOT_FIND_JDBC_DRIVER" in msg
        or "JDBC_DRIVER_NOT_FOUND" in msg
    )
