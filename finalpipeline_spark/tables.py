"""Testdata table access with schema normalization.

All queries load tables through here so the one irregularity in the
testdata — ``events.ts`` stored as parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects — is handled in exactly one place:
we flip ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) and
expose the column as epoch-nanosecond ``bigint`` plus derived
tz-independent epoch columns. Falls back to an Arrow-side cast if the
session forbids the conf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

NS_PER_SECOND = 1_000_000_000


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing the events timestamp."""
    path = table_path(sf_dir, name)
    if name != "events":
        return spark.read.parquet(path)
    return _load_events(spark, path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    except Exception:
        df = _load_events_arrow(spark, path)
    # ts is epoch nanoseconds (bigint). Derive tz-independent epoch units.
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts_ns", F.col("ts").cast("long"))
    else:  # arrow fallback already delivered microseconds
        df = df.withColumn("ts_ns", F.expr("ts_us * 1000"))
    return df.withColumn("ts_epoch_s", F.expr(f"ts_ns div {NS_PER_SECOND}"))


def _load_events_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side Arrow fallback (small table; ns→us cast)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    import pyarrow as pa
    import pyarrow.compute as pc

    ts_us = pc.cast(tbl["ts"], pa.int64())  # epoch ns as int64
    tbl = tbl.drop_columns(["ts"]).append_column(
        "ts_us", pc.divide(ts_us, pa.scalar(1000, pa.int64()))
    )
    return spark.createDataFrame(tbl.to_pandas())


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
