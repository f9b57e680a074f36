"""Small DataFrame-construction helpers shared across the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def empty_df(spark: SparkSession, schema: StructType | str) -> DataFrame:
    """Zero-row DataFrame with exactly ``schema``.

    NOT ``spark.createDataFrame([], schema)``: that builds a
    Python-RDD-backed relation with ``defaultParallelism`` empty
    partitions, and EVERY action over a plan containing it launches one
    Python worker per partition — measured ~4 s per consuming action at
    local[32] (the dominant cost of a merge-on-read delete, whose
    deletion-vector write unions such an empty frame).  An ``emptyRDD``
    has zero partitions: zero tasks, exact schema, instant.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)


def local_df(spark: SparkSession, rows, schema: StructType | str) -> DataFrame:
    """Driver-local rows → DataFrame on ONE partition.

    ``spark.createDataFrame(list, ...)`` parallelizes the list onto
    ``defaultParallelism`` Python partitions, so every action over the
    plan launches ~one Python worker per core for a frame that holds a
    handful of driver-side rows (~0.2–1.5 s per action at local[32]).
    Driver-bounded frames — offsets, metrics, manifest listings — belong
    on a single slice: same rows, zero fan-out.
    """
    rows = list(rows)
    if not rows:
        return empty_df(spark, schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
