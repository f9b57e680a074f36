"""Small DataFrame-construction helpers shared across the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

# Arrow fast-path value guard for local_df: a value is safe only when
# its Python type MATCHES its field's Spark type, because Arrow CASTS
# mismatches where the row-pickling path's verifier RAISES — e.g. a
# float 2.5 in a bigint column silently truncates to 2 via Arrow.
# datetime/date are deliberately EXCLUDED (naive-timestamp timezone
# handling differs between the two paths), as are NaN floats (Arrow's
# from_pandas turns NaN into NULL where the row path keeps NaN).
_INT_FIELD_TYPES = (ByteType, ShortType, IntegerType, LongType)


def _arrow_value_ok(v, dt) -> bool:
    if v is None:
        return True
    if isinstance(dt, _INT_FIELD_TYPES):
        return isinstance(v, int) and not isinstance(v, bool)
    if isinstance(dt, (FloatType, DoubleType)):
        # int is fine (5 → 5.0 on both paths); NaN keeps the row path
        return (
            isinstance(v, (int, float))
            and not isinstance(v, bool)
            and v == v
        )
    if isinstance(dt, StringType):
        return isinstance(v, str)
    if isinstance(dt, BinaryType):
        return isinstance(v, bytes)
    if isinstance(dt, BooleanType):
        return isinstance(v, bool)
    return False  # anything else (dates, decimals, nested): row path


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
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # Arrow fast path: even on one slice, a Python-RDD-backed frame
    # launches a Python worker on EVERY consuming action (~0.15-0.2 s
    # at local[32] — the floor of e.g. a zero-file COPY INTO, whose
    # real work is 20 ms). A pandas+Arrow local frame collects in
    # ~20 ms: the batches are serialized once at build time and the
    # action is JVM-only. Guarded to sessions with Arrow enabled and
    # to scalar shapes whose values are bit-identical on both paths
    # (see _arrow_value_ok); anything else — and any Arrow
    # conversion failure — takes the original single-slice RDD path.
    arrow_on = (
        spark.conf.get(
            "spark.sql.execution.arrow.pyspark.enabled", "false"
        ).lower()
        == "true"
    )
    field_types = [f.dataType for f in schema.fields]
    if (
        arrow_on
        and all(isinstance(r, tuple) and len(r) == len(schema) for r in rows)
        and all(
            _arrow_value_ok(v, dt)
            for r in rows
            for v, dt in zip(r, field_types)
        )
    ):
        try:
            import pandas as pd

            # dtype=object keeps every value verbatim (no int→float64
            # widening for columns containing None, no NaN injection)
            pdf = pd.DataFrame(rows, columns=schema.fieldNames(), dtype=object)
            return spark.createDataFrame(pdf, schema)
        except Exception:
            pass  # fall through to the row path
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
