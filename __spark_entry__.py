"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over finalpipeline_spark's query registry: every operator
from SURVEY.md §2 (plus the large-scale extensions) is registered in
finalpipeline_spark/queries/* with a Spark implementation and, where
SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finalpipeline_spark.queries.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's silver→gold datamart chain in one Spark plan:
    per-group top-10 → dim joins → aggregate view.
    """
    specs = load_all()
    return specs["flagship_datamart_chain"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
