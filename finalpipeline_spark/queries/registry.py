"""Central query registry.

Every operator/query the engine claims (SURVEY.md §2 inventory plus the
large-scale-pipeline extensions) is registered here with:

  * ``fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation
  * ``oracle``                           — equivalent DuckDB SQL (or None
    for genuinely non-SQL-expressible ops → driver does rows-only check)
  * ``tags``                             — e.g. "headline" (benchmarked),
    "reference" (parity with the reference), "extension"

``__spark_entry__.py`` exposes this registry as the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return all."""
    from finalpipeline_spark.queries import (  # noqa: F401
        chembl,
        documents,
        embeddings,
        events,
        extended,
        multimodal,
        relational,
        tpch,
    )

    return QUERIES
