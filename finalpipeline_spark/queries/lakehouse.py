"""Driver-attestable queries over the versioned lakehouse SQL surface.

The versioned table (sources/versioned.py) and its Python DataSource
(sources/pyds.py) are pytest-covered in depth, but the external
driver's oracle gate can only see ``queries()`` entries — so these two
queries exercise the SQL-only surface end-to-end against the standard
``orders`` table: build a small versioned table from deterministic
slices of orders, then consume it through PURE ``spark.sql`` views
(``USING versioned`` — Delta option parity), and aggregate to an
exactly-reproducible result the DuckDB oracle mirrors straight off the
parquet.

Scale shape: the versioned-table side is manifest-planned (no
directory listing), the CDF feed reads exactly the per-commit file
diff, and the final aggregates are plain partial-agg shuffles. The
staging writes are bounded by the orders slice — this is a correctness
harness for the lakehouse surface, not a benchmark path.

Each call stages into a fresh ``tempfile.mkdtemp`` dir (a few MB at
driver scale) that lives until /tmp is cleaned: the returned DataFrame
stays lazily bound to it, so the query must not delete it.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_ERA_1 = "1995-01-01"
_ERA_2 = "1996-06-01"


def _stage_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Three deterministic era commits of the orders slice → a fresh
    versioned table root. Commit version == era by construction."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="fps_lakehouse_") + "/orders_vt"
    t = VersionedTable(spark, root)
    t.commit_overwrite(orders.filter(F.col("o_orderdate") < _ERA_1))
    t.commit_append(
        orders.filter(
            (F.col("o_orderdate") >= _ERA_1) & (F.col("o_orderdate") < _ERA_2)
        )
    )
    t.commit_append(orders.filter(F.col("o_orderdate") >= _ERA_2))
    return root


@register(
    "versioned_sql_table_changes",
    oracle=f"""
        SELECT cast(era AS bigint) AS era,
               o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM (
            SELECT CASE WHEN o_orderdate < '{_ERA_1}' THEN 0
                        WHEN o_orderdate < '{_ERA_2}' THEN 1
                        ELSE 2 END AS era,
                   o_orderpriority, o_totalprice
            FROM orders
        )
        GROUP BY era, o_orderpriority
        ORDER BY era, o_orderpriority
    """,
    tags=("extension",),
)
def versioned_sql_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch change feed through the PURE-SQL surface: orders staged as
    three era commits, consumed via ``CREATE TEMPORARY VIEW ... USING
    versioned OPTIONS (changeFeed 'true', startingVersion '0')`` —
    Delta's readChangeFeed contract — and aggregated per commit. The
    oracle recomputes the same eras straight from the parquet: equality
    proves the SQL CDF view delivers exactly each commit's rows, tagged
    with the right ``_commit_version``. (Reference users consume
    everything through SQL views — ref dags/views_p1.py — so the
    lakehouse layer must be reachable without one Python import.)"""
    root = _stage_orders_table(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW __fps_sql_cdf USING versioned "
        f"OPTIONS (root '{root}', changeFeed 'true', startingVersion '0')"
    )
    return spark.sql(
        """
        SELECT _commit_version AS era,
               o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_sql_cdf
        WHERE _change_type = 'insert'
        GROUP BY era, o_orderpriority
        ORDER BY era, o_orderpriority
        """
    )


@register(
    "versioned_sql_time_travel",
    oracle=f"""
        SELECT o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM orders
        WHERE o_orderdate < '{_ERA_2}'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("extension",),
)
def versioned_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF through the PURE-SQL surface: the same staged
    table read back at version 1 via ``USING versioned OPTIONS
    (version '1')`` — i.e. before the era-2 append — and aggregated.
    The oracle filters the parquet to the first two eras: equality
    proves SQL time travel reads exactly the version-1 snapshot."""
    root = _stage_orders_table(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW __fps_sql_tt USING versioned "
        f"OPTIONS (root '{root}', version '1')"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_sql_tt
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
