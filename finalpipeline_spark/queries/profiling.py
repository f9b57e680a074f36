"""Data-profiling surface: equi-width histograms and per-column table
profiles.

The ops counterpart to `operators/quality.py` (assertions): before you
can assert, you have to *look*.  At 100 TB the profiler is how a
pipeline owner decides partition counts, salting, and filter
selectivity without sampling blindly.

Exactness: the histogram works in integer cents with data-driven
bounds — min/max come from a 1-row aggregate that joins back as a
broadcast (no driver round-trip, no collect), and bucket assignment is
pure integer floor division, so both engines agree on every boundary.
The profiler emits min/max as *strings* (dates and integers render
identically in both engines; money goes through exact cents) and exact
distinct counts.

Scale: the histogram is one scan + one tiny broadcast + one 16-row
aggregation.  The profiler is one single-column scan per profiled
column (parquet column pruning makes six 1-column scans the same total
I/O as one 6-column scan) — each with a map-side-combining distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

LINEITEM_VIEW = "__fps_lineitem_pf"
ORDERS_VIEW = "__fps_orders_pf"

_N_BUCKETS = 16


def _tbl(view: str, duck: str, dialect: str) -> str:
    return view if dialect == D.SPARK else duck


def _histogram_sql(dialect: str) -> str:
    """Equi-width histogram of l_extendedprice in exact cents.

    width = (max-min) div N + 1 guarantees bucket ids land in [0, N-1]
    with pure integer math; the bounds row is a broadcastable 1-row
    aggregate, so the plan is scan → (1-row agg) → scan+broadcast-join
    → 16-row agg.  Empty buckets are absent by design (the oracle
    agrees)."""
    t = _tbl(LINEITEM_VIEW, "lineitem", dialect)
    dv = lambda a, b: D.idiv(a, b, dialect)  # noqa: E731
    return f"""
        WITH cents AS (
            SELECT cast(round(l_extendedprice * 100) as bigint) AS c FROM {t}
        ), params AS (
            SELECT min(c) AS lo, max(c) AS hi,
                   ({dv("(max(c) - min(c))", _N_BUCKETS)} + 1) AS width
            FROM cents
        )
        SELECT cast({dv("(c - lo)", "width")} as int) AS bucket,
               cast(lo + {dv("(c - lo)", "width")} * width as bigint) AS lo_cents,
               cast(lo + ({dv("(c - lo)", "width")} + 1) * width - 1 as bigint) AS hi_cents,
               cast(count(*) as bigint) AS n_rows
        FROM cents CROSS JOIN params
        GROUP BY 1, 2, 3
        ORDER BY 1
    """


@register("lineitem_price_histogram", oracle=_histogram_sql(D.DUCK), tags=("extension",))
def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bucket equi-width histogram of l_extendedprice: integer-cents
    bucket math with data-driven bounds from a broadcast 1-row
    aggregate — one fact scan, no collect."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(LINEITEM_VIEW)
    return spark.sql(_histogram_sql(D.SPARK))


def _profile_sql(dialect: str) -> str:
    """Per-column profile of orders: row/null/distinct counts and
    min/max rendered as strings.  One UNION ALL branch per column —
    each branch scans exactly one parquet column."""
    t = _tbl(ORDERS_VIEW, "orders", dialect)
    str_t = "string" if dialect == D.SPARK else "varchar"

    def branch(col: str, expr: str) -> str:
        return f"""
        SELECT '{col}' AS column_name,
               cast(count(*) as bigint) AS n_rows,
               cast(count(*) - count({expr}) as bigint) AS n_null,
               cast(count(distinct {expr}) as bigint) AS n_distinct,
               cast(min({expr}) as {str_t}) AS min_value,
               cast(max({expr}) as {str_t}) AS max_value
        FROM {t}"""

    branches = [
        branch("o_orderkey", "o_orderkey"),
        branch("o_custkey", "o_custkey"),
        branch("o_totalprice_cents", "cast(round(o_totalprice * 100) as bigint)"),
        branch("o_orderdate", "o_orderdate"),
        branch("o_orderpriority", "o_orderpriority"),
        branch("o_orderstatus", "o_orderstatus"),
    ]
    return " UNION ALL ".join(branches)


@register("orders_profile", oracle=_profile_sql(D.DUCK), tags=("extension",))
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiler for orders: exact null/distinct
    counts and string-rendered min/max per column (money in exact
    cents), one pruned single-column scan per branch."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(ORDERS_VIEW)
    return spark.sql(_profile_sql(D.SPARK))
