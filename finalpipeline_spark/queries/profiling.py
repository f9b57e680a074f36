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


EVENTS_VIEW = "__fps_events_pf"


def _skew_profile_sql(dialect: str) -> str:
    """Key-distribution skew diagnostic for events.user_id — the
    numbers that decide whether a join/agg on this key needs salting
    (`operators/skew.salted_join`) before it hits a 1000-executor
    cluster: hottest-key share, max/avg ratio, and the top-5
    concentration.  One groupBy(key) + one tiny aggregate; all counts
    exact int64, ratios one IEEE division each."""
    t = _tbl(EVENTS_VIEW, "events", dialect)
    return f"""
        WITH counts AS (
            SELECT user_id, cast(count(*) as bigint) AS c
            FROM {t} GROUP BY user_id
        ), top5 AS (
            SELECT cast(sum(c) as bigint) AS top5_rows FROM (
                SELECT c FROM counts ORDER BY c DESC, user_id LIMIT 5
            ) t5
        ), stats AS (
            SELECT cast(count(*) as bigint) AS n_keys,
                   cast(sum(c) as bigint) AS n_rows,
                   cast(max(c) as bigint) AS max_rows
            FROM counts
        )
        SELECT s.n_keys, s.n_rows, s.max_rows, t.top5_rows,
               round(cast(s.max_rows as double)
                     / (cast(s.n_rows as double) / cast(s.n_keys as double)), 4)
                   AS max_over_avg,
               round(cast(t.top5_rows as double) / cast(s.n_rows as double), 4)
                   AS top5_share
        FROM stats s CROSS JOIN top5 t
    """


@register("events_skew_profile", oracle=_skew_profile_sql(D.DUCK), tags=("extension",))
def events_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (hottest-key ratio, top-5 concentration) —
    the pre-flight check for salting decisions at scale."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(EVENTS_VIEW)
    return spark.sql(_skew_profile_sql(D.SPARK))


def _concurrency_sql(dialect: str) -> str:
    """Per-hour count of ACTIVE user sessions (30-minute-gap
    sessionization) — the occupancy/concurrency curve.

    Scale shape: instead of a time-range join (quadratic candidates, or
    a broadcast-nested-loop plan), each session EXPLODES into the hours
    it covers — sessions are gap-bounded so the fan-out is small and
    bounded — and the curve is then one groupBy(hour).  The shuffle
    carries (hour, 1) pairs ∝ session-hours, never sessions × hours.
    Session boundaries come from the gaps-and-islands window (same
    construction as events_sessionize)."""
    t = _tbl(EVENTS_VIEW, "events", dialect)
    es = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    idiv = "div" if dialect == D.SPARK else "//"
    if dialect == D.SPARK:
        hours = "explode(sequence(start_h, end_h))"
        sel_hours = f"SELECT {hours} AS hour FROM sessions"
    else:
        sel_hours = "SELECT unnest(range(start_h, end_h + 1)) AS hour FROM sessions"
    return f"""
        WITH ordered AS (
            SELECT user_id, ({es}) AS es,
                   CASE WHEN ({es}) - lag({es}) OVER (
                            PARTITION BY user_id ORDER BY ({es}), event_id)
                            > 1800
                         OR lag({es}) OVER (
                            PARTITION BY user_id ORDER BY ({es}), event_id)
                            IS NULL
                        THEN 1 ELSE 0 END AS is_start
            FROM {t}
        ), marked AS (
            SELECT user_id, es,
                   cast(sum(is_start) OVER (
                       PARTITION BY user_id ORDER BY es, user_id) as bigint)
                       AS session_no
            FROM ordered
        ), sessions AS (
            SELECT user_id, session_no,
                   (min(es) {idiv} 3600) AS start_h,
                   (max(es) {idiv} 3600) AS end_h
            FROM marked GROUP BY user_id, session_no
        ), covered AS (
            {sel_hours}
        )
        SELECT hour, cast(count(*) as bigint) AS active_sessions
        FROM covered GROUP BY hour ORDER BY hour
    """


@register("events_concurrency_curve", oracle=_concurrency_sql(D.DUCK), tags=("extension",))
def events_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-sessions-per-hour occupancy curve via session explosion
    into covered hours — the sweep-line answer without a range join."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(EVENTS_VIEW)
    return spark.sql(_concurrency_sql(D.SPARK))
