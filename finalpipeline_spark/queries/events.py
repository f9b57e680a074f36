"""Event-stream queries (batch analogues of the streaming surface).

The reference is batch-only; the events table adds the windowed /
sessionized / semi-structured surface a modern pipeline needs
(SURVEY.md §2.8). All time math here is integer epoch arithmetic on
the raw nanosecond column — bit-identical across Spark and DuckDB and
immune to session-timezone differences. The true Structured Streaming
versions (watermarks, session_window) live in
finalpipeline_spark/streaming/.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from finalpipeline_spark.functions.numeric import exact_avg, exact_avg_sql, exact_sum, exact_sum_sql
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_NS = 1_000_000_000
_HOUR_S = 3600
_GAP_S = 30 * 60  # session gap


@register(
    "events_hourly_rollup",
    oracle=f"""
        SELECT ((epoch_us(ts) // 1000000) // {_HOUR_S}) * {_HOUR_S} AS hour_epoch_s,
               event_type,
               count(*) AS n_events,
               {exact_sum_sql("value", 2)} AS sum_value,
               {exact_avg_sql("value", 2)} AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("extension", "headline"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch form of a streaming
    windowed agg): bucket = floor(epoch_s / 3600) * 3600."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour_epoch_s", F.expr(f"(ts_epoch_s div {_HOUR_S}) * {_HOUR_S}"))
        .groupBy("hour_epoch_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), 2).alias("sum_value"),
            exact_avg(F.col("value"), 2).alias("avg_value"),
        )
    )


@register(
    "events_sliding_window",
    oracle=f"""
        SELECT win_start_s, count(*) AS n_events, {exact_sum_sql("value", 2)} AS sum_value
        FROM (
            SELECT unnest([
                       ((epoch_us(ts) // 1000000) // {_HOUR_S}) * {_HOUR_S},
                       (((epoch_us(ts) // 1000000) - {_HOUR_S // 2}) // {_HOUR_S}) * {_HOUR_S}
                           + {_HOUR_S // 2}
                   ]) AS win_start_s,
                   value
            FROM events
        )
        GROUP BY win_start_s
    """,
    tags=("extension",),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h width, 30m slide): each event lands in exactly
    two windows, generated inline then aggregated — the batch expansion
    Spark's streaming window() does internally."""
    ev = load_table(spark, sf_dir, "events")
    w1 = F.expr(f"(ts_epoch_s div {_HOUR_S}) * {_HOUR_S}")
    w2 = F.expr(
        f"((ts_epoch_s - {_HOUR_S // 2}) div {_HOUR_S}) * {_HOUR_S} + {_HOUR_S // 2}"
    )
    return (
        ev.select(F.explode(F.array(w1, w2)).alias("win_start_s"), "value")
        .groupBy("win_start_s")
        .agg(F.count(F.lit(1)).alias("n_events"), exact_sum(F.col("value"), 2).alias("sum_value"))
    )


@register(
    "events_sessionize",
    oracle=f"""
        SELECT user_id, session_id, count(*) AS n_events,
               (max(es) - min(es))::bigint AS duration_s,
               {exact_sum_sql("value", 2)} AS sum_value
        FROM (
            SELECT user_id, event_id, value, es,
                   (sum(CASE WHEN prev_es IS NULL OR es - prev_es > {_GAP_S}
                             THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY es, event_id
                              ROWS UNBOUNDED PRECEDING))::bigint AS session_id
            FROM (
                SELECT user_id, event_id, value,
                       (epoch_us(ts) // 1000000) AS es,
                       lag((epoch_us(ts) // 1000000))
                           OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000), event_id)
                           AS prev_es
                FROM events
            )
        )
        GROUP BY user_id, session_id
    """,
    tags=("extension",),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via gaps-and-islands:
    lag → new-session marker → running sum = session id. Batch analogue
    of session_window (streaming version in streaming/windows.py)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.col("ts_epoch_s").alias("es")
    )
    w_order = Window.partitionBy("user_id").orderBy("es", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("prev_es", F.lag("es").over(w_order))
        .withColumn(
            "is_new",
            (F.col("prev_es").isNull() | ((F.col("es") - F.col("prev_es")) > _GAP_S)).cast("int"),
        )
        .withColumn("session_id", F.sum("is_new").over(w_run).cast("long"))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("es") - F.min("es")).cast("long").alias("duration_s"),
        exact_sum(F.col("value"), 2).alias("sum_value"),
    )


@register(
    "events_json_extract",
    oracle=f"""
        SELECT (json_extract_string(props, '$.k')::bigint % 10) AS k_bucket,
               count(*) AS n_events,
               {exact_avg_sql("value", 2)} AS avg_value
        FROM events
        GROUP BY 1
    """,
    tags=("extension",),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON path extraction + typed cast + agg
    (get_json_object stays JVM-side — no Python UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket", (F.get_json_object("props", "$.k").cast("bigint") % 10)
        )
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), exact_avg(F.col("value"), 2).alias("avg_value"))
    )


# --------------------------------------------------------------------------
# Custom UDAF: grouped-agg pandas UDF
# --------------------------------------------------------------------------
@register(
    "events_udaf_median",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.5) AS median_value,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    tags=("extension",),
)
def events_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF surface: a GROUPED_AGG pandas UDF (Arrow-batched custom
    aggregation) computing the per-type median with numpy. Built-in
    percentile() would do this JVM-side — the point is the extension
    mechanism for aggregations Spark lacks, with exact oracle parity:
    numpy's even-n median ((a+b)/2 of the middle pair) is precisely
    DuckDB's quantile_cont at 0.5.

    Scale note: a grouped-agg UDF materializes each group in one Arrow
    batch, so it requires per-group data to fit an executor — true
    medians at 100 TB use the percentile_approx sketch instead
    (lineitem_approx_quantiles); this operator is for genuinely custom
    group-at-a-time math."""
    @pandas_udf("double")
    def np_median(v: pd.Series) -> float:
        # dropna: NULLs arrive as NaN and np.median would return NaN,
        # while quantile_cont (the oracle) skips NULLs.
        return float(np.median(v.dropna().to_numpy(dtype="float64")))

    # Grouped-agg pandas UDFs can't mix with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a UDAF too.
    @pandas_udf("long")
    def np_count(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        np_median(F.col("value")).alias("median_value"),
        np_count(F.col("value")).alias("n_events"),
    )


# --------------------------------------------------------------------------
# Z-score anomaly detection with exact integer moments
# --------------------------------------------------------------------------
_Z_CUT = 3.0


@register(
    "events_anomaly_zscore",
    oracle=f"""
        WITH stats AS (
            SELECT event_type,
                   count(*)::bigint AS n,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) AS s1,
                   cast(sum(cast(round(value * 100) as bigint)
                            * cast(round(value * 100) as bigint)) as bigint) AS s2
            FROM events
            GROUP BY event_type
        ),
        z AS (
            SELECT e.event_id, e.event_type, e.value,
                   ((e.value::double) - ((s.s1::double) / ((s.n * 100)::double)))
                   / sqrt( ((s.s2::double) / ((s.n * 10000)::double))
                           - ((s.s1::double) / ((s.n * 100)::double))
                             * ((s.s1::double) / ((s.n * 100)::double)) ) AS zscore
            FROM events e JOIN stats s USING (event_type)
        )
        SELECT event_id, event_type, value, zscore
        FROM z WHERE abs(zscore) > {_Z_CUT!r}
    """,
    tags=("extension",),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3): population moments from
    EXACT scaled-integer sums (value is 2dp → sum and sum-of-squares of
    the ×100 bigints are order-proof integers), so mean/variance are
    each ONE identical IEEE expression in both engines — no
    order-dependent float accumulation, no rounding. sqrt is
    IEEE-correctly-rounded everywhere, so even the z-scores hash
    identically.

    Shape: one agg shuffle builds the per-type stats (a handful of
    rows, broadcast back onto the fact), so anomaly scoring is
    scan + broadcast-join — no second wide shuffle, no window over the
    whole fact. Scale guard: sum(x²·10⁴) < 2⁶³ holds through ~1e9 rows
    of 4-digit values per type; shard the sum by salt above that."""
    ev = load_table(spark, sf_dir, "events")
    scaled = F.round(F.col("value") * 100).cast("long")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled).alias("s1"),
        F.sum(scaled * scaled).alias("s2"),
    )
    mean = F.col("s1").cast("double") / (F.col("n") * 100).cast("double")
    ex2 = F.col("s2").cast("double") / (F.col("n") * 10000).cast("double")
    z = (F.col("value").cast("double") - mean) / F.sqrt(ex2 - mean * mean)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > _Z_CUT)
        .select("event_id", "event_type", "value", "zscore")
    )


_EWMA_FRAME = 16  # current event + 15 preceding


@register(
    "events_ewma_value",
    oracle=f"""
        WITH cents AS (
            SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                   cast(round(value * 100) as bigint) AS c
            FROM events
        ),
        framed AS (
            SELECT user_id, ts_ns, event_id,
                   list(c) OVER (
                       PARTITION BY user_id ORDER BY ts_ns, event_id
                       ROWS BETWEEN {_EWMA_FRAME - 1} PRECEDING AND CURRENT ROW
                   ) AS frame
            FROM cents
        )
        SELECT user_id, ts_ns, event_id,
               cast(list_reduce(list_reverse(frame),
                                (acc, x) -> 2 * acc + x) as double)
                 / (((1::BIGINT << len(frame)) - 1) * 100.0) AS ewma_value
        FROM framed
    """,
    tags=("extension",),
)
def events_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (decay 1/2) of event value
    per user over the last 16 events — the streaming-features staple
    (fraud scores, rate trackers).

    Exactness trick: weights are powers of two over fixed-point cents,
    so the weighted sum is a Horner fold in exact int64 arithmetic
    (reverse + fold acc*2+x) and the single IEEE division at the end is
    bit-identical in both engines — no float summation order anywhere.
    One shuffle (user partition); the frame fold is per-row compute.
    """
    ev = load_table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(-(_EWMA_FRAME - 1), Window.currentRow)
    )
    return (
        ev.withColumn("c", F.expr("cast(round(value * 100) as bigint)"))
        .withColumn("frame", F.collect_list("c").over(frame))
        .select(
            "user_id",
            "ts_ns",
            "event_id",
            F.expr(
                "cast(aggregate(reverse(frame), cast(0 as bigint),"
                " (acc, x) -> 2 * acc + x) as double)"
                f" / ((shiftleft(cast(1 as bigint), size(frame)) - 1) * 100.0)"
            ).alias("ewma_value"),
        )
    )


_DAY_S = 86400


@register(
    "events_activity_streaks",
    oracle=f"""
        WITH days AS (
            SELECT DISTINCT user_id,
                   (epoch_us(ts) // 1000000) // {_DAY_S} AS day
            FROM events
        ),
        islands AS (
            SELECT user_id, day,
                   day - row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS island
            FROM days
        )
        SELECT user_id,
               min(day) AS start_day,
               max(day) AS end_day,
               count(*) AS streak_days
        FROM islands
        GROUP BY user_id, island
    """,
    tags=("extension",),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the day − row_number() island key. Two exchanges by design: the
    distinct's map-side partial agg collapses events to (user, day)
    pairs BEFORE the first shuffle, so both shuffles move pair-sized
    data — deliberately better at scale than the single-exchange
    repartition(user_id) variant, which would shuffle every raw event.
    The final streak agg adds no exchange (user_id partitioning
    satisfies the (user_id, island) clustering). All-integer day
    arithmetic, no date/timezone functions.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select("user_id", F.expr(f"ts_epoch_s div {_DAY_S}").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        days.withColumn("island", F.expr("day") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("island")
    )


@register(
    "events_time_weighted_avg",
    oracle="""
        WITH seg AS (
            SELECT user_id,
                   cast(round(value * 100) as bigint) AS c,
                   (epoch_us(ts) // 1000000) AS t_s,
                   lead(epoch_us(ts) // 1000000) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS t_next
            FROM events
        )
        SELECT user_id,
               cast(sum(c * (t_next - t_s)) as double)
                 / (sum(t_next - t_s) * 100.0) AS twa_value,
               cast(sum(t_next - t_s) as bigint) AS span_s
        FROM seg
        WHERE t_next IS NOT NULL
        GROUP BY user_id
        HAVING sum(t_next - t_s) > 0
    """,
    tags=("extension",),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the IoT/finance TWAP
    staple): each observation is carried forward until the next one,
    so the average weights values by how long they were current —
    irregular sampling can't bias it the way a plain avg() does.

    Exact arithmetic throughout: fixed-point cents × whole-second
    durations summed in int64 (products bounded ≪ 2^63), one final
    IEEE division — bit-identical across engines. One window exchange
    on user_id; the closing agg is clustered-satisfied (no second
    shuffle). Users with zero observed span drop out (HAVING).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return (
        ev.withColumn("c", F.expr("cast(round(value * 100) as bigint)"))
        .withColumn("t_s", F.col("ts_epoch_s"))
        .withColumn("t_next", F.lead("t_s").over(w))
        .filter(F.col("t_next").isNotNull())
        .groupBy("user_id")
        .agg(
            F.expr(
                "cast(sum(c * (t_next - t_s)) as double)"
                " / (sum(t_next - t_s) * 100.0)"
            ).alias("twa_value"),
            F.expr("cast(sum(t_next - t_s) as bigint)").alias("span_s"),
        )
        .filter(F.col("span_s") > 0)
    )


_DAY_S_H = 86400


def _rollup_hierarchy_sql(dialect_hourly: str, dialect: str) -> str:
    """Shared coarser-grain SQL over an (already-built) hourly partial
    relation: day grain and per-type total, each re-aggregated from the
    next-finer partials — never from raw events.

    This is the continuous-aggregate / hypertable-rollup pattern
    (TimescaleDB, Druid): sums of sums and sums of counts are exact, so
    one corpus-sized shuffle (the hourly aggregation) serves every
    grain; the day and total grains aggregate a relation whose size is
    |hours x types|, independent of fact size. avg at every grain is
    one IEEE division of exact int64 partials, so grains can never
    disagree with each other or the oracle.
    """
    from finalpipeline_spark.functions import dialect as D

    h = dialect_hourly
    day_bucket = D.idiv("hour_epoch_s", _DAY_S_H, dialect)
    return f"""
        day AS (
            SELECT ({day_bucket}) * {_DAY_S_H} AS bucket_epoch_s,
                   event_type,
                   cast(sum(n) as bigint) AS n_events,
                   cast(sum(cents) as bigint) AS cents
            FROM {h} GROUP BY 1, 2
        ),
        total AS (
            SELECT cast(0 as bigint) AS bucket_epoch_s, event_type,
                   cast(sum(n_events) as bigint) AS n_events,
                   cast(sum(cents) as bigint) AS cents
            FROM day GROUP BY event_type
        )
        SELECT 'hour' AS grain, hour_epoch_s AS bucket_epoch_s, event_type,
               n AS n_events,
               cast(cents as double) / 100.0 AS sum_value,
               cast(cents as double) / (100.0 * n) AS avg_value
        FROM {h}
        UNION ALL
        SELECT 'day' AS grain, bucket_epoch_s, event_type, n_events,
               cast(cents as double) / 100.0 AS sum_value,
               cast(cents as double) / (100.0 * n_events) AS avg_value
        FROM day
        UNION ALL
        SELECT 'total' AS grain, bucket_epoch_s, event_type, n_events,
               cast(cents as double) / 100.0 AS sum_value,
               cast(cents as double) / (100.0 * n_events) AS avg_value
        FROM total
    """


@register(
    "events_rollup_hierarchy",
    oracle=f"""
        WITH hourly AS (
            SELECT ((epoch_us(ts) // 1000000) // {_HOUR_S}) * {_HOUR_S} AS hour_epoch_s,
                   event_type,
                   cast(count(*) as bigint) AS n,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) AS cents
            FROM events
            GROUP BY 1, 2
        ),
        {_rollup_hierarchy_sql("hourly", "duck")}
    """,
    tags=("extension",),
)
def events_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour → day → per-type-total rollup hierarchy where every coarser
    grain is re-aggregated from the next-finer grain's *partials* (sum
    of sums / sum of counts), not from raw events — the continuous-
    aggregate pattern. The hourly partial table is materialized once
    (localCheckpoint: it is |hours×types|-sized, not fact-sized) so the
    events table is scanned exactly once for all three grains."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("hour_epoch_s", F.expr(f"(ts_epoch_s div {_HOUR_S}) * {_HOUR_S}"))
        .withColumn("c", F.expr("cast(round(value * 100) as bigint)"))
        .groupBy("hour_epoch_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("cast(sum(c) as bigint)").alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    hourly.createOrReplaceTempView("__fps_ev_hourly")
    return spark.sql(f"WITH {_rollup_hierarchy_sql('__fps_ev_hourly', 'spark')}")


# --------------------------------------------------------------------------
# OHLC bars (time-series resampling: open/high/low/close per bucket)
# --------------------------------------------------------------------------
_BAR_S = 6 * 3600  # 6-hour bars


def _ohlc_sql(dialect: str) -> str:
    """Per event-type OHLC bars: open/close are arg-min/arg-max of the
    integer-cents value by a composite (ts, event_id) key (fixed-width
    string, the attribution trick — event_id uniqueness makes the order
    total), high/low are plain min/max. One fact shuffle onto
    |bars × types| groups; every statistic is associative, so the
    aggregation combines map-side. All integer cents; the float value
    is one division at output."""
    from finalpipeline_spark.functions import dialect as D

    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    bar = f"({D.idiv(epoch_s, _BAR_S, dialect)}) * {_BAR_S}"
    key = (
        f"concat(lpad({D.cast_str(epoch_s, dialect)}, 12, '0'),"
        f" lpad({D.cast_str('event_id', dialect)}, 12, '0'))"
    )
    tbl = "__fps_ev_ohlc" if dialect == D.SPARK else "events"
    return f"""
        WITH priced AS (
            SELECT {bar} AS bar_epoch_s,
                   event_type,
                   cast(round(value * 100) as bigint) AS cents,
                   {key} AS k
            FROM {tbl}
        )
        SELECT bar_epoch_s, event_type,
               cast(min_by(cents, k) as bigint) AS open_cents,
               cast(max(cents) as bigint) AS high_cents,
               cast(min(cents) as bigint) AS low_cents,
               cast(max_by(cents, k) as bigint) AS close_cents,
               cast(count(*) as bigint) AS n_events
        FROM priced
        GROUP BY bar_epoch_s, event_type
    """


@register(
    "events_ohlc_bars",
    oracle=_ohlc_sql("duck"),
    tags=("extension",),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour OHLC bars per event type — the financial resampling
    staple. See _ohlc_sql: associative arg-min/arg-max, map-side
    combining, one fact shuffle."""
    from finalpipeline_spark.functions import dialect as D

    load_table(spark, sf_dir, "events").createOrReplaceTempView("__fps_ev_ohlc")
    return spark.sql(_ohlc_sql(D.SPARK))


# --------------------------------------------------------------------------
# Gap-filled LOCF resampling (time_bucket_gapfill + locf)
# --------------------------------------------------------------------------
_GF_USER_MOD = 20  # sampled user subset keeps the grid demo-sized


def _gapfill_sql(dialect: str) -> str:
    """Regular hourly grid per (sampled) user between that user's first
    and last observation, missing hours filled by last-observation-
    carried-forward — TimescaleDB's time_bucket_gapfill + locf(), the
    step irregular event data needs before any fixed-step model.

    Exactness: grid hours are integer arithmetic; the carried value is
    the hour's LAST observation by the composite (ts, event_id) key;
    LOCF is last_value-ignore-nulls over (user, hour) with an explicit
    ROWS frame — deterministic in both engines.

    Scale shape: one fact shuffle to (user, hour) partials; the grid
    explode is user-span-sized (hours, not events); LOCF is one
    user-partitioned window — no fact-sized window anywhere."""
    from finalpipeline_spark.functions import dialect as D

    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    hour = f"({D.idiv(epoch_s, _HOUR_S, dialect)}) * {_HOUR_S}"
    key = (
        f"concat(lpad({D.cast_str(epoch_s, dialect)}, 12, '0'),"
        f" lpad({D.cast_str('event_id', dialect)}, 12, '0'))"
    )
    tbl = "__fps_ev_gf" if dialect == D.SPARK else "events"
    n_hours = D.idiv("(h1 - h0)", _HOUR_S, dialect)
    if dialect == D.SPARK:
        gen = f"explode(sequence(0, cast({n_hours} as int)))"
        grid = f"SELECT user_id, h0 + i * {_HOUR_S} AS hour_epoch_s FROM (SELECT user_id, h0, h1, {gen} AS i FROM span) g"
        locf = "last_value(cents, true)"
    else:
        grid = f"SELECT user_id, h0 + cast(i as bigint) * {_HOUR_S} AS hour_epoch_s FROM (SELECT user_id, h0, h1, unnest(range(0, {n_hours} + 1)) AS i FROM span) g"
        locf = "last_value(cents IGNORE NULLS)"
    return f"""
        WITH obs AS (
            SELECT user_id, {hour} AS hour_epoch_s,
                   max_by(cast(round(value * 100) as bigint), {key}) AS cents
            FROM {tbl}
            WHERE user_id % {_GF_USER_MOD} = 0
            GROUP BY user_id, {hour}
        ),
        span AS (
            SELECT user_id, min(hour_epoch_s) AS h0, max(hour_epoch_s) AS h1
            FROM obs GROUP BY user_id
        ),
        grid AS ({grid}),
        joined AS (
            SELECT g.user_id, g.hour_epoch_s, o.cents,
                   CASE WHEN o.cents IS NULL THEN 1 ELSE 0 END AS filled
            FROM grid g LEFT JOIN obs o
              ON g.user_id = o.user_id AND g.hour_epoch_s = o.hour_epoch_s
        )
        SELECT user_id, hour_epoch_s,
               cast({locf} OVER (
                   PARTITION BY user_id ORDER BY hour_epoch_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) as bigint) AS cents_locf,
               cast(filled as bigint) AS filled
        FROM joined
    """


@register("events_gapfill_locf", oracle=_gapfill_sql("duck"), tags=("extension",))
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled LOCF series per sampled user (the
    time_bucket_gapfill + locf staple). See _gapfill_sql."""
    from finalpipeline_spark.functions import dialect as D

    load_table(spark, sf_dir, "events").createOrReplaceTempView("__fps_ev_gf")
    return spark.sql(_gapfill_sql(D.SPARK))
