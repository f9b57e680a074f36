"""Customer/retail analytics: RFM segmentation, market-basket lift,
first-touch attribution.

The reference's datamart answered one question (top-k similarity per
target); a warehouse team's first three asks after that are always the
same: who are my customer segments (RFM), what sells together
(basket affinity), and which touchpoint acquired the converters
(attribution). Each is a classic multi-stage aggregation with a sharp
scale shape, expressed here with the repo's exactness rules (integer
cents, total-order ranks, single-rooted IEEE divisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_ORD_VIEW = "__fps_an_orders"
_LI_VIEW = "__fps_an_lineitem"
_EV_VIEW = "__fps_an_events"

_RFM_ANCHOR = "1998-08-02"   # TPC-H q1 anchor: day after the last shipdate
_N_TILES = 4
_BASKET_TOPK = 20


def _ord(dialect: str) -> str:
    return _ORD_VIEW if dialect == D.SPARK else "orders"


def _li(dialect: str) -> str:
    return _LI_VIEW if dialect == D.SPARK else "lineitem"


def _ev(dialect: str) -> str:
    return _EV_VIEW if dialect == D.SPARK else "events"


# --------------------------------------------------------------------------
# RFM segmentation
# --------------------------------------------------------------------------
def _rfm_sql(dialect: str) -> str:
    """Recency/Frequency/Monetary quartile segmentation.

    Exactness: recency is a calendar-day diff of DATE-cast values
    (timezone-free in both engines), frequency an exact count, monetary
    an exact cents sum; each quartile is ntile({_N_TILES}) over a TOTAL
    order (metric + custkey tiebreak), so tile boundaries are
    position-arithmetic both engines compute identically; avg monetary
    per segment is one IEEE division of exact int64 sums.

    Scale shape: one fact shuffle (groupBy custkey), then three
    customer-sized window passes and one segment-sized agg — the
    windows rank customers, never order lines."""
    if dialect == D.SPARK:
        days = f"datediff(date '{_RFM_ANCHOR}', cast(max(o_orderdate) as date))"
    else:
        days = f"date_diff('day', cast(max(o_orderdate) as date), DATE '{_RFM_ANCHOR}')"
    return f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   cast({days} as bigint) AS recency_days,
                   cast(count(*) as bigint) AS frequency,
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
                       AS monetary_cents
            FROM {_ord(dialect)}
            GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey, recency_days, frequency, monetary_cents,
                   ntile({_N_TILES}) OVER (
                       ORDER BY recency_days ASC, o_custkey) AS r_tile,
                   ntile({_N_TILES}) OVER (
                       ORDER BY frequency DESC, o_custkey) AS f_tile,
                   ntile({_N_TILES}) OVER (
                       ORDER BY monetary_cents DESC, o_custkey) AS m_tile
            FROM per_cust
        )
        SELECT cast(r_tile as bigint) AS r_tile,
               cast(f_tile as bigint) AS f_tile,
               cast(m_tile as bigint) AS m_tile,
               cast(count(*) as bigint) AS n_customers,
               cast(sum(monetary_cents) as double)
                   / (100.0 * count(*)) AS avg_monetary
        FROM scored
        GROUP BY r_tile, f_tile, m_tile
    """


@register("orders_rfm_segments", oracle=_rfm_sql(D.DUCK), tags=("extension",))
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segments over the orders fact: customer counts and
    average spend per (R,F,M) cell. See _rfm_sql for the semantics.

    Each quartile is computed by the DISTRIBUTED exact-ntile operator
    (operators/rank.global_ntile_multi: per-metric range exchange +
    offset broadcast, all three metrics counted in ONE driver action) —
    no unpartitioned ``ntile() OVER (ORDER BY ...)`` window anywhere in
    the plan, so no single task ever ranks all |customers| rows. The
    tile arithmetic is bit-identical to the single-window oracle form
    (SQL-standard big-tiles-first boundaries over a total order)."""
    from pyspark.sql import functions as F

    from finalpipeline_spark.operators.rank import global_ntile_multi

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(_ORD_VIEW)
    per_cust = spark.sql(
        f"""
        SELECT o_custkey,
               cast(datediff(date '{_RFM_ANCHOR}',
                             cast(max(o_orderdate) as date)) as bigint)
                   AS recency_days,
               cast(count(*) as bigint) AS frequency,
               cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
                   AS monetary_cents
        FROM {_ORD_VIEW}
        GROUP BY o_custkey
        """
    ).withColumn("neg_frequency", -F.col("frequency")).withColumn(
        "neg_monetary", -F.col("monetary_cents")
    )
    # The three quartile passes are INDEPENDENT total orders over the
    # same per-customer relation, so they run over one cached copy and
    # re-join on the (unique) customer key — chaining them instead
    # threads each pass's range exchange, window and offset join into
    # the next pass's input, so pass k's boundary sampling and
    # checkpoint re-evaluate the k-1 chain (measured: pass times grow
    # 0.37/0.54/0.64 s chained at sf0.01; independent passes are flat).
    # Each pass also range-exchanges only (key, order col), not the
    # full row.
    from finalpipeline_spark.functions.caching import scoped_cache

    per_cust = scoped_cache(per_cust, "orders_rfm_segments")
    specs = [
        (per_cust.select("o_custkey", order_col), [order_col, "o_custkey"], out_col)
        for order_col, out_col in (
            ("recency_days", "r_tile"),
            ("neg_frequency", "f_tile"),
            ("neg_monetary", "m_tile"),
        )
    ]
    tiles = [
        t.select("o_custkey", out_col)
        for t, (_, _, out_col) in zip(
            global_ntile_multi(specs, _N_TILES), specs
        )
    ]
    scored = per_cust.select("o_custkey", "monetary_cents")
    for t in tiles:
        scored = scored.join(t, "o_custkey")
    return scored.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.expr("cast(count(*) as bigint)").alias("n_customers"),
        F.expr(
            "cast(sum(monetary_cents) as double) / (100.0 * count(*))"
        ).alias("avg_monetary"),
    )


# --------------------------------------------------------------------------
# Market-basket affinity (pairwise lift)
# --------------------------------------------------------------------------
def _basket_sql(dialect: str) -> str:
    """Top part pairs by co-occurrence, with support and lift.

    lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) — one IEEE
    expression over four exact int64 counts.

    Scale shape: distinct (order, part) first (map-side dedup of
    multi-line parts), then the pair self-join shuffles on orderkey —
    pair volume is Σ_orders k², bounded by basket size, never |parts|².
    The part-frequency table is |parts|-sized and joined twice (small
    side at any scale: it is the dimension's cardinality)."""
    return f"""
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM {_li(dialect)}
        ),
        n_orders AS (
            SELECT cast(count(DISTINCT l_orderkey) as bigint) AS n
            FROM op
        ),
        part_freq AS (
            SELECT l_partkey, cast(count(*) as bigint) AS n_part
            FROM op GROUP BY l_partkey
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   cast(count(*) as bigint) AS n_ab
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
        )
        SELECT part_a, part_b, n_ab,
               fa.n_part AS n_a, fb.n_part AS n_b,
               cast(n_ab as double) * cast(n_orders.n as double)
                   / (cast(fa.n_part as double) * cast(fb.n_part as double))
                   AS lift
        FROM pairs
        JOIN part_freq fa ON pairs.part_a = fa.l_partkey
        JOIN part_freq fb ON pairs.part_b = fb.l_partkey
        CROSS JOIN n_orders
        ORDER BY n_ab DESC, part_a, part_b
        LIMIT {_BASKET_TOPK}
    """


@register("lineitem_basket_lift", oracle=_basket_sql(D.DUCK), tags=("extension",))
def lineitem_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchased part pairs with lift. See
    _basket_sql for the Σk² pair bound."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(_LI_VIEW)
    return spark.sql(_basket_sql(D.SPARK))


# --------------------------------------------------------------------------
# First-touch attribution
# --------------------------------------------------------------------------
def _attribution_sql(dialect: str) -> str:
    """Which first-touch event type acquired the users who went on to
    purchase: first event per user by a total order (ts, event_id), a
    conversion flag from one conditional aggregate, then a channel-
    sized rollup with conversion rate as one division of exact counts.

    Scale shape: ONE user-keyed aggregation computes both the first
    touch (min of a (ts, event_id, type) struct — associative, no
    window, no second scan) and the conversion flag; the rollup input
    is |users| rows."""
    # arg-min on a composite (second, event_id) key, identical in both
    # engines: fixed-width zero-padded string concat compares exactly
    # like the integer tuple (event_id is unique → no key ties).
    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    cstr = D.cast_str
    key = (
        f"concat(lpad({cstr(epoch_s, dialect)}, 12, '0'),"
        f" lpad({cstr('event_id', dialect)}, 12, '0'))"
    )
    first_type = f"min_by(event_type, {key})"
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   {first_type} AS first_touch,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM {_ev(dialect)}
            GROUP BY user_id
        )
        SELECT first_touch,
               cast(count(*) as bigint) AS n_users,
               cast(sum(converted) as bigint) AS n_converted,
               cast(sum(converted) as double) / cast(count(*) as double)
                   AS conversion_rate
        FROM per_user
        GROUP BY first_touch
    """


@register(
    "events_first_touch_attribution",
    oracle=_attribution_sql(D.DUCK),
    tags=("extension",),
)
def events_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate by acquisition (first-touch) event type. See
    _attribution_sql — one user-keyed aggregation, no window."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    return spark.sql(_attribution_sql(D.SPARK))


# --------------------------------------------------------------------------
# Distributed exact ntile (operators/rank.py) under oracle check
# --------------------------------------------------------------------------
def _spend_tiles_oracle() -> str:
    return f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
                       AS spend_cents
            FROM orders GROUP BY o_custkey
        ),
        tiled AS (
            SELECT o_custkey, spend_cents,
                   ntile({_N_TILES}) OVER (
                       ORDER BY spend_cents DESC, o_custkey) AS tile
            FROM per_cust
        )
        SELECT cast(tile as bigint) AS tile,
               cast(count(*) as bigint) AS n_customers,
               cast(min(spend_cents) as bigint) AS min_cents,
               cast(max(spend_cents) as bigint) AS max_cents
        FROM tiled GROUP BY tile
    """


@register("orders_spend_tiles", oracle=_spend_tiles_oracle(), tags=("extension",))
def orders_spend_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles computed by the DISTRIBUTED exact-ntile
    operator (operators/rank.global_ntile: range exchange + offset
    broadcast — no global single-partition window anywhere in the
    plan), hash-checked against the oracle's single ntile window: the
    scale path provably equals the textbook plan it replaces."""
    from pyspark.sql import functions as F

    from finalpipeline_spark.operators.rank import global_ntile

    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr("cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)")
            .alias("spend_cents")
        )
        .withColumn("neg_spend", -F.col("spend_cents"))
    )
    tiled = global_ntile(per_cust, ["neg_spend", "o_custkey"], _N_TILES)
    return tiled.groupBy("tile").agg(
        F.expr("cast(count(*) as bigint)").alias("n_customers"),
        F.expr("cast(min(spend_cents) as bigint)").alias("min_cents"),
        F.expr("cast(max(spend_cents) as bigint)").alias("max_cents"),
    )


# --------------------------------------------------------------------------
# Last-touch attribution (sibling of first-touch: max_by on the same key)
# --------------------------------------------------------------------------
def _last_touch_sql(dialect: str) -> str:
    """Same single-aggregation shape as _attribution_sql, arg-MAX on
    the composite key: the touchpoint closest to the conversion."""
    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    cstr = D.cast_str
    key = (
        f"concat(lpad({cstr(epoch_s, dialect)}, 12, '0'),"
        f" lpad({cstr('event_id', dialect)}, 12, '0'))"
    )
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   max_by(event_type, {key}) AS last_touch,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM {_ev(dialect)}
            GROUP BY user_id
        )
        SELECT last_touch,
               cast(count(*) as bigint) AS n_users,
               cast(sum(converted) as bigint) AS n_converted
        FROM per_user
        GROUP BY last_touch
    """


@register(
    "events_last_touch_attribution",
    oracle=_last_touch_sql(D.DUCK),
    tags=("extension",),
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion counts by final (last-touch) event type — arg-max by
    the same composite key as first-touch, one user-keyed aggregation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    return spark.sql(_last_touch_sql(D.SPARK))


# --------------------------------------------------------------------------
# Funnel latency percentiles (signup → purchase)
# --------------------------------------------------------------------------
def _funnel_converted_sql(dialect: str) -> str:
    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    return f"""
        WITH signup AS (
            SELECT user_id, min({epoch_s}) AS s0
            FROM {_ev(dialect)} WHERE event_type = 'signup'
            GROUP BY user_id
        )
        SELECT e.user_id,
               cast(min({epoch_s}) - max(s.s0) as bigint) AS delta_s
        FROM {_ev(dialect)} e JOIN signup s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND {epoch_s} >= s.s0
        GROUP BY e.user_id
    """


def _funnel_latency_sql(dialect: str, ranked_rel: str | None = None) -> str:
    """Time-to-convert distribution: per user, seconds from first
    signup to the first purchase AFTER it; exact p50/p90 by
    rank-selection over the converted-user relation (value at rank
    ceil(q·n) in the (delta, user_id) total order — deterministic, no
    interpolation ambiguity). All integer epoch math. The SHIPPED
    Spark path ranks converted users with the two-phase global rank
    (operators/rank.assign_global_rank — ``ranked_rel``) and takes n
    from a 1-row broadcast; the oracle keeps the textbook window."""
    if ranked_rel:
        ranked = ranked_rel
        prelude = "WITH "
    else:
        ranked = "ranked"
        prelude = f"""
        WITH converted AS ({_funnel_converted_sql(dialect)}),
        ranked AS (
            SELECT user_id, delta_s,
                   row_number() OVER (ORDER BY delta_s, user_id) AS rk
            FROM converted
        ),"""
    return f"""{prelude}
        t AS (SELECT delta_s, rk FROM {ranked}),
        nn AS (SELECT cast(count(*) as bigint) AS n FROM t)
        SELECT nn.n AS n_converted,
               cast(max(CASE WHEN t.rk = cast(ceil(0.5 * nn.n) as bigint)
                             THEN t.delta_s END) as bigint) AS p50_s,
               cast(max(CASE WHEN t.rk = cast(ceil(0.9 * nn.n) as bigint)
                             THEN t.delta_s END) as bigint) AS p90_s
        FROM t CROSS JOIN nn
        GROUP BY nn.n
    """


@register(
    "events_funnel_latency",
    oracle=_funnel_latency_sql(D.DUCK),
    tags=("extension",),
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase latency: exact rank-selected p50/p90 seconds
    over converted users; rank from the two-phase decomposition. See
    _funnel_latency_sql."""
    from finalpipeline_spark.operators.rank import assign_global_rank

    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    converted = spark.sql(_funnel_converted_sql(D.SPARK))
    ranked = assign_global_rank(converted, ["delta_s", "user_id"], out_col="rk")
    ranked.createOrReplaceTempView("__fps_an_funnel_ranked")
    return spark.sql(
        _funnel_latency_sql(D.SPARK, ranked_rel="__fps_an_funnel_ranked")
    )


# --------------------------------------------------------------------------
# Cohort LTV matrix (first-order-year cohorts × account age)
# --------------------------------------------------------------------------
def _ltv_sql(dialect: str) -> str:
    """Average cumulative spend per customer by (first-order-year
    cohort, years since first order) — the LTV curve a growth team
    reads. All money in exact cents; the cumulative window runs per
    cohort over |years| rows; avg = one division by the cohort size."""
    if dialect == D.SPARK:
        yr = "year(cast(o_orderdate as date))"
    else:
        yr = "date_part('year', cast(o_orderdate as date))"
    return f"""
        WITH per_order AS (
            SELECT o_custkey, cast({yr} as bigint) AS yr,
                   cast(round(o_totalprice * 100) as bigint) AS cents
            FROM {_ord(dialect)}
        ),
        first_year AS (
            SELECT o_custkey, min(yr) AS cohort_year FROM per_order
            GROUP BY o_custkey
        ),
        cohort_size AS (
            SELECT cohort_year, cast(count(*) as bigint) AS n_customers
            FROM first_year GROUP BY cohort_year
        ),
        spend AS (
            SELECT f.cohort_year, p.yr - f.cohort_year AS age_years,
                   cast(sum(p.cents) as bigint) AS cents
            FROM per_order p JOIN first_year f ON p.o_custkey = f.o_custkey
            GROUP BY f.cohort_year, p.yr - f.cohort_year
        ),
        cum AS (
            SELECT cohort_year, age_years,
                   cast(sum(cents) OVER (PARTITION BY cohort_year
                       ORDER BY age_years
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
                       AS cum_cents
            FROM spend
        )
        SELECT c.cohort_year, c.age_years AS age_years,
               s.n_customers,
               cast(c.cum_cents as double) / (100.0 * cast(s.n_customers as double))
                   AS avg_cum_ltv
        FROM cum c JOIN cohort_size s ON c.cohort_year = s.cohort_year
    """


@register("orders_cohort_ltv", oracle=_ltv_sql(D.DUCK), tags=("extension",))
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix: average cumulative spend per customer by
    first-order-year cohort and account age. See _ltv_sql."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(_ORD_VIEW)
    return spark.sql(_ltv_sql(D.SPARK))


# --------------------------------------------------------------------------
# Pareto / ABC analysis (revenue concentration)
# --------------------------------------------------------------------------
def _abc_per_part_sql(dialect: str) -> str:
    return f"""
            SELECT l_partkey,
                   cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint)
                       AS cents
            FROM {_li(dialect)}
            GROUP BY l_partkey
    """


def _abc_sql(dialect: str, ranked_rel: str | None = None) -> str:
    """ABC classification of parts by revenue share: rank parts by
    exact-cents revenue, classify by cumulative share (A ≤ 80%,
    B ≤ 95%, C above) — the 80/20 inventory-analysis staple.

    Exactness: the class boundaries compare cum_cents * 100 against
    threshold * total_cents in exact int64 — no floating-point share is
    ever compared. Scale shape: one fact shuffle to |parts| partials;
    the SHIPPED Spark path computes the cumulative revenue with the
    two-phase prefix sum (operators/rank.partitioned_prefix_sum —
    ``ranked_rel``), so no single task ever windows all parts; the
    oracle keeps the textbook unpartitioned cumulative window."""
    if ranked_rel:
        ranked = ranked_rel
        prelude = "WITH "
    else:
        ranked = "ranked"
        prelude = f"""
        WITH per_part AS ({_abc_per_part_sql(dialect)}),
        ranked AS (
            SELECT l_partkey, cents,
                   cast(sum(cents) OVER (ORDER BY cents DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
                       AS cum_cents
            FROM per_part
        ),"""
    return f"""{prelude}
        tot AS (
            SELECT cast(sum(cents) as bigint) AS total FROM {ranked}
        ),
        classed AS (
            SELECT CASE WHEN cum_cents * 100 <= 80 * tot.total THEN 'A'
                        WHEN cum_cents * 100 <= 95 * tot.total THEN 'B'
                        ELSE 'C' END AS abc_class,
                   cents
            FROM {ranked} CROSS JOIN tot
        )
        SELECT abc_class,
               cast(count(*) as bigint) AS n_parts,
               cast(sum(cents) as bigint) AS class_cents,
               cast(sum(cents) as double)
                   / cast((SELECT total FROM tot) as double) AS revenue_share
        FROM classed
        GROUP BY abc_class
    """


@register("lineitem_abc_analysis", oracle=_abc_sql(D.DUCK), tags=("extension",))
def lineitem_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC revenue classification of parts (A ≤ 80% cumulative
    share, B ≤ 95%, C the tail) — exact-integer class boundaries;
    cumulative revenue from the two-phase prefix sum. See _abc_sql."""
    from pyspark.sql import functions as F

    from finalpipeline_spark.operators.rank import partitioned_prefix_sum

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(_LI_VIEW)
    per_part = spark.sql(_abc_per_part_sql(D.SPARK)).withColumn(
        "neg_cents", -F.col("cents")
    )
    ranked = partitioned_prefix_sum(
        per_part, [], ["neg_cents", "l_partkey"], "cents", out_col="cum_cents"
    )
    ranked.createOrReplaceTempView("__fps_an_abc_ranked")
    return spark.sql(_abc_sql(D.SPARK, ranked_rel="__fps_an_abc_ranked"))


# --------------------------------------------------------------------------
# Weekly seasonality heatmap (day-of-week × hour)
# --------------------------------------------------------------------------
def _dow_hour_sql(dialect: str) -> str:
    """Activity matrix by (day-of-week, hour-of-day) — the seasonality
    profile capacity planning reads. Pure integer epoch arithmetic
    (1970-01-01 was a Thursday → dow = (days + 4) % 7 with Sunday=0),
    so both engines agree bit-for-bit and no timezone is involved."""
    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    days = D.idiv(epoch_s, 86400, dialect)
    hour = f"({D.idiv(epoch_s, 3600, dialect)}) % 24"
    return f"""
        SELECT cast((({days}) + 4) % 7 as bigint) AS dow,
               cast({hour} as bigint) AS hour,
               cast(count(*) as bigint) AS n_events,
               cast(count(DISTINCT user_id) as bigint) AS n_users
        FROM {_ev(dialect)}
        GROUP BY 1, 2
    """


@register("events_dow_hour_heatmap", oracle=_dow_hour_sql(D.DUCK), tags=("extension",))
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix (≤168 rows), exact
    integer epoch math. See _dow_hour_sql."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    return spark.sql(_dow_hour_sql(D.SPARK))


# --------------------------------------------------------------------------
# Simpson diversity index (language mix per source)
# --------------------------------------------------------------------------
def _simpson_sql(dialect: str) -> str:
    """Per-source language diversity: Simpson's index
    D = Σ n_i(n_i−1) / (N(N−1)) — the probability two random docs from
    a source share a language. All counts exact int64; one division per
    source. Scale: one corpus shuffle to (source, lang) partials, then
    a |sources|-sized rollup."""
    return f"""
        WITH sl AS (
            SELECT source, lang, cast(count(*) as bigint) AS n
            FROM {_doc_tbl_an(dialect)}
            GROUP BY source, lang
        )
        SELECT source,
               cast(sum(n) as bigint) AS n_docs,
               cast(count(*) as bigint) AS n_langs,
               cast(sum(n * (n - 1)) as double)
                   / (cast(sum(n) as double) * cast(sum(n) - 1 as double))
                   AS simpson_index
        FROM sl
        GROUP BY source
    """


_DOC_VIEW_AN = "__fps_an_docs"


def _doc_tbl_an(dialect: str) -> str:
    return _DOC_VIEW_AN if dialect == D.SPARK else "documents"


@register("doc_simpson_diversity", oracle=_simpson_sql(D.DUCK), tags=("extension",))
def doc_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson language-diversity index per source — exact-count
    homogeneity measure for corpus-mix monitoring. See _simpson_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(_DOC_VIEW_AN)
    return spark.sql(_simpson_sql(D.SPARK))


# --------------------------------------------------------------------------
# Seasonal decomposition (additive trend/seasonal/residual over events)
# --------------------------------------------------------------------------
def _seasonal_cells_sql(dialect: str) -> str:
    """The (day, hour) → count cell aggregation both engines share."""
    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    day = D.idiv(epoch_s, 86400, dialect)
    hour = f"({D.idiv(epoch_s, 3600, dialect)}) % 24"
    return f"""
            SELECT cast({day} as bigint) AS day,
                   cast({hour} as bigint) AS hour,
                   cast(count(*) as bigint) AS y
            FROM {_ev(dialect)}
            GROUP BY 1, 2
    """


def _seasonal_sql(dialect: str, cells_rel: str | None = None) -> str:
    """STL-style additive decomposition of the hourly event series into
    trend + seasonal + residual, in the exact two-way-effects
    formulation:

        y[day,hour] = trend(day) + seasonal(hour) + residual

    with trend(day) = mean of the day's hourly counts, seasonal(hour) =
    hour-of-day mean minus the grand mean (so effects are centered),
    and residual the remainder. Exactness: every sum/count is int64
    (pure integer epoch bucketing, like events_dow_hour_heatmap — no
    timezone); each emitted double is ONE fixed IEEE expression over
    those exact integers, with identical parse structure in both
    dialects, so the engines agree bit-for-bit.

    Scale shape: one fact shuffle to (day, hour) cells; everything
    after is cell-sized (days × 24): the day/hour/grand effect tables
    are tiny and broadcast back onto the cells. The Spark path stages
    the cells relation once (scoped cache) because FOUR consumers read
    it and Spark inlines CTEs — without staging, the fact would be
    scanned and aggregated four times."""
    cells_sql = _seasonal_cells_sql(dialect)
    cells = cells_rel if cells_rel else f"({cells_sql})"
    return f"""
        WITH cells AS (SELECT * FROM {cells}),
        grand AS (
            SELECT cast(sum(y) as bigint) AS g, cast(count(*) as bigint) AS n
            FROM cells
        ),
        day_eff AS (
            SELECT day, cast(sum(y) as bigint) AS sd,
                   cast(count(*) as bigint) AS nd
            FROM cells GROUP BY day
        ),
        hour_eff AS (
            SELECT hour, cast(sum(y) as bigint) AS sh,
                   cast(count(*) as bigint) AS nh
            FROM cells GROUP BY hour
        )
        SELECT c.day, c.hour, c.y,
               cast(d.sd as double) / cast(d.nd as double) AS trend,
               (cast(h.sh as double) / cast(h.nh as double))
                   - (cast(g.g as double) / cast(g.n as double)) AS seasonal,
               cast(c.y as double)
                   - (cast(d.sd as double) / cast(d.nd as double))
                   - ((cast(h.sh as double) / cast(h.nh as double))
                      - (cast(g.g as double) / cast(g.n as double)))
                   AS residual
        FROM cells c
        JOIN day_eff d ON c.day = d.day
        JOIN hour_eff h ON c.hour = h.hour
        CROSS JOIN grand g
    """


@register("events_seasonal_decompose", oracle=_seasonal_sql(D.DUCK), tags=("extension",))
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the hourly event series
    (trend = day level, seasonal = centered hour-of-day effect,
    residual = remainder). See _seasonal_sql for exactness and the
    cell-sized scale shape; the cells relation is staged (scoped cache)
    so the fact is scanned once for its four consumers."""
    from finalpipeline_spark.functions.caching import scoped_cache

    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    cells = scoped_cache(
        spark.sql(_seasonal_cells_sql(D.SPARK)), "events_seasonal_decompose"
    )
    cells.createOrReplaceTempView("__fps_an_seasonal_cells")
    return spark.sql(_seasonal_sql(D.SPARK, cells_rel="__fps_an_seasonal_cells"))


# --------------------------------------------------------------------------
# Shannon entropy of the language mix per source (Simpson's sibling)
# --------------------------------------------------------------------------
_AN_LN_SCALE = 1_000_000  # micro-nat quantization of ln(count)


def _entropy_sql(dialect: str) -> str:
    """Per-source Shannon entropy of the language distribution, in the
    exact count form

        H = ln(N) - (1/N) * sum_i n_i * ln(n_i)

    with the curation.doc_lm_perplexity fixed-point parity scheme:
    ln(n_i) is quantized to integer micro-nats (floor of an identical
    double is identical in both engines), so the cross-language sum is
    exact int64 arithmetic — order-independent — and only the final
    ln(N) and one division run in IEEE on identical operands. Also
    emits normalized entropy H / ln(n_langs) (evenness), NULL for
    single-language sources.

    Scale shape: one corpus shuffle to (source, lang) partials, then a
    |sources|-sized rollup — doc_simpson_diversity's shape exactly."""
    qln = (
        f"cast(floor(ln(cast(n as double)) * {_AN_LN_SCALE}.0 + 0.5) as bigint)"
    )
    return f"""
        WITH sl AS (
            SELECT source, lang, cast(count(*) as bigint) AS n
            FROM {_doc_tbl_an(dialect)}
            GROUP BY source, lang
        ),
        q AS (
            SELECT source, n, {qln} AS qln FROM sl
        ),
        agg AS (
            SELECT source,
                   cast(sum(n) as bigint) AS n_docs,
                   cast(count(*) as bigint) AS n_langs,
                   cast(sum(n * qln) as bigint) AS qsum
            FROM q
            GROUP BY source
        )
        SELECT source, n_docs, n_langs,
               (ln(cast(n_docs as double))
                - cast(qsum as double)
                  / ({_AN_LN_SCALE}.0 * cast(n_docs as double)))
                   AS entropy_nats,
               CASE WHEN n_langs > 1 THEN
                   (ln(cast(n_docs as double))
                    - cast(qsum as double)
                      / ({_AN_LN_SCALE}.0 * cast(n_docs as double)))
                   / ln(cast(n_langs as double))
               END AS evenness
        FROM agg
    """


@register("doc_entropy_by_source", oracle=_entropy_sql(D.DUCK), tags=("extension",))
def doc_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (and evenness) of each source's language mix —
    the log-scale diversity diagnostic next to doc_simpson_diversity's
    collision probability. See _entropy_sql for the micro-nat parity
    scheme."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(_DOC_VIEW_AN)
    return spark.sql(_entropy_sql(D.SPARK))


# --------------------------------------------------------------------------
# Autocorrelation function of the hourly event series
# --------------------------------------------------------------------------
_ACF_MAX_LAG = 24


def _acf_sql(dialect: str) -> str:
    """Sample autocorrelation r_k of the zero-filled hourly event-count
    series at lags 1..{max_lag}:

        r_k = sum_t (y_t - m)(y_{{t-k}} - m) / sum_t (y_t - m)^2

    computed in the algebraically expanded form so every data-sized
    aggregate is EXACT int64 (counts, pairwise products, squares) and
    each emitted double is one fixed IEEE expression over those
    integers — identical parse structure in both dialects, so the
    engines agree bit-for-bit (the events_seasonal_decompose parity
    scheme).  The series is zero-filled over [min_hour, max_hour]
    (gap hours contribute y=0), so n_terms is always n - k and the
    estimator is the standard one for a regular series.

    Scale shape: ONE fact shuffle to (hour → count) cells; everything
    downstream is series-sized (hours × lags), orders of magnitude
    smaller than the data — the lag alignment is an equi-join on the
    hour index (h = h + k), never a data-sized window, and the global
    moments enter via a 1-row cross join."""
    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    hour = D.idiv(epoch_s, 3600, dialect)
    if dialect == D.SPARK:
        dense_h = "explode(sequence(b.hmin, b.hmax))"
        lag_k = f"explode(sequence(1, {_ACF_MAX_LAG}))"
    else:
        dense_h = "unnest(generate_series(b.hmin, b.hmax))"
        lag_k = f"unnest(generate_series(1, {_ACF_MAX_LAG}))"
    return f"""
        WITH hours AS (
            SELECT cast({hour} as bigint) AS h,
                   cast(count(*) as bigint) AS y
            FROM {_ev(dialect)}
            GROUP BY 1
        ),
        bounds AS (SELECT min(h) AS hmin, max(h) AS hmax FROM hours),
        dense AS (
            SELECT d.h, cast(coalesce(c.y, 0) as bigint) AS y
            FROM (SELECT {dense_h} AS h FROM bounds b) d
            LEFT JOIN hours c ON d.h = c.h
        ),
        gmom AS (
            SELECT cast(count(*) as bigint) AS n,
                   cast(sum(y) as bigint) AS s,
                   cast(sum(y * y) as bigint) AS syy
            FROM dense
        ),
        lags AS (SELECT cast(k as bigint) AS k FROM (SELECT {lag_k} AS k) lk),
        pairs AS (
            SELECT l.k,
                   cast(count(*) as bigint) AS n_terms,
                   cast(sum(a.y * c.y) as bigint) AS sxy,
                   cast(sum(a.y) as bigint) AS sx,
                   cast(sum(c.y) as bigint) AS sy
            FROM lags l
            JOIN dense a ON 1 = 1
            JOIN dense c ON c.h = a.h + l.k
            GROUP BY l.k
        )
        SELECT p.k AS lag,
               p.n_terms,
               (cast(p.sxy as double)
                - (cast(g.s as double) / cast(g.n as double))
                  * cast(p.sx as double)
                - (cast(g.s as double) / cast(g.n as double))
                  * cast(p.sy as double)
                + cast(p.n_terms as double)
                  * (cast(g.s as double) / cast(g.n as double))
                  * (cast(g.s as double) / cast(g.n as double)))
               / nullif(cast(g.syy as double)
                        - cast(g.n as double)
                          * (cast(g.s as double) / cast(g.n as double))
                          * (cast(g.s as double) / cast(g.n as double)),
                        0.0) AS acf
        FROM pairs p
        CROSS JOIN gmom g
    """


@register("events_autocorrelation", oracle=_acf_sql(D.DUCK), tags=("extension",))
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the hourly event series at lags 1..24
    — the periodicity diagnostic that pairs with
    events_seasonal_decompose (a daily cycle shows as a peak at lag
    24). See _acf_sql for the exact-integer parity scheme and the
    series-sized scale shape."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    return spark.sql(_acf_sql(D.SPARK))


# --------------------------------------------------------------------------
# Holt linear-trend exponential smoothing of the daily series per type
# --------------------------------------------------------------------------
_HOLT_ALPHA = "cast(0.3 as double)"   # level gain (cast: Spark parses bare
_HOLT_BETA = "cast(0.1 as double)"    # trend gain   0.3 literals as DECIMAL)


def _holt_sql(dialect: str) -> str:
    """Holt double (linear-trend) exponential smoothing of each event
    type's zero-filled daily count series:

        l_t = a*y_t + (1-a)*(l_{{t-1}} + b_{{t-1}})
        b_t = B*(l_t - l_{{t-1}}) + (1-B)*b_{{t-1}}

    initialized l_1 = y_1, b_1 = y_2 - y_1, folded LEFT-TO-RIGHT over
    the ordered series — the trend-aware sibling of events_ewma_value
    (which this family's fold-parity scheme comes from): both engines
    fold the same array in the same order with the same IEEE expression
    tree (every leaf cast double; the series elements are wrapped in
    {{'l','b'}} structs so the lambda TEXT is identical — only the
    struct constructor differs per dialect), so level/trend/forecast
    agree bit-for-bit with no rounding step.

    Scale shape: one fact shuffle to (type, day) cells, then one
    |types|-row aggregation whose per-row fold is O(days) — series
    length scales with calendar time, not data volume; the dense grid
    (types x days, gap days = 0) comes from a broadcast-sized
    generate/sequence, and the 1-row bounds cross join is the same
    device as events_autocorrelation."""
    epoch_s = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    day = D.idiv(epoch_s, 86400, dialect)
    a, b = _HOLT_ALPHA, _HOLT_BETA
    one_m_a, one_m_b = f"(cast(1 as double) - {a})", f"(cast(1 as double) - {b})"
    if dialect == D.SPARK:
        dense_day = "explode(sequence(bo.dmin, bo.dmax))"
        ys = "transform(array_sort(collect_list(named_struct('day', day, 'y', y))), s -> cast(s.y as double))"
        tail = "transform(slice(ys, 3, size(ys) - 2), v -> named_struct('l', v, 'b', cast(0 as double)))"
        seed = "named_struct('l', element_at(ys, 1), 'b', element_at(ys, 2) - element_at(ys, 1))"
        n_days = "cast(size(ys) as bigint)"
        lp = "(" + a + " * x.l + " + one_m_a + " * (acc.l + acc.b))"
        step = (
            f"named_struct('l', {lp}, "
            f"'b', {b} * ({lp} - acc.l) + {one_m_b} * acc.b)"
        )
        fold = f"aggregate({tail}, {seed}, (acc, x) -> {step})"
    else:
        # The oracle CANNOT use list_reduce with a struct accumulator:
        # DuckDB evaluates the lambda's struct fields by overwriting
        # the accumulator IN PLACE, so from the second iteration on a
        # later field ('b') reads the earlier field's freshly-written
        # value ('l' of THIS step) instead of the old state — verified
        # against a Python reference fold (Spark's aggregate() is
        # correct).  A recursive CTE carries (l, b) as plain columns —
        # no in-place aliasing — with the same per-step expression
        # tree, so the engines still agree bit-for-bit.
        dense_day = "unnest(generate_series(bo.dmin, bo.dmax))"
        lp = f"({a} * e.x + {one_m_a} * (r.l + r.b))"
        return f"""
        WITH RECURSIVE cells AS (
            SELECT event_type, cast({day} as bigint) AS day,
                   cast(count(*) as bigint) AS y
            FROM {_ev(dialect)}
            GROUP BY 1, 2
        ),
        bounds AS (SELECT min(day) AS dmin, max(day) AS dmax FROM cells),
        grid AS (
            SELECT t.event_type, d.day
            FROM (SELECT DISTINCT event_type FROM cells) t
            CROSS JOIN (SELECT {dense_day} AS day FROM bounds bo) d
        ),
        dense AS (
            SELECT g.event_type, g.day,
                   cast(coalesce(c.y, 0) as bigint) AS y
            FROM grid g
            LEFT JOIN cells c
              ON c.event_type = g.event_type AND c.day = g.day
        ),
        idx AS (
            SELECT event_type,
                   row_number() OVER (PARTITION BY event_type ORDER BY day)
                       AS i,
                   cast(y as double) AS x
            FROM dense
        ),
        n AS (
            SELECT event_type, cast(count(*) as bigint) AS n_days
            FROM idx GROUP BY 1
        ),
        rec AS (
            SELECT e1.event_type, 2 AS i, e1.x AS l, e2.x - e1.x AS b
            FROM idx e1
            JOIN idx e2 ON e2.event_type = e1.event_type AND e2.i = 2
            WHERE e1.i = 1
            UNION ALL
            SELECT r.event_type, r.i + 1,
                   {lp} AS l,
                   {b} * ({lp} - r.l) + {one_m_b} * r.b AS b
            FROM rec r
            JOIN idx e ON e.event_type = r.event_type AND e.i = r.i + 1
        )
        SELECT r.event_type, n.n_days,
               r.l AS level,
               r.b AS trend,
               (r.l + r.b) AS forecast_next
        FROM rec r
        JOIN n ON n.event_type = r.event_type
        WHERE r.i = n.n_days AND n.n_days >= 3
    """
    return f"""
        WITH cells AS (
            SELECT event_type, cast({day} as bigint) AS day,
                   cast(count(*) as bigint) AS y
            FROM {_ev(dialect)}
            GROUP BY 1, 2
        ),
        bounds AS (SELECT min(day) AS dmin, max(day) AS dmax FROM cells),
        grid AS (
            SELECT t.event_type, d.day
            FROM (SELECT DISTINCT event_type FROM cells) t
            CROSS JOIN (SELECT {dense_day} AS day FROM bounds bo) d
        ),
        dense AS (
            SELECT g.event_type, g.day,
                   cast(coalesce(c.y, 0) as bigint) AS y
            FROM grid g
            LEFT JOIN cells c
              ON c.event_type = g.event_type AND c.day = g.day
        ),
        series AS (
            SELECT event_type, {ys} AS ys
            FROM dense
            GROUP BY event_type
        ),
        fitted AS (
            SELECT event_type, {n_days} AS n_days, {fold} AS st
            FROM series
            WHERE {n_days} >= 3
        )
        SELECT event_type, n_days,
               st.l AS level,
               st.b AS trend,
               (st.l + st.b) AS forecast_next
        FROM fitted
    """


@register("events_holt_smoothing", oracle=_holt_sql(D.DUCK), tags=("extension",))
def events_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing per event type: final level, trend,
    and one-step forecast over the zero-filled daily series. See
    _holt_sql for the fold-parity scheme and series-sized scale
    shape."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    return spark.sql(_holt_sql(D.SPARK))
