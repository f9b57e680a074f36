"""Extended operator surface beyond the reference (SURVEY.md §2 'not
present' gaps + north-star additions): multi-level aggregation
(rollup, cube + grouping id), date arithmetic, lag/lead deltas and the
rank-function family, per-group top-k users, edit-distance near-dup,
LSH-bucketed embedding near-dup, skew-safe two-phase aggregation,
approximate distinct counting and quantile sketches, FULL OUTER
reconciliation, conversion funnel, and cohort retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.functions.caching import scoped_cache
from finalpipeline_spark.functions.numeric import exact_avg_sql, exact_sum, exact_sum_sql
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table


# --------------------------------------------------------------------------
# ROLLUP — multi-level aggregates (absent from the reference; A-extension)
# --------------------------------------------------------------------------
@register(
    "tpch_rollup_sales",
    oracle=f"""
        SELECT p_brand, l_returnflag,
               {exact_sum_sql("l_extendedprice", 2)} AS sum_price,
               count(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY ROLLUP (p_brand, l_returnflag)
    """,
    tags=("extension",),
)
def tpch_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (brand, returnflag): per-group, per-brand subtotal,
    and grand total in one pass (Spark expands to grouping sets with
    partial aggregation — one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_brand", "l_returnflag")
        .agg(
            exact_sum(F.col("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Date arithmetic (the reference had none; F-extension)
# --------------------------------------------------------------------------
@register(
    "orders_date_math",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)::int AS order_year,
               month(o_orderdate)::int AS order_month,
               date_diff('day', DATE '1995-01-01', o_orderdate)::int AS days_since_epoch_start,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        FROM orders
    """,
    tags=("extension",),
)
def orders_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction, datediff, date_trunc — all tz-safe on the
    naive (NTZ) order dates."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_epoch_start"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


# --------------------------------------------------------------------------
# lag/lead deltas (window surface beyond row_number)
# --------------------------------------------------------------------------
@register(
    "events_user_deltas",
    oracle="""
        SELECT user_id, event_id, es,
               (es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id))::bigint
                   AS delta_s,
               (lead(es) OVER (PARTITION BY user_id ORDER BY es, event_id) - es)::bigint
                   AS next_in_s
        FROM (SELECT user_id, event_id, (epoch_us(ts) // 1000000) AS es FROM events) t
    """,
    tags=("extension",),
)
def events_user_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user via lag/lead (the building block under
    sessionization, exposed as its own operator)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_epoch_s").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "es",
        (F.col("es") - F.lag("es").over(w)).cast("long").alias("delta_s"),
        (F.lead("es").over(w) - F.col("es")).cast("long").alias("next_in_s"),
    )


@register(
    "events_top_users_per_type",
    oracle="""
        SELECT event_type, user_id, n_events, rn::int AS rn
        FROM (
            SELECT event_type, user_id, n_events,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY n_events DESC, user_id) AS rn
            FROM (
                SELECT event_type, user_id, count(*) AS n_events
                FROM events GROUP BY event_type, user_id
            ) c
        ) r WHERE rn <= 3
    """,
    tags=("extension",),
)
def events_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate then rank: top-3 most active users per event type
    (count shuffle + window shuffle — the canonical two-shuffle shape;
    map-side partial counts keep the first one small)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"), "user_id")
    return counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


# --------------------------------------------------------------------------
# Edit-distance near-dup (string-similarity family; levenshtein is
# exact-integer so cross-engine parity is trivial)
# --------------------------------------------------------------------------
@register(
    "doc_edit_distance_pairs",
    oracle="""
        WITH d AS (
            SELECT doc_id, text, source, n_chars // 100 AS blk FROM documents
        )
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               levenshtein(a.text, b.text)::int AS edit_distance,
               (1.0 - levenshtein(a.text, b.text)::double
                     / greatest(length(a.text), length(b.text))) AS edit_similarity
        FROM d a JOIN d b
          ON a.blk = b.blk AND a.source = b.source
         AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 100
    """,
    tags=("extension",),
)
def doc_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein similarity over blocked candidate pairs (same source
    + length bucket + id proximity). Blocking bounds the quadratic
    kernel; at scale the candidate generator would be MinHash-LSH with
    this as the verification kernel."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "text", "source", F.expr("n_chars div 100").alias("blk")
    )
    a, b = d.alias("a"), d.alias("b")
    lev = F.levenshtein(F.col("a.text"), F.col("b.text"))
    maxlen = F.greatest(F.length(F.col("a.text")), F.length(F.col("b.text")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & ((F.col("b.doc_id") - F.col("a.doc_id")) <= 100),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            lev.cast("int").alias("edit_distance"),
            (F.lit(1.0) - lev.cast("double") / maxlen).alias("edit_similarity"),
        )
    )


# --------------------------------------------------------------------------
# Embedding near-dup via LSH buckets (dedup family, embedding-cosine)
# --------------------------------------------------------------------------
def _emb_near_dup_sql(dialect: str) -> str:
    from finalpipeline_spark.queries.embeddings import _cosine, _lsh_bucket_expr

    cos = _cosine("a.embedding", "b.embedding", dialect)
    bucket = _lsh_bucket_expr("embedding", dialect)
    return f"""
        WITH d AS (
            SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
        )
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, {cos} AS cosine
        FROM d a JOIN d b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {cos} >= 0.3
    """


@register(
    "emb_near_dup_pairs",
    oracle=_emb_near_dup_sql(D.DUCK),
    tags=("extension",),
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: candidate pairs from same-LSH-bucket
    collisions, verified by exact cosine ≥ threshold. At 100 TB the
    bucket id is the shuffle key (candidates ∝ collisions, not n²);
    recall is tuned by bands of planes, exactly like the MinHash
    banding for text."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(_emb_near_dup_sql(D.SPARK))


# --------------------------------------------------------------------------
# Skew-safe two-phase aggregation (salting — §4 scale technique)
# --------------------------------------------------------------------------
@register(
    "events_salted_agg",
    oracle=f"""
        SELECT event_type, count(*) AS n_events,
               {exact_sum_sql("value", 2)} AS sum_value,
               {exact_avg_sql("value", 2)} AS avg_value
        FROM events GROUP BY event_type
    """,
    tags=("extension",),
)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (skew-prone)
    key: phase 1 aggregates (key, salt) partials, phase 2 combines —
    the oracle is the plain GROUP BY, proving the decomposition is
    exact (scaled-integer sums commute). On real skew this is the
    manual fallback when AQE's skew handling isn't enough (e.g.
    aggregation skew, which AQE does not split)."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", F.col("event_id") % 8)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("_cents"),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        (F.sum("_cents") / F.lit(100.0)).alias("sum_value"),
        ((F.sum("_cents") / F.lit(100.0)) / F.sum("_n")).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# Percentiles (continuous interpolation — verified to match DuckDB's
# quantile_cont convention exactly: position (n-1)*q, linear interp)
# --------------------------------------------------------------------------
@register(
    "lineitem_percentiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.95) AS p95,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("extension",),
)
def lineitem_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (sort-based; for 100 TB
    use approx_percentile's t-digest instead — this is the exact
    baseline the sketch is validated against)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# --------------------------------------------------------------------------
# As-of join (sorted-window merge — new surface per SURVEY.md §2.3)
# --------------------------------------------------------------------------
@register(
    "events_asof_signup",
    oracle="""
        SELECT event_id, user_id, es, event_type,
               last_signup_es,
               (es - last_signup_es)::bigint AS since_signup_s
        FROM (
            SELECT event_id, user_id, es, event_type,
                   max(CASE WHEN event_type = 'signup' THEN es END)
                       OVER (PARTITION BY user_id ORDER BY es, event_id
                             ROWS UNBOUNDED PRECEDING) AS last_signup_es
            FROM (SELECT event_id, user_id, event_type,
                         (epoch_us(ts) // 1000000) AS es FROM events) t
        ) w
        WHERE event_type != 'signup'
    """,
    tags=("extension",),
)
def events_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest at-or-before signup
    of the same user — implemented as a sorted-window running max over
    the unioned stream, not a range join. One shuffle on user_id, no
    pair blowup: the formulation that survives 100 TB (the naive
    inequality join is quadratic per user)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts_epoch_s").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("es"))
    ).over(w)
    return (
        ev.withColumn("last_signup_es", last_signup)
        .filter(F.col("event_type") != "signup")
        .select(
            "event_id",
            "user_id",
            "es",
            "event_type",
            "last_signup_es",
            (F.col("es") - F.col("last_signup_es")).cast("long").alias("since_signup_s"),
        )
    )


# --------------------------------------------------------------------------
# Range (interval) self-join via time bucketing
# --------------------------------------------------------------------------
_RANGE_S = 60


@register(
    "events_range_self_join",
    oracle=f"""
        SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
               a.user_id, (b.es - a.es)::bigint AS gap_s
        FROM (SELECT event_id, user_id, (epoch_us(ts) // 1000000) AS es FROM events) a
        JOIN (SELECT event_id, user_id, (epoch_us(ts) // 1000000) AS es FROM events) b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND b.es >= a.es - {_RANGE_S} AND b.es <= a.es + {_RANGE_S}
    """,
    tags=("extension",),
)
def events_range_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: pairs of events of the same user within ±60s.

    Spark-first formulation: equi-join on (user, time-bucket) with each
    left row exploded into its bucket and both neighbors, then the
    exact range filter — candidates ∝ events per 60s bucket, never the
    per-user cross product the naive inequality join would scan. The
    oracle states the plain range predicate; results are identical.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts_epoch_s").alias("es")
    )
    bucketed_a = ev.select(
        F.col("event_id").alias("event_id_a"),
        "user_id",
        F.col("es").alias("es_a"),
        F.explode(
            F.expr(f"array(es div {_RANGE_S} - 1, es div {_RANGE_S}, es div {_RANGE_S} + 1)")
        ).alias("bucket"),
    )
    bucketed_b = ev.select(
        F.col("event_id").alias("event_id_b"),
        F.col("user_id").alias("user_id_b"),
        F.col("es").alias("es_b"),
        F.expr(f"es div {_RANGE_S}").alias("bucket_b"),
    )
    # Each pair matches exactly once (the right side carries a single
    # bucket), so no dedup pass is needed after the join.
    return (
        bucketed_a.join(
            bucketed_b,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("bucket") == F.col("bucket_b")),
        )
        .filter(
            (F.col("event_id_a") < F.col("event_id_b"))
            & (F.col("es_b") >= F.col("es_a") - _RANGE_S)
            & (F.col("es_b") <= F.col("es_a") + _RANGE_S)
        )
        .select(
            "event_id_a",
            "event_id_b",
            "user_id",
            (F.col("es_b") - F.col("es_a")).cast("long").alias("gap_s"),
        )
    )


# --------------------------------------------------------------------------
# Approximate distinct (HLL) — rows-only (sketch differs from any oracle)
# --------------------------------------------------------------------------
@register("ref_approx_distinct", oracle=None, tags=("extension",))
def ref_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the 100 TB cardinality-estimation path (no oracle: sketch results
    are engine-specific; driver records a rows-only check)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "events_window_frames",
    oracle="""
        SELECT user_id, event_id,
               (sum(event_id) OVER (
                   PARTITION BY user_id ORDER BY es, event_id))::bigint AS run_idsum,
               (count(*) OVER (
                   PARTITION BY user_id ORDER BY es, event_id))::bigint AS run_n,
               max(value) OVER (
                   PARTITION BY user_id ORDER BY es, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max3,
               (ntile(4) OVER (
                   PARTITION BY user_id ORDER BY value, event_id))::int AS quartile
        FROM (SELECT user_id, event_id, value,
                     (epoch_us(ts) // 1000000) AS es FROM events) t
    """,
    tags=("extension",),
)
def events_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame breadth on one pass: cumulative sum/count (default
    growing frame), an explicit ROWS BETWEEN sliding frame (3-row max —
    order-stable, no float accumulation), and ntile bucketing. All
    four share the user_id partition, so Spark evaluates them in a
    single window stage over one shuffle; the (es, event_id) tiebreak
    makes every frame deterministic across engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.col("ts_epoch_s").alias("es")
    )
    w_run = Window.partitionBy("user_id").orderBy("es", "event_id")
    w_3 = w_run.rowsBetween(-2, Window.currentRow)
    w_q = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.sum("event_id").over(w_run).cast("long").alias("run_idsum"),
        F.count(F.lit(1)).over(w_run).cast("long").alias("run_n"),
        F.max("value").over(w_3).alias("max3"),
        F.ntile(4).over(w_q).cast("int").alias("quartile"),
    )


@register(
    "tpch_q11_share",
    oracle=f"""
        WITH per_s AS (
            SELECT l_suppkey, {exact_sum_sql("l_extendedprice", 2)} AS supp_value
            FROM lineitem GROUP BY l_suppkey
        ),
        tot AS (
            SELECT {exact_sum_sql("l_extendedprice", 2)} AS total_value FROM lineitem
        )
        SELECT l_suppkey, supp_value
        FROM per_s CROSS JOIN tot
        WHERE supp_value > 0.0015 * total_value
    """,
    tags=("extension",),
)
def tpch_q11_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11's shape on the available schema (no partsupp in the
    testdata): per-group value filtered by a *scalar aggregate of the
    same data* — the HAVING-against-subquery pattern. Both sums are
    exact fixed-point, so the 0.0015-fraction threshold compares
    identical doubles in both engines.

    Shape: one scan feeds both aggregations (the group-by and the
    grand total); the single-row total broadcasts onto the per-group
    table — no second scan of the fact at 100 TB, no driver collect."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    per_s = li.groupBy("l_suppkey").agg(
        exact_sum(F.col("l_extendedprice"), 2).alias("supp_value")
    )
    tot = li.agg(exact_sum(F.col("l_extendedprice"), 2).alias("total_value"))
    return (
        per_s.join(F.broadcast(tot))
        .filter(F.col("supp_value") > 0.0015 * F.col("total_value"))
        .select("l_suppkey", "supp_value")
    )


@register(
    "events_rank_functions",
    oracle="""
        SELECT user_id, event_id,
               (rank() OVER w)::int AS rnk,
               (dense_rank() OVER w)::int AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cdist
        FROM events
        WHERE user_id % 100 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    tags=("extension",),
)
def events_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions: rank, dense_rank,
    percent_rank, cume_dist. The last two emit doubles, but each is a
    single integer division ((r-1)/(n-1), k/n) — exactly-rounded IEEE,
    so raw values hash identically across engines. Deterministic
    ordering via the (value, event_id) tie-break."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 0)
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "lineitem_approx_quantiles",
    oracle="""
        WITH agg AS (
            SELECT l_returnflag,
                   quantile_disc(l_extendedprice, [0.5, 0.95, 0.99]) AS qv,
                   count(*) AS n_rows
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag,
               unnest([0.5, 0.95, 0.99]) AS quantile,
               unnest(qv) AS approx_value,
               n_rows
        FROM agg
    """,
    tags=("extension",),
)
def lineitem_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile *sketch* (approx_percentile, Greenwald-Khanna): the
    mergeable-summary path for percentiles over data too large to sort
    — partials merge associatively across partitions, one reduce, no
    global shuffle of values. The accuracy knob is sized above the
    test-scale group cardinality, where the GK summary degenerates to
    exact retention (εn < 1 forbids every compressing merge), so the
    sketch answers the *discrete* quantile exactly and hash-matches
    DuckDB's quantile_disc; at 100 TB the same plan stands with the
    documented ±εn rank bound. Emits one scalar row per
    (flag, quantile) — the array form is unhashable for the driver's
    canonicalizer."""
    li = load_table(spark, sf_dir, "lineitem")
    quantiles = [0.5, 0.95, 0.99]
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", quantiles, 2_000_000).alias("approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    qlit = F.array(*[F.lit(q) for q in quantiles])
    return agg.select(
        "l_returnflag",
        F.posexplode(F.col("approx")).alias("pos", "approx_value"),
        "n_rows",
    ).select(
        "l_returnflag",
        F.element_at(qlit, F.col("pos") + 1).alias("quantile"),
        "approx_value",
        "n_rows",
    )


@register(
    "tpch_cube_sales",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               (grouping(l_returnflag) * 2 + grouping(l_linestatus))::int
                   AS grouping_id,
               {exact_sum_sql("l_quantity", 2)} AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("extension",),
)
def tpch_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with an explicit GROUPING id —
    all four grouping sets in one shuffle (Spark expands the cube to a
    grouping-set union with shared partial aggregation). The grouping
    id disambiguates subtotal NULLs from data NULLs, which is what
    makes cube output machine-consumable. Completes the
    rollup/cube/grouping-sets family (§2.4 'not present' gap)."""
    li = load_table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int")
    return li.cube("l_returnflag", "l_linestatus").agg(
        gid.alias("grouping_id"),
        exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "orders_full_outer_reconcile",
    oracle=f"""
        WITH y96 AS (
            SELECT o_custkey, count(*) AS n_96
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o_custkey
        ),
        y97 AS (
            SELECT o_custkey, count(*) AS n_97
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY o_custkey
        )
        SELECT o_custkey,
               coalesce(n_96, 0) AS n_96, coalesce(n_97, 0) AS n_97,
               CASE WHEN n_96 IS NULL THEN 'only_97'
                    WHEN n_97 IS NULL THEN 'only_96'
                    ELSE 'both' END AS presence
        FROM y96 FULL JOIN y97 USING (o_custkey)
    """,
    tags=("extension",),
)
def orders_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the one join shape the surface was
    missing: two period aggregates of the same fact, full-outer on the
    key, presence classification from the null sides. The two
    aggregates share one scan (Spark reuses the exchange under AQE
    when both branches group on the same key)."""
    orders = load_table(spark, sf_dir, "orders")

    def year_agg(lo: str, hi: str, n_name: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
            )
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(n_name))
        )

    y96 = year_agg("1996-01-01", "1997-01-01", "n_96")
    y97 = year_agg("1997-01-01", "1998-01-01", "n_97")
    presence = (
        F.when(F.col("n_96").isNull(), F.lit("only_97"))
        .when(F.col("n_97").isNull(), F.lit("only_96"))
        .otherwise(F.lit("both"))
    )
    return y96.join(y97, "o_custkey", "full").select(
        "o_custkey",
        F.coalesce("n_96", F.lit(0)).alias("n_96"),
        F.coalesce("n_97", F.lit(0)).alias("n_97"),
        presence.alias("presence"),
    )


_WEEK_S = 7 * 86400


@register(
    "events_cohort_retention",
    oracle=f"""
        WITH w AS (
            SELECT DISTINCT user_id,
                   (epoch_us(ts) // 1000000) // {_WEEK_S} AS week
            FROM events
        ),
        f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
        SELECT f.cohort_week,
               (w.week - f.cohort_week) AS week_offset,
               count(DISTINCT w.user_id) AS n_active
        FROM w JOIN f USING (user_id)
        GROUP BY 1, 2
    """,
    tags=("extension",),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week,
    distinct actives counted at each week offset — the standard
    product-analytics retention query.

    Shape: one scan → distinct (user, week) → per-user min (both hash
    the same user_id key, so the second agg reuses the first shuffle's
    partitioning) → user-keyed join → small final agg. The (user, week)
    table is cached because the join consumes it on both lineages.
    All-integer epoch math, timezone-proof."""
    ev = load_table(spark, sf_dir, "events")
    w = scoped_cache(
        ev.select("user_id", F.expr(f"ts_epoch_s div {_WEEK_S}").alias("week")).distinct(),
        "events_cohort_retention",
    )
    f = w.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        w.join(f, "user_id")
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "events_conversion_funnel",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'click' THEN es END) AS first_click,
                   min(CASE WHEN event_type = 'purchase' THEN es END) AS first_purchase
            FROM (SELECT user_id, event_type,
                         (epoch_us(ts) // 1000000) AS es FROM events) t
            GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               count(first_click) AS n_clicked,
               count(CASE WHEN first_purchase >= first_click THEN 1 END)
                   AS n_converted,
               count(CASE WHEN first_purchase >= first_click
                           AND first_purchase <= first_click + 86400 THEN 1 END)
                   AS n_converted_24h,
               cast(sum(CASE WHEN first_purchase >= first_click
                             THEN first_purchase - first_click END) as bigint)
                   AS total_lag_s
        FROM per_user
    """,
    tags=("extension",),
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase conversion funnel: first-touch per stage via
    conditional mins (one shuffle on user_id), then funnel counts and
    total conversion lag in a single-row combine. NULL comparison
    semantics do the stage gating — users who never clicked or never
    purchased fall out of each >= test. All-integer outputs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts_epoch_s").alias("es")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("es"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("es"))).alias(
            "first_purchase"
        ),
    )
    converted = F.col("first_purchase") >= F.col("first_click")
    within = converted & (F.col("first_purchase") <= F.col("first_click") + 86400)
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_click").alias("n_clicked"),
        F.count(F.when(converted, F.lit(1))).alias("n_converted"),
        F.count(F.when(within, F.lit(1))).alias("n_converted_24h"),
        F.sum(F.when(converted, F.col("first_purchase") - F.col("first_click")))
        .cast("long")
        .alias("total_lag_s"),
    )


# --------------------------------------------------------------------------
# Regression / correlation aggregates via exact fixed-point moments
# --------------------------------------------------------------------------
def _regr_sql(dialect: str) -> str:
    """Per-returnflag OLS regression of extendedprice on quantity
    (slope, intercept, Pearson r) computed from EXACT integer moment
    sums, not float corr()/regr_slope() aggregates.

    Why not the built-ins: corr/covar sum doubles in partial-agg order,
    so Spark and DuckDB (and any two cluster runs with different
    partitionings!) disagree in the low bits. Here every moment
    (Σx, Σy, Σx², Σy², Σxy) is summed as a scaled integer — quantity is
    integer-valued, price is 2-decimal — which is exact in ANY
    aggregation order; the closed-form slope/r arithmetic is then one
    identical IEEE expression tree over identical integers. Bit-stable
    at any scale and partitioning, which is what a reproducible 100 TB
    metrics job needs. Σy² ≈ 4e14/row overflows int64 at sf≥0.1, so the
    squared moments accumulate in 128-bit (decimal(38)/hugeint).
    """
    if dialect == D.SPARK:
        q = "cast(round(l_quantity) as bigint)"
        p = "cast(round(l_extendedprice * 100) as bigint)"
        sq = f"cast(sum({q}) as double)"
        sp = f"cast(sum({p}) as double)"
        sqq = f"cast(sum(cast({q} as decimal(19,0)) * cast({q} as decimal(19,0))) as double)"
        spp = f"cast(sum(cast({p} as decimal(19,0)) * cast({p} as decimal(19,0))) as double)"
        sqp = f"cast(sum(cast({q} as decimal(19,0)) * cast({p} as decimal(19,0))) as double)"
    else:
        q = "cast(round(l_quantity) as bigint)"
        p = "cast(round(l_extendedprice * 100) as bigint)"
        sq = f"cast(sum({q}) as double)"
        sp = f"cast(sum({p}) as double)"
        sqq = f"cast(sum(cast({q} as hugeint) * cast({q} as hugeint)) as double)"
        spp = f"cast(sum(cast({p} as hugeint) * cast({p} as hugeint)) as double)"
        sqp = f"cast(sum(cast({q} as hugeint) * cast({p} as hugeint)) as double)"
    tbl = "__fps_li_regr" if dialect == D.SPARK else "lineitem"
    return f"""
        WITH m AS (
            SELECT l_returnflag,
                   cast(count(*) as double) AS n,
                   {sq} AS sx, ({sp} / 100.0) AS sy,
                   {sqq} AS sxx, ({spp} / 10000.0) AS syy,
                   ({sqp} / 100.0) AS sxy
            FROM {tbl}
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               cast(n as bigint) AS n_rows,
               ((n * sxy - sx * sy) / (n * sxx - sx * sx)) AS slope,
               ((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
                   AS intercept,
               ((n * sxy - sx * sy)
                / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
                   AS pearson_r
        FROM m
    """


@register("lineitem_regr_stats", oracle=_regr_sql(D.DUCK), tags=("extension",))
def lineitem_regr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope/intercept and Pearson r of price vs quantity per
    returnflag, from exact fixed-point moments (order-independent —
    bit-stable under any partitioning; see _regr_sql). One partial-agg
    shuffle of 5 integer moments per group."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__fps_li_regr")
    return spark.sql(_regr_sql(D.SPARK))
