"""Sketch-based approximate query surface: deterministic HyperLogLog,
count-min-sketch heavy hitters, and a bloom-filter semi-join prefilter.

At 100 TB, exact `count(distinct)` and exact per-key frequency tables
are shuffle-bound: every distinct key crosses the network at least
once.  Sketches replace that with fixed-size state that merges
associatively — HLL registers (m buckets × 6 bits) and CMS counters
(d×w integers) combine map-side, so the shuffle carries kilobytes per
partition regardless of input size.  Spark's built-ins
(`approx_count_distinct`, `count_min_sketch`) already do this but their
sketches are engine-specific bytes; these implementations express the
same math in portable SQL (shared by the DuckDB oracle), so the sketch
is *auditable*: both engines agree bit-for-bit on every register, count,
and estimate.

Everything here is exact integer arithmetic up to one final IEEE-double
division/rounding per output row:

  * hash = md5 hex prefix folded to a 31-bit int (`dialect.md5_hex` +
    `dialect.hex_prefix_to_int`) — full avalanche, identical in both
    engines (the LCG family used for MinHash banding is measurably
    biased for leading-zero statistics: 58 % HLL error vs 4 % for md5).
  * HLL registers, CMS counters, bloom bit positions: int64 adds/maxes,
    associative and order-independent, so partial aggregation cannot
    change results.

Reference parity: the reference has no sketch layer (its cardinality
and frequency queries are exact Postgres aggregates, SURVEY.md §2.6);
this is part of the large-scale-pipeline extension surface, next to
`ref_approx_distinct` (the built-in HLL++ path, rows-only because its
sketch is engine-private).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

LINEITEM_VIEW = "__fps_lineitem_sk"
EVENTS_VIEW = "__fps_events_sk"
ORDERS_VIEW = "__fps_orders_sk"
CUSTOMER_VIEW = "__fps_customer_sk"
PART_VIEW = "__fps_part_sk"


def _tbl(view: str, duck: str, dialect: str) -> str:
    return view if dialect == D.SPARK else duck


# --------------------------------------------------------------------------
# Deterministic HyperLogLog distinct-count (m=256 registers)
# --------------------------------------------------------------------------
# Register math lives in functions/hll.py (shared with the incremental
# sketch-maintenance plan); these aliases keep the SQL builders below
# readable.
from finalpipeline_spark.functions import hll as H  # noqa: E402

_HLL_M = H.M
_HLL_WBITS = H.WBITS
_HLL_ALPHA_NUM = H.ALPHA_NUM


def _hll_sql(dialect: str) -> str:
    """HLL per l_returnflag over l_partkey, next to the exact count.

    Math (all exact int64 until the final division):
      h       = 31-bit md5 hash;  bucket = h mod 256;  w = h div 256
      rho(w)  = leading-zero count of the 24-bit window + 1
              = 24 - floor(log2 w) = 24 - (length(bin w) - 1), exact via
                the binary-string length (no float log anywhere)
      register M_b = max rho per bucket  (associative, merges map-side)
      S = sum over all 256 buckets of 2^(24 - M_b), with absent buckets
          contributing 2^24 (M_b = 0); S <= 256 * 2^24 = 2^32, exact.
      E = alpha*m^2*2^24 / S  — one IEEE division, identical both sides;
      small-range (E <= 2.5m, zero buckets exist): linear counting
      m*ln(m/V) — ln is libm, so the output is rounded to 4 decimals.

    Scale: the only shuffles are (grp, bucket) -> 256 rows per group and
    grp -> 1 row per group; map-side partial max/sum means executors
    exchange registers, not keys.  The exact countDistinct column is the
    verification twin — at 100 TB you would drop it (it is the very
    shuffle the sketch avoids).
    """
    t = _tbl(LINEITEM_VIEW, "lineitem", dialect)
    idiv = "div" if dialect == D.SPARK else "//"
    two = "shiftleft(cast(1 as bigint)," if dialect == D.SPARK else "(cast(1 as bigint) <<"
    m, wb = _HLL_M, _HLL_WBITS
    h = D.hex_prefix_to_int("m5", dialect)
    return f"""
        WITH hashed AS (
            SELECT l_returnflag, {h} AS h
            FROM (SELECT l_returnflag, {D.md5_hex("l_partkey", dialect)} AS m5 FROM {t}) raw
        ), rho AS (
            SELECT l_returnflag, (h % {m}) AS bucket,
                   CASE WHEN (h {idiv} {m}) = 0 THEN {wb + 1}
                        ELSE {wb + 1} - length(bin(h {idiv} {m})) END AS r
            FROM hashed
        ), registers AS (
            SELECT l_returnflag, bucket, max(r) AS mr
            FROM rho GROUP BY l_returnflag, bucket
        ), stats AS (
            SELECT l_returnflag,
                   cast(sum({two} ({wb + 1} - mr))) as bigint) AS s_present,
                   cast(count(*) as bigint) AS nb
            FROM registers GROUP BY l_returnflag
        ), raw_est AS (
            SELECT l_returnflag, ({m} - nb) AS zero_buckets,
                   {_HLL_ALPHA_NUM!r}
                     / cast(s_present + ({m} - nb) * {1 << (wb + 1)} as double) AS e
            FROM stats
        ), exact AS (
            SELECT l_returnflag, cast(count(distinct l_partkey) as bigint) AS exact_parts
            FROM {t} GROUP BY l_returnflag
        )
        SELECT r.l_returnflag,
               x.exact_parts,
               round(CASE WHEN e <= {2.5 * m!r} AND zero_buckets > 0
                          THEN {m} * ln(cast({m} as double) / cast(zero_buckets as double))
                          ELSE e END, 4) AS hll_parts,
               zero_buckets
        FROM raw_est r JOIN exact x ON r.l_returnflag = x.l_returnflag
        ORDER BY r.l_returnflag
    """


@register("lineitem_hll_distinct", oracle=_hll_sql(D.DUCK), tags=("extension",))
def lineitem_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (m=256) distinct l_partkey per
    returnflag, oracle-verified register-for-register against DuckDB —
    the auditable form of the 100 TB cardinality-estimation path
    (engine-private HLL++ twin: ref_approx_distinct)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(LINEITEM_VIEW)
    return spark.sql(_hll_sql(D.SPARK))


# --------------------------------------------------------------------------
# Count-min-sketch heavy hitters (d=4 rows, w=512 counters)
# --------------------------------------------------------------------------
_CMS_D = 4
_CMS_W = 512


def _cms_sql(dialect: str) -> str:
    """CMS frequency estimates for the top-10 users by event count.

    Build: each event lands in one counter per hash row j (seeded by
    prefixing j to the key before md5), counters = sum of hits; the
    whole sketch is d*w = 2048 integers.  Probe: a candidate's estimate
    is min over its d counters — always >= the true count (only
    overestimates, by collision mass ~ n/w per row).

    Scale: the sketch build is a map-side-combining aggregation onto a
    2048-row keyspace — the shuffle carries at most d*w rows per
    partition no matter how many events; the exact candidate counts are
    one groupBy(user_id) + top-k (the thing the sketch replaces when the
    key space itself is too big to shuffle).  All counters and estimates
    are exact int64 — bit-identical across engines by construction.
    """
    t = _tbl(EVENTS_VIEW, "events", dialect)
    d, w = _CMS_D, _CMS_W
    if dialect == D.SPARK:
        js = f"(SELECT explode(sequence(0, {d - 1})) AS j)"
        concat_key = "concat(cast(j as string), ':', cast(user_id as string))"
    else:
        js = f"(SELECT unnest(range(0, {d})) AS j)"
        concat_key = "concat(cast(j as varchar), ':', cast(user_id as varchar))"
    h = D.hex_prefix_to_int("m5", dialect)
    return f"""
        WITH sketch AS (
            SELECT j, bucket, cast(count(*) as bigint) AS cnt
            FROM (
                SELECT j, ({h} % {w}) AS bucket
                FROM (SELECT user_id, j, {D.md5_hex(concat_key, dialect)} AS m5
                      FROM {t} CROSS JOIN {js} jrows) keyed
            ) hashed
            GROUP BY j, bucket
        ), candidates AS (
            SELECT user_id, cast(count(*) as bigint) AS exact_cnt
            FROM {t} GROUP BY user_id
            ORDER BY exact_cnt DESC, user_id LIMIT 10
        ), cand_buckets AS (
            SELECT user_id, exact_cnt, j, ({h} % {w}) AS bucket
            FROM (SELECT user_id, exact_cnt, j,
                         {D.md5_hex(concat_key, dialect)} AS m5
                  FROM candidates CROSS JOIN {js} jrows) keyed
        )
        SELECT c.user_id, c.exact_cnt, min(s.cnt) AS cms_est
        FROM cand_buckets c
        JOIN sketch s ON c.j = s.j AND c.bucket = s.bucket
        GROUP BY c.user_id, c.exact_cnt
        ORDER BY c.user_id
    """


@register("events_cms_heavy_hitters", oracle=_cms_sql(D.DUCK), tags=("extension",))
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4x512) frequency estimates for the top-10
    event users, next to their exact counts — estimates are exact-int
    reproducible in both engines and always >= truth."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(EVENTS_VIEW)
    return spark.sql(_cms_sql(D.SPARK))


# --------------------------------------------------------------------------
# Bloom-filter prefilter semi-join
# --------------------------------------------------------------------------
@register(
    "orders_bloom_semi_join",
    oracle="""
        SELECT o.o_orderpriority,
               cast(count(*) as bigint) AS n_orders,
               cast(sum(cast(round(o.o_totalprice * 100) as bigint)) as bigint) AS sum_cents
        FROM orders o
        WHERE o.o_custkey IN (
            SELECT c_custkey FROM customer
            WHERE c_nationkey = 7 AND c_acctbal > 5000.0
        )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("extension",),
)
def orders_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join orders to a filtered customer set through a bloom-bit
    prefilter (`operators/bloom.py`): probe rows that cannot match are
    dropped by a pure bitwise expression before the exact join runs.

    The oracle is the PLAIN semi-join — the bloom layer is transparent
    to results by construction (no false negatives; false positives are
    removed by the exact join).  At 100 TB this is the pattern for a
    build side too large to broadcast as a hash set but whose bit
    signature (m/8 bytes) still broadcasts: the expensive shuffle only
    sees surviving probe rows.  tests/test_bloom.py asserts equivalence
    and actual pruning.
    """
    from finalpipeline_spark.operators.bloom import bloom_filter_column

    import pyspark.sql.functions as F

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = customer.filter(
        (F.col("c_nationkey") == 7) & (F.col("c_acctbal") > 5000.0)
    ).select("c_custkey")
    prefiltered = orders.filter(bloom_filter_column(build, "c_custkey", "o_custkey"))
    return (
        prefiltered.join(
            F.broadcast(build), prefiltered.o_custkey == build.c_custkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Mergeable HLL: union / intersection cardinality across tables
# --------------------------------------------------------------------------
_rho_select = H.rho_select
_est_select = H.est_select


_UREGS1_VIEW = "__fps_uregs1_sk"
_UREGS2_VIEW = "__fps_uregs2_sk"


def _union_src(side: str, dialect: str) -> str:
    """The two deliberately partial-overlap key sets (parts touched by
    heavy lineitems vs small-size parts), as derived tables."""
    if side == "li":
        t = _tbl(LINEITEM_VIEW, "lineitem", dialect)
        return f"(SELECT l_partkey FROM {t} WHERE l_quantity >= 45) li_f"
    t = _tbl(PART_VIEW, "part", dialect)
    return f"(SELECT p_partkey FROM {t} WHERE p_size <= 25) pt_f"


def _union_regs_sql(side: str, dialect: str) -> str:
    key = "l_partkey" if side == "li" else "p_partkey"
    return (
        f"SELECT bucket, max(r) AS mr FROM "
        f"({_rho_select(_union_src(side, dialect), key, dialect)}) rho GROUP BY bucket"
    )


def _union_body_sql(regs1: str, regs2: str, dialect: str) -> str:
    """Set-cardinality report over two (already-built) register
    relations — shared verbatim between Spark (materialized views) and
    DuckDB (CTE names).

    The property under test is what makes HLL shard at 100 TB:
    registers are a commutative-monoid state (elementwise max), so
    sketches built independently — per partition, per table, per day —
    merge by a 256-row max-aggregation with no access to the original
    keys.  Union cardinality comes off the merged registers;
    intersection via inclusion-exclusion (e1 + e2 - eU, floats already
    rounded).  The exact twins re-scan the inputs — the cost the
    sketches avoid.
    """
    li = _union_src("li", dialect)
    pt = _union_src("pt", dialect)
    return f"""
        WITH regsu AS (
            SELECT bucket, max(mr) AS mr
            FROM (SELECT * FROM {regs1} UNION ALL SELECT * FROM {regs2}) both_regs
            GROUP BY bucket
        ),
        e1 AS ({_est_select(regs1, dialect)}),
        e2 AS ({_est_select(regs2, dialect)}),
        eu AS ({_est_select("regsu", dialect)}),
        x1 AS (SELECT cast(count(distinct l_partkey) as bigint) AS c FROM {li}),
        x2 AS (SELECT cast(count(distinct p_partkey) as bigint) AS c FROM {pt}),
        xu AS (
            SELECT cast(count(distinct k) as bigint) AS c FROM (
                SELECT l_partkey AS k FROM {li}
                UNION SELECT p_partkey AS k FROM {pt}
            ) uk
        ),
        xi AS (
            SELECT cast(count(distinct l_partkey) as bigint) AS c FROM {li}
            WHERE l_partkey IN (SELECT p_partkey FROM {pt})
        )
        SELECT 'lineitem' AS source, x1.c AS exact_cnt, e1.est AS hll_est
        FROM x1 CROSS JOIN e1
        UNION ALL
        SELECT 'part' AS source, x2.c AS exact_cnt, e2.est AS hll_est
        FROM x2 CROSS JOIN e2
        UNION ALL
        SELECT 'union' AS source, xu.c AS exact_cnt, eu.est AS hll_est
        FROM xu CROSS JOIN eu
        UNION ALL
        SELECT 'intersection' AS source, xi.c AS exact_cnt,
               round(e1.est + e2.est - eu.est, 4) AS hll_est
        FROM xi CROSS JOIN e1 CROSS JOIN e2 CROSS JOIN eu
    """


def _hll_union_oracle() -> str:
    return f"""
        WITH regs1 AS ({_union_regs_sql("li", D.DUCK)}),
        regs2 AS ({_union_regs_sql("pt", D.DUCK)}),
        body AS ({_union_body_sql("regs1", "regs2", D.DUCK)})
        SELECT * FROM body
    """


@register("hll_union_parts", oracle=_hll_union_oracle(), tags=("extension",))
def hll_union_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-sketch set cardinalities: union via elementwise register
    max (the property that makes HLL shard across executors/tables),
    intersection via inclusion-exclusion — each next to its exact twin.
    The Spark path materializes each side's 256-row register table once
    (localCheckpoint) since Spark re-evaluates CTEs per reference; each
    input is then scanned once for its sketch (+ once by the exact
    twins, which exist only for verification)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(LINEITEM_VIEW)
    load_table(spark, sf_dir, "part").createOrReplaceTempView(PART_VIEW)
    spark.sql(_union_regs_sql("li", D.SPARK)).localCheckpoint(
        eager=True
    ).createOrReplaceTempView(_UREGS1_VIEW)
    spark.sql(_union_regs_sql("pt", D.SPARK)).localCheckpoint(
        eager=True
    ).createOrReplaceTempView(_UREGS2_VIEW)
    return spark.sql(_union_body_sql(_UREGS1_VIEW, _UREGS2_VIEW, D.SPARK))


# --------------------------------------------------------------------------
# CMS second moment: self-join-size estimation (the AMS F2 question)
# --------------------------------------------------------------------------
def _cms_join_size_sql(dialect: str) -> str:
    """Self-join size of events on user_id — sum_u f(u)^2 — estimated
    from the count-min sketch's row inner products.

    This is the query a cost-based planner asks before committing to a
    join strategy at 100 TB: |A ⋈ A| decides broadcast vs shuffle vs
    salting, and computing it exactly is itself a full aggregation of A.
    The CMS answer needs only the 4x512 sketch: est_j = sum_b c_j[b]^2
    per hash row, estimate = min_j est_j — always >= truth (collision
    mass only adds), exact int64 throughout, so both engines agree to
    the bit.  Emitted next to the exact second moment and the true
    distinct count for calibration.
    """
    t = _tbl(EVENTS_VIEW, "events", dialect)
    d, w = _CMS_D, _CMS_W
    if dialect == D.SPARK:
        js = f"(SELECT explode(sequence(0, {d - 1})) AS j)"
        concat_key = "concat(cast(j as string), ':', cast(user_id as string))"
    else:
        js = f"(SELECT unnest(range(0, {d})) AS j)"
        concat_key = "concat(cast(j as varchar), ':', cast(user_id as varchar))"
    h = D.hex_prefix_to_int("m5", dialect)
    return f"""
        WITH sketch AS (
            SELECT j, bucket, cast(count(*) as bigint) AS cnt
            FROM (
                SELECT j, ({h} % {w}) AS bucket
                FROM (SELECT user_id, j, {D.md5_hex(concat_key, dialect)} AS m5
                      FROM {t} CROSS JOIN {js} jrows) keyed
            ) hashed
            GROUP BY j, bucket
        ), row_moments AS (
            SELECT j, cast(sum(cnt * cnt) as bigint) AS m2 FROM sketch GROUP BY j
        ), exact AS (
            SELECT cast(sum(c * c) as bigint) AS exact_m2,
                   cast(count(*) as bigint) AS n_users
            FROM (SELECT cast(count(*) as bigint) AS c FROM {t} GROUP BY user_id) pc
        )
        SELECT x.exact_m2, m.est_m2, x.n_users
        FROM exact x CROSS JOIN
             (SELECT min(m2) AS est_m2 FROM row_moments) m
    """


@register("events_cms_join_size", oracle=_cms_join_size_sql(D.DUCK), tags=("extension",))
def events_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join cardinality (second frequency moment) of events on
    user_id, estimated from CMS row inner products next to the exact
    value — the sketch answer to 'how big will this join be'."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(EVENTS_VIEW)
    return spark.sql(_cms_join_size_sql(D.SPARK))


# --------------------------------------------------------------------------
# Mergeable quantile sketch (log2-bucket histogram)
# --------------------------------------------------------------------------
_QBUCKETS_VIEW = "__fps_qbuckets_sk"


def _quantile_sketch_sql(dialect: str) -> str:
    """p50/p95/p99 of l_extendedprice from a mergeable histogram.

    Sketch state is one row per log2 magnitude bucket of the cents
    value: (bucket, n, lo, hi) — mergeable by (sum, min, max), ~40 rows
    for the whole int64 range, built in one map-side-combining pass.
    Quantile targets are integer rationals (ceil(qn*N/qd) computed as
    (qn*N + qd - 1) div qd — no float product whose ceil could tie-break
    differently across engines), and the in-bucket linear interpolation
    is pure integer arithmetic: lo + (hi-lo)*(target-cum_prev) div n.
    The exact twin is the rank-selected value — a global sort, i.e. the
    very thing the sketch replaces at 100 TB.

    Estimates land within 0.1% of exact on this data (dense buckets);
    worst case error is one bucket's span.  This is the same
    shape/accuracy trade as production quantile sketches (t-digest,
    KLL) with radically simpler, engine-portable state.
    """
    t = _tbl(LINEITEM_VIEW, "lineitem", dialect)
    dv = lambda a, b: D.idiv(a, b, dialect)  # noqa: E731
    buckets = (
        _QBUCKETS_VIEW
        if dialect == D.SPARK
        else f"""(
            SELECT length(bin(c)) AS b, cast(count(*) as bigint) AS n,
                   min(c) AS lo, max(c) AS hi
            FROM (SELECT cast(round(l_extendedprice * 100) as bigint) AS c
                  FROM {t}) cents0
            GROUP BY length(bin(c))
        ) bk"""
    )
    return f"""
        WITH cents AS (
            SELECT cast(round(l_extendedprice * 100) as bigint) AS c FROM {t}
        ), cum AS (
            SELECT b, n, lo, hi,
                   cast(sum(n) OVER (ORDER BY b) as bigint) AS cn,
                   cast(sum(n) OVER (ORDER BY b) - n as bigint) AS cprev,
                   cast(sum(n) OVER () as bigint) AS total
            FROM {buckets}
        ), qs AS (
            SELECT * FROM (VALUES (1, 2), (19, 20), (99, 100)) AS q(qn, qd)
        ), targets AS (
            SELECT qn, qd,
                   {dv("(qn * total + qd - 1)", "qd")} AS target, total
            FROM qs CROSS JOIN (SELECT max(total) AS total FROM cum) tt
        ), est AS (
            SELECT t.qn, t.qd,
                   cast(c.lo + {dv("((c.hi - c.lo) * (t.target - c.cprev))", "c.n")}
                        as bigint) AS est_cents,
                   t.target
            FROM targets t JOIN cum c ON c.cprev < t.target AND t.target <= c.cn
        ), exact AS (
            SELECT rn, c FROM (
                SELECT c, cast(row_number() OVER (ORDER BY c) as bigint) AS rn
                FROM cents
            ) ranked
        )
        SELECT cast(e.qn as double) / cast(e.qd as double) AS q,
               e.est_cents, x.c AS exact_cents
        FROM est e JOIN exact x ON x.rn = e.target
        ORDER BY q
    """


@register(
    "lineitem_mergeable_quantiles",
    oracle=_quantile_sketch_sql(D.DUCK),
    tags=("extension",),
)
def lineitem_mergeable_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 from a ~40-row mergeable log2-bucket histogram
    (integer-only target selection and interpolation), next to the
    rank-selected exact values the sketch replaces at scale.  The Spark
    path materializes the histogram once (localCheckpoint) so the fact
    is scanned once for the sketch (+ once by the exact twin)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(LINEITEM_VIEW)
    spark.sql(
        f"""
        SELECT length(bin(c)) AS b, cast(count(*) as bigint) AS n,
               min(c) AS lo, max(c) AS hi
        FROM (SELECT cast(round(l_extendedprice * 100) as bigint) AS c
              FROM {LINEITEM_VIEW}) cents0
        GROUP BY length(bin(c))
        """
    ).localCheckpoint(eager=True).createOrReplaceTempView(_QBUCKETS_VIEW)
    return spark.sql(_quantile_sketch_sql(D.SPARK))


# --------------------------------------------------------------------------
# Rolling-window distinct users from merged hourly HLL registers
# --------------------------------------------------------------------------
_HOURLY_REGS_VIEW = "__fps_hourly_regs_sk"


def _hourly_regs_sql(dialect: str) -> str:
    """Per-hour HLL registers of user_id — the one events pass."""
    t = _tbl(EVENTS_VIEW, "events", dialect)
    es = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    idiv = "div" if dialect == D.SPARK else "//"
    m, wb = _HLL_M, _HLL_WBITS
    h = D.hex_prefix_to_int("m5", dialect)
    return f"""
        SELECT hour, bucket, max(r) AS mr FROM (
            SELECT hour, (h % {m}) AS bucket,
                   CASE WHEN (h {idiv} {m}) = 0 THEN {wb + 1}
                        ELSE {wb + 1} - length(bin(h {idiv} {m})) END AS r
            FROM (
                SELECT hour, {h} AS h
                FROM (SELECT ({es}) {idiv} 3600 AS hour,
                             {D.md5_hex("user_id", dialect)} AS m5
                      FROM {t}) keyed
            ) hashed
        ) rho GROUP BY hour, bucket
    """


def _rolling_body_sql(hourly_regs: str, dialect: str) -> str:
    """Trailing-3-hour estimates + exact twin over an (already-built)
    hourly register relation — shared verbatim between Spark (a
    materialized view) and DuckDB (a CTE name)."""
    t = _tbl(EVENTS_VIEW, "events", dialect)
    es = "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"
    idiv = "div" if dialect == D.SPARK else "//"
    grouped_est = H.est_grouped_select("trail_regs", "hour", dialect)
    return f"""
        WITH hours AS (
            SELECT DISTINCT hour FROM {hourly_regs}
        ), trail_regs AS (
            SELECT h.hour, r.bucket, max(r.mr) AS mr
            FROM hours h JOIN {hourly_regs} r
              ON r.hour >= h.hour - 2 AND r.hour <= h.hour
            GROUP BY h.hour, r.bucket
        ), est AS ({grouped_est}
        ), exact AS (
            SELECT h.hour, cast(count(distinct e.user_id) as bigint) AS exact_users
            FROM hours h JOIN (SELECT ({es}) {idiv} 3600 AS hour, user_id
                               FROM {t}) e
              ON e.hour >= h.hour - 2 AND e.hour <= h.hour
            GROUP BY h.hour
        )
        SELECT x.hour, x.exact_users, e.est AS hll_users
        FROM exact x JOIN est e ON x.hour = e.hour
        ORDER BY x.hour
    """


def _rolling_hll_oracle() -> str:
    return f"""
        WITH hourly_regs AS ({_hourly_regs_sql(D.DUCK)}),
        body AS ({_rolling_body_sql("hourly_regs", D.DUCK)})
        SELECT * FROM body
    """


@register("events_rolling_distinct_hll", oracle=_rolling_hll_oracle(), tags=("extension",))
def events_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-hour distinct users per hour — the DAU/WAU/MAU
    pattern: build HLL registers once per hour, answer every window by
    max-merging the member hours' registers.

    The Spark path materializes the hourly registers (localCheckpoint —
    hours×256 rows, never event-sized) because Spark re-evaluates CTEs
    per reference; one events pass builds them, and every window
    estimate is then a ≤ 3×256-row merge.  The exact twin re-joins the
    events per window — the cost the sketch exists to avoid.  Registers
    merge by max: associative/commutative/idempotent, so late hours or
    replayed batches fold in safely (persisted form:
    plans/incremental_sketch.py)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(EVENTS_VIEW)
    regs = spark.sql(_hourly_regs_sql(D.SPARK)).localCheckpoint(eager=True)
    regs.createOrReplaceTempView(_HOURLY_REGS_VIEW)
    return spark.sql(_rolling_body_sql(_HOURLY_REGS_VIEW, D.SPARK))
