"""Reference-parity relational queries (SURVEY.md §2.2–§2.6).

Each query re-expresses one or more reference operators on the driver's
TPC-H-ish stand-in tables (mapping per FIXTURES.md: part↔molecules,
customer↔chembl_id_lookup, lineitem↔similarity facts). The DuckDB
oracle for each is the registered ``oracle`` string.

Cross-engine discipline used throughout (and in every other query
module): computed floats are rounded via ``r()`` only at the output;
every aggregate/computed column is aliased identically in both engines;
int-typed outputs are cast so Spark and DuckDB agree (DuckDB sum→
HUGEINT, len→BIGINT, row_number→BIGINT vs Spark int).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finalpipeline_spark.functions.numeric import (
    exact_avg,
    exact_avg_sql,
    isclose_sql,
    r,
)
from finalpipeline_spark.operators.tiebreak import top_k_with_tie_flag
from finalpipeline_spark.operators.topk import top_k_per_group
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

# Days since epoch for 2024-01-03 (ledger cutoff used below; early
# enough that some users have no prior signup at every scale factor).
_LEDGER_CUTOFF_DAY = 19725
_NS_PER_DAY = 86_400_000_000_000

# Exact fixed-point SQL fragments shared by several oracles.
_AVG_PRICE_SQL = exact_avg_sql("l_extendedprice", 2)
_AVG_ABSDIFF_SQL = exact_avg_sql("abs(s.alogp - t.alogp)", 2)


# --------------------------------------------------------------------------
# Projections / row transforms (P1, P3, P4 — reference tanimoto.py:70-80)
# --------------------------------------------------------------------------
@register(
    "ref_clean_ids",
    oracle="""
        SELECT c_nationkey, c_mktsegment, c_custkey,
               'CHEMBL' || regexp_extract(c_name, '([0-9]+)', 1) AS chembl_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c_nationkey, c_mktsegment ORDER BY c_custkey) AS rn
            FROM customer
        ) WHERE rn = 1
    """,
    tags=("reference",),
)
def ref_clean_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 regex ID repair + P4 deterministic dedup + P3 column select.

    Reference: 'CHEMBL' + first digit run (tanimoto.py:72-75), then
    drop_duplicates (tanimoto.py:79). Dedup keeps the lowest key via
    row_number — dropDuplicates alone is nondeterministic, which the
    reference silently tolerated and we do not.
    """
    customer = load_table(spark, sf_dir, "customer")
    repaired = customer.withColumn(
        "chembl_id", F.concat(F.lit("CHEMBL"), F.regexp_extract("c_name", r"(\d+)", 1))
    )
    dedup = top_k_per_group(
        repaired, ["c_nationkey", "c_mktsegment"], [F.col("c_custkey")], k=1, keep_rank=False
    )
    return dedup.select("c_nationkey", "c_mktsegment", "c_custkey", "chembl_id")


# --------------------------------------------------------------------------
# Filters + computed projection (P2, P7, P9, P10, F5-adjacent)
# --------------------------------------------------------------------------
@register(
    "ref_filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey,
               round(l_extendedprice * (1 - l_discount), 6) AS revenue
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_partkey != l_suppkey
          AND (CASE WHEN l_discount < 0.01 THEN NULL ELSE l_discount END) IS NOT NULL
    """,
    tags=("reference",),
)
def ref_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 equality + P7 self-match + P9 null predicate + projection.

    Null filter mirrors views_p1.py:40 (`alogp is not null`); the null
    source is synthesized deterministically since testdata has no nulls.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_nullable = F.when(F.col("l_discount") < 0.01, F.lit(None)).otherwise(
        F.col("l_discount")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .filter(F.col("l_partkey") != F.col("l_suppkey"))
        .filter(disc_nullable.isNotNull())
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            r(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# J1 — left equi-join ID lookup (reference tanimoto.py:177-183)
# --------------------------------------------------------------------------
@register(
    "ref_left_join_lookup",
    oracle="""
        SELECT c_custkey, c_name, n.n_name
        FROM customer c
        LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 3) n
          ON c.c_nationkey = n.n_nationkey
    """,
    tags=("reference",),
)
def ref_left_join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: targets LEFT JOIN lookup — unmatched keys yield nulls.

    Replaces the reference's temp-table dance (stage to
    bronze_temporary, join in Postgres, drop — tanimoto.py:177-183)
    with a single broadcast left join.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 3)
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
    )
    return joined.select("c_custkey", "c_name", "n_name")


# --------------------------------------------------------------------------
# J5 — composite-key anti-join (reference datamart.py:59-79)
# --------------------------------------------------------------------------
@register(
    "ref_anti_join_pairs",
    oracle="""
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("reference",),
)
def ref_anti_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: drop (source, target) pairs already present in the fact table.

    The reference built Python pair-lists and did O(n²) membership
    loops (datamart.py:59-79); here it is one shuffled anti-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    new = li.filter(F.col("l_returnflag") == "R").select("l_partkey", "l_suppkey").distinct()
    existing = li.filter(F.col("l_returnflag") == "A").select("l_partkey", "l_suppkey").distinct()
    return new.join(existing, ["l_partkey", "l_suppkey"], "left_anti")


# --------------------------------------------------------------------------
# J6 + A6 — union-distinct dim draft minus existing (datamart.py:86-105)
# --------------------------------------------------------------------------
@register(
    "ref_dim_draft",
    oracle="""
        SELECT molregno FROM (
            SELECT l_partkey AS molregno FROM lineitem
            UNION
            SELECT l_suppkey AS molregno FROM lineitem
        )
        EXCEPT
        SELECT p_partkey AS molregno FROM part WHERE p_retailprice < 500
    """,
    tags=("reference",),
)
def ref_dim_draft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/A6: distinct ids from both fact columns, minus those in the dim.

    The < 500 cutoff keeps the 'existing dim' a strict subset of part
    at every scale factor so the draft is non-empty (p_retailprice maxes
    at ~1000 — a <1000 cutoff would swallow everything).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ids = (
        li.select(F.col("l_partkey").alias("molregno"))
        .union(li.select(F.col("l_suppkey").alias("molregno")))
        .distinct()
    )
    existing = part.filter(F.col("p_retailprice") < 500).select(
        F.col("p_partkey").alias("molregno")
    )
    return ids.join(existing, "molregno", "left_anti")


# --------------------------------------------------------------------------
# J2 — 3-way inner join + filter (reference datamart.py:155-168)
# --------------------------------------------------------------------------
@register(
    "ref_star_enrich",
    oracle="""
        SELECT l_orderkey, l_linenumber, p_name, p_retailprice, s_name, s_acctbal
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_returnflag = 'R'
    """,
    tags=("reference",),
)
def ref_star_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: fact ⋈ lookup ⋈ dim with an entity-type-style filter.

    Both dims are broadcast (they are the small sides — the reference's
    INSERT…SELECT pushed this to Postgres instead).
    """
    li, part, supp = (
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_linenumber", "p_name", "p_retailprice", "s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# J7 + A2 — view 7a: avg similarity per source (views_p1.py:9-12)
# --------------------------------------------------------------------------
@register(
    "ref_view_avg_sim",
    oracle=f"""
        SELECT p_brand, {_AVG_PRICE_SQL} AS avg_sim,
               count(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    tags=("reference",),
)
def ref_view_avg_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View 7a: fact ⋈ dim then avg() GROUP BY (J7 + A2)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            exact_avg(F.col("l_extendedprice"), 2).alias("avg_sim"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _dim_with_nullable_alogp(part: DataFrame) -> DataFrame:
    """Stand-in molecule dim: alogp := p_retailprice, ~14% nulls
    (deterministic p_size % 7 rule — testdata has no natural nulls)."""
    return part.select(
        F.col("p_partkey").alias("molregno"),
        F.col("p_name").alias("chembl_id"),
        F.when(F.col("p_size") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("p_retailprice"))
        .alias("alogp"),
    )


_DIM_SQL = """
    SELECT p_partkey AS molregno, p_name AS chembl_id,
           CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_retailprice END AS alogp
    FROM part
"""

_FACT_SQL = """
    SELECT l_partkey AS source_molregno, l_orderkey % 200 AS target_molregno
    FROM lineitem
"""


def _fact_pairs(li: DataFrame) -> DataFrame:
    return li.select(
        F.col("l_partkey").alias("source_molregno"),
        (F.col("l_orderkey") % 200).alias("target_molregno"),
    )


# --------------------------------------------------------------------------
# J8 + A3 — views 7b / 7b': double-aliased dim join, avg |Δalogp|
# (views_p1.py:16-43 — the with/without-NULL-filter pair)
# --------------------------------------------------------------------------
@register(
    "ref_view_avg_absdiff",
    oracle=f"""
        SELECT s.chembl_id AS source_chembl_id,
               {_AVG_ABSDIFF_SQL} AS avg_abs_alogp_diff
        FROM ({_FACT_SQL}) f
        JOIN ({_DIM_SQL}) s ON f.source_molregno = s.molregno
        JOIN ({_DIM_SQL}) t ON f.target_molregno = t.molregno
        GROUP BY s.chembl_id
    """,
    tags=("reference",),
)
def ref_view_avg_absdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View 7b: same dim joined twice (aliased), avg(abs(Δ)) per source.

    NULL semantics: avg() skips rows where either side is null, but a
    group whose every pair is null still appears (with NULL avg) —
    exactly the difference vs ref_view_avg_absdiff_nonull.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dim = _dim_with_nullable_alogp(part)
    s = dim.alias("s")
    t = dim.alias("t")
    f_ = _fact_pairs(li).alias("f")
    return (
        f_.join(F.broadcast(s), F.col("f.source_molregno") == F.col("s.molregno"))
        .join(F.broadcast(t), F.col("f.target_molregno") == F.col("t.molregno"))
        .groupBy(F.col("s.chembl_id").alias("source_chembl_id"))
        .agg(exact_avg(F.abs(F.col("s.alogp") - F.col("t.alogp")), 2).alias("avg_abs_alogp_diff"))
    )


@register(
    "ref_view_avg_absdiff_nonull",
    oracle=f"""
        SELECT s.chembl_id AS source_chembl_id,
               {_AVG_ABSDIFF_SQL} AS avg_abs_alogp_diff
        FROM ({_FACT_SQL}) f
        JOIN ({_DIM_SQL}) s ON f.source_molregno = s.molregno
        JOIN ({_DIM_SQL}) t ON f.target_molregno = t.molregno
        WHERE s.alogp IS NOT NULL AND t.alogp IS NOT NULL
        GROUP BY s.chembl_id
    """,
    tags=("reference",),
)
def ref_view_avg_absdiff_nonull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View 7b': as 7b but rows pre-filtered on NOT NULL (views_p1.py:40)
    — all-null groups disappear entirely."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dim = _dim_with_nullable_alogp(part)
    s = dim.alias("s")
    t = dim.alias("t")
    f_ = _fact_pairs(li).alias("f")
    return (
        f_.join(F.broadcast(s), F.col("f.source_molregno") == F.col("s.molregno"))
        .join(F.broadcast(t), F.col("f.target_molregno") == F.col("t.molregno"))
        .filter(F.col("s.alogp").isNotNull() & F.col("t.alogp").isNotNull())
        .groupBy(F.col("s.chembl_id").alias("source_chembl_id"))
        .agg(exact_avg(F.abs(F.col("s.alogp") - F.col("t.alogp")), 2).alias("avg_abs_alogp_diff"))
    )


# --------------------------------------------------------------------------
# U1 / U2 — union all, except all (datamart.py:54-58; anti-join family)
# --------------------------------------------------------------------------
@register(
    "ref_union_all",
    oracle="""
        SELECT l_orderkey AS id, 'lineitem' AS src FROM lineitem WHERE l_returnflag = 'R'
        UNION ALL
        SELECT o_orderkey AS id, 'orders' AS src FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("reference",),
)
def ref_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: concat-style UNION ALL with a provenance tag (duplicates kept)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("id"), F.lit("lineitem").alias("src")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("id"), F.lit("orders").alias("src")
    )
    return a.unionByName(b)


@register(
    "ref_except_all",
    oracle="""
        SELECT l_orderkey AS id FROM lineitem WHERE l_linenumber <= 2
        EXCEPT ALL
        SELECT l_orderkey AS id FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("reference",),
)
def ref_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: EXCEPT ALL (bag semantics) — the reference approximated this
    with membership loops."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select(F.col("l_orderkey").alias("id"))
    b = li.filter(F.col("l_returnflag") == "A").select(F.col("l_orderkey").alias("id"))
    return a.exceptAll(b)


@register(
    "ref_intersect",
    oracle="""
        SELECT l_orderkey AS id FROM lineitem WHERE l_linenumber <= 2
        INTERSECT
        SELECT l_orderkey AS id FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("reference",),
)
def ref_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-extension: INTERSECT (set semantics) — rounds out the set-op
    family next to UNION ALL and EXCEPT ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select(F.col("l_orderkey").alias("id"))
    b = li.filter(F.col("l_returnflag") == "A").select(F.col("l_orderkey").alias("id"))
    return a.intersect(b)


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_pivot_counts",
    oracle=f"""
        SELECT user_id,
               {", ".join(
                   f"count(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES
               )}
        FROM events GROUP BY user_id
    """,
    tags=("extension",),
)
def events_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix via the real pivot
    operator (explicit value list → no extra distinct-values job);
    absent combinations coalesced to 0 to match the conditional-
    aggregation oracle."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    )


# --------------------------------------------------------------------------
# A1 — counts (compute_morgan.py:11-13)
# --------------------------------------------------------------------------
@register(
    "ref_counts",
    oracle="""
        SELECT count(*) AS n_rows,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem
    """,
    tags=("reference",),
)
def ref_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: count(*) and exact count-distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --------------------------------------------------------------------------
# O1 — window top-k per group (datamart.py:31)
# --------------------------------------------------------------------------
@register(
    "ref_topk_per_group",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn::int AS rn
        FROM (
            SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
            FROM lineitem
        ) WHERE rn <= 10
    """,
    tags=("reference",),
)
def ref_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: the canonical per-group top-10 via window row_number."""
    li = load_table(spark, sf_dir, "lineitem")
    return top_k_per_group(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_suppkey"],
        [F.desc("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
        k=10,
    )


# --------------------------------------------------------------------------
# A5 — tolerance tie flag (datamart.py:28-47) — the hard semantic
# --------------------------------------------------------------------------
_TIE_ISCLOSE = isclose_sql("similarity", "_last")

@register(
    "ref_tie_flag_topk",
    oracle=f"""
        SELECT l_suppkey AS target_molregno, l_orderkey, l_linenumber,
               similarity,
               (CASE WHEN _cnt_all != _cnt_top THEN _cnt_all ELSE 0 END)::bigint
                   AS has_duplicates_of_last_largest_score
        FROM (
            SELECT *,
                   sum(CASE WHEN {_TIE_ISCLOSE} THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_suppkey) AS _cnt_all,
                   sum(CASE WHEN {_TIE_ISCLOSE} AND _rn <= 10 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_suppkey) AS _cnt_top
            FROM (
                SELECT *,
                       min(CASE WHEN _rn <= 10 THEN similarity END)
                           OVER (PARTITION BY l_suppkey) AS _last
                FROM (
                    SELECT l_suppkey, l_orderkey, l_linenumber,
                           l_discount AS similarity,
                           row_number() OVER (
                               PARTITION BY l_suppkey
                               ORDER BY l_discount DESC, l_orderkey, l_linenumber
                           ) AS _rn
                    FROM lineitem
                )
            )
        ) WHERE _rn <= 10
    """,
    tags=("reference",),
)
def ref_tie_flag_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: top-10 per target with np.isclose tie flag (rtol=1e-5,
    atol=1e-8 — the code's values, not the readme's claimed 1e-9).

    l_discount stands in for similarity because its coarse value grid
    produces real tie clusters truncated at the k=10 boundary.
    """
    li = load_table(spark, sf_dir, "lineitem")
    facts = li.select(
        F.col("l_suppkey").alias("target_molregno"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_discount").alias("similarity"),
    )
    return top_k_with_tie_flag(
        facts,
        group_cols=["target_molregno"],
        score_col="similarity",
        tiebreak_cols=["l_orderkey", "l_linenumber"],
        k=10,
    )


# --------------------------------------------------------------------------
# O2 — global order-by + limit (tanimoto.py:145)
# --------------------------------------------------------------------------
@register(
    "ref_orderby_limit",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 5
    """,
    tags=("reference",),
)
def ref_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global sort desc + limit, with unique tiebreak for stability."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(5)
    )


# --------------------------------------------------------------------------
# J4 / I1 — processed-file ledger anti-join (tanimoto.py:28-58)
# --------------------------------------------------------------------------
@register(
    "ref_ledger_new_files",
    oracle=f"""
        SELECT DISTINCT 'events_' || user_id AS file FROM events
        EXCEPT
        SELECT DISTINCT 'events_' || user_id AS file
        FROM events
        WHERE event_type = 'signup'
          AND (epoch_us(ts) // 86400000000) < {_LEDGER_CUTOFF_DAY}
    """,
    tags=("reference",),
)
def ref_ledger_new_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/I1: candidate inputs anti-joined against the processed ledger.

    The ledger here is 'users who signed up before 2024-01-03'; epoch
    arithmetic is integer-only (tz-proof across engines).
    """
    ev = load_table(spark, sf_dir, "events")
    files = ev.select(
        F.concat(F.lit("events_"), F.col("user_id")).alias("file")
    ).distinct()
    ledger = (
        ev.filter(
            (F.col("event_type") == "signup")
            & (F.expr(f"ts_ns div {_NS_PER_DAY}") < _LEDGER_CUTOFF_DAY)
        )
        .select(F.concat(F.lit("events_"), F.col("user_id")).alias("file"))
        .distinct()
    )
    return files.join(ledger, "file", "left_anti")


# --------------------------------------------------------------------------
# Flagship — the datamart chain composed (O1 → J7 → A2), used by entry()
# --------------------------------------------------------------------------
@register(
    "flagship_datamart_chain",
    oracle=f"""
        SELECT n_name, {_AVG_PRICE_SQL} AS avg_top_price,
               count(*) AS n_top_items
        FROM (
            SELECT l_suppkey, l_extendedprice
            FROM (
                SELECT l_suppkey, l_extendedprice,
                       row_number() OVER (
                           PARTITION BY l_suppkey
                           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
                FROM lineitem
            ) WHERE rn <= 10
        ) top
        JOIN supplier ON top.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    tags=("reference", "headline"),
)
def flagship_datamart_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's silver→gold chain in one plan: per-group top-10
    (O1) → dim joins (J7) → avg GROUP BY view (A2)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    top = top_k_per_group(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_suppkey"],
        [F.desc("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
        k=10,
        keep_rank=False,
    )
    return (
        top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            exact_avg(F.col("l_extendedprice"), 2).alias("avg_top_price"),
            F.count(F.lit(1)).alias("n_top_items"),
        )
    )
