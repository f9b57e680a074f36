"""Statistical mining & data-quality diagnostics.

Ten operator families a production analytics engine is asked for after
the warehouse basics exist — forecast backtesting, changepoint
detection, robust outliers, sequence mining, referential-integrity and
Benford audits, inequality measurement, Pareto fronts, tokenizer
diagnostics, and containment-based near-dup — each in its 100 TB shape
and each dual-dialect oracle-checked.

Exactness rules (house discipline, see functions/dialect.py): every
cross-row aggregate is exact integer arithmetic (counts, cents,
quantized keys) with an explicit ``cast(sum(..) as bigint)`` so DuckDB's
HUGEINT widening can't drift the hash; doubles appear only as (a) a
single division/expression rooted in exact ints, identical syntactically
in both dialects, or (b) per-row IEEE expressions with identical trees;
medians/quantiles are rank-SELECTED (value at a deterministic rank in a
total order), never interpolated; every rank/argmax carries a unique-key
tiebreak.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_EV_VIEW = "__fps_mine_events"
_ORD_VIEW = "__fps_mine_orders"
_LI_VIEW = "__fps_mine_lineitem"
_PART_VIEW = "__fps_mine_part"
_SUPP_VIEW = "__fps_mine_supplier"
_CUST_VIEW = "__fps_mine_customer"
_DOC_VIEW = "__fps_mine_documents"
_NAT_VIEW = "__fps_mine_nation"
_REG_VIEW = "__fps_mine_region"


def _ev(dialect: str) -> str:
    return _EV_VIEW if dialect == D.SPARK else "events"


def _idiv(a: str, b: str, dialect: str) -> str:
    """Integer division: Spark SQL spells it ``div``, DuckDB ``//``."""
    op = "div" if dialect == D.SPARK else "//"
    return f"({a} {op} {b})"


def _epoch_s(dialect: str) -> str:
    return "ts_epoch_s" if dialect == D.SPARK else "(epoch_us(ts) // 1000000)"


def _epoch_us(dialect: str) -> str:
    return "(ts_ns div 1000)" if dialect == D.SPARK else "epoch_us(ts)"


def _register_events(spark: SparkSession, sf_dir: str) -> None:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest (time-series eval)
# --------------------------------------------------------------------------
def _forecast_backtest_sql(dialect: str, hourly_rel: str | None = None) -> str:
    """Backtest of the seasonal-naive forecaster on hourly event volume:
    train on the first 80% of the observed hour range, forecast each
    hour-of-week slot as the train-period average for that slot, and
    score it against the test-period average per slot.

    The output is PER-SLOT (≤168 rows), not a single MAE — a scalar MAE
    would require summing IEEE doubles across slots, whose result is
    addition-order-dependent; per-slot errors are single-rooted
    divisions of exact int64 counts, so both engines emit identical
    bits. Scale shape: one fact aggregation to |hours| rows, then
    window/joins over ≤168-row relations — the fact table is scanned
    once.  ``hourly_rel`` names a pre-staged (h, c) relation — the
    Spark side aggregates and caches it once, because Spark inlines
    CTEs per reference and would otherwise rescan the fact table for
    every consumer; the DuckDB oracle keeps the single-SQL form."""
    es = _epoch_s(dialect)
    hourly = hourly_rel or f"""(
            SELECT cast({_idiv(es, "3600", dialect)} AS bigint) AS h,
                   cast(count(*) AS bigint) AS c
            FROM {_ev(dialect)}
            GROUP BY cast({_idiv(es, "3600", dialect)} AS bigint)
        )"""
    return f"""
        WITH hourly AS (SELECT * FROM {hourly} hrly),
        bounds AS (
            SELECT min(h) AS mn, max(h) AS mx FROM hourly
        ),
        labeled AS (
            SELECT h % 168 AS slot, c,
                   (h <= mn + {_idiv("((mx - mn) * 4)", "5", dialect)}) AS is_train
            FROM hourly, bounds
        ),
        tr AS (
            SELECT slot, cast(sum(c) AS bigint) AS s,
                   cast(count(*) AS bigint) AS k
            FROM labeled WHERE is_train GROUP BY slot
        ),
        te AS (
            SELECT slot, cast(sum(c) AS bigint) AS s,
                   cast(count(*) AS bigint) AS k
            FROM labeled WHERE NOT is_train GROUP BY slot
        )
        SELECT tr.slot AS hour_of_week,
               tr.k AS n_train_hours, te.k AS n_test_hours,
               cast(tr.s AS double) / cast(tr.k AS double) AS forecast,
               cast(te.s AS double) / cast(te.k AS double) AS actual,
               abs(cast(tr.s AS double) / cast(tr.k AS double)
                   - cast(te.s AS double) / cast(te.k AS double)) AS abs_err
        FROM tr JOIN te ON tr.slot = te.slot
    """


@register(
    "events_forecast_backtest",
    oracle=_forecast_backtest_sql(D.DUCK),
    tags=("extension",),
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive hourly-volume forecast backtested on an 80/20
    time split: per hour-of-week slot, train-average forecast vs
    test-average actual with per-slot absolute error. The hourly
    aggregate (|hours| rows) is staged + cached once so the fact table
    is scanned exactly once. See _forecast_backtest_sql."""
    from finalpipeline_spark.functions.caching import scoped_cache

    _register_events(spark, sf_dir)
    es = _epoch_s(D.SPARK)
    hourly = scoped_cache(
        spark.sql(
            f"""SELECT cast({_idiv(es, "3600", D.SPARK)} AS bigint) AS h,
                   cast(count(*) AS bigint) AS c
               FROM {_EV_VIEW}
               GROUP BY cast({_idiv(es, "3600", D.SPARK)} AS bigint)"""
        ),
        "events_forecast_backtest",
    )
    hourly.createOrReplaceTempView("__fps_mine_hourly")
    return spark.sql(_forecast_backtest_sql(D.SPARK, hourly_rel="__fps_mine_hourly"))


# --------------------------------------------------------------------------
# Changepoint detection (max cumulative deviation, CUSUM-family)
# --------------------------------------------------------------------------
def _changepoint_sql(dialect: str) -> str:
    """Most-likely changepoint in each event type's daily volume: the
    day maximizing |cum_t·n − t·total| — the integer-exact form of the
    CUSUM / KS-on-time statistic (deviation of the observed cumulative
    count from the uniform-rate line), so the argmax is bit-identical
    across engines (ties broken toward the earliest day). dev_norm
    rescales into [0, 1) with one final division.

    Scale shape: one fact shuffle to |type × day| partials; windows run
    per type over day-count-sized partitions; nothing rescans events."""
    es = _epoch_s(dialect)
    return f"""
        WITH daily AS (
            SELECT event_type,
                   cast({_idiv(es, "86400", dialect)} AS bigint) AS d,
                   cast(count(*) AS bigint) AS c
            FROM {_ev(dialect)}
            GROUP BY event_type, cast({_idiv(es, "86400", dialect)} AS bigint)
        ),
        cum AS (
            SELECT event_type, d, c,
                   cast(row_number() OVER w_ord AS bigint) AS t,
                   cast(sum(c) OVER w_cum AS bigint) AS cum_c,
                   cast(count(*) OVER w_all AS bigint) AS n_days,
                   cast(sum(c) OVER w_all AS bigint) AS total
            FROM daily
            WINDOW w_ord AS (PARTITION BY event_type ORDER BY d),
                   w_cum AS (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w_all AS (PARTITION BY event_type)
        ),
        dev AS (
            SELECT event_type, d, t, n_days, total,
                   abs(cum_c * n_days - t * total) AS dev
            FROM cum
        )
        SELECT event_type, d AS day_epoch, dev,
               cast(dev AS double) / cast(n_days * total AS double) AS dev_norm
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY dev DESC, d) AS rk
            FROM dev
        ) ranked WHERE rk = 1
    """


@register(
    "events_changepoint", oracle=_changepoint_sql(D.DUCK), tags=("extension",)
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type changepoint day: argmax of the integer-exact cumulative
    deviation |cum·n − t·total| over daily volumes. See
    _changepoint_sql."""
    _register_events(spark, sf_dir)
    return spark.sql(_changepoint_sql(D.SPARK))


# --------------------------------------------------------------------------
# Robust outliers: median / MAD (rank-selected, exact)
# --------------------------------------------------------------------------
def _mad_sql(dialect: str) -> str:
    """Median-absolute-deviation outlier profile per event type: the
    robust alternative to the z-score (events_anomaly_zscore) — a few
    extreme values cannot drag the center or the spread.

    Both medians are rank-SELECTED: the value at row_number
    (n+1)//2 in the (value, event_id) total order — deterministic, no
    interpolation, no float aggregation anywhere; |v − med| and the
    3.0·MAD fence are per-row IEEE expressions with identical trees.
    Scale note: the per-type sort is the exact path kept for oracle
    parity; at petabyte scale the same report runs on
    approx_percentile with this query as its sampled sign-off."""
    return f"""
        WITH v AS (
            SELECT event_type, value, event_id
            FROM {_ev(dialect)} WHERE value IS NOT NULL
        ),
        med AS (
            SELECT event_type,
                   max(CASE WHEN rn = {_idiv("(n + 1)", "2", dialect)}
                            THEN value END) AS med
            FROM (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value, event_id) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM v
            ) r GROUP BY event_type
        ),
        dv AS (
            SELECT v.event_type, abs(v.value - m.med) AS adev, v.event_id,
                   m.med
            FROM v JOIN med m ON v.event_type = m.event_type
        ),
        mad AS (
            SELECT event_type, max(med) AS med,
                   max(CASE WHEN rn = {_idiv("(n + 1)", "2", dialect)}
                            THEN adev END) AS mad
            FROM (
                SELECT event_type, med, adev,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY adev, event_id) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM dv
            ) r GROUP BY event_type
        )
        SELECT d.event_type,
               cast(count(*) AS bigint) AS n,
               max(m.med) AS median_value,
               max(m.mad) AS mad,
               cast(count(CASE WHEN d.adev > 3.0 * m.mad THEN 1 END)
                    AS bigint) AS n_outliers
        FROM dv d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
    """


@register("events_mad_outliers", oracle=_mad_sql(D.DUCK), tags=("extension",))
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type via rank-selected median
    and MAD with a 3·MAD fence. See _mad_sql."""
    _register_events(spark, sf_dir)
    return spark.sql(_mad_sql(D.SPARK))


# --------------------------------------------------------------------------
# Sequence mining: first-order Markov transitions
# --------------------------------------------------------------------------
def _markov_sql(dialect: str) -> str:
    """Per-user event-type transition matrix P(next | prev): the
    counting core of clickstream sequence mining / next-event
    prediction. One lead() window over (user, time, event_id) — the
    same composite-key determinism as the attribution queries — then
    an exact pair count and one division per row. Scale shape: one
    user-keyed window shuffle, then |types²|-row aggregation."""
    us = _epoch_us(dialect)
    return f"""
        WITH seq AS (
            SELECT event_type AS prev_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY {us}, event_id
                   ) AS next_type
            FROM {_ev(dialect)}
        ),
        pairs AS (
            SELECT prev_type, next_type, cast(count(*) AS bigint) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n,
               cast(n AS double) /
               cast(sum(n) OVER (PARTITION BY prev_type) AS double) AS p
        FROM pairs
    """


@register(
    "events_markov_transitions", oracle=_markov_sql(D.DUCK), tags=("extension",)
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition probabilities between event types
    within each user's time-ordered stream. See _markov_sql."""
    _register_events(spark, sf_dir)
    return spark.sql(_markov_sql(D.SPARK))


# --------------------------------------------------------------------------
# Referential-integrity audit (data quality)
# --------------------------------------------------------------------------
def _fk_audit_sql(dialect: str) -> str:
    """Orphan counts for every foreign key of the star schema in one
    report — the data-quality gate a warehouse runs after each load
    (the reference had no integrity checking at all; its Postgres
    schema declared no FKs — SURVEY §3.3).

    Each arm is a left join from child to parent counting NULL parents;
    parents are primary keys so the join never fans out. At scale the
    dimension sides broadcast; the lineitem arms share one fact scan
    per arm (kept separate so each arm states its constraint)."""
    if dialect == D.SPARK:
        li, od, pt, sp, cu = _LI_VIEW, _ORD_VIEW, _PART_VIEW, _SUPP_VIEW, _CUST_VIEW
    else:
        li, od, pt, sp, cu = "lineitem", "orders", "part", "supplier", "customer"
    arms = [
        ("lineitem.l_orderkey -> orders", li, "l_orderkey", od, "o_orderkey"),
        ("lineitem.l_partkey -> part", li, "l_partkey", pt, "p_partkey"),
        ("lineitem.l_suppkey -> supplier", li, "l_suppkey", sp, "s_suppkey"),
        ("orders.o_custkey -> customer", od, "o_custkey", cu, "c_custkey"),
    ]
    selects = [
        f"""SELECT '{name}' AS fk_constraint,
               cast(count(*) AS bigint) AS n_child_rows,
               cast(count(CASE WHEN p.{pk} IS NULL THEN 1 END) AS bigint)
                   AS n_orphans
        FROM {child} c LEFT JOIN {parent} p ON c.{ck} = p.{pk}"""
        for name, child, ck, parent, pk in arms
    ]
    return "\nUNION ALL\n".join(selects)


@register("fk_integrity_audit", oracle=_fk_audit_sql(D.DUCK), tags=("extension",))
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema referential-integrity report: orphan counts per
    foreign key. See _fk_audit_sql."""
    for name, view in [
        ("lineitem", _LI_VIEW),
        ("orders", _ORD_VIEW),
        ("part", _PART_VIEW),
        ("supplier", _SUPP_VIEW),
        ("customer", _CUST_VIEW),
    ]:
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
    return spark.sql(_fk_audit_sql(D.SPARK))


# --------------------------------------------------------------------------
# Benford first-digit audit (data quality / fraud screening)
# --------------------------------------------------------------------------
# log10(1 + 1/d) computed ONCE here and embedded as the same literal in
# both dialects — engine log() implementations may differ in the last
# ulp, a Python-side constant cannot.
_BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def _benford_sql(dialect: str) -> str:
    """First-significant-digit distribution of lineitem extended prices
    against Benford's law — the classic screen for fabricated or
    truncated monetary data. The digit is extracted from the exact
    cents integer via string head (no float log10 per row); per-digit
    rows avoid any cross-digit float summation, and expected
    frequencies are Python-computed literals identical in both
    dialects. observed_p and the deviation are single-rooted IEEE
    expressions over exact counts. One scan, 9 output rows."""
    li = _LI_VIEW if dialect == D.SPARK else "lineitem"
    strfn = "string" if dialect == D.SPARK else "varchar"
    exp_case = " ".join(
        f"WHEN '{d}' THEN {_BENFORD_P[d]}" for d in range(1, 10)
    )
    return f"""
        WITH digits AS (
            SELECT substr(cast(cast(round(l_extendedprice * 100) AS bigint)
                               AS {strfn}), 1, 1) AS digit
            FROM {li}
            WHERE l_extendedprice > 0
        ),
        counted AS (
            SELECT digit, cast(count(*) AS bigint) AS n_obs
            FROM digits GROUP BY digit
        )
        SELECT digit, n_obs,
               cast(n_obs AS double) /
                   cast(sum(n_obs) OVER () AS double) AS observed_p,
               cast(CASE digit {exp_case} END AS double) AS benford_p,
               abs(cast(n_obs AS double) / cast(sum(n_obs) OVER () AS double)
                   - cast(CASE digit {exp_case} END AS double)) AS abs_dev
        FROM counted
    """


@register("lineitem_benford_audit", oracle=_benford_sql(D.DUCK), tags=("extension",))
def lineitem_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit frequency of prices vs Benford's law, per digit.
    See _benford_sql."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(_LI_VIEW)
    return spark.sql(_benford_sql(D.SPARK))


# --------------------------------------------------------------------------
# Gini coefficient (revenue inequality)
# --------------------------------------------------------------------------
def _gini_rev_sql(dialect: str) -> str:
    od = _ORD_VIEW if dialect == D.SPARK else "orders"
    return f"""
            SELECT o_custkey,
                   cast(sum(cast(round(o_totalprice * 100) AS bigint))
                        AS bigint) AS cents
            FROM {od} GROUP BY o_custkey
    """


def _gini_sql(dialect: str, ranked_rel: str | None = None) -> str:
    """Gini coefficient of per-customer revenue via the rank formula
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending-sorted exact
    cents (custkey tiebreak) — the single-number complement of the ABC
    classification (lineitem_abc_analysis). Every Σ is exact int64
    (explicit bigint casts defeat HUGEINT widening); G is ONE final
    division. Scale: one orders shuffle to |customers| partials; the
    SHIPPED Spark path computes the rank i with the two-phase global
    rank (operators/rank.assign_global_rank — ``ranked_rel``), so no
    single task ever ranks all customers; the oracle keeps the
    textbook single window, same arithmetic."""
    if ranked_rel:
        ranked = ranked_rel
        prelude = ""
    else:
        ranked = "ranked"
        prelude = f"""
        WITH rev AS ({_gini_rev_sql(dialect)}),
        ranked AS (
            SELECT cents,
                   cast(row_number() OVER (ORDER BY cents, o_custkey)
                        AS bigint) AS i
            FROM rev
        )"""
    return f"""{prelude}
        SELECT cast(count(*) AS bigint) AS n_customers,
               cast(sum(cents) AS bigint) AS total_cents,
               cast(2 * cast(sum(i * cents) AS bigint)
                    - (count(*) + 1) * cast(sum(cents) AS bigint) AS double)
               / cast(count(*) * cast(sum(cents) AS bigint) AS double) AS gini
        FROM {ranked}
    """


@register("orders_gini_revenue", oracle=_gini_sql(D.DUCK), tags=("extension",))
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration (exact-cents
    rank formula), ranks from the two-phase global rank. See
    _gini_sql."""
    from finalpipeline_spark.operators.rank import assign_global_rank

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(_ORD_VIEW)
    rev = spark.sql(_gini_rev_sql(D.SPARK))
    ranked = assign_global_rank(rev, ["cents", "o_custkey"], out_col="i")
    ranked.createOrReplaceTempView("__fps_mine_gini_ranked")
    return spark.sql(_gini_sql(D.SPARK, ranked_rel="__fps_mine_gini_ranked"))


# --------------------------------------------------------------------------
# Skyline / Pareto front (multi-objective dominance)
# --------------------------------------------------------------------------
def _skyline_pp_sql(dialect: str) -> str:
    pt = _PART_VIEW if dialect == D.SPARK else "part"
    return f"""
            SELECT p_retailprice AS price,
                   min(p_size) AS size,
                   cast(count(*) AS bigint) AS n_parts
            FROM {pt} GROUP BY p_retailprice
    """


def _skyline_sql(dialect: str, scanned_rel: str | None = None) -> str:
    """2-D skyline of parts minimizing (retail price, size): the
    Pareto-optimal offers no other part dominates on both axes.

    Sort-based formulation (Börzsönyi et al.'s SFS reduced to 2-D):
    collapse each distinct price to its minimum size, then a point is
    on the front iff its size is strictly below the running minimum of
    all cheaper points. The running min uses the exclusive
    (1 PRECEDING) frame so a point is never compared against itself.
    Scale: one part-sized aggregation; the SHIPPED Spark path computes
    the running minimum with the two-phase prefix min
    (operators/rank.partitioned_prefix_min — ``scanned_rel``), so no
    single task windows all |distinct prices| rows; the oracle keeps
    the textbook unpartitioned window."""
    if scanned_rel:
        scanned = scanned_rel
        prelude = ""
    else:
        scanned = "scanned"
        prelude = f"""
        WITH pp AS ({_skyline_pp_sql(dialect)}),
        scanned AS (
            SELECT price, size, n_parts,
                   min(size) OVER (ORDER BY price
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_min
            FROM pp
        )"""
    return f"""{prelude}
        SELECT price, size, n_parts
        FROM {scanned}
        WHERE prev_min IS NULL OR size < prev_min
    """


@register("part_skyline", oracle=_skyline_sql(D.DUCK), tags=("extension",))
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front of parts on (price, size), sort-based — no
    quadratic dominance join; running min from the two-phase prefix
    min. See _skyline_sql."""
    from finalpipeline_spark.operators.rank import partitioned_prefix_min

    load_table(spark, sf_dir, "part").createOrReplaceTempView(_PART_VIEW)
    pp = spark.sql(_skyline_pp_sql(D.SPARK))
    scanned = partitioned_prefix_min(
        pp, [], ["price"], "size", out_col="prev_min", inclusive=False
    )
    scanned.createOrReplaceTempView("__fps_mine_skyline_scanned")
    return spark.sql(
        _skyline_sql(D.SPARK, scanned_rel="__fps_mine_skyline_scanned")
    )


# --------------------------------------------------------------------------
# Tokenizer fertility diagnostics (LLM-pipeline QA)
# --------------------------------------------------------------------------
def _fertility_sql(dialect: str) -> str:
    """Chars-per-token ("fertility") and tokens-per-doc by language —
    the tokenizer-coverage diagnostic a multilingual training pipeline
    watches (a lang whose fertility spikes is being shredded into too
    many tokens and will be under-trained per byte). Token counts use
    the engine-identical tokenizer from dialect.tokens; sums are exact
    ints; ratios are single divisions. One scan, |langs| rows."""
    doc = _DOC_VIEW if dialect == D.SPARK else "documents"
    nt = D.arr_size(D.tokens("text", dialect), dialect)
    return f"""
        WITH per_doc AS (
            SELECT lang, n_chars, {nt} AS n_toks
            FROM {doc}
        )
        SELECT lang,
               cast(count(*) AS bigint) AS n_docs,
               cast(sum(n_chars) AS bigint) AS total_chars,
               cast(sum(n_toks) AS bigint) AS total_tokens,
               cast(cast(sum(n_chars) AS bigint) AS double)
                   / cast(cast(sum(n_toks) AS bigint) AS double)
                   AS chars_per_token,
               cast(cast(sum(n_toks) AS bigint) AS double)
                   / cast(count(*) AS double) AS tokens_per_doc
        FROM per_doc
        GROUP BY lang
    """


@register("doc_tokenizer_fertility", oracle=_fertility_sql(D.DUCK), tags=("extension",))
def doc_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (chars/token) and density
    (tokens/doc). See _fertility_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(_DOC_VIEW)
    return spark.sql(_fertility_sql(D.SPARK))


# --------------------------------------------------------------------------
# Weighted median (exact, cumulative-weight rank selection)
# --------------------------------------------------------------------------
def _weighted_median_sql(dialect: str) -> str:
    """Quantity-weighted median line price per return flag — the
    robust "typical traded price" (an unweighted median over lines
    over-represents small lots). Entirely integer-exact: prices in
    cents, weights are TPC-H's integral quantities, and the selected
    value is the first in the (cents, orderkey, linenumber) total
    order whose doubled cumulative weight reaches the total — a
    deterministic rank selection, no interpolation, no float math
    before the final output cast.

    Scale shape (SQL form = the oracle): one fact shuffle onto |flags|
    window partitions. The shipped Spark implementation instead takes
    the cumulative weight from the two-phase decomposition
    (operators/rank.partitioned_prefix_sum) — same arithmetic, same
    selection rule, no one-task-per-flag stage."""
    li = _LI_VIEW if dialect == D.SPARK else "lineitem"
    return f"""
        WITH w AS (
            SELECT l_returnflag AS flag,
                   cast(round(l_extendedprice * 100) AS bigint) AS cents,
                   cast(l_quantity AS bigint) AS wt,
                   l_orderkey, l_linenumber
            FROM {li}
        ),
        cum AS (
            SELECT flag, cents, wt,
                   cast(sum(wt) OVER (
                       PARTITION BY flag
                       ORDER BY cents, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS bigint) AS cumw,
                   cast(sum(wt) OVER (PARTITION BY flag) AS bigint) AS total_w,
                   cast(count(*) OVER (PARTITION BY flag) AS bigint) AS n_lines
            FROM w
        )
        SELECT flag AS l_returnflag,
               max(n_lines) AS n_lines,
               max(total_w) AS total_qty,
               min(cents) AS weighted_median_cents
        FROM cum
        WHERE 2 * cumw >= total_w
        GROUP BY flag
    """


@register(
    "lineitem_weighted_median",
    oracle=_weighted_median_sql(D.DUCK),
    tags=("extension",),
)
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag via
    cumulative-weight rank selection. See _weighted_median_sql for the
    semantics.

    The cumulative weight comes from the two-phase decomposition
    (operators/rank.partitioned_prefix_sum: range exchange on
    (flag, price-order), per-task running sum, broadcast offsets) —
    NOT from ``sum() OVER (PARTITION BY flag ...)``, which would give
    one task per return flag (3 tasks for the whole fact at any
    scale). Same arithmetic, same selection rule, same oracle."""
    from pyspark.sql import functions as F

    from finalpipeline_spark.operators.rank import partitioned_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    w = li.selectExpr(
        "l_returnflag AS flag",
        "cast(round(l_extendedprice * 100) AS bigint) AS cents",
        "cast(l_quantity AS bigint) AS wt",
        "l_orderkey",
        "l_linenumber",
    )
    cum = partitioned_prefix_sum(
        w, ["flag"], ["cents", "l_orderkey", "l_linenumber"], "wt", out_col="cumw"
    )
    totals = w.groupBy("flag").agg(
        F.expr("cast(sum(wt) as bigint)").alias("total_w"),
        F.expr("cast(count(*) as bigint)").alias("n_lines"),
    )
    return (
        cum.join(F.broadcast(totals), "flag")
        .where("2 * cumw >= total_w")
        .groupBy("flag")
        .agg(
            F.expr("cast(max(n_lines) as bigint)").alias("n_lines"),
            F.expr("cast(max(total_w) as bigint)").alias("total_qty"),
            F.expr("cast(min(cents) as bigint)").alias("weighted_median_cents"),
        )
        .withColumnRenamed("flag", "l_returnflag")
    )


# --------------------------------------------------------------------------
# Relational division (universal quantification)
# --------------------------------------------------------------------------
def _division_sql(dialect: str) -> str:
    """Customers whose purchases are sourced from suppliers in ALL
    regions — relational division (the FOR ALL quantifier), the one
    classic relational operator the engine had not yet exhibited.

    Division-by-counting: reduce the fact chain to DISTINCT
    (customer, region) pairs, then keep customers whose distinct-region
    count equals the divisor cardinality — computed FROM the region
    table, never hardcoded, so the query stays correct when the
    divisor relation changes. Scale shape: the big joins are
    fact→broadcast dims; the distinct collapses the fact to at most
    |customers|·|regions| rows before the final count."""
    if dialect == D.SPARK:
        li, od, sp, na, rg = _LI_VIEW, _ORD_VIEW, _SUPP_VIEW, _NAT_VIEW, _REG_VIEW
    else:
        li, od, sp, na, rg = "lineitem", "orders", "supplier", "nation", "region"
    return f"""
        WITH cust_region AS (
            SELECT DISTINCT o.o_custkey, n.n_regionkey
            FROM {od} o
            JOIN {li} l ON o.o_orderkey = l.l_orderkey
            JOIN {sp} s ON l.l_suppkey = s.s_suppkey
            JOIN {na} n ON s.s_nationkey = n.n_nationkey
        ),
        divisor AS (
            SELECT cast(count(*) AS bigint) AS n_req FROM {rg}
        )
        SELECT o_custkey, cast(count(*) AS bigint) AS n_regions
        FROM cust_region, divisor
        GROUP BY o_custkey, n_req
        HAVING count(*) = max(n_req)
    """


@register(
    "customer_division_regions", oracle=_division_sql(D.DUCK), tags=("extension",)
)
def customer_division_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: customers sourced from ALL regions
    (divisor cardinality read from the region table). See
    _division_sql."""
    for name, view in [
        ("lineitem", _LI_VIEW),
        ("orders", _ORD_VIEW),
        ("supplier", _SUPP_VIEW),
        ("nation", _NAT_VIEW),
        ("region", _REG_VIEW),
    ]:
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
    return spark.sql(_division_sql(D.SPARK))


# --------------------------------------------------------------------------
# Contingency analysis (chi-square cells / standardized residuals)
# --------------------------------------------------------------------------
def _contingency_sql(dialect: str) -> str:
    """lang × source contingency table with expected counts and
    standardized Pearson residuals — which (language, source) cells
    are over/under-represented vs independence, the corpus-mix
    association diagnostic behind a chi-square test.

    Per-cell rows (≤ |langs|·|sources|) avoid any cross-cell float
    summation; expected = row·col/N is a single division of exact
    int64 marginals, and the residual (o−e)/√e uses IEEE sqrt, which
    is correctly rounded and therefore engine-identical for identical
    input bits. One scan, one |cells|-sized aggregation, marginals by
    window over cells."""
    doc = _DOC_VIEW if dialect == D.SPARK else "documents"
    return f"""
        WITH cells AS (
            SELECT lang, source, cast(count(*) AS bigint) AS o
            FROM {doc} GROUP BY lang, source
        ),
        marg AS (
            SELECT lang, source, o,
                   cast(sum(o) OVER (PARTITION BY lang) AS bigint) AS row_t,
                   cast(sum(o) OVER (PARTITION BY source) AS bigint) AS col_t,
                   cast(sum(o) OVER () AS bigint) AS n
            FROM cells
        )
        SELECT lang, source, o,
               cast(row_t * col_t AS double) / cast(n AS double) AS expected,
               (cast(o AS double)
                - cast(row_t * col_t AS double) / cast(n AS double))
               / sqrt(cast(row_t * col_t AS double) / cast(n AS double))
                   AS std_residual
        FROM marg
    """


@register(
    "doc_lang_source_contingency",
    oracle=_contingency_sql(D.DUCK),
    tags=("extension",),
)
def doc_lang_source_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang × source contingency cells with expected counts under
    independence and standardized residuals. See _contingency_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(_DOC_VIEW)
    return spark.sql(_contingency_sql(D.SPARK))


# --------------------------------------------------------------------------
# Path mining: most common event-type prefixes
# --------------------------------------------------------------------------
_PATH_LEN = 4
_PATH_TOPK = 10


def _top_paths_sql(dialect: str) -> str:
    """Top-10 most common first-4-event paths across users — the
    "what do sessions actually do" report behind funnel design
    (clickstream path mining). Each user's path is their first
    {_PATH_LEN} event types in (time, event_id) order joined with
    '>'; ordered aggregation is the one primitive the two engines
    spell differently (Spark: sort_array over structs then transform;
    DuckDB: list(x ORDER BY ...)), but both produce the identical
    string. Top-k by (count DESC, path) — a total order.

    Scale shape: one user-keyed aggregation (the path build), one
    |distinct paths| count, top-k via per-partition heaps."""
    us = _epoch_us(dialect)
    if dialect == D.SPARK:
        path = (
            f"array_join(slice(transform(array_sort("
            f"collect_list(struct({us} AS us, event_id, event_type))), "
            f"x -> x.event_type), 1, {_PATH_LEN}), '>')"
        )
    else:
        path = (
            f"array_to_string(list_slice("
            f"list(event_type ORDER BY {us}, event_id), 1, {_PATH_LEN}), '>')"
        )
    lim = (
        f"LIMIT {_PATH_TOPK}"
        if dialect == D.DUCK
        else f"LIMIT {_PATH_TOPK}"
    )
    return f"""
        WITH paths AS (
            SELECT user_id, {path} AS path
            FROM {_ev(dialect)}
            GROUP BY user_id
        )
        SELECT path, cast(count(*) AS bigint) AS n_users
        FROM paths
        GROUP BY path
        ORDER BY n_users DESC, path
        {lim}
    """


@register("events_top_paths", oracle=_top_paths_sql(D.DUCK), tags=("extension",))
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common first-4-event-type paths across users (ordered
    aggregation + top-k). See _top_paths_sql."""
    _register_events(spark, sf_dir)
    return spark.sql(_top_paths_sql(D.SPARK))


# --------------------------------------------------------------------------
# Sweep-line interval counting (order backlog over time)
# --------------------------------------------------------------------------
def _backlog_sql(dialect: str) -> str:
    """Daily open-order backlog: how many orders are placed but not yet
    fully shipped on each day — the classic interval-overlap count,
    computed as a SWEEP LINE: each order contributes +1 at its order
    day and −1 the day after its last shipment, and the backlog is the
    running sum of deltas over days. This is O(|orders|) events and an
    |active days|-sized window — never the |orders|·|days| explosion a
    per-day interval join would produce (the same trick behind
    events_concurrency_curve, here on a fact-to-fact interval).

    All-integer: epoch days from DATE-cast timestamps (tz-free in both
    engines), exact delta sums, exact cumulative window."""
    if dialect == D.SPARK:
        od, li = _ORD_VIEW, _LI_VIEW
        oday = "datediff(cast(o_orderdate as date), date '1970-01-01')"
        sday = "datediff(cast(l_shipdate as date), date '1970-01-01')"
    else:
        od, li = "orders", "lineitem"
        oday = "datediff('day', date '1970-01-01', cast(o_orderdate as date))"
        sday = "datediff('day', date '1970-01-01', cast(l_shipdate as date))"
    return f"""
        WITH spans AS (
            SELECT o.o_orderkey,
                   cast({oday} AS bigint) AS d0,
                   cast(max({sday}) AS bigint) AS d1
            FROM {od} o JOIN {li} l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, {oday}
        ),
        deltas AS (
            SELECT d0 AS day, cast(1 AS bigint) AS delta FROM spans
            UNION ALL
            SELECT d1 + 1 AS day, cast(-1 AS bigint) AS delta FROM spans
        ),
        daily AS (
            SELECT day, cast(sum(delta) AS bigint) AS net
            FROM deltas GROUP BY day
        )
        SELECT day AS day_epoch,
               cast(sum(net) OVER (ORDER BY day
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS bigint) AS open_orders
        FROM daily
    """


@register("orders_backlog_sweep", oracle=_backlog_sql(D.DUCK), tags=("extension",))
def orders_backlog_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog via a sweep line over (order day, last
    ship day) intervals — no per-day interval join. See _backlog_sql."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(_ORD_VIEW)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(_LI_VIEW)
    return spark.sql(_backlog_sql(D.SPARK))


# --------------------------------------------------------------------------
# Two-proportion z-test (experimentation analytics)
# --------------------------------------------------------------------------
def _ab_test_sql(dialect: str) -> str:
    """Two-proportion z-test of purchase conversion between the two
    halves of a deterministic user split (user_id parity stands in for
    variant assignment) — the A/B readout every experimentation
    platform ships. Counts are exact; conversion rates, the pooled
    rate, and the z statistic are one fixed expression tree over those
    ints (divisions + IEEE sqrt, correctly rounded → engine-identical
    bits); a degenerate pooled rate (all or none converted) yields a
    NULL z via nullif rather than an ANSI divide-by-zero. One events scan to per-user flags, |users| aggregation, one
    output row."""
    return f"""
        WITH users AS (
            SELECT user_id, user_id % 2 AS variant,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM {_ev(dialect)}
            GROUP BY user_id
        ),
        agg AS (
            SELECT cast(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                        AS bigint) AS n_a,
                   cast(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)
                        AS bigint) AS c_a,
                   cast(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                        AS bigint) AS n_b,
                   cast(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)
                        AS bigint) AS c_b
            FROM users
        )
        SELECT n_a, c_a, n_b, c_b,
               cast(c_a AS double) / cast(n_a AS double) AS rate_a,
               cast(c_b AS double) / cast(n_b AS double) AS rate_b,
               (cast(c_a AS double) / cast(n_a AS double)
                - cast(c_b AS double) / cast(n_b AS double))
               / nullif(sqrt((cast(c_a + c_b AS double)
                              / cast(n_a + n_b AS double))
                      * (1.0 - cast(c_a + c_b AS double)
                               / cast(n_a + n_b AS double))
                      * (1.0 / cast(n_a AS double)
                         + 1.0 / cast(n_b AS double))), 0.0) AS z_score
        FROM agg
    """


@register("events_ab_test_zscore", oracle=_ab_test_sql(D.DUCK), tags=("extension",))
def events_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of conversion between deterministic user
    halves — exact counts, single-rooted IEEE statistic. See
    _ab_test_sql."""
    _register_events(spark, sf_dir)
    return spark.sql(_ab_test_sql(D.SPARK))


# --------------------------------------------------------------------------
# Purchase cadence: median inter-order gap
# --------------------------------------------------------------------------
def _order_gap_gaps_sql(dialect: str) -> str:
    od = _ORD_VIEW if dialect == D.SPARK else "orders"
    if dialect == D.SPARK:
        day = "datediff(cast(o_orderdate as date), date '1970-01-01')"
    else:
        day = "datediff('day', date '1970-01-01', cast(o_orderdate as date))"
    return f"""
        WITH seq AS (
            SELECT o_custkey,
                   cast({day} AS bigint) AS d,
                   cast(lag({day}) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS bigint) AS prev_d,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS k
            FROM {od}
        )
        SELECT o_custkey, k, d - prev_d AS gap
        FROM seq WHERE prev_d IS NOT NULL
    """


def _order_gap_sql(dialect: str, ranked_rel: str | None = None) -> str:
    """Median days between a customer's consecutive orders — the
    purchase-cadence metric behind replenishment and churn models.
    Gaps come from one lag() window per customer (calendar-day diffs of
    DATE-cast values, tz-free); the median is rank-SELECTED from the
    (gap, custkey, rank-in-customer) total order. Scale shape: one
    customer-keyed window over orders; the SHIPPED Spark path takes the
    global gap rank from the two-phase decomposition
    (operators/rank.assign_global_rank — ``ranked_rel``) and the gap
    count from a 1-row broadcast, so no single task ever sees all
    gaps; the oracle keeps the textbook window, same selection rule."""
    if ranked_rel:
        ranked = ranked_rel
        prelude = "WITH "
    else:
        ranked = "ranked"
        prelude = f"""
        WITH gaps AS ({_order_gap_gaps_sql(dialect)}),
        ranked AS (
            SELECT o_custkey, k, gap,
                   row_number() OVER (ORDER BY gap, o_custkey, k) AS rn
            FROM gaps
        ),"""
    return f"""{prelude}
        t AS (SELECT gap, rn FROM {ranked}),
        nn AS (SELECT cast(count(*) AS bigint) AS n FROM t)
        SELECT nn.n AS n_gaps,
               cast(max(CASE WHEN t.rn = {_idiv("(nn.n + 1)", "2", dialect)}
                             THEN t.gap END) AS bigint) AS median_gap_days,
               cast(max(CASE WHEN t.rn = cast(ceil(0.9 * nn.n) AS bigint)
                             THEN t.gap END) AS bigint) AS p90_gap_days
        FROM t CROSS JOIN nn
        GROUP BY nn.n
    """


@register("orders_median_gap", oracle=_order_gap_sql(D.DUCK), tags=("extension",))
def orders_median_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and p90 days between consecutive orders per customer,
    rank-selected exactly; global rank from the two-phase
    decomposition. See _order_gap_sql."""
    from finalpipeline_spark.operators.rank import assign_global_rank

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(_ORD_VIEW)
    gaps = spark.sql(_order_gap_gaps_sql(D.SPARK))
    ranked = assign_global_rank(gaps, ["gap", "o_custkey", "k"], out_col="rn")
    ranked.createOrReplaceTempView("__fps_mine_gap_ranked")
    return spark.sql(_order_gap_sql(D.SPARK, ranked_rel="__fps_mine_gap_ranked"))


# --------------------------------------------------------------------------
# Dedup diagnostics: duplicate rate by source
# --------------------------------------------------------------------------
def _dup_rate_sql(dialect: str) -> str:
    """Exact-duplicate rate per ingestion source — the dedup-pipeline
    health metric (a source whose dup rate spikes is re-crawling or
    mirroring). A duplicate is any doc whose md5(text) fingerprint is
    not the group's canonical minimum doc_id — exactly the
    doc_dedup_exact rule — counted per source with one fingerprint
    aggregation joined back; the rate is one division of exact
    counts."""
    doc = _DOC_VIEW if dialect == D.SPARK else "documents"
    md5 = D.md5_hex("text", dialect)
    return f"""
        WITH fp AS (
            SELECT doc_id, source, {md5} AS fp FROM {doc}
        ),
        canon AS (
            SELECT fp, min(doc_id) AS canon_id FROM fp GROUP BY fp
        )
        SELECT f.source,
               cast(count(*) AS bigint) AS n_docs,
               cast(count(CASE WHEN f.doc_id != c.canon_id THEN 1 END)
                    AS bigint) AS n_dups,
               cast(count(CASE WHEN f.doc_id != c.canon_id THEN 1 END)
                    AS double) / cast(count(*) AS double) AS dup_rate
        FROM fp f JOIN canon c ON f.fp = c.fp
        GROUP BY f.source
    """


@register("doc_dup_rate_by_source", oracle=_dup_rate_sql(D.DUCK), tags=("extension",))
def doc_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source (md5 canonical-min rule). See
    _dup_rate_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(_DOC_VIEW)
    return spark.sql(_dup_rate_sql(D.SPARK))
