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
def _gini_sql(dialect: str) -> str:
    """Gini coefficient of per-customer revenue via the rank formula
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending-sorted exact
    cents (custkey tiebreak) — the single-number complement of the ABC
    classification (lineitem_abc_analysis). Every Σ is exact int64
    (explicit bigint casts defeat HUGEINT widening); G is ONE final
    division. Scale: one orders shuffle to |customers| partials, one
    rank window over customers; at extreme scale the rank comes from
    the two-phase global rank (operators/rank.py), same arithmetic."""
    od = _ORD_VIEW if dialect == D.SPARK else "orders"
    return f"""
        WITH rev AS (
            SELECT o_custkey,
                   cast(sum(cast(round(o_totalprice * 100) AS bigint))
                        AS bigint) AS cents
            FROM {od} GROUP BY o_custkey
        ),
        ranked AS (
            SELECT cents,
                   cast(row_number() OVER (ORDER BY cents, o_custkey)
                        AS bigint) AS i
            FROM rev
        )
        SELECT cast(count(*) AS bigint) AS n_customers,
               cast(sum(cents) AS bigint) AS total_cents,
               cast(2 * cast(sum(i * cents) AS bigint)
                    - (count(*) + 1) * cast(sum(cents) AS bigint) AS double)
               / cast(count(*) * cast(sum(cents) AS bigint) AS double) AS gini
        FROM ranked
    """


@register("orders_gini_revenue", oracle=_gini_sql(D.DUCK), tags=("extension",))
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration (exact-cents
    rank formula). See _gini_sql."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(_ORD_VIEW)
    return spark.sql(_gini_sql(D.SPARK))


# --------------------------------------------------------------------------
# Skyline / Pareto front (multi-objective dominance)
# --------------------------------------------------------------------------
def _skyline_sql(dialect: str) -> str:
    """2-D skyline of parts minimizing (retail price, size): the
    Pareto-optimal offers no other part dominates on both axes.

    Sort-based formulation (Börzsönyi et al.'s SFS reduced to 2-D):
    collapse each distinct price to its minimum size, then a point is
    on the front iff its size is strictly below the running minimum of
    all cheaper points — one window over |distinct prices| rows, no
    quadratic dominance join. The running min uses an explicit ROWS …
    1 PRECEDING frame so a point is never compared against itself.
    Scale: one part-sized aggregation + one range-sorted window."""
    pt = _PART_VIEW if dialect == D.SPARK else "part"
    return f"""
        WITH pp AS (
            SELECT p_retailprice AS price,
                   min(p_size) AS size,
                   cast(count(*) AS bigint) AS n_parts
            FROM {pt} GROUP BY p_retailprice
        ),
        scanned AS (
            SELECT price, size, n_parts,
                   min(size) OVER (ORDER BY price
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_min
            FROM pp
        )
        SELECT price, size, n_parts
        FROM scanned
        WHERE prev_min IS NULL OR size < prev_min
    """


@register("part_skyline", oracle=_skyline_sql(D.DUCK), tags=("extension",))
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front of parts on (price, size), sort-based — no
    quadratic dominance join. See _skyline_sql."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView(_PART_VIEW)
    return spark.sql(_skyline_sql(D.SPARK))


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
