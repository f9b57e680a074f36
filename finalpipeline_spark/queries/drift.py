"""Distribution-drift metrics: PSI and the KS statistic.

A production corpus/feature pipeline needs drift monitors between two
populations (yesterday vs today, train vs serve, source A vs source B).
The two standards: Population Stability Index (banking's drift score)
and the Kolmogorov–Smirnov statistic (max CDF gap). Both reduce to
counting, so both can be EXACT in the repo's dual-dialect scheme:

* **PSI** = Σ_buckets (p_i − q_i)·ln(p_i/q_i). With add-one smoothing
  over the union of buckets, every probability is an exact rational
  cnt/tot, so PSI·(tot_a·tot_b) = Σ (cnt_a·tot_b − cnt_b·tot_a)·ln(…)
  — each term is an exact int64 times one ln, and the ln is quantized
  to integer micro-nats (floor(ln·1e6 + 0.5), the BM25/perplexity
  scheme), making every term an exact int64. The SUM is then integer —
  order-independent under any partitioning — and the final PSI is one
  IEEE division.
* **KS** = max_x |F_a(x) − F_b(x)| = max over the merged support of
  |cum_a·n_b − cum_b·n_a| / (n_a·n_b) — an all-integer numerator
  (cumulative counts from a support-sized window), an order-free max,
  one final division. No transcendentals at all.

Scale shape: one fact scan each, aggregated to bucket/support-sized
relations (PSI: |buckets|; KS: |distinct values| — the value column is
integer cents, so support is bounded by the value range, not row
count); the KS cumulative window orders the support relation, never
the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_DOC_VIEW = "__fps_drift_docs"
_EV_VIEW = "__fps_drift_events"
_LN_SCALE = 1_000_000  # micro-nats


def _doc_tbl(dialect: str) -> str:
    return _DOC_VIEW if dialect == D.SPARK else "documents"


def _ev_tbl(dialect: str) -> str:
    return _EV_VIEW if dialect == D.SPARK else "events"


def _psi_sql(dialect: str) -> str:
    """PSI between the length distributions of two deterministic corpus
    halves (split by a content-hash lane — stable across runs, no
    rand()). Buckets are log2(n_chars) — integer, shared by both
    engines. See module docstring for the exact-integer-sum scheme."""
    lane = f"({D.hex_prefix_to_int(D.md5_hex('text', dialect), dialect)} % 2)"
    bucket = (
        "cast(floor(ln(cast(n_chars as double)) / ln(2.0)) as bigint)"
    )
    qln = (
        f"cast(floor(ln(cast(ca * tb as double) / cast(cb * ta as double))"
        f" * {_LN_SCALE}.0 + 0.5) as bigint)"
    )
    return f"""
        WITH lanes AS (
            SELECT {lane} AS lane, {bucket} AS bucket
            FROM {_doc_tbl(dialect)} WHERE n_chars > 0
        ),
        counts AS (
            SELECT bucket,
                   cast(sum(CASE WHEN lane = 0 THEN 1 ELSE 0 END) as bigint) AS raw_a,
                   cast(sum(CASE WHEN lane = 1 THEN 1 ELSE 0 END) as bigint) AS raw_b
            FROM lanes GROUP BY bucket
        ),
        smoothed AS (
            -- add-one smoothing over the union of buckets keeps every
            -- probability nonzero and the metric total
            SELECT bucket, raw_a + 1 AS ca, raw_b + 1 AS cb FROM counts
        ),
        tots AS (
            SELECT cast(sum(ca) as bigint) AS ta, cast(sum(cb) as bigint) AS tb,
                   cast(count(*) as bigint) AS n_buckets
            FROM smoothed
        ),
        terms AS (
            SELECT (ca * tb - cb * ta) * ({qln}) AS term_int
            FROM smoothed CROSS JOIN tots
        )
        SELECT cast(sum(term_int) as bigint) AS psi_scaled_int,
               cast(sum(term_int) as double)
                   / ({_LN_SCALE}.0 * cast((SELECT ta FROM tots) as double)
                      * cast((SELECT tb FROM tots) as double)) AS psi,
               (SELECT n_buckets FROM tots) AS n_buckets
        FROM terms
    """


@register("doc_drift_psi", oracle=_psi_sql(D.DUCK), tags=("extension",))
def doc_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two content-addressed corpus
    halves over log2-length buckets — exact integer term sum, one final
    division. See _psi_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(_DOC_VIEW)
    return spark.sql(_psi_sql(D.SPARK))


def _ks_sql(dialect: str) -> str:
    """KS statistic between the value distributions of 'click' and
    'view' events, on exact integer cents. The cumulative window runs
    over the merged distinct-value support (support-sized, single
    range — bounded by the cents range, never by row count)."""
    return f"""
        WITH priced AS (
            SELECT event_type, cast(round(value * 100) as bigint) AS cents
            FROM {_ev_tbl(dialect)}
            WHERE event_type IN ('click', 'view')
        ),
        per_value AS (
            SELECT cents,
                   cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS na_v,
                   cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS nb_v
            FROM priced GROUP BY cents
        ),
        tots AS (
            SELECT cast(sum(na_v) as bigint) AS na, cast(sum(nb_v) as bigint) AS nb
            FROM per_value
        ),
        cum AS (
            SELECT cents,
                   cast(sum(na_v) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS ca,
                   cast(sum(nb_v) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cb
            FROM per_value
        )
        SELECT cast(max(abs(ca * nb - cb * na)) as bigint) AS ks_num,
               (SELECT na FROM tots) AS n_a,
               (SELECT nb FROM tots) AS n_b,
               cast(max(abs(ca * nb - cb * na)) as double)
                   / (cast((SELECT na FROM tots) as double)
                      * cast((SELECT nb FROM tots) as double)) AS ks_stat
        FROM cum CROSS JOIN tots
    """


@register("events_drift_ks", oracle=_ks_sql(D.DUCK), tags=("extension",))
def events_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov statistic between click and view value
    distributions — all-integer cumulative counts, order-free max, one
    final division. See _ks_sql."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EV_VIEW)
    return spark.sql(_ks_sql(D.SPARK))
