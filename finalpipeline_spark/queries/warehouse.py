"""Warehouse-modeling surface: SCD Type-2 dimension build, GROUPING
SETS partial rollups, and wide→long UNPIVOT (melt).

The reference's datamart layer (SURVEY.md §3.3 — datamart + gold
views) rebuilds its dimension tables wholesale; a production warehouse
at 100 TB instead versions dimension rows (SCD2) and serves partial
rollups without re-scanning the fact table per grain. These three
operators are that layer, Spark-first:

  * SCD2 is one window pass over the change stream — no self-join, no
    driver loop; at scale it shuffles once on the dimension key.
  * GROUPING SETS computes all grains in a single scan (Catalyst
    expands to one Expand + one shuffle, vs one scan per grain).
  * UNPIVOT/melt is a per-row map (Expand node, zero shuffle).

Dual-dialect like everything else; all aggregated measures are exact
integers so both engines hash bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

ORDERS_VIEW = "__fps_orders_wh"
LINEITEM_VIEW = "__fps_lineitem_wh"
DOCS_VIEW = "__fps_documents_wh"


def _tbl(view: str, duck: str, dialect: str) -> str:
    return view if dialect == D.SPARK else duck


# --------------------------------------------------------------------------
# SCD Type-2 dimension snapshot (versioned customer priority history)
# --------------------------------------------------------------------------
def _scd2_sql(dialect: str) -> str:
    """Treat each customer's orders as a change stream of their
    current order priority and build the classic SCD2 shape: one row
    per (customer, version) with [valid_from, valid_to) intervals and
    an is_current flag.

    One window over (o_custkey ORDER BY o_orderdate, o_orderkey) —
    the o_orderkey tiebreak makes same-day changes deterministic.
    Physically this is a single hash-partition shuffle on the dimension
    key, then a sorted pass per partition; nothing driver-side, no
    self-join. The reference's equivalent is a wholesale dimension
    rebuild (SURVEY.md §3.3); this is the incremental-warehouse form.
    """
    t = _tbl(ORDERS_VIEW, "orders", dialect)
    return f"""
        SELECT o_custkey AS custkey,
               cast(row_number() OVER w AS int) AS version,
               o_orderpriority AS priority,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               (lead(o_orderdate) OVER w IS NULL) AS is_current
        FROM {t}
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """


@register("orders_scd2_snapshot", oracle=_scd2_sql(D.DUCK), tags=("extension",))
def orders_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: per-customer versioned priority
    history with [valid_from, valid_to) intervals — one window pass,
    one shuffle on the dimension key."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(ORDERS_VIEW)
    return spark.sql(_scd2_sql(D.SPARK))


# --------------------------------------------------------------------------
# GROUPING SETS: three grains in one scan
# --------------------------------------------------------------------------
def _grouping_sets_sql(dialect: str) -> str:
    """(flag, status), (flag), and grand-total grains of lineitem in a
    single scan. Catalyst expands this to one Expand node feeding one
    hash aggregate — 1 shuffle for all grains, vs 3 scans + 3 shuffles
    for the UNION ALL formulation a naive port would write.

    Measures are exact: l_quantity is integral-valued in TPC-H, so
    sum(cast(l_quantity as bigint)) is addition-order-independent.
    The outer cast pins the sum back to BIGINT — DuckDB widens
    sum(BIGINT) to HUGEINT, which pandas materializes as float64 and
    the driver's value hash then diverges from Spark's int64.
    grouping() flags (not NULL-matching) distinguish "grouped-out"
    from genuine NULLs — both engines implement the standard.
    """
    t = _tbl(LINEITEM_VIEW, "lineitem", dialect)
    return f"""
        SELECT l_returnflag, l_linestatus,
               cast(grouping(l_returnflag) AS int) * 2
                 + cast(grouping(l_linestatus) AS int) AS grain_id,
               cast(sum(cast(l_quantity as bigint)) as bigint) AS sum_qty,
               count(*) AS n_rows
        FROM {t}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """


@register("tpch_grouping_sets", oracle=_grouping_sets_sql(D.DUCK), tags=("extension",))
def tpch_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS partial rollup: three aggregation grains from one
    scan + one shuffle (Expand node), with grouping() grain ids."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(LINEITEM_VIEW)
    return spark.sql(_grouping_sets_sql(D.SPARK))


# --------------------------------------------------------------------------
# UNPIVOT / melt: wide per-source language counts → long
# --------------------------------------------------------------------------
_LANGS = ("de", "en", "es", "fr", "zh")


def _unpivot_sql(dialect: str) -> str:
    """Wide→long melt. The wide stage is conditional aggregation (one
    scan, one shuffle on source); the melt itself is an Expand node —
    a per-row map with zero shuffle, so it costs nothing at 100 TB.

    Spark's native operator is ``stack`` (UNPIVOT in Spark SQL is the
    same Expand underneath); DuckDB's UNION ALL formulation is
    semantically identical and keeps the oracle portable. Zero-count
    languages are retained (exact parity with the wide row).
    """
    t = _tbl(DOCS_VIEW, "documents", dialect)
    wide_cols = ",\n               ".join(
        f"sum(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS n_{lang}"
        for lang in _LANGS
    )
    wide = f"SELECT source,\n               {wide_cols}\n        FROM {t} GROUP BY source"
    if dialect == D.SPARK:
        stack_args = ", ".join(f"'{lang}', n_{lang}" for lang in _LANGS)
        return f"""
            WITH wide AS ({wide})
            SELECT source, lang, cast(n_docs as bigint) AS n_docs
            FROM wide
            LATERAL VIEW stack({len(_LANGS)}, {stack_args}) s AS lang, n_docs
        """
    arms = "\n            UNION ALL ".join(
        f"SELECT source, '{lang}' AS lang, cast(n_{lang} as bigint) AS n_docs FROM wide"
        for lang in _LANGS
    )
    return f"WITH wide AS ({wide})\n            {arms}"


@register("doc_unpivot_lang_counts", oracle=_unpivot_sql(D.DUCK), tags=("extension",))
def doc_unpivot_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-source language-count columns back to
    (source, lang, n_docs) rows via stack — an Expand-node per-row map,
    no extra shuffle beyond the wide aggregation."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(DOCS_VIEW)
    return spark.sql(_unpivot_sql(D.SPARK))


# --------------------------------------------------------------------------
# Anti-entropy reconciliation: bucket checksums between table versions
# --------------------------------------------------------------------------
_RECON_BUCKETS = 64


def _reconcile_sql(dialect: str) -> str:
    """Verify a table copy/migration WITHOUT moving the data: both
    sides reduce to per-bucket order-independent checksums (sum of
    deterministic row hashes in exact int64, modular), then only the
    64-row checksum tables are joined. Buckets that disagree localize
    the corruption to 1/64th of the keyspace — re-scan only those.

    Here the "two versions" are the documents table and its
    PII-scrubbed variant (doc_pii_redact's transform): text rows the
    scrub changed make their buckets disagree, and n_rows stays equal
    — i.e. the checksum detects *content* drift, not just row loss.
    The shuffle carries 64 rows per side regardless of corpus size.
    """
    t = _tbl(DOCS_VIEW, "documents", dialect)
    rowhash = D.char_positional_hash("text", dialect)
    scrub = D.regex_scrub(
        "text",
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
        "<EMAIL>",
        dialect,
    )
    scrubhash = D.char_positional_hash("s_text", dialect)
    return f"""
        WITH a AS (
            SELECT doc_id % {_RECON_BUCKETS} AS bucket,
                   sum({rowhash} % {D.HASH_MOD}) AS checksum,
                   count(*) AS n_rows
            FROM {t} GROUP BY doc_id % {_RECON_BUCKETS}
        ),
        b AS (
            SELECT doc_id % {_RECON_BUCKETS} AS bucket,
                   sum({scrubhash} % {D.HASH_MOD}) AS checksum,
                   count(*) AS n_rows
            FROM (SELECT doc_id, {scrub} AS s_text FROM {t}) s
            GROUP BY doc_id % {_RECON_BUCKETS}
        )
        SELECT a.bucket AS bucket,
               cast(a.n_rows as bigint) AS n_rows_a,
               cast(b.n_rows as bigint) AS n_rows_b,
               (a.checksum = b.checksum) AS checksums_match
        FROM a JOIN b ON a.bucket = b.bucket
    """


@register("doc_reconcile_checksums", oracle=_reconcile_sql(D.DUCK), tags=("extension",))
def doc_reconcile_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table reconciliation: per-bucket order-independent
    content checksums on each side, join only the checksum tables.
    Disagreeing buckets localize drift to 1/64th of the keyspace —
    the standard way to verify a 100 TB copy without a full re-read
    of both sides over the network."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(DOCS_VIEW)
    return spark.sql(_reconcile_sql(D.SPARK))


# --------------------------------------------------------------------------
# Global contiguous row numbering (two-phase, no single-partition sort)
# --------------------------------------------------------------------------
def doc_assign_global_ids(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Assign contiguous global ids 1..N in (source, doc_id) order
    WITHOUT the single-partition trap.

    A naive ``row_number() OVER (ORDER BY ...)`` forces every row
    through ONE partition — the classic 100 TB killer. The scalable
    two-phase form:

      1. range-repartition on the order key (Spark samples split
         points; partition p holds a contiguous key range),
      2. number rows *within* each partition (the range exchange
         already clusters by pid, so the window adds no shuffle),
      3. collect the per-partition counts (n_partitions rows — driver
         state bounded by parallelism, not data) and broadcast each
         partition's offset back as a literal map.

    The ids are deterministic even though the sampled split points are
    not: a row's id is its rank in the fixed total order, wherever the
    boundaries land. monotonically_increasing_id() cannot give this
    (non-contiguous, partition-dependent).

    Delegates to the generalized operator (operators/rank.py), which
    broadcasts the parallelism-sized offset table as a join — never a
    per-partition CASE chain, which would blow up the analyzer at
    100k-task partition counts.
    """
    from finalpipeline_spark.operators.rank import assign_global_rank

    return assign_global_rank(docs, ["source", "doc_id"], out_col="global_id")


@register(
    "doc_global_row_ids",
    oracle="""
        SELECT doc_id, source,
               cast(row_number() OVER (ORDER BY source, doc_id) as bigint)
                   AS global_id
        FROM documents
    """,
    tags=("extension",),
)
def doc_global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global ids in (source, doc_id) order via the
    two-phase range-partition + per-partition offsets pattern — the
    oracle's single ORDER BY window is exactly the plan this operator
    exists to avoid at scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return doc_assign_global_ids(spark, docs)


# --------------------------------------------------------------------------
# Incremental aggregate MV maintenance (operators/mv.py)
# --------------------------------------------------------------------------
@register(
    "orders_incremental_mv",
    oracle="""
        SELECT o_orderpriority,
               cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
                   AS sum_cents,
               cast(count(*) as bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
                   / cast(count(*) as double) AS avg_cents
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("extension",),
)
def orders_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate MV: seed from pre-1997 orders,
    then fold the 1997+ change batch in with a partial-aggregate merge
    (`operators/mv.maintain_agg_mv`).  The oracle aggregates the whole
    table wholesale — equality proves maintenance ≡ recompute, while
    the maintained path only ever shuffles O(batch + touched groups)
    rows.  Derived measures (avg) come off the partials with one IEEE
    division.  tests/test_mv.py adds multi-batch and retraction cases.
    """
    from finalpipeline_spark.operators.mv import aggregate_partials, maintain_agg_mv

    orders = load_table(spark, sf_dir, "orders")
    keys = ["o_orderpriority"]
    sums = {"sum_cents": "cast(round(o_totalprice * 100) as bigint)"}
    base = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01"))
    delta = orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01"))
    mv = aggregate_partials(base, keys, sums)
    mv = maintain_agg_mv(mv, delta, keys, sums)
    return mv.select(
        "o_orderpriority",
        "sum_cents",
        "n_rows",
        (F.col("sum_cents") / F.col("n_rows").cast("double")).alias("avg_cents"),
    ).orderBy("o_orderpriority")
