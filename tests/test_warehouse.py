"""Semantic property tests for the warehouse-modeling operators —
invariants the oracle hash-compare can't articulate (it proves equality
with DuckDB, not that either side means what SCD2/global-ids promise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.queries.registry import load_all
from finalpipeline_spark.queries.warehouse import doc_assign_global_ids
from finalpipeline_spark.tables import load_table

SPECS = load_all()


def test_scd2_intervals_are_well_formed(spark, sf_dir):
    scd = SPECS["orders_scd2_snapshot"].fn(spark, sf_dir).cache()
    try:
        # exactly one open (is_current) version per customer
        open_counts = (
            scd.filter("is_current").groupBy("custkey").count().filter("count != 1")
        )
        assert open_counts.count() == 0
        # versions are contiguous 1..n per customer
        per_cust = scd.groupBy("custkey").agg(
            F.min("version").alias("vmin"),
            F.max("version").alias("vmax"),
            F.count(F.lit(1)).alias("n"),
        )
        assert per_cust.filter("vmin != 1 OR vmax != n").count() == 0
        # intervals chain: version k's valid_to == version k+1's valid_from
        a = scd.alias("a")
        b = scd.alias("b")
        broken = a.join(
            b,
            (F.col("a.custkey") == F.col("b.custkey"))
            & (F.col("a.version") + 1 == F.col("b.version"))
            & (F.col("a.valid_to") != F.col("b.valid_from")),
        )
        assert broken.count() == 0
    finally:
        scd.unpersist()


def test_global_ids_contiguous_and_order_preserving(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n = docs.count()
    out = doc_assign_global_ids(spark, docs).cache()
    try:
        stats = out.agg(
            F.min("global_id").alias("lo"),
            F.max("global_id").alias("hi"),
            F.countDistinct("global_id").alias("d"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        # contiguous bijection 1..N
        assert (stats["lo"], stats["hi"], stats["d"], stats["n"]) == (1, n, n, n)
        # order-preserving: sorting by key yields ascending ids
        rows = out.orderBy("source", "doc_id").select("global_id").collect()
        assert [r[0] for r in rows] == list(range(1, n + 1))
    finally:
        out.unpersist()


def test_global_ids_independent_of_input_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = {
        (r["doc_id"]): r["global_id"]
        for r in doc_assign_global_ids(spark, docs).collect()
    }
    b = {
        (r["doc_id"]): r["global_id"]
        for r in doc_assign_global_ids(
            spark, docs.repartition(7, "doc_id")
        ).collect()
    }
    assert a == b


def test_reconcile_localizes_drift(spark, sf_dir):
    out = SPECS["doc_reconcile_checksums"].fn(spark, sf_dir).cache()
    try:
        import duckdb

        from finalpipeline_spark.queries.warehouse import _RECON_BUCKETS
        from finalpipeline_spark.tables import table_path

        # ground truth: buckets whose documents contain an email (the
        # scrub rewrites exactly those rows)
        con = duckdb.connect()
        dirty = {
            r[0]
            for r in con.execute(
                f"""SELECT DISTINCT doc_id % {_RECON_BUCKETS}
                    FROM read_parquet('{table_path(sf_dir, "documents")}')
                    WHERE regexp_matches(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')"""
            ).fetchall()
        }
        got_dirty = {
            r["bucket"] for r in out.filter(~F.col("checksums_match")).collect()
        }
        assert got_dirty == dirty
        # row counts agree on every bucket (content drift, not row loss)
        assert out.filter("n_rows_a != n_rows_b").count() == 0
    finally:
        out.unpersist()


def test_scd2_incremental_equals_rebuild(spark, sf_dir):
    """Split orders at the median date; applying the tail as a CDC
    batch onto the head's SCD2 must equal the wholesale rebuild."""
    from finalpipeline_spark.operators.scd import scd2_apply_batch
    from finalpipeline_spark.queries.warehouse import ORDERS_VIEW, _scd2_sql
    from finalpipeline_spark.functions import dialect as D

    orders = load_table(spark, sf_dir, "orders")
    cut = "1998-06-01"  # orders span 1995..2001; both halves non-empty

    def rebuild(df):
        df.createOrReplaceTempView(ORDERS_VIEW)
        return spark.sql(_scd2_sql(D.SPARK))

    base = orders.filter(F.col("o_orderdate") < F.lit(cut))
    delta = orders.filter(F.col("o_orderdate") >= F.lit(cut))
    assert base.count() > 0 and delta.count() > 0
    incremental = scd2_apply_batch(rebuild(base).localCheckpoint(), delta)
    expected = rebuild(orders)

    assert incremental.count() == expected.count()
    # full-row set equality both directions
    cols = incremental.columns
    assert incremental.select(cols).exceptAll(expected.select(cols)).count() == 0
    assert expected.select(cols).exceptAll(incremental.select(cols)).count() == 0
