"""Incremental aggregate-MV maintenance: folding change batches (and
retractions) into partial aggregates must equal wholesale recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.operators.mv import (
    aggregate_partials,
    maintain_agg_mv,
)
from finalpipeline_spark.tables import load_table

KEYS = ["o_orderpriority"]
SUMS = {"sum_cents": "cast(round(o_totalprice * 100) as bigint)"}


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_multi_batch_maintenance_equals_recompute(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    splits = ["1995-01-01", "1996-06-01", "1998-01-01"]
    mv = aggregate_partials(orders.filter(F.col("o_orderdate") < splits[0]), KEYS, SUMS)
    lo = splits[0]
    for hi in splits[1:] + ["9999-01-01"]:
        batch = orders.filter(
            (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
        )
        mv = maintain_agg_mv(mv, batch, KEYS, SUMS)
        lo = hi
    full = aggregate_partials(orders, KEYS, SUMS)
    _assert_same(mv, full)


def test_retraction_equals_recompute_without_deleted(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    mv = aggregate_partials(orders, KEYS, SUMS)
    deleted = orders.filter(F.col("o_custkey") % 10 == 3)
    maintained = maintain_agg_mv(mv, deleted, KEYS, SUMS, retract=True)
    survivors = aggregate_partials(
        orders.filter(~(F.col("o_custkey") % 10 == 3)), KEYS, SUMS
    )
    _assert_same(maintained, survivors)


def test_group_netting_to_zero_disappears(spark):
    rows = spark.createDataFrame(
        [("a", 10.0), ("a", 5.0), ("b", 1.0)], ["k", "v"]
    )
    mv = aggregate_partials(rows, ["k"], {"s": "cast(round(v * 100) as bigint)"})
    gone = maintain_agg_mv(
        mv,
        rows.filter(F.col("k") == "a"),
        ["k"],
        {"s": "cast(round(v * 100) as bigint)"},
        retract=True,
    )
    assert gone.filter(F.col("k") == "a").count() == 0
    assert gone.filter(F.col("k") == "b").count() == 1
