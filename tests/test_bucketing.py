"""Bucketed-join plan test: co-bucketed fact⋈fact join must be
shuffle-free (the one-time-layout-cost / zero-per-query-shuffle
trade that matters at 100 TB)."""

from __future__ import annotations

import pytest

from finalpipeline_spark.plans.bucketing import bucketed_join, write_bucketed
from finalpipeline_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # Tables land in the session's spark-warehouse dir (gitignored).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey")
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # Disable broadcast so the test exercises the co-located path the
    # way a fact⋈fact join at scale would.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # And it computes the right thing.
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
