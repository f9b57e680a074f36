"""Distributed global rank/ntile ≡ the single-window forms, without
the single-partition exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from finalpipeline_spark.operators.rank import assign_global_rank, global_ntile


@pytest.fixture(scope="module")
def skewed(spark):
    # non-uniform key distribution across many input partitions
    return (
        spark.range(0, 5003)
        .selectExpr("cast(id * id % 9973 as bigint) as k", "id")
        .repartition(16)
    )


def test_global_rank_equals_window(spark, skewed):
    got = assign_global_rank(skewed, ["k", "id"])
    want = skewed.withColumn(
        "global_rank", F.row_number().over(W.orderBy("k", "id")).cast("long")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("n_tiles", [4, 7, 100])
def test_global_ntile_equals_window(spark, skewed, n_tiles):
    got = global_ntile(skewed, ["k", "id"], n_tiles)
    want = skewed.withColumn(
        "tile", F.ntile(n_tiles).over(W.orderBy("k", "id")).cast("long")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("n_tiles", [4, 7])
def test_global_ntile_multi_equals_singles(spark, skewed, n_tiles):
    """The fused-count variant (one driver action for k rank passes)
    must match k independent global_ntile calls spec for spec."""
    from finalpipeline_spark.operators.rank import global_ntile_multi

    a = skewed.selectExpr("k", "id")
    b = skewed.selectExpr("cast((id * 31) % 7919 as bigint) as k2", "id")
    specs = [(a, ["k", "id"], "t1"), (b, ["k2", "id"], "t2")]
    multi = global_ntile_multi(specs, n_tiles)
    for (df, order_cols, out_col), got in zip(specs, multi):
        want = global_ntile(df, order_cols, n_tiles, out_col=out_col)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_ntile_more_tiles_than_rows(spark):
    df = spark.range(0, 3).selectExpr("id as k", "id")
    got = global_ntile(df, ["k", "id"], 10)
    want = df.withColumn("tile", F.ntile(10).over(W.orderBy("k", "id")).cast("long"))
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_no_single_partition_global_window_in_plan(spark, skewed):
    plan = assign_global_rank(skewed, ["k", "id"])._jdf.queryExecution().executedPlan().toString()
    # the only Window in the plan is partitioned by _pid — a global
    # (unpartitioned) Window would print 'Window [...ORDER BY...]' with
    # an empty partition spec; assert the partition column is present
    assert "_pid" in plan


def test_partitioned_prefix_sum_equals_window(spark, skewed):
    from finalpipeline_spark.operators.rank import partitioned_prefix_sum

    df = skewed.selectExpr("k % 5 as g", "k", "id", "id % 13 + 1 as wt")
    got = partitioned_prefix_sum(df, ["g"], ["k", "id"], "wt", out_col="cum")
    got = got.select("g", "k", "id", "wt", "cum")
    want = df.withColumn(
        "cum",
        F.sum("wt")
        .over(
            W.partitionBy("g")
            .orderBy("k", "id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("long"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partitioned_prefix_sum_no_per_group_window(spark, skewed):
    """The point of the operator: no Window partitioned ONLY by the
    (low-cardinality) group key — every Window must include the range
    partition id."""
    from finalpipeline_spark.operators.rank import partitioned_prefix_sum

    df = skewed.selectExpr("k % 2 as g", "k", "id", "cast(1 as bigint) as wt")
    plan = (
        partitioned_prefix_sum(df, ["g"], ["k", "id"], "wt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for ln in plan.splitlines():
        if "Window" in ln:
            assert "_pid" in ln, f"per-group-only window: {ln}"


@pytest.mark.parametrize("inclusive", [True, False])
def test_partitioned_prefix_min_equals_window(spark, skewed, inclusive):
    from finalpipeline_spark.operators.rank import partitioned_prefix_min

    df = skewed.selectExpr("k % 4 as g", "k", "id", "(id * 7) % 101 as v")
    got = partitioned_prefix_min(
        df, ["g"], ["k", "id"], "v", out_col="pm", inclusive=inclusive
    ).select("g", "k", "id", "v", "pm")
    upper = W.currentRow if inclusive else -1
    want = df.withColumn(
        "pm",
        F.min("v").over(
            W.partitionBy("g")
            .orderBy("k", "id")
            .rowsBetween(W.unboundedPreceding, upper)
        ),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partitioned_prefix_min_global_exclusive(spark, skewed):
    """The skyline shape: no groups, exclusive frame — first row of the
    total order gets NULL, later rows the strict predecessors' min."""
    from finalpipeline_spark.operators.rank import partitioned_prefix_min

    df = skewed.selectExpr("k", "id", "(id * 13) % 997 as v")
    got = partitioned_prefix_min(
        df, [], ["k", "id"], "v", out_col="pm", inclusive=False
    ).select("k", "id", "v", "pm")
    want = df.withColumn(
        "pm",
        F.min("v").over(W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, -1)),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partitioned_prefix_sum_double_weights(spark):
    """ADVICE r5: the running-sum type follows the weight column —
    fractional weights must not be truncated to long."""
    from finalpipeline_spark.operators.rank import partitioned_prefix_sum

    df = (
        spark.range(0, 2003)
        .selectExpr(
            "cast(id % 3 as int) as g",
            "id",
            "cast(id % 7 as double) / 4.0 as w",
        )
        .repartition(8)
    )
    got = partitioned_prefix_sum(df, ["g"], ["id"], "w", out_col="cum")
    assert dict(got.dtypes)["cum"] == "double"
    want = df.withColumn(
        "cum",
        F.sum("w").over(
            W.partitionBy("g")
            .orderBy("id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    joined = got.alias("a").join(want.alias("b"), ["g", "id"])
    bad = joined.filter(F.abs(F.col("a.cum") - F.col("b.cum")) > 1e-9).count()
    assert bad == 0
    assert got.count() == 2003


def test_reliable_checkpoint_flag_end_to_end(spark, tmp_path):
    """VERDICT r5 #6: setting spark.finalpipeline.checkpointDir routes
    the two-phase/iterative lineage truncation through RELIABLE
    checkpoints (survives executor loss on a real cluster) with
    unchanged results."""
    from finalpipeline_spark.operators.rank import assign_global_rank

    key = "spark.finalpipeline.checkpointDir"
    spark.conf.set(key, str(tmp_path / "ckpt"))
    try:
        df = spark.range(0, 1009).selectExpr(
            "cast(id * 7 % 101 as bigint) as k", "id"
        ).repartition(8)
        got = assign_global_rank(df, ["k", "id"])
        want = df.withColumn(
            "global_rank",
            F.row_number().over(W.orderBy("k", "id")).cast("long"),
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # the checkpoint actually materialized under the configured dir
        import glob as _glob

        assert _glob.glob(str(tmp_path / "ckpt") + "/*/*")
    finally:
        spark.conf.unset(key)


def test_reliable_checkpoint_flag_dedup_clusters(spark, sf_dir, tmp_path):
    """Same flag through the ITERATIVE path (label-propagation dedup
    clustering): every per-round truncation lands as a reliable
    checkpoint, results unchanged vs the localCheckpoint default."""
    from finalpipeline_spark.queries.documents import doc_dedup_clusters

    base = {
        tuple(r) for r in doc_dedup_clusters(spark, sf_dir).collect()
    }
    key = "spark.finalpipeline.checkpointDir"
    spark.conf.set(key, str(tmp_path / "ckpt"))
    try:
        flagged = {
            tuple(r) for r in doc_dedup_clusters(spark, sf_dir).collect()
        }
    finally:
        spark.conf.unset(key)
    assert flagged == base
