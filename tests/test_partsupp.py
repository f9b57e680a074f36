"""Invariants of the derived partsupp relation behind tpch_q2/q11/q20
and the mm video/audio additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.queries import multimodal as M
from finalpipeline_spark.queries import tpch as Q
from finalpipeline_spark.tables import load_table


def _partsupp_df(spark, sf_dir):
    Q._register_tpch_views(spark, sf_dir)
    return spark.sql(
        f"WITH {Q._partsupp_sql('spark')} SELECT * FROM partsupp"
    )


def test_partsupp_pk_unique_and_domains(spark, sf_dir):
    ps = _partsupp_df(spark, sf_dir)
    n = ps.count()
    assert n > 0
    # PK (ps_partkey, ps_suppkey)
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == n
    # every suppkey resolves against the real supplier dim
    supp = load_table(spark, sf_dir, "supplier")
    dangling = ps.join(
        supp, ps.ps_suppkey == supp.s_suppkey, "left_anti"
    ).count()
    assert dangling == 0
    # value domains
    bad = ps.filter(
        (F.col("ps_availqty") < 1)
        | (F.col("ps_availqty") > 9999)
        | (F.col("ps_supplycost") < 1.0)
        | (F.col("ps_supplycost") > 1000.0)
    ).count()
    assert bad == 0
    # every part contributes (>=1 supplier each, <=4 by construction)
    n_parts = load_table(spark, sf_dir, "part").count()
    per_part = ps.groupBy("ps_partkey").count()
    assert per_part.count() == n_parts
    assert per_part.filter(F.col("count") > 4).count() == 0


def test_q2_result_is_min_cost_per_part(spark, sf_dir):
    out = Q.tpch_q2(spark, sf_dir).toPandas()
    if len(out) == 0:
        return
    # min is taken over the region-eligible subset (the q2 semantics)
    eligible = spark.sql(Q._q2_eligible_sql("spark")).toPandas()
    mins = eligible.groupby("ps_partkey").ps_supplycost.min()
    for _, r in out.iterrows():
        assert r.ps_supplycost == mins[r.p_partkey]


def test_scene_cut_threshold(spark, sf_dir):
    cuts = M.mm_video_scene_cut(spark, sf_dir).toPandas()
    assert len(cuts) > 0
    assert (cuts.abs_delta > M._SCENE_CUT_DELTA).all()
    # frame 0 has no predecessor — can never be a cut
    assert (cuts.frame_idx > 0).all()
