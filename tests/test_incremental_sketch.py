"""Persisted HLL register maintenance: batch-folded registers must be
bit-identical to single-pass registers, re-delivery must be a no-op,
and the estimate must track the exact count."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.functions.hll import hll_estimate, hll_registers
from finalpipeline_spark.plans.incremental_sketch import (
    read_registers,
    sketch_estimate,
    update_sketch,
)
from finalpipeline_spark.tables import load_table


def _same_registers(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_batched_maintenance_equals_single_pass(spark, sf_dir, tmp_path):
    store = str(tmp_path / "hll_store")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    for i in range(3):
        update_sketch(spark, store, li.filter(F.col("l_partkey") % 3 == i), "l_partkey")
    incremental = read_registers(spark, store)
    single_pass = hll_registers(li, "l_partkey")
    _same_registers(incremental, single_pass)


def test_redelivered_batch_is_noop(spark, sf_dir, tmp_path):
    store = str(tmp_path / "hll_store")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    batch = li.filter(F.col("l_partkey") % 3 == 0)
    update_sketch(spark, store, li, "l_partkey")
    before = read_registers(spark, store).collect()
    update_sketch(spark, store, batch, "l_partkey")  # replayed delivery
    after = read_registers(spark, store).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_estimate_tracks_exact_count(spark, sf_dir, tmp_path):
    store = str(tmp_path / "hll_store")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    update_sketch(spark, store, li, "l_partkey")
    est = sketch_estimate(spark, store).collect()[0]["est"]
    exact = li.distinct().count()
    assert abs(est - exact) / exact < 0.15  # 2.3 sigma at m=256


def test_estimate_matches_direct_registers(spark, sf_dir, tmp_path):
    store = str(tmp_path / "hll_store")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    update_sketch(spark, store, li, "l_partkey")
    via_store = sketch_estimate(spark, store).collect()[0]["est"]
    direct = hll_estimate(hll_registers(li, "l_partkey")).collect()[0]["est"]
    assert via_store == direct
