"""Streaming HLL maintenance: registers built from a file stream must
equal the single-pass batch registers, and replaying the whole source
(fresh checkpoint — worst-case re-delivery) must not change them."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from finalpipeline_spark.functions.hll import hll_registers
from finalpipeline_spark.plans.incremental_sketch import read_registers
from finalpipeline_spark.streaming.sinks import stream_hll_to_parquet
from finalpipeline_spark.tables import load_table

_SCHEMA = T.StructType([T.StructField("l_partkey", T.LongType())])


def _write_shards(li, src, n=3):
    for i in range(n):
        li.filter(F.col("l_partkey") % n == i).write.mode("overwrite").parquet(
            f"{src}/shard={i}"
        )


def _drain(spark, src, store, ckpt):
    q = stream_hll_to_parquet(
        spark.readStream.schema(_SCHEMA).parquet(src + "/*"),
        "l_partkey",
        store,
        ckpt,
    )
    q.awaitTermination(120)


def test_streamed_registers_equal_batch(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    src, store = str(tmp_path / "src"), str(tmp_path / "hll")
    _write_shards(li, src)
    _drain(spark, src, store, str(tmp_path / "ckpt1"))

    streamed = read_registers(spark, store)
    batch = hll_registers(spark.read.parquet(src + "/*"), "l_partkey")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_full_replay_is_noop(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    src, store = str(tmp_path / "src"), str(tmp_path / "hll")
    _write_shards(li, src)
    _drain(spark, src, store, str(tmp_path / "ckpt1"))
    before = sorted(map(tuple, read_registers(spark, store).collect()))
    # fresh checkpoint: the stream re-delivers EVERY file
    _drain(spark, src, store, str(tmp_path / "ckpt2"))
    after = sorted(map(tuple, read_registers(spark, store).collect()))
    assert before == after
