"""Z-order clustering: multi-column locality → file-level skipping.

The quantitative claim under test: a single-column sort gives tight
per-file ranges on that column and useless (near-global) ranges on the
other; the Morton layout gives sub-global ranges on BOTH columns, so
min/max skipping works for predicates on either.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.operators.zorder import zorder_write_parquet
from finalpipeline_spark.tables import load_table

_N_FILES = 16


def _per_file_avg_spread(spark, path: str, col: str) -> float:
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    per_file = df.groupBy("__f").agg((F.max(col) - F.min(col)).alias("spread"))
    return per_file.agg(F.avg("spread")).first()[0]


def test_zorder_gives_locality_on_both_columns(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_epoch_s", "value")
    glob_user = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    glob_ts = ev.agg(F.max("ts_epoch_s") - F.min("ts_epoch_s")).first()[0]

    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zordered")
    # Baseline: classic single-column layout (range partition by user).
    ev.repartitionByRange(_N_FILES, "user_id").sortWithinPartitions(
        "user_id"
    ).write.parquet(linear)
    zorder_write_parquet(ev, ["user_id", "ts_epoch_s"], zpath, _N_FILES)

    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.agg(F.sum("user_id")).first()[0] == ev.agg(F.sum("user_id")).first()[0]

    lin_user = _per_file_avg_spread(spark, linear, "user_id")
    lin_ts = _per_file_avg_spread(spark, linear, "ts_epoch_s")
    z_user = _per_file_avg_spread(spark, zpath, "user_id")
    z_ts = _per_file_avg_spread(spark, zpath, "ts_epoch_s")

    # Linear layout: near-perfect on user, near-useless on ts.
    assert lin_user < 0.2 * glob_user
    assert lin_ts > 0.8 * glob_ts
    # Z-order: BOTH columns substantially sub-global — every file can
    # be skipped by min/max stats for predicates on either column.
    assert z_user < 0.5 * glob_user, (z_user, glob_user)
    assert z_ts < 0.5 * glob_ts, (z_ts, glob_ts)
