"""Salted join: identical results to the plain join on a pathologically
skewed key distribution, with the hot key scattered across sub-keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.operators.skew import SALT_COL, salted_join


def _skewed_frames(spark):
    # 90% of the fact rides one key.
    big = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(100)], "k long, label string"
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k").select("k", "payload", "label")
    salted = salted_join(big, small, "k", n_salt=8).select("k", "payload", "label")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_scatters_the_hot_key(spark):
    big, small = _skewed_frames(spark)
    salt = F.pmod(
        F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in big.columns])),
        F.lit(8),
    )
    hot = big.filter("k = 7").withColumn(SALT_COL, salt)
    n_buckets = hot.select(SALT_COL).distinct().count()
    assert n_buckets == 8  # every sub-key in play → 8-way parallel hot key


def test_salted_left_join_keeps_unmatched(spark):
    big, small = _skewed_frames(spark)
    missing = small.filter("k < 90")  # some fact keys now unmatched
    plain = big.join(missing, "k", "left").select("k", "payload", "label")
    salted = salted_join(big, missing, "k", n_salt=8, how="left").select(
        "k", "payload", "label"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
