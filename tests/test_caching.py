"""scoped_cache: staging caches survive within a query scope and are
evicted as soon as a different scope stages (driver sweep holds at most
one query's caches at a time)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.functions.caching import scoped_cache


def test_scoped_cache_evicts_previous_scope(spark):
    a = scoped_cache(spark.range(100).withColumn("x", F.col("id") * 2), "qA")
    a.count()
    assert a.storageLevel.useMemory

    # Second cache in the SAME scope keeps the first alive.
    a2 = scoped_cache(spark.range(50), "qA")
    a2.count()
    assert a.storageLevel.useMemory and a2.storageLevel.useMemory

    # A new scope evicts both of qA's caches.
    b = scoped_cache(spark.range(10).withColumn("y", F.lit(1)), "qB")
    b.count()
    assert b.storageLevel.useMemory
    assert not a.storageLevel.useMemory
    assert not a2.storageLevel.useMemory
