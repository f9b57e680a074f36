"""load_table's analyzed-plan memo lifecycle: dead-session purge,
bounded size, and explicit invalidation for mutable directories."""

from __future__ import annotations

from finalpipeline_spark import tables
from finalpipeline_spark.tables import invalidate_table_cache, load_table


class _DeadSession:
    """Stub whose liveness probe says 'stopped'."""

    @property
    def sparkContext(self):
        raise RuntimeError("stopped")


def test_memo_hits_same_object(spark, sf_dir):
    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")
    assert a is b


def test_dead_session_entries_purged_on_miss(spark, sf_dir):
    dead = _DeadSession()
    tables._SOURCE_MEMO[(id(dead), "/fake/path")] = (dead, None)
    # a miss triggers the purge sweep
    invalidate_table_cache(tables.table_path(sf_dir, "region"))
    load_table(spark, sf_dir, "region")
    assert (id(dead), "/fake/path") not in tables._SOURCE_MEMO
    # live session entries survive
    assert any(s is spark for s, _ in tables._SOURCE_MEMO.values())


def test_memo_bounded(spark, sf_dir):
    old_max = tables._SOURCE_MEMO_MAX
    tables._SOURCE_MEMO_MAX = 3
    try:
        invalidate_table_cache()
        for name in ("region", "nation", "customer", "supplier", "orders"):
            load_table(spark, sf_dir, name)
        assert len(tables._SOURCE_MEMO) <= 3
        # newest entries won
        assert any(k[1].endswith("orders.parquet") for k in tables._SOURCE_MEMO)
    finally:
        tables._SOURCE_MEMO_MAX = old_max


def test_invalidate_reinfers(spark, sf_dir):
    a = load_table(spark, sf_dir, "nation")
    invalidate_table_cache(tables.table_path(sf_dir, "nation"))
    b = load_table(spark, sf_dir, "nation")
    assert a is not b  # fresh plan → fresh file listing
    assert a.schema == b.schema
