"""Streaming SCD2 sink: the versioned dimension maintained live from a
change stream equals the wholesale rebuild, and re-delivered epochs
converge (change_id lineage anti-join)."""

from __future__ import annotations

from finalpipeline_spark.streaming.sinks import stream_scd2_to_parquet

_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderdate timestamp,"
    " o_orderpriority string"
)


def _drain(spark, src, dim, ckpt):
    q = stream_scd2_to_parquet(
        spark.readStream.schema(_SCHEMA).parquet(src + "/*"),
        dim,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)


def _rows(batch):
    return [(k, c, d, p) for (k, c, d, p) in batch]


def test_stream_scd2_equals_rebuild_and_converges(spark, tmp_path):
    import datetime as dt

    from finalpipeline_spark.operators.scd import orders_as_changes, scd2_build

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    d = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    b0 = [(1, 10, d("2025-01-01"), "LOW"), (2, 20, d("2025-01-02"), "HIGH")]
    b1 = [(3, 10, d("2025-02-01"), "HIGH"), (4, 30, d("2025-02-02"), "LOW")]
    b2 = [(5, 10, d("2025-03-01"), "MEDIUM"), (6, 20, d("2025-03-02"), "LOW")]

    spark.createDataFrame(_rows(b0), _SCHEMA).write.parquet(src + "/b0")
    _drain(spark, src, dim, ckpt)
    spark.createDataFrame(_rows(b1), _SCHEMA).write.parquet(src + "/b1")
    _drain(spark, src, dim, ckpt)
    spark.createDataFrame(_rows(b2), _SCHEMA).write.parquet(src + "/b2")
    _drain(spark, src, dim, ckpt)

    got = spark.read.parquet(dim)
    expected = scd2_build(
        orders_as_changes(spark.createDataFrame(_rows(b0 + b1 + b2), _SCHEMA))
    )
    cols = sorted(expected.columns)
    assert got.count() == expected.count() == 6
    assert got.select(cols).exceptAll(expected.select(cols)).count() == 0
    assert expected.select(cols).exceptAll(got.select(cols)).count() == 0
    # customer 10 has 3 versions chained 1-2-3, one open
    c10 = {r.version: r for r in got.filter("custkey = 10").collect()}
    assert sorted(c10) == [1, 2, 3]
    assert not c10[1].is_current and not c10[2].is_current and c10[3].is_current
    assert c10[1].valid_to == c10[2].valid_from

    # Re-delivery: same change events as NEW files under a FRESH
    # checkpoint (worst case: every epoch replayed onto a live table).
    ckpt2 = str(tmp_path / "ckpt2")
    for name, batch in (("r0", b0), ("r1", b1), ("r2", b2)):
        spark.createDataFrame(_rows(batch), _SCHEMA).write.parquet(
            src + f"/{name}"
        )
    _drain(spark, src, dim, ckpt2)
    again = spark.read.parquet(dim)
    assert again.count() == 6
    assert again.select(cols).exceptAll(expected.select(cols)).count() == 0
