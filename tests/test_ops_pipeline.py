"""Compaction and data-quality operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.operators.compaction import compact_parquet, parquet_file_stats
from finalpipeline_spark.operators.quality import (
    check_accepted_values,
    check_not_null,
    check_referential,
    check_unique,
    run_checks,
)
from finalpipeline_spark.tables import load_table


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shattered")
    # Simulate an accreted incremental sink: 64 tiny files.
    docs.repartition(64).write.parquet(path)
    before_files, before_bytes = parquet_file_stats(spark, path)
    assert before_files == 64

    stats = compact_parquet(spark, path, target_file_bytes=before_bytes)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0
    # No leftover temp/backup directories.
    assert not (tmp_path / "shattered__compact_tmp").exists()
    assert not (tmp_path / "shattered__swap_bak").exists()


def test_quality_checks(spark):
    child = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (2, "b", None), (3, "zz", 30), (4, None, 40)],
        "id long, cat string, fk long",
    ).withColumn("fk", F.when(F.col("id") == 2, None).otherwise(F.col("id")))
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")

    report = {
        (r.check, r.target): r.n_violations
        for r in run_checks(
            [
                check_not_null(child, ["cat", "fk"]),
                check_unique(child, ["id"]),
                check_accepted_values(child, "cat", ["a", "b"]),
                check_referential(child, "fk", parent, "pk"),
            ]
        ).collect()
    }
    assert report[("not_null", "cat")] == 1
    assert report[("not_null", "fk")] == 2  # id=2 twice
    assert report[("unique", "id")] == 1  # one extra row for id=2
    assert report[("accepted_values", "cat")] == 2  # 'zz' + NULL
    assert report[("referential", "fk")] == 1  # fk=4 orphaned


def test_quality_checks_clean_table_all_zero(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rep = run_checks(
        [
            check_not_null(orders, ["o_orderkey", "o_custkey"]),
            check_unique(orders, ["o_orderkey"]),
            check_referential(orders, "o_custkey", cust, "c_custkey"),
        ]
    )
    assert rep.filter(F.col("n_violations") > 0).count() == 0


def test_compaction_preserves_partitioned_layout(spark, sf_dir, tmp_path):
    import os

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "part_shattered")
    docs.repartition(16).write.partitionBy("lang").parquet(path)
    before_files, before_bytes = parquet_file_stats(spark, path)
    assert before_files > 16  # 16 tasks x several lang dirs

    compact_parquet(spark, path, target_file_bytes=before_bytes, partition_by=["lang"])
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # Hive layout survives: lang=... directories, partition col readable.
    assert any(d.startswith("lang=") for d in os.listdir(path))
    assert back.groupBy("lang").count().count() == docs.select("lang").distinct().count()
    after_files, _ = parquet_file_stats(spark, path)
    assert after_files < before_files


def test_swap_recovery_restores_half_swapped_table(spark, sf_dir, tmp_path):
    # Simulate a crash between atomic_replace's two renames: only the
    # backup exists. dir_exists must heal it instead of reporting the
    # table absent (the data-loss trap for write-if-absent callers).
    import os

    from finalpipeline_spark.operators.compaction import dir_exists

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "gold")
    docs.write.parquet(path)
    os.rename(path, path + "__swap_bak")  # crash window state
    assert dir_exists(spark, path)  # heals + reports present
    assert spark.read.parquet(path).count() == docs.count()
    assert not os.path.exists(path + "__swap_bak")


def test_not_null_check_handles_spaced_column_names(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2)], ["molecule name", "x"]
    )
    got = {r.target: r.n_violations for r in check_not_null(df, ["molecule name"]).collect()}
    assert got == {"molecule name": 1}


def test_salted_join_rejects_small_side_preserving_types(spark):
    import pytest

    from finalpipeline_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(1, "d")], "k long, d string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", how=how)
