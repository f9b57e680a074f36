"""Zone-map file skipping over a z-ordered rewrite: pruning fires on
BOTH clustered columns, results are identical to a full scan, and an
out-of-range probe selects nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.operators.zonemap import pruned_read, write_zonemap
from finalpipeline_spark.operators.zorder import zorder_write_parquet
from finalpipeline_spark.tables import load_table

N_FILES = 16


def _setup(spark, sf_dir, tmp_path):
    data = str(tmp_path / "li_z")
    zmap = str(tmp_path / "li_zonemap")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zorder_write_parquet(li, ["l_partkey", "l_orderkey"], data, N_FILES)
    write_zonemap(spark, data, ["l_partkey", "l_orderkey"], zmap)
    return li, data, zmap


def test_prunes_on_both_zorder_columns(spark, sf_dir, tmp_path):
    li, data, zmap = _setup(spark, sf_dir, tmp_path)
    for col in ("l_partkey", "l_orderkey"):
        stats = li.agg(F.min(col), F.max(col)).collect()[0]
        lo, hi = stats[0], stats[0] + (stats[1] - stats[0]) // 10
        rows, n_sel, n_tot = pruned_read(spark, data, zmap, col, lo, hi)
        assert n_tot == N_FILES
        assert n_sel < n_tot, f"no pruning on {col}"
        expected = li.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        assert rows.count() == expected.count()
        assert expected.exceptAll(rows).count() == 0
        assert rows.exceptAll(expected).count() == 0


def test_out_of_range_probe_reads_no_files(spark, sf_dir, tmp_path):
    li, data, zmap = _setup(spark, sf_dir, tmp_path)
    hi = li.agg(F.max("l_partkey")).collect()[0][0]
    rows, n_sel, _ = pruned_read(spark, data, zmap, "l_partkey", hi + 10, hi + 20)
    assert n_sel == 0
    assert rows.count() == 0
    assert rows.columns == ["l_orderkey", "l_partkey", "l_quantity"]
