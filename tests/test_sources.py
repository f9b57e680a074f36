"""Source reader / catalog helper tests (SURVEY.md §2.1)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finalpipeline_spark.sources.catalog import (
    append_ledger_entries,
    create_view,
    read_ledger,
    save_table,
    table_exists,
)
from finalpipeline_spark.sources.readers import read_target_csvs


def test_csv_imposed_schema_drops_bad_lines(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "molecule name,smiles,extra\n"
        "CHEMBL1,CCO,x\n"
        'bad,"unclosed quote field,oops\n'
        "CHEMBL2,CCN,y\n"
    )
    df = read_target_csvs(spark, str(p))
    rows = df.select("molecule_name", "smiles").collect()
    names = {r.molecule_name for r in rows}
    # Well-formed rows survive; the malformed one is dropped, not fatal.
    assert {"CHEMBL1", "CHEMBL2"} <= names
    assert df.filter(F.col("input_file").contains("in.csv")).count() == df.count()


def test_csv_encoding_fallback(spark, tmp_path):
    p = tmp_path / "cp1252.csv"
    # 'Münchén' in latin-1 — undecodable as strict UTF-8. (Spark 4
    # whitelists CSV charsets; iso-8859-1 is the supported stand-in for
    # the reference's cp1252 fallback, identical for these code points.)
    payload = "molecule name,smiles,extra\nCHEMBL9,CCO,M\xfcnch\xe9n\n"
    p.write_bytes(payload.encode("latin-1"))
    df = read_target_csvs(spark, str(p), encoding="iso-8859-1")
    row = df.select("extra").collect()[0]
    assert row.extra == "Münchén"


def test_catalog_roundtrip(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert not table_exists(spark, "t_roundtrip")
    save_table(df, "t_roundtrip")
    assert table_exists(spark, "t_roundtrip")
    save_table(df, "t_roundtrip", mode="append")
    assert spark.table("t_roundtrip").count() == 4
    create_view(spark, "v_roundtrip", "SELECT count(*) AS n FROM t_roundtrip")
    assert spark.table("v_roundtrip").first().n == 4
    spark.sql("DROP TABLE t_roundtrip")


def test_ledger_append_and_read(spark, tmp_path):
    path = str(tmp_path / "ledger")
    assert read_ledger(spark, path).count() == 0  # empty-safe
    append_ledger_entries(spark, path, ["a.csv", "b.csv"])
    append_ledger_entries(spark, path, [])  # no-op
    append_ledger_entries(spark, path, ["c.csv"])
    got = {r.file for r in read_ledger(spark, path).collect()}
    assert got == {"a.csv", "b.csv", "c.csv"}
