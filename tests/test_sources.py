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


def test_orc_round_trip_partitioned_and_pushdown(spark, sf_dir, tmp_path):
    from finalpipeline_spark.sources.readers import read_table_orc, write_table_orc
    from finalpipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    out = str(tmp_path / "docs_orc")
    write_table_orc(docs, out, partition_by=["lang"])

    back = read_table_orc(spark, out)
    assert back.count() == docs.count()
    assert (
        back.select("doc_id", "lang", "source", "n_chars", "text")
        .exceptAll(docs)
        .count()
        == 0
    )

    # Partition pruning: a lang filter must prune directories, not scan
    # them — the pruned plan reads strictly fewer files.
    one_lang = back.filter(F.col("lang") == "en")
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    assert "partition" in plan.lower()
    # Predicate pushdown on a data column reaches the ORC scan.
    pushed = back.filter(F.col("n_chars") > 100)
    fplan = pushed._jdf.queryExecution().toString()
    assert "PushedFilters" in fplan and "n_chars" in fplan


def test_jsonl_round_trip_and_quarantine(spark, sf_dir, tmp_path):
    from finalpipeline_spark.sources.readers import (
        read_documents_jsonl,
        write_documents_jsonl,
    )
    from finalpipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = str(tmp_path / "corpus")
    write_documents_jsonl(docs, out)

    back = read_documents_jsonl(spark, out + "/*.json")
    assert back.count() == docs.count()
    assert (
        back.select("doc_id", "lang", "text").exceptAll(docs).count() == 0
    )

    # A shard with malformed lines quarantines rows, not the job.
    bad = tmp_path / "corpus" / "part-bad.json"
    bad.write_text(
        '{"doc_id": 900001, "lang": "en", "text": "ok line"}\n'
        "{not json at all\n"
        '{"doc_id": "NOT A NUMBER", "lang": 3}\n'
    )
    merged = read_documents_jsonl(spark, out + "/*.json")
    assert merged.count() == docs.count() + 1  # only the good line lands
    # Spark disallows queries touching ONLY _corrupt_record on a raw
    # scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize first, as
    # a dead-letter sink would.
    kept = read_documents_jsonl(spark, out + "/*.json", keep_corrupt=True).cache()
    try:
        n_corrupt = kept.filter("_corrupt_record IS NOT NULL").count()
        assert n_corrupt == 2
    finally:
        kept.unpersist()
