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


def test_csv_fallback_mixed_directory(spark, tmp_path):
    """Per-FILE encoding fallback: a directory mixing utf-8 and
    cp1252/latin-1 files ingests without row loss or mojibake — the
    damaged files (detected via U+FFFD) are re-read in the fallback
    encoding, clean files keep their utf-8 decode."""
    from finalpipeline_spark.sources.readers import read_target_csvs_with_fallback

    (tmp_path / "ok.csv").write_bytes(
        "molecule name,smiles,extra\nCHEMBL1,CCN,caf\xe9\n".encode("utf-8")
    )
    (tmp_path / "cp.csv").write_bytes(
        "molecule name,smiles,extra\nCHEMBL9,CCO,M\xfcnch\xe9n\nCHEMBL10,CCC,plain\n".encode("latin-1")
    )
    df = read_target_csvs_with_fallback(spark, str(tmp_path) + "/*.csv")
    got = {r.molecule_name: r.extra for r in df.collect()}
    assert got == {"CHEMBL1": "café", "CHEMBL9": "Münchén", "CHEMBL10": "plain"}


def test_jdbc_capability_gate(spark):
    """No JDBC driver jar in this container: the API shape exists and
    the absence surfaces as NotImplementedError naming the fix (same
    gating discipline as Avro)."""
    import pytest as _pytest

    from finalpipeline_spark.sources.jdbc import read_jdbc, write_jdbc

    url = "jdbc:postgresql://localhost:5432/nope"
    with _pytest.raises((NotImplementedError, Exception)) as ei:
        read_jdbc(spark, url, "some_table")
    # If the driver jar were present this would be a connection error
    # instead; both paths must not be an opaque ClassNotFoundException.
    assert "driver" in str(ei.value).lower() or "connect" in str(ei.value).lower()

    df = spark.range(3)
    with _pytest.raises((NotImplementedError, Exception)) as ei2:
        write_jdbc(df, url, "some_table")
    assert "driver" in str(ei2.value).lower() or "connect" in str(ei2.value).lower()


def test_jdbc_partition_options_validated(spark):
    from finalpipeline_spark.sources.jdbc import read_jdbc

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_jdbc(
            spark,
            "jdbc:postgresql://localhost:5432/nope",
            "t",
            partition_column="id",  # missing bounds
        )


def test_object_store_path_helpers():
    from finalpipeline_spark.sources.object_store import (
        is_object_store_path,
        normalize_path,
        s3a_session_confs,
    )

    assert normalize_path("s3://bucket/key/file.csv") == "s3a://bucket/key/file.csv"
    assert normalize_path("s3n://b/k") == "s3a://b/k"
    assert normalize_path("s3a://b/k") == "s3a://b/k"
    assert normalize_path("/local/dir") == "/local/dir"
    assert is_object_store_path("s3a://b/k")
    assert is_object_store_path("gs://b/k")
    assert not is_object_store_path("/local/dir")
    assert not is_object_store_path("hdfs://nn/path")

    confs = s3a_session_confs()
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert confs["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert "PathOutputCommitProtocol" in confs["spark.sql.sources.commitProtocolClass"]
    minio = s3a_session_confs(committer="directory", endpoint="http://minio:9000")
    assert minio["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert minio["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert "spark.hadoop.fs.s3a.committer.magic.enabled" not in minio


def test_list_objects_local_fs(spark, tmp_path):
    from finalpipeline_spark.sources.object_store import list_objects

    (tmp_path / "a.csv").write_text("x")
    (tmp_path / "b.parquet").write_text("y")
    (tmp_path / "_SUCCESS").write_text("")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.csv").write_text("zz")

    all_objs = list_objects(spark, str(tmp_path))
    names = [o["path"].rsplit("/", 1)[-1] for o in all_objs]
    assert names == ["a.csv", "b.parquet", "c.csv"]  # _SUCCESS excluded, sorted

    csvs = list_objects(spark, str(tmp_path), suffix=".csv")
    assert [o["path"].rsplit("/", 1)[-1] for o in csvs] == ["a.csv", "c.csv"]
    assert csvs[1]["size"] == 2

    flat = list_objects(spark, str(tmp_path), recursive=False)
    assert [o["path"].rsplit("/", 1)[-1] for o in flat] == ["a.csv", "b.parquet"]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Widening-schema ingestion: later shards carry an extra column;
    mergeSchema reconciles the union schema and back-fills nulls for
    the early shards (the grow-a-corpus reality at 100 TB — schemas
    evolve shard by shard, never by rewriting history)."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    v1.write.mode("overwrite").parquet(path + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.9), (4, "d", 0.1)], ["id", "name", "quality"]
    )
    v2.write.mode("overwrite").parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "quality", "batch"}
    assert merged.count() == 4
    from pyspark.sql import functions as F

    assert merged.filter(F.col("quality").isNull()).count() == 2
    assert merged.filter(F.col("batch") == 1).count() == 2
