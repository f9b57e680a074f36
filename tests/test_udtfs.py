"""Python UDTF surface: lateral expansion pinned row-for-row to the
SQL-native (explode/posexplode) equivalents, so the slow-path API can
never drift from the codegen hot path."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.functions.udtfs import CHUNK_OVERLAP, CHUNK_SIZE, register_udtfs
from finalpipeline_spark.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)


def test_chunk_text_udtf_matches_sql_native(spark, sf_dir):
    register_udtfs(spark)
    _docs(spark, sf_dir).createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk, c.n_chars
        FROM udtf_docs d, LATERAL chunk_text(d.text) c
        """
    )
    stride = CHUNK_SIZE - CHUNK_OVERLAP
    want = spark.sql(
        f"""
        SELECT doc_id, chunk_id,
               substring(text, chunk_id * {stride} + 1, {CHUNK_SIZE}) AS chunk,
               length(substring(text, chunk_id * {stride} + 1, {CHUNK_SIZE})) AS n_chars
        FROM (
            SELECT doc_id, text,
                   explode(sequence(0,
                       greatest(cast(ceil((length(text) - {CHUNK_OVERLAP})
                                          / {stride}) as int) - 1, 0)
                   )) AS chunk_id
            FROM udtf_docs WHERE length(text) > 0
        )
        """
    )
    assert got.count() > 200  # expansion actually happened
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_pos_tokenize_udtf_matches_posexplode(spark, sf_dir):
    register_udtfs(spark)
    _docs(spark, sf_dir).createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM udtf_docs d, LATERAL pos_tokenize(d.text) t
        """
    )
    want = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.posexplode(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).alias(
                "pos", "token"
            ),
        )
        .select("doc_id", "token", "pos")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_chunk_text_udtf_null_and_empty_rows(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "doc_id int, text string"
    ).createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM udtf_edge d, LATERAL chunk_text(d.text) c"
    ).collect()
    # null/empty expand to zero rows; short text yields one whole chunk
    assert [(r.doc_id, r.chunk_id, r.chunk) for r in rows] == [(3, 0, "ab")]
