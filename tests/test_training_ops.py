"""Property tests for the training-data assembly operators (scrub,
chunking, IVF-PQ, exact-moment regression) beyond the oracle suite:
the structural invariants each docstring claims."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import functions as F

from finalpipeline_spark.queries import curation as C
from finalpipeline_spark.queries import embeddings as E
from finalpipeline_spark.queries import extended as X
from finalpipeline_spark.queries import training as T
from finalpipeline_spark.tables import load_table, table_path


def test_pii_redact_roundtrip(spark, sf_dir):
    df = T.doc_pii_redact(spark, sf_dir).toPandas()
    inj = df[df.doc_id % 3 == 0]
    clean = df[df.doc_id % 3 != 0]
    assert len(inj) > 0 and len(clean) > 0
    # every injected PII item is found exactly once, nothing invented
    assert (inj.n_emails == 1).all() and (inj.n_ips == 1).all()
    assert (inj.n_phones == 1).all()
    assert (clean[["n_emails", "n_ips", "n_phones"]] == 0).all().all()
    # redaction shrank exactly the injected rows
    assert (inj.chars_removed > 0).all()
    assert (clean.chars_removed == 0).all()


def test_chunk_overlap_coverage(spark, sf_dir):
    chunks = T.doc_chunk_overlap(spark, sf_dir).toPandas()
    assert len(chunks) > 0
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_id").reset_index(drop=True)
        # contiguous chunk ids from 0
        assert list(g.chunk_id) == list(range(len(g)))
        # stride between consecutive starts; overlap = chunk - stride
        starts = list(g.chunk_start)
        assert all(
            b - a == T._CH_STRIDE for a, b in zip(starts, starts[1:])
        )
        # full coverage: every token of the doc is inside some chunk
        n_tokens = int(g.chunk_start.iloc[-1] - 1 + g.chunk_len.iloc[-1])
        assert int(g.chunk_len.iloc[-1]) >= 1
        expected_chunks = max(
            1, math.ceil((n_tokens - T._CH_OVERLAP) / T._CH_STRIDE)
        )
        assert len(g) == expected_chunks
        # all non-final chunks are full-size
        assert (g.chunk_len.iloc[:-1] == T._CHUNK).all()


def test_ivf_pq_shape_and_recall(spark, sf_dir):
    adc = C.emb_ivf_pq_topk(spark, sf_dir).toPandas()
    per_q = adc.groupby("query_id").size()
    assert (per_q == C._ADC_K).all()
    assert (adc.adc_dist >= -1e-9).all()  # squared distances
    # ADC over probed lists must overlap the exact top-k somewhat:
    # on this data the compressed index should not be useless.
    exact = E.emb_cosine_topk(spark, sf_dir).toPandas()
    exact_pairs = set(zip(exact.query_id, exact.neighbor_id))
    adc_pairs = set(zip(adc.query_id, adc.neighbor_id))
    assert len(exact_pairs & adc_pairs) > 0


def test_regr_stats_match_native_aggregates(spark, sf_dir):
    ours = X.lineitem_regr_stats(spark, sf_dir).toPandas()
    con = duckdb.connect()
    native = con.execute(
        f"""
        SELECT l_returnflag,
               regr_slope(l_extendedprice, l_quantity) AS n_slope,
               regr_intercept(l_extendedprice, l_quantity) AS n_icept,
               corr(l_extendedprice, l_quantity) AS n_r
        FROM read_parquet('{table_path(sf_dir, "lineitem")}')
        GROUP BY l_returnflag
        """
    ).fetchdf()
    m = ours.merge(native, on="l_returnflag")
    assert len(m) == len(ours) > 0
    assert ((m.slope - m.n_slope).abs() <= 1e-6 * m.n_slope.abs()).all()
    assert ((m.intercept - m.n_icept).abs() <= 1e-6 * m.n_icept.abs()).all()
    assert ((m.pearson_r - m.n_r).abs() <= 1e-9).all()


def test_regr_stats_partitioning_invariant(spark, sf_dir):
    a = X.lineitem_regr_stats(spark, sf_dir).toPandas()
    load_table(spark, sf_dir, "lineitem").repartition(17).createOrReplaceTempView(
        "__fps_li_regr"
    )
    from finalpipeline_spark.functions import dialect as D

    b = spark.sql(X._regr_sql(D.SPARK)).toPandas()
    a = a.sort_values("l_returnflag").reset_index(drop=True)
    b = b.sort_values("l_returnflag").reset_index(drop=True)
    # bit-identical, not merely close — the exact-moment claim
    assert (a == b).all().all()
