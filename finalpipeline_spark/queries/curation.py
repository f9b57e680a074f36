"""Corpus-curation operators beyond round 1: repetition-based quality
filtering, exact n-gram decontamination, and ANN recall evaluation.

These extend the training-data-pipeline surface (SURVEY.md north-star
section): repetition stats are the Gopher-style quality rules
(repetitive documents are boilerplate/spam and poison LM training),
exact n-gram overlap is the classic eval-set decontamination test
(complementing doc_contamination_check's LSH candidates with an exact
verifier), and recall@k against the brute-force baseline is how an ANN
index's quality is actually signed off.

Dual-dialect like everything else: scalar kernels come from
functions/dialect.py so the DuckDB oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.functions.caching import scoped_cache
from finalpipeline_spark.queries import embeddings as E
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

SPARK_VIEW = "__fps_documents_cur"


def _doc_tbl(dialect: str) -> str:
    return SPARK_VIEW if dialect == D.SPARK else "documents"


# --------------------------------------------------------------------------
# Repetition stats (Gopher-style quality rules)
# --------------------------------------------------------------------------
_TOP_TOKEN_CUT = 0.20   # >20% of tokens are one word → repetitive
_DUP_BIGRAM_CUT = 0.50  # >50% of 2-grams are repeats → repetitive


def _repetition_sql(dialect: str) -> str:
    """Per-document repetition metrics, all as higher-order functions
    over the token array — a pure per-row map, NO shuffle: this filter
    runs at full scan speed on 100 TB.

      top_token_frac  = count of the most frequent token / n_tokens
      dup_bigram_frac = 1 - distinct 2-grams / total 2-grams

    The most-frequent-token count is max over distinct tokens of a
    filtered count — O(distinct × n) per document, constant-bounded
    for real documents and shuffle-free, vs the explode + groupBy
    formulation which would shuffle every token.
    Both ratios are single IEEE divisions of exact integers, so both
    engines emit identical doubles with no rounding step.
    """
    toks = D.tokens("text", dialect)
    n = D.arr_size("toks", dialect)
    top_cnt = D.arr_size(D.filter_arr("toks", "x", "x = d", dialect), dialect)
    top_counts = D.transform_arr(
        D.arr_distinct("toks", dialect), "d", top_cnt, dialect
    )
    arr_max = "array_max" if dialect == D.SPARK else "list_max"
    bigram = (
        f"(({D.arr_index('hs', 'i', dialect)} * 131"
        f" + {D.arr_index('hs', 'i + 1', dialect)}) % {D.HASH_MOD})"
    )
    if dialect == D.SPARK:
        bigrams = (
            f"(CASE WHEN size(hs) >= 2 THEN "
            f"transform(sequence(1, size(hs) - 1), i -> {bigram}) "
            f"ELSE array() END)"
        )
    else:
        bigrams = (
            f"list_transform(range(1, greatest(len(hs) - 1, 0) + 1), i -> {bigram})"
        )
    n_bi = D.arr_size("bigrams", dialect)
    n_bi_distinct = D.arr_size(D.arr_distinct("bigrams", dialect), dialect)
    return f"""
        WITH toks AS (
            SELECT doc_id, {toks} AS toks FROM {_doc_tbl(dialect)}
        ),
        hashed AS (
            SELECT doc_id, toks,
                   {D.transform_arr('toks', 't', D.token_hash('t', dialect), dialect)} AS hs
            FROM toks
        ),
        metrics AS (
            SELECT doc_id,
                   {n} AS n_tokens,
                   cast({arr_max}({top_counts}) as double) / cast({n} as double)
                       AS top_token_frac,
                   {bigrams} AS bigrams
            FROM hashed
            WHERE {n} >= 2
        )
        SELECT doc_id, n_tokens, top_token_frac,
               1.0 - cast({n_bi_distinct} as double) / cast({n_bi} as double)
                   AS dup_bigram_frac,
               (top_token_frac > {_TOP_TOKEN_CUT}
                OR (1.0 - cast({n_bi_distinct} as double) / cast({n_bi} as double))
                   > {_DUP_BIGRAM_CUT}) AS is_repetitive
        FROM metrics
    """


@register("doc_repetition_stats", oracle=_repetition_sql(D.DUCK), tags=("extension",))
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: most-frequent-token fraction and
    duplicate-2-gram fraction per document, with the repetitiveness
    flag. Shuffle-free (all higher-order functions over the token
    array) — see _repetition_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_repetition_sql(D.SPARK))


# --------------------------------------------------------------------------
# Exact n-gram decontamination (train/eval overlap verifier)
# --------------------------------------------------------------------------
_EVAL_MOD = 50      # doc_id % 50 == 0 → eval set (2% held out)
_MIN_SHARED = 2     # pairs sharing >= 2 shingles are reported


def _decontam_sql(dialect: str) -> str:
    """Exact 3-gram (shingle) overlap between every train document and
    every eval document: explode each side's distinct shingle-hash set,
    join on the hash, count per (train, eval) pair, and report pairs
    with >= _MIN_SHARED shared shingles plus the overlap fraction
    relative to the EVAL document (the quantity that invalidates an
    eval example).

    Scale shape: the join key is the shingle hash; the eval side is
    the tiny one (a held-out benchmark is MBs against 100 TB of
    training data) — the Spark plan broadcasts it, so the train side
    streams map-side with NO shuffle of the corpus. The DuckDB oracle
    states the same join relationally.
    """
    toks = D.tokens("text", dialect)
    hs = D.transform_arr("toks", "t", D.token_hash("t", dialect), dialect)
    sh = D.arr_distinct(D.shingle_hashes("hs", dialect), dialect)
    if dialect == D.SPARK:
        expl = "SELECT doc_id, n_sh, explode(sh) AS h FROM shingled"
    else:
        expl = "SELECT doc_id, n_sh, unnest(sh) AS h FROM shingled"
    return f"""
        WITH toks AS (
            SELECT doc_id, {toks} AS toks FROM {_doc_tbl(dialect)}
        ),
        shingled AS (
            SELECT doc_id, sh, {D.arr_size('sh', dialect)} AS n_sh
            FROM (SELECT doc_id, {sh} AS sh
                  FROM (SELECT doc_id, {hs} AS hs FROM toks) hh) ss
        ),
        ex AS ({expl}),
        train AS (SELECT doc_id AS train_doc_id, h FROM ex WHERE doc_id % {_EVAL_MOD} != 0),
        eval_side AS (
            SELECT doc_id AS eval_doc_id, n_sh AS n_sh_eval, h
            FROM ex WHERE doc_id % {_EVAL_MOD} = 0
        )
        SELECT train_doc_id, eval_doc_id,
               count(*) AS n_shared,
               cast(count(*) as double) / cast(max(n_sh_eval) as double)
                   AS eval_overlap_frac
        FROM train JOIN eval_side ON train.h = eval_side.h
        GROUP BY train_doc_id, eval_doc_id
        HAVING count(*) >= {_MIN_SHARED}
    """


@register("doc_decontam_ngram_overlap", oracle=_decontam_sql(D.DUCK), tags=("extension",))
def doc_decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-overlap decontamination: (train, eval) document pairs
    sharing >= 2 word-3-gram shingles, with the overlap fraction of
    the eval doc. The exact verifier behind doc_contamination_check's
    LSH candidate generator — see _decontam_sql for the broadcast
    scale shape."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    ).createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_decontam_sql(D.SPARK))


# --------------------------------------------------------------------------
# ANN index sign-off: recall@k of IVF vs the exact baseline
# --------------------------------------------------------------------------
def _recall_oracle_sql() -> str:
    return f"""
        WITH exact_k AS (SELECT * FROM ({E._topk_sql(D.DUCK)}) a),
        ivf_k AS (SELECT * FROM ({E._ivf_topk_sql(D.DUCK)}) b)
        SELECT e.query_id,
               count(*) AS n_true,
               count(i.neighbor_id) AS n_hits,
               cast(count(i.neighbor_id) as double) / cast(count(*) as double)
                   AS recall
        FROM exact_k e
        LEFT JOIN ivf_k i
          ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
        GROUP BY e.query_id
    """


@register("emb_ann_recall_eval", oracle=_recall_oracle_sql(), tags=("extension",))
def emb_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF index against the brute-force baseline, per
    query — the acceptance metric for any ANN deployment (FAISS-style
    evaluation, expressed relationally). Reuses the staged normed
    table for BOTH sides, so the embedding scan and norm computation
    happen once."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(E.SPARK_VIEW)
    d = scoped_cache(
        spark.sql(E._normed_sql(D.SPARK)).repartition(
            spark.sparkContext.defaultParallelism
        ),
        "emb_ann_recall_eval",
    )
    d.createOrReplaceTempView("__fps_emb_normed")
    exact = spark.sql(E._topk_sql(D.SPARK, d_rel="__fps_emb_normed"))
    ivf = spark.sql(E._ivf_topk_sql(D.SPARK, d_rel="__fps_emb_normed")).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("hit").alias("n_hits"),
        )
        .withColumn(
            "recall",
            F.col("n_hits").cast("double") / F.col("n_true").cast("double"),
        )
    )
