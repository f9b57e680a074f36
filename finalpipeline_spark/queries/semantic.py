"""Model-based curation: linear quality-classifier scoring and
SemDeDup-style semantic deduplication.

Modern training-data pipelines filter with *learned* models, not just
rule thresholds: a fastText-style linear classifier scores every
document (CCNet/LLaMA-style "looks like reference text" filtering),
and semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540)
drops documents whose *embeddings* nearly coincide even when their
text differs. Both are expressed Spark-first:

  * classifier scoring is a pure per-row projection — the weights are
    plan literals, the features are JVM-side expressions, so the whole
    filter runs at scan speed with zero shuffle and zero Python;
  * semantic dedup clusters vectors first (deterministic hyperplane
    LSH here; k-means centroids in a real deployment — the clustering
    bounds the candidate set) and compares pairs ONLY within a
    cluster, so pair work is sum-of-squares of cluster sizes, not n².

Score arithmetic is kept rational (dot products of exact ratios and
literal weights, no exp/ln), so Spark and DuckDB produce bit-identical
doubles with no rounding step. The sigmoid is deliberately omitted:
it is monotone, so thresholding the raw margin is the same classifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries import embeddings as E
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

DOCS_VIEW = "__fps_documents_sem"
EMB_VIEW = E.SPARK_VIEW


def _doc_tbl(dialect: str) -> str:
    return DOCS_VIEW if dialect == D.SPARK else "documents"


def _emb_tbl(dialect: str) -> str:
    return EMB_VIEW if dialect == D.SPARK else "embeddings"


# --------------------------------------------------------------------------
# Linear quality classifier (fastText-style, weights as plan literals)
# --------------------------------------------------------------------------
# Feature weights of a (stand-in) trained linear model. In production
# these come from a model registry; they are *data*, not code — the
# plan shape is identical whatever their values.
_W_BIAS = -0.85
_W_LEN = 1.60       # saturating length score
_W_TTR = 1.10       # type-token ratio (lexical diversity)
_W_STOP = 0.90      # stopword density (function words ≈ real prose)
_W_DIGIT = -1.40    # digit-heavy text ≈ tables/logs/boilerplate
_W_UPPER = -0.70    # shouty text
_MARGIN_CUT = 0.35  # decision threshold on the raw margin

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _classifier_sql(dialect: str) -> str:
    """Margin = w·x over five scan-time features. Every feature is a
    ratio of exact integer counts (single IEEE division each), the dot
    product is a fixed literal expression — one WholeStageCodegen
    projection, no shuffle, no UDF: at 100 TB this classifier runs at
    parquet scan speed. Reference analogue: the bronze-layer row
    filters (SURVEY.md §2.2 P6) — this is their learned-model upgrade.
    """
    toks = D.tokens("text", dialect)
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    n = D.arr_size("toks", dialect)
    n_stop = D.arr_size(
        D.filter_arr("toks", "x", f"x IN ({stop_list})", dialect), dialect
    )
    n_distinct = D.arr_size(D.arr_distinct("toks", dialect), dialect)
    n_digit = D.regex_count("text", "[0-9]", dialect)
    n_upper = D.regex_count("text", "[A-Z]", dialect)
    t = _doc_tbl(dialect)
    return f"""
        WITH feat AS (
            SELECT doc_id,
                   least(cast({n} as double) / 200.0, 1.0) AS f_len,
                   cast({n_distinct} as double) / cast({n} as double) AS f_ttr,
                   cast({n_stop} as double) / cast({n} as double) AS f_stop,
                   cast({n_digit} as double)
                       / cast(greatest(length(text), 1) as double) AS f_digit,
                   cast({n_upper} as double)
                       / cast(greatest(length(text), 1) as double) AS f_upper
            FROM (SELECT doc_id, text, {toks} AS toks FROM {t}) tt
            WHERE {n} > 0
        )
        SELECT doc_id, f_len, f_ttr, f_stop, f_digit, f_upper,
               {_W_BIAS} + {_W_LEN} * f_len + {_W_TTR} * f_ttr
                 + {_W_STOP} * f_stop + {_W_DIGIT} * f_digit
                 + {_W_UPPER} * f_upper AS margin,
               ({_W_BIAS} + {_W_LEN} * f_len + {_W_TTR} * f_ttr
                 + {_W_STOP} * f_stop + {_W_DIGIT} * f_digit
                 + {_W_UPPER} * f_upper) >= {_MARGIN_CUT} AS keep
        FROM feat
    """


@register("doc_quality_classifier", oracle=_classifier_sql(D.DUCK), tags=("extension",))
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier: five scan-time
    features dotted with literal weights, keep/drop on the margin —
    one codegen'd projection, zero shuffle, zero Python."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(DOCS_VIEW)
    return spark.sql(_classifier_sql(D.SPARK))


# --------------------------------------------------------------------------
# SemDeDup: within-cluster embedding near-coincidence dedup
# --------------------------------------------------------------------------
_SEM_TAU = 0.30  # cosine threshold; high (0.95+) on real embeddings —
                 # lowered for the synthetic testdata's cosine range so
                 # the decision branch is actually exercised.


def _semdedup_sql(dialect: str, v_rel: str | None = None) -> str:
    """SemDeDup (arXiv:2303.09540): cluster the embedding space, then
    within each cluster mark every vector that nearly coincides
    (cosine ≥ τ) with a lower-id cluster-mate as a duplicate; the
    lowest id in each coincidence group survives as canonical.

    Clustering here is the deterministic 8-hyperplane LSH shared with
    emb_lsh_buckets (same plane literals ⇒ same buckets in both
    engines); a production run swaps in k-means cells (emb_kmeans_lloyd)
    with capped cell sizes. Pair work is bounded per cluster —
    sum(|cluster|²), never corpus², and the min-id reduction is a
    map-side-combinable agg on the pair stream. Keep-decision join is
    a LEFT JOIN back to the staged vectors, shuffling ids only.
    """
    bucket = E._lsh_bucket_expr("embedding", dialect)
    nrm = D.dot("embedding", "embedding", E.DIM, dialect)
    dot = D.dot("a.embedding", "b.embedding", E.DIM, dialect)
    cos = f"({dot} / sqrt(a.nrm * b.nrm))"
    t = _emb_tbl(dialect)
    v_def = (
        f"(SELECT vec_id, embedding, {nrm} AS nrm, {bucket} AS bucket FROM {t})"
        if v_rel is None
        else v_rel
    )
    return f"""
        WITH v AS (
            SELECT * FROM {v_def} vv
        ),
        dups AS (
            SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
            FROM v a JOIN v b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE {cos} >= {_SEM_TAU}
            GROUP BY b.vec_id
        )
        SELECT v.vec_id, v.bucket,
               (d.dup_of IS NOT NULL) AS is_semantic_dup,
               d.dup_of
        FROM v LEFT JOIN dups d ON v.vec_id = d.vec_id
    """


@register("emb_semantic_dedup", oracle=_semdedup_sql(D.DUCK), tags=("extension",))
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: LSH-cluster the embeddings, mark
    within-cluster cosine-coincident vectors as duplicates of the
    lowest surviving id. Pair work is per-cluster, never corpus².

    The staged vector relation (signatures + norms) is consumed three
    times (both join sides + the keep-decision join), so it's cached
    and repartitioned once — Catalyst doesn't CSE across self-join
    sides, and without the repartition the pair loop rides the single
    input file's lone partition (the MinHash staging lesson)."""
    from finalpipeline_spark.functions.caching import scoped_cache

    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(EMB_VIEW)
    bucket = E._lsh_bucket_expr("embedding", D.SPARK)
    nrm = D.dot("embedding", "embedding", E.DIM, D.SPARK)
    v = scoped_cache(
        spark.sql(
            f"SELECT vec_id, embedding, {nrm} AS nrm, {bucket} AS bucket"
            f" FROM {EMB_VIEW}"
        ).repartition(spark.sparkContext.defaultParallelism, "bucket"),
        "emb_semantic_dedup",
    )
    v.createOrReplaceTempView("__fps_emb_semdedup_v")
    return spark.sql(_semdedup_sql(D.SPARK, v_rel="__fps_emb_semdedup_v"))
