"""Full-text-search surface: inverted-index statistics and BM25 ranking.

The reference pipeline has no search capability, but a corpus engine at
100 TB needs the retrieval primitives every data pipeline eventually
grows: the inverted index (term → posting statistics) and a ranked
keyword query over it (BM25, the Lucene/Elasticsearch default).  Both
are expressed as plain DataFrame aggregations — the index build is the
same explode → (term, doc) partial-count shape as TF-IDF
(documents.py), so it inherits the same scale story: the shuffle
carries (term, doc, tf) rows that partial aggregation has already
collapsed, never raw token instances.

Exactness design (same rules as the rest of the repo):

* tokenization comes from functions/dialect.tokens so both engines see
  identical token streams;
* BM25's idf is transcendental (ln), so it is quantized to integer
  micro-nats via ``floor(ln(x) * 1e6 + 0.5)`` — floor of an identical
  double is identical in both engines (the doc_lm_perplexity scheme);
* per-document scores sum one term-part per query term in **fixed
  syntactic order** (a max-CASE pivot per literal query term, the
  emb_ivf_pq_topk trick) — never an engine-chosen aggregation order
  over doubles;
* every other step is +,-,*,/ over identical doubles/int64s, which is
  IEEE-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.functions.caching import scoped_cache
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

SPARK_VIEW = "__fps_documents_search"

_LN_SCALE = 1_000_000  # micro-nat quantization of ln(idf)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20
# A fixed keyword query (the corpus vocabulary is the synthetic Spark
# word list, TESTDATA.md). Literals so the per-term pivot is static.
_QUERY_TERMS = ("window", "shuffle", "partition")


def _doc_tbl(dialect: str) -> str:
    return SPARK_VIEW if dialect == D.SPARK else "documents"


# --------------------------------------------------------------------------
# Inverted index statistics
# --------------------------------------------------------------------------


def _explode_sql(dialect: str, rel: str = "toks") -> str:
    if dialect == D.SPARK:
        return f"SELECT doc_id, t FROM {rel} LATERAL VIEW explode(toks) x AS t"
    return f"SELECT doc_id, unnest(toks) AS t FROM {rel}"


def _inverted_index_sql(dialect: str, ex_rel: str | None = None) -> str:
    """Per-term index statistics: document frequency, collection
    frequency, max term frequency, and the argmax-tf posting (min
    doc_id on tf ties — a total order, so both engines pick the same
    doc).

    Scale shape: explode → (term, doc) count with map-side partial
    aggregation (the only corpus-sized shuffle) → vocabulary-sized
    aggregations and a vocabulary-sized self-join for the argmax.  At
    100 TB the tf relation is the index itself; the stats output is
    |vocab| rows.
    """
    toks = D.tokens("text", dialect)
    ex = ex_rel if ex_rel is not None else "ex"
    with_ex = (
        ""
        if ex_rel is not None
        else f"""toks AS (
            SELECT doc_id, {toks} AS toks FROM {_doc_tbl(dialect)}
        ),
        ex AS ({_explode_sql(dialect)}),"""
    )
    return f"""
        WITH {with_ex}
        tf AS (
            SELECT t, doc_id, cast(count(*) as bigint) AS tf
            FROM {ex} GROUP BY t, doc_id
        ),
        per AS (
            SELECT t,
                   cast(count(*) as bigint) AS df,
                   cast(sum(tf) as bigint) AS cf,
                   cast(max(tf) as bigint) AS max_tf
            FROM tf GROUP BY t
        ),
        top AS (
            SELECT tf.t, min(tf.doc_id) AS top_doc_id
            FROM tf JOIN per ON tf.t = per.t AND tf.tf = per.max_tf
            GROUP BY tf.t
        )
        SELECT per.t AS term, per.df, per.cf, per.max_tf, top.top_doc_id
        FROM per JOIN top ON per.t = top.t
    """


@register(
    "doc_inverted_index",
    oracle=_inverted_index_sql(D.DUCK),
    tags=("extension",),
)
def doc_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index term statistics (df, cf, max tf, argmax posting).
    The exploded token relation is staged once (cached) because both
    the tf and the per-term aggregations consume it."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(SPARK_VIEW)
    toks = D.tokens("text", D.SPARK)
    ex = scoped_cache(
        spark.sql(
            f"SELECT doc_id, t FROM (SELECT doc_id, {toks} AS toks "
            f"FROM {SPARK_VIEW}) s LATERAL VIEW explode(toks) x AS t"
        ),
        "doc_inverted_index",
    )
    ex.createOrReplaceTempView("__fps_search_ex")
    return spark.sql(_inverted_index_sql(D.SPARK, ex_rel="__fps_search_ex"))


# --------------------------------------------------------------------------
# BM25 ranked retrieval
# --------------------------------------------------------------------------


def _bm25_sql(dialect: str, pd_rel: str | None = None) -> str:
    """BM25 top-k for a fixed keyword query.

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
        idf(t)   = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene form)

    Exactness: idf is quantized to integer micro-nats (see module
    docstring); dl and tf are exact ints; avgdl and the normalizer are
    single-rooted IEEE expressions over identical inputs; the per-doc
    sum adds one CASE-pivoted part per literal query term in fixed
    syntactic order.

    Scale shape: the token filter ``t IN (query)`` lands *inside* the
    explode projection, so the corpus-sized shuffle carries only
    postings of the 3 query terms — the selectivity a real index gives
    you, recovered here by predicate position.  dl is a per-row map
    (no shuffle); N/avgdl is a 1-row broadcast cross join; df is
    |query|-rows.
    """
    toks = D.tokens("text", dialect)
    hit_arr = D.filter_arr("toks", "x", f"x IN {_terms_sql()}", dialect)
    if pd_rel is not None:
        toks_cte = ""
        dl_body = f"SELECT doc_id, dl FROM {pd_rel}"
        hits = f"SELECT doc_id, t FROM {pd_rel} LATERAL VIEW explode(hs) x AS t"
    else:
        toks_cte = (
            f"toks AS (\n            SELECT doc_id, {toks} AS toks "
            f"FROM {_doc_tbl(dialect)}\n        ),\n        "
        )
        dl_body = (
            f"SELECT doc_id, cast({D.arr_size('toks', dialect)} as bigint) AS dl"
            f"\n            FROM toks"
        )
        if dialect == D.SPARK:
            hits = (
                f"SELECT doc_id, t FROM (SELECT doc_id, {hit_arr} AS hs FROM toks) h "
                f"LATERAL VIEW explode(hs) x AS t"
            )
        else:
            hits = f"SELECT doc_id, unnest({hit_arr}) AS t FROM toks"
    qidf = (
        f"cast(floor(ln(1.0 + (cast(n_docs - df as double) + 0.5)"
        f" / (cast(df as double) + 0.5)) * {_LN_SCALE}.0 + 0.5) as bigint)"
    )
    # One scoring expression per literal query term, summed in fixed
    # syntactic order (engine-independent double addition).
    part = (
        f"coalesce(max(CASE WHEN tf.t = '{{term}}' THEN"
        f" (cast(qidf as double) / {_LN_SCALE}.0)"
        f" * (cast(tf as double) * {_BM25_K1 + 1.0!r})"
        f" / (cast(tf as double) + {_BM25_K1!r} *"
        f" ({1.0 - _BM25_B!r} + {_BM25_B!r} * cast(dl as double) / avgdl))"
        f" END), 0.0)"
    )
    score = " + ".join(part.format(term=t) for t in _QUERY_TERMS)
    return f"""
        WITH {toks_cte}dl AS (
            {dl_body}
        ),
        stats AS (
            SELECT cast(count(*) as bigint) AS n_docs,
                   cast(sum(dl) as double) / cast(count(*) as double) AS avgdl
            FROM dl
        ),
        hits AS ({hits}),
        tf AS (
            SELECT doc_id, t, cast(count(*) as bigint) AS tf
            FROM hits GROUP BY doc_id, t
        ),
        df AS (
            SELECT t, cast(count(*) as bigint) AS df FROM tf GROUP BY t
        ),
        idf AS (
            SELECT t, {qidf} AS qidf FROM df CROSS JOIN stats
        ),
        scored AS (
            SELECT tf.doc_id, {score} AS score
            FROM tf
            JOIN idf ON tf.t = idf.t
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
        )
        SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id
        LIMIT {_BM25_TOPK}
    """


def _terms_sql() -> str:
    return "(" + ", ".join(f"'{t}'" for t in _QUERY_TERMS) + ")"


def _bm25_pd_sql() -> str:
    """The Spark-side per-document BM25 input relation: one tokenize
    pass emits the doc length and the query-term hit array (bounded by
    the query terms\' frequency — tiny per doc). Staged (cached) by the
    query functions because the BM25 CTE chain consumes it from four
    sub-relations (dl x2 via stats/scored, hits, and the idf chain) and
    Spark re-expands an inlined CTE into every consumer — without the
    stage the corpus is re-scanned and re-tokenized per consumer (the
    measured plan held 20 parquet scans for the hybrid query)."""
    toks = D.tokens("text", D.SPARK)
    hit_arr = D.filter_arr("toks", "x", f"x IN {_terms_sql()}", D.SPARK)
    return (
        f"SELECT doc_id, cast({D.arr_size('toks', D.SPARK)} as bigint) AS dl, "
        f"{hit_arr} AS hs "
        f"FROM (SELECT doc_id, {toks} AS toks FROM {SPARK_VIEW}) t"
    )


def _stage_bm25_pd(spark: SparkSession, scope: str) -> str:
    pd = scoped_cache(spark.sql(_bm25_pd_sql()), scope)
    view = "__fps_bm25_pd"
    pd.createOrReplaceTempView(view)
    return view


@register("doc_bm25_topk", oracle=_bm25_sql(D.DUCK), tags=("extension",))
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed 3-term keyword query (k1=1.2,
    b=0.75, Lucene idf). See _bm25_sql for the parity scheme and why
    the query-term filter sits inside the scan projection; the per-doc
    (dl, hits) relation is staged once (see _bm25_pd_sql) so the corpus
    is scanned and tokenized exactly once. The DuckDB oracle keeps the
    single-SQL formulation — same values."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(
        _bm25_sql(D.SPARK, pd_rel=_stage_bm25_pd(spark, "doc_bm25_topk"))
    )



# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 + vector cosine fused by Reciprocal Rank Fusion
# --------------------------------------------------------------------------
_EMB_VIEW = "__fps_search_emb"
_EMB_DIM = 64
_RRF_K = 60          # the standard RRF damping constant
_VEC_TOPK = 20
_HYBRID_TOPK = 20


def _emb_tbl(dialect: str) -> str:
    return _EMB_VIEW if dialect == D.SPARK else "embeddings"


def _hybrid_rrf_sql(
    dialect: str, pd_rel: str | None = None, normed_rel: str | None = None
) -> str:
    """Hybrid search: the lexical leg (BM25 top-20) and the semantic
    leg (cosine top-20 to a fixed query vector — the corpus's min
    vec_id row, so the "query" is deterministic data, not a literal)
    are each ranked by a total order, then fused with Reciprocal Rank
    Fusion:  score(d) = Σ_legs 1/(K + rank_leg(d)), K=60 — the
    standard fusion for lexical+vector retrieval (Cormack et al.,
    SIGIR'09; what Elasticsearch/OpenSearch hybrid query does).

    Exactness: each leg's rank comes from a total order (score desc,
    id), so ranks are engine-identical ints; 1/(K+r) is one IEEE
    division and the two legs add in fixed syntactic order.

    Scale shape: legs are independent (one corpus-sized posting
    shuffle for BM25, one embedding scan vs a 1-row broadcast query
    vector for cosine) and each emits a TOP-K-sized relation, so the
    fusion join is K×K-sized — negligible at any corpus size. At
    100 TB the cosine leg swaps in the IVF index (emb_ivf_topk) with
    the same output contract."""
    dot = D.dot("e.embedding", "q.embedding", _EMB_DIM, dialect)
    cos = f"({dot} / sqrt(e.nrm * q.nrm))"
    nrm = D.dot("embedding", "embedding", _EMB_DIM, dialect)
    rrf = (
        f"coalesce(1.0 / cast({_RRF_K} + b.r as double), 0.0)"
        f" + coalesce(1.0 / cast({_RRF_K} + v.r as double), 0.0)"
    )
    nr = normed_rel or "normed"
    normed_cte = (
        ""
        if normed_rel
        else f"""normed AS (
            SELECT vec_id, embedding, {nrm} AS nrm FROM {_emb_tbl(dialect)}
        ),
        """
    )
    return f"""
        WITH bm AS ({_bm25_sql(dialect, pd_rel=pd_rel)}),
        bm_rank AS (
            SELECT doc_id, cast(row_number() OVER (
                ORDER BY score DESC, doc_id) as bigint) AS r
            FROM bm
        ),
        {normed_cte}q AS (
            SELECT embedding, nrm FROM {nr}
            WHERE vec_id = (SELECT min(vec_id) FROM {nr})
        ),
        vec_scored AS (
            SELECT e.vec_id AS doc_id, {cos} AS cosine
            FROM {nr} e CROSS JOIN q
            WHERE e.vec_id != (SELECT min(vec_id) FROM {nr})
        ),
        vec_top AS (
            -- top-k BEFORE ranking: ORDER BY + LIMIT is per-partition
            -- heaps in Spark (TakeOrderedAndProject), so the global
            -- row_number window below sees {_VEC_TOPK} rows, never the
            -- corpus
            SELECT doc_id, cosine FROM vec_scored
            ORDER BY cosine DESC, doc_id LIMIT {_VEC_TOPK}
        ),
        vec_rank AS (
            SELECT doc_id, cast(row_number() OVER (
                ORDER BY cosine DESC, doc_id) as bigint) AS r
            FROM vec_top
        ),
        fused AS (
            SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
                   {rrf} AS rrf_score,
                   b.r AS bm25_rank, v.r AS vec_rank
            FROM bm_rank b FULL OUTER JOIN vec_rank v ON b.doc_id = v.doc_id
        )
        SELECT doc_id, rrf_score, bm25_rank, vec_rank FROM fused
        ORDER BY rrf_score DESC, doc_id
        LIMIT {_HYBRID_TOPK}
    """


@register("doc_hybrid_search_rrf", oracle=_hybrid_rrf_sql(D.DUCK), tags=("extension",))
def doc_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval: BM25 leg ∪ cosine leg fused
    by Reciprocal Rank Fusion (K=60). See _hybrid_rrf_sql for the
    exactness scheme and the K×K fusion-join scale story."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(SPARK_VIEW)
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(_EMB_VIEW)
    # Stage BOTH legs' base relations once (same scope): the BM25 CTE
    # chain consumes the per-doc (dl, hits) relation four ways and the
    # cosine leg consumes the normed embeddings four ways (q, the two
    # min(vec_id) subqueries, the scored scan) — unstaged, Spark
    # re-expands each into every consumer (measured: 20 parquet scans,
    # 4 tokenizer evaluations per row). The DuckDB oracle keeps the
    # single-SQL formulation — same values.
    scope = "doc_hybrid_search_rrf"
    pd_view = _stage_bm25_pd(spark, scope)
    nrm = D.dot("embedding", "embedding", _EMB_DIM, D.SPARK)
    normed = scoped_cache(
        spark.sql(
            f"SELECT vec_id, embedding, {nrm} AS nrm FROM {_EMB_VIEW}"
        ),
        scope,
    )
    normed.createOrReplaceTempView("__fps_hybrid_normed")
    return spark.sql(
        _hybrid_rrf_sql(D.SPARK, pd_rel=pd_view, normed_rel="__fps_hybrid_normed")
    )


# --------------------------------------------------------------------------
# Bigram language model: top conditional continuations
# --------------------------------------------------------------------------
_LM_TOPK = 25


def _bigram_lm_sql(dialect: str, bigrams_rel: str | None = None) -> str:
    """Top bigram continuations with conditional probability
    P(w2 | w1) = c(w1,w2) / c(w1 ·) — the counting core of n-gram
    language modeling (and of the contamination-detectable memorized-
    phrase statistics a corpus audit wants).

    Exactness: counts are exact int64 (map-side combined); the
    probability is ONE IEEE division; top-k is a full total order
    (c12 desc, w1, w2).

    Scale shape: the bigram explode emits n-1 pairs per doc but the
    shuffle carries (w1, w2) partial counts, not positions; the w1
    marginal comes from re-aggregating the bigram table (vocab²-bounded
    but data-bounded in practice), never a second corpus scan; top-k is
    per-partition heaps."""
    toks = D.tokens("text", dialect)
    n = D.arr_size("toks", dialect)
    if dialect == D.SPARK:
        # element_at requires an INT index; sequence() emits ints when
        # given int bounds. The generator is CASE-guarded (empty array
        # for < 2 tokens) instead of a WHERE on the token count: a
        # size() predicate on the projected array is pushed back through
        # the projection and re-runs the tokenizer a second time per row
        # at the scan.
        w1 = D.arr_index("toks", "i", dialect)
        w2 = D.arr_index("toks", "(i + 1)", dialect)
        gen = (
            f"explode(CASE WHEN {n} >= 2 THEN sequence(1, cast({n} as int) - 1)"
            f" ELSE array() END)"
        )
        pairs = (
            f"SELECT {w1} AS w1, {w2} AS w2 FROM "
            f"(SELECT toks, {gen} AS i FROM toks_rel) g"
        )
    else:
        w1 = D.arr_index("toks", "cast(i as int)", dialect)
        w2 = D.arr_index("toks", "(cast(i as int) + 1)", dialect)
        pairs = (
            f"SELECT {w1} AS w1, {w2} AS w2 FROM "
            f"(SELECT toks, unnest(range(1, {n})) AS i FROM toks_rel WHERE {n} >= 2) g"
        )
    bigrams_body = (
        f"SELECT w1, w2, cast(count(*) as bigint) AS c12 "
        f"FROM ({pairs}) p GROUP BY w1, w2"
    )
    if bigrams_rel is None:
        with_head = f"""toks_rel AS (
            SELECT {toks} AS toks FROM {_doc_tbl(dialect)}
        ),
        bigrams AS ({bigrams_body}),
        """
        bigrams = "bigrams"
    else:
        with_head = ""
        bigrams = bigrams_rel
    return f"""
        WITH {with_head}marginal AS (
            SELECT w1, cast(sum(c12) as bigint) AS c1 FROM {bigrams} GROUP BY w1
        )
        SELECT b.w1, b.w2, b.c12, m.c1,
               cast(b.c12 as double) / cast(m.c1 as double) AS cond_prob
        FROM {bigrams} b JOIN marginal m ON b.w1 = m.w1
        ORDER BY b.c12 DESC, b.w1, b.w2
        LIMIT {_LM_TOPK}
    """


def _bigram_counts_sql() -> str:
    """The Spark-side bigram-count relation alone (the staged half of
    _bigram_lm_sql when ``bigrams_rel`` is passed)."""
    toks = D.tokens("text", D.SPARK)
    n = D.arr_size("toks", D.SPARK)
    w1 = D.arr_index("toks", "i", D.SPARK)
    w2 = D.arr_index("toks", "(i + 1)", D.SPARK)
    gen = (
        f"explode(CASE WHEN {n} >= 2 THEN sequence(1, cast({n} as int) - 1)"
        f" ELSE array() END)"
    )
    return (
        f"SELECT w1, w2, cast(count(*) as bigint) AS c12 FROM ("
        f"SELECT {w1} AS w1, {w2} AS w2 FROM "
        f"(SELECT toks, {gen} AS i FROM "
        f"(SELECT {toks} AS toks FROM {SPARK_VIEW}) t) g"
        f") p GROUP BY w1, w2"
    )


@register("doc_bigram_lm", oracle=_bigram_lm_sql(D.DUCK), tags=("extension",))
def doc_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 bigram continuations with conditional probabilities —
    the n-gram LM counting core. See _bigram_lm_sql.

    The bigram-count table is STAGED (cached) before the marginal: the
    `bigrams` CTE is consumed by both the w1 marginal and the final
    join, and Spark re-expands an inlined CTE into each consumer — two
    full tokenize→explode→aggregate passes over the corpus for a
    vocab²-bounded (tiny at any corpus size) relation. The DuckDB
    oracle keeps the single-SQL formulation — same values."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(SPARK_VIEW)
    bigrams = scoped_cache(spark.sql(_bigram_counts_sql()), "doc_bigram_lm")
    bigrams.createOrReplaceTempView("__fps_bigram_counts")
    return spark.sql(_bigram_lm_sql(D.SPARK, bigrams_rel="__fps_bigram_counts"))
