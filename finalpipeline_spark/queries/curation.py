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
    return f"""
        WITH {_decontam_shingled_cte(dialect)},
        {_decontam_join_sql(dialect, "shingled")}
    """


def _decontam_shingled_cte(dialect: str) -> str:
    """The per-doc (doc_id, sh, n_sh) shingle-set CTE body."""
    toks = D.tokens("text", dialect)
    hs = D.transform_arr("toks", "t", D.token_hash("t", dialect), dialect)
    sh = D.arr_distinct(D.shingle_hashes("hs", dialect), dialect)
    return f"""toks AS (
            SELECT doc_id, {toks} AS toks FROM {_doc_tbl(dialect)}
        ),
        shingled AS (
            SELECT doc_id, sh, {D.arr_size('sh', dialect)} AS n_sh
            FROM (SELECT doc_id, {sh} AS sh
                  FROM (SELECT doc_id, {hs} AS hs FROM toks) hh) ss
        )"""


def _decontam_join_sql(dialect: str, shingled_rel: str) -> str:
    """Explode + train⋈eval overlap count over a shingled relation
    (CTE tail — prefix with WITH when used standalone)."""
    if dialect == D.SPARK:
        expl = f"SELECT doc_id, n_sh, explode(sh) AS h FROM {shingled_rel}"
    else:
        expl = f"SELECT doc_id, n_sh, unnest(sh) AS h FROM {shingled_rel}"
    return f"""ex AS ({expl}),
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
    scale shape.

    The per-doc shingle-set table is STAGED (cached + explicitly
    computed once): inlined as a CTE, Catalyst re-expands it into every
    consumer — two join sides × (sh, n_sh, explode) ≈ 22 copies of the
    tokenize→hash→shingle lambda chain in the physical plan, measured
    20 s at sf0.01 versus ~1 s staged."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(SPARK_VIEW)
    shingled = scoped_cache(
        spark.sql(
            f"WITH {_decontam_shingled_cte(D.SPARK)} SELECT * FROM shingled"
        ),
        "doc_decontam_ngram_overlap",
    )
    # The tail is DataFrame ops over the cached frame OBJECT (not a view
    # re-resolving the SQL): a re-derived plan canonicalizes differently
    # once the explode's implied size(sh) > 0 filter is pushed below the
    # staging subtree, so the cache is silently missed and every filter
    # copy re-expands the full chain into the scan.
    ex = shingled.select("doc_id", "n_sh", F.explode("sh").alias("h"))
    train = ex.filter(F.col("doc_id") % _EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc_id"), "h"
    )
    eval_side = ex.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"),
        F.col("n_sh").alias("n_sh_eval"),
        "h",
    )
    return (
        train.join(eval_side, "h")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            (
                F.count(F.lit(1)).cast("double")
                / F.max("n_sh_eval").cast("double")
            ).alias("eval_overlap_frac"),
        )
        .filter(F.col("n_shared") >= _MIN_SHARED)
    )


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
            spark.sparkContext.defaultParallelism, "vec_id"
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


# --------------------------------------------------------------------------
# Dedup pipeline sign-off: recall of the LSH candidate generator
# --------------------------------------------------------------------------
def _lsh_recall_oracle_sql() -> str:
    from finalpipeline_spark.queries import documents as DOC

    return f"""
        WITH exact_p AS ({DOC._ngram_pairs_sql(D.DUCK)}),
        lsh_p AS ({DOC._lsh_pairs_sql(D.DUCK)})
        SELECT count(*) AS n_exact,
               (SELECT count(*) FROM lsh_p) AS n_lsh,
               count(l.doc_id_a) AS n_hit,
               cast(count(l.doc_id_a) as double) / cast(count(*) as double)
                   AS recall
        FROM exact_p e
        LEFT JOIN lsh_p l
          ON e.doc_id_a = l.doc_id_a AND e.doc_id_b = l.doc_id_b
    """


@register("doc_dedup_lsh_recall", oracle=_lsh_recall_oracle_sql(), tags=("extension",))
def doc_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash-LSH candidate generator against the exact
    size-blocked n-gram-Jaccard pairs (both at jaccard >= 0.2) — the
    acceptance metric for the banded dedup deployment, mirroring
    emb_ann_recall_eval on the embedding side.

    Reuses the two registered queries' own plans under ONE shared cache
    scope (scoped_cache evicts other scopes, so calling the two queries
    directly would drop the exact side's staged shingle relation before
    the final join consumes it — re-expanding the tokenizer chain into
    every join branch); the exact side is the quadratic verification
    baseline (sampled in production, full here)."""
    from finalpipeline_spark.queries import documents as DOC

    scope = "doc_dedup_lsh_recall"
    exact = DOC._ngram_pairs_df(spark, sf_dir, scope).select("doc_id_a", "doc_id_b")
    lsh = DOC._minhash_lsh_pairs_df(spark, sf_dir, scope).select("doc_id_a", "doc_id_b")
    hit = lsh.withColumn("hit", F.lit(1))
    agg = exact.join(hit, ["doc_id_a", "doc_id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("hit").alias("n_hit"),
    )
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    return agg.crossJoin(n_lsh).select(
        "n_exact",
        "n_lsh",
        "n_hit",
        (F.col("n_hit").cast("double") / F.col("n_exact").cast("double")).alias(
            "recall"
        ),
    )


# --------------------------------------------------------------------------
# Quality-weighted (importance) sampling — deterministic, shuffle-free
# --------------------------------------------------------------------------
_SAMPLE_MULT = 1103515245  # glibc LCG multiplier — a lane independent of D.MULT


def _weighted_sample_sql(dialect: str) -> str:
    """Keep each document with probability equal to its quality score:
    u = hash(doc_id) / HASH_MOD in [0, 1); keep iff u < score.

    This is how a 100 TB corpus is quality-resampled in practice:
    content-addressed per-row decision — no shuffle, no RNG state,
    reproducible across runs/engines/partitionings (rand() is none of
    those). The hash lane differs from doc_train_test_split's so the
    sample is independent of the split assignment. Both engines
    evaluate identical integer arithmetic + one IEEE division, so the
    kept set is bit-identical."""
    from finalpipeline_spark.queries import documents as DOC

    score = DOC._quality_score_expr(dialect)
    n_tok = D.arr_size(DOC._toks(dialect), dialect)
    u = (
        f"(cast((doc_id * {_SAMPLE_MULT}) % {D.HASH_MOD} as double)"
        f" / {D.HASH_MOD}.0)"
    )
    return f"""
        SELECT doc_id, quality_score, u AS sample_u
        FROM (
            SELECT doc_id, ({score}) AS quality_score, {u} AS u
            FROM {_doc_tbl(dialect)}
            WHERE {n_tok} > 0
        ) t
        WHERE u < quality_score
    """


@register(
    "doc_quality_weighted_sample",
    oracle=_weighted_sample_sql(D.DUCK),
    tags=("extension",),
)
def doc_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling: keep a document with
    probability equal to its quality score (see _weighted_sample_sql
    for the scale rationale). Pure per-row map — runs at scan speed."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_weighted_sample_sql(D.SPARK))


# --------------------------------------------------------------------------
# k-means (Lloyd) — the IVF coarse-quantizer TRAINED, not label-assumed
# --------------------------------------------------------------------------
_KM_K = 8  # clusters; seeds = rows with vec_id < _KM_K


def _kmeans_sql(dialect: str, v_rel: str | None = None, ex_rel: str | None = None) -> str:
    """Two unrolled Lloyd rounds from deterministic seeds (vec_id <
    _KM_K), emitting the final centroids in exploded scalar form.

    Distance uses the staged squared norms: d(v,c) = |v|^2 - 2 v.c +
    |c|^2, with every dot product a *sequential* fold (identical IEEE
    order in both engines); centroid components are rounded to 6 dp at
    each update so round-2 inputs are bit-identical despite the
    order-dependent avg. Assignment argmin breaks ties by centroid id.

    Scale shape per round: one broadcast join (K centroids against the
    corpus — map-side, no vector shuffle) + one (cid, dim) partial-sum
    shuffle whose width is K x DIM rows, independent of corpus size.
    ``v_rel``/``ex_rel`` name pre-staged (cached) Spark relations for
    the normed and exploded tables — referenced twice each, and
    Catalyst recomputes CTEs per reference; DuckDB inlines them."""
    dim = E.DIM
    nrm = D.dot("embedding", "embedding", dim, dialect)
    v_src = v_rel or "v"
    ex_src = ex_rel or "ex"
    if dialect == D.SPARK:
        expl = (
            f"SELECT vec_id, dim_i, cast(comp as double) AS comp FROM {v_src} "
            f"LATERAL VIEW posexplode(embedding) t AS dim_i, comp"
        )
    else:
        expl = (
            f"SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim_i, "
            f"unnest(embedding)::double AS comp FROM {v_src}"
        )
    with_v = "" if v_rel else f"v AS (SELECT vec_id, embedding, {nrm} AS nrm FROM {_emb_tbl_cur(dialect)}),\n        "
    with_ex = "" if ex_rel else f"ex AS ({expl}),\n        "
    return f"""
        WITH {with_v}{with_ex}{_kmeans_assign_ctes(dialect, v_src, ex_src)}
        SELECT a2.cid, e.dim_i, round(avg(e.comp), 6) AS centroid_component,
               count(*) AS n_vectors
        FROM a2 JOIN {ex_src} e ON a2.vec_id = e.vec_id
        GROUP BY a2.cid, e.dim_i
    """


def _kmeans_assign_ctes(dialect: str, v_src: str, ex_src: str) -> str:
    """The shared Lloyd-iteration CTE chain (seeds → assign → update →
    assign), ending at ``a2`` (vec_id → cid) and ``c1n`` (cid, cvec,
    cnrm) — consumed by BOTH the centroid query (_kmeans_sql) and the
    trained-lists IVF search (_ivf_kmeans_sql)."""
    dim = E.DIM
    if dialect == D.SPARK:
        cvec_agg = (
            "transform(array_sort(collect_list(struct(dim_i, comp))), s -> s.comp)"
        )
    else:
        cvec_agg = "list(comp ORDER BY dim_i)"
    d1_dot = D.dot("a.embedding", "c.cvec", dim, dialect)
    cnrm1 = D.dot("cvec", "cvec", dim, dialect)
    return f"""s0 AS (
            SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
            FROM {v_src} WHERE vec_id < {_KM_K}
        ),
        d1 AS (
            SELECT a.vec_id, c.cid,
                   (a.nrm - 2 * {d1_dot} + c.cnrm) AS dist
            FROM {v_src} a CROSS JOIN s0 c
        ),
        a1 AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM d1
            ) t WHERE rn = 1
        ),
        m1 AS (
            SELECT a1.cid, e.dim_i, round(avg(e.comp), 6) AS comp
            FROM a1 JOIN {ex_src} e ON a1.vec_id = e.vec_id
            GROUP BY a1.cid, e.dim_i
        ),
        c1 AS (
            SELECT cid, {cvec_agg} AS cvec FROM m1 GROUP BY cid
        ),
        c1n AS (
            SELECT cid, cvec, {cnrm1} AS cnrm FROM c1
        ),
        d2 AS (
            SELECT a.vec_id, c.cid,
                   (a.nrm - 2 * {d1_dot} + c.cnrm) AS dist
            FROM {v_src} a CROSS JOIN c1n c
        ),
        a2 AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM d2
            ) t WHERE rn = 1
        )"""


def _emb_tbl_cur(dialect: str) -> str:
    return E.SPARK_VIEW if dialect == D.SPARK else "embeddings"


@register("emb_kmeans_lloyd", oracle=_kmeans_sql(D.DUCK), tags=("extension",))
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means (2 Lloyd rounds, deterministic seeds): the IVF coarse
    quantizer actually trained instead of assumed from the label
    column. See _kmeans_sql for the per-round scale shape (broadcast
    assignment join + K x DIM partial-sum shuffle).

    Spark stages the normed and exploded tables (cached, repartitioned)
    because each is consumed by both rounds and Catalyst recomputes
    CTEs per reference."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(E.SPARK_VIEW)
    par = spark.sparkContext.defaultParallelism
    nrm = D.dot("embedding", "embedding", E.DIM, D.SPARK)
    v = scoped_cache(
        spark.sql(
            f"SELECT vec_id, embedding, {nrm} AS nrm FROM {E.SPARK_VIEW}"
        ).repartition(par, "vec_id"),
        "emb_kmeans_lloyd",
    )
    v.createOrReplaceTempView("__fps_km_v")
    ex = scoped_cache(
        spark.sql(
            "SELECT vec_id, dim_i, cast(comp as double) AS comp FROM __fps_km_v "
            "LATERAL VIEW posexplode(embedding) t AS dim_i, comp"
        ),
        "emb_kmeans_lloyd",
    )
    ex.createOrReplaceTempView("__fps_km_ex")
    return spark.sql(_kmeans_sql(D.SPARK, v_rel="__fps_km_v", ex_rel="__fps_km_ex"))


# --------------------------------------------------------------------------
# IVF search over TRAINED lists (kmeans assignment, not the label column)
# --------------------------------------------------------------------------
_IVF_KM_NPROBE = 2
_IVF_KM_K = 5


def _ivf_kmeans_sql(dialect: str, v_rel: str | None = None, ex_rel: str | None = None) -> str:
    """IVF-flat search whose inverted lists are the TRAINED kmeans
    assignment (the _kmeans_sql Lloyd chain), not the label column —
    the production coarse quantizer: lists follow the data's own
    geometry, so recall at a fixed probe fraction is bounded below by
    the label-partitioned variant's (measured at sf0.1 by
    tests/test_recall_bounds.py, where trained lists roughly double
    label-IVF recall on the synthetic corpus).

    Same exactness scheme as _kmeans_sql/_ivf_topk_sql: sequential-fold
    dot products, 6-dp-rounded centroid components, argmin/argmax ties
    broken by id — both engines agree bit-for-bit.

    Scale shape: the Lloyd chain is two broadcast assignment joins +
    two K x DIM partial-sum shuffles; the search probes {nprobe} of
    {k} lists via a |queries| x K broadcast cross join and scans ONLY
    vectors whose a2 assignment matches a probed list — at 100 TB the
    a2 relation is the persisted list index (plans/incremental_ann.py
    maintains exactly this shape incrementally)."""
    dim = E.DIM
    nrm = D.dot("embedding", "embedding", dim, dialect)
    v_src = v_rel or "v"
    ex_src = ex_rel or "ex"
    if dialect == D.SPARK:
        expl = (
            f"SELECT vec_id, dim_i, cast(comp as double) AS comp FROM {v_src} "
            f"LATERAL VIEW posexplode(embedding) t AS dim_i, comp"
        )
        rn_cast = "cast(rn as int)"
    else:
        expl = (
            f"SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim_i, "
            f"unnest(embedding)::double AS comp FROM {v_src}"
        )
        rn_cast = "rn::int"
    qc_dot = D.dot("q.embedding", "c.cvec", dim, dialect)
    qe_dot = D.dot("q.embedding", "e.embedding", dim, dialect)
    with_v = "" if v_rel else f"v AS (SELECT vec_id, embedding, {nrm} AS nrm FROM {_emb_tbl_cur(dialect)}),\n        "
    with_ex = "" if ex_rel else f"ex AS ({expl}),\n        "
    return f"""
        WITH {with_v}{with_ex}{_kmeans_assign_ctes(dialect, v_src, ex_src)},
        q AS (
            SELECT vec_id, embedding, nrm FROM {v_src} WHERE vec_id % 50 = 0
        ),
        probe AS (
            SELECT vec_id, cid FROM (
                SELECT q.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY (q.nrm - 2 * {qc_dot} + c.cnrm), c.cid
                       ) AS pr
                FROM q CROSS JOIN c1n c
            ) t WHERE pr <= {_IVF_KM_NPROBE}
        ),
        scored AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ({qe_dot} / sqrt(q.nrm * e.nrm)) AS cosine
            FROM probe p
            JOIN q ON q.vec_id = p.vec_id
            JOIN a2 ON a2.cid = p.cid
            JOIN {v_src} e ON e.vec_id = a2.vec_id
            WHERE e.vec_id != q.vec_id
        )
        SELECT query_id, neighbor_id, cosine, {rn_cast} AS rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
            FROM scored
        ) t WHERE rn <= {_IVF_KM_K}
    """


@register("emb_ivf_kmeans_topk", oracle=_ivf_kmeans_sql(D.DUCK), tags=("extension",))
def emb_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN search over TRAINED (kmeans) inverted lists — the
    production counterpart of emb_ivf_topk's label-partitioned
    demonstrator. See _ivf_kmeans_sql for semantics and the staged
    relations (normed + exploded tables feed the Lloyd chain AND the
    search)."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(E.SPARK_VIEW)
    par = spark.sparkContext.defaultParallelism
    nrm = D.dot("embedding", "embedding", E.DIM, D.SPARK)
    v = scoped_cache(
        spark.sql(
            f"SELECT vec_id, embedding, {nrm} AS nrm FROM {E.SPARK_VIEW}"
        ).repartition(par, "vec_id"),
        "emb_ivf_kmeans_topk",
    )
    v.createOrReplaceTempView("__fps_ivfkm_v")
    ex = scoped_cache(
        spark.sql(
            "SELECT vec_id, dim_i, cast(comp as double) AS comp FROM __fps_ivfkm_v "
            "LATERAL VIEW posexplode(embedding) t AS dim_i, comp"
        ),
        "emb_ivf_kmeans_topk",
    )
    ex.createOrReplaceTempView("__fps_ivfkm_ex")
    return spark.sql(
        _ivf_kmeans_sql(D.SPARK, v_rel="__fps_ivfkm_v", ex_rel="__fps_ivfkm_ex")
    )


# --------------------------------------------------------------------------
# Product quantization encode (PQ codes + reconstruction error)
# --------------------------------------------------------------------------
_PQ_M = 4                       # subspaces
_PQ_SUBDIM = E.DIM // _PQ_M     # 16 dims each
_PQ_CODES = 8                   # codebook entries per subspace (seed rows)


def _pq_sql(dialect: str, sub_rel: str | None = None) -> str:
    """PQ encode: split each vector into _PQ_M contiguous subvectors;
    assign each to the nearest codebook entry (seed rows vec_id <
    _PQ_CODES) in that subspace; emit the m code columns plus the
    total squared reconstruction error (summed in fixed syntactic
    order so both engines produce the identical double).

    Scale shape: the codebook is tiny and broadcast; encoding is a
    per-row map over the corpus — no shuffle at all, which is the
    whole point of PQ (compress 100 TB of float vectors to m bytes
    per vector in one scan)."""
    sub = _PQ_SUBDIM
    if dialect == D.SPARK:
        slices = "\nUNION ALL\n".join(
            f"SELECT vec_id, {s} AS s, slice(embedding, {s * sub + 1}, {sub}) AS sv "
            f"FROM {_emb_tbl_cur(dialect)}"
            for s in range(_PQ_M)
        )
    else:
        slices = "\nUNION ALL\n".join(
            f"SELECT vec_id, {s} AS s, "
            f"list_slice(embedding, {s * sub + 1}, {(s + 1) * sub}) AS sv "
            f"FROM {_emb_tbl_cur(dialect)}"
            for s in range(_PQ_M)
        )
    vnrm = D.dot("sv", "sv", sub, dialect)
    dvc = D.dot("a.sv", "c.cv", sub, dialect)
    code_cols = ",\n               ".join(
        f"max(CASE WHEN s = {s} THEN code END) AS code_{s}" for s in range(_PQ_M)
    )
    err = " + ".join(f"max(CASE WHEN s = {s} THEN dist END)" for s in range(_PQ_M))
    with_sub = (
        ""
        if sub_rel
        else f"sub AS ({slices}),\n        "
        f"subn AS (SELECT vec_id, s, sv, {vnrm} AS vnrm FROM sub),\n        "
    )
    subn_src = sub_rel or "subn"
    return f"""
        WITH {with_sub}cb AS (
            SELECT vec_id AS code, s, sv AS cv, vnrm AS cnrm
            FROM {subn_src} WHERE vec_id < {_PQ_CODES}
        ),
        d AS (
            SELECT a.vec_id, a.s, c.code,
                   (a.vnrm - 2 * {dvc} + c.cnrm) AS dist
            FROM {subn_src} a JOIN cb c ON a.s = c.s
        ),
        asg AS (
            SELECT vec_id, s, code, dist FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, s ORDER BY dist, code) AS rn
                FROM d
            ) t WHERE rn = 1
        )
        SELECT vec_id,
               {code_cols},
               ({err}) AS recon_err
        FROM asg GROUP BY vec_id
    """


@register("emb_pq_encode", oracle=_pq_sql(D.DUCK), tags=("extension",))
def emb_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (m=4 subspaces x 16 dims, 8-entry
    codebooks from deterministic seed rows) with per-vector
    reconstruction error — the memory-compression layer an ANN system
    puts under its IVF index. See _pq_sql for the shuffle-free scale
    shape.

    Spark stages the subvector+norm table (cached, repartitioned): it
    feeds both the codebook and the encode side, and the staging also
    spreads the single-file scan across cores."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(E.SPARK_VIEW)
    par = spark.sparkContext.defaultParallelism
    sub = _PQ_SUBDIM
    slices = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s} AS s, slice(embedding, {s * sub + 1}, {sub}) AS sv "
        f"FROM {E.SPARK_VIEW}"
        for s in range(_PQ_M)
    )
    vnrm = D.dot("sv", "sv", sub, D.SPARK)
    subn = scoped_cache(
        spark.sql(
            f"SELECT vec_id, s, sv, {vnrm} AS vnrm FROM ({slices}) sub"
        ).repartition(par, "vec_id", "s"),
        "emb_pq_encode",
    )
    subn.createOrReplaceTempView("__fps_pq_subn")
    return spark.sql(_pq_sql(D.SPARK, sub_rel="__fps_pq_subn"))


# --------------------------------------------------------------------------
# Unigram-LM perplexity scoring (CCNet-style quality signal)
# --------------------------------------------------------------------------
_LN_SCALE = 1_000_000  # fixed-point quantization of ln(count)


def _lm_perplexity_sql(dialect: str) -> str:
    """Per-document cross-entropy under the corpus's own unigram LM —
    the classic LM-based quality filter (CCNet shape: score docs by
    how surprising their tokens are; boilerplate scores low, gibberish
    scores high).

        H(doc) = ln(total) - (1/n) * sum_t ln(count(t))

    (Perplexity = exp(H) is a monotone transform; thresholds live in
    log space, and exp's last-ulp differs across libms, so H is the
    emitted column.)

    Parity is EXACT, not rounded: ln(count) is quantized to integer
    micro-nats via floor(ln * 1e6 + 0.5) — floor of an identical
    double is identical in both engines — so every per-document sum is
    exact int64 arithmetic (order-independent), and the final ln/exp
    run on identical doubles.

    Scale shape: one explode + (doc, token) partial-count, one token
    vocab aggregation (vocab << corpus), one join of doc term-freqs
    against the vocab (broadcast when the vocab fits, shuffle-on-token
    otherwise), one (doc) sum. The corpus total is a 1-row broadcast
    cross join, never a collect."""
    toks = D.tokens("text", dialect)
    if dialect == D.SPARK:
        expl = "SELECT doc_id, t FROM toks LATERAL VIEW explode(toks) x AS t"
    else:
        expl = "SELECT doc_id, unnest(toks) AS t FROM toks"
    qln = (
        f"cast(floor(ln(cast(cnt as double)) * {_LN_SCALE}.0 + 0.5) as bigint)"
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {toks} AS toks FROM {_doc_tbl(dialect)}
        ),
        ex AS ({expl}),
        tf AS (
            SELECT doc_id, t, count(*) AS tf FROM ex GROUP BY doc_id, t
        ),
        vocab AS (
            SELECT t, count(*) AS cnt FROM ex GROUP BY t
        ),
        tot AS (
            SELECT sum(cnt) AS total FROM vocab
        ),
        q AS (
            SELECT t, {qln} AS qln FROM vocab
        ),
        doc_sum AS (
            SELECT tf.doc_id,
                   cast(sum(tf.tf * q.qln) as bigint) AS qsum,
                   cast(sum(tf.tf) as bigint) AS n_tokens
            FROM tf JOIN q ON tf.t = q.t
            GROUP BY tf.doc_id
        )
        SELECT doc_id, n_tokens,
               (ln(cast(total as double))
                - cast(qsum as double)
                  / ({_LN_SCALE}.0 * cast(n_tokens as double))) AS cross_entropy
        FROM doc_sum CROSS JOIN tot
    """


@register(
    "doc_lm_perplexity", oracle=_lm_perplexity_sql(D.DUCK), tags=("extension",)
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus unigram LM (CCNet-style
    quality scoring). See _lm_perplexity_sql for the exact fixed-point
    parity scheme and the scale shape. The exploded token relation is
    staged (cached, repartitioned) because both the term-frequency and
    vocabulary aggregations consume it."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(SPARK_VIEW)
    toks = D.tokens("text", D.SPARK)
    ex = scoped_cache(
        spark.sql(
            f"SELECT doc_id, t FROM (SELECT doc_id, {toks} AS toks "
            f"FROM {SPARK_VIEW}) s LATERAL VIEW explode(toks) x AS t"
        ),
        "doc_lm_perplexity",
    )
    ex.createOrReplaceTempView("__fps_lm_ex")
    qln = (
        f"cast(floor(ln(cast(cnt as double)) * {_LN_SCALE}.0 + 0.5) as bigint)"
    )
    return spark.sql(f"""
        WITH tf AS (
            SELECT doc_id, t, count(*) AS tf FROM __fps_lm_ex GROUP BY doc_id, t
        ),
        vocab AS (
            SELECT t, count(*) AS cnt FROM __fps_lm_ex GROUP BY t
        ),
        tot AS (SELECT sum(cnt) AS total FROM vocab),
        q AS (SELECT t, {qln} AS qln FROM vocab),
        doc_sum AS (
            SELECT tf.doc_id,
                   cast(sum(tf.tf * q.qln) as bigint) AS qsum,
                   cast(sum(tf.tf) as bigint) AS n_tokens
            FROM tf JOIN q ON tf.t = q.t
            GROUP BY tf.doc_id
        )
        SELECT doc_id, n_tokens,
               (ln(cast(total as double))
                - cast(qsum as double)
                  / ({_LN_SCALE}.0 * cast(n_tokens as double))) AS cross_entropy
        FROM doc_sum CROSS JOIN tot
    """)


# --------------------------------------------------------------------------
# IVF-PQ search with asymmetric distance computation (ADC)
# --------------------------------------------------------------------------
_ADC_NPROBE = 2
_ADC_K = 5


def _ivf_pq_sql(dialect: str, sub_rel: str | None = None) -> str:
    """The full compressed-index ANN stack in one plan — IVF coarse
    pruning over PQ-compressed vectors with per-query ADC lookup
    tables, i.e. what FAISS calls IVFPQ:

      1. coarse quantizer: per-label centroids (as emb_ivf_topk),
         queries (vec_id % 50 = 0) probe their _ADC_NPROBE nearest
         lists — at scale this prunes the scan to ~nprobe/nlist of
         the corpus with `label` as the partition key;
      2. compression: every corpus vector is represented ONLY by its
         _PQ_M codebook codes (the emb_pq_encode layout) — the scan
         side carries m small ints per vector, never the floats;
      3. ADC: each query precomputes a lookup table of partial squared
         distances to all _PQ_CODES entries in each subspace
         (|queries| x m x 256-at-most rows — tiny, broadcast), and a
         candidate's approximate distance is m LUT probes summed in
         fixed syntactic order (max-CASE pivot, so both engines add
         the same 4 doubles in the same order).

    Approximation error vs exact cosine is the PQ trade; recall is
    measured downstream exactly like emb_ann_recall_eval measures IVF.
    """
    sub = _PQ_SUBDIM
    if dialect == D.SPARK:
        slices = "\nUNION ALL\n".join(
            f"SELECT vec_id, label, {s} AS s, "
            f"slice(embedding, {s * sub + 1}, {sub}) AS sv "
            f"FROM {_emb_tbl_cur(dialect)}"
            for s in range(_PQ_M)
        )
        expl = f"""
            SELECT label, posexplode(embedding) AS (dim_i, component)
            FROM {_emb_tbl_cur(dialect)}
        """
        assemble = "transform(array_sort(collect_list(struct(dim_i, c))), s -> s.c)"
        rn_cast = "cast(rn as int)"
    else:
        slices = "\nUNION ALL\n".join(
            f"SELECT vec_id, label, {s} AS s, "
            f"list_slice(embedding, {s * sub + 1}, {(s + 1) * sub}) AS sv "
            f"FROM {_emb_tbl_cur(dialect)}"
            for s in range(_PQ_M)
        )
        expl = f"""
            SELECT label, generate_subscripts(embedding, 1) - 1 AS dim_i,
                   unnest(embedding)::double AS component
            FROM {_emb_tbl_cur(dialect)}
        """
        assemble = "list(c ORDER BY dim_i)"
        rn_cast = "rn::int"
    vnrm = D.dot("sv", "sv", sub, dialect)
    dvc = D.dot("a.sv", "c.cv", sub, dialect)
    qdot = D.dot("q.sv", "c.cv", sub, dialect)
    cdot = D.dot("qf.embedding", "cv.cv", E.DIM, dialect)
    adc_sum = " + ".join(f"max(CASE WHEN s = {s} THEN pd END)" for s in range(_PQ_M))
    with_sub = (
        ""
        if sub_rel
        else f"subn AS (SELECT vec_id, label, s, sv, {vnrm} AS vnrm FROM ({slices}) sl),\n        "
    )
    subn = sub_rel or "subn"
    return f"""
        WITH {with_sub}cb AS (
            SELECT vec_id AS code, s, sv AS cv, vnrm AS cnrm
            FROM {subn} WHERE vec_id < {_PQ_CODES}
        ),
        codes AS (
            SELECT vec_id, label, s, code FROM (
                SELECT a.vec_id, a.label, a.s, c.code,
                       row_number() OVER (
                           PARTITION BY a.vec_id, a.s
                           ORDER BY (a.vnrm - 2 * {dvc} + c.cnrm), c.code) AS rn
                FROM {subn} a JOIN cb c ON a.s = c.s
            ) t WHERE rn = 1
        ),
        expl AS ({expl}),
        cent AS (
            SELECT label, dim_i, round(avg(cast(component as double)), 6) AS c
            FROM expl GROUP BY label, dim_i
        ),
        cvec AS (SELECT label, {assemble} AS cv FROM cent GROUP BY label),
        qf AS (
            SELECT vec_id, embedding FROM {_emb_tbl_cur(dialect)}
            WHERE vec_id % 50 = 0
        ),
        probe AS (
            SELECT vec_id, label FROM (
                SELECT qf.vec_id, cv.label,
                       row_number() OVER (
                           PARTITION BY qf.vec_id
                           ORDER BY {cdot} DESC, cv.label) AS pr
                FROM qf CROSS JOIN cvec cv
            ) t WHERE pr <= {_ADC_NPROBE}
        ),
        qsub AS (
            SELECT vec_id, s, sv, vnrm FROM {subn} WHERE vec_id % 50 = 0
        ),
        lut AS (
            SELECT q.vec_id AS query_id, q.s, c.code,
                   (q.vnrm - 2 * {qdot} + c.cnrm) AS pd
            FROM qsub q JOIN cb c ON q.s = c.s
        ),
        cand AS (
            SELECT p.vec_id AS query_id, k.vec_id AS neighbor_id, k.s,
                   l.pd
            FROM probe p
            JOIN codes k ON k.label = p.label
            JOIN lut l ON l.query_id = p.vec_id AND l.s = k.s
                      AND l.code = k.code
            WHERE k.vec_id != p.vec_id
        ),
        scored AS (
            SELECT query_id, neighbor_id, ({adc_sum}) AS adc_dist
            FROM cand GROUP BY query_id, neighbor_id
        )
        SELECT query_id, neighbor_id, adc_dist, {rn_cast} AS rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rn
            FROM scored
        ) t WHERE rn <= {_ADC_K}
    """


@register("emb_ivf_pq_topk", oracle=_ivf_pq_sql(D.DUCK), tags=("extension",))
def emb_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN search with asymmetric distance (per-query LUT over
    PQ codes, coarse-list pruning) — the compressed-index scale path
    where the corpus scan carries only m code bytes per vector. See
    _ivf_pq_sql for the three-layer design.

    Spark stages the per-subspace (vec_id, label, s, sv, vnrm) table
    once (cached, repartitioned): it feeds the codebook, the corpus
    codes, and the query LUTs."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(E.SPARK_VIEW)
    par = spark.sparkContext.defaultParallelism
    sub = _PQ_SUBDIM
    slices = "\nUNION ALL\n".join(
        f"SELECT vec_id, label, {s} AS s, slice(embedding, {s * sub + 1}, {sub}) AS sv "
        f"FROM {E.SPARK_VIEW}"
        for s in range(_PQ_M)
    )
    vnrm = D.dot("sv", "sv", sub, D.SPARK)
    subn = scoped_cache(
        spark.sql(
            f"SELECT vec_id, label, s, sv, {vnrm} AS vnrm FROM ({slices}) sl"
        ).repartition(par, "vec_id", "s"),
        "emb_ivf_pq_topk",
    )
    subn.createOrReplaceTempView("__fps_ivfpq_subn")
    return spark.sql(_ivf_pq_sql(D.SPARK, sub_rel="__fps_ivfpq_subn"))


# --------------------------------------------------------------------------
# Matryoshka truncation evaluation (short-vector retrieval quality)
# --------------------------------------------------------------------------
_MRL_DIM = 16   # truncated prefix length
_MRL_K = 5


def _mrl_topk_sql(dialect: str, dim: int, alias: str) -> str:
    """Brute-force cosine top-k over the first `dim` dimensions."""
    nrm = D.dot("embedding", "embedding", dim, dialect)
    edot = D.dot("q.embedding", "e.embedding", dim, dialect)
    return f"""
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ({edot} / sqrt(q.nrm_{alias} * e.nrm_{alias})) DESC,
                                e.vec_id) AS rn
            FROM (SELECT vec_id, embedding, {nrm} AS nrm_{alias}
                  FROM {_emb_tbl_cur(dialect)} WHERE vec_id % 50 = 0) q
            JOIN (SELECT vec_id, embedding, {nrm} AS nrm_{alias}
                  FROM {_emb_tbl_cur(dialect)}) e
              ON e.vec_id != q.vec_id
        ) t WHERE rn <= {_MRL_K}
    """


def _mrl_sql(dialect: str) -> str:
    """Matryoshka-style truncation sign-off: how much of the full-dim
    top-k does retrieval keep when vectors are truncated to their first
    {_MRL_DIM} of {E.DIM} dimensions (4x memory/compute cut)? Reported
    as overlap@k per query — the metric that decides whether the short
    prefix is servable.

    Scale shape: two brute-force top-k passes (each the exact-baseline
    shape of emb_cosine_topk) joined on (query, neighbor) — at scale
    the truncated pass is the cheap first stage of a rerank cascade,
    scanning {_MRL_DIM}/{E.DIM} of the bytes.
    """
    return f"""
        WITH full_k AS ({_mrl_topk_sql(dialect, E.DIM, "f")}),
        short_k AS ({_mrl_topk_sql(dialect, _MRL_DIM, "s")})
        SELECT f.query_id,
               cast(count(*) as bigint) AS k_full,
               cast(count(s.neighbor_id) as bigint) AS n_kept,
               (cast(count(s.neighbor_id) as double)
                / cast(count(*) as double)) AS overlap_at_k
        FROM full_k f
        LEFT JOIN short_k s
          ON f.query_id = s.query_id AND f.neighbor_id = s.neighbor_id
        GROUP BY f.query_id
    """


@register("emb_matryoshka_eval", oracle=_mrl_sql(D.DUCK), tags=("extension",))
def emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap@5 of truncated-prefix (16-dim) vs full (64-dim) cosine
    retrieval — the Matryoshka servability metric. See _mrl_sql."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(E.SPARK_VIEW)
    return spark.sql(_mrl_sql(D.SPARK))


# --------------------------------------------------------------------------
# In-engine quality-probe training: exact least squares via normal equations
# --------------------------------------------------------------------------
_PROBE_W = 1 << 20  # weight fixed-point scale


def _probe_feat_sql(dialect: str) -> str:
    """Per-document integer feature row for the linear probe — three
    text-shape signals (token count, mean word length, 'e'-frequency:
    the classic cheap lang-id/quality features) plus the en/other
    label. All features are exact small ints (<= ~130 at any SF), so
    every downstream moment stays integer-exact. Pure per-row map: the
    featurizer runs at full scan speed on 100 TB."""
    t = _doc_tbl(dialect)
    toks = D.tokens("text", dialect)
    nsp = "length(replace(text, ' ', ''))"
    ecnt = "(length(text) - length(replace(text, 'e', '')))"
    # greatest(.., 1) denominators: an empty/non-alnum document must
    # yield a zero feature, not an ANSI divide-by-zero (identically in
    # both engines)
    ntok = f"greatest({D.arr_size('toks', dialect)}, 1)"
    return f"""
        SELECT cast(1 as bigint) AS f1,
               cast({D.arr_size('toks', dialect)} as bigint) AS f2,
               cast({D.idiv(f'({nsp}) * 16', ntok, dialect)} as bigint) AS f3,
               cast({D.idiv(f'{ecnt} * 100', 'greatest(n_chars, 1)', dialect)}
                    as bigint) AS f4,
               cast(CASE WHEN lang = 'en' THEN 1 ELSE 0 END as bigint) AS y
        FROM (SELECT text, lang, n_chars, {toks} AS toks FROM {t}) raw
    """


def _probe_moments_sql(dialect: str) -> str:
    """One exact moment row: the upper triangle of X^T X (10 entries
    over [1, f2, f3, f4]) and X^T y (4 entries). Associative integer
    sums — map-side partials, a one-row shuffle: the ONLY data-sized
    pass training needs at any scale."""
    dec = "decimal(38,0)" if dialect == D.SPARK else "hugeint"
    sums = []
    for i in range(1, 5):
        for j in range(i, 5):
            sums.append(
                f"cast(sum(cast(f{i} * f{j} as {dec})) as {dec}) AS m{i}{j}"
            )
    for i in range(1, 5):
        sums.append(f"cast(sum(cast(f{i} * y as {dec})) as {dec}) AS b{i}")
    return f"SELECT {', '.join(sums)} FROM ({_probe_feat_sql(dialect)}) feat"


def _det4_perms() -> list[tuple[int, tuple[int, ...]]]:
    """(sign, column-permutation) pairs of the 4x4 Leibniz expansion —
    the ONE enumeration both the SQL generator and the Spark driver's
    Python-int evaluation derive from, so both engines add identical
    terms."""
    from itertools import permutations

    out = []
    for p in permutations(range(4)):
        inv = sum(
            1 for a in range(4) for b in range(a + 1, 4) if p[a] > p[b]
        )
        out.append((-1 if inv % 2 else 1, p))
    return out


def _det4_terms(m: list[list[str]]) -> str:
    """24-term Leibniz expansion over SQL entry expressions."""
    parts = []
    for sgn, p in _det4_perms():
        parts.append(
            f"{'-' if sgn < 0 else '+'} "
            + " * ".join(m[i][p[i]] for i in range(4))
        )
    return " ".join(parts)


def _det4_int(m: list[list[int]]) -> int:
    """The same Leibniz expansion evaluated with exact Python ints."""
    total = 0
    for sgn, p in _det4_perms():
        prod = 1
        for i in range(4):
            prod *= m[i][p[i]]
        total += sgn * prod
    return total


def _probe_dets() -> dict[str, str]:
    """det(X^T X) and the four Cramer numerators as expressions over
    the moment-row column names. Magnitude audit: every feature is
    <= ~130 and documents number ~5e4 at sf0.1, so each moment entry is
    < 1e9 and each Leibniz term < (1e9)^4 = 1e36; the 24-term sums and
    the * 2^20 weight rescale stay well inside hugeint (~1.7e38). At
    truly larger corpora, shrink the feature quantizers before the
    moment pass (the weights are scale-free)."""
    xtx = [
        [f"m{min(i, j) + 1}{max(i, j) + 1}" for j in range(4)]
        for i in range(4)
    ]
    out = {"da": _det4_terms(xtx)}
    for k in range(4):
        rep = [
            [f"b{i + 1}" if j == k else xtx[i][j] for j in range(4)]
            for i in range(4)
        ]
        out[f"d{k + 1}"] = _det4_terms(rep)
    return out


def _probe_confusion_sql(dialect: str, w: str) -> str:
    """Scoring pass + stat rows given a one-row weights relation ``w``
    (columns w1..w4 at _PROBE_W fixed point): z = w.x exactly, predict
    1 iff z >= 1/2, emit the confusion counts and the weights as
    (stat, value) rows."""
    return f"""
        scored AS (
            SELECT y, CASE WHEN 2 * (w1 + w2 * f2 + w3 * f3 + w4 * f4)
                           >= {_PROBE_W} THEN 1 ELSE 0 END AS pred
            FROM feat CROSS JOIN {w}
        ),
        conf AS (
            SELECT cast(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) as bigint) AS tp,
                   cast(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) as bigint) AS fp,
                   cast(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) as bigint) AS fn,
                   cast(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) as bigint) AS tn
            FROM scored
        )
        SELECT 'n' AS stat, tp + fp + fn + tn AS value FROM conf
        UNION ALL SELECT 'tp', tp FROM conf
        UNION ALL SELECT 'fp', fp FROM conf
        UNION ALL SELECT 'fn', fn FROM conf
        UNION ALL SELECT 'tn', tn FROM conf
        UNION ALL SELECT 'w_bias',   cast(w1 as bigint) FROM {w}
        UNION ALL SELECT 'w_ntok',   cast(w2 as bigint) FROM {w}
        UNION ALL SELECT 'w_mwl16',  cast(w3 as bigint) FROM {w}
        UNION ALL SELECT 'w_efreq',  cast(w4 as bigint) FROM {w}
        ORDER BY stat
    """


def _probe_oracle() -> str:
    """Full training chain in one static DuckDB query, hugeint-exact
    end-to-end: featurize -> one moment row -> 4x4 Cramer solve (the
    Leibniz dets above) -> sign-magnitude truncating rescale of each
    weight onto 2^20 fixed point -> exact scoring pass. MATERIALIZED
    everywhere a CTE is referenced more than once (DuckDB inlines CTEs
    per reference)."""
    from finalpipeline_spark.queries.embeddings import _pca_tdiv

    dets = _probe_dets()
    det_cols = ", ".join(f"{expr} AS {name}" for name, expr in dets.items())
    wcols = ", ".join(
        _pca_tdiv(
            f"(CASE WHEN da >= 0 THEN d{k} ELSE -d{k} END)",
            str(_PROBE_W),
            "(CASE WHEN da >= 0 THEN da ELSE -da END)",
            D.DUCK,
        )
        + f" AS w{k}"
        for k in range(1, 5)
    )
    return f"""
        WITH feat AS MATERIALIZED ({_probe_feat_sql(D.DUCK)}),
        moments AS MATERIALIZED ({_probe_moments_sql(D.DUCK)}),
        dets AS MATERIALIZED (SELECT {det_cols} FROM moments),
        w AS MATERIALIZED (SELECT {wcols} FROM dets),
        {_probe_confusion_sql(D.DUCK, "w")}
    """


@register("doc_quality_linear_probe", oracle=_probe_oracle(), tags=("extension",))
def doc_quality_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a quality/language probe in-engine — exact least squares
    over three text-shape features — and evaluate it in-engine, the
    fastText-style classifier loop a curation pipeline runs to learn
    its own quality filter from labeled data.

    The 100 TB shape: ONE distributed pass builds the exact-integer
    normal-equation moment row (X^T X upper triangle + X^T y — 14
    associative sums, map-side partials, one-row shuffle), the driver
    solves the 4x4 system by Cramer's rule in constant time with exact
    Python ints (the same Leibniz enumeration the oracle runs in
    hugeint), and ONE more scan scores every document with the learned
    fixed-point weights. No gradient loop, no per-iteration data pass,
    nothing driver-sized but a 14-number row. Output: the learned
    weights (2^20 fixed point) and the training confusion matrix, all
    bigint-exact and bit-identical with the DuckDB oracle."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    row = spark.sql(_probe_moments_sql(D.SPARK)).collect()[0]
    mom = {k: int(row[k]) for k in row.asDict()}

    def tdiv(t: int, v: int, m: int) -> int:
        return (abs(t) * v // m) * (1 if t >= 0 else -1)

    # evaluate the SAME Leibniz expansion the oracle runs, with
    # unbounded Python ints (entries resolve to the moment row)
    xtx = [
        [mom[f"m{min(i, j) + 1}{max(i, j) + 1}"] for j in range(4)]
        for i in range(4)
    ]
    dets = {"da": _det4_int(xtx)}
    for k in range(4):
        rep = [
            [mom[f"b{i + 1}"] if j == k else xtx[i][j] for j in range(4)]
            for i in range(4)
        ]
        dets[f"d{k + 1}"] = _det4_int(rep)
    da = dets["da"]
    if da == 0:
        raise ValueError("singular normal equations: add features or data")
    sgn = 1 if da >= 0 else -1
    w = [tdiv(sgn * dets[f"d{k}"], _PROBE_W, abs(da)) for k in range(1, 5)]
    wsel = (
        f"(SELECT cast({w[0]} as bigint) AS w1, cast({w[1]} as bigint) AS w2, "
        f"cast({w[2]} as bigint) AS w3, cast({w[3]} as bigint) AS w4)"
    )
    return spark.sql(
        f"WITH feat AS ({_probe_feat_sql(D.SPARK)}), "
        + _probe_confusion_sql(D.SPARK, wsel)
    )


# --------------------------------------------------------------------------
# Cross-document repeated-span profile (memorization-risk signal)
# --------------------------------------------------------------------------
_SPAN_K = 5           # tokens per span
_SPAN_FP = 1 << 20    # coverage-fraction fixed point


def _span_positions(dialect: str) -> str:
    """Explode 1-based span start positions 1..n-(K-1), empty-safe:
    Spark's ANSI sequence(1, 0) counts DOWN, so short docs must yield
    an empty array, not [1, 0]."""
    k1 = _SPAN_K - 1
    if dialect == D.SPARK:
        return (
            f"LATERAL VIEW explode(CASE WHEN n >= {_SPAN_K} "
            f"THEN sequence(1, cast(n - {k1} as int)) "
            "ELSE array() END) pos_t AS p"
        )
    return ""  # DuckDB: unnest(range(...)) in the SELECT list instead


def _span_sql(
    dialect: str, tok_rel: str | None = None, occ_rel: str | None = None
) -> str:
    """Per-source profile of text covered by {_SPAN_K}-token spans that
    repeat across DISTINCT documents — the Lee-et-al. repeated-span
    signal: spans shared verbatim between documents are boilerplate or
    near-dup leakage the model will memorize.

    Plan shape at 100 TB: tokenize once per doc (scan-time), explode to
    (doc, start, span-string), ONE span-keyed shuffle finds spans with
    >= 2 distinct docs (the LSH-band join shape — never all-pairs), a
    semi-join back tags repeated occurrences, and covered positions
    dedup per doc. Everything else is per-source partial aggregation.
    All-integer output (coverage fraction at 2^20 fixed point): exact
    at any partitioning."""
    t = _doc_tbl(dialect)
    toks = D.tokens("text", dialect)
    k1 = _SPAN_K - 1
    # Spark has no MATERIALIZED keyword (Catalyst handles CSE itself);
    # DuckDB needs it wherever a CTE is referenced more than once.
    mat = "MATERIALIZED " if dialect == D.DUCK else ""
    span = D.arr_join(D.arr_slice("toks", "p", _SPAN_K, dialect), " ", dialect)
    if dialect == D.SPARK:
        occ = f"""
            SELECT doc_id, p, {span} AS span
            FROM tok {_span_positions(dialect)}
        """
        cov_pos = """
            SELECT DISTINCT o.doc_id, pos
            FROM occ o JOIN rep r ON o.span = r.span
            LATERAL VIEW explode(sequence(o.p, o.p + %d)) cov_t AS pos
        """ % k1
    else:
        occ = f"""
            SELECT doc_id, unnest(range(1, greatest(n - {k1}, 0) + 1)) AS p,
                   toks FROM tok
        """
        # DuckDB can't slice on the unnest alias in the same SELECT;
        # materialize p first, slice in the next CTE
        occ = (
            f"occ0 AS {mat}({occ}), "
            f"occ AS {mat}(SELECT doc_id, p, {span} AS span FROM occ0)"
        )
        cov_pos = f"""
            SELECT DISTINCT o.doc_id, unnest(range(o.p, o.p + {_SPAN_K})) AS pos
            FROM occ o JOIN rep r ON o.span = r.span
        """
    if occ_rel is not None:
        occ_cte = f"occ AS (SELECT * FROM {occ_rel})"
    elif dialect == D.SPARK:
        occ_cte = f"occ AS ({occ})"
    else:
        occ_cte = occ
    tok_body = (
        f"SELECT * FROM {tok_rel}"
        if tok_rel is not None
        else f"""SELECT doc_id, source, toks, {D.arr_size('toks', dialect)} AS n
            FROM (SELECT doc_id, source, {toks} AS toks FROM {t}) raw"""
    )
    return f"""
        WITH tok AS {mat}(
            {tok_body}
        ),
        {occ_cte},
        rep AS {mat}(
            SELECT span FROM occ GROUP BY span
            HAVING count(DISTINCT doc_id) >= 2
        ),
        cov AS (SELECT doc_id, cast(count(*) as bigint) AS covered
                FROM ({cov_pos}) cp GROUP BY doc_id),
        per_doc AS (
            SELECT tok.source, tok.n,
                   coalesce(cov.covered, 0) AS covered
            FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id
        )
        SELECT source,
               cast(count(*) as bigint) AS n_docs,
               cast(sum(n) as bigint) AS tok_total,
               cast(sum(covered) as bigint) AS covered_total,
               cast({D.idiv(f'sum(covered) * {_SPAN_FP}', 'greatest(sum(n), 1)', dialect)}
                    as bigint) AS covered_frac_fp
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """


def _stage_span_rels(spark: SparkSession, scope: str) -> tuple[str, str]:
    """Stage the two span relations both span queries fan out over:
    ``tok`` (per-doc tokens + length; consumed by the occurrence
    explode AND the per-doc report join) and ``occ`` (per-position
    span strings; consumed by the repeated-span aggregation AND the
    coverage/cut join). Unstaged, Spark re-expands each inlined CTE
    into every consumer — the measured plan ran the tokenizer 3x and
    scanned the corpus 6x per query. Both relations are corpus-sized;
    scoped_cache keeps them for exactly one query invocation (the same
    staging policy as the LSH signature tables)."""
    toks = D.tokens("text", D.SPARK)
    tok = scoped_cache(
        spark.sql(
            f"SELECT doc_id, source, toks, {D.arr_size('toks', D.SPARK)} AS n "
            f"FROM (SELECT doc_id, source, {toks} AS toks FROM {SPARK_VIEW}) raw"
        ),
        scope,
    )
    tok.createOrReplaceTempView("__fps_span_tok")
    span = D.arr_join(D.arr_slice("toks", "p", _SPAN_K, D.SPARK), " ", D.SPARK)
    occ = scoped_cache(
        spark.sql(
            f"SELECT doc_id, p, {span} AS span "
            f"FROM __fps_span_tok {_span_positions(D.SPARK)}"
        ),
        scope,
    )
    occ.createOrReplaceTempView("__fps_span_occ")
    return "__fps_span_tok", "__fps_span_occ"


@register("doc_crossdoc_repeated_spans", oracle=_span_sql(D.DUCK), tags=("extension",))
def doc_crossdoc_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source fraction of tokens inside 5-token spans that repeat
    verbatim across distinct documents — the memorization-risk /
    boilerplate signal used to rank sources for aggressive dedup. See
    _span_sql for the scale shape and _stage_span_rels for why the tok
    and occ relations are staged (the DuckDB oracle keeps the
    single-SQL formulation — same values)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    tok_rel, occ_rel = _stage_span_rels(spark, "doc_crossdoc_repeated_spans")
    return spark.sql(_span_sql(D.SPARK, tok_rel=tok_rel, occ_rel=occ_rel))


def _span_dedup_sql(
    dialect: str, tok_rel: str | None = None, occ_rel: str | None = None
) -> str:
    """The repeated-span DEDUP TRANSFORM (not just the metric): for
    every {_SPAN_K}-token span appearing in >= 2 distinct documents,
    the lowest doc_id KEEPS its occurrences and every other document
    CUTS the span's token positions — the Lee-et-al. "deduplicating
    training data" rewrite, reported as before/after token counts per
    source. Deterministic by construction (min-doc keeper, position-set
    union), all-integer output.

    Plan shape: identical to _span_sql's (one span-keyed shuffle, never
    all-pairs) plus a 1-row-per-span keeper argmin folded into the same
    aggregation; the cut-position dedup is per-doc. At 100 TB the
    rewrite itself (re-emitting text minus cut positions) is a per-row
    map over exactly these cut sets."""
    t = _doc_tbl(dialect)
    toks = D.tokens("text", dialect)
    k1 = _SPAN_K - 1
    mat = "MATERIALIZED " if dialect == D.DUCK else ""
    span = D.arr_join(D.arr_slice("toks", "p", _SPAN_K, dialect), " ", dialect)
    if dialect == D.SPARK:
        occ_cte = f"""occ AS (
            SELECT doc_id, p, {span} AS span
            FROM tok {_span_positions(dialect)}
        )"""
        cut_pos = f"""
            SELECT DISTINCT o.doc_id, pos
            FROM occ o JOIN keeper k
              ON o.span = k.span AND o.doc_id != k.keep_doc
            LATERAL VIEW explode(sequence(o.p, o.p + {k1})) cut_t AS pos
        """
    else:
        occ_cte = (
            f"occ0 AS {mat}(SELECT doc_id, "
            f"unnest(range(1, greatest(n - {k1}, 0) + 1)) AS p, toks FROM tok), "
            f"occ AS {mat}(SELECT doc_id, p, {span} AS span FROM occ0)"
        )
        cut_pos = f"""
            SELECT DISTINCT o.doc_id, unnest(range(o.p, o.p + {_SPAN_K})) AS pos
            FROM occ o JOIN keeper k
              ON o.span = k.span AND o.doc_id != k.keep_doc
        """
    if occ_rel is not None:
        occ_cte = f"occ AS (SELECT * FROM {occ_rel})"
    tok_body = (
        f"SELECT * FROM {tok_rel}"
        if tok_rel is not None
        else f"""SELECT doc_id, source, toks, {D.arr_size('toks', dialect)} AS n
            FROM (SELECT doc_id, source, {toks} AS toks FROM {t}) raw"""
    )
    return f"""
        WITH tok AS {mat}(
            {tok_body}
        ),
        {occ_cte},
        keeper AS {mat}(
            SELECT span, min(doc_id) AS keep_doc FROM occ GROUP BY span
            HAVING count(DISTINCT doc_id) >= 2
        ),
        cut AS (SELECT doc_id, cast(count(*) as bigint) AS n_cut
                FROM ({cut_pos}) cp GROUP BY doc_id),
        per_doc AS (
            SELECT tok.source, tok.n, coalesce(cut.n_cut, 0) AS n_cut
            FROM tok LEFT JOIN cut ON tok.doc_id = cut.doc_id
        )
        SELECT source,
               cast(count(*) as bigint) AS n_docs,
               cast(sum(n) as bigint) AS tok_before,
               cast(sum(n - n_cut) as bigint) AS tok_after,
               cast({D.idiv(f'sum(n_cut) * {_SPAN_FP}', 'greatest(sum(n), 1)', dialect)}
                    as bigint) AS cut_frac_fp
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """


@register("doc_span_dedup_rewrite", oracle=_span_dedup_sql(D.DUCK), tags=("extension",))
def doc_span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span dedup as a TRANSFORM: lowest-doc keeps each
    cross-document repeated span, everyone else cuts it — per-source
    before/after token counts (the corpus-shrink report a dedup run
    emits). See _span_dedup_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    tok_rel, occ_rel = _stage_span_rels(spark, "doc_span_dedup_rewrite")
    return spark.sql(_span_dedup_sql(D.SPARK, tok_rel=tok_rel, occ_rel=occ_rel))
