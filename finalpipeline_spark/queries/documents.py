"""Text-analysis and deduplication queries over the documents table.

The training-data-pipeline surface (north star): language-ID heuristic,
quality scoring, token counting, document fingerprinting, exact dedup,
n-gram Jaccard near-dup, MinHash-LSH near-dup, SimHash. Every scalar
kernel is built from the dual-dialect expression builders in
functions/dialect.py so the Spark plan and the DuckDB oracle compute
bit-identical integers — no engine hash() builtins anywhere.

Scale notes: everything here is a single scan plus at most one shuffle
(group-by or bucket self-join). The brute-force n-gram pairwise query
uses size-bucket blocking and exists as the exact baseline; the scale
path for near-dup at 100 TB is doc_dedup_minhash_lsh (band-bucket join
— candidate pairs ∝ collisions, not n²).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.functions.caching import scoped_cache
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

# MinHash family: deterministic coefficients, fixed seed.
_rng = random.Random(20240813)
MINHASH_COEFFS = [
    (_rng.randrange(1, D.HASH_MOD), _rng.randrange(0, D.HASH_MOD)) for _ in range(16)
]
_BANDS = 4
_ROWS_PER_BAND = 4


SPARK_VIEW = "__fps_documents"


def _doc_tbl(dialect: str) -> str:
    """Spark side reads a namespaced temp view so registering it never
    clobbers a `documents` view the host session may already have."""
    return SPARK_VIEW if dialect == D.SPARK else "documents"


def _toks(dialect: str) -> str:
    return D.tokens("text", dialect)


def _stop_arr(dialect: str) -> str:
    vals = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return f"array({vals})" if dialect == D.SPARK else f"[{vals}]"


def _shingles(toks_col: str, dialect: str) -> str:
    """Distinct word-3-gram shingle strings of a token-array *column*.

    Guarded for <3 tokens: Spark's sequence(1, 0) counts *down* and
    ANSI-mode element_at errors out of bounds, so the Spark branch
    wraps the construction in a CASE; DuckDB's range(1, 1) is empty and
    out-of-bounds list indexing yields NULL, so no guard is needed.
    """
    size = D.arr_size(toks_col, dialect)
    if dialect == D.SPARK:
        gram = (
            f"concat_ws(' ', element_at({toks_col}, i), "
            f"element_at({toks_col}, i + 1), element_at({toks_col}, i + 2))"
        )
        body = f"transform(sequence(1, size({toks_col}) - 2), i -> {gram})"
        return (
            f"(CASE WHEN {size} >= 3 THEN {D.arr_distinct(body, dialect)} "
            f"ELSE array() END)"
        )
    gram = f"{toks_col}[i] || ' ' || {toks_col}[i + 1] || ' ' || {toks_col}[i + 2]"
    body = f"list_transform(range(1, greatest({size} - 2, 0) + 1), i -> {gram})"
    return D.arr_distinct(body, dialect)


# --------------------------------------------------------------------------
# Token stats per language
# --------------------------------------------------------------------------
def _token_stats_sql(dialect: str) -> str:
    toks = _toks(dialect)
    return f"""
        SELECT lang,
               count(*) AS n_docs,
               avg({D.arr_size(toks, dialect)}) AS avg_tokens,
               avg(length(text)) AS avg_chars
        FROM {_doc_tbl(dialect)}
        GROUP BY lang
    """


@register("doc_token_stats", oracle=_token_stats_sql(D.DUCK), tags=("extension",))
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace/alnum tokenizer) aggregated per lang."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.expr(D.arr_size(_toks(D.SPARK), D.SPARK))).alias("avg_tokens"),
        F.avg(F.length("text")).alias("avg_chars"),
    )


# --------------------------------------------------------------------------
# Quality scoring per document
# --------------------------------------------------------------------------
def _quality_exprs_on(toks: str, dialect: str) -> dict[str, str]:
    """Quality-stat expressions over an arbitrary token-array source —
    pass a *column name* to evaluate the tokenizer once per row (Spark
    cannot CSE repeated lambda expressions: each inlined copy mints
    fresh lambda-variable IDs, so 10+ structurally-distinct tokenizer
    evaluations per row survive optimization — measured 3× on
    doc_quality_score at sf0.1)."""
    n_tok = D.arr_size(toks, dialect)
    n_uniq = D.arr_size(D.arr_distinct(toks, dialect), dialect)
    contains = "array_contains" if dialect == D.SPARK else "list_contains"
    stops = D.filter_arr(toks, "t", f"{contains}({_stop_arr(dialect)}, t)", dialect)
    n_stop = D.arr_size(stops, dialect)
    return {
        "n_tokens": n_tok,
        "ttr": f"(cast({n_uniq} as double) / cast({n_tok} as double))",
        "stop_ratio": f"(cast({n_stop} as double) / cast({n_tok} as double))",
    }


def _quality_exprs(dialect: str) -> dict[str, str]:
    return _quality_exprs_on(_toks(dialect), dialect)


def _quality_score_on(toks: str, dialect: str) -> str:
    e = _quality_exprs_on(toks, dialect)
    return (
        f"0.4 * least(cast({e['n_tokens']} as double) / 100.0, 1.0)"
        f" + 0.3 * {e['ttr']} + 0.3 * (1.0 - {e['stop_ratio']})"
    )


def _quality_score_expr(dialect: str) -> str:
    """The composite quality score in [0, 1] — shared by
    doc_quality_score and curation.doc_quality_weighted_sample so the
    two can never drift apart."""
    return _quality_score_on(_toks(dialect), dialect)


def _quality_sql(dialect: str) -> str:
    e = _quality_exprs(dialect)
    score = _quality_score_expr(dialect)
    return f"""
        SELECT doc_id,
               {e["n_tokens"]} AS n_tokens,
               {e["ttr"]} AS ttr,
               {e["stop_ratio"]} AS stop_ratio,
               ({score}) AS quality_score
        FROM {_doc_tbl(dialect)}
        WHERE {e["n_tokens"]} > 0
    """


@register("doc_quality_score", oracle=_quality_sql(D.DUCK), tags=("extension", "headline"))
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length saturation, type-token ratio, stopword
    ratio, combined score — all JVM-side expressions, no UDF.

    The tokenizer runs ONCE per row: tokens are staged as a column in
    their own projection (CollapseProject keeps a non-cheap lambda
    alias referenced many times), and the n_tokens > 0 gate is applied
    as the equivalent `text rlike '[A-Za-z0-9]'` — the tokenizer keeps
    a token iff it contains an alphanumeric char, so the predicates
    select identical rows while the rlike form costs one regex probe
    instead of a full tokenize (and never drags a tokenizer copy down
    into the scan-level filter the way a pushed-down size(toks) > 0
    does)."""
    docs = load_table(spark, sf_dir, "documents")
    e = _quality_exprs_on("__toks", D.SPARK)
    score = _quality_score_on("__toks", D.SPARK)
    return (
        docs.filter(F.col("text").rlike("[A-Za-z0-9]"))
        .select("doc_id", F.expr(_toks(D.SPARK)).alias("__toks"))
        .select(
            "doc_id",
            F.expr(e["n_tokens"]).alias("n_tokens"),
            F.expr(e["ttr"]).alias("ttr"),
            F.expr(e["stop_ratio"]).alias("stop_ratio"),
            F.expr(score).alias("quality_score"),
        )
    )


# --------------------------------------------------------------------------
# Language-ID heuristic
# --------------------------------------------------------------------------
def _langid_sql(dialect: str) -> str:
    e = _quality_exprs(dialect)
    return f"""
        SELECT doc_id, lang AS labeled_lang,
               CASE WHEN {e["n_tokens"]} < 5 THEN 'short'
                    WHEN {e["stop_ratio"]} >= 0.08 THEN 'en'
                    ELSE 'other' END AS guessed_lang
        FROM {_doc_tbl(dialect)}
    """


@register("doc_langid", oracle=_langid_sql(D.DUCK), tags=("extension",))
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic: classify by function-word
    density (a real system swaps in per-language marker sets)."""
    docs = load_table(spark, sf_dir, "documents")
    e = _quality_exprs_on("__toks", D.SPARK)
    return docs.select(
        "doc_id", "lang", F.expr(_toks(D.SPARK)).alias("__toks")
    ).select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.expr(
            f"CASE WHEN {e['n_tokens']} < 5 THEN 'short' "
            f"WHEN {e['stop_ratio']} >= 0.08 THEN 'en' ELSE 'other' END"
        ).alias("guessed_lang"),
    )


# --------------------------------------------------------------------------
# Document fingerprint (position-weighted rolling-style hash)
# --------------------------------------------------------------------------
def _fingerprint_sql(dialect: str) -> str:
    fp = D.char_positional_hash("text", dialect)
    return f"""
        SELECT doc_id, ({fp}) % 9007199254740881 AS fingerprint
        FROM {_doc_tbl(dialect)}
    """


@register("doc_fingerprint", oracle=_fingerprint_sql(D.DUCK), tags=("extension",))
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 64-bit document fingerprint (position-weighted char
    hash) — the cheap first-pass identity for exact dedup at scale."""
    docs = load_table(spark, sf_dir, "documents")
    fp = D.char_positional_hash("text", D.SPARK)
    return docs.select(
        "doc_id", F.expr(f"({fp}) % 9007199254740881").alias("fingerprint")
    )


# --------------------------------------------------------------------------
# BPE-ish regex token counting
# --------------------------------------------------------------------------
_BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def _bpe_sql(dialect: str) -> str:
    if dialect == D.SPARK:
        toks = f"regexp_extract_all(text, '({_BPE_PATTERN})', 0)"
    else:
        toks = f"regexp_extract_all(text, '{_BPE_PATTERN}')"
    n = D.arr_size(toks, dialect)
    return f"""
        SELECT doc_id, {n} AS n_bpe_tokens,
               length(text) AS n_chars_actual
        FROM {_doc_tbl(dialect)}
    """


@register("doc_bpe_token_count", oracle=_bpe_sql(D.DUCK), tags=("extension",))
def doc_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: letter runs, single digits, and single
    punctuation marks — the pre-tokenizer split a byte-pair encoder
    applies before merges (count ≈ upper bound on BPE tokens). Pure
    regexp, JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(D.arr_size(f"regexp_extract_all(text, '({_BPE_PATTERN})', 0)", D.SPARK)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


# --------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# --------------------------------------------------------------------------
@register(
    "doc_dedup_exact",
    oracle="""
        SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    tags=("extension",),
)
def doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, deterministic canonical
    representative (min id). At 100 TB: group on md5, never on raw text
    (shuffle carries 32 bytes/row instead of the document)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# N-gram Jaccard near-dup (exact baseline, size-bucket blocking)
# --------------------------------------------------------------------------
def _ngram_pairs_sql(dialect: str) -> str:
    jac = D.jaccard("a.shingles", "b.shingles", dialect)
    hashed = D.transform_arr("toks", "t", D.token_hash("t", dialect), dialect)
    intdiv = "div" if dialect == D.SPARK else "//"
    return f"""
        WITH toks AS (
            SELECT doc_id, {_toks(dialect)} AS toks FROM {_doc_tbl(dialect)}
        ),
        hs AS (
            SELECT doc_id, {hashed} AS hs0
            FROM toks WHERE {D.arr_size("toks", dialect)} >= 5
        ),
        d AS (
            SELECT doc_id, shingles,
                   {D.arr_size("shingles", dialect)} {intdiv} 5 AS blk
            FROM (
                SELECT doc_id,
                       {D.arr_distinct(D.shingle_hashes("hs0", dialect), dialect)}
                           AS shingles
                FROM hs
            ) s
        )
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               {jac} AS jaccard
        FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE {jac} >= 0.2
    """


def _ngram_blocked_df(spark: SparkSession, sf_dir: str, scope: str) -> DataFrame:
    """Staged (doc_id, shingles, blk) relation of _ngram_pairs_sql's `d`
    CTE — cached, because the self-join consumes it on BOTH sides.
    Inlined as a CTE, Catalyst re-expands the tokenize→hash→shingle
    chain into each join side and the pushed-down jaccard/blk filters
    (measured 18 s vs 0.9 s staged at sf0.01).  Expressions are
    byte-identical to the oracle SQL; only the physical staging
    differs."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(par, "doc_id")
    hashed = D.transform_arr("toks", "t", D.token_hash("t", D.SPARK), D.SPARK)
    d = (
        docs.select("doc_id", F.expr(_toks(D.SPARK)).alias("toks"))
        .filter(F.expr(D.arr_size("toks", D.SPARK)) >= 5)
        .select("doc_id", F.expr(hashed).alias("hs0"))
        .select(
            "doc_id",
            F.expr(
                D.arr_distinct(D.shingle_hashes("hs0", D.SPARK), D.SPARK)
            ).alias("shingles"),
        )
        .select(
            "doc_id",
            "shingles",
            F.expr(f"{D.arr_size('shingles', D.SPARK)} div 5").alias("blk"),
        )
    )
    return scoped_cache(d, scope)


def _ngram_pairs_df(spark: SparkSession, sf_dir: str, scope: str) -> DataFrame:
    """doc_dedup_ngram_jaccard's plan against a caller-chosen cache
    scope (doc_dedup_lsh_recall shares one scope across both of its
    inputs so neither cache is evicted before use)."""
    d = _ngram_blocked_df(spark, sf_dir, scope)
    a, b = d.alias("a"), d.alias("b")
    jac = D.jaccard("a.shingles", "b.shingles", D.SPARK)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.expr(jac).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


@register("doc_dedup_ngram_jaccard", oracle=_ngram_pairs_sql(D.DUCK), tags=("extension",))
def doc_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (word-3-gram) Jaccard near-dup pairs, size-bucket blocked.

    Jaccard runs over integer shingle hashes (set semantics preserved
    up to ~1e-6 collision odds; int intersects are ~10× cheaper than
    string-array intersects). Exact-shape baseline for near-dup
    detection; quadratic within a bucket, so the 100 TB path is
    doc_dedup_minhash_lsh — this stays the verification oracle for
    samples.

    The Spark side stages the per-doc blocked-shingle relation once
    (cached; see _ngram_blocked_df) and self-joins the staged frame;
    the DuckDB oracle keeps the single-SQL formulation.
    """
    return _ngram_pairs_df(spark, sf_dir, "doc_dedup_ngram_jaccard")


# --------------------------------------------------------------------------
# MinHash + LSH near-dup (the scale path)
# --------------------------------------------------------------------------
def _band_key(dialect: str, band: int) -> str:
    """Concatenated band slice of the signature (4 rows/band)."""
    lo = band * _ROWS_PER_BAND + 1
    parts = [
        f"cast({D.arr_index('sig', str(i), dialect)} as string)"
        if dialect == D.SPARK
        else f"{D.arr_index('sig', str(i), dialect)}::varchar"
        for i in range(lo, lo + _ROWS_PER_BAND)
    ]
    sep = " || '_' || "
    return "(" + sep.join(parts) + ")"


def minhash_base(docs: DataFrame) -> DataFrame:
    """Per-doc MinHash state from a (doc_id, text) frame: signature
    array (for banding) + distinct shingle-hash set (for exact Jaccard
    verification). One narrow pass; callers cache — it is the shared
    asset of every LSH consumer (batch pairing, incremental dedup,
    contamination)."""
    toks_df = docs.select(
        "doc_id", F.expr(_toks(D.SPARK)).alias("toks")
    ).filter(F.expr(f"{D.arr_size('toks', D.SPARK)} >= 3"))
    hashed = D.transform_arr("toks", "t", D.token_hash("t", D.SPARK), D.SPARK)
    return (
        toks_df.withColumn("hs", F.expr(hashed))
        .withColumn("shs", F.expr(D.shingle_hashes("hs", D.SPARK)))
        .withColumn("sig", F.expr(D.minhash_sig_ints("shs", MINHASH_COEFFS, D.SPARK)))
        .withColumn("shingles", F.expr(_shingles("toks", D.SPARK)))
        .select("doc_id", "sig", "shingles")
    )


def minhash_bands(base: DataFrame) -> DataFrame:
    """(doc_id, band, key) rows — the LSH bucket index of a base frame."""
    band_structs = ", ".join(
        f"struct({b} AS band, {_band_key(D.SPARK, b)} AS key)" for b in range(_BANDS)
    )
    return base.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")


def _lsh_pairs_sql(dialect: str) -> str:
    sh = _shingles("toks", dialect)
    jac = D.jaccard("sa.shingles", "sb.shingles", dialect)
    hashed = D.transform_arr("toks", "t", D.token_hash("t", dialect), dialect)
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, {_band_key(dialect, b)} AS key FROM sigs"
        for b in range(_BANDS)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {_toks(dialect)} AS toks FROM {_doc_tbl(dialect)}
        ),
        hs AS (
            SELECT doc_id, toks, {hashed} AS hs
            FROM toks WHERE {D.arr_size("toks", dialect)} >= 3
        ),
        shs AS (
            SELECT doc_id, {D.shingle_hashes("hs", dialect)} AS shs FROM hs
        ),
        sigs AS (
            SELECT doc_id, {D.minhash_sig_ints("shs", MINHASH_COEFFS, dialect)} AS sig
            FROM shs
        ),
        bands AS ({band_rows}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        sh AS (SELECT doc_id, {sh} AS shingles FROM toks)
        SELECT c.doc_id_a, c.doc_id_b, {jac} AS jaccard
        FROM cand c
        JOIN sh sa ON c.doc_id_a = sa.doc_id
        JOIN sh sb ON c.doc_id_b = sb.doc_id
        WHERE {jac} >= 0.2
    """


@register("doc_dedup_minhash_lsh", oracle=_lsh_pairs_sql(D.DUCK), tags=("extension", "headline"))
def doc_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) near-dup candidates, verified
    with exact shingle Jaccard.

    The 100 TB design: signatures are one scan; the band self-join
    shuffles only (band, key) buckets, so candidate pairs scale with
    collisions, not n². Skewed buckets (boilerplate docs) are handled
    by AQE skew-join; pathological buckets can be capped by count.

    The Spark plan stages the per-doc (hashed tokens → signature,
    shingles) table and caches it: it is referenced four times (two
    band-join sides, two verification joins), and recomputing the
    char-level hashing per reference dominated the runtime (~90s → ~3s
    at sf0.1). The DuckDB oracle keeps the single-SQL formulation —
    same values, different physical staging.
    """
    return _minhash_lsh_pairs_df(spark, sf_dir, "doc_dedup_minhash_lsh")


def _minhash_lsh_pairs_df(spark: SparkSession, sf_dir: str, scope: str) -> DataFrame:
    """doc_dedup_minhash_lsh's plan against a caller-chosen cache scope
    (doc_dedup_lsh_recall shares one scope across both of its inputs)."""
    # Repartition BEFORE the hashing chain: the single source file is
    # one partition, which would put all signature computation on one
    # task; the exchange is cheap (doc_id + raw text).  Hash on doc_id
    # rather than round-robin — same parallelism, no local
    # sort-before-exchange (round-robin pays one for determinism).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    base = scoped_cache(minhash_base(docs), scope)
    bands = minhash_bands(base)
    a, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )
    sa = base.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a"))
    sb = base.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b"))
    jac = F.expr(D.jaccard("sh_a", "sh_b", D.SPARK))
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# Containment near-dup (asymmetric: subset/excerpt detection)
# --------------------------------------------------------------------------
_CONTAINMENT_MIN = 0.6


def _containment_pairs_sql(dialect: str) -> str:
    """LSH candidates re-scored by CONTAINMENT in both directions:
    C(A,B) = |A∩B|/|A| stays high when one doc is an excerpt or
    truncated copy of the other, which symmetric Jaccard dilutes
    toward |A|/|B| — the standard second pass of a production dedup
    (containment catches quote-inclusion dups the Jaccard gate at 0.2
    can miss entirely once the size ratio passes ~5×). Same banded
    candidate generator as doc_dedup_minhash_lsh (bucket-bounded, not
    n²); kept if EITHER direction clears {_CONTAINMENT_MIN}."""
    hashed = D.transform_arr("toks", "t", D.token_hash("t", dialect), dialect)
    sh = _shingles("toks", dialect)
    c_ab = D.containment("sa.shingles", "sb.shingles", dialect)
    c_ba = D.containment("sb.shingles", "sa.shingles", dialect)
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, {_band_key(dialect, b)} AS key FROM sigs"
        for b in range(_BANDS)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {_toks(dialect)} AS toks FROM {_doc_tbl(dialect)}
        ),
        hs AS (
            SELECT doc_id, toks, {hashed} AS hs
            FROM toks WHERE {D.arr_size("toks", dialect)} >= 3
        ),
        shs AS (
            SELECT doc_id, {D.shingle_hashes("hs", dialect)} AS shs FROM hs
        ),
        sigs AS (
            SELECT doc_id, {D.minhash_sig_ints("shs", MINHASH_COEFFS, dialect)} AS sig
            FROM shs
        ),
        bands AS ({band_rows}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        sh AS (SELECT doc_id, {sh} AS shingles FROM toks)
        SELECT c.doc_id_a, c.doc_id_b,
               {c_ab} AS containment_ab, {c_ba} AS containment_ba
        FROM cand c
        JOIN sh sa ON c.doc_id_a = sa.doc_id
        JOIN sh sb ON c.doc_id_b = sb.doc_id
        WHERE {c_ab} >= {_CONTAINMENT_MIN} OR {c_ba} >= {_CONTAINMENT_MIN}
    """


@register(
    "doc_dedup_containment",
    oracle=_containment_pairs_sql(D.DUCK),
    tags=("extension",),
)
def doc_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pass: banded LSH candidates re-scored by
    directional containment |A∩B|/|A| — excerpt/truncation dups that
    symmetric Jaccard misses. Shares the staged signature/shingle cache
    design of doc_dedup_minhash_lsh. See _containment_pairs_sql."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    base = scoped_cache(minhash_base(docs), "doc_dedup_containment")
    bands = minhash_bands(base)
    a, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )
    sa = base.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a"))
    sb = base.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b"))
    c_ab = F.expr(D.containment("sh_a", "sh_b", D.SPARK))
    c_ba = F.expr(D.containment("sh_b", "sh_a", D.SPARK))
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn("containment_ab", c_ab)
        .withColumn("containment_ba", c_ba)
        .filter(
            (F.col("containment_ab") >= _CONTAINMENT_MIN)
            | (F.col("containment_ba") >= _CONTAINMENT_MIN)
        )
        .select("doc_id_a", "doc_id_b", "containment_ab", "containment_ba")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
_SIMHASH_BITS = 60


def _spread60(s: str) -> str:
    """Spread a ~20-bit shingle hash over 60 bits as three independent
    20-bit lanes (all intermediates < 2^61; identical in both
    dialects). A single multiply can't fill the high bits without
    overflowing, and low-entropy high bits collapse the banded search.
    """
    return (
        f"((({s} * 48271) % 1048573)"
        f" + (({s} * 69621) % 1048573) * 1048576"
        f" + (({s} * 16807) % 1048573) * 1099511627776)"
    )


def _simhash_sql(dialect: str) -> str:
    # SimHash over 3-gram shingle hashes, NOT single tokens: the
    # synthetic docs draw from a tiny vocabulary, so token-level
    # signatures are near-identical across documents (the same
    # degeneracy that broke token-level MinHash) — shingles restore
    # the entropy that makes hamming distance meaningful.
    hashed = D.transform_arr("toks", "t", D.token_hash("t", dialect), dialect)
    hs = D.transform_arr(
        D.arr_distinct("shs_raw", dialect), "s", _spread60("s"), dialect
    )
    if dialect == D.SPARK:
        bit = "(shiftright(h, b) % 2)"
        bitsum = f"aggregate(hs, cast(0 as bigint), (acc, h) -> acc + (CASE WHEN {bit} = 1 THEN 1 ELSE -1 END))"
        simhash = (
            f"aggregate(sequence(0, {_SIMHASH_BITS - 1}), cast(0 as bigint), "
            f"(acc2, b) -> acc2 + (CASE WHEN {bitsum} >= 0 THEN shiftleft(cast(1 as bigint), b) ELSE 0 END))"
        )
    else:
        bit = "((h >> b) & 1)"
        bitsum = (
            f"cast(list_sum(list_transform(hs, h -> CASE WHEN {bit} = 1 THEN 1 ELSE -1 END)) as bigint)"
        )
        simhash = (
            f"cast(list_sum(list_transform(range(0, {_SIMHASH_BITS}), "
            f"b -> CASE WHEN {bitsum} >= 0 THEN (1::bigint << b) ELSE 0::bigint END)) as bigint)"
        )
    return f"""
        SELECT doc_id, {simhash} AS simhash
        FROM (
            SELECT doc_id, {hs} AS hs
            FROM (
                SELECT doc_id, {D.shingle_hashes("hs0", dialect)} AS shs_raw
                FROM (
                    SELECT doc_id, {hashed} AS hs0
                    FROM (SELECT doc_id, {_toks(dialect)} AS toks
                          FROM {_doc_tbl(dialect)}) tk
                    WHERE {D.arr_size("toks", dialect)} >= 3
                ) h0
            ) sr
        ) t
    """


def _simhash_spark_df(spark: SparkSession) -> DataFrame:
    """The Spark-side simhash computation as explode + codegen aggregate.

    The single-SQL form (kept verbatim as the DuckDB oracle) evaluates a
    nested higher-order ``aggregate`` — 60 interpreted passes over the
    shingle-hash array per row (HOF lambdas block whole-stage codegen).
    Here the distinct shingle hashes are exploded once, each paired with
    the 60 bit positions, and the per-(doc, bit) one-count ``s`` plus
    row count ``n`` come out of ONE codegen'd hash aggregate with
    map-side combine; the ±1 vote sum is ``2·s − n``, so the sign test
    is ``2·s >= n`` and the signature is a second per-doc aggregate
    summing ``1 << b`` for the set bits. Every step is exact int64
    arithmetic, so the result is bit-identical to the oracle's fold
    (verified by the oracle check). Per-invocation cost ~0.5 s vs ~1.2 s
    for the interpreted fold at sf0.01; the shuffle carries 60 compact
    partial-vote rows per document (constant per doc), never raw
    shingles.

    A deliberately WIDE alternative (60 ``sum(CASE)`` columns in one
    aggregate) measured 1.6–2.0 s per invocation — the generated code
    for the 60-column aggregate recompiles on every fresh plan and
    dwarfs the query itself; the narrow two-stage form keeps codegen
    small and cache-friendly.

    Docs with < 3 tokens have an empty shingle array and fall out of
    the explode — exactly the rows the oracle's WHERE excludes
    (>= 3 tokens ⇒ >= 1 shingle).
    """
    hashed = D.transform_arr("toks", "t", D.token_hash("t", D.SPARK), D.SPARK)
    hs = D.transform_arr(
        D.arr_distinct(D.shingle_hashes("hs0", D.SPARK), D.SPARK),
        "s",
        _spread60("s"),
        D.SPARK,
    )
    staged = (
        spark.table(SPARK_VIEW)
        .select("doc_id", F.expr(_toks(D.SPARK)).alias("toks"))
        .select("doc_id", F.expr(hashed).alias("hs0"))
        .select("doc_id", F.expr(hs).alias("hs"))
    )
    bits = staged.select("doc_id", F.explode("hs").alias("h")).select(
        "doc_id", F.expr(f"explode(sequence(0, {_SIMHASH_BITS - 1}))").alias("b"), "h"
    )
    per_bit = bits.groupBy("doc_id", "b").agg(
        F.sum(F.expr("shiftright(h, b) & 1")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(
                2 * F.col("s") >= F.col("n"),
                F.expr("shiftleft(cast(1 as bigint), b)"),
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("simhash")
    )


@register("doc_simhash", oracle=_simhash_sql(D.DUCK), tags=("extension",))
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (sign of per-bit vote over distinct
    shingle hashes). Near-dup = small hamming distance; pairing is done
    downstream by banding the simhash like any LSH key. See
    _simhash_spark_df for the codegen-aggregate formulation (the DuckDB
    oracle keeps the single-SQL nested-fold form — same values)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return _simhash_spark_df(spark)


# --------------------------------------------------------------------------
# SimHash near-dup pairing (banded hamming search)
# --------------------------------------------------------------------------
_SIMHASH_CHUNKS = 4  # 60 bits → 4 chunks; hamming<=3 ⇒ one chunk equal
_HAMMING_MAX = 3  # pigeonhole-exact at 4 chunks: recall is 100%


def _simhash_pairs_sql(dialect: str, sims_rel: str | None = None) -> str:
    """Banded hamming pairing over a `sims(doc_id, simhash)` relation.

    `sims_rel` names a pre-staged relation (Spark temp view over a
    cached signature DataFrame); when None the simhash SQL is inlined
    as a CTE (the DuckDB oracle — DuckDB materializes CTEs once, but
    Spark would recompute the inlined CTE per chunk per join side,
    ~8× the signature cost).
    """
    # Chunk boundaries over the 60-bit simhash: 4 × 15 bits.
    bounds = [(0, 15), (15, 15), (30, 15), (45, 15)]
    sims = sims_rel or "sims"
    chunk_rows = []
    for ci, (lo, width) in enumerate(bounds):
        mask = (1 << width) - 1
        if dialect == D.SPARK:
            ch = f"(shiftright(simhash, {lo}) & {mask})"
        else:
            ch = f"((simhash >> {lo}) & {mask})"
        chunk_rows.append(
            f"SELECT doc_id, simhash, {ci} AS chunk_id, {ch} AS chunk_val FROM {sims}"
        )
    chunks = "\nUNION ALL\n".join(chunk_rows)
    if dialect == D.SPARK:
        ham = "bit_count(a.simhash ^ b.simhash)"
    else:
        ham = "bit_count(xor(a.simhash, b.simhash))::int"
    with_sims = "" if sims_rel else f"sims AS ({_simhash_sql(dialect)}),\n        "
    return f"""
        WITH {with_sims}chunks AS ({chunks}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_id_a, a.simhash AS sim_a,
                            b.doc_id AS doc_id_b, b.simhash AS sim_b
            FROM chunks a JOIN chunks b
              ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
             AND a.doc_id < b.doc_id
        )
        SELECT doc_id_a, doc_id_b,
               {ham.replace("a.simhash", "sim_a").replace("b.simhash", "sim_b")} AS hamming
        FROM cand
        WHERE {ham.replace("a.simhash", "sim_a").replace("b.simhash", "sim_b")} <= {_HAMMING_MAX}
    """


@register("doc_simhash_near_dup", oracle=_simhash_pairs_sql(D.DUCK), tags=("extension",))
def doc_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup search: band the 60-bit hash into 4 chunks
    (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal, so recall at
    the ≤ 3 threshold is exact), candidate pairs from chunk-equality
    collisions, verified by popcount(xor). The chunk value is the
    shuffle key — same LSH shape as MinHash banding.

    The per-doc signature table is staged and cached before the
    self-join (the pairing references it 8× once the chunk UNION is
    inlined on both join sides — same staging lesson as
    doc_dedup_minhash_lsh); the DuckDB oracle keeps the single-SQL
    formulation."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).createOrReplaceTempView(SPARK_VIEW)
    sims = scoped_cache(_simhash_spark_df(spark), "doc_simhash_near_dup")
    sims.createOrReplaceTempView("__fps_simhash_sims")
    return spark.sql(_simhash_pairs_sql(D.SPARK, sims_rel="__fps_simhash_sims"))


# --------------------------------------------------------------------------
# Corpus curation funnel (the end-to-end training-data pipeline shape)
# --------------------------------------------------------------------------
_CURATION_MIN_TOKENS = 5
_CURATION_MIN_QUALITY = 0.6


def _curation_sql(dialect: str) -> str:
    """Filter → score → exact-dedup → language gate → corpus stats,
    in ONE declarative plan: a single scan computes tokens/quality/
    language/fingerprint, one window shuffle (on the fingerprint) picks
    the canonical copy per content class, and one final aggregation
    emits per-language corpus statistics. This is the whole
    pretraining-data curation funnel at its 100 TB shape — no
    intermediate materialization, no second scan.
    """
    # Tokenize ONCE into a column, then derive every signal from it —
    # the naive form re-ran the tokenizer regex per expression (Catalyst
    # does not CSE across independent aggregate-input expressions).
    n_tok = D.arr_size("toks", dialect)
    n_uniq = D.arr_size(D.arr_distinct("toks", dialect), dialect)
    contains = "array_contains" if dialect == D.SPARK else "list_contains"
    n_stop = D.arr_size(
        D.filter_arr("toks", "t", f"{contains}({_stop_arr(dialect)}, t)", dialect),
        dialect,
    )
    ttr = f"(cast({n_uniq} as double) / cast({n_tok} as double))"
    stop_ratio = f"(cast({n_stop} as double) / cast({n_tok} as double))"
    score = (
        f"0.4 * least(cast({n_tok} as double) / 100.0, 1.0)"
        f" + 0.3 * {ttr} + 0.3 * (1.0 - {stop_ratio})"
    )
    fp = D.char_positional_hash("text", dialect)
    guess = (
        f"CASE WHEN {n_tok} < {_CURATION_MIN_TOKENS} THEN 'short' "
        f"WHEN {stop_ratio} >= 0.08 THEN 'en' ELSE 'other' END"
    )
    # Spark: the min-length gate as an anchored regex on the RAW text —
    # exactly ⟺ size(toks) >= MIN (tokens are the maximal [A-Za-z0-9]+
    # runs; lowercasing never changes run boundaries; verified
    # mismatch-free over every testdata SF). A size(toks) predicate
    # would be pushed through the toks projection into the scan filter
    # and re-run the whole tokenizer chain per scanned row (the known
    # re-inline disease); the regex gate costs one cheap anchored scan
    # at the parquet reader and lets the projected toks be the ONLY
    # tokenizer evaluation. DuckDB keeps the literal size() form.
    if dialect == D.SPARK:
        gate = (
            "text rlike "
            f"'^(?:[^A-Za-z0-9]*[A-Za-z0-9]+){{{_CURATION_MIN_TOKENS}}}'"
        )
    else:
        gate = f"{n_tok} >= {_CURATION_MIN_TOKENS}"
    return f"""
        WITH tok AS (
            SELECT doc_id, lang, text, {_toks(dialect)} AS toks
            FROM {_doc_tbl(dialect)}
        ),
        scored AS (
            SELECT doc_id, lang,
                   {n_tok} AS n_tokens,
                   ({score}) AS quality_score,
                   {guess} AS guessed_lang,
                   ({fp}) % 9007199254740881 AS fingerprint
            FROM tok
            WHERE {gate}
        ),
        canon AS (
            SELECT *, row_number() OVER (
                PARTITION BY fingerprint ORDER BY doc_id) AS rn
            FROM scored
        ),
        kept AS (
            SELECT * FROM canon
            WHERE rn = 1 AND quality_score >= {_CURATION_MIN_QUALITY}
        )
        SELECT lang, guessed_lang,
               count(*) AS n_docs,
               cast(sum(n_tokens) as bigint) AS total_tokens,
               round(avg(quality_score), 6) AS avg_quality
        FROM kept
        GROUP BY lang, guessed_lang
    """


@register("doc_corpus_curation", oracle=_curation_sql(D.DUCK), tags=("extension", "headline"))
def doc_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation funnel end to end (see _curation_sql):
    min-length gate, quality scoring, exact dedup with a deterministic
    canonical pick, language identification, and per-language token
    accounting — one scan, one window shuffle, one aggregation."""
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    ).createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_curation_sql(D.SPARK))


# --------------------------------------------------------------------------
# TF-IDF top terms (explode / lateral-view family)
# --------------------------------------------------------------------------
def _tfidf_oracle_sql() -> str:
    toks = _toks(D.DUCK)
    score = "(tf.tf::double) * ((n.n_docs::double) / (df.df::double))"
    return f"""
        WITH tok AS (SELECT doc_id, {toks} AS toks FROM documents),
        t AS (SELECT doc_id, unnest(toks) AS term FROM tok WHERE len(toks) > 0),
        tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM t GROUP BY doc_id, term),
        df AS (SELECT term, count(*)::bigint AS df FROM tf GROUP BY term),
        n AS (SELECT count(*)::bigint AS n_docs FROM tok WHERE len(toks) > 0)
        SELECT doc_id, term, tf, tfidf, rank FROM (
            SELECT tf.doc_id, tf.term, tf.tf, {score} AS tfidf,
                   (row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY {score} DESC, tf.term))::int AS rank
            FROM tf JOIN df USING (term) CROSS JOIN n
        ) ranked
        WHERE rank <= 3
    """


@register("doc_tfidf_topterms", oracle=_tfidf_oracle_sql(), tags=("extension", "headline"))
def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 salient terms by TF-IDF over the exploded
    token stream (the lateral-view / flatten operator family).

    IDF is the *rational* variant N/df, not ln(N/df): ln() is not
    guaranteed correctly-rounded on either engine, while one IEEE
    division + one multiply is bit-identical by construction (same
    dual-dialect discipline as everywhere else; the ranking is what
    matters and df-monotonicity is preserved).

    Scale shape: explode → partial-agg groupBy(doc_id, term) is the
    only wide shuffle over the token stream; the document-frequency
    table is vocabulary-sized and broadcast; the corpus count is a
    single-row broadcast cross join (no driver collect); the top-k is
    a doc_id-partitioned window over the already-aggregated tf table.
    The tf table is cached because both the df aggregation and the
    final join consume it.
    """
    # Hash-repartition by doc_id (not round-robin): parallelizes the
    # single-file scan WITHOUT round-robin's local sort-before-exchange,
    # and — because HashPartitioning(doc_id) satisfies the clustered
    # distribution of BOTH the (doc_id, term) aggregation and the
    # doc_id window below — the whole tf→rank chain runs on this one
    # exchange (plan: 3 exchanges on the tf path → 1).  The rlike gate
    # is equivalent to size(toks) > 0 (a token exists iff an alnum char
    # exists) and keeps a pushed-down tokenizer copy out of the scan.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    toks = docs.filter(F.col("text").rlike("[A-Za-z0-9]")).select(
        "doc_id", F.expr(_toks(D.SPARK)).alias("toks")
    )
    tf = scoped_cache(
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf")),
        "doc_tfidf_topterms",
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # Corpus size from the cached tf table (docs with >=1 token appear
    # there by construction) — deriving it from `toks` would rescan the
    # parquet and re-run the tokenizer.
    n = tf.agg(F.count_distinct("doc_id").alias("n_docs"))
    score = F.col("tf").cast("double") * (
        F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(n))
        .withColumn("tfidf", score)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


# --------------------------------------------------------------------------
# Deterministic train/valid/test split + hash sampling
# --------------------------------------------------------------------------
def _split_sql(dialect: str) -> str:
    # Mix through a large prime BEFORE the small-space mod, else doc_ids
    # congruent mod 1000 collide structurally (same lesson as the
    # synthetic fingerprints).
    h = f"(((doc_id * {D.MULT}) % {D.HASH_MOD}) % 1000)"
    h2 = f"(((doc_id * 48271) % {D.HASH_MOD}) % 10)"
    cast_int = "cast({x} as int)" if dialect == D.SPARK else "({x})::int"
    return f"""
        SELECT doc_id, lang,
               {cast_int.format(x=h)} AS bucket,
               CASE WHEN {h} < 800 THEN 'train'
                    WHEN {h} < 900 THEN 'valid'
                    ELSE 'test' END AS split,
               ({h2} = 0) AS in_10pct_sample
        FROM {_doc_tbl(dialect)}
    """


@register("doc_train_test_split", oracle=_split_sql(D.DUCK), tags=("extension",))
def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment plus an
    independent 10% sampling flag, both pure integer-hash functions of
    doc_id (second hash uses a different multiplier lane so the sample
    is independent of the split).

    This is the scale-correct way to split/sample a 100 TB corpus:
    content-addressed, reproducible across runs and engines, no
    shuffle, no RNG state, embarrassingly parallel, and stable under
    re-partitioning — unlike df.sample()/rand(), which are
    partition-order-dependent. Stratification falls out for free
    because the hash is uniform within every stratum."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_split_sql(D.SPARK))


# --------------------------------------------------------------------------
# Fixed-size per-stratum sample (deterministic "5 docs per language")
# --------------------------------------------------------------------------
_SAMPLE_PER_STRATUM = 5


def _sample_per_lang_sql(dialect: str) -> str:
    h = f"((doc_id * {D.MULT}) % {D.HASH_MOD})"
    rn_cast = "cast(rn as int)" if dialect == D.SPARK else "rn::int"
    return f"""
        SELECT doc_id, lang, {rn_cast} AS rn
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY {h}, doc_id) AS rn
            FROM {_doc_tbl(dialect)}
        ) t
        WHERE rn <= {_SAMPLE_PER_STRATUM}
    """


@register("doc_sample_per_lang", oracle=_sample_per_lang_sql(D.DUCK), tags=("extension",))
def doc_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per stratum (5 docs/language):
    rank by an integer hash of the id inside each stratum — an
    unbiased, reproducible draw with an exact per-group size, which
    fraction-based sampling can't guarantee. This is how eval/debug
    subsets get carved out of a 100 TB corpus: the window shuffles by
    stratum once, and Spark's WindowGroupLimit caps each group before
    the exchange."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_sample_per_lang_sql(D.SPARK))


# --------------------------------------------------------------------------
# Corpus vocabulary: top n-grams by document frequency
# --------------------------------------------------------------------------
_TOP_NGRAMS_K = 20


def _top_ngrams_sql(dialect: str) -> str:
    sh = _shingles("toks", dialect)
    unnest = "explode(shingles)" if dialect == D.SPARK else "unnest(shingles)"
    return f"""
        SELECT shingle, count(*) AS n_docs
        FROM (
            SELECT {unnest} AS shingle
            FROM (SELECT {sh} AS shingles
                  FROM (SELECT {_toks(dialect)} AS toks
                        FROM {_doc_tbl(dialect)}) t) s
        ) x
        GROUP BY shingle
        ORDER BY n_docs DESC, shingle
        LIMIT {_TOP_NGRAMS_K}
    """


@register("doc_top_ngrams", oracle=_top_ngrams_sql(D.DUCK), tags=("extension",))
def doc_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-{k} word-3-grams by document frequency — the
    vocabulary-building scan behind BPE/tokenizer training and
    boilerplate detection. Shingles are per-doc distinct, so the count
    is document frequency, not raw occurrences.

    Shape: one scan → explode → count per shingle (one shuffle with
    map-side partial aggregation) → global top-k, which Spark executes
    as TakeOrderedAndProject (per-partition heaps, no full sort). The
    deterministic tie-break (count desc, shingle asc) makes the
    boundary cut engine-stable.

    The per-doc shingle array is STAGED (cached) before the explode:
    without a materialization barrier, InferFiltersFromGenerate copies
    the tokenize→shingle chain into an added size(..)>0 filter that
    pushdown drags into the scan — 11 tokenizer evaluations per row
    (~8 s vs ~0.5 s at sf0.01 on a session without the rule excluded;
    the tuned session also excludes the rule, but the staging keeps the
    query fast under ANY consumer's session conf). The DuckDB oracle
    keeps the single-SQL formulation — same values."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    staged = scoped_cache(
        docs.select(F.expr(_toks(D.SPARK)).alias("toks")).select(
            F.expr(_shingles("toks", D.SPARK)).alias("shingles")
        ),
        "doc_top_ngrams",
    )
    return (
        staged.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "shingle")
        .limit(_TOP_NGRAMS_K)
    )


# --------------------------------------------------------------------------
# Train/eval contamination detection (decontamination)
# --------------------------------------------------------------------------
def _split_of(doc_id_col: str) -> str:
    """train/eval label from the same hash as doc_train_test_split
    (valid+test together form the eval side — contamination of either
    invalidates the eval)."""
    return (
        f"(CASE WHEN ((({doc_id_col} * {D.MULT}) % {D.HASH_MOD}) % 1000) < 800 "
        f"THEN 'train' ELSE 'eval' END)"
    )


def _contamination_sql() -> str:
    return f"""
        WITH pairs AS (
            SELECT doc_id_a, doc_id_b, jaccard
            FROM ({_lsh_pairs_sql(D.DUCK)}) lsh
        ),
        labeled AS (
            SELECT doc_id_a, doc_id_b, jaccard,
                   {_split_of("doc_id_a")} AS split_a,
                   {_split_of("doc_id_b")} AS split_b
            FROM pairs
        )
        SELECT CASE WHEN split_a = 'eval' THEN doc_id_a ELSE doc_id_b END
                   AS eval_doc_id,
               CASE WHEN split_a = 'eval' THEN doc_id_b ELSE doc_id_a END
                   AS train_doc_id,
               jaccard
        FROM labeled
        WHERE split_a != split_b
    """


@register("doc_contamination_check", oracle=_contamination_sql(), tags=("extension",))
def doc_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination: near-duplicate pairs (MinHash-LSH
    candidates verified by shingle Jaccard) that straddle the
    deterministic split — i.e. eval documents whose content leaked into
    the training side. This is the decontamination pass every serious
    training-data pipeline runs before shipping an eval set; n-gram
    overlap, not exact match, is the industry test.

    Reuses the LSH pair generation (same staged+cached signature
    table), so the only extra work over doc_dedup_minhash_lsh is two
    hash expressions and a filter — at 100 TB the candidate join
    dominates and is shared."""
    pairs = doc_dedup_minhash_lsh(spark, sf_dir)
    sa = F.expr(_split_of("doc_id_a"))
    sb = F.expr(_split_of("doc_id_b"))
    return (
        pairs.withColumn("split_a", sa)
        .withColumn("split_b", sb)
        .filter(F.col("split_a") != F.col("split_b"))
        .select(
            F.when(F.col("split_a") == "eval", F.col("doc_id_a"))
            .otherwise(F.col("doc_id_b"))
            .alias("eval_doc_id"),
            F.when(F.col("split_a") == "eval", F.col("doc_id_b"))
            .otherwise(F.col("doc_id_a"))
            .alias("train_doc_id"),
            "jaccard",
        )
    )


# --------------------------------------------------------------------------
# Dedup clusters: connected components over the near-dup pair graph
# --------------------------------------------------------------------------
def _clusters_oracle_sql() -> str:
    # Transitive closure via a recursive CTE: min reachable id over the
    # symmetrized edge set IS the component id (reachability is
    # symmetric once edges are undirected).
    return f"""
        WITH RECURSIVE pairs AS (
            SELECT doc_id_a, doc_id_b FROM ({_lsh_pairs_sql(D.DUCK)}) lsh
        ),
        edges AS (
            SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
            UNION
            SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs
        ),
        reach AS (
            SELECT src AS doc_id, src AS root FROM edges
            UNION
            SELECT e.dst AS doc_id, r.root
            FROM reach r JOIN edges e ON e.src = r.doc_id
        )
        SELECT doc_id,
               cast(min(root) as bigint) AS cluster_id,
               (doc_id = min(root)) AS is_canonical
        FROM reach
        GROUP BY doc_id
    """


@register("doc_dedup_clusters", oracle=_clusters_oracle_sql(), tags=("extension", "headline"))
def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *cluster* formation — the step that turns pairwise
    MinHash-LSH matches into keep-one-per-group decisions, which is how
    production corpus dedup actually concludes (pairs alone don't dedup
    anything; components do).

    Connected components by iterative min-label propagation over the
    symmetrized pair graph (Pregel shape: each round every node takes
    the min of its label and its neighbors' labels; converged when the
    exact int64 label-sum stops decreasing — the sum is strictly
    monotone until fixpoint, so one scalar comparison is a sound
    convergence test). Rounds are bounded by graph diameter; dup
    clusters are near-cliques, so 2-3 rounds in practice.

    Scale notes: edges and labels are doc_id-keyed shuffles; each
    round is one join + one groupBy. Lineage is truncated per round
    via operators/checkpointing (without it the plan doubles per
    round). Deep chains — where diameter-bounded rounds fail — AUTO-
    SWITCH: if the label sum hasn't fixpointed after
    ``_LP_GUARD_ROUNDS`` (LSH dup clusters are near-cliques, 2-3
    rounds; needing more is itself the diameter signal), the query
    hands the SAME edge set to the alternating large-star/small-star
    operator (operators/components.connected_components, O(log² n)
    rounds on any shape — Kiveris et al., SoCC'14), so the shipped
    query can never silently stop short of the true components. The
    DuckDB oracle is the same closure as a recursive CTE.

    Output: every clustered doc with its component id (= min doc_id in
    the component) and the canonical-keeper flag.
    """
    pairs = doc_dedup_minhash_lsh(spark, sf_dir).select("doc_id_a", "doc_id_b")
    return cluster_documents(pairs)


# Label-propagation round budget before doc_dedup_clusters switches to
# the O(log² n) star operator: near-clique LSH graphs fixpoint in 2-3
# rounds, so 12 label-sum plateaus only on a genuinely deep graph —
# where propagation would need O(diameter) rounds and the star operator
# wins anyway. (A 50-round cap used to be the only backstop; a 5000-link
# duplication chain would have hit it and silently returned partial
# clusters.)
_LP_GUARD_ROUNDS = 12


def cluster_documents(pairs: DataFrame) -> DataFrame:
    """Connected components of a (doc_id_a, doc_id_b) near-dup pair set
    → (doc_id, cluster_id, is_canonical). Min-label propagation with
    the per-round exact label-sum convergence test, auto-switching to
    operators/components.connected_components past ``_LP_GUARD_ROUNDS``
    (see doc_dedup_clusters). Exposed separately so the deep-chain
    fallback is testable through the query's own code path with an
    injected pathological graph."""
    from finalpipeline_spark.operators.checkpointing import truncate_lineage

    fwd = pairs.select(F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst"))
    rev = pairs.select(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst"))
    # LAZY checkpoints throughout: each round's single driver action (the
    # label-sum aggregate) materializes that round's checkpoint blocks as
    # a side effect of computing them, so every round costs ONE Spark job
    # instead of two (checkpoint job + sum job) — same work, half the
    # job-scheduling round trips. Lineage is still truncated at exactly
    # the same points.
    edges = truncate_lineage(fwd.union(rev))
    # Seed with round 1 fused into the initialization: every node is a
    # dst (edges are symmetrized), so min(self, in-neighbors) is one
    # aggregation — saving the identity-label pass and its join.
    labels = (
        edges.groupBy("dst")
        .agg(F.min("src").alias("nbr_min"))
        .select(
            F.col("dst").alias("doc_id"),
            F.least(F.col("dst"), F.col("nbr_min")).alias("label"),
        )
    )
    labels = truncate_lineage(labels)

    def _propagate(cur: DataFrame) -> DataFrame:
        nbr_min = (
            edges.join(
                cur.select(
                    F.col("doc_id").alias("src"), F.col("label").alias("src_label")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("src_label").alias("nbr_min"))
            .select(F.col("dst").alias("doc_id"), "nbr_min")
        )
        return truncate_lineage(
            cur.join(nbr_min, "doc_id", "left").select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            ),
        )

    # First propagation round fused with the seed-sum: ONE driver action
    # computes sum(seed) and sum(round-1) together (a tagged union of the
    # two 1-row aggregates; both generations' checkpoint blocks
    # materialize as a side effect).  LSH dup graphs are near-cliques
    # that fixpoint at the seed, so the common case finishes in a single
    # action where it used to take two.  Shared shuffle stages between
    # the two aggregates are deduplicated by the scheduler.
    nxt = _propagate(labels)
    sums = dict(
        labels.agg(F.sum("label").alias("s"))
        .select(F.lit(0).alias("k"), "s")
        .unionAll(nxt.agg(F.sum("label").alias("s")).select(F.lit(1).alias("k"), "s"))
        .collect()
    )
    prev_sum, cur_sum = sums[0], sums[1]
    labels = nxt
    converged = cur_sum == prev_sum
    rounds_left = _LP_GUARD_ROUNDS - 1
    while not converged and rounds_left > 0:
        prev_sum = cur_sum
        labels = _propagate(labels)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        converged = cur_sum == prev_sum
        rounds_left -= 1
    if not converged:
        # diameter guard tripped: this graph is chain-shaped, where
        # label propagation needs O(diameter) rounds — finish with the
        # O(log² n) star operator on the same edges instead of looping
        # (or worse, silently returning pre-fixpoint labels)
        from finalpipeline_spark.operators.components import (
            connected_components,
        )

        labels = connected_components(edges, src="src", dst="dst").select(
            F.col("node").alias("doc_id"), F.col("component").alias("label")
        )
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# Exact substring-level decontamination (variable-length token runs)
# --------------------------------------------------------------------------
_SUBSTR_SEED_N = 5       # seed shingle width (tokens)
_SUBSTR_MIN_RUN = 8      # report pairs sharing a run of >= this many tokens
_SUBSTR_DF_CAP = 50      # ignore seeds occurring more often (boilerplate)


def _decontam_substring_sql(dialect: str) -> str:
    """Eval→train pairs sharing an EXACT common token run of at least
    {min_run} tokens, with the run length — the suffix-level
    decontamination check (Lee et al.-style exact substring dedup)
    that fixed-n shingle overlap cannot express: a 40-token verbatim
    quote and eight scattered 5-gram coincidences look identical to
    n-gram overlap, but only the former is contamination.

    Method (seed-and-extend, all relational):
      1. every {seed_n}-token shingle WITH ITS POSITION, per doc;
      2. seeds occurring more than {df_cap} times corpus-wide are
         dropped (boilerplate guard — and the skew bound: no seed can
         fan out into more than df_cap^2 join pairs);
      3. eval seeds equi-join train seeds on the seed STRING (exact,
         no hashing — a match IS a common substring of {seed_n}
         tokens);
      4. matches on the same (eval_doc, train_doc) DIAGONAL
         (train_pos - eval_pos) at consecutive positions are one
         longer run: gaps-and-islands (pos - row_number) inside the
         partitioned window groups them, and a run of c consecutive
         seed starts covers c + {seed_n} - 1 tokens.

    Exactness: run arithmetic is pure int64; the only join key is a
    string equality — no floats anywhere.  Scale shape: one scan →
    seed explode (data-sized but narrow) → frequency-capped equi-join
    → windows partitioned by (pair, diagonal), never a global window,
    never a cartesian product."""
    toks = _toks(dialect)
    n = _SUBSTR_SEED_N
    if dialect == D.SPARK:
        seeds_rel = f"""
            SELECT doc_id, split, pos, seed
            FROM (
                SELECT doc_id, split,
                       posexplode(CASE WHEN size(tk) >= {n}
                           THEN transform(sequence(1, size(tk) - {n} + 1),
                                          i -> array_join(slice(tk, i, {n}), ' '))
                           ELSE array() END) AS (pos, seed)
                FROM (SELECT doc_id, {{split}} AS split, {toks} AS tk
                      FROM {_doc_tbl(dialect)}) t
            ) s
        """
    else:
        seeds_rel = f"""
            SELECT doc_id, split,
                   unnest(generate_series(1, len(sarr))) - 1 AS pos,
                   unnest(sarr) AS seed
            FROM (
                SELECT doc_id, split,
                       list_transform(
                           generate_series(1, greatest(len(tk) - {n} + 1, 0)),
                           i -> array_to_string(list_slice(tk, i, i + {n} - 1), ' ')
                       ) AS sarr
                FROM (SELECT doc_id, {{split}} AS split, {toks} AS tk
                      FROM {_doc_tbl(dialect)}) t
            ) s
        """
    seeds_rel = seeds_rel.format(split=_split_of("doc_id"))
    return f"""
        WITH seeds AS ({seeds_rel}),
        rare AS (
            SELECT seed FROM seeds
            GROUP BY seed
            HAVING count(*) <= {_SUBSTR_DF_CAP}
        ),
        cand AS (
            SELECT e.doc_id AS eval_doc_id,
                   t.doc_id AS train_doc_id,
                   e.pos AS epos,
                   t.pos - e.pos AS diag
            FROM seeds e
            JOIN rare r ON e.seed = r.seed
            JOIN seeds t ON t.seed = e.seed
            WHERE e.split = 'eval' AND t.split = 'train'
        ),
        islands AS (
            SELECT eval_doc_id, train_doc_id, diag,
                   epos - row_number() OVER (
                       PARTITION BY eval_doc_id, train_doc_id, diag
                       ORDER BY epos
                   ) AS isl
            FROM cand
        ),
        runs AS (
            SELECT eval_doc_id, train_doc_id,
                   cast(count(*) + {n} - 1 as bigint) AS run_tokens
            FROM islands
            GROUP BY eval_doc_id, train_doc_id, diag, isl
        )
        SELECT eval_doc_id, train_doc_id,
               cast(max(run_tokens) as bigint) AS max_run_tokens,
               cast(count(*) as bigint) AS n_runs
        FROM runs
        GROUP BY eval_doc_id, train_doc_id
        HAVING max(run_tokens) >= {_SUBSTR_MIN_RUN}
    """


@register(
    "doc_decontam_substring",
    oracle=_decontam_substring_sql(D.DUCK),
    tags=("extension",),
)
def doc_decontam_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level train/eval decontamination: the longest
    verbatim common token run per straddling pair, via positioned seed
    shingles + diagonal gaps-and-islands extension. Complements
    doc_contamination_check (set-overlap Jaccard) with the
    ORDER-SENSITIVE exact-match test. See _decontam_substring_sql."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(SPARK_VIEW)
    return spark.sql(_decontam_substring_sql(D.SPARK))
