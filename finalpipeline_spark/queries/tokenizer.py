"""Tokenizer fitting: BPE pair statistics and iterative merge learning.

A training-data pipeline doesn't just *count* tokens (doc_bpe_token_count
applies a fixed regex); it has to FIT the tokenizer: byte-pair encoding
(Sennrich et al. 2016, arXiv:1508.07909) greedily merges the most
frequent adjacent symbol pair, K times, over the corpus word-frequency
table.

Spark-first shape (mirrors emb_kmeans_lloyd's iterative pattern):

  * the corpus is reduced ONCE to (word, count) — a single shuffle with
    map-side combine; every BPE iteration then runs on the vocabulary
    table, whose size is corpus-independent (distinct words), never on
    raw documents;
  * each iteration is: adjacent-pair explode → weighted count (one
    shuffle on pair) → argmax (a 1-row scalar collect, same as the
    k-means convergence check) → merge application, which is a pure
    per-row fold over the symbol array (no shuffle);
  * lineage is truncated with localCheckpoint every few rounds, the
    doc_dedup_clusters lesson.

The merge-application fold is the classic trick: a left fold that
appends the symbol, or replaces the accumulator's tail when it equals
(left, right). Because a newly merged symbol compares as its
concatenation, it can't re-merge within the same pass — exactly BPE's
non-overlapping greedy semantics.

doc_bpe_pair_counts (iteration-0 statistics) is DuckDB-oracle-checked;
the iterative learner is genuinely non-SQL-expressible in one statement
(DuckDB's list_reduce is a same-type reduce, not a fold, so merge
application has no DuckDB twin) → rows-only for the driver, with an
independent pure-Python reference BPE differential test in
tests/test_tokenizer.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions.frames import local_df
from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

DOCS_VIEW = "__fps_documents_tok"
N_MERGES = 8
_CHECKPOINT_EVERY = 4


def _doc_tbl(dialect: str) -> str:
    return DOCS_VIEW if dialect == D.SPARK else "documents"


# --------------------------------------------------------------------------
# Iteration-0 pair statistics (oracle-checked)
# --------------------------------------------------------------------------
def _pair_counts_sql(dialect: str) -> str:
    """Corpus-weighted adjacent character-pair counts — the statistic
    BPE's first merge decision is made from. Two shuffles total: word
    frequency (map-side combinable), then pair aggregation over the
    *vocabulary*, not the corpus. Top-20 with deterministic tiebreak.
    """
    toks = D.tokens("text", dialect)
    t = _doc_tbl(dialect)
    vocab = (
        "SELECT word, count(*) AS cnt FROM words"
        " WHERE length(word) >= 2 GROUP BY word"
    )
    if dialect == D.SPARK:
        unnest_words = f"""
            SELECT word FROM (SELECT {toks} AS toks FROM {t}) tt
            LATERAL VIEW explode(toks) e AS word
        """
        pair_arr = (
            "transform(sequence(1, length(word) - 1),"
            " i -> struct(substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r))"
        )
        unnest_pairs = f"""
            SELECT p.l AS left_sym, p.r AS right_sym, cnt
            FROM ({vocab}) v
            LATERAL VIEW explode({pair_arr}) e AS p
        """
    else:
        unnest_words = f"""
            SELECT unnest({toks}) AS word FROM {t}
        """
        pair_arr = (
            "list_transform(range(1, length(word)),"
            " i -> {'l': substr(word, i, 1), 'r': substr(word, i + 1, 1)})"
        )
        unnest_pairs = f"""
            SELECT p.l AS left_sym, p.r AS right_sym, cnt
            FROM (SELECT unnest({pair_arr}) AS p, cnt FROM ({vocab}) v) u
        """
    return f"""
        WITH words AS ({unnest_words}),
        pairs AS ({unnest_pairs}),
        agg AS (
            SELECT left_sym, right_sym, sum(cnt) AS pair_count
            FROM pairs GROUP BY left_sym, right_sym
        ),
        ranked AS (
            SELECT left_sym, right_sym, cast(pair_count as bigint) AS pair_count,
                   cast(row_number() OVER (
                       ORDER BY pair_count DESC, left_sym, right_sym) AS int) AS rank
            FROM agg
        )
        SELECT * FROM ranked WHERE rank <= 20
    """


@register("doc_bpe_pair_counts", oracle=_pair_counts_sql(D.DUCK), tags=("extension",))
def doc_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE iteration-0 statistics: corpus-weighted adjacent character
    pairs, top-20. Pair work runs over the vocabulary (distinct words),
    not the corpus — the word-frequency reduction happens first."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(DOCS_VIEW)
    return spark.sql(_pair_counts_sql(D.SPARK))


# --------------------------------------------------------------------------
# Iterative merge learning (rows-only: fold has no DuckDB twin)
# --------------------------------------------------------------------------
def _merge_fold_expr(left: str, right: str) -> str:
    """Spark expression applying one BPE merge (left,right) to the
    `symbols` array: left fold that replaces [.., left] + right with
    [.., left||right]. Pure per-row compute — no shuffle."""
    l_lit = _sql_str(left)
    r_lit = _sql_str(right)
    return f"""
        aggregate(
            symbols,
            cast(array() as array<string>),
            (acc, x) -> CASE
                WHEN size(acc) = 0 THEN array(x)
                WHEN element_at(acc, -1) = {l_lit} AND x = {r_lit}
                    THEN concat(slice(acc, 1, size(acc) - 1),
                                array(concat({l_lit}, {r_lit})))
                ELSE concat(acc, array(x))
            END)
    """


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def learn_bpe_merges(
    spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[str, str, int]]:
    """Fit `n_merges` BPE merges over a documents DataFrame; returns
    [(left, right, weighted_pair_count), ...] in merge order.

    Distributed throughout: per iteration one vocabulary-sized shuffle
    + a 1-row argmax collect (bounded scalar state on the driver, like
    k-means centroids). Ties break (count desc, left asc, right asc),
    so the result is deterministic under any partitioning.
    """
    docs.createOrReplaceTempView(DOCS_VIEW)
    toks = D.tokens("text", D.SPARK)
    vocab = spark.sql(f"""
        SELECT word, count(*) AS cnt
        FROM (SELECT {toks} AS toks FROM {DOCS_VIEW}) tt
        LATERAL VIEW explode(toks) e AS word
        GROUP BY word
    """).withColumn(
        "symbols", F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    ).select("symbols", "cnt")

    merges: list[tuple[str, str, int]] = []
    # Truncate lineage at the vocabulary ONCE before iterating: without
    # this, every iteration until the first in-loop checkpoint (it 1..4)
    # re-runs the corpus tokenize + word-frequency shuffle — the only
    # corpus-sized work in the loop. The blocks materialize with
    # iteration 1's argmax action (lazy), and every later iteration
    # starts from the vocabulary-sized blocks. [guide §1.3, §5.4]
    seqs = vocab.localCheckpoint(eager=False)
    for it in range(n_merges):
        pairs = (
            seqs.filter(F.expr("size(symbols) >= 2"))
            .select(
                F.expr(
                    "explode(transform(sequence(1, size(symbols) - 1),"
                    " i -> struct(element_at(symbols, i) AS l,"
                    " element_at(symbols, i + 1) AS r)))"
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.desc("pair_count"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["pair_count"])
        merges.append((left, right, cnt))
        seqs = seqs.withColumn("symbols", F.expr(_merge_fold_expr(left, right)))
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            seqs = seqs.localCheckpoint(eager=False)
    return merges


@register("doc_bpe_learn_merges", oracle=None, tags=("extension",))
def doc_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit an 8-merge BPE tokenizer on the documents corpus. Iterative
    (k-means-style scalar-collect loop) — non-SQL-expressible, so
    rows-only for the driver; differentially tested against a pure-
    Python reference BPE in tests/test_tokenizer.py."""
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(spark, docs)
    rows = [
        (i + 1, left, right, left + right, cnt)
        for i, (left, right, cnt) in enumerate(merges)
    ]
    return local_df(
        spark, rows, "rank int, left_sym string, right_sym string, merged string, pair_count bigint"
    )


# --------------------------------------------------------------------------
# Encode: apply learned merges to the corpus (rows-only: fold again)
# --------------------------------------------------------------------------
def bpe_encode(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Tokenize `docs.text` with an already-learned merge list: chars →
    fold-apply each merge in rank order. K chained per-row folds, zero
    shuffles — the encode pass is pure scan-speed map work at any
    scale, which is exactly how production BPE encoders behave (the
    model is tiny; the data is not)."""
    toks = D.tokens("text", D.SPARK)
    out = docs.select(
        "doc_id", F.expr(f"{toks}").alias("words")
    ).select(
        "doc_id",
        F.expr(
            "transform(words, w -> transform(sequence(1, length(w)),"
            " i -> substr(w, i, 1)))"
        ).alias("word_syms"),
    )
    for left, right, _ in merges:
        fold = _merge_fold_expr(left, right).replace("symbols", "s")
        out = out.withColumn(
            "word_syms", F.expr(f"transform(word_syms, s -> {fold})")
        )
    return out.select(
        "doc_id",
        F.expr("flatten(word_syms)").alias("tokens"),
        F.expr("size(flatten(word_syms))").alias("n_tokens"),
    )


@register("doc_bpe_encode", oracle=None, tags=("extension",))
def doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the corpus-fitted 8-merge BPE: learn
    (iterative, bounded scalar state) then K chained per-row folds.
    Output is (doc_id, n_tokens) + a stable token-stream fingerprint
    rather than the raw array (driver canonicalizers hash scalars)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(spark, docs)
    enc = bpe_encode(docs, merges)
    # fingerprint: order-sensitive positional hash of the token stream,
    # exact 64-bit integer arithmetic (same trick as dialect hashes)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "aggregate(tokens, cast(0 as bigint), (acc, t) ->"
            f" (acc * 31 + {D.token_hash('t', D.SPARK)}) % {D.HASH_MOD})"
        ).alias("token_fingerprint"),
    )
