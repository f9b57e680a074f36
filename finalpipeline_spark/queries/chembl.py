"""ChEMBL-shaped similarity pipeline queries (the reference's core).

The reference's kernel is: fingerprint every molecule, cross-score a
small target set against the full corpus with Tanimoto, drop
self-matches, keep top-10 per target (reference tanimoto.py:124-147 +
datamart.py:28-47). RDKit isn't installable here, so fingerprints are
deterministic synthetic bit-sets derived from the molecule key by pure
integer arithmetic — identical in Spark and DuckDB, which makes the
whole kernel oracle-checkable end to end (the real Morgan/RDKit kernel
slots in behind the same schema; see
finalpipeline_spark/functions/fingerprints.py).

Spark-first shape: sources.crossJoin(broadcast(targets)) — the target
side is tiny, so the cross-score is a broadcast nested loop with zero
shuffle of the big side; the top-k is one window shuffle on target id.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.functions.caching import scoped_cache
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

# Minimum-similarity cutoff applied BEFORE the top-k window (standard in
# chemical similarity search): the cross-score emits ~n_sources ×
# n_targets pairs, but only pairs above the cutoff reach the shuffle —
# at 100 TB this is the difference between shuffling the full cross
# product and shuffling a few percent of it. Applied identically in the
# oracle, so semantics are "top-10 neighbors with similarity >= 0.12".
_MIN_SIM = 0.12

_FP_BITS = 32  # set-bit count per synthetic fingerprint
_FP_WORDS = 4  # bitmap words per fingerprint
_BITS_PER_WORD = 62  # ≤62 so neither engine overflows a signed shift
_FP_SPACE = _FP_WORDS * _BITS_PER_WORD  # 248-bit space


def _fp_word_expr(h: str, word: int, dialect: str) -> str:
    """One 62-bit word of the synthetic fingerprint bitmap, from a
    staged per-key hash column ``h`` (computed once per row).

    The fingerprint is 32 pseudo-random bit positions in [0,248) packed
    into 4 bigint words — the physical layout that makes the 10M-pair
    cross-score pure integer ops (the array<int> set representation was
    ~30× slower: per-pair hash-set intersects). A real Morgan/2048
    fingerprint (reference mpp.py:81-93) is the same thing with 32
    words.

    The intermediate hash runs mod a large prime BEFORE the bit-space
    mod: arithmetic done directly mod 248 would make keys congruent
    mod 248 share identical fingerprints (degenerate tanimoto=1.0
    twins). h < 1e6, h*(i+1) < 3.3e7 — no overflow anywhere.
    """
    pos = f"((({h} * (i + 1) + i * i * 97) % {D.HASH_MOD}) % {_FP_SPACE})"
    if dialect == D.SPARK:
        return (
            f"aggregate(sequence(0, {_FP_BITS - 1}), cast(0 as bigint), "
            f"(acc, i) -> CASE WHEN ({pos} div {_BITS_PER_WORD}) = {word} "
            f"THEN acc | shiftleft(cast(1 as bigint), cast({pos} % {_BITS_PER_WORD} as int)) "
            f"ELSE acc END)"
        )
    return (
        f"list_reduce(list_prepend(0::bigint, list_transform(range(0, {_FP_BITS}), "
        f"i -> CASE WHEN ({pos} // {_BITS_PER_WORD}) = {word} "
        f"THEN (1::bigint << ({pos} % {_BITS_PER_WORD})::int) "
        f"ELSE 0::bigint END)), (a, b) -> a | b)"
    )


SPARK_VIEW = "__fps_part"


def _part_tbl(dialect: str) -> str:
    return SPARK_VIEW if dialect == D.SPARK else "part"


def _fps_sql(dialect: str) -> str:
    """The per-molecule packed-bitmap fingerprint table."""
    words = ", ".join(
        f"{_fp_word_expr('h', w, dialect)} AS w{w}" for w in range(_FP_WORDS)
    )
    return f"""
        SELECT molregno, {words} FROM (
            SELECT p_partkey AS molregno,
                   ((p_partkey * {D.MULT}) % {D.HASH_MOD}) AS h
            FROM {_part_tbl(dialect)}
        ) keyed
    """


def _tanimoto_sql(dialect: str, fps_rel: str | None = None) -> str:
    """Cross-score + top-k over a fingerprint relation.

    `fps_rel` names a pre-staged relation (Spark: a cached, explicitly
    repartitioned DataFrame); None inlines the fingerprint SQL as a
    CTE for the DuckDB oracle.
    """
    fps = fps_rel or "fps"
    # DuckDB bit_count returns TINYINT (overflows when summed) — widen.
    cnt = "bit_count({x})" if dialect == D.SPARK else "bit_count({x})::int"
    inter = " + ".join(cnt.format(x=f"s.w{w} & t.w{w}") for w in range(_FP_WORDS))
    union = " + ".join(cnt.format(x=f"s.w{w} | t.w{w}") for w in range(_FP_WORDS))
    tani = f"(cast({inter} as double) / cast({union} as double))"
    rn_cast = "cast(rn as int)" if dialect == D.SPARK else "rn::int"
    with_fps = "" if fps_rel else f"fps AS ({_fps_sql(dialect)}),\n        "
    return f"""
        WITH {with_fps}targets AS (SELECT * FROM {fps} WHERE molregno % 40 = 0),
        scored AS (
            SELECT t.molregno AS target_molregno, s.molregno AS molregno,
                   {tani} AS tanimoto_similarity
            FROM {fps} s JOIN targets t ON s.molregno != t.molregno
            WHERE {tani} >= {_MIN_SIM}
        )
        SELECT target_molregno, molregno, tanimoto_similarity, {rn_cast} AS rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY target_molregno
                ORDER BY tanimoto_similarity DESC, molregno) AS rn
            FROM scored
        ) ranked WHERE rn <= 10
    """


@register(
    "chembl_tanimoto_topk", oracle=_tanimoto_sql(D.DUCK), tags=("reference", "headline")
)
def chembl_tanimoto_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+O1: broadcast cross-score (every source × every target,
    self-matches excluded — tanimoto.py:141-144) then window top-10 per
    target. The reference's per-target Python loop and per-target
    parquet files collapse into this single distributed plan.

    The fingerprint table is staged once (cached + repartitioned to
    the session's parallelism) before the cross-score: inlined, it was
    computed for BOTH join sides, and the single source parquet file
    left the 10M-pair scoring loop on ONE task. Staging is also the
    real design — fingerprints are computed once and stored columnar;
    every search reuses them. 2.6s -> 0.6s at sf0.1."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView(SPARK_VIEW)
    fps = scoped_cache(
        spark.sql(_fps_sql(D.SPARK)).repartition(
            spark.sparkContext.defaultParallelism, "molregno"
        ),
        "chembl_tanimoto_topk",
    )
    fps.createOrReplaceTempView("__fps_tanimoto_fps")
    return spark.sql(_tanimoto_sql(D.SPARK, fps_rel="__fps_tanimoto_fps"))


# --------------------------------------------------------------------------
# Banded (LSH) Tanimoto search — the 100 TB shape for a corpus-sized
# target set (reference tanimoto.py:124-147; SURVEY §7 "the one genuinely
# custom algorithm"). The dense chembl_tanimoto_topk above stays as the
# labeled brute-force baseline: its pair count is n_sources × n_targets,
# which is fine when targets are a small broadcast batch (the reference's
# real workload) but quadratic when the target set grows with the corpus.
# Here candidates come from a MinHash band-bucket equi-join over the
# fingerprint's SET-BIT POSITIONS (minhash over a bit-set is the standard
# Tanimoto/Jaccard LSH — the fingerprint IS a set, so the minhash_bands
# shape from documents.py:366 applies verbatim), then only candidates are
# exact-Tanimoto rescored. Candidate volume is band-bucket-bounded, not
# n²; chembl_tanimoto_lsh_recall below is the sign-off that polices the
# approximation, mirroring doc_dedup_lsh_recall / emb_ann_recall_eval.
# --------------------------------------------------------------------------
_lsh_rng = random.Random(20260814)
_LSH_ROWS = 2  # minhash rows per band (AND within a band)
_LSH_BANDS = 24  # bands (OR across bands)
_LSH_COEFFS = [
    (_lsh_rng.randrange(1, D.HASH_MOD), _lsh_rng.randrange(0, D.HASH_MOD))
    for _ in range(_LSH_ROWS * _LSH_BANDS)
]


def _positions_expr(dialect: str) -> str:
    """Set-bit positions [0, 248) of the packed 4×62-bit fingerprint, as
    an integer array — the set representation the minhash family hashes.
    Pure bit tests; bit-identical across engines."""
    if dialect == D.SPARK:
        word = "element_at(array(w0, w1, w2, w3), cast(p div 62 as int) + 1)"
        return (
            f"filter(sequence(0, {_FP_SPACE - 1}), "
            f"p -> (shiftright({word}, cast(p % 62 as int)) & 1) = 1)"
        )
    word = "[w0, w1, w2, w3][(p // 62) + 1]"
    return (
        f"list_filter(range(0, {_FP_SPACE}), "
        f"p -> (({word} >> (p % 62)) & 1) = 1)"
    )


def _lsh_band_key(dialect: str, band: int) -> str:
    """Concatenated _LSH_ROWS-slice of the minhash signature."""
    lo = band * _LSH_ROWS + 1
    parts = [
        f"cast({D.arr_index('sig', str(i), dialect)} as string)"
        if dialect == D.SPARK
        else f"{D.arr_index('sig', str(i), dialect)}::varchar"
        for i in range(lo, lo + _LSH_ROWS)
    ]
    return "(" + " || '_' || ".join(parts) + ")"


def _lsh_sigs_sql(dialect: str, fps_rel: str | None = None) -> str:
    """fps + minhash signature (one narrow pass over the fingerprints)."""
    fps = fps_rel or f"({_fps_sql(dialect)})"
    return f"""
        SELECT molregno, w0, w1, w2, w3,
               {D.minhash_sig_ints("pos", _LSH_COEFFS, dialect)} AS sig
        FROM (
            SELECT *, {_positions_expr(dialect)} AS pos FROM {fps} f
        ) with_pos
    """


def _lsh_band_rows(dialect: str, sigs_rel: str) -> str:
    """(molregno, band, key) bucket index. Spark: one scan + explode
    (Expand node); DuckDB oracle: UNION ALL formulation, same values."""
    if dialect == D.SPARK:
        structs = ", ".join(
            f"struct({b} AS band, {_lsh_band_key(D.SPARK, b)} AS key)"
            for b in range(_LSH_BANDS)
        )
        return (
            f"SELECT molregno, bk.band AS band, bk.key AS key "
            f"FROM {sigs_rel} LATERAL VIEW explode(array({structs})) t AS bk"
        )
    return "\nUNION ALL\n".join(
        f"SELECT molregno, {b} AS band, {_lsh_band_key(D.DUCK, b)} AS key "
        f"FROM {sigs_rel}"
        for b in range(_LSH_BANDS)
    )


def _tanimoto_lsh_sql(dialect: str, sigs_rel: str | None = None) -> str:
    """Banded candidate generation + exact-Tanimoto rescore + top-10.

    Same output schema and target set as the dense _tanimoto_sql, so
    the recall eval can compare them row-for-row. The rescore joins are
    plain equi-joins on molregno (shuffle bounded by candidate count).
    """
    sigs = sigs_rel or "sigs"
    with_sigs = "" if sigs_rel else f"sigs AS ({_lsh_sigs_sql(dialect)}),\n        "
    cnt = "bit_count({x})" if dialect == D.SPARK else "bit_count({x})::int"
    inter = " + ".join(cnt.format(x=f"s.w{w} & t.w{w}") for w in range(_FP_WORDS))
    union = " + ".join(cnt.format(x=f"s.w{w} | t.w{w}") for w in range(_FP_WORDS))
    tani = f"(cast({inter} as double) / cast({union} as double))"
    rn_cast = "cast(rn as int)" if dialect == D.SPARK else "rn::int"
    return f"""
        WITH {with_sigs}bands AS ({_lsh_band_rows(dialect, sigs)}),
        tbands AS (SELECT * FROM bands WHERE molregno % 40 = 0),
        cand AS (
            SELECT DISTINCT t.molregno AS target_molregno, s.molregno AS molregno
            FROM bands s JOIN tbands t
              ON s.band = t.band AND s.key = t.key AND s.molregno != t.molregno
        ),
        scored AS (
            SELECT c.target_molregno, c.molregno, {tani} AS tanimoto_similarity
            FROM cand c
            JOIN {sigs} s ON c.molregno = s.molregno
            JOIN {sigs} t ON c.target_molregno = t.molregno
            WHERE {tani} >= {_MIN_SIM}
        )
        SELECT target_molregno, molregno, tanimoto_similarity, {rn_cast} AS rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY target_molregno
                ORDER BY tanimoto_similarity DESC, molregno) AS rn
            FROM scored
        ) ranked WHERE rn <= 10
    """


_LSH_SIGS_VIEW = "__fps_tanimoto_lsh_sigs"


def _stage_lsh_sigs(spark: SparkSession, sf_dir: str, scope: str) -> None:
    """Stage the (fingerprint + signature) table once: cached and
    repartitioned, it feeds the band explode AND both rescore sides —
    the persisted-index design (at scale this is the stored columnar
    fingerprint+signature table every search reuses)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView(SPARK_VIEW)
    sigs = scoped_cache(
        spark.sql(_lsh_sigs_sql(D.SPARK)).repartition(
            spark.sparkContext.defaultParallelism, "molregno"
        ),
        scope,
    )
    sigs.createOrReplaceTempView(_LSH_SIGS_VIEW)


@register(
    "chembl_tanimoto_lsh_topk",
    oracle=_tanimoto_lsh_sql(D.DUCK),
    tags=("reference", "extension"),
)
def chembl_tanimoto_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 at the 100 TB shape: MinHash(48)-banded (_LSH_BANDS=24 ×
    _LSH_ROWS=2) candidate
    buckets over fingerprint bit-sets, band-bucket equi-join (no cross
    product), exact-Tanimoto rescore of candidates only, window top-10
    per target. Approximate by design — recall is governed by the band
    parameters and policed by chembl_tanimoto_lsh_recall."""
    _stage_lsh_sigs(spark, sf_dir, "chembl_tanimoto_lsh_topk")
    return spark.sql(_tanimoto_lsh_sql(D.SPARK, sigs_rel=_LSH_SIGS_VIEW))


def _lsh_recall_sql(
    dialect: str, sigs_rel: str | None = None, fps_rel: str | None = None
) -> str:
    """Recall of the banded top-10 against the dense top-10 (pair-level,
    plus the candidate-pruning ratio that justifies the banding).

    ``fps_rel`` lets the Spark side point the dense baseline at the
    staged sigs relation (it carries molregno + w0..w3, which is all
    the dense scorer reads) — otherwise the fingerprint chain inlines
    into BOTH cross-join sides of the dense CTE on the unpartitioned
    source scan (single task, 2× recompute; measured 5.4 s vs 1.1 s at
    sf0.01). The DuckDB oracle keeps the inline form."""
    dense = _tanimoto_sql(dialect, fps_rel=fps_rel)
    lsh = _tanimoto_lsh_sql(dialect, sigs_rel=sigs_rel)
    return f"""
        WITH dense_k AS ({dense}),
        lsh_k AS ({lsh})
        SELECT count(*) AS n_dense,
               (SELECT count(*) FROM lsh_k) AS n_lsh,
               count(l.molregno) AS n_hit,
               round(cast(count(l.molregno) as double)
                     / cast(count(*) as double), 6) AS recall,
               round(cast(count(CASE WHEN d.tanimoto_similarity >= 0.3
                                     THEN l.molregno END) as double)
                     / cast(nullif(count(CASE WHEN d.tanimoto_similarity >= 0.3
                                              THEN 1 END), 0) as double), 6)
                   AS recall_hi
        FROM dense_k d
        LEFT JOIN lsh_k l
          ON d.target_molregno = l.target_molregno AND d.molregno = l.molregno
    """


@register(
    "chembl_tanimoto_lsh_recall",
    oracle=_lsh_recall_sql(D.DUCK),
    tags=("extension",),
)
def chembl_tanimoto_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-off twin for chembl_tanimoto_lsh_topk: pair-level recall of
    the banded top-10 vs the dense top-10 (the acceptance metric for
    deploying the banded index; pattern of doc_dedup_lsh_recall).
    The dense side is the quadratic verification baseline — sampled in
    production, full at test scale."""
    _stage_lsh_sigs(spark, sf_dir, "chembl_tanimoto_lsh_recall")
    return spark.sql(
        _lsh_recall_sql(D.SPARK, sigs_rel=_LSH_SIGS_VIEW, fps_rel=_LSH_SIGS_VIEW)
    )


@register("chembl_crossscore_udf", oracle=None, tags=("reference",))
def chembl_crossscore_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 with the REAL pandas-UDF kernel path (F1+F2+F4): synthesize a
    SMILES-like string per molecule, fingerprint it with the vectorized
    pandas UDF (2048-bit packed bitmap; RDKit when available), then
    broadcast-cross-score a small target set with the numpy-popcount
    Tanimoto UDF and keep the top-5 per target.

    Rows-only check: the fingerprint kernel is a Python/NumPy (or
    RDKit) computation a SQL oracle cannot reproduce; correctness of
    the kernels themselves is unit-tested (tests/test_kernels.py), and
    the relational frame around them is the oracle-checked
    chembl_tanimoto_topk.
    """
    from finalpipeline_spark.functions.fingerprints import fingerprint, tanimoto
    from finalpipeline_spark.operators.topk import top_k_per_group

    part = load_table(spark, sf_dir, "part")
    # Stage the fingerprinted relation ONCE (guide §4.4/§1.3): unstaged,
    # the optimizer duplicates the UDF around the isNotNull filter on
    # its own output (plan: 2 ArrowEvalPython per side) and the cross
    # join's two sides each re-fingerprint the scan — 4 structural
    # evaluations of the kernel for 1 logical pass. The staged relation
    # is O(molecules) — fingerprints only, no payloads.
    mols = scoped_cache(
        part.select(
            F.col("p_partkey").alias("molregno"),
            # Deterministic SMILES-like string (no whitespace → 'parses').
            F.concat_ws(
                "", F.lit("C"), F.regexp_replace("p_name", " ", ""), F.lit("N"),
                F.col("p_partkey").cast("string")
            ).alias("smiles"),
        )
        .withColumn("fp", fingerprint(F.col("smiles")))
        .filter(F.col("fp").isNotNull()),
        "chembl_crossscore_udf",
    )
    targets = mols.filter(F.col("molregno") % 200 == 0).select(
        F.col("molregno").alias("target_molregno"), F.col("fp").alias("target_fp")
    )
    scored = (
        mols.crossJoin(F.broadcast(targets))
        .filter(F.col("molregno") != F.col("target_molregno"))
        .withColumn("similarity", tanimoto(F.col("fp"), F.col("target_fp")))
        .select("target_molregno", "molregno", "similarity")
    )
    return top_k_per_group(
        scored,
        ["target_molregno"],
        [F.desc("similarity"), F.col("molregno")],
        k=5,
    )


@register(
    "chembl_id_resolution",
    oracle="""
        SELECT t.molregno, t.chembl_id, c.c_name AS resolved_name,
               c.c_mktsegment AS entity_type
        FROM (
            SELECT p_partkey AS molregno,
                   'CHEMBL' || p_partkey AS chembl_id
            FROM part WHERE p_type = 'PROMO'
        ) t
        LEFT JOIN customer c ON t.molregno = c.c_custkey
    """,
    tags=("reference",),
)
def chembl_id_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 on the domain shape: chembl_id → molregno lookup as a
    broadcast left join (reference pushed this to Postgres via a temp
    table — tanimoto.py:159-183)."""
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")
    targets = part.filter(F.col("p_type") == "PROMO").select(
        F.col("p_partkey").alias("molregno"),
        F.concat(F.lit("CHEMBL"), F.col("p_partkey").cast("string")).alias("chembl_id"),
    )
    return targets.join(
        F.broadcast(cust), targets.molregno == cust.c_custkey, "left"
    ).select(
        "molregno",
        "chembl_id",
        F.col("c_name").alias("resolved_name"),
        F.col("c_mktsegment").alias("entity_type"),
    )
