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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_FP_BITS = 32  # set-bit count per synthetic fingerprint
_FP_SPACE = 256  # bit-space size


def _fp_expr(key: str, dialect: str) -> str:
    """Synthetic fingerprint: 32 pseudo-random bit positions in [0,256).

    Stand-in for Morgan/2048 (reference mpp.py:81-93) with the same
    set-of-bits semantics; Tanimoto below is exactly |A∩B|/|A∪B|.
    """
    body = f"({key} * {D.MULT} + i * i * 40503 + i) % {_FP_SPACE}"
    return D.arr_distinct(
        D.transform_arr(D.seq(0, _FP_BITS - 1, dialect), "i", body, dialect), dialect
    )


def _tanimoto_sql(dialect: str) -> str:
    fp_s = _fp_expr("p_partkey", dialect)
    tani = D.jaccard("s.fp", "t.fp", dialect)
    rn_cast = "cast(rn as int)" if dialect == D.SPARK else "rn::int"
    return f"""
        WITH fps AS (
            SELECT p_partkey AS molregno, {fp_s} AS fp FROM part
        ),
        targets AS (SELECT * FROM fps WHERE molregno % 40 = 0),
        scored AS (
            SELECT t.molregno AS target_molregno, s.molregno AS molregno,
                   {tani} AS tanimoto_similarity
            FROM fps s JOIN targets t ON s.molregno != t.molregno
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
    parquet files collapse into this single distributed plan."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_tanimoto_sql(D.SPARK))


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
