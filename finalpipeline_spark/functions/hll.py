"""Deterministic HyperLogLog primitives (shared by queries/sketches.py
and plans/incremental_sketch.py).

Registers are a commutative monoid under elementwise max — the whole
reason HLL works at 100 TB: per-partition, per-batch, per-table
sketches merge without revisiting keys.  All math here is exact int64
(md5-avalanche hash, bin()-length rho, shift-left powers) so the same
registers come out of Spark, DuckDB, or any engine running the SQL;
the estimate applies one IEEE division (plus ln in the small-range
branch, rounded to 4 decimals to absorb libm variation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D

M = 256  # registers (p=8): std error 1.04/sqrt(256) ~ 6.5%
WBITS = 23  # 31-bit hash minus 8 bucket bits
# alpha_m * m^2 * 2^(WBITS+1) as ONE double literal: a single division
# per estimate, no chained float ops to diverge between engines.
ALPHA_NUM = (0.7213 / (1 + 1.079 / M)) * M * M * (1 << (WBITS + 1))


def rho_select(src: str, key: str, dialect: str) -> str:
    """SQL: (bucket, r) per-row register contributions of src.key."""
    idiv = "div" if dialect == D.SPARK else "//"
    h = D.hex_prefix_to_int("m5", dialect)
    return f"""
        SELECT (h % {M}) AS bucket,
               CASE WHEN (h {idiv} {M}) = 0 THEN {WBITS + 1}
                    ELSE {WBITS + 1} - length(bin(h {idiv} {M})) END AS r
        FROM (SELECT {h} AS h
              FROM (SELECT {D.md5_hex(key, dialect)} AS m5 FROM {src}) raw) hashed
    """


def est_select(regs: str, dialect: str) -> str:
    """SQL: one-row estimate (est double) from a (bucket, mr) CTE."""
    two = "shiftleft(cast(1 as bigint)," if dialect == D.SPARK else "(cast(1 as bigint) <<"
    return f"""
        SELECT round(CASE WHEN e <= {2.5 * M!r} AND v > 0
                          THEN {M} * ln(cast({M} as double) / cast(v as double))
                          ELSE e END, 4) AS est
        FROM (
            SELECT ({M} - nb) AS v,
                   {ALPHA_NUM!r}
                     / cast(sp + ({M} - nb) * {1 << (WBITS + 1)} as double) AS e
            FROM (
                SELECT cast(sum({two} ({WBITS + 1} - mr))) as bigint) AS sp,
                       cast(count(*) as bigint) AS nb
                FROM {regs}
            ) s
        ) raw
    """


def est_grouped_select(regs: str, group_col: str, dialect: str) -> str:
    """SQL: per-group estimates (group_col, est double) from a
    (group_col, bucket, mr) register CTE."""
    two = "shiftleft(cast(1 as bigint)," if dialect == D.SPARK else "(cast(1 as bigint) <<"
    return f"""
        SELECT {group_col},
               round(CASE WHEN e <= {2.5 * M!r} AND v > 0
                          THEN {M} * ln(cast({M} as double) / cast(v as double))
                          ELSE e END, 4) AS est
        FROM (
            SELECT {group_col}, ({M} - nb) AS v,
                   {ALPHA_NUM!r}
                     / cast(sp + ({M} - nb) * {1 << (WBITS + 1)} as double) AS e
            FROM (
                SELECT {group_col},
                       cast(sum({two} ({WBITS + 1} - mr))) as bigint) AS sp,
                       cast(count(*) as bigint) AS nb
                FROM {regs} GROUP BY {group_col}
            ) s
        ) raw
    """


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """DataFrame form: (bucket int, mr bigint) registers of df[key_col].
    One narrow shuffle onto a <=256-row keyspace, max combined map-side."""
    hashed = df.select(
        F.expr(D.md5_hex(key_col, D.SPARK)).alias("m5")
    ).select(F.expr(D.hex_prefix_to_int("m5", D.SPARK)).alias("h"))
    rho = hashed.select(
        (F.col("h") % M).cast("int").alias("bucket"),
        F.expr(
            f"CASE WHEN (h div {M}) = 0 THEN {WBITS + 1} "
            f"ELSE {WBITS + 1} - length(bin(h div {M})) END"
        )
        .cast("long")
        .alias("r"),
    )
    return rho.groupBy("bucket").agg(F.max("r").alias("mr"))


def merge_registers(*register_dfs: DataFrame) -> DataFrame:
    """Elementwise-max merge of register tables — associative,
    commutative, idempotent (re-merging the same sketch is a no-op)."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), register_dfs)
    return unioned.groupBy("bucket").agg(F.max("mr").alias("mr"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (est double, zero_buckets bigint) from a register table."""
    stats = registers.agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), ({WBITS + 1} - mr))"))
        .cast("long")
        .alias("sp"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    raw = stats.select(
        (F.lit(M) - F.col("nb")).alias("v"),
        (
            F.lit(ALPHA_NUM)
            / (
                F.col("sp") + (F.lit(M) - F.col("nb")) * F.lit(1 << (WBITS + 1))
            ).cast("double")
        ).alias("e"),
    )
    return raw.select(
        F.round(
            F.when(
                (F.col("e") <= 2.5 * M) & (F.col("v") > 0),
                F.lit(M) * F.log(F.lit(float(M)) / F.col("v").cast("double")),
            ).otherwise(F.col("e")),
            4,
        ).alias("est"),
        F.col("v").cast("long").alias("zero_buckets"),
    )
