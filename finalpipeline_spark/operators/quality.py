"""Data-quality expectation checks.

Spark has no constraints (the reference leaned on Postgres
UNIQUE/PK/FK — reference datamart.py:110-145); the engine's
replacement discipline is enforce-by-construction plus *assertion
queries* (SURVEY.md §1.3). These are those assertions as reusable
operators: each check is one aggregate or anti-join — a single shuffle,
no collect — returning a uniform violations row, so a pipeline can gate
a write on `run_checks(...).filter("n_violations > 0").isEmpty()`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "check string, target string, n_violations long"


def _result(df: DataFrame, check: str, target: str, n_col) -> DataFrame:
    return df.agg(
        F.lit(check).alias("check"),
        F.lit(target).alias("target"),
        n_col.cast("long").alias("n_violations"),
    )


def check_not_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One pass over the table counts nulls for every column at once.
    Identifiers are backtick-quoted so names with spaces/dots (e.g. the
    reference's 'molecule name' header) survive the stack() expression."""
    aggs = [
        F.count(F.when(F.col(c).isNull(), F.lit(1))).cast("long").alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        "'{lbl}', `{ident}`".format(lbl=c.replace("'", "\\'"), ident=c.replace("`", "``"))
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (target, n_violations)"
    ).select(F.lit("not_null").alias("check"), "target", "n_violations")


def check_unique(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows beyond the first per key (0 = key is unique)."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n"))
    )
    return _result(dup, "unique", ",".join(keys), F.first("n"))


def check_accepted_values(df: DataFrame, col: str, values: Sequence[str]) -> DataFrame:
    bad = df.filter(~F.col(col).isin(list(values)) | F.col(col).isNull())
    return _result(bad, "accepted_values", col, F.count(F.lit(1)))


def check_referential(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Orphaned foreign keys: child rows whose fk misses every parent pk.
    Broadcast the parent when it's a dim; Spark picks SMJ otherwise."""
    orphans = child.filter(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    return _result(orphans, "referential", fk, F.count(F.lit(1)))


def run_checks(checks: Sequence[DataFrame]) -> DataFrame:
    """Union the single-row check results into one violations report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
