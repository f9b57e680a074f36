"""DuckDB oracle harness — mirrors the driver's correctness gate.

Runs a registered query's Spark implementation and its DuckDB oracle
on the same parquet tables and compares row count, column names, and
order-insensitive values (exact, after the queries' own output
rounding). Used by tests/ so every registry entry is verified locally
before the driver ever sees it.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from typing import Any

import duckdb

from finalpipeline_spark.tables import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> "duckdb.DuckDBPyRelation":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con.execute(sql).fetchdf()


def _norm_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _norm_value(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _norm_rows(df) -> list[tuple]:
    # repr-canonicalized, type-strict: int 253942 reprs as "253942" while
    # float 253942.0 reprs as "253942.0", so int-vs-float dtype drift
    # (e.g. DuckDB widening sum(BIGINT) → HUGEINT → pandas float64) FAILS
    # here exactly as it fails the driver's canonicalized value hash.
    # Python `==` on raw values would mask it (253942 == 253942.0 is True)
    # — that laxness shipped the r3 tpch_grouping_sets bug.
    cols = sorted(df.columns)
    out = [
        tuple(repr(_norm_value(v)) for v in row)
        for row in df[cols].itertuples(index=False)
    ]
    out.sort()
    return out


def compare(spark_df, oracle_df) -> None:
    """Assert driver-style equivalence: columns, count, sorted values."""
    sp = spark_df.toPandas()
    sp_cols, or_cols = sorted(sp.columns), sorted(oracle_df.columns)
    assert sp_cols == or_cols, f"column mismatch: spark={sp_cols} oracle={or_cols}"
    assert len(sp) == len(oracle_df), f"row count: spark={len(sp)} oracle={len(oracle_df)}"
    sp_rows, or_rows = _norm_rows(sp), _norm_rows(oracle_df)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sp_rows, or_rows)) if a != b
    ]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"
