"""Oracle-differential tests: every registered query with a DuckDB
oracle must match it exactly (count + columns + order-insensitive
values) — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from finalpipeline_spark.oracle import compare, run_oracle
from finalpipeline_spark.queries.registry import load_all

SPECS = load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    result = spec.fn(spark, sf_dir)
    expected = run_oracle(spec.oracle, sf_dir)
    compare(result, expected)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    assert SPECS[name].fn(spark, sf_dir).count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(e.queries()) >= 20
    assert set(e.oracle_sql()) <= set(e.queries())
