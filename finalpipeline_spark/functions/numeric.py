"""Numeric helpers shared by operators and oracle SQL.

``isclose`` reproduces numpy's tolerance-equality used by the
reference's tie detector (reference datamart.py:33-39: np.isclose with
defaults rtol=1e-5, atol=1e-8 — NOT the 1e-9 the reference readme
claims; SURVEY.md §4 "known bugs").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RTOL = 1e-5
ATOL = 1e-8


def isclose(x: Column, v: Column, rtol: float = RTOL, atol: float = ATOL) -> Column:
    """np.isclose(x, v): |x - v| <= atol + rtol * |v| (no NaN handling)."""
    return F.abs(x - v) <= (F.lit(atol) + F.lit(rtol) * F.abs(v))


def isclose_sql(x: str, v: str, rtol: float = RTOL, atol: float = ATOL) -> str:
    """Same predicate as a SQL fragment (valid in Spark SQL and DuckDB)."""
    return f"(abs(({x}) - ({v})) <= {atol!r} + {rtol!r} * abs({v}))"


def r(col: Column, digits: int = 6) -> Column:
    """Round a double for cross-engine hash stability.

    Spark and DuckDB sum floating point in different orders; rounding
    the *output* (never intermediates) to a fixed precision makes the
    oracle comparison exact while keeping ~1e-6 fidelity.

    Use ONLY for genuinely order-dependent float aggregates. For
    money-scale columns use the exact_* helpers below (bit-identical,
    no rounding), and for expressions evaluated identically in both
    engines emit the raw double — round() itself is a divergence risk
    at half-point values (Spark rounds the shortest decimal repr
    HALF_UP; DuckDB rounds the binary double).
    """
    return F.round(col.cast("double"), digits)


# --------------------------------------------------------------------------
# Exact fixed-point aggregation.
#
# Every money-like testdata column is 2-decimal-exact (probed), products
# with (1-discount)/(1+tax) are 4/6-decimal-exact. Summing them as scaled
# bigints is exact in ANY order — Spark's partial aggregation and
# DuckDB's sequential sum produce the same integer, and the final
# integer/10^s division is one identical IEEE op in both engines.
# Scale guard: |x|*10^s * rows must stay < 2^63 (fine through sf1).
# --------------------------------------------------------------------------
def exact_sum(col: Column, decimals: int) -> Column:
    scale = 10**decimals
    return F.sum(F.round(col * scale).cast("long")) / F.lit(float(scale))


def exact_avg(col: Column, decimals: int) -> Column:
    """Null-skipping mean (sum over non-null / count of non-null)."""
    return exact_sum(col, decimals) / F.count(col)


def exact_sum_sql(expr: str, decimals: int) -> str:
    scale = 10**decimals
    return (
        f"(cast(sum(cast(round(({expr}) * {scale}) as bigint)) as bigint)"
        f" / {float(scale)!r})"
    )


def exact_avg_sql(expr: str, decimals: int) -> str:
    return f"({exact_sum_sql(expr, decimals)} / count({expr}))"
