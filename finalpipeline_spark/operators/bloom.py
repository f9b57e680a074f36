"""Bloom-filter semi-join prefilter.

The 100 TB join-pruning pattern: the build side's key set is too large
(or too churn-prone) to broadcast as a hash set, but its *bit signature*
— m bits, k hash functions — broadcasts in m/8 bytes.  Probe rows whose
bits aren't all set cannot match and are dropped by a pure bitwise
expression inside the scan stage, before any shuffle; rows that survive
(true matches + ~(1-e^{-kn/m})^k false positives) proceed to the exact
join, so results are identical to the plain join by construction.

Spark's own runtime bloom pruning (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) does this adaptively for shuffle joins; this
operator is the explicit, engine-portable form — the hash is the shared
md5 scheme from ``functions.dialect``, so the same filter could be
evaluated by any engine that can run the SQL expression (and the DuckDB
oracle of `orders_bloom_semi_join` needs no bloom at all: the layer is
result-transparent).

Driver-side state is bounded by the filter geometry, never the data:
``collect()`` here returns at most ``num_bits`` distinct positions
(default 2^16 = 8 KiB of bitmap), regardless of build-side row count.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finalpipeline_spark.functions import dialect as D

DEFAULT_NUM_BITS = 1 << 16
DEFAULT_K = 3


def _position_expr(col: str, seed: int, num_bits: int) -> str:
    """SQL expression: bloom bit position of ``col`` under hash ``seed``
    (the seed is prefixed into the md5 input, same scheme as the CMS
    sketch rows — full avalanche per seed)."""
    keyed = f"concat('{seed}:', cast({col} as string))"
    return f"({D.hex_prefix_to_int(D.md5_hex(keyed, D.SPARK), D.SPARK)} % {num_bits})"


def build_bloom_words(
    build: DataFrame,
    build_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """Distributed bloom build: hash every build key to k bit positions,
    dedupe (distinct positions <= num_bits no matter the input size),
    collect, and pack into int64 words little-endian-by-bit.

    The aggregation is a shuffle onto a keyspace of at most ``num_bits``
    rows; the collect is bounded by the same geometry.
    """
    pos_cols = F.array(
        *[F.expr(_position_expr(build_col, j, num_bits)) for j in range(k)]
    )
    rows = (
        build.select(F.explode(pos_cols).alias("pos")).distinct().collect()
    )
    words = [0] * ((num_bits + 63) // 64)
    for r in rows:
        p = r["pos"]
        words[p >> 6] |= 1 << (p & 63)
    # Two's-complement into signed int64 for Spark's bigint literals.
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    words: list[int],
    probe_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """Membership-test Column over a packed word list: true iff all k
    bits for ``probe_col`` are set.  Pure JVM-side bitwise expression —
    evaluated inside the probe scan's codegen stage, no Python."""
    arr_sql = "array(" + ",".join(f"cast({w} as bigint)" for w in words) + ")"

    def bit_set(j: int) -> Column:
        pos = _position_expr(probe_col, j, num_bits)
        return F.expr(
            f"(element_at({arr_sql}, cast({pos} div 64 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast({pos} % 64 as int))) != 0"
        )

    return functools.reduce(lambda a, b: a & b, [bit_set(j) for j in range(k)])


def bloom_filter_column(
    build: DataFrame,
    build_col: str,
    probe_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """Convenience: build the bloom from ``build[build_col]`` and return
    the membership Column for ``probe_col``."""
    words = build_bloom_words(build, build_col, num_bits=num_bits, k=k)
    return bloom_might_contain(words, probe_col, num_bits=num_bits, k=k)
