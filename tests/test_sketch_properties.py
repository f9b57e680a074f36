"""Property-based sketch invariants (hypothesis over a pure-Python
model of the exact same integer math the SQL emits), plus one Spark
cross-check that pins the model to the engine.

The SQL is deterministic integer arithmetic over md5, so a Python
transcription is *exactly* the engine computation — properties proved
here (mergeability, overestimate-only, no false negatives) hold for
the Spark and DuckDB plans verbatim.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from finalpipeline_spark.functions.hll import M, WBITS

# ---------------------------------------------------------------- model


def _h31(s: str) -> int:
    """md5 hex-prefix fold mod 2^31 — transcription of
    dialect.md5_hex + dialect.hex_prefix_to_int."""
    acc = 0
    for ch in hashlib.md5(s.encode()).hexdigest()[:8]:
        acc = acc * 16 + int(ch, 16)
    return acc % (1 << 31)


def _registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in keys:
        h = _h31(str(k))
        b, w = h % M, h // M
        r = (WBITS + 1) if w == 0 else (WBITS + 1) - w.bit_length()
        regs[b] = max(regs.get(b, 0), r)
    return regs


def _merge(a: dict[int, int], b: dict[int, int]) -> dict[int, int]:
    out = dict(a)
    for k, v in b.items():
        out[k] = max(out.get(k, 0), v)
    return out


def _cms(keys, d=4, w=512) -> dict[tuple[int, int], int]:
    sk: dict[tuple[int, int], int] = {}
    for k in keys:
        for j in range(d):
            b = _h31(f"{j}:{k}") % w
            sk[(j, b)] = sk.get((j, b), 0) + 1
    return sk


def _cms_est(sk, key, d=4, w=512) -> int:
    return min(sk.get((j, _h31(f"{j}:{key}") % w), 0) for j in range(d))


keys_strategy = st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300)


# ----------------------------------------------------------- properties
@settings(max_examples=200, deadline=None)
@given(keys_strategy, keys_strategy)
def test_hll_registers_merge_is_union(a, b):
    """merge(regs(A), regs(B)) == regs(A ∪ B) — the sharding property:
    per-partition sketches combine into exactly the global sketch."""
    assert _merge(_registers(a), _registers(b)) == _registers(a + b)


@settings(max_examples=100, deadline=None)
@given(keys_strategy, keys_strategy)
def test_hll_merge_commutative_and_idempotent(a, b):
    ra, rb = _registers(a), _registers(b)
    assert _merge(ra, rb) == _merge(rb, ra)
    assert _merge(ra, ra) == ra  # re-delivered batch is a no-op


@settings(max_examples=100, deadline=None)
@given(keys_strategy)
def test_hll_registers_insensitive_to_duplicates_and_order(keys):
    """Register state depends only on the key SET — multiplicity and
    arrival order (partial aggregation order) cannot change it."""
    assert _registers(keys) == _registers(sorted(set(keys), reverse=True))


@settings(max_examples=100, deadline=None)
@given(keys_strategy)
def test_cms_never_underestimates(keys):
    sk = _cms(keys)
    from collections import Counter

    for key, true_cnt in Counter(keys).items():
        assert _cms_est(sk, key) >= true_cnt


@settings(max_examples=100, deadline=None)
@given(keys_strategy)
def test_cms_row_moment_bounds_f2(keys):
    """min_j sum_b c_j[b]^2 >= sum_k f(k)^2 (the join-size estimate
    never underestimates)."""
    from collections import Counter

    sk = _cms(keys)
    f2 = sum(c * c for c in Counter(keys).values())
    for j in range(4):
        row = sum(v * v for (rj, _), v in sk.items() if rj == j)
        assert row >= f2


@settings(max_examples=100, deadline=None)
@given(
    keys_strategy,
    st.integers(min_value=6, max_value=12),  # log2(num_bits)
    st.integers(min_value=1, max_value=4),
)
def test_bloom_model_no_false_negatives(keys, log_bits, k):
    """Every inserted key passes the membership test for any filter
    geometry (false positives allowed, false negatives never)."""
    num_bits = 1 << log_bits
    bits = set()
    for key in keys:
        for j in range(k):
            bits.add(_h31(f"{j}:{key}") % num_bits)
    for key in keys:
        assert all(_h31(f"{j}:{key}") % num_bits in bits for j in range(k))


# ------------------------------------------------- engine cross-check
def test_python_model_matches_spark_registers(spark, sf_dir):
    """Pin the model to the engine: hll_registers over real data must
    equal the Python transcription bucket-for-bucket."""
    from finalpipeline_spark.functions.hll import hll_registers
    from finalpipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey").limit(5000)
    spark_regs = {
        r["bucket"]: r["mr"] for r in hll_registers(li, "l_partkey").collect()
    }
    py_regs = _registers([r["l_partkey"] for r in li.collect()])
    assert spark_regs == py_regs
