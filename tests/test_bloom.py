"""Bloom-filter prefilter: no false negatives ever, pruning actually
happens, and the prefiltered exact join equals the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from finalpipeline_spark.operators.bloom import (
    bloom_might_contain,
    build_bloom_words,
)
from finalpipeline_spark.tables import load_table


def _build_side(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_nationkey") == 7) & (F.col("c_acctbal") > 5000.0))
        .select("c_custkey")
    )


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    build = _build_side(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    words = build_bloom_words(build, "c_custkey")

    survivors = orders.filter(bloom_might_contain(words, "o_custkey"))
    true_matches = orders.join(
        F.broadcast(build), orders.o_custkey == build.c_custkey, "left_semi"
    )

    n_orders = orders.count()
    n_surv = survivors.count()
    n_true = true_matches.count()
    # every true match survives the prefilter (no false negatives)
    missed = true_matches.join(
        survivors.select("o_orderkey"), "o_orderkey", "left_anti"
    ).count()
    assert missed == 0
    # and the filter actually prunes (not a tautology)
    assert n_true <= n_surv < n_orders


def test_bloom_prefiltered_join_equals_plain_join(spark, sf_dir):
    build = _build_side(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    words = build_bloom_words(build, "c_custkey")

    plain = orders.join(
        F.broadcast(build), orders.o_custkey == build.c_custkey, "left_semi"
    )
    pre = orders.filter(bloom_might_contain(words, "o_custkey")).join(
        F.broadcast(build), orders.o_custkey == build.c_custkey, "left_semi"
    )
    assert plain.exceptAll(pre).count() == 0
    assert pre.exceptAll(plain).count() == 0


def test_bloom_tiny_filter_overselects_but_never_drops(spark, sf_dir):
    """With num_bits crushed to 64 the filter saturates: false positives
    abound, but correctness (superset of true matches) still holds —
    the exact join downstream is what guarantees results."""
    build = _build_side(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    words = build_bloom_words(build, "c_custkey", num_bits=64, k=2)

    survivors = orders.filter(
        bloom_might_contain(words, "o_custkey", num_bits=64, k=2)
    )
    true_matches = orders.join(
        F.broadcast(build), orders.o_custkey == build.c_custkey, "left_semi"
    )
    missed = true_matches.join(
        survivors.select("o_orderkey"), "o_orderkey", "left_anti"
    ).count()
    assert missed == 0
    assert survivors.count() >= true_matches.count()


def test_executor_bloom_fold_bit_parity_with_reference_scheme():
    """The SQL-write path's vectorized fold (sources/pyds_write.py
    _bloom_fold_batch) must stay bit-identical to the reference
    per-value scheme of operators/bloom._position_expr — a single
    divergent bit silently breaks point-lookup pruning for SQL-written
    files."""
    import hashlib
    import random

    import pyarrow as pa

    from finalpipeline_spark.sources.pyds_write import _bloom_fold_batch

    def reference_fold(bwords, values, bits, k):
        for v in values:
            if v is None:
                continue
            for j in range(k):
                h = hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:8]
                pos = (int(h, 16) % 2_147_483_648) % bits
                bwords[pos >> 6] |= 1 << (pos & 63)

    rng = random.Random(42)
    bits, k = 1 << 14, 3
    cases = [
        [rng.randrange(-(10**12), 10**12) for _ in range(2000)] + [None] * 7,
        [f"key-{rng.randrange(10**9)}" for _ in range(2000)] + [None] * 3,
        [rng.randrange(20) for _ in range(5000)],  # heavy repeats
        ["", "a", "üñïçødé", "0", "-1"],
        [None, None],
        [],
    ]
    for values in cases:
        nwords = (bits + 63) // 64
        ref, got = [0] * nwords, [0] * nwords
        reference_fold(ref, values, bits, k)
        _bloom_fold_batch(got, pa.array(values), bits, k)
        assert got == ref, f"bit divergence on {values[:5]}..."
