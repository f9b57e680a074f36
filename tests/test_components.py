"""Alternating-star connected components (operators/components.py):
the O(log² n)-round scale path for dedup cluster formation, vs the
O(diameter) min-label propagation it backs up."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finalpipeline_spark.operators.components import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node of each component
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return {(n, c) for n, c in comp.items()}


def test_high_diameter_chain_converges_in_log_rounds(spark):
    """A 5000-link duplication chain has diameter 5000 — min-label
    propagation's 50-round cap cannot close it; the star algorithm
    must, in O(log²) rounds."""
    n = 5000
    edges = spark.range(0, n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    got = connected_components(edges, max_rounds=20)
    rows = got.collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}
    assert {r["node"] for r in rows} == set(range(n))


def test_matches_union_find_on_random_graph(spark):
    """Differential vs a driver-side union-find on a pseudo-random
    multi-component graph (deterministic LCG edges)."""
    pairs = []
    x = 12345
    for _ in range(1500):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 900
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 900
        if a != b:
            pairs.append((a, b))
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    assert got == _union_find(pairs)


def test_matches_label_propagation_clusters(spark, sf_dir):
    """On the real LSH near-dup pair graph the star algorithm must
    reproduce doc_dedup_clusters' (doc_id, cluster_id) assignment
    exactly — same components, same min-id canonical labels."""
    from finalpipeline_spark.queries.documents import (
        doc_dedup_clusters,
        doc_dedup_minhash_lsh,
    )

    pairs = doc_dedup_minhash_lsh(spark, sf_dir).select("doc_id_a", "doc_id_b")
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs, "doc_id_a", "doc_id_b").collect()
    }
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in doc_dedup_clusters(spark, sf_dir).collect()
    }
    assert got == want


def test_isolated_pair_and_self_loop_handling(spark):
    edges = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 1), (9, 8)], "src long, dst long"
    )
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    # the self loop contributes no component; duplicates collapse
    assert got == {(1, 1), (2, 1), (8, 8), (9, 8)}


def test_nonconvergence_raises(spark):
    edges = spark.range(0, 200).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=1)
