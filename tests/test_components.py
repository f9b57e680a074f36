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


def test_query_path_auto_switches_on_deep_chain(spark):
    """The SHIPPED query path (documents.cluster_documents — what
    doc_dedup_clusters runs on its LSH pairs) must converge on a
    duplication CHAIN far deeper than the label-propagation guard:
    the guard trips after _LP_GUARD_ROUNDS label-sum plateaus fail to
    arrive and the query finishes with the star operator instead of
    silently returning pre-fixpoint labels (the old 50-round cap's
    failure mode)."""
    from finalpipeline_spark.queries.documents import (
        _LP_GUARD_ROUNDS,
        cluster_documents,
    )

    n = 600  # diameter 600 >> guard budget
    assert n > 4 * _LP_GUARD_ROUNDS
    pairs = spark.range(n - 1).selectExpr(
        "id as doc_id_a", "id + 1 as doc_id_b"
    )
    got = cluster_documents(pairs).collect()
    assert len(got) == n
    assert all(r.cluster_id == 0 for r in got)  # one component, min id 0
    assert sorted(r.doc_id for r in got) == list(range(n))
    assert [r.doc_id for r in got if r.is_canonical] == [0]


def test_query_path_matches_star_operator_on_lsh_graph(spark, sf_dir):
    """Guard regression: on the REAL LSH pair graph the propagation
    path (guard not tripped) must still equal the star operator —
    i.e. the auto-switch refactor changed no converged result."""
    from finalpipeline_spark.operators.components import connected_components
    from finalpipeline_spark.queries.documents import (
        cluster_documents,
        doc_dedup_minhash_lsh,
    )

    pairs = doc_dedup_minhash_lsh(spark, sf_dir).select(
        "doc_id_a", "doc_id_b"
    )
    via_query = {
        (r.doc_id, r.cluster_id) for r in cluster_documents(pairs).collect()
    }
    via_star = {
        (r.node, r.component)
        for r in connected_components(
            pairs, src="doc_id_a", dst="doc_id_b"
        ).collect()
    }
    assert via_query == via_star
