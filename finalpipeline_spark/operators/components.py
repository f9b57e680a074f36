"""Distributed connected components: alternating large-star/small-star.

The min-label-propagation formulation (queries/documents.py
doc_dedup_clusters) converges in O(diameter) rounds — fine for the
near-dup graphs LSH produces (tiny diameters), but a pathological
duplication CHAIN (a → a' → a'' → …, each step within threshold of the
next) has diameter proportional to its length, and a 50-round cap
simply fails on it.  The alternating star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log² n) rounds on ANY graph shape, which is why it is the documented
scale path for cluster formation at 100 TB.

Round shape (all hash-shuffle relational ops, no driver state beyond a
3-number convergence checksum):

  large-star: every node u computes m = min(Γ⁺(u)) over its SYMMETRIC
      neighborhood and re-points every LARGER neighbor v > u at m —
      long chains collapse toward minima from both directions at once.
  small-star: on the now big→small directed edges, every node
      re-points all its smaller neighbors (and itself) at its minimum.

Each round is one groupBy(min) + one broadcast-free equi-join + one
distinct per star; lineage is truncated per round (localCheckpoint, or
reliable checkpoints under spark.finalpipeline.checkpointDir — see
operators/checkpointing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finalpipeline_spark.operators.checkpointing import truncate_lineage


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) pairs (any orientation, no self loops) → every node's
    larger neighbors re-pointed at min(Γ⁺): output edges all satisfy
    u > v."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Directed big→small edges (u > v invariant from _large_star) →
    each node's smaller neighbors and itself re-pointed at its min;
    preserves the u > v invariant."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        e.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return moved.union(self_edges).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Component id (= min node id in the component) for every node
    appearing in ``edges``.  Returns (node, component) with every node
    present, including component minima (component = itself).

    Convergence: the star edge set is a fixed point — detected by an
    unchanged (count, sum(u), sum(v)) checksum, one tiny aggregate per
    round.  Raises after ``max_rounds`` (log²-round convergence means
    30 covers graphs far beyond any physical corpus: 2^(2^~5) nodes).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    e = truncate_lineage(e)  # lazy: materialized by the first round's checksum job
    prev = None
    for _ in range(max_rounds):
        # lazy checkpoint + checksum aggregate = ONE job per round
        e = truncate_lineage(_small_star(_large_star(e)))
        row = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("u").alias("su"),
            F.sum("v").alias("sv"),
        ).first()
        cur = (row["c"], row["su"], row["sv"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # Star-ness audit: in a converged star no edge's target is itself a
    # child (roots never appear on the left).  This turns the
    # astronomically-unlikely checksum collision (identical
    # count/sum/sum for a CHANGED edge set → early break) from a wrong
    # answer into a loud failure.
    non_star = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.v") == F.col("b.u"), "left_semi")
        .count()
    )
    if non_star:
        raise RuntimeError(
            "connected_components convergence checksum collided before a "
            f"fixed point ({non_star} non-star edges) — raise max_rounds"
        )
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    return e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        roots
    )
