"""Measured accuracy of the approx-sketch deployment twins at sf0.1
(VERDICT r4 item 4): the "documented error bound" claims are asserted
against the exact rank formulation at bench scale, not just stated in
docstrings.

GK/percentile_approx guarantee: for accuracy ``a`` (ε = 1/a), the
returned value v for quantile q has SOME rank r with
|r − q·n| ≤ ε·n.  With duplicate values that means
    count_lt(v) ≤ q·n + ε·n   and   count_le(v) ≥ q·n − ε·n
which is the form asserted here (tie-safe on both sides).
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from finalpipeline_spark.tables import load_table

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

needs_sf01 = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata absent"
)


def _rank_bounds(df, group_col, value_col, picks):
    """For each (group, quantile, approx value) in ``picks`` return
    (n, count_lt, count_le) computed in one pass over ``df``."""
    rows = []
    by_group = {}
    for g, q, v in picks:
        by_group.setdefault(g, []).append((q, v))
    stats = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    conds = []
    for g, qs in by_group.items():
        for i, (q, v) in enumerate(qs):
            conds.append(
                F.sum(
                    F.when(
                        (F.col(group_col) == g) & (F.col(value_col) < v), 1
                    ).otherwise(0)
                ).alias(f"lt_{g}_{i}")
            )
            conds.append(
                F.sum(
                    F.when(
                        (F.col(group_col) == g) & (F.col(value_col) <= v), 1
                    ).otherwise(0)
                ).alias(f"le_{g}_{i}")
            )
    agg = df.agg(*conds).collect()[0]
    for g, qs in by_group.items():
        for i, (q, v) in enumerate(qs):
            rows.append((g, q, v, stats[g], agg[f"lt_{g}_{i}"], agg[f"le_{g}_{i}"]))
    return rows


@needs_sf01
def test_gk_quantiles_within_bound_and_exact_at_documented_accuracy(spark):
    """lineitem_approx_quantiles ships accuracy=2e6, documented as
    'εn < 1 at this scale → degenerates to the exact discrete
    quantile'. Measure that claim at sf0.1: the rank error must be < 1
    row, i.e. the sketch value IS a discrete q-quantile."""
    li = load_table(spark, SF01, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    qs = [0.5, 0.95, 0.99]
    acc = 2_000_000
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", qs, acc).alias("qv")
    )
    picks = [
        (r["l_returnflag"], q, r["qv"][i])
        for r in approx.collect()
        for i, q in enumerate(qs)
    ]
    checked = 0
    for g, q, v, n, lt, le in _rank_bounds(
        li, "l_returnflag", "l_extendedprice", picks
    ):
        eps_n = n / acc
        assert eps_n < 1, f"test premise broken: εn={eps_n} for flag {g}"
        # exact discrete quantile: target rank ceil(q·n) ∈ (lt, le]
        target = math.ceil(q * n)
        assert lt < target <= le, (
            f"flag {g} q={q}: approx value rank window ({lt}, {le}] "
            f"misses exact target {target} (n={n})"
        )
        checked += 1
    assert checked == 3 * len(qs)


@needs_sf01
def test_mad_deployment_median_within_gk_bound(spark):
    """events_mad_outliers documents 'at petabyte scale the same report
    runs on approx_percentile'. Measure that deployment path at sf0.1
    with a genuinely lossy accuracy (10_000 → εn > 1 per type): the
    approx median must land within the GK ±εn rank window of the true
    median for every event type."""
    ev = (
        load_table(spark, SF01, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    acc = 10_000
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, acc).alias("med")
    )
    picks = [(r["event_type"], 0.5, r["med"]) for r in approx.collect()]
    assert picks
    for g, q, v, n, lt, le in _rank_bounds(ev, "event_type", "value", picks):
        eps_n = n / acc
        lo, hi = q * n - eps_n, q * n + eps_n
        assert lt <= hi and le >= lo, (
            f"type {g}: approx median rank window ({lt}, {le}] outside "
            f"GK bound [{lo}, {hi}] (n={n}, εn={eps_n})"
        )
