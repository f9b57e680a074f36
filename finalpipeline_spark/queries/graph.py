"""Graph-analytics surface: fixed-point PageRank over the nation trade
graph.

The repo already has one iterative graph operator (connected components
for dedup clusters, documents.py); PageRank adds the weighted-influence
family: build a directed graph from relational data, then run a fixed
number of power-iteration rounds entirely as joins + aggregations.

Exactness design — PageRank is usually float math with engine-dependent
summation order, which can never hash-match an oracle.  Here every
iteration is **integer fixed-point**: ranks are scaled by 1e9, each
edge contribution is `floor(85 * r / (100 * outdeg))`, and sums are
exact int64 adds (order-independent).  Floor rounding is part of the
operator's spec, so Spark and DuckDB agree bit-for-bit on every
iteration, not just approximately at the end.  The float `rank` column
is derived by a single IEEE division at output time.

Scale: the expensive part is the edge build (one pass over the fact
join, the TPC-H q7 shape — broadcast dims, single fact shuffle).  The
iterations then run on the *node/edge tables only* (25 nodes, <=125
edges here; V+E rows in general): 3 rounds = 3 small join+agg stages,
independent of fact-table size.  The same unrolled-SQL builder emits
the DuckDB oracle, so iteration count can't drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.functions import dialect as D
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_SCALE = 1_000_000_000  # ranks in nano-units of probability mass
_N_ITER = 3
_TOP_PARTNERS = 5  # out-degree cap: keep each nation's top-5 trade partners

_VIEWS = {
    "lineitem": "__fps_lineitem_gr",
    "orders": "__fps_orders_gr",
    "customer": "__fps_customer_gr",
    "supplier": "__fps_supplier_gr",
    "nation": "__fps_nation_gr",
}


def _t(name: str, dialect: str) -> str:
    return _VIEWS[name] if dialect == D.SPARK else name


def _pagerank_sql(dialect: str) -> str:
    """Unrolled 3-iteration PageRank, damping 0.85, dangling mass
    dropped (the standard 'remove dangling' variant — nations outside
    the top-partner graph keep only the teleport term)."""
    dv = lambda a, b: D.idiv(a, b, dialect)  # noqa: E731
    li, od, cu, su, na = (
        _t("lineitem", dialect),
        _t("orders", dialect),
        _t("customer", dialect),
        _t("supplier", dialect),
        _t("nation", dialect),
    )
    base = _SCALE * 15 // 100 // 25  # teleport term floor(0.15*SCALE/25)
    r0 = _SCALE // 25

    iters = []
    prev = "r0"
    for i in range(1, _N_ITER + 1):
        iters.append(
            f"""r{i} AS (
            SELECT n.node, cast({base} + coalesce(s.contrib, 0) as bigint) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node,
                       cast(sum({dv(f"(85 * p.r)", "(100 * o.od)")}) as bigint) AS contrib
                FROM edges e
                JOIN {prev} p ON e.src = p.node
                JOIN outdeg o ON e.src = o.src
                GROUP BY e.dst
            ) s ON n.node = s.node
        )"""
        )
        prev = f"r{i}"

    return f"""
        WITH nodes AS (
            SELECT n_nationkey AS node, n_name FROM {na}
        ), trade AS (
            SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                   cast(count(*) as bigint) AS w
            FROM {li} l
            JOIN {od} o ON l.l_orderkey = o.o_orderkey
            JOIN {cu} c ON o.o_custkey = c.c_custkey
            JOIN {su} s ON l.l_suppkey = s.s_suppkey
            WHERE s.s_nationkey <> c.c_nationkey
            GROUP BY s.s_nationkey, c.c_nationkey
        ), edges AS (
            SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY w DESC, dst) AS rk
                FROM trade
            ) ranked WHERE rk <= {_TOP_PARTNERS}
        ), outdeg AS (
            SELECT src, cast(count(*) as bigint) AS od FROM edges GROUP BY src
        ), r0 AS (
            SELECT node, cast({r0} as bigint) AS r FROM nodes
        ), {", ".join(iters)}
        SELECT n.n_name AS nation,
               p.r AS rank_fp,
               p.r / cast({_SCALE} as double) AS rank
        FROM r{_N_ITER} p JOIN nodes n ON p.node = n.node
        ORDER BY p.r DESC, n.n_name
    """


@register("nation_pagerank", oracle=_pagerank_sql(D.DUCK), tags=("extension",))
def nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 power iterations, damping 0.85) over the
    supplier-nation → customer-nation trade graph (top-5 partners per
    nation).  All iteration math is exact int64; bit-identical with the
    DuckDB oracle at every round by construction."""
    for name, view in _VIEWS.items():
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
    return spark.sql(_pagerank_sql(D.SPARK))
