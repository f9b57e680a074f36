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
join, the TPC-H q7 shape — broadcast dims, single fact shuffle).
Because Spark re-evaluates a CTE at every reference (no automatic
materialization, unlike DuckDB), the Spark path materializes the edge
and out-degree tables ONCE via localCheckpoint before iterating — the
plan gate test asserts the fact table is scanned at most once.  The
iterations then run on the node/edge tables only (25 nodes, <=125
edges here; V+E rows in general): 3 rounds = 3 small join+agg stages,
independent of fact-table size.  The same iteration-SQL builder emits
the DuckDB oracle (single statement: DuckDB materializes CTEs), so
iteration count and math can't drift between engines.
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
_NODES_VIEW = "__fps_pr_nodes"
_EDGES_VIEW = "__fps_pr_edges"
_OUTDEG_VIEW = "__fps_pr_outdeg"


def _t(name: str, dialect: str) -> str:
    return _VIEWS[name] if dialect == D.SPARK else name


def _nodes_sql(dialect: str) -> str:
    return f"SELECT n_nationkey AS node, n_name FROM {_t('nation', dialect)}"


def _edges_sql(dialect: str) -> str:
    """Directed edge list: supplier nation → customer nation, top-5
    partners per source by lineitem count (nationkey tiebreak)."""
    li, od, cu, su = (
        _t("lineitem", dialect),
        _t("orders", dialect),
        _t("customer", dialect),
        _t("supplier", dialect),
    )
    return f"""
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rk
            FROM (
                SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                       cast(count(*) as bigint) AS w
                FROM {li} l
                JOIN {od} o ON l.l_orderkey = o.o_orderkey
                JOIN {cu} c ON o.o_custkey = c.c_custkey
                JOIN {su} s ON l.l_suppkey = s.s_suppkey
                WHERE s.s_nationkey <> c.c_nationkey
                GROUP BY s.s_nationkey, c.c_nationkey
            ) trade
        ) ranked WHERE rk <= {_TOP_PARTNERS}
    """


def _outdeg_sql(edges: str) -> str:
    return f"SELECT src, cast(count(*) as bigint) AS od FROM {edges} GROUP BY src"


def _iterate_sql(nodes: str, edges: str, outdeg: str, dialect: str) -> str:
    """The unrolled 3-iteration body over (already-built) node/edge
    relations — shared verbatim between Spark (views) and DuckDB
    (CTE names)."""
    dv = lambda a, b: D.idiv(a, b, dialect)  # noqa: E731
    base = _SCALE * 15 // 100 // 25  # teleport term floor(0.15*SCALE/25)
    r0 = _SCALE // 25

    iters = []
    prev = "r0"
    for i in range(1, _N_ITER + 1):
        iters.append(
            f"""r{i} AS (
            SELECT n.node, cast({base} + coalesce(s.contrib, 0) as bigint) AS r
            FROM {nodes} n LEFT JOIN (
                SELECT e.dst AS node,
                       cast(sum({dv("(85 * p.r)", "(100 * o.od)")}) as bigint) AS contrib
                FROM {edges} e
                JOIN {prev} p ON e.src = p.node
                JOIN {outdeg} o ON e.src = o.src
                GROUP BY e.dst
            ) s ON n.node = s.node
        )"""
        )
        prev = f"r{i}"

    return f"""
        WITH r0 AS (
            SELECT node, cast({r0} as bigint) AS r FROM {nodes}
        ), {", ".join(iters)}
        SELECT n.n_name AS nation,
               p.r AS rank_fp,
               p.r / cast({_SCALE} as double) AS rank
        FROM r{_N_ITER} p JOIN {nodes} n ON p.node = n.node
        ORDER BY p.r DESC, n.n_name
    """


def _pagerank_oracle() -> str:
    """Single-statement DuckDB form: edge build + iterations as CTEs
    (DuckDB materializes each CTE once)."""
    return f"""
        WITH nodes AS ({_nodes_sql(D.DUCK)}),
        edges AS ({_edges_sql(D.DUCK)}),
        outdeg AS ({_outdeg_sql("edges")}),
        body AS (
            {_iterate_sql("nodes", "edges", "outdeg", D.DUCK)}
        )
        SELECT * FROM body
    """


@register("nation_pagerank", oracle=_pagerank_oracle(), tags=("extension",))
def nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 power iterations, damping 0.85) over the
    supplier-nation → customer-nation trade graph (top-5 partners per
    nation).  The Spark path materializes edges/out-degrees once
    (localCheckpoint — they are V+E-sized, not fact-sized) so the fact
    join runs exactly once; iterations touch only the materialized
    graph.  All iteration math is exact int64 — bit-identical with the
    DuckDB oracle at every round by construction."""
    for name, view in _VIEWS.items():
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
    spark.sql(_nodes_sql(D.SPARK)).createOrReplaceTempView(_NODES_VIEW)
    edges = spark.sql(_edges_sql(D.SPARK)).localCheckpoint(eager=True)
    edges.createOrReplaceTempView(_EDGES_VIEW)
    spark.sql(_outdeg_sql(_EDGES_VIEW)).localCheckpoint(
        eager=True
    ).createOrReplaceTempView(_OUTDEG_VIEW)
    return spark.sql(_iterate_sql(_NODES_VIEW, _EDGES_VIEW, _OUTDEG_VIEW, D.SPARK))


# --------------------------------------------------------------------------
# Triangle counting (clustering-structure analytics)
# --------------------------------------------------------------------------
_TRI_EDGES_VIEW = "__fps_tri_edges"


def _und_edges_sql(edges: str) -> str:
    """Undirected edge set from the directed trade edges: canonical
    (u < v) orientation + DISTINCT. Orienting every edge low→high is
    the standard trick that makes each triangle countable exactly once
    as u < v < w (and at scale also bounds the join fan-out the way
    degree-ordering does in the MR triangle algorithm)."""
    return f"""
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM {edges} WHERE src <> dst
    """


def _triangles_sql(nodes: str, und: str) -> str:
    """Per-node triangle participation from an (already-built)
    canonical edge relation.

    tri = wedges (u<v<w sharing u) closed by the (v,w) edge — two
    self-joins of the edge table, both equi-joins that shuffle on edge
    endpoints; per-node counts = each triangle credited to its three
    corners via UNION ALL (no explode needed).  Edge relation is
    E-sized, so this never touches the fact table.
    """
    return f"""
        tri AS (
            SELECT a.u AS x, a.v AS y, b.v AS z
            FROM {und} a
            JOIN {und} b ON a.u = b.u AND a.v < b.v
            JOIN {und} c ON c.u = a.v AND c.v = b.v
        ),
        corners AS (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ),
        per_node AS (
            SELECT node, cast(count(*) as bigint) AS n_triangles
            FROM corners GROUP BY node
        )
        SELECT n.n_name AS nation,
               cast(coalesce(p.n_triangles, 0) as bigint) AS n_triangles
        FROM {nodes} n LEFT JOIN per_node p ON n.node = p.node
    """


def _triangle_oracle() -> str:
    return f"""
        WITH nodes AS ({_nodes_sql(D.DUCK)}),
        edges AS ({_edges_sql(D.DUCK)}),
        und AS ({_und_edges_sql("edges")}),
        {_triangles_sql("nodes", "und")}
    """


@register("nation_triangle_count", oracle=_triangle_oracle(), tags=("extension",))
def nation_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation count per nation over the undirected
    trade graph (same edge build as nation_pagerank: top-5 partners
    per nation).  The canonical u<v edge relation is materialized once
    (localCheckpoint, E-sized) so the fact-table join runs exactly
    once; the two triangle-closing self-joins and the per-corner count
    run on the E-sized relation only.  All-integer — trivially
    bit-identical with the oracle."""
    for name, view in _VIEWS.items():
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
    spark.sql(_nodes_sql(D.SPARK)).createOrReplaceTempView(_NODES_VIEW)
    und = spark.sql(
        _und_edges_sql(f"({_edges_sql(D.SPARK)})")
    ).localCheckpoint(eager=True)
    und.createOrReplaceTempView(_TRI_EDGES_VIEW)
    return spark.sql(f"WITH {_triangles_sql(_NODES_VIEW, _TRI_EDGES_VIEW)}")


# --------------------------------------------------------------------------
# Single-source shortest paths (unrolled BFS)
# --------------------------------------------------------------------------
_BFS_SRC = 0        # source node (nationkey 0)
_BFS_ROUNDS = 3
_BFS_EDGES_VIEW = "__fps_bfs_edges"


def _bfs_round_sql(prev: str, edges: str) -> str:
    """One BFS relaxation: known distances ∪ (neighbor, dist+1) via one
    equi-join, folded by min per node. All-integer, so every round is
    engine-identical — the iterative-algorithm pattern shared with
    nation_pagerank (joins + aggregations, O(V+E) per round)."""
    return f"""
        SELECT node, cast(min(dist) as bigint) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS node, d.dist + 1 AS dist
            FROM {prev} d JOIN {edges} e ON e.src = d.node
        ) u GROUP BY node
    """


def _bfs_sql(nodes: str, edges: str) -> str:
    rounds = [f"d0 AS (SELECT cast({_BFS_SRC} as bigint) AS node, cast(0 as bigint) AS dist)"]
    for i in range(1, _BFS_ROUNDS + 1):
        rounds.append(f"d{i} AS ({_bfs_round_sql(f'd{i-1}', edges)})")
    return f"""
        WITH {', '.join(rounds)}
        SELECT n.n_name AS nation,
               d.dist AS hops
        FROM {nodes} n LEFT JOIN d{_BFS_ROUNDS} d ON n.node = d.node
    """


def _bfs_oracle() -> str:
    return f"""
        WITH nodes AS ({_nodes_sql(D.DUCK)}),
        edges AS ({_edges_sql(D.DUCK)}),
        bfs AS ({_bfs_sql("nodes", "edges")})
        SELECT * FROM bfs
    """


@register("nation_shortest_paths", oracle=_bfs_oracle(), tags=("extension",))
def nation_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from nation 0 to every nation along directed trade
    edges, {_BFS_ROUNDS} unrolled BFS relaxations (NULL = unreachable
    within the horizon). Same edge build as nation_pagerank; the edge
    relation is materialized once (localCheckpoint, E-sized) so the
    fact join runs exactly once, and each round is one E-sized join +
    V-sized min — O(V+E) per round regardless of fact size.
    All-integer → bit-identical with the oracle at every round."""
    for name, view in _VIEWS.items():
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
    spark.sql(_nodes_sql(D.SPARK)).createOrReplaceTempView(_NODES_VIEW)
    spark.sql(_edges_sql(D.SPARK)).localCheckpoint(
        eager=True
    ).createOrReplaceTempView(_BFS_EDGES_VIEW)
    return spark.sql(f"SELECT * FROM ({_bfs_sql(_NODES_VIEW, _BFS_EDGES_VIEW)}) b")
