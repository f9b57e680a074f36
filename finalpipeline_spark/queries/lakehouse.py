"""Driver-attestable queries over the versioned lakehouse SQL surface.

The versioned table (sources/versioned.py) and its Python DataSource
(sources/pyds.py) are pytest-covered in depth, but the external
driver's oracle gate can only see ``queries()`` entries — so these two
queries exercise the SQL-only surface end-to-end against the standard
``orders`` table: build a small versioned table from deterministic
slices of orders, then consume it through PURE ``spark.sql`` views
(``USING versioned`` — Delta option parity), and aggregate to an
exactly-reproducible result the DuckDB oracle mirrors straight off the
parquet.

Scale shape: the versioned-table side is manifest-planned (no
directory listing), the CDF feed reads exactly the per-commit file
diff, and the final aggregates are plain partial-agg shuffles. The
staging writes are bounded by the orders slice — this is a correctness
harness for the lakehouse surface, not a benchmark path.

Each call stages into a fresh ``tempfile.mkdtemp`` dir (a few MB at
driver scale) that lives until /tmp is cleaned: the returned DataFrame
stays lazily bound to it, so the query must not delete it.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions.frames import local_df
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table

_ERA_1 = "1995-01-01"
_ERA_2 = "1996-06-01"


def _stage_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Three deterministic era commits of the orders slice → a fresh
    versioned table root. Commit version == era by construction."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="fps_lakehouse_") + "/orders_vt"
    t = VersionedTable(spark, root)
    t.commit_overwrite(orders.filter(F.col("o_orderdate") < _ERA_1))
    t.commit_append(
        orders.filter(
            (F.col("o_orderdate") >= _ERA_1) & (F.col("o_orderdate") < _ERA_2)
        )
    )
    t.commit_append(orders.filter(F.col("o_orderdate") >= _ERA_2))
    return root


@register(
    "versioned_sql_table_changes",
    oracle=f"""
        SELECT cast(era AS bigint) AS era,
               o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM (
            SELECT CASE WHEN o_orderdate < '{_ERA_1}' THEN 0
                        WHEN o_orderdate < '{_ERA_2}' THEN 1
                        ELSE 2 END AS era,
                   o_orderpriority, o_totalprice
            FROM orders
        )
        GROUP BY era, o_orderpriority
        ORDER BY era, o_orderpriority
    """,
    tags=("extension",),
)
def versioned_sql_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch change feed through the PURE-SQL surface: orders staged as
    three era commits, consumed via ``CREATE TEMPORARY VIEW ... USING
    versioned OPTIONS (changeFeed 'true', startingVersion '0')`` —
    Delta's readChangeFeed contract — and aggregated per commit. The
    oracle recomputes the same eras straight from the parquet: equality
    proves the SQL CDF view delivers exactly each commit's rows, tagged
    with the right ``_commit_version``. (Reference users consume
    everything through SQL views — ref dags/views_p1.py — so the
    lakehouse layer must be reachable without one Python import.)"""
    root = _stage_orders_table(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW __fps_sql_cdf USING versioned "
        f"OPTIONS (root '{root}', changeFeed 'true', startingVersion '0')"
    )
    return spark.sql(
        """
        SELECT _commit_version AS era,
               o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_sql_cdf
        WHERE _change_type = 'insert'
        GROUP BY era, o_orderpriority
        ORDER BY era, o_orderpriority
        """
    )


@register(
    "versioned_sql_time_travel",
    oracle=f"""
        SELECT o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM orders
        WHERE o_orderdate < '{_ERA_2}'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("extension",),
)
def versioned_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF consumed through a snapshot view: the staged table
    read back at version 1 — i.e. before the era-2 append — and
    aggregated via ``spark.sql``. The view is served by the engine's
    plain-snapshot fast path (sources/pyds.snapshot_view): no deletion
    vectors or column mappings are pending, so the scan is a NATIVE
    parquet FileScan over the manifest's file list instead of the
    Python DataSource (whose per-query worker plumbing and Arrow
    boundary the raw ``USING versioned`` SQL form pays; that form
    stays driven end-to-end by tests/test_sql_surface.py). The oracle
    filters the parquet to the first two eras: equality proves time
    travel reads exactly the version-1 snapshot."""
    from finalpipeline_spark.sources.pyds import snapshot_view

    root = _stage_orders_table(spark, sf_dir)
    snapshot_view(spark, "__fps_sql_tt", root, version=1)
    return spark.sql(
        """
        SELECT o_orderpriority,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_sql_tt
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "versioned_identity_generated",
    oracle=f"""
        WITH base AS (
            SELECT count(*) AS n,
                   cast(sum(cast(round(o_totalprice * 100) AS bigint))
                        AS bigint) AS cents
            FROM orders
        )
        SELECT 'cents_total' AS stat, cents AS value FROM base
        UNION ALL SELECT 'n_rows', cast(n AS bigint) FROM base
        UNION ALL SELECT 'rid_distinct', cast(n AS bigint) FROM base
        UNION ALL SELECT 'rid_above_start', cast(n AS bigint) FROM base
        UNION ALL SELECT 'rid_step_aligned', cast(n AS bigint) FROM base
        UNION ALL SELECT 'gen_consistent', cast(n AS bigint) FROM base
        UNION ALL SELECT 'batch2_above_batch1', 1
        ORDER BY stat
    """,
    tags=("extension",),
)
def versioned_identity_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver attestation of IDENTITY + GENERATED columns: stage two
    era commits of orders into a table whose ``rid`` the ENGINE assigns
    (start 1000, step 3) and whose ``cents`` is GENERATED ALWAYS AS
    round(o_totalprice*100). Identity VALUES are engine-assigned
    (block-allocated, gaps allowed) so the oracle checks their
    PROVABLE invariants instead: every row got a distinct rid, all at
    or above start, all step-aligned, the second commit's ids strictly
    above the first's, and the generated column equal to its expression
    on every row — each reported as a count the DuckDB oracle derives
    straight from the parquet slice. Exact-integer throughout."""
    from finalpipeline_spark.sources.versioned import VersionedTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="fps_identgen_") + "/orders_id"
    t = VersionedTable(spark, root)
    t.commit_overwrite(orders.limit(0))
    t.add_identity_column("rid", start=1000, step=3)
    t.add_generated_column(
        "cents", "bigint", "cast(round(o_totalprice * 100) as bigint)"
    )
    b1 = orders.filter(F.col("o_orderdate") < _ERA_2)
    b2 = orders.filter(F.col("o_orderdate") >= _ERA_2)
    t.commit_append(b1)
    v1_max = t.read().agg(F.max("rid")).first()[0]
    t.commit_append(b2)
    snap = t.read()
    row = snap.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rid").alias("nd"),
        F.sum((F.col("rid") >= 1000).cast("bigint")).alias("above"),
        F.sum((((F.col("rid") - 1000) % 3) == 0).cast("bigint")).alias("aligned"),
        F.sum(
            F.col("cents").eqNullSafe(
                F.expr("cast(round(o_totalprice * 100) as bigint)")
            ).cast("bigint")
        ).alias("gen_ok"),
        F.sum("cents").alias("cents_total"),
        F.min(F.when(F.col("o_orderdate") >= _ERA_2, F.col("rid"))).alias(
            "b2_min"
        ),
    ).first()
    rows = [
        ("batch2_above_batch1", 1 if row["b2_min"] > v1_max else 0),
        ("cents_total", int(row["cents_total"])),
        ("gen_consistent", int(row["gen_ok"])),
        ("n_rows", int(row["n"])),
        ("rid_above_start", int(row["above"])),
        ("rid_distinct", int(row["nd"])),
        ("rid_step_aligned", int(row["aligned"])),
    ]
    return local_df(spark, rows, "stat string, value bigint")


@register(
    "versioned_sql_dml_roundtrip",
    oracle="""
        SELECT c_mktsegment,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(
                   (c_acctbal + CASE WHEN c_custkey % 2 = 0
                                     THEN 1000 ELSE 0 END) * 100
               ) AS bigint)) AS bigint) AS sum_cents
        FROM customer
        WHERE c_mktsegment <> 'BUILDING'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("extension",),
)
def versioned_sql_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 SQL WRITE surface, attested end-to-end in one flow (the
    reference persona writes SQL text — ref views_p1.py — and could
    previously only READ through it):

    1. **Native ``INSERT INTO <USING versioned view>``** — routed
       through the Python DataSource writer (sources/pyds_write.py):
       executor tasks stream Arrow batches into fresh data files, the
       driver hook CAS-claims the next version with the os-primitive
       twin of the JVM commit protocol.
    2. **``versioned_sql`` MERGE** — matched UPDATE + NOT MATCHED
       INSERT * parsed from SQL text and run through the Spark-side
       MERGE (one CoW commit, file-pruned join).
    3. **``versioned_sql`` DELETE** — predicate delete, CoW.

    Data plan: base = customers with custkey % 3 != 0 (Python-API
    seed); native SQL INSERT adds the odd multiples of 3; the MERGE
    source is every even customer with acctbal+1000 (evens present
    get the UPDATE, even multiples of 3 absent get the INSERT), so
    after the merge ALL customers are present, evens at +1000; the
    DELETE then drops segment BUILDING. The DuckDB oracle reconstructs
    exactly that final state from the raw parquet — equality proves
    all three write paths landed exactly-once with the right rows.
    Double math (bal + 1000) * 100 uses the same expression tree in
    both engines (bit-identical IEEE), summed as exact bigint cents."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.sql_dml import versioned_sql
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="fps_sqldml_") + "/cust_vt"
    t = VersionedTable(spark, root)
    t.commit_overwrite(cust.filter("c_custkey % 3 != 0"))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW __fps_dml USING versioned "
        f"OPTIONS (root '{root}')"
    )
    cust.createOrReplaceTempView("__fps_dml_cust")
    # 1. native V2 write path (engine-less hooks, CAS claim)
    spark.sql(
        "INSERT INTO __fps_dml SELECT c_custkey, c_acctbal, c_mktsegment "
        "FROM __fps_dml_cust WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 1"
    )
    # 2. full-fidelity MERGE from SQL text (Spark-side semantics)
    spark.sql(
        "SELECT c_custkey, c_acctbal + 1000 AS c_acctbal, c_mktsegment "
        "FROM __fps_dml_cust WHERE c_custkey % 2 = 0"
    ).createOrReplaceTempView("__fps_dml_src")
    versioned_sql(
        spark,
        """MERGE INTO __fps_dml AS t USING __fps_dml_src AS s
           ON t.c_custkey = s.c_custkey
           WHEN MATCHED THEN UPDATE SET c_acctbal = s.c_acctbal
           WHEN NOT MATCHED THEN INSERT *""",
    )
    # 3. predicate DELETE from SQL text
    versioned_sql(spark, "DELETE FROM __fps_dml WHERE c_mktsegment = 'BUILDING'")
    # All writes are committed: rebind the view to the final snapshot so
    # the read is a native parquet scan (plain snapshot — the CoW delete
    # rewrote its hit files, no DVs/cmaps pending). The INSERT above
    # already attested the live USING-versioned view's write path.
    from finalpipeline_spark.sources.pyds import snapshot_view

    snapshot_view(spark, "__fps_dml", root)
    return spark.sql(
        """
        SELECT c_mktsegment,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_dml
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@register(
    "versioned_sql_alter_roundtrip",
    oracle="""
        SELECT band,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(s_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM (
            SELECT CASE WHEN s_acctbal >= 5000 THEN 'high' ELSE 'low' END
                       AS band,
                   s_acctbal
            FROM supplier
            UNION ALL
            SELECT 'high' AS band, s_acctbal + 111.0 AS s_acctbal
            FROM supplier
            WHERE s_suppkey % 10 = 0
        )
        GROUP BY band
        ORDER BY band
    """,
    tags=("extension",),
)
def versioned_sql_alter_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 SQL ALTER TABLE surface, attested end-to-end in one
    flow — the SQL-only persona (reference views_p1.py writes SQL
    text) can now EVOLVE tables, not just write them:

    1. **CTAS** bootstraps the table from the supplier slice.
    2. **ADD COLUMN** (metadata-only NULL backfill), then a SQL
       **UPDATE** fills it (CoW rewrite under the widened schema).
    3. **ADD COLUMNS** multi-add + **ALTER COLUMN TYPE** lossless
       widening + **DROP COLUMN** — all metadata-only commits.
    4. **RENAME COLUMN** via entry-level column mapping: the UPDATE's
       rewritten files carry the old physical name; the final read
       must serve their values under the new name through cmap.
    5. **ADD CONSTRAINT** (validation scan) — the closing INSERT then
       runs under full engine enforcement via ``versioned_sql``.

    The DuckDB oracle reconstructs the identical final state straight
    from the parquet: equality proves every evolution commit changed
    exactly the metadata it claims and no byte of data was lost or
    duplicated on the way. Money math sums exact bigint cents."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.sql_dml import versioned_sql
    from finalpipeline_spark.sources.versioned import VersionedTable  # noqa: F401

    register_versioned_source(spark)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", "s_nationkey"
    )
    root = tempfile.mkdtemp(prefix="fps_alter_") + "/supp_vt"
    supp.createOrReplaceTempView("__fps_alter_supp")
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{root}` AS "
        "SELECT s_suppkey, s_acctbal, s_nationkey FROM __fps_alter_supp",
    )
    tgt = f"versioned.`{root}`"
    versioned_sql(spark, f"ALTER TABLE {tgt} ADD COLUMN tier string")
    versioned_sql(
        spark,
        f"UPDATE {tgt} SET tier = CASE WHEN s_acctbal >= 5000 "
        "THEN 'high' ELSE 'low' END",
    )
    versioned_sql(
        spark, f"ALTER TABLE {tgt} ADD COLUMNS (flag int, note string)"
    )
    versioned_sql(spark, f"ALTER TABLE {tgt} ALTER COLUMN flag TYPE bigint")
    versioned_sql(spark, f"ALTER TABLE {tgt} DROP COLUMN note")
    versioned_sql(spark, f"ALTER TABLE {tgt} RENAME COLUMN tier TO band")
    versioned_sql(
        spark,
        f"ALTER TABLE {tgt} ADD CONSTRAINT band_valid "
        "CHECK (band IN ('high', 'low'))",
    )
    versioned_sql(
        spark,
        f"INSERT INTO {tgt} (s_suppkey, s_acctbal, s_nationkey, band) "
        "SELECT s_suppkey + 1000000, s_acctbal + 111.0, s_nationkey, 'high' "
        "FROM __fps_alter_supp WHERE s_suppkey % 10 = 0",
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW __fps_alter_v USING versioned "
        f"OPTIONS (root '{root}')"
    )
    return spark.sql(
        """
        SELECT band,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(s_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_alter_v
        GROUP BY band
        ORDER BY band
        """
    )


@register(
    "versioned_cdc_rename_feed",
    oracle="""
        SELECT v, ct,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(price * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM (
            SELECT cast(1 AS bigint) AS v, 'insert' AS ct,
                   p_retailprice AS price
            FROM part WHERE p_partkey % 3 = 1
            UNION ALL
            SELECT cast(3 AS bigint) AS v, 'insert' AS ct,
                   p_retailprice AS price
            FROM part WHERE p_partkey % 3 = 2
            UNION ALL
            SELECT cast(4 AS bigint) AS v, 'delete' AS ct,
                   p_retailprice AS price
            FROM part WHERE p_size < 10
        )
        GROUP BY v, ct
        ORDER BY v, ct
    """,
    tags=("extension",),
)
def versioned_cdc_rename_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 CDC-across-rename, attested end-to-end: a row-level
    change feed whose range crosses an ``ALTER TABLE RENAME COLUMN``
    serves in the TARGET version's logical schema instead of refusing
    (sources/versioned.py read_changes_rows + _remap_ops).

    Flow: part staged as two era appends AROUND a rename
    (p_retailprice → price), then a CoW predicate delete. The feed
    from version 0 must emit (a) era-1 inserts — PRE-rename files —
    with their values under the POST-rename name via the forward
    column-mapping alignment, (b) era-2 inserts natively, and (c) the
    delete commit's rows = exactly the predicate matches, including
    pre-rename-era rows. The DuckDB oracle reconstructs all three
    groups straight from the parquet; equality proves the feed loses
    no value and mislabels no column across the mapping change."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    root = tempfile.mkdtemp(prefix="fps_cdcren_") + "/part_vt"
    t = VersionedTable(spark, root)
    t.commit_overwrite(part.filter("p_partkey % 3 = 0"))          # v0
    t.commit_append(part.filter("p_partkey % 3 = 1"))             # v1
    t.rename_column("p_retailprice", "price")                     # v2
    t.commit_append(                                              # v3
        part.filter("p_partkey % 3 = 2").withColumnRenamed(
            "p_retailprice", "price"
        )
    )
    t.delete_where("p_size < 10")                                 # v4 (CoW)
    ch = t.read_changes_rows(0)
    ch.createOrReplaceTempView("__fps_cdcren_feed")
    return spark.sql(
        """
        SELECT cast(_commit_version AS bigint) AS v,
               _change_type AS ct,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(price * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_cdcren_feed
        GROUP BY v, ct
        ORDER BY v, ct
        """
    )


@register(
    "versioned_cdf_across_optimize",
    oracle="""
        SELECT v, ct,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM (
            SELECT cast(1 AS bigint) AS v, 'insert' AS ct, c_acctbal
            FROM customer WHERE c_custkey % 3 = 1
            UNION ALL
            SELECT cast(3 AS bigint) AS v, 'insert' AS ct, c_acctbal
            FROM customer WHERE c_custkey % 3 = 2
            UNION ALL
            SELECT cast(4 AS bigint) AS v, 'delete' AS ct, c_acctbal
            FROM customer WHERE c_acctbal < 0
        )
        GROUP BY v, ct
        ORDER BY v, ct
    """,
    tags=("extension",),
)
def versioned_cdf_across_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 CDF-across-OPTIMIZE, attested end-to-end: a row-level
    change feed whose range crosses BOTH optimize shapes — a row-target
    bin-packing compaction and a byte-targeted one — serves with ZERO
    change rows for the maintenance commits instead of refusing
    (sources/versioned.py read_changes_rows; Delta parity: a consumer's
    range spanning routine maintenance must not break).

    Flow: customer staged as two era appends AROUND a compaction, then
    a CoW predicate delete whose diff runs against the POST-optimize
    file layout, then a byte-packed optimize closing the range. The
    feed from version 0 must emit exactly the two appends' rows as
    inserts and the predicate matches as deletes — nothing for either
    optimize (their row delta is provably empty), and the delete must
    be computed correctly against compacted files. The DuckDB oracle
    reconstructs all three groups straight from the parquet."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="fps_cdfopt_") + "/cust_vt"
    t = VersionedTable(spark, root)
    t.commit_overwrite(
        cust.filter("c_custkey % 3 = 0").repartition(4)
    )                                                              # v0
    t.commit_append(cust.filter("c_custkey % 3 = 1").repartition(3))  # v1
    t.optimize(target_rows_per_file=1_000_000, mode="compact")        # v2
    t.commit_append(cust.filter("c_custkey % 3 = 2"))                 # v3
    t.delete_where("c_acctbal < 0")                                   # v4 CoW
    t.optimize(target_bytes_per_file=1 << 30, mode="compact")         # v5
    ch = t.read_changes_rows(0)
    ch.createOrReplaceTempView("__fps_cdfopt_feed")
    return spark.sql(
        """
        SELECT cast(_commit_version AS bigint) AS v,
               _change_type AS ct,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_cdfopt_feed
        GROUP BY v, ct
        ORDER BY v, ct
        """
    )


@register(
    "versioned_cdf_across_restore",
    oracle="""
        SELECT v, ct,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM (
            SELECT cast(0 AS bigint) AS v, 'insert' AS ct, c_acctbal
            FROM customer WHERE c_custkey % 3 = 0
            UNION ALL
            SELECT cast(1 AS bigint) AS v, 'delete' AS ct, c_acctbal
            FROM customer WHERE c_custkey % 3 = 0 AND c_acctbal < 0
            UNION ALL
            SELECT cast(2 AS bigint) AS v, 'insert' AS ct, c_acctbal
            FROM customer WHERE c_custkey % 3 = 1
            UNION ALL
            SELECT cast(3 AS bigint) AS v, 'insert' AS ct, c_acctbal
            FROM customer WHERE c_custkey % 3 = 0 AND c_acctbal < 0
            UNION ALL
            SELECT cast(3 AS bigint) AS v, 'delete' AS ct, c_acctbal
            FROM customer WHERE c_custkey % 3 = 1
        )
        GROUP BY v, ct
        ORDER BY v, ct
    """,
    tags=("extension",),
)
def versioned_cdf_across_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 CDF-across-RESTORE, attested end-to-end: a change feed
    whose range crosses a ROLLBACK serves the rollback's net row delta
    instead of refusing (Delta parity: RESTORE flows through
    readChangeFeed) — including the rollback-only shape, a deletion
    vector SHRINKING in place: the restored entry references the
    pre-delete (absent) vector, so the merge-on-read-deleted rows are
    RESURRECTED and emit as inserts.

    Flow: customer's %3=0 slice committed, then a MoR predicate delete
    (negative balances — a scattered GDPR-style erasure that writes a
    position list, no data file), then an append, then ``rollback(0)``.
    The feed from version 0 — consumed through the Python DataSource's
    batch changeFeed (``table_changes``, start-INCLUSIVE per Delta's
    startingVersion, so v0's snapshot emits as inserts), the same
    planner the streaming source uses — must emit the snapshot, the
    MoR delete, the append's inserts, and the rollback as
    resurrection-inserts plus append-drops. The DuckDB oracle
    reconstructs all five groups straight from the parquet."""
    from finalpipeline_spark.sources.pyds import (
        register_versioned_source,
        table_changes,
    )
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="fps_cdfrst_") + "/cust_vt"
    t = VersionedTable(spark, root)
    t.commit_overwrite(
        cust.filter("c_custkey % 3 = 0").repartition(4)
    )                                                                 # v0
    t.delete_where("c_acctbal < 0", mode="mor")                       # v1
    t.commit_append(cust.filter("c_custkey % 3 = 1"))                 # v2
    t.rollback(0)                                                     # v3
    ch = table_changes(spark, root, 0)
    ch.createOrReplaceTempView("__fps_cdfrst_feed")
    return spark.sql(
        """
        SELECT cast(_commit_version AS bigint) AS v,
               _change_type AS ct,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents
        FROM __fps_cdfrst_feed
        GROUP BY v, ct
        ORDER BY v, ct
        """
    )


@register(
    "versioned_merge_multi_clause",
    oracle="""
        WITH base AS (
            SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0
        ), src AS (
            SELECT c_custkey,
                   c_acctbal + CAST(500.25 AS DOUBLE) AS new_bal,
                   CASE WHEN c_acctbal < 0 THEN 'D' ELSE 'U' END AS op
            FROM customer WHERE c_custkey % 4 = 1
        ), final AS (
            SELECT b.c_custkey, s.new_bal AS c_acctbal,
                   'UPDATED' AS c_mktsegment
            FROM base b JOIN src s USING (c_custkey) WHERE s.op = 'U'
            UNION ALL
            SELECT s.c_custkey, s.new_bal, 'MERGED'
            FROM src s LEFT JOIN base b USING (c_custkey)
            WHERE b.c_custkey IS NULL AND s.op = 'U'
            UNION ALL
            SELECT b.c_custkey, b.c_acctbal, 'STALE'
            FROM base b LEFT JOIN src s USING (c_custkey)
            WHERE s.c_custkey IS NULL AND b.c_acctbal >= 0
        )
        SELECT c_mktsegment AS seg,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents,
               cast(sum(c_custkey) AS bigint) AS sum_keys
        FROM final
        GROUP BY seg
        ORDER BY seg
    """,
    tags=("extension",),
)
def versioned_merge_multi_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 multi-clause MERGE, attested end-to-end: ONE SQL
    statement carrying the full Delta clause matrix — ``WHEN MATCHED
    AND s.op = 'D' THEN DELETE`` then ``WHEN MATCHED THEN UPDATE SET``
    (first-match-wins, the CDC-apply shape), a CONDITIONAL ``WHEN NOT
    MATCHED AND ... THEN INSERT *``, and the by-source pair ``WHEN NOT
    MATCHED BY SOURCE AND ... THEN DELETE`` / ``... THEN UPDATE SET``
    (SCD retire-or-stamp) — executed as one atomic commit
    (sources/sql_dml.py → versioned_dml._merge_clause_files).

    Flow: customer's %3=0 slice is the target; a CDC source derived
    from the %4=1 slice flags negative balances 'D' and the rest 'U'.
    Every target row takes exactly one clause by construction, so the
    final snapshot is fully reconstructible: matched-updates
    ('UPDATED'), conditional inserts ('MERGED'), stamped source-less
    survivors ('STALE') — negative source-less rows retired, matched
    'D' rows deleted. The DuckDB oracle rebuilds the same state with
    plain joins."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    register_versioned_source(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="fps_mergemc_") + "/cust_vt"
    from finalpipeline_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, root)
    t.commit_overwrite(
        cust.filter("c_custkey % 3 = 0")
        .withColumn("c_mktsegment", F.lit("BASE"))
        .repartition(4)
    )
    cust.filter("c_custkey % 4 = 1").selectExpr(
        "c_custkey",
        "c_acctbal + CAST(500.25 AS DOUBLE) AS c_acctbal",
        "'MERGED' AS c_mktsegment",
        "CASE WHEN c_acctbal < 0 THEN 'D' ELSE 'U' END AS op",
    ).createOrReplaceTempView("__fps_mergemc_src")
    versioned_sql(
        spark,
        f"""MERGE INTO versioned.`{root}` AS t USING __fps_mergemc_src AS s
            ON t.c_custkey = s.c_custkey
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET c_acctbal = s.c_acctbal,
                                         c_mktsegment = 'UPDATED'
            WHEN NOT MATCHED AND s.op = 'U' THEN INSERT *
            WHEN NOT MATCHED BY SOURCE AND c_acctbal < 0 THEN DELETE
            WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
                c_mktsegment = 'STALE'
        """,
    )
    t.read().createOrReplaceTempView("__fps_mergemc_final")
    return spark.sql(
        """
        SELECT c_mktsegment AS seg,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS bigint)
                   AS sum_cents,
               cast(sum(c_custkey) AS bigint) AS sum_keys
        FROM __fps_mergemc_final
        GROUP BY seg
        ORDER BY seg
        """
    )


@register(
    "versioned_partitioned_table",
    oracle="""
        SELECT cast(o_orderkey % 5 AS int) AS bucket,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint))
                    AS bigint) AS sum_cents,
               cast(0 AS bigint) AS rewritten_files,
               (SELECT cast(count(*) AS bigint) FROM orders
                WHERE o_orderkey % 7 = 0) AS v0_rows
        FROM orders
        WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 NOT IN (1, 3)
        GROUP BY bucket
        ORDER BY bucket
    """,
    tags=("extension",),
)
def versioned_partitioned_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 PARTITIONED BY, attested end-to-end: a versioned table
    created through SQL CTAS with declared partition columns (one
    partition value per data file, enforced by the write layout —
    sources/versioned_dml._write_data_files), then a partition-scoped
    SQL DELETE that must be METADATA-ONLY: whole matching partitions
    drop from the manifest with ZERO files rewritten and zero data
    read (versioned_dml._partition_pred_split — the Delta/Hive
    drop-partition fast path).

    Two engine facts ride the result as oracle-checked constants:
    ``rewritten_files`` is computed from the manifests as |files added
    by the delete commit| and the oracle pins it to 0 (a CoW fallback
    would fail the gate), and ``v0_rows`` is a TIME-TRAVEL read of the
    pre-delete version proving history is intact. The per-partition
    aggregates of the final state must match the oracle's direct
    reconstruction from parquet."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.sql_dml import versioned_sql
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    load_table(spark, sf_dir, "orders").filter(
        "o_orderkey % 7 = 0"
    ).selectExpr(
        "o_orderkey",
        "o_totalprice",
        "cast(o_orderkey % 5 as int) AS bucket",
    ).createOrReplaceTempView("__fps_part_src")
    root = tempfile.mkdtemp(prefix="fps_part_") + "/orders_vt"
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{root}` PARTITIONED BY (bucket) "
        "AS SELECT * FROM __fps_part_src",
    )
    t = VersionedTable(spark, root)
    before = {f["path"] for f in t.manifest()["files"]}
    versioned_sql(
        spark, f"DELETE FROM versioned.`{root}` WHERE bucket IN (1, 3)"
    )
    rewritten = len(
        {f["path"] for f in t.manifest()["files"]} - before
    )
    v0_rows = t.read(version=0).count()
    t.read().createOrReplaceTempView("__fps_part_final")
    return spark.sql(
        f"""
        SELECT bucket,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint))
                    AS bigint) AS sum_cents,
               cast({rewritten} AS bigint) AS rewritten_files,
               cast({v0_rows} AS bigint) AS v0_rows
        FROM __fps_part_final
        GROUP BY bucket
        ORDER BY bucket
        """
    )


@register(
    "versioned_type_widening",
    oracle="""
        SELECT era,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(n) AS bigint) AS sum_n,
               'int' AS v0_type,
               'bigint' AS head_type
        FROM (
            SELECT 1 AS era, cast(o_orderkey % 100 AS bigint) AS n
            FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT 2 AS era, o_orderkey + 3000000000 AS n
            FROM orders WHERE o_orderkey % 3 = 1
        )
        GROUP BY era
        ORDER BY era
    """,
    tags=("extension",),
)
def versioned_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 lossless TYPE WIDENING through schema evolution,
    attested end-to-end: era 1 commits with ``n`` as INT; era 2
    arrives with values past 2^31 as BIGINT and a merge_schema append
    widens the table type IN THE SAME COMMIT (Delta's type-widening-
    in-mergeSchema, versioned_dml.commit_append) — metadata-only for
    the existing files, which upcast at read.

    The final state is consumed through the PYTHON DATASOURCE reader
    (the Arrow-side cast path, sources/pyds.py), so the oracle match
    proves both readers serve the widened frame; ``v0_type`` /
    ``head_type`` ride the result as engine-attested constants — time
    travel must still read era 1 under its original INT type while the
    head reads BIGINT."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.versioned import VersionedTable

    register_versioned_source(spark)
    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="fps_widen_") + "/orders_vt"
    t = VersionedTable(spark, root)
    t.commit_overwrite(
        orders.filter("o_orderkey % 3 = 0").selectExpr(
            "o_orderkey",
            "cast(1 as int) AS era",
            "cast(o_orderkey % 100 AS int) AS n",
        )
    )                                                                 # v0
    t.commit_append(
        orders.filter("o_orderkey % 3 = 1").selectExpr(
            "o_orderkey",
            "cast(2 as int) AS era",
            "cast(o_orderkey + 3000000000 AS bigint) AS n",
        ),
        merge_schema=True,
    )                                                                 # v1
    v0_type = dict(t.read(version=0).dtypes)["n"]
    head = (
        spark.read.format("versioned").option("root", root).load()
    )
    head_type = dict(head.dtypes)["n"]
    head.createOrReplaceTempView("__fps_widen_head")
    return spark.sql(
        f"""
        SELECT era,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(n) AS bigint) AS sum_n,
               '{v0_type}' AS v0_type,
               '{head_type}' AS head_type
        FROM __fps_widen_head
        GROUP BY era
        ORDER BY era
        """
    )


@register(
    "versioned_sql_create_roundtrip",
    oracle="""
        SELECT tag,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(bal * 100) AS bigint)) AS bigint)
                   AS sum_gen_cents,
               cast(count(DISTINCT s_suppkey) AS bigint) AS n_keys
        FROM (
            SELECT cast(NULL AS varchar) AS tag, s_suppkey, s_acctbal AS bal
            FROM supplier
            UNION ALL
            SELECT 'era2' AS tag, s_suppkey + 1000000 AS s_suppkey,
                   s_acctbal + 7.5 AS bal
            FROM supplier WHERE s_suppkey % 7 = 0
        )
        GROUP BY tag
        ORDER BY tag NULLS FIRST
    """,
    tags=("extension",),
)
def versioned_sql_create_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 empty-table DDL, attested end-to-end: ``CREATE TABLE
    versioned.`/p` (col type ...)`` declares schema, NOT NULL, a CHECK
    constraint, a GENERATED column, and an IDENTITY column in ONE
    statement (sources/sql_dml.py); the INSERTs that follow run under
    full engine enforcement — the engine COMPUTES the generated cents
    column and ASSIGNS unique identity values — and the table then
    evolves (ADD COLUMN) and ingests a second era.

    The aggregate proves it: sum_gen_cents comes from the GENERATED
    column (never inserted by the writer — equality with the oracle's
    recomputation proves the engine computed it on every row), and the
    per-group distinct-key counts split eras exactly. Identity
    uniqueness is engine-enforced and pytest-locked (its values are
    allocation-dependent, so the deterministic oracle aggregates the
    declared columns)."""
    from finalpipeline_spark.sources.pyds import register_versioned_source
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    register_versioned_source(spark)
    load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    ).createOrReplaceTempView("__fps_create_supp")
    root = tempfile.mkdtemp(prefix="fps_create_") + "/supp_vt"
    versioned_sql(
        spark,
        f"""CREATE TABLE versioned.`{root}` (
              s_suppkey bigint NOT NULL,
              s_name string,
              bal double,
              gen_cents bigint GENERATED ALWAYS AS
                  (cast(round(bal * 100) AS bigint)),
              rid bigint GENERATED ALWAYS AS IDENTITY,
              CONSTRAINT bal_known CHECK (bal IS NOT NULL)
            )""",
    )
    tgt = f"versioned.`{root}`"
    versioned_sql(
        spark,
        f"INSERT INTO {tgt} (s_suppkey, s_name, bal) "
        "SELECT s_suppkey, s_name, s_acctbal FROM __fps_create_supp",
    )
    versioned_sql(spark, f"ALTER TABLE {tgt} ADD COLUMN tag string")
    versioned_sql(
        spark,
        f"INSERT INTO {tgt} (s_suppkey, s_name, bal, tag) "
        "SELECT s_suppkey + 1000000, s_name, s_acctbal + 7.5, 'era2' "
        "FROM __fps_create_supp WHERE s_suppkey % 7 = 0",
    )
    # Plain snapshot (appends + metadata-only evolution, no DV/cmap) →
    # the engine serves the final read as a native parquet scan.
    from finalpipeline_spark.sources.pyds import snapshot_view

    snapshot_view(spark, "__fps_create_v", root)
    return spark.sql(
        """
        SELECT tag,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(gen_cents) AS bigint) AS sum_gen_cents,
               cast(count(DISTINCT s_suppkey) AS bigint) AS n_keys
        FROM __fps_create_v
        GROUP BY tag
        ORDER BY tag NULLS FIRST
        """
    )


@register(
    "versioned_copy_into",
    oracle="""
        SELECT cast(o_orderkey % 4 AS int) AS bucket,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint))
                    AS bigint) AS sum_cents,
               cast(2 AS bigint) AS first_files,
               cast(0 AS bigint) AS rerun_files,
               cast(1 AS bigint) AS incr_files
        FROM orders
        WHERE o_orderkey % 4 IN (0, 1, 2)
        GROUP BY bucket
        ORDER BY bucket
    """,
    tags=("extension",),
)
def versioned_copy_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 ``COPY INTO``, attested end-to-end: file-granular
    idempotent ingestion (sources/versioned_dml.copy_into — the
    lakehouse-level twin of the reference's ``used_input_files``
    processed-file ledger, reference main.py:37-43). Two staged parquet
    files COPY into a DDL-declared table; an identical re-run must load
    ZERO files (the ledger rides commit metadata, so idempotence
    survives process restarts); a third staged file then loads alone.

    Three engine facts ride the result as oracle-pinned constants:
    ``first_files`` = 2 (both staged files load), ``rerun_files`` = 0
    (idempotent re-run commits NOTHING), ``incr_files`` = 1 (only the
    new arrival loads). The per-bucket aggregates of the final table
    must match the oracle's direct reconstruction from orders.

    Scale shape: the source LISTING is one driver-side glob; the data
    read is a distributed scan of exactly the new files; the ledger
    scan is O(manifests), metadata-only."""
    from finalpipeline_spark.sources.sql_dml import versioned_sql
    from finalpipeline_spark.sources.versioned import VersionedTable

    base = tempfile.mkdtemp(prefix="fps_copy_")
    src, root = f"{base}/src", f"{base}/t"
    orders = load_table(spark, sf_dir, "orders")

    def stage(tag: str, residue: int) -> None:
        orders.filter(f"o_orderkey % 4 = {residue}").selectExpr(
            "o_orderkey",
            "o_totalprice",
            "cast(o_orderkey % 4 AS int) AS bucket",
        ).coalesce(1).write.parquet(f"{src}/{tag}")

    stage("a", 0)
    stage("b", 1)
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{root}` "
        "(o_orderkey BIGINT, o_totalprice DOUBLE, bucket INT)",
    )
    copy_stmt = (
        f"COPY INTO versioned.`{root}` FROM '{src}' "
        "FILEFORMAT = PARQUET PATTERN = '*/*.parquet'"
    )
    m1 = versioned_sql(spark, copy_stmt).first()
    m2 = versioned_sql(spark, copy_stmt).first()  # idempotent re-run
    stage("c", 2)
    m3 = versioned_sql(spark, copy_stmt).first()  # incremental pickup
    VersionedTable(spark, root).read().createOrReplaceTempView(
        "__fps_copy_final"
    )
    return spark.sql(
        f"""
        SELECT bucket,
               cast(count(*) AS bigint) AS n_rows,
               cast(sum(cast(round(o_totalprice * 100) AS bigint))
                    AS bigint) AS sum_cents,
               cast({int(m1["num_loaded_files"])} AS bigint) AS first_files,
               cast({int(m2["num_loaded_files"])} AS bigint) AS rerun_files,
               cast({int(m3["num_loaded_files"])} AS bigint) AS incr_files
        FROM __fps_copy_final
        GROUP BY bucket
        ORDER BY bucket
        """
    )
