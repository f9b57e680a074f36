"""Incremental SCD Type-2 maintenance.

queries/warehouse.orders_scd2_snapshot builds the versioned dimension
wholesale — one window over every change ever. At 100 TB you cannot
re-sort the full history per batch; the incremental form touches ONLY
customers present in the batch:

  * closed versions of affected customers are immutable — pass through;
  * each affected customer's single open version is re-opened into the
    change stream together with the batch rows, and one window pass
    over (open ∪ batch) — sized by the batch, not the dimension —
    renumbers versions and re-chains intervals;
  * unaffected customers (the overwhelming majority of a real
    dimension) are never shuffled at all beyond the anti-join probe.

Precondition (asserted): batch changes are strictly later than each
affected customer's open valid_from — the append-only CDC case. Late
(out-of-order) history would need a rebuild of the affected customers,
which degenerates to the wholesale form restricted to them.

Reference analogue: the wholesale datamart construction
(_create_or_update_datamart, datamart.py:50-83 — re-reads every
similarity parquet and rebuilds facts each run) — this is the
incremental-warehouse upgrade of that pattern applied to a versioned
dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCD_COLS = ("custkey", "version", "priority", "valid_from", "valid_to", "is_current")


_CDC_COLS = _SCD_COLS + ("change_id",)


def orders_as_changes(batch: DataFrame) -> DataFrame:
    """Order rows → the canonical change-event shape. change_id is the
    source row's natural key (o_orderkey) — the lineage column that
    makes CDC re-delivery detectable."""
    return batch.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderkey").cast("long").alias("change_id"),
    )


def scd2_build(changes: DataFrame) -> DataFrame:
    """Wholesale SCD2 build from a change stream (custkey, priority,
    valid_from, change_id): one window pass, change_id retained as
    lineage. Same shape/invariants as orders_scd2_snapshot plus the
    change_id column."""
    w = Window.partitionBy("custkey").orderBy("valid_from", "change_id")
    return (
        changes.withColumn("version", F.row_number().over(w).cast("int"))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*_CDC_COLS)
    )


def scd2_apply_changes(existing: DataFrame, changes: DataFrame) -> DataFrame:
    """Merge a change batch into a change_id-carrying SCD2 dimension.

    Re-delivery safe: changes whose (custkey, change_id) already
    versioned are dropped by the leading anti-join, so re-applying an
    epoch is a no-op — the exactly-once-effect contract the streaming
    sink needs. All remaining work is sized by the batch: only affected
    customers' open rows re-enter the window; untouched customers (and
    closed versions) pass through without a shuffle beyond the
    key-probe anti-/semi-joins (batch keys broadcast).
    """
    fresh = changes.join(
        existing.select("custkey", "change_id"), ["custkey", "change_id"], "left_anti"
    )
    keys = fresh.select("custkey").distinct()

    untouched = existing.join(keys, "custkey", "left_anti")
    affected_closed = existing.join(keys, "custkey", "left_semi").filter(
        ~F.col("is_current")
    )

    # Open rows of affected customers re-enter the stream carrying
    # their version number as the renumbering base; brand-new keys get
    # base 1 via the coalesce below. Under the append-only precondition
    # the open row's valid_from precedes every fresh change, so it
    # sorts first and keeps its version number.
    open_rows = existing.filter(F.col("is_current")).join(keys, "custkey", "left_semi")
    stream = open_rows.select(
        "custkey",
        "priority",
        "valid_from",
        "change_id",
        F.col("version").alias("base_version"),
    ).unionByName(fresh.withColumn("base_version", F.lit(None).cast("int")))

    w = Window.partitionBy("custkey").orderBy("valid_from", "change_id")
    rebuilt = (
        stream.withColumn(
            "base",
            F.coalesce(
                F.max("base_version").over(
                    Window.partitionBy("custkey").rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
                F.lit(1),
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("version", (F.col("base") + F.col("rn") - 1).cast("int"))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*_CDC_COLS)
    )
    return untouched.unionByName(affected_closed).unionByName(rebuilt)


def scd2_apply_batch(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge raw order rows into a dimension built WITHOUT lineage
    (orders_scd2_snapshot's shape). The open rows are assigned a
    sentinel change_id of -1, which sorts before every real o_orderkey
    — preserving the open row's version under renumbering.

    Returns the updated dimension with the same schema/invariants
    (contiguous versions, chained intervals, one open row per key).
    """
    with_cid = existing.withColumn("change_id", F.lit(-1).cast("long"))
    return scd2_apply_changes(with_cid, orders_as_changes(batch)).select(*_SCD_COLS)
