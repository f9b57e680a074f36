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


def scd2_apply_batch(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge a batch of change events into an SCD2 dimension.

    ``existing``: (custkey, version, priority, valid_from, valid_to,
    is_current) as produced by orders_scd2_snapshot.
    ``batch``: raw order rows (o_custkey, o_orderkey, o_orderdate,
    o_orderpriority).

    Returns the updated dimension with the same schema/invariants
    (contiguous versions, chained intervals, one open row per key).
    """
    changes = batch.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderkey").alias("tiebreak"),
    )
    keys = changes.select("custkey").distinct()

    # Untouched customers: everything passes through. Affected
    # customers: only their closed versions pass through.
    untouched = existing.join(keys, "custkey", "left_anti")
    affected_closed = existing.join(keys, "custkey", "left_semi").filter(
        ~F.col("is_current")
    )

    # Open rows of affected customers re-enter the stream carrying
    # their version number as the renumbering base; brand-new keys get
    # base 0 via the outer join below. tiebreak -1 pins the open row
    # before any same-instant batch row (precondition makes this moot
    # for real CDC, but keeps the window total-order deterministic).
    open_rows = existing.filter(F.col("is_current")).join(keys, "custkey", "left_semi")
    stream = open_rows.select(
        "custkey",
        "priority",
        "valid_from",
        F.lit(-1).cast("long").alias("tiebreak"),
        F.col("version").alias("base_version"),
    ).unionByName(
        changes.withColumn("base_version", F.lit(None).cast("int"))
    )

    w = Window.partitionBy("custkey").orderBy("valid_from", "tiebreak")
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
        .select(*_SCD_COLS)
    )
    return untouched.unionByName(affected_closed).unionByName(rebuilt)
