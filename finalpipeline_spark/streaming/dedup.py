"""Streaming deduplication and stream-stream joins.

The batch dedup family (queries/documents.py) answers "which rows are
duplicates"; this module is the ingestion-time counterpart a training
pipeline runs continuously: drop exact duplicates as records arrive,
and correlate two live streams (e.g. impressions vs conversions)
without ever materializing either.

Scale design:
  * `dropDuplicatesWithinWatermark` keeps one state-store entry per
    key only until the watermark passes it — state is bounded by
    (arrival rate x watermark horizon), not by history. Unbounded
    `dropDuplicates` on a stream would grow state forever; the
    watermarked form is the only one that survives at 100 TB/day.
  * Stream-stream inner joins buffer each side in the state store
    keyed by the join key; BOTH the watermark and the time-interval
    condition are required for Spark to know when a buffered row can
    never match again and evict it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    stream: DataFrame,
    keys: list[str] | None = None,
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-one-row-per-key over a stream, with bounded state.

    The streaming analogue of doc_dedup_exact / the reference's
    insert-if-absent UNIQUE discipline (reference db_interact.py:
    150-165): the first arrival wins, re-deliveries within the
    watermark horizon are dropped, and state for keys older than the
    watermark is evicted.
    """
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment: each micro-batch joins against the
    static dimension — no state store involved (the static side is just
    re-planned per batch, broadcast when small). This is the streaming
    form of the medallion fact→dim join (reference views_p1.py:9-12):
    facts arrive continuously, dims are slowly-changing tables.

    At scale, broadcast the dim explicitly when it fits (as here) —
    otherwise each micro-batch pays a full shuffle of itself against
    the dim."""
    return stream.join(F.broadcast(dim), on, "left")


def stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user click→purchase attribution: purchases joined to any
    click by the same user in the preceding `within` interval.

    Watermarks on both sides + the interval bound let Spark evict
    buffered rows deterministically; the join key (user_id) is the
    shuffle/state partition key.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
