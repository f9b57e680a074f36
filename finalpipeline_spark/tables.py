"""Testdata table access with schema normalization.

All queries load tables through here so the one irregularity in the
testdata — the ``events.ts`` timestamp encoding — is handled in exactly
one place. The driver has shipped two encodings across rounds:

* parquet TIMESTAMP(NANOS)                → Spark needs
  ``spark.sql.legacy.parquet.nanosAsLong`` and the column arrives as an
  epoch-nanosecond ``bigint``;
* parquet TIMESTAMP(MICROS, adjusted=false) → Spark 4 infers
  ``timestamp_ntz`` by default, whose epoch extraction is
  session-timezone-dependent; we re-read with an imposed schema that
  swaps ``timestamp_ntz`` → ``timestamp``, which makes the reader hand
  back the stored int64 micros verbatim as an instant — then
  ``unix_micros(ts)`` equals DuckDB's ``epoch_us(ts)`` bit-for-bit
  regardless of session timezone (verified empirically under
  America/New_York). Imposing the schema per-read keeps every other
  table's inferred types untouched (no session-global conf flips
  beyond the legacy nanos one, which only affects NANOS columns).

Either way downstream queries only consume the derived tz-independent
``ts_ns`` / ``ts_epoch_s`` epoch columns. Falls back to an Arrow-side
cast if the session forbids the confs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

NS_PER_SECOND = 1_000_000_000


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


# Analyzed-plan memo: (session identity, path) → the lazy source
# DataFrame.  ``spark.read.parquet`` re-lists the path and re-reads the
# parquet footer for schema inference on EVERY call — pure driver-side
# overhead (~20-50 ms/table) that a warm deployment pays once.  A
# DataFrame is a *plan*, not data: every action still scans the parquet
# input, so this caches no results.  Holding the session object in the
# value keeps the id() key from ever being reused by a new session.
#
# Lifecycle: the memoized plan pins the FILE LISTING captured at first
# read — deliberate for the static testdata contract (each sf dir is
# one immutable file per table), wrong for a directory that grows
# mid-session.  Anyone pointing load_table at mutable directories must
# call ``invalidate_table_cache`` after adding files.  Entries of
# stopped sessions are purged on the next miss, and the map is bounded
# (oldest-first eviction) so a long-lived driver cycling sessions or
# sf dirs cannot grow it without bound.
_SOURCE_MEMO: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}
_SOURCE_MEMO_MAX = 256


def invalidate_table_cache(path: str | None = None) -> None:
    """Drop memoized source plans — all of them, or one path's entries
    across sessions. Needed only when a table directory's FILE LISTING
    changed mid-session (new files appended outside the engine)."""
    if path is None:
        _SOURCE_MEMO.clear()
        return
    for k in [k for k in _SOURCE_MEMO if k[1] == path]:
        del _SOURCE_MEMO[k]


def _session_stopped(s: SparkSession) -> bool:
    try:
        return s.sparkContext._jsc.sc().isStopped()
    except Exception:
        return True  # gateway gone or context torn down


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing the events timestamp."""
    path = table_path(sf_dir, name)
    key = (id(spark), path)
    hit = _SOURCE_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    # miss (rare once warm): purge dead sessions (one liveness probe
    # per distinct session, not per entry), then bound the map
    sessions = {id(s): s for s, _ in _SOURCE_MEMO.values()}
    dead = {sid for sid, s in sessions.items() if _session_stopped(s)}
    for k in [k for k, (s, _) in _SOURCE_MEMO.items() if id(s) in dead]:
        del _SOURCE_MEMO[k]
    while len(_SOURCE_MEMO) >= _SOURCE_MEMO_MAX:
        del _SOURCE_MEMO[next(iter(_SOURCE_MEMO))]
    df = spark.read.parquet(path) if name != "events" else _load_events(spark, path)
    _SOURCE_MEMO[key] = (spark, df)
    return df


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql import types as T

    try:
        # Runtime-settable; only affects how TIMESTAMP(NANOS) columns are
        # typed at read (events is the sole table with one, in old data).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        inferred = spark.read.parquet(path).schema
        imposed = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.TimestampType()
                    if isinstance(f.dataType, T.TimestampNTZType)
                    else f.dataType,
                    f.nullable,
                )
                for f in inferred.fields
            ]
        )
        df = spark.read.schema(imposed).parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as epoch-ns long
            df = df.withColumn("ts_ns", F.col("ts").cast("long"))
        elif ts_type == "timestamp":  # micros instant; unix_micros == epoch_us
            df = df.withColumn("ts_ns", (F.unix_micros("ts") * F.lit(1000)).cast("long"))
        else:
            raise ValueError(f"unexpected events.ts type: {ts_type}")
    except Exception:
        df = _load_events_arrow(spark, path)
    return df.withColumn("ts_epoch_s", F.expr(f"ts_ns div {NS_PER_SECOND}"))


def _load_events_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side Arrow fallback: cast ts to epoch-ns int64 before Spark
    ever sees it (small table; unit taken from the arrow type)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    ts_type = tbl.schema.field("ts").type
    raw = pc.cast(tbl["ts"], pa.int64())  # epoch in the column's own unit
    unit = getattr(ts_type, "unit", "ns")
    mult = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}[unit]
    ts_ns = pc.multiply(raw, pa.scalar(mult, pa.int64()))
    tbl = tbl.drop_columns(["ts"]).append_column("ts_ns", ts_ns)
    return spark.createDataFrame(tbl.to_pandas())


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
