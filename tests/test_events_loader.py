"""Encoding-proof tests for the events timestamp loader.

The driver has shipped two physical encodings of ``events.ts`` across
rounds (parquet TIMESTAMP(NANOS) in r1; TIMESTAMP(MICROS, isAdjusted=
false) → Spark timestamp_ntz from r2 on), and the encoding change broke
the bench + three correctness rows in r2.  These tests synthesize BOTH
encodings (plus the plain instant-micros variant) and assert
``tables.load_table`` yields the identical tz-independent ``ts_ns``
epoch column for each — so a future encoding flip fails HERE, not in
the driver's gate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from finalpipeline_spark.tables import load_table

# Epoch-nanosecond instants (all exactly representable in micros too).
_TS_NS = [
    1_700_000_000_000_000_000,
    1_700_000_123_456_789_000,
    1_712_345_678_901_234_000,
]
_UIDS = [1, 2, 3]


def _write_events(tmpdir: str, ts_array: pa.Array, use_compliant: bool) -> str:
    path = f"{tmpdir}/events.parquet"
    tbl = pa.table({"user_id": pa.array(_UIDS, pa.int64()), "ts": ts_array})
    # store_schema=False drops the Arrow schema sidecar so readers see
    # only the parquet logical type — exactly what the driver's
    # generator ships; version>=2.6 permits NANOS.
    pq.write_table(
        tbl,
        path,
        use_compliant_nested_type=use_compliant,
        store_schema=False,
        version="2.6",
    )
    return tmpdir


@pytest.fixture(scope="module")
def encodings(tmp_path_factory):
    cases = {}
    # r1 encoding: TIMESTAMP(NANOS) — Spark reads as epoch-ns bigint
    # under spark.sql.legacy.parquet.nanosAsLong.
    d = str(tmp_path_factory.mktemp("ev_nanos"))
    cases["nanos"] = _write_events(d, pa.array(_TS_NS, pa.timestamp("ns")), True)
    # r2+ encoding: TIMESTAMP(MICROS, isAdjusted=false) → timestamp_ntz.
    d = str(tmp_path_factory.mktemp("ev_us_ntz"))
    cases["micros_ntz"] = _write_events(
        d, pa.array([t // 1000 for t in _TS_NS], pa.timestamp("us")), True
    )
    # instant variant: TIMESTAMP(MICROS, isAdjusted=true) → timestamp.
    d = str(tmp_path_factory.mktemp("ev_us_utc"))
    cases["micros_utc"] = _write_events(
        d, pa.array([t // 1000 for t in _TS_NS], pa.timestamp("us", tz="UTC")), True
    )
    return cases


@pytest.mark.parametrize("enc", ["nanos", "micros_ntz", "micros_utc"])
def test_loader_normalizes_encoding(spark, encodings, enc):
    df = load_table(spark, encodings[enc], "events")
    got = {r["user_id"]: r["ts_ns"] for r in df.select("user_id", "ts_ns").collect()}
    assert got == dict(zip(_UIDS, _TS_NS)), f"encoding {enc}: {got}"
    # the derived epoch-second column all queries consume
    secs = {r["user_id"]: r["ts_epoch_s"] for r in df.collect()}
    assert secs == {u: t // 1_000_000_000 for u, t in zip(_UIDS, _TS_NS)}


@pytest.mark.parametrize("enc", ["nanos", "micros_ntz", "micros_utc"])
def test_loader_is_timezone_independent(spark, encodings, enc):
    """ts_ns must not depend on the session timezone (the NY-vs-UTC
    trap that motivated the imposed-schema re-read)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, encodings[enc], "events")
        got = sorted(r["ts_ns"] for r in df.select("ts_ns").collect())
        assert got == sorted(_TS_NS)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_current_testdata_loads(spark, sf_dir):
    """Whatever encoding the driver shipped THIS round must load with a
    populated, plausible ts_ns (2020-2035 range)."""
    df = load_table(spark, sf_dir, "events")
    row = df.selectExpr(
        "count(*) AS n",
        "sum(cast(ts_ns IS NULL as int)) AS nulls",
        "min(ts_ns) AS lo",
        "max(ts_ns) AS hi",
    ).collect()[0]
    assert row["n"] > 0 and row["nulls"] == 0
    assert 1_577_836_800_000_000_000 < row["lo"] <= row["hi"] < 2_051_222_400_000_000_000
