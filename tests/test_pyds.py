"""Python DataSource over versioned tables: batch snapshot/time-travel
reads and the change-data-feed stream source."""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.pyds import register_versioned_source
from finalpipeline_spark.sources.versioned import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 100).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )
    t.commit_append(
        spark.range(100, 130).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )
    return t


def test_batch_read_latest_and_time_travel(spark, vt):
    df = spark.read.format("versioned").option("root", vt.root).load()
    assert df.count() == 130
    assert set(df.columns) == {"id", "bucket"}
    v0 = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .option("version", "0")
        .load()
    )
    assert v0.count() == 100
    # values, not just counts: matches the native reader
    native = vt.read().selectExpr("id", "bucket")
    assert df.exceptAll(native).count() == 0
    assert native.exceptAll(df).count() == 0


def test_batch_read_packs_small_files(spark, vt):
    # input-split packing (Spark's maxPartitionBytes/openCost shape):
    # tiny files coalesce into fewer Python tasks, values unchanged
    df = spark.read.format("versioned").option("root", vt.root).load()
    n_files = len(vt.manifest()["files"])
    n_parts = df.rdd.getNumPartitions()
    assert 1 <= n_parts <= n_files
    assert df.count() == vt.read().count()


def test_pack_partitions_budget():
    from finalpipeline_spark.sources.pyds import (
        _PACK_MAX_BYTES,
        _FilePartition,
        _PackedPartition,
        _pack_partitions,
    )

    small = [_FilePartition(f"/f{i}", nbytes=1024) for i in range(10)]
    packed = _pack_partitions(small)
    assert len(packed) == 1 and isinstance(packed[0], _PackedPartition)
    assert [s.path for s in packed[0].specs] == [f"/f{i}" for i in range(10)]
    # a file at/above the budget keeps its own partition
    big = _FilePartition("/big", nbytes=_PACK_MAX_BYTES)
    out = _pack_partitions(small[:2] + [big] + small[2:4])
    assert any(getattr(p, "path", None) == "/big" for p in out)
    # unknown size is charged a full budget: never packed with others
    unk = _FilePartition("/unk", nbytes=None)
    out = _pack_partitions([unk] + small[:2])
    assert getattr(out[0], "path", None) == "/unk"
    assert _pack_partitions([]) == []


def test_stream_cdf_delivers_snapshot_then_deltas(spark, vt, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", vt.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # initial snapshot: both existing versions
    assert spark.read.parquet(out).count() == 130

    vt.commit_append(
        spark.range(130, 140).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )
    drain()  # only the delta should arrive
    got = spark.read.parquet(out)
    assert got.count() == 140
    assert got.select("id").distinct().count() == 140  # no double-delivery

    drain()  # nothing new: no rows added
    assert spark.read.parquet(out).count() == 140


def test_stream_rejects_content_mutation(spark, vt, tmp_path):
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", vt.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    vt.delete_where("id < 5")  # CoW delete: no row-level delta exists
    with pytest.raises(Exception, match="no row-level delta|StreamingQueryException"):
        drain()


def test_batch_filter_pushdown_prunes_files(spark, tmp_path):
    register_versioned_source(spark)
    vt = VersionedTable(spark, str(tmp_path / "vtp"))
    for lo in (0, 1000, 2000):
        vt.commit_append(
            spark.range(lo, lo + 100).selectExpr("id", "id * 2 as v").coalesce(1)
        )
    df = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .option("statsPruning", "true")
        .load()
        .filter("id >= 1000 and id < 1050")
    )
    # values exact (Spark re-applies the filter after pruning)
    assert sorted(r.id for r in df.collect()) == list(range(1000, 1050))
    # stats pruning dropped two of the three files at planning time
    assert df.rdd.getNumPartitions() == 1
    # a provably-empty predicate prunes everything
    empty = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .option("statsPruning", "true")
        .load()
        .filter("id = 999999")
    )
    assert empty.count() == 0
    assert empty.rdd.getNumPartitions() <= 1  # one empty split at most


# --------------------------------------------------------------------------
# vacuumed-start-version delta correctness (unit-level on the reader)
# --------------------------------------------------------------------------
def _stream_reader(root):
    from finalpipeline_spark.sources.pyds import VersionedStreamReader

    return VersionedStreamReader(root, [("id", "bigint"), ("bucket", "bigint")])


def _partition_paths(reader, start, end):
    return sorted(p.path for p in reader.partitions(start, end))


def test_stream_delta_survives_vacuumed_start_version(spark, vt):
    """If the start-offset version is vacuumed while the stream is one
    version behind, the tombstone manifest's file list must still drive
    the diff — an empty base would redeliver every carried-over file of
    the end manifest as 'new' rows (silent double-counting)."""
    vt.commit_append(
        spark.range(130, 150).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )  # version 2
    reader = _stream_reader(vt.root)
    expected_delta = _partition_paths(reader, {"version": 1}, {"version": 2})
    # expire versions 0 and 1 (files stay: referenced by version 2)
    vt.vacuum(retain_last=1, grace_seconds=0)
    got = _partition_paths(reader, {"version": 1}, {"version": 2})
    assert got == expected_delta  # only v2's new files, not the whole table
    n_v2_files = len(vt.manifest(2)["files"])
    assert len(got) < n_v2_files


def test_stream_snapshot_sentinel_still_delivers_everything(spark, vt):
    """The pre-snapshot sentinel offset must deliver the FULL end
    manifest even when a tombstone exists at the sentinel version."""
    reader = _stream_reader(vt.root)
    full = _partition_paths(
        reader, {"version": -1, "snapshot": True}, {"version": 1}
    )
    assert len(full) == len(vt.manifest(1)["files"])


def test_stream_unreadable_start_manifest_errors(spark, vt, tmp_path):
    import os

    vt.commit_append(
        spark.range(130, 140).selectExpr("id", "cast(id % 7 as bigint) as bucket")
    )  # version 2
    mpath = os.path.join(vt.root, "_log", "v%012d.json" % 1)
    with open(mpath, "w") as fh:
        fh.write("{corrupt")
    reader = _stream_reader(vt.root)
    with pytest.raises(ValueError, match="unreadable"):
        reader.partitions({"version": 1}, {"version": 2})


def test_batch_read_across_schema_evolution(spark, vt):
    """A file written before a merge_schema append must backfill typed
    NULLs through the Python DataSource path too (Arrow-side), matching
    the JVM impose-schema read."""
    widened = spark.range(130, 140).selectExpr(
        "id", "cast(id % 7 as bigint) as bucket", "'x' AS note"
    )
    vt.commit_append(widened, merge_schema=True)
    df = spark.read.format("versioned").option("root", vt.root).load()
    assert df.columns == ["id", "bucket", "note"]
    assert df.count() == 140
    assert df.filter("note IS NULL").count() == 130
    assert df.filter("note = 'x'").count() == 10
    native = vt.read()
    assert df.exceptAll(native).count() == 0 and native.exceptAll(df).count() == 0


def test_stream_change_feed_mode_survives_cow_delete(spark, vt, tmp_path):
    """option("changeFeed","true") streams CoW commits as tagged
    insert/delete rows instead of failing: applying deletes-then-
    inserts per commit reproduces the head snapshot exactly."""
    out = str(tmp_path / "cdf_out")
    ckpt = str(tmp_path / "cdf_ckpt")

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", vt.root)
            .option("changeFeed", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # initial snapshot: everything arrives as inserts
    first = spark.read.parquet(out)
    assert set(first.columns) == {
        "id", "bucket", "_change_type", "_commit_version", "_commit_timestamp"
    }
    assert first.filter("_change_type = 'insert'").count() == 130
    assert first.filter("_change_type = 'delete'").count() == 0

    vt.delete_where("id < 5")  # CoW: rewrites the file(s) holding 0..4
    drain()
    ch = spark.read.parquet(out)
    v = vt.latest_version()
    step = ch.filter(f"_commit_version = {v}")
    dels = {r["id"] for r in step.filter("_change_type = 'delete'").collect()}
    ins = {r["id"] for r in step.filter("_change_type = 'insert'").collect()}
    assert set(range(5)) <= dels          # retracted rows are deletes
    assert ins == dels - set(range(5))    # survivors churn delete+insert
    # replay the feed keyed by id → head snapshot
    state: set[int] = set()
    for r in sorted(
        ch.collect(), key=lambda r: (r["_commit_version"], r["_change_type"] == "insert")
    ):
        if r["_change_type"] == "delete":
            state.discard(r["id"])
        else:
            state.add(r["id"])
    assert state == {r["id"] for r in vt.read().collect()}


def test_stream_default_mode_still_rejects_mutation(spark, vt, tmp_path):
    vt.delete_where("id < 5")
    reader = _stream_reader(vt.root)
    with pytest.raises(ValueError, match="content"):
        reader.partitions({"version": 1}, {"version": 2})


def test_batch_timestamp_as_of(spark, vt):
    """TIMESTAMP AS OF through the DataSource: resolves the same
    version the native reader resolves, and rejects combining both
    time-travel options."""
    import time as _t

    v0_ts = vt.manifest(0)["ts"]
    mid = (v0_ts + vt.manifest(1)["ts"]) / 2.0
    df = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .option("timestampAsOf", str(mid))
        .load()
    )
    assert df.count() == 100  # v0 snapshot
    now = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .option("timestampAsOf", str(_t.time() + 5))
        .load()
    )
    assert now.count() == 130
    with pytest.raises(Exception, match="not both"):
        spark.read.format("versioned").option("root", vt.root).option(
            "version", "0"
        ).option("timestampAsOf", str(mid)).load().count()
    with pytest.raises(Exception, match="at or before"):
        spark.read.format("versioned").option("root", vt.root).option(
            "timestampAsOf", str(v0_ts - 3600)
        ).load().count()


# -- trigger pacing (maxVersionsPerTrigger / maxFilesPerTrigger) ---------


def test_pacing_unit_offsets(spark, tmp_path):
    """Offset mechanics without an engine: latestOffset is idempotent
    under polling and advances only when partitions() moves the
    cursor (the engine polls latestOffset many times per trigger)."""
    from finalpipeline_spark.sources.pyds import VersionedStreamReader

    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 10).selectExpr("id"))
    for lo in range(10, 50, 10):
        t.commit_append(spark.range(lo, lo + 10).selectExpr("id"))

    r = VersionedStreamReader(t.root, [("id", "bigint")], max_versions=1)
    assert r.initialOffset() == {"version": -1, "snapshot": True}
    # polling does not advance
    assert [r.latestOffset() for _ in range(3)] == [{"version": 0}] * 3
    r.partitions({"version": -1, "snapshot": True}, {"version": 0})
    assert r.latestOffset() == {"version": 1}
    r.partitions({"version": 0}, {"version": 1})
    assert r.latestOffset() == {"version": 2}
    # uncapped reader jumps straight to head
    r2 = VersionedStreamReader(t.root, [("id", "bigint")])
    r2.initialOffset()
    assert r2.latestOffset() == {"version": 4}
    # file cap: each commit writes >1 file, min-progress still 1 version
    r3 = VersionedStreamReader(t.root, [("id", "bigint")], max_files=1)
    r3.initialOffset()
    assert r3.latestOffset() == {"version": 0}
    r3.partitions({"version": -1, "snapshot": True}, {"version": 0})
    assert r3.latestOffset() == {"version": 1}
    # option validation (streamReader is built lazily at stream start,
    # so probe the DataSource directly)
    from pyspark.sql.types import LongType, StructField, StructType

    from finalpipeline_spark.sources.pyds import VersionedDataSource

    ds = VersionedDataSource(
        options={"root": t.root, "maxVersionsPerTrigger": "0"}
    )
    with pytest.raises(ValueError, match="maxVersionsPerTrigger"):
        ds.streamReader(StructType([StructField("id", LongType())]))


def test_pacing_e2e_bounded_catchup(spark, tmp_path):
    """A checkpointed consumer that fell behind catches up in PACED
    micro-batches: restart replays the last batch (re-syncing the
    cursor), then each trigger advances at most one version."""
    import time

    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 10).selectExpr("id"))
    batches: list[tuple[int, int]] = []

    def mk():
        return (
            spark.readStream.format("versioned")
            .option("root", t.root)
            .option("maxVersionsPerTrigger", "1")
            .load()
            .writeStream.foreachBatch(
                lambda df, eid: batches.append((eid, df.count()))
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )

    q = mk()
    deadline = time.time() + 120
    while time.time() < deadline and sum(n for _, n in batches) < 10:
        time.sleep(1)
    q.stop()
    assert sum(n for _, n in batches) == 10  # initial snapshot

    # fall 3 commits behind, then restart from the checkpoint
    for lo in range(10, 40, 10):
        t.commit_append(spark.range(lo, lo + 10).selectExpr("id"))
    batches.clear()
    q = mk()
    deadline = time.time() + 180
    while time.time() < deadline and sum(n for _, n in batches) < 30:
        time.sleep(1)
    q.stop()
    # the backlog arrived as one-version batches, never one big batch
    sizes = [n for _, n in batches if n > 0]
    assert sum(sizes) == 30
    assert sizes == [10, 10, 10]


def test_parse_cache_is_lru_not_fifo(tmp_path, monkeypatch):
    """A cache hit must refresh recency: with a hot set one larger than
    the cap, re-touching the oldest entry then inserting a new one must
    evict the UNtouched entry (LRU), not the oldest-inserted (FIFO)."""
    import json

    from finalpipeline_spark.sources import pyds

    monkeypatch.setattr(pyds, "_PARSE_CACHE", {})
    monkeypatch.setattr(pyds, "_PARSE_CACHE_MAX", 2)
    paths = []
    for i in range(3):
        p = tmp_path / f"m{i}.json"
        p.write_text(json.dumps({"version": i}))
        paths.append(str(p))
    assert pyds._parse_manifest_cached(paths[0])["version"] == 0
    assert pyds._parse_manifest_cached(paths[1])["version"] == 1
    assert pyds._parse_manifest_cached(paths[0])["version"] == 0  # hit
    assert pyds._parse_manifest_cached(paths[2])["version"] == 2
    assert paths[0] in pyds._PARSE_CACHE  # survived: recently touched
    assert paths[1] not in pyds._PARSE_CACHE  # evicted: least recent


def test_arrow_cast_widens_but_refuses_narrowing(tmp_path):
    """The Arrow-side schema cast mirrors widen_column: a file narrower
    than the declared schema upcasts losslessly; a file WIDER than the
    declared schema (a stream checkpoint pinned pre-widen) must raise
    the restart-from-fresh-checkpoint error, never silently downcast."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from finalpipeline_spark.sources.pyds import _read_file_batches

    narrow = str(tmp_path / "narrow.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int32())}), narrow)
    batches = list(_read_file_batches(narrow, [("id", "bigint")]))
    assert batches and batches[0].schema.field("id").type == pa.int64()

    wide = str(tmp_path / "wide.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2**40], pa.int64())}), wide)
    with pytest.raises(ValueError, match="fresh checkpoint"):
        list(_read_file_batches(wide, [("id", "int")]))


def test_batch_read_backfills_evolved_complex_columns(spark, tmp_path):
    """Typed-NULL backfill for files predating schema evolution now
    covers COMPLEX columns: array/struct/map/binary added via
    merge_schema read back as real NULLs through the Python source
    (previously a loud cannot-backfill gate)."""
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 5).selectExpr("id"))
    t.commit_append(
        spark.range(5, 8).selectExpr(
            "id",
            "array(cast(id as double), 1.5d) as emb",
            "named_struct('a', id, 'b', 'x') as meta",
            "map('k', id) as mp",
            "cast('bin' as binary) as payload",
        ),
        merge_schema=True,
    )
    df = spark.read.format("versioned").option("root", t.root).load()
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 8
    assert rows[0].emb is None and rows[0].meta is None
    assert rows[0].mp is None and rows[0].payload is None
    assert rows[6].emb == [6.0, 1.5]
    assert rows[6].meta.a == 6 and rows[6].meta.b == "x"
    assert rows[6].mp == {"k": 6}
    assert bytes(rows[6].payload) == b"bin"


def test_arrow_type_parses_nested_ddl():
    """The DDL→Arrow parser handles the full simpleString grammar."""
    import pyarrow as pa

    from finalpipeline_spark.sources.pyds import _arrow_type

    assert _arrow_type("array<double>") == pa.list_(pa.float64())
    assert _arrow_type("map<string,bigint>") == pa.map_(
        pa.large_string(), pa.int64()
    )
    assert _arrow_type("decimal(12,2)") == pa.decimal128(12, 2)
    t = _arrow_type("struct<a:int,b:array<struct<c:string>>>")
    assert t.field("b").type.value_type.field("c").type == pa.large_string()
    with pytest.raises(ValueError, match="cannot backfill"):
        _arrow_type("interval")


def test_batch_null_filter_pushdown_prunes_files(spark, tmp_path):
    """IS NULL / IS NOT NULL predicates prune files via the manifest
    null counts, mirroring VersionedTable.read_null_pruned."""
    register_versioned_source(spark)
    vt = VersionedTable(spark, str(tmp_path / "vtn"))
    vt.commit_append(
        spark.range(0, 100).selectExpr("id", "'v' as tag").coalesce(1)
    )  # zero nulls
    vt.commit_append(
        spark.range(100, 200).selectExpr(
            "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE 'v' END as tag"
        ).coalesce(1)
    )  # some nulls
    vt.commit_append(
        spark.range(200, 300).selectExpr(
            "id", "CAST(NULL AS STRING) as tag"
        ).coalesce(1)
    )  # all null
    def base():
        return (
            spark.read.format("versioned")
            .option("root", vt.root)
            .option("statsPruning", "true")
            .load()
        )

    def planned_files(flt):
        # unit-level pruning observable (partition COUNT no longer maps
        # 1:1 to files since small-file packing): the reader's planned
        # file list after the pushed filter
        from finalpipeline_spark.sources.pyds import (
            VersionedReader,
            _PackedPartition,
        )

        m = vt.manifest()
        fields = [
            (f.name, f.dataType.simpleString())
            for f in vt.read().schema.fields
        ]
        r = VersionedReader(vt.root, m, fields, prune=True)
        r.pushFilters([flt])
        paths = []
        for p in r.partitions():
            paths += (
                [s.path for s in p.specs]
                if isinstance(p, _PackedPartition)
                else [p.path]
            )
        return paths

    from pyspark.sql.datasource import IsNotNull, IsNull

    nulls = base().filter("tag is null")
    assert nulls.count() == 10 + 100
    assert len(planned_files(IsNull(("tag",)))) == 2  # zero-null file pruned
    notnull = base().filter("tag is not null")
    assert notnull.count() == 100 + 90
    assert len(planned_files(IsNotNull(("tag",)))) == 2  # all-null pruned
    # a column added by evolution is provably NULL in every older file
    vt.add_column("score", "double")
    vt.commit_append(
        spark.range(300, 310).selectExpr(
            "id", "'v' as tag", "cast(id as double) as score"
        ).coalesce(1),
        merge_schema=True,
    )
    fresh = (
        spark.read.format("versioned")
        .option("root", vt.root)
        .option("statsPruning", "true")
        .load()
    )
    scored = fresh.filter("score is not null")
    assert scored.count() == 10
    assert len(planned_files(IsNotNull(("score",)))) == 1  # only the new file


def test_default_scan_is_sound_under_dataframe_reuse(spark, tmp_path):
    """Planning-time pruning is OPT-IN because Spark caches the planned
    scan per loaded DataFrame and reuses it for later filter-less
    queries (pushFilters/partitions are not called again — measured).
    By default every query on a reused DataFrame must stay correct."""
    register_versioned_source(spark)
    vt = VersionedTable(spark, str(tmp_path / "vtr"))
    vt.commit_append(spark.range(0, 100).selectExpr("id", "'a' as tag").coalesce(1))
    vt.commit_append(spark.range(100, 200).selectExpr("id", "'b' as tag").coalesce(1))
    df = spark.read.format("versioned").option("root", vt.root).load()
    assert df.count() == 200
    assert df.filter("id >= 150").count() == 50  # plans with filters
    assert df.count() == 200  # the poisoned-cache shape: must stay 200
    assert df.filter("id < 50").count() == 50
    assert df.count() == 200
    # the exceptAll self-compare that first exposed the leak
    native = vt.read()
    assert df.exceptAll(native).count() == 0
    assert native.exceptAll(df).count() == 0


def test_stream_starting_version_and_timestamp(spark, tmp_path):
    """Delta startingVersion/startingTimestamp parity: the stream
    begins AT the requested commit instead of the initial snapshot —
    the resume shape for consumers bootstrapped out of band."""
    import time as _t

    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vts"))
    t.commit_overwrite(spark.range(0, 50).selectExpr("id"))
    t.commit_append(spark.range(50, 80).selectExpr("id"))
    _t.sleep(0.05)
    mid = _t.time()
    _t.sleep(0.05)
    t.commit_append(spark.range(80, 100).selectExpr("id"))

    def drain(opts):
        out = str(tmp_path / f"out{len(list(opts))}{abs(hash(str(opts)))%997}")
        ck = out + "_ck"
        reader = spark.readStream.format("versioned").option("root", t.root)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            return sorted(r.id for r in spark.read.parquet(out).collect())
        except Exception:
            return []

    assert drain({"startingVersion": "2"}) == list(range(80, 100))
    assert drain({"startingVersion": "1"}) == list(range(50, 100))
    assert drain({"startingVersion": "0"}) == list(range(100))
    assert drain({"startingTimestamp": str(mid)}) == list(range(80, 100))
    # INCLUSIVE at exact equality (Delta: changes committed AT or after
    # the timestamp) — resuming from a commit ts copied out of the
    # history must replay that commit, not skip it
    exact = t.manifest(1)["ts"]
    assert drain({"startingTimestamp": str(exact)}) == list(range(50, 100))
    # beyond head+1 has nothing to diff against
    with pytest.raises(Exception, match="startingVersion|never committed"):
        drain({"startingVersion": "9"})
    with pytest.raises(Exception, match="not both"):
        drain({"startingVersion": "1", "startingTimestamp": "123"})


def test_batch_read_change_feed(spark, tmp_path):
    """Batch readChangeFeed (Delta parity) agrees row-for-row with
    VersionedTable.read_changes_rows across append + MoR delete + CoW
    delete commits, honors ending bounds, and refuses an unstarted or
    vacuumed range."""
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vcdf"))
    t.commit_overwrite(spark.range(0, 40).selectExpr("id", "id * 2 as v"))
    t.commit_append(spark.range(40, 60).selectExpr("id", "id * 2 as v"))
    t.delete_where("id < 5", mode="mor")
    t.delete_where("id >= 55", mode="cow")

    def feed(**opts):
        r = (
            spark.read.format("versioned")
            .option("root", t.root)
            .option("changeFeed", "true")
        )
        for k, v in opts.items():
            r = r.option(k, str(v))
        return r.load()

    got = feed(startingVersion=1)
    want = t.read_changes_rows(since_version=0)
    assert sorted(got.columns) == sorted(want.columns)
    key = lambda r: (r["_commit_version"], r["_change_type"], r["id"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    # bounded range: only the MoR delete commit
    mor = feed(startingVersion=2, endingVersion=2)
    assert sorted(r.id for r in mor.collect()) == list(range(5))
    assert {r._change_type for r in mor.collect()} == {"delete"}
    # full-history feed from the initial overwrite
    full = feed(startingVersion=0)
    inserts = [r for r in full.collect() if r._change_type == "insert"]
    assert sum(1 for r in inserts if r._commit_version == 0) == 40
    # an explicit start is required
    with pytest.raises(Exception, match="startingVersion or startingTimestamp"):
        (
            spark.read.format("versioned")
            .option("root", t.root)
            .option("changeFeed", "true")
            .load()
            .count()
        )


def test_cdf_commit_timestamp_parity(spark, tmp_path):
    """_commit_timestamp (Delta's third CDF meta column) carries the
    commit's recorded wall clock, identically on the JVM
    (read_changes_rows) and Python-source (batch changeFeed) paths."""
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vct"))
    t.commit_overwrite(spark.range(0, 10).selectExpr("id"))
    t.commit_append(spark.range(10, 20).selectExpr("id"))
    t.delete_where("id < 3", mode="mor")
    jvm = t.read_changes_rows(since_version=0)
    pyd = (
        spark.read.format("versioned")
        .option("root", t.root)
        .option("changeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    key = lambda r: (  # noqa: E731
        r["_commit_version"],
        r["_change_type"],
        r["id"],
        r["_commit_timestamp"],
    )
    assert sorted(map(key, jvm.collect())) == sorted(map(key, pyd.collect()))
    # the recorded wall clock, second-resolution sanity
    by_v = {r["_commit_version"]: r["_commit_timestamp"] for r in jvm.collect()}
    for v, ts in by_v.items():
        recorded = t._read_manifest_file(v)["ts"]
        assert abs(ts.timestamp() - recorded) < 0.001, (v, ts, recorded)


def test_changefeed_across_optimize_batch_and_stream(spark, tmp_path):
    """Both change-feed surfaces serve across OPTIMIZE commits with
    zero change rows for them (layout rewrite = provably empty row
    delta): the batch table_changes() view and the streaming
    changeFeed source, including a byte-targeted optimize."""
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0, 50).selectExpr("id").repartition(4)
    )                                                   # v0
    t.commit_append(spark.range(50, 60).selectExpr("id"))   # v1
    t.optimize(target_rows_per_file=1_000, mode="compact")  # v2
    t.commit_append(spark.range(60, 70).selectExpr("id"))   # v3
    t.optimize(target_bytes_per_file=1 << 30, mode="compact")  # v4
    t.commit_append(spark.range(70, 80).selectExpr("id"))   # v5

    from finalpipeline_spark.sources.pyds import table_changes

    ch = table_changes(spark, t.root, 0)
    rows = {(r["_commit_version"], r["id"]) for r in ch.collect()}
    assert {v for v, _ in rows} == {0, 1, 3, 5}
    assert rows >= {(3, i) for i in range(60, 70)}
    assert len(rows) == 80

    q = (
        spark.readStream.format("versioned")
        .option("root", t.root)
        .option("changeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 80
    assert set(
        r["_commit_version"] for r in got.select("_commit_version").collect()
    ) == {0, 1, 3, 5}


def test_changefeed_across_rollback_batch_and_stream(spark, tmp_path):
    """Both change-feed surfaces serve across ROLLBACK/RESTORE (Delta
    parity: RESTORE flows through readChangeFeed): the rollback's net
    delta emits as deletes+inserts — including resurrected rows from a
    deletion-vector shrink — and a keyed consumer replaying the feed
    converges to the exact restored snapshot. The append-only stream
    still refuses (no append-only delta exists) unless
    skipChangeCommits opted into the appends-only view."""
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 50).selectExpr("id").coalesce(1))  # v0
    t.delete_where("id < 10", mode="mor")                                # v1
    t.commit_append(spark.range(50, 60).selectExpr("id"))                # v2
    t.rollback(0)                                                        # v3

    from finalpipeline_spark.sources.pyds import table_changes

    ch = table_changes(spark, t.root, 0)
    rows = {(r["_commit_version"], r["_change_type"], r["id"]) for r in ch.collect()}
    assert {(1, "delete", i) for i in range(10)} <= rows
    assert {(3, "insert", i) for i in range(10)} <= rows  # dv shrink resurrection
    assert {(3, "delete", i) for i in range(50, 60)} <= rows
    assert len(rows) == 50 + 10 + 10 + (10 + 10)
    # replay-onto-base: the feed converges to the restored snapshot
    base: set[int] = set()
    for v in sorted({x for x, _, _ in rows}):
        base -= {i for vv, c, i in rows if vv == v and c == "delete"}
        base |= {i for vv, c, i in rows if vv == v and c == "insert"}
    assert base == {r["id"] for r in t.read().collect()} == set(range(50))

    # the STREAMING changeFeed source crosses the rollback too
    q = (
        spark.readStream.format("versioned")
        .option("root", t.root)
        .option("changeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == rows  # batch and stream feeds can never diverge

    # append-only mode: rollback still fails the stream ...
    def drain_append(out, ckpt, skip=False):
        r = spark.readStream.format("versioned").option("root", t.root)
        if skip:
            r = r.option("skipChangeCommits", "true")
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / out))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(
        Exception, match="no row-level delta|StreamingQueryException"
    ):
        drain_append("out2", "ckpt2")
    # ... unless skipChangeCommits opted into the appends-only view
    drain_append("out3", "ckpt3", skip=True)
    got3 = {r["id"] for r in spark.read.parquet(str(tmp_path / "out3")).collect()}
    assert got3 == set(range(60))  # v0 snapshot + v2 append; v1/v3 skipped


def test_append_stream_serves_across_optimize(spark, tmp_path):
    """Delta parity: streaming ignores dataChange=false actions — an
    OPTIMIZE between micro-batches must neither fail the append-only
    stream nor re-deliver the rows its rewrite relocated (the planner
    diffs per commit, so compaction contributes nothing)."""
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 40).selectExpr("id").repartition(4))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("versioned")
            .option("root", t.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    assert drain().count() == 40
    t.optimize(target_rows_per_file=1_000_000, mode="compact")
    t.commit_append(spark.range(40, 50).selectExpr("id"))
    got = drain()
    assert got.count() == 50  # +10 appended, ZERO re-delivered
    assert sorted(r["id"] for r in got.collect()) == list(range(50))
    # a single batch spanning snapshot + optimize + append also works
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    q = (
        spark.readStream.format("versioned")
        .option("root", t.root)
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out2).count() == 50


def test_append_stream_skip_change_commits(spark, tmp_path):
    """option(skipChangeCommits 'true'): the append-only stream skips
    content-mutation commits whole (Delta's appends-only view) instead
    of failing; the default still fails loudly."""
    register_versioned_source(spark)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 30).selectExpr("id"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("versioned")
        .option("root", t.root)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    t.delete_where("id < 5")                       # CoW mutation
    t.commit_append(spark.range(30, 35).selectExpr("id"))
    q = (
        spark.readStream.format("versioned")
        .option("root", t.root)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # appends-only view: the delete's rewrite contributes nothing, the
    # new append flows — deleted ids REMAIN in the consumed output
    assert sorted(r["id"] for r in got.collect()) == list(range(35))
    # default mode still refuses the mutation
    with pytest.raises(Exception, match="skipChangeCommits|content"):
        q = (
            spark.readStream.format("versioned")
            .option("root", t.root)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out3"))
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        raise RuntimeError("stream unexpectedly served a CoW delete")
    # and the option is refused in changeFeed mode (feeds serve
    # mutations as rows — skipping them there would be corruption)
    with pytest.raises(Exception, match="skipChangeCommits"):
        spark.readStream.format("versioned").option("root", t.root).option(
            "changeFeed", "true"
        ).option("skipChangeCommits", "true").load().writeStream.format(
            "noop"
        ).option(
            "checkpointLocation", str(tmp_path / "ckpt4")
        ).trigger(availableNow=True).start().awaitTermination(120)


def test_pacing_walk_ignores_unserved_commit_files(spark, tmp_path):
    """maxFilesPerTrigger budget counts only files the planner will
    SERVE: an optimize's rewritten files (never delivered) must not
    stall the version walk, and under skipChangeCommits neither must a
    CoW delete's survivor rewrites."""
    from finalpipeline_spark.sources.pyds import VersionedStreamReader

    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 20).selectExpr("id").repartition(2))
    t.commit_append(spark.range(20, 30).selectExpr("id").coalesce(1))  # v1
    t.optimize(target_rows_per_file=1_000_000, mode="compact")      # v2
    t.commit_append(spark.range(30, 40).selectExpr("id").coalesce(1))  # v3

    r = VersionedStreamReader(t.root, [("id", "bigint")], max_files=2)
    r.initialOffset()
    # v0 snapshot: 2 files = the whole budget
    assert r.latestOffset() == {"version": 0}
    r.partitions({"version": -1, "snapshot": True}, {"version": 0})
    # v1 adds 1 file; v2 (optimize) adds files but serves none — the
    # walk must advance THROUGH it and stop before v3's served file
    # only if the budget is exhausted (1 + 0 < 2 → v3 fits too)
    assert r.latestOffset() == {"version": 3}

    # skipChangeCommits: a CoW delete's rewrite files are not served
    t2 = VersionedTable(spark, str(tmp_path / "vt2"))
    t2.commit_overwrite(spark.range(0, 20).selectExpr("id"))
    t2.commit_append(spark.range(20, 30).selectExpr("id").coalesce(1))  # v1
    t2.delete_where("id < 5")                                       # v2 CoW
    t2.commit_append(spark.range(30, 40).selectExpr("id").coalesce(1))  # v3
    r2 = VersionedStreamReader(
        t2.root, [("id", "bigint")], max_files=2, skip_change_commits=True
    )
    r2.initialOffset()
    r2.partitions({"version": -1, "snapshot": True}, r2.latestOffset())
    assert r2.latestOffset() == {"version": 3}  # delete eats no budget


def test_stream_refuses_when_start_manifest_fully_gone(spark, tmp_path):
    """A consumed start version whose manifest (even the vacuum
    tombstone) has vanished must FAIL the next batch loudly in both
    stream modes — an empty diff base would silently re-deliver every
    carried-over row as new."""
    import os as _os

    from finalpipeline_spark.sources.pyds import (
        VersionedStreamReader,
        _live_manifests,
    )

    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(spark.range(0, 10).selectExpr("id"))          # v0
    t.commit_append(spark.range(10, 20).selectExpr("id"))            # v1
    t.commit_append(spark.range(20, 30).selectExpr("id"))            # v2
    # simulate total manifest loss for v1 (beyond vacuum: no tombstone)
    _os.remove(_os.path.join(t.root, "_log", "v%012d.json" % 1))
    live = _live_manifests(t.root)
    for cdf in (False, True):
        fields = [("id", "bigint")] + (
            [
                ("_change_type", "string"),
                ("_commit_version", "bigint"),
                ("_commit_timestamp", "timestamp"),
            ]
            if cdf
            else []
        )
        r = VersionedStreamReader(t.root, fields, cdf=cdf)
        with pytest.raises(ValueError, match="no manifest|never committed"):
            r.partitions({"version": 1}, {"version": 2}) if not cdf else (
                r._cdf_partitions({"version": 1}, 1, 2, live)
            )
