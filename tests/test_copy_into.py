"""COPY INTO (Databricks/Delta parity): file-granular idempotent
ingestion into versioned tables — the lakehouse-level twin of the
reference's processed-file ledger (reference main.py:37-43 tracks
``used_input_files`` to skip re-ingesting a file; COPY INTO records the
loaded file set in commit metadata so a re-run loads nothing).

Covers: engine ``copy_into`` (idempotence, incremental pickup, FORCE,
by-name alignment with NULL backfill, schema-evolution refusal/optin,
constraint + generated/identity enforcement riding commit_append, CSV
with imposed schema, exactly-once under a racing commit) and the SQL
statement (full option surface, metrics DataFrame), plus SHOW
PARTITIONS."""

from __future__ import annotations

import os

import pytest

from finalpipeline_spark.sources.versioned import (
    ConcurrentCommitError,
    SchemaMismatchError,
    VersionedTable,
)


def _stage(spark, path: str, expr: list[str], lo: int, hi: int) -> None:
    """One parquet file of spark.range(lo, hi) projected by expr."""
    spark.range(lo, hi).selectExpr(*expr).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


@pytest.fixture()
def target(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tgt"))
    t.commit_overwrite(
        spark.range(0, 0).selectExpr(
            "id", "cast(id as double) as val", "cast(null as string) as tag"
        )
    )
    return t


def test_copy_into_loads_then_idempotent(spark, tmp_path, target):
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id", "cast(id * 1.5 as double) as val",
                               "'a' as tag"], 0, 10)
    _stage(spark, f"{src}/b", ["id", "cast(id * 2.0 as double) as val",
                               "'b' as tag"], 10, 30)
    r1 = target.copy_into(src, pattern="*/*.parquet")
    assert r1["files_loaded"] == 2
    assert r1["rows_loaded"] == 30
    assert r1["files_skipped"] == 0
    assert target.read().count() == 30
    # re-run: nothing new, NO commit
    head = target.latest_version()
    r2 = target.copy_into(src, pattern="*/*.parquet")
    assert r2["files_loaded"] == 0 and r2["rows_loaded"] == 0
    assert r2["files_skipped"] == 2
    assert r2["version"] is None
    assert target.latest_version() == head
    # a new file arrives: ONLY it loads
    _stage(spark, f"{src}/c", ["id", "cast(0.0 as double) as val",
                               "'c' as tag"], 30, 35)
    r3 = target.copy_into(src, pattern="*/*.parquet")
    assert r3["files_loaded"] == 1 and r3["rows_loaded"] == 5
    assert r3["files_skipped"] == 2
    assert target.read().count() == 35
    # FORCE bypasses the ledger (duplicates, by request)
    r4 = target.copy_into(src, pattern="*/*.parquet", force=True)
    assert r4["files_loaded"] == 3
    assert target.read().count() == 70


def test_copy_into_ledger_survives_by_commit_meta(spark, tmp_path, target):
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id", "cast(id as double) as val",
                               "'a' as tag"], 0, 10)
    target.copy_into(src, pattern="*/*.parquet")
    m = target.manifest()
    assert "copy_into" in (m.get("meta") or {})
    ent = m["meta"]["copy_into"]["files"]
    assert len(ent) == 1 and ent[0]["path"].endswith(".parquet")
    # a FRESH handle (new process analogue) still skips loaded files
    t2 = VersionedTable(spark, target.root)
    r = t2.copy_into(src, pattern="*/*.parquet")
    assert r["files_loaded"] == 0 and r["files_skipped"] == 1


def test_copy_into_aligns_by_name_null_backfill(spark, tmp_path, target):
    src = str(tmp_path / "src")
    # source file lacks `tag` and orders columns differently
    spark.range(0, 4).selectExpr(
        "cast(id * 3 as double) as val", "id"
    ).coalesce(1).write.parquet(f"{src}/a")
    r = target.copy_into(src, pattern="*/*.parquet")
    assert r["rows_loaded"] == 4
    rows = target.read().orderBy("id").collect()
    assert [x["val"] for x in rows] == [0.0, 3.0, 6.0, 9.0]
    assert all(x["tag"] is None for x in rows)


def test_copy_into_extra_column_refuses_unless_merge(spark, tmp_path, target):
    src = str(tmp_path / "src")
    spark.range(0, 3).selectExpr(
        "id", "cast(id as double) as val", "'x' as tag", "id * 10 as extra"
    ).coalesce(1).write.parquet(f"{src}/a")
    head = target.latest_version()
    with pytest.raises(SchemaMismatchError):
        target.copy_into(src, pattern="*/*.parquet")
    assert target.latest_version() == head  # nothing committed
    r = target.copy_into(src, pattern="*/*.parquet", merge_schema=True)
    assert r["files_loaded"] == 1
    assert "extra" in target.read().columns
    assert target.read().selectExpr("sum(extra) as s").first()["s"] == 30


def test_copy_into_csv_imposed_schema(spark, tmp_path, target):
    src = str(tmp_path / "csv")
    spark.range(0, 5).selectExpr(
        "id", "cast(id * 2 as double) as val", "'c' as tag"
    ).coalesce(1).write.option("header", "true").csv(src)
    r = target.copy_into(src, file_format="csv")
    assert r["rows_loaded"] == 5
    got = target.read().orderBy("id").collect()
    assert [x["val"] for x in got] == [0.0, 2.0, 4.0, 6.0, 8.0]
    assert dict(target.read().dtypes)["id"] == "bigint"


def test_copy_into_enforces_constraints(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "cons"))
    t.commit_overwrite(spark.range(0, 0).selectExpr("id", "id * 2 as v"))
    t.add_constraint("v_nonneg", "v >= 0")
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/bad", ["id", "id - 100 as v"], 0, 5)
    head = t.latest_version()
    with pytest.raises(Exception, match="v_nonneg"):
        t.copy_into(src, pattern="*/*.parquet")
    assert t.latest_version() == head  # refused load left no commit
    # ...and the refused files are NOT in the ledger: a corrected
    # re-stage of the same paths loads
    _stage(spark, f"{src}/bad", ["id", "id + 100 as v"], 0, 5)
    r = t.copy_into(src, pattern="*/*.parquet")
    assert r["files_loaded"] == 1 and r["rows_loaded"] == 5


def test_copy_into_computes_generated_and_identity(spark, tmp_path):
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    root = str(tmp_path / "gen")
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{root}` ("
        "rid BIGINT GENERATED ALWAYS AS IDENTITY, "
        "id BIGINT, twice BIGINT GENERATED ALWAYS AS (id * 2))",
    )
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id"], 0, 6)
    t = VersionedTable(spark, root)
    r = t.copy_into(src, pattern="*/*.parquet")
    assert r["rows_loaded"] == 6
    rows = t.read().orderBy("id").collect()
    assert [x["twice"] for x in rows] == [0, 2, 4, 6, 8, 10]
    assert len({x["rid"] for x in rows}) == 6  # identity assigned


def test_copy_into_exactly_once_under_racing_commit(spark, tmp_path, target):
    """A commit landing between the ledger snapshot and the append must
    NOT be lost or double-load: copy_into's append asserts its CAS base
    against the snapshot the ledger was computed from and retries the
    whole derivation."""
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id", "cast(id as double) as val",
                               "'a' as tag"], 0, 10)
    orig = type(target).commit_append
    fired = {"n": 0}

    def raced(self, df, meta=None, merge_schema=False, expected_base=None):
        if fired["n"] == 0:
            fired["n"] = 1
            # the racer loads the SAME file first (another COPY run)
            racer = VersionedTable(spark, self.root)
            racer.copy_into(src, pattern="*/*.parquet")
        return orig(
            self, df, meta=meta, merge_schema=merge_schema,
            expected_base=expected_base,
        )

    import unittest.mock as mock

    with mock.patch.object(type(target), "commit_append", raced):
        r = target.copy_into(src, pattern="*/*.parquet")
    # the retry re-read the ledger and found the racer's load
    assert r["files_loaded"] == 0 and r["files_skipped"] == 1
    assert target.read().count() == 10  # no double load


def test_commit_append_expected_base_guard(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "cas"))
    t.commit_overwrite(spark.range(0, 5).selectExpr("id"))
    base = t.latest_version()
    t.commit_append(spark.range(5, 8).selectExpr("id"))
    with pytest.raises(ConcurrentCommitError):
        t.commit_append(
            spark.range(8, 9).selectExpr("id"), expected_base=base
        )
    # matching base commits fine
    t.commit_append(
        spark.range(8, 9).selectExpr("id"), expected_base=base + 1
    )
    assert t.read().count() == 9


def test_copy_into_requires_existing_table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "none"))
    with pytest.raises(ValueError, match="CREATE"):
        t.copy_into(str(tmp_path))


def test_sql_copy_into_full_shape(spark, tmp_path):
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    root = str(tmp_path / "sqlt")
    versioned_sql(
        spark,
        f"CREATE TABLE versioned.`{root}` (id BIGINT, val DOUBLE, tag STRING)",
    )
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id", "cast(id as double) as val",
                               "'a' as tag"], 0, 12)
    out = versioned_sql(
        spark,
        f"COPY INTO versioned.`{root}` FROM '{src}' "
        "FILEFORMAT = PARQUET PATTERN = '*/*.parquet'",
    )
    row = out.first()
    assert row["num_loaded_files"] == 1
    assert row["num_inserted_rows"] == 12
    assert row["num_skipped_files"] == 0
    # idempotent re-run through SQL
    row2 = versioned_sql(
        spark,
        f"COPY INTO versioned.`{root}` FROM '{src}' "
        "FILEFORMAT = PARQUET PATTERN = '*/*.parquet'",
    ).first()
    assert row2["num_loaded_files"] == 0 and row2["num_skipped_files"] == 1
    assert row2["version"] is None
    # COPY_OPTIONS force reloads
    row3 = versioned_sql(
        spark,
        f"COPY INTO versioned.`{root}` FROM '{src}' "
        "FILEFORMAT = PARQUET PATTERN = '*/*.parquet' "
        "COPY_OPTIONS ('force' = 'true')",
    ).first()
    assert row3["num_loaded_files"] == 1
    assert VersionedTable(spark, root).read().count() == 24


def test_sql_copy_into_csv_format_options(spark, tmp_path):
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    root = str(tmp_path / "sqlcsv")
    versioned_sql(
        spark, f"CREATE TABLE versioned.`{root}` (id BIGINT, val DOUBLE)"
    )
    src = str(tmp_path / "csv")
    spark.range(0, 4).selectExpr(
        "id", "cast(id as double) as val"
    ).coalesce(1).write.option("header", "true").option(
        "sep", ";"
    ).csv(src)
    row = versioned_sql(
        spark,
        f"COPY INTO versioned.`{root}` FROM '{src}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header' = 'true', 'sep' = ';')",
    ).first()
    assert row["num_inserted_rows"] == 4


def test_sql_copy_into_bad_shapes_fail_loud(spark, tmp_path):
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    root = str(tmp_path / "sqlbad")
    versioned_sql(spark, f"CREATE TABLE versioned.`{root}` (id BIGINT)")
    with pytest.raises(ValueError, match="COPY INTO"):
        versioned_sql(spark, f"COPY INTO versioned.`{root}`")
    with pytest.raises(ValueError, match="FILEFORMAT"):
        versioned_sql(
            spark,
            f"COPY INTO versioned.`{root}` FROM '{root}' FILEFORMAT = XML",
        )
    with pytest.raises(ValueError, match="COPY_OPTIONS"):
        versioned_sql(
            spark,
            f"COPY INTO versioned.`{root}` FROM '{root}' "
            "COPY_OPTIONS ('unknown' = '1')",
        )


def test_show_partitions(spark, tmp_path):
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    root = str(tmp_path / "pt")
    t = VersionedTable(spark, root, partition_by=["grp"])
    t.commit_overwrite(
        spark.range(0, 40).selectExpr("id", "cast(id % 4 as int) as grp")
    )
    out = versioned_sql(spark, f"SHOW PARTITIONS versioned.`{root}`")
    assert out.columns == ["grp"]
    assert dict(out.dtypes)["grp"] == "int"  # typed, not raw path strings
    assert sorted(r["grp"] for r in out.collect()) == [0, 1, 2, 3]
    # partition-scoped delete drops its partition from the listing
    t.delete_where("grp = 2")
    left = versioned_sql(spark, f"SHOW PARTITIONS versioned.`{root}`")
    assert sorted(r["grp"] for r in left.collect()) == [0, 1, 3]


def test_copy_into_partitioned_target(spark, tmp_path):
    """COPY into a PARTITIONED table routes through the partitioned
    write layout: per-file pv stamps appear, partition-scoped delete of
    copied data stays metadata-only, and the idempotence ledger still
    holds."""
    root = str(tmp_path / "pt")
    t = VersionedTable(spark, root, partition_by=["grp"])
    t.commit_overwrite(
        spark.range(0, 0).selectExpr("id", "cast(id as int) as grp")
    )
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id", "cast(id % 2 as int) as grp"], 0, 20)
    r = t.copy_into(src, pattern="*/*.parquet")
    assert r["rows_loaded"] == 20
    m = t.manifest()
    assert all("pv" in f for f in m["files"])
    before = {f["path"] for f in m["files"]}
    t.delete_where("grp = 1")
    after = {f["path"] for f in t.manifest()["files"]}
    assert after < before  # dropped partitions, zero rewrites
    assert t.read().count() == 10
    r2 = t.copy_into(src, pattern="*/*.parquet")
    assert r2["files_loaded"] == 0  # the delete does not un-ledger


def test_copy_into_after_type_widening(spark, tmp_path):
    """Ledger and alignment survive schema evolution between COPY runs:
    widen the column type, then a later COPY casts new files to the
    widened type while old files stay skipped."""
    t = VersionedTable(spark, str(tmp_path / "w"))
    t.commit_overwrite(
        spark.range(0, 0).selectExpr("id", "cast(id as int) as n")
    )
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id", "cast(id as int) as n"], 0, 5)
    t.copy_into(src, pattern="*/*.parquet")
    t.widen_column("n", "bigint")
    _stage(spark, f"{src}/b", ["id", "cast(id + 3000000000 as bigint) as n"],
           5, 8)
    r = t.copy_into(src, pattern="*/*.parquet")
    assert r["files_loaded"] == 1 and r["files_skipped"] == 1
    got = t.read().orderBy("id")
    assert dict(got.dtypes)["n"] == "bigint"
    assert got.count() == 8
    assert got.tail(1)[0]["n"] == 3000000007


def test_show_partitions_unpartitioned_refuses(spark, tmp_path):
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    root = str(tmp_path / "flat")
    VersionedTable(spark, root).commit_overwrite(
        spark.range(3).selectExpr("id")
    )
    with pytest.raises(ValueError, match="not partitioned"):
        versioned_sql(spark, f"SHOW PARTITIONS versioned.`{root}`")


_COPY_WORKER = r"""
import sys
sys.path.insert(0, ".")
root, src, wid = sys.argv[1], sys.argv[2], int(sys.argv[3])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"mp-copier-{wid}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from finalpipeline_spark.sources.versioned import VersionedTable

vt = VersionedTable(spark, root)
r = vt.copy_into(src, pattern="*/*.parquet", attempts=60)
print("COPIER-OK", wid, r["files_loaded"], r["files_skipped"])
"""


def test_cross_process_racing_copies_load_exactly_once(spark, tmp_path):
    """Three independent driver JVMs COPY the same source dir into one
    table simultaneously; the snapshot-pinned CAS must make the union
    of their loads exactly-once (every file loaded by exactly one
    winner, losers skip on retry). This is the deployment shape of a
    shared landing zone with redundant ingest jobs."""
    import subprocess
    import sys as _sys

    root = str(tmp_path / "vt")
    t = VersionedTable(spark, root)
    t.commit_overwrite(
        spark.range(0, 0).selectExpr("id", "cast(id as int) as part")
    )
    src = str(tmp_path / "src")
    for k in range(4):
        _stage(spark, f"{src}/f{k}",
               ["id", f"cast({k} as int) as part"], 100 * k, 100 * k + 25)

    env = {**os.environ, "PYSPARK_PYTHON": _sys.executable}
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", _COPY_WORKER, root, src, str(w)],
            cwd="/root/repo",
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for w in range(3)
    ]
    outs = [p.communicate(timeout=800)[0] for p in procs]
    loaded = skipped = 0
    for w, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"copier {w} failed:\n{out[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("COPIER-OK")]
        assert line, out[-2000:]
        _, _, fl, fs = line[0].split()
        loaded += int(fl)
        skipped += int(fs)
    # exactly-once across the fleet: 4 files loaded in total, the
    # other 8 observations were ledger skips
    assert loaded == 4
    assert skipped == 8
    assert t.read().count() == 100
    # ledger holds each path exactly once across commits
    paths = []
    for v in t.versions():
        m = t._read_manifest_file(v).get("meta") or {}
        if "copy_into" in m:
            paths.extend(e["path"] for e in m["copy_into"]["files"])
    assert len(paths) == 4 and len(set(paths)) == 4


def test_copy_into_json_and_orc(spark, tmp_path, target):
    src_j = str(tmp_path / "json")
    spark.range(0, 4).selectExpr(
        "id", "cast(id * 3 as double) as val", "'j' as tag"
    ).coalesce(1).write.json(src_j)
    r = target.copy_into(src_j, file_format="json")
    assert r["rows_loaded"] == 4
    src_o = str(tmp_path / "orc")
    spark.range(4, 9).selectExpr(
        "id", "cast(id as double) as val", "'o' as tag"
    ).coalesce(1).write.orc(src_o)
    r2 = target.copy_into(src_o, file_format="orc")
    assert r2["rows_loaded"] == 5
    got = target.read().orderBy("id").collect()
    assert [x["tag"] for x in got] == ["j"] * 4 + ["o"] * 5
    assert got[1]["val"] == 3.0  # json read under the imposed schema
    # per-source ledgers are independent: both re-runs are no-ops
    assert target.copy_into(src_j, file_format="json")["files_loaded"] == 0
    assert target.copy_into(src_o, file_format="orc")["files_loaded"] == 0


def test_show_partitions_date_typed(spark, tmp_path):
    from finalpipeline_spark.sources.sql_dml import versioned_sql

    root = str(tmp_path / "dpt")
    t = VersionedTable(spark, root, partition_by=["d"])
    t.commit_overwrite(
        spark.range(0, 30).selectExpr(
            "id", "date_add('2024-03-01', cast(id % 3 as int)) as d"
        )
    )
    out = versioned_sql(spark, f"SHOW PARTITIONS versioned.`{root}`")
    assert dict(out.dtypes)["d"] == "date"
    import datetime

    assert [r["d"] for r in out.collect()] == [
        datetime.date(2024, 3, 1),
        datetime.date(2024, 3, 2),
        datetime.date(2024, 3, 3),
    ]


def test_copy_ledger_cache_reads_only_new_manifests(spark, tmp_path, target):
    """The ledger scan is contiguity-cached per root: after one COPY
    has warmed the cache, a later COPY re-reads v0 (the replacement
    pin) plus only the manifests committed since — not the whole log."""
    import unittest.mock as mock

    src = str(tmp_path / "src")
    for k in range(3):
        _stage(spark, f"{src}/f{k}",
               ["id", "cast(id as double) as val", f"'{k}' as tag"],
               10 * k, 10 * k + 5)
    for k in range(5):  # grow the log so the cached span is non-trivial
        target.commit_append(
            spark.range(100 + k, 101 + k).selectExpr(
                "id", "cast(id as double) as val", "'x' as tag"
            )
        )
    target.copy_into(src, pattern="*/*.parquet")  # warms the cache
    target.write_anchor()  # bound versions()'s own tail walk
    head = target.latest_version()
    assert head >= 6
    orig = type(target)._read_manifest_file
    calls = []

    def counting(self, v, *a, **k):
        calls.append(v)
        return orig(self, v, *a, **k)

    with mock.patch.object(type(target), "_read_manifest_file", counting):
        r = target.copy_into(src, pattern="*/*.parquet")
    assert r["files_loaded"] == 0
    # the ledger scan read ONLY the v0 pin: versions <= cached upto
    # were skipped (tail probes past head and manifest() head reads
    # ride along, so bound the MIDDLE of the log, which is what grows)
    assert calls.count(0) <= 2
    middle = [v for v in calls if 0 < v < head]
    assert len(middle) <= 2  # not O(log length)


def test_copy_ledger_resets_on_table_replacement(spark, tmp_path):
    """rmtree + re-create at the same root is a DIFFERENT table: the
    ledger must not inherit the dead table's loaded set (the v0-ts
    pin), or a fresh table would silently skip its first load."""
    import shutil
    import time as _t

    root = str(tmp_path / "vt")
    src = str(tmp_path / "src")
    _stage(spark, f"{src}/a", ["id", "cast(id as double) as val"], 0, 6)

    def build():
        t = VersionedTable(spark, root)
        t.commit_overwrite(
            spark.range(0, 0).selectExpr("id", "cast(id as double) as val")
        )
        return t

    t1 = build()
    assert t1.copy_into(src, pattern="*/*.parquet")["files_loaded"] == 1
    shutil.rmtree(root)
    _t.sleep(0.01)  # distinct v0 commit timestamp
    t2 = build()
    r = t2.copy_into(src, pattern="*/*.parquet")
    assert r["files_loaded"] == 1  # fresh table loads again
    assert t2.read().count() == 6
