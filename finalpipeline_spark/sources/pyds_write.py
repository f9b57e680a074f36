"""Write half of the ``versioned`` Python DataSource: SQL DML for the
SQL-only persona.

The reference's consumer persona is pure SQL (reference
``views_p1.py:3-43`` builds its entire mart with SQL strings), and the
r8 ``USING versioned`` surface was read-only — snapshot, time travel,
CDF, history. This module closes the write half: once
``register_versioned_source(spark)`` has run, a SQL-only user can

* ``INSERT INTO <view>``/``INSERT OVERWRITE <view>`` where the view is
  ``CREATE TEMPORARY VIEW v USING versioned OPTIONS (root '/p/t')`` —
  Spark routes the insert through this writer (V2 write path); and
* ``df.write.format("versioned").option("root", p).mode("append"
  |"overwrite").save()`` — including BOOTSTRAP of a brand-new table
  from nothing but the format name.

Execution shape (the Delta write protocol, restated for the Python
DataSource API):

1. Each executor task streams its Arrow batches straight into ONE new
   parquet file under the commit's fresh ``data/c<uuid>/`` directory,
   folding per-file min/max/null-count stats as it goes (zero extra
   read pass — the JVM path re-reads new files for stats; here the
   bytes are already in hand). Memory is bounded by one RecordBatch.
2. The driver-side ``commit()`` assembles the manifest entries and
   claims the next version with the SAME exclusive-create +
   read-back-verify + aborted-fragment-recovery protocol as
   ``VersionedTable._write_manifest`` (sources/versioned_log.py),
   re-expressed over ``os`` primitives because the Python DataSource's
   planning/commit hooks run in a Python worker with NO JVM: a lost
   race re-derives from the fresh head and retries (optimistic CAS),
   so concurrent INSERTs each land exactly once.

``INSERT OVERWRITE`` requires Spark's default
``spark.sql.sources.partitionOverwriteMode=static``: under ``dynamic``
the analyzer plans ``OverwritePartitionsDynamic``, an interface the
Python DataSource API does not expose (the repo's own dynamic-mode
writers scope the conf flip with save/restore for this reason).

Interop: ``os.open(O_CREAT|O_EXCL)`` is an atomic claim locally and
the read-back verification absorbs the same ms-scale windows the
Hadoop-side protocol documents, so SQL writers and JVM
``VersionedTable`` writers can race each other on local/NFS roots (an
object store would swap in a conditional-put, Delta's S3 LogStore
caveat — same as the read side).

Enforcement boundary, loud by design: tables carrying CHECK
constraints, GENERATED, or IDENTITY columns REFUSE this path at plan
time. Their invariants are enforced by Spark expressions
(``versioned_schema.py``), and the executor/commit hooks here have no
engine to evaluate them — silently writing unvalidated rows (or
approximating the expressions with a different engine) could corrupt
the very guarantees those features exist to keep. The refusal names
the full-fidelity alternative: ``versioned_sql()``
(sources/sql_dml.py), which parses the same SQL text and runs the
Spark-side API in the user's session.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Any, Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

from finalpipeline_spark.sources.pyds import _LOG_DIR, _live_manifests

_DATA_DIR = "data"
_MANIFEST_FMT = "v%012d.json"
# Mirrors of versioned_base's protocol budgets (keep in sync): see the
# JVM-side docstrings for the reasoning; values must match so the two
# writer populations reason identically about each other's poll
# windows.
_VERIFY_POLL_SECONDS = 1.0
_VERIFY_MARGIN_SECONDS = 0.5
_GRACE_SECONDS = 60.0
SUPPORTED_WRITER_VERSION = 1

# Columns worth min/max stats — mirror of versioned_base._stat_cols'
# eligible set, keyed on Spark simpleString type names.
_STAT_TYPES = {
    "int", "bigint", "smallint", "tinyint", "float", "double",
    "string", "date", "timestamp", "boolean",
}

# String-bound truncation — mirror of versioned_base._STR_STAT_MAX /
# _trunc_upper (duplicated: this module must stay importable in the
# engine-less plan worker without the JVM-facing base module). A
# document-body column must never put whole documents into manifest
# entries as min/max; see versioned_dml._write_data_files for the
# bound-validity argument.
_STR_STAT_MAX = 64


def _trunc_upper(prefix: str) -> str | None:
    chars = list(prefix)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp < 0x10FFFF:
            nxt = cp + 1
            if nxt == 0xD800:  # surrogate block: not a scalar value
                nxt = 0xE000
            return "".join(chars[:i]) + chr(nxt)
    return None


class ConcurrentSqlWriteError(RuntimeError):
    """Another writer claimed this version first; the commit loop
    re-reads the head and retries — surfacing only after the retry
    budget is spent."""


def _json_safe(v: Any) -> Any:
    """Mirror of versioned_base._json_safe, plus tz normalization:
    Spark ships Arrow timestamps tz-aware (session tz), while the JVM
    stats path collects them naive — convert to naive UTC so the two
    writer populations record comparable stat strings."""
    import datetime

    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


def _read_manifest(path: str) -> dict | None:
    try:
        with open(path, "rb") as fh:
            return json.loads(fh.read().decode("utf-8"))
    except (FileNotFoundError, json.JSONDecodeError, UnicodeDecodeError):
        return None


def _head(root: str) -> tuple[int | None, dict | None]:
    """(version, manifest) of the latest LIVE commit (vacuum never
    expires the head, so live-max == committed-max), or (None, None)
    for a table that does not exist yet."""
    live = _live_manifests(root)
    if not live:
        return None, None
    v = max(live)
    return v, live[v]


def _older_than_grace(path: str, grace: float) -> bool:
    try:
        return os.path.getmtime(path) < time.time() - grace
    except OSError:
        return False  # vanished mid-probe: not ours to recover


def _verify_own(path: str, payload: bytes, version: int, root: str) -> None:
    """Read-back self-verification — mirror of
    LogProtocolMixin._verify_own_commit: success is only reported once
    this writer sees its OWN bytes in the slot; a foreign valid
    manifest is a definitive loss; missing/unparseable polls briefly
    (we may sit in a racing recovery's quarantine about to be
    restored)."""
    deadline = time.time() + _VERIFY_POLL_SECONDS
    while True:
        try:
            with open(path, "rb") as fh:
                now = fh.read()
        except OSError:
            now = None
        if now == payload:
            return
        if now is not None:
            try:
                json.loads(now.decode("utf-8"))
                raise ConcurrentSqlWriteError(
                    f"version {version} of {root}: this writer's manifest "
                    "was recovered away mid-write and the slot was "
                    "committed by another writer — retry"
                )
            except (json.JSONDecodeError, UnicodeDecodeError):
                pass  # unparseable occupant: indeterminate, keep polling
        if time.time() > deadline:
            raise ConcurrentSqlWriteError(
                f"version {version} of {root}: this writer's manifest "
                "vanished from its slot mid-write — retry"
            )
        time.sleep(0.02)


def _restore_quarantined(quarantine: str, path: str, version: int, root: str) -> None:
    """We quarantined a VALID manifest (a racer committed between our
    probe and our rename). Mirror of
    LogProtocolMixin._restore_quarantined with os primitives:
    ``os.link`` gives a true no-clobber restore (EEXIST if the slot was
    re-occupied). Fresh quarantines (their writer is still inside its
    verify poll) may be left as aborted junk after waiting out that
    poll — the writer has certainly raised and retried; stale ones must
    restore or fail loudly (their writer may have reported success long
    ago)."""
    try:
        mtime = os.path.getmtime(quarantine)
    except OSError:
        return  # vanished: another actor resolved it
    verify_deadline = mtime + _VERIFY_POLL_SECONDS
    fresh = time.time() < verify_deadline - _VERIFY_MARGIN_SECONDS
    try:
        os.link(quarantine, path)
        os.unlink(quarantine)
        return
    except OSError:
        pass
    if fresh:
        wait = verify_deadline + _VERIFY_MARGIN_SECONDS - time.time()
        if wait > 0:
            time.sleep(wait)
        return
    raise RuntimeError(
        f"failed to restore concurrently committed manifest for version "
        f"{version} of {root}; it is preserved at {quarantine} — restore "
        "it manually"
    )


def _claim(root: str, version: int, payload: bytes, grace: float) -> None:
    """Claim ``version`` with an exclusive create (atomic locally),
    recovering a stale aborted fragment exactly like
    LogProtocolMixin._write_manifest: quarantine-rename as the
    exclusive recovery claim, verify-after-claim, restore if we stole
    a racer's valid commit."""
    log = os.path.join(root, _LOG_DIR)
    os.makedirs(log, exist_ok=True)
    path = os.path.join(log, _MANIFEST_FMT % version)

    def _excl_create() -> int | None:
        try:
            return os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return None

    fd = _excl_create()
    if fd is None:
        occupant = _read_manifest(path)
        if occupant is not None or not _older_than_grace(path, grace):
            # committed concurrently, or a LIVE writer mid-write
            raise ConcurrentSqlWriteError(
                f"version {version} of {root} was committed concurrently"
            )
        quarantine = path + ".aborted-" + uuid.uuid4().hex
        try:
            os.rename(path, quarantine)
        except OSError:
            raise ConcurrentSqlWriteError(
                f"version {version} of {root}: aborted-manifest recovery "
                "lost a race"
            ) from None
        if _read_manifest(quarantine) is not None:
            # stole a racer's valid commit between probe and rename
            _restore_quarantined(quarantine, path, version, root)
            raise ConcurrentSqlWriteError(
                f"version {version} of {root} was committed concurrently "
                "(recovered mid-flight by another writer)"
            )
        fd = _excl_create()
        if fd is None:
            raise ConcurrentSqlWriteError(
                f"version {version} of {root} was committed concurrently "
                "(after aborted-manifest recovery)"
            )
    try:
        os.write(fd, payload)
        os.fsync(fd)
    finally:
        os.close(fd)
    _verify_own(path, payload, version, root)


def _refuse_engine_features(m: dict, root: str) -> None:
    """The SQL write path has no Spark engine at enforcement time —
    refuse tables whose write-side invariants need one."""
    needs = [
        k
        for k in ("constraints", "generated", "identity", "partition_by")
        if m.get(k)
    ]
    if needs:
        raise ValueError(
            f"{root} declares {'/'.join(needs)} — the SQL INSERT path "
            "cannot enforce engine-evaluated write invariants; use "
            "versioned_sql() (finalpipeline_spark.sources.sql_dml) or "
            "the VersionedTable API, which enforce them with Spark"
        )


def _ddl_fields(ddl: str) -> list[tuple[str, str]]:
    """``struct<a:int,b:array<int>>`` → [(name, type)] — depth-aware
    top-level split (pyds._split_top), pyspark-free like everything in
    the commit hooks."""
    from finalpipeline_spark.sources.pyds import _split_top

    if not (ddl.startswith("struct<") and ddl.endswith(">")):
        raise ValueError(f"not a struct DDL: {ddl!r}")
    inner = ddl[len("struct<"):-1]
    if not inner:
        return []
    out = []
    for part in _split_top(inner):
        name, typ = part.split(":", 1)
        out.append((name, typ))
    return out


def _ghost_names_os(root: str, current: set[str]) -> set[str]:
    """Mirror of SchemaEvolutionMixin._ghost_names: names that appeared
    in some schema since the last clean slate (overwrite) but are not
    current — their values may still sit in referenced files, so
    re-adding them by plain schema merge would resurrect dropped
    data. Manifest-sized walk."""
    from finalpipeline_spark.sources.pyds import _listed_hi, _manifest_any

    log = os.path.join(root, _LOG_DIR)
    if not os.path.isdir(log):
        return set()
    head = _listed_hi(log)
    while _manifest_any(root, head + 1) is not None:
        head += 1
    manifests = [
        m for v in range(head + 1) if (m := _manifest_any(root, v)) is not None
    ]
    slate = max(
        (m["version"] for m in manifests if m["action"] == "overwrite"),
        default=-1,
    )
    seen: set[str] = set()
    for m in manifests:
        if m["version"] >= slate:
            seen |= {n for n, _ in _ddl_fields(m["schema"])}
    return seen - current


def _merge_schemas(root: str, table_ddl: str, write_ddl: str) -> str:
    """Additive schema evolution for the native write path (Delta's
    mergeSchema): table fields + genuinely-new write fields, in that
    order. Same-name type changes and RE-ADDS of previously-dropped
    names refuse (the latter needs the JVM API's column-mapping
    machinery — a plain merge would resurrect pre-drop values)."""
    old = _ddl_fields(table_ddl)
    new = _ddl_fields(write_ddl)
    old_by = dict(old)
    conflicts = sorted(n for n, t in new if n in old_by and old_by[n] != t)
    if conflicts:
        raise ValueError(
            f"type change on {conflicts} inserting into {root} is not "
            "supported (additive evolution only)"
        )
    added = [(n, t) for n, t in new if n not in old_by]
    if added:
        ghosts = _ghost_names_os(root, {n for n, _ in old}) & {
            n for n, _ in added
        }
        if ghosts:
            raise ValueError(
                f"column(s) {sorted(ghosts)} were previously dropped from "
                f"{root}: re-adding by schema merge would resurrect their "
                "old values — use VersionedTable.add_column (column-"
                "mapping re-add) instead"
            )
    merged = old + added
    return "struct<" + ",".join(f"{n}:{t}" for n, t in merged) + ">"


def commit_os(
    root: str,
    action: str,
    entries: list[dict[str, Any]],
    schema_ddl: str,
    meta: dict[str, Any] | None = None,
    attempts: int = 10,
    grace: float = _GRACE_SECONDS,
    merge_schema: bool = False,
) -> dict[str, Any]:
    """Commit ``entries`` as the next version of ``root`` under
    optimistic concurrency: every attempt re-reads the head (so an
    append re-bases onto the freshest file list — the CAS is implicit
    in claim-next-slot-from-fresh-head) and re-checks the gates. The
    returned manifest is the committed one."""
    last: Exception | None = None
    for attempt in range(attempts):
        head_v, head_m = _head(root)
        effective_schema = schema_ddl
        if head_m is not None:
            if head_m.get("writer", 1) > SUPPORTED_WRITER_VERSION:
                raise ValueError(
                    f"{root} requires writer protocol {head_m['writer']} "
                    f"(this build supports {SUPPORTED_WRITER_VERSION}) — "
                    "upgrade before committing to this table"
                )
            _refuse_engine_features(head_m, root)
            if action == "append":
                if head_m["schema"] == schema_ddl:
                    effective_schema = head_m["schema"]
                elif merge_schema:
                    effective_schema = _merge_schemas(
                        root, head_m["schema"], schema_ddl
                    )
                else:
                    raise ValueError(
                        f"schema mismatch inserting into {root}: the table "
                        f"is {head_m['schema']} but the write plans "
                        f"{schema_ddl} — recreate the view if the table "
                        "evolved, pass option('mergeSchema', 'true') for "
                        "additive evolution, or use the VersionedTable API"
                    )
        version = 0 if head_v is None else head_v + 1
        manifest: dict[str, Any] = {
            "version": version,
            "parent": head_v,
            "action": action,
            "schema": effective_schema,
            "ts": round(time.time(), 3),
            "files": (
                list(head_m["files"]) if action == "append" and head_m else []
            ) + entries,
        }
        if head_m is not None:
            # reader requirement is sticky table-wide (see versioned_log)
            req = head_m.get("reader", 1)
            if req > 1:
                manifest["reader"] = req
            # table properties carry forward: bloom_index is live on
            # this path (the writers honor it); the engine-feature trio
            # is a defensive carry — unreachable while the refusal gate
            # above is absolute, kept so a future relaxation cannot
            # silently drop them
            for k in (
                "constraints", "generated", "identity", "bloom_index",
            ):
                if head_m.get(k):
                    manifest[k] = dict(head_m[k])
            if head_m.get("partition_by"):
                manifest["partition_by"] = list(head_m["partition_by"])
        if meta:
            manifest["meta"] = meta
        payload = json.dumps(manifest).encode("utf-8")
        try:
            _claim(root, version, payload, grace)
            return manifest
        except ConcurrentSqlWriteError as exc:
            last = exc
            time.sleep(0.05 * (2**attempt) * random.random())
    raise last  # type: ignore[misc]


@dataclass
class FileCommitMessage(WriterCommitMessage):
    entry: Optional[dict] = None


def _bloom_fold_batch(bwords: list[int], col, bits: int, k: int) -> None:
    """Fold one Arrow column's values into the packed bloom words.

    Bit-identical to operators/bloom._position_expr — md5('<seed>:' ||
    cast(v as string)) hex-prefix int31 mod bits — because
    ``int(hexdigest()[:8], 16) == int.from_bytes(digest()[:4])`` and
    Arrow's utf8 cast of integer types prints exactly like Python's
    ``str()`` (verified by the SQL-written-files-prune parity tests).

    Batch-wise where it counts: values DEDUPE first (bloom folding is
    idempotent, and key columns repeat), stringify through one Arrow
    cast, and each distinct value encodes to bytes once — the k md5
    calls then run over precomputed seed-prefix bytes with no per-value
    f-string formatting and no hex round-trip, through CPython's
    builtin _md5 (1.5x the OpenSSL binding on sub-100-byte inputs; same
    algorithm, same digest). Measured ~1.5x over the old per-value
    f-string/hexdigest loop on all-unique int64 keys and ~400x on a
    100-distinct-values batch (dedup collapses repeats before any
    hashing)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        from _md5 import md5
    except ImportError:  # non-CPython: the hashlib construct is md5 too
        from hashlib import md5

    vals = pc.unique(col.drop_null())
    if len(vals) == 0:
        return
    t = vals.type
    if pa.types.is_integer(t):
        vals = pc.cast(vals, pa.string())
        t = vals.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        encoded = [s.encode() for s in vals.to_pylist()]
    else:
        # unexpected key type: Python str() semantics, the scheme's
        # reference definition
        encoded = [str(v).encode() for v in vals.to_pylist()]
    prefixes = [f"{j}:".encode() for j in range(k)]
    from_bytes = int.from_bytes
    for data in encoded:
        for pre in prefixes:
            # == int(hexdigest()[:8], 16) % 2**31: the top bit masks off
            pos = (
                from_bytes(md5(pre + data).digest()[:4], "big")
                & 0x7FFFFFFF
            ) % bits
            bwords[pos >> 6] |= 1 << (pos & 63)


def _write_partition(
    root: str,
    commit_dir: str,
    fields: list[tuple[str, str]],
    iterator: Iterator,
    bloom: dict | None = None,
) -> FileCommitMessage:
    """One task's Arrow batches → ONE new parquet file under
    ``commit_dir`` with per-file min/max/null stats folded in-line
    (memory bounded by a RecordBatch; zero extra stats pass). Shared by
    the batch and streaming writers — their only difference is the
    driver-side commit policy.

    ``bloom`` is the table's ``bloom_index`` property ({col, bits, k}),
    honored here so SQL-written files stay point-lookup prunable: bit
    positions use the exact scheme of operators/bloom._position_expr —
    md5('<seed>:<str(value)>') hex-prefix int31 mod bits — which for
    the string/integer key columns blooms are built on stringifies
    identically in Python and Spark SQL (see _bloom_fold_batch)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    ctx = TaskContext.get()
    tid = ctx.partitionId() if ctx is not None else 0
    rel = f"{commit_dir}/part-{tid:05d}-{uuid.uuid4().hex}.parquet"
    abs_path = os.path.join(root, rel)
    stat_cols = [n for n, t in fields if t in _STAT_TYPES]
    str_cols = {n for n, t in fields if t == "string"}
    trunc_cols: set[str] = set()
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {n: 0 for n, _ in fields}
    rows = 0
    writer = None
    bwords: list[int] | None = None
    if bloom is not None and any(n == bloom["col"] for n, _ in fields):
        bwords = [0] * ((int(bloom["bits"]) + 63) // 64)
    try:
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if writer is None:
                os.makedirs(os.path.dirname(abs_path), exist_ok=True)
                writer = pq.ParquetWriter(abs_path, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
            for i, (name, _t) in enumerate(fields):
                col = batch.column(i)
                nulls[name] += col.null_count
                if bwords is not None and name == bloom["col"]:
                    _bloom_fold_batch(
                        bwords, col, int(bloom["bits"]), int(bloom["k"])
                    )
                if name not in stat_cols or col.null_count == len(col):
                    continue
                if name in str_cols:
                    # truncated bounds, never whole values (see
                    # _STR_STAT_MAX): accumulate prefix min/max; the
                    # upper bound is adjusted once at entry build
                    vals = col.drop_null()
                    maxlen = pc.max(pc.utf8_length(vals)).as_py()
                    if maxlen is not None and maxlen > _STR_STAT_MAX:
                        trunc_cols.add(name)
                        vals = pc.utf8_slice_codeunits(
                            vals, 0, _STR_STAT_MAX
                        )
                    mm = pc.min_max(vals)
                else:
                    mm = pc.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if name not in mins or lo < mins[name]:
                    mins[name] = lo
                if name not in maxs or hi > maxs[name]:
                    maxs[name] = hi
    finally:
        if writer is not None:
            writer.close()
    if rows == 0:
        return FileCommitMessage(None)  # empty split: no file
    nbytes = os.path.getsize(abs_path)
    for c in trunc_cols:
        if c in maxs:
            maxs[c] = _trunc_upper(maxs[c])
    entry: dict[str, Any] = {
        "path": rel,
        "rows": rows,
        "bytes": nbytes,
        "stats": {
            c: [_json_safe(mins.get(c)), _json_safe(maxs.get(c))]
            for c in stat_cols
        },
        "nulls": nulls,
    }
    if trunc_cols:
        entry["stats_trunc"] = sorted(trunc_cols)
    if bwords is not None:
        entry["bloom"] = bwords
    return FileCommitMessage(entry)


class VersionedDataSourceWriter(DataSourceArrowWriter):
    """One task = one new data file, streamed batch-by-batch (memory
    bounded by a RecordBatch); the driver commit is one manifest CAS.
    At 1000 executors this is the same fan-in shape as Delta's
    OptimisticTransaction: data I/O fully parallel, coordination one
    tiny JSON claim."""

    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        # Spark hands options through a CaseInsensitiveDict whose plain-
        # dict form lowercases keys — normalize so camelCase option
        # names (mergeSchema, timestampAsOf) match however they arrive
        options = {k.lower(): v for k, v in options.items()}
        frozen = {
            k for k in ("version", "timestampasof", "changefeed", "history")
            if k in options
        }
        if frozen:
            raise ValueError(
                f"cannot write through a {'/'.join(sorted(frozen))} view — "
                "snapshots and feeds are read-only; write to a plain "
                "OPTIONS (root ...) view"
            )
        if "root" not in options:
            raise ValueError("format('versioned') writes require option 'root'")
        self._root = options["root"].rstrip("/")
        self._overwrite = overwrite
        self._merge_schema = (
            str(options.get("mergeschema", "false")).lower() == "true"
        )
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        self._ddl = schema.simpleString()
        self._commit_dir = f"{_DATA_DIR}/c{uuid.uuid4().hex}"
        # fail-fast at PLAN time (commit re-checks authoritatively:
        # these can change between plan and commit)
        _, head_m = _head(self._root)
        # bloom_index table property: honored so SQL-written files stay
        # point-lookup prunable (pinned at plan time — the geometry is
        # carried forward by every commit, so it cannot change under us
        # without an explicit re-declare)
        self._bloom = (head_m or {}).get("bloom_index")
        if head_m is not None:
            if head_m.get("writer", 1) > SUPPORTED_WRITER_VERSION:
                raise ValueError(
                    f"{self._root} requires writer protocol "
                    f"{head_m['writer']} (this build supports "
                    f"{SUPPORTED_WRITER_VERSION})"
                )
            _refuse_engine_features(head_m, self._root)
            if not overwrite and head_m["schema"] != self._ddl:
                if self._merge_schema:
                    # raises now on type conflicts / ghost re-adds —
                    # fail before any executor writes a byte
                    _merge_schemas(self._root, head_m["schema"], self._ddl)
                else:
                    raise ValueError(
                        f"schema mismatch inserting into {self._root}: the "
                        f"table is {head_m['schema']} but the write plans "
                        f"{self._ddl} — pass option('mergeSchema', 'true') "
                        "for additive evolution"
                    )

    # -- executor side -------------------------------------------------
    def write(self, iterator: Iterator) -> FileCommitMessage:
        return _write_partition(
            self._root, self._commit_dir, self._fields, iterator,
            bloom=self._bloom,
        )

    # -- driver side (plan worker: os/json only, no JVM) ----------------
    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        entries = [
            m.entry
            for m in messages
            if isinstance(m, FileCommitMessage) and m.entry is not None
        ]
        try:
            commit_os(
                self._root,
                "overwrite" if self._overwrite else "append",
                entries,
                self._ddl,
                merge_schema=self._merge_schema,
            )
        except Exception:
            shutil.rmtree(
                os.path.join(self._root, self._commit_dir), ignore_errors=True
            )
            raise

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        shutil.rmtree(
            os.path.join(self._root, self._commit_dir), ignore_errors=True
        )


# Per-root committed-epoch cache: a long-running stream would otherwise
# re-open EVERY manifest ever on EVERY micro-batch commit — O(commits)
# per trigger, the exact poll-cost class the r8 resolved-log cache fixed
# on the read side. Soundness: committed manifests are immutable (vacuum
# only flips `expired`; metas persist; archival renames are name- and
# content-preserving), so the epoch set over versions 0..upto never
# changes — only the tail 0..head extends it. Table REPLACEMENT (rmtree
# + re-create at the same root) is detected by pinning version 0's
# commit timestamp: a changed v0 rebuilds from scratch, so a fresh table
# can never skip epochs that only the dead table committed.
_EPOCH_CACHE: dict[str, dict] = {}
_EPOCH_CACHE_MAX = 64
_EPOCH_LOCK = threading.Lock()


def _committed_epochs(root: str) -> set[str]:
    """Every ``meta.sink_epoch`` across the WHOLE log — including
    expired/archived manifests, because commit identity must survive
    vacuum or a replayed epoch would double-append (mirror of
    VersionedTable.committed_meta). Contiguity makes 0..head the exact
    version set; incremental via the per-root cache above: steady-state
    cost per call is one readdir + the commits since the last call."""
    from finalpipeline_spark.sources.pyds import _listed_hi, _manifest_any

    log = os.path.join(root, _LOG_DIR)
    if not os.path.isdir(log):
        return set()
    head = _listed_hi(log)
    while _manifest_any(root, head + 1) is not None:
        head += 1  # racing archival of the newest manifest
    with _EPOCH_LOCK:
        c = _EPOCH_CACHE.pop(root, None)
        m0 = _manifest_any(root, 0)
        v0_ts = m0.get("ts") if m0 is not None else None
        if c is None or c["v0_ts"] != v0_ts:
            c = {"upto": -1, "epochs": set(), "v0_ts": v0_ts}
        for v in range(c["upto"] + 1, head + 1):
            m = _manifest_any(root, v)
            if m is None:
                # transient hole (quarantine/archival race window) —
                # stop here so the next call re-probes it; contiguity
                # says a committed manifest will appear
                break
            key = (m.get("meta") or {}).get("sink_epoch")
            if key is not None:
                c["epochs"].add(key)
            c["upto"] = v
        out = set(c["epochs"])
        if len(_EPOCH_CACHE) >= _EPOCH_CACHE_MAX:
            _EPOCH_CACHE.pop(next(iter(_EPOCH_CACHE)))
        _EPOCH_CACHE[root] = c
    return out


class VersionedStreamDataSourceWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("versioned").option("root", ...)`` — the
    streaming sink as a first-class format, Delta's streaming-write
    shape on the Python DataSource API.

    Exactly-once effect from at-least-once delivery via COMMIT
    IDENTITY, same protocol as streaming/sinks.stream_append_versioned:
    every micro-batch commit records ``sink_epoch = "<sinkId>#<batchId>"``
    in its manifest meta, and a re-delivered batch (crash between the
    table commit and the engine's checkpoint commit) is recognized and
    skipped — its freshly staged files are removed, no manifest is
    written. ``option("sinkId", ...)`` is REQUIRED and must be unique
    per streaming query (Delta's txnAppId contract): the foreachBatch
    sink derives this identity from its checkpoint dir, but the format
    hooks cannot see the checkpoint, and a DEFAULT shared by two
    queries would make the second query's batch ids collide with the
    first's committed epochs — its early batches would be silently
    dropped as replays, which is data loss, not idempotence.

    All micro-batches of one query run share one ``data/c<uuid>/`` sink
    directory (file names are task+uuid unique); vacuum reclaims
    per-FILE, so an aborted batch's orphans age out under the normal
    grace without touching live neighbors."""

    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        if overwrite:
            raise ValueError(
                "format('versioned') streaming writes support append "
                "output mode only (complete/update would rewrite the "
                "table every trigger)"
            )
        options = {k.lower(): v for k, v in options.items()}
        if "root" not in options:
            raise ValueError("format('versioned') writes require option 'root'")
        if "sinkid" not in options or not str(options["sinkid"]).strip():
            raise ValueError(
                "format('versioned') streaming writes require option "
                "'sinkId' — a stable identity unique to THIS streaming "
                "query (pair it 1:1 with the checkpointLocation). It "
                "keys the sink_epoch commit identity that makes "
                "re-delivered batches no-ops; a shared or defaulted id "
                "would silently drop another query's early batches as "
                "replays"
            )
        self._root = options["root"].rstrip("/")
        self._sink_id = str(options["sinkid"])
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        self._ddl = schema.simpleString()
        self._commit_dir = f"{_DATA_DIR}/c{uuid.uuid4().hex}"
        _, head_m = _head(self._root)
        self._bloom = (head_m or {}).get("bloom_index")
        if head_m is not None:
            if head_m.get("writer", 1) > SUPPORTED_WRITER_VERSION:
                raise ValueError(
                    f"{self._root} requires writer protocol "
                    f"{head_m['writer']} (this build supports "
                    f"{SUPPORTED_WRITER_VERSION})"
                )
            _refuse_engine_features(head_m, self._root)
            if head_m["schema"] != self._ddl:
                raise ValueError(
                    f"schema mismatch streaming into {self._root}: the "
                    f"table is {head_m['schema']} but the stream plans "
                    f"{self._ddl}"
                )

    def write(self, iterator: Iterator) -> FileCommitMessage:
        return _write_partition(
            self._root, self._commit_dir, self._fields, iterator,
            bloom=self._bloom,
        )

    def _drop_staged(self, messages) -> None:
        """Remove exactly THIS batch's staged files (the sink dir is
        shared across batches — earlier epochs' files are live)."""
        for m in messages:
            if isinstance(m, FileCommitMessage) and m.entry is not None:
                try:
                    os.unlink(os.path.join(self._root, m.entry["path"]))
                except OSError:
                    pass  # already gone; vacuum reaps stragglers

    def commit(self, messages, batchId: int) -> None:
        key = f"{self._sink_id}#{batchId}"
        if key in _committed_epochs(self._root):
            # replayed epoch: the table commit already happened on the
            # previous delivery — drop the re-staged files and report
            # success so the engine can finally checkpoint the batch
            self._drop_staged(messages)
            return
        entries = [
            m.entry
            for m in messages
            if isinstance(m, FileCommitMessage) and m.entry is not None
        ]
        try:
            commit_os(
                self._root,
                "append",
                entries,
                self._ddl,
                meta={"sink_epoch": key},
            )
        except Exception:
            self._drop_staged(messages)
            raise

    def abort(self, messages, batchId: int) -> None:
        self._drop_staged(messages)
