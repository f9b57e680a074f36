"""Python DataSource (Spark 4 DataSource API) over versioned tables.

``spark.read.format("versioned")`` / ``spark.readStream.format(
"versioned")`` — the versioned table (sources/versioned.py) surfaced
through Spark's pluggable-source API, so a consumer needs no import
from this repo at all, just the registered format name:

* **Batch**: snapshot/time-travel reads. One InputPartition per data
  file (the manifest IS the split list — no directory listing), rows
  shipped as Arrow RecordBatches, so the Python source overhead is
  batch-columnar, not per-row.
* **Stream**: the change-data-feed as a Structured Streaming source.
  Offsets are manifest versions; each micro-batch reads exactly the
  files added by the new commits (the `read_changes` file diff), so a
  downstream streaming job processes O(delta) per trigger and resumes
  from its checkpointed version after restart. In the default
  append-only mode, content-mutating commits fail the stream with a
  clear error; with ``option("changeFeed", "true")`` CoW delete/
  replace commits instead stream as rows tagged ``_change_type``
  ('insert'|'delete') and ``_commit_version`` — Delta's
  readChangeFeed contract at file granularity (a CoW survivor churns
  as delete+insert of identical content; keyed consumers applying
  deletes-then-inserts per commit converge to the exact snapshot).
  OPTIMIZE commits are transparent to BOTH modes (Delta parity:
  streaming ignores dataChange=false actions, and a CDF range
  crossing routine maintenance serves zero change rows for it) — the
  append-only planner diffs PER COMMIT, so compaction's rewritten
  files are never re-delivered. ROLLBACK/RESTORE commits flow through
  changeFeed mode as their net row delta (dropped files as deletes,
  restored files as inserts, vector shrink as resurrected inserts —
  Delta parity: RESTORE serves through readChangeFeed), refusing only
  a schema-reverting rollback; in append-only mode they fail (no
  append-only delta exists). Whole-table overwrite past the initial
  snapshot fails either mode; ``option("skipChangeCommits", "true")``
  instead skips content-mutation commits whole (Delta's appends-only
  view).

**SQL-only surface** (Delta option parity, zero Python imports): once
the format is registered, every capability is reachable through pure
``spark.sql`` via ``CREATE TEMPORARY VIEW ... USING versioned``::

    CREATE TEMPORARY VIEW t      USING versioned OPTIONS (root '/p/t')
    -- VERSION AS OF 3 / TIMESTAMP AS OF <epoch>:
    CREATE TEMPORARY VIEW t_v3   USING versioned OPTIONS (root '/p/t', version '3')
    CREATE TEMPORARY VIEW t_asof USING versioned OPTIONS (root '/p/t', timestampAsOf '1723600000')
    -- table_changes('/p/t', 0[, 5]) equivalent (Delta readChangeFeed):
    CREATE TEMPORARY VIEW t_cdf  USING versioned OPTIONS (
        root '/p/t', changeFeed 'true', startingVersion '0', endingVersion '5')
    -- DESCRIBE HISTORY equivalent (VersionedTable.history() columns):
    CREATE TEMPORARY VIEW t_hist USING versioned OPTIONS (root '/p/t', history 'true')

Option names match Delta's ``readChangeFeed`` options verbatim
(``startingVersion`` / ``startingTimestamp`` / ``endingVersion`` /
``endingTimestamp``), and the CDF view carries Delta's meta-column
triple.  ``table_changes(spark, root, start[, end])`` below is the
one-call Python twin of Delta's SQL TVF.  tests/test_sql_surface.py
drives the whole contract through pure ``spark.sql``.

**SQL WRITES** (round 9): the same views accept ``INSERT INTO`` /
``INSERT OVERWRITE``, and ``df.write.format("versioned")`` appends,
overwrites, or bootstraps a new table — the write half lives in
sources/pyds_write.py (exactly-once under racing writers via the CAS
claim protocol; tables with engine-enforced invariants — constraints/
generated/identity — refuse loudly and point at ``versioned_sql()``,
sources/sql_dml.py, which runs the full Spark-side semantics from the
same SQL text, including MERGE/UPDATE/DELETE). tests/test_sql_write.py
drives both.

Executor-side constraint: DataSource objects are pickled to workers,
so this module reads manifests and parquet with ``os``/``json``/
``pyarrow`` only — no SparkSession/JVM handles. Paths must be visible
from executors (local/NFS here; an object store would swap in fsspec).
"""

from __future__ import annotations

import json
import os
import threading
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_LOG_DIR = "_log"

# Feature-gate protocol (mirror of sources/versioned.py — keep in
# sync): a manifest carrying ``reader: N`` above this build's support
# must REFUSE, not misread — e.g. a pre-cmap change-feed consumer
# would silently serve a re-added column's new-era values under the
# old-era name. Absent field means 1. Raised as ValueError so the
# Python DataSource surfaces it loudly through Spark.
SUPPORTED_READER_VERSION = 2


def _check_reader_version(m: dict | None, where: str) -> dict | None:
    if m is not None and m.get("reader", 1) > SUPPORTED_READER_VERSION:
        raise ValueError(
            f"{where} requires reader protocol {m['reader']} (this "
            f"build supports {SUPPORTED_READER_VERSION}) — upgrade "
            "before reading this version"
        )
    return m


# Parse cache for _live_manifests: the streaming engine polls
# latestOffset 16+ times per trigger and every poll re-lists the log;
# without this each poll re-PARSES every manifest JSON — O(log size)
# CPU per poll. Keyed by (size, mtime_ns), which changes on every
# legitimate content change (commits create new files; vacuum's
# expired-flag flip rewrites the file, changing both). LRU-bounded so
# a long-lived reader over many tables stays memory-bounded.
_PARSE_CACHE: dict[str, tuple[tuple, dict | None]] = {}
_PARSE_CACHE_MAX = 4096


def _parse_manifest_cached(path: str) -> dict | None:
    try:
        st = os.stat(path)
    except OSError:
        return None
    key = (st.st_size, st.st_mtime_ns)
    hit = _PARSE_CACHE.get(path)
    if hit is not None and hit[0] == key:
        # re-insert so eviction is true LRU, not FIFO — a hot manifest
        # set larger than the cap would otherwise evict its hottest
        # entries first and thrash
        _PARSE_CACHE.pop(path)
        _PARSE_CACHE[path] = hit
        return hit[1]
    try:
        with open(path) as fh:
            m = json.load(fh)
    except (json.JSONDecodeError, OSError):
        m = None  # aborted commit fragment: invisible (cached too —
        # its mtime changes if a writer completes it)
    if len(_PARSE_CACHE) >= _PARSE_CACHE_MAX:
        _PARSE_CACHE.pop(next(iter(_PARSE_CACHE)))
    _PARSE_CACHE[path] = (key, m)
    return m


def _manifest_paths(root: str, version: int) -> tuple[str, str]:
    """(hot, archive) candidate paths for one version's manifest —
    vacuum archives anchored manifests into _log/archive/ (direct name
    probe, zero listing)."""
    name = "v%012d.json" % version
    log = os.path.join(root, _LOG_DIR)
    return os.path.join(log, name), os.path.join(log, "archive", name)


def _resolve_manifest(root: str, v: int) -> dict | None:
    """Manifest for version ``v`` by direct name probe (hot slot, then
    the vacuum archive), parse-cached.  None = no readable manifest at
    this instant (never committed, a mid-write fragment, or the
    one-probe window of a racing archival rename)."""
    for path in _manifest_paths(root, v):
        m = _parse_manifest_cached(path)
        if m is not None:
            return _check_reader_version(m, f"version {v} of {root}")
    return None


def _listed_hi(log: str) -> int:
    """Highest version asserted by log-dir NAMES (anchor files assert
    0..V committed; v-names extend the tail).  Junk names that merely
    look like manifests/anchors are skipped, mirroring the guarded
    parse in VersionedTable.versions() — one stray ``verify.json``
    must not break every read/stream poll."""
    hi = -1
    for name in os.listdir(log):
        if name.startswith("checkpoint-") and name.endswith(".json"):
            stem = name[len("checkpoint-"):-5]
        elif name.startswith("v") and name.endswith(".json"):
            stem = name[1:-5]
        else:
            continue
        try:
            hi = max(hi, int(stem))
        except ValueError:
            continue
    return hi


# Per-root resolved-log cache. The streaming engine polls latestOffset
# 16+ times per trigger, and a naive walk re-probes every version ever
# (1-2 os.stat each) on EVERY poll — O(all commits) per poll, the exact
# cost log anchors were built to bound on the JVM side (a year of
# minutely commits would be ~10M stats per trigger). Soundness of the
# cache rests on protocol invariants (sources/versioned.py):
#   * contiguity — a committed version proves all its ancestors, so the
#     resolved prefix never changes membership; only the tail grows;
#   * committed manifests are never deleted (archival renames them,
#     name- and content-preserving), so a cached manifest stays correct
#     when its file moves hot → _log/archive/;
#   * the ONLY content mutation below the head is vacuum's terminal
#     ``expired`` flip, and vacuum expires a PREFIX of the live list
#     (live[:-retain_last]) — so ONE re-resolve of the LOWEST live
#     version per call (the canary) detects any flip since the last
#     call, and a tripped canary re-validates upward only until the
#     first still-live version.
# The canary also guards table replacement: if the lowest live version
# resolves to DIFFERENT content (not merely a flip), the whole cache
# entry is rebuilt from scratch — a root that was rmtree'd and
# re-created must not serve the old table's tail.
# Steady-state cost per call: one readdir + one canary stat + one
# forward probe past the head — O(commits since last call).
_LIVE_CACHE: dict[str, dict] = {}
_LIVE_CACHE_MAX = 64
_LIVE_LOCK = threading.Lock()


def _invalidate_live_cache(root: str | None = None) -> None:
    with _LIVE_LOCK:
        if root is None:
            _LIVE_CACHE.clear()
        else:
            _LIVE_CACHE.pop(root, None)


def _live_manifests(root: str) -> dict[int, dict]:
    log = os.path.join(root, _LOG_DIR)
    if not os.path.isdir(log):
        return {}
    hi = _listed_hi(log)
    with _LIVE_LOCK:
        c = _LIVE_CACHE.pop(root, None)
        fresh = {"latest": -1, "live": {}, "holes": set()}
        if c is None:
            c = fresh
        live: dict[int, dict] = c["live"]
        # -- canary: detect expired flips / table replacement ----------
        while live:
            v0 = min(live)
            m = _resolve_manifest(root, v0)
            if m is not None and not m.get("expired") and (
                m is live[v0] or m == live[v0]
            ):
                break  # prefix intact (expiry is a prefix of live)
            if m is None or (not m.get("expired") and m != live[v0]):
                # vanished or replaced by different content: either the
                # one-probe window of a racing archival or a re-created
                # table — rebuild from scratch, exactly this call
                c = fresh
                live = c["live"]
                break
            del live[v0]  # flipped expired: walk up to first still-live
        if c["latest"] > hi and _resolve_manifest(root, c["latest"]) is None:
            # the previously-resolved head vanished AND the listing
            # regressed below it: committed manifests never vanish, so
            # the table was re-created shorter — rebuild
            c = fresh
            live = c["live"]
        # -- transient holes: re-probe (normally empty) ----------------
        for g in sorted(c["holes"]):
            m = _resolve_manifest(root, g)
            if m is None:
                continue  # still a fragment/quarantine race: retry later
            c["holes"].discard(g)
            if not m.get("expired"):
                live[g] = m
        # -- tail: forward probe from the resolved head -----------------
        # Holes at or below the listed max are transient under
        # contiguity (mid-write fragments, quarantine races, archival
        # rename windows): skipped but remembered, so later calls
        # re-probe them instead of freezing them invisible.
        v = c["latest"] + 1
        pending: list[int] = []
        while True:
            m = _resolve_manifest(root, v)
            if m is None:
                if v <= hi:
                    pending.append(v)
                    v += 1
                    continue
                break  # forward probe past the listed max came up empty
            if not m.get("expired"):
                live[v] = m
            c["holes"].update(pending)  # proven holes: a later version exists
            pending.clear()
            c["latest"] = v
            v += 1
        out = dict(live)
        if len(_LIVE_CACHE) >= _LIVE_CACHE_MAX:
            _LIVE_CACHE.pop(next(iter(_LIVE_CACHE)))
        _LIVE_CACHE[root] = c
    return out


def _same_file_refs(a: list[dict], b: list[dict]) -> bool:
    """True when two manifests reference the same data: same (path,
    vector) pairs — the definition of a metadata-only commit (mirror
    of versioned._same_file_refs; duplicated because this module stays
    importable executor-side without pyspark.sql)."""
    key = lambda f: (f["path"], (f.get("dv") or {}).get("path"))  # noqa: E731
    return sorted(map(key, a)) == sorted(map(key, b))


def _manifest_any(root: str, version: int) -> dict | None:
    """Manifest ``version`` INCLUDING vacuum tombstones (an expired
    manifest keeps its full file list — vacuum only flips the
    ``expired`` flag).  None if no manifest file was ever written for
    this version (the stream's pre-snapshot sentinel); unparseable
    manifests raise JSONDecodeError for the caller to surface."""
    if version < 0:
        return None
    for path in _manifest_paths(root, version):
        # open directly — an exists()-then-open pair is a TOCTOU window
        # under racing archival (the rename vanishes the hot copy
        # between the probe and the open; the archive copy is next)
        try:
            with open(path) as fh:
                return _check_reader_version(
                    json.load(fh), f"version {version} of {root}"
                )
        except FileNotFoundError:
            continue
    return None


def _opt_ts(val, opt: str) -> float:
    """Timestamp option → epoch seconds. Accepts a numeric epoch (the
    original contract) or an ISO-8601 instant WITH an explicit offset
    ('Z' / '+hh:mm') — this source plans in an engine-less worker with
    no session timezone, so a tz-naive string would be silently
    interpreted in whatever the worker's locale is; refusing it loudly
    beats shifting the requested snapshot by hours. (``versioned_sql``
    resolves tz-naive text through the Spark session instead.)"""
    try:
        return float(val)
    except (TypeError, ValueError):
        pass
    import datetime

    try:
        dt = datetime.datetime.fromisoformat(str(val))
    except ValueError:
        raise ValueError(
            f"{opt} must be epoch seconds or an ISO-8601 timestamp, "
            f"got {val!r}"
        ) from None
    if dt.tzinfo is None:
        raise ValueError(
            f"{opt}: ISO timestamps need an explicit UTC offset "
            f"('2024-01-01T00:00:00Z', '...+02:00') — got the tz-naive "
            f"{val!r}, which this engine-less planner cannot anchor"
        )
    return dt.timestamp()


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        change: str | None = None,
        version: int | None = None,
        rel: str | None = None,      # manifest-relative path (DV join key)
        dv: str | None = None,       # deletion-vector file covering path
        dv_old: str | None = None,   # CDF dv-diff: the PREVIOUS vector
        dv_diff: bool = False,       # CDF: emit newly-vectored rows only
        cmap: dict | None = None,    # logical→physical names (renames)
        ts: float | None = None,     # CDF: the commit's wall clock
        nbytes: int | None = None,   # file size (packing input)
    ):
        self.path = path
        self.change = change        # CDF mode: 'insert' | 'delete'
        self.version = version      # CDF mode: the commit that caused it
        self.ts = ts
        self.rel = rel
        self.dv = dv
        self.dv_old = dv_old
        self.dv_diff = dv_diff
        self.cmap = cmap or {}
        self.nbytes = nbytes


def _entry_partition(root: str, e: dict, **kw) -> _FilePartition:
    """Partition for one manifest entry, carrying its deletion-vector
    reference so the executor-side read can mask dead positions and
    its column mapping so renamed columns resolve to their physical
    parquet names."""
    base = e.get("base", root)
    dv = e.get("dv")
    return _FilePartition(
        os.path.join(base, e["path"]),
        rel=e["path"],
        dv=os.path.join(dv.get("base", base), dv["path"]) if dv else None,
        cmap=e.get("cmap"),
        nbytes=e.get("bytes"),
        **kw,
    )


# Input-split packing for the Python source, mirroring Spark's own scan
# packing (spark.sql.files.maxPartitionBytes + openCostInBytes): every
# Python task costs a worker dispatch + Arrow stream setup, so one task
# per TINY file pays fixed overhead per file exactly like the JVM scan
# would without packing. At production file sizes (~1 GiB targets) each
# file exceeds the budget and keeps its own partition — parallelism at
# scale is untouched; only many-small-files commits coalesce.
_PACK_MAX_BYTES = 128 * 1024 * 1024
_PACK_OPEN_COST = 4 * 1024 * 1024


class _PackedPartition(InputPartition):
    """Several file partitions served by ONE Python task (read chains
    the per-file batch iterators; each spec keeps its own CDF tags,
    vector references and column mapping)."""

    __slots__ = ("specs",)

    def __init__(self, specs: list[_FilePartition]):
        self.specs = specs


def _pack_partitions(parts: list) -> list:
    """Greedy in-order byte-budget packing. A file without a recorded
    size (pre-byte-stats manifest entries) is charged a full budget —
    it keeps its own partition, never silently serializing an unknown
    amount of data behind one task."""
    groups: list[list[_FilePartition]] = []
    cur: list[_FilePartition] = []
    acc = 0
    for p in parts:
        w = max(
            p.nbytes if p.nbytes is not None else _PACK_MAX_BYTES,
            _PACK_OPEN_COST,
        )
        if cur and acc + w > _PACK_MAX_BYTES:
            groups.append(cur)
            cur, acc = [], 0
        cur.append(p)
        acc += w
    if cur:
        groups.append(cur)
    return [g[0] if len(g) == 1 else _PackedPartition(g) for g in groups]


def _schema_field_names(schema: str) -> list[str]:
    """Top-level field names of a manifest schema string
    (``struct<id:bigint,m:map<string,int>,...>``) — split on commas at
    angle/paren depth 0, name is the text before the first colon."""
    inner = schema.strip()
    assert inner.startswith("struct<") and inner.endswith(">"), inner
    inner = inner[len("struct<"):-1]
    names, depth, start = [], 0, 0
    for i, ch in enumerate(inner + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            part = inner[start:i]
            names.append(part.split(":", 1)[0].strip())
            start = i + 1
    return names


def _scan_remap_ops(
    root: str, mans: dict[int, dict], lo: int, hi: int
) -> list[tuple[int, tuple]]:
    """Column-remap commits in ``(lo, hi]`` as ``(version, ("rename",
    old, new) | ("readd", name, ghost))``, recovered from each commit's
    schema diff — the engine-less twin of VersionedTable._remap_ops
    (see versioned.py for the frame-alignment contract; chained remaps
    compose fine in version order — only the streaming direction
    inference guards them, in _pin_directions)."""
    ops: list[tuple[int, tuple]] = []
    for v in range(lo + 1, hi + 1):
        m = mans.get(v) or _manifest_any(root, v)
        if m is None or m["action"] not in ("rename_column", "readd_column"):
            continue
        pm = mans.get(v - 1) or _manifest_any(root, v - 1)
        if pm is None:
            raise ValueError(
                f"version {v - 1} of {root} is unavailable — cannot "
                f"recover the column remap committed at version {v}"
            )
        pf = _schema_field_names(pm["schema"])
        cf = _schema_field_names(m["schema"])
        if m["action"] == "rename_column":
            old, new = next((a, b) for a, b in zip(pf, cf) if a != b)
            ops.append((v, ("rename", old, new)))
        else:
            name = cf[-1]
            ghost = next(
                (
                    (e.get("cmap") or {})[name]
                    for e in m["files"]
                    if name in (e.get("cmap") or {})
                ),
                f"{name}__readd_cdc_ghost",
            )
            ops.append((v, ("readd", name, ghost)))
    return ops


def _pin_directions(
    ops: list[tuple[int, tuple]],
    pin_version: int,
    pinned_names: set[str],
) -> tuple[dict[int, tuple], dict[int, tuple]]:
    """Resolve each remap op's direction from VERSION ORDER relative to
    the feed's PIN VERSION — the table head captured when the reader
    was planned, i.e. the version whose schema the consumer subscribed
    to:

    * op committed AT/BEFORE the pin → FORWARD: entries of steps older
      than the op align up onto the pin's frame (the exact per-entry
      transformation the commit itself stamped).  A re-add at/before
      the pin serves too — the pin provably postdates it, so the
      consumer subscribed to the NEW-era column and old-era steps
      correctly emit NULL.  (This retires the r10 membership-inference
      refusal: with the pin version known there is no old-era/new-era
      ambiguity left to refuse on.)
    * op AFTER the pin → REVERSE: a live stream that crossed the remap
      keeps serving the frame it subscribed to.  ALL later renames
      join the reverse set, pinned or not — a chain like A→B in one
      micro-batch and B→C in a later one composes pairwise even though
      B→C touches no pinned name (membership inference missed exactly
      this and silently served NULL).
    * re-add AFTER the pin whose name chains back to a pinned column →
      REFUSE: the pin-era consumer would read new-era values under its
      old-era column — the one genuinely unserveable case left.
    """
    fwd = {v: op for v, op in ops if v <= pin_version}
    rev: dict[int, tuple] = {}
    # the pinned columns' names as they evolve era by era past the pin
    tracked = set(pinned_names)
    for v, op in sorted(o for o in ops if o[0] > pin_version):
        if op[0] == "rename":
            _, old, new = op
            if old in tracked:
                tracked.discard(old)
                tracked.add(new)
            rev[v] = op
        elif op[1] in tracked:
            raise ValueError(
                f"version {v} re-adds column '{op[1]}', which this feed "
                f"(pinned at version {pin_version}) subscribed to in its "
                "pre-re-add era — an old-era consumer must not read "
                "new-era values under its column; restart the stream "
                "from a fresh checkpoint"
            )
        # re-add of a name the pin never chains to: invisible, skip
    return fwd, rev


def _frame_align_entry(
    e: dict, v: int, fwd: dict[int, tuple], rev: dict[int, tuple]
) -> dict:
    """One manifest entry of step ``v`` aligned onto the pinned
    logical frame: forward ops committed AFTER the step apply in
    ascending version order (the exact transformation the remap
    commits themselves stamp); reverse ops committed AT/BEFORE the
    step apply in descending order (undoing newest first). The two
    sets cannot both apply to one entry — the pin is a single point
    in the version order."""
    f_ops = [fwd[r] for r in sorted(fwd) if r > v]
    r_ops = [rev[r] for r in sorted(rev, reverse=True) if r <= v]
    if not f_ops and not r_ops:
        return e
    cm = dict(e.get("cmap") or {})
    for op in f_ops:
        if op[0] == "rename":
            _, old, new = op
            phys = cm.pop(old, old)
            if phys != new:
                cm[new] = phys
        else:
            cm[op[1]] = op[2]
    for op in r_ops:  # only renames resolve reverse
        _, old, new = op
        phys = cm.pop(new, new)
        if phys != old:
            cm[old] = phys
    e2 = {k: x for k, x in e.items() if k != "cmap"}
    if cm:
        e2["cmap"] = cm
    return e2


def _dv_positions_for(dv_path: str | None, rel: str) -> set[int]:
    """Deleted row positions recorded for file ``rel`` in the vector at
    ``dv_path`` (a Spark-written parquet directory). Bounded by that
    file's deleted-row count — executor-side, never on the driver."""
    if not dv_path:
        return set()
    import pyarrow.dataset as pds

    parts = [
        os.path.join(dv_path, f)
        for f in os.listdir(dv_path)
        if f.endswith(".parquet")
    ]
    if not parts:
        return set()
    t = pds.dataset(parts, format="parquet").to_table(
        filter=pds.field("__file") == rel, columns=["__pos"]
    )
    return set(t["__pos"].to_pylist())


# Spark simple-type DDL → Arrow type, for typed-NULL backfill of columns
# added by schema evolution after a file was written. Complex types
# (array/map/struct/decimal) are handled structurally by _arrow_type's
# recursive parse of the simpleString form.
_ARROW_TYPES = {
    "bigint": "int64", "int": "int32", "smallint": "int16",
    "tinyint": "int8", "double": "float64", "float": "float32",
    "string": "large_string", "boolean": "bool_", "date": "date32",
    "binary": "large_binary",
}


def _split_top(s: str) -> list[str]:
    """Split a DDL type-argument list on commas at bracket depth 0
    (``a:int,b:array<int>`` → two parts, the nested comma kept)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _arrow_type(ddl: str):
    """Spark ``simpleString`` DDL → Arrow type, recursively — the full
    type tree an evolved column needs for typed-NULL backfill. Kept
    pyspark-free (executor-side import). Nested types mirror Spark's
    own Arrow conversion (large_* variants for strings/binary/lists)."""
    import pyarrow as pa

    ddl = ddl.strip()
    if ddl in _ARROW_TYPES:
        return getattr(pa, _ARROW_TYPES[ddl])()
    if ddl.startswith("timestamp"):
        return pa.timestamp("us")
    if ddl.startswith("decimal(") and ddl.endswith(")"):
        p, s = _split_top(ddl[len("decimal("):-1])
        return pa.decimal128(int(p), int(s))
    if ddl.startswith("array<") and ddl.endswith(">"):
        # plain list_, not large_list: Spark's Python-data-source Arrow
        # deserializer rejects LargeList (UNSUPPORTED_ARROWTYPE)
        return pa.list_(_arrow_type(ddl[len("array<"):-1]))
    if ddl.startswith("map<") and ddl.endswith(">"):
        k, v = _split_top(ddl[len("map<"):-1])
        return pa.map_(_arrow_type(k), _arrow_type(v))
    if ddl.startswith("struct<") and ddl.endswith(">"):
        fields = []
        for part in _split_top(ddl[len("struct<"):-1]):
            name, typ = part.split(":", 1)
            fields.append(pa.field(name.strip(), _arrow_type(typ)))
        return pa.struct(fields)
    raise ValueError(
        f"cannot backfill evolved column of type {ddl!r} — rewrite the "
        "table (optimize) to materialize it"
    )


def _canonical_arrow_type(t):
    """Per-file Arrow schema drift that is REPRESENTATION-only,
    normalized to the shapes _arrow_type builds for backfill: parquet
    reads hand back plain string/binary where Spark's conversion (and
    the typed-NULL backfill) uses the large_ variants, and large_list
    where the Python-source deserializer wants plain list. Value-
    preserving offsets-width changes only — no numeric/temporal types
    are touched. Needed so batches of DIFFERENT files can share one
    Python task (input-split packing): Spark's Arrow writer requires
    every batch of a task to carry the identical schema."""
    import pyarrow as pa

    if pa.types.is_string(t):
        return pa.large_string()
    if pa.types.is_binary(t):
        return pa.large_binary()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(_canonical_arrow_type(t.value_type))
    if pa.types.is_map(t):
        return pa.map_(
            _canonical_arrow_type(t.key_type),
            _canonical_arrow_type(t.item_type),
        )
    if pa.types.is_struct(t):
        return pa.struct(
            [pa.field(f.name, _canonical_arrow_type(f.type)) for f in t]
        )
    return t


def _canonicalize(table):
    import pyarrow as pa

    target = pa.schema(
        [
            pa.field(f.name, _canonical_arrow_type(f.type))
            for f in table.schema
        ]
    )
    return table if table.schema == target else table.cast(target)


def _read_file_batches(
    path: str,
    fields: Sequence[tuple[str, str]],
    drop_positions: set[int] | None = None,
    keep_positions: set[int] | None = None,
    cmap: dict | None = None,
) -> Iterator:
    """One file → Arrow batches with the reader's column set. Columns
    the file predates (added later via merge_schema) are backfilled as
    typed nulls, mirroring the JVM reader's impose-schema semantics.
    ``cmap`` maps logical names to the PHYSICAL parquet names the file
    was written with (rename_column); physical columns are read and
    renamed back to logical. ``drop_positions`` masks deletion-
    vector'd row positions out; ``keep_positions`` selects exactly
    those positions (the CDF dv-diff's newly-deleted rows)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cm = cmap or {}
    names = [n for n, _ in fields]
    phys = {n: cm.get(n, n) for n in names}
    present = set(pq.read_schema(path).names)
    hit = [n for n in names if phys[n] in present]
    table = pq.read_table(path, columns=[phys[n] for n in hit])
    # read order equals request order: positional rename physical→logical
    table = table.rename_columns(hit)
    missing = [(n, t) for n, t in fields if phys[n] not in present]
    for n, t in missing:
        table = table.append_column(n, pa.nulls(table.num_rows, _arrow_type(t)))
    table = table.select(names)
    # numeric type widening (widen_column): a file written before the
    # widen carries the narrow physical type — upcast Arrow-side to the
    # declared schema (the JVM reader does this natively; this mirrors
    # it). Cast ONLY in the lossless _WIDENINGS direction (int→wider
    # int, int≤32/float32→float64); a NARROWING mismatch means a stream
    # checkpoint pinned the pre-widen schema — raise the same
    # restart-from-fresh-checkpoint error the rename path gives instead
    # of silently downcasting until the first out-of-range value.
    ddl_by_name = dict(fields)
    for i, field in enumerate(table.schema):
        cur = field.type
        if not (pa.types.is_integer(cur) or pa.types.is_floating(cur)):
            continue
        try:
            want = _arrow_type(ddl_by_name[field.name])
        except ValueError:
            continue
        if cur == want or not (
            pa.types.is_integer(want) or pa.types.is_floating(want)
        ):
            continue
        wider = (
            pa.types.is_integer(cur)
            and pa.types.is_integer(want)
            and cur.bit_width < want.bit_width
        ) or (
            pa.types.is_floating(want)
            and want.bit_width == 64
            and (
                (pa.types.is_integer(cur) and cur.bit_width <= 32)
                or (pa.types.is_floating(cur) and cur.bit_width < 64)
            )
        )
        if not wider:
            raise ValueError(
                f"column '{field.name}' is {want} in this reader's pinned "
                f"schema but {cur} in the file — the table's type was "
                "widened after this stream started; restart the stream "
                "from a fresh checkpoint to pick up the widened schema"
            )
        table = table.set_column(i, field.name, table.column(i).cast(want))
    if drop_positions:
        import numpy as np

        mask = np.ones(table.num_rows, dtype=bool)
        mask[np.fromiter(drop_positions, dtype=np.int64)] = False
        table = table.filter(pa.array(mask))
    elif keep_positions is not None:
        table = table.take(pa.array(sorted(keep_positions), pa.int64()))
    yield from _canonicalize(table).to_batches(max_chunksize=1 << 16)


def _adjusted_times(root: str, live: dict[int, dict]) -> Iterator[tuple[int, float]]:
    """(version, timestamp) ascending, with the same skew-adjusted
    monotonic resolution as VersionedTable.version_as_of_timestamp
    (clock skew between writers can record t[v+1] < t[v]; adjust each
    to be strictly later than its parent so resolution is well-defined)
    and the same mtime fallback for pre-timestamp manifests."""
    last = float("-inf")
    for v in sorted(live):
        t = live[v].get("ts")
        if t is None:
            hot, arch = _manifest_paths(root, v)
            try:
                # no exists() pre-probe: a racing archival rename between
                # the probe and the stat would raise instead of falling
                # through to the archive copy (TOCTOU)
                t = os.path.getmtime(hot)
            except OSError:
                t = os.path.getmtime(arch)
        t = max(float(t), last + 1e-3)
        last = t
        yield v, t


def _version_as_of_timestamp(root: str, live: dict[int, dict], ts: float) -> int:
    """Latest live version at or before epoch ``ts`` — mirror of
    VersionedTable.version_as_of_timestamp."""
    winner = None
    for v, t in _adjusted_times(root, live):
        if t <= ts:
            winner = v
    if winner is None:
        raise ValueError(
            f"no live version of {root} at or before epoch timestamp {ts}"
        )
    return winner


def _first_version_at_or_after(root: str, live: dict[int, dict], ts: float) -> int:
    """Earliest live version whose adjusted timestamp is >= ``ts`` —
    the Delta ``startingTimestamp`` contract: all changes committed AT
    or after the timestamp are included, so a consumer resuming from a
    commit timestamp copied out of the history does NOT silently skip
    that exact-equality commit.  Past the head → head+1 (the stream
    waits for the next commit, matching the old version-as-of + 1
    behavior there); before the first live version (or an empty table)
    → that first version (0 for empty)."""
    for v, t in _adjusted_times(root, live):
        if t >= ts:
            return v
    return max(live) + 1 if live else 0


class VersionedDataSource(DataSource):
    """format("versioned"): option("root", ...) plus time travel via
    option("version", N) — VERSION AS OF — or
    option("timestampAsOf", epochSeconds) — TIMESTAMP AS OF."""

    @classmethod
    def name(cls) -> str:
        return "versioned"

    def _manifest(self) -> dict:
        root = self.options["root"]
        live = _live_manifests(root)
        if not live:
            raise ValueError(f"{root} has no live versions")
        ts_opt = self.options.get("timestampAsOf")
        if ts_opt is not None and "version" in self.options:
            raise ValueError("pass version or timestampAsOf, not both")
        if ts_opt is not None:
            v = _version_as_of_timestamp(
                root, live, _opt_ts(ts_opt, "timestampAsOf")
            )
        else:
            v = int(self.options.get("version", max(live)))
        if v not in live:
            raise ValueError(f"version {v} of {root} not found/expired")
        return live[v]

    def _cdf(self) -> bool:
        return str(self.options.get("changeFeed", "false")).lower() == "true"

    def _history(self) -> bool:
        return str(self.options.get("history", "false")).lower() == "true"

    def schema(self) -> str:
        if self._history():
            # DESCRIBE HISTORY for SQL-only users: one row per live
            # version, same columns as VersionedTable.history()
            return _HISTORY_DDL
        # manifests record df.schema.simpleString(); Spark's parser
        # accepts the struct<...> form directly.  In change-feed mode
        # every row additionally carries its change type and commit
        # version (the Delta readChangeFeed column contract).
        m = self._manifest()
        # remember WHICH version this schema came from: the stream
        # reader's remap pin must come from the same manifest read as
        # its field list, or a rename committed between schema
        # resolution and reader construction mis-classifies as forward
        # and silently serves NULL under the subscribed name
        self._schema_pin = m["version"]
        base = m["schema"]
        if self._cdf():
            return base[:-1] + (
                ",_change_type:string,_commit_version:bigint"
                ",_commit_timestamp:timestamp>"
            )
        return base

    def reader(self, schema):
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        if self._history():
            if self._cdf():
                raise ValueError("pass history or changeFeed, not both")
            return VersionedHistoryReader(self.options["root"])
        if self._cdf():
            # batch readChangeFeed (Delta parity): requires an explicit
            # start — an unbounded batch CDF would be the whole history
            root = self.options["root"]
            if "startingVersion" in self.options:
                s = int(self.options["startingVersion"])
            elif "startingTimestamp" in self.options:
                # inclusive at exact equality (Delta: changes committed
                # AT or after the timestamp)
                s = _first_version_at_or_after(
                    root,
                    _live_manifests(root),
                    _opt_ts(self.options["startingTimestamp"], "startingTimestamp"),
                )
            else:
                raise ValueError(
                    "batch changeFeed requires startingVersion or "
                    "startingTimestamp (Delta readChangeFeed contract)"
                )
            if "endingVersion" in self.options:
                e = int(self.options["endingVersion"])
            elif "endingTimestamp" in self.options:
                e = _version_as_of_timestamp(
                    root,
                    _live_manifests(root),
                    _opt_ts(self.options["endingTimestamp"], "endingTimestamp"),
                )
            else:
                live = _live_manifests(root)
                if not live:
                    raise ValueError(f"{root} has no live versions")
                e = max(live)
            if s < 0 or e < s:
                raise ValueError(
                    f"invalid change-feed range: ({s}, {e}) of {root}"
                )
            return VersionedCDFBatchReader(root, fields, s, e)
        return VersionedReader(
            self.options["root"],
            self._manifest(),
            fields,
            prune=str(self.options.get("statsPruning", "false")).lower()
            == "true",
        )

    def writer(self, schema, overwrite: bool):
        """Batch WRITE path: ``INSERT INTO|OVERWRITE <USING versioned
        view>`` and ``df.write.format("versioned").mode(...)`` — see
        sources/pyds_write.py for the protocol (executor tasks stream
        Arrow batches into fresh data files; the driver hook claims the
        next version with the os-primitive twin of the JVM commit
        protocol, CAS-retried). Imported lazily: pyds_write reuses this
        module's manifest resolution."""
        from finalpipeline_spark.sources.pyds_write import (
            VersionedDataSourceWriter,
        )

        return VersionedDataSourceWriter(dict(self.options), schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        """Streaming WRITE path: ``df.writeStream.format("versioned")``
        — append output mode, exactly-once via (sinkId, batchId) commit
        identity recorded in manifest meta (see pyds_write's
        VersionedStreamDataSourceWriter)."""
        from finalpipeline_spark.sources.pyds_write import (
            VersionedStreamDataSourceWriter,
        )

        return VersionedStreamDataSourceWriter(
            dict(self.options), schema, overwrite
        )

    def streamReader(self, schema) -> "VersionedStreamReader":
        caps = {}
        for opt, key in (
            ("maxVersionsPerTrigger", "max_versions"),
            ("maxFilesPerTrigger", "max_files"),
        ):
            if opt in self.options:
                v = int(self.options[opt])
                if v < 1:
                    raise ValueError(f"{opt} must be >= 1, got {v}")
                caps[key] = v
        if "startingVersion" in self.options and "startingTimestamp" in self.options:
            raise ValueError("pass startingVersion or startingTimestamp, not both")
        if "startingVersion" in self.options:
            sv = int(self.options["startingVersion"])
            if sv < 0:
                raise ValueError(f"startingVersion must be >= 0, got {sv}")
            caps["starting_version"] = sv
        elif "startingTimestamp" in self.options:
            # Delta semantics: all changes committed AT OR AFTER the
            # timestamp — INCLUSIVE at exact equality, so resuming from
            # a timestamp copied out of the commit history replays that
            # commit instead of silently skipping it (0 when the
            # timestamp predates the table)
            root = self.options["root"]
            caps["starting_version"] = _first_version_at_or_after(
                root,
                _live_manifests(root),
                _opt_ts(self.options["startingTimestamp"], "startingTimestamp"),
            )
        if (
            str(self.options.get("skipChangeCommits", "false")).lower()
            == "true"
        ):
            if self._cdf():
                raise ValueError(
                    "skipChangeCommits applies to the append-only "
                    "stream — a change feed serves mutations as rows"
                )
            caps["skip_change_commits"] = True
        return VersionedStreamReader(
            self.options["root"],
            [(f.name, f.dataType.simpleString()) for f in schema.fields],
            cdf=self._cdf(),
            # pin and field list from the SAME manifest read (schema()
            # stashed the version it resolved); absent only when the
            # consumer supplied the schema explicitly — then the
            # head-at-construction fallback applies
            pin_version=getattr(self, "_schema_pin", None),
            **caps,
        )


class VersionedReader(DataSourceReader):
    """Batch reader with OPT-IN manifest-stats file skipping
    (``option("statsPruning", "true")``): pushed comparison and IS
    [NOT] NULL filters prune whole files by per-file [min, max] / null
    counts BEFORE any parquet footer is opened (the zone-map pattern at
    the DataSource layer). Pruning over-selects only — every filter is
    returned to Spark for exact re-evaluation.

    OFF by default because it is only sound for the load→filter→act
    pattern where the loaded DataFrame is planned ONCE: Spark's
    PlanPythonDataSourceScan caches the planned scan per relation and
    REUSES it for later filter-less queries on the same DataFrame
    (measured: pushFilters/partitions are simply not called again), so
    a partition list pruned for one query would silently become another
    query's wrong answer. The always-sound pruned paths are the
    explicit snapshot APIs (VersionedTable.read_pruned /
    read_null_pruned / read_point_lookup), which plan fresh per call."""

    def __init__(
        self,
        root: str,
        manifest: dict,
        fields: list[tuple[str, str]],
        prune: bool = False,
    ):
        self._root = root
        self._entries = list(manifest["files"])
        self._fields = fields
        self._prune = prune
        self._ranges: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):  # noqa: D102
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
            IsNull: "isnull",
            IsNotNull: "isnotnull",
        }
        # REPLACE, never append: the engine reuses one reader instance
        # for every scan planned off the same loaded DataFrame, so
        # accumulated state would leak one query's filters into the
        # next (an UNFILTERED scan after filter("x = 1") silently
        # pruned files for x = 1 — caught by exceptAll self-compare)
        self._ranges = [
            (f.attribute[0], op, getattr(f, "value", None))
            for f in filters
            if (op := ops.get(type(f))) and len(f.attribute) == 1
        ]
        # every filter still needs exact evaluation by Spark — stats
        # pruning only skips files that provably contain no match
        return filters

    def _may_match(self, entry: dict, ranges: list[tuple]) -> bool:
        for col, op, v in ranges:
            # stats are keyed by the file's WRITE-time (physical) names
            phys = (entry.get("cmap") or {}).get(col, col)
            if op in ("isnull", "isnotnull"):
                # null-count skipping, mirroring read_null_pruned: safe
                # under deletion vectors (they only remove rows); a
                # physically absent column reads back all-NULL
                nd = entry.get("nulls")
                if nd is None:
                    continue  # pre-null-stats commit: can't prove
                if phys not in nd:
                    if op == "isnotnull":
                        return False
                    continue
                if op == "isnull" and nd[phys] == 0:
                    return False
                if op == "isnotnull" and nd[phys] == entry["rows"]:
                    return False
                continue
            mn, mx = entry.get("stats", {}).get(phys, (None, None))
            if mn is None or mx is None:
                continue  # no stats → cannot prune on this column
            try:
                if op == "=" and not (mn <= v <= mx):
                    return False
                if op in (">", ">=") and not (mx >= v if op == ">=" else mx > v):
                    return False
                if op in ("<", "<=") and not (mn <= v if op == "<=" else mn < v):
                    return False
            except TypeError:
                continue  # incomparable types (e.g. stringified dates)
        return True

    def partitions(self) -> Sequence[InputPartition]:
        ranges = self._ranges if self._prune else []
        return _pack_partitions(
            [
                _entry_partition(self._root, e)
                for e in self._entries
                if self._may_match(e, ranges)
            ]
        )

    def read(self, partition) -> Iterator:
        if partition is None:  # all files pruned → one None split
            return iter(())
        if isinstance(partition, _PackedPartition):
            return (b for spec in partition.specs for b in self.read(spec))
        return _read_file_batches(
            partition.path,
            self._fields,
            drop_positions=_dv_positions_for(partition.dv, partition.rel),
            cmap=partition.cmap,
        )


class VersionedStreamReader(DataSourceStreamReader):
    """Versions are the offset axis: micro-batch (start, end] reads the
    files added by commits start+1 .. end."""

    _META_COLS = ("_change_type", "_commit_version", "_commit_timestamp")

    def __init__(
        self,
        root: str,
        fields: list[tuple[str, str]],
        cdf: bool = False,
        max_versions: int | None = None,
        max_files: int | None = None,
        starting_version: int | None = None,
        pin_version: int | None = None,
        skip_change_commits: bool = False,
    ):
        self._root = root
        self._fields = fields
        self._cdf = cdf
        # Delta's skipChangeCommits: the append-only stream SKIPS
        # content-mutation commits whole (appends-only view) instead
        # of failing on them. Never affects CDF mode.
        self._skip_change_commits = skip_change_commits
        # The PIN: the version whose schema this reader was planned
        # with. The DataSource passes the version its schema() call
        # actually resolved (same manifest read as the field list —
        # a rename committed between schema resolution and reader
        # construction must not shift the frame); the head-at-
        # construction fallback covers explicitly-supplied schemas.
        # Remap-op directions derive from version order against it —
        # see _pin_directions; injectable for tests that model a
        # reader planned in an earlier era.
        if pin_version is None:
            live = _live_manifests(root)
            pin_version = max(live) if live else -1
        self._pin = pin_version
        # Delta startingVersion/startingTimestamp parity: begin the
        # change stream AT this commit instead of with the initial
        # snapshot — the resume-from-here shape for consumers that
        # bootstrapped out of band (a deep clone, a batch backfill).
        self._starting = starting_version
        # Trigger pacing (Delta's maxFilesPerTrigger shape): the Python
        # DataSource API has no ReadLimit parameter, so the reader
        # paces itself — latestOffset returns at most max_versions
        # commits / max_files added files PAST THE LAST PLANNED BATCH
        # END, and only partitions()/initialOffset move that cursor
        # (latestOffset is polled many times per trigger for progress
        # reporting, so advancing state there would race the cursor to
        # head and silently disable the cap — measured). A never-set
        # cursor is SEEDED (not advanced) by latestOffset via
        # _initial_offset, so a fresh stream's first trigger is paced
        # too — the engine may ask for the latest offset on an
        # instance that never planned a batch. Semantics:
        # EVERY batch is paced, including a fresh stream's first —
        # initialOffset seeds the cursor, so the first batch delivers
        # the initial snapshot AS OF the capped end and later batches
        # drain the rest (Delta applies rate limits to the initial
        # snapshot the same way); a consumer that fell 10k commits
        # behind catches up in bounded micro-batches instead of one
        # table-sized batch. On restart
        # the engine replays the last batch (partitions call) before
        # planning, which re-syncs the cursor — restart batches are
        # paced immediately. availableNow/once falls back to Spark's
        # single-batch mode for Python sources: there the cap bounds
        # that single batch past the checkpoint (a bounded incremental
        # drain per run), matching Delta's "rate limits interact with
        # Trigger.Once" caveat.
        self._max_versions = max_versions
        self._max_files = max_files
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        # start BEFORE the earliest live version so the first batch
        # delivers the initial snapshot — but only if that version is
        # an initial commit; otherwise start from the current latest.
        # The explicit "snapshot" marker distinguishes this sentinel
        # from a consumed-then-vacuumed version (whose tombstone file
        # list must be subtracted in partitions(); the sentinel's, if
        # one exists from a pre-stream vacuum, must NOT be — first may
        # carry that tombstone's files by reference).
        return self._initial_offset()

    def _initial_offset(self) -> dict:
        if self._starting is not None:
            sv = self._starting
            self._last_end = sv - 1
            if sv == 0:
                # changes from the very first commit: same sentinel as
                # a fresh snapshot start (subtract nothing before v0)
                return {"version": -1, "snapshot": True}
            if _manifest_any(self._root, sv - 1) is None:
                raise ValueError(
                    f"startingVersion {sv} of {self._root}: version "
                    f"{sv - 1} has no manifest to diff against — it was "
                    "never committed (or the log predates this table)"
                )
            return {"version": sv - 1}
        live = _live_manifests(self._root)
        if not live:
            return {"version": -1, "snapshot": True}
        first = min(live)
        if live[first]["action"] in ("overwrite", "append", "clone"):
            self._last_end = first - 1
            return {"version": first - 1, "snapshot": True}
        self._last_end = max(live)
        return {"version": max(live)}

    def latestOffset(self) -> dict:
        # IDEMPOTENT under polling: the engine calls this many times
        # per trigger interval (progress reporting, prefetch), so the
        # capped end is computed fresh from the last PLANNED batch end
        # (advanced only by partitions()) and never from this call —
        # otherwise polling would race the cursor to head before the
        # first batch plans, silently disabling the cap.
        live = _live_manifests(self._root)
        if not live:
            return {"version": -1}
        head = max(live)
        uncapped = self._max_versions is None and self._max_files is None
        if not uncapped and self._last_end is None:
            # The engine may ask for the latest offset on an instance
            # that never planned a batch (a fresh stream's very first
            # trigger; plan/run split across workers): seed the cursor
            # exactly as initialOffset would, so the FIRST batch is
            # paced too — a consumer 10k commits behind must not get
            # the whole backlog as one batch. On a restart this seeds
            # conservatively low; the engine never plans backwards
            # from its checkpoint, and the replayed partitions() call
            # re-syncs the cursor before the next real batch.
            self._initial_offset()
        start = self._last_end
        if uncapped or start is None or head <= start:
            return {"version": head}
        # advance version-by-version until a cap would be exceeded —
        # always at least one version so the stream makes progress
        end, files_acc = start, 0
        prev = _manifest_any(self._root, start) if start >= 0 else None
        for v in range(start + 1, head + 1):
            cur = live.get(v) or _manifest_any(self._root, v)
            if cur is None:
                break  # gap: partitions() raises the clearer error
            pv = {f["path"] for f in prev["files"]} if prev else set()
            added = sum(1 for f in cur["files"] if f["path"] not in pv)
            if prev is not None and (
                cur["action"] == "optimize"
                or (self._skip_change_commits and cur["action"] != "append")
            ):
                # files this commit adds are never SERVED (compaction
                # relocates already-delivered rows in both modes and
                # emits zero change rows in CDF mode; skipped change
                # commits are dropped whole) — they must not eat
                # maxFilesPerTrigger budget
                added = 0
            if end > start and (
                self._max_files is not None and files_acc + added > self._max_files
            ):
                break
            end, files_acc, prev = v, files_acc + added, cur
            if self._max_versions is not None and end - start >= self._max_versions:
                break
            if self._max_files is not None and files_acc >= self._max_files:
                break
        return {"version": end}

    def _cdf_partitions(
        self,
        start: dict,
        s: int,
        e: int,
        live: dict[int, dict],
        directions: tuple[dict[int, tuple], dict[int, tuple]] | None = None,
    ) -> Sequence[InputPartition]:
        """Change-feed partitions: per commit in (s, e], the ADDED
        files stream as 'insert' rows and the DROPPED files as
        'delete' rows, each tagged with the commit version — so CoW
        delete/replace commits flow through the stream instead of
        failing it. File granularity means a CoW survivor appears as a
        delete (its old file) AND an insert (its rewrite) with
        identical content: a keyed consumer applying deletes-then-
        inserts per commit converges to the exact snapshot (upsert/CDC
        semantics); a blind appender must not use changeFeed mode.
        Whole-table rewrites still raise — their diff is the entire
        table twice."""
        parts: list[_FilePartition] = []
        prev: dict | None
        if start.get("snapshot"):
            prev = None
        elif s in live:
            prev = live[s]
        else:
            prev = _manifest_any(self._root, s)
            if prev is None:
                # a consumed version's manifest (even its vacuum
                # tombstone) is gone: an empty diff base would
                # re-deliver everything as 'insert' — fail loud
                raise ValueError(
                    f"start version {s} of {self._root} has no "
                    "manifest — cannot compute an exact delta; "
                    "restart from a fresh checkpoint"
                )
        # column-remap commits (rename/re-add) are metadata-only (zero
        # row delta); every step's entries are aligned onto THIS feed's
        # pinned logical frame below (_pin_directions docstring has the
        # full direction contract and the one refusal left).  Ops are
        # scanned across the WHOLE span between the pin and the range —
        # not just inside (s, e] — so a remap that moved the pinned
        # frame in an earlier micro-batch (or after a replayed range)
        # still aligns this batch's entries.  The batch CDF reader
        # passes its own directions — its pin is the LATEST schema, so
        # every op is forward by construction.
        if directions is not None:
            fwd, rev = directions
        else:
            fwd, rev = _pin_directions(
                _scan_remap_ops(
                    self._root, live, min(s, self._pin), max(e, self._pin)
                ),
                self._pin,
                {n for n, _t in self._fields},
            )
        for v in range(s + 1, e + 1):
            cur = live[v]
            if prev is not None and _same_file_refs(prev["files"], cur["files"]):
                # metadata-only commit (constraint add/drop, column
                # drop, no-op compaction): provably zero row delta
                prev = cur
                continue
            if cur["action"] == "optimize":
                # OPTIMIZE (bin-packing / clustering / DV folding)
                # rewrites the file LAYOUT, never the live row set —
                # its row delta is provably empty, so the feed emits
                # zero change rows for it (Delta parity: a consumer's
                # range crossing routine maintenance must not break)
                prev = cur
                continue
            if cur["action"] not in (
                "append", "delete", "replace", "overwrite", "clone", "rollback"
            ):
                raise ValueError(
                    f"version {v} is '{cur['action']}': whole-table rewrite "
                    "has no row-level change feed — restart from a snapshot"
                )
            if cur["action"] in ("overwrite", "clone") and v > min(live):
                raise ValueError(
                    f"version {v} is '{cur['action']}': whole-table rewrite "
                    "has no row-level change feed — restart from a snapshot"
                )
            if (
                cur["action"] == "rollback"
                and prev is not None
                and cur.get("schema") != prev.get("schema")
            ):
                # a rollback that also reverts the schema (undoes a
                # rename/re-add/evolution) has no single logical frame
                # to serve the feed in — data-only rollbacks serve
                raise ValueError(
                    f"version {v} is a SCHEMA-REVERTING rollback — no "
                    "row-level change feed across it; restart from a "
                    "snapshot"
                )
            prev_by = (
                {os.path.join(f.get("base", self._root), f["path"]): f
                 for f in prev["files"]}
                if prev
                else {}
            )
            cur_by = {
                os.path.join(f.get("base", self._root), f["path"]): f
                for f in cur["files"]
            }
            # entry-aware diffs: a dropped file's rows stream as deletes
            # MINUS anything its deletion vector already killed, and a
            # merge-on-read delete (same file list, changed vector ref)
            # streams exactly the newly-vectored positions as deletes.
            parts += [
                _entry_partition(
                    self._root,
                    _frame_align_entry(cur_by[p], v, fwd, rev),
                    change="insert", version=v, ts=cur.get("ts"),
                )
                for p in sorted(set(cur_by) - set(prev_by))
            ]
            parts += [
                _entry_partition(
                    self._root,
                    _frame_align_entry(prev_by[p], v, fwd, rev),
                    change="delete", version=v, ts=cur.get("ts"),
                )
                for p in sorted(set(prev_by) - set(cur_by))
            ]
            for p in sorted(set(cur_by) & set(prev_by)):
                ne, oe = cur_by[p], prev_by[p]
                if (ne.get("dv") or {}).get("path") == (oe.get("dv") or {}).get(
                    "path"
                ):
                    continue
                if not ne.get("dv") and cur["action"] != "rollback":
                    # positions removed from a live entry = resurrected
                    # rows; the one writer that legitimately restores an
                    # older (smaller) vector is rollback, served below —
                    # anything else dropping a vector in place is
                    # corruption: fail loud rather than mis-stream
                    raise ValueError(
                        f"version {v} dropped the deletion vector of "
                        f"{ne['path']} in place — no row-level change "
                        "feed for resurrection; restart from a snapshot"
                    )
                base = ne.get("base", self._root)
                cmap = _frame_align_entry(ne, v, fwd, rev).get("cmap")

                def _dv_abs(entry: dict) -> str | None:
                    d = entry.get("dv")
                    if not d:
                        return None
                    return os.path.join(d.get("base", base), d["path"])

                # positions newly PRESENT in the vector are this
                # commit's deletes; for a rollback, positions newly
                # ABSENT (the restored, older vector is smaller) are
                # resurrected rows and stream as inserts. Vectors of
                # one file are nested along the version line, so at
                # most one direction is non-empty per entry; an empty
                # diff partition yields zero rows.
                directions_to_emit = [("delete", _dv_abs(ne), _dv_abs(oe))]
                if cur["action"] == "rollback":
                    directions_to_emit.append(
                        ("insert", _dv_abs(oe), _dv_abs(ne))
                    )
                for change, dv_new, dv_old in directions_to_emit:
                    if dv_new is None:
                        continue  # minuend empty ⇒ provably no rows
                    parts.append(
                        _FilePartition(
                            p,
                            change=change,
                            version=v,
                            rel=ne["path"],
                            dv=dv_new,
                            dv_old=dv_old,
                            dv_diff=True,
                            cmap=cmap,
                            ts=cur.get("ts"),
                            nbytes=ne.get("bytes"),
                        )
                    )
            prev = cur
        return parts

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = start["version"], end["version"]
        # resync pacing with the checkpoint on a restart-replayed batch
        # — to BOTH bounds: on a restart latestOffset may have seeded
        # the cursor from _initial_offset (below the checkpoint), and
        # an engine that consulted latestOffset before replaying the
        # checkpointed batch must still never be offered an offset
        # behind its own start (it would regress the offset log and
        # re-deliver rows)
        cur = self._last_end if self._last_end is not None else -1
        self._last_end = max(cur, s, e)
        if e <= s:
            return []
        live = _live_manifests(self._root)
        for v in range(s + 1, e + 1):
            if v not in live:
                raise ValueError(
                    f"version {v} of {self._root} was vacuumed before this "
                    "stream consumed it — restart from a fresh checkpoint"
                )
        if self._cdf:
            try:
                return self._cdf_partitions(start, s, e, live)
            except json.JSONDecodeError:
                raise ValueError(
                    f"start version {s} of {self._root} has an unreadable "
                    "manifest — cannot compute an exact delta; restart "
                    "from a fresh checkpoint"
                ) from None
        # Append-only mode plans PER COMMIT (not one base→end diff):
        # each commit in (s, e] contributes the files it ADDED vs its
        # parent, so an OPTIMIZE inside the range contributes nothing —
        # its rewritten files carry rows the consumer already received
        # (Delta parity: streaming ignores dataChange=false actions,
        # so routine compaction never breaks or double-delivers a
        # stream). Content mutations (CoW/MoR delete, replace,
        # overwrite) still fail loudly — their added files rewrite
        # SURVIVOR rows, which a one-shot diff would double-count —
        # unless option skipChangeCommits 'true' opted into Delta's
        # appends-only view (those commits are skipped whole).
        # Diff base for the first planned commit: the start manifest —
        # a tombstone manifest still works if the start version was
        # vacuumed UNDER the stream (its file list survives), and the
        # pre-snapshot sentinel means "deliver the full snapshot".
        if start.get("snapshot"):
            prev = None
        elif s in live:
            prev = live[s]
        else:
            try:
                prev = _manifest_any(self._root, s)
            except json.JSONDecodeError:
                raise ValueError(
                    f"start version {s} of {self._root} has an unreadable "
                    "manifest — cannot compute an exact delta; restart "
                    "from a fresh checkpoint"
                ) from None
            if prev is None:
                # a consumed version's manifest (even its vacuum
                # tombstone) is gone: an empty diff base would
                # re-deliver everything — fail loud
                raise ValueError(
                    f"start version {s} of {self._root} has no "
                    "manifest — cannot compute an exact delta; "
                    "restart from a fresh checkpoint"
                )
        # frame-align the served entries onto this stream's pinned
        # schema (a live stream that crossed a rename keeps receiving
        # its subscribed column; see _pin_directions) — ops scanned
        # across the whole pin↔range span, not just (s, e]
        fwd, rev = _pin_directions(
            _scan_remap_ops(
                self._root, live, min(s, self._pin), max(e, self._pin)
            ),
            self._pin,
            {n for n, _t in self._fields},
        )
        parts = []
        for v in range(s + 1, e + 1):
            cur = live[v]
            if prev is not None and _same_file_refs(prev["files"], cur["files"]):
                # metadata-only commit (rename/re-add/constraint/
                # column add/drop/widen, properties, stats refresh,
                # no-op compaction): provably zero row delta
                prev = cur
                continue
            if cur["action"] == "optimize":
                # layout-only rewrite: rows unchanged, already served
                prev = cur
                continue
            if prev is not None and cur["action"] != "append":
                if self._skip_change_commits:
                    prev = cur
                    continue
                raise ValueError(
                    f"version {v} is '{cur['action']}': content "
                    "mutation has no row-level delta; reprocess the "
                    "snapshot (or set skipChangeCommits 'true' to "
                    "stream newly appended rows only)"
                )
            prev_paths = (
                {
                    os.path.join(f.get("base", self._root), f["path"])
                    for f in prev["files"]
                }
                if prev
                else set()
            )
            parts += [
                _entry_partition(self._root, _frame_align_entry(f, v, fwd, rev))
                for f in cur["files"]
                if os.path.join(f.get("base", self._root), f["path"])
                not in prev_paths
            ]
            prev = cur
        return parts

    def read(self, partition) -> Iterator:
        if partition is None:  # empty partition list → one None split
            return iter(())
        if isinstance(partition, _PackedPartition):
            # the batch CDF reader packs small files per task; each
            # spec keeps its own change/version tags and vector refs
            return (b for spec in partition.specs for b in self.read(spec))
        if not self._cdf:
            return _read_file_batches(
                partition.path,
                self._fields,
                drop_positions=_dv_positions_for(partition.dv, partition.rel),
                cmap=partition.cmap,
            )
        return self._read_cdf_batches(partition)

    def _read_cdf_batches(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa

        data_fields = [
            (n, t) for n, t in self._fields if n not in self._META_COLS
        ]
        if partition.dv_diff:
            keep = _dv_positions_for(
                partition.dv, partition.rel
            ) - _dv_positions_for(partition.dv_old, partition.rel)
            batches = _read_file_batches(
                partition.path, data_fields, keep_positions=keep,
                cmap=partition.cmap,
            )
        else:
            batches = _read_file_batches(
                partition.path,
                data_fields,
                drop_positions=_dv_positions_for(partition.dv, partition.rel),
                cmap=partition.cmap,
            )
        for batch in batches:
            t = pa.Table.from_batches([batch])
            n = t.num_rows
            t = t.append_column(
                "_change_type",
                pa.array([partition.change] * n, pa.large_string()),
            )
            t = t.append_column(
                "_commit_version",
                pa.array([partition.version] * n, pa.int64()),
            )
            us = (
                int(round(partition.ts * 1_000_000))
                if partition.ts is not None
                else None
            )
            t = t.append_column(
                "_commit_timestamp",
                pa.array([us] * n, pa.timestamp("us")),
            )
            yield from t.to_batches(max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        pass  # progress is tracked by the stream's own checkpoint

    def stop(self) -> None:
        pass


class VersionedCDFBatchReader(DataSourceReader):
    """Batch ``readChangeFeed`` (Delta parity): every row inserted or
    deleted in versions [startingVersion, endingVersion], tagged with
    ``_change_type``/``_commit_version`` — the same per-commit
    file/vector diff the streaming change feed plans, materialized as
    one bounded batch. Reuses the stream reader's partition planner and
    row tagger verbatim, so batch and stream feeds can never diverge.
    Tombstoned (vacuumed) versions may serve as the DIFF BASE (their
    manifests keep full file lists) but a vacuumed version INSIDE the
    range refuses loudly — its data files may be gone."""

    def __init__(
        self, root: str, fields: list[tuple[str, str]], start: int, end: int
    ):
        self._root = root
        self._inner = VersionedStreamReader(root, fields, cdf=True)
        self._start = start
        self._end = end

    def partitions(self) -> Sequence[InputPartition]:
        live = _live_manifests(self._root)
        mans = dict(live)
        for v in range(max(0, self._start - 1), self._end + 1):
            if v in mans:
                continue
            m = _manifest_any(self._root, v)
            if m is None:
                raise ValueError(
                    f"version {v} of {self._root} was never committed — "
                    "cannot compute a change feed across it"
                )
            if v >= self._start:
                raise ValueError(
                    f"version {v} of {self._root} was vacuumed — its "
                    "change feed is no longer reconstructible"
                )
            mans[v] = m  # tombstone as diff base only
        offset = (
            {"version": -1, "snapshot": True}
            if self._start == 0
            else {"version": self._start - 1}
        )
        # the batch feed's pinned frame is the LATEST schema (the view
        # planned with it), so every remap op — including ones BETWEEN
        # endingVersion and head — is forward by construction; scan to
        # the head so a rename after the range still aligns its steps
        pin = max(live) if live else self._end
        ops = _scan_remap_ops(
            self._root, mans, self._start - 1, max(self._end, pin)
        )
        return _pack_partitions(
            self._inner._cdf_partitions(
                offset,
                self._start - 1,
                self._end,
                mans,
                directions=_pin_directions(
                    ops, pin, {n for n, _t in self._inner._fields}
                ),
            )
        )

    def read(self, partition: _FilePartition) -> Iterator:
        return self._inner.read(partition)


_HISTORY_DDL = (
    "version bigint, parent bigint, action string, n_files bigint, "
    "n_rows bigint, commit_ts double, n_added_files bigint, "
    "n_removed_files bigint, n_dv_new_deleted bigint"
)


class VersionedHistoryReader(DataSourceReader):
    """DESCRIBE HISTORY through pure SQL — ``CREATE TEMPORARY VIEW h
    USING versioned OPTIONS (root ..., history 'true')``: one row per
    live version with the same read-side operation metrics as
    VersionedTable.history() (files added/removed and rows newly
    deletion-vectored vs the parent manifest — manifest-sized, zero
    data I/O). One partition: history is log-sized by construction."""

    def __init__(self, root: str) -> None:
        self._root = root

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(0)]

    def read(self, partition) -> Iterator[tuple]:
        live = _live_manifests(self._root)
        for v in sorted(live):
            m = live[v]
            pm = (
                _manifest_any(self._root, m["parent"])
                if m["parent"] is not None
                else None
            )
            if m["parent"] is not None and pm is None:
                added = removed = dv_new = None  # parent unreadable
            else:
                prev = {f["path"]: f for f in (pm or {"files": []})["files"]}
                cur = {f["path"]: f for f in m["files"]}
                added = sum(1 for p in cur if p not in prev)
                removed = sum(1 for p in prev if p not in cur)
                dv_new = sum(
                    (f.get("dv") or {}).get("deleted", 0)
                    - (prev.get(p, {}).get("dv") or {}).get("deleted", 0)
                    for p, f in cur.items()
                )
            n_rows = sum(
                f["rows"] - (f.get("dv") or {}).get("deleted", 0)
                for f in m["files"]
            )
            ts = m.get("ts")
            yield (
                m["version"],
                m["parent"],
                m["action"],
                len(m["files"]),
                n_rows,
                float(ts) if ts is not None else None,
                added,
                removed,
                dv_new,
            )


def table_changes(spark, root: str, starting_version: int | float | str,
                  ending_version: int | None = None):
    """Delta's ``table_changes(table, start[, end])`` TVF shape as one
    call: the batch change feed of ``root`` over
    [starting_version, ending_version] (end defaults to latest), rows
    tagged ``_change_type``/``_commit_version``/``_commit_timestamp``.
    SQL-only consumers get the identical feed from a
    ``CREATE TEMPORARY VIEW ... USING versioned OPTIONS (root ...,
    changeFeed 'true', startingVersion ...)`` view (module docstring)."""
    r = (
        spark.read.format("versioned")
        .option("root", root)
        .option("changeFeed", "true")
        .option("startingVersion", str(starting_version))
    )
    if ending_version is not None:
        r = r.option("endingVersion", str(ending_version))
    return r.load()


def register_versioned_source(spark) -> None:
    """Make format("versioned") available on this session. Python-source
    filter pushdown is opt-in (and the reader implementing pushFilters
    ERRORS if it's off), so the registration turns it on — it is a
    runtime-settable SQL conf."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedDataSource)


def snapshot_view(spark, name: str, root: str, version=None,
                  timestamp_as_of=None) -> None:
    """SNAPSHOT temp view over a versioned table, served natively when
    the snapshot is plain.

    A ``USING versioned`` view routes every scan through Python
    workers: the driver pickles the DataSource to a planning worker,
    and each task ships its rows JVM-ward as Arrow batches — a fixed
    per-query cost at any scale and a per-byte boundary tax at 100 TB.
    A PLAIN snapshot (no deletion vectors, no column-mapped entries)
    needs none of that machinery: it is exactly a parquet scan of the
    manifest's file list with the logical schema imposed, which
    ``VersionedTable.read`` plans as a native ``FileScan`` — Catalyst
    pushdown, column pruning and whole-stage codegen included.
    Merge-on-read and column-mapped snapshots keep the Python
    DataSource view, whose reader owns those shapes.

    Semantics note: BOTH branches pin the snapshot at call time (the
    native branch pins the file list; the fallback pins by passing an
    explicit ``version``). A live always-latest view is exactly what
    the raw ``CREATE TEMPORARY VIEW ... USING versioned`` SQL is for.
    """
    from finalpipeline_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, root)
    if timestamp_as_of is not None:
        if version is not None:
            raise ValueError("pass version or timestamp_as_of, not both")
        version = t.version_as_of_timestamp(timestamp_as_of)
    m = t.manifest(version)
    plain = m["files"] and not any(
        e.get("dv") or e.get("cmap") for e in m["files"]
    )
    if plain:
        t.read(m["version"]).createOrReplaceTempView(name)
        return
    register_versioned_source(spark)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} USING versioned "
        f"OPTIONS (root '{root}', version '{m['version']}')"
    )
