"""Versioned parquet tables: snapshots, time travel, rollback, vacuum.

The reference overwrote its tables in place (db_interact.py:115-130
``if_exists='replace'``), so a bad load destroyed the previous state
and readers could observe half-written tables. At 100 TB neither is
acceptable: writers must commit atomically, readers must be able to
pin the exact snapshot a job started from, and yesterday's state must
stay queryable until explicitly expired.

This module is that capability as plain Spark over plain parquet — the
mechanism behind Delta Lake / Apache Iceberg, reduced to its core:

* **Immutable data files.** Every commit writes its rows into a fresh
  ``data/c<uuid>/`` directory; no data file is ever mutated or renamed.
* **Manifest log.** ``_log/v%012d.json`` lists the data files that make
  up each version (plus per-file row counts and min/max column stats).
  A reader of version N opens exactly the listed files — never a
  directory listing, which is the S3 scaling trap (LIST is O(files)
  and eventually consistent on some stores).
* **Atomic commit = one exclusive manifest create.** The version is
  claimed with ``FileSystem.create(path, overwrite=False)``, which is
  atomic on HDFS-like stores; two racing writers get a clean
  ``ConcurrentCommitError`` for the loser (optimistic concurrency —
  re-read latest and retry). A crash *before* the manifest lands
  leaves an invisible orphan data directory that ``vacuum`` reclaims;
  a crash *mid-manifest-write* leaves an unparseable tail manifest
  that readers treat as an aborted commit and ``recover_log`` retires.
  (On raw S3 the exclusive create needs a conditional-put or an
  external lock — same caveat as Delta's S3 LogStore.)
* **Copy-on-write row deletes.** ``delete_where`` rewrites only the
  files that actually contain matching rows (found by one pruned scan
  of the current snapshot — parquet footer stats skip non-matching
  files); untouched files carry over into the new version by
  reference, so a delete touching 0.1% of files costs 0.1% of a
  rewrite.
* **Merge-on-read deletion vectors.** ``delete_where(mode="mor")``
  deletes WITHOUT rewriting any data file (Delta deletion-vector
  parity): the matching rows' positions — ``_metadata.row_index``
  within their immutable physical file — are written as one tiny
  ``_dv/`` parquet per commit, and each affected manifest entry
  references it. Readers anti-join the referenced positions back out
  (broadcast-sized: bounded by deleted-row count, never table size).
  A scattered 0.1%-of-rows delete costs kilobytes of position lists
  instead of rewriting every hit file — at 100 TB the difference
  between a metadata operation and a multi-TB rewrite. Any later
  rewrite of a DV'd file (CoW delete/replace/merge/optimize) applies
  the vector first, so rewrites purge vectors for free.
* **Rollback is roll-forward.** ``rollback(v)`` commits a NEW version
  whose file list equals version v's — history is never rewritten, so
  concurrent readers of any version are unaffected.
* **Vacuum.** Deletes data files referenced only by expired versions
  (and orphans from aborted commits), then retires their manifests.
  Time travel to an expired version raises cleanly.

Scale shape: planning state is the manifest (one JSON row per file —
~10^5 entries for 100 TB at 1 GiB/file), reads are
``spark.read.parquet(<file list>)`` so Catalyst still gets pushdown,
pruning and whole-stage codegen; the only driver-side work is
manifest-sized, never data-sized.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finalpipeline_spark.operators.compaction import _fs_and_path

# Re-exports: this module remains the package's single import surface —
# the round-9 split into versioned_{base,log,schema,dml} is internal.
from finalpipeline_spark.functions.frames import empty_df, local_df
from finalpipeline_spark.sources.versioned_base import (  # noqa: F401
    _ANCHOR_FMT,
    _ARCHIVE_DIR,
    _DATA_DIR,
    _DV_BROADCAST_ROWS,
    _DV_DIR,
    _DV_SCHEMA,
    _LOG_DIR,
    _MANIFEST_FMT,
    _NO_CAS,
    _READER_REQUIREMENTS,
    _VERIFY_MARGIN_SECONDS,
    _VERIFY_POLL_SECONDS,
    SUPPORTED_READER_VERSION,
    SUPPORTED_WRITER_VERSION,
    CommitInfo,
    ConcurrentCommitError,
    ConstraintViolationError,
    ProtocolVersionError,
    SchemaMismatchError,
    VersionNotFoundError,
    _is_file_not_found,
    _json_safe,
    _same_file_refs,
    _stat_cols,
    cdf_final_state,
)
from finalpipeline_spark.sources.local_fs import (
    LocalFs,
    default_fs_is_local,
    is_local_root,
)
from finalpipeline_spark.sources.versioned_dml import DmlMixin
from finalpipeline_spark.sources.versioned_log import LogProtocolMixin
from finalpipeline_spark.sources.versioned_schema import SchemaEvolutionMixin

class VersionedTable(LogProtocolMixin, SchemaEvolutionMixin, DmlMixin):
    """A multi-version parquet table rooted at ``root``.

    ``bloom_col`` declares a point-lookup index column: every commit
    then records a small per-file bloom filter (``bloom_bits`` bits,
    ``bloom_k`` hashes) in the manifest, and ``read_point_lookup``
    skips files whose filter rules the key out — the Delta
    bloom-filter-index / Iceberg-puffin mechanism. Min/max stats can't
    prune point lookups on high-cardinality unclustered keys (every
    file's range covers everything); the bloom can, with false-positive
    over-selection only."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        bloom_col: str | None = None,
        bloom_bits: int = 8192,
        bloom_k: int = 3,
        recovery_grace_seconds: float = 60.0,
        checkpoint_interval: int = 64,
        partition_by: list[str] | None = None,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.bloom_col = bloom_col
        self.bloom_bits = bloom_bits
        self.bloom_k = bloom_k
        # Hive/Delta-style PARTITION COLUMNS: every data file holds
        # exactly ONE value tuple of these columns (enforced by the
        # write layout — partitionBy subdirectories under each commit
        # dir), recorded per entry as string-encoded ``pv`` (Delta's
        # partitionValues). Declared at table creation (first commit)
        # and immutable afterwards — a handle declaring a DIFFERENT
        # set against an existing table refuses at write time.
        self.partition_by = list(partition_by) if partition_by else None
        # every Nth commit drops a log anchor (best-effort, tiny file);
        # 0 disables. See _ANCHOR_FMT.
        self.checkpoint_interval = checkpoint_interval
        # An unparseable manifest is only treated as ABORTED (and
        # auto-retired) once its modification time is older than this
        # grace period. The commit protocol's exclusive-create and
        # content write are two steps, so a LIVE writer's manifest is
        # briefly unparseable too — without the grace, a racing
        # recoverer can steal a mid-write manifest that becomes valid
        # milliseconds later (vacuum's in-flight-commit logic, applied
        # to the log). A crashed writer's fragment is stale forever, so
        # recovery still unwedges it after the grace.
        self.recovery_grace_seconds = recovery_grace_seconds
        if is_local_root(self.root) and default_fs_is_local(spark):
            # Local root: pure-Python log I/O (see local_fs module — a
            # py4j round trip per FS call was ~90% of a metadata-only
            # commit's wall time). Same no-sidecar raw semantics as the
            # getRawFileSystem branch below, with an ATOMIC exclusive
            # create. The JVM handle is still needed for non-log work
            # (COPY INTO source listing) — plain attribute access, no
            # round trip. Gated on the RESOLVED filesystem: a
            # scheme-less root under fs.defaultFS=hdfs:// is an HDFS
            # path and keeps the Hadoop client (split-brain guard).
            self._jvm = spark.sparkContext._jvm
            self._fs = LocalFs()
            self._fs_local = True
            return
        fs, _, self._jvm = _fs_and_path(spark, self.root)
        self._fs_local = False
        # On file:// Hadoop hands back ChecksumFileSystem, which keeps a
        # hidden .crc sidecar per file and renames data+crc as TWO
        # non-atomic ops — so the commit protocol's rename-claims can
        # strand a STALE sidecar that poisons the next occupant of a
        # manifest slot (its read fails checksum verification while the
        # bytes are valid; observed as raw FileNotFound/ChecksumException
        # escapes under the concurrency soak). The log protocol carries
        # its own integrity checks (JSON parse + the writer's
        # read-back-own-bytes verification), so the crc lens adds
        # nothing here: use the RAW filesystem. Non-checksummed
        # filesystems (HDFS, S3A — their integrity is internal) don't
        # expose getRawFileSystem and keep their native client.
        # Listing filters are sidecar-proof either way ('.'-prefixed
        # names are skipped everywhere).
        try:
            fs = fs.getRawFileSystem()
        except Exception:
            pass
        self._fs = fs

    # -- paths -------------------------------------------------------

    # -- read API ------------------------------------------------------
    def _abs(self, entry: dict[str, Any]) -> str:
        """Absolute path of a manifest file entry (``base`` points into
        another table's root for shallow-cloned entries)."""
        return f"{entry.get('base', self.root)}/{entry['path']}"

    def _dv_abs(self, entry: dict[str, Any]) -> str:
        """Absolute path of an entry's deletion-vector file. A vector
        normally lives under the same root as the data file it covers
        (so shallow-cloned entries resolve through ``base`` like the
        data) — EXCEPT when a clone MoR-deletes from a carried file:
        the data stays under the source root while the new vector
        lands under the clone's, recorded as the vector's own
        ``base``."""
        dv = entry["dv"]
        base = dv.get("base", entry.get("base", self.root))
        return f"{base}/{dv['path']}"

    @staticmethod
    def _entry_live_rows(entry: dict[str, Any]) -> int:
        """Logical (live) row count of a file entry: physical rows
        minus deletion-vector'd positions. Metadata-only."""
        return entry["rows"] - (entry.get("dv") or {}).get("deleted", 0)

    @staticmethod
    def _rel_file_expr() -> F.Column:
        """Manifest-relative path of each scanned row's physical file,
        recovered from ``_metadata.file_path`` — the stable join key
        between scans and deletion vectors (absolute paths differ per
        clone base; ``data/c<uuid>/...`` never collides). The path may
        contain ``pv__<col>=<value>`` partition subdirectories."""
        return F.regexp_extract(
            F.col("_metadata.file_path"), r"(data/c[0-9a-f]{32}/.+)$", 1
        )

    @staticmethod
    def _cmap_key(entry: dict[str, Any]) -> tuple:
        """Hashable signature of an entry's column mapping (logical →
        physical parquet name, recorded by rename_column)."""
        return tuple(sorted((entry.get("cmap") or {}).items()))

    @staticmethod
    def _physical_schema(schema, cm: dict[str, str]):
        """The schema as written inside the files of one cmap group:
        logical field names replaced by their physical parquet names."""
        from pyspark.sql.types import StructField, StructType

        return StructType(
            [
                StructField(cm.get(f.name, f.name), f.dataType, f.nullable)
                for f in schema.fields
            ]
        )

    def _lineage_scan(self, entries: list[dict[str, Any]], schema) -> DataFrame:
        """Scan ``entries`` exposing row lineage: ``__file`` (manifest-
        relative path) and ``__pos`` (``_metadata.row_index`` — the
        row's position within its immutable physical file) ahead of the
        data columns. ``_metadata`` is only resolvable on the scan
        relation, so lineage must be projected HERE, before any join.
        Entries are scanned in per-column-mapping groups (renamed
        columns read under their physical parquet names, aliased back
        to logical) — group count is bounded by rename history, not
        data."""
        if not entries:
            raise ValueError("no entries to scan")
        groups: dict[tuple, list[dict[str, Any]]] = {}
        for e in entries:
            groups.setdefault(self._cmap_key(e), []).append(e)
        parts = []
        for key, grp in sorted(groups.items()):
            cm = dict(key)
            df = self.spark.read.schema(
                self._physical_schema(schema, cm)
            ).parquet(*(self._abs(e) for e in grp))
            parts.append(
                df.select(
                    self._rel_file_expr().alias("__file"),
                    F.col("_metadata.row_index").alias("__pos"),
                    *[
                        F.col(cm.get(n, n)).alias(n)
                        for n in schema.fieldNames()
                    ],
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _dv_positions(self, entries: list[dict[str, Any]]) -> DataFrame:
        """(__file, __pos) union of ``entries``' deletion vectors,
        restricted to exactly those entries' files (a consolidated
        vector file may also carry positions for files still
        referencing an OLDER vector — those must not leak in)."""
        paths = sorted({self._dv_abs(e) for e in entries if e.get("dv")})
        if not paths:
            return empty_df(self.spark, _DV_SCHEMA)
        rels = [e["path"] for e in entries if e.get("dv")]
        return (
            self.spark.read.schema(_DV_SCHEMA)
            .parquet(*paths)
            .where(F.col("__file").isin(rels))
        )

    def _apply_dv(self, lineage: DataFrame, entries: list[dict[str, Any]]) -> DataFrame:
        """Filter a lineage scan down to LIVE rows by anti-joining the
        entries' deletion vectors on (file, position). The vector side
        is bounded by deleted-row count — broadcast when small."""
        dv_entries = [e for e in entries if e.get("dv")]
        if not dv_entries:
            return lineage
        dels = self._dv_positions(dv_entries)
        if sum(e["dv"]["deleted"] for e in dv_entries) <= _DV_BROADCAST_ROWS:
            dels = F.broadcast(dels)
        return lineage.join(dels, ["__file", "__pos"], "left_anti")

    def _scan_entries(self, entries: list[dict[str, Any]], schema) -> DataFrame:
        """Content scan of ``entries`` honoring deletion vectors.
        Entries without a vector keep the plain one-relation scan (so
        ``_metadata`` stays resolvable for callers on the fast path);
        DV'd entries route through the lineage anti-join."""
        plain = [e for e in entries if not e.get("dv")]
        dved = [e for e in entries if e.get("dv")]
        parts = []
        groups: dict[tuple, list[dict[str, Any]]] = {}
        for e in plain:
            groups.setdefault(self._cmap_key(e), []).append(e)
        for key, grp in sorted(groups.items()):
            cm = dict(key)
            df = self.spark.read.schema(
                self._physical_schema(schema, cm)
            ).parquet(*(self._abs(e) for e in grp))
            if cm:
                df = df.select(
                    *[F.col(cm.get(n, n)).alias(n) for n in schema.fieldNames()]
                )
            parts.append(df)
        if dved:
            parts.append(
                self._apply_dv(self._lineage_scan(dved, schema), dved).select(
                    *schema.fieldNames()
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        version: int | None = None,
        as_of_timestamp: float | None = None,
    ) -> DataFrame:
        """Snapshot read (time travel when ``version`` — VERSION AS OF —
        or ``as_of_timestamp`` — TIMESTAMP AS OF, epoch seconds — is
        given): scans exactly the manifest's file list — no directory
        listing."""
        if version is not None and as_of_timestamp is not None:
            raise ValueError("pass version or as_of_timestamp, not both")
        if as_of_timestamp is not None:
            version = self.version_as_of_timestamp(as_of_timestamp)
        m = self.manifest(version)
        if not m["files"]:
            raise VersionNotFoundError(f"version {m['version']} is empty")
        return self._scan_entries(m["files"], self._schema_of(m))

    def read_changes(self, since_version: int, version: int | None = None) -> DataFrame:
        """Rows added after ``since_version`` (exclusive) up to
        ``version`` (default latest) — the change-data-feed primitive
        that lets a downstream job process O(delta), not O(table).

        Planned PER COMMIT: each append in the range contributes the
        files it added versus its parent (a manifest-sized diff per
        commit, then one scan of only those files), so an OPTIMIZE in
        the range contributes NOTHING — its rewritten files carry rows
        the caller already processed, which the old base→target diff
        would have re-delivered (it refused instead; Delta parity:
        routine maintenance must not break incremental consumers).
        Still raises on a content mutation — an overwrite/rollback has
        no row-level delta, and a CoW delete rewrites surviving rows
        into NEW files (streaming those as additions would
        double-count them); the caller must reprocess the snapshot.

        Column-mapping commits (rename/re-add) in the range are fine:
        they are metadata-only (zero row delta), and the feed is
        served in the TARGET version's logical schema — each step's
        entries are forward-aligned through the remap commits after it
        (``_remap_ops``/``_remap_entries``), so a pre-rename file
        reads its values under the post-rename name."""
        target = self.manifest(version)
        tv = target["version"]
        self.manifest(since_version)  # validates the base is live
        ops = self._remap_ops(since_version, tv)
        new: list[dict[str, Any]] = []
        for v in range(since_version + 1, tv + 1):
            m = self._read_manifest_file(v)
            prev = self._read_manifest_file(v - 1)
            if _same_file_refs(prev["files"], m["files"]):
                # metadata-only commit (constraint add/drop, column
                # add/drop/widen/rename/re-add, no-op compaction):
                # identical file list and vector refs ⇒ provably zero
                # row delta — skip it
                continue
            if m["action"] == "optimize":
                continue  # layout-only rewrite: rows already served
            if m["action"] != "append":
                raise ValueError(
                    f"version {v} is '{m['action']}': no incremental row delta "
                    "across content mutation — reprocess from the snapshot"
                )
            prev_paths = {self._abs(f) for f in prev["files"]}
            step_ops = [op for r, op in ops if r > v]
            new += self._remap_entries(
                [f for f in m["files"] if self._abs(f) not in prev_paths],
                step_ops,
            )
        if not new:
            return self.read(tv).filter(F.lit(False))
        # entry-aware scan (not a bare spark.read.parquet): the
        # aligned entries carry the column mappings of any rename/
        # re-add the range crossed, and appends never carry deletion
        # vectors
        return self._scan_entries(new, self._schema_of(target))

    def count_rows(self, version: int | None = None) -> int:
        """Metadata-only row count: the sum of per-file row counts the
        commit protocol already records in the manifest (the Iceberg
        snapshot-summary shortcut). O(manifest), zero data I/O — at
        100 TB the difference between a dashboard refresh and a full
        scan. Exactness holds because files are immutable and every
        commit path records counts from the written data (deletion-
        vector'd positions are subtracted from their entry's count)."""
        return sum(self._entry_live_rows(f) for f in self.manifest(version)["files"])

    def column_stats(
        self, col: str, version: int | None = None
    ) -> dict[str, Any]:
        """Metadata-only ``{rows, null_count, min, max}`` for one
        column — the Iceberg snapshot-summary shortcut for
        ``SELECT count(*), count(col), min(col), max(col)``. O(manifest),
        zero data I/O. Raises when the answer is not provable from the
        manifest: any entry carries a deletion vector (the removed rows
        could be the extremes or the nulls), predates null-count stats,
        or has non-null rows but no min/max stats (unorderable type).
        min/max compare as stored (_json_safe values: dates/timestamps
        as ISO strings, which order correctly within one column)."""
        m = self.manifest(version)
        if col not in self._schema_of(m).fieldNames():
            raise ValueError(f"no column '{col}' on {self.root}")
        rows = null_count = 0
        mn = mx = None
        for f in m["files"]:
            if f.get("dv"):
                raise ValueError(
                    f"column_stats('{col}') not derivable: deletion-"
                    "vectored entries present — aggregate with a scan"
                )
            nd = f.get("nulls")
            if nd is None:
                raise ValueError(
                    f"column_stats('{col}') not derivable: pre-null-"
                    "stats entries present — rewrite (optimize) first"
                )
            phys = (f.get("cmap") or {}).get(col, col)
            if phys in (f.get("stats_trunc") or []):
                raise ValueError(
                    f"column_stats('{col}') not derivable: recorded "
                    "min/max are TRUNCATED BOUNDS (long strings), not "
                    "exact extremes — aggregate with a scan"
                )
            rows += f["rows"]
            if phys not in nd:  # physically absent ⇒ all rows NULL
                null_count += f["rows"]
                continue
            null_count += nd[phys]
            if nd[phys] == f["rows"]:
                continue  # no non-null values to bound
            s = (f.get("stats") or {}).get(phys)
            if s is None or s[0] is None:
                raise ValueError(
                    f"column_stats('{col}') not derivable: no min/max "
                    "stats (unorderable column type?)"
                )
            mn = s[0] if mn is None else min(mn, s[0])
            mx = s[1] if mx is None else max(mx, s[1])
        return {"rows": rows, "null_count": null_count, "min": mn, "max": mx}

    def _remap_ops(
        self, since_version: int, upto: int
    ) -> list[tuple[int, tuple]]:
        """Column-remap commits in ``(since_version, upto]`` as
        ``(version, ("rename", old, new) | ("readd", name, ghost))``,
        recovered from each commit's schema diff (rename: the one
        position whose name changed; re-add: the appended field) — no
        extra manifest metadata needed, so pre-existing tables serve
        too. The re-add ghost is the fresh physical name the commit
        stamped on its entries (any never-written name works for
        NULL-backfill; a synthesized one covers an empty-table re-add).

        Chained remaps (A→B→C, rename-then-re-add of one name) are
        fine: applying the ops in ASCENDING version order replays
        exactly the per-entry stamps the commits themselves made, so
        forward composition is well-defined — the streaming reader
        resolves directions the same way, from version order against
        its pin (sources/pyds.py _pin_directions)."""
        ops: list[tuple[int, tuple]] = []
        for v in range(since_version + 1, upto + 1):
            m = self._read_manifest_file(v)
            if m["action"] not in ("rename_column", "readd_column"):
                continue
            prev = self._read_manifest_file(v - 1)
            pf = self._schema_of(prev).fields
            cf = self._schema_of(m).fields
            if m["action"] == "rename_column":
                old, new = next(
                    (p.name, c.name)
                    for p, c in zip(pf, cf)
                    if p.name != c.name
                )
                ops.append((v, ("rename", old, new)))
            else:
                name = cf[-1].name
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

    @staticmethod
    def _remap_entries(
        entries: list[dict[str, Any]], ops: list[tuple]
    ) -> list[dict[str, Any]]:
        """Forward-align file entries onto the logical frame PAST the
        given remap ops — the exact per-entry transformation the
        rename/re-add commits themselves stamp (rename: follow the
        chain, logical new → the entry's physical name; re-add: map
        the name to the commit's ghost so pre-re-add values stay
        dead). Entries from manifests at or after an op's version
        already carry its stamp and are never passed that op."""
        if not ops:
            return entries
        out = []
        for e in entries:
            cm = dict(e.get("cmap") or {})
            for op in ops:
                if op[0] == "rename":
                    _, old, new = op
                    phys = cm.pop(old, old)
                    if phys != new:
                        cm[new] = phys
                else:
                    cm[op[1]] = op[2]
            e2 = {k: x for k, x in e.items() if k != "cmap"}
            if cm:
                e2["cmap"] = cm
            out.append(e2)
        return out

    def read_changes_rows(
        self, since_version: int, version: int | None = None
    ) -> DataFrame:
        """ROW-level change-data-feed: every row inserted or deleted in
        (since_version, version], tagged with ``_change_type``
        ('insert' | 'delete'), ``_commit_version``, and
        ``_commit_timestamp`` (the commit's recorded wall clock — the
        Delta CDF meta-column triple).

        Unlike ``read_changes`` (file-level, append-only), this
        survives CoW ``delete``/``replace`` commits by reconstructing
        the row delta from the commit's file diff: rows of the DROPPED
        files minus rows of the ADDED files are the deletes, and vice
        versa for inserts (Delta's CDF-without-row-tracking fallback).
        The exceptAll diff shuffles only the REWRITTEN file set — the
        CoW hit files — never the whole table, so the cost scales with
        the change, not the snapshot. OPTIMIZE commits in the range
        emit ZERO change rows without any comparison: a layout rewrite
        provably never changes the live row set (Delta parity — a
        consumer's range crossing routine maintenance must not break).

        ROLLBACK/RESTORE commits in the range SERVE (Delta parity:
        RESTORE flows through readChangeFeed as the row delta between
        the pre-restore state and the restored version): the same
        per-commit file diff applies — rows of files the rollback
        dropped are deletes, rows of files it restored are inserts,
        exceptAll-cancelled so only the net delta emits — plus the one
        rollback-only shape, a deletion vector SHRINKING in place
        (the restored entry references an older, smaller vector):
        positions present in the parent's vector but absent from the
        restored one are resurrected rows and emit as inserts. The
        diff cost scales with the files the rollback actually touched
        (the changed-since-V set), never the snapshot. A
        SCHEMA-REVERTING rollback (one that undoes a rename/re-add/
        evolution) still raises — its feed has no single logical
        frame. Whole-table ``overwrite`` still raises: unlike a
        rollback it names no prior version, so there is no bounded
        changed-file set — reprocess from the snapshot.

        Ranges crossing a RENAME or RE-ADD commit serve in the TARGET
        version's logical schema: those commits are metadata-only
        (zero row delta), and each earlier step's entries are
        forward-aligned through the same per-entry column-mapping
        transformation the commits themselves stamp (``_remap_ops`` /
        ``_remap_entries``) — a pre-rename step's rows emit their
        values under the post-rename name, and pre-re-add values emit
        NULL under the re-added name (they are dead in the target
        frame, exactly as a target-version snapshot reads them).
        Replay-onto-base equality therefore holds with the base
        snapshot read in the target frame."""
        target = self.manifest(version)
        tv = target["version"]
        self.manifest(since_version)  # validates the base is live
        ops = self._remap_ops(since_version, tv)
        out: DataFrame | None = None
        for v in range(since_version + 1, tv + 1):
            m = self._read_manifest_file(v)
            prev = self._read_manifest_file(v - 1)
            if _same_file_refs(prev["files"], m["files"]):
                # metadata-only commit (constraint add/drop, column
                # drop, no-op compaction): identical file list and
                # vector refs ⇒ provably zero row delta — skip it
                # whatever its action says
                continue
            if m["action"] == "optimize":
                # layout-only rewrite (bin-packing / clustering / DV
                # folding): the live row set is unchanged by
                # construction — provably zero change rows, no
                # comparison needed
                continue
            if m["action"] not in ("append", "delete", "replace", "rollback"):
                raise ValueError(
                    f"version {v} is '{m['action']}': whole-table rewrite "
                    "has no row-level delta — reprocess from the snapshot"
                )
            if m["action"] == "rollback" and m["schema"] != prev["schema"]:
                raise ValueError(
                    f"version {v} is a SCHEMA-REVERTING rollback — the "
                    "range has no single logical frame; reprocess from "
                    "the snapshot"
                )
            prev_by = {self._abs(f): f for f in prev["files"]}
            cur_by = {self._abs(f): f for f in m["files"]}
            # Every step scans with the TARGET version's schema, not its
            # own commit's: evolution is additive-only, so the target
            # schema is a superset of every step's, and pre-evolution
            # files backfill NULL for later-added columns (the
            # documented NULL-backfill semantics). This keeps the
            # per-step exceptAll in one consistent column space AND
            # makes the cross-step union well-typed when the requested
            # range spans a merge_schema commit — per-step schemas would
            # make the final unionByName raise on the missing columns.
            schema = self._schema_of(target)
            # forward-align this step's entries through every remap
            # commit AFTER it (entries at or past an op already carry
            # its stamp), so the scan below reads them in the target
            # version's logical frame
            step_ops = [op for r, op in ops if r > v]
            added = self._remap_entries(
                [cur_by[p] for p in sorted(set(cur_by) - set(prev_by))],
                step_ops,
            )
            dropped = self._remap_entries(
                [prev_by[p] for p in sorted(set(prev_by) - set(cur_by))],
                step_ops,
            )
            # A merge-on-read delete changes no file list — the delta
            # lives in the deletion-vector references: rows at positions
            # newly present in a file's vector are that commit's deletes.
            # Positions only ever ACCUMULATE in a live entry's vector —
            # the one writer that restores an older (smaller) reference
            # is rollback, whose removed positions are resurrected rows
            # and emit as INSERTS below. Scans of added/dropped files
            # are entry-aware too, so rows a vector already killed
            # can't churn the diff.
            dv_changed = [
                (prev_by[p], cur_by[p])
                for p in sorted(set(cur_by) & set(prev_by))
                if (prev_by[p].get("dv") or {}).get("path")
                != (cur_by[p].get("dv") or {}).get("path")
            ]
            step = None
            if added:
                ins = self._scan_entries(added, schema)
                ins = (
                    ins
                    if not dropped
                    else ins.exceptAll(self._scan_entries(dropped, schema))
                )
                step = ins.withColumn("_change_type", F.lit("insert"))
            if dropped:
                dels = self._scan_entries(dropped, schema)
                dels = (
                    dels
                    if not added
                    else dels.exceptAll(self._scan_entries(added, schema))
                )
                dels = dels.withColumn("_change_type", F.lit("delete"))
                step = dels if step is None else step.unionByName(dels)
            if dv_changed:
                old_e = [o for o, _ in dv_changed]
                new_e = self._remap_entries(
                    [n for _, n in dv_changed], step_ops
                )
                new_pos = self._dv_positions(new_e)
                old_pos = self._dv_positions(old_e)
                # one file's vectors along the version line are NESTED
                # (positions accumulate; rollback restores an earlier,
                # smaller set), so per entry exactly one direction is
                # non-empty and these metadata counts are exact
                diffs = [
                    (
                        "delete",
                        new_pos.join(old_pos, ["__file", "__pos"], "left_anti"),
                        sum(
                            max(
                                0,
                                (n.get("dv") or {}).get("deleted", 0)
                                - (o.get("dv") or {}).get("deleted", 0),
                            )
                            for o, n in dv_changed
                        ),
                    )
                ]
                if m["action"] == "rollback":
                    # vector SHRINK: positions the rollback removed are
                    # resurrected rows — live again in the restored
                    # version, so they emit as inserts
                    diffs.append(
                        (
                            "insert",
                            old_pos.join(
                                new_pos, ["__file", "__pos"], "left_anti"
                            ),
                            sum(
                                max(
                                    0,
                                    (o.get("dv") or {}).get("deleted", 0)
                                    - (n.get("dv") or {}).get("deleted", 0),
                                )
                                for o, n in dv_changed
                            ),
                        )
                    )
                for ctype, pos, n_est in diffs:
                    if n_est <= _DV_BROADCAST_ROWS:
                        pos = F.broadcast(pos)
                    dv_rows = (
                        self._lineage_scan(new_e, schema)
                        .join(pos, ["__file", "__pos"], "left_semi")
                        .select(*schema.fieldNames())
                        .withColumn("_change_type", F.lit(ctype))
                    )
                    step = (
                        dv_rows if step is None else step.unionByName(dv_rows)
                    )
            if step is not None:
                step = step.withColumn("_commit_version", F.lit(v))
                # Delta CDF's third meta column: the commit's recorded
                # wall clock (raw manifest ts, like Delta uses the raw
                # commit-file time; NULL for pre-timestamp commits)
                step = step.withColumn(
                    "_commit_timestamp",
                    F.timestamp_seconds(F.lit(m.get("ts")).cast("double")),
                )
                out = step if out is None else out.unionByName(step)
        if out is None:
            return (
                self.read(tv)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_version", F.lit(tv))
                .withColumn(
                    "_commit_timestamp",
                    F.lit(None).cast("timestamp"),
                )
                .filter(F.lit(False))
            )
        return out

    def read_pruned(
        self, col: str, lo: Any, hi: Any, version: int | None = None
    ) -> DataFrame:
        """Snapshot read that skips files whose manifest [min,max] for
        ``col`` cannot intersect [lo, hi] — Delta/Iceberg data skipping
        from the manifest stats, before any footer is opened. The exact
        filter is still applied (over-selection only)."""
        m = self.manifest(version)
        hits = []
        for f in m["files"]:
            # stats are keyed by the names the file was WRITTEN with —
            # the entry's physical name for a since-renamed column
            phys = (f.get("cmap") or {}).get(col, col)
            mn, mx = f["stats"].get(phys, [None, None])
            try:
                keep = mn is None or mx is None or (mx >= lo and mn <= hi)
            except TypeError:
                # _json_safe stringifies date/timestamp stats; comparing
                # them against date/datetime bounds is a type error —
                # conservatively keep the file (over-selection only),
                # mirroring pyds._may_match.
                keep = True
            if keep:
                hits.append(f)
        if not hits:
            return self.read(version).filter(F.lit(False))
        return self._scan_entries(hits, self._schema_of(m)).filter(
            (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        )

    def read_null_pruned(
        self, col: str, is_null: bool = True, version: int | None = None
    ) -> DataFrame:
        """Snapshot read for ``col IS [NOT] NULL`` that skips files
        whose manifest null counts prove no row can match: zero nulls
        for an IS NULL probe, all-null (or the column physically absent
        — added later via evolution, so every row backfills NULL) for
        IS NOT NULL. Skips stay safe under deletion vectors — a DV only
        removes rows, so 'no written row matches' still implies 'no
        live row matches'. Files committed before null-count stats are
        kept conservatively; the exact filter is always applied."""
        m = self.manifest(version)
        hits = []
        for f in m["files"]:
            phys = (f.get("cmap") or {}).get(col, col)
            nd = f.get("nulls")
            if nd is None:
                keep = True  # pre-null-stats commit: can't prove anything
            elif phys not in nd:
                keep = is_null  # physically absent ⇒ reads back all-NULL
            else:
                keep = (nd[phys] > 0) if is_null else (nd[phys] < f["rows"])
            if keep:
                hits.append(f)
        if not hits:
            return self.read(version).filter(F.lit(False))
        pred = F.col(col).isNull() if is_null else F.col(col).isNotNull()
        return self._scan_entries(hits, self._schema_of(m)).filter(pred)

    def read_point_lookup(
        self, value: Any, version: int | None = None
    ) -> DataFrame:
        """Point lookup ``bloom_col = value`` that opens only files
        whose per-file bloom filter might contain the key (plus files
        committed without a bloom, conservatively). Over-selection
        only — the exact equality filter is still applied. The bloom
        geometry comes from the handle's config or, for a config-less
        handle, the manifest's ``bloom_index`` table property."""
        bcfg = self.effective_bloom()
        if bcfg is None:
            raise ValueError(
                "table has no bloom index (neither this handle's "
                "bloom_col nor a bloom_index table property)"
            )
        col, bits, k = bcfg
        m = self.manifest(version)
        hits = []
        for f in m["files"]:
            bloom = f.get("bloom")
            if bloom is None or self._bloom_might_contain(bloom, value, bits, k):
                hits.append(f)
        if not hits:
            return self.read(version).filter(F.lit(False))
        return self._scan_entries(hits, self._schema_of(m)).filter(
            F.col(col) == F.lit(value)
        )

    def files(self, version: int | None = None) -> DataFrame:
        """Iceberg-style ``files`` metadata table for one snapshot:
        (path, base, rows, bytes, stats-as-JSON, stats_trunc,
        has_bloom, dv_deleted) — the manifest as a queryable DataFrame,
        so operators can reason about layout (file sizes, stat
        tightness, bloom coverage, deletion-vector load) with plain
        SQL. ``bytes`` is NULL for entries committed before per-file
        byte recording; ``stats_trunc`` lists the columns whose
        min/max are truncated bounds, not exact extremes.
        Manifest-sized, never data-sized."""
        m = self.manifest(version)
        rows = [
            (
                f["path"],
                f.get("base", self.root),
                f["rows"],
                f.get("bytes"),  # NULL for pre-r10 entries
                json.dumps(f.get("stats", {}), sort_keys=True),
                list(f.get("stats_trunc") or []),
                "bloom" in f,
                (f.get("dv") or {}).get("deleted", 0),
            )
            for f in m["files"]
        ]
        return local_df(
            self.spark,
            rows,
            "path string, base string, rows bigint, bytes bigint, "
            "stats string, stats_trunc array<string>, "
            "has_bloom boolean, dv_deleted bigint",
        )

    def history(self) -> DataFrame:
        """One row per live version: (version, parent, action, n_files,
        n_rows, commit_ts) plus Delta-operationMetrics-style per-commit
        deltas derived from the parent's manifest — files added/removed
        and rows newly deletion-vectored by THIS commit. ``commit_ts``
        is the writer's recorded wall clock (epoch seconds; NULL for
        versions committed before timestamps were recorded). Metrics
        are computed read-side from consecutive manifests (manifest-
        sized, zero data I/O), so no write path pays for them and
        pre-existing logs get them retroactively; a version whose
        parent manifest is gone (vacuum) reports NULL deltas."""
        rows = []
        for v in self.versions_live():
            m = self._read_manifest_file(v)
            try:
                pm = (
                    self._read_manifest_file(m["parent"])
                    if m["parent"] is not None
                    else None
                )
            except VersionNotFoundError:
                pm = False  # parent vacuumed: deltas unknowable
            if pm is False:
                added = removed = dv_new = None
            else:
                prev = {f["path"]: f for f in pm["files"]} if pm else {}
                cur = {f["path"]: f for f in m["files"]}
                added = sum(1 for p in cur if p not in prev)
                removed = sum(1 for p in prev if p not in cur)
                dv_new = sum(
                    (f.get("dv") or {}).get("deleted", 0)
                    - (prev.get(p, {}).get("dv") or {}).get("deleted", 0)
                    for p, f in cur.items()
                )
            rows.append(
                (
                    m["version"],
                    m["parent"],
                    m["action"],
                    len(m["files"]),
                    sum(self._entry_live_rows(f) for f in m["files"]),
                    m.get("ts"),
                    added,
                    removed,
                    dv_new,
                )
            )
        return local_df(
            self.spark,
            rows,
            "version bigint, parent bigint, action string, n_files bigint, "
            "n_rows bigint, commit_ts double, n_added_files bigint, "
            "n_removed_files bigint, n_dv_new_deleted bigint",
        )

    def version_as_of_timestamp(self, ts: float) -> int:
        """Latest live version whose ADJUSTED commit time is <= ``ts``
        (epoch seconds) — Delta's TIMESTAMP AS OF semantics.

        Commit times come from each manifest's recorded wall clock
        (falling back to the manifest file's mtime for tables written
        before timestamps were recorded) and are adjusted to be
        strictly increasing across versions at resolution time: with
        multiple writers on skewed clocks a later version can carry an
        earlier raw timestamp, and un-adjusted resolution would make
        time travel non-monotonic (asking for a LATER instant could
        return an EARLIER version).  Raises when ``ts`` predates the
        first live commit."""
        winner = None
        for v, t in self._adjusted_live_times():
            if t <= ts:
                winner = v
        if winner is None:
            raise VersionNotFoundError(
                f"no live version of {self.root} at or before epoch "
                f"timestamp {ts}"
            )
        return winner

    # -- maintenance ---------------------------------------------------
