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
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finalpipeline_spark.operators.compaction import _fs_and_path

_LOG_DIR = "_log"
_DATA_DIR = "data"
_DV_DIR = "_dv"
_MANIFEST_FMT = "v%012d.json"
# Log anchor (Delta _last_checkpoint shape): "checkpoint-V" asserts
# versions 0..V are all committed — sound because the CAS commit
# protocol keeps the log CONTIGUOUS (every commit claims parent+1), so
# a committed V implies committed ancestors. Anchored manifests can be
# ARCHIVED into _log/archive/ (vacuum does), keeping the hot _log
# listing O(recent commits) instead of O(all commits ever); archived
# manifests stay readable by direct name probe (zero listing).
_ANCHOR_FMT = "checkpoint-%012d.json"
_ARCHIVE_DIR = "archive"

# A deletion-vector side is broadcast to the anti-join below this many
# deleted rows (≈ tens of MB of (path, pos) pairs); beyond it, let the
# join planner shuffle — a table carrying more DV'd rows than this
# should be OPTIMIZE'd anyway.
_DV_BROADCAST_ROWS = 5_000_000

# (file, position) lineage schema shared by every deletion-vector file
_DV_SCHEMA = "__file string, __pos bigint"


_NO_CAS = object()  # commit_overwrite's "no compare-and-swap" sentinel

# Writer self-verification budget: after writing its manifest a writer
# polls its slot for its OWN bytes this long before declaring the
# commit stolen (raising ConcurrentCommitError and retrying).  The
# margin pads clock/scheduling skew wherever recovery reasons about a
# quarantined commit's writer still being inside this poll.
_VERIFY_POLL_SECONDS = 1.0
_VERIFY_MARGIN_SECONDS = 0.5


def _is_file_not_found(exc: Exception) -> bool:
    """True when a py4j-wrapped Java exception is (or is caused by)
    java.io.FileNotFoundException — the definitive vanished-mid-read
    signal the commit protocol's TOCTOU handling keys on."""
    je = getattr(exc, "java_exception", None)
    for _ in range(8):  # bounded cause-chain walk
        if je is None:
            return False
        try:
            if je.getClass().getName() == "java.io.FileNotFoundException":
                return True
            je = je.getCause()
        except Exception:
            return False
    return False


class ConcurrentCommitError(RuntimeError):
    """Another writer claimed this version first; re-read and retry."""


class SchemaMismatchError(ValueError):
    """Append schema differs from the table schema (pass
    ``merge_schema=True`` for additive evolution)."""


class ConstraintViolationError(ValueError):
    """Written rows violate a table CHECK constraint."""


class VersionNotFoundError(LookupError):
    """Requested version does not exist (never written, or vacuumed)."""


class ProtocolVersionError(RuntimeError):
    """The manifest requires a newer reader/writer than this code —
    refuse loudly instead of silently misreading a feature this
    version does not understand (Delta's protocol-action contract,
    applied per manifest: older readers keep working on pre-feature
    versions of the same table)."""


# The feature-gate protocol (mirrored in sources/pyds.py — keep both in
# sync): a manifest that uses a capability older readers would
# MISREAD (not merely ignore) carries ``reader: N``; one that older
# WRITERS would corrupt (e.g. by not enforcing its invariants on new
# commits) carries ``writer: N``. Absent fields mean 1. Readers refuse
# any manifest above SUPPORTED_READER_VERSION wherever they parse it;
# _commit refuses to extend a table whose parent demands a newer
# writer. readd_column is reader-2: a pre-cmap-era change-feed consumer
# would silently serve new-era values under the old-era column name.
SUPPORTED_READER_VERSION = 2
SUPPORTED_WRITER_VERSION = 1
_READER_REQUIREMENTS = {"readd_column": 2}


@dataclass(frozen=True)
class CommitInfo:
    version: int
    action: str
    n_files: int
    n_rows: int


def _same_file_refs(a: list[dict], b: list[dict]) -> bool:
    """True when two manifests reference the same data: same (path,
    vector) pairs — the definition of a metadata-only commit."""
    key = lambda f: (f["path"], (f.get("dv") or {}).get("path"))  # noqa: E731
    return sorted(map(key, a)) == sorted(map(key, b))


def cdf_final_state(ch: DataFrame, keys: list[str]) -> DataFrame:
    """Per-key FINAL state of a row-level change feed: highest commit
    version wins; within a commit an insert outranks the delete of the
    same key (a CoW survivor emits both — its content survives); any
    remaining tie (a non-key-unique producer emitting two different
    insert rows for one key in the same commit) is broken
    DETERMINISTICALLY by ordering on every orderable value column, so
    replication picks the same winner on every run/replay instead of a
    partition-order-dependent one. Returns the winning rows with a
    ``__delete`` flag and the feed's meta columns dropped."""
    value_cols = [
        c
        for c, t in ch.dtypes
        if c not in keys
        and c not in ("_change_type", "_commit_version", "_commit_timestamp")
        # maps are not orderable in Spark, at ANY nesting depth — an
        # array<map<...>> or a struct with a map field is just as
        # unorderable as a top-level map, so match anywhere in the type
        and "map<" not in t
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.desc("_commit_version"),
        F.desc(F.col("_change_type") == F.lit("insert")),
        *[F.desc_nulls_last(c) for c in value_cols],
    )
    return (
        ch.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .withColumn("__delete", F.col("_change_type") == F.lit("delete"))
        .drop("__rn", "_change_type", "_commit_version", "_commit_timestamp")
    )


def _stat_cols(df: DataFrame) -> list[str]:
    """Columns worth min/max stats: atomic orderable types only."""
    keep = {"int", "bigint", "smallint", "tinyint", "float", "double",
            "string", "date", "timestamp", "boolean"}
    return [c for c, t in df.dtypes if t in keep]


class VersionedTable:
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
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.bloom_col = bloom_col
        self.bloom_bits = bloom_bits
        self.bloom_k = bloom_k
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
        fs, _, self._jvm = _fs_and_path(spark, self.root)
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
    def _p(self, *parts: str):
        P = self._jvm.org.apache.hadoop.fs.Path
        return P("/".join((self.root,) + parts))

    def _manifest_path(self, version: int):
        return self._p(_LOG_DIR, _MANIFEST_FMT % version)

    def _archive_path(self, version: int):
        return self._p(_LOG_DIR, _ARCHIVE_DIR, _MANIFEST_FMT % version)

    def _latest_anchor(self) -> int | None:
        """Highest anchored version, from anchor file NAMES alone —
        the name is written only after that version's commit was
        verified, so a half-written anchor still asserts the truth."""
        log = self._p(_LOG_DIR)
        if not self._fs.exists(log):
            return None
        best = None
        for st in self._fs.listStatus(log):
            name = st.getPath().getName()
            if name.startswith("checkpoint-") and name.endswith(".json"):
                try:
                    v = int(name[len("checkpoint-"):-5])
                except ValueError:
                    continue  # stray junk name, not an anchor
                best = v if best is None else max(best, v)
        return best

    def write_anchor(self, version: int | None = None) -> int | None:
        """Drop a log anchor at ``version`` (default: current latest).
        Purely advisory metadata — no reader NEEDS it; it bounds the
        per-query log listing and licenses vacuum's manifest archival.
        Create-no-overwrite; a racing identical anchor is benign."""
        if version is None:
            version = self.latest_version()
        if version is None:
            return None
        # An anchor asserts 0..version committed, and every listing now
        # TRUSTS that assertion (contiguity): an anchor above the true
        # head would make versions() report phantom versions forever and
        # the next commit claim a slot past a permanent gap. Refuse any
        # version without a committed manifest (expired tombstones still
        # prove committedness; archived manifests resolve by name probe).
        try:
            self._read_manifest_file(version)
        except (VersionNotFoundError, json.JSONDecodeError) as exc:
            raise ValueError(
                f"cannot anchor {self.root} at version {version}: no "
                "committed manifest proves it (anchors assert 0..V "
                "committed)"
            ) from exc
        path = self._p(_LOG_DIR, _ANCHOR_FMT % version)
        try:
            out = self._fs.create(path, False)
            try:
                out.write(bytearray(json.dumps({"version": version}).encode()))
            finally:
                out.close()
        except Exception:
            return None  # already exists / racing writer: both fine
        return version

    def _schema_of(self, m: dict[str, Any]):
        """Manifest schema string → StructType. Imposing this on every
        multi-file read gives a stable column set across schema
        evolution: files written before a column was added simply
        backfill NULL for it (standard parquet read-with-schema
        semantics), and column order never depends on which file the
        reader happened to open first."""
        from pyspark.sql.types import _parse_datatype_string

        return _parse_datatype_string(m["schema"])

    # -- log access --------------------------------------------------
    def versions(self) -> list[int]:
        """Committed versions, ascending. Unparseable tail manifests
        (crash mid-write) are ignored — an aborted commit is invisible.

        Anchor-accelerated: versions up to the latest log anchor are
        counted WITHOUT opening their manifests (contiguity makes the
        anchor a proof of committedness), so the per-call cost is
        O(commits since the last anchor), not O(all commits ever) —
        and stays bounded once vacuum archives anchored manifests."""
        log = self._p(_LOG_DIR)
        if not self._fs.exists(log):
            return []
        anchor = -1
        names = []
        for st in self._fs.listStatus(log):
            name = st.getPath().getName()
            if name.startswith("checkpoint-") and name.endswith(".json"):
                try:
                    anchor = max(anchor, int(name[len("checkpoint-"):-5]))
                except ValueError:
                    continue  # stray junk name, not an anchor
            elif name.startswith("v") and name.endswith(".json"):
                names.append(name)
        # Contiguity (every commit claims parent+1 from 0) reduces the
        # question to "what is the LATEST committed version": any
        # committed version proves all its ancestors. That also makes
        # the answer robust to NON-ATOMIC listings — a racing vacuum
        # renames manifests into the archive while swapping anchor
        # files, so one readdir can miss both the new anchor and an
        # archived version (observed: latest_version() under-reported
        # by one in the writers-vs-vacuum soak); a gap in the listing
        # never means a gap in the log.
        latest = anchor
        for name in names:
            try:
                v = int(name[1:-5])
                if v <= latest:
                    continue  # implied by a later version / the anchor
                self._read_manifest_file(v)
            except (ValueError, json.JSONDecodeError):
                continue  # an aborted fragment is invisible
            except VersionNotFoundError:
                # vanished between listStatus and the read: an aborted
                # fragment being quarantined by a racing recovery (the
                # read itself already probes the archive)
                continue
            latest = v
        # forward probe past the listed max — heals a racing archival
        # of the newest manifest; normally one O(1) miss
        v = latest + 1
        while True:
            try:
                self._read_manifest_file(v)
            except (VersionNotFoundError, json.JSONDecodeError):
                break  # no manifest / a mid-write fragment: not committed
            latest = v
            v += 1
        return list(range(latest + 1))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _read_manifest_file(self, version: int) -> dict[str, Any]:
        # hot slot first, then the archive (vacuum moves anchored
        # manifests there — direct name probe, zero listing); a reader
        # racing the archival rename sees the hot miss and finds the
        # archive copy on the very next probe
        for path in (self._manifest_path(version), self._archive_path(version)):
            if not self._fs.exists(path):
                continue
            try:
                raw = self._read_raw(path)
            except Exception as exc:
                # exists→open is a TOCTOU window: a racing writer's
                # recovery can quarantine an aborted fragment between
                # the probe and the open, and Hadoop surfaces that as a
                # raw Java FileNotFoundException (py4j-wrapped) that no
                # caller's VersionNotFoundError handling would see.
                # FNF at open time means the path did not exist at that
                # instant — fall through to the next location (a racing
                # archival) or the final VersionNotFoundError (an
                # aborted fragment being quarantined; committed
                # manifests are never deleted).  The exists() re-probe
                # alone is not enough: a new fragment can be planted at
                # the same slot within the race window, making "still
                # exists" true for a DIFFERENT file.  Non-FNF failures
                # on a still-present path are real I/O errors and must
                # surface.
                if _is_file_not_found(exc) or not self._fs.exists(path):
                    continue
                raise
            m = json.loads(raw.decode("utf-8"))
            if m.get("reader", 1) > SUPPORTED_READER_VERSION:
                raise ProtocolVersionError(
                    f"version {version} of {self.root} requires reader "
                    f"protocol {m['reader']} (this build supports "
                    f"{SUPPORTED_READER_VERSION}) — upgrade before "
                    "reading this version"
                )
            return m
        raise VersionNotFoundError(f"version {version} of {self.root}")

    def _older_than_grace(self, path) -> bool:
        """True if ``path``'s mtime is older than the recovery grace —
        the discriminator between a crashed writer's permanent fragment
        and a live writer's milliseconds-long create→write window."""
        try:
            mtime_ms = self._fs.getFileStatus(path).getModificationTime()
        except Exception:
            return False  # vanished mid-probe: not ours to recover
        return mtime_ms < (time.time() - self.recovery_grace_seconds) * 1000.0

    def _rename_claim(self, src, dst) -> bool:
        """Rename as an exclusive NO-CLOBBER claim: False on ANY
        failure or when ``dst`` already exists.  Hadoop filesystems are
        doubly inconsistent here: LocalFileSystem THROWS
        (FileNotFoundException) when the source vanished — the
        lost-a-race case callers must treat as an ordinary claim
        failure — and its rename CLOBBERS an existing destination
        (POSIX renameTo) where HDFS refuses.  The explicit existence
        precheck gives both platforms the HDFS no-clobber semantics the
        protocol reasons about; the residual check→rename window is the
        same ms-scale race class the writer's read-back verification
        already absorbs (a clobbered writer fails verification and
        retries)."""
        try:
            if self._fs.exists(dst):
                return False
            return bool(self._fs.rename(src, dst))
        except Exception:
            return False

    def _restore_quarantined(self, quarantine, path, version: int) -> None:
        """Resolve a VALID manifest that a recovery claim quarantined.

        Writer self-verification (:meth:`_verify_own_commit`) makes the
        outcome depend on WHEN the quarantined manifest was written
        (its mtime — renames preserve it):

        * **fresh** (now < mtime + poll − margin): its writer is still
          inside the read-back poll and has NOT reported success.
          Restore immediately so that poll sees its own bytes; if the
          slot was re-occupied, steal the occupant only when it is both
          unparseable AND older than the recovery grace (a fresh
          fragment is most likely a live writer mid-write).  If the
          restore still fails, DON'T raise: wait out the writer's poll
          deadline — after it, the writer has certainly raised
          ``ConcurrentCommitError`` and retried from a fresh snapshot,
          so the quarantined copy is an ordinary aborted commit (aged
          junk, vacuum-reclaimed), not a stranded version.  Never
          restore after the deadline: the writer may have already
          given up, and a late restore would resurrect a commit whose
          rows its writer is re-committing (duplicates).

        * **stale** (claim landed a manifest already older than the
          poll window): its writer may have verified and reported
          success long ago, so leaving it quarantined would silently
          lose a committed version — restore or raise loudly.  (This
          branch requires the pre-claim probe — which saw unparseable
          bytes milliseconds earlier — to have been stalled across the
          write; loud is the only safe answer.)

        Residual window, accepted and documented: in the fresh case a
        writer whose first read-back lands in the microseconds between
        the manifest write and our claim has already returned success;
        junking its quarantined copy then loses the commit.  That
        needs the recoverer's probe→claim gap, the writer's
        write→verify gap, and the fragment's grace expiry to all
        coincide within the same few milliseconds."""
        try:
            mtime_s = self._fs.getFileStatus(quarantine).getModificationTime() / 1000.0
        except Exception:
            return  # quarantine vanished: another actor resolved it
        verify_deadline = mtime_s + _VERIFY_POLL_SECONDS
        fresh = time.time() < verify_deadline - _VERIFY_MARGIN_SECONDS
        restored = self._rename_claim(quarantine, path)
        if not restored:
            try:
                json.loads(self._read_raw(path).decode("utf-8"))
                occupant_aborted = False
            except Exception:
                occupant_aborted = self._older_than_grace(path)
            # steal regardless of freshness: occupant_aborted already
            # requires the occupant to be unparseable AND older than the
            # recovery grace, so it is provably junk — in the stale case
            # stealing it is what lets the committed manifest self-heal
            # instead of raising the manual-restore error below
            if occupant_aborted:
                blocker = self._p(
                    _LOG_DIR,
                    (_MANIFEST_FMT % version) + ".aborted-" + uuid.uuid4().hex,
                )
                if self._rename_claim(path, blocker):
                    restored = self._rename_claim(quarantine, path)
        if restored:
            return
        if fresh:
            # wait out the writer's poll so it has definitely raised and
            # retried before anyone could vacuum the quarantined copy
            wait = verify_deadline + _VERIFY_MARGIN_SECONDS - time.time()
            if wait > 0:
                time.sleep(wait)
            return
        # stale case: the committed manifest is preserved at the
        # quarantine path but missing from the log — never proceed
        # silently past that.
        raise RuntimeError(
            f"failed to restore concurrently committed manifest for "
            f"version {version} of {self.root}; it is preserved at "
            f"{quarantine} — restore it manually"
        )

    def _read_raw(self, path) -> bytes:
        stream = self._fs.open(path)
        try:
            ioutils = self._jvm.org.apache.commons.io.IOUtils
            return bytes(ioutils.toByteArray(stream))
        finally:
            stream.close()

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        v = self.latest_version() if version is None else version
        if v is None:
            raise VersionNotFoundError(f"{self.root} has no commits")
        m = self._read_manifest_file(v)
        if m.get("expired"):
            raise VersionNotFoundError(
                f"version {v} of {self.root} was vacuumed; earliest live "
                f"version is {min(self.versions_live())}"
            )
        return m

    def versions_live(self) -> list[int]:
        return [
            v for v in self.versions()
            if not self._read_manifest_file(v).get("expired")
        ]

    # -- commit protocol ---------------------------------------------
    def _write_manifest(self, manifest: dict[str, Any]) -> int:
        """Claim ``manifest['version']`` with an exclusive create.

        If the create loses to an UNPARSEABLE manifest (a crash
        mid-manifest-write), the aborted file is auto-retired (the
        ``recover_log`` rename) and the claim retried once: without
        this, ``versions()`` skips the partial file, every writer
        recomputes the same version number, and the exclusive create
        fails forever — 'retry' could never succeed until a manual
        ``recover_log`` call."""
        version = manifest["version"]
        path = self._manifest_path(version)
        self._fs.mkdirs(self._p(_LOG_DIR))
        try:
            # overwrite=False → atomic claim on HDFS-like stores; the
            # loser of a race gets FileAlreadyExistsException.
            out = self._fs.create(path, False)
        except Exception as exc:  # py4j wraps the Java exception
            try:
                self._read_manifest_file(version)
                aborted = False
            except json.JSONDecodeError:
                # Only a STALE fragment is an aborted commit; a fresh
                # one is most likely a live writer between its create
                # and its content write — hands off, let the caller
                # retry (it will see the completed commit next round).
                aborted = self._older_than_grace(path)
            except VersionNotFoundError:
                aborted = False  # transient FS race: surface as concurrent
            if not aborted:
                raise ConcurrentCommitError(
                    f"version {version} of {self.root} was committed "
                    "concurrently"
                ) from exc
            # Quarantine the aborted fragment under a UNIQUE name: the
            # atomic rename is the exclusive recovery claim (two racing
            # recoverers cannot both win a rename of the same source).
            # NEVER delete ``path`` here — between the probe above and
            # this rename a racing writer may have finished its own
            # recovery and committed a VALID manifest at ``path``;
            # a delete would silently destroy that commit.
            quarantine = self._p(
                _LOG_DIR,
                (_MANIFEST_FMT % version) + ".aborted-" + uuid.uuid4().hex,
            )
            if not self._rename_claim(path, quarantine):
                # The file moved (another writer's recovery won) or is
                # gone: back off and let the caller re-read and retry.
                raise ConcurrentCommitError(
                    f"version {version} of {self.root}: aborted-manifest "
                    "recovery lost a race"
                ) from exc
            # Verify-after-claim: whatever now sits at the quarantine
            # name is exclusively ours. If a racer committed a valid
            # manifest between the probe and our rename, we just
            # quarantined a live commit — restore it and back off.
            try:
                json.loads(self._read_raw(quarantine).decode("utf-8"))
                stole_valid = True
            except (json.JSONDecodeError, UnicodeDecodeError):
                stole_valid = False
            if stole_valid:
                self._restore_quarantined(quarantine, path, version)
                raise ConcurrentCommitError(
                    f"version {version} of {self.root} was committed "
                    "concurrently (recovered mid-flight by another writer)"
                ) from exc
            try:
                out = self._fs.create(path, False)
            except Exception as exc2:
                raise ConcurrentCommitError(
                    f"version {version} of {self.root} was committed "
                    "concurrently (after aborted-manifest recovery)"
                ) from exc2
        payload = json.dumps(manifest).encode("utf-8")
        try:
            out.write(bytearray(payload))
        finally:
            out.close()
        self._verify_own_commit(path, payload, version)
        if (
            self.checkpoint_interval
            and version > 0
            and version % self.checkpoint_interval == 0
        ):
            # best-effort log anchor: this commit just proved 0..version
            # are committed (contiguity), and anchors are advisory
            self.write_anchor(version)
        return version

    def _verify_own_commit(self, path, payload: bytes, version: int) -> None:
        """Writer self-verification — commit success is only reported
        once the writer re-reads its slot and sees its OWN bytes.

        This closes the lease hole no recovery grace can: a writer
        stalled longer than the grace between its exclusive create and
        its content write looks exactly like a crashed writer's
        fragment, so a racing recoverer may quarantine its manifest
        mid-write (the writer keeps writing into the renamed inode).
        Without this check that writer would report success while its
        version slot belongs to someone else — a silently lost commit
        (observed as lost rows by the concurrency soak).  With it, the
        authoritative commit point moves to this verification: a stolen
        writer sees a foreign/missing manifest, raises
        ``ConcurrentCommitError``, and simply retries — it never
        claimed success, so the quarantined copy is an ordinary aborted
        commit.

        Outcomes per re-read:
          * our payload          → committed (a recoverer that briefly
            quarantined us has restored us — its verify-after-claim);
          * a DIFFERENT valid manifest → definitive loss (a committed
            manifest at a slot never changes), raise and retry;
          * missing / unparseable → indeterminate: we may sit in a
            racer's quarantine milliseconds from being restored — poll
            briefly (the racer's read+parse+rename is ms), then treat
            as lost.  Residual window: a recoverer stalled longer than
            the poll budget between its claim and its restore can still
            restore a commit whose writer already gave up — two
            independent multi-second stalls on adjacent metadata ops.
        """
        deadline = time.time() + _VERIFY_POLL_SECONDS
        while True:
            try:
                now = self._read_raw(path)
            except Exception:
                now = None
            if now == payload:
                return
            if now is not None:
                try:
                    json.loads(now.decode("utf-8"))
                    raise ConcurrentCommitError(
                        f"version {version} of {self.root}: this writer's "
                        "manifest was recovered away mid-write and the slot "
                        "was committed by another writer — retry"
                    )
                except (json.JSONDecodeError, UnicodeDecodeError):
                    pass  # unparseable occupant: indeterminate
            if time.time() > deadline:
                raise ConcurrentCommitError(
                    f"version {version} of {self.root}: this writer's "
                    "manifest vanished from its slot mid-write (quarantined "
                    "by a racing recovery) — retry"
                )
            time.sleep(0.02)

    def constraints(self, version: int | None = None) -> dict[str, str]:
        """The table's CHECK constraints (name → SQL predicate) at
        ``version`` (default latest); empty for an empty table."""
        try:
            return dict(self.manifest(version).get("constraints") or {})
        except VersionNotFoundError:
            return {}

    def _check_df(self, df: DataFrame, cons: dict[str, str]) -> None:
        """One aggregate pass counting violations of every constraint
        (SQL CHECK semantics: a row violates only when the predicate is
        literally FALSE — NULL passes, as in ANSI and Delta)."""
        aggs = [
            F.sum(
                F.when(F.expr(pred).eqNullSafe(F.lit(False)), 1).otherwise(0)
            ).alias(f"__viol_{i}")
            for i, pred in enumerate(cons.values())
        ]
        row = df.agg(*aggs).first()
        for i, (name, pred) in enumerate(cons.items()):
            n_bad = row[f"__viol_{i}"]
            if n_bad:
                raise ConstraintViolationError(
                    f"CHECK constraint '{name}' ({pred}) violated by "
                    f"{n_bad} written row(s) in {self.root}"
                )

    def add_constraint(
        self, name: str, predicate: str, attempts: int = 10
    ) -> CommitInfo:
        """Delta-style ``ADD CONSTRAINT``: validate the EXISTING
        snapshot satisfies ``predicate`` (one full scan, like Delta),
        then record it in a metadata-only commit (files carried by
        reference).  Every subsequent write validates its written rows
        against all recorded constraints before committing."""
        return self.commit_with_retry(
            lambda t: t._add_constraint_once(name, predicate), attempts
        )

    def _add_constraint_once(self, name: str, predicate: str) -> CommitInfo:
        m = self.manifest()
        cons = dict(m.get("constraints") or {})
        if name in cons:
            raise ValueError(f"constraint '{name}' already exists on {self.root}")
        if m["files"]:
            self._check_df(self.read(m["version"]), {name: predicate})
        cons[name] = predicate
        return self._commit(
            "add_constraint",
            list(m["files"]),
            m["schema"],
            base_version=m["version"],
            constraints=cons,
        )

    def drop_constraint(self, name: str, attempts: int = 10) -> CommitInfo:
        """Remove a CHECK constraint (metadata-only commit)."""
        return self.commit_with_retry(
            lambda t: t._drop_constraint_once(name), attempts
        )

    def _drop_constraint_once(self, name: str) -> CommitInfo:
        m = self.manifest()
        cons = dict(m.get("constraints") or {})
        if name not in cons:
            raise ValueError(f"no constraint '{name}' on {self.root}")
        del cons[name]
        return self._commit(
            "drop_constraint",
            list(m["files"]),
            m["schema"],
            base_version=m["version"],
            constraints=cons,
        )

    def generated(self, version: int | None = None) -> dict[str, str]:
        """The table's generated-column rules (column → SQL expression)
        at ``version`` (default latest); empty for an empty table."""
        try:
            return dict(self.manifest(version).get("generated") or {})
        except VersionNotFoundError:
            return {}

    def add_generated_column(
        self, name: str, ddl_type: str, expr: str, attempts: int = 10
    ) -> CommitInfo:
        """Delta's ``GENERATED ALWAYS AS (expr)``: widen the schema
        with ``name`` and record its generation rule. From then on
        every data-carrying write either OMITS the column (the engine
        computes it) or provides values the engine VERIFIES equal to
        the expression — an inconsistent write refuses, so the
        invariant ``name <=> expr`` holds for every row ever committed.

        Declared BEFORE data, like Delta (generation expressions are
        table-creation properties there): on a table that already has
        files, old rows would read NULL and silently break the
        invariant, so this raises — stage the schema with an empty
        overwrite first. The rule is a table property: carried by every
        commit (including overwrite), dropped with the column."""
        return self.commit_with_retry(
            lambda t: t._add_generated_once(name, ddl_type, expr), attempts
        )

    def _add_generated_once(self, name, ddl_type, expr) -> CommitInfo:
        from pyspark.sql.types import (
            StructField,
            StructType,
            _parse_datatype_string,
        )

        m = self.manifest()
        if m["files"]:
            raise ValueError(
                f"{self.root} already has data: generated columns must "
                "be declared before rows exist (existing rows would "
                "read NULL and break the generation invariant) — "
                "declare on the empty table, or use add_column for a "
                "plain nullable column"
            )
        schema = self._schema_of(m)
        if name in schema.fieldNames():
            raise ValueError(f"column '{name}' already exists on {self.root}")
        dt = _parse_datatype_string(ddl_type)  # loud on a bad DDL type
        # loud on a bad expression / unknown source columns: analyze it
        # against the current schema without touching data
        self.spark.createDataFrame([], schema).select(
            F.expr(expr).cast(dt).alias(name)
        )
        widened = StructType(
            list(schema.fields) + [StructField(name, dt, True)]
        )
        gen = dict(m.get("generated") or {})
        gen[name] = expr
        return self._commit(
            "add_generated_column",
            list(m["files"]),
            widened.simpleString(),
            base_version=m["version"],
            generated=gen,
        )

    def identity(self, version: int | None = None) -> dict[str, dict]:
        """The table's identity-column specs (column → {start, step})
        at ``version`` (default latest)."""
        try:
            return dict(self.manifest(version).get("identity") or {})
        except VersionNotFoundError:
            return {}

    def add_identity_column(
        self, name: str, start: int = 1, step: int = 1, attempts: int = 10
    ) -> CommitInfo:
        """Delta's ``GENERATED ALWAYS AS IDENTITY (START WITH s
        INCREMENT BY st)``: a bigint column the ENGINE assigns on every
        ingest — writers must omit it (ALWAYS semantics; providing it
        refuses). Values are unique and move strictly in ``step``'s
        direction but may have GAPS (Delta's contract too): each
        assigning commit derives its watermark from the per-file
        [min, max] stats the manifest already records (zero extra
        state, zero extra I/O — max over current entries, or ``start``
        for the first rows) and hands out watermark + step * k with a
        block-allocating k, so no global sort or shuffle ever happens.
        CAS commits make concurrent appends re-derive, so two commits
        never share a watermark. Declared before data, like generated
        columns."""
        if step == 0:
            raise ValueError("identity step cannot be 0")
        return self.commit_with_retry(
            lambda t: t._add_identity_once(name, start, step), attempts
        )

    def _add_identity_once(self, name: str, start: int, step: int) -> CommitInfo:
        from pyspark.sql.types import LongType, StructField, StructType

        m = self.manifest()
        if m["files"]:
            raise ValueError(
                f"{self.root} already has data: identity columns must "
                "be declared before rows exist"
            )
        schema = self._schema_of(m)
        if name in schema.fieldNames():
            raise ValueError(f"column '{name}' already exists on {self.root}")
        ident = dict(m.get("identity") or {})
        ident[name] = {"start": int(start), "step": int(step)}
        widened = StructType(
            list(schema.fields) + [StructField(name, LongType(), True)]
        )
        return self._commit(
            "add_identity_column",
            list(m["files"]),
            widened.simpleString(),
            base_version=m["version"],
            identity=ident,
        )

    def _identity_watermark(self, m: dict[str, Any], col: str, spec: dict) -> int:
        """Next value to hand out: one past the table's current extreme
        in ``step``'s direction, straight from the manifest stats
        (every file postdates the declaration, so every entry carries
        them)."""
        step = spec["step"]
        extreme: int | None = None
        for e in m["files"]:
            phys = (e.get("cmap") or {}).get(col, col)
            s = (e.get("stats") or {}).get(phys)
            if s is None or s[0] is None:
                continue  # all-NULL file cannot happen post-declaration
            v = int(s[1] if step > 0 else s[0])
            if extreme is None or (v > extreme if step > 0 else v < extreme):
                extreme = v
        return spec["start"] if extreme is None else extreme + step

    def _apply_identity(self, df: DataFrame, m: dict[str, Any]) -> DataFrame:
        """Assign identity values to an ingest batch. Providing the
        column refuses (ALWAYS semantics). The assignment expression is
        nondeterministic (block-allocating ids per partition), so the
        batch is locally checkpointed ONCE — every later pass over it
        (constraint check, generated-column verify, the write itself)
        must see the same frozen values.

        ``m`` is the SAME manifest snapshot the caller will use as its
        CAS ``base_version``: deriving the watermark from a separate
        ``self.manifest()`` read here would open a TOCTOU window — a
        racer committing between the two reads would let the CAS pass
        with a stale watermark, and two commits would hand out
        overlapping identity values. One snapshot in, one CAS against
        it: a racer always trips ConcurrentCommitError and the retry
        re-derives."""
        ident = dict(m.get("identity") or {})
        if not ident:
            return df
        for col, spec in ident.items():
            if col in df.columns:
                raise ValueError(
                    f"column '{col}' is GENERATED ALWAYS AS IDENTITY on "
                    f"{self.root} — omit it; the engine assigns values"
                )
            wm = self._identity_watermark(m, col, spec)
            df = df.withColumn(
                col,
                (
                    F.lit(wm)
                    + F.lit(spec["step"]) * F.monotonically_increasing_id()
                ).cast("bigint"),
            )
        return df.localCheckpoint(eager=True)

    def _apply_identity_merge(
        self, source: DataFrame, live: DataFrame, keys: list[str],
        m: dict[str, Any],
    ) -> DataFrame:
        """Identity assignment for whole-row MERGE: a source row
        matching an existing key RETAINS the target row's identity
        values (whole-row replacement must not re-identify the row);
        unmatched rows get fresh watermark-derived ids. Deterministic
        under duplicate-key targets (min per key). One local checkpoint
        freezes the nondeterministic fresh-id branch across the
        validation and write passes. ``m`` is the caller's CAS-base
        manifest snapshot (see _apply_identity — watermark and CAS must
        come from the same read)."""
        ident = dict(m.get("identity") or {})
        if not ident:
            return source
        for col in ident:
            if col in source.columns:
                raise ValueError(
                    f"column '{col}' is GENERATED ALWAYS AS IDENTITY on "
                    f"{self.root} — omit it; matched rows retain their "
                    "ids, new rows get fresh ones"
                )
        tgt = live.groupBy(*keys).agg(
            *[F.min(c).alias(f"__tgt_{c}") for c in ident]
        )
        out = source.join(tgt, keys, "left")
        for col, spec in ident.items():
            wm = self._identity_watermark(m, col, spec)
            out = out.withColumn(
                col,
                F.coalesce(
                    F.col(f"__tgt_{col}"),
                    (
                        F.lit(wm)
                        + F.lit(spec["step"])
                        * F.monotonically_increasing_id()
                    ).cast("bigint"),
                ),
            ).drop(f"__tgt_{col}")
        return out.localCheckpoint(eager=True)

    def _apply_generated(self, df: DataFrame, m: dict[str, Any]) -> DataFrame:
        """Fill in OMITTED generated columns (cast to their declared
        type) so writers can simply not supply them — provided columns
        are left alone here and verified in _write_data_files. ``m`` is
        the caller's CAS-base manifest snapshot (one read per commit
        attempt — see _apply_identity)."""
        gen = dict(m.get("generated") or {})
        if not gen:
            return df
        by_name = {f.name: f for f in self._schema_of(m).fields}
        for col, expr in gen.items():
            if col not in df.columns and col in by_name:
                df = df.withColumn(
                    col, F.expr(expr).cast(by_name[col].dataType)
                )
        return df

    def _verify_generated(self, df: DataFrame, gen: dict[str, str]) -> None:
        """One aggregate pass: every provided generated column must
        null-safely equal its expression on every written row."""
        present = {c: e for c, e in gen.items() if c in df.columns}
        if not present:
            return
        aggs = [
            F.sum(
                (~F.col(c).eqNullSafe(F.expr(e))).cast("long")
            ).alias(f"__gen_{i}")
            for i, (c, e) in enumerate(present.items())
        ]
        row = df.agg(*aggs).first()
        for i, (c, e) in enumerate(present.items()):
            n_bad = row[f"__gen_{i}"]
            if n_bad:
                raise ConstraintViolationError(
                    f"generated column '{c}' (GENERATED ALWAYS AS {e}) "
                    f"does not match its expression on {n_bad} written "
                    f"row(s) in {self.root} — omit the column to have "
                    "the engine compute it"
                )

    def add_not_null(self, col: str, attempts: int = 10) -> CommitInfo:
        """``ALTER TABLE ALTER COLUMN SET NOT NULL`` — recorded as the
        CHECK constraint ``<col>_not_null`` (``IS NOT NULL`` is never
        NULL-valued, so the ANSI NULL-passes CHECK semantics enforce it
        exactly). Validation of the EXISTING snapshot is METADATA-ONLY
        whenever every current file entry carries a null count for the
        column (zero data I/O — the stats the commit protocol already
        records); only tables with pre-null-stats files pay
        add_constraint's full validation scan."""
        return self.commit_with_retry(
            lambda t: t._add_not_null_once(col), attempts
        )

    def _add_not_null_once(self, col: str) -> CommitInfo:
        m = self.manifest()
        schema = self._schema_of(m)
        if col not in schema.fieldNames():
            raise ValueError(f"no column '{col}' on {self.root}")
        name, predicate = f"{col}_not_null", f"{col} IS NOT NULL"
        cons = dict(m.get("constraints") or {})
        if name in cons:
            raise ValueError(f"constraint '{name}' already exists on {self.root}")
        nulls = 0
        derivable = True
        for f in m["files"]:
            if f.get("dv"):
                derivable = False  # vectored rows might be the nulls
                break
            phys = (f.get("cmap") or {}).get(col, col)
            nd = f.get("nulls")
            if nd is None:
                derivable = False
                break
            # physically absent column ⇒ every written row is NULL
            nulls += nd[phys] if phys in nd else f["rows"]
        if derivable:
            if nulls:
                raise ValueError(
                    f"cannot add NOT NULL on '{col}': {nulls} existing "
                    f"NULL row(s) in {self.root}"
                )
        elif m["files"]:
            self._check_df(self.read(m["version"]), {name: predicate})
        cons[name] = predicate
        return self._commit(
            "add_constraint",
            list(m["files"]),
            m["schema"],
            base_version=m["version"],
            constraints=cons,
        )

    def add_column(
        self, name: str, ddl_type: str, attempts: int = 10
    ) -> CommitInfo:
        """``ALTER TABLE ADD COLUMN`` as a METADATA-ONLY commit: the
        manifest schema widens by one nullable field, files carry over
        by reference, and every reader NULL-backfills the new column
        for pre-evolution files (the same impose-schema mechanics as
        merge_schema appends, without needing a data-carrying write).

        Re-adding a previously-DROPPED name is supported via the same
        entry-level column mapping rename_column uses (the id-based
        half of Delta's ``columnMapping``): scans match parquet columns
        by name, so a bare re-add would resurrect pre-drop values still
        physically present in old files. Instead the re-add stamps
        every current entry with ``cmap[name] = <fresh physical name>``
        — a name no file has ever contained — so those entries
        NULL-backfill the logical column (old values stay dead), while
        files written after the re-add carry the name physically (no
        mapping) and read normally. Time travel to pre-drop versions
        still sees the ORIGINAL values through those manifests' own
        entries. Change feeds refuse ranges crossing a re-add, exactly
        like a rename — a consumer pinned to the pre-drop schema would
        otherwise silently read new-era values under the old-era
        column."""
        return self.commit_with_retry(
            lambda t: t._add_column_once(name, ddl_type), attempts
        )

    def _add_column_once(self, name: str, ddl_type: str) -> CommitInfo:
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        m = self.manifest()
        schema = self._schema_of(m)
        if name in schema.fieldNames():
            raise ValueError(f"column '{name}' already exists on {self.root}")
        dt = _parse_datatype_string(ddl_type)  # loud on a bad DDL type
        widened = StructType(
            list(schema.fields) + [StructField(name, dt, True)]
        )
        if name not in self._ghost_names(set(schema.fieldNames())):
            return self._commit(
                "add_column",
                list(m["files"]),
                widened.simpleString(),
                base_version=m["version"],
            )
        # RE-ADD of a dropped name: map the logical name to a fresh
        # physical name on every current entry. The physical name is
        # absent from every parquet file ever written (uuid suffix), so
        # both scan paths NULL-backfill it — identical mechanics to a
        # file predating a plain add_column. Entry-level means time
        # travel, clones, and mixed generations need zero reader
        # changes; rewrites (optimize/CoW) purge the mapping as the
        # column materializes physically.
        ghost_phys = f"{name}__readd_{uuid.uuid4().hex[:12]}"
        entries = []
        for e in m["files"]:
            cm = dict(e.get("cmap") or {})
            cm[name] = ghost_phys
            e2 = {k: v for k, v in e.items() if k != "cmap"}
            e2["cmap"] = cm
            entries.append(e2)
        return self._commit(
            "readd_column",
            entries,
            widened.simpleString(),
            base_version=m["version"],
        )

    def drop_column(self, name: str, attempts: int = 10) -> CommitInfo:
        """``ALTER TABLE DROP COLUMN`` as a METADATA-ONLY commit: the
        manifest schema narrows, files carry over by reference, and no
        byte of data moves. Safe without Delta's column-mapping
        machinery because every reader here IMPOSES the manifest schema
        on every scan — the dropped column simply stops being selected
        (old physical data becomes invisible, reclaimed as files are
        naturally rewritten). Time travel to pre-drop versions still
        reads the column via their manifests' wider schemas.

        Guards: the column must not be referenced by a CHECK
        constraint (drop those first), and a dropped NAME cannot later
        be re-added by schema evolution while pre-drop files may still
        be referenced — name-based parquet reads would resurrect the
        old values (see ``_assert_no_readd``)."""
        return self.commit_with_retry(
            lambda t: t._drop_column_once(name), attempts
        )

    def _drop_column_once(self, name: str) -> CommitInfo:
        import re

        from pyspark.sql.types import StructType

        m = self.manifest()
        schema = self._schema_of(m)
        if name not in schema.fieldNames():
            raise ValueError(f"no column '{name}' on {self.root}")
        if len(schema.fields) == 1:
            raise ValueError(f"cannot drop the only column of {self.root}")
        pat = re.compile(rf"\b{re.escape(name)}\b")
        used = sorted(
            cn
            for cn, pred in (m.get("constraints") or {}).items()
            if pat.search(pred)
        )
        if used:
            raise ValueError(
                f"column '{name}' is referenced by CHECK constraint(s) "
                f"{used} — drop them first"
            )
        gen = dict(m.get("generated") or {})
        gen_used = sorted(
            g for g, e in gen.items() if g != name and pat.search(e)
        )
        if gen_used:
            raise ValueError(
                f"column '{name}' is a source of generated column(s) "
                f"{gen_used} — drop them first"
            )
        gen.pop(name, None)  # dropping a generated column drops its rule
        ident = dict(m.get("identity") or {})
        ident.pop(name, None)  # dropping an identity column drops its spec
        narrowed = StructType([f for f in schema.fields if f.name != name])
        return self._commit(
            "drop_column",
            list(m["files"]),
            narrowed.simpleString(),
            base_version=m["version"],
            generated=gen,
            identity=ident,
        )

    # lossless widenings (Delta type-widening parity): target set per
    # source type. bigint→double is deliberately absent (lossy > 2^53).
    _WIDENINGS = {
        "tinyint": {"smallint", "int", "bigint", "double"},
        "smallint": {"int", "bigint", "double"},
        "int": {"bigint", "double"},
        "float": {"double"},
    }

    def widen_column(
        self, name: str, new_type: str, attempts: int = 10
    ) -> CommitInfo:
        """Delta-style TYPE WIDENING as a METADATA-ONLY commit: the
        manifest schema records the wider type, files carry over by
        reference, and readers upcast at scan time — Spark's parquet
        reader natively widens int8/16/32→int64 and float→double when
        a wider schema is imposed (verified on this Spark), and the
        Python DataSource casts Arrow-side. Only provably lossless
        widenings are allowed (``_WIDENINGS``); anything else —
        narrowing, bigint→double (lossy past 2^53), string
        conversions — is rejected loudly. Subsequent writes must
        supply the widened type (loud SchemaMismatch otherwise)."""
        return self.commit_with_retry(
            lambda t: t._widen_column_once(name, new_type), attempts
        )

    def _widen_column_once(self, name: str, new_type: str) -> CommitInfo:
        from pyspark.sql.types import (
            StructField,
            StructType,
            _parse_datatype_string,
        )

        m = self.manifest()
        schema = self._schema_of(m)
        by_name = {f.name: f for f in schema.fields}
        if name not in by_name:
            raise ValueError(f"no column '{name}' on {self.root}")
        cur = by_name[name].dataType.simpleString()
        dt = _parse_datatype_string(new_type)
        tgt = dt.simpleString()
        if tgt not in self._WIDENINGS.get(cur, set()):
            raise ValueError(
                f"cannot widen column '{name}' from {cur} to {tgt}: only "
                "lossless numeric widenings are supported "
                f"({ {k: sorted(v) for k, v in self._WIDENINGS.items()} })"
            )
        widened = StructType(
            [
                StructField(name, dt, f.nullable) if f.name == name else f
                for f in schema.fields
            ]
        )
        return self._commit(
            "widen_column",
            list(m["files"]),
            widened.simpleString(),
            base_version=m["version"],
        )

    def rename_column(
        self, old: str, new: str, attempts: int = 10
    ) -> CommitInfo:
        """``ALTER TABLE RENAME COLUMN`` as a METADATA-ONLY commit —
        the column-mapping feature Delta gates behind
        ``columnMapping=name``. Scans match parquet columns by name,
        so a bare schema rename would silently NULL the column for
        every already-written file; instead each CURRENT file entry
        records the column's PHYSICAL parquet name (``cmap``:
        logical → physical) and every reader scans in per-mapping
        groups, aliasing physical back to logical. Files written after
        the rename carry the new name physically (no mapping entry),
        chained renames fold per entry (A→B→C keeps one C→A mapping;
        renaming back to the original collapses to no mapping), and
        time travel / clones / CDC scans are automatically correct
        because the mapping travels WITH each entry. The old name
        becomes a ghost for schema evolution (``_assert_no_readd``) —
        pre-rename files still physically contain it.

        Guards: CHECK constraints referencing the column block the
        rename (drop them first; predicates are recorded SQL text)."""
        return self.commit_with_retry(
            lambda t: t._rename_column_once(old, new), attempts
        )

    def _rename_column_once(self, old: str, new: str) -> CommitInfo:
        import re

        from pyspark.sql.types import StructField, StructType

        m = self.manifest()
        schema = self._schema_of(m)
        if old not in schema.fieldNames():
            raise ValueError(f"no column '{old}' on {self.root}")
        if new in schema.fieldNames():
            raise ValueError(f"column '{new}' already exists on {self.root}")
        pat = re.compile(rf"\b{re.escape(old)}\b")
        used = sorted(
            cn
            for cn, pred in (m.get("constraints") or {}).items()
            if pat.search(pred)
        )
        if used:
            raise ValueError(
                f"column '{old}' is referenced by CHECK constraint(s) "
                f"{used} — drop them first, rename, then re-add against "
                "the new name"
            )
        gen = m.get("generated") or {}
        gen_hit = sorted(
            g for g, e in gen.items() if g == old or pat.search(e)
        )
        if gen_hit:
            # a generation expression references columns BY NAME: a
            # rename of the generated column or any of its sources
            # would silently break the rule
            raise ValueError(
                f"column '{old}' is a generated column or a source of "
                f"generated column(s) {gen_hit} — drop the rule(s) "
                "first (drop_column), rename, then re-declare"
            )
        if old in (m.get("identity") or {}):
            # the watermark derivation reads this column's stats by its
            # manifest name; a rename would orphan the spec
            raise ValueError(
                f"column '{old}' is GENERATED ALWAYS AS IDENTITY — "
                "identity columns cannot be renamed"
            )
        renamed = StructType(
            [
                StructField(new, f.dataType, f.nullable)
                if f.name == old
                else f
                for f in schema.fields
            ]
        )
        new_entries = []
        for e in m["files"]:
            cm = dict(e.get("cmap") or {})
            phys = cm.pop(old, old)  # follow an existing chain
            if new != phys:
                cm[new] = phys
            e2 = {k: v for k, v in e.items() if k != "cmap"}
            if cm:
                e2["cmap"] = cm
            new_entries.append(e2)
        return self._commit(
            "rename_column",
            new_entries,
            renamed.simpleString(),
            base_version=m["version"],
        )

    def _ghost_names(self, current: set[str]) -> set[str]:
        """Column names that appeared in some schema since the last
        clean slate (``overwrite``) but are not current — names whose
        values may still be physically present in referenced files.
        Conservative manifest-sized walk; a clean slate provably
        dropped every old file from the snapshot."""
        manifests = []
        for v in self.versions():
            try:
                manifests.append(self._read_manifest_file(v))
            except VersionNotFoundError:
                continue
        slate = max(
            (mm["version"] for mm in manifests if mm["action"] == "overwrite"),
            default=-1,
        )
        seen: set[str] = set()
        for mm in manifests:
            if mm["version"] >= slate:
                seen |= set(self._schema_of(mm).fieldNames())
        return seen - current

    def _assert_no_readd(self, added: list[str], current: set[str]) -> None:
        """Reject re-introducing a previously-dropped column name via
        schema evolution (merge_schema appends / merges): scans match
        parquet columns BY NAME, so a re-added name would resurrect the
        old values still physically present in pre-drop files. The
        explicit ``add_column`` path handles re-adds safely via a
        fresh-physical-name column mapping — data-carrying evolution
        commits cannot (their new files DO contain the name), so they
        direct the caller there."""
        if not added:
            return
        ghosts = sorted(set(added) & self._ghost_names(current))
        if ghosts:
            raise SchemaMismatchError(
                f"columns {ghosts} were previously dropped from "
                f"{self.root}; re-adding the same name via schema "
                "evolution would resurrect old values from pre-drop "
                "files at read time — use ALTER-style add_column() "
                "first (it maps the name to a fresh physical column), "
                "then write, or use a new column name (or start a "
                "clean slate with commit_overwrite)"
            )

    def _write_data_files(
        self, df: DataFrame, enforce: bool = True
    ) -> list[dict[str, Any]]:
        """Write ``df`` into a fresh commit directory and return file
        entries (relative path, rows, min/max stats). The stats pass
        re-reads only the new files (column-pruned, combines map-side).

        ``enforce=True`` first validates the written rows against the
        table's CHECK constraints (one extra aggregate pass — the
        price of enforcement, skipped for rewrites of rows that are
        already in the table: CoW delete/replace survivors and
        optimize, whose content is provably unchanged)."""
        if enforce:
            cons = self.constraints()
            if cons:
                self._check_df(df, cons)
            gen = self.generated()
            if gen:
                self._verify_generated(df, gen)
        commit_dir = f"{_DATA_DIR}/c{uuid.uuid4().hex}"
        abs_dir = f"{self.root}/{commit_dir}"
        df.write.mode("errorifexists").parquet(abs_dir)
        back = self.spark.read.parquet(abs_dir)
        cols = _stat_cols(back)
        all_cols = back.columns  # null counts work for EVERY type
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in cols:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        for c in all_cols:
            aggs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nc_{c}")
            )
        stats = (
            back.select(F.col("_metadata.file_path").alias("__file"), *all_cols)
            .groupBy("__file")
            .agg(*aggs)
            .collect()  # one row per new data file — manifest-sized
        )
        blooms = self._per_file_blooms(back) if self.bloom_col in back.columns else {}
        files = []
        for r in stats:
            full = r["__file"]
            idx = full.find(commit_dir)
            rel = full[idx:] if idx >= 0 else full
            entry: dict[str, Any] = {"path": rel, "rows": r["__rows"]}
            entry["stats"] = {
                c: [_json_safe(r[f"__min_{c}"]), _json_safe(r[f"__max_{c}"])]
                for c in cols
            }
            entry["nulls"] = {c: int(r[f"__nc_{c}"]) for c in all_cols}
            if full in blooms:
                entry["bloom"] = blooms[full]
            files.append(entry)
        return files

    def _per_file_blooms(self, back: DataFrame) -> dict[str, list[int]]:
        """One bloom word-array per new data file over ``bloom_col``.
        The aggregation dedups (file, position) pairs map-side, so the
        collect is bounded by n_new_files × bloom_bits — commit-sized
        planning state, never row-sized."""
        from finalpipeline_spark.operators.bloom import _position_expr

        pos = F.array(
            *[
                F.expr(_position_expr(self.bloom_col, j, self.bloom_bits))
                for j in range(self.bloom_k)
            ]
        )
        rows = (
            back.select(
                F.col("_metadata.file_path").alias("__file"),
                F.explode(pos).alias("pos"),
            )
            .distinct()
            .collect()
        )
        words: dict[str, list[int]] = {}
        n_words = (self.bloom_bits + 63) // 64
        for r in rows:
            w = words.setdefault(r["__file"], [0] * n_words)
            w[r["pos"] >> 6] |= 1 << (r["pos"] & 63)
        return words

    def _bloom_might_contain(self, words: list[int], value: Any) -> bool:
        """Driver-side membership test mirroring operators/bloom's SQL
        scheme bit-for-bit: position = (md5('<seed>:<str(value)>') hex
        prefix as int31) % bits."""
        import hashlib

        for j in range(self.bloom_k):
            h = hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:8]
            p = (int(h, 16) % 2_147_483_648) % self.bloom_bits
            if not (words[p >> 6] >> (p & 63)) & 1:
                return False
        return True

    def _commit(
        self,
        action: str,
        files: list[dict[str, Any]],
        schema_ddl: str,
        meta: dict[str, Any] | None = None,
        base_version: int | None | object = _NO_CAS,
        constraints: dict[str, str] | None = None,
        generated: dict[str, str] | None = None,
        identity: dict[str, dict] | None = None,
        reader: int | None = None,
    ) -> CommitInfo:
        """``base_version`` is the compare-and-swap guard: the version
        the caller's file list was COMPUTED from (None = empty table).
        Preparing a commit takes seconds (Spark jobs write the data
        files), so without the check a writer that snapshotted the file
        list, lost a race during its data write, and then claimed the
        NEXT free version would silently drop the racer's files from
        the live file list — a lost update the exclusive version claim
        alone cannot catch. Only ``commit_overwrite`` skips the guard:
        replacing the whole table is last-writer-wins by intent."""
        parent = self.latest_version()
        if base_version is not _NO_CAS and parent != base_version:
            raise ConcurrentCommitError(
                f"{self.root} advanced to version {parent} while this "
                f"'{action}' was prepared against "
                f"{'empty' if base_version is None else f'version {base_version}'}"
                " — re-read and retry"
            )
        version = 0 if parent is None else parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "action": action,
            "schema": schema_ddl,
            # wall-clock commit time: the raw input of timestamp time
            # travel (version_as_of_timestamp adjusts for multi-writer
            # clock skew at RESOLUTION time, Delta-style — recorded
            # values stay honest)
            "ts": round(time.time(), 3),
            "files": files,
        }
        if meta:
            manifest["meta"] = meta
        pm = self._read_manifest_file(parent) if parent is not None else None
        # The reader requirement is STICKY table-wide (Delta's protocol
        # action semantics): once any commit demands reader N, every
        # descendant manifest carries max(N, its own action's need) —
        # otherwise a pre-cmap reader that refused the readd commit
        # would happily read the NEXT append (whose file list still
        # contains the cmap'd entries) and resurrect dropped pre-drop
        # values. ``reader`` lets cross-table commits (shallow clone)
        # import the source's requirement.
        req = max(
            _READER_REQUIREMENTS.get(action, 1),
            pm.get("reader", 1) if pm else 1,
            reader or 1,
        )
        if req > 1:
            manifest["reader"] = req
        if pm is not None and pm.get("writer", 1) > SUPPORTED_WRITER_VERSION:
            # a table whose head demands a newer writer would have its
            # invariants corrupted by this build's commits — refuse
            # BEFORE claiming a version (the read-side guard already
            # refused if the head also demands a newer reader)
            raise ProtocolVersionError(
                f"{self.root} requires writer protocol {pm['writer']} "
                f"(this build supports {SUPPORTED_WRITER_VERSION}) — "
                "upgrade before committing to this table"
            )
        # CHECK constraints are table properties: carried forward from
        # the parent manifest by every commit (including overwrite —
        # replacing the data does not drop the rules), replaced only by
        # the add/drop constraint commits that pass them explicitly.
        if constraints is None and pm is not None:
            constraints = pm.get("constraints")
        if constraints:
            manifest["constraints"] = dict(constraints)
        # generation rules are table properties exactly like CHECK
        # constraints: carried forward by every commit, replaced only
        # by the commits that pass them explicitly
        if generated is None and pm is not None:
            generated = pm.get("generated")
        if generated:
            manifest["generated"] = dict(generated)
        if identity is None and pm is not None:
            identity = pm.get("identity")
        if identity:
            manifest["identity"] = dict(identity)
        self._write_manifest(manifest)
        return CommitInfo(
            version=version,
            action=action,
            n_files=len(files),
            n_rows=sum(self._entry_live_rows(f) for f in files),
        )

    def commit_with_retry(
        self,
        fn,
        attempts: int = 10,
        base_backoff_seconds: float = 0.05,
    ) -> CommitInfo:
        """Bounded optimistic-concurrency loop: call ``fn(self)`` —
        which must RE-READ the current snapshot and attempt exactly one
        commit — retrying on ``ConcurrentCommitError`` with jittered
        exponential backoff.  This is the ergonomic half of the CAS
        commit protocol: every snapshot-based writer raises on a lost
        race (correct, but every caller would hand-roll the same loop);
        re-derive-and-retry is safe precisely because ``fn`` starts
        from a fresh ``manifest()`` read each attempt.  After
        ``attempts`` losses the last ``ConcurrentCommitError``
        propagates — sustained contention should surface, not spin."""
        import random

        if attempts < 1:
            raise ValueError("attempts must be >= 1")
        for attempt in range(attempts):
            try:
                return fn(self)
            except ConcurrentCommitError:
                if attempt == attempts - 1:
                    raise
                # full jitter: contending writers must desynchronize
                time.sleep(
                    base_backoff_seconds * (2**attempt) * random.random()
                )
        raise AssertionError("unreachable")  # pragma: no cover

    # -- write API -----------------------------------------------------
    def commit_overwrite(
        self, df: DataFrame, meta: dict[str, Any] | None = None
    ) -> CommitInfo:
        """New version containing exactly ``df``'s rows. ``meta`` is
        recorded in the manifest (e.g. upstream-snapshot lineage).
        Generation rules survive the overwrite (table properties, like
        CHECK constraints) and omitted generated columns are computed."""
        if self.latest_version() is not None:
            m = self.manifest()
            df = self._apply_generated(self._apply_identity(df, m), m)
        return self._commit(
            "overwrite", self._write_data_files(df), df.schema.simpleString(), meta
        )

    def commit_append(
        self,
        df: DataFrame,
        meta: dict[str, Any] | None = None,
        merge_schema: bool = False,
    ) -> CommitInfo:
        """New version = previous file list + ``df``'s new files. The
        old files carry over BY REFERENCE — an append never rewrites.
        ``meta`` is recorded in the manifest (e.g. a streaming sink's
        (checkpoint, epoch) identity for replay idempotence).

        Schema evolution (Delta's mergeSchema): by default an append
        whose column set differs from the table's raises
        SchemaMismatchError — silently recording the new schema would
        make reads depend on which file a reader opened first. With
        ``merge_schema=True``, ADDITIVE evolution is committed: the
        manifest schema becomes old fields + genuinely new fields (in
        that order), readers impose it on every file, and pre-evolution
        files backfill NULL for the added columns at read time (no
        rewrite — a metadata-only migration). A same-name field with a
        different type always raises: silent type widening changes
        existing rows' meaning."""
        prev_exists = self.latest_version() is not None
        prev: dict[str, Any] = {"files": [], "version": None}
        if prev_exists:
            # ONE manifest read per attempt: the identity watermark, the
            # schema check, and the CAS base_version below all derive
            # from this same snapshot — a racer committing after it
            # trips the CAS instead of silently reusing a stale
            # watermark (the TOCTOU two separate reads would open).
            prev = self.manifest()
            # assign identity values, then fill in omitted generated
            # columns (which may reference them) BEFORE the schema
            # check — writers simply don't supply either
            df = self._apply_generated(self._apply_identity(df, prev), prev)
        schema_ddl = df.schema.simpleString()
        if prev_exists:
            prev_schema = self._schema_of(prev)
            old = {f.name: f.dataType for f in prev_schema.fields}
            new = {f.name: f.dataType for f in df.schema.fields}
            conflicts = sorted(n for n in new if n in old and new[n] != old[n])
            if conflicts:
                raise SchemaMismatchError(
                    f"type change on {conflicts} is not supported "
                    "(additive evolution only)"
                )
            added = [n for n in new if n not in old]
            dropped = [n for n in old if n not in new]
            if (added or dropped) and not merge_schema:
                raise SchemaMismatchError(
                    f"append schema differs from table schema "
                    f"(new columns {added}, absent columns {dropped}); "
                    "pass merge_schema=True for additive evolution"
                )
            if added:
                self._assert_no_readd(added, set(old))
            from pyspark.sql.types import StructType

            merged = StructType(
                list(prev_schema.fields)
                + [f for f in df.schema.fields if f.name not in old]
            )
            schema_ddl = merged.simpleString()
        new_files = self._write_data_files(df)
        return self._commit(
            "append",
            list(prev["files"]) + new_files,
            schema_ddl,
            meta,
            base_version=prev["version"],
        )

    def committed_meta(self, key: str) -> set[Any]:
        """All values of manifest meta field ``key`` across the log
        (including expired manifests — commit identity must survive
        vacuum, or a replayed epoch would double-append)."""
        out = set()
        for v in self.versions():
            m = self._read_manifest_file(v).get("meta") or {}
            if key in m:
                out.add(m[key])
        return out

    def delete_where(
        self, predicate: str, attempts: int = 10, mode: str = "cow"
    ) -> CommitInfo:
        """Row delete, two physical strategies (Delta parity):

        * ``mode="cow"`` (copy-on-write, default): rewrite only files
          containing matching rows; all other files carry over by
          reference. Best when deletes are clustered (whole partitions)
          or the table is about to be read many times.
        * ``mode="mor"`` (merge-on-read, Delta deletion vectors): no
          data file is touched — the matching rows' (file, position)
          pairs land in a tiny ``_dv/`` parquet and the affected
          entries reference it; readers anti-join the positions back
          out. Best for scattered deletes (GDPR row erasure across a
          100 TB table writes kilobytes instead of rewriting every hit
          file). A later rewrite of the file (CoW delete/replace/merge,
          OPTIMIZE) applies and drops the vector.

        Retries the whole derive+commit on a lost CAS race
        (``attempts=1`` restores raise-on-conflict)."""
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        fn = (
            (lambda t: t._delete_where_once(predicate))
            if mode == "cow"
            else (lambda t: t._delete_where_mor_once(predicate))
        )
        return self.commit_with_retry(fn, attempts)

    def _delete_where_once(self, predicate: str) -> CommitInfo:
        m = self.manifest()
        schema = self._schema_of(m)
        live = self._apply_dv(self._lineage_scan(m["files"], schema), m["files"])
        hit_rels = {
            r["__file"]
            for r in live.filter(F.expr(predicate))
            .select("__file")
            .distinct()
            .collect()  # bounded by file count, not rows
        }
        keep = [e for e in m["files"] if e["path"] not in hit_rels]
        rewrite = [e for e in m["files"] if e["path"] in hit_rels]
        new_files: list[dict[str, Any]] = []
        if rewrite:
            # the rewrite applies any existing deletion vector first, so
            # DV'd rows stay dead and the new files carry no vector
            survivors = self._scan_entries(rewrite, schema).filter(
                ~F.expr(predicate)
            )
            new_files = self._write_data_files(survivors, enforce=False)
        return self._commit(
            "delete", keep + new_files, m["schema"], base_version=m["version"]
        )

    def _delete_where_mor_once(self, predicate: str) -> CommitInfo:
        m = self.manifest()
        schema = self._schema_of(m)
        bad = {"__file", "__pos"} & set(schema.fieldNames())
        if bad:
            raise ValueError(
                f"merge-on-read delete reserves column names {sorted(bad)}"
            )
        live = self._apply_dv(self._lineage_scan(m["files"], schema), m["files"])
        hits = live.filter(F.expr(predicate)).select("__file", "__pos")
        # Consolidate: the new vector file carries old ∪ new positions
        # for every AFFECTED file, so each entry references exactly one
        # vector; entries untouched by this delete keep their old one.
        per_file = {
            r["__file"]: r["n"]
            for r in hits.groupBy("__file")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded by file count
        }
        if not per_file:
            return self._commit(
                "delete", list(m["files"]), m["schema"], base_version=m["version"]
            )
        affected = [e for e in m["files"] if e["path"] in per_file]
        carried = self._dv_positions(affected)
        dv_rel = f"{_DV_DIR}/d{uuid.uuid4().hex}"
        # position lists are deleted-rows-sized — one output file
        hits.unionByName(carried).coalesce(1).write.mode("errorifexists").parquet(
            f"{self.root}/{dv_rel}"
        )
        new_entries = []
        for e in m["files"]:
            if e["path"] not in per_file:
                new_entries.append(e)
                continue
            deleted = per_file[e["path"]] + (e.get("dv") or {}).get("deleted", 0)
            if deleted >= e["rows"]:
                # fully dead file: drop the entry outright (vacuum
                # reclaims the data file once its versions expire)
                continue
            kept = {k: v for k, v in e.items() if k != "dv"}
            kept["dv"] = {"path": dv_rel, "deleted": deleted}
            if e.get("base", self.root) != self.root:
                # carried (cloned) data file: the vector is OURS, not
                # the source's — pin its base to this root
                kept["dv"]["base"] = self.root
            new_entries.append(kept)
        return self._commit(
            "delete", new_entries, m["schema"], base_version=m["version"]
        )

    def update_where(
        self,
        predicate: str,
        assignments: dict[str, str],
        attempts: int = 10,
        mode: str = "cow",
    ) -> CommitInfo:
        """Delta-style UPDATE: ``SET col = expr`` for rows matching
        ``predicate``, one atomic commit.  Two physical strategies:

        * ``mode="cow"`` (copy-on-write, default): only files
          containing matching rows are rewritten (non-matching rows in
          a hit file are carried through the rewrite verbatim;
          untouched files carry over by reference), so an update
          touching 0.1% of files costs 0.1% of a rewrite.  Best when
          updates are clustered or the table is read-hot.
        * ``mode="mor"`` (merge-on-read): no hit file is rewritten —
          the matched rows' positions land in a deletion vector (the
          old values die in place) and ONLY the updated rows are
          appended as new files.  A scattered update of 10k rows
          across a 100 TB table writes 10k rows + a kilobyte vector
          instead of rewriting every hit file; a later CoW pass or
          OPTIMIZE folds the vectors away.

        Each assignment expression is cast to the column's existing
        type — UPDATE never changes the schema — and the updated rows
        pass CHECK-constraint validation before the commit (an update
        CAN violate, unlike a delete).  Retries the whole
        derive+commit on a lost CAS race (``attempts=1`` restores
        raise-on-conflict)."""
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        fn = (
            (lambda t: t._update_where_once(predicate, assignments))
            if mode == "cow"
            else (lambda t: t._update_where_mor_once(predicate, assignments))
        )
        return self.commit_with_retry(fn, attempts)

    def _update_schema(self, m: dict[str, Any], assignments: dict[str, str]):
        """Shared UPDATE validation: resolve the snapshot schema and
        reject empty / unknown-column assignment maps."""
        if not assignments:
            raise ValueError("update_where needs at least one assignment")
        schema = self._schema_of(m)
        unknown = sorted(set(assignments) - set(schema.fieldNames()))
        if unknown:
            raise ValueError(f"unknown columns in assignments: {unknown}")
        gen_hit = sorted(set(assignments) & set(m.get("generated") or {}))
        if gen_hit:
            # Delta parity: generated columns cannot be SET directly —
            # they are recomputed from their expressions after the
            # other assignments apply
            raise ValueError(
                f"columns {gen_hit} are GENERATED ALWAYS AS — they are "
                "recomputed automatically; update their source columns "
                "instead"
            )
        id_hit = sorted(set(assignments) & set(m.get("identity") or {}))
        if id_hit:
            raise ValueError(
                f"columns {id_hit} are GENERATED ALWAYS AS IDENTITY — "
                "their values are engine-assigned and immutable"
            )
        return schema

    def _regen_cols(self, m: dict[str, Any], df: DataFrame) -> DataFrame:
        """Recompute every generated column from its expression (the
        post-assignment step of UPDATE/MERGE rewrites — identity on
        rows whose sources did not change, since the invariant held)."""
        by_name = {f.name: f for f in self._schema_of(m).fields}
        for col, expr in (m.get("generated") or {}).items():
            if col in by_name:
                df = df.withColumn(
                    col, F.expr(expr).cast(by_name[col].dataType)
                )
        return df

    def _update_where_once(
        self, predicate: str, assignments: dict[str, str]
    ) -> CommitInfo:
        m = self.manifest()
        schema = self._update_schema(m, assignments)
        by_name = {f.name: f for f in schema.fields}
        live = self._apply_dv(self._lineage_scan(m["files"], schema), m["files"])
        hit_rels = {
            r["__file"]
            for r in live.filter(F.expr(predicate))
            .select("__file")
            .distinct()
            .collect()  # bounded by file count, not rows
        }
        keep = [e for e in m["files"] if e["path"] not in hit_rels]
        rewrite = [e for e in m["files"] if e["path"] in hit_rels]
        new_files: list[dict[str, Any]] = []
        if rewrite:
            pred = F.expr(predicate)
            cols = [
                F.when(pred, F.expr(assignments[c]).cast(by_name[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                if c in assignments
                else F.col(c)
                for c in schema.fieldNames()
            ]
            updated = self._regen_cols(
                m, self._scan_entries(rewrite, schema).select(*cols)
            )
            new_files = self._write_data_files(updated)
        return self._commit(
            "replace", keep + new_files, m["schema"], base_version=m["version"]
        )

    def _update_where_mor_once(
        self, predicate: str, assignments: dict[str, str]
    ) -> CommitInfo:
        m = self.manifest()
        schema = self._update_schema(m, assignments)
        by_name = {f.name: f for f in schema.fields}
        bad = {"__file", "__pos"} & set(schema.fieldNames())
        if bad:
            raise ValueError(
                f"merge-on-read update reserves column names {sorted(bad)}"
            )
        live = self._apply_dv(self._lineage_scan(m["files"], schema), m["files"])
        hits = live.filter(F.expr(predicate))
        per_file = {
            r["__file"]: r["n"]
            for r in hits.groupBy("__file")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded by file count
        }
        if not per_file:
            return self._commit(
                "replace", list(m["files"]), m["schema"], base_version=m["version"]
            )
        # Updated rows first: every hit row matched the predicate, so
        # the assignments apply unconditionally — and a CHECK violation
        # raises here, BEFORE any vector exists that could kill the old
        # rows. The two hits passes re-scan immutable committed files,
        # so their row sets are identical by construction.
        updated = self._regen_cols(
            m,
            hits.select(
                *[
                    F.expr(assignments[c]).cast(by_name[c].dataType).alias(c)
                    if c in assignments
                    else F.col(c)
                    for c in schema.fieldNames()
                ]
            ),
        )
        new_files = self._write_data_files(updated)
        affected = [e for e in m["files"] if e["path"] in per_file]
        carried = self._dv_positions(affected)
        dv_rel = f"{_DV_DIR}/d{uuid.uuid4().hex}"
        # consolidated old ∪ new positions for every affected file —
        # deleted-rows-sized, one output file
        hits.select("__file", "__pos").unionByName(carried).coalesce(1).write.mode(
            "errorifexists"
        ).parquet(f"{self.root}/{dv_rel}")
        new_entries = []
        for e in m["files"]:
            if e["path"] not in per_file:
                new_entries.append(e)
                continue
            deleted = per_file[e["path"]] + (e.get("dv") or {}).get("deleted", 0)
            if deleted >= e["rows"]:
                # every physical row dead: the entry drops outright
                # (its rows live on, updated, in the appended files)
                continue
            kept = {k: v for k, v in e.items() if k != "dv"}
            kept["dv"] = {"path": dv_rel, "deleted": deleted}
            if e.get("base", self.root) != self.root:
                kept["dv"]["base"] = self.root
            new_entries.append(kept)
        return self._commit(
            "replace",
            new_entries + new_files,
            m["schema"],
            base_version=m["version"],
        )

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        delete_col: str | None = None,
        meta: dict[str, Any] | None = None,
        merge_schema: bool = False,
        attempts: int = 10,
        when_matched_update: dict[str, str] | None = None,
        when_matched_condition: str | None = None,
        insert_unmatched: bool = True,
        not_matched_by_source_delete: str | None = None,
    ) -> CommitInfo:
        """Delta-style MERGE: one atomic commit that upserts ``source``
        rows into the table by ``keys`` (whole-row replacement for
        matched keys, insert for new keys) and, when ``delete_col``
        names a boolean column, deletes matched keys flagged true.

        Copy-on-write with FILE pruning on the join: only files that
        actually contain a matched key are rewritten — found by one
        key-join carrying ``_metadata.file_path`` (result bounded by
        the file count) — and every untouched file carries over by
        reference, so a merge touching 0.1% of keys costs the rewrite
        of the files those keys live in, not the table. The commit is
        a single manifest create: readers never observe the
        delete-without-insert intermediate of a delete+append pair.
        ``source`` must be key-unique (enforced — a double-matched key
        would make the outcome order-dependent).

        This is the consumer half of CDC: feed it the per-key FINAL
        state of a change feed (see ``replicate_from``) and the target
        converges to the producer's snapshot.

        ``merge_schema=True`` extends additive schema evolution to
        MERGE (Delta's ``withSchemaEvolution()``): source columns the
        table lacks are appended to the table schema, with existing
        files NULL-backfilling at read, so replication keeps following
        a producer that evolved mid-stream. Without the flag an
        evolved source is rejected loudly — silently projecting the
        new columns away would diverge the replica.

        Delta's conditional clauses, all optional and composable:

        * ``when_matched_update={col: sql_expr}`` — matched target
          rows get SET expressions applied instead of whole-row
          replacement (``UPDATE SET`` semantics). Expressions may
          reference the target row as ``t.<col>`` and the source row
          as ``s.<col>`` (key columns are unqualified). The source
          only needs its keys plus referenced columns — a partial
          source is legal in this mode; inserts NULL-backfill the
          rest.
        * ``when_matched_condition="sql"`` — further gates the update
          (``WHEN MATCHED AND <cond> THEN UPDATE``); matched rows
          failing it carry through UNCHANGED. Requires
          ``when_matched_update``.
        * ``insert_unmatched=False`` — source rows with no target
          match are ignored (``WHEN NOT MATCHED`` clause omitted).
        * ``not_matched_by_source_delete="sql"`` — target rows with
          NO source match AND matching the predicate are deleted
          (Delta's ``whenNotMatchedBySourceDelete``) — the sync shape
          that retires rows absent from the latest feed.

        Retries the whole derive+commit on a lost CAS race
        (``attempts=1`` restores raise-on-conflict)."""
        return self.commit_with_retry(
            lambda t: t._merge_once(
                source,
                keys,
                delete_col,
                meta,
                merge_schema,
                when_matched_update,
                when_matched_condition,
                insert_unmatched,
                not_matched_by_source_delete,
            ),
            attempts,
        )

    def _merge_once(
        self,
        source: DataFrame,
        keys: list[str],
        delete_col: str | None = None,
        meta: dict[str, Any] | None = None,
        merge_schema: bool = False,
        when_matched_update: dict[str, str] | None = None,
        when_matched_condition: str | None = None,
        insert_unmatched: bool = True,
        not_matched_by_source_delete: str | None = None,
    ) -> CommitInfo:
        if delete_col and delete_col in keys:
            raise ValueError("delete_col cannot be a merge key")
        if when_matched_condition and not when_matched_update:
            raise ValueError(
                "when_matched_condition requires when_matched_update"
            )
        if when_matched_update:
            bad = sorted(set(when_matched_update) & set(keys))
            if bad:
                raise ValueError(f"cannot SET merge keys {bad}")
        m = self.manifest()
        schema = self._schema_of(m)
        old = {f.name: f.dataType for f in schema.fields}
        src = {
            f.name: f for f in source.schema.fields if f.name != delete_col
        }
        conflicts = sorted(
            n for n, f in src.items() if n in old and f.dataType != old[n]
        )
        if conflicts:
            raise SchemaMismatchError(
                f"type change on {conflicts} is not supported "
                "(additive evolution only)"
            )
        extra = [f for n, f in src.items() if n not in old]
        if extra and when_matched_update is not None:
            # SET mode: extra source columns are expression INPUTS
            # (s.<col>), not schema evolution — inserts project the
            # table schema and ignore them
            pass
        elif extra:
            if not merge_schema:
                raise SchemaMismatchError(
                    f"merge source has columns the table lacks "
                    f"({[f.name for f in extra]}); pass merge_schema=True "
                    "for additive evolution"
                )
            self._assert_no_readd([f.name for f in extra], set(old))
            from pyspark.sql.types import StructType

            schema = StructType(list(schema.fields) + extra)
        cols = [f.name for f in schema.fields]
        dup = (
            source.groupBy(*keys).count().filter("count > 1").limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"merge source is not unique on {keys}: e.g. "
                f"{tuple(dup[0][k] for k in keys)}"
            )
        # lineage scan so existing deletion vectors are honored both in
        # hit discovery and in the survivor rewrite (a DV'd row must
        # neither mark its file as hit nor resurrect in the rewrite)
        base_schema = self._schema_of(m)
        live = self._apply_dv(
            self._lineage_scan(m["files"], base_schema), m["files"]
        )
        if when_matched_update is None:
            # whole-row semantics: matched source rows REPLACE target
            # rows, so identity values must be retained from the target
            # (fresh ids only for genuinely new keys — silent
            # re-identification would break every downstream reference),
            # then omitted generated columns computed (their expressions
            # may reference the identity). The SET-clause path retains
            # ids naturally (updates rebuild target rows) and its
            # inserts get fresh ids in _merge_clause_files.
            source = self._apply_generated(
                self._apply_identity_merge(source, live, keys, m), m
            )
        src_keys = source.select(*keys).distinct()
        hit_rels = {
            r["__file"]
            for r in live.select("__file", *keys)
            .join(src_keys, keys, "left_semi")
            .select("__file")
            .distinct()
            .collect()  # bounded by file count, not rows
        }
        if not_matched_by_source_delete:
            # files holding doomed source-less rows must be rewritten too
            hit_rels |= {
                r["__file"]
                for r in live.select("__file", *base_schema.fieldNames())
                .join(src_keys, keys, "left_anti")
                .filter(F.expr(not_matched_by_source_delete))
                .select("__file")
                .distinct()
                .collect()  # bounded by file count
            }
        keep = [e for e in m["files"] if e["path"] not in hit_rels]
        rewrite = [e for e in m["files"] if e["path"] in hit_rels]
        if when_matched_update is None and not_matched_by_source_delete is None:
            # whole-row upsert, the original path
            upserts = (
                source.filter(~F.col(delete_col)) if delete_col else source
            ).select(*cols)
            if not insert_unmatched:
                upserts = upserts.join(
                    live.select(*keys).distinct(), keys, "left_semi"
                )
            new_files: list[dict[str, Any]] = []
            if rewrite:
                survivors = (
                    self._scan_entries(rewrite, schema)
                    .join(src_keys, keys, "left_anti")
                )
                new_files += self._write_data_files(
                    survivors.unionByName(upserts)
                )
            else:
                new_files += self._write_data_files(upserts)
        else:
            new_files = self._merge_clause_files(
                source, keys, delete_col, schema, rewrite, live,
                when_matched_update, when_matched_condition,
                insert_unmatched, not_matched_by_source_delete, m,
            )
        return self._commit(
            "replace",
            keep + new_files,
            schema.simpleString(),
            meta,
            base_version=m["version"],
        )

    def _merge_clause_files(
        self,
        source: DataFrame,
        keys: list[str],
        delete_col: str | None,
        schema,
        rewrite: list[dict[str, Any]],
        live: DataFrame,
        when_matched_update: dict[str, str] | None,
        when_matched_condition: str | None,
        insert_unmatched: bool,
        not_matched_by_source_delete: str | None,
        m: dict[str, Any],
    ) -> list[dict[str, Any]]:
        """Rewrite-side row derivation for the conditional-clause MERGE
        path: ONE left join of the rewrite files against the source
        decides every target row's fate (flagged delete / conditional
        SET update / unchanged carry / source-less retire), and
        unmatched source rows append NULL-backfilled inserts. Cost
        shape matches the whole-row path: a key join over the rewrite
        files plus one pass over the key-unique source."""
        cols = [f.name for f in schema.fields]
        by_name = {f.name: f for f in schema.fields}
        if when_matched_update:
            unknown = sorted(set(when_matched_update) - set(cols))
            if unknown:
                raise ValueError(f"unknown columns in SET: {unknown}")
        reserved = {"__m", "__doomed"} & (set(cols) | set(source.columns))
        if reserved:
            raise ValueError(
                f"merge reserves the column name(s) {sorted(reserved)}"
            )
        no_adds = when_matched_update is not None and not insert_unmatched
        if not rewrite and no_adds:
            return []  # nothing rewritten, nothing inserted
        src_flag = source.withColumn("__m", F.lit(True)).alias("s")
        rows_out = None
        if rewrite:
            tgt = self._scan_entries(rewrite, schema)
            # the retire predicate speaks bare TARGET names: evaluate it
            # BEFORE the join, where they are unambiguous
            tgt = tgt.withColumn(
                "__doomed",
                F.expr(not_matched_by_source_delete)
                if not_matched_by_source_delete
                else F.lit(False),
            ).alias("t")
            j = tgt.join(src_flag, keys, "left")
            matched = F.col("__m").isNotNull()
            flagged = (
                matched & F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))
                if delete_col
                else F.lit(False)
            )
            cond = (
                F.expr(when_matched_condition)
                if when_matched_condition
                else F.lit(True)
            )
            doomed = (~matched) & F.col("__doomed")
            if when_matched_update:
                do_update = matched & ~flagged & cond
                out_cols = [
                    F.col(c)
                    if c in keys
                    else (
                        F.when(
                            do_update,
                            F.expr(when_matched_update[c]).cast(
                                by_name[c].dataType
                            ),
                        )
                        .otherwise(F.col(f"t.{c}"))
                        .alias(c)
                        if c in when_matched_update
                        else F.col(f"t.{c}").alias(c)
                    )
                    for c in cols
                ]
                keep_row = ~flagged & ~doomed
            else:
                # whole-row replacement: matched rows drop here and
                # re-enter from the source side below
                out_cols = [
                    F.col(c) if c in keys else F.col(f"t.{c}").alias(c)
                    for c in cols
                ]
                keep_row = ~matched & ~doomed
            rows_out = j.filter(keep_row).select(*out_cols)
        # source-side additions
        adds = source.filter(~F.col(delete_col)) if delete_col else source
        if when_matched_update is not None:
            # matched rows were updated in place: only NEW keys insert
            adds = (
                adds.join(live.select(*keys).distinct(), keys, "left_anti")
                if insert_unmatched
                else adds.limit(0)
            )
        elif not insert_unmatched:
            adds = adds.join(live.select(*keys).distinct(), keys, "left_semi")
        ins = adds.select(
            *[
                F.col(c)
                if c in adds.columns
                else F.lit(None).cast(by_name[c].dataType).alias(c)
                for c in cols
            ]
        )
        assigned = False
        for col, spec in dict(m.get("identity") or {}).items():
            if col in adds.columns:
                continue  # whole-row path: source already enriched
            # SET-clause inserts: NULL-backfilled identity would break
            # uniqueness silently — assign fresh watermark-derived ids
            # (matched rows retained theirs through the t.<col> carry);
            # watermark from the CALLER's CAS-base manifest snapshot
            wm = self._identity_watermark(m, col, spec)
            ins = ins.withColumn(
                col,
                (
                    F.lit(wm)
                    + F.lit(spec["step"]) * F.monotonically_increasing_id()
                ).cast("bigint"),
            )
            assigned = True
        rows_out = ins if rows_out is None else rows_out.unionByName(ins)
        if assigned:
            # freeze the nondeterministic assignment across the
            # validation + write passes
            rows_out = rows_out.localCheckpoint(eager=True)
        return self._write_data_files(rows_out)

    def replicate_from(
        self,
        producer: "VersionedTable",
        keys: list[str],
        since_version: int,
        version: int | None = None,
    ) -> CommitInfo:
        """CDC replication: fold the producer's row-level change feed
        over ``(since_version, version]`` into this table with ONE
        merge commit. The per-key final state is resolved first (last
        commit wins; within a commit an insert beats the delete of the
        same key — the CoW survivor churn), so replays and multi-step
        ranges collapse to a single upsert/delete set bounded by the
        changed keys, and the target provably converges to the
        producer's snapshot at ``version``."""
        ch = producer.read_changes_rows(since_version, version)
        final = cdf_final_state(ch, keys)
        return self.merge(
            final,
            keys,
            delete_col="__delete",
            meta={"replicated_from": producer.root, "source_version":
                  producer.manifest(version)["version"]},
            # follow the producer through additive schema evolution
            merge_schema=True,
        )

    def replace_where(
        self,
        predicate: str,
        df: DataFrame,
        meta: dict[str, Any] | None = None,
        attempts: int = 10,
    ) -> CommitInfo:
        """Delta-style ``replaceWhere``: atomically delete the rows
        matching ``predicate`` AND insert ``df``'s rows, as ONE commit.

        Copy-on-write like ``delete_where`` (only files containing
        matching rows are rewritten; the rest carry over by reference)
        plus the replacement's new files, all landing in a single
        manifest — so no reader can ever observe the deleted-but-not-
        yet-replaced intermediate state that a delete+append pair would
        expose between its two versions.  The maintenance shape for
        partition-scoped rewrites (e.g. repacking a shard).  Retries
        the whole derive+commit on a lost CAS race (``attempts=1``
        restores raise-on-conflict)."""
        return self.commit_with_retry(
            lambda t: t._replace_where_once(predicate, df, meta), attempts
        )

    def _replace_where_once(
        self, predicate: str, df: DataFrame, meta: dict[str, Any] | None = None
    ) -> CommitInfo:
        m = self.manifest()
        schema = self._schema_of(m)
        live = self._apply_dv(self._lineage_scan(m["files"], schema), m["files"])
        hit_rels = {
            r["__file"]
            for r in live.filter(F.expr(predicate))
            .select("__file")
            .distinct()
            .collect()  # bounded by file count, not rows
        }
        keep = [e for e in m["files"] if e["path"] not in hit_rels]
        rewrite = [e for e in m["files"] if e["path"] in hit_rels]
        new_files: list[dict[str, Any]] = []
        if rewrite:
            survivors = self._scan_entries(rewrite, schema).filter(
                ~F.expr(predicate)
            )
            new_files += self._write_data_files(survivors, enforce=False)
        # replacement rows behave like an append: the engine assigns
        # identity values (fresh ids — ALWAYS semantics forbid reuse)
        # and computes omitted generated columns, from the SAME
        # snapshot the CAS below guards (silently writing the columns
        # as NULL would break uniqueness/generation invariants)
        df = self._apply_generated(self._apply_identity(df, m), m)
        new_files += self._write_data_files(df)
        return self._commit(
            "replace", keep + new_files, m["schema"], meta,
            base_version=m["version"],
        )

    def optimize(
        self,
        target_rows_per_file: int = 1_000_000,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        mode: str = "full",
        attempts: int = 10,
    ) -> CommitInfo:
        """OPTIMIZE: rewrite small files into ~target-sized files
        (bin-packing), optionally range-clustered on ``cluster_by``
        (single-column locality) or Morton-clustered on ``zorder_by``
        (multi-column locality — every z-ordered column's per-file
        range tightens, so ``read_pruned`` skips on any of them) so
        manifest stats turn into skipped I/O. Content is unchanged —
        only the file layout — and history is preserved: old versions
        still read their original files until vacuumed.

        * ``mode="full"``: rewrite the whole snapshot — the clustering
          pass (a global sort/z-order needs every row to tighten every
          file's range).
        * ``mode="compact"`` (Delta's OPTIMIZE bin-packing): rewrite
          ONLY entries that are under-sized (live rows <
          ``target_rows_per_file``) or carry a deletion vector (the
          rewrite folds the vector away); well-sized clean files carry
          over BY REFERENCE. This is the steady-state maintenance
          shape at 100 TB — cost ∝ small-file backlog, not table size
          — so a streaming-ingested table stays scannable without ever
          paying a snapshot rewrite. Clustering flags apply to the
          compacted subset only.

        Either mode is one atomic commit, so concurrent readers never
        see a half-compacted table; retries on a lost CAS race."""
        if cluster_by and zorder_by:
            raise ValueError("pass cluster_by or zorder_by, not both")
        if mode not in ("full", "compact"):
            raise ValueError(f"mode must be 'full' or 'compact', got {mode!r}")
        return self.commit_with_retry(
            lambda t: t._optimize_once(
                target_rows_per_file, cluster_by, zorder_by, mode
            ),
            attempts,
        )

    def _optimize_once(
        self,
        target_rows_per_file: int,
        cluster_by: list[str] | None,
        zorder_by: list[str] | None,
        mode: str,
    ) -> CommitInfo:
        m = self.manifest()
        schema = self._schema_of(m)
        if not m["files"]:
            raise VersionNotFoundError(f"version {m['version']} is empty")
        if mode == "compact":
            rewrite = [
                e
                for e in m["files"]
                if e.get("dv") or self._entry_live_rows(e) < target_rows_per_file
            ]
            rw = {e["path"] for e in rewrite}
            keep = [e for e in m["files"] if e["path"] not in rw]
            if len(rewrite) < 2 and not any(e.get("dv") for e in rewrite):
                # nothing to gain: no bin to pack, no vector to fold —
                # metadata-only commit keeps the call atomic/idempotent
                return self._commit(
                    "optimize", list(m["files"]), m["schema"],
                    base_version=m["version"],
                )
            current = self._scan_entries(rewrite, schema)
        else:
            rewrite, keep = list(m["files"]), []
            current = self._scan_entries(rewrite, schema)
        total_rows = sum(self._entry_live_rows(f) for f in rewrite)
        n_out = max(1, -(-total_rows // target_rows_per_file))
        if zorder_by:
            from finalpipeline_spark.operators.zorder import zorder_cluster

            packed = zorder_cluster(current, zorder_by, n_out)
        elif cluster_by:
            packed = current.repartitionByRange(n_out, *[F.col(c) for c in cluster_by])
        else:
            packed = current.coalesce(n_out)
        return self._commit(
            "optimize",
            keep + self._write_data_files(packed, enforce=False),
            m["schema"],
            base_version=m["version"],
        )

    def rollback(self, version: int) -> CommitInfo:
        """Commit a NEW version whose content equals ``version``'s.
        History is append-only; nothing is deleted or rewritten."""
        base = self.latest_version()
        m = self.manifest(version)
        return self._commit(
            "rollback", list(m["files"]), m["schema"], base_version=base
        )

    def clone_to(
        self, dest_root: str, version: int | None = None, deep: bool = False
    ) -> "VersionedTable":
        """CLONE (Delta semantics), two strengths:

        * ``deep=False`` — SHALLOW: a new table at ``dest_root`` whose
          v0 manifest references this table's data files BY POINTER
          (each entry carries ``base`` = this root) — a zero-copy fork
          carrying stats and blooms. The clone's own writes (appends,
          CoW deletes, optimize) land under its own root; the source
          is never touched. Caveat (same as Delta): vacuuming the
          SOURCE can delete files a shallow clone still references —
          shallow clones are forks for experimentation, not backups.
        * ``deep=True`` — DEEP: the snapshot's LIVE rows are rewritten
          into the destination as one distributed Spark job (deletion
          vectors applied and dropped, stats/blooms regenerated), so
          the clone owns every byte: vacuum or delete the source and
          the clone is unaffected. Executor-parallel by construction —
          never a driver-side file-copy loop — which is the shape that
          survives a 100 TB source.

        Either way the clone carries the source's CHECK constraints
        and records its lineage (``cloned_from``/``source_version``)
        in the manifest."""
        m = self.manifest(version)
        dest = VersionedTable(
            self.spark,
            dest_root,
            bloom_col=self.bloom_col,
            bloom_bits=self.bloom_bits,
            bloom_k=self.bloom_k,
        )
        if deep and m["files"]:
            # rows already satisfied the source's constraints — skip
            # the re-validation pass on the rewrite
            cloned = dest._write_data_files(
                self._scan_entries(m["files"], self._schema_of(m)), enforce=False
            )
        elif deep:
            cloned = []
        else:
            cloned = [{**f, "base": f.get("base", self.root)} for f in m["files"]]
        dest._commit(
            "clone",
            cloned,
            m["schema"],
            meta={
                "cloned_from": self.root,
                "source_version": m["version"],
                "deep": deep,
            },
            base_version=dest.latest_version(),
            constraints=m.get("constraints"),  # table properties clone too
            # a SHALLOW clone points at the source's (possibly cmap'd)
            # files by reference, so it inherits the source's reader
            # requirement; a DEEP clone rewrote every file (cmaps
            # purged) and owes nothing
            reader=None if deep else m.get("reader"),
        )
        return dest

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
        clone base; ``data/c<uuid>/<part>`` never collides)."""
        return F.regexp_extract(
            F.col("_metadata.file_path"), r"(data/c[0-9a-f]{32}/[^/]+)$", 1
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
            return self.spark.createDataFrame([], _DV_SCHEMA)
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

        Appends are file-level additions, so the delta is exactly the
        files present in the target manifest but not the base one: a
        manifest-sized set diff, then a scan of only the new files.
        Raises if the range crosses any non-append commit — an
        overwrite/rollback/optimize has no row-level delta, and a CoW
        delete rewrites surviving rows into NEW files (streaming those
        as additions would double-count them); the caller must
        reprocess from the snapshot."""
        target = self.manifest(version)
        base = self.manifest(since_version)
        for v in range(since_version + 1, target["version"] + 1):
            m = self._read_manifest_file(v)
            if m["action"] in ("rename_column", "readd_column"):
                # pre-rename manifests' entries lack the rename's
                # column mapping — same refusal as read_changes_rows;
                # a re-add would let a pre-drop-schema consumer read
                # new-era values under the old-era column
                raise ValueError(
                    f"version {v} remaps a column ({m['action']}): no "
                    "incremental row delta across a column mapping "
                    "change — reprocess from the snapshot"
                )
            if _same_file_refs(self._read_manifest_file(v - 1)["files"], m["files"]):
                # metadata-only commit (constraint add/drop, column
                # add/drop/widen, no-op compaction): identical file list
                # and vector refs ⇒ provably zero row delta — skip it
                continue
            if m["action"] != "append":
                raise ValueError(
                    f"version {v} is '{m['action']}': no incremental row delta "
                    "across content mutation — reprocess from the snapshot"
                )
        base_paths = {self._abs(f) for f in base["files"]}
        new = [f for f in target["files"] if self._abs(f) not in base_paths]
        if not new:
            return self.read(target["version"]).filter(F.lit(False))
        return self.spark.read.schema(self._schema_of(target)).parquet(
            *(self._abs(f) for f in new)
        )

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
        the change, not the snapshot. Whole-table rewrites
        (overwrite/rollback/optimize/clone) still raise: optimize's
        diff is provably empty but would cost a full-table comparison,
        and the others have no meaningful row delta."""
        target = self.manifest(version)
        tv = target["version"]
        self.manifest(since_version)  # validates the base is live
        out: DataFrame | None = None
        for v in range(since_version + 1, tv + 1):
            m = self._read_manifest_file(v)
            prev = self._read_manifest_file(v - 1)
            if m["action"] in ("rename_column", "readd_column"):
                # pre-rename manifests' entries lack the rename's
                # column mapping: imposing the target schema on them
                # would silently NULL the renamed column — refuse. A
                # re-add is the same hazard mirrored: a consumer that
                # processed the pre-drop column would read new-era
                # values under the old-era name.
                raise ValueError(
                    f"version {v} remaps a column ({m['action']}): no "
                    "row-level delta across a column mapping change — "
                    "reprocess from the snapshot"
                )
            if _same_file_refs(prev["files"], m["files"]):
                # metadata-only commit (constraint add/drop, column
                # drop, no-op compaction): identical file list and
                # vector refs ⇒ provably zero row delta — skip it
                # whatever its action says
                continue
            if m["action"] not in ("append", "delete", "replace"):
                raise ValueError(
                    f"version {v} is '{m['action']}': whole-table rewrite "
                    "has no row-level delta — reprocess from the snapshot"
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
            added = [cur_by[p] for p in sorted(set(cur_by) - set(prev_by))]
            dropped = [prev_by[p] for p in sorted(set(prev_by) - set(cur_by))]
            # A merge-on-read delete changes no file list — the delta
            # lives in the deletion-vector references: rows at positions
            # newly present in a file's vector are that commit's deletes
            # (positions are never REMOVED from a live entry's vector —
            # only rollback restores old references, and rollback raises
            # above). Scans of added/dropped files are entry-aware too,
            # so rows a vector already killed can't churn the diff.
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
                new_e = [n for _, n in dv_changed]
                newly = self._dv_positions(new_e).join(
                    self._dv_positions(old_e), ["__file", "__pos"], "left_anti"
                )
                n_newly = sum(
                    (n.get("dv") or {}).get("deleted", 0)
                    - (o.get("dv") or {}).get("deleted", 0)
                    for o, n in dv_changed
                )  # exact from manifest metadata — positions only grow
                if n_newly <= _DV_BROADCAST_ROWS:
                    newly = F.broadcast(newly)
                dv_dels = (
                    self._lineage_scan(new_e, schema)
                    .join(newly, ["__file", "__pos"], "left_semi")
                    .select(*schema.fieldNames())
                    .withColumn("_change_type", F.lit("delete"))
                )
                step = dv_dels if step is None else step.unionByName(dv_dels)
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
        only — the exact equality filter is still applied."""
        if self.bloom_col is None:
            raise ValueError("table was opened without a bloom_col")
        m = self.manifest(version)
        hits = []
        for f in m["files"]:
            bloom = f.get("bloom")
            if bloom is None or self._bloom_might_contain(bloom, value):
                hits.append(f)
        if not hits:
            return self.read(version).filter(F.lit(False))
        return self._scan_entries(hits, self._schema_of(m)).filter(
            F.col(self.bloom_col) == F.lit(value)
        )

    def files(self, version: int | None = None) -> DataFrame:
        """Iceberg-style ``files`` metadata table for one snapshot:
        (path, base, rows, stats-as-JSON, has_bloom) — the manifest as
        a queryable DataFrame, so operators can reason about layout
        (file sizes, stat tightness, bloom coverage) with plain SQL.
        Manifest-sized, never data-sized."""
        m = self.manifest(version)
        rows = [
            (
                f["path"],
                f.get("base", self.root),
                f["rows"],
                json.dumps(f.get("stats", {}), sort_keys=True),
                "bloom" in f,
                (f.get("dv") or {}).get("deleted", 0),
            )
            for f in m["files"]
        ]
        return self.spark.createDataFrame(
            rows,
            "path string, base string, rows bigint, stats string, "
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
        return self.spark.createDataFrame(
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
        adjusted = []
        last = float("-inf")
        for v in self.versions_live():
            m = self._read_manifest_file(v)
            t = m.get("ts")
            if t is None:
                p = self._manifest_path(v)
                if not self._fs.exists(p):
                    p = self._archive_path(v)  # vacuum archived it
                t = self._fs.getFileStatus(p).getModificationTime() / 1000.0
            t = max(float(t), last + 1e-3)
            adjusted.append((v, t))
            last = t
        winner = None
        for v, t in adjusted:
            if t <= ts:
                winner = v
        if winner is None:
            raise VersionNotFoundError(
                f"no live version of {self.root} at or before epoch "
                f"timestamp {ts}"
            )
        return winner

    # -- maintenance ---------------------------------------------------
    def recover_log(self) -> list[int]:
        """Retire unparseable manifests (crash mid-write) by renaming
        them aside, so their version numbers become claimable again."""
        log = self._p(_LOG_DIR)
        if not self._fs.exists(log):
            return []
        retired = []
        for st in self._fs.listStatus(log):
            name = st.getPath().getName()
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            v = int(name[1:-5])
            try:
                self._read_manifest_file(v)
            except VersionNotFoundError:
                continue  # vanished since listStatus: a racing claim won
            except json.JSONDecodeError:
                # Same claim protocol as _write_manifest's auto-recovery:
                # grace-gated (a fresh fragment may be a live writer's
                # create→write window), unique quarantine name (rename
                # success == exclusive claim), then verify-after-claim
                # so a manifest that became valid mid-race is restored,
                # never retired.
                if not self._older_than_grace(st.getPath()):
                    continue
                q = self._p(_LOG_DIR, name + ".aborted-" + uuid.uuid4().hex)
                if not self._rename_claim(st.getPath(), q):
                    continue  # a racing recoverer won; nothing to retire
                try:
                    json.loads(self._read_raw(q).decode("utf-8"))
                    stole_valid = True
                except (json.JSONDecodeError, UnicodeDecodeError):
                    stole_valid = False
                if stole_valid:
                    # Became valid between the probe and the claim:
                    # restore it — checked, like _write_manifest's path
                    # (an unverified rename could strand a committed
                    # version at a vacuum-reclaimable quarantine name).
                    self._restore_quarantined(q, st.getPath(), v)
                else:
                    retired.append(v)
        return retired

    def vacuum(
        self,
        retain_last: int = 1,
        grace_seconds: float = 7 * 24 * 3600,
        dry_run: bool = False,
    ) -> list[str]:
        """Delete data files referenced ONLY by versions older than the
        last ``retain_last`` live ones, plus orphan commit dirs from
        aborted commits; mark expired manifests (kept as tombstones so
        time travel to them errors cleanly rather than reading holes).

        ``grace_seconds`` is the retention threshold (Delta's
        retention-hours approach, default 7 days): an unreferenced file
        is reclaimed only once its modification time is older than the
        grace period.  Without it, an IN-FLIGHT commit — data files
        written, manifest not yet created, per the commit protocol — is
        indistinguishable from an aborted-commit orphan, and vacuum
        could delete files a racing writer is about to reference,
        corrupting that version for all readers.  Tests (and callers
        that can prove no concurrent writers) pass ``grace_seconds=0``.

        ``dry_run=True`` (Delta's VACUUM ... DRY RUN) returns the same
        reclaimable-path list WITHOUT deleting anything or expiring any
        manifest — the audit step before an irreversible retention run.
        """
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        live = self.versions_live()
        retained, expired = live[-retain_last:], live[:-retain_last]
        referenced = set()
        for v in retained:
            for f in self._read_manifest_file(v)["files"]:
                referenced.add(f["path"])
                if f.get("dv"):
                    referenced.add(f["dv"]["path"])
        cutoff_ms = (time.time() - grace_seconds) * 1000.0
        deleted: list[str] = []
        data = self._p(_DATA_DIR)
        if self._fs.exists(data):
            for commit_st in self._fs.listStatus(data):
                cdir = commit_st.getPath().getName()
                for st in self._fs.listStatus(commit_st.getPath()):
                    name = st.getPath().getName()
                    rel = f"{_DATA_DIR}/{cdir}/{name}"
                    if st.getModificationTime() > cutoff_ms:
                        continue  # possibly an in-flight commit: retain
                    if name.startswith(("_", ".")):
                        if not dry_run:
                            try:
                                self._fs.delete(st.getPath(), False)
                            except Exception:
                                # committer lint (_SUCCESS, _temporary)
                                # that grew contents or vanished since
                                # the listing — never worth failing the
                                # whole vacuum over; retry next run
                                pass
                    elif rel not in referenced:
                        if not dry_run:
                            self._fs.delete(st.getPath(), False)
                        deleted.append(rel)
                # reap a fully-emptied commit dir — but ONLY an aged one:
                # a racing writer's brand-new dir is EMPTY for the
                # instant between its mkdirs and its first file, and
                # deleting it there kills that write mid-commit (the
                # committer's setupJob chmod fails on the vanished dir —
                # found by the cross-process writers-vs-vacuum soak)
                if (
                    not dry_run
                    and commit_st.getModificationTime() <= cutoff_ms
                    and not self._fs.listStatus(commit_st.getPath())
                ):
                    self._fs.delete(commit_st.getPath(), True)
        # reclaim deletion-vector files referenced only by expired
        # versions (each _dv/d<uuid> dir is one delete commit's vector;
        # grace applies — an in-flight MoR delete writes its vector
        # before its manifest, exactly like data files)
        dv = self._p(_DV_DIR)
        if self._fs.exists(dv):
            for st in self._fs.listStatus(dv):
                rel = f"{_DV_DIR}/{st.getPath().getName()}"
                if st.getModificationTime() > cutoff_ms:
                    continue
                if rel not in referenced:
                    if not dry_run:
                        self._fs.delete(st.getPath(), True)
                    deleted.append(rel)
        # reclaim aged recovery quarantines (.aborted-<uuid> fragments):
        # forensic value decays, and a busy log would otherwise grow one
        # junk file per recovered crash forever
        log = self._p(_LOG_DIR)
        if self._fs.exists(log):
            for st in self._fs.listStatus(log):
                name = st.getPath().getName()
                # '.'-prefixed names are ChecksumFileSystem .crc
                # sidecars from before the raw-fs switch — stale lint
                # the raw protocol neither reads nor maintains
                if (
                    ".aborted-" in name or name.startswith(".")
                ) and st.getModificationTime() <= cutoff_ms:
                    if not dry_run:
                        self._fs.delete(st.getPath(), False)
                    deleted.append(f"{_LOG_DIR}/{name}")
        if dry_run:
            return deleted
        for v in expired:
            m = self._read_manifest_file(v)
            if not m.get("expired"):
                m["expired"] = True
                # tombstone rewrite: not part of the commit protocol, so
                # plain overwrite is fine (content change is monotonic).
                # Write wherever the manifest LIVES — recreating a hot
                # copy of an archived manifest would shadow the archive
                # with content that the next archival pass can't move
                # over it.
                path = self._manifest_path(v)
                if not self._fs.exists(path) and self._fs.exists(
                    self._archive_path(v)
                ):
                    path = self._archive_path(v)
                out = self._fs.create(path, True)
                try:
                    out.write(bytearray(json.dumps(m).encode("utf-8")))
                finally:
                    out.close()
        self._archive_anchored()
        return deleted

    def _archive_anchored(self) -> int:
        """Maintenance step of vacuum: drop a fresh log anchor, move
        every anchored manifest from the hot ``_log/`` into
        ``_log/archive/`` (readable by direct name probe — zero
        listing), and retire superseded anchor files. Keeps the hot
        log listing O(commits since last vacuum) forever. Safe against
        concurrent readers: reads probe hot-then-archive, so the
        rename's vanish window costs one extra probe; never touches
        slots above the anchor, so the commit protocol's claim surface
        is unaffected."""
        anchor = self.write_anchor()
        latest = self._latest_anchor() if anchor is None else anchor
        if latest is None:
            return 0
        log = self._p(_LOG_DIR)
        arch = self._p(_LOG_DIR, _ARCHIVE_DIR)
        moved = 0
        if not self._fs.exists(arch):
            self._fs.mkdirs(arch)
        for st in self._fs.listStatus(log):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                try:
                    v = int(name[1:-5])
                except ValueError:
                    continue
                # keep the anchored LATEST manifest hot (v < latest, not
                # <=): defense-in-depth for racing listings — the newest
                # version stays visible to a plain readdir even when the
                # anchor-file swap is caught mid-listing
                if v < latest and not self._fs.exists(self._archive_path(v)):
                    if self._fs.rename(st.getPath(), self._archive_path(v)):
                        moved += 1
            elif name.startswith("checkpoint-") and name.endswith(".json"):
                try:
                    av = int(name[len("checkpoint-"):-5])
                except ValueError:
                    continue  # junk name: not ours to reap
                if av < latest:
                    self._fs.delete(st.getPath(), False)
        return moved


def _json_safe(v: Any) -> Any:
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)  # dates/timestamps → ISO-ish repr; stats stay comparable
