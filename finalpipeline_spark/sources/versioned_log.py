"""Log protocol of the versioned table: manifest claim/recovery,
anchors, vacuum, and the CAS commit core.

One of three method-providing mixins composed into
:class:`finalpipeline_spark.sources.versioned.VersionedTable` (the
others: versioned_schema, versioned_dml). The split is organizational
only — every method still runs on the composed table object (self.root,
self._fs, self.spark from VersionedTable.__init__). This module owns
everything that touches the ``_log/`` directory: exclusive-create
version claims, writer self-verification, aborted-fragment recovery,
log anchors and archival, vacuum, and the generic ``_commit`` +
``commit_with_retry`` machinery every writer goes through.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any

from pyspark.sql import functions as F

from finalpipeline_spark.sources.versioned_base import (
    _ANCHOR_FMT,
    _ARCHIVE_DIR,
    _DATA_DIR,
    _DV_DIR,
    _LOG_DIR,
    _MANIFEST_FMT,
    _NO_CAS,
    _READER_REQUIREMENTS,
    _VERIFY_MARGIN_SECONDS,
    _VERIFY_POLL_SECONDS,
    CommitInfo,
    ConcurrentCommitError,
    ProtocolVersionError,
    VersionNotFoundError,
    _is_file_not_found,
)

# The protocol capabilities of THIS BUILD are read through the base
# module attribute (not a from-import binding) so a test or an
# operator pinning an older capability can patch ONE owner
# (versioned_base) and every checkpoint — read gate, write gate,
# stickiness — sees it.
from finalpipeline_spark.sources import versioned_base as _base
from finalpipeline_spark.sources.local_fs import LocalPath


# sentinel: "no explicit bloom_index op on this commit" (None must
# remain a valid explicit value meaning CLEAR the property)
_KEEP_BLOOM = object()

class LogProtocolMixin:
    """Methods are documented where they live; see the module docstring
    for the carve. Composed into VersionedTable — never instantiated
    directly."""

    def _p(self, *parts: str):
        s = "/".join((self.root,) + parts)
        if self._fs_local:
            return LocalPath(s)
        return self._jvm.org.apache.hadoop.fs.Path(s)

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
        parsed = []
        for name in names:
            try:
                parsed.append(int(name[1:-5]))
            except ValueError:
                continue  # stray junk name
        # probe DESCENDING: the first parseable manifest proves all its
        # ancestors (contiguity), so the loop normally opens ONE
        # manifest — not every unanchored one (ascending order made a
        # young log's every versions() call O(commits since anchor)
        # manifest reads; only crash fragments/racing quarantines cost
        # extra probes, and those are tail-bounded)
        for v in sorted(parsed, reverse=True):
            if v <= latest:
                break  # descending: everything below is implied
            try:
                self._read_manifest_file(v)
            except json.JSONDecodeError:
                continue  # an aborted fragment is invisible
            except VersionNotFoundError:
                # vanished between listStatus and the read: an aborted
                # fragment being quarantined by a racing recovery (the
                # read itself already probes the archive)
                continue
            latest = v
            break  # ancestors implied
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
            if m.get("reader", 1) > _base.SUPPORTED_READER_VERSION:
                raise ProtocolVersionError(
                    f"version {version} of {self.root} requires reader "
                    f"protocol {m['reader']} (this build supports "
                    f"{_base.SUPPORTED_READER_VERSION}) — upgrade before "
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
        stream = self._fs.open(path)  # FileNotFoundError / FNF if gone
        try:
            if self._fs_local:  # plain Python file object
                return stream.read()
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
        bloom_index: dict | None | object = _KEEP_BLOOM,
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
            # values stay honest). FLOOR to ms, never round: rounding
            # up can postdate the stored time past the true commit
            # instant by ≤0.5 ms, so a reader grabbing time.time()
            # right after the commit returns could miss its own commit
            # (observed as a flaky TIMESTAMP AS OF miss).
            "ts": int(time.time() * 1000) / 1000.0,
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
        if pm is not None and pm.get("writer", 1) > _base.SUPPORTED_WRITER_VERSION:
            # a table whose head demands a newer writer would have its
            # invariants corrupted by this build's commits — refuse
            # BEFORE claiming a version (the read-side guard already
            # refused if the head also demands a newer reader)
            raise ProtocolVersionError(
                f"{self.root} requires writer protocol {pm['writer']} "
                f"(this build supports {_base.SUPPORTED_WRITER_VERSION}) — "
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
        # bloom-index geometry is a table property too: recorded by the
        # first bloom-configured writer, carried forward by every commit
        # — so config-less handles and the SQL write path keep the
        # point-lookup index populated (an explicitly configured handle
        # may re-declare, replacing the geometry for FUTURE files; old
        # entries keep the words they were written with)
        if bloom_index is not _KEEP_BLOOM:
            # explicit property evolution (SET/UNSET TBLPROPERTIES):
            # a dict replaces the geometry, None clears it — both win
            # over the handle config and the carry-forward
            if bloom_index:
                manifest["bloom_index"] = dict(bloom_index)
        elif self.bloom_col:
            manifest["bloom_index"] = {
                "col": self.bloom_col,
                "bits": self.bloom_bits,
                "k": self.bloom_k,
            }
        elif pm is not None and pm.get("bloom_index"):
            manifest["bloom_index"] = dict(pm["bloom_index"])
        # partition columns are an IMMUTABLE table property: declared
        # by the creating handle's config at version 0, carried forward
        # by every commit; a handle declaring a DIFFERENT set against
        # an existing table refuses (repartitioning is a rewrite into a
        # new table, not a metadata flip)
        prev_pb = pm.get("partition_by") if pm is not None else None
        own_pb = getattr(self, "partition_by", None)
        if pm is None:
            if own_pb:
                manifest["partition_by"] = list(own_pb)
        elif prev_pb:
            if own_pb is not None and list(own_pb) != list(prev_pb):
                raise ValueError(
                    f"{self.root} is partitioned by {prev_pb}; this "
                    f"handle declares {own_pb} — partitioning is fixed "
                    "at table creation"
                )
            manifest["partition_by"] = list(prev_pb)
        elif own_pb:
            raise ValueError(
                f"cannot declare partition columns {own_pb} on the "
                f"existing unpartitioned table {self.root} — rewrite "
                "into a new partitioned table instead"
            )
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

    def _adjusted_live_times(self) -> list[tuple[int, float]]:
        """``(version, commit_time)`` for every live version, adjusted
        to be strictly increasing across versions: with multiple
        writers on skewed clocks a later version can carry an earlier
        raw timestamp, and un-adjusted times would make time-based
        resolution non-monotonic. Raw times come from each manifest's
        recorded wall clock (``ts``), falling back to the manifest
        file's mtime for tables written before timestamps were
        recorded. Shared by TIMESTAMP AS OF resolution and time-based
        vacuum retention, so both agree on every version's age."""
        adjusted: list[tuple[int, float]] = []
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
        return adjusted

    def vacuum(
        self,
        retain_last: int = 1,
        grace_seconds: float = 7 * 24 * 3600,
        dry_run: bool = False,
        retain_hours: float | None = None,
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

        ``retain_hours`` adds Delta's TIME-based history retention
        (``RETAIN n HOURS``): every live version whose adjusted commit
        time is within the last ``retain_hours`` hours is retained IN
        ADDITION to the last ``retain_last`` versions (the two rules
        union, and retain_last >= 1 guarantees the head always
        survives, Delta's invariant too). Ages use the same adjusted
        commit times as TIMESTAMP AS OF resolution, so a version
        reachable by time travel is never expired by a horizon that
        should keep it.
        """
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        live = self.versions_live()
        keep = set(live[-retain_last:])
        if retain_hours is not None:
            if retain_hours < 0:
                raise ValueError("retain_hours must be >= 0")
            cutoff = time.time() - retain_hours * 3600.0
            keep |= {v for v, t in self._adjusted_live_times() if t >= cutoff}
        retained = [v for v in live if v in keep]
        expired = [v for v in live if v not in keep]
        referenced = set()
        for v in retained:
            for f in self._read_manifest_file(v)["files"]:
                referenced.add(f["path"])
                if f.get("dv"):
                    referenced.add(f["dv"]["path"])
        cutoff_ms = (time.time() - grace_seconds) * 1000.0
        deleted: list[str] = []
        data = self._p(_DATA_DIR)

        def _walk_commit_dir(dir_path, rel_prefix: str) -> None:
            """One level of a commit dir's contents; recurses into
            partition subdirectories (``pv__<col>=...`` partitionBy
            layout), reaping each once emptied and aged."""
            for st in self._fs.listStatus(dir_path):
                name = st.getPath().getName()
                rel = f"{rel_prefix}/{name}"
                if st.isDirectory() and not name.startswith(("_", ".")):
                    _walk_commit_dir(st.getPath(), rel)
                    if (
                        not dry_run
                        and st.getModificationTime() <= cutoff_ms
                        and not self._fs.listStatus(st.getPath())
                    ):
                        self._fs.delete(st.getPath(), True)
                    continue
                if st.getModificationTime() > cutoff_ms:
                    continue  # possibly an in-flight commit: retain
                if name.startswith(("_", ".")):
                    if not dry_run:
                        try:
                            self._fs.delete(st.getPath(), True)
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

        if self._fs.exists(data):
            for commit_st in self._fs.listStatus(data):
                cdir = commit_st.getPath().getName()
                _walk_commit_dir(commit_st.getPath(), f"{_DATA_DIR}/{cdir}")
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


