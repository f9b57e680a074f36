"""Shared substrate of the versioned-table package: constants,
exceptions, commit metadata, and engine-free helpers.

Split out of sources/versioned.py (round 9) so the log-protocol, DML,
and schema-evolution layers can live in separate modules without
circular imports. Everything here is re-exported by
``finalpipeline_spark.sources.versioned`` — import from there unless
you are one of the versioned_* siblings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


# DDL-string → DataType.json() memo for parse_ddl_cached. Keyed on the
# exact DDL text; schema strings repeat across every manifest access of
# a table's lifetime, and each JVM parse is a ~5-10 ms py4j round trip.
_DDL_JSON_MEMO: dict[str, str] = {}
_DDL_MEMO_CAP = 4096


def parse_ddl_cached(ddl: str):
    """``_parse_datatype_string`` with a process-level memo. The JVM
    parses each DISTINCT DDL string once; repeat calls rebuild the
    DataType from its stored JSON in pure Python (~µs), and every call
    returns a FRESH object — no aliasing, exactly like the uncached
    parser. Invalid DDL stays loud (the miss path parses eagerly)."""
    from pyspark.sql.types import (
        _parse_datatype_json_string,
        _parse_datatype_string,
    )

    js = _DDL_JSON_MEMO.get(ddl)
    if js is None:
        dt = _parse_datatype_string(ddl)  # loud on bad DDL
        if len(_DDL_JSON_MEMO) >= _DDL_MEMO_CAP:
            _DDL_JSON_MEMO.clear()
        _DDL_JSON_MEMO[ddl] = dt.json()
        return dt
    return _parse_datatype_json_string(js)


def _is_file_not_found(exc: Exception) -> bool:
    """True when the exception is the vanished-mid-read signal the
    commit protocol's TOCTOU handling keys on: a Python
    ``FileNotFoundError`` (the local_fs adapter) or a py4j-wrapped
    java.io.FileNotFoundException anywhere in the cause chain (the
    Hadoop client)."""
    if isinstance(exc, FileNotFoundError):
        return True
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


# Iceberg-style string-bound truncation (Iceberg: write.metadata.
# metrics truncate(16)): manifests must never carry whole document
# bodies as min/max — a string column's recorded bounds are capped at
# this many characters. A truncated LOWER bound is the value's prefix
# (prefix <= value, still a valid lower bound); the UPPER bound is the
# max prefix with its last character incremented (strictly greater
# than every value sharing any <=max prefix, still a valid upper
# bound). Pruning stays exact-or-over-selecting; ``column_stats``
# refuses truncated columns (bounds are no longer the exact extremes).
_STR_STAT_MAX = 64


def _trunc_upper(prefix: str) -> str | None:
    """Smallest convenient string > every string with this prefix:
    increment the last incrementable character, dropping any trailing
    U+10FFFF first. Incrementing U+D7FF skips the surrogate block to
    U+E000 — bounds must stay valid Unicode SCALAR values (a lone
    \\ud800 escape round-trips through Python's json but is rejected
    by strict RFC-8259 parsers and cannot encode to UTF-8; data values
    arrive via UTF-8 so none lies in the skipped gap — the bound stays
    > every value with the prefix). None when every character is
    U+10FFFF (no safe bound — callers record no upper bound, which
    readers treat conservatively)."""
    chars = list(prefix)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp < 0x10FFFF:
            nxt = cp + 1
            if nxt == 0xD800:  # surrogate block: not a scalar value
                nxt = 0xE000
            return "".join(chars[:i]) + chr(nxt)
    return None


def _json_safe(v: Any) -> Any:
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)  # dates/timestamps → ISO-ish repr; stats stay comparable
