"""``versioned_sql()``: full-fidelity SQL DML over versioned tables.

The native V2 write path (sources/pyds_write.py) gives the SQL-only
persona ``INSERT INTO <view>`` with zero Python imports, but it runs
in engine-less hooks and therefore refuses tables with CHECK
constraints, GENERATED, or IDENTITY columns. This module is the other
half of the contract: one call, ``versioned_sql(spark, "<DML text>")``,
parses the statement and drives the **Spark-side** ``VersionedTable``
API in the caller's session — so every engine-enforced invariant
(constraint validation, generated-column compute/verify, identity
allocation, MERGE clause semantics, CAS retries) applies exactly as if
the user had written the Python calls. The reference persona writes
SQL strings (reference views_p1.py:3-43); this keeps them in SQL
strings for writes Spark cannot route through a Python DataSource
(MERGE/UPDATE/DELETE need SupportsRowLevelOperations, which the Python
DataSource API does not expose).

Grammar (strict on purpose — anything outside it fails loudly with the
supported shape in the message; silent misparse of DML is corruption):

* ``INSERT INTO|OVERWRITE <target> [(col, ...)] <query>``
  — query = SELECT/VALUES/WITH/TABLE text, parsed by Spark itself.
  Columns align BY POSITION to the column list (or the full table
  schema without one) and cast to the table's types; missing columns
  NULL-backfill except GENERATED (engine computes) and IDENTITY
  (engine assigns — identity tables must use the column-list form
  omitting the identity column, Delta's own requirement for ALWAYS).
* ``INSERT INTO <target> REPLACE WHERE <pred> <query>`` — Delta's SQL
  replaceWhere: atomically delete the predicate's rows AND insert the
  query's rows in ONE commit (partition-only predicates drop whole
  partitions metadata-only); the predicate ends at the first
  SELECT/VALUES/WITH/TABLE at paren depth 0, so subqueries inside it
  parse correctly.
* ``UPDATE <target> SET col = expr [, ...] [WHERE <pred>]``
* ``DELETE FROM <target> [WHERE <pred>]``
* ``MERGE [WITH SCHEMA EVOLUTION] INTO <target> AS t USING <source>
  AS s ON <equi-keys>
  [WHEN MATCHED [AND <cond>] THEN UPDATE SET c = e, ... | DELETE]...
  [WHEN NOT MATCHED [AND <cond>] THEN INSERT *]
  [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... |
   DELETE]...``
  — full Delta multi-clause MERGE: the WHEN MATCHED and WHEN NOT
  MATCHED BY SOURCE groups are REPEATABLE, applied first-match-wins
  in declared order (so ``WHEN MATCHED AND s.op = 'D' THEN DELETE
  WHEN MATCHED THEN UPDATE SET ...`` is the CDC apply shape); only
  the LAST clause of each group may omit its condition (later
  clauses would be unreachable — Delta rule). A matched row taking
  no clause carries through UNCHANGED. Aliases MUST literally be
  ``t`` (target) and ``s`` (source): clause expressions are handed
  to VersionedTable.merge verbatim, whose documented reference frame
  is t./s. (versioned_dml.py; NOT-MATCHED-BY-SOURCE conditions see
  only the target row, as bare names). ON must be a conjunction of
  ``t.k = s.k`` equalities (MERGE is keyed).

Maintenance statements (Delta SQL parity, same target forms):

* ``OPTIMIZE <target> [ZORDER BY (col, ...)]`` → bin-packing rewrite /
  Morton clustering (versioned_dml.optimize), returns nothing useful
  beyond the CommitInfo.
* ``VACUUM <target> [RETAIN <n> VERSIONS | RETAIN <n> HOURS]
  [GRACE <n> SECONDS] [DRY RUN]`` → reclaim files referenced only by
  expired versions; returns the reclaimed (or, on DRY RUN,
  reclaimable) paths as a one-column DataFrame. ``RETAIN n HOURS`` is
  Delta's time-based history retention (versions whose commit time is
  inside the horizon survive, the head always survives); ``RETAIN n
  VERSIONS`` is the count-based form; the grace-seconds file-age
  guard protects in-flight commits either way.
* ``DESCRIBE HISTORY <target>`` → the commit history DataFrame
  (version, parent, action, operation metrics).
* ``COPY INTO <target> FROM '<path>' [FILEFORMAT = PARQUET|CSV|JSON|
  ORC] [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', ...)]
  [COPY_OPTIONS ('force'|'mergeSchema' = 'true'|'false')]`` —
  Databricks COPY INTO: file-granular idempotent ingestion (a re-run
  loads NOTHING; the loaded-file ledger rides commit metadata), by-name
  aligned + cast onto the table schema with full constraint/generated/
  identity enforcement; returns the one-row load-metrics DataFrame
  (versioned_dml.copy_into).
* ``SHOW PARTITIONS <target>`` → distinct live partition-value tuples
  from the manifest (metadata-only; typed where the encoding
  round-trips exactly); refuses unpartitioned versioned tables,
  ordinary catalog tables pass through to Spark.
* ``ANALYZE TABLE <target> COMPUTE STATISTICS`` → metadata-only
  per-file ``bytes`` backfill (versioned_dml.refresh_file_sizes), so
  legacy tables get an exact ``DESCRIBE DETAIL.sizeInBytes`` and real
  byte-targeted OPTIMIZE bins; other ANALYZE forms (and ANALYZE on
  ordinary catalog tables) pass through to Spark.
* ``CREATE [OR REPLACE] TABLE versioned.`/p` AS <query>`` — CTAS
  bootstrap (plain CREATE refuses an existing root; OR REPLACE
  commits an overwrite, history preserved).
* ``CREATE TABLE versioned.`/p` (<col> <type> [NOT NULL] | <col>
  <type> GENERATED ALWAYS AS (<expr>) | <col> BIGINT GENERATED
  ALWAYS AS IDENTITY [(START WITH s INCREMENT BY k)] | CONSTRAINT
  <name> CHECK (<pred>), ...) [TBLPROPERTIES ('bloom.column' = c
  [, 'bloom.bits' = n, 'bloom.k' = n])]`` — Delta's empty-table
  DDL: declared schema, NOT NULL, CHECK constraints, generated and
  identity columns, and the bloom property in ONE statement (an
  empty base commit, then one metadata-only evolution commit per
  clause — declared column order is preserved; the first column
  must be a plain stored one).
* ``CREATE TABLE versioned.`/dst` SHALLOW|DEEP CLONE <src> [VERSION AS
  OF <n>]`` — Delta CLONE (shallow = by-pointer v0, deep = parallel
  file copy).
* ``RESTORE TABLE <target> TO VERSION AS OF <n> | TO TIMESTAMP AS OF
  <epochSeconds | 'timestamp text'>`` — roll-forward restore (history
  append-only); quoted timestamp text resolves in the SESSION
  timezone via Spark itself (the engine-less view options instead
  take epoch seconds or offset-anchored ISO-8601 — see pyds._opt_ts).
Other CREATE statements pass through to ``spark.sql`` untouched.

Schema evolution (Delta ALTER TABLE parity — every form maps 1:1 onto
the engine's metadata-only evolution commits in versioned_schema.py,
so the SQL-only persona can evolve tables, not just write them):

* ``ALTER TABLE <target> ADD COLUMN <name> <type>`` — NULL-backfilled
  metadata-only add (re-adding a dropped name goes through the
  column-mapping re-add path automatically).
* ``ALTER TABLE <target> ADD COLUMNS (<name> <type>, ...)`` — each
  column is one evolution commit (the engine's add_column unit; Delta
  folds them into one — documented nuance).
* ``ALTER TABLE <target> ADD COLUMN <name> <type> GENERATED ALWAYS AS
  (<expr>)`` — generated column (empty tables only, engine rule).
* ``ALTER TABLE <target> ADD COLUMN <name> BIGINT GENERATED ALWAYS AS
  IDENTITY [(START WITH <s> INCREMENT BY <k>)]`` — identity column
  (type must be BIGINT, Delta's requirement too).
* ``ALTER TABLE <target> DROP COLUMN <name>`` /
  ``DROP COLUMNS (<name>, ...)``
* ``ALTER TABLE <target> RENAME COLUMN <old> TO <new>`` — the
  column-mapping rename.
* ``ALTER TABLE <target> ALTER COLUMN <name> TYPE <widerType>`` —
  lossless type widening only.
* ``ALTER TABLE <target> ALTER COLUMN <name> SET NOT NULL``
* ``ALTER TABLE <target> ADD CONSTRAINT <name> CHECK (<pred>)``
* ``ALTER TABLE <target> DROP CONSTRAINT <name>``
* ``ALTER TABLE <target> SET TBLPROPERTIES ('bloom.column' = <c>
  [, 'bloom.bits' = <n>, 'bloom.k' = <n>])`` — declare the durable
  bloom point-lookup index property; ``UNSET TBLPROPERTIES
  ('bloom.column')`` clears it.
* ``SHOW TBLPROPERTIES <target>`` / ``DESCRIBE DETAIL <target>`` —
  property and table-metadata introspection (O(manifest), no data
  I/O); other SHOW/DESCRIBE forms pass through to Spark.

Targets: ``versioned.`/abs/path``` (Delta's ``delta.`/path``` shape)
or any registered view/table name whose analyzed plan resolves to a
``USING versioned`` relation — the root is pulled from the relation's
own options, so views keep working after the table evolves.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions.frames import empty_df, local_df
from finalpipeline_spark.sources.versioned import CommitInfo, VersionedTable

_WS = r"\s+"


def _mask_literals(sql: str) -> str:
    """Same-length copy of ``sql`` with the CONTENTS of '...'-strings,
    "..."-strings and `...`-quoted identifiers replaced by spaces, so
    keyword/regex scans can never match inside a literal. Quote
    characters themselves survive (offsets must line up with the
    original; doubled-quote escapes land in the masked region)."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:  # doubled escape
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _split_top(s: str, masked: str, sep: str = ",") -> list[str]:
    """Split ``s`` on ``sep`` at paren/bracket depth 0, using the
    literal-masked twin for depth tracking."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _resolve_root(spark: SparkSession, ref: str) -> str:
    """Table reference → versioned root. ``versioned.`/path``` is
    direct; a bare name resolves through the analyzed plan of the
    registered view (SubqueryAlias/View wrappers unwrapped, then the
    relation's own 'root' option — works for temp views created with
    ``USING versioned``)."""
    ref = ref.strip()
    m = re.fullmatch(r"versioned\s*\.\s*`([^`]+)`", ref, re.I)
    if m:
        return m.group(1).rstrip("/")
    if not re.fullmatch(r"[A-Za-z_][\w.]*|`[^`]+`", ref):
        raise ValueError(
            f"unsupported table reference {ref!r} — use a view name or "
            "versioned.`/abs/path`"
        )
    plan = spark.table(ref)._jdf.queryExecution().analyzed()
    for _ in range(8):
        name = plan.getClass().getSimpleName()
        if name in ("SubqueryAlias", "View", "Project"):
            plan = plan.child()
            continue
        break
    try:
        opts = dict(plan.options())
    except Exception:
        opts = {}
    root = opts.get("root")
    if not root:
        raise ValueError(
            f"{ref!r} does not resolve to a USING versioned relation "
            "(no 'root' option on its plan) — create it with CREATE "
            "TEMPORARY VIEW ... USING versioned OPTIONS (root '...'), or "
            "reference the table as versioned.`/abs/path`"
        )
    frozen = {
        k for k in ("version", "timestampAsOf", "changeFeed", "history")
        if k in opts
    }
    if frozen:
        raise ValueError(
            f"{ref!r} is a {'/'.join(sorted(frozen))} view — snapshots "
            "and feeds are read-only"
        )
    return root.rstrip("/")


# target-reference token: versioned.`...` | `...` | dotted name
_REF = r"versioned\s*\.\s*`[^`]+`|`[^`]+`|[A-Za-z_][\w.]*"
# column-identifier token (backquoted content is masked to spaces in
# the masked twin, so `[^`]*` must tolerate the blanks; real text is
# always pulled from ``stmt`` by span)
_IDENT = r"`[^`]*`|\w+"


def _uq(ident: str) -> str:
    """Strip optional backquotes from an identifier."""
    return ident.strip().strip("`")


def _split_cols(s: str, masked: str) -> list[tuple[str, str]]:
    """Split a ``name type, name type, ...`` column-spec list on
    top-level commas. Unlike ``_split_top`` this also tracks ``<...>``
    depth — DDL types nest commas inside angle brackets
    (``map<string,int>``) — which is safe HERE because a column-spec
    list contains types, never comparison expressions."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append((s[start:i], masked[start:i]))
            start = i + 1
    parts.append((s[start:], masked[start:]))
    cols = []
    for part, pmask in parts:
        cm = re.match(rf"\s*({_IDENT})\s+(.+?)\s*$", pmask, re.S)
        if not cm:
            raise ValueError(
                f"unsupported column-spec entry {part.strip()!r} — "
                "expected '<name> <type>'"
            )
        cols.append(
            (_uq(part[cm.start(1):cm.end(1)]), part[cm.start(2):cm.end(2)].strip())
        )
    return cols


def _parse_create_cols(s: str, masked: str) -> list[tuple]:
    """Entries of a ``CREATE TABLE (...)`` column list →
    ``('plain', name, ddl_type, not_null)`` |
    ``('generated', name, ddl_type, expr)`` |
    ``('identity', name, start, step)`` |
    ``('constraint', name, predicate)``.

    Splitting tracks paren/bracket depth always, but angle-bracket
    depth ONLY at paren depth 0: DDL types nest commas inside ``<...>``
    (``map<string,int>``), while CHECK predicates contain bare
    comparison ``<``/``>`` INSIDE their parens — counting those would
    corrupt the depth for every later entry."""
    parts, pdepth, adepth, start = [], 0, 0, 0
    for i, ch in enumerate(masked):
        if ch in "([":
            pdepth += 1
        elif ch in ")]":
            pdepth -= 1
        elif pdepth == 0 and ch == "<":
            adepth += 1
        elif pdepth == 0 and ch == ">":
            adepth = max(0, adepth - 1)
        elif ch == "," and pdepth == 0 and adepth == 0:
            parts.append((s[start:i], masked[start:i]))
            start = i + 1
    parts.append((s[start:], masked[start:]))
    out: list[tuple] = []
    for part, pmask in parts:
        m = re.match(
            rf"\s*CONSTRAINT{_WS}({_IDENT}){_WS}CHECK\s*\((.*)\)\s*$",
            pmask, re.I | re.S,
        )
        if m:
            out.append((
                "constraint",
                _uq(part[m.start(1):m.end(1)]),
                part[m.start(2):m.end(2)].strip(),
            ))
            continue
        m = re.match(
            rf"\s*({_IDENT}){_WS}(.+?){_WS}"
            rf"GENERATED{_WS}ALWAYS{_WS}AS{_WS}IDENTITY"
            rf"(?:\s*\(\s*START{_WS}WITH{_WS}(-?\d+){_WS}"
            rf"INCREMENT{_WS}BY{_WS}(-?\d+)\s*\))?\s*$",
            pmask, re.I | re.S,
        )
        if m:
            name = _uq(part[m.start(1):m.end(1)])
            ddl = part[m.start(2):m.end(2)].strip()
            if ddl.lower() not in ("bigint", "long"):
                raise ValueError(
                    f"identity column '{name}' must be BIGINT (got {ddl!r})"
                )
            out.append((
                "identity", name,
                int(m.group(3)) if m.group(3) else 1,
                int(m.group(4)) if m.group(4) else 1,
            ))
            continue
        m = re.match(
            rf"\s*({_IDENT}){_WS}(.+?){_WS}"
            rf"GENERATED{_WS}ALWAYS{_WS}AS\s*\((.*)\)\s*$",
            pmask, re.I | re.S,
        )
        if m:
            out.append((
                "generated",
                _uq(part[m.start(1):m.end(1)]),
                part[m.start(2):m.end(2)].strip(),
                part[m.start(3):m.end(3)].strip(),
            ))
            continue
        m = re.match(
            rf"\s*({_IDENT}){_WS}(.+?){_WS}NOT{_WS}NULL\s*$",
            pmask, re.I | re.S,
        )
        not_null = bool(m)
        if not m:
            m = re.match(rf"\s*({_IDENT}){_WS}(\S.*?)\s*$", pmask, re.I | re.S)
        if not m:
            raise ValueError(
                f"unsupported CREATE TABLE column entry {part.strip()!r} "
                "— expected '<name> <type> [NOT NULL]', '<name> <type> "
                "GENERATED ALWAYS AS (expr)', '<name> BIGINT GENERATED "
                "ALWAYS AS IDENTITY [(START WITH s INCREMENT BY k)]', "
                "or 'CONSTRAINT <name> CHECK (pred)'"
            )
        out.append((
            "plain",
            _uq(part[m.start(1):m.end(1)]),
            part[m.start(2):m.end(2)].strip(),
            not_null,
        ))
    return out


def _parse_kv_props(inner: str, imask: str, what: str) -> dict[str, str]:
    """A ``('k' = 'v', ...)`` option body → dict. Loud on any other
    shape — silently dropping an option the user wrote is corruption."""
    props: dict[str, str] = {}
    for part in _split_top(inner, imask):
        pm = re.fullmatch(r"\s*'([^']*)'\s*=\s*'([^']*)'\s*", part)
        if not pm:
            raise ValueError(
                f"unsupported {what} entry {part.strip()!r} — "
                "expected 'key' = 'value'"
            )
        props[pm.group(1)] = pm.group(2)
    return props


def _parse_copy(stmt: str, masked: str) -> dict[str, Any]:
    """COPY INTO text → kwargs (pure parse, no session): target ref,
    unescaped source path, lowercased file format, optional pattern,
    format options dict, and the validated force/mergeSchema flags."""
    m = re.match(
        rf"COPY{_WS}INTO{_WS}({_REF}){_WS}FROM{_WS}('(?:[^']|'')*')"
        rf"(?:{_WS}FILEFORMAT\s*=\s*(\w+))?"
        rf"(?:{_WS}PATTERN\s*=\s*('(?:[^']|'')*'))?"
        rf"(?:{_WS}FORMAT_OPTIONS\s*(\([^)]*\)))?"
        rf"(?:{_WS}COPY_OPTIONS\s*(\([^)]*\)))?\s*$",
        masked, re.I | re.S,
    )
    if not m:
        raise ValueError(
            "unsupported COPY INTO shape — expected: COPY INTO "
            "<target> FROM '<path>' [FILEFORMAT = PARQUET|CSV|JSON|"
            "ORC] [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', "
            "...)] [COPY_OPTIONS ('force'|'mergeSchema' = "
            "'true'|'false')]"
        )
    fmt_opts = None
    if m.group(5):
        fmt_opts = _parse_kv_props(
            stmt[m.start(5) + 1:m.end(5) - 1],
            masked[m.start(5) + 1:m.end(5) - 1],
            "FORMAT_OPTIONS",
        )
    copy_opts: dict[str, str] = {}
    if m.group(6):
        copy_opts = _parse_kv_props(
            stmt[m.start(6) + 1:m.end(6) - 1],
            masked[m.start(6) + 1:m.end(6) - 1],
            "COPY_OPTIONS",
        )
    unknown = sorted(
        k for k in copy_opts if k.lower() not in ("force", "mergeschema")
    )
    if unknown:
        raise ValueError(
            f"unsupported COPY_OPTIONS key(s) {unknown} — "
            "supported: force, mergeSchema"
        )

    def _flag(name: str) -> bool:
        for k, v in copy_opts.items():
            if k.lower() == name:
                return v.strip().lower() == "true"
        return False

    return {
        "target": stmt[m.start(1):m.end(1)],
        "source": stmt[m.start(2) + 1:m.end(2) - 1].replace("''", "'"),
        "file_format": (
            stmt[m.start(3):m.end(3)] if m.group(3) else "parquet"
        ),
        "pattern": (
            stmt[m.start(4) + 1:m.end(4) - 1].replace("''", "'")
            if m.group(4)
            else None
        ),
        "format_options": fmt_opts,
        "force": _flag("force"),
        "merge_schema": _flag("mergeschema"),
    }


def _parse_bloom_props(inner: str, imask: str) -> tuple[str, int, int]:
    """A ``TBLPROPERTIES ('k' = 'v', ...)`` body restricted to the
    bloom-index trio → ``(column, bits, k)``. Loud on anything else —
    silent property drop is corruption."""
    props: dict[str, str] = {}
    for part in _split_top(inner, imask):
        pm = re.fullmatch(r"\s*'([^']*)'\s*=\s*'([^']*)'\s*", part)
        if not pm:
            raise ValueError(
                f"unsupported TBLPROPERTIES entry {part.strip()!r} — "
                "expected 'key' = 'value'"
            )
        props[pm.group(1)] = pm.group(2)
    unknown = sorted(set(props) - {"bloom.column", "bloom.bits", "bloom.k"})
    if unknown:
        raise ValueError(
            f"unsupported table propert{'ies' if len(unknown) > 1 else 'y'} "
            f"{unknown} — supported: bloom.column, bloom.bits, bloom.k"
        )
    if "bloom.column" not in props:
        raise ValueError(
            "TBLPROPERTIES for the bloom index needs 'bloom.column' "
            "(bits/k are optional)"
        )
    return (
        props["bloom.column"],
        int(props.get("bloom.bits", 8192)),
        int(props.get("bloom.k", 3)),
    )


def _parse_alter(stmt: str, masked: str) -> tuple[str, str, list[tuple]]:
    """ALTER TABLE text → (target_text, op_name, [op_args...]) where
    each op maps 1:1 onto a VersionedTable evolution method (see the
    module docstring for the accepted grammar). Pure parse — no Spark,
    so the grammar is property-testable without a session."""
    shape_err = ValueError(
        "unsupported ALTER TABLE shape — supported: ADD COLUMN <name> "
        "<type> [GENERATED ALWAYS AS (expr) | GENERATED ALWAYS AS "
        "IDENTITY [(START WITH s INCREMENT BY k)]], ADD COLUMNS (name "
        "type, ...), DROP COLUMN <name>, DROP COLUMNS (name, ...), "
        "RENAME COLUMN <old> TO <new>, ALTER COLUMN <name> TYPE "
        "<widerType>, ALTER COLUMN <name> SET NOT NULL, ADD CONSTRAINT "
        "<name> CHECK (pred), DROP CONSTRAINT <name>"
    )
    hm = re.match(
        rf"ALTER{_WS}TABLE{_WS}({_REF}){_WS}", masked, re.I
    )
    if not hm:
        raise shape_err
    target = stmt[hm.start(1):hm.end(1)]
    tail, tmask = stmt[hm.end():], masked[hm.end():]

    m = re.match(rf"SET{_WS}TBLPROPERTIES\s*\((.*)\)\s*$", tmask, re.I | re.S)
    if m:
        inner, imask = tail[m.start(1):m.end(1)], tmask[m.start(1):m.end(1)]
        return target, "set_bloom_index", [_parse_bloom_props(inner, imask)]
    m = re.match(rf"UNSET{_WS}TBLPROPERTIES\s*\((.*)\)\s*$", tmask, re.I | re.S)
    if m:
        inner, imask = tail[m.start(1):m.end(1)], tmask[m.start(1):m.end(1)]
        keys = {
            p.strip().strip("'") for p in _split_top(inner, imask)
        }
        if not keys or not keys <= {"bloom.column", "bloom.bits", "bloom.k"}:
            raise ValueError(
                f"unsupported UNSET TBLPROPERTIES keys {sorted(keys)} — "
                "supported: the bloom.* trio (unsetting any clears the "
                "whole bloom_index property)"
            )
        return target, "drop_bloom_index", [()]
    m = re.match(
        rf"ADD{_WS}CONSTRAINT{_WS}({_IDENT}){_WS}CHECK\s*\((.*)\)\s*$",
        tmask, re.I | re.S,
    )
    if m:
        return target, "add_constraint", [
            (_uq(tail[m.start(1):m.end(1)]), tail[m.start(2):m.end(2)].strip())
        ]
    m = re.match(rf"DROP{_WS}CONSTRAINT{_WS}({_IDENT})\s*$", tmask, re.I)
    if m:
        return target, "drop_constraint", [(_uq(tail[m.start(1):m.end(1)]),)]
    m = re.match(
        rf"RENAME{_WS}COLUMN{_WS}({_IDENT}){_WS}TO{_WS}({_IDENT})\s*$",
        tmask, re.I,
    )
    if m:
        return target, "rename_column", [
            (_uq(tail[m.start(1):m.end(1)]), _uq(tail[m.start(2):m.end(2)]))
        ]
    m = re.match(
        rf"ALTER{_WS}COLUMN{_WS}({_IDENT}){_WS}TYPE{_WS}(.+?)\s*$",
        tmask, re.I | re.S,
    )
    if m:
        return target, "widen_column", [
            (_uq(tail[m.start(1):m.end(1)]), tail[m.start(2):m.end(2)].strip())
        ]
    m = re.match(
        rf"ALTER{_WS}COLUMN{_WS}({_IDENT}){_WS}SET{_WS}NOT{_WS}NULL\s*$",
        tmask, re.I,
    )
    if m:
        return target, "add_not_null", [(_uq(tail[m.start(1):m.end(1)]),)]
    m = re.match(rf"DROP{_WS}COLUMNS?{_WS}({_IDENT})\s*$", tmask, re.I)
    if m:
        return target, "drop_column", [(_uq(tail[m.start(1):m.end(1)]),)]
    m = re.match(rf"DROP{_WS}COLUMNS\s*\((.*)\)\s*$", tmask, re.I | re.S)
    if m:
        inner, imask = tail[m.start(1):m.end(1)], tmask[m.start(1):m.end(1)]
        return target, "drop_column", [
            (_uq(p),) for p in _split_top(inner, imask)
        ]
    # ADD COLUMN with a GENERATED clause — identity first (its clause
    # text is a superset of the expression form's prefix)
    m = re.match(
        rf"ADD{_WS}COLUMNS?{_WS}({_IDENT}){_WS}(.+?){_WS}"
        rf"GENERATED{_WS}ALWAYS{_WS}AS{_WS}IDENTITY"
        rf"(?:\s*\(\s*START{_WS}WITH{_WS}(-?\d+){_WS}"
        rf"INCREMENT{_WS}BY{_WS}(-?\d+)\s*\))?\s*$",
        tmask, re.I | re.S,
    )
    if m:
        name = _uq(tail[m.start(1):m.end(1)])
        ddl = tail[m.start(2):m.end(2)].strip()
        if ddl.lower() not in ("bigint", "long"):
            raise ValueError(
                f"identity column '{name}' must be BIGINT (got {ddl!r})"
            )
        start = int(m.group(3)) if m.group(3) else 1
        step = int(m.group(4)) if m.group(4) else 1
        return target, "add_identity_column", [(name, start, step)]
    m = re.match(
        rf"ADD{_WS}COLUMNS?{_WS}({_IDENT}){_WS}(.+?){_WS}"
        rf"GENERATED{_WS}ALWAYS{_WS}AS\s*\((.*)\)\s*$",
        tmask, re.I | re.S,
    )
    if m:
        return target, "add_generated_column", [
            (
                _uq(tail[m.start(1):m.end(1)]),
                tail[m.start(2):m.end(2)].strip(),
                tail[m.start(3):m.end(3)].strip(),
            )
        ]
    m = re.match(rf"ADD{_WS}COLUMN{_WS}({_IDENT}){_WS}(.+?)\s*$", tmask, re.I | re.S)
    if m:
        return target, "add_column", [
            (_uq(tail[m.start(1):m.end(1)]), tail[m.start(2):m.end(2)].strip())
        ]
    m = re.match(rf"ADD{_WS}COLUMNS\s*\((.*)\)\s*$", tmask, re.I | re.S)
    if m:
        inner, imask = tail[m.start(1):m.end(1)], tmask[m.start(1):m.end(1)]
        return target, "add_column", _split_cols(inner, imask)
    raise shape_err


def _align_insert(
    spark: SparkSession, vt: VersionedTable, df: DataFrame,
    col_list: list[str] | None,
) -> DataFrame:
    """Positional alignment + cast of an INSERT source onto the table
    schema (ANSI INSERT semantics). Missing columns NULL-backfill;
    GENERATED and IDENTITY columns are never backfilled — the engine
    computes/assigns them in commit_append (supplying an identity
    column explicitly is refused there, Delta ALWAYS semantics)."""
    m = vt.manifest()
    schema = vt._schema_of(m)
    gen = set((m.get("generated") or {}))
    ident = set((m.get("identity") or {}))
    table_cols = [f.name for f in schema.fields]
    targets = col_list if col_list is not None else [
        c for c in table_cols if c not in ident
    ]
    unknown = [c for c in targets if c not in table_cols]
    if unknown:
        raise ValueError(f"INSERT column(s) {unknown} not in table schema {table_cols}")
    if len(df.columns) != len(targets):
        raise ValueError(
            f"INSERT supplies {len(df.columns)} column(s) but the target "
            f"list has {len(targets)}: {targets}"
        )
    by_name = {f.name: f.dataType for f in schema.fields}
    aligned = df.toDF(*targets)
    out = [F.col(c).cast(by_name[c]).alias(c) for c in targets]
    for c in table_cols:
        if c in targets or c in gen or c in ident:
            continue
        out.append(F.lit(None).cast(by_name[c]).alias(c))
    return aligned.select(*out)


def _parse_merge(stmt: str, masked: str) -> dict[str, Any]:
    """MERGE text → kwargs for VersionedTable.merge (see module
    docstring for the accepted grammar)."""
    shape_err = ValueError(
        "unsupported MERGE shape — expected: MERGE INTO <target> AS t "
        "USING <source|(subquery)> AS s ON <t.k = s.k [AND ...]> "
        "[WHEN ...] (aliases must literally be t and s; clause "
        "expressions are evaluated in that frame)"
    )
    head = re.match(
        rf"MERGE(?:{_WS}WITH{_WS}SCHEMA{_WS}EVOLUTION)?"
        rf"{_WS}INTO{_WS}({_REF})(?:{_WS}AS)?{_WS}t{_WS}USING\s*",
        masked, re.I | re.S,
    )
    if not head:
        raise shape_err
    evolve = re.match(
        rf"MERGE{_WS}WITH{_WS}SCHEMA{_WS}EVOLUTION\b", masked, re.I
    )
    target = stmt[head.start(1):head.end(1)]
    src_start = head.end()
    if masked[src_start] == "(":
        depth, j = 0, src_start
        while j < len(masked):
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise shape_err
        src_end = j + 1
    else:
        rm = re.match(_REF, masked[src_start:])
        if not rm:
            raise shape_err
        src_end = src_start + rm.end()
    source = stmt[src_start:src_end]
    tm = re.match(rf"(?:{_WS}AS)?{_WS}s{_WS}ON{_WS}", masked[src_end:], re.I)
    if not tm:
        raise shape_err
    rest_off = src_end + tm.end()
    # ON condition runs until the first WHEN (or end)
    when_iter = list(re.finditer(rf"{_WS}WHEN{_WS}", masked[rest_off:], re.I))
    on_end = rest_off + (when_iter[0].start() if when_iter else len(stmt) - rest_off)
    on_text = stmt[rest_off:on_end].strip()
    on_masked = masked[rest_off:on_end].strip()
    # split ON on AND using masked offsets
    keys = []
    pos = 0
    for mt in list(re.finditer(rf"{_WS}AND{_WS}", on_masked, re.I)) + [None]:
        seg = on_text[pos: mt.start() if mt else len(on_text)].strip()
        pos = mt.end() if mt else pos
        em = re.fullmatch(
            r"t\s*\.\s*(\w+)\s*=\s*s\s*\.\s*(\w+)|s\s*\.\s*(\w+)\s*=\s*t\s*\.\s*(\w+)",
            seg,
        )
        if not em:
            raise ValueError(
                f"MERGE ON must be a conjunction of t.k = s.k equalities "
                f"(keyed merge); got {seg!r}"
            )
        k1 = em.group(1) or em.group(4)
        k2 = em.group(2) or em.group(3)
        if k1 != k2:
            raise ValueError(
                f"MERGE keys must pair the same column on both sides; "
                f"got t.{k1} = s.{k2}"
            )
        keys.append(k1)
    kwargs: dict[str, Any] = {
        "target": target, "source": source, "keys": keys,
        "insert_unmatched": False, "when_matched_update": None,
        "when_matched_condition": None, "matched_delete": None,
        "not_matched_by_source_delete": None,
        # ordered multi-clause form (Delta semantics, first-match-wins)
        "matched_clauses": [], "not_matched_by_source_clauses": [],
        "insert_condition": None,
        # MERGE WITH SCHEMA EVOLUTION (Delta 3.2 SQL): source columns
        # absent from the target evolve the schema additively
        "merge_schema": bool(evolve),
    }

    def _parse_set(sets_text: str, sets_masked: str) -> dict[str, str]:
        assigns: dict[str, str] = {}
        for part, pm in zip(
            _split_top(sets_text, sets_masked),
            _split_top(sets_masked, sets_masked),
        ):
            am = re.match(r"\s*(?:t\s*\.\s*)?(\w+)\s*=", pm)
            if not am:
                raise ValueError(f"unsupported SET assignment {part!r}")
            assigns[am.group(1)] = part[am.end():].strip()
        return assigns

    # clause scan over the masked tail; clauses keep DECLARED order
    # (first-match-wins inside each group, Delta semantics)
    tail, tail_masked = stmt[on_end:], masked[on_end:]
    clause_starts = [mt.start() for mt in re.finditer(rf"WHEN{_WS}", tail_masked, re.I)]
    clause_starts.append(len(tail))
    for a, b in zip(clause_starts, clause_starts[1:]):
        clause, cm = tail[a:b].strip(), tail_masked[a:b].strip()
        mm = re.match(
            rf"WHEN{_WS}NOT{_WS}MATCHED(?:{_WS}AND{_WS}(.*?))?"
            rf"{_WS}THEN{_WS}INSERT\s*\*$", cm, re.I | re.S,
        )
        if mm and not re.match(
            rf"WHEN{_WS}NOT{_WS}MATCHED{_WS}BY{_WS}SOURCE", cm, re.I
        ):
            if kwargs["insert_unmatched"]:
                raise ValueError(
                    "at most one WHEN NOT MATCHED ... INSERT clause"
                )
            kwargs["insert_unmatched"] = True
            if mm.group(1):
                kwargs["insert_condition"] = clause[mm.start(1):mm.end(1)]
            continue
        mm = re.match(
            rf"WHEN{_WS}NOT{_WS}MATCHED{_WS}BY{_WS}SOURCE"
            rf"(?:{_WS}AND{_WS}(.*?))?{_WS}THEN{_WS}"
            rf"(UPDATE{_WS}SET{_WS}|DELETE$)", cm, re.I | re.S,
        )
        if mm:
            cond = clause[mm.start(1):mm.end(1)] if mm.group(1) else None
            if mm.group(2).upper().startswith("DELETE"):
                kwargs["not_matched_by_source_clauses"].append(
                    {"condition": cond, "action": "delete", "set": None}
                )
            else:
                kwargs["not_matched_by_source_clauses"].append(
                    {
                        "condition": cond,
                        "action": "update",
                        "set": _parse_set(clause[mm.end(2):], cm[mm.end(2):]),
                    }
                )
            continue
        mm = re.match(
            rf"WHEN{_WS}MATCHED(?:{_WS}AND{_WS}(.*?))?{_WS}THEN{_WS}"
            rf"(UPDATE{_WS}SET{_WS}|DELETE$)", cm, re.I | re.S,
        )
        if mm:
            cond = clause[mm.start(1):mm.end(1)] if mm.group(1) else None
            if mm.group(2).upper().startswith("DELETE"):
                kwargs["matched_clauses"].append(
                    {"condition": cond, "action": "delete", "set": None}
                )
            else:
                kwargs["matched_clauses"].append(
                    {
                        "condition": cond,
                        "action": "update",
                        "set": _parse_set(clause[mm.end(2):], cm[mm.end(2):]),
                    }
                )
            continue
        raise ValueError(
            f"unsupported MERGE clause {clause!r} — supported: WHEN "
            "MATCHED [AND c] THEN UPDATE SET ... | DELETE (repeatable, "
            "first-match-wins), WHEN NOT MATCHED [AND c] THEN INSERT *, "
            "WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | "
            "DELETE (repeatable)"
        )
    for label, group in (
        ("MATCHED", kwargs["matched_clauses"]),
        ("NOT MATCHED BY SOURCE", kwargs["not_matched_by_source_clauses"]),
    ):
        for i, cl in enumerate(group):
            if cl["condition"] is None and i < len(group) - 1:
                raise ValueError(
                    f"only the last WHEN {label} clause may omit AND "
                    "<condition> — later clauses would be unreachable"
                )
    # legacy single-clause fields (back-compat surface for callers and
    # the single-clause engine routing in versioned_sql)
    mc = kwargs["matched_clauses"]
    if len(mc) == 1 and mc[0]["action"] == "delete":
        kwargs["matched_delete"] = mc[0]["condition"] or "true"
    elif len(mc) == 1:
        kwargs["when_matched_update"] = mc[0]["set"]
        kwargs["when_matched_condition"] = mc[0]["condition"]
    nmbs = kwargs["not_matched_by_source_clauses"]
    if len(nmbs) == 1 and nmbs[0]["action"] == "delete":
        kwargs["not_matched_by_source_delete"] = nmbs[0]["condition"] or "true"
    return kwargs


def versioned_sql(
    spark: SparkSession,
    sql: str,
    attempts: int = 10,
    mode: str = "cow",
) -> CommitInfo | DataFrame:
    """Execute one DML statement against a versioned table with full
    Spark-side enforcement; non-DML text passes through ``spark.sql``
    unchanged (so a SQL-only caller can route everything here).
    ``mode`` selects the physical delete/update strategy ("cow"/"mor",
    see versioned_dml)."""
    stmt = sql.strip().rstrip(";")
    masked = _mask_literals(stmt)
    kw = re.match(
        r"(INSERT|UPDATE|DELETE|MERGE|OPTIMIZE|VACUUM|DESCRIBE|CREATE|"
        r"RESTORE|ALTER|SHOW|ANALYZE|COPY)\b",
        masked, re.I,
    )
    if not kw:
        return spark.sql(stmt)
    verb = kw.group(1).upper()

    if verb == "ALTER":
        hm = re.match(rf"ALTER{_WS}TABLE{_WS}({_REF})", masked, re.I)
        if not hm:
            return spark.sql(stmt)  # ALTER VIEW etc.: Spark's own
        try:
            root = _resolve_root(spark, stmt[hm.start(1):hm.end(1)])
        except ValueError as e:
            if "read-only" in str(e):
                raise  # snapshot/feed view: evolution is a write too
            # an ordinary catalog table (or an unsupported ref shape):
            # Spark's own ALTER TABLE handles it
            return spark.sql(stmt)
        _, op, calls = _parse_alter(stmt, masked)  # loud on a bad shape
        vt = VersionedTable(spark, root)
        method = getattr(vt, op)
        info = None
        for args in calls:
            # multi-column ADD/DROP runs one evolution commit per
            # column (the engine's unit); each carries its own CAS
            # retry, so concurrent writers interleave safely
            info = method(*args, attempts=attempts)
        return info

    if verb == "CREATE":
        # CREATE [OR REPLACE] TABLE versioned.`/p` AS <query>  (CTAS)
        # CREATE TABLE versioned.`/dst` SHALLOW|DEEP CLONE <src>
        #   [VERSION AS OF <n>]                            (Delta CLONE)
        m = re.match(
            # \s* (not \s+) after the backtick target: a closing
            # backquote needs no whitespace before '(' — with \s+,
            # CREATE TABLE versioned.`/p`(id int) silently fell through
            # to spark.sql and died with a confusing catalog error
            rf"CREATE{_WS}(?:(OR{_WS}REPLACE){_WS})?TABLE{_WS}"
            rf"(versioned\s*\.\s*`[^`]+`)\s*(.*)$",
            masked, re.I | re.S,
        )
        if not m:
            return spark.sql(stmt)  # ordinary CREATE: Spark's own
        replace = bool(m.group(1))
        dst_root = re.fullmatch(
            r"versioned\s*\.\s*`([^`]+)`", stmt[m.start(2):m.end(2)]
        ).group(1).rstrip("/")
        tail = stmt[m.start(3):]
        tail_masked = masked[m.start(3):]
        cm = re.match(
            rf"(SHALLOW|DEEP){_WS}CLONE{_WS}({_REF})"
            rf"(?:{_WS}VERSION{_WS}AS{_WS}OF{_WS}(\d+))?\s*$",
            tail_masked, re.I,
        )
        dst = VersionedTable(spark, dst_root)
        if dst.latest_version() is not None and not (replace and not cm):
            raise ValueError(
                f"{dst_root} already exists — use CREATE OR REPLACE "
                "TABLE (CTAS) or a fresh root"
            )
        if cm:
            src = VersionedTable(
                spark, _resolve_root(spark, tail[cm.start(2):cm.end(2)])
            )
            return src.clone_to(
                dst_root,
                version=int(cm.group(3)) if cm.group(3) else None,
                deep=cm.group(1).upper() == "DEEP",
            )
        if tail_masked.lstrip().startswith("("):
            # CREATE TABLE versioned.`/p` (col type [NOT NULL] | col
            # type GENERATED ALWAYS AS (expr) | col BIGINT GENERATED
            # ALWAYS AS IDENTITY [(START WITH s INCREMENT BY k)] |
            # CONSTRAINT name CHECK (pred), ...)
            # [TBLPROPERTIES ('bloom.column' = c, ...)] — Delta's
            # empty-table DDL: declared schema, enforcement metadata,
            # and the bloom property in ONE statement, mapped onto the
            # engine's schema-commit APIs (an empty base overwrite,
            # then one metadata-only evolution commit per clause).
            if replace:
                raise ValueError(
                    "CREATE OR REPLACE with a declared column list is "
                    "not supported — REPLACE carries the prior table's "
                    "generated/identity/constraint metadata; use a "
                    "fresh root (CTAS supports OR REPLACE for data)"
                )
            p0 = tail_masked.index("(")
            depth, p1 = 0, None
            for i in range(p0, len(tail_masked)):
                if tail_masked[i] == "(":
                    depth += 1
                elif tail_masked[i] == ")":
                    depth -= 1
                    if depth == 0:
                        p1 = i
                        break
            if p1 is None:
                raise ValueError(
                    "unbalanced parentheses in CREATE TABLE column list"
                )
            specs = _parse_create_cols(
                tail[p0 + 1:p1], tail_masked[p0 + 1:p1]
            )
            rest, rest_mask = tail[p1 + 1:], tail_masked[p1 + 1:]
            pcols = None
            pbm = re.match(
                rf"\s*PARTITIONED{_WS}BY\s*\(([^)]*)\)", rest_mask, re.I
            )
            if pbm:
                pcols = [
                    c.strip().strip("`")
                    for c in rest[pbm.start(1):pbm.end(1)].split(",")
                ]
                rest, rest_mask = rest[pbm.end():], rest_mask[pbm.end():]
            props = None
            if rest.strip():
                rm = re.match(
                    r"\s*TBLPROPERTIES\s*\((.*)\)\s*$", rest_mask, re.I | re.S
                )
                if not rm:
                    raise ValueError(
                        f"unsupported CREATE TABLE trailer {rest.strip()!r}"
                        " — only PARTITIONED BY (col, ...) and "
                        "TBLPROPERTIES ('k' = 'v', ...) may follow the "
                        "column list"
                    )
                props = _parse_bloom_props(
                    rest[rm.start(1):rm.end(1)], rest_mask[rm.start(1):rm.end(1)]
                )
            col_specs = [sp for sp in specs if sp[0] != "constraint"]
            cons_specs = [sp for sp in specs if sp[0] == "constraint"]
            if not col_specs:
                raise ValueError("CREATE TABLE needs at least one column")
            from pyspark.sql.types import (
                LongType,
                StructField,
                StructType,
                _parse_datatype_string,
            )

            if pcols:
                plain = {sp[1] for sp in col_specs if sp[0] == "plain"}
                bad = [c for c in pcols if c not in plain]
                if bad:
                    raise ValueError(
                        f"PARTITIONED BY column(s) {bad} must be plain "
                        "declared columns"
                    )
                dst.partition_by = list(pcols)
            # Stage the WHOLE declaration — schema in declared order,
            # NOT NULL / CHECK constraints, generated + identity specs,
            # the bloom property, partitioning — into ONE atomic commit:
            # a crash leaves either the fully-declared table or nothing
            # (never a half-declared root that refuses a re-run), and
            # no commit ever exists on which the declared enforcement
            # is not yet in force (a concurrent writer racing the DDL
            # cannot land violating rows before the constraints exist).
            fields: list = []
            gen: dict[str, str] = {}
            ident: dict[str, dict] = {}
            for sp in col_specs:
                if sp[0] == "plain":
                    _, cname, ddl, _nn = sp
                    # per-column parse: loud, with the column named
                    try:
                        fields += _parse_datatype_string(
                            f"`{cname}` {ddl}"
                        ).fields
                    except Exception:
                        raise ValueError(
                            f"unparseable DDL type {ddl!r} for column "
                            f"'{cname}'"
                        ) from None
                elif sp[0] == "generated":
                    _, cname, ddl, expr = sp
                    try:
                        dt = _parse_datatype_string(ddl)
                    except Exception:
                        raise ValueError(
                            f"unparseable DDL type {ddl!r} for column "
                            f"'{cname}'"
                        ) from None
                    # loud on a bad expression / unknown source columns:
                    # analyze against the columns declared SO FAR (the
                    # same frame add_generated_column validates against)
                    empty_df(spark, StructType(list(fields))).select(
                        F.expr(expr).cast(dt).alias(cname)
                    )
                    gen[cname] = expr
                    fields.append(StructField(cname, dt, True))
                else:  # identity
                    _, cname, start, step = sp
                    if int(step) == 0:
                        raise ValueError("identity step cannot be 0")
                    ident[cname] = {"start": int(start), "step": int(step)}
                    fields.append(StructField(cname, LongType(), True))
            names = [f.name for f in fields]
            dup = sorted({n for n in names if names.count(n) > 1})
            if dup:
                raise ValueError(f"duplicate column(s) in CREATE TABLE: {dup}")
            cons: dict[str, str] = {}
            for sp in col_specs:
                if sp[0] == "plain" and sp[3]:
                    cons[f"{sp[1]}_not_null"] = f"{sp[1]} IS NOT NULL"
            for _, cname, pred in cons_specs:
                if cname in cons:
                    raise ValueError(f"duplicate constraint '{cname}'")
                cons[cname] = pred
            extra: dict[str, Any] = {}
            if props is not None:
                extra["bloom_index"] = {
                    "col": props[0], "bits": int(props[1]), "k": int(props[2]),
                }
            info = dst._commit(
                "overwrite",
                [],
                StructType(fields).simpleString(),
                constraints=cons or None,
                generated=gen or None,
                identity=ident or None,
                **extra,
            )
            return info
        pbm = re.match(
            rf"PARTITIONED{_WS}BY\s*\(([^)]*)\)\s*", tail_masked, re.I
        )
        if pbm:
            # CTAS partitioning: recorded on the bootstrap commit; the
            # engine's write layout enforces it from there
            dst.partition_by = [
                c.strip().strip("`")
                for c in tail[pbm.start(1):pbm.end(1)].split(",")
            ]
            tail, tail_masked = tail[pbm.end():], tail_masked[pbm.end():]
        am = re.match(rf"AS{_WS}(.*)$", tail_masked, re.I | re.S)
        if not am:
            raise ValueError(
                "unsupported CREATE TABLE shape — expected: CREATE [OR "
                "REPLACE] TABLE versioned.`/p` [PARTITIONED BY (col, "
                "...)] AS <query>, CREATE TABLE versioned.`/p` (col "
                "type, ...) [PARTITIONED BY (...)] [TBLPROPERTIES "
                "(...)], or CREATE TABLE versioned.`/p` SHALLOW|DEEP "
                "CLONE <src> [VERSION AS OF n]"
            )
        return dst.commit_overwrite(spark.sql(tail[am.start(1):]))

    if verb == "RESTORE":
        # RESTORE TABLE <t> TO VERSION AS OF <n> | TO TIMESTAMP AS OF
        # <epochSeconds> — Delta RESTORE: roll-forward commit whose
        # content equals the target version's (history append-only)
        m = re.match(
            rf"RESTORE{_WS}TABLE{_WS}({_REF}){_WS}TO{_WS}"
            rf"(VERSION|TIMESTAMP){_WS}AS{_WS}OF{_WS}([\d.]+|'[^']*')\s*$",
            masked, re.I,
        )
        if not m:
            raise ValueError(
                "unsupported RESTORE shape — expected: RESTORE TABLE "
                "<target> TO VERSION AS OF <n> | TO TIMESTAMP AS OF "
                "<epochSeconds | 'timestamp text'>"
            )
        vt = VersionedTable(
            spark, _resolve_root(spark, stmt[m.start(1):m.end(1)])
        )
        arg = stmt[m.start(3):m.end(3)]
        if m.group(2).upper() == "VERSION":
            if arg.startswith("'"):
                raise ValueError("VERSION AS OF takes an integer")
            return vt.rollback(int(arg))
        if arg.startswith("'"):
            # quoted timestamp text: resolved by Spark itself in the
            # SESSION timezone (Delta's semantics for timestamp
            # strings), so tz-naive text means what the user's session
            # says it means
            row = spark.sql(
                f"SELECT cast(try_to_timestamp({arg}) as double) AS ts"
            ).first()
            if row.ts is None:
                raise ValueError(f"unparseable RESTORE timestamp {arg}")
            epoch = float(row.ts)
        else:
            epoch = float(arg)
        return vt.rollback(vt.version_as_of_timestamp(epoch))

    if verb == "OPTIMIZE":
        # OPTIMIZE <target> [WHERE <partition pred>] [ZORDER BY (...)]
        # — Delta's SQL shape; WHERE restricts the rewrite to whole
        # partitions (partition-columns-only predicate)
        m = re.match(
            rf"OPTIMIZE{_WS}({_REF})"
            rf"(?:{_WS}WHERE{_WS}(.+?))?"
            rf"(?:{_WS}ZORDER{_WS}BY\s*\(([^)]*)\))?\s*$",
            masked, re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported OPTIMIZE shape — expected: OPTIMIZE "
                "<target> [WHERE <partition predicate>] "
                "[ZORDER BY (col, ...)]"
            )
        target = stmt[m.start(1):m.end(1)]
        where = stmt[m.start(2):m.end(2)].strip() if m.group(2) else None
        zcols = (
            [c.strip().strip("`") for c in stmt[m.start(3):m.end(3)].split(",")]
            if m.group(3)
            else None
        )
        vt = VersionedTable(spark, _resolve_root(spark, target))
        return vt.optimize(zorder_by=zcols, where=where, attempts=attempts)

    if verb == "VACUUM":
        # VACUUM <target> [RETAIN <n> VERSIONS | RETAIN <n> HOURS]
        # [GRACE <n> SECONDS] [DRY RUN] — HOURS is Delta's time-based
        # history retention (commit-time horizon, head always kept);
        # VERSIONS is the count-based form; the grace-seconds file-age
        # guard keeps Delta's in-flight safety either way
        m = re.match(
            rf"VACUUM{_WS}({_REF})"
            rf"(?:{_WS}RETAIN{_WS}(\d+(?:\.\d+)?){_WS}(VERSIONS|HOURS))?"
            rf"(?:{_WS}GRACE{_WS}(\d+){_WS}SECONDS)?"
            rf"(?:{_WS}DRY{_WS}RUN)?\s*$",
            masked, re.I,
        )
        if not m:
            raise ValueError(
                "unsupported VACUUM shape — expected: VACUUM <target> "
                "[RETAIN <n> VERSIONS | RETAIN <n> HOURS] "
                "[GRACE <n> SECONDS] [DRY RUN]"
            )
        target = stmt[m.start(1):m.end(1)]
        dry = bool(re.search(rf"{_WS}DRY{_WS}RUN\s*$", masked, re.I))
        kwargs: dict[str, Any] = {"dry_run": dry}
        if m.group(3) and m.group(3).upper() == "HOURS":
            kwargs["retain_hours"] = float(m.group(2))
        elif m.group(2):
            if "." in m.group(2):
                raise ValueError("RETAIN <n> VERSIONS takes an integer")
            kwargs["retain_last"] = int(m.group(2))
        vt = VersionedTable(spark, _resolve_root(spark, target))
        if m.group(4) is not None:
            # GRACE overrides the 7-day in-flight file-age guard (in
            # seconds) — 0 only when the caller can prove no
            # concurrent writers
            kwargs["grace_seconds"] = float(m.group(4))
        reclaimed = vt.vacuum(**kwargs)
        return local_df(spark, [(p,) for p in reclaimed], "path string")

    if verb == "COPY":
        # COPY INTO <target> FROM '<path>' [FILEFORMAT = fmt]
        #   [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', ...)]
        #   [COPY_OPTIONS ('force'|'mergeSchema' = 'true'|'false')]
        # — Databricks COPY INTO: file-granular idempotent load
        # (versioned_dml.copy_into). Returns the load metrics as a
        # one-row DataFrame (Databricks' result shape).
        pk = _parse_copy(stmt, masked)
        vt = VersionedTable(spark, _resolve_root(spark, pk.pop("target")))
        r = vt.copy_into(attempts=attempts, **pk)
        return local_df(
            spark,
            [(
                r["files_loaded"],
                r["rows_loaded"],
                r["files_skipped"],
                r["version"],
            )],
            "num_loaded_files bigint, num_inserted_rows bigint, "
            "num_skipped_files bigint, version bigint",
        )

    if verb == "ANALYZE":
        m = re.match(
            rf"ANALYZE{_WS}TABLE{_WS}({_REF}){_WS}"
            rf"COMPUTE{_WS}STATISTICS\s*$",
            masked, re.I,
        )
        if not m:
            return spark.sql(stmt)  # other ANALYZE forms: Spark's own
        try:
            root = _resolve_root(spark, stmt[m.start(1):m.end(1)])
        except ValueError as e:
            if "read-only" in str(e):
                raise  # snapshot/feed view: stats refresh is a write
            return spark.sql(stmt)  # ordinary catalog table
        return VersionedTable(spark, root).refresh_file_sizes(
            attempts=attempts
        )

    if verb == "SHOW":
        pm_ = re.match(
            rf"SHOW{_WS}PARTITIONS{_WS}({_REF})\s*$", masked, re.I
        )
        if pm_:
            try:
                root = _resolve_root(spark, stmt[pm_.start(1):pm_.end(1)])
            except Exception:
                return spark.sql(stmt)  # ordinary catalog table
            vt = VersionedTable(spark, root)
            vals = vt.partition_values()  # raises on unpartitioned
            pcols = vt.effective_partitioning()
            from pyspark.sql.types import StringType, StructField, StructType

            sdf = local_df(
                spark,
                [tuple(v[c] for c in pcols) for v in vals],
                StructType([StructField(c, StringType()) for c in pcols]),
            )
            # typed where the path-string encoding provably round-trips
            # (same set as metadata-only predicate evaluation); other
            # types stay the recorded strings — never a lossy cast
            types = {
                f.name: f.dataType
                for f in vt._schema_of(vt.manifest()).fields
            }
            return sdf.select(
                *[
                    F.col(c).cast(types[c]).alias(c)
                    if types[c].simpleString() in vt._PV_EXACT_TYPES
                    else F.col(c)
                    for c in pcols
                ]
            ).orderBy(*pcols)
        m = re.match(rf"SHOW{_WS}TBLPROPERTIES{_WS}({_REF})\s*$", masked, re.I)
        if not m:
            return spark.sql(stmt)  # other SHOW forms: Spark's own
        vt = VersionedTable(
            spark, _resolve_root(spark, stmt[m.start(1):m.end(1)])
        )
        return local_df(
            spark, sorted(vt.table_properties().items()), "key string, value string"
        )

    if verb == "DESCRIBE":
        m = re.match(rf"DESCRIBE{_WS}HISTORY{_WS}({_REF})\s*$", masked, re.I)
        if m:
            target = stmt[m.start(1):m.end(1)]
            vt = VersionedTable(spark, _resolve_root(spark, target))
            return vt.history()
        m = re.match(rf"DESCRIBE{_WS}DETAIL{_WS}({_REF})\s*$", masked, re.I)
        if not m:
            return spark.sql(stmt)  # plain DESCRIBE: Spark's own
        # Delta's DESCRIBE DETAIL shape: one row of table metadata,
        # all O(manifest) — zero data I/O
        vt = VersionedTable(
            spark, _resolve_root(spark, stmt[m.start(1):m.end(1)])
        )
        m_ = vt.manifest()
        # sizeInBytes only when every entry records it (pre-r10 files
        # may not) — a partial sum would silently under-report
        sizes = [f.get("bytes") for f in m_["files"]]
        return local_df(
            spark,
            [(
                "versioned",
                vt.root,
                int(m_["version"]),
                len(m_["files"]),
                sum(vt._entry_live_rows(f) for f in m_["files"]),
                sum(sizes) if all(b is not None for b in sizes) else None,
                len(m_.get("constraints") or {}),
                list(m_.get("partition_by") or []),
                vt.table_properties(),
                float(m_["ts"]) if m_.get("ts") is not None else None,
            )],
            "format string, location string, version bigint, "
            "numFiles bigint, numRows bigint, sizeInBytes bigint, "
            "numConstraints bigint, partitionColumns array<string>, "
            "properties map<string,string>, commitTs double",
        )

    if verb == "INSERT":
        m = re.match(
            rf"INSERT{_WS}(INTO|OVERWRITE)(?:{_WS}TABLE)?{_WS}({_REF})"
            rf"\s*(\([^)]*\))?\s*(.+)$",
            masked, re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported INSERT shape — expected: INSERT INTO|"
                "OVERWRITE <target> [(col, ...)] SELECT|VALUES ..."
            )
        target = stmt[m.start(2):m.end(2)]
        col_list = None
        if m.group(3):
            cols_text = stmt[m.start(3) + 1:m.end(3) - 1]
            col_list = [c.strip().strip("`") for c in cols_text.split(",")]
        query = stmt[m.start(4):]
        root = _resolve_root(spark, target)
        vt = VersionedTable(spark, root)
        # INSERT INTO <t> REPLACE WHERE <pred> <query> — Delta's SQL
        # replaceWhere: atomically delete the predicate's rows AND
        # insert the query's, one commit (versioned_dml.replace_where;
        # partition-only predicates take the metadata-only fast path).
        # The predicate runs up to the query head keyword at paren
        # depth 0 of the masked text, so subquery SELECTs inside the
        # predicate cannot truncate it.
        seg = masked[m.start(4):]
        rwh = re.match(rf"REPLACE{_WS}WHERE{_WS}", seg, re.I)
        if rwh:
            if m.group(1).upper() != "INTO":
                raise ValueError(
                    "REPLACE WHERE pairs with INSERT INTO, not INSERT "
                    "OVERWRITE (which replaces the whole table)"
                )
            if col_list is not None:
                raise ValueError(
                    "INSERT INTO ... REPLACE WHERE takes no column "
                    "list — the query must supply the full row"
                )
            qstart = None
            depth = 0
            for km in re.finditer(
                r"\(|\)|\b(?:SELECT|VALUES|WITH|TABLE)\b",
                seg[rwh.end():], re.I,
            ):
                tok = km.group(0)
                if tok == "(":
                    depth += 1
                elif tok == ")":
                    depth -= 1
                elif depth == 0:
                    qstart = rwh.end() + km.start()
                    break
            off = m.start(4)
            pred = stmt[off + rwh.end():off + (qstart or 0)].strip()
            if qstart is None or not pred:
                raise ValueError(
                    "unsupported REPLACE WHERE shape — expected: INSERT "
                    "INTO <target> REPLACE WHERE <pred> SELECT|VALUES ..."
                )
            rquery = stmt[off + qstart:]
            df = _align_insert(spark, vt, spark.sql(rquery), None)
            return vt.replace_where(pred, df, attempts=attempts)
        df = spark.sql(query)
        df = _align_insert(spark, vt, df, col_list)
        if m.group(1).upper() == "OVERWRITE":
            return vt.commit_overwrite(df)
        return vt.commit_with_retry(
            lambda t: t.commit_append(df), attempts
        )

    if verb == "UPDATE":
        m = re.match(
            rf"UPDATE{_WS}({_REF}){_WS}SET{_WS}(.*?)(?:{_WS}WHERE{_WS}(.*))?$",
            masked, re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported UPDATE shape — expected: UPDATE <target> "
                "SET col = expr [, ...] [WHERE pred]"
            )
        target = stmt[m.start(1):m.end(1)]
        sets_text = stmt[m.start(2):m.end(2)]
        sets_masked = masked[m.start(2):m.end(2)]
        pred = stmt[m.start(3):m.end(3)] if m.group(3) else "true"
        assigns = {}
        for part, pm in zip(
            _split_top(sets_text, sets_masked),
            _split_top(sets_masked, sets_masked),
        ):
            am = re.match(r"\s*(\w+|`[^`]+`)\s*=", pm)
            if not am:
                raise ValueError(f"unsupported SET assignment {part!r}")
            assigns[part[am.start(1):am.end(1)].strip("`")] = part[am.end():].strip()
        vt = VersionedTable(spark, _resolve_root(spark, target))
        return vt.update_where(pred, assigns, attempts=attempts, mode=mode)

    if verb == "DELETE":
        m = re.match(
            rf"DELETE{_WS}FROM{_WS}({_REF})(?:{_WS}WHERE{_WS}(.*))?$",
            masked, re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported DELETE shape — expected: DELETE FROM "
                "<target> [WHERE pred]"
            )
        target = stmt[m.start(1):m.end(1)]
        pred = stmt[m.start(2):m.end(2)] if m.group(2) else "true"
        vt = VersionedTable(spark, _resolve_root(spark, target))
        return vt.delete_where(pred, attempts=attempts, mode=mode)

    # MERGE
    pk = _parse_merge(stmt, masked)
    vt = VersionedTable(spark, _resolve_root(spark, pk["target"]))
    src_ref = pk["source"]
    source = (
        spark.sql(f"SELECT * FROM {src_ref} AS s")
        if src_ref.startswith("(")
        else spark.table(src_ref)
    )
    mc, nmbs = pk["matched_clauses"], pk["not_matched_by_source_clauses"]
    legacy_single = (
        len(mc) == 1
        and len(nmbs) <= 1
        and all(cl["action"] == "delete" for cl in nmbs)
        and pk["insert_condition"] is None
    )
    if pk["merge_schema"]:
        # WITH SCHEMA EVOLUTION: the clause/SET-form merge engine
        # projects the source onto the TARGET schema (extras are the
        # CDC op-column shape and must not land), so genuinely-new
        # source columns evolve via metadata-only ADD COLUMN commits
        # FIRST, then the merge sees them as target columns and
        # carries their values. Delta folds the evolution into the
        # merge commit — documented nuance (the same one as ADD
        # COLUMNS: one evolution commit per column).
        have = {f.name for f in vt._schema_of(vt.manifest()).fields}
        for f in source.schema.fields:
            if f.name not in have:
                vt.add_column(f.name, f.dataType.simpleString())
    if not legacy_single:
        # multi-clause (or by-source UPDATE / conditional INSERT / no
        # matched clause): route the ordered clause lists natively —
        # first-match-wins, matched rows taking no clause carry through
        # UNCHANGED (SQL semantics; also the insert-only shape). Clause
        # conditions/SETs reference t.<col>/s.<col>; the INSERT gate is
        # evaluated on the source row (s. prefix stripped).
        return vt.merge(
            source,
            pk["keys"],
            attempts=attempts,
            merge_schema=pk["merge_schema"],
            matched_clauses=mc,
            not_matched_by_source_clauses=nmbs,
            insert_unmatched=pk["insert_unmatched"],
            insert_condition=(
                re.sub(r"\bs\s*\.\s*", "", pk["insert_condition"])
                if pk["insert_condition"]
                else None
            ),
        )
    delete_col = None
    when_matched_update = pk["when_matched_update"]
    if pk["matched_delete"] is not None:
        # merge()'s delete channel is a boolean SOURCE column; the
        # matched-DELETE condition may reference s.<col> only (it
        # must be evaluable on the source row)
        delete_col = "__sql_matched_delete"
        cond = re.sub(r"\bs\s*\.\s*", "", pk["matched_delete"])
        source = source.withColumn(delete_col, F.expr(cond).cast("boolean"))
        if when_matched_update is None:
            # SQL semantics: matched rows NOT taken by the DELETE
            # condition carry through UNCHANGED — express that as a
            # no-op update on one non-key column (merge()'s whole-row
            # mode would otherwise replace them with source rows)
            m = vt.manifest()
            nonkey = [
                f.name
                for f in vt._schema_of(m).fields
                if f.name not in pk["keys"]
            ]
            if not nonkey:
                raise ValueError(
                    "WHEN MATCHED THEN DELETE needs at least one non-key "
                    "column on the target"
                )
            when_matched_update = {nonkey[0]: f"t.{nonkey[0]}"}
    return vt.merge(
        source,
        pk["keys"],
        delete_col=delete_col,
        attempts=attempts,
        merge_schema=pk["merge_schema"],
        when_matched_update=when_matched_update,
        when_matched_condition=pk["when_matched_condition"],
        insert_unmatched=pk["insert_unmatched"],
        not_matched_by_source_delete=pk["not_matched_by_source_delete"],
    )
