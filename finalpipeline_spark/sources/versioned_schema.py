"""Schema layer of the versioned table: CHECK constraints,
generated and identity columns, and column-level evolution
(add/drop/widen/rename/re-add with column mapping).

One of three method-providing mixins composed into
:class:`finalpipeline_spark.sources.versioned.VersionedTable` (the
others: versioned_log, versioned_dml). Organizational split only —
methods run on the composed table object.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finalpipeline_spark.functions.frames import empty_df
from finalpipeline_spark.sources.versioned_base import (
    _NO_CAS,
    CommitInfo,
    ConstraintViolationError,
    SchemaMismatchError,
    VersionNotFoundError,
)


class SchemaEvolutionMixin:
    """Composed into VersionedTable — never instantiated directly."""

    def _schema_of(self, m: dict[str, Any]):
        """Manifest schema string → StructType. Imposing this on every
        multi-file read gives a stable column set across schema
        evolution: files written before a column was added simply
        backfill NULL for it (standard parquet read-with-schema
        semantics), and column order never depends on which file the
        reader happened to open first."""
        from finalpipeline_spark.sources.versioned_base import (
            parse_ddl_cached,
        )

        return parse_ddl_cached(m["schema"])


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
        empty_df(self.spark, schema).select(
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
        entries. Change feeds serve ranges crossing a re-add for any
        consumer whose pin postdates it (old-era steps emit NULL);
        only a feed PINNED BEFORE the re-add refuses — it would
        otherwise silently read new-era values under its old-era
        column (sources/pyds.py _pin_directions)."""
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
        if name in (m.get("partition_by") or []):
            raise ValueError(
                f"column '{name}' is a PARTITION column of {self.root} "
                "— partitioning is fixed at table creation"
            )
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
        if old in (m.get("partition_by") or []):
            raise ValueError(
                f"column '{old}' is a PARTITION column of {self.root} "
                "— partitioning is fixed at table creation"
            )
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


    # -- table properties (bloom point-lookup index) ---------------------

    def set_bloom_index(
        self, col: str, bits: int = 8192, k: int = 3, attempts: int = 10
    ) -> CommitInfo:
        """Declare (or re-declare) the durable bloom-index table
        property as a METADATA-ONLY commit — the ``ALTER TABLE SET
        TBLPROPERTIES`` half of the bloom story (the other half is the
        constructor's ``bloom_col``, which this property outlives).
        From this commit on, EVERY writer — config-less handles, other
        drivers, the SQL/V2 write path — records per-file bloom words
        for ``col`` (the carry-forward in ``_commit``), and
        ``read_point_lookup`` prunes on them. Files committed before
        the property carry no words and are probed conservatively, so
        the index tightens as the table naturally rewrites; an
        ``optimize()`` materializes it everywhere at once."""
        if bits < 64 or k < 1:
            raise ValueError(f"bad bloom geometry: bits={bits}, k={k}")
        return self.commit_with_retry(
            lambda t: t._set_bloom_once(col, int(bits), int(k)), attempts
        )

    def _set_bloom_once(self, col: str, bits: int, k: int) -> CommitInfo:
        m = self.manifest()
        if col not in self._schema_of(m).fieldNames():
            raise ValueError(f"no column '{col}' on {self.root}")
        return self._commit(
            "set_properties",
            list(m["files"]),
            m["schema"],
            base_version=m["version"],
            bloom_index={"col": col, "bits": bits, "k": k},
        )

    def drop_bloom_index(self, attempts: int = 10) -> CommitInfo:
        """Clear the bloom-index table property (``ALTER TABLE UNSET
        TBLPROPERTIES``): subsequent commits stop recording words and
        point lookups through config-less handles refuse again.
        Existing per-file words stay in old manifests (harmless) and
        purge as files rewrite."""
        def once(t):
            m = t.manifest()
            if not m.get("bloom_index"):
                raise ValueError(f"no bloom_index property on {t.root}")
            return t._commit(
                "set_properties",
                list(m["files"]),
                m["schema"],
                base_version=m["version"],
                bloom_index=None,
            )

        return self.commit_with_retry(once, attempts)

    def table_properties(self, version: int | None = None) -> dict[str, str]:
        """The table's durable properties as flat Delta-style key
        strings (``SHOW TBLPROPERTIES`` backing)."""
        m = self.manifest(version)
        props: dict[str, str] = {}
        b = m.get("bloom_index")
        if b:
            props["bloom.column"] = str(b["col"])
            props["bloom.bits"] = str(b["bits"])
            props["bloom.k"] = str(b["k"])
        if m.get("reader"):
            props["versioned.minReaderVersion"] = str(m["reader"])
        return props
