"""DML layer of the versioned table: append/overwrite commits,
row-level delete/update (CoW and merge-on-read deletion vectors),
MERGE with Delta's clause surface, replace-where, optimize/z-order,
rollback, and clones.

One of three method-providing mixins composed into
:class:`finalpipeline_spark.sources.versioned.VersionedTable` (the
others: versioned_log, versioned_schema). Organizational split only —
methods run on the composed table object.
"""

from __future__ import annotations

import json
import math
import os
import threading
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finalpipeline_spark.functions.frames import local_df
from finalpipeline_spark.sources.versioned_base import (
    _DATA_DIR,
    _DV_BROADCAST_ROWS,
    _DV_DIR,
    _DV_SCHEMA,
    _LOG_DIR,
    _NO_CAS,
    CommitInfo,
    ConcurrentCommitError,
    ConstraintViolationError,
    SchemaMismatchError,
    VersionNotFoundError,
    _STR_STAT_MAX,
    _json_safe,
    _same_file_refs,
    _stat_cols,
    _trunc_upper,
    cdf_final_state,
)


# COPY INTO ledger cache — see DmlMixin._copy_into_loaded
_COPY_LEDGER_CACHE: dict[str, dict] = {}
_COPY_LEDGER_MAX = 64
_COPY_LEDGER_LOCK = threading.Lock()

# MERGE rewrite-join strategy gate (guide §3.1): when the key-unique
# source is provably small, broadcast it so the rewrite scan — the
# table-sized side — is never shuffled (unhinted, the planner
# sort-merges whenever the POST-SHUFFLE size estimate exceeds the 10 MB
# auto-broadcast ceiling, which a multi-TB rewrite set at 100 TB pays
# with a full exchange of every surviving row). The probe action counts
# the source exactly (one extra tagged branch, no extra job), and the
# gate compares count × schema-width estimate against this byte budget
# — conf-overridable, deployment-sized, NOT tuned to the local sandbox.
_MERGE_BROADCAST_CONF = "spark.finalpipeline.merge.broadcastMaxBytes"
_MERGE_BROADCAST_DEFAULT = 32 * 1024 * 1024


def _merge_broadcast_bytes(spark) -> int:
    try:
        return int(
            spark.conf.get(_MERGE_BROADCAST_CONF, str(_MERGE_BROADCAST_DEFAULT))
        )
    except Exception:
        return _MERGE_BROADCAST_DEFAULT


# Catalyst's per-type defaultSize values (PySpark doesn't expose them)
_TYPE_WIDTHS = {
    "boolean": 1, "byte": 1, "tinyint": 1, "short": 2, "smallint": 2,
    "int": 4, "integer": 4, "float": 4, "date": 4, "long": 8, "bigint": 8,
    "double": 8, "timestamp": 8, "timestamp_ntz": 8, "string": 20,
    "binary": 100,
}


def _est_row_bytes(schema_or_fields) -> int:
    """Planner-style row-width estimate from Catalyst's defaultSize
    table; unknown (nested/decimal) types count a conservative 64."""
    fields = getattr(schema_or_fields, "fields", schema_or_fields)
    return (
        sum(_TYPE_WIDTHS.get(f.dataType.simpleString(), 64) for f in fields)
        or 8
    )


class DmlMixin:
    """Composed into VersionedTable — never instantiated directly."""

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
        optimize, whose content is provably unchanged).

        String min/max are recorded as TRUNCATED BOUNDS, Iceberg-style
        (``_STR_STAT_MAX`` chars): a document-body column must never
        put two whole documents into every manifest entry — at 10^5
        files that is manifest blow-up, the difference between an
        O(MB) planning read and an O(table) one. The truncated lower
        bound is the min over per-row prefixes (a prefix <= its
        string, and min-of-prefixes <= every full value); the upper
        bound is the max prefix with its last character incremented
        (greater than every value sharing any prefix <= it) — so
        pruning stays safe, only over-selecting. Columns whose bounds
        were actually truncated are listed in the entry's
        ``stats_trunc`` so ``column_stats`` refuses them (the bounds
        are no longer the exact extremes); columns that never exceed
        the cap keep exact stats and no marker.

        The stats pass normally comes FREE from the parquet footers
        the write just produced (``_footer_stats``: a driver-side
        metadata read, no Spark job — the commit-sized file list makes
        it O(files), and at any scale the footers are written anyway).
        The extra Spark aggregation job runs only when the footers
        cannot answer exactly: a bloom index must be populated (needs
        the data), a nested column needs outer null counts (footers
        only carry leaf-level ones), or a footer omitted min/max for a
        column with live values (parquet-mr drops stats for >4KB
        binary values and never writes them for INT96 timestamps)."""
        if enforce:
            cons = self.constraints()
            if cons:
                self._check_df(df, cons)
            gen = self.generated()
            if gen:
                self._verify_generated(df, gen)
        commit_dir = f"{_DATA_DIR}/c{uuid.uuid4().hex}"
        abs_dir = f"{self.root}/{commit_dir}"
        pcols = self.effective_partitioning()
        if pcols:
            missing = [c for c in pcols if c not in df.columns]
            if missing:
                raise SchemaMismatchError(
                    f"write is missing partition column(s) {missing} "
                    f"of {self.root}"
                )
            reserved = [c for c in df.columns if c.startswith("pv__")]
            if reserved:
                raise ValueError(
                    f"partitioned tables reserve the 'pv__' column-name "
                    f"prefix (write layout): {reserved}"
                )
            # one-value-per-file layout via partitionBy on DUPLICATE
            # ``pv__<col>`` columns: the writer strips its partitionBy
            # columns from the data files, so duplicating keeps the
            # real columns physically present — every existing read
            # path (imposed-schema file-list scans, the pyarrow
            # DataSource, stats) works unchanged, and per-file min/max
            # stats on partition columns become EXACT by construction
            # (min == max == the partition value).
            out = df
            for c in pcols:
                out = out.withColumn(f"pv__{c}", F.col(c))
            out.write.mode("errorifexists").partitionBy(
                *[f"pv__{c}" for c in pcols]
            ).parquet(abs_dir)
            # stats read back the EXPLICIT leaf files with the input
            # schema imposed: no partition-dir inference (the pv__
            # dirs are write-layout only), and an empty input — which
            # partitionBy writes as zero files — short-circuits
            written = self._list_data_files(commit_dir)
            if not written:
                return []
            fast = self._footer_stats(df, commit_dir, written, pcols)
            if fast is not None:
                return fast
            back = self.spark.read.schema(df.schema).parquet(*written)
        else:
            df.write.mode("errorifexists").parquet(abs_dir)
            written = self._list_data_files(commit_dir)
            fast = self._footer_stats(df, commit_dir, written, pcols)
            if fast is not None:
                return fast
            # imposed schema: the files were just written from ``df``,
            # re-inferring it would re-read every footer through the JVM
            back = self.spark.read.schema(df.schema).parquet(abs_dir)
        cols = _stat_cols(back)
        str_cols = {c for c, t in back.dtypes if c in set(cols) and t == "string"}
        all_cols = back.columns  # null counts work for EVERY type
        aggs = [
            F.count(F.lit(1)).alias("__rows"),
            # physical file size rides the same one-pass aggregation
            # (every row of a file carries the same _metadata value) —
            # feeds DESCRIBE DETAIL and size-aware maintenance with
            # zero extra I/O
            F.first(F.col("__fsize")).alias("__bytes"),
        ]
        for c in cols:
            if c in str_cols:
                pre = F.substring(F.col(c), 1, _STR_STAT_MAX)
                aggs += [
                    F.min(pre).alias(f"__min_{c}"),
                    F.max(pre).alias(f"__max_{c}"),
                    F.max(F.length(F.col(c))).alias(f"__len_{c}"),
                ]
            else:
                aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        for c in all_cols:
            aggs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nc_{c}")
            )
        stats = (
            back.select(
                F.col("_metadata.file_path").alias("__file"),
                F.col("_metadata.file_size").alias("__fsize"),
                *all_cols,
            )
            .groupBy("__file")
            .agg(*aggs)
            .collect()  # one row per new data file — manifest-sized
        )
        bcfg = self.effective_bloom()
        blooms = (
            self._per_file_blooms(back, *bcfg)
            if bcfg is not None and bcfg[0] in back.columns
            else {}
        )
        files = []
        for r in stats:
            full = r["__file"]
            idx = full.find(commit_dir)
            rel = full[idx:] if idx >= 0 else full
            entry: dict[str, Any] = {
                "path": rel,
                "rows": r["__rows"],
                "bytes": int(r["__bytes"]),
            }
            if pcols:
                entry["pv"] = self._pv_from_rel(rel, pcols)
            ent_stats: dict[str, Any] = {}
            trunc: list[str] = []
            for c in cols:
                mn, mx = r[f"__min_{c}"], r[f"__max_{c}"]
                if (
                    c in str_cols
                    and (r[f"__len_{c}"] or 0) > _STR_STAT_MAX
                ):
                    # bounds, not extremes: adjust the upper prefix to
                    # stay an upper bound; unadjustable (all U+10FFFF)
                    # records no upper bound — readers treat None
                    # conservatively
                    mx = _trunc_upper(mx) if mx is not None else None
                    trunc.append(c)
                ent_stats[c] = [_json_safe(mn), _json_safe(mx)]
            entry["stats"] = ent_stats
            if trunc:
                entry["stats_trunc"] = trunc
            entry["nulls"] = {c: int(r[f"__nc_{c}"]) for c in all_cols}
            if full in blooms:
                entry["bloom"] = blooms[full]
            files.append(entry)
        return files

    def _footer_stats(
        self,
        df: DataFrame,
        commit_dir: str,
        written: list[str],
        pcols: list[str] | None,
    ) -> list[dict[str, Any]] | None:
        """Manifest file entries computed from the parquet FOOTERS of
        the files a write just produced — a driver-side metadata read
        (milliseconds for a commit-sized file list), replacing the
        per-write Spark aggregation job. Returns ``None`` whenever the
        footers cannot reproduce the Spark pass EXACTLY, and the
        caller falls back:

        - a bloom index is configured (the filter needs the data);
        - any column is nested (array/map/struct): footers carry only
          leaf-level null counts, the manifest needs outer ones;
        - a footer omits min/max for a stat column that has live
          values (parquet-mr drops stats when min+max exceed 4KB and
          never writes them for INT96 timestamps) — recording no
          bounds would change pruning and ``column_stats``;
        - the files are not locally readable (non-file:// scheme).

        Semantics mirrored from the Spark pass: NaN folds as the
        LARGEST double (parquet-mr's Double.compare order — same as
        Spark's max); string bounds longer than ``_STR_STAT_MAX`` are
        prefix-truncated with ``_trunc_upper`` on the upper bound and
        the column marked ``stats_trunc`` (truncation is monotone, so
        the prefix of the true extreme equals the extreme over
        prefixes); zero-row files are skipped (the Spark groupBy never
        produced an entry for them)."""
        bcfg = self.effective_bloom()
        if bcfg is not None and bcfg[0] in df.columns:
            return None
        fields = df.schema.fields
        for f in fields:
            t = f.dataType.simpleString()
            if "array<" in t or "map<" in t or "struct<" in t:
                return None
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover — pyarrow ships with pyspark
            return None
        cols = set(_stat_cols(df))
        names = [f.name for f in fields]
        is_str = {f.name for f in fields if f.dataType.simpleString() == "string"}
        is_float = {
            f.name
            for f in fields
            if f.dataType.simpleString() in ("float", "double")
        }

        def _is_nan(v: Any) -> bool:
            return isinstance(v, float) and math.isnan(v)

        def _fold_min(vals: list[Any]) -> Any:
            real = [v for v in vals if not _is_nan(v)]
            return min(real) if real else vals[0]

        def _fold_max(vals: list[Any]) -> Any:
            if any(_is_nan(v) for v in vals):
                return float("nan")
            return max(vals)

        entries: list[dict[str, Any]] = []
        for full in written:
            local = full
            if local.startswith("file:"):
                local = local[len("file:"):]
                while local.startswith("//"):
                    local = local[1:]
            elif ":" in local.split("/", 1)[0]:
                return None  # non-local scheme — footers not readable here
            try:
                md = pq.ParquetFile(local).metadata
            except Exception:
                return None
            if md.num_rows == 0:
                continue
            # leaf order == declaration order for a flat schema; verify
            rg0 = md.row_group(0)
            leaf_names = [
                rg0.column(i).path_in_schema for i in range(rg0.num_columns)
            ]
            if leaf_names != names:
                return None
            rows = md.num_rows
            nulls: dict[str, int] = {}
            mins: dict[str, list[Any]] = {c: [] for c in cols}
            maxs: dict[str, list[Any]] = {c: [] for c in cols}
            ok = True
            for gi in range(md.num_row_groups):
                rg = md.row_group(gi)
                for ci, name in enumerate(names):
                    st = rg.column(ci).statistics
                    if st is None or not st.has_null_count:
                        ok = False
                        break
                    nulls[name] = nulls.get(name, 0) + st.null_count
                    if name not in cols:
                        continue
                    if rg.num_rows == st.null_count:
                        continue  # this group holds no live values
                    if not st.has_min_max:
                        ok = False  # live values but no bounds — fall back
                        break
                    mins[name].append(st.min)
                    maxs[name].append(st.max)
                if not ok:
                    break
            if not ok:
                return None
            idx = full.find(commit_dir)
            rel = full[idx:] if idx >= 0 else full
            entry: dict[str, Any] = {
                "path": rel,
                "rows": rows,
                "bytes": os.path.getsize(local),
            }
            if pcols:
                entry["pv"] = self._pv_from_rel(rel, pcols)
            ent_stats: dict[str, Any] = {}
            trunc: list[str] = []
            for f in fields:
                c = f.name
                if c not in cols:
                    continue
                if not mins[c]:
                    ent_stats[c] = [None, None]  # every value null
                    continue
                if c in is_float:
                    mn, mx = _fold_min(mins[c]), _fold_max(maxs[c])
                else:
                    mn, mx = min(mins[c]), max(maxs[c])
                if c in is_str and (
                    len(mn) > _STR_STAT_MAX or len(mx) > _STR_STAT_MAX
                ):
                    mn = mn[:_STR_STAT_MAX]
                    mx = _trunc_upper(mx[:_STR_STAT_MAX])
                    trunc.append(c)
                ent_stats[c] = [_json_safe(mn), _json_safe(mx)]
            entry["stats"] = ent_stats
            if trunc:
                entry["stats_trunc"] = trunc
            entry["nulls"] = {c: int(nulls[c]) for c in names}
            entries.append(entry)
        return entries

    def _list_data_files(self, rel_dir: str) -> list[str]:
        """Recursive listing of the data files under one commit dir
        (descends the ``pv__<col>=...`` partition subdirectories) —
        commit-sized, used only by the write path's stats read."""
        out: list[str] = []

        def walk(p) -> None:
            for st in self._fs.listStatus(p):
                name = st.getPath().getName()
                if name.startswith(("_", ".")):
                    continue
                if st.isDirectory():
                    walk(st.getPath())
                else:
                    out.append(st.getPath().toString())

        p = self._p(*rel_dir.split("/"))
        if self._fs.exists(p):
            walk(p)
        return sorted(out)

    def effective_partitioning(self) -> list[str] | None:
        """The partition columns in force for this table's writes: the
        handle's ``partition_by`` config (a bootstrap write records it)
        or the ``partition_by`` table property the manifest carries.
        Immutability of the property is enforced at commit time
        (versioned_log._commit)."""
        try:
            prop = self.manifest().get("partition_by")
        except VersionNotFoundError:
            prop = None
        if prop:
            return list(prop)
        return list(self.partition_by) if self.partition_by else None

    @staticmethod
    def _pv_from_rel(rel: str, pcols: list[str]) -> dict[str, Any]:
        """Decode the ``pv__<col>=<value>`` partition segments of a
        manifest-relative file path into the entry's string-encoded
        partition values (Delta's partitionValues shape: strings, NULL
        for the Hive default-partition marker). The dir names are the
        layout's ground truth — Spark escaped special characters as
        %XX (ExternalCatalogUtils.escapePathName), which unquote
        reverses exactly."""
        from urllib.parse import unquote

        pv: dict[str, Any] = {}
        for seg in rel.split("/")[:-1]:
            name, eq, raw = seg.partition("=")
            if eq and name.startswith("pv__"):
                val = unquote(raw)
                pv[name[len("pv__"):]] = (
                    None if val == "__HIVE_DEFAULT_PARTITION__" else val
                )
        missing = [c for c in pcols if c not in pv]
        if missing:
            raise ValueError(
                f"partitioned write produced a file without partition "
                f"segments for {missing}: {rel!r}"
            )
        return {c: pv[c] for c in pcols}

    # partition-value types whose path-string encoding provably
    # round-trips through a cast back to the column type — the
    # precondition for METADATA-ONLY partition predicate evaluation
    # (float/double/timestamp formatting is not trusted; those fall
    # back to the scan path, which is always correct)
    _PV_EXACT_TYPES = {
        "tinyint", "smallint", "int", "bigint", "string", "boolean", "date"
    }

    def _partition_pred_split(
        self, m: dict[str, Any], predicate: str
    ) -> tuple[list[dict[str, Any]], list[dict[str, Any]]] | None:
        """METADATA-ONLY partition predicate evaluation: when the table
        is partitioned, every entry carries ``pv``, the partition
        columns' types round-trip exactly through their path-string
        encoding, and ``predicate`` references ONLY partition columns,
        return ``(matched_entries, kept_entries)`` — matched files
        contain ONLY matching rows and kept files contain NONE, both
        provable from the one-value-per-file layout, so a delete or
        replace scoped to whole partitions needs NO data I/O at all
        (the Delta/Hive drop-partition fast path). Returns None when
        the fast path does not apply; callers fall back to the exact
        scan."""
        pcols = m.get("partition_by")
        if not pcols or any("pv" not in e for e in m["files"]):
            return None
        by_name = {f.name: f for f in self._schema_of(m).fields}
        if any(
            by_name[c].dataType.simpleString() not in self._PV_EXACT_TYPES
            for c in pcols
        ):
            return None
        distinct = sorted(
            {tuple(e["pv"][c] for c in pcols) for e in m["files"]}, key=repr
        )
        from pyspark.sql.types import StructField, StructType, StringType, LongType

        pdf = local_df(
            self.spark,
            [(i, *t) for i, t in enumerate(distinct)],
            StructType(
                [StructField("__pv_idx", LongType())]
                + [StructField(c, StringType()) for c in pcols]
            ),
        ).select(
            "__pv_idx",
            *[
                F.col(c).cast(by_name[c].dataType).alias(c)
                for c in pcols
            ],
        )
        try:
            matched_idx = {
                r["__pv_idx"]
                for r in pdf.filter(F.expr(predicate)).collect()
            }
        except Exception:
            # predicate references non-partition columns (or fails
            # analysis some other way): not partition-scoped
            return None
        matched_vals = {distinct[i] for i in matched_idx}
        matched, kept = [], []
        for e in m["files"]:
            key = tuple(e["pv"][c] for c in pcols)
            (matched if key in matched_vals else kept).append(e)
        return matched, kept

    def effective_bloom(self) -> tuple[str, int, int] | None:
        """The bloom-index geometry in force for THIS table's writes:
        the handle's explicit ``bloom_col`` config wins; otherwise the
        ``bloom_index`` table property the manifest carries (recorded
        by the first bloom-configured writer, carried forward by every
        commit like constraints) — so a config-less handle, a second
        driver, or the SQL write path all keep the index populated
        instead of silently writing unbloomed files."""
        if self.bloom_col:
            return self.bloom_col, self.bloom_bits, self.bloom_k
        try:
            prop = self.manifest().get("bloom_index")
        except VersionNotFoundError:
            return None
        if prop:
            return prop["col"], int(prop["bits"]), int(prop["k"])
        return None

    def _per_file_blooms(
        self, back: DataFrame, col: str, bits: int, k: int
    ) -> dict[str, list[int]]:
        """One bloom word-array per new data file over ``col``.
        The aggregation dedups (file, position) pairs map-side, so the
        collect is bounded by n_new_files × bits — commit-sized
        planning state, never row-sized."""
        from finalpipeline_spark.operators.bloom import _position_expr

        pos = F.array(
            *[F.expr(_position_expr(col, j, bits)) for j in range(k)]
        )
        rows = (
            back.filter(F.col(col).isNotNull())
            .select(
                F.col("_metadata.file_path").alias("__file"),
                F.explode(pos).alias("pos"),
            )
            .distinct()
            .collect()
        )
        words: dict[str, list[int]] = {}
        n_words = (bits + 63) // 64
        for r in rows:
            w = words.setdefault(r["__file"], [0] * n_words)
            w[r["pos"] >> 6] |= 1 << (r["pos"] & 63)
        return words

    def _bloom_might_contain(
        self, words: list[int], value: Any, bits: int, k: int
    ) -> bool:
        """Driver-side membership test mirroring operators/bloom's SQL
        scheme bit-for-bit: position = (md5('<seed>:<str(value)>') hex
        prefix as int31) % bits."""
        import hashlib

        for j in range(k):
            h = hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:8]
            p = (int(h, 16) % 2_147_483_648) % bits
            if not (words[p >> 6] >> (p & 63)) & 1:
                return False
        return True


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
        expected_base: int | None = None,
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
        existing rows' meaning.

        ``expected_base``: callers whose ``df`` DERIVES from an earlier
        snapshot read (e.g. ``copy_into``'s loaded-file ledger) pass
        the version that read observed; the append then refuses —
        before writing anything — if the table has advanced past it,
        closing the TOCTOU window the internal CAS (which guards
        against commits racing THIS method's own snapshot) cannot see."""
        if (
            expected_base is not None
            and self.latest_version() != expected_base
        ):
            raise ConcurrentCommitError(
                f"{self.root} advanced past expected base version "
                f"{expected_base} — re-derive and retry"
            )
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
            # a source column arriving at a provably-LOSSLESS wider
            # type (the widen_column set) evolves the table schema
            # in the same commit under merge_schema=True — Delta's
            # type-widening-in-mergeSchema; existing files upcast at
            # read exactly as after an explicit widen_column. Anything
            # else (narrowing, incompatible) still refuses.
            widen = {
                n
                for n in conflicts
                if new[n].simpleString()
                in self._WIDENINGS.get(old[n].simpleString(), set())
            }
            hard = [n for n in conflicts if n not in widen]
            if hard:
                raise SchemaMismatchError(
                    f"type change on {hard} is not supported "
                    "(additive evolution only)"
                )
            added = [n for n in new if n not in old]
            dropped = [n for n in old if n not in new]
            if (added or dropped or widen) and not merge_schema:
                raise SchemaMismatchError(
                    f"append schema differs from table schema "
                    f"(new columns {added}, absent columns {dropped}, "
                    f"widened columns {sorted(widen)}); "
                    "pass merge_schema=True for additive evolution"
                )
            if added:
                self._assert_no_readd(added, set(old))
            from pyspark.sql.types import StructField, StructType

            merged = StructType(
                [
                    StructField(f.name, new[f.name], f.nullable)
                    if f.name in widen
                    else f
                    for f in prev_schema.fields
                ]
                + [f for f in df.schema.fields if f.name not in old]
            )
            schema_ddl = merged.simpleString()
        new_files = self._write_data_files(df)
        return self._commit(
            "append",
            list(prev["files"]) + new_files,
            schema_ddl,
            meta,
            # with expected_base the caller's snapshot is the CAS base:
            # the exclusive slot claim + this check make "ledger read
            # at V, commit claims V+1" atomic (a racer in ANY window
            # trips one of the two) — the early fast-fail above only
            # saves the data write
            base_version=(
                prev["version"] if expected_base is None else expected_base
            ),
        )

    # -- COPY INTO ---------------------------------------------------

    _COPY_FORMATS = {"parquet", "csv", "json", "orc"}

    def _copy_into_loaded(self) -> set[str]:
        """Every source-file path ever recorded by a ``copy_into``
        commit's manifest meta — the idempotence ledger. Includes
        expired/archived manifests (mirrors ``committed_meta``: load
        identity must survive vacuum, or a re-run after retention
        would double-ingest).

        Incremental via the per-root contiguity cache (mirror of the
        stream sink's epoch cache, pyds_write._committed_epochs):
        committed manifests are immutable (vacuum only flips
        ``expired``; archival renames preserve name + content), so the
        path set over versions 0..upto never changes — a steady
        ingest-loop COPY pays O(commits since the last call), not
        O(all commits ever). Table REPLACEMENT at the same root is
        detected by pinning version 0's commit timestamp: a changed v0
        rebuilds from scratch, so a fresh table never inherits the
        dead table's ledger."""
        vs = self.versions()
        if not vs:
            return set()
        v0_ts = self._read_manifest_file(vs[0]).get("ts")
        with _COPY_LEDGER_LOCK:
            c = _COPY_LEDGER_CACHE.pop(self.root, None)
            if c is None or c["v0_ts"] != v0_ts:
                c = {"upto": -1, "paths": set(), "v0_ts": v0_ts}
            for v in vs:
                if v <= c["upto"]:
                    continue
                m = self._read_manifest_file(v).get("meta") or {}
                ci = m.get("copy_into")
                if ci:
                    c["paths"].update(
                        e["path"] for e in ci.get("files", [])
                    )
                c["upto"] = v
            out = set(c["paths"])
            if len(_COPY_LEDGER_CACHE) >= _COPY_LEDGER_MAX:
                _COPY_LEDGER_CACHE.pop(next(iter(_COPY_LEDGER_CACHE)))
            _COPY_LEDGER_CACHE[self.root] = c
        return out

    def _copy_list_source(
        self, source: str, pattern: str | None
    ) -> list[dict[str, Any]]:
        """Driver-side Hadoop glob of the COPY source → candidate file
        entries (fully-qualified path = the ledger identity, plus
        size/mtime provenance). The LISTING is driver-side and
        O(source-listing) — the data read stays a normal distributed
        Spark scan of only the selected files. ``_``/``.``-prefixed
        names are skipped (Spark marker/hidden convention)."""
        jvm = self._jvm
        P = jvm.org.apache.hadoop.fs.Path
        src = source.rstrip("/")
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        sfs = P(src).getFileSystem(conf)
        if pattern is not None:
            glob = P(f"{src}/{pattern}")
        elif any(ch in src for ch in "*?[{"):
            glob = P(src)
        elif sfs.exists(P(src)) and sfs.getFileStatus(P(src)).isDirectory():
            glob = P(f"{src}/*")
        else:
            glob = P(src)
        sts = sfs.globStatus(glob)
        cand = []
        for st in sts or []:
            if not st.isFile():
                continue
            hp = st.getPath()
            if hp.getName().startswith(("_", ".")):
                continue
            cand.append(
                {
                    "path": sfs.makeQualified(hp).toString(),
                    "bytes": int(st.getLen()),
                    "mtime_ms": int(st.getModificationTime()),
                }
            )
        cand.sort(key=lambda e: e["path"])
        return cand

    def copy_into(
        self,
        source: str,
        file_format: str = "parquet",
        pattern: str | None = None,
        format_options: dict[str, str] | None = None,
        force: bool = False,
        merge_schema: bool = False,
        attempts: int = 10,
    ) -> dict[str, Any]:
        """Databricks/Delta ``COPY INTO``: file-granular, idempotent,
        exactly-once ingestion. Lists ``source`` (a directory, file,
        or glob; ``pattern`` is a glob relative to a directory
        source), skips every file a previous COPY commit already
        recorded (ledger = ``meta.copy_into.files[*].path`` across the
        whole log, keyed on the fully-qualified URI), reads the rest
        with ``file_format``/``format_options``, aligns BY NAME onto
        the table schema (casts; missing stored columns NULL-backfill;
        unknown source columns refuse unless ``merge_schema`` — then
        they evolve the schema additively, parquet only since text
        formats read under the imposed stored-column schema), and
        appends in ONE commit whose meta carries the loaded file list.
        CHECK constraints, GENERATED compute, and IDENTITY assignment
        apply exactly as on any append. ``force=True`` bypasses the
        skip (and still records, so later non-force runs skip).

        Exactly-once under races: the append asserts ``expected_base``
        = the snapshot version the ledger was read at, so a racing
        COPY of the same files trips the CAS and the retry re-reads
        the ledger instead of double-loading.

        This is the lakehouse-level twin of the reference's
        ``used_input_files`` processed-file ledger (reference
        main.py:37-43); the medallion plan keeps the batch anti-join
        variant (plans/medallion.py).

        Returns ``{"version", "files_loaded", "rows_loaded",
        "files_skipped"}`` (version None when nothing new — a no-op
        run commits NOTHING)."""
        fmt = file_format.lower()
        if fmt not in self._COPY_FORMATS:
            raise ValueError(
                f"unsupported COPY INTO FILEFORMAT {file_format!r} — "
                f"supported: {sorted(f.upper() for f in self._COPY_FORMATS)}"
            )
        if self.latest_version() is None:
            raise ValueError(
                f"COPY INTO target {self.root} does not exist — CREATE "
                "the table first (COPY never infers a table)"
            )
        cand = self._copy_list_source(source, pattern)

        def _once(t: "DmlMixin") -> dict[str, Any]:
            snap = t.manifest()
            base = snap["version"]
            loaded = t._copy_into_loaded()
            new = [
                e for e in cand if force or e["path"] not in loaded
            ]
            skipped = len(cand) - len(new)
            if not new:
                return {
                    "version": None,
                    "files_loaded": 0,
                    "rows_loaded": 0,
                    "files_skipped": skipped,
                }
            reader = t.spark.read.format(fmt)
            opts = dict(format_options or {})
            if fmt == "csv" and not any(
                k.lower() == "header" for k in opts
            ):
                opts["header"] = "true"
            if opts:
                reader = reader.options(**opts)
            schema = t._schema_of(snap)
            gen = set(snap.get("generated") or {})
            ident = set(snap.get("identity") or {})
            stored = [
                f
                for f in schema.fields
                if f.name not in gen and f.name not in ident
            ]
            if fmt in ("csv", "json"):
                from pyspark.sql.types import StructType

                reader = reader.schema(StructType(stored))
            df = reader.load([e["path"] for e in new])
            by_name = {f.name for f in schema.fields}
            extra = [c for c in df.columns if c not in by_name]
            if extra and not merge_schema:
                raise SchemaMismatchError(
                    f"COPY source carries column(s) {extra} not in the "
                    f"table schema — pass mergeSchema for additive "
                    "evolution"
                )
            out = []
            for f in stored:
                if f.name in df.columns:
                    out.append(
                        F.col(f.name).cast(f.dataType).alias(f.name)
                    )
                else:
                    out.append(F.lit(None).cast(f.dataType).alias(f.name))
            out.extend(F.col(c) for c in extra)
            aligned = df.select(*out)
            prev_rows = sum(
                t._entry_live_rows(f) for f in snap["files"]
            )
            ci = t.commit_append(
                aligned,
                meta={
                    "copy_into": {
                        "source": source,
                        "format": fmt,
                        "files": new,
                    }
                },
                merge_schema=merge_schema,
                expected_base=base,
            )
            return {
                "version": ci.version,
                "files_loaded": len(new),
                "rows_loaded": ci.n_rows - prev_rows,
                "files_skipped": skipped,
            }

        return self.commit_with_retry(_once, attempts=attempts)

    def partition_values(self) -> list[dict[str, Any]]:
        """Distinct live partition-value tuples (string-encoded, as
        recorded per file entry) — metadata-only, zero data I/O.
        Raises on an unpartitioned table (Spark SHOW PARTITIONS
        behavior)."""
        pcols = self.effective_partitioning()
        if not pcols:
            raise ValueError(
                f"SHOW PARTITIONS: {self.root} is not partitioned"
            )
        m = self.manifest()
        seen = {
            tuple(f["pv"][c] for c in pcols) for f in m["files"]
        }
        return [dict(zip(pcols, t)) for t in sorted(seen, key=str)]

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
        fast = self._partition_pred_split(m, predicate)
        if fast is not None:
            # partition-scoped delete: whole matching partitions drop
            # METADATA-ONLY — zero files rewritten, zero data read
            matched, kept = fast
            return self._commit(
                "delete", kept, m["schema"], base_version=m["version"]
            )
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
        matched_clauses: list[dict[str, Any]] | None = None,
        not_matched_by_source_clauses: list[dict[str, Any]] | None = None,
        insert_condition: str | None = None,
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

        MULTI-CLAUSE form (Delta semantics, FIRST-MATCH-WINS in the
        declared order; only the LAST clause of a group may omit its
        condition — anything after an unconditional clause would be
        unreachable):

        * ``matched_clauses=[{"condition": sql|None, "action":
          "update"|"delete", "set": {col: expr}|None}, ...]`` — the
          ordered ``WHEN MATCHED`` clause list, e.g. ``WHEN MATCHED
          AND s.op = 'D' THEN DELETE WHEN MATCHED THEN UPDATE SET
          ...``. Conditions and SET expressions may reference the
          target row as ``t.<col>`` and the source row as ``s.<col>``.
          A matched row taking no clause carries through UNCHANGED.
          Exclusive with ``when_matched_update`` /
          ``when_matched_condition`` / ``delete_col``.
        * ``not_matched_by_source_clauses=[{"condition": sql|None,
          "action": "update"|"delete", "set": {...}|None}, ...]`` —
          the ordered ``WHEN NOT MATCHED BY SOURCE`` list; Delta also
          allows UPDATE here (the SCD retire-or-stamp half).
          Conditions see only the target row (bare names); SET
          expressions reference it as ``t.<col>``. Exclusive with
          ``not_matched_by_source_delete``.
        * ``insert_condition="sql"`` — gates ``insert_unmatched``
          (``WHEN NOT MATCHED AND <cond> THEN INSERT *``), evaluated
          on the SOURCE row (bare names).

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
                matched_clauses,
                not_matched_by_source_clauses,
                insert_condition,
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
        matched_clauses: list[dict[str, Any]] | None = None,
        not_matched_by_source_clauses: list[dict[str, Any]] | None = None,
        insert_condition: str | None = None,
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
        if matched_clauses is not None and (
            when_matched_update is not None
            or when_matched_condition is not None
            or delete_col is not None
        ):
            raise ValueError(
                "matched_clauses is exclusive with when_matched_update/"
                "when_matched_condition/delete_col"
            )
        if (
            not_matched_by_source_clauses is not None
            and not_matched_by_source_delete is not None
        ):
            raise ValueError(
                "not_matched_by_source_clauses is exclusive with "
                "not_matched_by_source_delete"
            )
        # normalize the single-clause kwargs into ordered clause lists;
        # matched_clauses left as None means WHOLE-ROW replacement for
        # matched keys (the original upsert semantics) — an empty list
        # or an explicit clause list means clause semantics (rows taking
        # no clause carry through unchanged)
        if matched_clauses is None and when_matched_update is not None:
            matched_clauses = [
                {
                    "condition": when_matched_condition,
                    "action": "update",
                    "set": when_matched_update,
                }
            ]
        if not_matched_by_source_clauses is None:
            not_matched_by_source_clauses = (
                [{"condition": not_matched_by_source_delete,
                  "action": "delete", "set": None}]
                if not_matched_by_source_delete
                else []
            )
        for label, group in (
            ("matched", matched_clauses or []),
            ("not-matched-by-source", not_matched_by_source_clauses),
        ):
            for i, cl in enumerate(group):
                if cl.get("action") not in ("update", "delete"):
                    raise ValueError(
                        f"{label} clause action must be 'update' or "
                        f"'delete', got {cl.get('action')!r}"
                    )
                if cl["action"] == "update" and not cl.get("set"):
                    raise ValueError(
                        f"{label} UPDATE clause needs SET assignments"
                    )
                if cl["action"] == "update":
                    bad = sorted(set(cl["set"]) & set(keys))
                    if bad:
                        raise ValueError(f"cannot SET merge keys {bad}")
                if cl.get("condition") is None and i < len(group) - 1:
                    raise ValueError(
                        f"only the last {label} clause may omit its "
                        "condition — clauses after an unconditional one "
                        "are unreachable (Delta rule)"
                    )
        m = self.manifest()
        schema = self._schema_of(m)
        old = {f.name: f.dataType for f in schema.fields}
        src = {
            f.name: f for f in source.schema.fields if f.name != delete_col
        }
        conflicts = sorted(
            n for n, f in src.items() if n in old and f.dataType != old[n]
        )
        # lossless type widening evolves through MERGE too (Delta's
        # type-widening-in-mergeSchema): the table schema takes the
        # wider source type, existing files upcast at read exactly as
        # after an explicit widen_column; anything else still refuses
        widen = {
            n
            for n in conflicts
            if src[n].dataType.simpleString()
            in self._WIDENINGS.get(old[n].simpleString(), set())
        }
        hard = [n for n in conflicts if n not in widen]
        if hard:
            raise SchemaMismatchError(
                f"type change on {hard} is not supported "
                "(additive evolution only)"
            )
        if widen:
            if not merge_schema:
                raise SchemaMismatchError(
                    f"merge source widens column type(s) {sorted(widen)}; "
                    "pass merge_schema=True for lossless type widening"
                )
            from pyspark.sql.types import StructField, StructType

            schema = StructType(
                [
                    StructField(f.name, src[f.name].dataType, f.nullable)
                    if f.name in widen
                    else f
                    for f in schema.fields
                ]
            )
            old = {f.name: f.dataType for f in schema.fields}
        whole_row = matched_clauses is None
        if insert_condition is not None and not insert_unmatched:
            raise ValueError("insert_condition requires insert_unmatched")
        extra = [f for n, f in src.items() if n not in old]
        if extra and not whole_row:
            # clause mode: extra source columns are expression INPUTS
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
        # lineage scan so existing deletion vectors are honored both in
        # hit discovery and in the survivor rewrite (a DV'd row must
        # neither mark its file as hit nor resurrect in the rewrite)
        base_schema = self._schema_of(m)
        live = self._apply_dv(
            self._lineage_scan(m["files"], base_schema), m["files"]
        )
        if whole_row:
            # whole-row semantics: matched source rows REPLACE target
            # rows, so identity values must be retained from the target
            # (fresh ids only for genuinely new keys — silent
            # re-identification would break every downstream reference),
            # then omitted generated columns computed (their expressions
            # may reference the identity). The clause path retains
            # ids naturally (updates rebuild target rows) and its
            # inserts get fresh ids in _merge_clause_files.
            source = self._apply_generated(
                self._apply_identity_merge(source, live, keys, m), m
            )
        src_keys = source.select(*keys).distinct()
        # ONE driver action answers every pre-commit probe: source-key
        # uniqueness (the error guard), the source row count (input to
        # the rewrite-join broadcast gate below), plus the hit-file
        # discovery for the matched and by-source clause sides — tagged
        # branches of a two-column union, so a merge launches one probe
        # job instead of up to four. Every branch is tiny by
        # construction: the dup branch is LIMIT 1, the count branch is
        # one row, the hit branches are distinct over file paths
        # (bounded by file count, not rows).
        probes = (
            source.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter("__cnt > 1")
            .limit(1)
            .select(
                F.lit("dup").alias("__tag"),
                F.to_json(F.struct(*keys)).alias("__val"),
            )
        ).unionByName(
            source.agg(F.count(F.lit(1)).alias("__n")).select(
                F.lit("nsrc").alias("__tag"),
                F.col("__n").cast("string").alias("__val"),
            )
        )
        if whole_row or matched_clauses or delete_col:
            # an INSERT-only clause merge touches no matched row —
            # matched files need no rewrite at all
            probes = probes.unionByName(
                live.select("__file", *keys)
                .join(src_keys, keys, "left_semi")
                .select(
                    F.lit("hit").alias("__tag"),
                    F.col("__file").alias("__val"),
                )
                .distinct()
            )
        if not_matched_by_source_clauses:
            # files holding source-less rows ANY by-source clause hits
            # (doomed or re-stamped) must be rewritten too
            nmbs_any = " OR ".join(
                f"({cl['condition'] or 'true'})"
                for cl in not_matched_by_source_clauses
            )
            probes = probes.unionByName(
                live.select("__file", *base_schema.fieldNames())
                .join(src_keys, keys, "left_anti")
                .filter(F.expr(nmbs_any))
                .select(
                    F.lit("hit").alias("__tag"),
                    F.col("__file").alias("__val"),
                )
                .distinct()
            )
        probe_rows = probes.collect()
        dup = [r for r in probe_rows if r["__tag"] == "dup"]
        if dup:
            raise ValueError(
                f"merge source is not unique on {keys}: e.g. "
                f"{dup[0]['__val']}"
            )
        hit_rels: set[str] = {
            r["__val"] for r in probe_rows if r["__tag"] == "hit"
        }
        n_src = sum(
            int(r["__val"]) for r in probe_rows if r["__tag"] == "nsrc"
        )
        keep = [e for e in m["files"] if e["path"] not in hit_rels]
        rewrite = [e for e in m["files"] if e["path"] in hit_rels]
        # Rewrite-join strategy gate (guide §3.1): broadcast the
        # source side when its estimated bytes fit the budget, so the
        # hit-file scan — bounded only by table size — is never
        # shuffled. Above the budget the planner keeps its own choice
        # (sort-merge/AQE), which is the memory-safe default.
        budget = _merge_broadcast_bytes(self.spark)
        bcast_keys = (
            F.broadcast
            if n_src * _est_row_bytes(source.select(*keys).schema) <= budget
            else (lambda d: d)
        )
        bcast_src = (
            F.broadcast
            if n_src * _est_row_bytes(source.schema) <= budget
            else (lambda d: d)
        )
        if (
            whole_row
            and not not_matched_by_source_clauses
            and insert_condition is None
        ):
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
                    .join(bcast_keys(src_keys), keys, "left_anti")
                )
                new_files += self._write_data_files(
                    survivors.unionByName(upserts)
                )
            else:
                new_files += self._write_data_files(upserts)
        else:
            new_files = self._merge_clause_files(
                source, keys, delete_col, schema, rewrite, live,
                matched_clauses, whole_row, insert_unmatched,
                insert_condition, not_matched_by_source_clauses, m,
                bcast_src=bcast_src,
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
        matched_clauses: list[dict[str, Any]] | None,
        whole_row: bool,
        insert_unmatched: bool,
        insert_condition: str | None,
        nmbs_clauses: list[dict[str, Any]],
        m: dict[str, Any],
        bcast_src=None,
    ) -> list[dict[str, Any]]:
        """Rewrite-side row derivation for the clause MERGE path: ONE
        left join of the rewrite files against the source decides every
        target row's fate via two FIRST-MATCH-WINS clause indexes —
        ``__mc`` for the ordered WHEN MATCHED clauses (the delete_col
        flag acts as an implicit leading DELETE clause) and ``__nc``
        for the WHEN NOT MATCHED BY SOURCE clauses (conditions speak
        bare target names, so the index is computed BEFORE the join
        where they are unambiguous). Rows taking no clause carry
        through unchanged; unmatched source rows append NULL-backfilled
        inserts. Cost shape matches the whole-row path: a key join over
        the rewrite files plus one pass over the key-unique source."""
        cols = [f.name for f in schema.fields]
        by_name = {f.name: f for f in schema.fields}
        for cl in (matched_clauses or []) + nmbs_clauses:
            unknown = sorted(set(cl.get("set") or {}) - set(cols))
            if unknown:
                raise ValueError(f"unknown columns in SET: {unknown}")
        reserved = {"__m", "__mc", "__nc"} & (set(cols) | set(source.columns))
        if reserved:
            raise ValueError(
                f"merge reserves the column name(s) {sorted(reserved)}"
            )
        no_adds = not whole_row and not insert_unmatched
        if not rewrite and no_adds:
            return []  # nothing rewritten, nothing inserted
        src_flag = source.withColumn("__m", F.lit(True)).alias("s")
        rows_out = None
        if rewrite:
            tgt = self._scan_entries(rewrite, schema)
            # by-source clause index, first-match-wins: conditions see
            # only the target row (bare names) — evaluate BEFORE the
            # join, where they are unambiguous
            nc = None
            for jx, cl in enumerate(nmbs_clauses, 1):
                cond = (
                    F.expr(cl["condition"]) if cl["condition"] else F.lit(True)
                )
                nc = F.when(cond, jx) if nc is None else nc.when(cond, jx)
            tgt = tgt.withColumn(
                "__nc", nc.otherwise(0) if nc is not None else F.lit(0)
            ).alias("t")
            # broadcast-gated by the caller's probe count (guide §3.1):
            # the hit-file scan stays unshuffled when the source fits
            j = tgt.join(
                bcast_src(src_flag) if bcast_src else src_flag, keys, "left"
            )
            matched = F.col("__m").isNotNull()
            # matched clause list in declared order; the delete_col
            # flag (CDC channel) is an implicit LEADING delete clause
            eff: list[tuple[F.Column, str, dict[str, str] | None]] = []
            if delete_col:
                eff.append(
                    (
                        F.coalesce(F.col(f"s.{delete_col}"), F.lit(False)),
                        "delete",
                        None,
                    )
                )
            for cl in matched_clauses or []:
                eff.append(
                    (
                        F.expr(cl["condition"])
                        if cl.get("condition")
                        else F.lit(True),
                        cl["action"],
                        cl.get("set"),
                    )
                )
            mc = None
            for i, (cond, _a, _s) in enumerate(eff, 1):
                mc = (
                    F.when(matched & cond, i)
                    if mc is None
                    else mc.when(matched & cond, i)
                )
            j = j.withColumn(
                "__mc", mc.otherwise(0) if mc is not None else F.lit(0)
            )
            del_ids = [i for i, (_c, a, _s) in enumerate(eff, 1) if a == "delete"]
            ndel_ids = [
                jx
                for jx, cl in enumerate(nmbs_clauses, 1)
                if cl["action"] == "delete"
            ]
            del_row = (
                F.col("__mc").isin(del_ids) if del_ids else F.lit(False)
            )
            doomed = (~matched) & (
                F.col("__nc").isin(ndel_ids) if ndel_ids else F.lit(False)
            )
            if whole_row:
                # whole-row replacement: matched rows drop here and
                # re-enter from the source side below
                keep_row = ~matched & ~doomed
            else:
                keep_row = ~del_row & ~doomed
            out_cols = []
            for c in cols:
                if c in keys:
                    out_cols.append(F.col(c))
                    continue
                e = F.col(f"t.{c}")
                # clause-index equality makes the overrides disjoint,
                # so wrap order doesn't matter
                for i, (_cond, a, st) in enumerate(eff, 1):
                    if a == "update" and st and c in st:
                        e = F.when(
                            F.col("__mc") == i,
                            F.expr(st[c]).cast(by_name[c].dataType),
                        ).otherwise(e)
                for jx, cl in enumerate(nmbs_clauses, 1):
                    st = cl.get("set")
                    if cl["action"] == "update" and st and c in st:
                        e = F.when(
                            (~matched) & (F.col("__nc") == jx),
                            F.expr(st[c]).cast(by_name[c].dataType),
                        ).otherwise(e)
                out_cols.append(e.alias(c))
            rows_out = j.filter(keep_row).select(*out_cols)
        # source-side additions
        adds = source.filter(~F.col(delete_col)) if delete_col else source
        if not whole_row:
            # matched rows were handled in place: only NEW keys insert
            adds = (
                adds.join(live.select(*keys).distinct(), keys, "left_anti")
                if insert_unmatched
                else adds.limit(0)
            )
            if insert_condition:
                adds = adds.filter(F.expr(insert_condition))
        elif not insert_unmatched:
            adds = adds.join(live.select(*keys).distinct(), keys, "left_semi")
        elif insert_condition:
            # whole-row mode: matched source rows RE-ENTER regardless —
            # the insert condition gates only genuinely NEW keys
            live_keys = live.select(*keys).distinct()
            adds = adds.join(live_keys, keys, "left_semi").unionByName(
                adds.join(live_keys, keys, "left_anti").filter(
                    F.expr(insert_condition)
                )
            )
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
        fast = self._partition_pred_split(m, predicate)
        if fast is not None:
            # partition-scoped replace: matching partitions drop
            # metadata-only; only the replacement rows are written
            _matched, keep = fast
            new_files = []
        else:
            live = self._apply_dv(
                self._lineage_scan(m["files"], schema), m["files"]
            )
            hit_rels = {
                r["__file"]
                for r in live.filter(F.expr(predicate))
                .select("__file")
                .distinct()
                .collect()  # bounded by file count, not rows
            }
            keep = [e for e in m["files"] if e["path"] not in hit_rels]
            rewrite = [e for e in m["files"] if e["path"] in hit_rels]
            new_files = []
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
        target_bytes_per_file: int | None = None,
        where: str | None = None,
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

        ``target_bytes_per_file`` switches the sizing unit to PHYSICAL
        BYTES (Delta's maxFileSize semantics — the honest knob at
        100 TB, where "1M rows" can be 10 MB or 10 GB depending on
        row width): compact-mode selection keeps files already at or
        above the target, and the output file count derives from the
        rewrite set's recorded byte sizes (entries predating the
        per-file ``bytes`` field are estimated from the set's
        observed bytes-per-row, or rewritten outright in compact
        mode — their size is unknown, so they are fair game).

        ``where`` (Delta's ``OPTIMIZE ... WHERE``) restricts the
        candidate set to whole partitions selected by a
        partition-columns-only predicate — the steady-state shape for
        partitioned ingest ("optimize yesterday's partition"), cost ∝
        the named partitions. Refuses on an unpartitioned table or a
        predicate touching non-partition columns.

        Either mode is one atomic commit, so concurrent readers never
        see a half-compacted table; retries on a lost CAS race."""
        if cluster_by and zorder_by:
            raise ValueError("pass cluster_by or zorder_by, not both")
        if mode not in ("full", "compact"):
            raise ValueError(f"mode must be 'full' or 'compact', got {mode!r}")
        if target_bytes_per_file is not None and target_bytes_per_file < 1:
            raise ValueError("target_bytes_per_file must be >= 1")
        return self.commit_with_retry(
            lambda t: t._optimize_once(
                target_rows_per_file, cluster_by, zorder_by, mode,
                target_bytes_per_file, where,
            ),
            attempts,
        )

    def _optimize_once(
        self,
        target_rows_per_file: int,
        cluster_by: list[str] | None,
        zorder_by: list[str] | None,
        mode: str,
        target_bytes_per_file: int | None = None,
        where: str | None = None,
    ) -> CommitInfo:
        m = self.manifest()
        schema = self._schema_of(m)
        if not m["files"]:
            raise VersionNotFoundError(f"version {m['version']} is empty")
        # OPTIMIZE ... WHERE (Delta semantics): restrict the candidate
        # set to whole partitions selected by a partition-columns-only
        # predicate — maintenance cost scales with the named partitions
        # (e.g. yesterday's ingest), never the table
        scope, out_of_scope = list(m["files"]), []
        if where is not None:
            split = self._partition_pred_split(m, where)
            if split is None:
                raise ValueError(
                    "OPTIMIZE ... WHERE requires a partitioned table "
                    "and a predicate over partition columns only "
                    "(Delta semantics)"
                )
            scope, out_of_scope = split
            if not scope:
                return self._commit(
                    "optimize", list(m["files"]), m["schema"],
                    base_version=m["version"],
                )
        if mode == "compact":
            if target_bytes_per_file is not None:
                rewrite = [
                    e
                    for e in scope
                    if e.get("dv")
                    or e.get("bytes") is None  # size unknown: fair game
                    or e["bytes"] < target_bytes_per_file
                ]
            else:
                rewrite = [
                    e
                    for e in scope
                    if e.get("dv")
                    or self._entry_live_rows(e) < target_rows_per_file
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
            rewrite, keep = list(scope), list(out_of_scope)
            current = self._scan_entries(rewrite, schema)
        if target_bytes_per_file is not None:
            known = [e for e in rewrite if e.get("bytes")]
            if known:
                per_row = sum(e["bytes"] for e in known) / max(
                    1, sum(e["rows"] for e in known)
                )
            else:
                per_row = 128.0  # pre-bytes table: conservative guess
            total_bytes = sum(
                e.get("bytes") or int(self._entry_live_rows(e) * per_row)
                for e in rewrite
            )
            n_out = max(1, -(-total_bytes // target_bytes_per_file))
        else:
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

    def refresh_file_sizes(self, attempts: int = 10) -> CommitInfo:
        """Backfill per-file ``bytes`` on entries committed before byte
        recording existed — one METADATA-ONLY commit that ``os.stat``s
        each recorded path missing the field (manifest-sized, zero data
        I/O; files are immutable, so entries that already carry bytes
        keep their recorded value). Afterwards ``DESCRIBE DETAIL``'s
        ``sizeInBytes`` is exact and byte-targeted OPTIMIZE bins by
        real sizes instead of the bytes-per-row estimate. Same
        (path, vector) refs as the parent, so change feeds skip it as
        a zero-row-delta commit. Idempotent: already-complete tables
        commit a no-op (the optimize() precedent — the call stays
        atomic under CAS retries either way)."""
        return self.commit_with_retry(
            lambda t: t._refresh_file_sizes_once(), attempts
        )

    def _refresh_file_sizes_once(self) -> CommitInfo:
        import os

        m = self.manifest()
        entries = []
        for e in m["files"]:
            if e.get("bytes") is None:
                path = self._abs(e)
                if not os.path.exists(path):
                    raise ValueError(
                        f"cannot refresh file sizes: {path} is gone "
                        "(a shallow clone whose source was vacuumed?)"
                    )
                e = dict(e)
                e["bytes"] = int(os.stat(path).st_size)
            entries.append(e)
        return self._commit(
            "refresh_stats", entries, m["schema"], base_version=m["version"]
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
        from finalpipeline_spark.sources.versioned import VersionedTable

        m = self.manifest(version)
        dest = VersionedTable(
            self.spark,
            dest_root,
            bloom_col=self.bloom_col,
            bloom_bits=self.bloom_bits,
            bloom_k=self.bloom_k,
            # partitioning clones with the table (Delta parity): deep
            # clones REWRITE under the same layout, shallow clones
            # carry the pv-stamped entries and keep future writes
            # consistent with them
            partition_by=m.get("partition_by"),
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

