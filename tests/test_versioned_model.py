"""Model-based differential test of the versioned table (hypothesis).

A random sequence of table operations — append, copy-on-write and
merge-on-read delete, copy-on-write and merge-on-read update, ADD /
DROP / RENAME COLUMN, compaction, rollback — runs against BOTH the
real table and a trivial in-memory dict model. After every operation
the snapshot must equal the model, the metadata-only row count must
agree, and at the end every historical version must equal the model's
remembered state at that point (time travel). The oracle is ~40 lines
of obviously-correct Python, so any divergence is a table bug: this
is the generator that explores operation INTERLEAVINGS the
hand-written tests don't enumerate (e.g. update-after-rename-after-
MoR-delete on the same rows).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from finalpipeline_spark.sources.versioned import VersionedTable

# op space: (kind, arg) — arguments are small ints the interpreter
# maps onto predicates/values so every op is applicable in any state
_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            [
                "append",
                "delete_cow",
                "delete_mor",
                "update_cow",
                "update_mor",
                "add_col",
                "drop_col",
                "rename_col",
                "optimize",
                "rollback",
                "merge_upsert",
                "merge_update",
                "widen_col",
            ]
        ),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=4,
    max_size=10,
)


class _Model:
    """Dict-of-rows reference: id -> {col: value}; plus schema order."""

    def __init__(self) -> None:
        self.rows: dict[int, dict] = {}
        self.cols: list[str] = ["id", "v"]
        self.types: dict[str, str] = {"id": "bigint", "v": "bigint"}
        self.next_id = 0
        self.n_cols_added = 0
        self.history: list[tuple[list[str], dict[int, dict]]] = []

    def snap(self) -> None:
        self.history.append(
            (
                list(self.cols),
                {k: dict(r) for k, r in self.rows.items()},
                dict(self.types),
            )
        )


def _apply(table: VersionedTable, model: _Model, spark, op: str, arg: int):
    if not model.rows and op in (
        "delete_cow", "delete_mor", "update_cow", "update_mor", "optimize",
        "merge_upsert", "merge_update",
    ):
        return False  # content ops on an empty snapshot raise by contract
    if op == "append":
        lo = model.next_id
        model.next_id += 5
        exprs = ["id"] + [
            f"cast(id * {i + 2} as {model.types[c]}) as {c}"
            for i, c in enumerate(model.cols[1:])
        ]
        table.commit_append(spark.range(lo, lo + 5).selectExpr(*exprs))
        for i in range(lo, lo + 5):
            model.rows[i] = {
                c: i * (j + 2) for j, c in enumerate(model.cols[1:])
            }
    elif op in ("delete_cow", "delete_mor"):
        pred = f"id % 7 = {arg % 7}"
        table.delete_where(pred, mode=op[-3:])
        model.rows = {k: r for k, r in model.rows.items() if k % 7 != arg % 7}
    elif op in ("update_cow", "update_mor"):
        col = model.cols[1 + arg % (len(model.cols) - 1)]
        pred = f"id % 5 = {arg % 5}"
        table.update_where(pred, {col: f"{col} + 1000"}, mode=op[-3:])
        for k, r in model.rows.items():
            if k % 5 == arg % 5:
                # NULL + 1000 stays NULL (added-column backfill)
                r[col] = None if r[col] is None else r[col] + 1000
    elif op == "add_col":
        name = f"c{model.n_cols_added}"
        model.n_cols_added += 1
        table.add_column(name, "bigint")
        model.cols.append(name)
        model.types[name] = "bigint"
        for r in model.rows.values():
            r[name] = None
    elif op == "drop_col":
        if len(model.cols) <= 2:
            return False  # keep id + one value column
        col = model.cols[1 + arg % (len(model.cols) - 1)]
        table.drop_column(col)
        model.cols.remove(col)
        del model.types[col]
        for r in model.rows.values():
            r.pop(col, None)
    elif op == "rename_col":
        old = model.cols[1 + arg % (len(model.cols) - 1)]
        new = f"r{model.n_cols_added}"
        model.n_cols_added += 1
        table.rename_column(old, new)
        model.cols[model.cols.index(old)] = new
        model.types[new] = model.types.pop(old)
        for r in model.rows.values():
            r[new] = r.pop(old)
    elif op == "widen_col":
        narrow = [c for c in model.cols[1:] if model.types[c] == "int"]
        if not narrow:
            # add a fresh int column to widen later; a previously
            # dropped/renamed name trips the ghost guard — skip then
            name = f"w{model.n_cols_added}"
            model.n_cols_added += 1
            table.add_column(name, "int")
            model.cols.append(name)
            model.types[name] = "int"
            for r in model.rows.values():
                r[name] = None
        else:
            col = narrow[arg % len(narrow)]
            table.widen_column(col, "bigint")
            model.types[col] = "bigint"
        # values unchanged either way (int→bigint upcast is value-exact)
    elif op == "merge_upsert":
        # whole-row upsert: touch ids [arg, arg+3) — a mix of existing
        # and new keys — with every current column populated
        lo = arg
        exprs = ["id"] + [
            f"cast(id * 100 + {i} as {model.types[c]}) as {c}"
            for i, c in enumerate(model.cols[1:])
        ]
        src = spark.range(lo, lo + 3).selectExpr(*exprs)
        table.merge(src, ["id"])
        for i in range(lo, lo + 3):
            model.rows[i] = {
                c: i * 100 + j for j, c in enumerate(model.cols[1:])
            }
        model.next_id = max(model.next_id, lo + 3)
    elif op == "merge_update":
        # conditional SET over a partial source; unmatched keys insert
        # NULL-backfilled; the condition gates on the target value
        col = model.cols[1 + arg % (len(model.cols) - 1)]
        lo = arg * 2
        src = spark.range(lo, lo + 3).selectExpr("id", "id + 7 as delta")
        table.merge(
            src,
            ["id"],
            when_matched_update={col: f"t.{col} + s.delta"},
            when_matched_condition=f"t.{col} IS NOT NULL",
        )
        for i in range(lo, lo + 3):
            if i in model.rows:
                if model.rows[i][col] is not None:
                    model.rows[i][col] += i + 7
            else:
                model.rows[i] = {c: None for c in model.cols[1:]}
        model.next_id = max(model.next_id, lo + 3)
    elif op == "optimize":
        mode = "compact" if arg % 2 else "full"
        table.optimize(target_rows_per_file=7, mode=mode)
    elif op == "rollback":
        if not model.history:
            return False
        idx = arg % len(model.history)
        table.rollback(idx)
        cols, rows, types = model.history[idx]
        model.cols = list(cols)
        model.rows = {k: dict(r) for k, r in rows.items()}
        model.types = dict(types)
    return True


def _read_model_style(table: VersionedTable, version=None):
    df = table.read(version)
    cols = df.columns
    return cols, {
        r["id"]: {c: r[c] for c in cols if c != "id"} for r in df.collect()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=list(HealthCheck),
    derandomize=True,  # reproducible across runs; breadth via max_examples
)
@given(ops=_OPS)
def test_random_op_sequences_match_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("vtm") / "vt")
    table = VersionedTable(spark, root)
    model = _Model()
    table.commit_overwrite(spark.range(0, 5).selectExpr("id", "id * 2 as v"))
    model.rows = {i: {"v": i * 2} for i in range(5)}
    model.next_id = 5
    model.snap()

    for op, arg in ops:
        if not _apply(table, model, spark, op, arg):
            continue
        model.snap()
        assert table.count_rows() == len(model.rows), f"after {op}({arg})"
        if not model.rows:
            continue  # reading an empty snapshot raises by contract
        cols, rows = _read_model_style(table)
        assert cols == model.cols, f"after {op}({arg})"
        assert rows == model.rows, f"after {op}({arg})"

    # time travel: every live historical version equals the model's
    # remembered state at that point
    for v, (cols, rows, _types) in enumerate(model.history):
        if not rows:
            continue  # empty versions raise on read by contract
        got_cols, got_rows = _read_model_style(table, version=v)
        assert got_cols == cols, f"version {v}"
        assert got_rows == rows, f"version {v}"
