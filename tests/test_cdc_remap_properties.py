"""Property-based (hypothesis) model test of CDC across column remaps.

The r10 serving contract: a row-level change feed whose range crosses
any mix of appends, CoW/MoR deletes, adds, drops, renames, and re-adds
(each logical name remapped at most once per range) emits in the
TARGET version's logical frame, and replay-onto-base equality holds —
base snapshot projected into the target frame, plus inserts, minus
deletes, equals the target snapshot as multisets.

Random op sequences explore interleavings no hand-written case covers
(e.g. re-add after a MoR delete of pre-drop rows, rename between two
CoW deletes). Ground truth comes through an INDEPENDENT engine path:
snapshot scans of base/target vs the feed's per-step reconstruction.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from finalpipeline_spark.sources.versioned import VersionedTable

# op vocabulary; parameters are drawn as small ints and resolved
# against the live schema at apply time (so every sequence is valid)
_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            ["append", "cow_delete", "mor_delete", "add", "drop",
             "rename", "readd", "constraint_noise"]
        ),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=3,
    max_size=7,
)

_POOL = ["c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7"]


def _apply_ops(spark, t: VersionedTable, ops):
    """Apply the drawn sequence, tracking (rename chain, dead names)
    so the test can project the BASE snapshot into the target frame.
    Returns (base_to_target: dict logical-base-name -> target name or
    None-if-dead, added_after_base: [names], n_remaps)."""
    live = ["id", "v", "c0"]          # base schema
    remapped: set[str] = set()         # names already used by a remap op
    ghosts: list[str] = []             # dropped names eligible for re-add
    pool = [c for c in _POOL if c not in live]
    # base-frame bookkeeping
    base_map = {c: c for c in live}    # base logical name -> current name
    dead_base: set[str] = set()
    added: list[str] = []
    next_id = 1000
    n_remaps = 0

    for kind, arg in ops:
        data_cols = [c for c in live if c not in ("id",)]
        if kind == "append":
            lo = next_id
            next_id += 50
            df = spark.range(lo, lo + 50).selectExpr(
                "id",
                *[f"id * {i + 2} as {c}" for i, c in enumerate(data_cols)],
            )
            t.commit_append(df)
        elif kind in ("cow_delete", "mor_delete"):
            pred = f"id % 7 = {arg % 7}"
            t.delete_where(
                pred, mode="cow" if kind == "cow_delete" else "mor"
            )
        elif kind == "add":
            if not pool:
                continue
            c = pool.pop(0)
            t.add_column(c, "bigint")
            live.append(c)
            added.append(c)
        elif kind == "drop":
            droppable = [c for c in live if c not in ("id", "v")]
            if not droppable:
                continue
            c = droppable[arg % len(droppable)]
            t.drop_column(c)
            live.remove(c)
            ghosts.append(c)
            if c in base_map.values():
                for b, cur in list(base_map.items()):
                    if cur == c:
                        dead_base.add(b)
                        base_map[b] = None
            if c in added:
                added.remove(c)
        elif kind == "rename":
            renameable = [
                c for c in live if c != "id" and c not in remapped
            ]
            if not renameable or not pool:
                continue
            old = renameable[arg % len(renameable)]
            new = pool.pop(0)
            t.rename_column(old, new)
            n_remaps += 1
            remapped.update((old, new))
            live[live.index(old)] = new
            for b, cur in base_map.items():
                if cur == old:
                    base_map[b] = new
            if old in added:
                added[added.index(old)] = new
        elif kind == "readd":
            candidates = [
                c for c in ghosts if c not in remapped and c not in live
            ]
            if not candidates:
                continue
            c = candidates[arg % len(candidates)]
            info = t.add_column(c, "bigint")
            assert info.action == "readd_column"
            n_remaps += 1
            remapped.add(c)
            ghosts.remove(c)
            live.append(c)
            added.append(c)  # new-era column: NULL in the base frame
        else:  # constraint_noise: metadata-only commits must be skipped
            name = f"noise_{t.latest_version()}"
            t.add_constraint(name, "id IS NOT NULL")
            t.drop_constraint(name)
    return base_map, added, n_remaps


@given(ops=_OPS)
@settings(max_examples=12, deadline=None)
def test_cdc_replay_equality_under_random_remap_sequences(
    spark_session, tmp_path_factory, ops
):
    spark = spark_session
    root = str(tmp_path_factory.mktemp("cdcprop") / "vt")
    t = VersionedTable(spark, root)
    t.commit_overwrite(
        spark.range(0, 60).selectExpr(
            "id", "id * 10 as v", "id + 1 as c0"
        )
    )
    base_map, added, n_remaps = _apply_ops(spark, t, ops)
    tv = t.latest_version()
    if tv == 0:
        return  # every op degenerated to a no-op draw

    ch = t.read_changes_rows(0, version=tv)
    target = t.read(tv)
    value_cols = [c for c in target.columns]
    assert set(ch.columns) == set(value_cols) | {
        "_change_type", "_commit_version", "_commit_timestamp"
    }

    # base snapshot projected into the target frame: renames follow
    # the chain, dropped base columns disappear, added/re-added
    # columns are NULL (new-era)
    base = t.read(0)
    proj = []
    for b, cur in base_map.items():
        if cur is not None and cur in value_cols:
            proj.append(F.col(b).alias(cur))
    base_frame = base.select(*proj)
    for c in value_cols:
        if c not in [f for f in base_frame.columns]:
            base_frame = base_frame.withColumn(
                c, F.lit(None).cast(dict(target.dtypes)[c])
            )
    base_frame = base_frame.select(*value_cols)

    ins = ch.filter("_change_type = 'insert'").select(*value_cols)
    dels = ch.filter("_change_type = 'delete'").select(*value_cols)
    replayed = sorted(
        map(tuple, base_frame.unionByName(ins).exceptAll(dels).collect()),
        key=repr,
    )
    expect = sorted(map(tuple, target.collect()), key=repr)
    assert replayed == expect, (
        f"replay mismatch after ops={ops} (remaps={n_remaps}): "
        f"{len(replayed)} vs {len(expect)} rows"
    )


@pytest.fixture(scope="session")
def spark_session(spark):
    return spark


@pytest.fixture(scope="session")
def tmp_path_factory_pass(tmp_path_factory):
    return tmp_path_factory
