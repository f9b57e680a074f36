"""Property-based tests (hypothesis) for the versioned_sql DML parser.

A DML misparse is silent corruption, so the parser's invariants get
adversarial inputs: string literals CONTAINING the grammar's own
keywords (WHEN/WHERE/AND/THEN), quotes-in-quotes, commas inside
function calls, random identifiers. All pure-Python (no Spark) — the
integration semantics are covered by tests/test_sql_write.py.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finalpipeline_spark.sources.sql_dml import (
    _mask_literals,
    _parse_merge,
    _split_top,
)

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
# literal contents designed to collide with the grammar: keywords,
# quotes (doubled-escape form), commas, parens
_nasty = st.lists(
    st.sampled_from(
        list("abc,()=<>.* ")
        + ["WHEN ", " WHERE ", " AND ", " THEN ", "MATCHED", "''"]
    ),
    min_size=0,
    max_size=12,
).map(lambda parts: "".join(parts))


@given(s=_nasty)
@settings(max_examples=200, deadline=None)
def test_mask_preserves_length_and_quotes(s):
    sql = f"SELECT '{s}' AS x FROM t"
    masked = _mask_literals(sql)
    assert len(masked) == len(sql)
    # the DELIMITER quotes survive at their original offsets (escaped
    # quotes inside the literal are content and are masked away)
    assert masked[sql.index("'")] == "'"
    # no keyword from inside the literal leaks into the masked region
    inner = masked[sql.index("'") + 1 : sql.rindex("'")]
    assert "WHEN" not in inner and "WHERE" not in inner and "," not in inner


@given(items=st.lists(_nasty, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_top_rejoins_to_original(items):
    # build a comma-joined expression list where each item hides its
    # nasty content inside a string literal (so depth/commas inside are
    # masked) and check the split returns exactly the items
    parts = [f"f('{x}')" for x in items]
    s = ", ".join(parts)
    got = _split_top(s, _mask_literals(s))
    assert got == parts


@given(keys=st.lists(_ident, min_size=1, max_size=4, unique=True), cond=_nasty)
@settings(max_examples=200, deadline=None)
def test_merge_parser_extracts_keys_and_conditions(keys, cond):
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    stmt = (
        f"MERGE INTO tgt AS t USING src AS s ON {on} "
        f"WHEN MATCHED AND s.flag = '{cond}' THEN DELETE "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    pk = _parse_merge(stmt, _mask_literals(stmt))
    assert pk["keys"] == keys
    assert pk["insert_unmatched"] is True
    assert pk["matched_delete"] == f"s.flag = '{cond}'"
    assert pk["when_matched_update"] is None


@given(
    cols=st.lists(_ident, min_size=1, max_size=4, unique=True),
    vals=st.lists(_nasty, min_size=1, max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_merge_update_set_assignments_survive_nasty_exprs(cols, vals):
    vals = (vals * len(cols))[: len(cols)]
    sets = ", ".join(
        f"{c} = concat(s.{c}, '{v}')" for c, v in zip(cols, vals)
    )
    stmt = (
        f"MERGE INTO tgt AS t USING src AS s ON t.k = s.k "
        f"WHEN MATCHED THEN UPDATE SET {sets}"
    )
    pk = _parse_merge(stmt, _mask_literals(stmt))
    assert list(pk["when_matched_update"]) == cols
    for c, v in zip(cols, vals):
        assert pk["when_matched_update"][c] == f"concat(s.{c}, '{v}')"


@given(side=st.sampled_from(["t.a = s.b", "t.a > s.a", "s.a = s.a", "x.a = s.a"]))
@settings(max_examples=20, deadline=None)
def test_merge_rejects_non_equi_or_mispaired_on(side):
    stmt = (
        f"MERGE INTO tgt AS t USING src AS s ON {side} "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(ValueError, match="MERGE ON|MERGE keys"):
        _parse_merge(stmt, _mask_literals(stmt))


def test_merge_multi_clause_parses_in_declared_order():
    """Delta multi-clause MERGE: repeated WHEN MATCHED clauses parse
    into an ordered list (first-match-wins at execution), and the
    legacy single-clause fields stay None for multi-clause text."""
    stmt = (
        "MERGE INTO tgt AS t USING src AS s ON t.k = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET a = s.a "
        "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND a < 0 THEN UPDATE SET a = 0 "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    pk = _parse_merge(stmt, _mask_literals(stmt))
    assert [c["action"] for c in pk["matched_clauses"]] == ["delete", "update"]
    assert pk["matched_clauses"][0]["condition"] == "s.op = 'D'"
    assert pk["matched_clauses"][1]["condition"] is None
    assert pk["matched_clauses"][1]["set"] == {"a": "s.a"}
    assert pk["insert_unmatched"] is True
    assert pk["insert_condition"] == "s.op <> 'D'"
    assert [c["action"] for c in pk["not_matched_by_source_clauses"]] == [
        "update", "delete",
    ]
    assert pk["not_matched_by_source_clauses"][0]["set"] == {"a": "0"}
    # multi-clause text leaves the legacy single-clause fields unset
    assert pk["when_matched_update"] is None
    assert pk["matched_delete"] is None
    assert pk["not_matched_by_source_delete"] is None


def test_merge_rejects_unreachable_clause_after_unconditional():
    """Only the LAST clause of a group may omit its condition — a
    clause after an unconditional one is unreachable (Delta rule)."""
    stmt = (
        "MERGE INTO tgt AS t USING src AS s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE "
        "WHEN MATCHED AND s.x = 1 THEN UPDATE SET a = s.a"
    )
    with pytest.raises(ValueError, match="unreachable"):
        _parse_merge(stmt, _mask_literals(stmt))
    stmt2 = (
        "MERGE INTO tgt AS t USING src AS s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE AND a < 0 THEN UPDATE SET a = 0"
    )
    with pytest.raises(ValueError, match="unreachable"):
        _parse_merge(stmt2, _mask_literals(stmt2))
    # two INSERT clauses are refused (INSERT * carries no alternative)
    stmt3 = (
        "MERGE INTO tgt AS t USING src AS s ON t.k = s.k "
        "WHEN NOT MATCHED AND s.x = 1 THEN INSERT * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(ValueError, match="at most one"):
        _parse_merge(stmt3, _mask_literals(stmt3))


@given(s=_nasty)
@settings(max_examples=100, deadline=None)
def test_statement_router_never_misroutes_on_literal_keywords(s):
    """A SELECT whose literal contains 'INSERT'/'MERGE' etc. must stay
    a passthrough: the router keys on the masked FIRST token only."""
    from finalpipeline_spark.sources import sql_dml

    sql = f"SELECT 'INSERT INTO x {s} MERGE' AS v"
    masked = _mask_literals(sql)
    assert re.match(
        r"(INSERT|UPDATE|DELETE|MERGE|OPTIMIZE|VACUUM|DESCRIBE)\b",
        masked,
        re.I,
    ) is None
    assert sql_dml is not None  # module import sanity


# -- ALTER TABLE parser --------------------------------------------------
from finalpipeline_spark.sources.sql_dml import _parse_alter  # noqa: E402

_type = st.sampled_from(
    ["int", "bigint", "string", "decimal(10,2)", "array<int>", "map<string,int>"]
)


@given(name=_ident, ddl=_type)
@settings(max_examples=100, deadline=None)
def test_alter_add_column_roundtrip(name, ddl):
    stmt = f"ALTER TABLE versioned.`/t` ADD COLUMN {name} {ddl}"
    target, op, calls = _parse_alter(stmt, _mask_literals(stmt))
    assert target == "versioned.`/t`"
    assert op == "add_column" and calls == [(name, ddl)]


@given(cols=st.lists(st.tuples(_ident, _type), min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_alter_add_columns_list_splits_on_top_level_commas(cols):
    # decimal(10,2) hides a comma inside parens — _split_top must not
    # split there
    body = ", ".join(f"{n} {t}" for n, t in cols)
    stmt = f"ALTER TABLE tgt ADD COLUMNS ({body})"
    _, op, calls = _parse_alter(stmt, _mask_literals(stmt))
    assert op == "add_column" and calls == list(cols)


@given(old=_ident, new=_ident)
@settings(max_examples=60, deadline=None)
def test_alter_rename_column(old, new):
    stmt = f"ALTER TABLE tgt RENAME COLUMN `{old}` TO {new}"
    _, op, calls = _parse_alter(stmt, _mask_literals(stmt))
    assert op == "rename_column" and calls == [(old, new)]


@given(name=_ident, pred=_nasty)
@settings(max_examples=100, deadline=None)
def test_alter_add_constraint_predicate_survives_nasty_literals(name, pred):
    stmt = (
        f"ALTER TABLE tgt ADD CONSTRAINT {name} "
        f"CHECK (col > 0 AND note <> '{pred}')"
    )
    _, op, calls = _parse_alter(stmt, _mask_literals(stmt))
    assert op == "add_constraint"
    assert calls == [(name, f"col > 0 AND note <> '{pred}'")]


def test_alter_fixed_shapes():
    cases = [
        ("ALTER TABLE t DROP COLUMN x", "drop_column", [("x",)]),
        ("ALTER TABLE t DROP COLUMNS (x, y)", "drop_column", [("x",), ("y",)]),
        ("alter table t alter column x type bigint", "widen_column", [("x", "bigint")]),
        ("ALTER TABLE t ALTER COLUMN x SET NOT NULL", "add_not_null", [("x",)]),
        ("ALTER TABLE t DROP CONSTRAINT c1", "drop_constraint", [("c1",)]),
        (
            "ALTER TABLE t ADD COLUMN g bigint GENERATED ALWAYS AS (a + b)",
            "add_generated_column",
            [("g", "bigint", "a + b")],
        ),
        (
            "ALTER TABLE t ADD COLUMN i bigint GENERATED ALWAYS AS IDENTITY",
            "add_identity_column",
            [("i", 1, 1)],
        ),
        (
            "ALTER TABLE t ADD COLUMN i bigint GENERATED ALWAYS AS IDENTITY "
            "(START WITH -5 INCREMENT BY 2)",
            "add_identity_column",
            [("i", -5, 2)],
        ),
    ]
    for stmt, op, calls in cases:
        _, got_op, got_calls = _parse_alter(stmt, _mask_literals(stmt))
        assert (got_op, got_calls) == (op, calls), stmt


def test_alter_rejects_bad_shapes():
    for stmt in [
        "ALTER TABLE t SET TBLPROPERTIES ('a'='b')",
        "ALTER TABLE t ADD COLUMN",
        "ALTER TABLE t RENAME COLUMN a b",
        "ALTER TABLE t ADD COLUMN i int GENERATED ALWAYS AS IDENTITY",
    ]:
        with pytest.raises(ValueError):
            _parse_alter(stmt, _mask_literals(stmt))


from finalpipeline_spark.sources.sql_dml import (  # noqa: E402
    _parse_bloom_props,
    _parse_create_cols,
)


@given(cols=st.lists(st.tuples(_ident, _type), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_create_cols_plain_list_roundtrip(cols):
    # decimal(10,2) hides a comma inside parens, map<string,int> inside
    # angle brackets — neither may split an entry
    body = ", ".join(f"{n} {t}" for n, t in cols)
    specs = _parse_create_cols(body, _mask_literals(body))
    assert specs == [("plain", n, t, False) for n, t in cols]


@given(name=_ident, pred=_nasty)
@settings(max_examples=100, deadline=None)
def test_create_cols_check_predicate_survives_nasty_literals(name, pred):
    # a bare '<' INSIDE the CHECK parens must not corrupt the
    # angle-depth tracking for entries that follow it
    body = (
        f"id bigint, CONSTRAINT {name} CHECK (a < 10 AND note <> '{pred}'), "
        "m map<string,int> NOT NULL"
    )
    specs = _parse_create_cols(body, _mask_literals(body))
    assert specs == [
        ("plain", "id", "bigint", False),
        ("constraint", name, f"a < 10 AND note <> '{pred}'"),
        ("plain", "m", "map<string,int>", True),
    ]


def test_create_cols_fixed_shapes():
    body = (
        "id bigint, name string NOT NULL, "
        "cents bigint GENERATED ALWAYS AS (cast(price * 100 as bigint)), "
        "rid bigint GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY -2), "
        "k bigint GENERATED ALWAYS AS IDENTITY, "
        "CONSTRAINT pos CHECK (id >= 0)"
    )
    assert _parse_create_cols(body, _mask_literals(body)) == [
        ("plain", "id", "bigint", False),
        ("plain", "name", "string", True),
        ("generated", "cents", "bigint", "cast(price * 100 as bigint)"),
        ("identity", "rid", 10, -2),
        ("identity", "k", 1, 1),
        ("constraint", "pos", "id >= 0"),
    ]


def test_create_cols_rejects_bad_entries():
    for body in [
        "id",                                     # no type
        "i int GENERATED ALWAYS AS IDENTITY",     # identity must be bigint
        "",                                       # empty entry
    ]:
        with pytest.raises(ValueError):
            _parse_create_cols(body, _mask_literals(body))


def test_parse_bloom_props():
    inner = "'bloom.column' = 'id', 'bloom.bits' = '4096'"
    assert _parse_bloom_props(inner, _mask_literals(inner)) == ("id", 4096, 3)
    for bad in ["'other' = 'x'", "'bloom.bits' = '64'"]:
        with pytest.raises(ValueError):
            _parse_bloom_props(bad, _mask_literals(bad))


# -- COPY INTO parse -------------------------------------------------

_copy_nasty_path = st.lists(
    st.sampled_from(
        list("abc/ .-_09")
        + ["''", " FROM ", "FILEFORMAT", "COPY_OPTIONS", "PATTERN",
           "(", ")", ","]
    ),
    min_size=1,
    max_size=10,
).map(lambda parts: "".join(parts))


@given(path=_copy_nasty_path, pat=_copy_nasty_path)
@settings(max_examples=200, deadline=None)
def test_copy_parse_roundtrips_path_and_pattern(path, pat):
    """Grammar keywords, parens, and doubled quotes INSIDE the path or
    pattern literal must never derail the parse: the unescaped text
    comes back verbatim and options parse independently."""
    from finalpipeline_spark.sources.sql_dml import _parse_copy

    stmt = (
        f"COPY INTO versioned.`/t` FROM '{path}' FILEFORMAT = CSV "
        f"PATTERN = '{pat}' FORMAT_OPTIONS ('sep' = ';') "
        "COPY_OPTIONS ('force' = 'true')"
    )
    pk = _parse_copy(stmt, _mask_literals(stmt))
    assert pk["source"] == path.replace("''", "'")
    assert pk["pattern"] == pat.replace("''", "'")
    assert pk["file_format"] == "CSV"
    assert pk["format_options"] == {"sep": ";"}
    assert pk["force"] is True and pk["merge_schema"] is False


@given(
    keys=st.lists(
        st.sampled_from(["force", "FORCE", "mergeSchema", "MERGESCHEMA"]),
        min_size=0,
        max_size=2,
        unique_by=lambda k: k.lower(),
    ),
    val=st.sampled_from(["true", "false", "TRUE", " True "]),
)
@settings(max_examples=100, deadline=None)
def test_copy_options_case_and_whitespace_insensitive(keys, val):
    from finalpipeline_spark.sources.sql_dml import _parse_copy

    opts = ", ".join(f"'{k}' = '{val}'" for k in keys)
    stmt = f"COPY INTO versioned.`/t` FROM '/src'" + (
        f" COPY_OPTIONS ({opts})" if keys else ""
    )
    pk = _parse_copy(stmt, _mask_literals(stmt))
    expect = val.strip().lower() == "true"
    assert pk["force"] == (expect and any(k.lower() == "force" for k in keys))
    assert pk["merge_schema"] == (
        expect and any(k.lower() == "mergeschema" for k in keys)
    )


def test_copy_parse_defaults_and_refusals():
    from finalpipeline_spark.sources.sql_dml import _parse_copy

    stmt = "COPY INTO versioned.`/t` FROM '/landing/zone'"
    pk = _parse_copy(stmt, _mask_literals(stmt))
    assert pk["file_format"] == "parquet" and pk["pattern"] is None
    assert pk["format_options"] is None
    for bad in (
        "COPY INTO versioned.`/t`",  # no FROM
        "COPY INTO versioned.`/t` FROM /unquoted",
        "COPY INTO versioned.`/t` FROM '/p' COPY_OPTIONS ('nope' = '1')",
        "COPY INTO versioned.`/t` FROM '/p' FORMAT_OPTIONS (header)",
    ):
        with pytest.raises(ValueError):
            _parse_copy(bad, _mask_literals(bad))
