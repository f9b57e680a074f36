"""GENERATED ALWAYS AS columns on the versioned table (Delta parity):
declared before data, computed when omitted, verified when provided,
recomputed through UPDATE rewrites, protected from direct SET and from
source-column drops, carried by every commit including overwrite.
"""

from __future__ import annotations

import pytest

from finalpipeline_spark.sources.versioned import (
    ConstraintViolationError,
    VersionedTable,
)


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.commit_overwrite(
        spark.range(0).selectExpr("id", "cast(id as double) as price")
    )  # stage the schema empty, then declare the rule (Delta: at creation)
    t.add_generated_column("price_cents", "bigint", "cast(round(price * 100) as bigint)")
    return t


def test_omitted_column_is_computed(spark, vt):
    vt.commit_append(
        spark.range(0, 10).selectExpr("id", "cast(id as double) + 0.5 as price")
    )
    rows = {r["id"]: r for r in vt.read().collect()}
    assert rows[3]["price_cents"] == 350
    assert vt.generated() == {
        "price_cents": "cast(round(price * 100) as bigint)"
    }


def test_provided_values_verified(spark, vt):
    ok = spark.range(0, 5).selectExpr(
        "id", "cast(id as double) as price",
        "cast(id * 100 as bigint) as price_cents",
    )
    vt.commit_append(ok)
    bad = spark.range(5, 8).selectExpr(
        "id", "cast(id as double) as price",
        "cast(id as bigint) as price_cents",  # inconsistent
    )
    with pytest.raises(ConstraintViolationError, match="GENERATED ALWAYS AS"):
        vt.commit_append(bad)
    assert vt.read().count() == 5  # refusal committed nothing


def test_rule_survives_overwrite_and_fills_there_too(spark, vt):
    vt.commit_append(
        spark.range(0, 4).selectExpr("id", "cast(2 as double) as price")
    )
    vt.commit_overwrite(
        spark.range(0, 3).selectExpr("id", "cast(3 as double) as price")
    )
    rows = vt.read().collect()
    assert len(rows) == 3
    assert all(r["price_cents"] == 300 for r in rows)
    assert vt.generated()  # table property: survived the overwrite


def test_update_recomputes_not_sets(spark, vt):
    vt.commit_append(
        spark.range(0, 6).selectExpr("id", "cast(1 as double) as price")
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        vt.update_where("id = 1", {"price_cents": "999"})
    for mode in ("cow", "mor"):
        vt.update_where(f"id = {1 if mode == 'cow' else 2}",
                        {"price": "price + 1.0"}, mode=mode)
    rows = {r["id"]: r for r in vt.read().collect()}
    assert rows[1]["price_cents"] == 200  # recomputed through CoW
    assert rows[2]["price_cents"] == 200  # recomputed through MOR
    assert rows[3]["price_cents"] == 100  # untouched rows intact


def test_merge_computes_omitted_generated(spark, vt):
    vt.commit_append(
        spark.range(0, 4).selectExpr("id", "cast(1 as double) as price")
    )
    src = spark.range(2, 6).selectExpr("id", "cast(5 as double) as price")
    vt.merge(src, keys=["id"])
    rows = {r["id"]: r for r in vt.read().collect()}
    assert len(rows) == 6
    assert rows[4]["price_cents"] == 500   # inserted: computed
    assert rows[2]["price_cents"] == 500   # replaced: computed
    assert rows[0]["price_cents"] == 100   # untouched


def test_declared_before_data_and_drop_rules(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t2"))
    t.commit_overwrite(
        spark.range(0, 3).selectExpr("id", "cast(id as double) as price")
    )
    with pytest.raises(ValueError, match="before rows exist"):
        t.add_generated_column("c", "bigint", "cast(price as bigint)")
    # bad expression / unknown source refuses loudly on the empty table
    t2 = VersionedTable(spark, str(tmp_path / "t3"))
    t2.commit_overwrite(spark.range(0).selectExpr("id"))
    with pytest.raises(Exception, match="nope|UNRESOLVED|cannot be resolved"):
        t2.add_generated_column("c", "bigint", "cast(nope as bigint)")
    # source-column drop refused; generated-column drop removes the rule
    t2.add_generated_column("twice", "bigint", "id * 2")
    with pytest.raises(ValueError, match="source of generated"):
        t2.drop_column("id")
    t2.drop_column("twice")
    assert t2.generated() == {}
    t2.commit_append(spark.range(0, 2).selectExpr("id"))  # rule really gone
    assert "twice" not in t2.read().columns
