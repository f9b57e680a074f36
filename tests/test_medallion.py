"""End-to-end medallion pipeline test: bronze bootstrap → incremental
ingest → cross-score → datamart → views, plus the invariants the
reference enforced via Postgres constraints (FIXTURES.md §8) and the
idempotence property (second run with no new inputs adds 0 rows)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from finalpipeline_spark.plans.medallion import TOP_K, MedallionPipeline


@pytest.fixture()
def molecules(spark):
    rows = [
        # molregno, chembl_id, smiles, alogp (None ~ nullable alogp path)
        (i, f"CHEMBL{i}", f"C{'C' * (i % 7)}O{i % 5}N", float(i % 13) if i % 9 else None)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "molregno long, chembl_id string, smiles string, alogp double"
    )


def _write_input_csv(path: str, rows: list[tuple[str, str, str]]) -> None:
    with open(path, "w") as f:
        f.write("molecule name,smiles,extra\n")
        for r in rows:
            f.write(",".join(r) + "\n")


def test_pipeline_end_to_end_and_idempotent(spark, tmp_path, molecules):
    warehouse = str(tmp_path / "warehouse")
    inputs = str(tmp_path / "inputs")
    os.makedirs(inputs)
    # Damaged IDs exercising the regex repair (tanimoto.py:72-75 cases),
    # a duplicate, an invalid SMILES (whitespace → parse-fail stand-in),
    # and an unresolvable id (not in bronze).
    _write_input_csv(
        os.path.join(inputs, "batch1.csv"),
        [
            ("chembl-7-x", "CCCO1N", "junk"),
            # NB: digit run is kept verbatim ('042' would yield the
            # unresolvable CHEMBL042 — reference behavior, tanimoto.py:72-75)
            ("mol 42 (v2)", "CCO2N", "junk"),
            ("CHEMBL7", "CCCO1N", "dup"),
            ("CHEMBL13", "BAD SMILES", "junk"),
            ("CHEMBL99999", "CCO0N", "junk"),
        ],
    )

    pipe = MedallionPipeline(spark, warehouse)
    n = pipe.run(molecules, inputs + "/*.csv")
    assert n == 1

    facts = spark.read.parquet(pipe.paths.silver_fact)
    dim = spark.read.parquet(pipe.paths.silver_dim)

    # Invariants from FIXTURES.md §8 (reference DDL datamart.py:110-145):
    # <= 10 rows per target.
    per_target = facts.groupBy("target_molregno").count().agg(F.max("count")).first()[0]
    assert per_target <= TOP_K
    # (source, target) unique.
    assert (
        facts.groupBy("source_molregno", "target_molregno").count().filter("count > 1").count()
        == 0
    )
    # Every fact molregno present in the dim.
    fact_ids = facts.select(F.col("source_molregno").alias("m")).union(
        facts.select(F.col("target_molregno").alias("m"))
    ).distinct()
    missing = fact_ids.join(dim, fact_ids.m == dim.molregno, "left_anti")
    assert missing.count() == 0
    # Both resolvable targets scored; the unresolvable one is absent.
    tgt_ids = {r.target_molregno for r in facts.select("target_molregno").distinct().collect()}
    assert tgt_ids == {7, 42}

    # Gold views evaluate.
    assert spark.table("v_avg_similarity").count() > 0
    assert spark.table("v_avg_alogp_diff").count() > 0
    nonull = spark.table("v_avg_alogp_diff_nonull")
    assert nonull.filter(F.col("avg_alogp_diff").isNull()).count() == 0

    # Idempotence: re-run with the same inputs → no new files, no new rows.
    fact_count = facts.count()
    dim_count = dim.count()
    n2 = pipe.run(molecules, inputs + "/*.csv")
    assert n2 == 0
    assert spark.read.parquet(pipe.paths.silver_fact).count() == fact_count
    assert spark.read.parquet(pipe.paths.silver_dim).count() == dim_count

    # Incremental: a second batch adds only the new target's partition.
    _write_input_csv(
        os.path.join(inputs, "batch2.csv"), [("CHEMBL55", "CCCCO0N", "x")]
    )
    n3 = pipe.run(molecules, inputs + "/*.csv")
    assert n3 == 1
    facts3 = spark.read.parquet(pipe.paths.silver_fact)
    tgt_ids3 = {r.target_molregno for r in facts3.select("target_molregno").distinct().collect()}
    assert tgt_ids3 == {7, 42, 55}
    assert facts3.count() > fact_count


def test_merge_upsert_semantics(spark):
    from finalpipeline_spark.operators.incremental import merge_upsert

    existing = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    incoming = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    merged = merge_upsert(existing, incoming, ["k"])
    got = {r.k: (r.name, r.v) for r in merged.collect()}
    assert got == {
        1: ("a", 10.0),   # untouched survives
        2: ("B", 200.0),  # updated: incoming wins
        3: ("c", 30.0),
        4: ("d", 40.0),   # new key inserts
    }
    # Idempotent: merging the same increment again changes nothing.
    again = merge_upsert(merged, incoming, ["k"])
    assert {r.k: (r.name, r.v) for r in again.collect()} == got


def test_demo_cli_end_to_end(spark, tmp_path):
    # `python -m finalpipeline_spark` in-process: pipeline runs, second
    # pass is a no-op, quality report is clean (exit code 0).
    from finalpipeline_spark.__main__ import main

    assert main(str(tmp_path / "demo")) == 0


def _corrupt_parquet_dir(path: str) -> None:
    """An existing directory whose parquet read fails — the shape of a
    transient/partial read error (exists, but spark.read throws)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")


def test_transient_read_failure_does_not_overwrite_bronze(spark, tmp_path, molecules):
    """The data-loss trap: bronze exists but reads fail. bootstrap must
    NOT treat that as 'absent' and overwrite the corpus."""
    warehouse = str(tmp_path / "wh")
    pipe = MedallionPipeline(spark, warehouse)
    _corrupt_parquet_dir(pipe.paths.bronze_molecules)
    marker = os.path.join(pipe.paths.bronze_molecules, "part-00000.parquet")
    before = open(marker, "rb").read()

    pipe.bootstrap_bronze(molecules)  # dir exists -> must be a no-op

    assert open(marker, "rb").read() == before  # nothing overwritten


def test_failing_read_of_existing_silver_raises_not_empty(spark, tmp_path):
    """_read_or_empty must propagate a read failure of an EXISTING
    table — returning empty would duplicate fact/dim appends."""
    warehouse = str(tmp_path / "wh")
    pipe = MedallionPipeline(spark, warehouse)
    _corrupt_parquet_dir(pipe.paths.silver_fact)
    with pytest.raises(Exception):
        pipe._read_or_empty(
            pipe.paths.silver_fact, "source_molregno long"
        ).count()


def test_failing_read_of_existing_ledger_raises(spark, tmp_path):
    from finalpipeline_spark.sources.catalog import read_ledger

    ledger = str(tmp_path / "ledger")
    _corrupt_parquet_dir(ledger)
    with pytest.raises(Exception):
        read_ledger(spark, ledger).count()


def test_topk_prune_is_exact_and_bounds_the_store(spark, tmp_path, molecules):
    """Default prune_to_top_k keeps the similarity store ≈K×targets and
    the datamart output bit-identical to reference-parity mode."""
    inputs = str(tmp_path / "inputs")
    os.makedirs(inputs)
    _write_input_csv(
        os.path.join(inputs, "batch1.csv"),
        [("CHEMBL7", "CCCO1N", "x"), ("CHEMBL42", "CCO2N", "x")],
    )

    pruned = MedallionPipeline(spark, str(tmp_path / "wh_pruned"))
    full = MedallionPipeline(
        spark, str(tmp_path / "wh_full"), prune_to_top_k=False
    )
    assert pruned.run(molecules, inputs + "/*.csv") == 1
    assert full.run(molecules, inputs + "/*.csv") == 1

    sims_pruned = spark.read.parquet(pruned.paths.similarities).count()
    sims_full = spark.read.parquet(full.paths.similarities).count()
    assert sims_full == 2 * (199 - 1) + 2  # full cross product (self excluded)
    assert sims_pruned < sims_full
    assert sims_pruned <= 2 * (TOP_K + 20)  # K plus a tolerance-tie margin

    cols = [
        "source_molregno",
        "target_molregno",
        "tanimoto_similarity",
        "has_duplicates_of_last_largest_score",
    ]
    got_p = {tuple(r) for r in spark.read.parquet(pruned.paths.silver_fact).select(*cols).collect()}
    got_f = {tuple(r) for r in spark.read.parquet(full.paths.silver_fact).select(*cols).collect()}
    assert got_p == got_f
