"""Runnable end-to-end demo: `python -m finalpipeline_spark [workdir]`.

Stands up the whole reference pipeline shape (SURVEY.md §3) against a
synthetic ChEMBL-style source: bronze bootstrap → incremental CSV
ingest with ledger + ID repair → broadcast cross-score → top-k datamart
with tie flags → gold views, then re-runs to demonstrate that a second
pass with no new inputs is a no-op, and finishes with the data-quality
assertion report over the silver tables.
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession

from finalpipeline_spark.operators.quality import (
    check_not_null,
    check_referential,
    check_unique,
    run_checks,
)
from finalpipeline_spark.plans.medallion import MedallionPipeline
from finalpipeline_spark.session import get_spark


def _demo_molecules(spark: SparkSession):
    rows = [
        (i, f"CHEMBL{i}", f"C{'C' * (i % 7)}O{i % 5}N", float(i % 13) if i % 9 else None)
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "molregno long, chembl_id string, smiles string, alogp double"
    )


def _write_demo_inputs(inputs: str) -> None:
    os.makedirs(inputs, exist_ok=True)
    with open(os.path.join(inputs, "batch1.csv"), "w") as f:
        f.write("molecule name,smiles,extra\n")
        for i in range(0, 40, 2):
            f.write(f"chembl-{i}-x,CC{'C' * (i % 5)}ON,note\n")
    with open(os.path.join(inputs, "batch2.csv"), "w") as f:
        f.write("molecule name,smiles,extra\n")
        for i in range(1, 20, 2):
            f.write(f"mol {i} (v2),CCO{i % 5}N,note\n")


def main(workdir: str | None = None) -> int:
    workdir = workdir or tempfile.mkdtemp(prefix="fps_demo_")
    warehouse = os.path.join(workdir, "warehouse")
    inputs = os.path.join(workdir, "inputs")
    _write_demo_inputs(inputs)

    spark = get_spark(app_name="finalpipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    molecules = _demo_molecules(spark)
    pipe = MedallionPipeline(spark, warehouse)

    n1 = pipe.run(molecules, inputs + "/*.csv")
    print(f"run 1: ingested {n1} new input file(s)")
    facts = spark.read.parquet(pipe.paths.silver_fact)
    dim = spark.read.parquet(pipe.paths.silver_dim)
    print(f"silver_fact: {facts.count()} rows; silver_dim: {dim.count()} rows")
    print("gold view (avg similarity per source), first 5:")
    spark.table("v_avg_similarity").orderBy("chembl_id").show(5, truncate=False)

    n2 = pipe.run(molecules, inputs + "/*.csv")
    print(f"run 2 (no new inputs): ingested {n2} file(s) — idempotent")

    report = run_checks(
        [
            check_not_null(facts, ["source_molregno", "target_molregno"]),
            check_unique(facts, ["source_molregno", "target_molregno"]),
            check_referential(facts, "source_molregno", dim, "molregno"),
        ]
    )
    print("data-quality report:")
    report.show(truncate=False)
    n_bad = report.filter("n_violations > 0").count()
    print(f"workdir: {workdir}")
    return 0 if (n1 > 0 and n2 == 0 and n_bad == 0) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
