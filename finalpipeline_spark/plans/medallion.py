"""The reference pipeline end-to-end, Spark-first (SURVEY.md §3).

Reference control flow (final_pipeline.py:52-92): Airflow DAG →
branch-on-table-existence → bronze bootstrap → incremental target
ingest → per-target similarity scoring → datamart top-10 → views.
Here every stage is a lazy DataFrame plan over a parquet warehouse
directory; the Airflow DAG collapses to ``run()`` and every
hand-rolled incremental mechanism becomes an anti-join or an
idempotent partitioned write:

  bronze bootstrap  = write-if-absent (C2 branch → an `if`)
  file ledger (I1)  = left-anti join vs a ledger table (J4)
  skip-computed     = anti-join on (source,target) pairs (J5/J6)
  UNIQUE constraint = dedup-before-append (S6)
  per-target loop   = crossJoin(broadcast(targets)) (J3)
  top-10 + tie flag = window top-k with isclose flag (O1/A5)
  views             = CREATE OR REPLACE TEMP VIEW (S7)

Scale design: the only big table is `sources` (molecules). It is
scanned once per ingest batch; the cross-score broadcasts the (small)
target batch, so no shuffle of the big side; facts/dim writes are
append-only with anti-join dedup. Re-running with no new inputs is a
no-op (tested in tests/test_medallion.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finalpipeline_spark.functions.fingerprints import fingerprint, tanimoto
from finalpipeline_spark.operators.incremental import (
    new_items,
    write_idempotent_partitions,
)
from finalpipeline_spark.operators.tiebreak import top_k_with_tie_flag
from finalpipeline_spark.sources.catalog import (
    append_ledger_entries,
    read_ledger,
)
from finalpipeline_spark.sources.readers import read_target_csvs

TOP_K = 10
MIN_SIM = 0.0  # reference kept all pairs; raise for scale runs


@dataclass
class MedallionPaths:
    root: str

    @property
    def bronze_molecules(self) -> str:
        return os.path.join(self.root, "bronze_molecules")

    @property
    def ledger(self) -> str:
        return os.path.join(self.root, "used_input_files")

    @property
    def similarities(self) -> str:
        return os.path.join(self.root, "similarities")

    @property
    def silver_fact(self) -> str:
        return os.path.join(self.root, "silver_fact")

    @property
    def silver_dim(self) -> str:
        return os.path.join(self.root, "silver_dim_molecules")


class MedallionPipeline:
    """bronze → silver → gold over a parquet warehouse dir."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.paths = MedallionPaths(warehouse)

    # -- bronze ----------------------------------------------------------
    def bootstrap_bronze(self, molecules: DataFrame) -> None:
        """S1/S2/C2: one-time seed of the molecule corpus + fingerprints.

        Branch-on-existence replaces the reference's
        BranchPythonOperator + pg_class probe (db_interact.py:54-84).
        Fingerprints are computed here once (compute_morgan.py:8-46's
        5-chunk pagination is just Spark partitioning).
        """
        if self._exists(self.paths.bronze_molecules):
            return
        (
            molecules.select("molregno", "chembl_id", "smiles", "alogp")
            .withColumn("fp", fingerprint(F.col("smiles")))
            .filter(F.col("fp").isNotNull())  # P6: invalid SMILES dropped
            .write.mode("overwrite")
            .parquet(self.paths.bronze_molecules)
        )

    # -- incremental ingest + scoring ------------------------------------
    def ingest_targets(self, input_glob: str) -> int:
        """I1/J4 + P1-P4 + J1 + J3: process only never-seen input files.

        Returns the number of new files processed. One distributed plan
        replaces the reference's per-file Python loop
        (tanimoto.py:150-197).
        """
        raw = read_target_csvs(self.spark, input_glob)
        ledger = read_ledger(self.spark, self.paths.ledger).select(
            F.col("file").alias("input_file")
        )
        fresh = new_items(raw, ledger, ["input_file"])
        new_files = [r.input_file for r in fresh.select("input_file").distinct().collect()]
        if not new_files:
            return 0

        # P1 regex ID repair, P2/P3 project, P4 dedup (deterministic).
        targets = (
            fresh.withColumn(
                "chembl_id",
                F.concat(F.lit("CHEMBL"), F.regexp_extract("molecule_name", r"(\d+)", 1)),
            )
            .select("chembl_id", "smiles")
            .dropDuplicates(["chembl_id"])
            .withColumn("fp", fingerprint(F.col("smiles")))
            .filter(F.col("fp").isNotNull())
        )

        # J1: id resolution via broadcast left join against bronze.
        bronze = self.spark.read.parquet(self.paths.bronze_molecules)
        resolved = targets.join(
            F.broadcast(bronze.select("chembl_id", "molregno").withColumnRenamed("molregno", "target_molregno")),
            "chembl_id",
            "left",
        ).filter(F.col("target_molregno").isNotNull())

        # J3: cross-score — broadcast the small target batch.
        sources = bronze.select(
            F.col("molregno"), F.col("fp").alias("source_fp")
        )
        scored = (
            sources.crossJoin(
                F.broadcast(
                    resolved.select(
                        "target_molregno",
                        F.col("chembl_id").alias("target_chembl_id"),
                        F.col("fp").alias("target_fp"),
                    )
                )
            )
            .withColumn("similarity", tanimoto(F.col("source_fp"), F.col("target_fp")))
            .filter(F.col("molregno") != F.col("target_molregno"))  # P7
            .filter(F.col("similarity") >= MIN_SIM)
            .select("molregno", "target_molregno", "target_chembl_id", "similarity")
        )

        # S13/I2: idempotent partitioned write (one partition per target).
        write_idempotent_partitions(scored, self.paths.similarities, ["target_chembl_id"])

        append_ledger_entries(self.spark, self.paths.ledger, new_files)
        return len(new_files)

    # -- silver datamart --------------------------------------------------
    def build_datamart(self) -> None:
        """O1/A5 top-10 + tie flag, J5/J6 anti-joins, S6 append."""
        sims = self.spark.read.parquet(self.paths.similarities)
        top = top_k_with_tie_flag(
            sims.select(
                F.col("molregno").alias("source_molregno"),
                "target_molregno",
                F.col("similarity").alias("tanimoto_similarity"),
            ),
            group_cols=["target_molregno"],
            score_col="tanimoto_similarity",
            tiebreak_cols=["source_molregno"],
            k=TOP_K,
        )

        existing_facts = self._read_or_empty(
            self.paths.silver_fact,
            "source_molregno long, target_molregno long, "
            "tanimoto_similarity double, has_duplicates_of_last_largest_score long",
        )
        new_facts = new_items(
            top, existing_facts, ["source_molregno", "target_molregno"]
        )
        new_facts.write.mode("append").parquet(self.paths.silver_fact)

        # J6: dim draft = ids in facts not yet in dim; J2: enrich.
        facts = self.spark.read.parquet(self.paths.silver_fact)
        ids = (
            facts.select(F.col("source_molregno").alias("molregno"))
            .union(facts.select(F.col("target_molregno").alias("molregno")))
            .distinct()
        )
        existing_dim = self._read_or_empty(
            self.paths.silver_dim, "molregno long, chembl_id string, alogp double"
        )
        bronze = self.spark.read.parquet(self.paths.bronze_molecules)
        draft = new_items(ids, existing_dim, ["molregno"]).join(
            F.broadcast(bronze.select("molregno", "chembl_id", "alogp")),
            "molregno",
            "inner",
        )
        draft.write.mode("append").parquet(self.paths.silver_dim)

    # -- gold views -------------------------------------------------------
    def create_views(self) -> None:
        """S7 + J7/J8 + A2/A3: the three reference views
        (views_p1.py:3-43) as catalog views over the silver tables."""
        self.spark.read.parquet(self.paths.silver_fact).createOrReplaceTempView(
            "silver_fact"
        )
        self.spark.read.parquet(self.paths.silver_dim).createOrReplaceTempView(
            "silver_dim_molecules"
        )
        self.spark.sql(
            """
            CREATE OR REPLACE TEMPORARY VIEW v_avg_similarity AS
            SELECT d.chembl_id, avg(f.tanimoto_similarity) AS avg_similarity
            FROM silver_fact f
            JOIN silver_dim_molecules d ON f.source_molregno = d.molregno
            GROUP BY d.chembl_id
            """
        )
        self.spark.sql(
            """
            CREATE OR REPLACE TEMPORARY VIEW v_avg_alogp_diff AS
            SELECT s.chembl_id, avg(abs(s.alogp - t.alogp)) AS avg_alogp_diff
            FROM silver_fact f
            JOIN silver_dim_molecules s ON f.source_molregno = s.molregno
            JOIN silver_dim_molecules t ON f.target_molregno = t.molregno
            GROUP BY s.chembl_id
            """
        )
        self.spark.sql(
            """
            CREATE OR REPLACE TEMPORARY VIEW v_avg_alogp_diff_nonull AS
            SELECT s.chembl_id, avg(abs(s.alogp - t.alogp)) AS avg_alogp_diff
            FROM silver_fact f
            JOIN silver_dim_molecules s ON f.source_molregno = s.molregno
            JOIN silver_dim_molecules t ON f.target_molregno = t.molregno
            WHERE s.alogp IS NOT NULL AND t.alogp IS NOT NULL
            GROUP BY s.chembl_id
            """
        )

    # -- orchestration -----------------------------------------------------
    def run(self, molecules: DataFrame, input_glob: str) -> int:
        """C1: the whole DAG as straight-line code."""
        self.bootstrap_bronze(molecules)
        n = self.ingest_targets(input_glob)
        if n > 0:
            self.build_datamart()
        self.create_views()
        return n

    # -- helpers ----------------------------------------------------------
    def _exists(self, path: str) -> bool:
        try:
            self.spark.read.parquet(path).schema
            return True
        except Exception:
            return False

    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return self.spark.createDataFrame([], schema)
