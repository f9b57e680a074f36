"""finalpipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference pipeline
(Drosophil/FinalPipeline: medallion ETL over ChEMBL — incremental file
ingestion, fingerprinting, all-pairs similarity, per-group top-k with
tolerance tie flags, star-schema datamart, aggregate views), extended
with large-scale training-data operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB inputs.

Layout:
  session      — tuned SparkSession factory
  tables       — testdata readers (schema normalization, nanos handling)
  functions/   — scalar/vector/text expression builders (dual-dialect)
  operators/   — reusable DataFrame operators (top-k, dedup, tie-flag, ...)
  queries/     — the registered query surface (queries() + oracle_sql())
  plans/       — end-to-end pipeline compositions (medallion)
  streaming/   — Structured Streaming surface
  multimodal/  — binary-column plumbing with stubbed decoders
"""

__version__ = "0.1.0"
