"""Multimodal queries: binary payload metadata through mapInPandas.

The Spark side exercises the REAL multimodal plumbing (binary column →
Arrow-batched mapInPandas stub decoder — multimodal/decode.py); the
DuckDB oracle recomputes the same deterministic metadata in SQL, so
the whole Python-UDF path (schema, batch shape, byte fidelity through
Arrow) is value-hash verified, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.multimodal.decode import decode_image_meta, documents_as_binary
from finalpipeline_spark.queries.registry import register
from finalpipeline_spark.tables import load_table


@register(
    "mm_image_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               (1 + octet_length(encode(text)) % 64)::int AS width,
               (1 + octet_length(encode(text)) % 37)::int AS height,
               ((1 + octet_length(encode(text)) % 64)
                * (1 + octet_length(encode(text)) % 37))::bigint AS n_pixels,
               md5(text) AS content_md5
        FROM documents
    """,
    tags=("extension",),
)
def mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed metadata via the stubbed mapInPandas
    decoder (deterministic fake dims + real content md5)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(documents_as_binary(docs))
