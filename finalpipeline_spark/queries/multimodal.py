"""Multimodal queries: binary payload metadata through mapInPandas.

The Spark side exercises the REAL multimodal plumbing (binary column →
Arrow-batched mapInPandas stub decoder — multimodal/decode.py); the
DuckDB oracle recomputes the same deterministic metadata in SQL, so
the whole Python-UDF path (schema, batch shape, byte fidelity through
Arrow) is value-hash verified, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finalpipeline_spark.multimodal.decode import (
    decode_image_meta,
    documents_as_binary,
    sample_frames,
)
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


@register(
    "mm_frame_sample",
    oracle="""
        WITH d AS (
            SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
                   least(8, octet_length(encode(text)) // 32) AS n_frames
            FROM documents
        ),
        fr AS (
            SELECT doc_id, text, n_bytes, n_frames,
                   unnest(range(0, n_frames)) AS frame_idx
            FROM d WHERE n_frames > 0
        )
        SELECT doc_id, frame_idx::int AS frame_idx,
               (frame_idx * (n_bytes // n_frames))::bigint AS byte_offset,
               ord(substr(text, (frame_idx * (n_bytes // n_frames))::int + 1, 1))::int
                   AS first_byte
        FROM fr
    """,
    tags=("extension",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque media payload: evenly-spaced byte
    offsets stand in for video frame extraction (the real decoder slots
    into the same mapInPandas; multimodal/decode.py). Oracle recomputes
    the sampling arithmetic in SQL — byte offsets equal char offsets
    because the payloads are ASCII."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(documents_as_binary(docs))
