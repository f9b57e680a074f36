"""Multimodal queries: binary payload metadata through mapInPandas.

The Spark side exercises the REAL multimodal plumbing (binary column →
Arrow-batched mapInPandas stub decoder — multimodal/decode.py); the
DuckDB oracle recomputes the same deterministic metadata in SQL, so
the whole Python-UDF path (schema, batch shape, byte fidelity through
Arrow) is value-hash verified, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finalpipeline_spark.multimodal.decode import (
    audio_window_energy,
    decode_image_meta,
    documents_as_binary,
    extract_features,
    resize_images,
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


@register(
    "mm_resize",
    oracle="""
        WITH d AS (
            SELECT doc_id, text, octet_length(encode(text)) AS n
            FROM documents WHERE octet_length(encode(text)) > 0
        ),
        dims AS (
            SELECT doc_id, text, n,
                   (1 + n % 64) AS in_w, (1 + n % 37) AS in_h
            FROM d
        ),
        o AS (
            SELECT doc_id, text, n, in_w, in_h,
                   greatest(1, least(in_w, (in_w * 32) // greatest(in_w, in_h))) AS out_w,
                   greatest(1, least(in_h, (in_h * 32) // greatest(in_w, in_h))) AS out_h
            FROM dims
        )
        SELECT doc_id, in_w::int AS in_width, in_h::int AS in_height,
               out_w::int AS out_width, out_h::int AS out_height,
               list_sum(list_transform(range(0, out_w * out_h),
                   k -> ord(substr(text, ((k * n) // (out_w * out_h))::int + 1, 1))
               ))::bigint AS sample_sum
        FROM o
    """,
    tags=("extension",),
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-resize pass over opaque image payloads: fit-within
    32x32 integer scaling + nearest-neighbor byte sampling, digested as
    the sampled-byte sum (multimodal/decode.resize_images). The oracle
    recomputes the sampling arithmetic in SQL — ord(char) = byte value
    because the payloads are ASCII."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(documents_as_binary(docs))


@register(
    "mm_feature_extract",
    oracle="""
        WITH d AS (
            SELECT doc_id, text, octet_length(encode(text)) AS n
            FROM documents WHERE octet_length(encode(text)) > 0
        ),
        b AS (SELECT doc_id, text, n, unnest(range(0, 16)) AS bin FROM d)
        SELECT doc_id, bin::int AS bin,
               (len(list_filter(
                   list_transform(range(0, n),
                       i -> ord(substr(text, i::int + 1, 1)) // 16),
                   v -> v = bin)))::double / n AS feature
        FROM b
    """,
    tags=("extension",),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over opaque payloads: the 16-bin normalized
    byte histogram stub (multimodal/decode.extract_features), exploded
    to (doc_id, bin, feature) rows so the oracle hash covers every
    vector component. The real extractor (CLIP/wav2vec) emits the same
    array<double> shape into the embeddings-table operators."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(documents_as_binary(docs))
    return feats.select(
        "doc_id", F.posexplode("features").alias("bin", "feature")
    )


@register(
    "mm_audio_energy",
    oracle="""
        WITH d AS (
            SELECT doc_id, text,
                   (octet_length(encode(text)) // 64) AS nw
            FROM documents
        ),
        w AS (
            SELECT doc_id, text, unnest(range(0, nw)) AS window_idx
            FROM d WHERE nw > 0
        ),
        e AS (
            SELECT doc_id, window_idx,
                   cast(list_sum(list_transform(range(1, 65),
                        i -> ord(substr(text, cast(window_idx * 64 + i as int), 1))
                             * ord(substr(text, cast(window_idx * 64 + i as int), 1))))
                        as bigint) AS energy_sum
            FROM w
        )
        SELECT doc_id, cast(window_idx as int) AS window_idx, energy_sum,
               (cast(energy_sum as double) / cast(64 as double)) AS mean_energy,
               ((cast(energy_sum as double) / cast(64 as double)) < 11000.0)
                   AS is_silence
        FROM e
    """,
    tags=("extension",),
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-as-binary analysis: per-64-sample-window energy + silence
    flag through the Arrow-batched mapInPandas path (8-bit PCM stub
    decode; the oracle recomputes the same integer energy from the
    bytes — the text is ASCII, so char ordinals ARE the payload
    bytes). Exercises the full binary→numpy→windowed-feature plumbing
    a real audio pipeline uses."""
    docs = load_table(spark, sf_dir, "documents")
    return audio_window_energy(documents_as_binary(docs))


_SCENE_CUT_DELTA = 40  # |Δ first_byte| above this = scene boundary


@register(
    "mm_video_scene_cut",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
                   least(8, octet_length(encode(text)) // 32) AS n_frames
            FROM documents
        ),
        fr AS (
            SELECT doc_id, text, n_bytes, n_frames,
                   unnest(range(0, n_frames)) AS frame_idx
            FROM d WHERE n_frames > 0
        ),
        fb AS (
            SELECT doc_id, frame_idx::int AS frame_idx,
                   ord(substr(text,
                       (frame_idx * (n_bytes // n_frames))::int + 1, 1))::int
                       AS first_byte
            FROM fr
        ),
        dl AS (
            SELECT doc_id, frame_idx, first_byte,
                   (first_byte - lag(first_byte) OVER (
                       PARTITION BY doc_id ORDER BY frame_idx)) AS delta
            FROM fb
        )
        SELECT doc_id, frame_idx, first_byte,
               cast(abs(delta) as bigint) AS abs_delta
        FROM dl
        WHERE abs(delta) > {_SCENE_CUT_DELTA}
    """,
    tags=("extension",),
)
def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over the sampled frame stream: a frame
    whose feature (stub: first payload byte; real: frame histogram
    distance) jumps more than a threshold from its predecessor starts
    a new scene. One per-document window over the ≤8-frame sample —
    state bounded per doc, no global sort; the pattern a shot-boundary
    pass over 100 TB of video would use (keyed by video, ordered by
    frame time)."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_binary(docs))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.col("first_byte") - F.lag("first_byte").over(w)
    return (
        frames.withColumn("delta", delta)
        .filter(F.abs(F.col("delta")) > _SCENE_CUT_DELTA)
        .select(
            "doc_id",
            "frame_idx",
            "first_byte",
            F.abs(F.col("delta")).cast("bigint").alias("abs_delta"),
        )
    )
