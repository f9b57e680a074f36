"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB media tables: the payload is a single ``binary``
column (never exploded, never shuffled unless keyed), metadata is typed
columns, and all decode/feature work runs in Arrow-batched
``mapInPandas`` so each task streams record batches without
materializing a partition.

The actual image/audio decode libraries are not available in this
container, so ``decode_image_meta`` is a clearly-marked deterministic
stub: it derives fake (width, height) from the byte length and md5 from
the real bytes. The Spark-side plumbing — schema, batching, UDF
signature — is real and oracle-tested (queries/multimodal.py). A real
deployment replaces ``_fake_decode_dims`` with PIL/ffmpeg and keeps
everything else.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("content_md5", StringType()),
    ]
)


def _fake_decode_dims(n_bytes: int) -> tuple[int, int]:
    """STUB decoder: deterministic dims from payload size.

    Replace with a real image decode (PIL.Image.open on BytesIO) when
    the codec libraries are available; everything downstream is
    unchanged.
    """
    width = 1 + n_bytes % 64
    height = 1 + n_bytes % 37
    return width, height


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        width = (1 + n_bytes % 64).astype("int32")
        height = (1 + n_bytes % 37).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "width": width,
                "height": height,
                "n_pixels": (width.astype("int64") * height.astype("int64")),
                "content_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
            }
        )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) → typed image metadata via mapInPandas.

    Arrow-batched; scales with input partitioning — no collect, no
    per-row Python calls (vectorized ops except the md5 map).
    """
    return df.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=IMAGE_META_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("byte_offset", LongType()),
        StructField("first_byte", IntegerType()),
    ]
)

_MAX_FRAMES = 8
_MIN_BYTES_PER_FRAME = 32


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "byte_offset": [], "first_byte": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_bytes = len(payload)
            n_frames = min(_MAX_FRAMES, n_bytes // _MIN_BYTES_PER_FRAME)
            if n_frames <= 0:
                continue
            stride = n_bytes // n_frames
            for i in range(n_frames):
                off = i * stride
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["byte_offset"].append(off)
                out["first_byte"].append(payload[off])
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "byte_offset": pd.Series(out["byte_offset"], dtype="int64"),
                "first_byte": pd.Series(out["first_byte"], dtype="int32"),
            }
        )


def sample_frames(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → evenly-spaced 'frame' samples via mapInPandas.

    STUB for video frame extraction: a real implementation decodes
    frames at these offsets (ffmpeg); schema, batching and partitioning
    are the production shape. Rows fan out ≤8× — still a narrow
    transformation, no shuffle.
    """
    return df.select("doc_id", "payload").mapInPandas(
        _frame_batches, schema=FRAME_SCHEMA
    )


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Testdata adapter: treat the UTF-8 text payload as an opaque blob
    (the testdata ships no real media; schema/plumbing is what's under
    test)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("in_width", IntegerType()),
        StructField("in_height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("sample_sum", LongType()),
    ]
)

_RESIZE_BOX = 32  # fit-within target box (stub of a thumbnail pass)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_bytes = len(payload)
            if n_bytes == 0:
                continue
            in_w, in_h = _fake_decode_dims(n_bytes)
            # Integer fit-within scaling (floor), never upscale.
            out_w = max(1, min(in_w, (in_w * _RESIZE_BOX) // max(in_w, in_h)))
            out_h = max(1, min(in_h, (in_h * _RESIZE_BOX) // max(in_w, in_h)))
            n_px = out_w * out_h
            buf = np.frombuffer(payload, dtype=np.uint8)
            idx = (np.arange(n_px, dtype=np.int64) * n_bytes) // n_px
            rows["doc_id"].append(doc_id)
            rows["in_width"].append(in_w)
            rows["in_height"].append(in_h)
            rows["out_width"].append(out_w)
            rows["out_height"].append(out_h)
            rows["sample_sum"].append(int(buf[idx].sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "in_width": pd.Series(rows["in_width"], dtype="int32"),
                "in_height": pd.Series(rows["in_height"], dtype="int32"),
                "out_width": pd.Series(rows["out_width"], dtype="int32"),
                "out_height": pd.Series(rows["out_height"], dtype="int32"),
                "sample_sum": pd.Series(rows["sample_sum"], dtype="int64"),
            }
        )


def resize_images(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → resize-pass summary via mapInPandas.

    STUB for an image thumbnail stage: nearest-neighbor byte sampling
    onto a fit-within 32x32 grid, digested as the sum of the sampled
    bytes (a real implementation emits the resized payload instead of
    the digest; schema/batching/partitioning are the production
    shape). Narrow transformation — one output row per image, no
    shuffle."""
    return df.select("doc_id", "payload").mapInPandas(
        _resize_batches, schema=RESIZE_SCHEMA
    )


N_FEATURE_BINS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        doc_ids, n_bytes_l, feats = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            if n == 0:
                continue
            buf = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(buf >> 4, minlength=N_FEATURE_BINS).astype("float64")
            doc_ids.append(doc_id)
            n_bytes_l.append(n)
            feats.append((hist / n).tolist())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "n_bytes": pd.Series(n_bytes_l, dtype="int64"),
                "features": pd.Series(feats, dtype="object"),
            }
        )


def extract_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → fixed-dim feature vector via mapInPandas.

    STUB for a media feature extractor (CLIP/wav2vec/etc.): a 16-bin
    normalized byte histogram — deterministic, vectorized (numpy
    bincount per row), and the exact shape a learned embedding takes
    downstream (array<double> keyed by doc_id, ready for the
    embeddings-table similarity operators)."""
    return df.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("energy_sum", LongType()),
        StructField("mean_energy", DoubleType()),
        StructField("is_silence", BooleanType()),
    ]
)

_AUDIO_WINDOW = 64        # samples per analysis window
_SILENCE_MEAN_ENERGY = 11000.0


def _audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "window_idx": [],
            "energy_sum": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            nw = len(arr) // _AUDIO_WINDOW
            if nw <= 0:
                continue
            windows = (
                arr[: nw * _AUDIO_WINDOW].astype(np.int64).reshape(nw, _AUDIO_WINDOW)
            )
            energy = (windows * windows).sum(axis=1)
            out["doc_id"].extend([doc_id] * nw)
            out["window_idx"].extend(range(nw))
            out["energy_sum"].extend(energy.tolist())
        energy_s = pd.Series(out["energy_sum"], dtype="int64")
        mean = energy_s / float(_AUDIO_WINDOW)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "window_idx": pd.Series(out["window_idx"], dtype="int32"),
                "energy_sum": energy_s,
                "mean_energy": mean,
                "is_silence": mean < _SILENCE_MEAN_ENERGY,
            }
        )


def audio_window_energy(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → per-window RMS-style energy via mapInPandas.

    STUB for audio decode: bytes are interpreted as 8-bit PCM samples
    (a real implementation decodes with soundfile/ffmpeg and keeps the
    same window math). Windowing is vectorized numpy over the Arrow
    batch — per-window integer energy is exact, so the oracle matches
    bit-for-bit. Narrow transformation, no shuffle; output carries only
    (ids, two numbers) per window, never samples.
    """
    return df.select("doc_id", "payload").mapInPandas(
        _audio_batches, schema=AUDIO_ENERGY_SCHEMA
    )
