"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark side is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing. The codec layer is
stubbed (this environment ships no image/audio libraries): decoders
raise ``NotImplementedError`` unless ``deterministic_fake=True``,
which produces seeded synthetic features so the distributed plumbing
can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])

AUDIO_FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("rms", T.FloatType()),
])


def _fake_image_features(payload: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic synthetic decode: dims + embedding derived from
    the payload hash. Stands in for a real decoder (PIL/cv2)."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    emb = [struct.unpack("<I", h[4 * i: 4 * i + 4])[0] / 2**32
           for i in range(dim)]
    return width, height, emb


def decode_images(df: DataFrame, bin_col: str = "payload",
                  id_col: str = "doc_id", dim: int = 8,
                  deterministic_fake: bool = False) -> DataFrame:
    """binary → (doc_id, width, height, embedding) via Arrow-batched
    mapInPandas. Real decoder not available in this container."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image codecs (PIL/cv2) are not installed in this environment; "
            "pass deterministic_fake=True to exercise the pipeline")

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                w, h, emb = _fake_image_features(bytes(payload), dim)
                rows.append((did, w, h, emb))
            yield pd.DataFrame(rows,
                               columns=["doc_id", "width", "height",
                                        "embedding"])

    return df.select(id_col, bin_col).mapInPandas(batches, schema)


def sample_audio_frames(df: DataFrame, bin_col: str = "payload",
                        id_col: str = "doc_id", n_frames: int = 4,
                        deterministic_fake: bool = False) -> DataFrame:
    """binary audio → per-frame RMS rows (frame sampling pattern):
    one input row fans out to n_frames output rows inside the Arrow
    batch — the shape real loudness/VAD extraction uses."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio codecs are not installed in this environment; "
            "pass deterministic_fake=True to exercise the pipeline")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                h = hashlib.sha256(bytes(payload)).digest()
                for i in range(n_frames):
                    rows.append((did, i, h[i] / 255.0))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "rms"])

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_FRAMES_SCHEMA)


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Build a synthetic binary column from text (test fixture for the
    multimodal path: real datasets carry bytes in parquet the same
    way)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit("txt").alias("format"),
        ).alias("meta"),
    )
