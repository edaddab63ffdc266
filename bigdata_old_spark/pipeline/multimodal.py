"""Multimodal columns: images/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schema, partition-sized
Arrow batching via mapInPandas, deterministic fake feature extraction —
while the actual codec calls are stubbed behind ``_decode_image`` /
``_decode_audio`` (the container has no PIL/ffmpeg; a deployment swaps
the stub for the real decoder without touching the Spark shape).

Batch shape contract: mapInPandas receives an iterator of
pandas.DataFrames whose ``content`` column holds bytes; output schema
is declared explicitly so Catalyst knows it without running Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("content", T.BinaryType()),      # opaque bytes
    T.StructField("width", T.IntegerType()),       # typed metadata …
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),  # embedding-shaped
])


def _decode_image(content: bytes) -> "object":
    """Real deployments: PIL.Image.open(io.BytesIO(content)).
    Stubbed here — the container ships no image codecs."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_feature(content: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a vision encoder: bytes → digest →
    unit-range floats.  Keeps the pipeline testable end-to-end."""
    d = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in d[:dim]]


def extract_image_features(media: DataFrame, dim: int = 16, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary image content.

    The Arrow batches keep bytes off the Python heap until needed; at
    scale, repartition upstream so each task holds a bounded number of
    images (content bytes dominate memory, not row count).
    """
    schema = IMAGE_FEATURES_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                try:
                    _decode_image(raw)  # real decode goes here
                except NotImplementedError:
                    pass
                feats.append(_fake_feature(raw, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sha256": [hashlib.sha256(bytes(c) if c is not None else b"").hexdigest() for c in pdf["content"]],
                "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                "feature": feats,
            })

    cols = [f.name for f in MEDIA_SCHEMA.fields if f.name in media.columns]
    return media.select(*cols).mapInPandas(run, schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, ts_ms) to
    decode — the shuffle-able work list; actual frame decode is the
    same stubbed mapInPandas shape as images."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))).alias("ts_ms"),
        )
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded content bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        content = hashlib.md5(str(i).encode()).digest() * 4
        rows.append((
            i, kind,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            bytearray(content),
            64 if kind == "image" else None,
            48 if kind == "image" else None,
            5000 if kind != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
