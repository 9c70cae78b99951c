"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The decode step is STUBBED (PIL/librosa/ffmpeg are not in this
container): ``decode_fn="fake"`` runs a deterministic byte-level feature
extractor so the Spark-side plumbing — schema, batching, partitioning,
UDF signature — is real and tested; ``decode_fn="real"`` raises
NotImplementedError at the clearly marked point where an image/audio
library call belongs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("content", T.BinaryType()),     # opaque payload
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),      # typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: byte histogram
    moments. Replace with a real model call when libs are available."""
    if content is None:
        return [0.0] * dim
    acc = [0.0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b / 255.0
    n = max(len(content), 1)
    return [round(x / n, 6) for x in acc]


def extract_features(
    media: DataFrame, decode_fn: str = "fake", dim: int = 8, batch_size: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns. The
    Arrow batch shape (iterator of pdf chunks) is exactly what a real
    GPU-encoder stage needs: batch the payloads, call the model once per
    chunk, emit fixed-size vectors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn == "real":
                # >>> real decoder goes here (PIL.Image.open /
                # librosa.load / av.open) — not available in this env <<<
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries "
                    "not present in this container"
                )
            feats = pdf["content"].map(lambda c: _fake_features(c, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda c: 0 if c is None else len(c)),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, documents: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic media table from the documents table (the
    container has no real media files): payload = utf-8 text bytes."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode timestamps to sample at; the
    decode of each frame is the stubbed step. Shows the partitioning
    shape (one row per (video, frame_ts))."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
