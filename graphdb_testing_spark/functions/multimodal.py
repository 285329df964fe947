"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct —
the 100 TB-scale layout is ``(media_id, modality, content BINARY,
meta STRUCT)`` in parquet, partitioned by modality.  Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python
row-at-a-time.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode kernels are stubbed: ``decode_stub="error"`` raises
``NotImplementedError`` (production wiring point), ``"fake"``
produces deterministic hash-derived features so the full Spark-side
pipeline — schema, batching, partitioning, UDF signatures — is real
and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media table derived from ``documents`` —
    text bytes stand in for encoded media so the binary-column
    pipeline is exercised with real (opaque) payloads."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.length("text") * 10).cast("long").alias("duration_ms"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def _fake_feature(content: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-feature from the payload hash — the test
    stand-in for a real encoder."""
    out: list[float] = []
    h = content or b""
    seed = b""
    while len(out) < dim:
        seed = hashlib.md5(seed + h[:64]).digest()
        out.extend(b / 255.0 for b in seed)
    return out[:dim]


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode_stub="error"`` marks the production wiring point for a
    real codec (raises ``NotImplementedError``); ``"fake"`` emits
    deterministic hash-derived vectors.  The mapInPandas shape —
    iterator of pandas batches in/out, no driver collect — is exactly
    what a real GPU/codec stage uses.
    """

    def run(batches: "Iterator") -> "Iterator":
        import pandas as pd

        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "media codecs unavailable in this environment; plug a real "
                    "decoder (PIL/librosa/ffmpeg) here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda b: len(b or b"")),
                    "feature": pdf["content"].map(lambda b: _fake_feature(b, dim)),
                }
            )

    cols = media.select("media_id", "modality", "content")
    return cols.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage (stub): passes payload through, rewrites the
    metadata — the real kernel swaps `_identity` for a PIL transform
    inside the same mapInPandas shape."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    timestamp (real decoder would attach the frame bytes).  The
    explode is JVM-side; only decode is Python."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("ts_ms"),
        )
    )
