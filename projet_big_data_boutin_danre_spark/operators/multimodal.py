"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (engine extension for training-data pipelines).

The Spark-side plumbing is real — schema (schemas.MEDIA_SCHEMA),
Arrow-batched ``mapInPandas`` operators, partition sizing — while the
codec step is a deterministic fake (the image/audio libraries are not
in this container): ``_decode_stub`` derives a fixed-length feature
vector from the bytes themselves. Swap ``_decode_stub`` for a real
decoder (PIL/torchaudio/ffmpeg) without touching the plan.

Scale notes: binary payloads ride in parquet binary columns; Arrow
moves them to Python in columnar batches (no per-row pickling).
Repartition by size before heavy decode so batches are balanced;
``spark.sql.files.maxPartitionBytes`` bounds scan-side memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MEDIA_FEATURES_SCHEMA

FEATURE_DIM = 8


def _decode_stub(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake 'decode + feature extract': md5-seeded
    pseudo-features in [0,1). Replace with a real codec in production —
    the signature (bytes → fixed-dim float vector) is the contract."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, target_partitions: int | None = None) -> DataFrame:
    """Decode/feature-extract each media row via Arrow-batched
    ``mapInPandas`` — the canonical shape for any Python-side codec.

    The input is round-robin repartitioned first (default: the
    session's parallelism): media scans often arrive as few large
    files, and the Python codec — not the shuffle — is the dominant
    cost, so balancing decode work across all cores wins at any scale.
    Pass ``target_partitions=0`` to keep the input partitioning."""
    if target_partitions is None:
        target_partitions = media.sparkSession.sparkContext.defaultParallelism
    if target_partitions:
        media = media.repartition(target_partitions)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        _decode_stub(bytes(p) if p is not None else None)
                        for p in pdf["payload"]
                    ],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(_extract, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode each video row into frame
    timestamps (metadata-driven — no decode needed to *plan* the
    sample). The per-frame decode would chain extract_features."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ms"),
        )
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Image resize target computation (pure metadata math, JVM-side);
    the byte-level resample is the stubbed codec step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents table (test substrate:
    text bytes stand in for image payloads; deterministic)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 1920 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 1080 + 16).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
