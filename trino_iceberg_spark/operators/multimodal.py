"""Multimodal column plumbing (SURVEY.md §2.D).

Images / audio / video ride through the engine as opaque ``binary`` columns
with a typed metadata struct. The Spark-side machinery — schema, Arrow
batch shape, ``mapInPandas`` partition flow, partition sizing — is real and
tested; the actual codec step is stubbed (decode libraries are not in this
container) behind ``DecodeUnavailable`` or a deterministic fake, clearly
marked.

At 100 TB: binary payloads dominate row size, so the operators
``repartition`` by byte budget, never collect, and push metadata-only
predicates (width/height/codec) down to parquet before any payload reaches
Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "DecodeUnavailable",
    "attach_media",
    "media_stats",
    "decode_image_stub",
    "extract_features_stub",
    "sample_frames_stub",
]

#: Canonical multimodal column pair: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), False),  # image|audio|video
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_bytes", T.LongType(), False),
                ]
            ),
            False,
        ),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by stubbed codec steps: the Spark plumbing is complete; drop a
    real decoder (PIL/librosa/pyav) into the marked function to activate."""


def attach_media(
    df: DataFrame, payload_col: str, media_type: str = "image", codec: str = "synthetic"
) -> DataFrame:
    """Wrap an existing binary column into the canonical media struct.

    Metadata is computed JVM-side (octet_length); deterministic fake
    width/height derive from the payload hash so downstream operators have
    realistic varying values to filter on."""
    payload = F.col(payload_col)
    h = F.abs(F.xxhash64(payload))
    return df.withColumn(
        "media",
        F.struct(
            payload.alias("payload"),
            F.struct(
                F.lit(media_type).alias("media_type"),
                F.lit(codec).alias("codec"),
                (h % 1920 + 16).cast("int").alias("width"),
                (F.abs(F.xxhash64(payload, F.lit(1))) % 1080 + 16).cast("int").alias("height"),
                (h % 600000).cast("long").alias("duration_ms"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ).alias("meta"),
        ),
    )


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Metadata-only aggregate — never touches payloads, so column pruning
    keeps the binary out of the scan entirely."""
    m = F.col(media_col)
    return df.groupBy(m["meta"]["media_type"].alias("media_type")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(m["meta"]["n_bytes"]).cast("long").alias("total_bytes"),
        F.min(m["meta"]["width"]).alias("min_width"),
        F.max(m["meta"]["height"]).alias("max_height"),
    )


def _fake_pixels(payload: bytes, out_w: int, out_h: int) -> list[int]:
    # Deterministic stand-in for a real decode+resize: byte histogram folded
    # to out_w*out_h "pixels". Replace with PIL decode in production.
    if not payload:
        return [0] * (out_w * out_h)
    n = out_w * out_h
    return [payload[i % len(payload)] for i in range(n)]


def decode_image_stub(
    df: DataFrame, media_col: str = "media", out_w: int = 8, out_h: int = 8, fake: bool = True
) -> DataFrame:
    """Decode+resize via ``mapInPandas`` — Arrow-batched, partition-parallel.

    The batch shape (payload bytes in, fixed-size pixel array out) is the
    real contract a PIL/torchvision decoder plugs into; ``fake=True`` uses
    the deterministic stand-in, ``fake=False`` raises DecodeUnavailable at
    the first batch (STUB — no image libs in this container)."""
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("pixels", T.ArrayType(T.IntegerType()), False)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise DecodeUnavailable(
                    "image decode requires PIL/opencv — not in this container; "
                    "swap _fake_pixels for a real decoder"
                )
            media = pdf[media_col]
            pdf = pdf.copy()
            pdf["pixels"] = [
                _fake_pixels(m["payload"], out_w, out_h) if m is not None else None
                for m in media
            ]
            yield pdf

    return df.mapInPandas(decode, out_schema)


def extract_features_stub(df: DataFrame, media_col: str = "media", dim: int = 16) -> DataFrame:
    """Feature extraction (embedding) stub: deterministic hash-fold of the
    payload to a ``dim``-float vector via mapInPandas. Swap the body for a
    real model forward pass; the schema/batching/partitioning stays."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), False)]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                payload = m["payload"] if m is not None else b""
                acc = [0.0] * dim
                for i, byte in enumerate(payload[: 4096]):
                    acc[i % dim] += byte / 255.0
                feats.append(acc)
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(extract, out_schema)


def sample_frames_stub(
    df: DataFrame, media_col: str = "media", every_ms: int = 1000
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    offset (explode of the timestamp grid, JVM-side) with a stubbed frame
    payload slice. The explode-then-decode shape is the real pipeline; only
    the codec is fake."""
    m = F.col(media_col)
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(m["meta"]["duration_ms"] - 1, F.lit(0).cast("long")),
        F.lit(every_ms).cast("long"),
    )
    return (
        df.withColumn("frame_ms", F.explode(frames))
        .withColumn(
            "frame_payload",
            F.substring(
                m["payload"], (F.col("frame_ms") % 32 + 1).cast("int"), 16
            ),  # STUB: real impl seeks the container format
        )
        .select("*")
    )
