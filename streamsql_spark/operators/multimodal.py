"""Multimodal (image/audio/video) column handling.

Media lives in DataFrames as opaque ``binary`` columns plus typed
metadata structs — the pattern Spark's own ``binaryFile`` source and
Delta's media tables use.  Decode / feature-extraction run as
Arrow-batched ``mapInPandas`` stages: one Python worker per partition,
columnar transfer, output schema declared up front so Catalyst can
prune/push around the stage.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode kernels are stubbed: ``decode_image_stub`` raises
``NotImplementedError`` when asked for real decoding and otherwise
produces a deterministic fake (byte-statistics features) — the Spark
plumbing (schema, batching, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_parallelism
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("meta", StructType([
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_entropy", DoubleType()),
    StructField("feature", ArrayType(DoubleType())),  # 8-dim fake embedding
])


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so the
    multimodal path is exercisable on the driver's fixtures."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, real_decode: bool = False):
    """Stub decode kernel.  Real decoding requires PIL/cv2 — not in this
    container; a production build swaps this function only."""
    if real_decode:
        raise NotImplementedError(
            "image decoding requires PIL/cv2 which are not installed; "
            "the Spark plumbing around this kernel is real — swap this stub")
    return payload  # passthrough for deterministic feature extraction


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the pipeline streaming-shaped (no collect), and
    the declared output schema lets Catalyst prune downstream.  The
    deterministic fake features are byte statistics + an 8-bin histogram
    'embedding' — stand-ins with the exact shape a CNN/codec stage has.
    """

    def kernel(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                # byte statistics vectorize: the per-payload work is numpy
                # (a per-byte Python loop would be the row-at-a-time slow
                # path this stage exists to avoid)
                arr = np.frombuffer(decode_image_stub(payload) or b"",
                                    dtype=np.uint8)
                n = int(arr.size)
                counts = np.bincount(arr >> 5, minlength=8) if n else \
                    np.zeros(8, dtype=np.int64)
                mean = float(arr.sum()) / n if n else 0.0
                nz = counts[counts > 0]
                if nz.size:
                    p = nz / n
                    ent = float(-(p * np.log2(p)).sum())
                else:
                    ent = 0.0
                out_rows.append({
                    "media_id": media_id,
                    "kind": kind,
                    "n_bytes": n,
                    "byte_mean": round(mean, 6),
                    "byte_entropy": round(ent, 6),
                    "feature": [round(c / n, 6) if n else 0.0
                                for c in counts.tolist()],
                })
            yield pd.DataFrame(out_rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return ensure_parallelism(media).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage stub: real implementation decodes+resizes in the
    kernel; here the metadata is updated and payload passed through so
    pipeline wiring (schema evolution, partition preservation) is real."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.concat(F.col("meta.source"), F.lit(f"|resized:{width}x{height}"))
             .alias("source"),
        ))


def frame_sample_stub(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling stub: emits frame-index rows per video via
    posexplode over a computed frame count (deterministic: bytes/1k)."""
    return (media.where(F.col("kind") == "video")
            .withColumn("n_frames", (F.col("meta.n_bytes") / 1024 + 1).cast("int"))
            .select("media_id",
                    F.posexplode(F.expr(
                        f"filter(sequence(0, n_frames - 1), i -> i % {every_n} = 0)"))
                    .alias("frame_pos", "frame_index"),
                    "payload"))
