"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star surface).

The decode kernels (PIL/ffmpeg/librosa) are NOT in this container, so the
byte-level decoding is stubbed behind ``_decode_image_stub`` — clearly
marked, deterministic, swap-in-one-place. Everything Spark-side is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` partitioning, and the
metadata extraction contract.

At 100 TB the rules encoded here: binaries ride in their own column so
column pruning skips them unless asked; feature extraction is
``mapInPandas`` (streaming Arrow batches, constant memory) rather than
``collect``-anything; partition count follows bytes not rows
(``repartition`` before heavy decode so one task ≈ one core-minute).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("content", BinaryType()),     # opaque payload
        StructField("mime", StringType()),
        StructField("meta", StringType()),        # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("phash", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[int, int]:
    """STUB: image decode. Real deployments replace this with
    PIL.Image.open(BytesIO(content)).size — the library is not in this
    container. Deterministic fake: pseudo-dimensions from the byte length
    and first bytes, so tests are stable.
    """
    if content is None or len(content) == 0:
        raise NotImplementedError(
            "image decode stub: empty payload (real impl uses PIL, not installed here)"
        )
    w = 16 + (len(content) % 1024)
    h = 16 + (int.from_bytes(content[:4].ljust(4, b"\0"), "little") % 1024)
    return w, h


def _phash_stub(content: bytes) -> int:
    """STUB for perceptual hash: deterministic 64-bit hash of the payload
    (real impl: DCT-based pHash over the decoded bitmap)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(content, digest_size=8).digest(), "big", signed=False) >> 1


def extract_image_features(df: DataFrame, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow-batched).

    Input: MEDIA_SCHEMA rows with kind='image'. Output:
    IMAGE_FEATURES_SCHEMA. The iterator contract keeps memory bounded to
    one Arrow batch regardless of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                try:
                    w, h = _decode_image_stub(content)
                except NotImplementedError:
                    w, h = -1, -1
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": w,
                        "height": h,
                        "n_bytes": len(content),
                        "phash": _phash_stub(content) if content else 0,
                        # 8-dim deterministic fake embedding from byte stats
                        "features": [
                            float((content[i] if i < len(content) else 0)) / 255.0
                            for i in range(8)
                        ],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    imgs = df.filter(F.col("kind") == "image").select(
        "media_id", "content"
    )
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling contract: one output row per sampled frame.

    STUB decode: frame count is derived from payload length (real impl:
    ffmpeg probe). The Spark-side shape — explode to (media_id, frame_idx,
    frame_bytes) — is the real contract downstream models consume.
    """
    n_frames = (F.length(F.col("content")) / F.lit(1024)).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    vids = df.filter(F.col("kind") == "video")
    return (
        vids.withColumn("frame_idx", F.explode(idx))
        .select(
            "media_id",
            "frame_idx",
            # STUB: slice of payload stands in for the decoded frame
            F.substring(F.col("content"), F.col("frame_idx") * 16 + 1, 16).alias("frame_bytes"),
        )
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Cheap metadata pass that never touches the binary column's bytes
    beyond length — column pruning keeps the payload out of the scan when
    only meta/mime are selected."""
    return df.select(
        "media_id",
        "kind",
        "mime",
        F.length(F.col("content")).alias("n_bytes"),
        F.get_json_object(F.col("meta"), "$.source").alias("meta_source"),
    )
