"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, with decode / feature-extract / resize / frame-sample
as Arrow-batched ``mapInPandas`` stages.

The decode step is STUBBED: the image/audio codec libraries are not in
this container, so ``decode_fn=None`` uses a deterministic fake decoder
(shape + checksum derived from the bytes) — the Spark-side plumbing
(schemas, batching, partitioning, UDF signatures) is real and tested.
Swap ``decode_fn`` for a PIL/ffmpeg-backed callable in a real
deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

__all__ = ["MEDIA_SCHEMA", "attach_media", "extract_features", "sample_frames"]

#: canonical media-asset schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake decode: a feature vector derived from the md5
    digest of the payload. Replace with a real decoder in deployment."""
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def attach_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Derive a synthetic media table from a documents table: payload =
    utf-8 bytes of the text wrapped in a fake container header (stands
    in for the WARC-embedded asset)."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode(F.concat(F.lit("FAKEIMG0"), F.col("text")), "utf-8").alias("payload"),
        F.lit("application/x-fake").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""
    decode = decode_fn or (lambda b: _fake_decode(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sums, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                feats.append(decode(b).tolist())
                sums.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "checksum": sums,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame sampling plumbing (video path): emits ≤ max_frames byte
    slices per asset. With a real decoder these would be decoded frames;
    the slicing/batch shape is what the pipeline tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, FRAMES_SCHEMA)
