"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, with decode / feature-extract / resize / frame-sample
as Arrow-batched ``mapInPandas`` stages.

Compressed-codec decode (jpeg/png/mp3/…) is STUBBED: those libraries
are not in this container, so ``decode_fn=None`` uses a deterministic
fake decoder (shape + checksum derived from the bytes). Two REAL
decoders ship pure-Python — BMP (BITMAPINFOHEADER) and WAV (RIFF fmt
chunk) header parsing — so :func:`probe_media` exercises true
byte-level decode end-to-end; the Spark-side plumbing (schemas,
batching, partitioning, UDF signatures) is identical for every format.
Swap ``decode_fn`` for a PIL/ffmpeg-backed callable in a real
deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media",
    "extract_features",
    "sample_frames",
    "decode_bmp",
    "decode_wav",
    "synthesize_bmp",
    "synthesize_wav",
    "probe_media",
]

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


# ---------------------------------------------------------------------------
# real pure-Python decoders (public container formats, header-level)
# ---------------------------------------------------------------------------


def synthesize_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A minimal valid 24-bit BMP (BITMAPINFOHEADER) with deterministic
    pixel bytes — real payloads for the real decoder's tests."""
    row = ((width * 3 + 3) // 4) * 4  # rows pad to 4 bytes
    pixels = bytes((seed + i) % 256 for i in range(row * height))
    header_size = 14 + 40
    file_size = header_size + len(pixels)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
        + pixels
    )


def synthesize_wav(
    n_samples: int, sample_rate: int = 16000, channels: int = 1, seed: int = 0
) -> bytes:
    """A minimal valid PCM16 WAV with deterministic samples."""
    data = b"".join(
        struct.pack("<h", ((seed + i * 37) % 2048) - 1024)
        for i in range(n_samples * channels)
    )
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_bmp(payload: bytes) -> dict | None:
    """Parse BMP header → {width, height, bpp}; None if not a BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    return {"width": int(width), "height": abs(int(height)), "bpp": int(bpp)}


def decode_wav(payload: bytes) -> dict | None:
    """Parse RIFF/WAVE chunks → {sample_rate, channels, duration_ms};
    None if not a WAV."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    rate = channels = block_align = None
    data_len = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            _, channels, rate, _, block_align, _ = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks pad to even
    if rate is None or data_len is None or not block_align:
        return None
    duration_ms = int(data_len / block_align / rate * 1000)
    return {"sample_rate": int(rate), "channels": int(channels), "duration_ms": duration_ms}


def probe_media(media: DataFrame) -> DataFrame:
    """REAL decode stage: sniff + parse the payload header, overwriting
    the declared width/height/duration_ms metadata with measured values
    (NULL when the container format needs a codec library — the honest
    stub boundary). Arrow-batched; same plumbing as the stubbed path."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("format", T.StringType(), False),  # bmp|wav|unknown
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, durs, rates = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                bmp = decode_bmp(b)
                if bmp is not None:
                    fmts.append("bmp"); ws.append(bmp["width"]); hs.append(bmp["height"])
                    durs.append(None); rates.append(None)
                    continue
                wav = decode_wav(b)
                if wav is not None:
                    fmts.append("wav"); ws.append(None); hs.append(None)
                    durs.append(wav["duration_ms"]); rates.append(wav["sample_rate"])
                    continue
                fmts.append("unknown"); ws.append(None); hs.append(None)
                durs.append(None); rates.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


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
