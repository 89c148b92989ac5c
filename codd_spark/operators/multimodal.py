"""Multimodal columns: images/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio codecs, so the decode kernels are STUBBED:
``decode=\"fake\"`` produces deterministic metadata derived from the bytes
(plumbing — schema, batching, partitioning — is real and tested);
``decode=\"real\"`` raises NotImplementedError where PIL/ffmpeg would be
called. Swapping in a real kernel changes only the inner function.

Scale notes: binary payloads ride in parquet binary columns; keep
``spark.sql.files.maxPartitionBytes`` sized so a partition of payloads fits
executor memory, and process with mapInPandas (one Arrow batch at a time —
bounded memory) rather than collecting arrays of rows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png | jpeg | wav | mp4 | ...
        StructField("payload", BinaryType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sha1", StringType()),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from a content hash."""
    h = hashlib.sha1(payload or b"").digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024


def decode_image_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """media rows -> per-image feature rows. Arrow-batched; the pandas
    function sees bounded batches regardless of partition size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv (not in this container); "
                    "use decode='fake' for plumbing tests"
                )
            dims = [_fake_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sha1": [hashlib.sha1(p or b"").hexdigest() for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """Video -> sampled frame rows (media_id, frame_idx, frame_payload).
    Fake decode emits a deterministic number of frames from the content
    hash; real decode would call ffmpeg per batch."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_sha1", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame extraction requires ffmpeg")
            out_ids, out_idx, out_sha = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                n_frames = 1 + hashlib.sha1(payload).digest()[2] % 50
                for i in range(0, n_frames, every_n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_sha.append(hashlib.sha1(payload + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({"media_id": out_ids, "frame_idx": out_idx, "frame_sha1": out_sha})

    return df.mapInPandas(run, schema=schema)


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for plumbing tests (payload bytes are
    a function of media_id)."""
    rows = [
        (i, kind, "png" if kind == "image" else "mp4", hashlib.sha256(str(i).encode()).digest() * 4)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
