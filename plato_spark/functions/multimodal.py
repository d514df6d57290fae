"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque BINARY columns with typed metadata; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas
UDFs over mapInPandas. The actual codec step is STUBBED in this sandbox
(no PIL/ffmpeg/torchvision baked in): ``decoder='fake'`` produces a
deterministic pseudo-decode derived from the bytes (so the Spark-side
plumbing — schema, partitioning, UDF signatures, batch shapes — is real and
tested), while ``decoder='real'`` raises NotImplementedError at the exact
point a production deployment would call PIL.Image.open / libav.

Scale notes: binary payloads never pass through Python row-at-a-time — each
mapInPandas batch moves as one Arrow RecordBatch; feature vectors come back
as array<float>. Partition sizing should bound batch bytes
(spark.sql.execution.arrow.maxRecordsPerBatch, set in session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, "
    "width int, height int, channels int, sample_rate int, duration_ms int"
)

FEATURE_DIM = 64


def synth_media(spark: SparkSession, n: int = 100, kinds=("image", "audio", "video")) -> DataFrame:
    """Deterministic fake media table (binary blobs derived from md5)."""
    rows = []
    for i in range(n):
        kind = kinds[i % len(kinds)]
        blob = b"".join(
            hashlib.md5(f"media-{i}-{j}".encode()).digest() for j in range(8)
        )
        if kind == "image":
            rows.append((i, kind, blob, 32 + i % 64, 32 + (i * 7) % 64, 3, None, None))
        elif kind == "audio":
            rows.append((i, kind, blob, None, None, 1, 16000, 1000 + i * 10))
        else:
            rows.append((i, kind, blob, 64, 64, 3, None, 2000 + i * 25))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(data: bytes, out_len: int) -> np.ndarray:
    """Deterministic pseudo-decode: stretch the digest stream to out_len
    uint8 samples. Stands in for pixel/PCM decoding."""
    if len(data) == 0:
        return np.zeros(out_len, dtype=np.uint8)
    reps = (out_len + len(data) - 1) // len(data)
    return np.frombuffer((data * reps)[:out_len], dtype=np.uint8)


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """(media_id, kind, samples: array<int>) — decoded sample stream.

    decoder='real' marks where PIL/libav would run (NotImplementedError
    here: the codecs are not in this container).
    """
    if decoder == "real":
        raise NotImplementedError(
            "real decode needs PIL/ffmpeg, not available in this sandbox; "
            "use decoder='fake' for plumbing tests"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_len = np.where(
                pdf["kind"] == "image",
                (pdf["width"].fillna(8) * pdf["height"].fillna(8)).astype(int),
                256,
            )
            samples = [
                _fake_decode(bytes(d), int(n)).astype(np.int32)
                for d, n in zip(pdf["data"], out_len)
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "samples": samples}
            )

    return df.mapInPandas(run, schema="media_id long, kind string, samples array<int>")


def extract_features(df: DataFrame, dim: int = FEATURE_DIM, decoder: str = "fake") -> DataFrame:
    """(media_id, features: array<float>) — fixed-dim embedding per media row.

    Fake path: histogram-of-samples features (deterministic); real path
    would run a vision/audio encoder over the decoded batch.
    """
    if decoder == "real":
        raise NotImplementedError("real feature extraction needs a model runtime")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for d in pdf["data"]:
                s = _fake_decode(bytes(d), 1024).astype(np.float64)
                hist, _ = np.histogram(s, bins=dim, range=(0, 256))
                v = hist.astype(np.float64)
                norm = np.linalg.norm(v)
                feats.append((v / norm if norm > 0 else v).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(run, schema="media_id long, features array<float>")


def resize_images(df: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """(media_id, data: binary, width, height) — resized image payloads.

    Fake path: nearest-neighbor over the pseudo-decoded stream, re-encoded
    as raw bytes; real path = PIL resize (NotImplementedError here).
    """
    if decoder == "real":
        raise NotImplementedError("real resize needs PIL")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            blobs = []
            for d, w0, h0 in zip(pdf["data"], pdf["width"], pdf["height"]):
                src = _fake_decode(bytes(d), int(w0) * int(h0)).reshape(int(h0), int(w0))
                yi = (np.arange(height) * int(h0) // height)
                xi = (np.arange(width) * int(w0) // width)
                blobs.append(src[np.ix_(yi, xi)].astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "data": blobs,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                }
            )

    return df.mapInPandas(run, schema="media_id long, data binary, width int, height int")


def sample_frames(df: DataFrame, every_ms: int = 500, decoder: str = "fake") -> DataFrame:
    """(media_id, frame_idx, ts_ms) — frame-sampling plan for video rows.

    Fake path emits the sampling schedule (what a real ffmpeg seek loop
    would execute); real decode is NotImplementedError as above.
    """
    if decoder == "real":
        raise NotImplementedError("real frame sampling needs ffmpeg/libav")
    vids = df.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
        ).alias("frame_idx", "step"),
    ).select(
        "media_id", "frame_idx", (F.col("step") * every_ms).cast("long").alias("ts_ms")
    )
