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
import struct
import zlib
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


# ---------------------------------------------------------------------------
# Real container formats: dependency-free encode + header parse.
#
# The pixel/PCM *decode* step still needs PIL/libav (stubbed below), but the
# container headers are plain struct layouts — PNG IHDR, BMP BITMAPINFOHEADER,
# JPEG SOF0, GIF logical screen descriptor, WAV RIFF/fmt — so dimension /
# channel / sample-rate extraction is implementable byte-for-byte from the
# public specs. encode_media_bytes and parse_media_header are written
# independently (offsets from the spec, not shared constants) so an oracle
# that predicts the fields arithmetically genuinely checks both.
# ---------------------------------------------------------------------------

MEDIA_FORMATS = ("png", "bmp", "jpeg", "gif", "wav")


def encode_media_bytes(
    fmt: str,
    width: int = 0,
    height: int = 0,
    channels: int = 3,
    sample_rate: int = 0,
    n_samples: int = 0,
    seed: bytes = b"",
) -> bytes:
    """Build a minimal-but-valid file of the given format.

    Image formats carry a deterministic (tiny) payload derived from `seed`;
    WAV carries `n_samples` 16-bit frames. Headers are spec-complete for the
    fields parse_media_header reads.
    """
    pay = (hashlib.md5(seed).digest() * 4)[:48]
    if fmt == "png":
        ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        out = b"\x89PNG\r\n\x1a\n"
        out += struct.pack(">I", 13) + chunk + struct.pack(">I", zlib.crc32(chunk))
        idat = b"IDAT" + pay
        out += struct.pack(">I", len(pay)) + idat + struct.pack(">I", zlib.crc32(idat))
        out += struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
        return out
    if fmt == "bmp":
        row = (width * 3 + 3) // 4 * 4
        img_size = row * height
        header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
        return header + dib + (pay * ((img_size // len(pay)) + 1))[:img_size]
    if fmt == "jpeg":
        out = b"\xff\xd8"  # SOI
        jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
        # SOF0: len, precision, height, width, ncomp, then 3 bytes/component
        ncomp = channels
        sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
        for c in range(ncomp):
            sof += struct.pack(">BBB", c + 1, 0x11, 0)
        out += b"\xff\xc0" + sof
        return out + b"\xff\xd9"  # EOI
    if fmt == "gif":
        out = b"GIF89a" + struct.pack("<HH", width, height) + b"\x70\x00\x00"
        return out + b"\x3b"
    if fmt == "wav":
        data = (pay * ((n_samples * 2 * channels // len(pay)) + 1))[: n_samples * 2 * channels]
        fmt_chunk = struct.pack(
            "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
        )
        out = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        out += b"fmt " + struct.pack("<I", 16) + fmt_chunk
        out += b"data" + struct.pack("<I", len(data)) + data
        return out
    raise ValueError(f"unknown format {fmt!r}")


def parse_media_header_bytes(data: bytes) -> tuple:
    """(format, width, height, channels, sample_rate, bit_depth) from raw
    file bytes, pure struct parsing per the public specs. Unknown/short
    payloads return ('unknown', None*5). Independent of encode_media_bytes.
    """
    none5 = (None, None, None, None, None)
    if len(data) < 12:
        return ("unknown",) + none5
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        # first chunk must be IHDR: length(4) type(4) W(4) H(4) depth colortype
        if data[12:16] != b"IHDR" or len(data) < 26:
            return ("unknown",) + none5
        w, h = struct.unpack(">II", data[16:24])
        depth, color_type = data[24], data[25]
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        return ("png", w, h, nch, None, depth)
    if data[:2] == b"BM" and len(data) >= 30:
        w, h = struct.unpack("<ii", data[18:26])
        bpp = struct.unpack("<H", data[28:30])[0]
        return ("bmp", w, abs(h), bpp // 8, None, 8)
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                prec = data[i + 4]
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                ncomp = data[i + 9]
                return ("jpeg", w, h, ncomp, None, prec)
            i += 2 + seg_len
        return ("unknown",) + none5
    if data[:6] in (b"GIF89a", b"GIF87a"):
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h, 1, None, 8)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        i = 12
        while i + 8 <= len(data):
            cid = data[i : i + 4]
            clen = struct.unpack("<I", data[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(data):
                nch, rate = struct.unpack("<HI", data[i + 10 : i + 16])
                bits = struct.unpack("<H", data[i + 22 : i + 24])[0]
                return ("wav", None, None, nch, rate, bits)
            i += 8 + clen + (clen & 1)
        return ("unknown",) + none5
    return ("unknown",) + none5


_PARSE_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "channels int, sample_rate int, bit_depth int"
)


def parse_media_headers(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Arrow-batched header parse: (media_id, format, width, height,
    channels, sample_rate, bit_depth). The binary column moves as one
    Arrow RecordBatch per partition split; per-row work is O(header bytes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header_bytes(bytes(d)) for d in pdf[data_col]]
            cols = list(zip(*parsed)) if parsed else [[]] * 6
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": cols[0],
                    "width": pd.array(cols[1], dtype="Int32"),
                    "height": pd.array(cols[2], dtype="Int32"),
                    "channels": pd.array(cols[3], dtype="Int32"),
                    "sample_rate": pd.array(cols[4], dtype="Int32"),
                    "bit_depth": pd.array(cols[5], dtype="Int32"),
                }
            )

    return df.select(id_col, data_col).mapInPandas(run, schema=_PARSE_SCHEMA)


def docs_to_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents corpus:
    each doc becomes one file whose format and parameters are arithmetic
    in (doc_id, n_chars), then encoded as real container bytes. Mirrors
    the reference's corpus→typed-column ingestion (plato reads typed
    vertex payloads; here the payload is a media blob)."""
    params = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(f) for f in MEDIA_FORMATS]),
                     (F.col("doc_id") % 5 + 1).cast("int")).alias("format"),
        (F.lit(16) + F.col("n_chars") % 241).cast("int").alias("p_width"),
        (F.lit(16) + (F.col("doc_id") * 7) % 193).cast("int").alias("p_height"),
        (F.lit(1) + F.col("doc_id") % 2).cast("int").alias("p_wav_channels"),
        (F.lit(8000) + (F.col("doc_id") % 4) * 4000).cast("int").alias("p_rate"),
        (F.lit(50) + F.col("n_chars") % 200).cast("int").alias("p_samples"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for r in pdf.itertuples(index=False):
                if r.format == "wav":
                    blobs.append(
                        encode_media_bytes(
                            "wav",
                            channels=int(r.p_wav_channels),
                            sample_rate=int(r.p_rate),
                            n_samples=int(r.p_samples),
                            seed=str(r.media_id).encode(),
                        )
                    )
                else:
                    blobs.append(
                        encode_media_bytes(
                            r.format,
                            width=int(r.p_width),
                            height=int(r.p_height),
                            channels=3,
                            seed=str(r.media_id).encode(),
                        )
                    )
            yield pd.DataFrame({"media_id": pdf["media_id"], "data": blobs})

    return params.mapInPandas(run, schema="media_id long, data binary")


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
