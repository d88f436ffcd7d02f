"""Multimodal column plumbing (BASELINE.json north star): image/audio/video
as opaque ``binary`` payloads + typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED — image/audio libraries are not in this
container — but everything Spark-side is real and tested: the schema
contract, the pandas-UDF signatures and batch shapes, partition balancing
for skewed payload sizes, and the deterministic fake feature extractor
(features derived from the payload's md5 bytes) that stands in for a real
model so downstream similarity/dedup operators can be exercised end to end.

Real decoders plug in by replacing ``_decode_stub`` — the surrounding plan
(repartition -> mapInPandas -> typed struct/array outputs) is exactly what
a production pipeline runs; only the per-batch Python body changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),     # image | audio | video
        StructField("format", StringType()),          # png | wav | mp4 | ...
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),          # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),    # audio/video
    ]
)


def ingest_binary(df: DataFrame, id_col: str, payload_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap raw binary payloads in the typed media schema (metadata that
    needs decoding stays NULL until the decode stage fills it)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.length(F.col(payload_col).cast("binary")).cast("long").alias("byte_len"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def balance_partitions(df: DataFrame, target_partition_bytes: int = 64 << 20) -> DataFrame:
    """Payload sizes are skewed (a 4K video next to an icon); rebalance by
    total bytes so decode batches are even. One count+sum pass then a
    round-robin repartition — at scale this is what keeps a 1000-executor
    decode stage from convoying behind one fat partition."""
    row = df.agg(F.sum("byte_len").alias("total")).first()
    total = row["total"] or 0
    n_parts = max(1, int(total / target_partition_bytes))
    return df.repartition(n_parts)


def parse_media_header(payload: bytes) -> dict | None:
    """REAL byte-level header decode for PNG / GIF / BMP / WAV — pure
    Python, no imaging libraries. Returns width/height (images) or
    duration_ms (audio), or None when the payload matches no known magic.

    Formats are sniffed from the bytes, not trusted from the ``format``
    column — a mislabeled payload decodes by what it actually is.
    """
    b = payload or b""
    # PNG: 8-byte signature, IHDR chunk fixed at offset 8 (length + type),
    # width/height big-endian at 16/20
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return {
            "width": int.from_bytes(b[16:20], "big"),
            "height": int.from_bytes(b[20:24], "big"),
            "duration_ms": None,
        }
    # GIF87a / GIF89a: logical screen size little-endian at 6/8
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "width": int.from_bytes(b[6:8], "little"),
            "height": int.from_bytes(b[8:10], "little"),
            "duration_ms": None,
        }
    # BMP: BITMAPINFOHEADER width/height little-endian signed at 18/22
    # (negative height = top-down rows)
    if len(b) >= 26 and b[:2] == b"BM":
        return {
            "width": int.from_bytes(b[18:22], "little", signed=True),
            "height": abs(int.from_bytes(b[22:26], "little", signed=True)),
            "duration_ms": None,
        }
    # JPEG: SOI then marker segments; dimensions live in the first SOF
    # frame header (C0-CF except C4/C8/CC): precision(1), height(2 BE),
    # width(2 BE) after the segment length
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        off = 2
        while off + 4 <= len(b) and b[off] == 0xFF:
            marker = b[off + 1]
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                off += 2  # standalone markers carry no segment
                continue
            seg_len = int.from_bytes(b[off + 2 : off + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if off + 9 <= len(b):
                    return {
                        "width": int.from_bytes(b[off + 7 : off + 9], "big"),
                        "height": int.from_bytes(b[off + 5 : off + 7], "big"),
                        "duration_ms": None,
                    }
                break
            off += 2 + seg_len
    # WAV: RIFF container — walk chunks for fmt (byte rate) and data (size)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        byte_rate = data_size = None
        off = 12
        while off + 8 <= len(b):
            cid = b[off : off + 4]
            csize = int.from_bytes(b[off + 4 : off + 8], "little")
            if cid == b"fmt " and off + 20 <= len(b):
                byte_rate = int.from_bytes(b[off + 16 : off + 20], "little")
            elif cid == b"data":
                data_size = csize
            off += 8 + csize + (csize & 1)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            return {
                "width": None,
                "height": None,
                "duration_ms": round(data_size * 1000 / byte_rate),
            }
    return None


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode for formats without a real parser here
    (jpeg, mp4, ...): metadata derived from the payload hash. A production
    build swaps this for PIL/ffmpeg inside the same batch loop."""
    h = hashlib.md5(payload or b"").digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "duration_ms": int.from_bytes(h[2:4], "big") if media_type != "image" else None,
    }


def decode_metadata(df: DataFrame) -> DataFrame:
    """Fill width/height/duration in one Arrow-batched pass, schema
    unchanged: REAL header parsing for PNG/GIF/BMP/WAV payloads
    (``parse_media_header``), deterministic stub for everything else."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                parse_media_header(p) or _decode_stub(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            pdf = pdf.copy()
            pdf["width"] = pd.array([m["width"] for m in metas], dtype="Int32")
            pdf["height"] = pd.array([m["height"] for m in metas], dtype="Int32")
            pdf["duration_ms"] = pd.array(
                [m["duration_ms"] for m in metas], dtype="Int32"
            )
            yield pdf

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


_FEATURE_DIM = 32

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = _FEATURE_DIM) -> DataFrame:
    """Deterministic fake feature extractor: ``dim`` floats in [-1, 1)
    expanded from the payload md5 — the stand-in for a real embedding
    model. Batch shape and output schema match what a GPU-backed
    extractor would produce, so similarity search composes on top."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                seed = int.from_bytes(hashlib.md5(p or b"").digest()[:8], "big")
                rng = np.random.default_rng(seed)
                feats.append(rng.uniform(-1, 1, dim).astype("float32"))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stage plumbing: scale width/height so the longer side equals
    ``max_side`` (aspect preserved, already-smaller media untouched).

    The pixel transform is stubbed (a real implementation re-encodes the
    payload via PIL/ffmpeg inside this same batch loop); the metadata
    arithmetic, batch shape, and schema contract are real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            w = pdf["width"].astype("float64")
            h = pdf["height"].astype("float64")
            scale = (max_side / np.maximum(w, h)).clip(upper=1.0)
            pdf["width"] = pd.array(np.round(w * scale), dtype="Int32")
            pdf["height"] = pd.array(np.round(h * scale), dtype="Int32")
            # real impl: pdf["payload"] = [reencode(p, s) for p, s in ...]
            yield pdf

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (real decoder would attach the frame bytes). Pure Spark-side:
    explode over the sampled offsets computed from duration_ms."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("media_type").isin("video", "audio"))
        .select("media_id", F.explode(offsets).alias("frame_offset_ms"))
    )
