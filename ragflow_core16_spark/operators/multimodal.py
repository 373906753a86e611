"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media payloads next to text; the
Spark-side plumbing is what matters at scale — schema, partitioning, Arrow
batch shape, UDF signatures.  Per the build contract the codec step itself
is STUBBED: no image/audio libraries exist in this container, so

  * ``decode_media``      parses the deterministic SYNTH container header
    (our fixture format) and raises ``NotImplementedError`` for real
    formats (PNG/JPEG/WAV/MP4) — the marked integration point where PIL /
    torchaudio / ffmpeg decoders slot in per-executor;
  * ``media_features``    numpy byte-histogram embedding (deterministic
    fake feature extractor with the real Arrow-batched plumbing);
  * ``frame_sample``      every-k-th fixed-size block from "video"
    payloads — the explode-shaped frame sampler.

Fixture payloads: ``SYNTH:<kind>:<w>x<h>x<c>:`` header + deterministic
bytes derived from the media id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

from ..session import ordered as _ordered

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("payload", BinaryType(), False),
    StructField("meta_w", IntegerType(), True),
    StructField("meta_h", IntegerType(), True),
    StructField("meta_c", IntegerType(), True),
])

_MAGIC = b"SYNTH:"
FRAME_BYTES = 256


def synth_payload(media_id: int, kind: str) -> bytes:
    """Deterministic fake media container (seeded by media_id)."""
    rng = np.random.RandomState(media_id % (2**31))
    w, h, c = int(rng.randint(8, 64)), int(rng.randint(8, 64)), 3
    n = w * h if kind == "image" else FRAME_BYTES * int(rng.randint(4, 12))
    body = rng.randint(0, 256, size=n, dtype=np.int64).astype(np.uint8).tobytes()
    return _MAGIC + f"{kind}:{w}x{h}x{c}:".encode() + body


def decode_media(payload: bytes) -> dict:
    """Header decode. Real codecs are NOT shipped in this environment —
    that branch is the documented stub."""
    if payload[: len(_MAGIC)] == _MAGIC:
        head, body = payload.split(b":", 2)[-1], None
        parts = payload.split(b":", 3)
        kind = parts[1].decode()
        w, h, c = (int(x) for x in parts[2].decode().split("x"))
        return {"kind": kind, "w": w, "h": h, "c": c,
                "body": parts[3]}
    raise NotImplementedError(
        "real media decode (PNG/JPEG/WAV/MP4) requires codec libraries not "
        "present in this container; plug a per-executor decoder here")


def media_df(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic synthetic media table."""
    base = spark.range(n)

    def gen(batches):
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = synth_payload(i, kind)
                meta = decode_media(payload)
                rows.append((i, kind, payload, meta["w"], meta["h"], meta["c"]))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("features", ArrayType(FloatType()), False),
])


def media_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction: byte histogram (normalized) —
    deterministic stand-in with the production plumbing shape."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                body = decode_media(bytes(payload))["body"]
                arr = np.frombuffer(body, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                feat = (hist / max(len(arr), 1)).astype(np.float32)
                rows.append((int(mid), kind, len(body),
                             [float(x) for x in feat]))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA])

    return media.mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_no", IntegerType(), False),
    StructField("frame", BinaryType(), False),
])


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampler: fixed-size blocks, every k-th one (explode
    shape: one media row → many frame rows)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video":
                    continue
                body = decode_media(bytes(payload))["body"]
                n_frames = len(body) // FRAME_BYTES
                for f_no in range(0, n_frames, every_k):
                    rows.append((int(mid), f_no,
                                 body[f_no * FRAME_BYTES:(f_no + 1) * FRAME_BYTES]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA])

    return media.mapInPandas(run, FRAMES_SCHEMA)


def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_features(media_df(spark, 60))
    return (m.select("media_id", "kind", "n_bytes",
                     F.round(F.element_at("features", 1), 4).alias("f0"),
                     F.round(F.element_at("features", 16), 4).alias("f15"))
            .transform(_ordered("media_id")))


def media_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = frame_sample(media_df(spark, 60))
    return (f.groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 F.min("frame_no").alias("first_frame"),
                 F.max("frame_no").alias("last_frame"))
            .transform(_ordered("media_id")))


QUERIES = {
    "media_features": (media_features_q, None),
    "media_frames": (media_frames_q, None),
}
