"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media payloads next to text; the
Spark-side plumbing is what matters at scale — schema, partitioning, Arrow
batch shape, UDF signatures.  PNG and WAV are decoded FOR REAL
(``media/codecs.py`` — zlib+struct and the stdlib ``wave`` module need no
external codec libraries), baseline JPEG is implemented from the
published spec math (``media/jpeg.py``: DCT + Annex K Huffman), and video
payloads are REAL MP4 / ISO-BMFF containers muxed and demuxed natively
(``media/mp4.py`` — box walk + stts/stsc/stsz/stco sample-table math).
Frame sampling reads every k-th sample straight off the demuxed offsets,
which is exactly what a 100 TB frame-sampling job wants: slice sample
byte ranges out of the container WITHOUT decoding pixels.  Only
pixel-level decode of compressed video codecs (H.264 &c) remains the
documented per-executor decoder slot.

Synthetic content is CLOSED-FORM in ``media_id`` (pixel i of image k is
``(k + 3·i) mod 256`` …), so the feature queries have exact DuckDB
oracles: the oracle re-derives width/height/sample counts and the integer
content sums relationally and the driver hash-compares them.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..media.codecs import (PNG_MAGIC, decode_png, decode_wav, encode_png,
                            encode_wav)
from ..media.mp4 import demux_mp4, encode_mp4
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
WAV_RATE = 8000


def _image_dims(media_id: int) -> tuple[int, int]:
    return 8 + (media_id * 7) % 56, 8 + (media_id * 11) % 56


def _audio_len(media_id: int) -> int:
    return 64 + (media_id * 13) % 192


def _video_frames(media_id: int) -> int:
    return 4 + media_id % 8


def synth_payload(media_id: int, kind: str) -> bytes:
    """Deterministic media payload: REAL PNG for images, REAL WAV for
    audio, REAL MP4 container (raw frame samples) for video."""
    if kind == "image":
        w, h = _image_dims(media_id)
        pixels = bytes((media_id + 3 * i) % 256 for i in range(w * h))
        return encode_png(pixels, w, h, channels=1)
    if kind == "audio":
        n = _audio_len(media_id)
        samples = [((media_id * 31 + i * 17) % 2048) - 1024 for i in range(n)]
        return encode_wav(samples, rate=WAV_RATE)
    nf = _video_frames(media_id)
    body = bytes((media_id + i) % 256 for i in range(nf * FRAME_BYTES))
    frames = [body[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
              for f in range(nf)]
    # samples_per_chunk=3 exercises multi-chunk stsc/stco expansion on
    # every demux, not just in unit tests
    return encode_mp4(frames, width=16, height=16, samples_per_chunk=3)


def decode_media(payload: bytes) -> dict:
    """Container-sniffing decode: PNG, WAV, baseline JPEG and MP4 are all
    native decodes (``media/``); the legacy SYNTH header is still
    recognised for old fixtures.  For video, ``w`` is the uniform sample
    size in bytes and ``h`` the sample count, and ``body`` is the
    concatenation of the demuxed samples — frame-level features without
    pixel decode."""
    if payload[:8] == PNG_MAGIC:
        img = decode_png(payload)
        return {"kind": "image", "w": img["w"], "h": img["h"],
                "c": img["channels"], "body": img["pixels"]}
    if payload[:4] == b"RIFF":
        au = decode_wav(payload)
        return {"kind": "audio", "w": au["rate"], "h": au["n_samples"],
                "c": au["channels"], "body": au["samples"]}
    if payload[:2] == b"\xff\xd8":
        from ..media.jpeg import decode_jpeg
        img = decode_jpeg(payload)
        return {"kind": "image", "w": img["w"], "h": img["h"], "c": 1,
                "body": img["pixels"]}
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        info = demux_mp4(payload)
        samples = [payload[o:o + s] for o, s, _ in info["samples"]]
        sizes = {len(s) for s in samples}
        w = sizes.pop() if len(sizes) == 1 else 0
        return {"kind": "video", "w": w, "h": info["n_samples"], "c": 1,
                "body": b"".join(samples)}
    if payload[: len(_MAGIC)] == _MAGIC:
        parts = payload.split(b":", 3)
        w, h, c = (int(x) for x in parts[2].decode().split("x"))
        return {"kind": parts[1].decode(), "w": w, "h": h, "c": c,
                "body": parts[3]}
    raise NotImplementedError(
        "unknown media container; PNG, WAV, baseline JPEG and MP4 demux "
        "are native (media/) — plug a per-executor decoder here for other "
        "formats and for pixel decode of compressed video codecs")


def media_df(spark: SparkSession, n: int = 60) -> DataFrame:
    """Deterministic synthetic media table (real PNG/WAV payloads)."""
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
                rows.append((i, kind, payload, meta["w"], meta["h"],
                             meta["c"]))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("content_sum", LongType(), False),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_no", IntegerType(), False),
    StructField("frame", BinaryType(), False),
])


def media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over DECODED content:

      * image: (w, h), pixel-value sum over the real PNG decode;
      * audio: (sample rate, sample count), Σ|amplitude| over the real
        WAV decode;
      * video: (frame bytes, frame count), byte sum over the container.

    Integer content sums keep the check float-free and exact."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                m = decode_media(bytes(payload))
                body = m["body"]
                if kind == "audio":
                    csum = sum(abs(s) for s in body)
                    n_bytes = 2 * len(body)
                else:
                    csum = sum(body)
                    n_bytes = len(body)
                rows.append((int(mid), kind, n_bytes, m["w"], m["h"],
                             int(csum)))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA])

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampler: every k-th sample (explode shape: one media
    row → many frame rows).  MP4 payloads are sliced at the DEMUXED
    per-sample byte offsets — correct for mixed sample sizes and
    pixel-decode-free; the legacy SYNTH container falls back to
    fixed-size blocks."""

    def _frames(payload: bytes) -> list[bytes]:
        if len(payload) >= 8 and payload[4:8] == b"ftyp":
            info = demux_mp4(payload)
            return [payload[o:o + s] for o, s, _ in info["samples"]]
        body = decode_media(payload)["body"]
        return [body[i:i + FRAME_BYTES]
                for i in range(0, len(body), FRAME_BYTES)]

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video":
                    continue
                frames = _frames(bytes(payload))
                for f_no in range(0, len(frames), every_k):
                    rows.append((int(mid), f_no, frames[f_no]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA])

    return media.mapInPandas(run, FRAMES_SCHEMA)


def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (media_features(media_df(spark, 60))
            .transform(_ordered("media_id")))


def media_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = frame_sample(media_df(spark, 60))
    return (f.groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 F.min("frame_no").alias("first_frame"),
                 F.max("frame_no").alias("last_frame"),
                 F.sum(F.length("frame")).alias("sampled_bytes"))
            .transform(_ordered("media_id")))


CONCAT_SCHEMA = StructType([
    StructField("group_id", LongType(), False),
    StructField("n_imgs", IntegerType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("content_sum", LongType(), False),
])


def media_concat(media: DataFrame) -> DataFrame:
    """The reference's ``concat_img`` chunk-image accumulation
    (rag/nlp/__init__.py:557-573, reduced over a chunk's images in
    naive.py:213) as a grouped Arrow stage: images are bucketed into
    chunk-sized groups and vertically stacked left-aligned on an RGB
    canvas (max width, summed height, black fill) via the native PNG
    codec; features come from a REAL decode of the stacked result, so
    the whole encode→stack→encode→decode chain is exercised.

    Scale: one shuffle keyed by group — the reduce is per-chunk-local in
    production (images of one chunk land in one task), never a global
    collect."""
    from functools import reduce

    from ..media.codecs import vconcat_images

    imgs = (media.filter(F.col("kind") == "image")
            .withColumn("group_id",
                        F.floor(F.col("media_id") / F.lit(12)).cast("long")))

    def stack(pdf):
        pdf = pdf.sort_values("media_id")
        out = reduce(vconcat_images, [bytes(p) for p in pdf["payload"]], None)
        img = decode_media(out)
        body = img["body"]
        return pd.DataFrame(
            [(int(pdf["group_id"].iloc[0]), len(pdf), img["w"], img["h"],
              len(body), int(sum(body)))],
            columns=[f.name for f in CONCAT_SCHEMA])

    return (imgs.select("group_id", "media_id", "payload")
            .groupBy("group_id").applyInPandas(stack, CONCAT_SCHEMA))


def media_concat_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_concat(media_df(spark, 60)).transform(_ordered("group_id"))


MEDIA_CONCAT_SQL = r"""
WITH dims AS (
  SELECT id, id // 12 AS group_id,
         8 + (id*7) % 56 AS w, 8 + (id*11) % 56 AS h
  FROM (SELECT unnest(generate_series(0, 59)) AS id) WHERE id % 3 = 0),
img AS (
  SELECT group_id, w, h,
         (SELECT CAST(sum((id + 3*i) % 256) AS BIGINT)
          FROM unnest(generate_series(0, w*h - 1)) AS t(i)) AS psum
  FROM dims)
SELECT group_id,
       CAST(count(*) AS INTEGER) AS n_imgs,
       CAST(max(w) AS INTEGER) AS width,
       CAST(sum(h) AS INTEGER) AS height,
       CAST(3 * max(w) * sum(h) AS INTEGER) AS n_bytes,
       CAST(3 * sum(psum) AS BIGINT) AS content_sum
FROM img GROUP BY group_id ORDER BY group_id
"""


MEDIA_FEATURES_SQL = r"""
WITH m AS (SELECT unnest(generate_series(0, 59)) AS id),
img AS (
  SELECT id, 8 + (id*7) % 56 AS w, 8 + (id*11) % 56 AS h
  FROM m WHERE id % 3 = 0),
imgrows AS (
  SELECT id, 'image' AS kind, CAST(w*h AS INTEGER) AS n_bytes,
         CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         (SELECT CAST(sum((id + 3*i) % 256) AS BIGINT)
          FROM unnest(generate_series(0, w*h - 1)) AS t(i)) AS content_sum
  FROM img),
aud AS (
  SELECT id, 64 + (id*13) % 192 AS n FROM m WHERE id % 3 = 1),
audrows AS (
  SELECT id, 'audio' AS kind, CAST(2*n AS INTEGER) AS n_bytes,
         CAST(8000 AS INTEGER) AS width, CAST(n AS INTEGER) AS height,
         (SELECT CAST(sum(abs(((id*31 + i*17) % 2048) - 1024)) AS BIGINT)
          FROM unnest(generate_series(0, n - 1)) AS t(i)) AS content_sum
  FROM aud),
vid AS (
  SELECT id, 4 + id % 8 AS nf FROM m WHERE id % 3 = 2),
vidrows AS (
  SELECT id, 'video' AS kind, CAST(nf*256 AS INTEGER) AS n_bytes,
         CAST(256 AS INTEGER) AS width, CAST(nf AS INTEGER) AS height,
         (SELECT CAST(sum((id + i) % 256) AS BIGINT)
          FROM unnest(generate_series(0, nf*256 - 1)) AS t(i)) AS content_sum
  FROM vid)
SELECT id AS media_id, kind, n_bytes, width, height, content_sum
FROM (SELECT * FROM imgrows UNION ALL SELECT * FROM audrows
      UNION ALL SELECT * FROM vidrows)
ORDER BY media_id
"""

MEDIA_FRAMES_SQL = r"""
WITH vid AS (
  SELECT id, 4 + id % 8 AS nf
  FROM (SELECT unnest(generate_series(0, 59)) AS id) WHERE id % 3 = 2)
SELECT id AS media_id,
       (nf + 1) // 2 AS n_sampled,
       0 AS first_frame,
       CAST(2 * ((nf - 1) // 2) AS INTEGER) AS last_frame,
       CAST(((nf + 1) // 2) * 256 AS BIGINT) AS sampled_bytes
FROM vid
ORDER BY media_id
"""

# ----------------------------------------------------------- image aHash
# Perceptual-hash image near-dup (the multimodal counterpart of MinHash:
# aHash — 8×8 block means, bit = mean > global mean — then banded
# Hamming pairs).  The hash is computed from pixels DECODED out of real
# PNG bytes (encode_png → decode_png round trip inside the operator), so
# one flipped byte in the codec breaks the oracle, which re-derives every
# bit ARITHMETICALLY from the closed-form pixel law and never sees a PNG:
# pixel i of image k = (a_k·i + b_k) % 256, a_k = md5i(42:pa:k) % 7 + 1,
# b_k = md5i(42:pb:k) % 256, all images 32×32 grayscale.  Block means and
# the global mean use floor division (integer-exact aHash variant —
# documented divergence from the float original).
#
# Scale: per-image hashing rides the payload scan (one Arrow stage); the
# pair search is the banded pigeonhole — 8 bands × 8 bits, so any pair
# with Hamming ≤ 7 shares ≥ 1 exact band (we admit ≤ 6) and the
# self-join is keyed on (band_idx, band_bits): shuffle ∝ collisions,
# never |imgs|².  The oracle brute-forces all pairs — sound at its 48-
# image scale, and an independent derivation from the banded path.
_AH_N = 48
_AH_W = 32
_AH_BANDS = 8
_AH_MAX_HAMMING = 6


def ahash_images_df(spark: SparkSession, n: int = _AH_N) -> DataFrame:
    """Synthetic grayscale PNG set for the perceptual-hash operator (its
    own pixel law — gradients per a_k so hashes cluster by slope)."""
    from ..datagen.pages import _md5i as md5i   # ONE md5-bridge law
    base = spark.range(n)
    schema = StructType([StructField("img_id", LongType(), False),
                         StructField("payload", BinaryType(), False)])

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                a = md5i(f"42:pa:{k}") % 7 + 1
                b = md5i(f"42:pb:{k}") % 256
                px = bytes((a * i + b) % 256
                           for i in range(_AH_W * _AH_W))
                rows.append((k, encode_png(px, _AH_W, _AH_W, channels=1)))
            yield pd.DataFrame(rows, columns=["img_id", "payload"])

    return base.mapInPandas(gen, schema)


def image_ahash(images: DataFrame) -> DataFrame:
    """(img_id, ahash): 64-char '0'/'1' string from the decoded pixels."""
    schema = StructType([StructField("img_id", LongType(), False),
                         StructField("ahash", StringType(), False)])

    def run(batches):
        for pdf in batches:
            rows = []
            for k, payload in zip(pdf["img_id"], pdf["payload"]):
                img = decode_png(bytes(payload))
                px, w = img["pixels"], img["w"]
                cell = w // 8
                means = []
                for j in range(64):
                    bx, by = j % 8, j // 8
                    s = sum(px[(by * cell + dy) * w + bx * cell + dx]
                            for dy in range(cell) for dx in range(cell))
                    means.append(s // (cell * cell))
                gm = sum(means) // 64
                rows.append((int(k), "".join(
                    "1" if m > gm else "0" for m in means)))
            yield pd.DataFrame(rows, columns=["img_id", "ahash"])

    return images.mapInPandas(run, schema)


def image_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (image_ahash(ahash_images_df(spark))
         .localCheckpoint(eager=False))   # one decode pass, both join sides
    band_w = 64 // _AH_BANDS
    bands = h.select(
        "img_id", "ahash",
        F.posexplode(F.array(*[
            F.substring("ahash", i * band_w + 1, band_w)
            for i in range(_AH_BANDS)])).alias("band_idx", "band_bits"))
    a = bands.select(F.col("img_id").alias("id_a"),
                     F.col("ahash").alias("ha"), "band_idx", "band_bits")
    b = bands.select(F.col("img_id").alias("id_b"),
                     F.col("ahash").alias("hb"), "band_idx", "band_bits")
    cand = (a.join(b, ["band_idx", "band_bits"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ha", "hb").distinct())
    hamming = F.expr(
        "size(filter(sequence(1, 64),"
        " i -> substring(ha, i, 1) <> substring(hb, i, 1)))")
    return (cand.select("id_a", "id_b",
                        hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= _AH_MAX_HAMMING)
            .transform(_ordered("id_a", "id_b")))


def _image_near_dup_sql() -> str:
    from .extract_e2e import _md5i
    cell = _AH_W // 8
    return f"""
WITH par AS (
  SELECT k, {_md5i("'42:pa:' || k")} % 7 + 1 AS a,
         {_md5i("'42:pb:' || k")} % 256 AS b
  FROM (SELECT unnest(generate_series(0, {_AH_N - 1})) AS k)),
means AS (
  SELECT p.k, j.j,
         (SELECT sum((p.a * ((j.j // 8 * {cell} + t.i // {cell}) * {_AH_W}
                             + (j.j % 8) * {cell} + t.i % {cell})
                      + p.b) % 256)
          FROM unnest(generate_series(0, {cell * cell - 1})) AS t(i))
           // {cell * cell} AS m
  FROM par p, (SELECT unnest(generate_series(0, 63)) AS j) j),
gm AS (SELECT k, sum(m) // 64 AS gmean FROM means GROUP BY k),
hashes AS (
  SELECT k, string_agg(CASE WHEN m > gmean THEN '1' ELSE '0' END,
                       '' ORDER BY j) AS h
  FROM means JOIN gm USING (k) GROUP BY k)
SELECT a.k AS id_a, b.k AS id_b,
       CAST((SELECT count(*)
             FROM unnest(generate_series(1, 64)) AS t(i)
             WHERE substr(a.h, i, 1) != substr(b.h, i, 1)) AS INTEGER)
         AS hamming
FROM hashes a JOIN hashes b ON a.k < b.k
WHERE (SELECT count(*) FROM unnest(generate_series(1, 64)) AS t(i)
       WHERE substr(a.h, i, 1) != substr(b.h, i, 1)) <= {_AH_MAX_HAMMING}
ORDER BY id_a, id_b
"""


# ------------------------------------------------------ audio fingerprint
# Acoustic-fingerprint near-dup (chromaprint-style intuition on integer
# footing: block |amplitude| means → bit = block mean > clip mean), the
# audio member of the multimodal dedup trio (MinHash for text, aHash for
# images).  Samples are decoded out of REAL WAV bytes (encode_wav →
# decode_wav round trip inside the operator); the oracle re-derives each
# bit arithmetically from the closed-form sample law and never parses a
# RIFF header: sample i of clip k = ((a_k·i + b_k) % 2048) − 1024,
# a_k = md5i(42:aa:k) % 5 + 3, b_k = md5i(42:ab:k) % 2048, all clips 320
# samples → 32 blocks × 10.  Clips sharing a slope a_k have (near-)
# phase-shifted sawtooths whose block envelopes align → small Hamming;
# different slopes diverge.  Pairs via 4 × 8-bit banded pigeonhole:
# guaranteed recall to Hamming 3 = the admission bound, so banded =
# brute force exactly (unit-pinned).
_AF_N = 48
_AF_SAMPLES = 320
_AF_BLOCKS = 32
_AF_BANDS = 4
_AF_MAX_HAMMING = 3


def fingerprint_audio_df(spark: SparkSession, n: int = _AF_N) -> DataFrame:
    """Synthetic PCM16 WAV set for the acoustic-fingerprint operator."""
    from ..datagen.pages import _md5i as md5i   # ONE md5-bridge law
    base = spark.range(n)
    schema = StructType([StructField("clip_id", LongType(), False),
                         StructField("payload", BinaryType(), False)])

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                a = md5i(f"42:aa:{k}") % 5 + 3
                b = md5i(f"42:ab:{k}") % 2048
                samples = [((a * i + b) % 2048) - 1024
                           for i in range(_AF_SAMPLES)]
                rows.append((k, encode_wav(samples, rate=WAV_RATE)))
            yield pd.DataFrame(rows, columns=["clip_id", "payload"])

    return base.mapInPandas(gen, schema)


def audio_fingerprint(clips: DataFrame) -> DataFrame:
    """(clip_id, afp): 32-char '0'/'1' fingerprint from decoded samples."""
    schema = StructType([StructField("clip_id", LongType(), False),
                         StructField("afp", StringType(), False)])
    blk = _AF_SAMPLES // _AF_BLOCKS

    def run(batches):
        for pdf in batches:
            rows = []
            for k, payload in zip(pdf["clip_id"], pdf["payload"]):
                s = decode_wav(bytes(payload))["samples"]
                means = [sum(abs(x) for x in s[j * blk:(j + 1) * blk]) // blk
                         for j in range(_AF_BLOCKS)]
                gm = sum(means) // _AF_BLOCKS
                rows.append((int(k), "".join(
                    "1" if m > gm else "0" for m in means)))
            yield pd.DataFrame(rows, columns=["clip_id", "afp"])

    return clips.mapInPandas(run, schema)


def audio_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (audio_fingerprint(fingerprint_audio_df(spark))
         .localCheckpoint(eager=False))   # one decode pass, both sides
    band_w = _AF_BLOCKS // _AF_BANDS
    bands = h.select(
        "clip_id", "afp",
        F.posexplode(F.array(*[
            F.substring("afp", i * band_w + 1, band_w)
            for i in range(_AF_BANDS)])).alias("band_idx", "band_bits"))
    a = bands.select(F.col("clip_id").alias("id_a"),
                     F.col("afp").alias("fa"), "band_idx", "band_bits")
    b = bands.select(F.col("clip_id").alias("id_b"),
                     F.col("afp").alias("fb"), "band_idx", "band_bits")
    cand = (a.join(b, ["band_idx", "band_bits"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "fa", "fb").distinct())
    hamming = F.expr(
        f"size(filter(sequence(1, {_AF_BLOCKS}),"
        " i -> substring(fa, i, 1) <> substring(fb, i, 1)))")
    return (cand.select("id_a", "id_b",
                        hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= _AF_MAX_HAMMING)
            .transform(_ordered("id_a", "id_b")))


def _audio_near_dup_sql() -> str:
    from .extract_e2e import _md5i
    blk = _AF_SAMPLES // _AF_BLOCKS
    return f"""
WITH par AS (
  SELECT k, {_md5i("'42:aa:' || k")} % 5 + 3 AS a,
         {_md5i("'42:ab:' || k")} % 2048 AS b
  FROM (SELECT unnest(generate_series(0, {_AF_N - 1})) AS k)),
means AS (
  SELECT p.k, j.j,
         (SELECT sum(abs((p.a * (j.j * {blk} + t.i) + p.b) % 2048 - 1024))
          FROM unnest(generate_series(0, {blk - 1})) AS t(i))
           // {blk} AS m
  FROM par p, (SELECT unnest(generate_series(0, {_AF_BLOCKS - 1})) AS j) j),
gm AS (SELECT k, sum(m) // {_AF_BLOCKS} AS gmean FROM means GROUP BY k),
fps AS (
  SELECT k, string_agg(CASE WHEN m > gmean THEN '1' ELSE '0' END,
                       '' ORDER BY j) AS f
  FROM means JOIN gm USING (k) GROUP BY k)
SELECT a.k AS id_a, b.k AS id_b,
       CAST((SELECT count(*)
             FROM unnest(generate_series(1, {_AF_BLOCKS})) AS t(i)
             WHERE substr(a.f, i, 1) != substr(b.f, i, 1)) AS INTEGER)
         AS hamming
FROM fps a JOIN fps b ON a.k < b.k
WHERE (SELECT count(*)
       FROM unnest(generate_series(1, {_AF_BLOCKS})) AS t(i)
       WHERE substr(a.f, i, 1) != substr(b.f, i, 1)) <= {_AF_MAX_HAMMING}
ORDER BY id_a, id_b
"""


# ------------------------------------------------------- video near-dup
# Frame-hash video near-dup (the standard video dedup: hash every frame,
# two videos are near-dups when they share ≥ K frame hashes — re-encoded
# or re-cut uploads keep most frames byte-identical).  Frames come out of
# the REAL MP4 container (encode_mp4 → demux_mp4 sample-table walk, byte
# ranges sliced at the demuxed offsets), and the frame hash is md5 of the
# actual sample bytes — a mux/demux off-by-one breaks parity.  The oracle
# never parses a container: frame content is the ASCII hex of
# md5(seed) repeated 8× (256 bytes), so DuckDB re-derives each frame hash
# as md5(repeat(md5(seed), 8)).  Seeds: frame f of video k uses the
# FAMILY seed 42:vseed:fam{k%6}:{f} (shared across the family) unless
# md5i(42:vm:k:f) % 4 == 0 mutates it to the private 42:vseed:{k}:{f} —
# so family members share most frames and strangers share none.
#
# Scale: per-video hashing rides the payload scan (one Arrow stage); the
# pair search joins the exploded (video, frame_hash) relation on the
# hash key — shuffle ∝ matching frames, never |videos|²; the shared
# count is one map-side-combinable pair agg.
_VF_N = 36
_VF_FAMS = 6
_VF_MIN_SHARED = 3


def neardup_videos_df(spark: SparkSession, n: int = _VF_N) -> DataFrame:
    """Synthetic MP4 set: per-family shared frames + per-video mutations."""
    import hashlib

    from ..datagen.pages import _md5i as md5i   # ONE md5-bridge law
    base = spark.range(n)
    schema = StructType([StructField("vid_id", LongType(), False),
                         StructField("payload", BinaryType(), False)])

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                nf = 6 + k % 5
                frames = []
                for f in range(nf):
                    mut = md5i(f"42:vm:{k}:{f}") % 4 == 0
                    seed = (f"42:vseed:{k}:{f}" if mut
                            else f"42:vseed:fam{k % _VF_FAMS}:{f}")
                    frames.append(
                        (hashlib.md5(seed.encode()).hexdigest() * 8)
                        .encode("ascii"))
                rows.append((k, encode_mp4(frames, width=16, height=16,
                                           samples_per_chunk=3)))
            yield pd.DataFrame(rows, columns=["vid_id", "payload"])

    return base.mapInPandas(gen, schema)


def video_frame_hashes(videos: DataFrame) -> DataFrame:
    """(vid_id, fhash): md5 hex of every demuxed sample's actual bytes."""
    import hashlib
    schema = StructType([StructField("vid_id", LongType(), False),
                         StructField("fhash", StringType(), False)])

    def run(batches):
        for pdf in batches:
            rows = []
            for k, payload in zip(pdf["vid_id"], pdf["payload"]):
                data = bytes(payload)
                info = demux_mp4(data)
                for off, size, _dts in info["samples"]:
                    rows.append((int(k), hashlib.md5(
                        data[off:off + size]).hexdigest()))
            yield pd.DataFrame(rows, columns=["vid_id", "fhash"])

    return videos.mapInPandas(run, schema)


def video_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (video_frame_hashes(neardup_videos_df(spark))
         .distinct()
         .localCheckpoint(eager=False))  # one mux+demux pass, both sides
    a = h.select(F.col("vid_id").alias("id_a"), "fhash")
    b = h.select(F.col("vid_id").alias("id_b"), "fhash")
    return (a.join(b, "fhash")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("int").alias("shared_frames"))
            .filter(F.col("shared_frames") >= _VF_MIN_SHARED)
            .transform(_ordered("id_a", "id_b")))


def _video_near_dup_sql() -> str:
    from .extract_e2e import _md5i
    return f"""
WITH v AS (
  SELECT k, f,
         CASE WHEN {_md5i("'42:vm:' || k || ':' || f")} % 4 = 0
              THEN '42:vseed:' || k || ':' || f
              ELSE '42:vseed:fam' || (k % {_VF_FAMS}) || ':' || f
         END AS seed
  FROM (SELECT unnest(generate_series(0, {_VF_N - 1})) AS k),
       LATERAL (SELECT unnest(generate_series(0, 6 + k % 5 - 1)) AS f) u),
h AS (
  SELECT DISTINCT k, md5(repeat(md5(seed), 8)) AS fhash FROM v)
SELECT a.k AS id_a, b.k AS id_b,
       CAST(count(*) AS INTEGER) AS shared_frames
FROM h a JOIN h b ON a.fhash = b.fhash AND a.k < b.k
GROUP BY a.k, b.k
HAVING count(*) >= {_VF_MIN_SHARED}
ORDER BY id_a, id_b
"""


QUERIES = {
    "image_near_dup": (image_near_dup_q, _image_near_dup_sql()),
    "audio_near_dup": (audio_near_dup_q, _audio_near_dup_sql()),
    "video_near_dup": (video_near_dup_q, _video_near_dup_sql()),
    "media_features": (media_features_q, MEDIA_FEATURES_SQL),
    "media_frames": (media_frames_q, MEDIA_FRAMES_SQL),
    "media_concat": (media_concat_q, MEDIA_CONCAT_SQL),
}
