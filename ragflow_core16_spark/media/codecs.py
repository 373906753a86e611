"""Stdlib-only media codecs: PNG (zlib + struct) and WAV (wave).

PNG and WAV need no external codec libraries — PNG is zlib-compressed
scanlines with per-line filters, WAV is RIFF-framed PCM — so these two are
REAL decoders/encoders, not stubs.  JPEG/MP4 remain the documented
``NotImplementedError`` integration slot (their codecs are not in this
container).

The PNG implementation covers what the pipeline emits and what a training
corpus overwhelmingly contains: 8-bit greyscale (color type 0) and 8-bit
RGB (color type 2), all five scanline filters (None/Sub/Up/Average/Paeth)
on decode, filter 0 on encode.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------- PNG
def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body +
            struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 1) -> bytes:
    """Raw 8-bit pixels (row-major, ``width*height*channels`` bytes) →
    PNG bytes (filter 0 per scanline)."""
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    color_type = {1: 0, 3: 2}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict:
    """PNG bytes → {"w", "h", "channels", "pixels" (bytes)}.

    Supports bit depth 8, color types 0 (grey) and 2 (RGB), no interlace;
    reconstructs all five scanline filters."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype not in (0, 2) or inter:
                raise NotImplementedError(
                    f"PNG depth={depth} color={ctype} interlace={inter} "
                    "outside the supported 8-bit grey/RGB subset")
            channels = 1 if ctype == 0 else 3
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:      # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:    # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:    # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out += line
        prev = line
    return {"w": w, "h": h, "channels": channels, "pixels": bytes(out)}


def vconcat_images(png_a: bytes | None, png_b: bytes | None) -> bytes | None:
    """Vertical image concatenation with the reference's ``concat_img``
    semantics (rag/nlp/__init__.py:557-573): None passthrough when either
    side is missing; otherwise a new RGB canvas of (max width, summed
    height) with each image pasted at x=0 and the remainder black.

    Greyscale inputs are replicated into RGB on paste (PIL's RGB-canvas
    paste does the same conversion).  Pure stdlib: decode → byte-level
    row blit → encode."""
    if png_a and not png_b:
        return png_a
    if not png_a and png_b:
        return png_b
    if not png_a and not png_b:
        return None
    a, b = decode_png(png_a), decode_png(png_b)
    w = max(a["w"], b["w"])
    h = a["h"] + b["h"]
    canvas = bytearray(w * h * 3)
    y0 = 0
    for img in (a, b):
        iw, ic, px = img["w"], img["channels"], img["pixels"]
        for y in range(img["h"]):
            dst = ((y0 + y) * w) * 3
            src = y * iw * ic
            if ic == 3:
                canvas[dst:dst + iw * 3] = px[src:src + iw * 3]
            else:
                for x in range(iw):
                    v = px[src + x]
                    o = dst + 3 * x
                    canvas[o] = canvas[o + 1] = canvas[o + 2] = v
        y0 += img["h"]
    return encode_png(bytes(canvas), w, h, channels=3)


# ------------------------------------------------------------------- WAV
def encode_wav(samples: list[int], rate: int = 8000,
               channels: int = 1) -> bytes:
    """16-bit signed PCM samples → WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> dict:
    """WAV bytes → {"rate", "channels", "n_samples", "samples"}."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        n = wv.getnframes()
        raw = wv.readframes(n)
        if wv.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM supported")
        samples = list(struct.unpack(f"<{n * wv.getnchannels()}h", raw))
        return {"rate": wv.getframerate(), "channels": wv.getnchannels(),
                "n_samples": n, "samples": samples}
