"""Stdlib-only MP4 / ISO-BMFF container muxer + demuxer (struct math).

The ISO base media file format (ISO/IEC 14496-12, public spec) is pure
box/table arithmetic — no codec library is needed to mux raw frame
payloads into a valid MP4 or to demux one back into per-sample
(offset, size, timestamp) triples:

  * box walk: ``u32 size + 4cc`` headers, ``size==1`` → u64 largesize,
    ``size==0`` → box extends to end of file;
  * ``stts`` (decoding time-to-sample) run-length table → per-sample DTS;
  * ``stsz`` (sample sizes: uniform field or explicit u32 table);
  * ``stsc`` (sample-to-chunk runs) expanded against ``stco``/``co64``
    chunk offsets → per-sample byte offsets into ``mdat``.

This closes the video-container slot in ``operators/multimodal.py`` the
same way PNG/WAV/JPEG were closed: the CONTAINER (what frame sampling,
span slicing and metadata extraction need at pipeline scale) is parsed
for real; only pixel-level decode of compressed video codecs (H.264 &c)
remains the documented external-decoder slot, since those codecs are not
expressible as container math.

Reference scope note: the reference repo treats video as an external
LLM/ASR concern (SURVEY.md §2.4 picture/audio rows); this module is part
of the build-contract multimodal plumbing, not a reference port.
"""

from __future__ import annotations

import struct

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


def _box(tag: bytes, body: bytes) -> bytes:
    return _U32.pack(8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, _U32.pack((version << 24) | flags) + body)


_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)


def _visual_sample_entry(width: int, height: int) -> bytes:
    # VisualSampleEntry with format 'raw ' — uncompressed payload slot.
    body = (b"\x00" * 6 + struct.pack(">H", 1)        # data_ref_index
            + b"\x00" * 16                            # predefined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + _U32.pack(0)                            # reserved
            + struct.pack(">H", 1)                    # frame_count
            + b"\x00" * 32                            # compressorname
            + struct.pack(">Hh", 24, -1))             # depth, predefined
    return _box(b"raw ", body)


def encode_mp4(frames: list[bytes], *, width: int = 0, height: int = 0,
               timescale: int = 1000, sample_delta: int = 40,
               samples_per_chunk: int = 0) -> bytes:
    """Mux raw frame payloads into a minimal valid MP4.

    Layout is ``ftyp`` (24 B) + ``mdat`` (8 B header + frames) + ``moov``,
    so sample 0 always starts at byte offset 32 and chunk offsets in
    ``stco`` are known without post-hoc fixups.  ``samples_per_chunk``
    groups samples into multi-sample chunks (0 → one chunk holds all
    samples); uniform frame sizes are written through the ``stsz``
    uniform-size field, mixed sizes through the explicit table.
    """
    n = len(frames)
    if n == 0:
        raise ValueError("encode_mp4 needs at least one frame")
    payload = b"".join(frames)
    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0x200) + b"isom" + b"iso2")
    mdat = _box(b"mdat", payload)
    spc = samples_per_chunk if samples_per_chunk > 0 else n

    # chunk layout: full chunks of `spc` samples + a possibly-short tail
    sizes = [len(f) for f in frames]
    chunk_starts = list(range(0, n, spc))           # first sample index
    chunk_offsets, pos = [], len(ftyp) + 8
    for st in chunk_starts:
        chunk_offsets.append(pos)
        pos += sum(sizes[st:st + spc])

    stts = _full(b"stts", 0, 0,
                 _U32.pack(1) + struct.pack(">II", n, sample_delta))
    # stsc runs: uniform spc, except a shorter final chunk gets its own run
    tail = n - chunk_starts[-1]
    runs = [(1, spc)]
    if tail != spc and len(chunk_starts) > 1:
        runs.append((len(chunk_starts), tail))
    elif tail != spc:                               # single short chunk
        runs = [(1, tail)]
    stsc = _full(b"stsc", 0, 0, _U32.pack(len(runs)) + b"".join(
        struct.pack(">III", first, cnt, 1) for first, cnt in runs))
    if len(set(sizes)) == 1:
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", sizes[0], n))
    else:
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(_U32.pack(s) for s in sizes))
    stco = _full(b"stco", 0, 0, _U32.pack(len(chunk_offsets))
                 + b"".join(_U32.pack(o) for o in chunk_offsets))
    stsd = _full(b"stsd", 0, 0,
                 _U32.pack(1) + _visual_sample_entry(width, height))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _full(b"dref", 0, 0, _U32.pack(1) + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf",
                _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                + _box(b"dinf", dref) + stbl)
    duration = n * sample_delta
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                            duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, _U32.pack(0) + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + _U32.pack(duration) + b"\x00" * 8
                 + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + b"\x00" * 8 + _MATRIX + b"\x00" * 24 + _U32.pack(2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = _U32.unpack_from(data, pos)[0]
        tag = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            size = _U64.unpack_from(data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {tag!r} at {pos}")
        yield tag, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, tag: bytes):
    for t, b, e in _walk(data, start, end):
        if t == tag:
            return b, e
    return None


def _path(data: bytes, start: int, end: int, *tags: bytes):
    span = (start, end)
    for tag in tags:
        hit = _find(data, span[0], span[1], tag)
        if hit is None:
            raise ValueError(f"missing box {tag!r}")
        span = hit
    return span


def demux_mp4(data: bytes) -> dict:
    """MP4 bytes → sample map.

    Returns ``{"timescale", "duration", "width", "height", "n_samples",
    "samples": [(offset, size, dts), ...]}`` by expanding the stbl
    tables: stsc runs are applied across stco/co64 chunk offsets to place
    every sample, stsz supplies sizes, stts accumulates DTS.
    """
    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("missing moov")
    trak = _path(data, moov[0], moov[1], b"trak")
    tk = _path(data, trak[0], trak[1], b"tkhd")
    # width/height are the last two 16.16 u32s of tkhd regardless of version
    width = _U32.unpack_from(data, tk[1] - 8)[0] >> 16
    height = _U32.unpack_from(data, tk[1] - 4)[0] >> 16
    mdia = _path(data, trak[0], trak[1], b"mdia")
    md = _path(data, mdia[0], mdia[1], b"mdhd")
    if data[md[0]] == 0:
        timescale, duration = struct.unpack_from(">II", data, md[0] + 12)
    else:                                           # version 1: u64 times
        timescale = _U32.unpack_from(data, md[0] + 20)[0]
        duration = _U64.unpack_from(data, md[0] + 24)[0]
    stbl = _path(data, mdia[0], mdia[1], b"minf", b"stbl")

    def table(tag: bytes):
        hit = _find(data, stbl[0], stbl[1], tag)
        if hit is None:
            raise ValueError(f"missing sample table {tag!r}")
        return hit

    # stts → per-sample dts
    b, _ = table(b"stts")
    n_ent = _U32.unpack_from(data, b + 4)[0]
    dts, t = [], 0
    for i in range(n_ent):
        cnt, delta = struct.unpack_from(">II", data, b + 8 + 8 * i)
        for _ in range(cnt):
            dts.append(t)
            t += delta
    # stsz → sizes
    b, _ = table(b"stsz")
    uniform, n_samples = struct.unpack_from(">II", data, b + 4)
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", data, b + 12))
    # stco / co64 → chunk offsets (co64 = 64-bit offsets, standard for
    # >4 GB files; probe with _find directly — table() raises on a miss,
    # which would make the co64 fallback unreachable)
    hit = _find(data, stbl[0], stbl[1], b"stco")
    if hit is not None:
        b, _ = hit
        n_chunks = _U32.unpack_from(data, b + 4)[0]
        chunk_off = list(struct.unpack_from(f">{n_chunks}I", data, b + 8))
    else:
        b, _ = table(b"co64")
        n_chunks = _U32.unpack_from(data, b + 4)[0]
        chunk_off = list(struct.unpack_from(f">{n_chunks}Q", data, b + 8))
    # stsc runs expanded across chunks → per-sample offsets
    b, _ = table(b"stsc")
    n_runs = _U32.unpack_from(data, b + 4)[0]
    runs = [struct.unpack_from(">III", data, b + 8 + 12 * i)
            for i in range(n_runs)]
    per_chunk = []
    for i, (first, cnt, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
        per_chunk.extend(cnt for _ in range(first, last + 1))
    offsets, si = [], 0
    for ci, cnt in enumerate(per_chunk):
        pos = chunk_off[ci]
        for _ in range(cnt):
            if si >= n_samples:
                break
            offsets.append(pos)
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("stsc/stco tables place "
                         f"{si} samples, stsz declares {n_samples}")
    if len(dts) < n_samples:
        raise ValueError(f"stts covers {len(dts)} samples, "
                         f"stsz declares {n_samples}")
    samples = list(zip(offsets, sizes, dts[:n_samples]))
    return {"timescale": timescale, "duration": duration, "width": width,
            "height": height, "n_samples": n_samples, "samples": samples}


def extract_samples(data: bytes, every_k: int = 1) -> list[bytes]:
    """Read every k-th sample's bytes straight from the demuxed offsets."""
    info = demux_mp4(data)
    return [data[o:o + s] for o, s, _ in info["samples"][::every_k]]
