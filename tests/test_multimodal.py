"""Multimodal tests: real PNG/WAV/MP4 codecs, container decode, feature
UDF, frame sampling, unknown-container stub behavior."""

import pytest

from ragflow_core16_spark.media.codecs import (decode_png, decode_wav,
                                               encode_png, encode_wav)
from ragflow_core16_spark.operators.multimodal import (
    synth_payload, decode_media, media_df, media_features, frame_sample,
    FRAME_BYTES, WAV_RATE)


class TestPngCodec:
    def test_grey_roundtrip(self):
        pixels = bytes((3 * i) % 256 for i in range(24 * 17))
        img = decode_png(encode_png(pixels, 24, 17, 1))
        assert (img["w"], img["h"], img["channels"]) == (24, 17, 1)
        assert img["pixels"] == pixels

    def test_rgb_roundtrip(self):
        pixels = bytes((7 * i) % 256 for i in range(10 * 8 * 3))
        img = decode_png(encode_png(pixels, 10, 8, 3))
        assert (img["w"], img["h"], img["channels"]) == (10, 8, 3)
        assert img["pixels"] == pixels

    def test_all_filters_reconstruct(self):
        # hand-build a 3x3 grey PNG using filters Sub/Up/Average/Paeth
        import struct
        import zlib
        from ragflow_core16_spark.media.codecs import PNG_MAGIC, _chunk
        rows = [bytes([10, 20, 30]), bytes([40, 50, 60]),
                bytes([70, 80, 90])]
        raw = b"\x01" + bytes([10, 10, 10])          # Sub: 10,20,30
        raw += b"\x02" + bytes([30, 30, 30])         # Up: 40,50,60
        # Average: x = raw + (left + up)//2
        line = bytearray()
        left = 0
        for i, want in enumerate([70, 80, 90]):
            avg = (left + [40, 50, 60][i]) >> 1
            line.append((want - avg) & 0xFF)
            left = want
        raw += b"\x03" + bytes(line)
        ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
        png = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(raw))
               + _chunk(b"IEND", b""))
        img = decode_png(png)
        assert img["pixels"] == b"".join(rows)

    def test_unsupported_depth_raises(self):
        import struct
        import zlib
        from ragflow_core16_spark.media.codecs import PNG_MAGIC, _chunk
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
        png = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
               + _chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            decode_png(png)


class TestWavCodec:
    def test_roundtrip(self):
        samples = [((i * 37) % 2000) - 1000 for i in range(100)]
        au = decode_wav(encode_wav(samples, rate=8000))
        assert au["rate"] == 8000 and au["n_samples"] == 100
        assert au["samples"] == samples


class TestDecode:
    def test_image_is_real_png(self):
        p = synth_payload(7, "image")
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        m = decode_media(p)
        assert m["kind"] == "image" and m["w"] > 0
        assert len(m["body"]) == m["w"] * m["h"]
        assert m["body"][0] == 7 % 256 and m["body"][1] == 10

    def test_audio_is_real_wav(self):
        p = synth_payload(4, "audio")
        assert p[:4] == b"RIFF"
        m = decode_media(p)
        assert m["kind"] == "audio" and m["w"] == WAV_RATE
        assert m["h"] == len(m["body"])

    def test_deterministic(self):
        assert synth_payload(7, "video") == synth_payload(7, "video")

    def test_video_is_real_mp4(self):
        p = synth_payload(8, "video")
        assert p[4:8] == b"ftyp"
        m = decode_media(p)
        nf = 4 + 8 % 8
        assert m["kind"] == "video"
        assert (m["w"], m["h"]) == (FRAME_BYTES, nf)
        assert m["body"] == bytes((8 + i) % 256
                                  for i in range(nf * FRAME_BYTES))

    def test_unknown_container_raises(self):
        with pytest.raises(NotImplementedError):
            decode_media(b"\x00\x00\x00\x00nope not a container")


class TestMp4Container:
    def test_roundtrip_uniform(self):
        from ragflow_core16_spark.media.mp4 import (demux_mp4, encode_mp4,
                                                    extract_samples)
        frames = [bytes([i]) * 64 for i in range(10)]
        data = encode_mp4(frames, width=8, height=8, samples_per_chunk=4)
        info = demux_mp4(data)
        assert info["n_samples"] == 10
        assert (info["width"], info["height"]) == (8, 8)
        assert extract_samples(data) == frames
        assert extract_samples(data, every_k=3) == frames[::3]

    def test_roundtrip_mixed_sizes(self):
        # mixed sizes force the explicit stsz table; short tail chunk
        # forces the second stsc run
        from ragflow_core16_spark.media.mp4 import demux_mp4, encode_mp4
        frames = [bytes([i]) * (10 + 7 * i) for i in range(7)]
        data = encode_mp4(frames, samples_per_chunk=3)
        info = demux_mp4(data)
        assert [s for _, s, _ in info["samples"]] == [len(f) for f in frames]
        assert [data[o:o + s] for o, s, _ in info["samples"]] == frames

    def test_timestamps_from_stts(self):
        from ragflow_core16_spark.media.mp4 import demux_mp4, encode_mp4
        data = encode_mp4([b"x" * 4] * 5, timescale=600, sample_delta=25)
        info = demux_mp4(data)
        assert info["timescale"] == 600
        assert [t for _, _, t in info["samples"]] == [0, 25, 50, 75, 100]

    def test_bad_tables_raise(self):
        from ragflow_core16_spark.media.mp4 import demux_mp4
        with pytest.raises(ValueError):
            demux_mp4(b"\x00\x00\x00\x08ftyp")  # no moov

    def test_truncated_jpeg_raises(self):
        # JPEG now decodes natively (media/jpeg.py); malformed input fails
        # loudly instead of hitting a stub
        with pytest.raises((ValueError, NotImplementedError)):
            decode_media(b"\xff\xd8\xff\xe0 jpeg bytes")


class TestSparkPlumbing:
    def test_media_table(self, spark):
        m = media_df(spark, 9)
        rows = m.collect()
        assert len(rows) == 9
        assert {r["kind"] for r in rows} == {"image", "audio", "video"}
        assert all(r["meta_w"] > 0 for r in rows)

    def test_features_decode_real_content(self, spark):
        f = {r["media_id"]: r
             for r in media_features(media_df(spark, 6)).collect()}
        assert len(f) == 6
        img = f[0]        # media 0: image, w=8, h=8
        assert (img["width"], img["height"]) == (8, 8)
        assert img["content_sum"] == sum((0 + 3 * i) % 256 for i in range(64))
        aud = f[1]        # media 1: audio
        n = 64 + (1 * 13) % 192
        assert (aud["width"], aud["height"]) == (WAV_RATE, n)
        assert aud["content_sum"] == sum(
            abs(((31 + i * 17) % 2048) - 1024) for i in range(n))

    def test_frame_sampling(self, spark):
        frames = frame_sample(media_df(spark, 9), every_k=2).collect()
        assert frames, "video rows must produce frames"
        assert all(len(r["frame"]) == FRAME_BYTES for r in frames)
        assert all(r["frame_no"] % 2 == 0 for r in frames)


class TestJpegCodec:
    def test_flat_block_exact(self):
        from ragflow_core16_spark.media.jpeg import decode_jpeg, encode_jpeg
        flat = bytes([200]) * (16 * 8)
        out = decode_jpeg(encode_jpeg(flat, 16, 8, quality=90))
        assert (out["w"], out["h"]) == (16, 8)
        assert out["pixels"] == flat

    def test_gradient_high_fidelity(self):
        import numpy as np
        from ragflow_core16_spark.media.jpeg import decode_jpeg, encode_jpeg
        w, h = 40, 24
        grad = bytes(((x * 3 + y * 2) % 256) for y in range(h)
                     for x in range(w))
        out = decode_jpeg(encode_jpeg(grad, w, h, quality=90))
        a = np.frombuffer(grad, dtype=np.uint8).astype(int)
        b = np.frombuffer(out["pixels"], dtype=np.uint8).astype(int)
        assert np.abs(a - b).mean() < 1.0

    def test_non_multiple_of_8_dims(self):
        from ragflow_core16_spark.media.jpeg import decode_jpeg, encode_jpeg
        w, h = 13, 9
        pix = bytes((x * 7 + y * 11) % 256 for y in range(h)
                    for x in range(w))
        out = decode_jpeg(encode_jpeg(pix, w, h))
        assert (out["w"], out["h"]) == (w, h)
        assert len(out["pixels"]) == w * h

    def test_decode_media_routes_jpeg(self):
        from ragflow_core16_spark.media.jpeg import encode_jpeg
        from ragflow_core16_spark.operators.multimodal import decode_media
        m = decode_media(encode_jpeg(bytes([7]) * 64, 8, 8))
        assert m["kind"] == "image" and (m["w"], m["h"]) == (8, 8)

    def test_truncated_mp4_raises(self):
        # MP4 demux is native now (media/mp4.py); a header with no moov
        # fails loudly instead of hitting a stub
        import pytest
        from ragflow_core16_spark.operators.multimodal import decode_media
        with pytest.raises(ValueError):
            decode_media(b"\x00\x00\x00\x20ftypisom mp4 header")


class TestFrameSampleOffsets:
    def test_mixed_size_samples_sliced_at_demuxed_offsets(self, spark):
        # frames must come from the stsz/stsc offsets, not fixed blocks
        import pandas as pd
        from ragflow_core16_spark.media.mp4 import encode_mp4
        from ragflow_core16_spark.operators.multimodal import MEDIA_SCHEMA
        frames = [bytes([i]) * (30 + 17 * i) for i in range(6)]
        payload = encode_mp4(frames, samples_per_chunk=2)
        pdf = pd.DataFrame(
            [(0, "video", payload, 0, 0, 1)],
            columns=[f.name for f in MEDIA_SCHEMA])
        df = spark.createDataFrame(pdf, MEDIA_SCHEMA)
        got = {r["frame_no"]: bytes(r["frame"])
               for r in frame_sample(df, every_k=2).collect()}
        assert got == {0: frames[0], 2: frames[2], 4: frames[4]}

    def test_missing_stts_raises_value_error(self):
        # a moov without sample tables must fail the ValueError contract,
        # not TypeError
        import pytest
        import struct
        from ragflow_core16_spark.media.mp4 import demux_mp4, encode_mp4
        data = bytearray(encode_mp4([b"x" * 8] * 3))
        i = data.find(b"stts")
        data[i:i + 4] = b"free"          # retag: stts disappears
        with pytest.raises(ValueError):
            demux_mp4(bytes(data))


class TestMp4PropertyFuzz:
    def test_roundtrip_over_shapes(self):
        from hypothesis import given, settings, strategies as st
        from ragflow_core16_spark.media.mp4 import (demux_mp4, encode_mp4,
                                                    extract_samples)

        @settings(max_examples=120, deadline=None)
        @given(sizes=st.lists(st.integers(1, 400), min_size=1, max_size=24),
               spc=st.integers(0, 9),
               every_k=st.integers(1, 5),
               delta=st.integers(1, 90000))
        def run(sizes, spc, every_k, delta):
            frames = [bytes([(i * 37) % 256]) * n
                      for i, n in enumerate(sizes)]
            data = encode_mp4(frames, samples_per_chunk=spc,
                              sample_delta=delta)
            info = demux_mp4(data)
            assert info["n_samples"] == len(frames)
            assert [t for _, _, t in info["samples"]] == [
                i * delta for i in range(len(frames))]
            assert extract_samples(data, every_k=every_k) \
                == frames[::every_k]

        run()


class TestVconcatImages:
    """concat_img parity (rag/nlp/__init__.py:557-573): None passthrough,
    RGB canvas of (max width, summed height), left paste, black fill."""

    def test_none_passthrough(self):
        from ragflow_core16_spark.media.codecs import encode_png, vconcat_images
        png = encode_png(bytes(range(12)), 4, 3, channels=1)
        assert vconcat_images(png, None) == png
        assert vconcat_images(None, png) == png
        assert vconcat_images(None, None) is None

    def test_stack_mixed_width_grey(self):
        from ragflow_core16_spark.media.codecs import (decode_png, encode_png,
                                                       vconcat_images)
        a = encode_png(bytes([10] * 6), 3, 2, channels=1)   # 3x2
        b = encode_png(bytes([20] * 10), 5, 2, channels=1)  # 5x2
        out = decode_png(vconcat_images(a, b))
        assert (out["w"], out["h"], out["channels"]) == (5, 4, 3)
        px = out["pixels"]
        # row 0: 3 grey-10 pixels replicated to RGB, then black fill
        assert px[0:9] == bytes([10] * 9) and px[9:15] == bytes(6)
        # row 2 (first of b): full-width grey-20
        assert px[2 * 5 * 3:3 * 5 * 3] == bytes([20] * 15)
        # content sum = 3*(sum a + sum b), fill contributes 0
        assert sum(px) == 3 * (10 * 6 + 20 * 10)

    def test_rgb_inputs_kept_verbatim(self):
        from ragflow_core16_spark.media.codecs import (decode_png, encode_png,
                                                       vconcat_images)
        rgb = bytes(range(2 * 2 * 3))
        a = encode_png(rgb, 2, 2, channels=3)
        out = decode_png(vconcat_images(a, a))
        assert (out["w"], out["h"]) == (2, 4)
        assert out["pixels"] == rgb + rgb


class TestMp4Co64:
    def test_demux_co64_chunk_offsets(self):
        """A standards-valid file can carry 64-bit chunk offsets (co64,
        standard for >4 GB); demux must fall back to it when stco is
        absent.  Built by rewriting a muxed file's stco box to co64 in
        place (mdat precedes moov, so chunk offsets are unaffected; only
        the ancestor container sizes grow)."""
        import struct
        from ragflow_core16_spark.media.mp4 import (demux_mp4, encode_mp4,
                                                    extract_samples)
        frames = [bytes([i]) * 64 for i in range(10)]
        data = encode_mp4(frames, width=8, height=8, samples_per_chunk=4)
        want = demux_mp4(data)

        i = data.find(b"stco") - 4
        (size,) = struct.unpack_from(">I", data, i)
        verflags = data[i + 8:i + 12]
        (n,) = struct.unpack_from(">I", data, i + 12)
        offs = struct.unpack_from(f">{n}I", data, i + 16)
        body = verflags + struct.pack(">I", n) + b"".join(
            struct.pack(">Q", o) for o in offs)
        newbox = struct.pack(">I", 8 + len(body)) + b"co64" + body
        new = bytearray(data[:i] + newbox + data[i + size:])
        delta = len(newbox) - size
        for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            j = bytes(new).rfind(tag) - 4
            (cur,) = struct.unpack_from(">I", new, j)
            struct.pack_into(">I", new, j, cur + delta)
        new = bytes(new)

        assert b"stco" not in new and b"co64" in new
        info = demux_mp4(new)
        assert info["samples"] == want["samples"]
        assert extract_samples(new) == frames


class TestImageNearDup:
    def test_matches_pure_python_ahash_bruteforce(self, spark):
        import hashlib

        from ragflow_core16_spark.operators.multimodal import (
            _AH_MAX_HAMMING, _AH_N, _AH_W, image_near_dup_q)

        def md5i(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        cell = _AH_W // 8
        hashes = {}
        for k in range(_AH_N):
            a, b = md5i(f"42:pa:{k}") % 7 + 1, md5i(f"42:pb:{k}") % 256
            px = [(a * i + b) % 256 for i in range(_AH_W * _AH_W)]
            means = []
            for j in range(64):
                bx, by = j % 8, j // 8
                s = sum(px[(by * cell + dy) * _AH_W + bx * cell + dx]
                        for dy in range(cell) for dx in range(cell))
                means.append(s // (cell * cell))
            gm = sum(means) // 64
            hashes[k] = "".join("1" if m > gm else "0" for m in means)
        want = {}
        for i in range(_AH_N):
            for j in range(i + 1, _AH_N):
                h = sum(x != y for x, y in zip(hashes[i], hashes[j]))
                if h <= _AH_MAX_HAMMING:
                    want[(i, j)] = h
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in image_near_dup_q(spark, None).collect()}
        # banding guarantees recall to Hamming 7 > the 6 admitted, so the
        # banded operator must find EXACTLY the brute-force pair set
        assert got == want and want

    def test_codec_round_trip_feeds_the_hash(self, spark):
        from ragflow_core16_spark.media.codecs import decode_png
        from ragflow_core16_spark.operators.multimodal import (
            ahash_images_df, image_ahash)
        imgs = {r["img_id"]: bytes(r["payload"])
                for r in ahash_images_df(spark, 4).collect()}
        for k, p in imgs.items():
            assert p[:8] == b"\x89PNG\r\n\x1a\n"
            assert decode_png(p)["w"] == 32
        hs = image_ahash(ahash_images_df(spark, 4)).collect()
        assert len(hs) == 4
        assert all(set(r["ahash"]) <= {"0", "1"}
                   and len(r["ahash"]) == 64 for r in hs)


class TestAudioNearDup:
    def test_matches_pure_python_bruteforce(self, spark):
        import hashlib

        from ragflow_core16_spark.operators.multimodal import (
            _AF_BLOCKS, _AF_MAX_HAMMING, _AF_N, _AF_SAMPLES,
            audio_near_dup_q)

        def md5i(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        blk = _AF_SAMPLES // _AF_BLOCKS
        fps = {}
        for k in range(_AF_N):
            a, b = md5i(f"42:aa:{k}") % 5 + 3, md5i(f"42:ab:{k}") % 2048
            s = [((a * i + b) % 2048) - 1024 for i in range(_AF_SAMPLES)]
            means = [sum(abs(x) for x in s[j * blk:(j + 1) * blk]) // blk
                     for j in range(_AF_BLOCKS)]
            gm = sum(means) // _AF_BLOCKS
            fps[k] = "".join("1" if m > gm else "0" for m in means)
        want = {}
        for i in range(_AF_N):
            for j in range(i + 1, _AF_N):
                h = sum(x != y for x, y in zip(fps[i], fps[j]))
                if h <= _AF_MAX_HAMMING:
                    want[(i, j)] = h
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in audio_near_dup_q(spark, None).collect()}
        # 4 bands × 8 bits guarantee recall to Hamming 3 = the admission
        # bound, so banded must equal brute force exactly
        assert got == want and want

    def test_wav_round_trip_feeds_the_fingerprint(self, spark):
        from ragflow_core16_spark.media.codecs import decode_wav
        from ragflow_core16_spark.operators.multimodal import (
            audio_fingerprint, fingerprint_audio_df)
        clips = {r["clip_id"]: bytes(r["payload"])
                 for r in fingerprint_audio_df(spark, 3).collect()}
        for p in clips.values():
            assert p[:4] == b"RIFF"
            assert decode_wav(p)["n_samples"] == 320
        fs = audio_fingerprint(fingerprint_audio_df(spark, 3)).collect()
        assert all(len(r["afp"]) == 32 and set(r["afp"]) <= {"0", "1"}
                   for r in fs)


class TestVideoNearDup:
    def test_matches_pure_python_bruteforce(self, spark):
        import hashlib
        from collections import defaultdict

        from ragflow_core16_spark.operators.multimodal import (
            _VF_FAMS, _VF_MIN_SHARED, _VF_N, video_near_dup_q)

        def md5i(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        hashes = defaultdict(set)
        for k in range(_VF_N):
            for f in range(6 + k % 5):
                mut = md5i(f"42:vm:{k}:{f}") % 4 == 0
                seed = (f"42:vseed:{k}:{f}" if mut
                        else f"42:vseed:fam{k % _VF_FAMS}:{f}")
                content = (hashlib.md5(seed.encode()).hexdigest() * 8) \
                    .encode("ascii")
                hashes[k].add(hashlib.md5(content).hexdigest())
        want = {}
        for i in range(_VF_N):
            for j in range(i + 1, _VF_N):
                n = len(hashes[i] & hashes[j])
                if n >= _VF_MIN_SHARED:
                    want[(i, j)] = n
        got = {(r["id_a"], r["id_b"]): r["shared_frames"]
               for r in video_near_dup_q(spark, None).collect()}
        assert got == want and want
        # sharing only happens inside a family by construction
        assert all(a % _VF_FAMS == b % _VF_FAMS for a, b in got)

    def test_mp4_demux_feeds_the_hashes(self, spark):
        from ragflow_core16_spark.media.mp4 import demux_mp4
        from ragflow_core16_spark.operators.multimodal import (
            neardup_videos_df, video_frame_hashes)
        vids = {r["vid_id"]: bytes(r["payload"])
                for r in neardup_videos_df(spark, 3).collect()}
        for k, p in vids.items():
            assert p[4:8] == b"ftyp"
            assert demux_mp4(p)["n_samples"] == 6 + k % 5
        hs = video_frame_hashes(neardup_videos_df(spark, 3)).collect()
        assert len(hs) == sum(6 + k % 5 for k in range(3))
