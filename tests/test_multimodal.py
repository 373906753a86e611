"""Multimodal plumbing tests: synthetic container decode, feature UDF,
frame sampling, real-codec stub behavior."""

import pytest

from ragflow_core16_spark.operators.multimodal import (
    synth_payload, decode_media, media_df, media_features, frame_sample,
    FRAME_BYTES)


class TestDecode:
    def test_synth_roundtrip(self):
        p = synth_payload(7, "image")
        m = decode_media(p)
        assert m["kind"] == "image" and m["w"] > 0 and len(m["body"]) == m["w"] * m["h"]

    def test_deterministic(self):
        assert synth_payload(7, "video") == synth_payload(7, "video")

    def test_real_codec_is_stubbed(self):
        with pytest.raises(NotImplementedError):
            decode_media(b"\x89PNG\r\n\x1a\n....")


class TestSparkPlumbing:
    def test_media_table(self, spark):
        m = media_df(spark, 9)
        rows = m.collect()
        assert len(rows) == 9
        assert {r["kind"] for r in rows} == {"image", "audio", "video"}
        assert all(r["meta_w"] > 0 for r in rows)

    def test_features_shape(self, spark):
        f = media_features(media_df(spark, 6)).collect()
        assert len(f) == 6
        for r in f:
            assert len(r["features"]) == 16
            assert abs(sum(r["features"]) - 1.0) < 1e-3  # normalized histogram

    def test_frame_sampling(self, spark):
        frames = frame_sample(media_df(spark, 9), every_k=2).collect()
        assert frames, "video rows must produce frames"
        assert all(len(r["frame"]) == FRAME_BYTES for r in frames)
        assert all(r["frame_no"] % 2 == 0 for r in frames)
