"""Unit tests for codec detection, token counting, and xxh64."""

from ragflow_core16_spark.textnorm.codec import find_codec, decode_bytes
from ragflow_core16_spark.textnorm.tokens import num_tokens_from_string
from ragflow_core16_spark.textnorm.xxh64 import xxh64_int, xxh64_hexdigest, chunk_id


class TestFindCodec:
    def test_ascii_maps_to_utf8(self):
        assert find_codec(b"hello world") == "utf-8"

    def test_utf8_cjk(self):
        assert find_codec("中文测试。".encode("utf-8")) == "utf-8"

    def test_gbk(self):
        # gb2312 precedes gbk in the codec list and decodes common hanzi
        assert find_codec("中文测试。".encode("gbk")) == "gb2312"
        assert decode_bytes("中文测试。".encode("gbk")) == "中文测试。"

    def test_latin1(self):
        blob = "café désolé".encode("latin-1")
        assert decode_bytes(blob)  # decodes without error

    def test_cp1251(self):
        blob = "Привет мир".encode("cp1251")
        assert decode_bytes(blob)

    def test_empty(self):
        assert find_codec(b"") == "utf-8"

    def test_1kb_boundary_multibyte_truncation(self):
        # a multibyte char straddling the 1 KiB boundary must not crash;
        # the whole-blob fallback decode still resolves a codec
        blob = (b"a" * 1023) + "中".encode("utf-8")
        assert isinstance(find_codec(blob), str)
        assert decode_bytes(blob).startswith("a" * 1023)


class TestTokens:
    def test_empty(self):
        assert num_tokens_from_string("") == 0

    def test_monotone_in_length(self):
        short = num_tokens_from_string("one two three")
        long = num_tokens_from_string("one two three four five six seven eight")
        assert long > short

    def test_cjk_counts_per_char(self):
        assert num_tokens_from_string("中文测试") >= 4

    def test_deterministic(self):
        s = "The quick brown fox, jumps over 1234 lazy dogs!"
        assert num_tokens_from_string(s) == num_tokens_from_string(s)

    def test_reasonable_english_rate(self):
        # ~4-5 chars/token for typical English
        s = "the quick brown fox jumps over the lazy dog " * 10
        n = num_tokens_from_string(s)
        assert 0.15 < n / len(s) < 0.35


class TestXxh64:
    # Published XXH64 test vectors (xxHash reference implementation)
    def test_vectors(self):
        assert xxh64_int(b"") == 0xEF46DB3751D8E999
        assert xxh64_int(b"a") == 0xD24EC4F1A98C6E5B
        assert xxh64_int(b"abc") == 0x44BC2CF5AD770999
        assert xxh64_int(b"message digest") == 0x066ED728FCEEB3BE
        assert xxh64_int(b"abcdefghijklmnopqrstuvwxyz") == 0xCFE1F278FA89835C
        assert (xxh64_int(b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")
                == 0xAAA46907D3047814)

    def test_seeded(self):
        assert xxh64_int(b"", 1) != xxh64_int(b"", 0)

    def test_hexdigest_format(self):
        h = xxh64_hexdigest("hello")
        assert len(h) == 16 and int(h, 16) >= 0

    def test_chunk_id_parity_shape(self):
        # reference: xxhash.xxh64(text + doc_id).hexdigest()
        a = chunk_id("some chunk text", "https://example.com/x")
        b = chunk_id("some chunk text", "https://example.com/y")
        assert a != b and len(a) == 16

    def test_utf8_input(self):
        assert xxh64_hexdigest("中文") == xxh64_hexdigest("中文".encode("utf-8"))
