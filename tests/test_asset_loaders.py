"""External-asset drop-in loaders exercised at REALISTIC asset sizes
(VERDICT r4 task #8): the sandbox cannot download the genuine jieba
dict / WordNet index / cl100k ranks, so these tests generate synthetic
files SHAPED like the real assets (~100k entries each), push them
through the documented conversion + env-var paths, and assert the
loaders behave — so the drop-in works first try in a connected env."""

import base64
import math
import random
import time

import pytest


def _cjk_word(rng: random.Random) -> str:
    return "".join(chr(rng.randint(0x4E00, 0x9FD0))
                   for _ in range(rng.randint(2, 4)))


class TestCjkDictAtScale:
    N = 100_000

    @pytest.fixture(scope="class")
    def dict_file(self, tmp_path_factory):
        """A 100k-entry jieba-format dict.txt (word freq pos) converted
        through tools/build_cjk_dict.from_jieba — the documented
        one-command path for the real public asset."""
        sys_path_root = tmp_path_factory.mktemp("cjk")
        rng = random.Random(4242)
        src = sys_path_root / "dict.txt"
        words = []
        with open(src, "w", encoding="utf-8") as f:
            for _ in range(self.N):
                w = _cjk_word(rng)
                words.append(w)
                f.write(f"{w} {rng.randint(2, 50000)} "
                        f"{rng.choice(['n', 'v', 'nr', 'ns'])}\n")
        out = sys_path_root / "huqie_full.txt"
        import sys as _s
        _s.path.insert(0, "tools")
        from build_cjk_dict import from_jieba
        n = from_jieba(str(src), str(out))
        assert n == self.N
        return str(out), words

    def test_trie_loads_full_density_and_segments(self, dict_file):
        from ragflow_core16_spark.textnorm.rag_tokenizer import RagTokenizer
        path, words = dict_file
        t0 = time.time()
        tk = RagTokenizer(dict_path=path)
        load_sec = time.time() - t0
        # full density arrived (minus duplicate surface forms)
        assert len(tk._freq_str) >= self.N * 0.95
        # a realistic load budget: the reference loads huqie.txt once per
        # process at startup; >60 s would break that deployment shape
        assert load_sec < 60, f"dict load took {load_sec:.1f}s"
        # dictionary words drive max-match segmentation: a sentence of
        # three known entries segments into exactly those entries
        rng = random.Random(7)
        sample = [w for w in rng.sample(words, 200)
                  if w in tk._freq_str][:3]
        assert len(sample) == 3
        toks = tk.tokenize("".join(sample)).split()
        for w in sample:
            assert w in toks, (w, toks)

    def test_freq_log_roundtrip_matches_reference_formula(self, dict_file):
        """freq() must invert the trie's log-compressed storage the way
        the reference does (rag_tokenizer.py key math) even at full
        density — spot-check 50 entries."""
        from ragflow_core16_spark.textnorm.rag_tokenizer import (
            DENOMINATOR, RagTokenizer)
        path, _words = dict_file
        tk = RagTokenizer(dict_path=path)
        rng = random.Random(11)
        raw = {}
        with open(path, encoding="utf-8") as f:
            for ln in f:
                w, fr, _pos = ln.split()
                raw[w] = max(int(fr), raw.get(w, 0))
        for w in rng.sample(sorted(raw), 50):
            F = int(math.log(float(raw[w]) / DENOMINATOR) + .5)
            want = int(math.exp(F) * DENOMINATOR + 0.5)
            assert tk.freq(w) == want, w


class TestTiktokenVocabAtScale:
    N_TOKENS = 100_000

    @pytest.fixture(scope="class")
    def vocab_file(self, tmp_path_factory):
        """A cl100k-shaped ranks file: 256 byte singles, a prefix-closed
        merge chain for a probe word, then ~100k filler tokens — dumped
        through textnorm/bpe.dump_vocab (the format RAG_TIKTOKEN_VOCAB
        loads)."""
        from ragflow_core16_spark.textnorm.bpe import dump_vocab
        ranks = {bytes([b]): b for b in range(256)}
        r = 256
        # prefix-closed merges so " tokenizer"-style behavior is real:
        # 'th' 'the' ' th' ' the' (as cl100k has)
        for tok in (b"th", b"the", b" t", b" th", b" the"):
            ranks[tok] = r
            r += 1
        rng = random.Random(99)
        while r < 256 + self.N_TOKENS:
            n = rng.randint(2, 9)
            tok = bytes(rng.randint(97, 122) for _ in range(n))
            if tok not in ranks:
                ranks[tok] = r
                r += 1
        path = tmp_path_factory.mktemp("bpe") / "synth_100k.tiktoken"
        dump_vocab(ranks, str(path))
        return str(path), ranks

    def test_env_routed_encoder_loads_and_merges(self, vocab_file,
                                                 monkeypatch):
        from ragflow_core16_spark.textnorm import bpe
        path, ranks = vocab_file
        monkeypatch.setenv("RAG_TIKTOKEN_VOCAB", path)
        t0 = time.time()
        enc = bpe.default_encoder()
        load_sec = time.time() - t0
        assert load_sec < 30, f"vocab load took {load_sec:.1f}s"
        # the prefix-closed chain must merge exactly as tiktoken would:
        # "the" → 1 token, " the" → 1 token (pretokenized together)
        assert enc.count("the") == 1
        assert enc.encode_piece(b" the") == [b" the"]
        # unknown-word fallback: per-byte tokens
        assert enc.count("zzzq") <= 4
        # flipping the env var mid-process re-routes (documented cache
        # contract)
        monkeypatch.delenv("RAG_TIKTOKEN_VOCAB")
        assert bpe.default_encoder() is not enc

    def test_loader_rejects_malformed_dump(self, tmp_path, monkeypatch):
        from ragflow_core16_spark.textnorm import bpe
        bad = tmp_path / "bad.tiktoken"
        bad.write_bytes(b"!!!notbase64 0\n")
        monkeypatch.setenv("RAG_TIKTOKEN_VOCAB", str(bad))
        with pytest.raises(Exception):
            bpe.default_encoder()


class TestWordnetNounsAtScale:
    N = 100_000

    def test_env_lexicon_drives_morphy(self, tmp_path, monkeypatch):
        from ragflow_core16_spark.textnorm import morphy as M
        rng = random.Random(5)
        words = sorted({"".join(rng.choice("bcdfglmnprstvzaeiou")
                                for _ in range(rng.randint(4, 12)))
                        for _ in range(self.N)})
        # deterministic probe lemmas whose plurals the rules must strip
        words += ["zorbax", "quingle"]
        path = tmp_path / "nouns.txt"
        path.write_text("\n".join(words), encoding="utf-8")
        monkeypatch.setenv("RAG_WORDNET_NOUNS", str(path))
        t0 = time.time()
        lex = M._load_lexicon()
        load_sec = time.time() - t0
        assert load_sec < 30
        assert len(lex) >= len(set(words))
        monkeypatch.setattr(M, "_LEXICON", lex)
        assert "zorbax" in M.morphy("zorbaxes")
        assert "quingle" in M.morphy("quingles")
        # irregulars still resolve with the full lexicon in force
        assert "foot" in M.morphy("feet")
