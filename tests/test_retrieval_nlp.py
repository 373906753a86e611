"""Query-compile / term-weight / rerank similarity tests."""

import pytest

from ragflow_core16_spark.textnorm.term_weight import TermWeightDealer
from ragflow_core16_spark.textnorm.query import FulltextQueryer, SynonymDealer


@pytest.fixture(scope="module")
def tw():
    return TermWeightDealer()


@pytest.fixture(scope="module")
def fq():
    return FulltextQueryer()


class TestTermWeights:
    def test_weights_sum_to_one(self, tw):
        ws = tw.weights(["spark", "data", "engine"], preprocess=False)
        assert abs(sum(w for _, w in ws) - 1.0) < 1e-9

    def test_short_latin_downweighted(self, tw):
        ws = dict(tw.weights(["ab", "engine"], preprocess=False))
        assert ws["ab"] < ws["engine"]

    def test_numbers_get_weight(self, tw):
        ws = dict(tw.weights(["2024,01", "value"], preprocess=False))
        assert ws["2024,01"] > 0

    def test_pretoken_stopwords(self, tw):
        toks = tw.pretoken("什么 是 spark")
        assert "什么" not in toks and "spark" in toks

    def test_token_merge_single_chars(self, tw):
        merged = tw.tokenMerge(["多", "工", "位", "engine"])
        assert any(" " in m for m in merged)

    def test_split_joins_english(self, tw):
        assert tw.split("big data 处理") == ["big data", "处理"]


class TestQuestion:
    def test_rmwww_en(self, fq):
        assert "what" not in FulltextQueryer.rmWWW("what is spark engine").lower().split()

    def test_rmwww_cn(self, fq):
        out = FulltextQueryer.rmWWW("什么是数据引擎")
        assert "什么" not in out

    def test_rmwww_keeps_nonempty(self, fq):
        assert FulltextQueryer.rmWWW("what is") != ""

    def test_question_terms_and_phrases(self, fq):
        terms, phrases, kws = fq.question("what is the spark data engine")
        term_strs = [t for t, _ in terms]
        assert "spark" in term_strs and "data" in term_strs
        assert any("spark data" in p for p, _ in phrases)
        # phrase boost = 2x max member weight
        tmap = dict(terms)
        for p, w in phrases:
            a, b = p.split()
            assert abs(w - 2 * max(tmap.get(a, 0), tmap.get(b, 0))) < 1e-9

    def test_synonym_expansion(self, tmp_path):
        import json
        p = tmp_path / "syn.json"
        json.dump({"spark": ["flink"]}, open(p, "w"))
        fq = FulltextQueryer(syn=SynonymDealer(str(p)))
        terms, _, kws = fq.question("spark engine")
        tmap = dict(terms)
        assert "flink" in tmap and abs(tmap["flink"] - tmap["spark"] / 4) < 1e-9


class TestSimilarity:
    def test_token_overlap(self, fq):
        q = {"spark": 0.6, "engine": 0.4}
        d = {"spark": 0.3, "other": 0.7}
        assert abs(fq.similarity(q, d) - 0.6) < 1e-6

    def test_no_overlap_zero(self, fq):
        assert fq.similarity({"a": 1.0}, {"b": 1.0}) < 1e-6

    def test_hybrid_weights(self, fq):
        q = {"spark": 1.0}
        sims = fq.hybrid_similarity(
            [1.0, 0.0], [[1.0, 0.0], [0.0, 1.0]], q, [q, {"x": 1.0}])
        assert abs(sims[0] - (0.3 * 1.0 + 0.7 * 1.0)) < 1e-6
        assert sims[1] < 0.1
