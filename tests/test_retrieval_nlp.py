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


class TestInsertCitations:
    """Citation insertion (search.py:158-245 semantics)."""

    def test_split_pieces_sentences(self):
        from ragflow_core16_spark.textnorm.citations import split_pieces
        pieces, idx = split_pieces("the engine can sort. a query will scan. ok")
        joined = "".join(pieces)
        assert joined == "the engine can sort. a query will scan. ok"
        # boundary char re-attached to the sentence; the ". " separator
        # stays its own (non-citable) piece — reference search.py:183-186
        citable = [pieces[i] for i in idx]
        assert citable == ["the engine can sort", "a query will scan"]
        # "ok" (<5 chars) and ". " separators are not citable
        assert all(len(pieces[i]) >= 5 for i in idx)

    def test_split_pieces_code_fence_kept_whole(self):
        from ragflow_core16_spark.textnorm.citations import split_pieces
        ans = "intro text here. ```code. block``` after text done."
        pieces, idx = split_pieces(ans)
        fenced = [p for p in pieces if p.startswith("```")]
        assert len(fenced) == 1 and "code. block" in fenced[0]

    def test_effective_threshold_decay(self):
        from ragflow_core16_spark.textnorm.citations import effective_threshold
        assert effective_threshold([0.9]) == 0.63
        # 0.99*0.52 = 0.5148 → second level 0.504
        assert abs(effective_threshold([0.52]) - 0.63 * 0.8) < 1e-9
        assert effective_threshold([0.2]) is None
        assert effective_threshold([]) is None

    def test_insert_citations_markers(self):
        from ragflow_core16_spark.textnorm.citations import insert_citations
        chunks = ["spark engine sorts batches fast",
                  "the moon orbits the earth slowly"]
        chunk_v = [[1.0, 0.0], [0.0, 1.0]]
        # piece 0 ≈ chunk 0 (cos=1), piece about moon ≈ chunk 1
        vecs = {"the spark engine sorts": [1.0, 0.0],
                "the moon orbits": [0.0, 1.0]}
        res, cited = insert_citations(
            "the spark engine sorts. the moon orbits. ",
            chunks, chunk_v, lambda ps: [vecs[p] for p in ps])
        assert cited == {"0", "1"}
        # marker lands after the sentence text, before the ". " separator
        assert "sorts ##0$$. " in res and "orbits ##1$$. " in res

    def test_insert_citations_no_chunks(self):
        from ragflow_core16_spark.textnorm.citations import insert_citations
        res, cited = insert_citations("anything goes here.", [], [],
                                      lambda ps: [])
        assert res == "anything goes here." and cited == set()

    def test_insert_citations_below_threshold(self):
        from ragflow_core16_spark.textnorm.citations import insert_citations
        # orthogonal vector + no token overlap → sim ≈ 0 → no citations
        res, cited = insert_citations(
            "completely unrelated sentence here. ",
            ["zzz yyy xxx"], [[1.0, 0.0]], lambda ps: [[0.0, 1.0]])
        assert cited == set() and "##" not in res
