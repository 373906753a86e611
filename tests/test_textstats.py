"""Corpus-statistics operators: BM25 against an independent pure-Python
scorer, CCNet perplexity buckets against the published tercile semantics."""

import math
from collections import Counter

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    from conftest import formatted_plan
    return formatted_plan(df)


def _doc_tokens(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    return {r["doc_id"]: " ".join(r["text"].lower().split()).split(" ")
            for r in rows}, {r["doc_id"]: r["lang"] for r in rows}


class TestBm25:
    def test_matches_pure_python_okapi(self, spark):
        from ragflow_core16_spark.operators.retrieval import (
            _BM25_B, _BM25_K1, QUERY_TERMS, TOP_N, bm25_topn)
        toks, _ = _doc_tokens(spark)
        n = len(toks)
        avgdl = sum(len(t) for t in toks.values()) / n
        df = {q: sum(1 for t in toks.values() if q in t)
              for q in QUERY_TERMS}
        scores = {}
        for d, t in toks.items():
            c = Counter(t)
            s = 0.0
            for q in QUERY_TERMS:
                tf = c.get(q, 0)
                if not tf:
                    continue
                idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
                s += idf * tf * (_BM25_K1 + 1.0) / (
                    tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * len(t) / avgdl))
            if s:
                scores[d] = round(s, 4)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
        got = [(r["doc_id"], r["bm25"]) for r in bm25_topn(spark, SF).collect()]
        assert got == want

    def test_plan_broadcasts_and_topk(self, spark):
        from ragflow_core16_spark.operators.retrieval import bm25_topn
        plan = _formatted(bm25_topn(spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "TakeOrderedAndProject" in plan


class TestCcnetBucket:
    def test_terciles_per_language(self, spark):
        from ragflow_core16_spark.operators.textstats import ccnet_bucket
        rows = ccnet_bucket(spark, SF).collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r)
        assert len(by_lang) >= 3
        for lang, rs in by_lang.items():
            n = len(rs)
            counts = Counter(r["bucket"] for r in rs)
            # exact rank terciles: head gets floor(n/3), tail the remainder
            assert counts["head"] == n // 3, (lang, counts)
            assert counts["head"] + counts["middle"] + counts["tail"] == n
            # score ordering respects the buckets
            h = [r["ppl_score"] for r in rs if r["bucket"] == "head"]
            m = [r["ppl_score"] for r in rs if r["bucket"] == "middle"]
            t = [r["ppl_score"] for r in rs if r["bucket"] == "tail"]
            assert max(h) <= min(m) and max(m) <= min(t)

    def test_score_matches_pure_python_lm(self, spark):
        from ragflow_core16_spark.operators.textstats import ccnet_bucket
        toks, langs = _doc_tokens(spark)
        freqs, totals = {}, Counter()
        for d, t in toks.items():
            lang = langs[d]
            c = freqs.setdefault(lang, Counter())
            c.update(t)
        got = {r["doc_id"]: r["ppl_score"]
               for r in ccnet_bucket(spark, SF).collect()}
        for d, t in list(toks.items())[:50]:
            lm = freqs[langs[d]]
            denom = sum(lm.values()) + len(lm)
            want = round(-sum(math.log((lm[w] + 1.0) / denom)
                              for w in t) / len(t), 6)
            assert abs(got[d] - want) < 2e-6, (d, got[d], want)


class TestReadability:
    def test_matches_pure_python(self, spark):
        import re

        from ragflow_core16_spark.operators.textstats import (
            readability_scores)
        got = {r["doc_id"]: r
               for r in readability_scores(spark, SF).collect()}
        rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
        for row in rows[:80]:
            text = row["text"]
            words = text.strip().lower().split()
            n_w = max(len(words), 1)
            n_s = max(len(re.findall(r"[.!?]+", text)), 1)
            syl = sum(max(len(re.findall(r"[aeiouy]+", w)), 1)
                      for w in words)
            # compare against the UNROUNDED formula (Python round() is
            # banker's, Spark's is half-up — they differ at .xxxx5 exactly)
            ease = 206.835 - 1.015 * n_w / n_s - 84.6 * syl / n_w
            grade = 0.39 * n_w / n_s + 11.8 * syl / n_w - 15.59
            r = got[row["doc_id"]]
            assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == \
                (n_w, n_s, syl)
            assert abs(r["flesch_ease"] - ease) <= 5.1e-5
            assert abs(r["fk_grade"] - grade) <= 5.1e-5


class TestTfidfKeywords:
    def test_matches_pure_python_tfidf(self, spark):
        from collections import Counter

        from ragflow_core16_spark.operators.textstats import (
            _KW_MAX_DF_DEN, _KW_MAX_DF_NUM, _KW_TOP_K, tfidf_keywords)
        toks, _ = _doc_tokens(spark)
        n = len(toks)
        df = Counter()
        for t in toks.values():
            df.update(set(t))
        dropped = {w for w, c in df.items()
                   if c * _KW_MAX_DF_DEN > n * _KW_MAX_DF_NUM}
        assert dropped, "the max_df stopword gate must drop something"
        want = {}
        for d, t in toks.items():
            tf = Counter(t)
            scored = sorted(
                ((tf[w] * 1_000_000 // df[w], w) for w in tf
                 if w not in dropped), key=lambda s: (-s[0], s[1]))
            want[d] = [(i + 1, w, tf[w], df[w], s)
                       for i, (s, w) in enumerate(scored[:_KW_TOP_K])]
        got = {}
        for r in tfidf_keywords(spark, SF).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["rank"], r["term"], r["tf"], r["df"], r["score_ppm"]))
        assert got == {d: v for d, v in want.items() if v}

    def test_plan_no_driver_count_broadcast_total(self, spark):
        from ragflow_core16_spark.operators.textstats import _tfidf_ranked
        plan = _formatted(_tfidf_ranked(spark, SF))
        # the corpus total joins in as a broadcast, not a collected scalar
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


class TestKnBigram:
    """Interpolated Kneser-Ney bigram LM (kn_bigram_logprob)."""

    def _model(self, toks):
        """Pure-Python KN reference over the same whitespace tokens."""
        from collections import Counter
        bg = Counter()
        for t in toks.values():
            for a, b in zip(t, t[1:]):
                bg[(a, b)] += 1
        ctx = Counter(); n1_fwd = Counter(); n1_back = Counter()
        for (a, b), c in bg.items():
            ctx[a] += c
            n1_fwd[a] += 1
            n1_back[b] += 1
        types = len(bg)
        D = 0.75

        def p(a, b):
            return (max(bg[(a, b)] - D, 0.0) / ctx[a]
                    + (D * n1_fwd[a] / ctx[a]) * (n1_back[b] / types))
        return bg, ctx, n1_fwd, n1_back, types, p

    def test_matches_pure_python_kn(self, spark):
        from ragflow_core16_spark.operators.textstats import \
            kn_bigram_logprob
        import math
        toks, _ = _doc_tokens(spark)
        _bg, _ctx, _f, _b, _types, p = self._model(toks)
        want = {}
        for d, t in toks.items():
            if len(t) < 2:
                continue
            s = sum(int(round(math.log(p(a, b)) * 1e6))
                    for a, b in zip(t, t[1:]))
            n = len(t) - 1
            want[d] = (-((-s) // n) / 1e6, n)
        got = {r["doc_id"]: (r["mean_logprob"], r["n_bigrams"])
               for r in kn_bigram_logprob(spark, SF).collect()}
        assert got == want

    def test_kn_distribution_sums_to_one(self, spark):
        """Σ_b P(b|a) = 1 for every context — the property that makes the
        smoothed model a real probability distribution (and the reason
        every scored logprob is finite and negative)."""
        toks, _ = _doc_tokens(spark)
        bg, ctx, _f, _b, _types, p = self._model(toks)
        vocab = {b for (_a, b) in bg}
        import itertools
        for a in list(ctx)[:25]:
            total = sum(p(a, b) for b in vocab)
            assert abs(total - 1.0) < 1e-9

    def test_plan_broadcasts_stats(self, spark):
        from ragflow_core16_spark.operators.textstats import \
            kn_bigram_logprob
        plan = _formatted(kn_bigram_logprob(spark, SF))
        assert "BroadcastHashJoin" in plan
        # in-row pair construction: no window exchange for the bigrams
        assert "Window" not in plan


class TestHits:
    def test_matches_pure_python_hits(self, spark):
        """Integer-exact HITS vs an independent pure-Python evaluator over
        the same md5-derived edge set."""
        import hashlib
        from ragflow_core16_spark.operators.graph import (N_ITER, PPM, hits)
        SF0 = "/root/testdata/sf0.001"
        ids = sorted(r["doc_id"] for r in
                     spark.read.parquet(f"{SF0}/documents.parquet")
                     .select("doc_id").collect())
        n = len(ids)
        edges = []
        for d in ids:
            for k in range(1, d % 3 + 2):
                dst = int(hashlib.md5(f"{d}:{k}".encode())
                          .hexdigest()[:15], 16) % n
                edges.append((d, dst))
        h = {d: PPM for d in ids}
        a = {}
        for _ in range(N_ITER):
            raw = {}
            for s, t in edges:
                raw[t] = raw.get(t, 0) + h[s]
            m = max(raw.values())
            a = {d: raw.get(d, 0) * PPM // m for d in ids}
            raw = {}
            for s, t in edges:
                raw[s] = raw.get(s, 0) + a[t]
            m = max(raw.values())
            h = {d: raw.get(d, 0) * PPM // m for d in ids}
        want = sorted(((d, h[d], a[d]) for d in ids),
                      key=lambda r: (-r[2], -r[1], r[0]))[:50]
        got = [(r["doc_id"], r["h_ppm"], r["a_ppm"])
               for r in hits(spark, SF0).collect()]
        assert got == want
