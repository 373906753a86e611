"""Query compile + hybrid similarity — re-implementation of
``rag/nlp/query.py`` semantics:

  * ``rmWWW``        question-word stripping (CN patterns + EN stop list)
  * ``question``     → weighted term list, synonym OR-groups, adjacent
                     bigram phrase boosts (the MatchTextExpr content,
                     returned structured instead of as an ES query string)
  * ``similarity``   token-overlap similarity: Σ weights of matched query
                     terms / Σ query weights (query.py:228-240)
  * ``hybrid_similarity``  0.3·token + 0.7·cosine (search.py:274-311 rerank)

Synonyms: dict file via ``RAG_SYNONYM_DICT`` env (WordNet path of the
reference is an external model asset); empty fallback.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from .rag_tokenizer import get_tokenizer, is_chinese
from .term_weight import TermWeightDealer


class SynonymDealer:
    def __init__(self, path: str | None = None):
        self.dictionary = {}
        path = path or os.environ.get("RAG_SYNONYM_DICT")
        if path and os.path.exists(path):
            try:
                self.dictionary = json.load(open(path))
            except Exception:
                pass

    def lookup(self, tk, topn=8):
        res = self.dictionary.get(re.sub(r"[ \t]+", " ", tk.lower()), [])
        if isinstance(res, str):
            res = [res]
        return res[:topn]


class FulltextQueryer:
    def __init__(self, tw: TermWeightDealer | None = None,
                 syn: SynonymDealer | None = None):
        self.tw = tw or TermWeightDealer()
        self.syn = syn or SynonymDealer()

    @staticmethod
    def rmWWW(txt):
        patts = [
            (r"是*(什么样的|哪家|一下|那家|请问|啥样|咋样了|什么时候|何时|何地|何人|是否|是不是|多少|哪里|怎么|哪儿|怎么样|如何|哪些|是啥|啥是|啊|吗|呢|吧|咋|什么|有没有|呀|谁|哪位|哪个)是*", ""),
            (r"(^| )(what|who|how|which|where|why)('re|'s)? ", " "),
            (r"(^| )('s|'re|is|are|were|was|do|does|did|don't|doesn't|didn't|has|have|be|there|you|me|your|my|mine|just|please|may|i|should|would|wouldn't|will|won't|done|go|for|with|so|the|a|an|by|i'm|it's|he's|she's|they|they're|you're|as|by|on|in|at|up|out|down|of|to|or|and|if) ", " "),
        ]
        otxt = txt
        for r, p in patts:
            txt = re.sub(r, p, txt, flags=re.IGNORECASE)
        if not txt:
            txt = otxt
        return txt

    @staticmethod
    def is_chinese_query(line):
        arr = re.split(r"[ \t]+", line)
        if len(arr) <= 3:
            return True
        # emptiness guard FIRST — a leading/trailing/double space yields
        # '' tokens and t[0] would raise before a trailing `if t` runs
        zh = sum(1 for t in arr if t and is_chinese(t[0]))
        return zh >= len(arr) / 2

    def question(self, txt, min_match: float = 0.6):
        """→ (weighted_terms [(term, weight)], phrases [(bigram, weight)],
        keywords) — the structured content of the reference's MatchTextExpr
        (query.py:81-117 English path; the CN path shares the same shapes)."""
        tok = get_tokenizer()
        txt = re.sub(r"[ :|\r\n\t,，。？?/`!！&^%%()\[\]{}<>]+", " ",
                     tok._tradi2simp(tok._strQ2B(txt.lower()))).strip()
        txt = self.rmWWW(txt)
        tks = tok.tokenize(txt).split()
        keywords = [t for t in tks if t]
        tks_w = self.tw.weights(tks, preprocess=False)
        tks_w = [(re.sub(r"[ \\\"'^]", "", tk), w) for tk, w in tks_w]
        tks_w = [(re.sub(r"^[a-z0-9]$", "", tk), w) for tk, w in tks_w if tk]
        tks_w = [(re.sub(r"^[\+-]", "", tk), w) for tk, w in tks_w if tk]
        tks_w = [(tk.strip(), w) for tk, w in tks_w if tk.strip()]
        terms = []
        for tk, w in tks_w[:256]:
            if not tk or re.match(r"[.^+\(\)-]", tk):
                continue
            terms.append((tk, w))
            for s in self.syn.lookup(tk):
                s = tok.tokenize(s).strip()
                if s:
                    keywords.append(s)
                    terms.append((s, w / 4.0))
        phrases = []
        for i in range(1, len(tks_w)):
            left, right = tks_w[i - 1][0].strip(), tks_w[i][0].strip()
            if not left or not right:
                continue
            phrases.append((f"{left} {right}",
                            max(tks_w[i - 1][1], tks_w[i][1]) * 2))
        return terms, phrases, keywords

    # -- similarities -----------------------------------------------------
    def _to_weight_dict(self, tks) -> dict:
        """token list/str → {term: summed weight} (query.py:218-226 toDict)."""
        if isinstance(tks, str):
            tks = tks.split()
        d: dict = {}
        for t, c in self.tw.weights(tks, preprocess=False):
            d[t] = d.get(t, 0.0) + c
        return d

    def token_similarity(self, atks, btkss):
        """Per-chunk token-overlap similarity (query.py:214-227)."""
        a = self._to_weight_dict(atks)
        return [self.similarity(a, self._to_weight_dict(b)) for b in btkss]

    def similarity(self, qtwt, dtwt):
        """Token-overlap: Σ matched query weights / Σ query weights."""
        if isinstance(dtwt, str):
            dtwt = dict(self.tw.weights(self.tw.split(dtwt), preprocess=False))
        if isinstance(qtwt, str):
            qtwt = dict(self.tw.weights(self.tw.split(qtwt), preprocess=False))
        s = 1e-9
        for k, v in qtwt.items():
            if k in dtwt:
                s += v
        q = 1e-9
        for v in qtwt.values():
            q += v
        return s / q

    def hybrid_similarity(self, qvec, dvecs, qtwt, dtwts,
                          tkweight=0.3, vtweight=0.7):
        """rerank fusion (search.py:274-311): 0.3·token + 0.7·cosine."""
        q = np.asarray(qvec, dtype=float)
        if not isinstance(qtwt, dict):
            qtwt = self._to_weight_dict(qtwt)
        sims = []
        for dv, dt in zip(dvecs, dtwts):
            d = np.asarray(dv, dtype=float)
            denom = (np.linalg.norm(q) * np.linalg.norm(d)) or 1e-9
            cos = float(np.dot(q, d) / denom)
            if not isinstance(dt, dict):
                dt = self._to_weight_dict(dt)
            tksim = self.similarity(qtwt, dt)
            sims.append(tkweight * tksim + vtweight * cos)
        return sims
