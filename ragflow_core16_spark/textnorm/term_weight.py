"""Query-side term weighting — re-implementation of
``rag/nlp/term_weight.py:25-244`` semantics:

  * ``pretoken``   tokenize + stopword strip + punct masking
  * ``tokenMerge`` single-char run re-merge (CJK 多-工位 style)
  * ``split``      adjacent-English re-join (non-func NER)
  * ``weights``    blend 0.3·idf(freq) + 0.7·idf(df), scaled by NER-class ×
                   POS-class multipliers, normalized to sum 1

Dictionaries (``ner.json``, ``term.freq``) load from paths given via
``RAG_NER_DICT`` / ``RAG_TERMFREQ_DICT`` env (they are deployment assets,
like the tokenizer trie); empty fallbacks preserve the weight formula with
neutral class multipliers.
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np

from .rag_tokenizer import get_tokenizer

STOP_WORDS = set(
    "请问 您 你 我 他 是 的 就 有 于 及 即 在 为 最 有 从 以 了 将 与 吗 吧 中 # "
    "什么 怎么 哪个 哪些 啥 相关".split())


class TermWeightDealer:
    def __init__(self, ner_path: str | None = None,
                 termfreq_path: str | None = None):
        self.stop_words = set(STOP_WORDS)
        self.ne: dict = {}
        self.df: dict = {}
        ner_path = ner_path or os.environ.get("RAG_NER_DICT")
        termfreq_path = termfreq_path or os.environ.get("RAG_TERMFREQ_DICT")
        if ner_path and os.path.exists(ner_path):
            try:
                self.ne = json.load(open(ner_path))
            except Exception:
                pass
        if termfreq_path and os.path.exists(termfreq_path):
            try:
                self.df = self._load_dict(termfreq_path)
            except Exception:
                pass

    @staticmethod
    def _load_dict(fnm):
        res = {}
        with open(fnm) as f:
            for line in f:
                arr = line.rstrip("\n").split("\t")
                res[arr[0]] = int(arr[1]) if len(arr) >= 2 else 0
        if sum(res.values()) == 0:
            return set(res.keys())
        return res

    # ------------------------------------------------------------------
    def pretoken(self, txt, num=False, stpwd=True):
        patt = [r"[~—\t @#%!<>,\.\?\":;'\{\}\[\]_=\(\)\|，。？》•●○↓《；‘’：“”【¥ 】…￥！、·（）×`&\\/「」\\]"]
        res = []
        for t in get_tokenizer().tokenize(txt).split():
            tk = t
            if (stpwd and tk in self.stop_words) or (
                    re.match(r"[0-9]$", tk) and not num):
                continue
            for p in patt:
                if re.match(p, t):
                    tk = "#"
                    break
            if tk != "#" and tk:
                res.append(tk)
        return res

    def tokenMerge(self, tks):
        def one_term(t):
            return len(t) == 1 or re.match(r"[0-9a-z]{1,2}$", t)

        res, i = [], 0
        while i < len(tks):
            j = i
            if i == 0 and one_term(tks[i]) and len(tks) > 1 \
                    and (len(tks[i + 1]) > 1
                         and not re.match(r"[0-9a-zA-Z]", tks[i + 1])):
                res.append(" ".join(tks[0:2]))
                i = 2
                continue
            while j < len(tks) and tks[j] and tks[j] not in self.stop_words \
                    and one_term(tks[j]):
                j += 1
            if j - i > 1:
                if j - i < 5:
                    res.append(" ".join(tks[i:j]))
                    i = j
                else:
                    res.append(" ".join(tks[i:i + 2]))
                    i = i + 2
            else:
                if len(tks[i]) > 0:
                    res.append(tks[i])
                i += 1
        return [t for t in res if t]

    def ner(self, t):
        return self.ne.get(t, "") if self.ne else ""

    def split(self, txt):
        tks = []
        for t in re.sub(r"[ \t]+", " ", txt).split():
            if tks and re.match(r".*[a-zA-Z]$", tks[-1]) \
                    and re.match(r".*[a-zA-Z]$", t) \
                    and self.ne.get(t, "") != "func" \
                    and self.ne.get(tks[-1], "") != "func":
                tks[-1] = tks[-1] + " " + t
            else:
                tks.append(t)
        return tks

    # ------------------------------------------------------------------
    def weights(self, tks, preprocess=True):
        tok = get_tokenizer()

        def ner(t):
            if re.match(r"[0-9,.]{2,}$", t):
                return 2
            if re.match(r"[a-z]{1,2}$", t):
                return 0.01
            if not self.ne or t not in self.ne:
                return 1
            m = {"toxic": 2, "func": 1, "corp": 3, "loca": 3, "sch": 3,
                 "stock": 3, "firstnm": 1}
            return m.get(self.ne[t], 1)

        def postag(t):
            tg = tok.tag(t)
            if tg in ("r", "c", "d"):
                return 0.3
            if tg in ("ns", "nt"):
                return 3
            if tg == "n":
                return 2
            if re.match(r"[0-9-]+", tg):
                return 2
            return 1

        def freq(t):
            if re.match(r"[0-9. -]{2,}$", t):
                return 3
            s = tok.freq(t)
            if not s and re.match(r"[a-z. -]+$", t):
                return 300
            if not s:
                s = 0
            if not s and len(t) >= 4:
                sub = [tt for tt in tok.fine_grained_tokenize(t).split()
                       if len(tt) > 1]
                if len(sub) > 1:
                    s = np.min([freq(tt) for tt in sub]) / 6.0
                else:
                    s = 0
            return max(s, 10)

        def df(t):
            if re.match(r"[0-9. -]{2,}$", t):
                return 5
            if isinstance(self.df, dict) and t in self.df:
                return self.df[t] + 3
            elif re.match(r"[a-z. -]+$", t):
                return 300
            elif len(t) >= 4:
                sub = [tt for tt in tok.fine_grained_tokenize(t).split()
                       if len(tt) > 1]
                if len(sub) > 1:
                    return max(3, np.min([df(tt) for tt in sub]) / 6.0)
            return 3

        def idf(s, N):
            return math.log10(10 + ((N - s + 0.5) / (s + 0.5)))

        tw = []
        if not preprocess:
            idf1 = np.array([idf(freq(t), 10000000) for t in tks])
            idf2 = np.array([idf(df(t), 1000000000) for t in tks])
            wts = (0.3 * idf1 + 0.7 * idf2) * \
                np.array([ner(t) * postag(t) for t in tks])
            tw = list(zip(tks, list(wts)))
        else:
            for tk in tks:
                tt = self.tokenMerge(self.pretoken(tk, True))
                idf1 = np.array([idf(freq(t), 10000000) for t in tt])
                idf2 = np.array([idf(df(t), 1000000000) for t in tt])
                wts = (0.3 * idf1 + 0.7 * idf2) * \
                    np.array([ner(t) * postag(t) for t in tt])
                tw.extend(zip(tt, list(wts)))

        S = np.sum([s for _, s in tw])
        if not S:
            return []
        return [(t, s / S) for t, s in tw]
