"""Citation insertion — re-implementation of ``Dealer.insert_citations``
(``rag/nlp/search.py:158-245``) semantics:

  * answer split into sentence pieces by the punctuation regex
    ``([^\\|][；。？!！\\n]|[a-z][.?;!][ \\n])`` with code-fence (```)
    blocks kept whole and the split-consumed boundary char re-attached to
    the preceding piece (search.py:163-186);
  * pieces shorter than 5 chars are not citable (search.py:190-193);
  * per piece, hybrid similarity vs every chunk at tkweight=0.1 /
    vtweight=0.9 (search.py:203-209); a chunk is cited when
    sim > 0.99 · max-sim-of-the-piece, at most 4 chunks per piece
    (search.py:214-216);
  * decaying admission threshold: thr starts at 0.63 and is multiplied by
    0.8 until any piece admits a citation or thr ≤ 0.3
    (search.py:211-217) — effective thr levels 0.63, 0.504, 0.4032,
    0.32256;
  * output: answer with `` ##i$$`` markers after cited pieces, each chunk
    cited at most once overall (search.py:219-235).

Deterministic divergence (documented): the reference takes the first 4 of
``list(set(...))`` — Python set order; here the 4 *lowest chunk indices*
are taken so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

import re

import numpy as np

PIECE_SPLIT = r"([^\|][；。？!！\n]|[a-z][.?;!][ \n])"
THR_LEVELS = (0.63, 0.63 * 0.8, 0.63 * 0.64, 0.63 * 0.512)


def split_pieces(answer: str) -> tuple[list[str], list[int]]:
    """→ (all pieces, indices of citable pieces ≥5 chars).

    Mirrors search.py:163-193 including the code-fence pass."""
    pieces = re.split(r"(```)", answer)
    if len(pieces) >= 3:
        i = 0
        pieces_ = []
        while i < len(pieces):
            if pieces[i] == "```":
                st = i
                i += 1
                while i < len(pieces) and pieces[i] != "```":
                    i += 1
                if i < len(pieces):
                    i += 1
                pieces_.append("".join(pieces[st:i]) + "\n")
            else:
                pieces_.extend(re.split(PIECE_SPLIT, pieces[i]))
                i += 1
        pieces = pieces_
    else:
        pieces = re.split(PIECE_SPLIT, answer)
    for i in range(1, len(pieces)):
        if re.match(PIECE_SPLIT, pieces[i]):
            pieces[i - 1] += pieces[i][0]
            pieces[i] = pieces[i][1:]
    idx = [i for i, t in enumerate(pieces) if len(t) >= 5]
    return pieces, idx


def effective_threshold(piece_max_sims: list[float]) -> float | None:
    """Closed form of the reference's while-loop (search.py:211-217): the
    highest thr level admitted by any piece (mx = 0.99·max ≥ thr), else
    None (no citations)."""
    if not piece_max_sims:
        return None
    best_mx = 0.99 * max(piece_max_sims)
    for thr in THR_LEVELS:
        if best_mx >= thr:
            return thr
    return None


def insert_citations(answer: str, chunks: list[str], chunk_v,
                     piece_vecs, queryer=None,
                     tkweight: float = 0.1, vtweight: float = 0.9,
                     ) -> tuple[str, set]:
    """Local (single-document) citation insertion.  ``piece_vecs`` is a
    callable ``list[str] -> list[vector]`` standing in for the reference's
    ``embd_mdl.encode`` (an external service there)."""
    from .query import FulltextQueryer

    if not chunks:
        return answer, set()
    qryr = queryer or FulltextQueryer()
    pieces, idx = split_pieces(answer)
    pieces_ = [pieces[i] for i in idx]
    if not pieces_:
        return answer, set()

    from .rag_tokenizer import tokenize as rag_tokenize

    ans_v = piece_vecs(pieces_)
    # reference (search.py:209-218) tokenizes via rag_tokenizer.tokenize
    # (stemming + CJK segmentation), not bare whitespace split
    chunks_tks = [rag_tokenize(qryr.rmWWW(ck)).split() for ck in chunks]
    piece_tks = [rag_tokenize(qryr.rmWWW(p)).split() for p in pieces_]

    sims = np.array([
        qryr.hybrid_similarity(ans_v[i], chunk_v, piece_tks[i], chunks_tks,
                               tkweight, vtweight)
        for i in range(len(pieces_))])
    mxs = [float(np.max(s)) for s in sims]
    thr = effective_threshold(mxs)
    cites: dict[int, list[str]] = {}
    if thr is not None:
        for i in range(len(pieces_)):
            mx = mxs[i] * 0.99
            if mxs[i] * 0.99 < thr:
                continue
            hit = sorted(ii for ii in range(len(chunks))
                         if sims[i][ii] > mx)[:4]
            cites[idx[i]] = [str(ii) for ii in hit]

    res, seted = "", set()
    for i, p in enumerate(pieces):
        res += p
        if i not in cites:
            continue
        for c in cites[i]:
            if c in seted:
                continue
            res += f" ##{c}$$"
            seted.add(c)
    return res, seted
