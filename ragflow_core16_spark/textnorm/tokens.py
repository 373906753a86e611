"""Deterministic token counting for chunk budgeting.

Reference: ``rag/utils/__init__.py:77-90`` uses tiktoken's ``cl100k_base``
encoding for ``num_tokens_from_string``.  tiktoken (and its vocabulary file)
is not available in this environment, so this module implements a
deterministic, pure-Python counter that mirrors cl100k's *pre-tokenizer*
split (the public regex from the tiktoken source) and estimates per-piece
token counts from byte length.  The chunk-boundary *algorithm* (close-late
rule, ``naive_merge``) is reproduced exactly; the counts feeding it come
from this counter.  Swapping in real tiktoken at deployment is a one-line
change (`set_counter`).

Why not ship the cl100k vocab: it is a 1.6 MB external artifact fetched at
runtime by tiktoken — the same class of stripped asset as the reference's
``huqie.txt`` trie (see SURVEY.md §0).  The per-url extracted *text* bytes —
the north-rule invariant — do not depend on token counts; only chunk
boundaries do, and those are deterministic given this counter.

Performance: called per section inside Arrow-batched UDFs.  The regex is
compiled once per process; counting is O(len).  A 128-token budget means
sections are short, so this is not the bottleneck (the DOM parse is).
"""

from __future__ import annotations

import re
from math import ceil

# cl100k_base pre-tokenizer pattern, re-expressed for stdlib `re`
# (original uses \p{L}/\p{N}; here [^\W\d_] = unicode letters, \d = digits).
_PIECE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"          # English contractions
    r"| ?[^\W\d_]+"                   # optional space + letter run
    r"| ?\d{1,3}"                     # optional space + up to 3 digits
    # optional space + punctuation run — cl100k's class is
    # [^\s\p{L}\p{N}], which INCLUDES '_' (and Pc connectors); stdlib
    # [^\s\w] alone would drop them since '_' is \w
    r"| ?(?:[^\s\w]|_)+[\r\n]*"
    r"|\s*[\r\n]+"                    # newlines
    r"|\s+"                           # other whitespace
    r"|\S",                           # totality: BPE encodes every byte
    re.UNICODE,
)

# CJK unified ideographs + extensions + kana + hangul: cl100k encodes most
# common CJK chars as 1 token, rarer ones as 2-3; 1/char is the deterministic
# approximation used here.
_CJK = re.compile(
    r"[぀-ヿ㐀-䶿一-鿿가-힯豈-﫿]"
)


def _piece_tokens(piece: str) -> int:
    cjk = 0 if piece.isascii() else len(_CJK.findall(piece))
    rest = len(piece) - cjk
    n = cjk
    if rest > 0:
        # ~4.4 chars/token for English incl. the attached leading space;
        # short pieces are single tokens.
        n += 1 if rest <= 5 else ceil(rest / 4.4)
    return max(n, 1)


def _count_native(s: str) -> int:
    if not s:
        return 0
    pieces = _PIECE.findall(s)
    if s.isascii():
        # hot path (most web text): no CJK scan per piece; same arithmetic
        # (float ceil kept deliberately — int math differs at exact
        # multiples, e.g. ceil(22/4.4) == 6 in float)
        n = 0
        for p in pieces:
            lp = len(p)
            n += 1 if lp <= 5 else ceil(lp / 4.4)
        return n
    return sum(_piece_tokens(p) for p in pieces)


def _default_counter():
    """Real BPE when a vocab file is provided (RAG_TIKTOKEN_VOCAB, the
    standard .tiktoken dump — see textnorm/bpe.py), else the documented
    native approximation."""
    from .bpe import encoder_from_env
    enc = encoder_from_env()
    return enc.count if enc is not None else _count_native


# resolved lazily on first use so RAG_TIKTOKEN_VOCAB set after import (the
# normal driver order) still routes to the real BPE
_counter = None


def set_counter(fn) -> None:
    """Swap the token counter (e.g. for real tiktoken at deployment)."""
    global _counter
    _counter = fn


def num_tokens_from_string(s: str) -> int:
    """Mirror of rag/utils/__init__.py:83-88 (returns 0 on error)."""
    global _counter
    if _counter is None:
        _counter = _default_counter()
    try:
        return _counter(s)
    except Exception:
        return 0
