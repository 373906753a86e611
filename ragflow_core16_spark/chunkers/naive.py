"""Greedy section→chunk packing (``naive_merge``), byte-exact port of the
reference algorithm's semantics (re-implemented, not copied).

Reference: ``rag/nlp/__init__.py:510-541``.  The subtle boundary rule (see
SURVEY.md §7.3): a new chunk starts only when the *previous* chunk's token
count already EXCEEDS ``chunk_token_num`` — i.e. chunks close late, after
going over budget.  Token counts are per raw section (``textnorm.tokens``).
The position-tag suffix rules (``pos`` append when ≥8 tokens and not already
present) are preserved even though the HTML path always has ``pos == ""``.

This is inherently sequential per document, so it runs inside the per-url
Arrow batch in the extraction UDF — never as a DataFrame-level loop.
"""

from __future__ import annotations

from ..textnorm.tokens import num_tokens_from_string


def naive_merge(sections, chunk_token_num: int = 128,
                delimiter: str = "\n。；！？") -> list[str]:
    return naive_merge_with_counts(sections, chunk_token_num, delimiter)[0]


def naive_merge_with_counts(sections, chunk_token_num: int = 128,
                            delimiter: str = "\n。；！？"):
    """naive_merge that also returns per-chunk token sums (the running
    ``tk_nums`` the boundary rule is driven by) — callers that need chunk
    token counts reuse these instead of re-counting the joined text."""
    if not sections:
        return [], []
    if isinstance(sections[0], str):
        sections = [(s, "") for s in sections]
    cks = [""]
    tk_nums = [0]

    def add_chunk(t: str, pos: str):
        tnum = num_tokens_from_string(t)
        if not pos:
            pos = ""
        if tnum < 8:
            pos = ""
        if tk_nums[-1] > chunk_token_num:
            # previous chunk already over budget → close it, start new
            if t.find(pos) < 0:
                t += pos
            cks.append(t)
            tk_nums.append(tnum)
        else:
            if cks[-1].find(pos) < 0:
                t += pos
            cks[-1] += t
            tk_nums[-1] += tnum

    for sec, pos in sections:
        add_chunk(sec, pos)

    return cks, tk_nums
