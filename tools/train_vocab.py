#!/usr/bin/env python
"""Train the engine's default byte-level BPE vocabulary.

The reference counts tokens with tiktoken's ``cl100k_base``
(``rag/utils/__init__.py:77-90``).  The cl100k RANKS FILE is a ~1.6 MB
runtime-fetched asset that cannot ship from this sandbox (no network), so
the engine ships a REAL trained vocabulary instead — produced by this
script, exact BPE end to end — and accepts the genuine cl100k dump as a
drop-in via ``RAG_TIKTOKEN_VOCAB`` (same .tiktoken format) for
deployment-exact parity.

Training design (mirrors the structure of cl100k itself):

* **Pre-tokenizer**: tiktoken's cl100k regex (``textnorm/bpe.py::_PRETOK``)
  splits the corpus; only LETTER pieces (optional single leading space +
  a letter run — the ``\\p{L}`` rule's output shape) enter merge training.
* **Digit tokens**: every 1-3 digit string is a single token (ranks
  256-1355), exactly cl100k's design — so any digit run costs
  ceil(len/3) tokens via the digit rule's greedy 3-splits.
* **Class purity**: no token mixes letters with digits, punctuation,
  or whitespace beyond the single leading space, and no token is built
  across pre-tokenizer pieces.  Punctuation runs therefore cost one
  token per byte.  (cl100k does carry punct merges; dropping them only
  makes counts slightly more conservative and keeps every downstream
  cost derivation closed-form.)
* **Corpus**: the repository's own committed documentation (pinned list
  below) — deterministic, public, and English-dense.  Merges are chosen
  by (max pair frequency, lexicographically smallest pair) so retraining
  on the same bytes reproduces the same ranks file bit-for-bit.

Output: ``ragflow_core16_spark/textnorm/assets/webspark_bpe.tiktoken``
(standard ``base64(token_bytes) rank`` dump, loadable by
``textnorm/bpe.py::load_vocab``).

Run from the repo root:  python tools/train_vocab.py [--merges N]
"""

from __future__ import annotations

import argparse
import base64
import os
import re
import sys
from collections import Counter, defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ragflow_core16_spark.textnorm.bpe import _PRETOK  # noqa: E402

# pinned corpus: committed repo documentation (order matters only for
# reproducibility of the byte stream, not for the histogram)
CORPUS_FILES = [
    "SURVEY.md", "README.md", "BASELINE.md", "TESTDATA.md", "FIXTURES.md",
    "PAPERS.md", "COVERAGE.md", "docs/NORTH_RULE.md", "docs/PLANS.md",
    "docs/R2_NOTES.md",
]

# a letter piece: optional single leading space + a unicode-letter run
_LETTER_PIECE = re.compile(r"^ ?[^\W\d_]+$", re.UNICODE)

DEFAULT_MERGES = 6000
MIN_PAIR_FREQ = 2


def piece_histogram() -> Counter:
    hist: Counter = Counter()
    for rel in CORPUS_FILES:
        with open(os.path.join(REPO, rel), encoding="utf-8") as f:
            text = f.read()
        for m in _PRETOK.finditer(text):
            p = m.group(0)
            if _LETTER_PIECE.match(p):
                hist[p.encode("utf-8")] += 1
            elif p and _LETTER_PIECE.match(p[1:] or " "):
                # the cl100k letter rule consumes ONE preceding non-letter
                # char ("(the", "`analysis"); credit the bare word so its
                # statistics aren't lost to punctuation context
                hist[p[1:].encode("utf-8")] += 1
    return hist


def train(hist: Counter, n_merges: int) -> list[tuple[bytes, bytes]]:
    """Classic BPE over a piece histogram with an incremental pair index
    (only pieces containing the merged pair are re-counted per round)."""
    seqs: dict[bytes, list[bytes]] = {
        p: [p[i:i + 1] for i in range(len(p))] for p in hist
    }
    pair_freq: Counter = Counter()
    pair_pieces: dict[tuple[bytes, bytes], set[bytes]] = defaultdict(set)
    for p, seq in seqs.items():
        f = hist[p]
        for a, b in zip(seq, seq[1:]):
            pair_freq[(a, b)] += f
            pair_pieces[(a, b)].add(p)

    merges: list[tuple[bytes, bytes]] = []
    while len(merges) < n_merges and pair_freq:
        # deterministic argmax: highest frequency, then smallest pair bytes
        best, best_f = None, 0
        for pair, f in pair_freq.items():
            if f > best_f or (f == best_f and best is not None
                              and pair < best):
                best, best_f = pair, f
        if best_f < MIN_PAIR_FREQ:
            break
        merges.append(best)
        merged = best[0] + best[1]
        # rewrite only the pieces that contain the winning pair
        for p in list(pair_pieces.get(best, ())):
            seq = seqs[p]
            f = hist[p]
            # remove old pair counts for this piece
            for a, b in zip(seq, seq[1:]):
                pair_freq[(a, b)] -= f
                if pair_freq[(a, b)] <= 0:
                    del pair_freq[(a, b)]
                pair_pieces[(a, b)].discard(p)
            # apply the merge greedily left-to-right
            out, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[p] = out
            for a, b in zip(out, out[1:]):
                pair_freq[(a, b)] += f
                pair_pieces[(a, b)].add(p)
    return merges


def build_ranks(merges: list[tuple[bytes, bytes]]) -> dict[bytes, int]:
    ranks = {bytes([b]): b for b in range(256)}
    rank = 256
    # cl100k-style digit tokens: all 2- then 3-digit strings
    for width in (2, 3):
        for n in range(10 ** width):
            tok = str(n).zfill(width).encode()
            ranks[tok] = rank
            rank += 1
    for a, b in merges:
        tok = a + b
        if tok not in ranks:          # earliest creation wins (see bpe.py)
            ranks[tok] = rank
            rank += 1
    return ranks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=DEFAULT_MERGES)
    ap.add_argument("--out", default=os.path.join(
        REPO, "ragflow_core16_spark", "textnorm", "assets",
        "webspark_bpe.tiktoken"))
    args = ap.parse_args()

    hist = piece_histogram()
    print(f"corpus pieces: {sum(hist.values())} total, "
          f"{len(hist)} distinct")
    merges = train(hist, args.merges)
    print(f"trained merges: {len(merges)}")
    ranks = build_ranks(merges)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(tok) + b" " + str(rank).encode()
                    + b"\n")
    print(f"wrote {len(ranks)} ranks -> {args.out}")


if __name__ == "__main__":
    main()
