#!/usr/bin/env python
"""Convert a full public wordlist into the tokenizer/lemmatizer assets.

The reference ships ``huqie.txt`` (hundreds of thousands of CJK entries,
stripped from its public checkout — SURVEY.md §0) and counts on NLTK's
WordNet data.  Neither asset is downloadable in this sandbox, so the
engine ships curated+systematic built-ins (~6.6k CJK entries,
``textnorm/cjk_lexicon*.py``; ~3.7k nouns + full irregular table,
``textnorm/morphy.py``) and FULL dictionaries load at deployment through
two env vars.  This script is the one-command conversion for the public
sources:

CJK dictionary → ``RAG_TOKENIZER_DICT`` (huqie.txt format:
``word<space>freq<space>pos`` per line):

    # from jieba's MIT-licensed dict.txt (same format already):
    python tools/build_cjk_dict.py --jieba dict.txt --out huqie_full.txt
    # from a RAGFlow deployment's own huqie.txt: use it directly
    export RAG_TOKENIZER_DICT=/path/to/huqie_full.txt

WordNet nouns → ``RAG_WORDNET_NOUNS`` (one lemma per line):

    python -c "import nltk; nltk.download('wordnet')"
    python tools/build_cjk_dict.py --wordnet-index \\
        ~/nltk_data/corpora/wordnet/index.noun --out nouns.txt
    export RAG_WORDNET_NOUNS=nouns.txt

Both loaders are exercised by unit tests against toy files
(tests/test_tokenizer.py, tests/test_retrieval_nlp.py), so the only
deployment step is pointing the env vars at the converted files.
"""

from __future__ import annotations

import argparse


def from_jieba(path: str, out: str) -> int:
    """jieba dict.txt lines are ``word freq [pos]`` — normalize to the
    3-column huqie shape the trie loader consumes."""
    n = 0
    with open(path, encoding="utf-8") as f, \
            open(out, "w", encoding="utf-8") as o:
        for ln in f:
            parts = ln.split()
            if not parts:
                continue
            word = parts[0]
            freq = parts[1] if len(parts) > 1 else "1"
            pos = parts[2] if len(parts) > 2 else "n"
            o.write(f"{word} {freq} {pos}\n")
            n += 1
    return n


def from_wordnet_index(path: str, out: str) -> int:
    """WordNet ``index.noun`` → one lowercase lemma per line (underscores
    become spaces-less single tokens are kept as-is; multiword lemmas are
    skipped — morphy validates single tokens)."""
    n = 0
    with open(path, encoding="utf-8") as f, \
            open(out, "w", encoding="utf-8") as o:
        for ln in f:
            if ln.startswith(" "):
                continue
            lemma = ln.split(" ", 1)[0].strip().lower()
            if lemma and "_" not in lemma:
                o.write(lemma + "\n")
                n += 1
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jieba")
    ap.add_argument("--wordnet-index")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.jieba:
        print(f"{from_jieba(args.jieba, args.out)} entries -> {args.out}")
    elif args.wordnet_index:
        print(f"{from_wordnet_index(args.wordnet_index, args.out)} "
              f"lemmas -> {args.out}")
    else:
        ap.error("pass --jieba or --wordnet-index")


if __name__ == "__main__":
    main()
