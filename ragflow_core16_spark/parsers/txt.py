"""Plain-text parser: custom-delimiter split + greedy pack.

Re-implementation of ``deepdoc/parser/txt_parser.py:29-64`` semantics:
  * the delimiter string is unicode-unescaped (``"\\n"`` text → newline);
  * backtick-quoted runs are multi-char delimiters (``` `##` ``` splits on
    the two-char token ``##``);
  * split keeps delimiters as separate tokens; delimiter tokens are skipped;
  * greedy close-late packing identical to naive_merge's boundary rule.
"""

from __future__ import annotations

import re

from ..textnorm.codec import decode_bytes
from ..textnorm.tokens import num_tokens_from_string


class TxtParser:
    def __call__(self, binary=None, text: str | None = None,
                 chunk_token_num: int = 128,
                 delimiter: str = "\n!?;。；！？") -> list[list[str]]:
        txt = text if text is not None else decode_bytes(binary)
        return self.parser_txt(txt, chunk_token_num, delimiter)

    @classmethod
    def parser_txt(cls, txt: str, chunk_token_num: int = 128,
                   delimiter: str = "\n!?;。；！？") -> list[list[str]]:
        if not isinstance(txt, str):
            raise TypeError("txt type should be str!")
        cks = [""]
        tk_nums = [0]
        # unicode-unescape round trip (txt_parser.py:34): lets callers pass
        # "\\n" as a literal two-char string meaning newline
        delimiter = (delimiter.encode("utf-8").decode("unicode_escape")
                     .encode("latin1").decode("utf-8"))

        def add_chunk(t: str):
            tnum = num_tokens_from_string(t)
            if tk_nums[-1] > chunk_token_num:
                cks.append(t)
                tk_nums.append(tnum)
            else:
                cks[-1] += t
                tk_nums[-1] += tnum

        dels = []
        s = 0
        for m in re.finditer(r"`([^`]+)`", delimiter, re.I):
            f, t = m.span()
            dels.append(m.group(1))
            dels.extend(list(delimiter[s:f]))
            s = t
        if s < len(delimiter):
            dels.extend(list(delimiter[s:]))
        dels = [re.escape(d) for d in dels if d]
        pat = "|".join(dels)
        secs = re.split(r"(%s)" % pat, txt)
        for sec in secs:
            if re.match(f"^{pat}$", sec):
                continue
            add_chunk(sec)

        return [[c, ""] for c in cks]
