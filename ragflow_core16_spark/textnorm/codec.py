"""Charset detection, re-expressed from the reference's ``find_codec``.

Reference: ``rag/nlp/__init__.py:32-71`` (ChoiInYeol/ragflow_core16).

The reference calls ``chardet.detect`` on the first 1 KiB, but the branch only
short-circuits when chardet says *ascii* with confidence > 0.5 — and in that
case it returns ``"utf-8"``, which is exactly what the brute-force loop below
would return anyway (``'utf-8'`` is first in the codec list and pure-ASCII
bytes decode as UTF-8).  The chardet call is therefore behaviorally a no-op,
and this native implementation — pure brute-force over the same ordered codec
list — produces identical results without the chardet dependency.

Determinism: the codec list order is fixed, so the first codec that decodes
the first 1 KiB (then, failing that, the whole blob) wins.  No randomness, no
library-version sensitivity.
"""

from __future__ import annotations

# Same ordered list as rag/nlp/__init__.py:33-57.  Order matters: first
# successful decode wins, so 'utf-8' shadows any other codec for valid UTF-8
# bytes — matching the reference exactly.
ALL_CODECS = [
    'utf-8', 'gb2312', 'gbk', 'utf_16', 'ascii', 'big5', 'big5hkscs',
    'cp037', 'cp273', 'cp424', 'cp437',
    'cp500', 'cp720', 'cp737', 'cp775', 'cp850', 'cp852', 'cp855', 'cp856', 'cp857',
    'cp858', 'cp860', 'cp861', 'cp862', 'cp863', 'cp864', 'cp865', 'cp866', 'cp869',
    'cp874', 'cp875', 'cp932', 'cp949', 'cp950', 'cp1006', 'cp1026', 'cp1125',
    'cp1140', 'cp1250', 'cp1251', 'cp1252', 'cp1253', 'cp1254', 'cp1255', 'cp1256',
    'cp1257', 'cp1258', 'euc_jp', 'euc_jis_2004', 'euc_jisx0213', 'euc_kr',
    'gb18030', 'hz', 'iso2022_jp', 'iso2022_jp_1', 'iso2022_jp_2',
    'iso2022_jp_2004', 'iso2022_jp_3', 'iso2022_jp_ext', 'iso2022_kr', 'latin_1',
    'iso8859_2', 'iso8859_3', 'iso8859_4', 'iso8859_5', 'iso8859_6', 'iso8859_7',
    'iso8859_8', 'iso8859_9', 'iso8859_10', 'iso8859_11', 'iso8859_13',
    'iso8859_14', 'iso8859_15', 'iso8859_16', 'johab', 'koi8_r', 'koi8_t', 'koi8_u',
    'kz1048', 'mac_cyrillic', 'mac_greek', 'mac_iceland', 'mac_latin2', 'mac_roman',
    'mac_turkish', 'ptcp154', 'shift_jis', 'shift_jis_2004', 'shift_jisx0213',
    'utf_32', 'utf_32_be', 'utf_32_le', 'utf_16_be', 'utf_16_le', 'utf_7',
    'windows-1250', 'windows-1251',
    'windows-1252', 'windows-1253', 'windows-1254', 'windows-1255', 'windows-1256',
    'windows-1257', 'windows-1258', 'latin-2',
]


def find_codec(blob: bytes) -> str:
    """Return the first codec (in ``ALL_CODECS`` order) that decodes the
    first 1 KiB of ``blob`` — else the first that decodes the whole blob —
    else ``"utf-8"``.  Mirrors rag/nlp/__init__.py:60-71."""
    if not blob:
        return "utf-8"
    head = blob[:1024]
    for c in ALL_CODECS:
        try:
            head.decode(c)
            return c
        except Exception:
            pass
        try:
            blob.decode(c)
            return c
        except Exception:
            pass
    return "utf-8"


def decode_bytes(blob: bytes) -> str:
    """bytes → str exactly like the reference's get_text/HtmlParser path:
    ``blob.decode(find_codec(blob), errors="ignore")``
    (deepdoc/parser/utils.py:20-32, deepdoc/parser/html_parser.py:31-39)."""
    if blob is None:
        return ""
    return blob.decode(find_codec(blob), errors="ignore")
