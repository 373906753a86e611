"""Mojibake repair: recover UTF-8 text mis-decoded as cp1252/latin-1.

Every Common-Crawl-scale pipeline runs an encoding-damage pass (ftfy's
``fix_text`` is the canonical tool): a page whose UTF-8 bytes were decoded
with a legacy single-byte codec somewhere upstream renders ``é`` as ``Ã©``,
``€`` as ``â‚¬``, ``“`` as ``â€œ``.  The repair is the exact inverse —
re-encode each character through the same single-byte map and strict-decode
the bytes as UTF-8; accept only when the whole string round-trips.

This is a from-scratch deterministic core of that idea (no heuristic
"badness" scoring):

* the re-encoder is ftfy's "sloppy cp1252" map — cp1252 where defined,
  falling back to the raw latin-1 byte for the five codepoints cp1252
  leaves unmapped (0x81 0x8D 0x8F 0x90 0x9D) and for C1 controls — so BOTH
  common corruption routes (latin-1 decode and cp1252-with-replacement
  decode) invert through one map;
* a character outside latin-1/cp1252 (CJK, emoji, curly quote…) proves the
  string is NOT mojibake → returned unchanged;
* strict UTF-8 decode of the re-encoded bytes must succeed, else unchanged
  (an isolated legit ``é`` in ASCII text re-encodes to a lone continuation
  byte and is therefore left alone);
* iterate up to ``max_passes`` for double-encoded mojibake (text corrupted
  twice: ``é`` → ``Ã©`` → ``Ã‚Ã©``…).

Known tradeoff (same as ftfy): text that legitimately contains a full valid
UTF-8-as-cp1252 character sequence (e.g. the literal two chars ``Ã©``) is
indistinguishable from mojibake and gets "repaired".
"""

from __future__ import annotations

# cp1252 printable block 0x80-0x9F (the only range where cp1252 differs
# from latin-1); positions that are undefined in cp1252 keep the raw byte.
_CP1252_80_9F = [
    0x20AC, None, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, None, 0x017D, None,
    None, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, None, 0x017E, 0x0178,
]
# char → byte for the sloppy map (cp1252 chars first, then latin-1 identity)
_SLOPPY_REV: dict[int, int] = {}
for _i, _cp in enumerate(_CP1252_80_9F):
    if _cp is not None:
        _SLOPPY_REV[_cp] = 0x80 + _i


def sloppy_cp1252_decode(data: bytes) -> str:
    """Total decode of "something upstream used cp1252": cp1252 where
    defined, raw-byte (latin-1) identity for the five undefined positions
    (0x81 0x8D 0x8F 0x90 0x9D) — ftfy's sloppy-windows-1252.  Unlike
    strict ``bytes.decode('cp1252')`` this never raises, so damage
    simulation (and any upstream-misdecode model) is total over arbitrary
    UTF-8 bytes; ``_sloppy_encode`` is its exact inverse."""
    tbl = _CP1252_80_9F
    return "".join(
        chr(tbl[b - 0x80]) if 0x80 <= b <= 0x9F and tbl[b - 0x80] is not None
        else chr(b)
        for b in data)


def _sloppy_encode(s: str) -> bytes | None:
    """Inverse of "decoded with cp1252-or-latin-1": cp1252 where it maps,
    raw byte identity for every other latin-1 codepoint.  None when the
    string contains a char outside both maps (not mojibake)."""
    out = bytearray()
    rev = _SLOPPY_REV
    for ch in s:
        o = ord(ch)
        if o <= 0xFF:
            out.append(o)
        else:
            b = rev.get(o)
            if b is None:
                return None
            out.append(b)
    return bytes(out)


def fix_mojibake(s: str, max_passes: int = 3) -> str:
    """Repair UTF-8-mis-decoded-as-cp1252/latin-1 text; returns the input
    unchanged when no full-string round trip exists."""
    for _ in range(max_passes):
        if not s or ord(max(s)) <= 0x7F:
            return s            # pure ASCII cannot be mojibake
        raw = _sloppy_encode(s)
        if raw is None:
            return s
        try:
            dec = raw.decode("utf-8")
        except UnicodeDecodeError:
            return s
        if dec == s:
            return s
        s = dec
    return s
