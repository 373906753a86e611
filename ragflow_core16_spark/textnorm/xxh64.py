"""Pure-Python xxHash64 (public algorithm, Yann Collet's xxHash spec).

The reference computes chunk ids as ``xxhash.xxh64((text + doc_id)).hexdigest()``
(``rag/svr/task_executor.py:266``).  The ``xxhash`` C package is not available
here, so this is a from-spec implementation of XXH64 (seed 0 default), verified
against the published test vectors in tests/test_xxh64.py.

Note on Spark's built-in ``F.xxhash64``: it is the same core algorithm but
with seed 42 and Spark's own per-type byte serialization, so its output does
NOT equal ``xxh64(utf8).hexdigest()``.  Chunk-id parity with the reference
therefore uses this function inside the extraction UDF (cheap: ids are
computed once per chunk, not per token).
"""

from __future__ import annotations

import struct as _struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64_int(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        # bulk-decode all 32-byte stripes in one unpack, inline the round
        # arithmetic (the per-lane slice + helper-call version spends most
        # of its time in interpreter overhead)
        nblk = n // 32
        lanes = _struct.unpack_from(f"<{nblk * 4}Q", data, 0)
        P1, P2, M = _P1, _P2, _M
        for j in range(0, nblk * 4, 4):
            a = (v1 + lanes[j] * P2) & M
            v1 = (((a << 31) | (a >> 33)) & M) * P1 & M
            a = (v2 + lanes[j + 1] * P2) & M
            v2 = (((a << 31) | (a >> 33)) & M) * P1 & M
            a = (v3 + lanes[j + 2] * P2) & M
            v3 = (((a << 31) | (a >> 33)) & M) * P1 & M
            a = (v4 + lanes[j + 3] * P2) & M
            v4 = (((a << 31) | (a >> 33)) & M) * P1 & M
        i = nblk * 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_hexdigest(s: str | bytes, seed: int = 0) -> str:
    """Match ``xxhash.xxh64(s).hexdigest()`` (16 lowercase hex chars)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return format(xxh64_int(s, seed), "016x")


def chunk_id(chunk_text: str, doc_key: str) -> str:
    """Reference chunk id: xxh64 of (content_with_weight + doc_id),
    rag/svr/task_executor.py:266."""
    return xxh64_hexdigest(chunk_text + doc_key)
