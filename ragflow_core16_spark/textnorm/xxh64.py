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


def xxh64_hex_batch(items: list[bytes], seed: int = 0) -> list[str]:
    """Vectorized ``xxh64_hexdigest`` over a batch: numpy uint64 lanes,
    sequential over stripe index (inherent), vectorized across the batch
    (embarrassingly parallel).  ~15x the scalar on chunk-id-sized inputs;
    bit-identical to ``xxh64_int`` (fuzzed over all tail classes in
    tests/test_xxh64.py).  Used by the extraction UDF to hash every chunk
    id of an Arrow batch in one pass."""
    import numpy as np

    n_items = len(items)
    if n_items == 0:
        return []
    # the batch buffer is n_items x max(len): one oversized outlier must
    # not inflate the whole batch's padding — hash outliers scalar-side
    _CAP = 8192
    if any(len(b) > _CAP for b in items):
        out = [None] * n_items
        small, idx = [], []
        for i, b in enumerate(items):
            if len(b) > _CAP:
                out[i] = xxh64_hexdigest(b, seed)
            else:
                small.append(b)
                idx.append(i)
        for i, hx in zip(idx, xxh64_hex_batch(small, seed)):
            out[i] = hx
        return out
    u64 = np.uint64
    P1 = u64(_P1); P2 = u64(_P2); P3 = u64(_P3); P4 = u64(_P4); P5 = u64(_P5)

    def rotl(x, r):
        r = u64(r)
        return (x << r) | (x >> (u64(64) - r))

    with np.errstate(over="ignore"):
        lens = np.array([len(b) for b in items], dtype=np.uint64)
        maxlen = int(lens.max())
        width = ((maxlen + 31) // 32) * 32 + 32  # slack for padded lane reads
        buf = np.zeros((n_items, width), dtype=np.uint8)
        for i, b in enumerate(items):
            buf[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lanes = buf.view("<u8").reshape(n_items, -1)
        nblk = (lens // u64(32)).astype(np.int64)
        sd = u64(seed)
        v1 = np.full(n_items, sd + P1 + P2, dtype=u64)
        v2 = np.full(n_items, sd + P2, dtype=u64)
        v3 = np.full(n_items, sd, dtype=u64)
        v4 = np.full(n_items, sd - P1, dtype=u64)
        for j in range(int(nblk.max())):
            m = nblk > j
            base = 4 * j
            v1 = np.where(m, rotl(v1 + lanes[:, base] * P2, 31) * P1, v1)
            v2 = np.where(m, rotl(v2 + lanes[:, base + 1] * P2, 31) * P1, v2)
            v3 = np.where(m, rotl(v3 + lanes[:, base + 2] * P2, 31) * P1, v3)
            v4 = np.where(m, rotl(v4 + lanes[:, base + 3] * P2, 31) * P1, v4)
        hbig = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)

        def merge(h, v):
            return (h ^ (rotl(v * P2, 31) * P1)) * P1 + P4

        hbig = merge(merge(merge(merge(hbig, v1), v2), v3), v4)
        h = np.where(nblk > 0, hbig, sd + P5) + lens
        rows = np.arange(n_items)
        lane_i = (nblk * 4).astype(np.int64)
        rem = (lens - u64(32) * nblk.astype(u64)).astype(np.int64)
        for _ in range(3):  # up to three 8-byte tail rounds
            m = rem >= 8
            if not m.any():
                break
            k1 = rotl(lanes[rows, lane_i] * P2, 31) * P1
            h = np.where(m, (rotl(h ^ k1, 27) * P1) + P4, h)
            lane_i = np.where(m, lane_i + 1, lane_i)
            rem = np.where(m, rem - 8, rem)
        bytepos = (lane_i * 8).astype(np.int64)
        m = rem >= 4
        if m.any():
            u32 = buf.view("<u4").reshape(n_items, -1)
            lane4 = u32[rows, bytepos // 4].astype(u64)
            h = np.where(m, (rotl(h ^ (lane4 * P1), 23) * P2) + P3, h)
            bytepos = np.where(m, bytepos + 4, bytepos)
            rem = np.where(m, rem - 4, rem)
        for _ in range(3):  # up to three 1-byte tail rounds
            m = rem >= 1
            if not m.any():
                break
            byte = buf[rows, bytepos].astype(u64)
            h = np.where(m, rotl(h ^ (byte * P5), 11) * P1, h)
            bytepos = np.where(m, bytepos + 1, bytepos)
            rem = np.where(m, rem - 1, rem)
        h ^= h >> u64(33)
        h = h * P2
        h ^= h >> u64(29)
        h = h * P3
        h ^= h >> u64(32)
    return [format(int(x), "016x") for x in h]
