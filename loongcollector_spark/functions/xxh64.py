"""Pure-Python XXH64 — transcribed from the published xxHash spec
(github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).

Used for the SPL scalar ``xxhash64(varbinary) -> varbinary`` (Presto
semantics: seed 0 over the raw bytes — Spark's built-in ``xxhash64``
hashes the *Spark-typed value* with seed 42, a different function).
Production hot paths (minhash, fingerprints) keep Spark's JVM-side
``F.xxhash64``; this module only backs the SPL dialect UDF, so per-row
cost is acceptable there (hash-of-one-column expressions in SPL scripts,
not the 10^12-row pipeline). An independent transcription in
tests/xxh64_ref.py plus published known-answer vectors anchor both.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 0) -> int:
    """The 64-bit xxHash of ``data`` (unsigned)."""
    n = len(data)
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _MASK
        a2 = (seed + _P2) & _MASK
        a3 = seed & _MASK
        a4 = (seed - _P1) & _MASK
        i = 0
        while i + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            a1 = (_rotl((a1 + l1 * _P2) & _MASK, 31) * _P1) & _MASK
            a2 = (_rotl((a2 + l2 * _P2) & _MASK, 31) * _P1) & _MASK
            a3 = (_rotl((a3 + l3 * _P2) & _MASK, 31) * _P1) & _MASK
            a4 = (_rotl((a4 + l4 * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        acc = (
            _rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)
        ) & _MASK
        for a in (a1, a2, a3, a4):
            acc = (
                (acc ^ ((_rotl((a * _P2) & _MASK, 31) * _P1) & _MASK))
                * _P1 + _P4
            ) & _MASK
    else:
        acc = (seed + _P5) & _MASK
        i = 0
    acc = (acc + n) & _MASK
    while i + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, i)
        acc ^= (_rotl((lane * _P2) & _MASK, 31) * _P1) & _MASK
        acc = (_rotl(acc, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        acc ^= (lane * _P1) & _MASK
        acc = (_rotl(acc, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & _MASK
        acc = (_rotl(acc, 11) * _P1) & _MASK
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _MASK
    acc ^= acc >> 29
    acc = (acc * _P3) & _MASK
    acc ^= acc >> 32
    return acc
