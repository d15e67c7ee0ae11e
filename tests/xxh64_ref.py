"""Independent pure-Python XXH64, written from the public xxHash spec
(github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md), used as the
golden reference anchoring Spark's `xxhash64` — and therefore the repo's
fingerprint64 / exact-dedup / minhash surfaces — to published test
vectors. Deliberately lives in tests/: it is a verification artifact,
not a production code path.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge_round(acc: int, lane: int) -> int:
    return ((acc ^ _round(0, lane)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    seed &= _M
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed
        a4 = (seed - _P1) & _M
        while pos + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            a1, a2 = _round(a1, l1), _round(a2, l2)
            a3, a4 = _round(a3, l3), _round(a4, l4)
            pos += 32
        acc = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        for a in (a1, a2, a3, a4):
            acc = _merge_round(acc, a)
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc = (_rotl(acc ^ _round(0, lane), 27) * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl(acc ^ ((lane * _P1) & _M), 23) * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        acc = (_rotl(acc ^ ((data[pos] * _P5) & _M), 11) * _P1) & _M
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark's `F.xxhash64(stringcol)`: XXH64 over the UTF-8 bytes with
    default seed 42, result as a signed long (Spark LongType)."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def spark_hash_long(v: int, seed: int) -> int:
    """Spark hashes LongType fields as the 8-byte little-endian value —
    XXH64's dedicated 8-byte path (XXH64.hashLong). Verified empirically
    against F.xxhash64(col, lit(i).cast('long'))."""
    return xxh64(struct.pack("<q", v), seed)


def spark_hash_int(v: int, seed: int) -> int:
    """IntegerType fields go through the 4-byte path (XXH64.hashInt) —
    NOT promoted to long. Verified empirically."""
    return xxh64(struct.pack("<i", v), seed)


def spark_xxhash64_str_int(s: str, i: int) -> int:
    """Spark's `F.xxhash64(stringcol, F.lit(i))` with an int literal:
    fields chain — each field's hash seeds the next, starting from 42."""
    h = xxh64(s.encode("utf-8"), 42)
    return _signed(spark_hash_int(i, h))


def spark_minhash_member(s: str, i: int) -> int:
    """Reference for the r5 minhash family: base = F.xxhash64(shingle)
    (one string traversal), member i = F.xxhash64(base, F.lit(i)) —
    field chaining: the base long's 8-byte hash (seed 42) seeds the int
    literal's 4-byte hash."""
    base = spark_xxhash64_str(s)
    h = spark_hash_long(base, 42)
    return _signed(spark_hash_int(i, h))
