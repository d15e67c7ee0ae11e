"""Pure-Python SpookyHash V2 (Bob Jenkins' public-domain algorithm).

Backs the SPL scalar functions ``spooky_hash_v2_32`` / ``spooky_hash_v2_64``
(reference corpus core/unittest/spl/spl.txt:77-78; Presto/Velox semantics:
seed 0, result as big-endian VARBINARY of 4 / 8 bytes).

Transcribed from the published SpookyV2 specification (short path for
inputs < 192 bytes, 12-lane mix for longer); no third-party code copied —
the rotation schedules and mixing order are the algorithm itself.

Cross-checked against an INDEPENDENT unrolled transcription
(tests/spooky_ref.py) over lengths spanning every tail case and the
192-byte short/long boundary. Published known-answer vectors are not
available in this offline container, so absolute values remain
unanchored to an external implementation — the disclaimer stands, but
transcription typos (tables, rotation schedules, lane order) are now
covered.
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1
_SC_CONST = 0xDEADBEEFDEADBEEF
_BLOCK = 96  # sc_blockSize = 12 * 8
_BUF = 192  # sc_bufSize = 2 * sc_blockSize


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _MASK


def _short_mix(a, b, c, d):
    for (reg, k) in (("c", 50), ("d", 52), ("a", 30), ("b", 41),
                     ("c", 54), ("d", 48), ("a", 38), ("b", 37),
                     ("c", 62), ("d", 34), ("a", 5), ("b", 36)):
        if reg == "c":
            c = _rot(c, k); c = (c + d) & _MASK; a ^= c
        elif reg == "d":
            d = _rot(d, k); d = (d + a) & _MASK; b ^= d
        elif reg == "a":
            a = _rot(a, k); a = (a + b) & _MASK; c ^= a
        else:
            b = _rot(b, k); b = (b + c) & _MASK; d ^= b
    return a, b, c, d


def _short_end(a, b, c, d):
    seq = ((("d", "c"), 15), (("a", "d"), 52), (("b", "a"), 26),
           (("c", "b"), 51), (("d", "c"), 28), (("a", "d"), 9),
           (("b", "a"), 47), (("c", "b"), 54), (("d", "c"), 32),
           (("a", "d"), 25), (("b", "a"), 63))
    regs = {"a": a, "b": b, "c": c, "d": d}
    for (dst, src), k in seq:
        regs[dst] ^= regs[src]
        regs[src] = _rot(regs[src], k)
        regs[dst] = (regs[dst] + regs[src]) & _MASK
    return regs["a"], regs["b"], regs["c"], regs["d"]


def _short(data: bytes, seed1: int, seed2: int) -> tuple[int, int]:
    length = len(data)
    remainder = length % 32
    a, b, c, d = seed1, seed2, _SC_CONST, _SC_CONST
    pos = 0
    if length > 15:
        for _ in range(length // 32):
            u = struct.unpack_from("<4Q", data, pos)
            c = (c + u[0]) & _MASK
            d = (d + u[1]) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            a = (a + u[2]) & _MASK
            b = (b + u[3]) & _MASK
            pos += 32
        if remainder >= 16:
            u = struct.unpack_from("<2Q", data, pos)
            c = (c + u[0]) & _MASK
            d = (d + u[1]) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            pos += 16
            remainder -= 16
    d = (d + ((length & 0xFF) << 56)) & _MASK
    tail = data[pos:]
    if remainder == 0:
        c = (c + _SC_CONST) & _MASK
        d = (d + _SC_CONST) & _MASK
    else:
        if remainder >= 8:
            c = (c + struct.unpack_from("<Q", tail, 0)[0]) & _MASK
            for i in range(8, remainder):
                d = (d + (tail[i] << (8 * (i - 8)))) & _MASK
        else:
            for i in range(remainder):
                c = (c + (tail[i] << (8 * i))) & _MASK
    # The published Short() runs ShortEnd directly after the 0..15-byte
    # tail injection — ShortMix only runs per 16/32-byte block. (An
    # earlier transcription inserted a spurious ShortMix here, which
    # diverged on every input < 192 bytes.)
    a, b, c, d = _short_end(a, b, c, d)
    return a, b


def _mix(u, h):
    rot = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
    for i in range(12):
        h[i] = (h[i] + u[i]) & _MASK
        h[(i + 2) % 12] ^= h[(i + 10) % 12]
        h[(i + 11) % 12] ^= h[i]
        h[i] = _rot(h[i], rot[i])
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK
    return h


def _end_partial(h):
    rot = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)
    for i in range(12):
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rot(h[(i + 1) % 12], rot[i])
    return h


def _long(data: bytes, seed1: int, seed2: int) -> tuple[int, int]:
    length = len(data)
    h = [seed1, seed2, _SC_CONST] * 4
    n_blocks = length // _BLOCK
    pos = 0
    for _ in range(n_blocks):
        u = struct.unpack_from("<12Q", data, pos)
        h = _mix(u, h)
        pos += _BLOCK
    remainder = length - pos
    buf = bytearray(_BLOCK)
    buf[:remainder] = data[pos:]
    buf[_BLOCK - 1] = remainder
    u = struct.unpack_from("<12Q", bytes(buf), 0)
    # End: add the final partial block, then three EndPartial rounds
    for i in range(12):
        h[i] = (h[i] + u[i]) & _MASK
    h = _end_partial(h)
    h = _end_partial(h)
    h = _end_partial(h)
    return h[0], h[1]


def hash128(data: bytes, seed1: int = 0, seed2: int = 0) -> tuple[int, int]:
    if len(data) < _BUF:
        return _short(data, seed1, seed2)
    return _long(data, seed1, seed2)


def spooky_hash_v2_64(data: bytes, seed: int = 0) -> bytes:
    """64-bit SpookyV2 as 8 big-endian bytes (Presto VARBINARY shape)."""
    h1, _ = hash128(data, seed, seed)
    return struct.pack(">Q", h1)


def spooky_hash_v2_32(data: bytes, seed: int = 0) -> bytes:
    """32-bit SpookyV2 as 4 big-endian bytes (low 32 bits of hash1)."""
    h1, _ = hash128(data, seed, seed)
    return struct.pack(">I", h1 & 0xFFFFFFFF)
