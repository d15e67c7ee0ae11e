"""INDEPENDENT unrolled transcription of SpookyHash V2 for cross-checking
``loongcollector_spark.functions.spooky``.

Written statement-for-statement in the published C++'s unrolled form —
no rotation tables, no index arithmetic, no code shared with the
production module — so a typo in either implementation's schedules or
lane order shows up as a mismatch. (Published known-answer vectors are
unavailable offline; this guards the transcription, not the algorithm.)
"""

from __future__ import annotations

import struct

M = (1 << 64) - 1
SC = 0xDEADBEEFDEADBEEF


def rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & M


def short_mix(a, b, c, d):
    c = rot(c, 50); c = (c + d) & M; a ^= c
    d = rot(d, 52); d = (d + a) & M; b ^= d
    a = rot(a, 30); a = (a + b) & M; c ^= a
    b = rot(b, 41); b = (b + c) & M; d ^= b
    c = rot(c, 54); c = (c + d) & M; a ^= c
    d = rot(d, 48); d = (d + a) & M; b ^= d
    a = rot(a, 38); a = (a + b) & M; c ^= a
    b = rot(b, 37); b = (b + c) & M; d ^= b
    c = rot(c, 62); c = (c + d) & M; a ^= c
    d = rot(d, 34); d = (d + a) & M; b ^= d
    a = rot(a, 5);  a = (a + b) & M; c ^= a
    b = rot(b, 36); b = (b + c) & M; d ^= b
    return a, b, c, d


def short_end(a, b, c, d):
    d ^= c; c = rot(c, 15); d = (d + c) & M
    a ^= d; d = rot(d, 52); a = (a + d) & M
    b ^= a; a = rot(a, 26); b = (b + a) & M
    c ^= b; b = rot(b, 51); c = (c + b) & M
    d ^= c; c = rot(c, 28); d = (d + c) & M
    a ^= d; d = rot(d, 9);  a = (a + d) & M
    b ^= a; a = rot(a, 47); b = (b + a) & M
    c ^= b; b = rot(b, 54); c = (c + b) & M
    d ^= c; c = rot(c, 32); d = (d + c) & M
    a ^= d; d = rot(d, 25); a = (a + d) & M
    b ^= a; a = rot(a, 63); b = (b + a) & M
    return a, b, c, d


def short(msg: bytes, seed1: int, seed2: int):
    length = len(msg)
    remainder = length % 32
    a, b, c, d = seed1, seed2, SC, SC
    pos = 0
    if length > 15:
        for _ in range(length // 32):
            u0, u1, u2, u3 = struct.unpack_from("<4Q", msg, pos)
            c = (c + u0) & M
            d = (d + u1) & M
            a, b, c, d = short_mix(a, b, c, d)
            a = (a + u2) & M
            b = (b + u3) & M
            pos += 32
        if remainder >= 16:
            u0, u1 = struct.unpack_from("<2Q", msg, pos)
            c = (c + u0) & M
            d = (d + u1) & M
            a, b, c, d = short_mix(a, b, c, d)
            pos += 16
            remainder -= 16
    d = (d + ((length << 56) & M)) & M
    p = msg[pos:]
    # the C++ switch, fallthrough written out per case group
    if remainder == 0:
        c = (c + SC) & M
        d = (d + SC) & M
    elif remainder >= 12:
        if remainder == 15:
            d = (d + (p[14] << 48)) & M
        if remainder >= 14:
            d = (d + (p[13] << 40)) & M
        if remainder >= 13:
            d = (d + (p[12] << 32)) & M
        d = (d + struct.unpack_from("<I", p, 8)[0]) & M
        c = (c + struct.unpack_from("<Q", p, 0)[0]) & M
    elif remainder >= 8:
        if remainder == 11:
            d = (d + (p[10] << 16)) & M
        if remainder >= 10:
            d = (d + (p[9] << 8)) & M
        if remainder >= 9:
            d = (d + p[8]) & M
        c = (c + struct.unpack_from("<Q", p, 0)[0]) & M
    elif remainder >= 4:
        if remainder == 7:
            c = (c + (p[6] << 48)) & M
        if remainder >= 6:
            c = (c + (p[5] << 40)) & M
        if remainder >= 5:
            c = (c + (p[4] << 32)) & M
        c = (c + struct.unpack_from("<I", p, 0)[0]) & M
    else:
        if remainder == 3:
            c = (c + (p[2] << 16)) & M
        if remainder >= 2:
            c = (c + (p[1] << 8)) & M
        c = (c + p[0]) & M
    a, b, c, d = short_end(a, b, c, d)
    return a, b


def mix(u, h0, h1, h2, h3, h4, h5, h6, h7, h8, h9, h10, h11):
    h0 = (h0 + u[0]) & M;  h2 ^= h10; h11 ^= h0;  h0 = rot(h0, 11);  h11 = (h11 + h1) & M
    h1 = (h1 + u[1]) & M;  h3 ^= h11; h0 ^= h1;   h1 = rot(h1, 32);  h0 = (h0 + h2) & M
    h2 = (h2 + u[2]) & M;  h4 ^= h0;  h1 ^= h2;   h2 = rot(h2, 43);  h1 = (h1 + h3) & M
    h3 = (h3 + u[3]) & M;  h5 ^= h1;  h2 ^= h3;   h3 = rot(h3, 31);  h2 = (h2 + h4) & M
    h4 = (h4 + u[4]) & M;  h6 ^= h2;  h3 ^= h4;   h4 = rot(h4, 17);  h3 = (h3 + h5) & M
    h5 = (h5 + u[5]) & M;  h7 ^= h3;  h4 ^= h5;   h5 = rot(h5, 28);  h4 = (h4 + h6) & M
    h6 = (h6 + u[6]) & M;  h8 ^= h4;  h5 ^= h6;   h6 = rot(h6, 39);  h5 = (h5 + h7) & M
    h7 = (h7 + u[7]) & M;  h9 ^= h5;  h6 ^= h7;   h7 = rot(h7, 57);  h6 = (h6 + h8) & M
    h8 = (h8 + u[8]) & M;  h10 ^= h6; h7 ^= h8;   h8 = rot(h8, 55);  h7 = (h7 + h9) & M
    h9 = (h9 + u[9]) & M;  h11 ^= h7; h8 ^= h9;   h9 = rot(h9, 54);  h8 = (h8 + h10) & M
    h10 = (h10 + u[10]) & M; h0 ^= h8;  h9 ^= h10;  h10 = rot(h10, 22); h9 = (h9 + h11) & M
    h11 = (h11 + u[11]) & M; h1 ^= h9;  h10 ^= h11; h11 = rot(h11, 46); h10 = (h10 + h0) & M
    return h0, h1, h2, h3, h4, h5, h6, h7, h8, h9, h10, h11


def end_partial(h0, h1, h2, h3, h4, h5, h6, h7, h8, h9, h10, h11):
    h11 = (h11 + h1) & M; h2 ^= h11; h1 = rot(h1, 44)
    h0 = (h0 + h2) & M;   h3 ^= h0;  h2 = rot(h2, 15)
    h1 = (h1 + h3) & M;   h4 ^= h1;  h3 = rot(h3, 34)
    h2 = (h2 + h4) & M;   h5 ^= h2;  h4 = rot(h4, 21)
    h3 = (h3 + h5) & M;   h6 ^= h3;  h5 = rot(h5, 38)
    h4 = (h4 + h6) & M;   h7 ^= h4;  h6 = rot(h6, 33)
    h5 = (h5 + h7) & M;   h8 ^= h5;  h7 = rot(h7, 10)
    h6 = (h6 + h8) & M;   h9 ^= h6;  h8 = rot(h8, 13)
    h7 = (h7 + h9) & M;   h10 ^= h7; h9 = rot(h9, 38)
    h8 = (h8 + h10) & M;  h11 ^= h8; h10 = rot(h10, 53)
    h9 = (h9 + h11) & M;  h0 ^= h9;  h11 = rot(h11, 42)
    h10 = (h10 + h0) & M; h1 ^= h10; h0 = rot(h0, 54)
    return h0, h1, h2, h3, h4, h5, h6, h7, h8, h9, h10, h11


def hash128(msg: bytes, seed1: int = 0, seed2: int = 0):
    if len(msg) < 192:
        return short(msg, seed1, seed2)
    h = (seed1, seed2, SC, seed1, seed2, SC, seed1, seed2, SC, seed1, seed2, SC)
    pos = 0
    for _ in range(len(msg) // 96):
        h = mix(struct.unpack_from("<12Q", msg, pos), *h)
        pos += 96
    remainder = len(msg) - pos
    buf = msg[pos:] + b"\x00" * (96 - remainder)
    buf = buf[:95] + bytes([remainder])
    u = struct.unpack_from("<12Q", buf, 0)
    h = tuple((x + y) & M for x, y in zip(h, u))
    h = end_partial(*h)
    h = end_partial(*h)
    h = end_partial(*h)
    return h[0], h[1]


def hash64(msg: bytes, seed: int = 0) -> int:
    return hash128(msg, seed, seed)[0]


def hash32(msg: bytes, seed: int = 0) -> int:
    return hash128(msg, seed, seed)[0] & 0xFFFFFFFF
