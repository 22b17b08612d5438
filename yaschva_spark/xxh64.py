"""Pure-Python XXH64, bit-exact with Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(col)`` hashes a string child's UTF-8 bytes with
XXH64 (seed 42 by default) and returns the result reinterpreted as a
signed long. Replicating it here (the algorithm is public — Yann Collet's
xxHash spec, and Spark's XXH64.java follows the byte path faithfully)
gives the DuckDB oracles an *independent* implementation of every
hash-derived operator (SimHash fingerprints, banded pairs): the driver's
correctness gate can then compare Spark's JVM hashing against this
reimplementation instead of marking those queries rows-only.

Differential-tested against Spark in tests/test_xxh64.py (ASCII, UTF-8
multibyte, empty string, lengths crossing the 4/8/32-byte boundaries).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
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


def spark_xxhash64_string(s: str, seed: int = 42) -> int:
    """Signed long, equal to Spark's ``F.xxhash64(lit(s))``."""
    u = xxh64(s.encode("utf-8"), seed)
    return u - (1 << 64) if u >= (1 << 63) else u


def simhash64(text: str, seed: int = 42) -> int:
    """Signed 64-bit SimHash, equal to ``ops.dedup.simhash`` for one row:
    whitespace-split tokens (single-space, empties kept — Spark's
    ``split(text, ' ')`` semantics), each token XXH64-hashed, every bit
    voted +-1, sign vector reassembled."""
    votes = [0] * 64
    for tok in text.split(" "):
        h = xxh64(tok.encode("utf-8"), seed)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if votes[b] > 0:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp
