"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42).

Spark computes ``xxhash64(col)`` as XXH64 over the UTF-8 bytes with seed 42
(org.apache.spark.sql.catalyst.expressions.XxHash64 → XXH64.hashUnsafeBytes,
a standard little-endian XXH64). Having it driver-side lets the query planner
compute a term's ``term_bucket`` without launching a Spark job, and lets
Python kernels reproduce Spark's bucketing/salting exactly.

Implementation from the public xxHash specification
(github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    acc = _rotl(acc, 31)
    return (acc * P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & _M


def xxhash64(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit XXH64."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            w = struct.unpack_from("<4Q", data, i)
            v1, v2, v3, v4 = (
                _round(v1, w[0]), _round(v2, w[1]),
                _round(v3, w[2]), _round(v4, w[3]),
            )
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (w,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, w)
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        (w,) = struct.unpack_from("<I", data, i)
        h ^= (w * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def xxhash64_signed(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """Spark-compatible signed long value of xxhash64."""
    h = xxhash64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_pmod_bucket(term: str, num_buckets: int) -> int:
    """Replicates F.pmod(F.xxhash64(term), num_buckets)."""
    return xxhash64_signed(term) % num_buckets
