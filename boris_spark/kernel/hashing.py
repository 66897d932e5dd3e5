"""Pure-Python xxHash64 matching Spark's ``F.xxhash64`` (seed 42).

Spark's ``org.apache.spark.sql.catalyst.expressions.XXH64`` is the reference
xxHash64 algorithm applied to the UTF-8 bytes of a string column with seed 42.
We re-implement it here so the driver-side oracle and the executor-side
pandas UDFs produce the *same* 64-bit URL-seen keys that JVM-side
``F.xxhash64(col)`` produces — letting hot paths (joins, bucketing) stay
entirely JVM-side while Python code can still compute identical keys.

Reference behaviour being reproduced: the crawl cache key of
/root/reference/boris/interpreter/browser-services.rkt:44-46 is the canonical
URL string; we key the distributed seen-set on ``xxh64(canonical_url)``.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    val = _round(0, val)
    acc ^= val
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """xxHash64 of *data*, unsigned 64-bit result."""
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
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
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


def to_signed64(x: int) -> int:
    """Map unsigned 64-bit to Spark's signed LongType value."""
    return x - (1 << 64) if x >= (1 << 63) else x


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed xxhash64 of a string's UTF-8 bytes — equals ``F.xxhash64(lit(s))``."""
    return to_signed64(xxh64(s.encode("utf-8"), seed))
