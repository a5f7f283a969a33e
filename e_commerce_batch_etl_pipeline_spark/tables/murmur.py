"""Pure-Python replica of Spark's Murmur3Hash — zero-job bucket routing.

``bucket_expr`` (format.py) is ``pmod(Murmur3Hash(key), B)`` — Spark's
HashPartitioning formula, the table's layout contract. A point lookup
therefore needs murmur3(key) BEFORE it can prune to the key's bucket,
and until now paid a Spark job (createDataFrame → bucket_expr →
collect) just for that route. This module computes the same hash
driver-side so the serving path plans its read with zero extra jobs.

Spark's Murmur3_x86_32 deviates from the reference algorithm in the
tail: remaining bytes are each mixed as a FULL k1/h1 round using the
SIGNED byte value (Murmur3_x86_32.hashUnsafeBytes — a documented,
frozen quirk: it is part of the shuffle contract and cannot change
without breaking every bucketed table). This replica matches it
bit-for-bit and is property-tested against ``F.hash`` and
``bucket_expr`` in tests/test_bloom.py. Unsupported key types return
None and callers fall back to the Spark-job route (fail open, never
fail wrong).
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _signed32(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


def murmur3_bytes(data: bytes, seed: int = 42) -> int:
    """Spark Murmur3Hash of a string's UTF-8 bytes (signed 32-bit)."""
    h1 = seed & _M32
    aligned = len(data) - (len(data) % 4)
    for i in range(0, aligned, 4):
        k1 = int.from_bytes(data[i:i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(aligned, len(data)):
        b = data[i]
        if b >= 0x80:
            b -= 0x100  # Spark mixes the SIGNED byte (its tail quirk)
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    return _signed32(_fmix(h1, len(data)))


def murmur3_long(v: int, seed: int = 42) -> int:
    """Spark Murmur3Hash of a LongType value (lo word, then hi word)."""
    v &= (1 << 64) - 1
    h1 = seed & _M32
    h1 = _mix_h1(h1, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    return _signed32(_fmix(h1, 8))


def murmur3_int(v: int, seed: int = 42) -> int:
    """Spark Murmur3Hash of an IntegerType value."""
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    return _signed32(_fmix(h1, 4))


def key_bucket(key, key_type: str, num_buckets: int) -> int | None:
    """``pmod(Murmur3Hash(key), B)`` — bucket_expr's value, driver-side.
    None for unsupported types (callers fall back to the Spark job)."""
    if key is None:
        return None
    if key_type == "string":
        h = murmur3_bytes(str(key).encode("utf-8"))
    elif key_type in ("bigint", "long"):
        h = murmur3_long(int(key))
    elif key_type == "int":
        h = murmur3_int(int(key))
    else:
        return None
    return ((h % num_buckets) + num_buckets) % num_buckets
