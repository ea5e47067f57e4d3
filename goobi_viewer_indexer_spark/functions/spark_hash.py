"""Pure-Python Murmur3 x86_32 matching Spark's ``hash()`` for strings.

Spark computes ``hash(col)`` for string columns as Murmur3_x86_32 over the
UTF-8 bytes with seed 42 (the public algorithm; Spark's variant reads any
trailing 1-3 bytes as unsigned ints through the same mix as full blocks —
``hashUnsafeBytes2`` semantics, i.e. tail bytes are each mixed as their own
4-byte word).  Having it driver-side turns the per-query "which postings
bucket" lookup from a Spark job into arithmetic.

Validated against ``F.hash`` in tests/test_spark_hash.py.
"""

from __future__ import annotations

__all__ = ["spark_hash_string", "bucket_of"]

_M = 0xFFFFFFFF


def _mixk1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M
    k1 = ((k1 << 15) | (k1 >> 17)) & _M
    return (k1 * 0x1B873593) & _M


def _mixh1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M
    return (h1 * 5 + 0xE6546B64) & _M


def spark_hash_string(s: str, seed: int = 42) -> int:
    """Signed 32-bit Murmur3 of a string, identical to Spark F.hash."""
    data = s.encode("utf-8")
    n = len(data)
    h1 = seed & _M
    # full 4-byte little-endian blocks
    nblocks = n // 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[4 * i: 4 * i + 4], "little")
        h1 = _mixh1(h1, _mixk1(k1))
    # Spark (hashUnsafeBytes2): each remaining byte goes through the full
    # mix as its own word (signed byte value)
    for i in range(4 * nblocks, n):
        b = data[i]
        if b >= 128:
            b -= 256  # Java bytes are signed
        h1 = _mixh1(h1, _mixk1(b & _M))
    # fmix
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def bucket_of(term: str, n_buckets: int) -> int:
    """pmod(hash(term), n_buckets) — Spark's pmod semantics."""
    return spark_hash_string(term) % n_buckets
