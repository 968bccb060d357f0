"""Driver-side xxHash64 matching Spark's ``xxhash64(col)`` (seed 42).

The table's bucket assignment is ``pmod(xxhash64(key), N)`` (the analog
of Iceberg's bucket transform). Computing that hash on the DRIVER for a
single literal turns a point lookup ``read(eq={key: v})`` into exact
partition pruning — only the one bucket that can hold the key is
scanned, no Spark job needed to plan it. This is the primary-key-index
analog of the reference's hash indexes on transaction_hash/contract_id
(/root/reference/internal/db/migrations/20260211-add-additional-lab-
backend-indexes-2.sql): min/max file stats can never serve a
hash-distributed key, bucket arithmetic serves it exactly.

xxHash64 is public-domain (Yann Collet); this is the standard algorithm
expressed over Python ints with explicit 64-bit masking. Spark hashes a
StringType as its UTF-8 bytes and integral types as the 8-byte value
(XxHash64Function.hashLong — identical to hashing the value's 8-byte
little-endian form). Parity with the JVM expression is pinned by a
randomized test (tests/test_lake_table.py) so any divergence fails
loudly rather than mis-pruning.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 over ``data`` → signed 64-bit int (Spark LongType
    range), default seed 42 = Spark's ``xxhash64``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
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
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_long(value: int, seed: int = 42) -> int:
    """Spark's XxHash64Function.hashLong — an integral column hashes as
    its 8-byte little-endian form (all of byte/short/int/long widen to
    long first)."""
    return xxh64((value & _M).to_bytes(8, "little"), seed)


def spark_xxhash64(value, seed: int = 42) -> int:
    """``xxhash64(lit(value))`` for the types a bucket key can carry."""
    if isinstance(value, bool):
        raise TypeError("boolean bucket keys are not supported")
    if isinstance(value, int):
        return xxh64_long(value, seed)
    if isinstance(value, str):
        return xxh64(value.encode("utf-8"), seed)
    if isinstance(value, (bytes, bytearray)):
        return xxh64(bytes(value), seed)
    raise TypeError(f"unsupported bucket key type {type(value).__name__}")


def bucket_of(value, num_buckets: int, seed: int = 42) -> int:
    """``pmod(xxhash64(value), num_buckets)`` — the file-level bucket a
    key's rows live in (lake.table.LakeTable.bucket_expr twin)."""
    return spark_xxhash64(value, seed) % num_buckets
