"""Murmur3 x86 32-bit hash — exact parity with Guava's Hashing.murmur3_32()
as used by the reference's bucket transform (ref: api/.../transforms/Bucket.java:155-311).

Byte recipes per type (ref: Bucket.java hashes + Iceberg spec "Appendix B"):
  int/long/date/time/timestamp -> little-endian 8-byte long
  string                       -> UTF-8 bytes
  decimal                      -> minimal two's-complement big-endian unscaled
  binary / fixed               -> raw bytes
  uuid                         -> 16 big-endian bytes
Bucket id = (murmur3_32(bytes) & Integer.MAX_VALUE) % N.

Pure-Python implementation (no mmh3 in the environment); verified against the
published Iceberg spec test vectors in tests/test_transforms.py.
"""

from __future__ import annotations

import datetime as _dt
import struct
from decimal import Decimal

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32; returns a *signed* 32-bit int (Java parity)."""
    h = seed & _MASK32
    length = len(data)
    rounded = length & ~0x3
    for i in range(0, rounded, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * _C1) & _MASK32
        k = _rotl32(k, 15)
        k = (k * _C2) & _MASK32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _MASK32
    # tail
    k = 0
    tail = length & 0x3
    if tail >= 3:
        k ^= data[rounded + 2] << 16
    if tail >= 2:
        k ^= data[rounded + 1] << 8
    if tail >= 1:
        k ^= data[rounded]
        k = (k * _C1) & _MASK32
        k = _rotl32(k, 15)
        k = (k * _C2) & _MASK32
        h ^= k
    # finalize
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    # to signed
    return h - (1 << 32) if h >= (1 << 31) else h


_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_DT_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def to_hash_bytes(value, type_str: str) -> bytes:
    """Serialize a value to the bucket-hash byte recipe for its type."""
    if type_str in ("int", "long"):
        return struct.pack("<q", int(value))
    if type_str == "date":
        if isinstance(value, _dt.datetime):
            value = value.date()
        if isinstance(value, _dt.date):
            value = (value - _EPOCH_DATE).days
        return struct.pack("<q", int(value))
    if type_str in ("time",):
        return struct.pack("<q", int(value))
    if type_str in ("timestamp", "timestamptz"):
        if isinstance(value, _dt.datetime):
            if value.tzinfo is not None:
                delta = value - _EPOCH_DT_UTC
            else:
                delta = value - _EPOCH_DT
            value = (delta.days * 86_400_000_000
                     + delta.seconds * 1_000_000 + delta.microseconds)
        return struct.pack("<q", int(value))
    if type_str == "string":
        return str(value).encode("utf-8")
    if type_str.startswith("decimal"):
        if isinstance(value, Decimal):
            t = value.as_tuple()
            unscaled = int("".join(map(str, t.digits))) * (-1 if t.sign else 1)
            if t.exponent > 0:
                unscaled *= 10 ** t.exponent
        else:
            unscaled = int(value)
        # minimal two's-complement length (BigInteger.toByteArray parity)
        bits = (~unscaled).bit_length() if unscaled < 0 else unscaled.bit_length()
        length = (bits + 8) // 8
        return unscaled.to_bytes(length, "big", signed=True)
    if type_str in ("binary",) or type_str.startswith("fixed"):
        return bytes(value)
    if type_str == "uuid":
        import uuid as _uuid
        u = value if isinstance(value, _uuid.UUID) else _uuid.UUID(str(value))
        return u.bytes
    raise TypeError(f"bucket does not support type {type_str}")


def bucket_hash_bytes(value, type_str: str) -> int:
    return murmur3_32(to_hash_bytes(value, type_str))
