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


# ---------------------------------------------------------------------------
# numpy-vectorized murmur3_32 — same algorithm, batch-at-a-time.  The write
# path's bucket pandas UDF hashes every row of every bucketed append; the
# per-row Python loop costs ~1 µs/row, which at 100 TB dominates the append.
# These kernels keep the whole Arrow batch in numpy (uint32 wrap-around
# arithmetic), with the scalar murmur3_32 as the parity reference.
# ---------------------------------------------------------------------------

import numpy as _np

_C1V = _np.uint32(_C1)
_C2V = _np.uint32(_C2)


def _rotl32_vec(x, r: int):
    return (x << _np.uint32(r)) | (x >> _np.uint32(32 - r))


def _mix_block_vec(h, k):
    k = k * _C1V
    k = _rotl32_vec(k, 15)
    k = k * _C2V
    h = h ^ k
    h = _rotl32_vec(h, 13)
    return h * _np.uint32(5) + _np.uint32(0xE6546B64)


def _finalize_vec(h, length):
    h = h ^ length
    h = h ^ (h >> _np.uint32(16))
    h = h * _np.uint32(0x85EBCA6B)
    h = h ^ (h >> _np.uint32(13))
    h = h * _np.uint32(0xC2B2AE35)
    h = h ^ (h >> _np.uint32(16))
    return h.astype(_np.int32)


def murmur3_32_vec_i64(vals: "_np.ndarray") -> "_np.ndarray":
    """murmur3_x86_32 over the little-endian 8-byte encoding of each int64
    (the recipe for int/long/date/time/timestamp) — two 4-byte blocks, no
    tail.  Returns signed int32 (Java parity)."""
    v = vals.astype(_np.uint64)
    h = _np.zeros(v.shape, _np.uint32)
    h = _mix_block_vec(h, (v & _np.uint64(0xFFFFFFFF)).astype(_np.uint32))
    h = _mix_block_vec(h, (v >> _np.uint64(32)).astype(_np.uint32))
    return _finalize_vec(h, _np.uint32(8))


def murmur3_32_vec_bytes(items: list) -> "_np.ndarray":
    """murmur3_x86_32 over variable-length byte strings (string/decimal/
    binary/uuid recipes).  Rows are packed into one padded 2-D block matrix;
    the block loop runs max(len)//4 vectorized iterations, so per-row Python
    is just the encode.  Returns signed int32."""
    n = len(items)
    if n == 0:
        return _np.empty(0, _np.int32)
    lens = _np.fromiter((len(b) for b in items), _np.int64, count=n)
    total = int(lens.sum())
    maxlen = int(lens.max())
    pad = (maxlen + 3) & ~3
    h = _np.zeros(n, _np.uint32)
    if pad == 0:
        return _finalize_vec(h, lens.astype(_np.uint32))
    flat = _np.frombuffer(b"".join(items), _np.uint8, count=total)
    buf = _np.zeros((n, pad), _np.uint8)
    starts = _np.concatenate(([0], _np.cumsum(lens)[:-1]))
    rows = _np.repeat(_np.arange(n), lens)
    cols = _np.arange(total) - _np.repeat(starts, lens)
    buf[rows, cols] = flat
    blocks = buf.view("<u4").reshape(n, pad // 4)
    nblocks = lens // 4
    for b in range(int(nblocks.max())):
        active = nblocks > b
        if not active.any():
            break
        h[active] = _mix_block_vec(h[active], blocks[active, b])
    # tail (1-3 trailing bytes): same mixing as the scalar loop
    tail = lens & 3
    base = lens - tail
    k = _np.zeros(n, _np.uint32)
    idx = _np.arange(n)
    for t in (3, 2, 1):
        m = tail >= t
        if m.any():
            k[m] ^= (buf[idx[m], base[m] + (t - 1)].astype(_np.uint32)
                     << _np.uint32(8 * (t - 1)))
    m = tail >= 1
    if m.any():
        kk = k[m] * _C1V
        kk = _rotl32_vec(kk, 15)
        kk = kk * _C2V
        h[m] = h[m] ^ kk
    return _finalize_vec(h, lens.astype(_np.uint32))
