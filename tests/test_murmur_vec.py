"""Vectorized murmur3 parity with the scalar reference implementation."""

import random
import struct

import numpy as np

from linkedin_iceberg_spark.transforms.bucket_hash import (
    murmur3_32,
    murmur3_32_vec_bytes,
    murmur3_32_vec_i64,
)

random.seed(7)


def test_vec_i64_parity():
    vals = [0, 1, -1, 34, 2**62, -(2**62), 123456789]
    vals += [random.randint(-2**63, 2**63 - 1) for _ in range(500)]
    arr = np.array(vals, dtype=np.int64)
    got = murmur3_32_vec_i64(arr)
    want = [murmur3_32(struct.pack("<q", v)) for v in vals]
    assert got.tolist() == want


def test_vec_bytes_parity_all_lengths():
    items = [b"", b"a", b"ab", b"abc", b"abcd", b"iceberg",
             "émoji🪣".encode("utf-8")]
    items += [bytes(random.getrandbits(8) for _ in range(random.randint(0, 40)))
              for _ in range(500)]
    got = murmur3_32_vec_bytes(items)
    want = [murmur3_32(b) for b in items]
    assert got.tolist() == want


def test_vec_bytes_spec_vector():
    # Iceberg spec Appendix B: bucket hash of string "iceberg" is 1210000089
    assert murmur3_32_vec_bytes([b"iceberg"]).tolist() == [1210000089]
    assert murmur3_32(b"iceberg") == 1210000089
